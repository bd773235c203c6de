"""Beam-model pipeline API compiled to Spark DataFrames.

Provides the reference's pipeline semantics (SURVEY.md §2) natively on
Spark: ``Pipeline`` / ``PCollection`` with ParDo (multi-output, side
inputs, lifecycle), GroupByKey, combiners, windowing (fixed / sliding /
sessions / custom merging), Flatten (heterogeneous), Reshuffle, Distinct,
and user metrics.

Reference parity map (all in /root/reference/ray_beam_runner/):
- ParDo family          translator.py:157-338; portability executes DoFns
                        in an embedded Beam worker (execution.py:54-168)
- Tagged outputs        translator.py:180-206, 559-576
- Side input views      translator.py:506-524, execution.py:469-525
- GroupByKey            overrides.py:84-90, translator.py:341-390
- WindowInto            translator.py:393-416
- Flatten (transcoding) translator.py:419-433
- Reshuffle             translator.py:147-154
- Metrics               ray_fn_runner.py:462-534

Design (SURVEY.md §1.3): the element envelope is ordinary columns —
``key`` (optional), ``value``, ``event_time`` (double, seconds),
``win_start``/``win_end`` (double, null = global window). Values are
typed Spark columns when a type is declared (Catalyst-visible fast path)
and pickled ``binary`` otherwise (the Beam-coder-equivalent opaque path;
the reference is *always* opaque bytes). Opaque user Python runs through
``mapInPandas`` (Arrow batches); everything else is DataFrame expressions.

Bounded scope (matches the reference's own rejections): default trigger
only, event-time timers only (ray_fn_runner.py:92-100), no TestStream.
Side-input views materialize to a broadcast (bounded size — same
assumption as the reference's state-actor commit).
"""

from __future__ import annotations

import inspect
import os
import pickle
from collections.abc import Callable, Iterable
from typing import Any

import pandas as pd
from pyspark.accumulators import AccumulatorParam
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ray_beam_runner_spark.metrics import MetricsRegistry
from ray_beam_runner_spark.windowing import (
    FixedWindows,
    GlobalWindows,
    Sessions,
    SlidingWindows,
)

GLOBAL_TS = 0.0
_PICKLE = pickle.HIGHEST_PROTOCOL


def _dumps(v) -> bytes:
    return pickle.dumps(v, protocol=_PICKLE)


def _loads(b) -> Any:
    return pickle.loads(bytes(b))


class TaggedOutput:
    """Marks a DoFn output for a named tag (Beam pvalue.TaggedOutput)."""

    def __init__(self, tag: str, value: Any):
        self.tag = tag
        self.value = value


class _ReservedTagError(ValueError):
    """Raised (and never dead-lettered) when a DoFn emits the reserved
    'error' tag under exception_handling."""


class DoFn:
    """User element-wise function with the Beam lifecycle.

    ``process(element, timestamp=None, window=None, **side_inputs)`` yields
    0..N outputs (plain values or TaggedOutput). setup/start_bundle run
    before the first element of each task, finish_bundle/teardown after
    the last — the pandas-UDF iterator form gives the exact hook points
    the reference gets from DoFnInvoker (translator.py:283-326)."""

    def setup(self):  # pragma: no cover - trivial default
        pass

    def start_bundle(self):  # pragma: no cover
        pass

    def process(self, element, timestamp=None, window=None, **side_inputs):
        raise NotImplementedError

    def finish_bundle(self) -> Iterable[Any]:  # pragma: no cover
        return ()

    def teardown(self):  # pragma: no cover
        pass


class _FnDoFn(DoFn):
    def __init__(self, fn: Callable, mode: str):
        self.fn = fn
        self.mode = mode  # map | flat_map | filter

    def process(self, element, timestamp=None, window=None, **side):
        if self.mode == "map":
            yield self.fn(element)
        elif self.mode == "flat_map":
            yield from self.fn(element)
        else:
            if self.fn(element):
                yield element


# ---------------------------------------------------------------------------
# Side input views (reference: translator.py:506-524; tests 163-361)
# ---------------------------------------------------------------------------


class BundleFinalizer:
    """Per-bundle finalization registrar (Beam DoFn.BundleFinalizerParam).

    A DoFn whose ``process`` declares a ``bundle_finalizer`` parameter
    receives one of these per bundle; callbacks registered on it run on
    the DRIVER after the job that carried the bundle commits durably
    (reference: runner issues FinalizeBundleRequest after the bundle
    result arrives, execution.py:131-139). Spark's accumulator semantics
    give exactly the contract Beam documents: updates surface to the
    driver only when the job (the durable commit of the terminal action)
    succeeds, and retried tasks may re-add — i.e. best-effort,
    at-least-once, post-commit.

    Unlike the reference (callbacks run in the SDK worker that registered
    them), callbacks here cross a process boundary: they must be
    cloudpicklable and they execute on the driver. A callback that closes
    over an unpicklable worker-local resource is silently dropped
    (best-effort), not an error."""

    def __init__(self):
        self._callbacks: list = []

    def register(self, callback: Callable[[], Any]) -> None:
        self._callbacks.append(callback)


class _View:
    def __init__(self, pcoll: "PCollection"):
        self.pcoll = pcoll

    def _rows(self):
        return self.pcoll._collect_windowed(
            limit=self.pcoll.pipeline.side_input_max_rows, what="side input"
        )

    def build(self):
        """→ dict window -> view value (window=None for global)."""
        raise NotImplementedError


class AsList(_View):
    empty = staticmethod(list)  # factory: fresh container per delivery

    def build(self):
        out: dict = {}
        for elem, _ts, win in self._rows():
            out.setdefault(win, []).append(elem)
        return out


class AsSingleton(_View):
    empty = staticmethod(lambda: None)

    def build(self):
        out: dict = {}
        for elem, _ts, win in self._rows():
            if win in out:
                raise ValueError("AsSingleton side input has multiple values")
            out[win] = elem
        return out


class AsDict(_View):
    empty = staticmethod(dict)

    def build(self):
        out: dict = {}
        for elem, _ts, win in self._rows():
            k, v = elem
            out.setdefault(win, {})[k] = v
        return out


class AsMultiMap(_View):
    empty = staticmethod(dict)

    def build(self):
        out: dict = {}
        for elem, _ts, win in self._rows():
            k, v = elem
            out.setdefault(win, {}).setdefault(k, []).append(v)
        return out


class _JoinedMultiMap:
    """Per-element view delivered by AsMultiMapJoined: supports lookup of
    the element's OWN join key only (the subset a distributed join can
    provide). Missing side match → empty list (Beam multimap contract);
    any other key is a loud error, not silently-wrong data."""

    __slots__ = ("_key", "_values")

    def __init__(self, key, values):
        self._key = key
        self._values = values

    def __getitem__(self, key):
        if key != self._key:
            raise KeyError(
                f"AsMultiMapJoined can only look up the element's own key "
                f"{self._key!r} (requested {key!r}); use AsMultiMap for "
                f"arbitrary-key access on small sides"
            )
        return self._values

    def get(self, key, default=None):
        return self._values if key == self._key else default


class AsMultiMapJoined:
    """Multimap side input for LARGE sides — the scale path the collect+
    broadcast views can't take (they drain the side through the driver,
    capped by ``Pipeline.side_input_max_rows``).

    Instead of materializing the whole side, the side PCollection is
    aggregated per key and broadcast-JOINED onto the main input; each
    element's DoFn receives the side values for its own join key (the
    element itself when unkeyed, the element's key when keyed) as a
    list-valued :class:`_JoinedMultiMap`. Restrictions vs AsMultiMap:
    global-windowed sides only, and lookups only by the element's own
    key — exactly the subset that needs no driver materialization. For
    sides too large to broadcast, drop the ``broadcast`` flag and Spark
    plans a shuffle join keyed on the main input."""

    def __init__(self, pcoll: "PCollection", broadcast: bool = True):
        if not pcoll.keyed:
            # accept the (k, v)-tuple shape the collect-based KV views take
            if not pcoll.pickled:
                raise ValueError(
                    "AsMultiMapJoined requires a keyed side PCollection "
                    "(or an unkeyed one of (key, value) tuples)"
                )
            pcoll = pcoll._split_kv(None, None)
        if not isinstance(pcoll.windowing, GlobalWindows):
            raise ValueError(
                "AsMultiMapJoined supports global-windowed sides only; "
                "use AsMultiMap for windowed sides"
            )
        self.pcoll = pcoll
        self.broadcast = broadcast


def _lookup_side(view_by_window: dict, main_win, main_ts: float, default):
    """Window-mapping: global side → its single view; windowed side → the
    side window containing the main window's MAX timestamp (end minus one
    microsecond — Beam's default WindowMappingFn maps via
    window.max_timestamp(), so when side windows are finer than main
    windows the LAST overlapping side window is delivered, not the first).
    Reference delivers views keyed (transform, tag, window),
    execution.py:493-523. ``default`` is a FRESH empty container for the
    view type (Beam delivers [] for AsList / {} for AsDict of an empty or
    unmatched side; fresh per delivery so a mutating DoFn can't poison
    later elements)."""
    if set(view_by_window.keys()) == {None}:
        return view_by_window[None]
    probe = main_ts if main_win is None else main_win[1] - 1e-6
    for win, view in view_by_window.items():
        if win is not None and win[0] <= probe < win[1]:
            return view
    return default


# ---------------------------------------------------------------------------
# PCollection
# ---------------------------------------------------------------------------

_ENVELOPE_META = ("event_time", "win_start", "win_end")


class PCollection:
    """A distributed collection: DataFrame + envelope metadata.

    ``df`` columns: [key?, value, event_time, win_start, win_end].
    ``pickled``: whether value (and key) are opaque pickled bytes.
    ``windowing``: the WindowFn in effect (merging fns apply at GBK)."""

    def __init__(
        self,
        pipeline: "Pipeline",
        df: DataFrame,
        keyed: bool,
        pickled: bool,
        windowing=None,
        grouped: bool = False,
    ):
        self.pipeline = pipeline
        self.df = df
        self.keyed = keyed
        self.pickled = pickled
        self.windowing = windowing or GlobalWindows()
        self.grouped = grouped  # value is array<...> from GBK

    # -- element-wise (ParDo family) ------------------------------------

    def par_do(
        self,
        dofn: DoFn,
        output_type: str | None = None,
        outputs: tuple[str, ...] = (),
        side_inputs: dict[str, _View] | None = None,
        keyed_output: bool | None = None,
        key_type: str | None = None,
        label: str | None = None,
        exception_handling: bool = False,
    ):
        """Run a DoFn over every element. Returns a PCollection, or a dict
        {tag: PCollection} (main output under 'main') when ``outputs``
        names side tags. ``output_type`` is a Spark DDL type for the value
        column; None → opaque pickled values. With ``keyed_output`` the
        DoFn must emit (key, value) tuples; they are split into a real key
        column (typed via ``key_type``, else pickled) so every downstream
        keyed op (group_by_key, map_kv_values, ...) sees the schema it
        expects.

        ``exception_handling`` (Beam's ``with_exception_handling`` /
        dead-letter pattern): a per-element exception no longer fails the
        job — the failing element is routed to an ``error`` output as a
        pickled ``(element, error_repr)`` tuple, and the element's
        partial outputs are discarded (per-element atomicity). Forces the
        dict return shape with an ``error`` entry alongside ``main``;
        the tag name ``error`` is reserved (declaring it in ``outputs``
        or emitting ``TaggedOutput("error", ...)`` is a loud error, never
        silent mis-routing into the dead-letter view)."""
        if exception_handling and "error" in outputs:
            raise ValueError(
                "exception_handling reserves the 'error' output tag; rename "
                "the user tag or drop exception_handling"
            )
        all_sides = side_inputs or {}
        joined_sides = {
            name: v for name, v in all_sides.items() if isinstance(v, AsMultiMapJoined)
        }
        bc_sides = {
            name: v for name, v in all_sides.items() if not isinstance(v, AsMultiMapJoined)
        }
        side_views = {
            name: self.pipeline.spark.sparkContext.broadcast(view.build())
            for name, view in bc_sides.items()
        }
        side_empties = {name: type(view).empty for name, view in bc_sides.items()}
        keyed_in, pickled_in, grouped_in = self.keyed, self.pickled, self.grouped

        # Join-based large-side path: aggregate the side per key, join it
        # onto the main input (broadcast by default), and let the kernel
        # hand each element the side values for its own key. No driver
        # materialization, no size cap. Keys must compare equal on their
        # stored representation (typed columns, or deterministic pickles
        # for opaque keys — same assumption group_by_key already makes).
        in_df = self.df
        joined_meta: dict[str, tuple[str, bool]] = {}
        for name, view in joined_sides.items():
            col = f"side__{name}"
            skey = f"sidekey__{name}"
            # the join compares stored representations — a typed main
            # against a pickled side (or differing dtypes) would compile
            # via implicit casts and silently match nothing
            main_join_col = "key" if keyed_in else "value"
            main_dtype = dict(self.df.dtypes)[main_join_col]
            side_dtype = dict(view.pcoll.df.dtypes)["key"]
            if main_dtype != side_dtype:
                raise ValueError(
                    f"AsMultiMapJoined key type mismatch for side input "
                    f"{name!r}: main {main_join_col!r} column is "
                    f"{main_dtype}, side key column is {side_dtype} "
                    f"(binary = pickled). Give both sides the same key "
                    f"typing (e.g. key_type=... on map_to_kv, or leave "
                    f"both pickled)."
                )
            sdf = (
                view.pcoll.df.groupBy("key")
                .agg(F.collect_list("value").alias(col))
                .withColumnRenamed("key", skey)
            )
            if view.broadcast:
                sdf = F.broadcast(sdf)
            join_key = F.col("key") if keyed_in else F.col("value")
            in_df = in_df.join(sdf, join_key.eqNullSafe(F.col(skey)), "left").drop(skey)
            joined_meta[name] = (col, view.pcoll.pickled)
        wants_finalizer = "bundle_finalizer" in inspect.signature(dofn.process).parameters
        finalizer_acc = self.pipeline._finalizer_acc if wants_finalizer else None
        out_keyed = bool(keyed_output)
        out_pickled = output_type is None
        key_pickled = key_type is None
        value_type = T._parse_datatype_string(output_type) if output_type else T.BinaryType()
        fields = [
            T.StructField("value", value_type),
            T.StructField("event_time", T.DoubleType()),
            T.StructField("win_start", T.DoubleType()),
            T.StructField("win_end", T.DoubleType()),
            T.StructField("tag", T.StringType()),
        ]
        if out_keyed:
            k_t = T._parse_datatype_string(key_type) if key_type else T.BinaryType()
            fields.insert(0, T.StructField("key", k_t))
        if exception_handling:
            # dead letters carry a pickled (element, error) payload in a
            # dedicated column — the value column keeps its declared type
            fields.append(T.StructField("error_payload", T.BinaryType()))
        schema = T.StructType(fields)
        columns = [f.name for f in fields]
        n_cols = len(columns)

        def kernel(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
            dofn.setup()
            dofn.start_bundle()
            sides = {name: bc.value for name, bc in side_views.items()}
            bundle_finalizer = BundleFinalizer() if wants_finalizer else None
            extra_params = (
                {"bundle_finalizer": bundle_finalizer} if wants_finalizer else {}
            )

            pad = (None,) if exception_handling else ()

            def emit_rows(outs, ts, ws, we, rows):
                for out in outs:
                    tag, val = (
                        (out.tag, out.value) if isinstance(out, TaggedOutput) else (None, out)
                    )
                    if exception_handling and tag == "error":
                        raise _ReservedTagError(
                            "TaggedOutput tag 'error' is reserved by "
                            "exception_handling for dead letters"
                        )
                    if out_keyed:
                        k, v = val
                        rows.append(
                            (
                                _dumps(k) if key_pickled else k,
                                _dumps(v) if out_pickled else v,
                                ts,
                                ws,
                                we,
                                tag,
                            )
                            + pad
                        )
                    else:
                        rows.append(
                            (
                                _dumps(val) if out_pickled else val,
                                ts,
                                ws,
                                we,
                                tag,
                            )
                            + pad
                        )

            for pdf in batches:
                rows: list = []
                for row in pdf.itertuples(index=False):
                    d = row._asdict()
                    elem = _decode_element(d, keyed_in, pickled_in, grouped_in)
                    ts = d["event_time"]
                    win = None if pd.isna(d["win_start"]) else (d["win_start"], d["win_end"])
                    bound_sides = {
                        name: _lookup_side(view, win, ts, side_empties[name]())
                        for name, view in sides.items()
                    }
                    for name, (col, side_pickled) in joined_meta.items():
                        vals = d.get(col)
                        vals = (
                            []
                            if vals is None
                            else [_loads(x) if side_pickled else _from_np(x) for x in vals]
                        )
                        jk = elem[0] if keyed_in else elem
                        bound_sides[name] = _JoinedMultiMap(jk, vals)
                    if exception_handling:
                        elem_rows: list = []
                        try:
                            outs = dofn.process(
                                elem, timestamp=ts, window=win, **extra_params, **bound_sides
                            )
                            emit_rows(outs, ts, d["win_start"], d["win_end"], elem_rows)
                        except _ReservedTagError:
                            raise  # misuse of the API, never a dead letter
                        except Exception as e:  # noqa: BLE001 - dead-letter route
                            payload = _dumps((elem, repr(e)))
                            err_row = [None] * n_cols
                            err_row[-5:] = [ts, d["win_start"], d["win_end"], "error", payload]
                            rows.append(tuple(err_row))
                        else:
                            rows.extend(elem_rows)
                    else:
                        outs = dofn.process(
                            elem, timestamp=ts, window=win, **extra_params, **bound_sides
                        )
                        emit_rows(outs, ts, d["win_start"], d["win_end"], rows)
                yield pd.DataFrame(rows, columns=columns)
            final_rows: list = []
            emit_rows(dofn.finish_bundle() or (), GLOBAL_TS, None, None, final_rows)
            if final_rows:
                yield pd.DataFrame(final_rows, columns=columns)
            if wants_finalizer and bundle_finalizer._callbacks:
                # ship the registered callbacks to the driver; accumulator
                # updates surface only when the carrying job commits.
                # Callbacks run DRIVER-side so they must be picklable; an
                # unpicklable one (closing over a socket/file handle) is
                # dropped here rather than failing the task — finalization
                # is best-effort per the Beam contract.
                from pyspark import cloudpickle

                blobs = []
                for cb in bundle_finalizer._callbacks:
                    try:
                        blobs.append(cloudpickle.dumps(cb))
                    except Exception:  # noqa: BLE001 - best-effort drop
                        pass
                if blobs:
                    finalizer_acc.add(blobs)
            dofn.teardown()

        out_df = in_df.mapInPandas(kernel, schema=schema)
        name = self.pipeline._next_label("ParDo", label)

        def child(df):
            pc = self._child(df, out_keyed, out_pickled)
            if out_keyed:
                pc.key_pickled = key_pickled
            return pc

        if outputs or exception_handling:
            # Persist so N tagged views cost one DoFn pass (required for
            # correctness with nondeterministic/metric-bearing DoFns).
            # Tracked on the pipeline: call Pipeline.release() when done.
            out_df = out_df.persist()
            self.pipeline._persisted.append(out_df)
            observe = self.pipeline._observe_elements

            def tag_view(df):
                return df.drop("error_payload") if exception_handling else df

            result = {
                "main": child(
                    observe(
                        f"{name}.out",
                        tag_view(out_df.filter(F.col("tag").isNull()).drop("tag")),
                    )
                )
            }
            for tag in outputs:
                result[tag] = child(
                    observe(
                        f"{name}.out.{tag}",
                        tag_view(out_df.filter(F.col("tag") == tag).drop("tag")),
                    )
                )
            if exception_handling:
                err_df = out_df.filter(
                    (F.col("tag") == "error") & F.col("error_payload").isNotNull()
                ).select(F.col("error_payload").alias("value"), *_ENVELOPE_META)
                result["error"] = PCollection(
                    self.pipeline,
                    observe(f"{name}.out.error", err_df),
                    False,
                    True,
                    self.windowing,
                )
            return result
        return child(self.pipeline._observe_elements(f"{name}.out", out_df.drop("tag")))

    def _child(self, df: DataFrame, keyed: bool, pickled: bool, grouped: bool = False):
        return PCollection(self.pipeline, df, keyed, pickled, self.windowing, grouped)

    def map(self, fn: Callable, output_type: str | None = None) -> "PCollection":
        return self.par_do(_FnDoFn(fn, "map"), output_type)

    def flat_map(self, fn: Callable, output_type: str | None = None) -> "PCollection":
        return self.par_do(_FnDoFn(fn, "flat_map"), output_type)

    def filter(self, fn: Callable) -> "PCollection":
        """Keep elements where fn(element) is truthy. Identity transform —
        a dedicated pass-through kernel preserves the whole envelope
        (including the key column for keyed PCollections, which par_do's
        value-only output schema would drop)."""
        keyed, pickled, grouped = self.keyed, self.pickled, self.grouped

        def kernel(batches):
            for pdf in batches:
                mask = [
                    bool(fn(_decode_element(row._asdict(), keyed, pickled, grouped)))
                    for row in pdf.itertuples(index=False)
                ]
                out = pdf[pd.Series(mask, index=pdf.index)]
                if len(out):
                    yield out

        df = self.df.mapInPandas(kernel, schema=self.df.schema)
        out = self._child(df, keyed, pickled, grouped)
        out.key_pickled = getattr(self, "key_pickled", pickled)
        return out

    def select_expr(self, *exprs: str) -> "PCollection":
        """Typed fast path: transform the value with SQL expressions over a
        typed value column (stays fully inside Catalyst — zero Python).
        The first expr must alias to ``value``."""
        if self.pickled:
            raise ValueError("select_expr requires a typed value column")
        df = self.df.selectExpr(*exprs, *(c for c in _ENVELOPE_META))
        return self._child(df, self.keyed, False)

    # -- keying ----------------------------------------------------------

    def map_to_kv(self, fn: Callable, key_type: str | None = None, value_type: str | None = None):
        """fn(element) -> (key, value); None types → pickled."""
        pc = self.map(fn)  # pickled tuples
        return pc._split_kv(key_type, value_type)

    def _split_kv(self, key_type: str | None, value_type: str | None) -> "PCollection":
        assert self.pickled and not self.keyed
        k_t = T._parse_datatype_string(key_type) if key_type else T.BinaryType()
        v_t = T._parse_datatype_string(value_type) if value_type else T.BinaryType()
        schema = T.StructType(
            [
                T.StructField("key", k_t),
                T.StructField("value", v_t),
                T.StructField("event_time", T.DoubleType()),
                T.StructField("win_start", T.DoubleType()),
                T.StructField("win_end", T.DoubleType()),
            ]
        )
        kp, vp = key_type is None, value_type is None

        def kernel(batches):
            for pdf in batches:
                rows = []
                for row in pdf.itertuples(index=False):
                    d = row._asdict()
                    k, v = _loads(d["value"])
                    rows.append(
                        (
                            _dumps(k) if kp else k,
                            _dumps(v) if vp else v,
                            d["event_time"],
                            d["win_start"],
                            d["win_end"],
                        )
                    )
                yield pd.DataFrame(rows, columns=["key", "value", "event_time", "win_start", "win_end"])

        df = self.df.mapInPandas(kernel, schema=schema)
        out = self._child(df, True, vp)
        out.key_pickled = kp
        return out

    # -- windowing --------------------------------------------------------

    def window_into(self, windowfn) -> "PCollection":
        """Assign windows from event_time (reference translator.py:393-416).
        Non-merging fns materialize win_start/win_end now (sliding windows
        fan out via explode); merging fns defer to grouping time."""
        if isinstance(windowfn, GlobalWindows):
            df = self.df.withColumn("win_start", F.lit(None).cast("double")).withColumn(
                "win_end", F.lit(None).cast("double")
            )
        elif isinstance(windowfn, FixedWindows):
            start = F.floor(F.col("event_time") / windowfn.size) * windowfn.size
            df = self.df.withColumn("win_start", start.cast("double")).withColumn(
                "win_end", (start + windowfn.size).cast("double")
            )
        elif isinstance(windowfn, SlidingWindows):
            size, period = float(windowfn.size), float(windowfn.period)
            # Descending window starts: first = floor(ts/period); last = the
            # smallest s with s*period + size > ts (strict) = floor((ts-size)/period)+1.
            hi = F.floor(F.col("event_time") / period).cast("long")
            lo = F.floor((F.col("event_time") - size) / period).cast("long") + 1
            # period > size is valid Beam config where some elements fall in
            # ZERO windows (lo > hi): guard the sequence (inverted bounds
            # with step -1 throw at runtime) and let explode drop the
            # element, mirroring SlidingWindows.assign returning [].
            starts = F.when(lo <= hi, F.sequence(hi, lo, F.lit(-1))).otherwise(
                F.array().cast("array<long>")
            )
            df = (
                self.df.withColumn("__s", F.explode(starts))
                .withColumn("win_start", (F.col("__s") * period).cast("double"))
                .withColumn("win_end", (F.col("__s") * period + size).cast("double"))
                .drop("__s")
            )
        else:
            # Merging windowfn: windows materialize per key at grouping
            # time (GroupAlsoByWindow). Clear any previously assigned
            # windows — they belong to the superseded windowing and would
            # leak into side-input mapping / distinct / reified params.
            df = self.df.withColumn("win_start", F.lit(None).cast("double")).withColumn(
                "win_end", F.lit(None).cast("double")
            )
        return PCollection(self.pipeline, df, self.keyed, self.pickled, windowfn, self.grouped)

    def with_timestamps(self, fn: Callable) -> "PCollection":
        """Set event_time per element (Beam TimestampedValue)."""
        keyed, pickled, grouped = self.keyed, self.pickled, self.grouped

        def kernel(batches):
            for pdf in batches:
                out = pdf.copy()
                ts = [
                    float(fn(_decode_element(row._asdict(), keyed, pickled, grouped)))
                    for row in pdf.itertuples(index=False)
                ]
                out["event_time"] = ts
                yield out

        return self._child(self.df.mapInPandas(kernel, schema=self.df.schema), keyed, pickled, grouped)

    # -- grouping ----------------------------------------------------------

    def group_by_key(self) -> "PCollection":
        """GBK: (key, window) → iterable of values. Non-merging windows:
        a single groupBy — the shuffle IS the Exchange Catalyst plans.
        Merging windows (sessions/custom): per-key applyInPandas merge
        (GroupAlsoByWindow, reference overrides.py:72-79)."""
        if not self.keyed:
            raise ValueError("group_by_key requires a keyed PCollection")
        wfn = self.windowing
        if getattr(wfn, "merging", False):
            return self._gbk_merging(wfn)
        grouped = (
            self.df.groupBy("key", "win_start", "win_end")
            .agg(F.collect_list("value").alias("value"), F.max("event_time").alias("event_time"))
            .select("key", "value", "event_time", "win_start", "win_end")
        )
        grouped = self.pipeline._observe_elements(
            self.pipeline._next_label("GroupByKey", None) + ".out", grouped
        )
        out = PCollection(self.pipeline, grouped, True, self.pickled, wfn, grouped=True)
        # typed keys stay typed downstream (.keys() would otherwise try to
        # unpickle them)
        out.key_pickled = getattr(self, "key_pickled", self.pickled)
        return out

    def _gbk_merging(self, wfn) -> "PCollection":
        schema = T.StructType(
            [
                T.StructField("key", self.df.schema["key"].dataType),
                T.StructField("value", T.ArrayType(self.df.schema["value"].dataType)),
                T.StructField("event_time", T.DoubleType()),
                T.StructField("win_start", T.DoubleType()),
                T.StructField("win_end", T.DoubleType()),
            ]
        )

        def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
            protos = []
            for ts in pdf["event_time"]:
                protos.extend(wfn.assign(float(ts)))
            merged = wfn.merge(protos)

            def locate(ts: float):
                for s, e in merged:
                    for ps, pe in wfn.assign(ts):
                        if s <= ps and pe <= e:
                            return (s, e)
                raise AssertionError("window merge did not cover element")

            buckets: dict = {}
            for _, row in pdf.iterrows():
                w = locate(float(row["event_time"]))
                buckets.setdefault(w, []).append((row["value"], row["event_time"]))
            rows = [
                (pdf["key"].iloc[0], [v for v, _ in items], max(t for _, t in items), s, e)
                for (s, e), items in buckets.items()
            ]
            return pd.DataFrame(rows, columns=["key", "value", "event_time", "win_start", "win_end"])

        df = self.df.groupBy("key").applyInPandas(merge_group, schema=schema)
        out = PCollection(self.pipeline, df, True, self.pickled, wfn, grouped=True)
        out.key_pickled = getattr(self, "key_pickled", self.pickled)
        return out

    def kv_to_tuples(self) -> "PCollection":
        """Re-view a keyed PCollection as unkeyed (k, v) tuple values
        (pickled). Used to normalize heterogeneous KV collections before
        Flatten/CoGBK, mirroring the reference's coder transcoding."""
        if not self.keyed:
            raise ValueError("kv_to_tuples requires a keyed PCollection")
        return self.par_do(_FnDoFn(lambda e: e, "map"), None)

    def _as_opaque_kv(self) -> "PCollection":
        """Normalize to pickled key + pickled value representation."""
        if self.pickled and getattr(self, "key_pickled", self.pickled):
            return self
        return self.kv_to_tuples()._split_kv(None, None)

    def co_group_by_key(self, other: "PCollection") -> "PCollection":
        """CoGroupByKey: (key, ([left values], [right values])) per window.
        The reference expands this to Flatten+GBK (SURVEY §2.3). Here:
        non-merging windows → each side groups independently and
        full-outer-joins on (key, window), one shuffle per side. Merging
        windows (sessions/custom) → the sides union with a side tag first
        so windows merge across BOTH inputs (Beam semantics: one session
        covering elements of either side is one group). Heterogeneous
        value/key representations transcode to the opaque form first."""
        if not (self.keyed and other.keyed):
            raise ValueError("co_group_by_key requires keyed PCollections")
        l, r = self, other
        lkp = getattr(l, "key_pickled", l.pickled)
        rkp = getattr(r, "key_pickled", r.pickled)
        same_key_type = l.df.schema["key"].dataType == r.df.schema["key"].dataType
        if l.pickled != r.pickled or lkp != rkp or not same_key_type:
            l, r = l._as_opaque_kv(), r._as_opaque_kv()
        if getattr(self.windowing, "merging", False):
            lt = l.map_kv_values(lambda v: ("l", v))
            rt = r.map_kv_values(lambda v: ("r", v))
            u = PCollection(
                self.pipeline, lt.df.unionByName(rt.df), True, True, self.windowing
            )
            u.key_pickled = getattr(lt, "key_pickled", True)
            grouped = u.group_by_key()
            return grouped.map_kv_values(
                lambda vs: (
                    [v for s, v in vs if s == "l"],
                    [v for s, v in vs if s == "r"],
                )
            )
        a, b = l.group_by_key(), r.group_by_key()
        adf = a.df.select(
            "key",
            F.col("value").alias("__l"),
            "event_time",
            "win_start",
            "win_end",
        )
        bdf = b.df.select(
            F.col("key").alias("__bk"),
            F.col("value").alias("__r"),
            F.col("event_time").alias("__bt"),
            F.col("win_start").alias("__bws"),
            F.col("win_end").alias("__bwe"),
        )
        # Null-safe equality: the global window is (null, null) and plain
        # SQL equality would never match it.
        cond = (
            adf["key"].eqNullSafe(bdf["__bk"])
            & adf["win_start"].eqNullSafe(bdf["__bws"])
            & adf["win_end"].eqNullSafe(bdf["__bwe"])
        )
        j = adf.join(bdf, cond, "full_outer").select(
            F.coalesce(adf["key"], bdf["__bk"]).alias("key"),
            F.coalesce("__l", F.array().cast(adf.schema["__l"].dataType)).alias("__l"),
            F.coalesce("__r", F.array().cast(bdf.schema["__r"].dataType)).alias("__r"),
            F.greatest(
                F.coalesce("event_time", F.lit(float("-inf"))),
                F.coalesce("__bt", F.lit(float("-inf"))),
            ).alias("event_time"),
            F.coalesce(adf["win_start"], bdf["__bws"]).alias("win_start"),
            F.coalesce(adf["win_end"], bdf["__bwe"]).alias("win_end"),
        )
        out = PCollection(self.pipeline, j, True, l.pickled, self.windowing, grouped=False)
        out.key_pickled = getattr(l, "key_pickled", l.pickled)
        return out._to_pair_values()

    def _to_pair_values(self) -> "PCollection":
        """Internal: fold (__l, __r) array columns into a pickled tuple
        value so downstream ParDos see ([left...], [right...])."""
        pickled = self.pickled

        def kernel(batches):
            for pdf in batches:
                rows = []
                # no itertuples: pandas renames __-prefixed fields positionally
                for k, l, r, ts, ws, we in zip(
                    pdf["key"], pdf["__l"], pdf["__r"], pdf["event_time"], pdf["win_start"], pdf["win_end"]
                ):
                    lv = [(_loads(x) if pickled else _from_np(x)) for x in (l if l is not None else [])]
                    rv = [(_loads(x) if pickled else _from_np(x)) for x in (r if r is not None else [])]
                    rows.append((k, _dumps((lv, rv)), ts, ws, we))
                yield pd.DataFrame(
                    rows, columns=["key", "value", "event_time", "win_start", "win_end"]
                )

        schema = T.StructType(
            [
                T.StructField("key", self.df.schema["key"].dataType),
                T.StructField("value", T.BinaryType()),
                T.StructField("event_time", T.DoubleType()),
                T.StructField("win_start", T.DoubleType()),
                T.StructField("win_end", T.DoubleType()),
            ]
        )
        out = PCollection(
            self.pipeline, self.df.mapInPandas(kernel, schema=schema), True, True, self.windowing
        )
        out.key_pickled = getattr(self, "key_pickled", False)
        return out

    def combine_per_key(self, spec) -> "PCollection":
        """Per-key combiner. ``spec`` ∈ {'sum','min','max','mean','count'}
        (native partial/final hash agg — the lifting the reference does via
        translations.lift_combiners is built into Spark) or a callable
        list→value (runs after GBK)."""
        if callable(spec):
            gbk = self.group_by_key()
            return gbk.map_kv_values(lambda vs: spec(list(vs)))
        if self.pickled:
            raise ValueError("named combiners require a typed value column")
        wfn = self.windowing
        if getattr(wfn, "merging", False):
            gbk = self.group_by_key()
            agg = {"sum": sum, "min": min, "max": max, "mean": lambda v: sum(v) / len(v), "count": len}[spec]
            return gbk.map_kv_values(agg)
        exprs = {
            "sum": F.sum("value"),
            "min": F.min("value"),
            "max": F.max("value"),
            "mean": F.avg("value"),
            "count": F.count(F.lit(1)),
        }
        df = (
            self.df.groupBy("key", "win_start", "win_end")
            .agg(exprs[spec].alias("value"), F.max("event_time").alias("event_time"))
            .select("key", "value", "event_time", "win_start", "win_end")
        )
        out = PCollection(self.pipeline, df, True, False, wfn)
        out.key_pickled = getattr(self, "key_pickled", self.pickled)
        return out

    def map_kv_values(self, fn: Callable, output_type: str | None = None) -> "PCollection":
        """Map over values of a keyed PCollection, keeping keys."""
        keyed, pickled, grouped = self.keyed, self.pickled, self.grouped
        out_pickled = output_type is None
        v_t = T._parse_datatype_string(output_type) if output_type else T.BinaryType()
        schema = T.StructType(
            [
                T.StructField("key", self.df.schema["key"].dataType),
                T.StructField("value", v_t),
                T.StructField("event_time", T.DoubleType()),
                T.StructField("win_start", T.DoubleType()),
                T.StructField("win_end", T.DoubleType()),
            ]
        )

        def kernel(batches):
            for pdf in batches:
                rows = []
                for row in pdf.itertuples(index=False):
                    d = row._asdict()
                    _, v = _decode_element(d, keyed, pickled, grouped)
                    res = fn(v)
                    rows.append(
                        (
                            d["key"],
                            _dumps(res) if out_pickled else res,
                            d["event_time"],
                            d["win_start"],
                            d["win_end"],
                        )
                    )
                yield pd.DataFrame(rows, columns=["key", "value", "event_time", "win_start", "win_end"])

        out = PCollection(
            self.pipeline, self.df.mapInPandas(kernel, schema=schema), True, out_pickled, self.windowing
        )
        out.key_pickled = getattr(self, "key_pickled", self.pickled)
        return out

    def combine_globally(self, spec) -> "PCollection":
        """CombineGlobally (reference tests ray_runner_test.py:1133-1161).
        Named specs run as a native global aggregate; callables fold the
        collected iterable per window (single-key GBK)."""
        if callable(spec):
            keyed = self.map_to_kv(lambda v: (None, v))._fix_none_key()
            combined = keyed.combine_per_key(spec)
            return combined.values()
        if self.pickled:
            raise ValueError("named combiners require a typed value column")
        exprs = {
            "sum": F.sum("value"),
            "min": F.min("value"),
            "max": F.max("value"),
            "mean": F.avg("value"),
            "count": F.count(F.lit(1)),
        }
        df = self.df.groupBy("win_start", "win_end").agg(
            exprs[spec].alias("value"), F.max("event_time").alias("event_time")
        )
        return PCollection(self.pipeline, df, False, False, self.windowing)

    def _fix_none_key(self):
        return self

    def count_globally(self) -> "PCollection":
        df = self.df.groupBy("win_start", "win_end").agg(
            F.count(F.lit(1)).alias("value"), F.max("event_time").alias("event_time")
        )
        return PCollection(self.pipeline, df, False, False, self.windowing)

    def keys(self) -> "PCollection":
        df = self.df.select(F.col("key").alias("value"), *_ENVELOPE_META)
        out = self._child(df, False, getattr(self, "key_pickled", self.pickled))
        return out

    def values(self) -> "PCollection":
        df = self.df.select("value", *_ENVELOPE_META)
        return self._child(df, False, self.pickled, self.grouped)

    # -- set ops / repartition ---------------------------------------------

    def flatten_with(self, *others: "PCollection") -> "PCollection":
        """Flatten/union; heterogeneous inputs transcode to the opaque
        pickled representation (reference transcodes coders the same way,
        translator.py:419-433, test ray_runner_test.py:838-855). No
        repartition(1) — the reference's union+repartition(1) would
        serialize at scale. Keyed inputs are re-viewed as (k, v) tuple
        values first (consistently, regardless of type homogeneity), so
        flattening KV collections never silently drops keys."""
        pcs = [pc.kv_to_tuples() if pc.keyed else pc for pc in [self, *others]]
        types = {pc.df.schema["value"].dataType.simpleString() for pc in pcs}
        hetero = len(types) > 1 or any(pc.pickled for pc in pcs) != all(pc.pickled for pc in pcs)
        if hetero:
            pcs = [pc if pc.pickled else pc.map(lambda x: x) for pc in pcs]
        df = pcs[0].df.select("value", *_ENVELOPE_META)
        for pc in pcs[1:]:
            df = df.unionByName(pc.df.select("value", *_ENVELOPE_META))
        return PCollection(self.pipeline, df, False, pcs[0].pickled, self.windowing)

    def reshuffle(self, num_partitions: int | None = None) -> "PCollection":
        """Redistribute elements (reference translator.py:147-154 uses
        random_shuffle; here a round-robin repartition — same fusion-break
        and skew-fix effect without a data sort)."""
        df = self.df.repartition(num_partitions) if num_partitions else self.df.repartition(
            self.df.sparkSession.sparkContext.defaultParallelism
        )
        return self._child(df, self.keyed, self.pickled, self.grouped)

    def distinct(self) -> "PCollection":
        cols = (["key"] if self.keyed else []) + ["value", "win_start", "win_end"]
        df = self.df.dropDuplicates(cols)
        return self._child(df, self.keyed, self.pickled, self.grouped)

    # -- sinks / testing -----------------------------------------------------

    def write_text(self, path: str):
        """Line-per-element text sink (reference WriteToText,
        examples/word_count_metrics.py:130-134). Runs bundle finalizers
        after the write commits (files durably moved into place)."""
        if self.pickled:
            raise ValueError("write_text requires typed (string-castable) values")
        self.df.select(F.col("value").cast("string")).write.mode("overwrite").text(path)
        self.pipeline.run_finalizers()

    def to_dataframe(self) -> DataFrame:
        return self.df

    def _collect_windowed(self, limit: int | None = None, what: str = "PCollection"):
        keyed, pickled, grouped = self.keyed, self.pickled, self.grouped
        src = self.df if limit is None else self.df.limit(limit + 1)
        collected = src.collect()
        if limit is not None and len(collected) > limit:
            raise ValueError(
                f"{what} materializes more than side_input_max_rows={limit} rows "
                f"on the driver; raise Pipeline(side_input_max_rows=...) (or the "
                f"RBRS_SIDE_INPUT_MAX_ROWS env var) if the side genuinely fits "
                f"driver memory, or switch to the join-based AsMultiMapJoined "
                f"view, which never leaves the executors"
            )
        rows = []
        for r in collected:
            d = r.asDict(recursive=True)
            elem = _decode_element(d, keyed, pickled, grouped, from_row=True)
            win = None if d.get("win_start") is None else (d["win_start"], d["win_end"])
            rows.append((elem, d["event_time"], win))
        self.pipeline.run_finalizers()  # post-commit bundle finalization
        return rows

    def collect(self) -> list:
        """Decoded elements (KV pairs as tuples; GBK values as lists)."""
        return [elem for elem, _ts, _win in self._collect_windowed()]

    def assert_that(self, expected: Iterable[Any], msg: str = ""):
        """Multiset equality on decoded elements (Beam assert_that/equal_to)."""
        actual = self.collect()
        ka = sorted((repr(_canon(e)) for e in actual))
        ke = sorted((repr(_canon(e)) for e in expected))
        if ka != ke:
            raise AssertionError(
                f"assert_that failed{': ' + msg if msg else ''}\n actual={sorted(map(repr, actual))}\n expected={sorted(map(repr, expected))}"
            )
        return True


def _canon(e):
    if isinstance(e, tuple):
        return tuple(_canon(x) for x in e)
    if isinstance(e, list):
        return tuple(sorted((repr(_canon(x)) for x in e)))
    return e


def _decode_element(d: dict, keyed: bool, pickled: bool, grouped: bool, from_row: bool = False):
    v = d["value"]
    if grouped:
        vals = list(v) if v is not None else []
        v = [_loads(x) if pickled else _from_np(x) for x in vals]
    elif pickled:
        v = _loads(v)
    else:
        v = _from_np(v)
    if keyed:
        k = d["key"]
        k = _loads(k) if isinstance(k, (bytes, bytearray)) else _from_np(k)
        return (k, v)
    return v


def _from_np(v):
    """numpy scalar/array → plain python (Arrow round-trip artifacts)."""
    import numpy as np

    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, np.ndarray):
        return [_from_np(x) for x in v.tolist()]
    return v


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------


class _ListAccumulator(AccumulatorParam):
    """Accumulator of lists (concatenation merge) — carries pickled
    bundle-finalization callbacks from executors to the driver."""

    def zero(self, value):
        return []

    def addInPlace(self, a, b):
        a.extend(b)
        return a


class Pipeline:
    """Entry point. Transforms build DataFrames eagerly (the lazy DAG is
    Catalyst's — reference CollectionMap parity per SURVEY §1.3)."""

    def __init__(self, spark: SparkSession, side_input_max_rows: int | None = None):
        self.spark = spark
        self.metrics = MetricsRegistry(spark)
        self._persisted: list[DataFrame] = []
        self._finalizer_acc = spark.sparkContext.accumulator([], _ListAccumulator())
        # Collect+broadcast side-input views drain the side through the
        # driver; this cap turns the silent driver-OOM a too-large side
        # causes into a loud error naming the scalable alternative
        # (AsMultiMapJoined). None -> the env/1M default; zero or negative
        # disables the guard entirely.
        if side_input_max_rows is None:
            side_input_max_rows = int(os.environ.get("RBRS_SIDE_INPUT_MAX_ROWS", "1000000"))
        self.side_input_max_rows = side_input_max_rows if side_input_max_rows > 0 else None
        self._transform_idx = 0

    def _next_label(self, kind: str, label: str | None) -> str:
        self._transform_idx += 1
        return label or f"{kind}{self._transform_idx}"

    def _observe_elements(self, name: str, df: DataFrame) -> DataFrame:
        """Auto per-PCollection element counts + byte sizes (reference
        ELEMENT_COUNT / SAMPLED_BYTE_SIZE monitoring infos,
        ray_fn_runner.py:462-534): an Observation aggregate piggybacked on
        the transform's own execution — no extra action, no extra pass.
        Byte size is the encoded value-column size (pickle/string length),
        summed only when the column is cheaply measurable (binary/string —
        the pickled default; typed values would need a to_json pass, which
        is not worth the hot-path cost the reference avoids by sampling).
        Surfaced as ``metrics.query()["element_counts"|"byte_counts"]``
        once an action has executed the plan. Streaming DataFrames don't
        take the Observation object form; they pass through unobserved."""
        if df.isStreaming:
            return df
        from pyspark.sql import Observation

        obs = Observation(name)
        aggs = [F.count(F.lit(1)).alias("element_count")]
        value_type = dict(df.dtypes).get("value")
        if value_type in ("binary", "string"):
            aggs.append(
                F.coalesce(F.sum(F.length("value")), F.lit(0)).alias("byte_count")
            )
        df = df.observe(obs, *aggs)
        self.metrics.track_observation(name, obs)
        return df

    def run_finalizers(self) -> int:
        """Invoke bundle-finalization callbacks accumulated from completed
        jobs (reference: FinalizeBundleRequest after bundle commit,
        execution.py:131-139). Called automatically by the terminal
        actions (collect / write_text); exceptions in callbacks are
        swallowed per Beam's best-effort contract (the reference's
        test_callbacks_with_exception asserts the pipeline still
        succeeds). Returns the number of callbacks invoked."""
        from pyspark import cloudpickle

        blobs, self._finalizer_acc.value = self._finalizer_acc.value, []
        n = 0
        for blob in blobs:
            try:
                cloudpickle.loads(blob)()
            except Exception:  # noqa: BLE001 - best-effort finalization
                pass
            n += 1
        return n

    def release(self):
        """Unpersist every DataFrame this pipeline cached (multi-output
        ParDo parents). Long-lived sessions should call this when a
        pipeline's results are no longer needed — leaked pins measurably
        degrade later queries."""
        for df in self._persisted:
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 - session may be stopped
                pass
        self._persisted.clear()

    def create(
        self,
        values: Iterable[Any],
        value_type: str | None = None,
        timestamp_fn: Callable | None = None,
    ) -> PCollection:
        """Materialize an in-memory list (reference Create,
        translator.py:105-119). ``value_type`` DDL → typed column; None →
        opaque pickled values (any Python object)."""
        values = list(values)
        ts = [float(timestamp_fn(v)) if timestamp_fn else GLOBAL_TS for v in values]
        if value_type is not None:
            v_t = T._parse_datatype_string(value_type)
            pickled = False
            data = [(v, t, None, None) for v, t in zip(values, ts)]
        else:
            v_t = T.BinaryType()
            pickled = True
            data = [(_dumps(v), t, None, None) for v, t in zip(values, ts)]
        schema = T.StructType(
            [
                T.StructField("value", v_t),
                T.StructField("event_time", T.DoubleType()),
                T.StructField("win_start", T.DoubleType()),
                T.StructField("win_end", T.DoubleType()),
            ]
        )
        df = self.spark.createDataFrame(data, schema=schema)
        return PCollection(self, df, False, pickled)

    def create_kv(
        self,
        pairs: Iterable[tuple],
        key_type: str | None = None,
        value_type: str | None = None,
        timestamp_fn: Callable | None = None,
    ) -> PCollection:
        pairs = list(pairs)
        ts = [float(timestamp_fn(p)) if timestamp_fn else GLOBAL_TS for p in pairs]
        k_t = T._parse_datatype_string(key_type) if key_type else T.BinaryType()
        v_t = T._parse_datatype_string(value_type) if value_type else T.BinaryType()
        data = [
            (
                k if key_type else _dumps(k),
                v if value_type else _dumps(v),
                t,
                None,
                None,
            )
            for (k, v), t in zip(pairs, ts)
        ]
        schema = T.StructType(
            [
                T.StructField("key", k_t),
                T.StructField("value", v_t),
                T.StructField("event_time", T.DoubleType()),
                T.StructField("win_start", T.DoubleType()),
                T.StructField("win_end", T.DoubleType()),
            ]
        )
        df = self.spark.createDataFrame(data, schema=schema)
        out = PCollection(self, df, True, value_type is None)
        out.key_pickled = key_type is None
        return out

    def impulse(self) -> PCollection:
        """Single seed element (reference translator.py:95-102)."""
        df = self.spark.range(1).select(
            F.lit(_dumps(None)).alias("value"),
            F.lit(GLOBAL_TS).alias("event_time"),
            F.lit(None).cast("double").alias("win_start"),
            F.lit(None).cast("double").alias("win_end"),
        )
        return PCollection(self, df, False, True)

    def read_text(self, path: str, skip_header_lines: int = 0) -> PCollection:
        """Text source, one element per line (reference translator.py:122-144
        including the header-skip at 138-140)."""
        df = self.spark.read.text(path)
        if skip_header_lines:
            # Per-file header skip as pure expressions (no Python RDD path):
            # header lines live only in the byte-range split that starts at
            # file offset 0, so rank rows within each (file, block) by
            # monotonically_increasing_id — increasing in read order inside a
            # partition, and a file-block's rows are contiguous in its
            # partition — and drop the first N of offset-0 blocks only.
            # Only the offset-0 blocks route through the window (headers
            # cannot live anywhere else); every other block unions back
            # untouched, so the ranking shuffle moves one leading split per
            # file, not the dataset — at 100 TB that is (files x <=128MB),
            # independent of total rows. Bound: if skip_header_lines ever
            # exceeded the line count of a file's first split
            # (multi-megabyte headers or a tiny files.maxPartitionBytes),
            # the overflow header lines would start in later blocks and
            # survive; with default 128 MB splits any realistic header fits
            # the first split, and readers needing more should strip
            # headers upstream.
            tagged = df.select(
                "value",
                F.col("_metadata.file_path").alias("_fp"),
                F.col("_metadata.file_block_start").alias("_bs"),
                F.monotonically_increasing_id().alias("_mid"),
            )
            w = W.partitionBy("_fp").orderBy("_mid")
            lead = (
                tagged.filter(F.col("_bs") == 0)
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") > skip_header_lines)
                .select("value")
            )
            df = lead.unionAll(tagged.filter(F.col("_bs") != 0).select("value"))
        out = df.select(
            F.col("value").cast("string").alias("value"),
            F.lit(GLOBAL_TS).alias("event_time"),
            F.lit(None).cast("double").alias("win_start"),
            F.lit(None).cast("double").alias("win_end"),
        )
        return PCollection(self, out, False, False)

    def from_dataframe(self, df: DataFrame, value_col: str, event_time_col: str | None = None):
        """Bridge: wrap any DataFrame column as a PCollection."""
        out = df.select(
            F.col(value_col).alias("value"),
            (F.col(event_time_col).cast("double") if event_time_col else F.lit(GLOBAL_TS)).alias(
                "event_time"
            ),
            F.lit(None).cast("double").alias("win_start"),
            F.lit(None).cast("double").alias("win_end"),
        )
        return PCollection(self, out, False, False)
