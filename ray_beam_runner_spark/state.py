"""Stateful ParDo with per-key state cells and event-time timers.

Reference parity (SURVEY.md §2.5): Bag / CombiningValue / ReadModifyWrite
state cells stored per key in a state actor
(`/root/reference/ray_beam_runner/portability/state.py:58-88`), event-time
timers collected, deduped per (key, tag, window), clear-bits honored, and
re-injected by the runner loop
(`portability/ray_fn_runner.py:268-297, 385-459`); tests
`portability/ray_runner_test.py:363-602` (state 363-393/508-575, timers
428-602 incl. clearing 461-497 and dynamic tags 577-602). The reference
allows only EVENT_TIME timers (ray_fn_runner.py:98-100) — so do we.

Spark mapping:
- Batch (this module's default): ``applyInPandas`` over key groups. Within
  a group, elements are processed in event-time order; the watermark then
  advances to +inf, firing remaining timers in time order — exactly the
  semantics a batch Beam runner gives a stateful DoFn. State lives in
  plain per-key Python objects during the group visit (no cross-batch
  state needed in batch mode: a key's whole history is present).
- Streaming: ``transformWithStateInPandas`` (Spark 4.x) hosts the same
  StatefulDoFn with ValueState/ListState + native event-time timers —
  see streaming/stateful.py.

Timer semantics implemented: set (re-set replaces — dedupe at
ray_fn_runner.py:429-442), clear (clear-bit), dynamic tags, timers firing
may set further timers (processed in watermark order).
"""

from __future__ import annotations

import heapq
import itertools
import pickle
from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import types as T

_PICKLE = pickle.HIGHEST_PROTOCOL


def _dumps(v) -> bytes:
    return pickle.dumps(v, protocol=_PICKLE)


def _loads(b) -> Any:
    return pickle.loads(bytes(b))


class BagState:
    """Append-only bag (reference test ray_runner_test.py:514-543)."""

    def __init__(self):
        self._items: list = []

    def add(self, v):
        self._items.append(v)

    def read(self) -> list:
        return list(self._items)

    def clear(self):
        self._items = []


class ValueState:
    """ReadModifyWrite cell (ray_runner_test.py:365-367)."""

    def __init__(self):
        self._v = None
        self._set = False

    def write(self, v):
        self._v, self._set = v, True

    def read(self, default=None):
        return self._v if self._set else default

    def clear(self):
        self._v, self._set = None, False


class CombiningState:
    """CombiningValue cell (ray_runner_test.py:364, 430, 443): accumulates
    with a binary combine_fn (e.g. sum)."""

    def __init__(self, combine_fn, zero):
        self._fn = combine_fn
        self._zero = zero
        self._acc = zero

    def add(self, v):
        self._acc = self._fn(self._acc, v)

    def read(self):
        return self._acc

    def clear(self):
        self._acc = self._zero


class Timers:
    """Event-time timer facade handed to the DoFn. set() on an existing
    tag replaces it (runner dedupe, ray_fn_runner.py:429-442); clear()
    removes it (clear-bit, tests 461-497). Tags are dynamic strings
    (tests 577-602)."""

    def __init__(self):
        self._pending: dict[str, float] = {}

    def set(self, tag: str, ts: float):
        self._pending[tag] = float(ts)

    def clear(self, tag: str):
        self._pending.pop(tag, None)


class StatefulDoFn:
    """Per-key stateful DoFn.

    - ``create_states() -> dict[str, state]``: declare named state cells.
    - ``process(key, value, timestamp, states, timers)``: per element;
      yields outputs.
    - ``on_timer(key, tag, fire_ts, states, timers)``: timer callback;
      yields outputs; may set/clear further timers.
    """

    def create_states(self) -> dict[str, Any]:
        return {}

    def process(self, key, value, timestamp, states, timers) -> Iterable[Any]:
        raise NotImplementedError

    def on_timer(self, key, tag, fire_ts, states, timers) -> Iterable[Any]:
        return ()


def run_stateful_batch(pcoll, dofn: StatefulDoFn, output_type: str | None = None):
    """Apply a StatefulDoFn to a keyed PCollection in batch mode.

    One shuffle on key (applyInPandas); within each key group elements are
    visited in (event_time, arrival) order, interleaved with timers whose
    fire time has been passed; at end-of-input the watermark goes to +inf
    and remaining timers fire in time order. Output is a PCollection of
    the yielded values (pickled unless output_type given).
    """
    from ray_beam_runner_spark.pipeline import PCollection

    if not pcoll.keyed:
        raise ValueError("stateful ParDo requires a keyed PCollection")
    out_pickled = output_type is None
    v_t = T._parse_datatype_string(output_type) if output_type else T.BinaryType()
    schema = T.StructType(
        [
            T.StructField("value", v_t),
            T.StructField("event_time", T.DoubleType()),
            T.StructField("win_start", T.DoubleType()),
            T.StructField("win_end", T.DoubleType()),
        ]
    )
    key_pickled = getattr(pcoll, "key_pickled", pcoll.pickled)
    val_pickled = pcoll.pickled

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        raw_key = pdf["key"].iloc[0]
        key = _loads(raw_key) if key_pickled else raw_key
        states = dofn.create_states()
        timers = Timers()
        out_rows: list = []

        def emit(vals, ts):
            for v in vals or ():
                out_rows.append((_dumps(v) if out_pickled else v, ts, None, None))

        def fire_due(watermark: float):
            # Fire all timers with fire_ts <= watermark in time order;
            # callbacks may set new timers, also honored within the bound.
            while True:
                due = [(ts, tag) for tag, ts in timers._pending.items() if ts <= watermark]
                if not due:
                    return
                heapq.heapify(due)
                ts, tag = heapq.heappop(due)
                timers._pending.pop(tag, None)
                emit(dofn.on_timer(key, tag, ts, states, timers), ts)

        order = sorted(
            range(len(pdf)), key=lambda i: (pdf["event_time"].iloc[i], i)
        )
        for i in order:
            ts = float(pdf["event_time"].iloc[i])
            # Watermark has reached this element's timestamp.
            fire_due(ts)
            v = pdf["value"].iloc[i]
            v = _loads(v) if val_pickled else v
            emit(dofn.process(key, v, ts, states, timers), ts)
        fire_due(float("inf"))
        return pd.DataFrame(out_rows, columns=["value", "event_time", "win_start", "win_end"])

    df = pcoll.df.groupBy("key").applyInPandas(run_group, schema=schema)
    return PCollection(pcoll.pipeline, df, False, out_pickled, pcoll.windowing)
