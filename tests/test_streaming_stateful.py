"""Streaming stateful tests (the unbounded twin of tests/test_state.py;
reference state scenarios ray_runner_test.py:363-602 on a live stream).

Two backends share one conformance suite: applyInPandasWithState always
runs; the transformWithStateInPandas tests execute wherever protobuf is
importable (importorskip — absent in this container, active on any
standard cluster image) and assert the SAME final-totals contract, so the
tWS processor's state/timer logic is demonstrated, not just asserted,
as soon as the dependency exists."""

import pytest
from pyspark.sql import functions as F

from ray_beam_runner_spark.streaming import FileDropStream, run_to_memory
from ray_beam_runner_spark.streaming.stateful import running_aggregate


def _keyed_stream(spark, tmp_path, name, n=30, gap_s=1):
    rows = [(f"k{idx % 3}", float(idx), 1700000000 + idx * gap_s) for idx in range(n)]
    df = spark.createDataFrame(rows, "key string, v double, epoch long").withColumn(
        "ts", F.timestamp_seconds(F.col("epoch"))
    ).drop("epoch")
    stream = (
        FileDropStream(spark, str(tmp_path / name))
        .write_slices(df, "ts", n_slices=3)
        .read_stream()
    )
    return df, stream


def _final_totals(rows_out):
    final = {}
    for r in rows_out:
        if r.cnt >= final.get(r.key, (0, 0.0))[0]:
            final[r.key] = (r.cnt, r.total)
    return final


def _expected_totals(df):
    return {
        r.key: (r.cnt, r.total)
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("total"))
        .collect()
    }


def test_tws_running_aggregate(spark, tmp_path):
    # reference running-count state case (ray_runner_test.py:363-393) on
    # the transformWithStateInPandas backend: ValueState carried across
    # micro-batches, last emission per key == batch aggregate
    pytest.importorskip("google.protobuf")
    from ray_beam_runner_spark.streaming.stateful import running_aggregate_tws

    df, stream = _keyed_stream(spark, tmp_path, "tws_run")
    got = run_to_memory(running_aggregate_tws(stream, "key", "v"), "append")
    assert _final_totals(got.collect()) == _expected_totals(df)


def test_tws_inactivity_timer_flush(spark, tmp_path):
    # reference timer set/re-set/clear cases (ray_runner_test.py:428-602):
    # each batch re-registers the key's single inactivity timer (delete +
    # register = re-set semantics); once the watermark passes last-seen +
    # inactivity the timer fires EXACTLY once per key, emits the final
    # flush row, and clears state
    pytest.importorskip("google.protobuf")
    from ray_beam_runner_spark.streaming.stateful import running_aggregate_tws

    df, stream = _keyed_stream(spark, tmp_path, "tws_timer", gap_s=1)
    out = running_aggregate_tws(
        stream, "key", "v", ts_col="ts",
        watermark_delay="2 seconds", inactivity_ms=2000,
    )
    rows = run_to_memory(out, "append").collect()
    finals = [r for r in rows if r.final]
    # one flush per key, carrying the full per-key totals
    assert sorted(r.key for r in finals) == sorted(_expected_totals(df))
    for r in finals:
        assert (r.cnt, r.total) == _expected_totals(df)[r.key]


def test_running_aggregate_stream(spark, tmp_path):
    rows = [(f"k{idx % 3}", float(idx), 1700000000 + idx) for idx in range(30)]
    df = spark.createDataFrame(rows, "key string, v double, epoch long").withColumn(
        "ts", F.timestamp_seconds(F.col("epoch"))
    ).drop("epoch")
    stream = (
        FileDropStream(spark, str(tmp_path / "drop_tws"))
        .write_slices(df, "ts", n_slices=3)
        .read_stream()
    )
    out = running_aggregate(stream, "key", "v")
    got = run_to_memory(out, output_mode="append")
    rows_out = got.collect()
    # per-key rows are emitted per micro-batch with RUNNING totals; the last
    # emission per key must equal the batch-computed total
    final = {}
    for r in rows_out:
        if r.cnt >= final.get(r.key, (0, 0.0))[0]:
            final[r.key] = (r.cnt, r.total)
    expected = {
        r.key: (r.cnt, r.total)
        for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("total")).collect()
    }
    assert final == expected, (final, expected)


# ---------------------------------------------------------------------------
# tWS processor conformance WITHOUT protobuf: the StatefulProcessor ABC
# is pure Python, so the state/timer LOGIC executes here against a
# mock handle implementing the engine's contract (per-key-scoped state,
# timer register/delete/list, expiry once the watermark passes). Only
# the engine wiring (transformWithStateInPandas itself) stays gated.
# Mirrors reference cases ray_runner_test.py:363-393 (running state)
# and 428-602 (timer set/re-set/clear dedupe).
# ---------------------------------------------------------------------------


class _MockTimerValues:
    def __init__(self, wm_ms):
        self._wm = wm_ms

    def getCurrentWatermarkInMs(self):
        return self._wm

    def getCurrentProcessingTimeInMs(self):
        return self._wm


class _MockExpiredTimerInfo:
    def __init__(self, ts):
        self._ts = ts

    def getExpiryTimeInMs(self):
        return self._ts


class _MockHandle:
    """Engine-contract double: state cells scoped to the current key,
    timers per key, optional per-cell TTL against the batch clock
    (tWS TTL is processing-time: a value expires ttlDurationMs after
    its last update), no protobuf anywhere."""

    def __init__(self):
        self.store = {}
        self.stamps = {}  # (name, key) -> last-update time (for TTL)
        self.timers = {}
        self.key = None
        self.now_ms = 0  # batch clock, set by the harness

    def getValueState(self, name, schema, ttlDurationMs=None):
        handle = self

        class _VS:
            def _expired(self):
                if ttlDurationMs is None:
                    return False
                stamp = handle.stamps.get((name, handle.key))
                return (
                    stamp is not None
                    and handle.now_ms - stamp >= ttlDurationMs
                )

            def get(self):
                if self._expired():
                    return None
                return handle.store.get((name, handle.key))

            def update(self, v):
                handle.store[(name, handle.key)] = tuple(v)
                handle.stamps[(name, handle.key)] = handle.now_ms

            def clear(self):
                handle.store.pop((name, handle.key), None)
                handle.stamps.pop((name, handle.key), None)

            def exists(self):
                return not self._expired() and (name, handle.key) in handle.store

        return _VS()

    def registerTimer(self, ts):
        self.timers.setdefault(self.key, set()).add(int(ts))

    def deleteTimer(self, ts):
        self.timers.get(self.key, set()).discard(int(ts))

    def listTimers(self):
        return list(self.timers.get(self.key, set()))


def _run_mock_batches(processor, batches):
    """Drive the processor through micro-batches: for each (key->pdfs,
    watermark) step, feed input rows, then fire every timer the
    watermark passed — GLOBALLY ordered by (timestamp, key) across all
    keys, the engine's expiry order — each exactly once, removed on
    fire."""
    handle = _MockHandle()
    processor.init(handle)
    out = []
    for batch, wm in batches:
        handle.now_ms = wm
        tv = _MockTimerValues(wm)
        for key, pdfs in batch.items():
            handle.key = (key,)
            out.extend(processor.handleInputRows((key,), iter(pdfs), tv))
        due = sorted(
            (ts, key)
            for key, ts_set in handle.timers.items()
            for ts in ts_set
            if ts < wm
        )
        for ts, key in due:
            if ts not in handle.timers.get(key, set()):
                continue  # deleted by an earlier expiry callback
            handle.key = key
            out.extend(
                processor.handleExpiredTimer(
                    key, _MockTimerValues(wm), _MockExpiredTimerInfo(ts)
                )
            )
            handle.timers[key].discard(ts)
    import pandas as pd

    return (
        pd.concat(out, ignore_index=True) if out else pd.DataFrame()
    ), handle


def _pdf(vals):
    import pandas as pd

    return pd.DataFrame({"v": vals})


def test_tws_processor_running_state_across_batches():
    from ray_beam_runner_spark.streaming.stateful import RunningCountProcessor

    out, handle = _run_mock_batches(
        RunningCountProcessor("v"),
        [
            ({"a": [_pdf([1.0, 2.0])], "b": [_pdf([10.0])]}, 0),
            ({"a": [_pdf([3.0]), _pdf([4.0])]}, 0),  # two pdfs, one batch
            ({"b": [_pdf([20.0])]}, 0),
        ],
    )
    per_key = {
        k: g.sort_values("cnt").iloc[-1]
        for k, g in out.groupby("key")
    }
    assert (per_key["a"].cnt, per_key["a"].total) == (4, 10.0)
    assert (per_key["b"].cnt, per_key["b"].total) == (2, 30.0)
    # running emissions: 'a' emitted cnt=2 then cnt=4 (state carried)
    assert sorted(out[out.key == "a"].cnt) == [2, 4]


def test_tws_processor_timer_reset_dedupe_and_flush_once():
    from ray_beam_runner_spark.streaming.stateful import RunningCountProcessor

    proc = RunningCountProcessor("v", inactivity_ms=1000)
    out, handle = _run_mock_batches(
        proc,
        [
            ({"a": [_pdf([1.0])]}, 0),      # registers timer @1000
            ({"a": [_pdf([2.0])]}, 500),    # RE-SETS (delete+register @1500)
            ({}, 2000),                     # watermark passes: flush fires
            ({}, 5000),                     # nothing left: no second flush
        ],
    )
    finals = out[out.final]
    assert len(finals) == 1                     # re-set dedupe: ONE flush
    assert (finals.iloc[0].cnt, finals.iloc[0].total) == (2, 3.0)
    assert handle.store == {}                   # state cleared on flush
    assert handle.timers.get(("a",), set()) == set()
    # after at most one timer existed at any time (delete-then-register)
    # a fresh key restart counts from zero (reference clear semantics)
    out2, _ = _run_mock_batches(
        RunningCountProcessor("v", inactivity_ms=1000),
        [({"a": [_pdf([7.0])]}, 0)],
    )
    assert (out2.iloc[0].cnt, out2.iloc[0].total) == (1, 7.0)


def test_tws_processor_expired_timer_without_state_is_silent():
    from ray_beam_runner_spark.streaming.stateful import RunningCountProcessor

    proc = RunningCountProcessor("v", inactivity_ms=10)
    handle = _MockHandle()
    proc.init(handle)
    handle.key = ("ghost",)
    handle.registerTimer(5)
    rows = list(
        proc.handleExpiredTimer(("ghost",), _MockTimerValues(100), _MockExpiredTimerInfo(5))
    )
    assert rows == []  # no state -> no flush row, just cleanup


def test_tws_engine_wiring_raises_cleanly_without_protobuf():
    from ray_beam_runner_spark.streaming.stateful import (
        running_aggregate_tws,
        tws_available,
    )

    if tws_available():
        pytest.skip("protobuf present; wiring covered by test_tws_running_aggregate")
    with pytest.raises(NotImplementedError, match="protobuf"):
        running_aggregate_tws(None, "key", "v")


def test_tws_processor_dynamic_timers_fire_each_once_in_order():
    # reference test_pardo_dynamic_timer (ray_runner_test.py:577-602):
    # one key arms MULTIPLE independent timers; each fires exactly once,
    # in timestamp order, and firing one must not disturb the others.
    # tWS expresses dynamic tags as distinct timer timestamps per key.
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class MultiTimerProcessor(StatefulProcessor):
        def init(self, handle):
            self.handle = handle
            self.seen = handle.getValueState("seen", "n long")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            for pdf in rows:
                for ts in pdf["fire_at"]:
                    self.handle.registerTimer(int(ts))
            self.seen.update((len(self.handle.listTimers()),))
            yield pd.DataFrame({"key": [key[0]], "event": ["armed"], "ts": [-1]})

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            import pandas as pd

            yield pd.DataFrame(
                {"key": [key[0]], "event": ["fired"],
                 "ts": [expiredTimerInfo.getExpiryTimeInMs()]}
            )

        def close(self):
            pass

    import pandas as pd

    out, handle = _run_mock_batches(
        MultiTimerProcessor(),
        [
            ({"a": [pd.DataFrame({"fire_at": [100, 300]})]}, 0),
            ({"a": [pd.DataFrame({"fire_at": [200]})]}, 150),  # 100 fires first
            ({}, 250),   # 200 fires
            ({}, 1000),  # 300 fires
            ({}, 2000),  # nothing left: no re-fires
        ],
    )
    fired = out[out.event == "fired"]
    assert list(fired.key) == ["a", "a", "a"]
    assert list(fired.ts) == [100, 200, 300]  # each once, timestamp order
    # batch 2 armed its new timer while 100 and 300 were still live:
    # all three coexisted (the harness feeds input before expiry)
    assert handle.store[("seen", ("a",))][0] == 3


def test_tws_processor_timer_clear_bit_across_batches():
    # reference clear-bit dedupe (ray_fn_runner.py:429-442): a timer SET
    # in one batch and CLEARED in a later batch (before its time) must
    # never fire; a subsequent re-set fires at the NEW time exactly once
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    import pandas as pd

    class ClearableTimerProcessor(StatefulProcessor):
        def init(self, handle):
            self.handle = handle

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                for action, ts in zip(pdf["action"], pdf["ts"]):
                    if action == "set":
                        self.handle.registerTimer(int(ts))
                    else:  # "clear"
                        self.handle.deleteTimer(int(ts))
            return iter(())

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            yield pd.DataFrame(
                {"key": [key[0]], "event": ["fired"],
                 "ts": [expiredTimerInfo.getExpiryTimeInMs()]}
            )

        def close(self):
            pass

    def act(action, ts):
        return pd.DataFrame({"action": [action], "ts": [ts]})

    out, handle = _run_mock_batches(
        ClearableTimerProcessor(),
        [
            ({"a": [act("set", 100)]}, 0),
            ({"a": [act("clear", 100)]}, 50),   # cleared BEFORE expiry
            ({}, 500),                          # wm passes 100: no fire
            ({"a": [act("set", 600)]}, 500),    # re-set at a new time
            ({}, 1000),                         # fires once at 600
            ({}, 2000),                         # no re-fire
        ],
    )
    fired = out[out.event == "fired"] if len(out) else out
    assert len(fired) == 1 and list(fired.ts) == [600]
    assert handle.timers.get(("a",), set()) == set()


def test_tws_processor_combining_value_rmw():
    # reference CombiningValueStateSpec sum-combiner case
    # (ray_runner_test.py:363-393): read-modify-write an accumulating
    # cell across batches; clear resets the accumulator to identity
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    import pandas as pd

    class CombiningCellProcessor(StatefulProcessor):
        def init(self, handle):
            self.cell = handle.getValueState("acc", "s double")

        def handleInputRows(self, key, rows, timerValues):
            add, reset = 0.0, False
            for pdf in rows:
                if "reset" in pdf.columns and pdf["reset"].any():
                    reset = True
                add += float(pdf["v"].sum())
            if reset:
                self.cell.clear()  # adds in a reset batch apply after
            prev = self.cell.get()
            combined = (prev[0] if prev else 0.0) + add  # RMW: read, combine, write
            self.cell.update((combined,))
            yield pd.DataFrame({"key": [key[0]], "combined": [combined]})

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            return iter(())

        def close(self):
            pass

    def vals(*v, reset=False):
        return pd.DataFrame({"v": list(v), "reset": [reset] * len(v)})

    out, _ = _run_mock_batches(
        CombiningCellProcessor(),
        [
            ({"a": [vals(1.0, 2.0)]}, 0),            # 3
            ({"a": [vals(3.0), vals(4.0)]}, 0),      # 10 (two pdfs, one RMW)
            ({"b": [vals(5.0)]}, 0),                 # b isolated: 5
            ({"a": [vals(0.0, reset=True)]}, 0),     # clear -> identity
            ({"a": [vals(7.0)]}, 0),                 # counts from zero
        ],
    )
    assert list(out[out.key == "a"].combined) == [3.0, 10.0, 0.0, 7.0]
    assert list(out[out.key == "b"].combined) == [5.0]


def test_tws_processor_state_ttl_expires():
    # TTL state: a value written with ttlDurationMs is readable before
    # the deadline and GONE after it — the processor restarts its count
    # without any explicit clear
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    import pandas as pd

    class TtlCountProcessor(StatefulProcessor):
        def init(self, handle):
            self.cnt = handle.getValueState("cnt", "n long", ttlDurationMs=1000)

        def handleInputRows(self, key, rows, timerValues):
            n = sum(len(pdf) for pdf in rows)
            prev = self.cnt.get()  # None once TTL has lapsed
            n += prev[0] if prev else 0
            self.cnt.update((n,))
            yield pd.DataFrame({"key": [key[0]], "cnt": [n]})

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            return iter(())

        def close(self):
            pass

    out, _ = _run_mock_batches(
        TtlCountProcessor(),
        [
            ({"a": [_pdf([1.0])]}, 0),     # cnt=1, stamped t=0
            ({"a": [_pdf([1.0])]}, 500),   # within TTL: cnt=2, re-stamped
            ({"a": [_pdf([1.0])]}, 1200),  # within TTL of t=500: cnt=3
            ({"a": [_pdf([1.0])]}, 9000),  # TTL lapsed: restart at 1
        ],
    )
    assert list(out.cnt) == [1, 2, 3, 1]


def test_tws_processor_interleaved_multikey_timer_order():
    # timers across DIFFERENT keys must fire in global timestamp order
    # within a batch (the engine's expiry order), interleaving keys —
    # per-key-then-time ordering would be wrong
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    import pandas as pd

    class ArmProcessor(StatefulProcessor):
        def init(self, handle):
            self.handle = handle

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                for ts in pdf["fire_at"]:
                    self.handle.registerTimer(int(ts))
            return iter(())

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            yield pd.DataFrame(
                {"key": [key[0]], "ts": [expiredTimerInfo.getExpiryTimeInMs()]}
            )

        def close(self):
            pass

    out, _ = _run_mock_batches(
        ArmProcessor(),
        [
            (
                {
                    "a": [pd.DataFrame({"fire_at": [100, 200]})],
                    "b": [pd.DataFrame({"fire_at": [50, 150]})],
                },
                0,
            ),
            ({}, 1000),  # all four due: global (ts, key) order
        ],
    )
    assert list(zip(out.key, out.ts)) == [
        ("b", 50), ("a", 100), ("b", 150), ("a", 200)
    ]
