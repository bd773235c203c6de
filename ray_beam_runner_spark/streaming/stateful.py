"""Streaming stateful processing: per-key state + timers on live streams.

This is the unbounded twin of :mod:`ray_beam_runner_spark.state` (batch
applyInPandas). Two backends:

- ``transformWithStateInPandas`` (Spark 4.x): ValueState/ListState/MapState
  + native event-time timers on the RocksDB state store with changelog
  checkpointing — replacing the reference's single in-memory state actor
  (`/root/reference/ray_beam_runner/portability/state.py:58-88`), which it
  itself flags as a scalability bottleneck. Timer register/delete maps 1:1
  to the reference's set/clear-bit handling
  (`portability/ray_fn_runner.py:385-459`). REQUIRES google.protobuf in
  the Python workers — gated by :func:`tws_available` (this container
  lacks it; the implementation is exercised wherever protobuf exists).
- ``applyInPandasWithState`` (Spark 3.x API, Arrow-only — works here):
  per-key GroupState with event-time timeouts; used by
  :func:`running_aggregate`, the canonical streaming-stateful operator
  (streaming shape of reference tests ray_runner_test.py:363-393,508-575).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState

REQUIRED_CONF = {
    # transformWithState requires the RocksDB provider.
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
}


def tws_available() -> bool:
    """transformWithStateInPandas needs protobuf in the Python workers."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def configure_for_stateful(spark) -> None:
    for k, v in REQUIRED_CONF.items():
        spark.conf.set(k, v)


_DURATION_UNITS = {
    "millisecond": 1,
    "second": 1000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
}


def _duration_ms(s: str) -> int:
    """Parse a Spark-style duration string ('10 minutes') to milliseconds."""
    n, unit = s.strip().split()
    return int(float(n) * _DURATION_UNITS[unit.rstrip("s").lower()])


# ---------------------------------------------------------------------------
# applyInPandasWithState backend (works without protobuf)
# ---------------------------------------------------------------------------


def running_aggregate(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str | None = None,
    watermark_delay: str = "10 minutes",
    inactivity_timeout: bool = False,
) -> DataFrame:
    """Per-key running (count, sum) over an unbounded stream.

    State = one (cnt, total, last_ms) tuple per key in the state store
    (last_ms = the key's max observed event time, epoch ms). With
    ``inactivity_timeout`` (requires ts_col), an event-time timeout fires
    once the watermark passes the key's last observed event time plus
    ``watermark_delay`` — a true inactivity gap, not next-batch flush —
    and emits a final flush row then clears state (the timer-flush
    pattern of the reference's stateful tests). Output rows: key, cnt,
    total, final.
    """
    delay_ms = _duration_ms(watermark_delay)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            if state.exists:
                cnt, total, _last = state.get
                yield pd.DataFrame({"key": [key[0]], "cnt": [cnt], "total": [total], "final": [True]})
            state.remove()
            return
        cnt, total, last_ms = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf[value_col].sum())
            if inactivity_timeout and len(pdf):
                batch_max = pd.Timestamp(pdf[ts_col].max())
                last_ms = max(last_ms, int(batch_max.timestamp() * 1000))
        state.update((cnt, total, last_ms))
        if inactivity_timeout:
            # fire once the watermark passes last-seen + gap; Spark
            # requires the timeout to sit beyond the current watermark
            state.setTimeoutTimestamp(
                max(last_ms + delay_ms, state.getCurrentWatermarkMs() + 1)
            )
        yield pd.DataFrame({"key": [key[0]], "cnt": [cnt], "total": [total], "final": [False]})

    src = stream
    timeout = "NoTimeout"
    if ts_col is not None:
        src = stream.withWatermark(ts_col, watermark_delay)
        if inactivity_timeout:
            timeout = "EventTimeTimeout"
    return src.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType="key string, cnt long, total double, final boolean",
        stateStructType="cnt long, total double, last_ms long",
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas backend. The PROCESSOR is protobuf-free —
# pyspark's StatefulProcessor ABC imports cleanly; only the runtime
# state-server client needs protobuf — so the state/timer LOGIC executes
# in this container against the mock-handle conformance harness in
# tests/test_streaming_stateful.py (reference cases
# ray_runner_test.py:363-393,428-602: running state, timer re-set
# dedupe, clear semantics). Only the engine wiring
# (running_aggregate_tws) stays gated on tws_available().
# ---------------------------------------------------------------------------

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class RunningCountProcessor(StatefulProcessor):
    """Per-key running count + sum with an optional inactivity timer
    that emits a final flush row and clears state."""

    def __init__(self, value_col: str, inactivity_ms: int | None = None):
        self.value_col = value_col
        self.inactivity_ms = inactivity_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.count_state = handle.getValueState("count", "cnt long")
        self.sum_state = handle.getValueState("sum", "s double")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, s = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            s += float(pdf[self.value_col].sum())
        prev = self.count_state.get()
        n += prev[0] if prev else 0
        prev_s = self.sum_state.get()
        s += prev_s[0] if prev_s else 0.0
        self.count_state.update((n,))
        self.sum_state.update((s,))
        if self.inactivity_ms is not None:
            for t in self.handle.listTimers():
                self.handle.deleteTimer(t)  # re-set = dedupe
            self.handle.registerTimer(
                timerValues.getCurrentWatermarkInMs() + self.inactivity_ms
            )
        yield pd.DataFrame({"key": [key[0]], "cnt": [n], "total": [s], "final": [False]})

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo) -> Iterator[pd.DataFrame]:
        prev = self.count_state.get()
        if prev:
            s = self.sum_state.get()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "cnt": [prev[0]],
                    "total": [s[0] if s else 0.0],
                    "final": [True],
                }
            )
        self.count_state.clear()
        self.sum_state.clear()

    def close(self) -> None:
        pass

def running_aggregate_tws(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str | None = None,
    watermark_delay: str = "10 minutes",
    inactivity_ms: int | None = None,
) -> DataFrame:
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs google.protobuf in the "
            "Python workers (absent here; see COVERAGE.md). The "
            "processor logic itself is conformance-tested via the "
            "mock-handle harness; the executable engine backend is "
            "running_aggregate (applyInPandasWithState)."
        )
    configure_for_stateful(stream.sparkSession)
    src = stream
    time_mode = "none"
    if ts_col is not None and inactivity_ms is not None:
        src = stream.withWatermark(ts_col, watermark_delay)
        time_mode = "eventTime"
    return src.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningCountProcessor(value_col, inactivity_ms),
        outputStructType="key string, cnt long, total double, final boolean",
        outputMode="append",
        timeMode=time_mode,
    )
