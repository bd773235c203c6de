"""Splittable custom sources via the Python Data Source API (Spark 4).

Reference parity (SURVEY.md §2.1): the reference supports splittable DoFn
sources — user sources with restrictions the runner can split and
checkpoint (`/root/reference/ray_beam_runner/portability/ray_runner_test.py:604-819`;
delayed-application plumbing `portability/execution.py:211-241`; drain
truncation `ray_fn_runner.py:131-196`). The idiomatic Spark analog is the
Data Source API:

- restriction splitting  → ``DataSourceReader.partitions()`` returning one
  ``InputPartition`` per restriction chunk (runner-side parallel split).
- restriction checkpointing / resume → ``DataSourceStreamReader``
  offsets: ``initialOffset``/``latestOffset`` bound each micro-batch and
  are committed after durable processing (``commit``).
- drain → ``Trigger.AvailableNow`` consumes up to the current latest
  offset and stops (reference drain tests ray_runner_test.py:761-819).

``ExpandStringsDataSource`` mirrors the reference's canonical SDF test
(strings → one element per char, split into ~size-bounded chunks):
register + ``spark.read.format("expand_strings")``.
``CounterStreamDataSource`` is the unbounded analog with resumable
offsets: each micro-batch emits the range [start, end) decided by the
engine from the committed offset.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType


class _CharChunk(InputPartition):
    def __init__(self, s: str, start: int, end: int):
        self.s = s
        self.start = start
        self.end = end


class _ExpandStringsReader(DataSourceReader):
    def __init__(self, options):
        self.strings = json.loads(options.get("strings", "[]"))
        self.chunk = int(options.get("chunk", "4"))

    def partitions(self):
        # One partition per ~chunk-char restriction slice — the split the
        # reference's RestrictionProvider performs (ray_runner_test.py:1966-2024).
        parts = []
        for s in self.strings:
            for i in range(0, max(len(s), 1), self.chunk):
                parts.append(_CharChunk(s, i, min(i + self.chunk, len(s))))
        return parts

    def read(self, partition: _CharChunk):
        for i in range(partition.start, partition.end):
            yield (partition.s, i, partition.s[i])


class ExpandStringsDataSource(DataSource):
    """strings → (source_string, pos, char), split into chunked restrictions."""

    @classmethod
    def name(cls):
        return "expand_strings"

    def schema(self):
        return StructType(
            [
                StructField("source", StringType()),
                StructField("pos", IntegerType()),
                StructField("char", StringType()),
            ]
        )

    def reader(self, schema):
        return _ExpandStringsReader(self.options)


class _RangeChunk(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _CounterStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsPerBatch", "10"))
        self.max_value = int(options.get("maxValue", "100"))
        self._current = 0

    def initialOffset(self):
        return {"offset": 0}

    def latestOffset(self):
        # Unbounded in principle; bounded here so availableNow (drain)
        # terminates — the truncate_restriction analog.
        self._current = min(self._current + self.rows_per_batch, self.max_value)
        return {"offset": self._current}

    def partitions(self, start: dict, end: dict):
        s, e = start["offset"], end["offset"]
        # Restart guard: a fresh reader's _current starts at 0 while the
        # checkpointed start may be higher — never plan a backward batch;
        # fast-forward the cursor. NOTE: the engine still commits the
        # already-planned lower end offset, so a restarted query re-emits
        # rows from that point — this demo source is AT-LEAST-ONCE across
        # restarts (exactly-once needs the offset persisted outside the
        # reader, e.g. in the source system, like Kafka's).
        if e < s:
            self._current = max(self._current, s)
            return []
        mid = (s + e) // 2
        # Two splits per micro-batch: restriction splitting inside a batch.
        return [_RangeChunk(s, mid), _RangeChunk(mid, e)] if e > mid > s else [_RangeChunk(s, e)]

    def commit(self, end: dict):
        # Offsets up to `end` are durably processed (bundle-commit analog,
        # reference execution.py:131-139); keep the cursor monotonic so a
        # reader reconstructed mid-stream resumes from the committed point.
        self._current = max(self._current, end["offset"])

    def read(self, partition: _RangeChunk):
        for v in range(partition.start, partition.end):
            yield (v,)


class CounterStreamDataSource(DataSource):
    """Resumable counting stream: value BIGINT, offset-checkpointed."""

    @classmethod
    def name(cls):
        return "counter_stream"

    def schema(self):
        return StructType([StructField("value", LongType())])

    def streamReader(self, schema):
        return _CounterStreamReader(self.options)


def register_all(spark):
    spark.dataSource.register(ExpandStringsDataSource)
    spark.dataSource.register(CounterStreamDataSource)
