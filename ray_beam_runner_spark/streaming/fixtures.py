"""TestStream replacement: file-drop micro-batch fixture.

The reference rejects Beam's TestStream outright
(`/root/reference/ray_beam_runner/portability/ray_fn_runner.py:92-93`,
test skipped at `ray_runner_test.py:395-396`). Scripted-stream testing
here uses the Spark-native equivalent (FIXTURES.md §B): a source table
split into N event-time-ordered parquet slices dropped into a directory,
read with ``readStream`` + ``maxFilesPerTrigger=1`` so each slice is one
micro-batch, driven to completion with an ``availableNow`` trigger.
Expected outputs come from the same computation on the batch union.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _stamp_mtime(path: str, index: int, base: float | None = None):
    """Give slice `index` a strictly increasing modification time: Spark's
    file source orders micro-batches by mtime, and slices written within
    the same clock tick would otherwise batch together nondeterministically
    (breaking scripted watermark-advance scenarios)."""
    base = base if base is not None else (os.stat(path).st_mtime // 1000) * 1000
    t = base + index * 10
    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (t, t))
    os.utime(path, (t, t))


class FileDropStream:
    """Materialize a DataFrame as N ts-ordered parquet slices and expose a
    streaming reader over them."""

    def __init__(self, spark: SparkSession, directory: str):
        self.spark = spark
        self.dir = directory

    def write_slices(self, df: DataFrame, ts_col: str, n_slices: int) -> "FileDropStream":
        if os.path.exists(self.dir):
            shutil.rmtree(self.dir)
        os.makedirs(self.dir)
        rows = df.orderBy(ts_col).collect()
        per = max(1, (len(rows) + n_slices - 1) // n_slices)
        for i in range(0, len(rows), per):
            chunk = self.spark.createDataFrame(rows[i : i + per], schema=df.schema)
            path = os.path.join(self.dir, f"slice_{i // per:05d}.parquet")
            chunk.coalesce(1).write.parquet(path)
            _stamp_mtime(path, i // per)
        self._schema = df.schema
        return self

    def append_slices(self, df: DataFrame, ts_col: str, n_slices: int) -> "FileDropStream":
        """Drop ADDITIONAL ts-ordered slices into the existing directory
        (strictly later mtimes than anything present), without wiping it —
        the arrival of new data between two availableNow runs, for
        checkpoint/resume tests."""
        existing = sorted(
            e for e in os.listdir(self.dir) if e.startswith("slice_")
        )
        base_idx = len(existing)
        rows = df.orderBy(ts_col).collect()
        per = max(1, (len(rows) + n_slices - 1) // n_slices)
        for i in range(0, len(rows), per):
            idx = base_idx + i // per
            path = os.path.join(self.dir, f"slice_{idx:05d}.parquet")
            chunk = self.spark.createDataFrame(rows[i : i + per], schema=df.schema)
            chunk.coalesce(1).write.parquet(path)
            _stamp_mtime(path, idx)
        self._schema = df.schema
        return self

    @property
    def schema(self):
        return self._schema

    def read_stream(self, max_files_per_trigger: int = 1) -> DataFrame:
        return (
            self.spark.readStream.schema(self._schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(self.dir + "/*")
        )
