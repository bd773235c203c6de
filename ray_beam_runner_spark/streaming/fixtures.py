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

    def _write_sliced(self, df: DataFrame, ts_col: str, n_slices: int, base_idx: int):
        """Shared slicer: ONE distributed write instead of a driver
        collect + per-slice pickled re-upload (the old form collected
        the whole source table to the driver — 22 s of the 27 s wall of
        a sf0.1 streaming query, and a full-table driver transfer at
        any scale). Rows get a ts-order row_number, slices are the same
        ceil-division chunks as before ([per, per, ..., remainder] —
        ntile would split differently), and one partitionBy write lands
        each slice as its own directory, renamed to the slice_N layout
        the reader and mtime stamping expect. The single-partition
        window is the fixture's bounded-input contract (scripted-stream
        testing), executor-side Tungsten sort instead of driver pickle."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        self._schema = df.schema
        # Slice size is derived IN-PLAN from a window count over the
        # same single pass (per = ceil(n / n_slices), the same ceil
        # division as ever): the old dedicated df.count() both doubled
        # the source computation and — for a non-deterministic upstream
        # — could disagree with the rows actually written, shifting
        # slice boundaries. One pass means the count and the rows are
        # by construction the same ones. An empty source writes no
        # slice directories and the rename loop below is a no-op, so no
        # early-exit count is needed either.
        w = Window.orderBy(ts_col)
        rn = F.row_number().over(w) - 1
        cnt = F.count(F.lit(1)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        # exact ceil division on integers: (n + k - 1) / k floored
        per = F.greatest(
            F.lit(1),
            ((cnt + F.lit(n_slices - 1)) / F.lit(n_slices)).cast("long"),
        )
        tmp = self.dir.rstrip("/") + "__fd_tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        (
            df.withColumn("_fd_rn", rn)
            .withColumn("_fd_slice", F.floor(F.col("_fd_rn") / per).cast("int"))
            .sortWithinPartitions("_fd_slice", "_fd_rn")
            .drop("_fd_rn")
            .write.partitionBy("_fd_slice")
            .parquet(tmp)
        )
        for entry in sorted(os.listdir(tmp)):
            if not entry.startswith("_fd_slice="):
                continue
            k = int(entry.split("=", 1)[1])
            path = os.path.join(self.dir, f"slice_{base_idx + k:05d}.parquet")
            shutil.move(os.path.join(tmp, entry), path)
            _stamp_mtime(path, base_idx + k)
        shutil.rmtree(tmp)
        return self

    def write_slices(self, df: DataFrame, ts_col: str, n_slices: int) -> "FileDropStream":
        if os.path.exists(self.dir):
            shutil.rmtree(self.dir)
        os.makedirs(self.dir)
        return self._write_sliced(df, ts_col, n_slices, base_idx=0)

    def append_slices(self, df: DataFrame, ts_col: str, n_slices: int) -> "FileDropStream":
        """Drop ADDITIONAL ts-ordered slices into the existing directory
        (strictly later mtimes than anything present), without wiping it —
        the arrival of new data between two availableNow runs, for
        checkpoint/resume tests."""
        existing = sorted(
            e for e in os.listdir(self.dir) if e.startswith("slice_")
        )
        return self._write_sliced(df, ts_col, n_slices, base_idx=len(existing))

    @property
    def schema(self):
        return self._schema

    def read_stream(self, max_files_per_trigger: int = 1) -> DataFrame:
        return (
            self.spark.readStream.schema(self._schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(self.dir + "/*")
        )
