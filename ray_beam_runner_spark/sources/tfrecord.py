"""TFRecord sink/source (SURVEY.md §2.1 `WriteToTFRecord`; reference uses
it in `examples/tft_iris_example/preprocessing.py:107-116`).

The TFRecord wire format is public (TensorFlow's record format docs):

    uint64 length (little-endian)
    uint32 masked_crc32c(length_bytes)
    byte   data[length]
    uint32 masked_crc32c(data)

with masked_crc = ((crc >> 15 | crc << 17) + 0xa282ead8) mod 2^32 over the
CRC-32C (Castagnoli) polynomial. No TensorFlow dependency: a table-driven
pure-Python CRC (256-entry table built at import) with an import-try for
the native ``crc32c`` wheel when an environment provides it — the pure
path is fine for the record sizes tests use; hot production sinks should
ship the wheel.

Paths are local-filesystem for this container; on a cluster point at
shared storage the executors AND driver can reach (the driver performs
the rename-commit).

Distribution model: ``write_tfrecord`` writes ONE shard per partition
(part-00000-of-NNNNN naming, the standard sharded-TFRecord convention) via
``mapInPandas`` — each task streams its partition to its own shard, no
driver materialization, no cross-partition shuffle. ``read_tfrecord``
parallelizes over shards (one partition per file via the binaryFile
source), verifies both CRCs, and explodes records.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRC32C_POLY = 0x82F63B78  # Castagnoli, reflected
_MASK_DELTA = 0xA282EAD8


def _crc32c_table() -> list[int]:
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ _CRC32C_POLY if c & 1 else c >> 1
        table.append(c)
    return table


_TABLE = _crc32c_table()


try:  # native implementation when the environment has it
    from crc32c import crc32c as _native_crc32c  # type: ignore
except ImportError:  # pragma: no cover - depends on environment
    _native_crc32c = None


def crc32c(data: bytes) -> int:
    if _native_crc32c is not None:
        return _native_crc32c(data)
    crc = 0xFFFFFFFF
    for b in data:
        crc = _TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFFFFFF


def encode_record(data: bytes) -> bytes:
    header = struct.pack("<Q", len(data))
    return (
        header
        + struct.pack("<I", masked_crc32c(header))
        + data
        + struct.pack("<I", masked_crc32c(data))
    )


def decode_records(blob: bytes, verify: bool = True):
    """Yield record payloads from a TFRecord shard's bytes."""
    pos, n = 0, len(blob)
    while pos < n:
        if pos + 12 > n:
            raise ValueError(f"truncated TFRecord header at offset {pos}")
        header = blob[pos : pos + 8]
        (length,) = struct.unpack("<Q", header)
        (hcrc,) = struct.unpack("<I", blob[pos + 8 : pos + 12])
        start = pos + 12
        end = start + length
        if end + 4 > n:
            raise ValueError(f"truncated TFRecord payload at offset {pos}")
        data = blob[start:end]
        (dcrc,) = struct.unpack("<I", blob[end : end + 4])
        if verify:
            if masked_crc32c(header) != hcrc:
                raise ValueError(f"TFRecord length-CRC mismatch at offset {pos}")
            if masked_crc32c(data) != dcrc:
                raise ValueError(f"TFRecord data-CRC mismatch at offset {pos}")
        yield data
        pos = end + 4


def write_tfrecord(df: DataFrame, path: str, value_col: str = "value") -> int:
    """Write a binary (or string — utf-8 encoded) column as sharded
    TFRecord files under ``path``; one shard per partition, written
    executor-side. Returns the number of shards written.

    Shards are first written as part-<partition>.tfrecord, then renamed to
    the standard part-XXXXX-of-NNNNN once the total shard count is known
    (the rename is the driver-side commit step, mirroring Spark's own
    file-sink commit protocol at a small scale)."""
    import glob as _glob

    import pandas as pd

    os.makedirs(path, exist_ok=True)
    # overwrite semantics: clear previous shards (and orphaned temps) so a
    # rewrite with fewer partitions can't leave stale part-*-of-* files
    # that the reader's glob would silently merge into the new dataset
    for stale in _glob.glob(os.path.join(path, "*.tfrecord")) + _glob.glob(
        os.path.join(path, "*.tfrecord.tmp")
    ):
        os.remove(stale)
    src = df.select(F.col(value_col).alias("value"))

    def kernel(batches):
        part = None
        out = None
        written = 0
        for pdf in batches:
            if out is None and len(pdf):
                from pyspark import TaskContext

                part = TaskContext.get().partitionId()
                out = open(os.path.join(path, f"part-{part:05d}.tfrecord.tmp"), "wb")
            for v in pdf["value"]:
                data = v.encode("utf-8") if isinstance(v, str) else bytes(v)
                out.write(encode_record(data))
                written += 1
        if out is not None:
            out.close()
            yield pd.DataFrame({"part": [part], "records": [written]})

    manifest = src.mapInPandas(kernel, schema="part int, records long").collect()
    shards = sorted(r.part for r in manifest)
    for i, part in enumerate(shards):
        os.rename(
            os.path.join(path, f"part-{part:05d}.tfrecord.tmp"),
            os.path.join(path, f"part-{i:05d}-of-{len(shards):05d}.tfrecord"),
        )
    return len(shards)


class _TFRecordCommit:
    """WriterCommitMessage carrying the task's temp shard path + count."""

    def __init__(self, tmp_path: str, records: int):
        self.tmp_path = tmp_path
        self.records = records


def _tfrecord_datasource_classes():
    """Build the Python Data Source V2 classes lazily (the datasource
    module import needs a modern pyspark; everything else in this file
    works standalone)."""
    from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage

    class _Commit(WriterCommitMessage, _TFRecordCommit):
        pass

    class TFRecordWriter(DataSourceWriter):
        """Executor side: stream the partition to a uniquely-named temp
        shard; driver side: ``commit`` renames the temp shards to the
        final part-XXXXX-of-NNNNN names (the real DSv2 commit protocol —
        a failed/speculated task's temp file is never renamed, and
        ``abort`` sweeps temps)."""

        def __init__(self, path: str, value_col: str):
            self.path = path
            self.value_col = value_col

        def write(self, iterator):
            import uuid

            from pyspark import TaskContext

            ctx = TaskContext.get()
            tmp = os.path.join(
                self.path,
                f".tmp-{ctx.partitionId():05d}-{ctx.taskAttemptId()}-{uuid.uuid4().hex[:8]}.tfrecord.tmp",
            )
            n = 0
            out = None
            try:
                for row in iterator:
                    v = row[self.value_col]
                    if out is None:
                        out = open(tmp, "wb")
                    data = v.encode("utf-8") if isinstance(v, str) else bytes(v)
                    out.write(encode_record(data))
                    n += 1
            finally:
                if out is not None:
                    out.close()
            return _Commit(tmp if out is not None else "", n)

        def commit(self, messages):
            import glob as _glob

            shards = sorted(m.tmp_path for m in messages if m.tmp_path)
            # destructive steps happen HERE, after every task succeeded:
            # a failed job leaves the previous dataset untouched
            for old in _glob.glob(os.path.join(self.path, "*.tfrecord")):
                os.remove(old)
            for i, tmp in enumerate(shards):
                os.rename(
                    tmp,
                    os.path.join(self.path, f"part-{i:05d}-of-{len(shards):05d}.tfrecord"),
                )
            # sweep orphaned temps from failed/speculated attempts (dot-
            # prefixed, so the '*.tfrecord' globs above never match them)
            for orphan in _glob.glob(os.path.join(self.path, ".tmp-*.tfrecord.tmp")):
                os.remove(orphan)

        def abort(self, messages):
            import glob as _glob

            for m in messages:
                if m.tmp_path and os.path.exists(m.tmp_path):
                    os.remove(m.tmp_path)
            for orphan in _glob.glob(os.path.join(self.path, ".tmp-*.tfrecord.tmp")):
                os.remove(orphan)

    class TFRecordDataSource(DataSource):
        """``df.write.format("tfrecord").option("path", dir).save()`` —
        SURVEY §2.1's 'df.write.format("tfrecord") via connector' path.
        Expects one binary/string column (default name ``value``,
        override with .option("value_col", ...))."""

        @classmethod
        def name(cls):
            return "tfrecord"

        def writer(self, schema, overwrite: bool):
            path = self.options.get("path")
            if not path:
                raise ValueError("tfrecord writer requires a path")
            if (
                not overwrite
                and os.path.isdir(path)
                and any(f.endswith(".tfrecord") for f in os.listdir(path))
            ):
                raise ValueError(
                    "tfrecord sink does not support append into an existing "
                    "dataset (part-XXXXX-of-NNNNN naming is whole-dataset); "
                    "use mode('overwrite')"
                )
            os.makedirs(path, exist_ok=True)
            # NO deletion here: the previous dataset is removed inside
            # commit(), after every task of the new write has succeeded —
            # a failed overwrite job must leave the old data intact
            return TFRecordWriter(path, self.options.get("value_col", "value"))

    return TFRecordDataSource


def register_tfrecord(spark: SparkSession) -> None:
    """Register the DSv2 tfrecord format on this session."""
    spark.dataSource.register(_tfrecord_datasource_classes())


def read_tfrecord(spark: SparkSession, path: str, verify: bool = True) -> DataFrame:
    """Read sharded TFRecord files into (shard string, value binary) —
    one input partition per shard via the binaryFile source, records
    exploded executor-side with both CRCs verified."""
    import pandas as pd

    shards = spark.read.format("binaryFile").load(
        os.path.join(path, "*.tfrecord")
    ).select("path", "content")

    def kernel(batches):
        for pdf in batches:
            for shard_path, blob in zip(pdf["path"], pdf["content"]):
                recs = list(decode_records(bytes(blob), verify=verify))
                if recs:
                    yield pd.DataFrame(
                        {"shard": [shard_path] * len(recs), "value": recs}
                    )

    return shards.mapInPandas(kernel, schema="shard string, value binary")
