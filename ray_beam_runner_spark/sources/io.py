"""Batch sources/sinks (SURVEY.md §2.1).

Reference parity: Impulse (`translator.py:95-102`), Create
(`translator.py:105-119`), Read(TextSource) with header skip
(`translator.py:122-144`), WriteToText
(`examples/word_count_metrics.py:130-134`). The Pipeline-level
equivalents live on :class:`ray_beam_runner_spark.pipeline.Pipeline`
(create/impulse/read_text) and :meth:`PCollection.write_text`; this module
adds the DataFrame-level formats the reference never had (parquet, csv,
json) — free capability from Spark's DataSource V2.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ray_beam_runner_spark.session import read_parquet_normalized


def read_text(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan with ns-timestamp normalization (Spark has no ns type)."""
    return read_parquet_normalized(spark, path)


def read_csv(spark: SparkSession, path: str, header: bool = True, schema=None) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan. Same engine-native columnar path as parquet (vectorized
    reader, predicate pushdown, column pruning via ReadSchema)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite", partition_by=None):
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_text(df: DataFrame, path: str, mode: str = "overwrite"):
    df.write.mode(mode).text(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by=None):
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    partition_by: list[str] | None = None,
) -> None:
    """Keyed MERGE/upsert into a parquet table (Delta-MERGE shape on
    plain parquet): rows whose key matches an update are replaced, new
    keys are appended, untouched rows survive.

    Two paths:

    - ``partition_by`` set (the 100 TB path): only partitions PRESENT in
      the updates are read and rewritten — keep = touched-partition rows
      anti-joined on key, union updates, written with dynamic partition
      overwrite. Untouched partitions are never read, never rewritten.
      CONTRACT: keys must be partition-stable — an update that moves a
      key to a DIFFERENT partition leaves the old row in the untouched
      partition (this path never reads it), duplicating the key. Moving
      keys across partitions requires the unpartitioned path or an
      explicit delete of the old partition first; this is the same
      contract as Hive dynamic-partition overwrite / Delta replaceWhere.
    - unpartitioned (small/dimension tables): full read, anti-join,
      rewrite through a staging dir + atomic-ish rename (Spark cannot
      overwrite a path it is reading; the rename also avoids readers
      seeing a half-written table). LOCAL-FILESYSTEM ONLY: the swap
      uses os.rename/shutil.rmtree, which do not exist as atomic ops
      on HDFS/S3, and a concurrent reader can hit the instant between
      the two renames when the table path is absent. For
      remote-storage-safe atomic MERGE use
      :mod:`ray_beam_runner_spark.sources.snapshots` instead — its
      manifest publish is a single create-if-absent (conditional PUT
      on object stores), readers never see a gap, and it adds stats
      pruning, time travel, and an exactly-once streaming sink. The
      partitioned path above has no such restriction (dynamic
      partition overwrite is storage-agnostic).

    The anti-join shuffles on the key; at scale that is one co-located
    shuffle per upsert batch, which is exactly what table formats do
    under MERGE. Updates must carry at most one row per key
    (last-writer-wins dedup is the caller's policy decision).
    """
    import shutil
    import uuid

    exists = os.path.exists(path)
    if not exists:
        write_parquet(updates, path, partition_by=partition_by)
        return
    current = spark.read.parquet(path)
    key_set = updates.select(*keys).distinct()
    if partition_by:
        parts = [r.asDict() for r in updates.select(*partition_by).distinct().collect()]
        cond = F.lit(False)
        for p in parts:
            m = F.lit(True)
            for c, v in p.items():
                # eqNullSafe: a NULL partition value must select the
                # __HIVE_DEFAULT_PARTITION__ rows — a plain == yields
                # NULL, filtering the partition to empty while dynamic
                # overwrite still rewrites it, silently deleting rows.
                m = m & F.col(c).eqNullSafe(F.lit(v))
            cond = cond | m
        touched = current.filter(cond)
        keep = touched.join(key_set, keys, "left_anti")
        merged = keep.unionByName(updates)
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        return
    keep = current.join(key_set, keys, "left_anti")
    merged = keep.unionByName(updates)
    staging = f"{path}.staging-{uuid.uuid4().hex}"
    merged.write.parquet(staging)
    old = f"{path}.old-{uuid.uuid4().hex}"
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    mode: str = "overwrite",
) -> dict[int, int]:
    """Deterministic sharded JSONL writer for training corpora.

    Each row's shard is an md5-derived bucket of its id (see
    functions.text.hash_bucket) — stable across runs, engines, and
    cluster sizes, unlike round-robin ``repartition(n)`` whose assignment
    depends on task scheduling. One shuffle routes rows to their shard;
    ``partitionBy`` lays out ``_shard=K/`` directories so a training job
    can open any contiguous subset. Returns the manifest {shard: rows},
    computed from the same plan (one extra narrow agg, no second scan of
    the source).

    At 100 TB: rows-per-shard is corpus_size / n_shards by hash
    uniformity; pick n_shards so a shard fits the training loader's
    memory. The writer never collects data on the driver — only the
    n_shards-row manifest comes back.
    """
    from pyspark.sql import functions as F

    from ray_beam_runner_spark.functions.text import hash_bucket

    sharded = df.withColumn(
        "_shard", hash_bucket(F.col(id_col), n_shards, "shard")
    ).repartition(n_shards, F.col("_shard"))
    sharded.write.mode(mode).partitionBy("_shard").json(path)
    manifest = (
        sharded.groupBy("_shard").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    return {int(r._shard): int(r.n) for r in manifest}
