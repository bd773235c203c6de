"""Set operations / repartitioning (SURVEY.md §2.4).

Reference: Flatten with coder transcoding `translator.py:419-433` (note
its union + repartition(1) — a serialization point this engine does not
reproduce); Reshuffle `translator.py:147-154`; Partition = tagged-output
filtering. Sort/limit/top-k and intersect/except are absent from the Beam
model and exposed here as native capability.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def flatten(*dfs: DataFrame, by_name: bool = True) -> DataFrame:
    """Union N DataFrames. by_name=True aligns columns by name and fills
    missing ones with null (the transcode-friendly shape). No
    repartition(1) — at 100 TB the reference's post-union repartition(1)
    would serialize the world."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True) if by_name else out.union(d)
    return out


def reshuffle(df: DataFrame, num_partitions: int | None = None, *cols: str) -> DataFrame:
    """Redistribute rows: round-robin (fusion break / skew fix) or hash on
    cols (co-location for a downstream keyed op)."""
    if cols:
        return df.repartition(num_partitions or df.sparkSession.sparkContext.defaultParallelism, *cols)
    return df.repartition(num_partitions or df.sparkSession.sparkContext.defaultParallelism)


def partition_by(df: DataFrame, predicates: dict[str, Column], persist: bool = True):
    """Beam Partition: split one pass into N disjoint outputs by predicate.
    Returns TaggedViews — call .release() when the partitions are consumed."""
    from ray_beam_runner_spark.operators.pardo import TaggedViews

    src = df.persist() if persist else df
    return TaggedViews(
        {name: src.filter(pred) for name, pred in predicates.items()},
        src if persist else None,
    )


def distinct_rows(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    return df.dropDuplicates(list(cols)) if cols else df.distinct()


def intersect_keys(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_keys(a: DataFrame, b: DataFrame, keep_duplicates: bool = True) -> DataFrame:
    return a.exceptAll(b) if keep_duplicates else a.subtract(b)


def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """Global top-k — orderBy+limit plans TakeOrderedAndProject (per-
    partition heaps + driver merge), never a full global sort."""
    return df.orderBy(*order).limit(k)
