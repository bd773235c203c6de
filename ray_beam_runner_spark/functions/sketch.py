"""Mergeable frequency sketches: Count-Min over a grouped corpus.

Completes the sketch pair for incremental ingestion — the HLL path
(q_sketch_distinct, DataSketches blobs) answers "how many DISTINCT
items", this answers "how OFTEN is each item" from the same shard-local
partial-sketch shape: yesterday's per-shard sketches union with today's
increment in O(sketch) work, no corpus rescan (Cormode & Muthukrishnan,
"An improved data stream summary: the count-min sketch and its
applications", J. Algorithms 2005).

The sketch is kept SPARSE — (group, row j, position, count) — instead
of dense d x w arrays: Spark aggregates it with one map-side-combinable
groupBy, merging is a plain sum over positions, and positions never
materialize zero entries. Hash positions use the repo's md5 bucket
(engine-portable, `text.hash_bucket` contract), so every estimate is
deterministic and the whole pipeline hash-checks against DuckDB.

CMS guarantees hold per sketch: estimates never undercount, and
overcount is bounded by e/w x N with probability 1 - (1/2)^d for
(w, d) sized to the stream. Scale shape (100 TB): per-shard sketches
are at most d x w rows each (bounded, tiny); the union and the point
queries touch sketches, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_positions", "cms_sketch", "cms_merge", "cms_estimate"]


def cms_positions(col: Column, w: int, d: int) -> list[Column]:
    """The d hash-row positions of an item (md5-derived, portable)."""
    from ray_beam_runner_spark.functions.text import hash_bucket

    return [hash_bucket(col, w, f"cms{j}") for j in range(d)]


def cms_sketch(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    w: int = 1024,
    d: int = 3,
) -> DataFrame:
    """Per-group sparse Count-Min sketch: (group_cols..., j, pos, cnt).
    One explode (d rows per item occurrence) + one map-side-combinable
    aggregation; at most d x w rows per group survive regardless of
    item cardinality."""
    rows = df.select(
        *group_cols,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), p.alias("pos"))
                    for j, p in enumerate(cms_positions(F.col(item_col), w, d))
                ]
            )
        ).alias("s"),
    ).select(*group_cols, F.col("s.j").alias("j"), F.col("s.pos").alias("pos"))
    return rows.groupBy(*group_cols, "j", "pos").agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(sketch: DataFrame, drop_groups: list[str]) -> DataFrame:
    """Union partial sketches by summing counts per (j, pos) — the
    mergeability that makes shard-local sketches compose into a global
    one without touching any shard's data again."""
    keep = [c for c in sketch.columns if c not in (*drop_groups, "cnt")]
    return sketch.groupBy(*keep).agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    w: int = 1024,
    d: int = 3,
) -> DataFrame:
    """Point-query the (merged) sketch: est(item) = min over the d rows
    of the count at the item's position — never an undercount. The
    probe table (items x d) joins the sparse sketch on (j, pos); a
    position absent from the sparse sketch means zero (impossible for
    items actually present). Returns items + (est bigint)."""
    probes = items.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), p.alias("pos"))
                    for j, p in enumerate(cms_positions(F.col(item_col), w, d))
                ]
            )
        ).alias("s"),
    ).select("*", F.col("s.j").alias("j"), F.col("s.pos").alias("pos")).drop("s")
    out_cols = items.columns
    return (
        probes.join(sketch.select("j", "pos", "cnt"), ["j", "pos"], "left")
        .groupBy(*out_cols)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
