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
materialize zero entries. Every sketch row carries its (w, d) geometry,
so estimates READ the geometry instead of trusting callers to re-pass
it (a mismatched w would silently probe the wrong positions). Hash
positions use the repo's md5 bucket (engine-portable,
`text.hash_bucket` contract), so every estimate is deterministic and
the whole pipeline hash-checks against DuckDB.

CMS guarantees hold per sketch: estimates never undercount — enforced
structurally: the estimator sums counts per (j, pos) across whatever
grouping the sketch still carries before taking the row-minimum, so an
unmerged per-shard sketch estimates against the full merged counts —
and overcount is bounded by e/w x N with probability 1 - (1/2)^d for
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


def _explode_positions(df: DataFrame, item_col: str, w: int, d: int) -> DataFrame:
    """df + (_cms_j, _cms_pos): the d-way position explosion — ONE
    shared builder so the sketch and probe sides can never diverge.
    Prefixed names keep arbitrary caller columns collision-free."""
    return df.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), p.alias("pos"))
                    for j, p in enumerate(cms_positions(F.col(item_col), w, d))
                ]
            )
        ).alias("_cms_s"),
    ).select(
        "*", F.col("_cms_s.j").alias("_cms_j"), F.col("_cms_s.pos").alias("_cms_pos")
    ).drop("_cms_s")


def cms_sketch(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    w: int = 1024,
    d: int = 3,
) -> DataFrame:
    """Per-group sparse Count-Min sketch:
    (group_cols..., _cms_w, _cms_d, j, pos, cnt). One explode (d rows
    per item occurrence) + one map-side-combinable aggregation; at most
    d x w rows per group survive regardless of item cardinality. The
    geometry rides along as constant columns."""
    rows = _explode_positions(df.select(*group_cols, item_col), item_col, w, d)
    return (
        rows.groupBy(
            *group_cols,
            F.col("_cms_j").alias("j"),
            F.col("_cms_pos").alias("pos"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            *group_cols,
            F.lit(w).alias("_cms_w"),
            F.lit(d).alias("_cms_d"),
            "j",
            "pos",
            "cnt",
        )
    )


def _assert_one_geometry(sketch: DataFrame, op: str) -> tuple[int, int]:
    """The CMS guarantee only holds when every merged row shares ONE
    (w, d) geometry — mixed-geometry unions would silently probe/merge
    wrong positions and can undercount. One tiny action over the sketch
    frame (at most d x w rows per group) enforces it loudly."""
    geos = sketch.select("_cms_w", "_cms_d").distinct().collect()
    if not geos:
        raise ValueError(f"{op}: empty sketch (no geometry row)")
    if len(geos) > 1:
        raise ValueError(
            f"{op}: mixed sketch geometries "
            f"{sorted((int(g._cms_w), int(g._cms_d)) for g in geos)}; "
            "sketches must share one (w, d) to compose"
        )
    return int(geos[0]._cms_w), int(geos[0]._cms_d)


def cms_merge(sketch: DataFrame, drop_groups: list[str]) -> DataFrame:
    """Union partial sketches by summing counts per (j, pos) — the
    mergeability that makes shard-local sketches compose into a global
    one without touching any shard's data again. Raises on a
    mixed-geometry union (positions from different (w, d) would be
    summed into meaningless cells)."""
    _assert_one_geometry(sketch, "cms_merge")
    keep = [c for c in sketch.columns if c not in (*drop_groups, "cnt")]
    return sketch.groupBy(*keep).agg(F.sum("cnt").alias("cnt"))


def cms_estimate(sketch: DataFrame, items: DataFrame, item_col: str) -> DataFrame:
    """Point-query the sketch: est(item) = min over the d rows of the
    TOTAL count at the item's position — never an undercount. The
    geometry (w, d) is read off the sketch, so probes cannot silently
    use mismatched positions; counts are summed per (j, pos) across
    any grouping the sketch still carries, so per-shard sketches
    estimate correctly without an explicit cms_merge. A position
    absent from the sparse sketch means zero (impossible for items
    actually present). Returns items + (est bigint)."""
    clash = {"est", "_cms_j", "_cms_pos", "_cms_s", "j", "pos", "cnt"} & set(
        items.columns
    )
    if clash:
        raise ValueError(f"cms_estimate: items must not carry columns {sorted(clash)}")
    w, d = _assert_one_geometry(sketch, "cms_estimate")
    totals = sketch.groupBy("j", "pos").agg(F.sum("cnt").alias("cnt"))
    probes = _explode_positions(items, item_col, w, d)
    out_cols = items.columns
    return (
        probes.join(
            totals,
            (F.col("_cms_j") == F.col("j")) & (F.col("_cms_pos") == F.col("pos")),
            "left",
        )
        .groupBy(*out_cols)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
