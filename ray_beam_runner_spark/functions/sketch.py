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

__all__ = [
    "cms_positions",
    "cms_sketch",
    "cms_merge",
    "cms_estimate",
    "dd_bucket",
    "dd_sketch",
    "dd_merge",
    "dd_quantile",
]


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
            # d x w rows at most: pin the broadcast instead of trusting
            # the size estimator, like every model-sized join in the repo
            F.broadcast(totals),
            (F.col("_cms_j") == F.col("j")) & (F.col("_cms_pos") == F.col("pos")),
            "left",
        )
        .groupBy(*out_cols)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


# ---------------------------------------------------------------------------
# DDSketch-style mergeable quantiles — the third leg of the sketch family
# (HLL: distinct counts; CMS: frequencies; this: quantiles).
# ---------------------------------------------------------------------------


def _dd_gamma(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def dd_bucket(col: Column, alpha: float) -> Column:
    """Log-bucket index of a non-negative value (Masson, Lee & Rim,
    "DDSketch: a fast and fully-mergeable quantile sketch with
    relative-error guarantees", VLDB 2019): bucket(x) = ceil(ln x /
    ln γ) with γ = (1+α)/(1-α), so every value in a bucket is within
    relative error α of the bucket's midpoint estimate. x = 0 gets the
    sentinel bucket −10^9 (sorts before every real bucket; ln γ lower-
    bounds real buckets at ~−ln(DBL_MAX)/ln γ ≫ −10^9). The log RATIO
    is rounded to 9 dp before ceil — engine log() implementations
    differ by ulps, and an unpinned ceil at a bucket boundary would
    put the same value in different buckets on different engines (the
    q_kmeans determinism recipe applied to bucketing)."""
    g = _dd_gamma(alpha)
    import math

    return F.when(col == 0, F.lit(-(10**9)).cast("long")).otherwise(
        F.ceil(F.round(F.log(col.cast("double")) / F.lit(math.log(g)), 9)).cast("long")
    )


def dd_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    alpha: float = 0.02,
) -> DataFrame:
    """Per-group sparse DDSketch: (group_cols..., _dd_a, bucket, cnt).
    One bucket expression + one map-side-combinable aggregation; at
    most O(log_γ(max/min)) buckets per group survive regardless of row
    count (~700 buckets across 12 orders of magnitude at α = 0.02).
    Values must be >= 0 (DDSketch's negative mirror store is out of
    scope here) and non-null — VALIDATED with one tiny aggregate before
    sketching: a negative value would silently land in a NULL bucket
    (log of a negative) and corrupt every later rank walk; the α
    parameter rides along like the CMS geometry so estimates can never
    probe with a mismatched γ."""
    v = F.col(value_col)
    stats = df.agg(
        F.min(v).alias("mn"), F.count(F.lit(1)).alias("n"), F.count(v).alias("nn")
    ).first()
    if stats.n and (stats.mn is None or stats.mn < 0 or stats.nn != stats.n):
        raise ValueError(
            f"dd_sketch: {value_col} must be non-null and >= 0 "
            f"(observed min={stats.mn}, nulls={stats.n - stats.nn})"
        )
    rows = df.select(
        *group_cols, dd_bucket(v, alpha).alias("bucket")
    )
    return (
        rows.groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            *group_cols, F.lit(float(alpha)).alias("_dd_a"), "bucket", "cnt"
        )
    )


def _assert_one_alpha(sketch: DataFrame, op: str) -> float:
    geos = sketch.select("_dd_a").distinct().collect()
    if not geos:
        raise ValueError(f"{op}: empty sketch (no alpha row)")
    if len(geos) > 1:
        raise ValueError(
            f"{op}: mixed sketch alphas "
            f"{sorted(float(g._dd_a) for g in geos)}; "
            "sketches must share one alpha to compose"
        )
    return float(geos[0]._dd_a)


def dd_merge(sketch: DataFrame, drop_groups: list[str]) -> DataFrame:
    """Union partial sketches by summing counts per bucket — DDSketch
    merge is exact (the merged sketch equals the sketch of the merged
    stream), which is what makes shard-local quantile state compose
    without re-reading any shard. Raises on mixed alphas."""
    _assert_one_alpha(sketch, "dd_merge")
    keep = [c for c in sketch.columns if c != "cnt" and c not in drop_groups]
    return sketch.groupBy(*keep).agg(F.sum("cnt").alias("cnt"))


def dd_quantile(
    sketch: DataFrame, group_cols: list[str], qs: list[float]
) -> DataFrame:
    """Quantile estimates from a (possibly multi-group) sketch:
    for each q, the midpoint value 2γ^i/(γ+1) of the bucket containing
    rank floor(1 + q(n-1)) in bucket order — within relative error α
    of the true rank-q value by the DDSketch guarantee (exact 0 for
    the zero bucket). Returns (group_cols..., q, est) with est rounded
    to 6 dp (γ-power arithmetic differs by ulps across engines; the
    rounding pins it, same as the centroid recipe). Cost: one window
    cumsum over the BUCKETS (sketch-sized, never the data) per group."""
    from pyspark.sql import Window as W

    alpha = _assert_one_alpha(sketch, "dd_quantile")
    g = _dd_gamma(alpha)
    s = sketch.groupBy(*group_cols, "bucket").agg(F.sum("cnt").alias("cnt"))
    w = W.partitionBy(*group_cols).orderBy("bucket")
    cum = s.select(
        *group_cols,
        "bucket",
        "cnt",
        F.sum("cnt").over(w).alias("_cum"),
        F.sum("cnt").over(
            W.partitionBy(*group_cols).orderBy(F.lit(1)).rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("_n"),
    )
    qdf = sketch.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    ranked = cum.crossJoin(F.broadcast(qdf)).withColumn(
        "_rank", F.floor(F.lit(1.0) + F.col("q") * (F.col("_n") - 1)).cast("long")
    )
    hit = ranked.filter(
        (F.col("_cum") >= F.col("_rank"))
        & (F.col("_cum") - F.col("cnt") < F.col("_rank"))
    )
    est = F.when(F.col("bucket") == -(10**9), F.lit(0.0)).otherwise(
        F.round(
            F.lit(2.0) * F.pow(F.lit(g), F.col("bucket")) / F.lit(g + 1.0), 6
        )
    )
    return hit.select(*group_cols, "q", est.alias("est"))
