"""Global sweep-line aggregation without a global window.

A running sum over ALL rows ordered by time is the textbook way to
compute interval concurrency (+1 at each start, -1 at each end), but on
Spark an unpartitioned ``Window.orderBy(t)`` funnels the entire corpus
through one task — the exact anti-pattern the plan tests ban. The
distributed form is the classic two-pass prefix sum:

1. bucket every boundary point by coarse time (one shuffle, keyed by
   bucket), computing each bucket's delta SUM;
2. prefix-sum the PER-BUCKET sums ordered by bucket id — this window IS
   single-partition, but over bucket aggregates (thousands of rows of
   metadata, never the corpus), yielding each bucket's starting offset;
3. broadcast the offsets back and run the within-bucket running sum
   partitioned BY BUCKET — per-key sorts on the same shuffle as step 1.

Every corpus-sized exchange is bucket-keyed; the only ordered pass over
"everything" touches one row per bucket. The reference runner has no
analytic-window operator at all (aggregations are CombinePerKey —
SURVEY.md §2.3); this is the Spark-first shape for the global variant
its users would otherwise collect() for.

BUCKET SIZING. ``bucket_seconds`` trades the two passes against each
other: too COARSE (one bucket) degenerates pass 3 into the global
window the module exists to avoid; too FINE (bucket count ~ row count)
makes the pass-2 offsets table corpus-sized, so the single-partition
prefix sum over it is the global sort again. Anything within a couple
of orders of magnitude of sqrt(rows) is fine — the sweet spot is flat
and wide. When the caller passes ``bucket_seconds=None`` (the default)
it is DERIVED from the data: one tiny min/max aggregation over the
boundary points targets ~4096 buckets across the observed time range
(10^3-10^4 buckets keeps the offsets table trivially broadcastable up
to billions of rows while leaving each bucket's within-partition sort
far below task-memory scale). The extra job costs two scalars to the
driver; callers on a hot path with a known time scale pass an explicit
value and skip it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["concurrency_timeline", "open_intervals_at"]


_AUTO_TARGET_BUCKETS = 4096


def _auto_bucket_seconds(pts: DataFrame) -> int:
    """Derive a bucket width from the point set's time range, targeting
    ~_AUTO_TARGET_BUCKETS buckets (module doc: the sweet spot is flat,
    10^3-10^4 is safe at any corpus size). Zero-range and empty inputs
    get 1 — a single bucket over a single instant is exact."""
    import math

    lo, hi = pts.agg(F.min("t"), F.max("t")).first()
    if lo is None or hi <= lo:
        return 1
    return max(1, math.ceil((hi - lo) / _AUTO_TARGET_BUCKETS))


def _bucketed_running_sum(
    pts: DataFrame, kn: Sequence[str], bucket_seconds: int | None
) -> DataFrame:
    """The three-pass core over a point set carrying (t, delta, _sw_rank)
    plus arbitrary passthrough columns: appends ``concurrency`` = the
    running sum of delta ordered by (t, _sw_rank, delta) within keys,
    computed with bucket-local windows + broadcast bucket offsets (module
    doc). Identical rows are interchangeable, so the output MULTISET is
    deterministic even where the within-tie order is not."""
    kn = list(kn)
    if bucket_seconds is None:
        bucket_seconds = _auto_bucket_seconds(pts)
    pts = pts.withColumn(
        "_sw_b", F.floor(F.col("t") / F.lit(bucket_seconds)).cast("long")
    )
    bw = (
        W.partitionBy(*kn).orderBy("_sw_b").rowsBetween(W.unboundedPreceding, -1)
        if kn
        else W.orderBy("_sw_b").rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = (
        pts.groupBy(*kn, "_sw_b")
        .agg(F.sum("delta").alias("_sw_sum"))
        .select(
            *kn, "_sw_b", F.coalesce(F.sum("_sw_sum").over(bw), F.lit(0)).alias("_sw_off")
        )
    )
    rw = W.partitionBy(*kn, "_sw_b").orderBy("t", "_sw_rank", "delta").rowsBetween(
        W.unboundedPreceding, 0
    )
    run = pts.withColumn("_sw_run", F.sum("delta").over(rw))
    # Global mode: the offsets table is one row per bucket — force the
    # broadcast. Keyed mode: keys x buckets rows can be arbitrarily
    # large, so let AQE size the join (it broadcasts when it fits and
    # falls back to a (keys, bucket)-keyed shuffle join — the same key
    # the window pass already partitioned on — when it doesn't).
    off_side = F.broadcast(offsets) if not kn else offsets
    return (
        run.join(off_side, [*kn, "_sw_b"])
        .withColumn("concurrency", (F.col("_sw_run") + F.col("_sw_off")).cast("long"))
        .drop("_sw_b", "_sw_run", "_sw_off")
    )


def _boundary_points(
    intervals: DataFrame, start: str, end: str, keys: Sequence[str]
) -> DataFrame:
    """±1 boundary points of the half-open intervals with the tie rank
    that makes equal-time events resolve as close-then-open: ends rank 0,
    starts rank 1 — so [a,b)+[b,c) never overlap, and a rank-2 probe AT a
    start sees it open ([s,e) includes s) while one AT an end sees it
    closed."""
    ks = [F.col(k) for k in keys]
    return intervals.select(
        *ks,
        F.col(start).cast("double").alias("t"),
        F.lit(1).alias("delta"),
        F.lit(1).alias("_sw_rank"),
    ).unionByName(
        intervals.select(
            *ks,
            F.col(end).cast("double").alias("t"),
            F.lit(-1).alias("delta"),
            F.lit(0).alias("_sw_rank"),
        )
    )


def concurrency_timeline(
    intervals: DataFrame,
    start: str,
    end: str,
    bucket_seconds: int | None = None,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Concurrency after every boundary event of the half-open intervals
    [start, end), globally or per ``keys``: returns the key columns plus
    (t, delta, concurrency), where ``concurrency`` is the number of
    intervals open immediately AFTER time t. Ends sort before starts at
    equal t, so back-to-back intervals [a,b)+[b,c) never register as
    concurrent — the same tie rule as the per-key sweep in
    q_peak_concurrency, which this generalizes to key cardinalities
    (including ONE global key) where partitioning the window by key
    would concentrate the corpus on single tasks."""
    pts = _boundary_points(intervals, start, end, keys)
    out = _bucketed_running_sum(pts, list(keys), bucket_seconds)
    return out.select(*keys, "t", "delta", "concurrency")


def open_intervals_at(
    intervals: DataFrame,
    start: str,
    end: str,
    probes: DataFrame,
    probe_time: str,
    bucket_seconds: int | None = None,
    keys: Sequence[str] = (),
) -> DataFrame:
    """For every probe row: how many intervals [start, end) are open at
    its time — all probe columns preserved plus ``open_count``. The
    probes ride the SAME bucketed sweep as the boundaries (delta-0
    points ranked after close/open at equal t, so a probe exactly at a
    start counts it and one exactly at an end does not — half-open
    semantics). One bucket-keyed shuffle over boundaries+probes
    together; never an as-of join against the full timeline, and never
    a global window. ``keys`` must exist on both sides."""
    ks = [F.col(k) for k in keys]
    payload = [c for c in probes.columns if c not in set(keys)]
    if probe_time not in payload:
        raise ValueError(f"open_intervals_at: probe_time {probe_time!r} not in probes")
    bad = {"t", "delta", "_sw_rank", "concurrency"} & set(probes.columns)
    if bad:
        raise ValueError(f"open_intervals_at: probe columns collide: {sorted(bad)}")
    bpts = _boundary_points(intervals, start, end, keys).select(
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c) for c in payload],
        *[F.col(k) for k in keys],
        "t",
        "delta",
        "_sw_rank",
    )
    ppts = probes.select(
        *payload,
        *ks,
        F.col(probe_time).cast("double").alias("t"),
        F.lit(0).alias("delta"),
        F.lit(2).alias("_sw_rank"),
    )
    out = _bucketed_running_sum(bpts.unionByName(ppts), list(keys), bucket_seconds)
    return out.filter(F.col("_sw_rank") == 2).select(
        *payload, *keys, F.col("concurrency").alias("open_count")
    )
