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
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["concurrency_timeline"]


def concurrency_timeline(
    intervals: DataFrame,
    start: str,
    end: str,
    bucket_seconds: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Concurrency after every boundary event of the half-open intervals
    [start, end), globally or per ``keys``: returns the input's key
    columns plus (t, delta, concurrency), where ``concurrency`` is the
    number of intervals open immediately AFTER time t. Ends sort before
    starts at equal t, so back-to-back intervals [a,b)+[b,c) never
    register as concurrent — the same tie rule as the per-key sweep in
    q_peak_concurrency, which this generalizes to key cardinalities
    (including ONE global key) where partitioning the window by key
    would concentrate the corpus on single tasks.

    ``F.max_by(t, concurrency)``-style reductions over the result give
    peak concurrency and when it happened; joining the timeline back to
    points gives "how many X were open when Y occurred" lookups.
    """
    ks = [F.col(k) for k in keys]
    s_num = F.col(start).cast("double")
    e_num = F.col(end).cast("double")
    pts = intervals.select(
        *ks, s_num.alias("t"), F.lit(1).alias("delta")
    ).unionByName(intervals.select(*ks, e_num.alias("t"), F.lit(-1).alias("delta")))
    pts = pts.withColumn(
        "_sw_b", F.floor(F.col("t") / F.lit(bucket_seconds)).cast("long")
    )
    kn = list(keys)

    # Pass 1: per-bucket delta sums (map-side combinable, bucket-keyed
    # shuffle). Pass 2: exclusive prefix over the bucket SUMS — the
    # single-partition window touches one row per (keys, bucket).
    bw = (
        W.partitionBy(*kn).orderBy("_sw_b").rowsBetween(W.unboundedPreceding, -1)
        if kn
        else W.orderBy("_sw_b").rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = (
        pts.groupBy(*kn, "_sw_b")
        .agg(F.sum("delta").alias("_sw_sum"))
        .select(*kn, "_sw_b", F.coalesce(F.sum("_sw_sum").over(bw), F.lit(0)).alias("_sw_off"))
    )

    # Pass 3: within-bucket running sum, partitioned by bucket — the
    # per-key sort rides the bucket shuffle; offsets broadcast back.
    rw = W.partitionBy(*kn, "_sw_b").orderBy("t", "delta").rowsBetween(
        W.unboundedPreceding, 0
    )
    run = pts.withColumn("_sw_run", F.sum("delta").over(rw))
    out_cols: list[Column] = [F.col(k) for k in kn]
    return (
        run.join(F.broadcast(offsets), [*kn, "_sw_b"])
        .select(
            *out_cols,
            "t",
            "delta",
            (F.col("_sw_run") + F.col("_sw_off")).cast("long").alias("concurrency"),
        )
    )
