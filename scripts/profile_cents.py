"""Profile the exact-cents money-sum cost on the sf0.1 Q1 shape (r14
verdict "What's wrong" #1): attribute the q_agg regression to either the
per-row round(x100)->long->decimal(20,0) projection or the wide-decimal
hash-agg accumulator, and measure candidate remedies.

Variants (all the full q_agg shape: filter + 2 money sums + qty sums):
  double     — plain SUM(double) (old, order-dependent; the r13 fragility)
  cents20    — per-row decimal(20,0), SUM decimal        (current, r14)
  longproj   — per-row long, SUM(long) -> long            (attribution only:
               isolates projection cost; unsafe overflow headroom at 100 TB)
  sumcast    — per-row long, cast to decimal(20,0) INSIDE the sum argument
               (same semantics as cents20, different codegen placement)
  twolevel   — groupBy(keys, spark_partition_id).agg(SUM(long)) then
               groupBy(keys).agg(SUM(decimal)): per-partition partials are
               exact longs (bounded by rows-per-partition x max cents
               ~1e6 x 1e9 = 1e15 << 2^63), final decimal sum exact —
               order-independent at any scale, heavy path stays long codegen.

For each: fresh-call timing (rebuild plan every sample, = bench.py
protocol) and reused-plan timing (build once, re-execute) to split
plan/codegen overhead from execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ray_beam_runner_spark import get_spark
from ray_beam_runner_spark.session import read_parquet_normalized

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


_TBL = {}


def _base(spark):
    # cache the parquet handle like queries.t() does — bench fresh calls
    # rebuild the plan from a cached base, not a fresh footer read
    if "li" not in _TBL:
        _TBL["li"] = read_parquet_normalized(
            spark, os.path.join(SF_DIR, "lineitem.parquet")
        )
    return _TBL["li"].filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )


def _cents(col):
    return F.round(F.col(col) * 100).cast("long")


def _rev_long():
    return _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))


def v_double(spark):
    return (
        _base(spark)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            F.avg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def v_cents20(spark):
    return (
        _base(spark)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            (F.sum(_cents("l_extendedprice").cast("decimal(20,0)")).cast("double") / 100.0).alias(
                "sum_base_price"
            ),
            (F.sum(_rev_long().cast("decimal(20,0)")).cast("double") / 10000.0).alias(
                "sum_disc_price"
            ),
            F.avg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def v_longproj(spark):
    return (
        _base(spark)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            (F.sum(_cents("l_extendedprice")).cast("double") / 100.0).alias(
                "sum_base_price"
            ),
            (F.sum(_rev_long()).cast("double") / 10000.0).alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def v_twolevel(spark):
    part = (
        _base(spark)
        .groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("_p"))
        .agg(
            F.sum("l_quantity").alias("_sq"),
            F.sum(_cents("l_extendedprice")).alias("_bp"),
            F.sum(_rev_long()).alias("_dp"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    return (
        part.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("_sq").alias("sum_qty"),
            (F.sum(F.col("_bp").cast("decimal(20,0)")).cast("double") / 100.0).alias(
                "sum_base_price"
            ),
            (F.sum(F.col("_dp").cast("decimal(20,0)")).cast("double") / 10000.0).alias(
                "sum_disc_price"
            ),
            (F.sum("_sq") / F.sum("_n")).alias("avg_qty"),
            F.sum("_n").alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def v_split(spark):
    """Exact money sums as TWO overflow-proof long sums per money column:
    hi = cents >> 15, lo = cents & 32767 (arithmetic shift: identity
    x == (x>>15)*2^15 + (x&32767) holds for all signed x). Each long sum
    is exact up to ~1e14 rows/group (hi <= 3.3e4 for rev units <= 1e9;
    1e14 * 3.3e4 = 3.3e18 < 2^63), so the sum is order-independent; the
    decimal widening happens ONCE on the final group rows."""
    b = _base(spark)
    c_bp = _cents("l_extendedprice")
    c_dp = _rev_long()
    agg = (
        b.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(F.shiftright(c_bp, 15)).alias("_bp_hi"),
            F.sum(c_bp.bitwiseAND(F.lit(32767))).alias("_bp_lo"),
            F.sum(F.shiftright(c_dp, 15)).alias("_dp_hi"),
            F.sum(c_dp.bitwiseAND(F.lit(32767))).alias("_dp_lo"),
            F.avg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(20,0)")  # noqa: E731
    return (
        agg.select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            ((dec("_bp_hi") * 32768 + dec("_bp_lo")).cast("double") / 100.0).alias("sum_base_price"),
            ((dec("_dp_hi") * 32768 + dec("_dp_lo")).cast("double") / 10000.0).alias("sum_disc_price"),
            "avg_qty",
            "cnt",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _centsf(col):
    # floor(x+0.5) == round-to-nearest under the near-integer contract
    # (x is within ~1e-9 of an integer on both engines), WITHOUT
    # Spark's Round-on-double BigDecimal path. floor() returns long.
    return F.floor(F.col(col) * 100 + F.lit(0.5))


def _rev_longf():
    return _centsf("l_extendedprice") * (F.lit(100) - _centsf("l_discount"))


def v_splitf(spark):
    b = _base(spark)
    c_bp = _centsf("l_extendedprice")
    c_dp = _rev_longf()
    agg = b.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum(F.shiftright(c_bp, 15)).alias("_bp_hi"),
        F.sum(c_bp.bitwiseAND(F.lit(32767))).alias("_bp_lo"),
        F.sum(F.shiftright(c_dp, 15)).alias("_dp_hi"),
        F.sum(c_dp.bitwiseAND(F.lit(32767))).alias("_dp_lo"),
        F.avg("l_quantity").alias("avg_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    dec = lambda c: F.col(c).cast("decimal(20,0)")  # noqa: E731
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        ((dec("_bp_hi") * 32768 + dec("_bp_lo")).cast("double") / 100.0).alias("sum_base_price"),
        ((dec("_dp_hi") * 32768 + dec("_dp_lo")).cast("double") / 10000.0).alias("sum_disc_price"),
        "avg_qty",
        "cnt",
    ).orderBy("l_returnflag", "l_linestatus")


VARIANTS = {
    "double": v_double,
    "cents20": v_cents20,
    "longproj": v_longproj,
    "twolevel": v_twolevel,
    "split": v_split,
    "splitf": v_splitf,
}


def budgeted_min(fn, budget=3.0, min_runs=3, cap=10):
    s = []
    spent = 0.0
    while True:
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        s.append(dt)
        spent += dt
        if len(s) >= min_runs and (spent >= budget or len(s) >= cap):
            return min(s), len(s)


def main():
    spark = get_spark(app_name="profile_cents")
    # warm: 3 un-timed sweeps of every variant (JIT)
    for _ in range(3):
        for fn in VARIANTS.values():
            fn(spark).collect()
    out = {}
    for name, fn in VARIANTS.items():
        fresh, nf = budgeted_min(lambda: fn(spark).collect())
        df = fn(spark)
        reused, nr = budgeted_min(lambda: df.collect())
        out[name] = {
            "fresh_s": round(fresh, 4),
            "reused_s": round(reused, 4),
            "n_fresh": nf,
            "n_reused": nr,
        }
        print(name, out[name], flush=True)
    # sanity: all money results identical across exact variants
    rows = {n: [tuple(r) for r in fn(spark).collect()] for n, fn in VARIANTS.items()}
    exact_equal = (
        rows["cents20"]
        == rows["twolevel"]
        == rows["longproj"]
        == rows["split"]
        == rows["splitf"]
    )
    out["_exact_variants_identical"] = exact_equal
    print(json.dumps(out))
    with open(os.environ.get("PROFILE_OUT", "/tmp/profile_cents.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
