"""Phase-split the fresh-call overhead of the exact-cents q_agg shape:
build (Python plan construction) vs analysis (df.schema) vs
optimize+codegen+execute (collect). Then re-measure with whole-stage
codegen OFF to attribute the janino-compile share, and with the
codegen class cache enlarged (default 100 entries; the bench session
sweeps ~40 queries x several codegen units, so the LRU may thrash and
force a recompile on every fresh call)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ray_beam_runner_spark import get_spark
from ray_beam_runner_spark.session import read_parquet_normalized

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_CACHE = {}


def _base(spark):
    if "li" not in _CACHE:
        _CACHE["li"] = read_parquet_normalized(
            spark, os.path.join(SF_DIR, "lineitem.parquet")
        )
    return _CACHE["li"].filter(
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


def phases(spark, fn, n=8):
    tb = ta = te = 0.0
    for _ in range(n):
        t0 = time.perf_counter()
        df = fn(spark)
        t1 = time.perf_counter()
        df.schema  # forces analysis
        t2 = time.perf_counter()
        df.collect()
        t3 = time.perf_counter()
        tb += t1 - t0
        ta += t2 - t1
        te += t3 - t2
    return {"build": round(tb / n, 4), "analyze": round(ta / n, 4), "exec": round(te / n, 4)}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "default"
    extra = {}
    if which == "bigcache":
        extra = {"spark.sql.codegen.cache.maxEntries": "5000"}
    spark = get_spark(app_name=f"profile_cents2_{which}", extra_conf=extra)
    if which == "nocodegen":
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
    for _ in range(3):
        v_double(spark).collect()
        v_cents20(spark).collect()
    print(which, "double ", phases(spark, v_double), flush=True)
    print(which, "cents20", phases(spark, v_cents20), flush=True)


if __name__ == "__main__":
    main()
