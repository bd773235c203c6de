"""Split optimize/planning from codegen+execute for the cents q_agg:
build -> analyze -> executedPlan (optimize+physical planning) ->
collect (codegen compile + execute). Also dump whether two fresh
plans of the same query generate IDENTICAL codegen source (cache-key
check): if the text differs per plan instance, the JVM codegen LRU
can never hit across fresh calls."""

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


def v_cents20(spark):
    return (
        _base(spark)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            (F.sum(_cents("l_extendedprice").cast("decimal(20,0)")).cast("double") / 100.0).alias("sum_base_price"),
            (F.sum(_rev_long().cast("decimal(20,0)")).cast("double") / 10000.0).alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def v_double(spark):
    return (
        _base(spark)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def phases4(spark, fn, n=8):
    tb = ta = tp = te = 0.0
    for _ in range(n):
        t0 = time.perf_counter()
        df = fn(spark)
        t1 = time.perf_counter()
        df.schema
        t2 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t3 = time.perf_counter()
        df.collect()
        t4 = time.perf_counter()
        tb += t1 - t0
        ta += t2 - t1
        tp += t3 - t2
        te += t4 - t3
    return {
        "build": round(tb / n, 4),
        "analyze": round(ta / n, 4),
        "plan": round(tp / n, 4),
        "codegen_exec": round(te / n, 4),
    }


def main():
    spark = get_spark(app_name="profile_cents3")
    for _ in range(3):
        v_double(spark).collect()
        v_cents20(spark).collect()
    print("double ", phases4(spark, v_double), flush=True)
    print("cents20", phases4(spark, v_cents20), flush=True)
    # codegen source identity across two fresh plans
    try:
        j = spark.sparkContext._jvm
        dbg = j.org.apache.spark.sql.execution.debug
        s1 = dbg.codegenString(v_cents20(spark)._jdf.queryExecution().executedPlan())
        s2 = dbg.codegenString(v_cents20(spark)._jdf.queryExecution().executedPlan())
        print("codegen_identical:", s1 == s2, "len:", len(s1), flush=True)
        if s1 != s2:
            import difflib

            l1, l2 = s1.splitlines(), s2.splitlines()
            diffs = [d for d in difflib.unified_diff(l1, l2, lineterm="", n=0)]
            print("n_diff_lines:", len(diffs), flush=True)
            for d in diffs[:40]:
                print(d, flush=True)
    except Exception as e:  # noqa: BLE001
        print("codegen dump failed:", e, flush=True)


if __name__ == "__main__":
    main()
