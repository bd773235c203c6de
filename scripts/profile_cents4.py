"""Ground truth on recompilation: sample Spark's CodegenMetrics
(compilation count / time / generated-source bytes) around repeated
FRESH collects of the same query. If the counters advance per call,
the codegen cache never hits across identical fresh plans."""

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


def metrics(spark):
    m = spark._jvm.org.apache.spark.metrics.source.__getattr__("CodegenMetrics$").__getattr__("MODULE$")
    return {
        "compile_n": m.METRIC_SOURCE_CODE_SIZE().getCount(),
        "compile_ms": m.METRIC_COMPILATION_TIME().getSnapshot().getMax(),
        "compile_total_n": m.METRIC_COMPILATION_TIME().getCount(),
    }


def main():
    spark = get_spark(app_name="profile_cents4")
    for _ in range(3):
        v_cents20(spark).collect()
    before = metrics(spark)
    t0 = time.perf_counter()
    for _ in range(5):
        v_cents20(spark).collect()
    dt = time.perf_counter() - t0
    after = metrics(spark)
    print("5 fresh collects:", round(dt, 3), "s")
    print("before:", before)
    print("after: ", after)
    print(
        "compiles during 5 fresh calls:",
        after["compile_total_n"] - before["compile_total_n"],
        "max single compile ms:", after["compile_ms"],
    )


if __name__ == "__main__":
    main()
