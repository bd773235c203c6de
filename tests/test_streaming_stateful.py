"""transformWithStateInPandas streaming stateful tests (the unbounded twin
of tests/test_state.py; reference state scenarios ray_runner_test.py:363-602
on a live stream)."""

from pyspark.sql import functions as F

from ray_beam_runner_spark.streaming import FileDropStream, run_to_memory
from ray_beam_runner_spark.streaming.stateful import running_aggregate


def test_running_aggregate_stream(spark, tmp_path):
    rows = [(f"k{idx % 3}", float(idx), 1700000000 + idx) for idx in range(30)]
    df = spark.createDataFrame(rows, "key string, v double, epoch long").withColumn(
        "ts", F.timestamp_seconds(F.col("epoch"))
    ).drop("epoch")
    stream = (
        FileDropStream(spark, str(tmp_path / "drop_tws"))
        .write_slices(df, "ts", n_slices=3)
        .read_stream()
    )
    out = running_aggregate(stream, "key", "v")
    got = run_to_memory(out, output_mode="append")
    rows_out = got.collect()
    # per-key rows are emitted per micro-batch with RUNNING totals; the last
    # emission per key must equal the batch-computed total
    final = {}
    for r in rows_out:
        if r.cnt >= final.get(r.key, (0, 0.0))[0]:
            final[r.key] = (r.cnt, r.total)
    expected = {
        r.key: (r.cnt, r.total)
        for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("total")).collect()
    }
    assert final == expected, (final, expected)
