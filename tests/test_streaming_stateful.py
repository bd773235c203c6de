"""Streaming stateful tests (the unbounded twin of tests/test_state.py;
reference state scenarios ray_runner_test.py:363-602 on a live stream).

Two backends share one conformance suite: applyInPandasWithState always
runs; the transformWithStateInPandas tests execute wherever protobuf is
importable (importorskip — absent in this container, active on any
standard cluster image) and assert the SAME final-totals contract, so the
tWS processor's state/timer logic is demonstrated, not just asserted,
as soon as the dependency exists."""

import pytest
from pyspark.sql import functions as F

from ray_beam_runner_spark.streaming import FileDropStream, run_to_memory
from ray_beam_runner_spark.streaming.stateful import running_aggregate


def _keyed_stream(spark, tmp_path, name, n=30, gap_s=1):
    rows = [(f"k{idx % 3}", float(idx), 1700000000 + idx * gap_s) for idx in range(n)]
    df = spark.createDataFrame(rows, "key string, v double, epoch long").withColumn(
        "ts", F.timestamp_seconds(F.col("epoch"))
    ).drop("epoch")
    stream = (
        FileDropStream(spark, str(tmp_path / name))
        .write_slices(df, "ts", n_slices=3)
        .read_stream()
    )
    return df, stream


def _final_totals(rows_out):
    final = {}
    for r in rows_out:
        if r.cnt >= final.get(r.key, (0, 0.0))[0]:
            final[r.key] = (r.cnt, r.total)
    return final


def _expected_totals(df):
    return {
        r.key: (r.cnt, r.total)
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("total"))
        .collect()
    }


def test_tws_running_aggregate(spark, tmp_path):
    # reference running-count state case (ray_runner_test.py:363-393) on
    # the transformWithStateInPandas backend: ValueState carried across
    # micro-batches, last emission per key == batch aggregate
    pytest.importorskip("google.protobuf")
    from ray_beam_runner_spark.streaming.stateful import running_aggregate_tws

    df, stream = _keyed_stream(spark, tmp_path, "tws_run")
    got = run_to_memory(running_aggregate_tws(stream, "key", "v"), "append")
    assert _final_totals(got.collect()) == _expected_totals(df)


def test_tws_inactivity_timer_flush(spark, tmp_path):
    # reference timer set/re-set/clear cases (ray_runner_test.py:428-602):
    # each batch re-registers the key's single inactivity timer (delete +
    # register = re-set semantics); once the watermark passes last-seen +
    # inactivity the timer fires EXACTLY once per key, emits the final
    # flush row, and clears state
    pytest.importorskip("google.protobuf")
    from ray_beam_runner_spark.streaming.stateful import running_aggregate_tws

    df, stream = _keyed_stream(spark, tmp_path, "tws_timer", gap_s=1)
    out = running_aggregate_tws(
        stream, "key", "v", ts_col="ts",
        watermark_delay="2 seconds", inactivity_ms=2000,
    )
    rows = run_to_memory(out, "append").collect()
    finals = [r for r in rows if r.final]
    # one flush per key, carrying the full per-key totals
    assert sorted(r.key for r in finals) == sorted(_expected_totals(df))
    for r in finals:
        assert (r.cnt, r.total) == _expected_totals(df)[r.key]


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
