"""Custom data source (SDF analog) tests, mirroring the reference's
splittable-source scenarios (ray_runner_test.py:604-819, 1083-1115)."""

import json
import os

from pyspark.sql import functions as F

from ray_beam_runner_spark.sources.custom import register_all



def test_expand_strings_source(spark):
    # reference SDF fixture: ["abc","defghijklmno","pqrstuv","wxyz"] -> chars
    register_all(spark)
    strings = ["abc", "defghijklmno", "pqrstuv", "wxyz"]
    df = (
        spark.read.format("expand_strings")
        .option("strings", json.dumps(strings))
        .option("chunk", "4")
        .load()
    )
    chars = sorted(r.char for r in df.collect())
    assert chars == sorted("".join(strings))
    # restriction splitting produced >1 partition per long string
    assert df.rdd.getNumPartitions() >= 6


def test_expand_strings_count(spark):
    # sdf-source count test (ray_runner_test.py:1083-1115)
    register_all(spark)
    df = (
        spark.read.format("expand_strings")
        .option("strings", json.dumps(["aaaa"] * 5))
        .option("chunk", "2")
        .load()
    )
    assert df.count() == 20


def _drain(spark, agg, output_mode, n_expected_rows=None, timeout=120):
    """Drain an unbounded python-source stream: python stream readers don't
    support Trigger.AvailableNow (Spark falls back to single-batch), so run
    micro-batches until the source is exhausted, then stop — the reference's
    drain loop shape (ray_fn_runner.py:268-297)."""
    import time
    import uuid

    name = f"m_{uuid.uuid4().hex[:10]}"
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    t0 = time.time()
    deadline = t0 + timeout
    last = -1
    stable = 0
    while time.time() < deadline:
        n = spark.table(name).count()
        # Only count quiescence once output exists (or after a generous
        # warm-up for legitimately empty streams) — under load the first
        # micro-batch can take several seconds to land.
        stable = stable + 1 if (n == last and (n > 0 or time.time() > t0 + 20)) else 0
        last = n
        if (n_expected_rows is not None and n >= n_expected_rows) or stable >= 10:
            break
        time.sleep(0.5)
    q.stop()
    return spark.table(name)


def test_counter_stream_drain(spark):
    # unbounded source drained to its truncated bound (drain-mode analog,
    # ray_runner_test.py:761-819): consumes everything available, stops.
    register_all(spark)
    stream = (
        spark.readStream.format("counter_stream")
        .option("rowsPerBatch", "7")
        .option("maxValue", "23")
        .load()
    )
    got = _drain(spark, stream.select("value"), "append", n_expected_rows=23)
    assert sorted(r.value for r in got.collect()) == list(range(23))


def test_counter_stream_aggregation(spark):
    register_all(spark)
    stream = (
        spark.readStream.format("counter_stream")
        .option("rowsPerBatch", "10")
        .option("maxValue", "40")
        .load()
    )
    agg = stream.groupBy((F.col("value") % 2).alias("parity")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    got = _drain(spark, agg, "complete")
    final = {r.parity: r.cnt for r in got.collect()}
    assert final == {0: 20, 1: 20}


def test_python_udtf(spark):
    # SURVEY §2.7: DoFn-as-UDTF (1->N with arbitrary python) via the
    # Spark 3.5+ @udtf lateral-join surface
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, pos int")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split()):
                yield (w, i)

    spark.udtf.register("split_words", SplitWords)
    df = spark.createDataFrame([("the quick fox",), ("lazy dog",)], "line string")
    df.createOrReplaceTempView("udtf_lines")
    out = spark.sql(
        "SELECT t.word, t.pos FROM udtf_lines, LATERAL split_words(line) t"
    ).collect()
    got = sorted((r.word, r.pos) for r in out)
    assert got == sorted(
        [("the", 0), ("quick", 1), ("fox", 2), ("lazy", 0), ("dog", 1)]
    )


# -- TFRecord sink/source (SURVEY §2.1 WriteToTFRecord; reference
#    tft_iris_example/preprocessing.py:107-116) -------------------------------


def test_crc32c_known_vectors():
    # public CRC-32C test vectors (RFC 3720 appendix B.4)
    from ray_beam_runner_spark.sources.tfrecord import crc32c

    assert crc32c(b"") == 0x00000000
    assert crc32c(b"a") == 0xC1D04330
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_tfrecord_roundtrip(spark, tmp_path):
    from ray_beam_runner_spark.sources.tfrecord import read_tfrecord, write_tfrecord

    rows = [(f"record-{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, "value string").repartition(4)
    out = str(tmp_path / "tfr")
    n_shards = write_tfrecord(df, out)
    assert 1 <= n_shards <= 4
    import os

    names = sorted(os.listdir(out))
    assert names == [f"part-{i:05d}-of-{n_shards:05d}.tfrecord" for i in range(n_shards)]
    back = read_tfrecord(spark, out)
    vals = sorted(bytes(r.value).decode() for r in back.collect())
    assert vals == sorted(v for (v,) in rows)
    # shards parallelize the read: one input partition per file
    assert back.rdd.getNumPartitions() == n_shards
    # overwrite with FEWER partitions must not leave stale shards behind
    df2 = spark.createDataFrame(rows[:10], "value string").coalesce(1)
    n2 = write_tfrecord(df2, out)
    assert n2 == 1
    assert sorted(os.listdir(out)) == ["part-00000-of-00001.tfrecord"]
    vals2 = sorted(bytes(r.value).decode() for r in read_tfrecord(spark, out).collect())
    assert vals2 == sorted(v for (v,) in rows[:10])


def test_tfrecord_corruption_detected(spark, tmp_path):
    import os

    import pytest as _pytest

    from ray_beam_runner_spark.sources.tfrecord import decode_records, encode_record

    blob = encode_record(b"hello") + encode_record(b"world")
    assert [bytes(x) for x in decode_records(blob)] == [b"hello", b"world"]
    corrupted = blob[:13] + bytes([blob[13] ^ 0xFF]) + blob[14:]
    with _pytest.raises(ValueError, match="CRC mismatch"):
        list(decode_records(corrupted))
    # verify=False skips the check (salvage mode)
    assert len(list(decode_records(corrupted, verify=False))) == 2


def test_tfrecord_datasource_v2_writer(spark, tmp_path):
    # df.write.format("tfrecord") — DSv2 path with temp-file commit
    # protocol (speculated/failed task files never renamed)
    from ray_beam_runner_spark.sources.tfrecord import read_tfrecord, register_tfrecord

    register_tfrecord(spark)
    out = str(tmp_path / "dsv2")
    df = spark.createDataFrame([(f"r{i}",) for i in range(30)], "value string").repartition(3)
    df.write.format("tfrecord").mode("overwrite").option("path", out).save()
    import os

    assert sorted(os.listdir(out)) == [
        f"part-{i:05d}-of-00003.tfrecord" for i in range(3)
    ]
    back = sorted(bytes(r.value).decode() for r in read_tfrecord(spark, out).collect())
    assert back == sorted(f"r{i}" for i in range(30))


def test_tfrecord_datasource_append_rejected(spark, tmp_path):
    from ray_beam_runner_spark.sources.tfrecord import register_tfrecord

    register_tfrecord(spark)
    out = str(tmp_path / "app")
    df = spark.createDataFrame([("a",)], "value string")
    df.write.format("tfrecord").mode("overwrite").option("path", out).save()
    # append into an existing dataset would corrupt part-of-N naming
    import pytest as _pytest

    with _pytest.raises(Exception, match="append"):
        df.write.format("tfrecord").mode("append").option("path", out).save()


def test_write_jsonl_shards_deterministic(spark, sf_dir, tmp_path):
    import glob
    import os

    from ray_beam_runner_spark.sources.io import read_json, write_jsonl_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    out = str(tmp_path / "shards")
    manifest = write_jsonl_shards(docs, out, "doc_id", n_shards=4)
    assert sorted(manifest) == [0, 1, 2, 3]
    assert sum(manifest.values()) == docs.count()
    # hive-style shard dirs, one non-empty file set each
    dirs = sorted(os.path.basename(p) for p in glob.glob(f"{out}/_shard=*"))
    assert dirs == ["_shard=0", "_shard=1", "_shard=2", "_shard=3"]
    # round-trip preserves every row
    back = read_json(spark, out)
    assert back.count() == docs.count()
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) == sorted(
        r.doc_id for r in docs.select("doc_id").collect()
    )
    # shard assignment is content-addressed: a rewrite yields byte-identical
    # manifests (no scheduling-dependent round-robin)
    manifest2 = write_jsonl_shards(docs, str(tmp_path / "shards2"), "doc_id", n_shards=4)
    assert manifest2 == manifest


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    # daily-partitioned layout: a date-filtered scan must read only the
    # matching partition directories (PartitionFilters), not the table
    from pyspark.sql import functions as F

    from ray_beam_runner_spark.plans.explain import formatted_plan
    from ray_beam_runner_spark.session import read_parquet_normalized
    from ray_beam_runner_spark.sources.io import write_parquet

    ev = read_parquet_normalized(spark, f"{sf_dir}/events.parquet").withColumn(
        "day", F.to_date("ts")
    )
    out = str(tmp_path / "events_by_day")
    write_parquet(ev, out, partition_by=["day"])
    back = spark.read.parquet(out).filter(F.col("day") == "2024-01-05")
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan and "2024-01-05" in plan.replace("isnotnull", ""), (
        plan[:2000]
    )
    exact = ev.filter(F.col("day") == "2024-01-05").count()
    assert back.count() == exact > 0
    # direct evidence of pruning: every file actually read lives under the
    # matching partition directory (input_file_name reflects the real scan,
    # unlike DataFrame.inputFiles which lists the unpruned file index)
    files_read = [
        r.f for r in back.select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert files_read and all("day=2024-01-05" in f for f in files_read), files_read[:5]


def test_dynamic_partition_overwrite_backfill(spark, sf_dir, tmp_path):
    # backfilling ONE day must rewrite only that partition and leave the
    # rest byte-identical — the daily-pipeline idempotent-rerun contract
    # (static overwrite mode would clobber the whole table)
    from pyspark.sql import functions as F

    from ray_beam_runner_spark.session import read_parquet_normalized
    from ray_beam_runner_spark.sources.io import write_parquet

    ev = read_parquet_normalized(spark, f"{sf_dir}/events.parquet").withColumn(
        "day", F.to_date("ts")
    )
    out = str(tmp_path / "events_backfill")
    write_parquet(ev, out, partition_by=["day"])
    total_before = spark.read.parquet(out).count()
    day5_before = spark.read.parquet(out).filter(F.col("day") == "2024-01-05").count()

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patch = (
            ev.filter(F.col("day") == "2024-01-05")
            .withColumn("value", F.col("value") * 2)
        )
        write_parquet(patch, out, mode="overwrite", partition_by=["day"])
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    after = spark.read.parquet(out)
    assert after.count() == total_before  # other days untouched
    assert after.filter(F.col("day") == "2024-01-05").count() == day5_before
    # the patched day really was rewritten
    v_old = ev.filter(F.col("day") == "2024-01-05").agg(F.sum("value")).collect()[0][0]
    v_new = after.filter(F.col("day") == "2024-01-05").agg(F.sum("value")).collect()[0][0]
    assert abs(v_new - 2 * v_old) < 1e-6 * max(1.0, abs(v_old))


def test_schema_evolution_merge_read(spark, sf_dir, tmp_path):
    # a long-lived corpus accumulates files written under evolving
    # schemas; mergeSchema reads must unify them with NULLs for columns
    # absent in older files (the contract that lets a 100 TB table add a
    # column without rewriting history)
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "evolving")
    docs.select("doc_id", "text").limit(100).write.parquet(f"{out}/batch=0")
    docs.select("doc_id", "text", F.lit("v2").alias("pipeline_version")).limit(
        50
    ).write.parquet(f"{out}/batch=1")
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"doc_id", "text", "pipeline_version", "batch"}
    assert merged.count() == 150
    assert merged.filter(F.col("pipeline_version").isNull()).count() == 100


def test_csv_roundtrip_with_schema(spark, tmp_path):
    # CSV with explicit schema (inference is a full extra pass at scale —
    # production reads always pass the schema)
    from ray_beam_runner_spark.sources.io import read_csv

    path = tmp_path / "data.csv"
    path.write_text("id,name,score\n1,alpha,1.5\n2,beta,-0.25\n3,,0.0\n")
    df = read_csv(spark, str(path), header=True, schema="id long, name string, score double")
    rows = sorted(map(tuple, df.collect()))
    assert rows == [(1, "alpha", 1.5), (2, "beta", -0.25), (3, None, 0.0)]
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "string", "double",
    ]


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    # ORC: same columnar scan contract as parquet — values round-trip,
    # filters reach the scan (PushedFilters), projection prunes ReadSchema
    from ray_beam_runner_spark.sources.io import read_orc, write_orc

    src = spark.read.parquet(f"{sf_dir}/nation.parquet")
    out = str(tmp_path / "nation_orc")
    write_orc(src, out)
    back = read_orc(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    plan = (
        back.filter(F.col("n_regionkey") == 1)
        .select("n_name")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "n_regionkey" in plan, plan


def test_upsert_parquet_unpartitioned(spark, tmp_path):
    from ray_beam_runner_spark.sources.io import upsert_parquet

    path = str(tmp_path / "dim")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, val string"
    )
    upsert_parquet(spark, path, base, keys=["id"])
    updates = spark.createDataFrame([(2, "B2"), (4, "d")], "id long, val string")
    upsert_parquet(spark, path, updates, keys=["id"])
    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert got == [(1, "a"), (2, "B2"), (3, "c"), (4, "d")]
    # no staging/old leftovers
    leftovers = [p for p in os.listdir(tmp_path) if p != "dim"]
    assert leftovers == []


def test_upsert_parquet_partitioned_touches_only_updated_partitions(spark, tmp_path):
    from ray_beam_runner_spark.sources.io import upsert_parquet

    path = str(tmp_path / "fact")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "id long, src string, v double",
    )
    upsert_parquet(spark, path, base, keys=["id"], partition_by=["src"])
    untouched = sorted(os.listdir(os.path.join(path, "src=b")))
    updates = spark.createDataFrame([(2, "a", 99.0), (9, "a", 9.0)], "id long, src string, v double")
    upsert_parquet(spark, path, updates, keys=["id"], partition_by=["src"])
    got = sorted(map(tuple, spark.read.parquet(path).select("id", "src", "v").collect()))
    assert got == [(1, "a", 10.0), (2, "a", 99.0), (3, "b", 30.0), (9, "a", 9.0)]
    # dynamic overwrite must not have rewritten the untouched partition
    assert sorted(os.listdir(os.path.join(path, "src=b"))) == untouched


def test_upsert_parquet_null_partition_value_preserved(spark, tmp_path):
    # a NULL partition value lands in __HIVE_DEFAULT_PARTITION__; the
    # touched-partition predicate must select it null-safely — a plain ==
    # filtered the partition to empty while dynamic overwrite still
    # rewrote it, silently deleting the non-matching rows
    from ray_beam_runner_spark.sources.io import upsert_parquet

    path = str(tmp_path / "nullpart")
    base = spark.createDataFrame(
        [(1, None, 1.0), (2, None, 2.0), (3, "a", 3.0)],
        "id long, src string, v double",
    )
    upsert_parquet(spark, path, base, keys=["id"], partition_by=["src"])
    updates = spark.createDataFrame([(2, None, 99.0)], "id long, src string, v double")
    upsert_parquet(spark, path, updates, keys=["id"], partition_by=["src"])
    got = sorted(
        map(tuple, spark.read.parquet(path).select("id", "src", "v").collect())
    )
    assert got == [(1, None, 1.0), (2, None, 99.0), (3, "a", 3.0)]
