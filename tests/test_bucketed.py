"""Storage-partitioned (bucketed) snapshot tables — round-12 verdict
ask #2. The x100 TPC-H leg's diagnosis: every lineitem x orders-class
join pays two shuffle materializations; a co-clustered layout the
planner trusts elides them (Iceberg SPJ / Spark bucketed tables).
These tests pin down the plans, not just the results: a co-bucketed
equi-join and a bucket-key aggregate must show ZERO shuffle exchanges,
a one-side-bucketed join exactly one.

Reference analog: none — the reference's GBK regroups through a
single-reducer shuffle (ray_beam_runner/portability/execution.py:268).
"""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from ray_beam_runner_spark.plans.explain import count_exchanges
from ray_beam_runner_spark.sources import bucketed as bkt
from ray_beam_runner_spark.sources import snapshots as snap


def _tdir():
    return tempfile.mkdtemp(prefix="rbrs_bkt_")


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _facts(spark, n=5000, seed=1):
    return spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.xxhash64(F.col("id") + seed) % 100).alias("v"),
    )


def test_write_read_roundtrip_and_time_travel(spark):
    t = _tdir()
    a = _facts(spark, 3000)
    v1 = bkt.write_bucketed(a, t, ["k"], 8)
    assert v1 == 1
    got = bkt.read_bucketed(spark, t)
    assert got.count() == 3000
    assert sorted(r.k for r in got.filter(F.col("k") < 5).collect()) == [0, 1, 2, 3, 4]
    # layout: one file per bucket, bucket-id suffix in the name
    spec = bkt.bucket_spec(t)
    assert spec["n"] == 8 and spec["cols"] == ["k"]
    files = snap.read_manifest(t, v1)["files"]
    assert len(files) == 8
    assert all("_0000" in os.path.basename(f) for f in files)
    # overwrite -> v2; v1 still readable (time travel)
    v2 = bkt.write_bucketed(_facts(spark, 100), t, ["k"], 8)
    assert bkt.read_bucketed(spark, t).count() == 100
    assert bkt.read_bucketed(spark, t, version=v1).count() == 3000
    assert v2 == 2


def test_cobucketed_join_has_zero_exchanges(spark, no_broadcast):
    """The headline plan: two fact tables co-bucketed on the join key
    equi-join with NO shuffle exchange on either side."""
    ta, tb = _tdir(), _tdir()
    bkt.write_bucketed(_facts(spark, 4000, seed=1), ta, ["k"], 8)
    bkt.write_bucketed(_facts(spark, 4000, seed=2), tb, ["k"], 8)
    j = bkt.storage_partitioned_join(spark, ta, tb, "k")
    assert count_exchanges(j) == 0
    assert j.count() == 4000
    # and the join is NOT a broadcast workaround: same plan, real SMJ
    from ray_beam_runner_spark.plans.explain import formatted_plan

    assert "SortMergeJoin" in formatted_plan(j)


def test_cobucketed_join_then_agg_result_matches_plain(spark, no_broadcast):
    ta, tb = _tdir(), _tdir()
    a, b = _facts(spark, 4000, seed=1), _facts(spark, 4000, seed=2)
    bkt.write_bucketed(a, ta, ["k"], 8)
    bkt.write_bucketed(b, tb, ["k"], 8)
    ga = bkt.read_bucketed(spark, ta)
    gb = bkt.read_bucketed(spark, tb)
    got = (
        ga.join(gb, ga["k"] == gb["k"])
        .groupBy(ga["v"])
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = (
        a.join(b, a["k"] == b["k"]).groupBy(a["v"]).agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_one_side_bucketed_shuffles_only_probe_side(spark, no_broadcast):
    ta = _tdir()
    bkt.write_bucketed(_facts(spark, 4000), ta, ["k"], 4)
    ga = bkt.read_bucketed(spark, ta)
    other = spark.range(0, 4000).select(F.col("id").alias("k"), F.lit(1).alias("z"))
    j = ga.join(other, "k")
    # exactly ONE exchange: the non-bucketed side aligns to the buckets
    assert count_exchanges(j) == 1
    assert j.count() == 4000


def test_groupby_bucket_key_is_exchange_free(spark, no_broadcast):
    ta = _tdir()
    bkt.write_bucketed(_facts(spark, 4000), ta, ["k"], 4)
    agg = bkt.read_bucketed(spark, ta).groupBy("k").agg(F.sum("v").alias("s"))
    assert count_exchanges(agg) == 0
    assert agg.count() == 4000


def test_spec_validation_errors(spark):
    ta, tb, tc = _tdir(), _tdir(), _tdir()
    bkt.write_bucketed(_facts(spark, 100), ta, ["k"], 4)
    bkt.write_bucketed(_facts(spark, 100), tb, ["k"], 8)
    with pytest.raises(ValueError, match="bucket counts differ"):
        bkt.storage_partitioned_join(spark, ta, tb, "k")
    snap.write_snapshot(_facts(spark, 100), tc)
    with pytest.raises(ValueError, match="not bucketed"):
        bkt.storage_partitioned_join(spark, ta, tc, "k")
    with pytest.raises(ValueError, match="not a bucket column"):
        bkt.storage_partitioned_join(spark, ta, ta, "v")


def test_vacuum_reclaims_replaced_bucketed_version(spark):
    t = _tdir()
    bkt.write_bucketed(_facts(spark, 1000), t, ["k"], 4)
    v1_files = set(snap.read_manifest(t, 1)["files"])
    bkt.write_bucketed(_facts(spark, 500), t, ["k"], 4)
    deleted = set(snap.vacuum(t, keep_last=1, orphan_ttl_seconds=0))
    assert v1_files <= deleted  # old version's buckets reclaimed
    assert bkt.read_bucketed(spark, t).count() == 500


def test_read_bucketed_falls_back_on_unbucketed_table(spark):
    t = _tdir()
    snap.write_snapshot(_facts(spark, 200), t, cluster_by=["k"], n_files=4)
    assert bkt.read_bucketed(spark, t).count() == 200


def test_merge_bucketed_rewrites_only_affected_buckets(spark):
    """Incremental MERGE keeps the bucket layout: only the buckets the
    update keys hash into are rewritten, everything else carries by
    link; content equals anti-join ∪ updates minus deletes."""
    t = _tdir()
    bkt.write_bucketed(_facts(spark, 3000), t, ["k"], 8)
    m1 = snap.read_manifest(t, 1)
    upd = spark.createDataFrame([(5, 555), (6, 666), (9000, 9)], "k long, v long")
    dels = spark.createDataFrame([(7,)], "k long")
    v = bkt.merge_bucketed(spark, t, upd, delete_keys_df=dels)
    assert v == 2
    m2 = snap.read_manifest(t, 2)
    # affected buckets = hash-buckets of keys {5, 6, 9000, 7}
    affected = {
        r._b for r in spark.createDataFrame([(5,), (6,), (9000,), (7,)], "k long")
        .select(F.pmod(F.hash("k"), F.lit(8)).alias("_b")).distinct().collect()
    }
    assert set(m2["rewrote"]) == {
        r for r in m1["files"] if bkt._bucket_id_of(r) in affected
    }
    # carried files: same basenames, new commit dir
    carried_b = {os.path.basename(r) for r in m1["files"]} - {
        os.path.basename(r) for r in m2["rewrote"]
    }
    assert carried_b <= {os.path.basename(r) for r in m2["files"]}
    got = {r.k: r.v for r in bkt.read_bucketed(spark, t).collect()}
    assert got[5] == 555 and got[6] == 666 and got[9000] == 9
    assert 7 not in got
    assert len(got) == 3000 - 1 + 1  # -deleted k=7, +new k=9000
    # time travel still shows the pre-merge table
    old = {r.k: r.v for r in bkt.read_bucketed(spark, t, version=1).collect()}
    assert len(old) == 3000 and 7 in old


def test_merged_table_still_joins_exchange_free(spark, no_broadcast):
    """The layout invariant survives the merge: a co-bucketed join
    against an untouched partner still plans with zero exchanges, and
    the file bucket-id suffixes still agree with pmod(hash, n)."""
    ta, tb = _tdir(), _tdir()
    bkt.write_bucketed(_facts(spark, 2000), ta, ["k"], 8)
    bkt.write_bucketed(
        _facts(spark, 2000, seed=9).withColumnRenamed("v", "w"), tb, ["k"], 8
    )
    bkt.merge_bucketed(
        spark, ta, spark.createDataFrame([(11, 1), (4000, 2)], "k long, v long")
    )
    j = bkt.storage_partitioned_join(spark, ta, tb, "k")
    assert count_exchanges(j) == 0
    got = {r.k: r.v for r in j.collect()}
    assert got[11] == 1 and 4000 not in got  # 4000 has no partner row
    # every data file's name-suffix bucket id matches the hash bucket of
    # every key inside it
    m = snap.read_manifest(ta, snap.latest_version(ta))
    for rel in m["files"]:
        bid = bkt._bucket_id_of(rel)
        rows = spark.read.parquet(os.path.join(ta, rel)).select(
            F.pmod(F.hash("k"), F.lit(8)).alias("_b")
        ).distinct().collect()
        assert {r._b for r in rows} <= {bid}


def test_merge_bucketed_rejects_unbucketed_and_schema_drift(spark):
    t = _tdir()
    snap.write_snapshot(_facts(spark, 100), t, cluster_by=["k"], n_files=2)
    with pytest.raises(ValueError, match="not a bucketed table"):
        bkt.merge_bucketed(spark, t, _facts(spark, 10))
    t2 = _tdir()
    bkt.write_bucketed(_facts(spark, 100), t2, ["k"], 4)
    bad = spark.createDataFrame([(1, 2, 3)], "k long, v long, extra long")
    with pytest.raises(ValueError, match="bucketed tables do not evolve"):
        bkt.merge_bucketed(spark, t2, bad)


def test_vacuum_after_merge_keeps_linked_carried_files(spark):
    """merge_bucketed carries untouched buckets by HARD LINK into the
    new commit dir: vacuuming away the pre-merge version unlinks only
    the OLD paths — the carried files' content must stay readable
    through the new version's links, and the post-vacuum table must
    still join exchange-free."""
    t = _tdir()
    bkt.write_bucketed(_facts(spark, 2000), t, ["k"], 8)
    bkt.merge_bucketed(
        spark, t, spark.createDataFrame([(3, 333)], "k long, v long")
    )
    before = {r.k: r.v for r in bkt.read_bucketed(spark, t).collect()}
    deleted = snap.vacuum(t, keep_last=1, orphan_ttl_seconds=0)
    assert deleted  # the replaced bucket + the old dir's carried paths
    after = {r.k: r.v for r in bkt.read_bucketed(spark, t).collect()}
    assert after == before and after[3] == 333 and len(after) == 2000


def test_coalesced_bucket_join_divisible_counts(spark, no_broadcast):
    """8-bucket x 4-bucket join: with Spark's bucket coalescing enabled
    the join still plans with ZERO exchanges (the 8-bucket side reads
    2 files per task); with it disabled the helper refuses loudly."""
    ta, tb = _tdir(), _tdir()
    bkt.write_bucketed(_facts(spark, 2000), ta, ["k"], 8)
    bkt.write_bucketed(
        _facts(spark, 2000, seed=9).withColumnRenamed("v", "w"), tb, ["k"], 4
    )
    with pytest.raises(ValueError, match="coalesceBucketsInJoin"):
        bkt.storage_partitioned_join(spark, ta, tb, "k")
    spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
    try:
        j = bkt.storage_partitioned_join(spark, ta, tb, "k")
        assert count_exchanges(j) == 0
        assert j.count() == 2000
    finally:
        spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "false")


def _race_bucketed(spark, monkeypatch, t, theirs, fn):
    """While `fn`'s merge is about to publish, `theirs` merges first."""
    real_publish = snap._publish
    fired = {"done": False}

    def racing_publish(table_dir, version, manifest):
        if not fired["done"] and manifest.get("op") == "merge":
            fired["done"] = True
            bkt.merge_bucketed(spark, t, theirs)
        return real_publish(table_dir, version, manifest)

    monkeypatch.setattr(snap, "_publish", racing_publish)
    try:
        return fn()
    finally:
        monkeypatch.setattr(snap, "_publish", real_publish)


def test_bucket_disjoint_merges_both_commit(spark, monkeypatch, no_broadcast):
    """Two merge_bucketed writers over key batches hashing into
    DISJOINT buckets: the loser rebases by bucket id (no re-run — no
    retry loop exists), both batches land, and the table still joins
    exchange-free."""
    t = _tdir()
    bkt.write_bucketed(_facts(spark, 2000), t, ["k"], 8)
    # pick keys in provably different buckets of 8
    import pyspark.sql.functions as _F
    bucket_of = {
        r.k: r._b
        for r in spark.createDataFrame([(k,) for k in range(20)], "k long")
        .select("k", _F.pmod(_F.hash("k"), _F.lit(8)).alias("_b")).collect()
    }
    k_mine = next(k for k in range(20) if bucket_of[k] == 0)
    k_theirs = next(k for k in range(20) if bucket_of[k] == 5)
    v = _race_bucketed(
        spark, monkeypatch, t,
        theirs=spark.createDataFrame([(k_theirs, 555)], "k long, v long"),
        fn=lambda: bkt.merge_bucketed(
            spark, t, spark.createDataFrame([(k_mine, 111)], "k long, v long")
        ),
    )
    m = snap.read_manifest(t, v)
    assert m.get("rebased_from") == 2 and v == 3
    got = {r.k: r.v for r in bkt.read_bucketed(spark, t).collect()}
    assert got[k_mine] == 111 and got[k_theirs] == 555 and len(got) == 2000
    # layout invariant survives the rebase
    tb = _tdir()
    bkt.write_bucketed(
        _facts(spark, 2000, seed=9).withColumnRenamed("v", "w"), tb, ["k"], 8
    )
    j = bkt.storage_partitioned_join(spark, t, tb, "k")
    assert count_exchanges(j) == 0


def test_bucket_overlapping_merges_conflict(spark, monkeypatch):
    """Racers whose key batches hash into the SAME bucket: the loser
    must NOT rebase (its rewrite consumed a pre-image the interloper
    replaced) — it raises for the caller to re-run."""
    t = _tdir()
    bkt.write_bucketed(_facts(spark, 2000), t, ["k"], 8)
    import pyspark.sql.functions as _F
    bucket_of = {
        r.k: r._b
        for r in spark.createDataFrame([(k,) for k in range(20)], "k long")
        .select("k", _F.pmod(_F.hash("k"), _F.lit(8)).alias("_b")).collect()
    }
    k1 = next(k for k in range(20) if bucket_of[k] == 3)
    k2 = next(k for k in range(20) if bucket_of[k] == 3 and k != k1)
    with pytest.raises(snap.ConcurrentCommitError):
        _race_bucketed(
            spark, monkeypatch, t,
            theirs=spark.createDataFrame([(k2, 555)], "k long, v long"),
            fn=lambda: bkt.merge_bucketed(
                spark, t, spark.createDataFrame([(k1, 111)], "k long, v long")
            ),
        )


def test_time_travel_spj_is_exchange_free(spark, no_broadcast):
    """A version-pinned storage-partitioned join (read a bucketed fact
    as of BEFORE a merge) is exchange-free like a latest join and sees
    the pinned content — the epoch-consistent read for bucketed facts."""
    ta, tb = _tdir(), _tdir()
    bkt.write_bucketed(_facts(spark, 1500), ta, ["k"], 8)
    bkt.write_bucketed(
        _facts(spark, 1500, seed=9).withColumnRenamed("v", "w"), tb, ["k"], 8
    )
    bkt.merge_bucketed(
        spark, ta, spark.createDataFrame([(10, 999)], "k long, v long")
    )
    pinned = bkt.storage_partitioned_join(spark, ta, tb, "k", left_version=1)
    assert count_exchanges(pinned) == 0
    got = {r.k: r.v for r in pinned.collect()}
    assert got[10] != 999  # v1 content, pre-merge
    latest = bkt.storage_partitioned_join(spark, ta, tb, "k")
    assert {r.k: r.v for r in latest.collect()}[10] == 999


def test_merge_plan_never_broadcasts_batch_frame(spark, no_broadcast):
    """The update key-set and delete-set are BATCH-proportional — a
    forced broadcast of either is a driver OOM at the 100 TB design
    point (round-13 verdict). With the auto-broadcast threshold off,
    the merge plan must carry NO broadcast at all: a hint would still
    plan a BroadcastExchange and fail here."""
    from ray_beam_runner_spark.plans.explain import formatted_plan

    t = _tdir()
    bkt.write_bucketed(_facts(spark, 5000), t, ["k"], 8)
    m = snap.read_manifest(t, 1)
    upd = spark.range(0, 2500).select(
        F.col("id").alias("k"), F.lit(7).alias("v")
    )  # 50% of the table: nothing AQE should broadcast blindly
    dels = spark.range(2500, 3500).select(
        F.col("id").alias("k"), F.lit(0).alias("v")
    )
    merged, affected, replaced, carried = bkt._plan_merge(
        spark, t, m, ["k"], 8, upd, dels
    )
    plan = formatted_plan(merged)
    assert "BroadcastExchange" not in plan, plan[:3000]
    # and the real merge over the same batch is correct end-to-end
    v = bkt.merge_bucketed(spark, t, upd, delete_keys_df=dels.select("k"))
    got = bkt.read_bucketed(spark, t, version=v)
    assert got.count() == 5000 - 1000
    assert got.filter(F.col("k") < 2500).filter(F.col("v") != 7).count() == 0


def test_spj_refuses_ratio_above_max_bucket_ratio(spark, no_broadcast):
    """Divisible counts beyond coalesceBucketsInJoin.maxBucketRatio
    (default 4): Spark's rule silently declines to coalesce and the
    join plans WITH exchanges — the helper must refuse loudly instead
    (round-13 ADVICE, medium)."""
    ta, tb = _tdir(), _tdir()
    bkt.write_bucketed(_facts(spark, 2000), ta, ["k"], 16)
    bkt.write_bucketed(
        _facts(spark, 2000, seed=9).withColumnRenamed("v", "w"), tb, ["k"], 2
    )
    spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
    try:
        with pytest.raises(ValueError, match="maxBucketRatio"):
            bkt.storage_partitioned_join(spark, ta, tb, "k")
        # raising the conf past the ratio restores the zero-exchange plan
        spark.conf.set(
            "spark.sql.bucketing.coalesceBucketsInJoin.maxBucketRatio", "8"
        )
        j = bkt.storage_partitioned_join(spark, ta, tb, "k")
        assert count_exchanges(j) == 0
        assert j.count() == 2000
    finally:
        spark.conf.unset("spark.sql.bucketing.coalesceBucketsInJoin.maxBucketRatio")
        spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "false")


def test_rebase_refuses_multi_file_bucket(spark, monkeypatch):
    """A bucket holding MORE than one data file (a split write) cannot
    rebase by bucket id — last-wins would silently drop files (round-13
    ADVICE). The loser must raise instead of corrupting the manifest."""
    t = _tdir()
    bkt.write_bucketed(_facts(spark, 2000), t, ["k"], 8)
    # forge a second file entry for bucket 0 in the base manifest
    m = snap.read_manifest(t, 1)
    b0 = next(r for r in m["files"] if bkt._bucket_id_of(r) == 0)
    import shutil

    dup_rel = b0.replace(".c000", ".c001")
    shutil.copyfile(os.path.join(t, b0), os.path.join(t, dup_rel))
    m2 = {**m, "version": 2, "parent": 1, "files": [*m["files"], dup_rel]}
    snap._publish(t, 2, m2)
    import pyspark.sql.functions as _F

    bucket_of = {
        r.k: r._b
        for r in spark.createDataFrame([(k,) for k in range(20)], "k long")
        .select("k", _F.pmod(_F.hash("k"), _F.lit(8)).alias("_b")).collect()
    }
    k1 = next(k for k in range(20) if bucket_of[k] == 3)
    k2 = next(k for k in range(20) if bucket_of[k] == 5)
    with pytest.raises(snap.ConcurrentCommitError, match="multiple data files"):
        _race_bucketed(
            spark, monkeypatch, t,
            theirs=spark.createDataFrame([(k2, 555)], "k long, v long"),
            fn=lambda: bkt.merge_bucketed(
                spark, t, spark.createDataFrame([(k1, 111)], "k long, v long")
            ),
        )


def test_bloom_point_reads_prune_bucketed_files(spark):
    """bloom_for on a bucketed fact table (round-13 verdict 'What's
    missing' #4): point reads prune to ~1 file via the snapshot layer's
    bloom machinery instead of scanning the key's whole bucket — and
    merge_bucketed maintains the filters (recomputed for rewritten
    buckets, carried for untouched ones)."""
    t = _tdir()
    bkt.write_bucketed(_facts(spark, 4000), t, ["k"], 8, bloom_for=["k"])
    m = snap.read_manifest(t, 1)
    assert m.get("bloom_conf", {}).get("cols") == ["k"]
    total = len(m["files"])
    hit = snap.read_snapshot(spark, t, point=("k", 1234))
    assert [r.k for r in hit.collect()] == [1234]
    assert len(hit.inputFiles()) < total  # pruned, not a full-bucket scan
    # absent key: (whp) zero files open, always zero rows
    miss = snap.read_snapshot(spark, t, point=("k", 999_999))
    assert miss.count() == 0 and len(miss.inputFiles()) < total
    # incremental merge keeps the index: new key findable, pruning holds
    v = bkt.merge_bucketed(
        spark, t, spark.createDataFrame([(999_999, 7)], "k long, v long")
    )
    m2 = snap.read_manifest(t, v)
    assert m2.get("bloom_conf", {}).get("cols") == ["k"]
    hit2 = snap.read_snapshot(spark, t, point=("k", 999_999))
    assert [(r.k, r.v) for r in hit2.collect()] == [(999_999, 7)]
    assert len(hit2.inputFiles()) < len(m2["files"])
    # a carried bucket's filter still prunes after the merge
    hit3 = snap.read_snapshot(spark, t, point=("k", 1234))
    assert [r.k for r in hit3.collect()] == [1234]
    assert len(hit3.inputFiles()) < len(m2["files"])


def test_bloom_carry_survives_rebase(spark, monkeypatch, no_broadcast):
    """Disjoint-racer rebase on a bloom-indexed bucketed table: the
    rebased manifest keeps bloom_conf, our rewritten bucket's fresh
    filter, and the interloper's + untouched buckets' filters from the
    head — point reads prune on all three classes afterwards."""
    t = _tdir()
    bkt.write_bucketed(_facts(spark, 2000), t, ["k"], 8, bloom_for=["k"])
    import pyspark.sql.functions as _F

    bucket_of = {
        r.k: r._b
        for r in spark.createDataFrame([(k,) for k in range(20)], "k long")
        .select("k", _F.pmod(_F.hash("k"), _F.lit(8)).alias("_b")).collect()
    }
    k_mine = next(k for k in range(20) if bucket_of[k] == 0)
    k_theirs = next(k for k in range(20) if bucket_of[k] == 5)
    v = _race_bucketed(
        spark, monkeypatch, t,
        theirs=spark.createDataFrame([(k_theirs, 555)], "k long, v long"),
        fn=lambda: bkt.merge_bucketed(
            spark, t, spark.createDataFrame([(k_mine, 111)], "k long, v long")
        ),
    )
    m = snap.read_manifest(t, v)
    assert m.get("rebased_from") and m.get("bloom_conf", {}).get("cols") == ["k"]
    total = len(m["files"])
    for key, want_v in ((k_mine, 111), (k_theirs, 555), (1999, None)):
        got = snap.read_snapshot(spark, t, point=("k", key))
        rows = got.collect()
        assert len(rows) == 1 and rows[0].k == key
        if want_v is not None:
            assert rows[0].v == want_v
        assert len(got.inputFiles()) < total


def test_spj_residual_condition(spark, no_broadcast):
    """residual=(left,right)->Column joins non-equi guards INTO the
    exchange-free SMJ condition — the semi-join-with-guard shape
    (TPC-H Q4) that cannot be a post-join filter."""
    ta, tb = _tdir(), _tdir()
    bkt.write_bucketed(_facts(spark, 2000, seed=1), ta, ["k"], 8)
    bkt.write_bucketed(
        _facts(spark, 2000, seed=2).withColumnRenamed("v", "w"), tb, ["k"], 8
    )
    j = bkt.storage_partitioned_join(
        spark, ta, tb, "k", how="left_semi",
        residual=lambda left, right: right["w"] > left["v"],
    )
    assert count_exchanges(j) == 0
    a = {(r.k, r.v) for r in spark.read.parquet(
        os.path.join(ta, bkt.bucket_spec(ta)["dir"])).collect()}
    b = {(r.k, r.w) for r in spark.read.parquet(
        os.path.join(tb, bkt.bucket_spec(tb)["dir"])).collect()}
    bw = dict(b)
    want = sorted(k for k, v in a if k in bw and bw[k] > v)
    assert sorted(r.k for r in j.collect()) == want


def test_skew_fallback_reverts_to_shuffle_join(spark, no_broadcast):
    """skew_fallback_rows: a hot bucket (exchange-free SPJ's one bad
    skew class — AQE cannot split a join that has no exchange) makes
    the join fall back to plain snapshot reads, where the planner
    shuffles and AQE skew splitting applies. Below the threshold the
    zero-exchange plan is kept. Results identical either way."""
    ta, tb = _tdir(), _tdir()
    # 4000 rows, 3000 of them on ONE key -> one bucket ~6x the others
    hot = spark.range(0, 3000).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    rest = spark.range(0, 1000).select(
        (F.col("id") + 100).alias("k"), F.col("id").alias("v")
    )
    bkt.write_bucketed(hot.unionByName(rest), ta, ["k"], 8)
    bkt.write_bucketed(
        spark.range(0, 1200).select(F.col("id").alias("k"), F.lit(1).alias("w")),
        tb, ["k"], 8,
    )
    assert bkt._max_bucket_rows(ta) >= 3000
    # None pins the as-is exchange-free plan (the pre-r15 default);
    # the r15 DEFAULT is "auto", which engages the hybrid split on
    # this hot table without any caller opt-in
    spj = bkt.storage_partitioned_join(spark, ta, tb, "k", skew_fallback_rows=None)
    assert count_exchanges(spj) == 0
    from ray_beam_runner_spark.plans.explain import formatted_plan as _fp

    assert "Union" in _fp(bkt.storage_partitioned_join(spark, ta, tb, "k"))
    fb = bkt.storage_partitioned_join(
        spark, ta, tb, "k", skew_fallback_rows=1000, skew_mode="fallback"
    )
    assert count_exchanges(fb) > 0  # shuffle join: AQE can split it
    assert sorted(map(tuple, fb.collect())) == sorted(map(tuple, spj.collect()))
    # threshold above the hot bucket: stays exchange-free
    keep = bkt.storage_partitioned_join(
        spark, ta, tb, "k", skew_fallback_rows=10_000
    )
    assert count_exchanges(keep) == 0
    # hybrid (default mode): cold buckets keep the exchange-free SMJ
    # through a subset registration, ONLY the hot bucket's files
    # shuffle, and the union matches the plain SPJ row-for-row
    from ray_beam_runner_spark.plans.explain import formatted_plan

    hy = bkt.storage_partitioned_join(spark, ta, tb, "k", skew_fallback_rows=1000)
    plan = formatted_plan(hy)
    assert "rbrs_hyb_" in plan, plan[:2000]  # cold-subset catalog scan
    assert "Union" in plan
    hy_rows = sorted(map(tuple, hy.collect()))
    assert hy_rows == sorted(map(tuple, spj.collect()))
    # hot rows really are in the result (key 7 = the hot key; the join
    # keeps k from both sides, so count on the collected tuples)
    assert sum(1 for r in hy_rows if r[0] == 7) == 3000
    # semi-join through the hybrid split is exact too
    semi_plain = bkt.storage_partitioned_join(
        spark, ta, tb, "k", how="left_semi", skew_fallback_rows=None
    )
    semi_hy = bkt.storage_partitioned_join(
        spark, ta, tb, "k", how="left_semi", skew_fallback_rows=1000
    )
    assert sorted(map(tuple, semi_hy.collect())) == sorted(
        map(tuple, semi_plain.collect())
    )


def test_layout_override_routes_t_reads(spark, no_broadcast):
    """queries.register_layout: t() transparently serves a registered
    table through its bucketed snapshot (same rows, scan-reported
    partitioning — the engine-level routing bench_tpch_scaling's routed
    leg uses); clear_layouts() restores the plain parquet read."""
    import shutil

    from ray_beam_runner_spark import queries as Q

    sf = _tdir()
    shutil.copyfile(
        "/root/testdata/sf0.001/orders.parquet", os.path.join(sf, "orders.parquet")
    )
    plain = Q.t(spark, sf, "orders")
    t = _tdir()
    bkt.write_bucketed(plain, t, ["o_orderkey"], 4)
    Q.register_layout(sf, "orders", t)
    if hasattr(spark, "_rbrs_tables"):
        spark._rbrs_tables.clear()
    try:
        routed = Q.t(spark, sf, "orders")
        # same rows, and a groupBy on the bucket key is exchange-free
        assert routed.count() == plain.count()
        agg = routed.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
        assert count_exchanges(agg) == 0
    finally:
        Q.clear_layouts()
        spark._rbrs_tables.clear()
    back = Q.t(spark, sf, "orders")
    agg2 = back.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    assert count_exchanges(agg2) == 1  # plain scan shuffles again


def test_skew_fallback_auto_threshold(spark, no_broadcast):
    """skew_fallback_rows="auto": each side flags buckets above 4x its
    own mean rows-per-bucket from the manifest — the hot table trips it
    (hybrid plan: subset scan + union), a uniform table never does."""
    from ray_beam_runner_spark.plans.explain import formatted_plan

    ta, tb = _tdir(), _tdir()
    hot = spark.range(0, 3000).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    rest = spark.range(0, 1000).select(
        (F.col("id") + 100).alias("k"), F.col("id").alias("v")
    )
    bkt.write_bucketed(hot.unionByName(rest), ta, ["k"], 8)
    bkt.write_bucketed(
        spark.range(0, 1200).select(F.col("id").alias("k"), F.lit(1).alias("w")),
        tb, ["k"], 8,
    )
    auto = bkt.storage_partitioned_join(spark, ta, tb, "k", skew_fallback_rows="auto")
    assert "Union" in formatted_plan(auto)  # the hybrid split engaged
    plain = bkt.storage_partitioned_join(spark, ta, tb, "k", skew_fallback_rows=None)
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, plain.collect()))
    # two uniform tables: auto never trips, plan stays exchange-free
    tc, td = _tdir(), _tdir()
    bkt.write_bucketed(_facts(spark, 2000, seed=1), tc, ["k"], 8)
    bkt.write_bucketed(
        _facts(spark, 2000, seed=2).withColumnRenamed("v", "w"), td, ["k"], 8
    )
    uni = bkt.storage_partitioned_join(spark, tc, td, "k", skew_fallback_rows="auto")
    assert count_exchanges(uni) == 0
    with pytest.raises(ValueError, match="auto"):
        bkt.storage_partitioned_join(spark, tc, td, "k", skew_fallback_rows="4x")
    with pytest.raises(ValueError, match="True"):
        # bool is-an-int in Python; True-as-threshold-1 must not pass
        bkt.storage_partitioned_join(spark, tc, td, "k", skew_fallback_rows=True)


def test_route_query_is_shape_aware(spark, no_broadcast):
    """queries.route_query (round-15): the router serves the bucketed
    read ONLY where the query's optimized plan earns it —
      * q_priority_counts (scan-bound orders agg on o_orderpriority)
        -> plain parquet, NO bucketed scan in the plan;
      * q_order_exists (orders x lineitem EXISTS on the order key)
        -> both orderkey layouts (partnered co-located join), fewer
        exchanges than plain;
      * q_order_count_dist (customer x orders on CUSTKEY, TPC-H Q13)
        with only the ONE-SIDED orders@o_custkey layout registered
        -> routes PLAIN: a lone bucketed side drops its exchange but
        nets a measured x100 LOSS (2.14 -> 3.72 s) to the
        hash-scattered scan, so the pairing rule refuses it;
      * the same query once customer@c_custkey is ALSO registered
        -> both custkey layouts serve (the SECONDARY orders layout is
        picked over the orderkey one), exchanges drop."""
    import shutil

    from ray_beam_runner_spark import queries as Q
    from ray_beam_runner_spark.plans.explain import count_exchanges, formatted_plan

    sf = _tdir()
    for tbl in ("orders", "lineitem", "customer"):
        shutil.copyfile(
            f"/root/testdata/sf0.001/{tbl}.parquet",
            os.path.join(sf, f"{tbl}.parquet"),
        )
    li_dir, ord_ok_dir, ord_ck_dir, cust_dir = _tdir(), _tdir(), _tdir(), _tdir()
    bkt.write_bucketed(Q.t(spark, sf, "lineitem"), li_dir, ["l_orderkey"], 4)
    bkt.write_bucketed(Q.t(spark, sf, "orders"), ord_ok_dir, ["o_orderkey"], 4)
    bkt.write_bucketed(Q.t(spark, sf, "orders"), ord_ck_dir, ["o_custkey"], 4)
    bkt.write_bucketed(Q.t(spark, sf, "customer"), cust_dir, ["c_custkey"], 4)
    all_dirs = (li_dir, ord_ok_dir, ord_ck_dir, cust_dir)
    plain_exch = {
        n: count_exchanges(Q.QUERIES[n](spark, sf))
        for n in ("q_priority_counts", "q_order_exists", "q_order_count_dist")
    }
    Q.register_layout(sf, "lineitem", li_dir)
    Q.register_layout(sf, "orders", ord_ok_dir)
    Q.register_layout(sf, "orders", ord_ck_dir)
    if hasattr(spark, "_rbrs_tables"):
        spark._rbrs_tables.clear()
    try:
        # scan-bound query: routed plan IS the plain plan (no bucketed
        # CATALOG scan — match registration names, not the "rbrs_bkt_"
        # substring, which also appears in _tdir()'s tmp paths)
        scan_q = Q.route_query(spark, sf, "q_priority_counts")
        pl = formatted_plan(scan_q)
        assert not any(bkt._reg_name(d, 1) in pl for d in all_dirs)
        # orderkey join: both fact layouts serve, exchanges drop
        okj = Q.route_query(spark, sf, "q_order_exists")
        pl = formatted_plan(okj)
        assert bkt._reg_name(li_dir, 1) in pl and bkt._reg_name(ord_ok_dir, 1) in pl
        assert count_exchanges(okj) < plain_exch["q_order_exists"]
        # custkey join with NO bucketed partner: the pairing rule
        # refuses the one-sided layout — fully plain
        ckj_lone = Q.route_query(spark, sf, "q_order_count_dist")
        pl = formatted_plan(ckj_lone)
        assert not any(bkt._reg_name(d, 1) in pl for d in all_dirs)
        # register the customer side too: now both custkey layouts
        # serve, and the SECONDARY orders layout wins over orderkey
        Q.register_layout(sf, "customer", cust_dir)
        spark._rbrs_tables.clear()
        ckj = Q.route_query(spark, sf, "q_order_count_dist")
        pl = formatted_plan(ckj)
        assert bkt._reg_name(ord_ck_dir, 1) in pl
        assert bkt._reg_name(cust_dir, 1) in pl
        assert bkt._reg_name(ord_ok_dir, 1) not in pl
        assert count_exchanges(ckj) < plain_exch["q_order_count_dist"]
        # routing never changes results
        assert sorted(map(tuple, ckj.collect())) == sorted(
            map(tuple, Q.QUERIES["q_order_count_dist"](spark, sf).collect())
        )
    finally:
        Q.clear_layouts()
        spark._rbrs_tables.clear()


def test_spj_layout_carries_bloom_point_reads(spark):
    """spj_layout (the routed/SPJ family's layout builder) records
    bloom filters on its bucket columns (round-14 verdict 'What's
    missing' #4): a point read on the ROUTED layout prunes to ~1 file
    — hash-scattered keys defeat min/max stats, so without the bloom a
    point probe scans the key's whole bucket."""
    from ray_beam_runner_spark.queries.relational import spj_layout

    d = spj_layout(spark, "/root/testdata/sf0.001", "orders", ["o_orderkey"])
    m = snap.read_manifest(d, 1)
    assert m.get("bloom_conf", {}).get("cols") == ["o_orderkey"]
    total = len(m["files"])
    assert total >= 4
    some_key = snap.read_snapshot(spark, d).select("o_orderkey").head()[0]
    hit = snap.read_snapshot(spark, d, point=("o_orderkey", some_key))
    assert hit.count() >= 1
    assert len(hit.inputFiles()) < total  # pruned, not a full-bucket scan


def test_route_query_falls_back_without_exchange_win(spark, no_broadcast):
    """route_query's physical-plan check: a grouping on an EXPRESSION
    of the bucket key matches the key heuristically (the optimized
    plan's Aggregate bracket references the column), but bucketing
    cannot serve hash(k % 7) — the routed plan keeps its exchange, so
    the router must fall back to plain rather than pay the
    hash-scattered scan for nothing."""
    import shutil

    from ray_beam_runner_spark import queries as Q
    from ray_beam_runner_spark.plans.explain import formatted_plan

    sf = _tdir()
    shutil.copyfile(
        "/root/testdata/sf0.001/orders.parquet", os.path.join(sf, "orders.parquet")
    )
    d = _tdir()
    bkt.write_bucketed(Q.t(spark, sf, "orders"), d, ["o_orderkey"], 4)
    qname = "_test_expr_group_route"
    Q.QUERIES[qname] = lambda s, sfd: (
        Q.t(s, sfd, "orders")
        .groupBy((F.col("o_orderkey") % 7).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    Q.register_layout(sf, "orders", d)
    if hasattr(spark, "_rbrs_tables"):
        spark._rbrs_tables.clear()
    try:
        df = Q.route_query(spark, sf, qname)
        assert bkt._reg_name(d, 1) not in formatted_plan(df)  # plain
        assert Q._ROUTE_MEMO[(os.path.abspath(sf), qname)] == {}
        # the direct bucket-key grouping DOES route (exchange dropped)
        qname2 = "_test_key_group_route"
        Q.QUERIES[qname2] = lambda s, sfd: (
            Q.t(s, sfd, "orders")
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        df2 = Q.route_query(spark, sf, qname2)
        assert bkt._reg_name(d, 1) in formatted_plan(df2)
        assert count_exchanges(df2) == 0
    finally:
        Q.QUERIES.pop(qname, None)
        Q.QUERIES.pop("_test_key_group_route", None)
        Q.clear_layouts()
        spark._rbrs_tables.clear()


def test_merge_wiping_a_bucket_keeps_row_accounting(spark, no_broadcast):
    """r14 ADVICE #2 end-to-end: a merge whose deletes wipe a bucket's
    every row must not blank the table's row accounting — one
    zero-row (or absent) bucket file previously made _bucket_rows
    return None for the WHOLE table, silently disabling the default
    skew protection. After the wipe, accounting still covers every
    manifest file and the auto-skew path still sees per-bucket rows."""
    t = _tdir()
    # keys 0..199; bucket count 4 — find all keys of ONE bucket and
    # delete every one of them
    bkt.write_bucketed(_facts(spark, 200), t, ["k"], 4)
    by_bucket = {
        r._b: r.ks
        for r in spark.range(0, 200)
        .select(F.col("id").alias("k"))
        .groupBy(F.pmod(F.hash("k"), F.lit(4)).alias("_b"))
        .agg(F.collect_list("k").alias("ks"))
        .collect()
    }
    victim_keys = by_bucket[0]
    dels = spark.createDataFrame([(int(k),) for k in victim_keys], "k long")
    v = bkt.merge_bucketed(spark, t, dels.limit(0).select("k", F.lit(0).alias("v")), delete_keys_df=dels)
    m = snap.read_manifest(t, v)
    rows = m.get("file_rows") or {}
    assert set(rows) == set(m["files"])  # every file accounted, incl. empty
    by_b = bkt._bucket_rows(t, v)
    assert by_b is not None  # accounting NOT blanked
    assert bkt.read_bucketed(spark, t).count() == 200 - len(victim_keys)
    # the default (auto) SPJ path still works over the wiped-bucket table
    other = _tdir()
    bkt.write_bucketed(_facts(spark, 200, seed=3).withColumnRenamed("v", "w"), other, ["k"], 4)
    j = bkt.storage_partitioned_join(spark, t, other, "k")
    assert j.count() == 200 - len(victim_keys)


def test_sort_within_layout_rowgroup_pruning(spark):
    """Iceberg sort-order pattern (round 15): a bucketed layout SORTED
    WITHIN buckets by a non-key column keeps its exchange-free
    bucketing but turns row-group min/max stats on the sort column
    into tight ranges — rowgroup_survival (the router's footer probe)
    must see real pruning on the sorted layout and NONE on the
    key-sorted one, and the sorted layout's bucket-key aggregate must
    still plan zero exchanges."""
    n = 40_000
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        # hash-scattered vs the key: sorting by ts is a REAL reorder,
        # and the key-sorted control's row groups all span ~[0, n)
        F.pmod(F.xxhash64("id"), F.lit(n)).alias("ts"),
        F.xxhash64("id").alias("pad"),
    )
    d_sorted, d_key = _tdir(), _tdir()
    bkt.write_bucketed(
        df, d_sorted, ["k"], 2, sort_by=["ts"], parquet_block_size=64 * 1024
    )
    bkt.write_bucketed(df, d_key, ["k"], 2, parquet_block_size=64 * 1024)
    cutoff = str(int(n * 0.9))
    surv_sorted = bkt.rowgroup_survival(d_sorted, "ts", [(">", cutoff)])
    surv_key = bkt.rowgroup_survival(d_key, "ts", [(">", cutoff)])
    assert surv_sorted is not None and surv_sorted <= 0.3
    assert surv_key == 1.0  # key-scatter: every row group spans ts
    # unknown column / unparseable literal -> None, never "prunes all"
    assert bkt.rowgroup_survival(d_sorted, "nope", [(">", "1")]) is None
    assert bkt.rowgroup_survival(d_sorted, "ts", [(">", "not-a-number")]) is None
    # the sorted layout still reports its bucketing: key agg, 0 exchanges
    agg = bkt.read_bucketed(spark, d_sorted).groupBy("k").count()
    assert count_exchanges(agg) == 0
    # and the filtered read returns exactly the plain answer
    expect = df.filter(F.col("ts") > int(cutoff)).count()
    got = (
        bkt.read_bucketed(spark, d_sorted)
        .filter(F.col("ts") > int(cutoff))
        .count()
    )
    assert got == expect


def test_router_prefers_sorted_layout_when_filter_prunes(spark, no_broadcast):
    """Sort-order-aware routing (round 15): with TWO lineitem layouts
    registered on the same bucket key — key-sorted and
    shipdate-sorted — the router serves the shipdate-sorted one to a
    query whose plan carries a selective l_shipdate range predicate
    (footer probe <= 0.6 survival), and the key-sorted one to the same
    join without the filter (sort elision wins when nothing prunes).
    Both routes must still drop exchanges vs plain and match the plain
    results."""
    import shutil

    from ray_beam_runner_spark import queries as Q
    from ray_beam_runner_spark.plans.explain import formatted_plan

    sf = _tdir()
    for tbl in ("lineitem", "orders"):
        shutil.copyfile(
            f"/root/testdata/sf0.01/{tbl}.parquet",
            os.path.join(sf, f"{tbl}.parquet"),
        )
    li_key, li_date, ord_dir = _tdir(), _tdir(), _tdir()
    bkt.write_bucketed(
        Q.t(spark, sf, "lineitem"), li_key, ["l_orderkey"], 4,
        parquet_block_size=64 * 1024,
    )
    bkt.write_bucketed(
        Q.t(spark, sf, "lineitem"), li_date, ["l_orderkey"], 4,
        sort_by=["l_shipdate"], parquet_block_size=64 * 1024,
    )
    bkt.write_bucketed(Q.t(spark, sf, "orders"), ord_dir, ["o_orderkey"], 4)
    # a cutoff late enough that most row groups die on the sorted layout
    mx = Q.t(spark, sf, "lineitem").agg(F.max("l_shipdate")).head()[0]
    cutoff = (mx - __import__("datetime").timedelta(days=30)).strftime(
        "%Y-%m-%d %H:%M:%S"
    )
    surv = bkt.rowgroup_survival(
        li_date, "l_shipdate", [(">", cutoff)]
    )
    assert surv is not None and surv <= 0.6  # test precondition

    def _filtered(s, sfd):
        li = Q.t(s, sfd, "lineitem").filter(
            F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
        )
        o = Q.t(s, sfd, "orders")
        return (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def _unfiltered(s, sfd):
        li = Q.t(s, sfd, "lineitem")
        o = Q.t(s, sfd, "orders")
        return (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    qf, qu = "_test_sorted_route_f", "_test_sorted_route_u"
    Q.QUERIES[qf], Q.QUERIES[qu] = _filtered, _unfiltered
    # plain baseline BEFORE registration (a registered layout serves
    # legacy un-routed reads too)
    plain_f = Q.QUERIES[qf](spark, sf)
    plain_exch = count_exchanges(plain_f)
    plain_rows = sorted(map(tuple, plain_f.collect()))
    Q.register_layout(sf, "lineitem", li_key)
    Q.register_layout(sf, "lineitem", li_date)
    Q.register_layout(sf, "orders", ord_dir)
    if hasattr(spark, "_rbrs_tables"):
        spark._rbrs_tables.clear()
    try:
        routed_f = Q.route_query(spark, sf, qf)
        pl = formatted_plan(routed_f)
        assert bkt._reg_name(li_date, 1) in pl
        assert bkt._reg_name(li_key, 1) not in pl
        assert count_exchanges(routed_f) < plain_exch
        routed_u = Q.route_query(spark, sf, qu)
        pl = formatted_plan(routed_u)
        assert bkt._reg_name(li_key, 1) in pl
        assert bkt._reg_name(li_date, 1) not in pl
        # routing never changes results
        assert sorted(map(tuple, routed_f.collect())) == plain_rows
    finally:
        Q.QUERIES.pop(qf, None)
        Q.QUERIES.pop(qu, None)
        Q.clear_layouts()
        spark._rbrs_tables.clear()


def test_merge_preserves_sort_order_and_block_size(spark, no_broadcast):
    """merge_bucketed on a SORT-ORDER layout: rewritten buckets must
    come back sorted by the layout's recorded sort column at the
    recorded row-group granularity (bucket_spec.block_size) — without
    it, a few merges would quietly degrade the layout's pruning
    resolution — and the footer probe must still see pruning on the
    post-merge table."""
    n = 40_000
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64("id"), F.lit(n)).alias("ts"),
    )
    d = _tdir()
    bkt.write_bucketed(df, d, ["k"], 2, sort_by=["ts"], parquet_block_size=64 * 1024)
    assert bkt.bucket_spec(d)["block_size"] == 64 * 1024
    # touch BOTH buckets so every file is a rewrite, not a carry
    upd = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") + 1).alias("ts")
    )
    v = bkt.merge_bucketed(spark, d, upd)
    assert bkt.bucket_spec(d, version=v)["block_size"] == 64 * 1024
    cutoff = str(int(n * 0.9))
    surv = bkt.rowgroup_survival(d, "ts", [(">", cutoff)], version=v)
    assert surv is not None and surv <= 0.3  # granularity survived the merge
    # and the merge applied: updated keys carry their new ts
    got = (
        bkt.read_bucketed(spark, d, version=v)
        .filter(F.col("k") < 200)
        .agg(F.max("ts"))
        .head()[0]
    )
    assert got == 200


def test_route_explain_reports_decisions(spark, no_broadcast):
    """route_explain: the JSON trace must carry the decision each table
    actually got — the sort-order pick with its survival number, the
    key-sorted default, and the no-registration outcome."""
    import shutil

    from ray_beam_runner_spark import queries as Q

    sf = _tdir()
    for tbl in ("lineitem", "orders"):
        shutil.copyfile(
            f"/root/testdata/sf0.01/{tbl}.parquet",
            os.path.join(sf, f"{tbl}.parquet"),
        )
    assert Q.route_explain(spark, sf, "q_recent_ship_priority") == {
        "outcome": "no layouts registered", "selection": {},
    }
    li_key, li_date, ord_dir = _tdir(), _tdir(), _tdir()
    bkt.write_bucketed(
        Q.t(spark, sf, "lineitem"), li_key, ["l_orderkey"], 4,
        parquet_block_size=64 * 1024,
    )
    bkt.write_bucketed(
        Q.t(spark, sf, "lineitem"), li_date, ["l_orderkey"], 4,
        sort_by=["l_shipdate"], parquet_block_size=8 * 1024,
    )
    bkt.write_bucketed(Q.t(spark, sf, "orders"), ord_dir, ["o_orderkey"], 4)
    Q.register_layout(sf, "lineitem", li_key)
    Q.register_layout(sf, "lineitem", li_date)
    Q.register_layout(sf, "orders", ord_dir)
    if hasattr(spark, "_rbrs_tables"):
        spark._rbrs_tables.clear()
    try:
        ex = Q.route_explain(spark, sf, "q_recent_ship_priority")
        assert ex["outcome"] == "routed"
        assert ex["selection"]["lineitem"] == os.path.basename(li_date)
        assert ex["selection"]["orders"] == os.path.basename(ord_dir)
        li_tr = ex["tables"]["lineitem"]
        assert li_tr["decision"].startswith("sort-order layout (l_shipdate")
        surv = li_tr["survival"][os.path.basename(li_date)]
        assert surv is not None and surv <= 0.6
        assert "l_shipdate" in ex["predicates"]
        assert ex["exchanges"]["routed"] < ex["exchanges"]["plain"]
        assert ex["tables"]["orders"]["decision"].startswith("key-sorted")
        # JSON-friendly end to end
        import json as _json

        _json.dumps(ex)
    finally:
        Q.clear_layouts()
        spark._rbrs_tables.clear()


def test_router_scan_only_sort_order_route(spark, no_broadcast):
    """SCAN-ONLY routing (round 15, second block): a query with no
    join/grouping on any bucket key still routes to a layout sorted by
    a column its plan range-filters, purely on footer-probe survival
    evidence (measured x1000: 5.5x over plain parquet, whose unsorted
    row groups cannot prune). A query with no pushable range predicate
    on the sort column must stay plain."""
    import shutil

    from ray_beam_runner_spark import queries as Q
    from ray_beam_runner_spark.plans.explain import formatted_plan

    sf = _tdir()
    shutil.copyfile(
        "/root/testdata/sf0.01/orders.parquet", os.path.join(sf, "orders.parquet")
    )
    d = _tdir()
    bkt.write_bucketed(
        Q.t(spark, sf, "orders"), d, ["o_orderkey"], 4,
        sort_by=["o_orderdate"], parquet_block_size=8 * 1024,
    )
    # q_priority_counts: orders scan, o_orderdate in [1996, 1999),
    # grouped by priority — no bucket-key usage anywhere
    plain = Q.QUERIES["q_priority_counts"](spark, sf)
    plain_exch = count_exchanges(plain)
    plain_rows = sorted(map(tuple, plain.collect()))
    Q.register_layout(sf, "orders", d)
    if hasattr(spark, "_rbrs_tables"):
        spark._rbrs_tables.clear()
    try:
        df = Q.route_query(spark, sf, "q_priority_counts")
        assert bkt._reg_name(d, 1) in formatted_plan(df)
        assert count_exchanges(df) <= plain_exch
        assert sorted(map(tuple, df.collect())) == plain_rows
        ex = Q.route_explain(spark, sf, "q_priority_counts")
        assert ex["outcome"].startswith("routed")
        assert ex["tables"]["orders"]["decision"].startswith(
            "scan-only sort-order route (o_orderdate"
        )
        # no range predicate on o_orderdate -> stays plain
        df2 = Q.route_query(spark, sf, "q_percentiles")
        assert bkt._reg_name(d, 1) not in formatted_plan(df2)
    finally:
        Q.clear_layouts()
        spark._rbrs_tables.clear()


def test_advise_layouts_reproduces_family_layout_set(spark):
    """The workload-driven layout advisor (queries.advise_layouts) must
    recommend, from the 23-query TPC-H family's plans alone, exactly
    the layout set three rounds of measurement converged on: the
    orderkey co-location pair first (most-voted), the custkey pair,
    and sort-within layouts on l_shipdate and o_orderdate ATTACHED to
    each table's best-voted bucket key (so they pair). Advice is
    plan-only — no data is written."""
    from ray_beam_runner_spark import queries as Q
    from scripts.bench_tpch_scaling import TPCH_SET

    recs = Q.advise_layouts(spark, "/root/testdata/sf0.001", list(TPCH_SET), top=8)

    def build_of(r):
        return [
            (b["table"], tuple(b["bucket_by"]), tuple(b.get("sort_within") or ()))
            for b in r["build"]
        ]

    assert build_of(recs[0]) == [
        ("lineitem", ("l_orderkey",), ()), ("orders", ("o_orderkey",), ()),
    ]
    assert recs[0]["kind"] == "co-located bucket pair"
    assert len(recs[0]["queries"]) >= 8  # most of the family joins on it
    assert build_of(recs[1]) == [
        ("customer", ("c_custkey",), ()), ("orders", ("o_custkey",), ()),
    ]
    sorts = {
        tuple(b for r2 in [r] for b in build_of(r2))
        for r in recs if r["kind"].startswith("sort-within")
    }
    assert (("lineitem", ("l_orderkey",), ("l_shipdate",)),) in sorts
    assert (("orders", ("o_orderkey",), ("o_orderdate",)),) in sorts
    # votes are named evidence, monotonically ordered
    votes = [r["votes"] for r in recs]
    assert votes == sorted(votes, reverse=True)
    for r in recs:
        assert r["queries"]  # every layout justified by named queries
        assert set(r["queries"]) <= set(TPCH_SET)


def test_scan_range_predicates_conjuncts_and_in(spark):
    """r15 ADVICE: comparisons inside an OR disjunction must NOT be
    collected as pushable conjuncts (row-group stats can't act on
    them); IN-lists / INSETs come back as point-set predicates."""
    from ray_beam_runner_spark.plans.explain import scan_range_predicates

    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") % 7).alias("b")
    )
    d1 = df.filter((F.col("a") > 10) & ((F.col("b") < 3) | (F.col("a") < 50)))
    p1 = scan_range_predicates(d1)
    # the top-level conjunct survives; the OR branches are dropped whole
    assert p1.get("id") == [(">", "10")]
    d2 = df.filter(F.col("a").isin(1, 2, 3) & (F.col("b") >= 2))
    assert ("in", "1,2,3") in scan_range_predicates(d2).get("id", [])
    # a truncated INSET (plan prints '... N more fields') is rejected
    d3 = df.filter(F.col("a").isin(*range(40)))
    assert not any(
        op == "in" and "..." in lit
        for ps in scan_range_predicates(d3).values()
        for op, lit in ps
    )


def test_rowgroup_survival_multi_column_and_in(spark):
    """rowgroup_survival_cols: the predicate conjunction across TWO
    sorted columns is evaluated per row group (correlation measured,
    not assumed); 'in' point sets keep a group only when a point
    intersects its [min,max]."""
    n = 40_000
    df = spark.range(0, n).select(
        F.col("id").alias("k"), F.col("id").alias("a"), F.col("id").alias("b")
    )
    d = _tdir()
    bkt.write_bucketed(
        df, d, ["k"], 2, sort_by=["a", "b"], parquet_block_size=64 * 1024
    )
    lo, hi = str(int(n * 0.90)), str(int(n * 0.95))
    s_a = bkt.rowgroup_survival(d, "a", [(">", lo)])
    s_ab = bkt.rowgroup_survival_cols(d, {"a": [(">", lo)], "b": [("<", hi)]})
    assert s_a is not None and s_a <= 0.3
    assert s_ab is not None and s_ab <= s_a  # conjunction can only shrink
    # point-set predicate: one in-range point -> a sliver; all points
    # out of range -> zero
    s_in = bkt.rowgroup_survival(d, "a", [("in", "5")])
    assert s_in is not None and s_in <= 0.2
    assert bkt.rowgroup_survival(d, "a", [("in", str(n * 10))]) == 0.0
    assert bkt.rowgroup_survival(d, "a", [("in", "not-a-number")]) is None


def test_router_two_predicate_layout_direction(spark, no_broadcast):
    """r15 verdict ask #4: with one layout sorted by `a` and another by
    `b`, a query filtering BOTH columns must route to the layout whose
    predicate actually prunes — in both directions."""
    from ray_beam_runner_spark import queries as Q
    from ray_beam_runner_spark.plans.explain import formatted_plan

    n = 40_000
    sf = _tdir()
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        F.col("id").alias("a"),
        F.pmod(F.xxhash64("id"), F.lit(n)).alias("b"),
    )
    df.write.parquet(os.path.join(sf, "orders.parquet"))
    d_a, d_b = _tdir(), _tdir()
    src = lambda: Q.t(spark, sf, "orders")  # noqa: E731
    bkt.write_bucketed(src(), d_a, ["k"], 2, sort_by=["a"],
                       parquet_block_size=64 * 1024)
    bkt.write_bucketed(src(), d_b, ["k"], 2, sort_by=["b"],
                       parquet_block_size=64 * 1024)
    cut = int(n * 0.95)

    def _qa(s, sfd):
        o = Q.t(s, sfd, "orders")
        return (
            o.filter((F.col("a") > cut) & (F.col("b") >= 0))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def _qb(s, sfd):
        o = Q.t(s, sfd, "orders")
        return (
            o.filter((F.col("b") > cut) & (F.col("a") >= 0))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    Q.QUERIES["_test_dir_a"], Q.QUERIES["_test_dir_b"] = _qa, _qb
    Q.register_layout(sf, "orders", d_a)
    Q.register_layout(sf, "orders", d_b)
    if hasattr(spark, "_rbrs_tables"):
        spark._rbrs_tables.clear()
    try:
        pa = formatted_plan(Q.route_query(spark, sf, "_test_dir_a"))
        assert bkt._reg_name(d_a, 1) in pa and bkt._reg_name(d_b, 1) not in pa
        pb = formatted_plan(Q.route_query(spark, sf, "_test_dir_b"))
        assert bkt._reg_name(d_b, 1) in pb and bkt._reg_name(d_a, 1) not in pb
    finally:
        Q.QUERIES.pop("_test_dir_a", None)
        Q.QUERIES.pop("_test_dir_b", None)
        Q.clear_layouts()
        spark._rbrs_tables.clear()


def test_shuffle_hash_hint_is_per_route(spark, no_broadcast):
    """r15 ADVICE (medium): the SHUFFLE_HASH hint must attach ONLY to
    the key-route sort-order pick (survival-gated filtered build side),
    never leak through the table cache into other routes' joins. A
    scan-only-routed join on a NON-bucket key must stay SortMergeJoin;
    the key-routed filtered join keeps its ShuffledHashJoin win."""
    import shutil

    from ray_beam_runner_spark import queries as Q
    from ray_beam_runner_spark.plans.explain import physical_plan

    sf = _tdir()
    for tbl in ("lineitem", "orders", "part"):
        shutil.copyfile(
            f"/root/testdata/sf0.01/{tbl}.parquet",
            os.path.join(sf, f"{tbl}.parquet"),
        )
    li_date, ord_dir = _tdir(), _tdir()
    bkt.write_bucketed(
        Q.t(spark, sf, "lineitem"), li_date, ["l_orderkey"], 4,
        sort_by=["l_shipdate"], parquet_block_size=8 * 1024,
    )
    bkt.write_bucketed(Q.t(spark, sf, "orders"), ord_dir, ["o_orderkey"], 4)

    def _key_join(s, sfd):  # joins on the bucket key + shipdate filter
        li = Q.t(s, sfd, "lineitem").filter(
            F.col("l_shipdate")
            > F.lit("1998-06-01 00:00:00").cast("timestamp")
        )
        o = Q.t(s, sfd, "orders")
        return (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
        )

    def _part_join(s, sfd):  # same filtered scan, NON-bucket-key join
        li = Q.t(s, sfd, "lineitem").filter(
            F.col("l_shipdate")
            > F.lit("1998-06-01 00:00:00").cast("timestamp")
        )
        p = Q.t(s, sfd, "part")
        return (
            li.join(p, F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand").agg(F.count(F.lit(1)).alias("n"))
        )

    Q.QUERIES["_test_hint_key"], Q.QUERIES["_test_hint_part"] = (
        _key_join, _part_join,
    )
    Q.register_layout(sf, "lineitem", li_date)
    Q.register_layout(sf, "orders", ord_dir)
    if hasattr(spark, "_rbrs_tables"):
        spark._rbrs_tables.clear()
    try:
        keyed = Q.route_query(spark, sf, "_test_hint_key")
        assert "ShuffledHashJoin" in physical_plan(keyed)
        parted = Q.route_query(spark, sf, "_test_hint_part")
        pp = physical_plan(parted)
        # served through the sorted layout (scan-only route) but with
        # NO leaked hint: the non-key join stays SMJ
        assert bkt._reg_name(li_date, 1) in pp
        assert "ShuffledHashJoin" not in pp
        assert "SortMergeJoin" in pp
    finally:
        Q.QUERIES.pop("_test_hint_key", None)
        Q.QUERIES.pop("_test_hint_part", None)
        Q.clear_layouts()
        spark._rbrs_tables.clear()


def test_build_advised_budget_dedupe_and_placeholder(spark, no_broadcast):
    """build_advised: vote-order walk, distinct-layout budget, one
    build per (table, key, sort) signature, placeholder sort-within
    recommendations skipped — and the advised registrations actually
    route (exchange drop on the voting query)."""
    import shutil

    from ray_beam_runner_spark import queries as Q

    sf = _tdir()
    for tbl in ("lineitem", "orders"):
        shutil.copyfile(
            f"/root/testdata/sf0.01/{tbl}.parquet",
            os.path.join(sf, f"{tbl}.parquet"),
        )
    recs = [
        {"kind": "co-located bucket pair", "votes": 5, "build": [
            {"table": "lineitem", "bucket_by": ["l_orderkey"]},
            {"table": "orders", "bucket_by": ["o_orderkey"]},
        ]},
        # duplicate signature: must not build twice
        {"kind": "bucket layout (grouping key)", "votes": 3, "build": [
            {"table": "orders", "bucket_by": ["o_orderkey"]},
        ]},
        # unbuildable placeholder: skipped, budget slot freed
        {"kind": "sort-within layout (range predicates)", "votes": 2,
         "build": [{"table": "orders", "bucket_by": ["<any stable key>"],
                    "sort_within": ["o_orderdate"]}]},
        # over budget with budget_layouts=2
        {"kind": "bucket layout (grouping key)", "votes": 1, "build": [
            {"table": "orders", "bucket_by": ["o_custkey"]},
        ]},
    ]
    built = Q.build_advised(
        spark, sf, recs, budget_layouts=2, n_buckets=4
    )
    try:
        assert len(built) == 2
        names = [os.path.basename(d) for d in built]
        assert names == ["lineitem__l_orderkey", "orders__o_orderkey"]
        assert {tb for (_sd, tb) in Q.LAYOUTS} == {"lineitem", "orders"}

        def _q(s, sfd):
            li, o = Q.t(s, sfd, "lineitem"), Q.t(s, sfd, "orders")
            return (
                li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias("n"))
            )

        Q.QUERIES["_test_advised"] = _q
        Q.clear_layouts()
        plain_exch = count_exchanges(_q(spark, sf))
        for d in built:
            tb = os.path.basename(d).split("__", 1)[0]
            Q.register_layout(sf, tb, d)
        if hasattr(spark, "_rbrs_tables"):
            spark._rbrs_tables.clear()
        routed = Q.route_query(spark, sf, "_test_advised")
        assert count_exchanges(routed) < plain_exch
    finally:
        Q.QUERIES.pop("_test_advised", None)
        Q.clear_layouts()
        if hasattr(spark, "_rbrs_tables"):
            spark._rbrs_tables.clear()
