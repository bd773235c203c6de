"""Snapshot-manifest table tests: atomic visibility, MERGE file pruning,
time travel, concurrent-commit detection, vacuum."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from ray_beam_runner_spark.sources import snapshots as snap


def _tdir():
    return tempfile.mkdtemp(prefix="rbrs_snap_")


def _rows(df):
    return sorted((r[0], r[1]) for r in df.select("k", "v").collect())


def test_snapshot_roundtrip_and_time_travel(spark):
    t = _tdir()
    v1 = snap.write_snapshot(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), t)
    v2 = snap.write_snapshot(spark.createDataFrame([(3, "c")], "k int, v string"), t)
    assert (v1, v2) == (1, 2)
    assert _rows(snap.read_snapshot(spark, t)) == [(3, "c")]
    # time travel: v1 still fully readable after the overwrite
    assert _rows(snap.read_snapshot(spark, t, version=1)) == [(1, "a"), (2, "b")]


def test_upsert_replaces_appends_and_prunes_files(spark):
    t = _tdir()
    # two data files via two commits so file pruning has something to skip
    snap.write_snapshot(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), t)
    v2 = snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(3, "c"), (4, "d")], "k int, v string"), ["k"]
    )
    m2 = snap.read_manifest(t, v2)
    assert m2["rewrote"] == []  # no key overlap -> pure append, zero files re-read
    base_files = set(snap.read_manifest(t, 1)["files"])
    assert base_files < set(m2["files"])  # original files carried verbatim
    # now update key 3 only: the v1 files contain keys {1,2} and must NOT be rewritten
    v3 = snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(3, "C2"), (5, "e")], "k int, v string"), ["k"]
    )
    m3 = snap.read_manifest(t, v3)
    assert base_files < set(m3["files"])
    assert not any(f in m3["rewrote"] for f in base_files)
    # only commit-2 files actually CONTAINING key 3 are rewritten —
    # sibling part files of the same commit that hold other keys survive
    assert m3["rewrote"] and set(m3["rewrote"]) <= set(m2["files"]) - base_files
    assert _rows(snap.read_snapshot(spark, t)) == [
        (1, "a"), (2, "b"), (3, "C2"), (4, "d"), (5, "e"),
    ]
    # previous snapshot untouched by the merge (reader isolation)
    assert _rows(snap.read_snapshot(spark, t, version=v2)) == [
        (1, "a"), (2, "b"), (3, "c"), (4, "d"),
    ]


def test_upsert_into_missing_table_creates_it(spark):
    t = _tdir()
    v = snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(1, "a")], "k int, v string"), ["k"]
    )
    assert v == 1
    assert _rows(snap.read_snapshot(spark, t)) == [(1, "a")]


def test_concurrent_commit_conflict_raises(spark):
    t = _tdir()
    snap.write_snapshot(spark.createDataFrame([(1, "a")], "k int, v string"), t)
    # simulate a racing writer that already published v2
    snap._publish(t, 2, {"version": 2, "parent": 1, "files": [], "op": "overwrite"})
    with pytest.raises(snap.ConcurrentCommitError):
        snap._publish(t, 2, {"version": 2, "parent": 1, "files": [], "op": "overwrite"})


def test_vacuum_deletes_only_unreferenced_files(spark):
    t = _tdir()
    snap.write_snapshot(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), t)
    snap.upsert_snapshot(spark, t, spark.createDataFrame([(1, "A")], "k int, v string"), ["k"])
    v1_files = set(snap.read_manifest(t, 1)["files"])
    live = set(snap.read_manifest(t, snap.latest_version(t))["files"])
    deleted = snap.vacuum(t, keep_last=1)
    assert set(deleted) == v1_files - live
    assert snap.latest_version(t) == 2
    assert _rows(snap.read_snapshot(spark, t)) == [(1, "A"), (2, "b")]
    for rel in live:
        assert os.path.exists(os.path.join(t, rel))


def test_manifest_stats_pruning_on_clustered_table(spark):
    t = _tdir()
    big = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    snap.write_snapshot(big, t, cluster_by=["k"], n_files=8)
    m1 = snap.read_manifest(t, 1)
    assert len(m1["files"]) > 1 and set(m1.get("file_stats", {})) == set(m1["files"])
    # ranges are disjoint after repartitionByRange
    ranges = sorted(m1["file_stats"][f]["k"] for f in m1["files"])
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    # update keys live in ONE file's range -> stats must prune the rest
    lo, hi = ranges[0]
    upd = spark.createDataFrame([(lo, "LO"), (hi, "HI")], "k long, v string")
    v2 = snap.upsert_snapshot(spark, t, upd, ["k"])
    m2 = snap.read_manifest(t, v2)
    assert m2["pruned_by_stats"] == len(m1["files"]) - 1
    assert len(m2["rewrote"]) == 1
    # stats carried + recorded for rewritten files: next merge still prunes
    assert set(m2["file_stats"]) == set(m2["files"])
    # merged contents correct
    got = dict(snap.read_snapshot(spark, t).collect())
    assert got[lo] == "LO" and got[hi] == "HI" and got[lo + 1] == f"v{lo + 1}"
    assert len(got) == 1000


def test_txn_idempotency_replayed_batch_is_noop(spark):
    t = _tdir()
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    v1 = snap.upsert_snapshot(spark, t, b0, ["k"], txn_app="app", txn_version=0)
    # replay of batch 0 (crash-retry): no new version, no content change
    v_replay = snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(1, "WRONG")], "k int, v string"),
        ["k"], txn_app="app", txn_version=0,
    )
    assert (v1, v_replay) == (1, 1)
    assert _rows(snap.read_snapshot(spark, t)) == [(1, "a"), (2, "b")]
    # next batch applies; txn watermark advances and carries forward
    v2 = snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(1, "A")], "k int, v string"),
        ["k"], txn_app="app", txn_version=1,
    )
    assert v2 == 2
    assert snap.read_manifest(t, v2)["txns"] == {"app": 1}
    assert _rows(snap.read_snapshot(spark, t)) == [(1, "A"), (2, "b")]
    # a different app id is independent
    v3 = snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(3, "c")], "k int, v string"),
        ["k"], txn_app="other", txn_version=0,
    )
    assert snap.read_manifest(t, v3)["txns"] == {"app": 1, "other": 0}


def test_stream_upsert_merges_and_survives_restart(spark, tmp_path):
    from ray_beam_runner_spark.streaming import FileDropStream

    t = _tdir()
    cdc = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (1, "a2", 30), (3, "c", 40)],
        "k int, v string, ts long",
    )
    drop = FileDropStream(spark, str(tmp_path / "cdc")).write_slices(cdc, "ts", 4)
    ckpt = str(tmp_path / "ckpt")
    q = snap.stream_upsert(drop.read_stream(), t, ["k"], ckpt)
    q.awaitTermination()
    got = {r[0]: r[1] for r in snap.read_snapshot(spark, t).select("k", "v").collect()}
    assert got == {1: "a2", 2: "b", 3: "c"}
    n_versions = snap.latest_version(t)
    # restart over the SAME checkpoint with no new data: no-op
    q2 = snap.stream_upsert(drop.read_stream(), t, ["k"], ckpt)
    q2.awaitTermination()
    assert snap.latest_version(t) == n_versions
    # late-arriving CDC records resume from the committed offset
    more = spark.createDataFrame([(2, "b2", 50)], "k int, v string, ts long")
    drop.append_slices(more, "ts", 1)
    q3 = snap.stream_upsert(drop.read_stream(), t, ["k"], ckpt)
    q3.awaitTermination()
    got = {r[0]: r[1] for r in snap.read_snapshot(spark, t).select("k", "v").collect()}
    assert got == {1: "a2", 2: "b2", 3: "c"}


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_batch = st.dictionaries(st.integers(0, 9), st.integers(-100, 100), min_size=1, max_size=5)


@given(st.lists(_batch, min_size=1, max_size=4))
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_merge_sequence_equals_dict_semantics(spark, batches):
    """Any sequence of keyed upsert batches leaves the table exactly equal
    to sequentially dict.update()-ing the same batches (MERGE algebra)."""
    t = _tdir()
    model = {}
    for batch in batches:
        df = spark.createDataFrame(sorted(batch.items()), "k int, v int")
        snap.upsert_snapshot(spark, t, df, ["k"])
        model.update(batch)
    got = {r[0]: r[1] for r in snap.read_snapshot(spark, t).collect()}
    assert got == model


def test_compact_preserves_content_and_restores_clustering(spark):
    t = _tdir()
    big = spark.range(0, 400).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    snap.write_snapshot(big, t, cluster_by=["k"], n_files=4)
    # a burst of tiny CDC upserts fragments the table
    for i in range(5):
        snap.upsert_snapshot(
            spark, t,
            spark.createDataFrame([(1000 + i, -i)], "k long, v long"),
            ["k"], txn_app="cdc", txn_version=i,
        )
    before = snap.read_manifest(t, snap.latest_version(t))
    v = snap.compact(spark, t, n_files=4)
    m = snap.read_manifest(t, v)
    assert m["op"] == "compact" and len(m["files"]) == 4 < len(before["files"])
    # content identical, clustering + stats restored, txn watermarks kept
    assert set(m["file_stats"]) == set(m["files"])
    ranges = sorted(m["file_stats"][f]["k"] for f in m["files"])
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    assert m["txns"] == {"cdc": 4}
    exp = {i: 2 * i for i in range(400)} | {1000 + i: -i for i in range(5)}
    got = {r[0]: r[1] for r in snap.read_snapshot(spark, t).collect()}
    assert got == exp
    # replaying an old CDC batch after compaction is still a no-op
    snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(1000, 999)], "k long, v long"),
        ["k"], txn_app="cdc", txn_version=2,
    )
    assert snap.latest_version(t) == v


def test_read_key_range_prunes_files_and_pushes_filter(spark):
    from ray_beam_runner_spark.plans.explain import assert_pushed_filters

    t = _tdir()
    big = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    snap.write_snapshot(big, t, cluster_by=["k"], n_files=8)
    full = snap.read_snapshot(spark, t)
    narrow = snap.read_snapshot(spark, t, key_range=("k", 10, 20))
    assert len(narrow.inputFiles()) == 1 < len(full.inputFiles())
    assert_pushed_filters(narrow, "k")  # row-group skipping on top of file pruning
    assert sorted(r[0] for r in narrow.collect()) == list(range(10, 21))
    # range outside all stats: empty result, schema intact, no error
    none = snap.read_snapshot(spark, t, key_range=("k", 5000, 6000))
    assert none.count() == 0 and none.schema == full.schema


def test_upsert_retries_after_losing_commit_race(spark, monkeypatch):
    t = _tdir()
    snap.write_snapshot(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), t)
    racer_files, _, _ = snap._write_data_files(
        spark.createDataFrame([(9, "racer")], "k int, v string"), t
    )
    orig = snap._publish
    state = {"raced": False}

    def flaky(table_dir, version, manifest):
        if not state["raced"]:
            state["raced"] = True
            base = snap.read_manifest(table_dir, version - 1)
            orig(table_dir, version, {
                "version": version, "parent": version - 1,
                "files": [*base["files"], *racer_files], "op": "merge",
            })
            return orig(table_dir, version, manifest)  # loses -> raises
        return orig(table_dir, version, manifest)

    monkeypatch.setattr(snap, "_publish", flaky)
    v = snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(1, "A")], "k int, v string"), ["k"]
    )
    # retry rebased on the racer's snapshot: both effects present
    assert v == 3
    assert _rows(snap.read_snapshot(spark, t)) == [(1, "A"), (2, "b"), (9, "racer")]
    # with retries disabled the lost race surfaces
    state["raced"] = False
    with pytest.raises(snap.ConcurrentCommitError):
        snap.upsert_snapshot(
            spark, t, spark.createDataFrame([(2, "B")], "k int, v string"),
            ["k"], retries=0,
        )


def test_snapshot_rows_and_diff_cdf(spark):
    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(i, f"v{i}") for i in range(50)], "k int, v string"),
        t, cluster_by=["k"], n_files=4,
    )
    assert snap.snapshot_rows(t) == 50
    v2 = snap.upsert_snapshot(
        spark, t,
        spark.createDataFrame([(3, "UPD"), (100, "NEW")], "k int, v string"),
        ["k"],
    )
    assert snap.snapshot_rows(t) == 51
    assert snap.snapshot_rows(t, version=1) == 50
    diff = snap.snapshot_diff(spark, t, 1, v2)
    changes = {(r.k, r.v, r._change) for r in diff.collect()}
    # update = delete+insert pair; pure insert has no delete; rows that
    # merely moved files during the rewrite cancel out
    assert changes == {
        (3, "v3", "delete"), (3, "UPD", "insert"), (100, "NEW", "insert"),
    }
    # diff reads only the changed files, not the table
    m1, m2 = snap.read_manifest(t, 1), snap.read_manifest(t, v2)
    changed = (set(m1["files"]) ^ set(m2["files"]))
    assert set(diff.inputFiles()) <= {
        "file://" + __import__("os").path.join(t, rel) for rel in changed
    } | {__import__("os").path.join(t, rel) for rel in changed}


def test_upsert_schema_evolution(spark):
    t = _tdir()
    snap.write_snapshot(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), t)
    # updates carry a NEW column: kept rows null-backfill it
    snap.upsert_snapshot(
        spark, t,
        spark.createDataFrame([(2, "B", 7.5), (3, "c", 1.0)], "k int, v string, score double"),
        ["k"], evolve_schema=True,
    )
    got = {
        r.k: (r.v, r.score)
        for r in snap.read_snapshot(spark, t, merge_schema=True).collect()
    }
    assert got == {1: ("a", None), 2: ("B", 7.5), 3: ("c", 1.0)}
    # without evolve_schema a mismatched batch fails loudly, not silently
    with pytest.raises(Exception):
        snap.upsert_snapshot(
            spark, t,
            spark.createDataFrame([(4, "d", 1.0, True)], "k int, v string, score double, flag boolean"),
            ["k"],
        )


def test_zorder_prunes_on_both_dimensions(spark):
    t = _tdir()
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") / F.lit(64)).cast("long").alias("b"),
        F.col("id").alias("v"),
    )
    snap.write_snapshot(df, t, zorder_by=["a", "b"], n_files=16)
    m = snap.read_manifest(t, 1)
    assert len(m["files"]) == 16
    # every z column has per-file stats
    for f in m["files"]:
        assert set(m["file_stats"][f]) == {"a", "b"}
    full = snap.read_snapshot(spark, t)
    # narrow predicates on EITHER dimension skip most files; a
    # lexicographic (a, b) layout could never prune on b alone
    for col in ("a", "b"):
        narrow = snap.read_snapshot(spark, t, key_range=(col, 10, 13))
        n = len(narrow.inputFiles())
        assert n <= len(m["files"]) // 2, (col, n)
        assert narrow.count() == 4 * 64
    assert full.count() == 4096


def test_cdf_applies_cleanly_across_versions(spark):
    """diff(v1, v3) must be a valid patch: v1 minus its deletes plus its
    inserts reproduces v3 exactly (multiset semantics), even across TWO
    merges that rewrote overlapping files."""
    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(i, f"v{i}") for i in range(30)], "k int, v string"),
        t, cluster_by=["k"], n_files=3,
    )
    snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(5, "A"), (40, "x")], "k int, v string"), ["k"]
    )
    v3 = snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(5, "B"), (12, "C")], "k int, v string"), ["k"]
    )
    diff = snap.snapshot_diff(spark, t, 1, v3)
    v1_df = snap.read_snapshot(spark, t, version=1)
    dels = diff.filter(F.col("_change") == "delete").drop("_change")
    ins = diff.filter(F.col("_change") == "insert").drop("_change")
    patched = v1_df.exceptAll(dels).unionAll(ins)
    v3_df = snap.read_snapshot(spark, t, version=v3)
    assert patched.exceptAll(v3_df).count() == 0
    assert v3_df.exceptAll(patched).count() == 0
    assert patched.count() == v3_df.count() == 31


def test_concurrent_writers_all_commit_with_retries(spark):
    """Four threads race 12 real merges into one table; optimistic
    retries must serialize them losslessly — every batch's rows present,
    version count == commits, no ConcurrentCommitError escapes."""
    import threading

    t = _tdir()
    snap.write_snapshot(spark.createDataFrame([(-1, "seed")], "k int, v string"), t)
    errors = []

    def writer(wid):
        try:
            for j in range(3):
                base = 1000 * wid + 10 * j
                df = spark.createDataFrame(
                    [(base + i, f"w{wid}b{j}") for i in range(3)], "k int, v string"
                )
                snap.upsert_snapshot(spark, t, df, ["k"], retries=20)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errors == []
    assert snap.latest_version(t) == 13  # seed + 12 serialized merges
    rows = snap.read_snapshot(spark, t).collect()
    assert len(rows) == 1 + 4 * 3 * 3
    got = {r.k for r in rows}
    exp = {-1} | {1000 * w + 10 * j + i for w in range(4) for j in range(3) for i in range(3)}
    assert got == exp


def test_merge_on_uri_encodable_table_path(spark):
    """Table paths with URI-encodable characters (space -> %20 in
    Spark's file:// URIs) must still detect touched files — a suffix
    match on the raw URI silently duplicated matched keys."""
    import os as _os

    t = _os.path.join(_tdir(), "my corpus v1")
    snap.write_snapshot(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), t)
    v2 = snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(1, "A")], "k int, v string"), ["k"]
    )
    assert snap.read_manifest(t, v2)["rewrote"] != []
    assert _rows(snap.read_snapshot(spark, t)) == [(1, "A"), (2, "b")]


def test_txn_app_without_version_rejected(spark):
    t = _tdir()
    snap.write_snapshot(spark.createDataFrame([(1, "a")], "k int, v string"), t)
    with pytest.raises(ValueError, match="txn_app and txn_version"):
        snap.upsert_snapshot(
            spark, t, spark.createDataFrame([(2, "b")], "k int, v string"),
            ["k"], txn_app="app",
        )


def test_schema_guard_uses_manifest_schema_after_evolution(spark):
    t = _tdir()
    snap.write_snapshot(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), t)
    snap.upsert_snapshot(
        spark, t,
        spark.createDataFrame([(3, "c", 1.0)], "k int, v string, score double"),
        ["k"], evolve_schema=True,
    )
    # a correctly-shaped post-evolution batch passes WITHOUT the flag,
    # regardless of which generation's file sits first in the manifest
    snap.upsert_snapshot(
        spark, t,
        spark.createDataFrame([(4, "d", 2.0)], "k int, v string, score double"),
        ["k"],
    )
    # a stale pre-evolution batch is rejected
    with pytest.raises(ValueError, match="pass evolve_schema=True"):
        snap.upsert_snapshot(
            spark, t, spark.createDataFrame([(5, "e")], "k int, v string"), ["k"]
        )
    got = {r.k: (r.v, r.score) for r in
           snap.read_snapshot(spark, t, merge_schema=True).collect()}
    assert got == {1: ("a", None), 2: ("b", None), 3: ("c", 1.0), 4: ("d", 2.0)}


def test_cdf_across_schema_evolution(spark):
    t = _tdir()
    snap.write_snapshot(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), t)
    v2 = snap.upsert_snapshot(
        spark, t,
        spark.createDataFrame([(2, "B", 9.0), (3, "c", 1.0)], "k int, v string, score double"),
        ["k"], evolve_schema=True,
    )
    changes = {(r.k, r.v, r.score, r._change)
               for r in snap.snapshot_diff(spark, t, 1, v2).collect()}
    assert changes == {
        (2, "b", None, "delete"),
        (2, "B", 9.0, "insert"),
        (3, "c", 1.0, "insert"),
    }


def test_vacuum_reclaims_orphans_and_guards_keep_last(spark):
    t = _tdir()
    snap.write_snapshot(spark.createDataFrame([(1, "a")], "k int, v string"), t)
    # a crashed/raced writer: full data files, no manifest references them
    orphans, _, _ = snap._write_data_files(
        spark.createDataFrame([(9, "lost")], "k int, v string"), t
    )
    with pytest.raises(ValueError, match="keep_last"):
        snap.vacuum(t, keep_last=0)
    # default TTL protects a fresh in-flight commit
    assert snap.vacuum(t, keep_last=1) == []
    # ttl=0 reclaims it (plus the orphaned commit's sidecar markers)
    deleted = snap.vacuum(t, keep_last=1, orphan_ttl_seconds=0)
    assert set(orphans) <= set(deleted)
    # nothing from a LIVE commit dir was touched
    live = set(snap.read_manifest(t, 1)["files"])
    live_dirs = {f.rsplit("/", 1)[0] for f in live}
    assert all(d.rsplit("/", 1)[0] not in live_dirs for d in deleted)
    assert _rows(snap.read_snapshot(spark, t)) == [(1, "a")]


def test_decode_audio_unsigned8_and_24bit():
    import io
    import struct
    import wave

    import numpy as np

    from ray_beam_runner_spark.functions.multimodal import decode_audio

    # 8-bit silence is 0x80: RMS must be ~0, not 128
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(1); w.setframerate(8000)
        w.writeframes(bytes([0x80]) * 800)
    f8 = decode_audio(buf.getvalue())
    assert f8["sample_rate"] == 8000 and f8["n_frames"] == 800
    assert abs(f8["rms"]) < 1.0
    # 24-bit PCM: constant amplitude decodes exactly
    amp = -(1 << 20)
    frames = b"".join(struct.pack("<i", amp)[:3] for _ in range(100))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(3); w.setframerate(8000)
        w.writeframes(frames)
    f24 = decode_audio(buf.getvalue())
    assert f24["n_frames"] == 100
    assert abs(f24["rms"] - abs(amp)) < 1e-6
    # unsupported widths fail loudly, not with a bare KeyError
    with pytest.raises(Exception):
        decode_audio(b"not a wav")


def test_compact_after_schema_evolution_preserves_evolved_column(spark):
    # r6 ADVICE (medium): compact() on a mixed-generation table must not
    # let footer sampling drop the evolved column
    t = _tdir()
    snap.write_snapshot(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), t)
    snap.upsert_snapshot(
        spark, t,
        spark.createDataFrame([(2, "B", 7.5), (3, "c", 1.0)], "k int, v string, score double"),
        ["k"], evolve_schema=True,
    )
    v = snap.compact(spark, t, n_files=1)
    m = snap.read_manifest(t, v)
    assert len(m["files"]) == 1
    df = snap.read_snapshot(spark, t)
    assert set(df.columns) == {"k", "v", "score"}
    got = {r.k: (r.v, r.score) for r in df.collect()}
    assert got == {1: ("a", None), 2: ("B", 7.5), 3: ("c", 1.0)}
    # the compacted FILE physically carries the evolved column (plain
    # read, no schema hints) — generations normalized, not just masked
    plain = spark.read.parquet(os.path.join(t, m["files"][0]))
    assert "score" in plain.columns


def test_empty_snapshot_is_readable_with_schema(spark):
    # r6 ADVICE (low): write_snapshot of an empty DataFrame must produce
    # a readable (empty) table, not FileNotFoundError
    t = _tdir()
    empty = spark.createDataFrame([], "k int, v string")
    snap.write_snapshot(empty, t)
    df = snap.read_snapshot(spark, t)
    assert df.columns == ["k", "v"] and df.count() == 0
    # and an upsert into the empty table works
    snap.upsert_snapshot(spark, t, spark.createDataFrame([(1, "a")], "k int, v string"), ["k"])
    assert _rows(snap.read_snapshot(spark, t)) == [(1, "a")]


def test_post_evolution_merge_reads_are_deterministic(spark):
    # r6 ADVICE (low): Phase 2/3 readers must pin to the manifest schema
    # so a non-evolving merge on a mixed-generation table never depends
    # on which file's footer Spark samples. Touch BOTH generations.
    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(i, "old%d" % i) for i in range(10)], "k int, v string"), t
    )
    snap.upsert_snapshot(
        spark, t,
        spark.createDataFrame([(10, "new", 1.0)], "k int, v string, score double"),
        ["k"], evolve_schema=True,
    )
    # plain merge (no evolve flag) with keys hitting old-generation files
    snap.upsert_snapshot(
        spark, t,
        spark.createDataFrame([(3, "upd", 3.0), (10, "upd2", 2.0)],
                              "k int, v string, score double"),
        ["k"],
    )
    got = {r.k: (r.v, r.score) for r in snap.read_snapshot(spark, t).collect()}
    assert got[3] == ("upd", 3.0) and got[10] == ("upd2", 2.0)
    assert got[0] == ("old0", None) and len(got) == 11


def test_change_feed_commit_types_and_restart_exactly_once(spark, tmp_path):
    # r6 verdict ask #4: streaming change-feed source over the snapshot
    # log. Covers every commit type, then restart-from-checkpoint.
    t = _tdir()
    ckpt = str(tmp_path / "ckpt")
    snap.write_snapshot(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), t)
    snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string"),
        ["k"], cdc=True,
    )
    snap.compact(spark, t, n_files=1)

    got: list[tuple] = []

    def drain():
        feed = snap.read_snapshot_stream(spark, t)
        q = (
            feed.writeStream.foreachBatch(
                lambda df, _bid: got.extend(map(tuple, df.collect()))
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    drain()
    first = sorted(got)
    assert first == sorted([
        (1, "a", "insert", 1), (2, "b", "insert", 1),      # create: all insert
        (2, "b", "delete", 2), (2, "B", "insert", 2),      # cdc merge sidecar
        (3, "c", "insert", 2),
    ])  # compact (v3) emits nothing: content-identical
    # restart with NO new commits: nothing re-emitted (offset committed)
    got.clear()
    drain()
    assert got == []
    # new commits after restart: ONLY their deltas arrive (v4 merge
    # without sidecars exercises the file-diff fallback path)
    snap.upsert_snapshot(spark, t, spark.createDataFrame([(1, "A2")], "k int, v string"), ["k"])
    got.clear()
    drain()
    assert sorted(got) == [(1, "A2", "insert", 4), (1, "a", "delete", 4)]


def test_change_feed_sidecars_survive_vacuum_and_get_reclaimed(spark):
    t = _tdir()
    snap.write_snapshot(spark.createDataFrame([(1, "a")], "k int, v string"), t)
    v2 = snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(1, "A")], "k int, v string"), ["k"], cdc=True
    )
    cdc_rel = snap.read_manifest(t, v2)["cdc_files"]
    assert cdc_rel
    # v2 retained: its sidecars are live, vacuum must not touch them
    deleted = snap.vacuum(t, keep_last=1, orphan_ttl_seconds=0)
    assert not set(cdc_rel) & set(deleted)
    # push v2 out of retention: sidecars are reclaimed with its files
    snap.write_snapshot(spark.createDataFrame([(9, "z")], "k int, v string"), t)
    deleted = snap.vacuum(t, keep_last=1, orphan_ttl_seconds=0)
    assert set(cdc_rel) <= set(deleted)


def test_change_feed_replicates_table_via_stream_upsert(spark, tmp_path):
    # close the CDC loop: source table commits -> change feed ->
    # stream_upsert applies them to a replica -> replica converges to
    # the source after every drain (the cross-table replication pattern
    # the feed exists for). Upsert-only source, so applying the feed's
    # inserts keyed-MERGE-style is exact; per-batch dedupe keeps the
    # LAST version of a key when one drain spans several commits.
    src, dst = _tdir(), _tdir()
    ckpt = str(tmp_path / "repl_ckpt")
    snap.write_snapshot(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), src)
    snap.upsert_snapshot(
        spark, src, spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string"),
        ["k"], cdc=True,
    )

    def replicate():
        feed = snap.read_snapshot_stream(spark, src)
        q = snap.stream_upsert(
            feed.filter(F.col("_change") == "insert").drop("_change"),
            dst, ["k"], checkpoint_dir=ckpt,
            app_id="replica", dedupe_last_by=["_commit_version"],
        )
        assert q.awaitTermination(120)

    def table(d):
        return {
            (r.k, r.v)
            for r in snap.read_snapshot(spark, d).select("k", "v").collect()
        }

    replicate()
    assert table(dst) == table(src) == {(1, "a"), (2, "B"), (3, "c")}
    # more source commits; a second incremental drain converges again
    snap.upsert_snapshot(
        spark, src, spark.createDataFrame([(1, "A2"), (4, "d")], "k int, v string"),
        ["k"], cdc=True,
    )
    replicate()
    assert table(dst) == table(src) == {(1, "A2"), (2, "B"), (3, "c"), (4, "d")}


def test_change_feed_array_columns_and_vacuumed_parent(spark, tmp_path):
    # review fixes: (a) array-typed columns must flow through the feed
    # (embeddings tables are a core domain); (b) a retained version
    # whose parent manifest was vacuumed replays as the stream's
    # initial snapshot instead of crashing
    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame(
            [(1, [0.1, 0.2]), (2, [0.3, 0.4])], "k int, emb array<double>"
        ),
        t,
    )
    snap.upsert_snapshot(
        spark, t,
        spark.createDataFrame([(2, [9.0, 9.0])], "k int, emb array<double>"),
        ["k"], cdc=True,
    )
    # a sidecar-less merge too (diff mode hashes rows -> tuples)
    snap.upsert_snapshot(
        spark, t,
        spark.createDataFrame([(3, [5.0, 5.0])], "k int, emb array<double>"),
        ["k"],
    )

    def drain(ckpt):
        got = []
        feed = snap.read_snapshot_stream(spark, t)
        q = (
            feed.writeStream.foreachBatch(
                lambda df, _b: got.extend(
                    (r.k, tuple(r.emb), r._change, r._commit_version)
                    for r in df.collect()
                )
            )
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return sorted(got)

    assert drain("a") == sorted([
        (1, (0.1, 0.2), "insert", 1), (2, (0.3, 0.4), "insert", 1),
        (2, (0.3, 0.4), "delete", 2), (2, (9.0, 9.0), "insert", 2),
        (3, (5.0, 5.0), "insert", 3),
    ])
    # vacuum away v1/v2 manifests; a FRESH stream sees v3 (parent gone)
    # as its initial snapshot: pure inserts of the retained content
    snap.vacuum(t, keep_last=1, orphan_ttl_seconds=0)
    got = drain("b")
    assert [g[2] for g in got] == ["insert"] * 3
    assert {(g[0], g[1]) for g in got} == {
        (1, (0.1, 0.2)), (2, (9.0, 9.0)), (3, (5.0, 5.0))
    }


def test_change_feed_rate_limit_bounds_batch_and_resumes(spark, tmp_path):
    # maxVersionsPerTrigger: a stream starting against a 3-commit
    # backlog consumes at most N commits per start (the Python DS
    # engine runs availableNow as one batch), resuming from the
    # checkpoint each time — bounded catch-up, no re-emission
    t = _tdir()
    ckpt = str(tmp_path / "rl_ckpt")
    snap.write_snapshot(spark.createDataFrame([(1, "a")], "k int, v string"), t)
    for i, (k, v) in enumerate([(2, "b"), (3, "c")]):
        snap.upsert_snapshot(
            spark, t, spark.createDataFrame([(k, v)], "k int, v string"),
            ["k"], cdc=True,
        )

    def drain():
        got = []
        feed = snap.read_snapshot_stream(spark, t, max_versions_per_trigger=1)
        q = (
            feed.writeStream.foreachBatch(
                lambda df, _b: got.extend(map(tuple, df.collect()))
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return sorted(got)

    assert drain() == [(1, "a", "insert", 1)]           # v1 only
    assert drain() == [(2, "b", "insert", 2)]           # then v2
    assert drain() == [(3, "c", "insert", 3)]           # then v3
    assert drain() == []                                # caught up


def test_stream_maintain_aggregate_tracks_source(spark, tmp_path):
    # incremental materialized view: feed deltas fold into a per-key
    # (cnt, sum) table that stays equal to aggregating the source,
    # without rescanning it
    src, agg = _tdir(), _tdir()
    ckpt = str(tmp_path / "ivm_ckpt")
    snap.write_snapshot(
        spark.createDataFrame(
            [(1, "g1", 10.0), (2, "g1", 20.0), (3, "g2", 5.0)],
            "k int, grp string, v double",
        ),
        src,
    )
    # update k=2 (g1 sum changes), insert k=4 into g2
    snap.upsert_snapshot(
        spark, src,
        spark.createDataFrame([(2, "g1", 25.0), (4, "g2", 7.0)],
                              "k int, grp string, v double"),
        ["k"], cdc=True,
    )

    def refresh():
        feed = snap.read_snapshot_stream(spark, src)
        q = snap.stream_maintain_aggregate(
            feed, agg, ["grp"], ["v"], checkpoint_dir=ckpt, app_id="ivm-test"
        )
        assert q.awaitTermination(180)

    def agg_table():
        return {
            r.grp: (r.cnt, round(r.sum_v, 6))
            for r in snap.read_snapshot(spark, agg).collect()
            if r.cnt > 0
        }

    def direct():
        from pyspark.sql import functions as SF

        return {
            r.grp: (r.cnt, round(r.s, 6))
            for r in snap.read_snapshot(spark, src)
            .groupBy("grp")
            .agg(SF.count(SF.lit(1)).alias("cnt"), SF.sum("v").alias("s"))
            .collect()
        }

    refresh()
    assert agg_table() == direct() == {"g1": (2, 35.0), "g2": (2, 12.0)}
    # no new commits: drain is a no-op (offsets + txn ids)
    v_before = snap.latest_version(agg)
    refresh()
    assert snap.latest_version(agg) == v_before
    # more source commits, including a group emptied by an update that
    # MOVES a key to another group (delete g2-side, insert g1-side)
    snap.upsert_snapshot(
        spark, src,
        spark.createDataFrame([(3, "g1", 5.0)], "k int, grp string, v double"),
        ["k"], cdc=True,
    )
    refresh()
    assert agg_table() == direct() == {"g1": (3, 40.0), "g2": (1, 7.0)}


def test_stream_maintain_aggregate_integer_sum_column(spark, tmp_path):
    # review fix: an INTEGER sum column must not fork the table schema
    # (bigint at creation vs double on refresh broke every later read)
    src, agg = _tdir(), _tdir()
    ckpt = str(tmp_path / "ivm_int_ckpt")
    snap.write_snapshot(
        spark.createDataFrame([(1, "g", 10), (2, "g", 20)], "k int, grp string, qty int"),
        src,
    )

    def refresh():
        q = snap.stream_maintain_aggregate(
            snap.read_snapshot_stream(spark, src), agg, ["grp"], ["qty"],
            checkpoint_dir=ckpt, app_id="ivm-int",
        )
        assert q.awaitTermination(180)

    refresh()
    snap.upsert_snapshot(
        spark, src, spark.createDataFrame([(3, "g", 5)], "k int, grp string, qty int"),
        ["k"], cdc=True,
    )
    refresh()  # second refresh reads + rewrites the table: types must agree
    rows = {r.grp: (r.cnt, r.sum_qty) for r in snap.read_snapshot(spark, agg).collect()}
    assert rows == {"g": (3, 35.0)}


def test_stream_maintain_aggregate_minmax_rescan(spark, tmp_path):
    # min/max IVM: self-maintained while inserts dominate; a batch that
    # deletes a key's current extremum triggers the affected-key rescan
    # (time-traveled, stats-pruned, semi-joined) and repairs the row
    from pyspark.sql import functions as SF

    src, agg = _tdir(), _tdir()
    ckpt = str(tmp_path / "ivm_mm_ckpt")
    snap.write_snapshot(
        spark.createDataFrame(
            [(1, "g1", 10.0), (2, "g1", 20.0), (3, "g1", 15.0),
             (5, "g2", 5.0), (6, "g3", 9.0)],
            "k int, grp string, v double",
        ),
        src, cluster_by=["k"],
    )

    def refresh():
        q = snap.stream_maintain_aggregate(
            snap.read_snapshot_stream(spark, src), agg, ["grp"], ["v"],
            checkpoint_dir=ckpt, app_id="ivm-mm",
            min_cols=["v"], max_cols=["v"], source_dir=src,
        )
        assert q.awaitTermination(180)

    def view():
        return {
            r.grp: (r.cnt, r.sum_v, r.min_v, r.max_v)
            for r in snap.read_snapshot(spark, agg).collect()
            if r.cnt > 0
        }

    def direct():
        return {
            r.grp: (r.cnt, r.s, r.lo, r.hi)
            for r in snap.read_snapshot(spark, src)
            .groupBy("grp")
            .agg(
                SF.count(SF.lit(1)).alias("cnt"), SF.sum("v").alias("s"),
                SF.min("v").alias("lo"), SF.max("v").alias("hi"),
            )
            .collect()
        }

    refresh()
    assert view() == direct() == {
        "g1": (3, 45.0, 10.0, 20.0), "g2": (1, 5.0, 5.0, 5.0), "g3": (1, 9.0, 9.0, 9.0)
    }
    # one commit retracts g1's MAX (k=2 moves to g2) and g2's MIN
    # (k=5's value rises 5->25): both sides must rescan-repair
    snap.upsert_snapshot(
        spark, src,
        spark.createDataFrame([(2, "g2", 20.0), (5, "g2", 25.0)],
                              "k int, grp string, v double"),
        ["k"], cdc=True,
    )
    refresh()
    assert view() == direct() == {
        "g1": (2, 25.0, 10.0, 15.0), "g2": (2, 45.0, 20.0, 25.0), "g3": (1, 9.0, 9.0, 9.0)
    }
    # empty g3 entirely (k=6 moves to g1): cnt=0 row keeps NULL extrema
    snap.upsert_snapshot(
        spark, src,
        spark.createDataFrame([(6, "g1", 30.0)], "k int, grp string, v double"),
        ["k"], cdc=True,
    )
    refresh()
    assert view() == direct() == {
        "g1": (3, 55.0, 10.0, 30.0), "g2": (2, 45.0, 20.0, 25.0)
    }
    raw = {r.grp: r for r in snap.read_snapshot(spark, agg).collect()}
    assert raw["g3"].cnt == 0 and raw["g3"].min_v is None and raw["g3"].max_v is None
    # no new commits: drain is a no-op (offsets + txn ids), rescan or not
    v_before = snap.latest_version(agg)
    refresh()
    assert snap.latest_version(agg) == v_before


def test_stream_maintain_aggregate_minmax_needs_source(spark, tmp_path):
    src = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(1, "g", 1.0)], "k int, grp string, v double"), src
    )
    with pytest.raises(ValueError, match="source_dir"):
        snap.stream_maintain_aggregate(
            snap.read_snapshot_stream(spark, src), _tdir(), ["grp"], ["v"],
            checkpoint_dir=str(tmp_path / "c"), max_cols=["v"],
        )


def test_change_feed_max_bytes_bounds_batches(spark, tmp_path):
    # maxBytesPerTrigger (soft max): with a budget below one version's
    # delta-file size, each start consumes exactly one version — the
    # crossing version completes, then the batch stops
    t = _tdir()
    ckpt = str(tmp_path / "mb_ckpt")
    snap.write_snapshot(spark.createDataFrame([(1, "a")], "k int, v string"), t)
    for k, v in [(2, "b"), (3, "c")]:
        snap.upsert_snapshot(
            spark, t, spark.createDataFrame([(k, v)], "k int, v string"),
            ["k"], cdc=True,
        )

    def drain():
        got = []
        feed = snap.read_snapshot_stream(spark, t, max_bytes_per_trigger=1)
        q = (
            feed.writeStream.foreachBatch(
                lambda df, _b: got.extend(map(tuple, df.collect()))
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return sorted(got)

    assert drain() == [(1, "a", "insert", 1)]
    assert drain() == [(2, "b", "insert", 2)]
    assert drain() == [(3, "c", "insert", 3)]
    assert drain() == []
    # a budget bigger than the whole backlog drains in one start
    t2, ckpt2 = _tdir(), str(tmp_path / "mb2_ckpt")
    snap.write_snapshot(spark.createDataFrame([(1, "a")], "k int, v string"), t2)
    snap.upsert_snapshot(
        spark, t2, spark.createDataFrame([(2, "b")], "k int, v string"),
        ["k"], cdc=True,
    )
    got = []
    q = (
        snap.read_snapshot_stream(spark, t2, max_bytes_per_trigger=1 << 30)
        .writeStream.foreachBatch(lambda df, _b: got.extend(map(tuple, df.collect())))
        .option("checkpointLocation", ckpt2)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert sorted(got) == [(1, "a", "insert", 1), (2, "b", "insert", 2)]


def test_change_feed_column_pruning(spark, tmp_path):
    # columns= projects the feed: schema narrows, per-trigger reads
    # decode only the projected column chunks, and files that predate a
    # projected column null-backfill with the row count preserved
    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0)],
                              "k int, v string, w double"),
        t,
    )
    # schema evolution: new column arrives after the first file
    snap.upsert_snapshot(
        spark, t,
        spark.createDataFrame([(3, "c", 30.0, "x")], "k int, v string, w double, extra string"),
        ["k"], cdc=True, evolve_schema=True,
    )
    feed = snap.read_snapshot_stream(spark, t, columns=["k", "extra"])
    assert [f.name for f in feed.schema.fields] == ["k", "extra", "_change", "_commit_version"]
    got = []
    q = (
        feed.writeStream.foreachBatch(lambda df, _b: got.extend(map(tuple, df.collect())))
        .option("checkpointLocation", str(tmp_path / "cp_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    # v1's file has no 'extra': rows survive with nulls; v2 carries it
    assert sorted(got) == [
        (1, None, "insert", 1), (2, None, "insert", 1), (3, "x", "insert", 2)
    ]
    # unknown column is a loud error
    with pytest.raises(Exception, match="columns not in table schema"):
        snap.read_snapshot_stream(spark, t, columns=["nope"]).schema


def test_cdc_read_pdf_prunes_columns(tmp_path):
    # the reader-side primitive decodes ONLY the requested columns
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = tmp_path / "f.parquet"
    pq.write_table(
        pa.table({"a": [1, 2], "b": ["x", "y"], "c": [1.0, 2.0]}), str(p)
    )
    pdf = snap._cdc_read_pdf(str(tmp_path), ["f.parquet"], ["a", "c"])
    assert list(pdf.columns) == ["a", "c"]  # 'b' never materialized
    # no requested column present: row count still preserved, all null
    pdf2 = snap._cdc_read_pdf(str(tmp_path), ["f.parquet"], ["z"])
    assert len(pdf2) == 2 and pdf2["z"].isna().all()


def test_delete_where_prunes_and_keeps_null_predicate_rows(spark):
    from pyspark.sql import functions as SF

    t = _tdir()
    rows = [(i, float(i), "g" if i % 2 else None) for i in range(100)]
    snap.write_snapshot(
        spark.createDataFrame(rows, "k int, v double, tag string"),
        t, cluster_by=["k"], n_files=8,
    )
    v1 = snap.read_manifest(t, 1)
    # delete k in [10, 19] with a range hint: files outside [10, 19] carry
    v2 = snap.delete_where(
        spark, t, (SF.col("k") >= 10) & (SF.col("k") <= 19),
        key_range=("k", 10, 19),
    )
    m2 = snap.read_manifest(t, v2)
    assert m2["op"] == "delete" and m2["pruned_by_stats"] > 0
    assert len(m2["rewrote"]) < len(v1["files"])  # file-pruned rewrite
    got = sorted(r.k for r in snap.read_snapshot(spark, t).collect())
    assert got == [i for i in range(100) if not (10 <= i <= 19)]
    # NULL predicate rows are KEPT (SQL three-valued logic): tag = 'g'
    # is NULL for even k — those rows must survive a tag-based delete
    v3 = snap.delete_where(spark, t, SF.col("tag") != "g")
    assert v3 == v2  # tag is only ever 'g' or NULL: nothing is TRUE
    v4 = snap.delete_where(spark, t, SF.col("tag").isNull())
    kept = {r.k for r in snap.read_snapshot(spark, t).collect()}
    assert kept == {i for i in range(100) if i % 2 and not (10 <= i <= 19)}
    assert v4 > v2
    # time travel still sees the pre-delete content
    assert len(snap.read_snapshot(spark, t, version=1).collect()) == 100


def test_delete_where_txn_idempotent_and_cdc_feed(spark, tmp_path):
    from pyspark.sql import functions as SF

    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string"), t
    )
    v2 = snap.delete_where(
        spark, t, SF.col("k") == 2, txn_app="del-app", txn_version=7, cdc=True
    )
    # replayed txn is a no-op
    assert snap.delete_where(
        spark, t, SF.col("k") == 2, txn_app="del-app", txn_version=7, cdc=True
    ) == v2
    # the change feed reads the delete from the pre-written sidecar
    got = []
    q = (
        snap.read_snapshot_stream(spark, t, starting_version=v2)
        .writeStream.foreachBatch(lambda df, _b: got.extend(map(tuple, df.collect())))
        .option("checkpointLocation", str(tmp_path / "del_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert got == [(2, "b", "delete", v2)]
    assert {r.k for r in snap.read_snapshot(spark, t).collect()} == {1, 3}


def test_restore_snapshot_rolls_back_and_feeds_delta(spark, tmp_path):
    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), t
    )
    snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string"),
        ["k"], cdc=True, txn_app="writer", txn_version=5,
    )
    v3 = snap.restore_snapshot(t, 1)
    assert v3 == 3
    m3 = snap.read_manifest(t, v3)
    assert m3["op"] == "restore" and m3["restored_from"] == 1
    # restored content == v1, history intact, txn watermark carried
    assert {(r.k, r.v) for r in snap.read_snapshot(spark, t).collect()} == {(1, "a"), (2, "b")}
    assert {(r.k, r.v) for r in snap.read_snapshot(spark, t, version=2).collect()} == {
        (1, "a"), (2, "B"), (3, "c")
    }
    assert m3["txns"] == {"writer": 5}
    # a replayed pre-restore batch stays a no-op (watermark not regressed)
    assert snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(9, "x")], "k int, v string"),
        ["k"], txn_app="writer", txn_version=4,
    ) == v3
    # the feed emits the net rollback delta via the file-diff branch
    got = []
    q = (
        snap.read_snapshot_stream(spark, t, starting_version=v3)
        .writeStream.foreachBatch(lambda df, _b: got.extend(map(tuple, df.collect())))
        .option("checkpointLocation", str(tmp_path / "rst_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert sorted(got) == [
        (2, "B", "delete", v3), (2, "b", "insert", v3), (3, "c", "delete", v3)
    ]
    # restore to the current version is a no-op
    assert snap.restore_snapshot(t, v3) == v3


def test_restore_after_vacuum_is_loud(spark):
    t = _tdir()
    snap.write_snapshot(spark.createDataFrame([(1, "a")], "k int, v string"), t)
    snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(1, "A")], "k int, v string"), ["k"]
    )
    snap.vacuum(t, keep_last=1, orphan_ttl_seconds=0)
    with pytest.raises(FileNotFoundError):
        snap.restore_snapshot(t, 1)


def test_bloom_point_lookup_prunes_files_no_false_negatives(spark):
    # bloom index: point lookups on a NON-clustered high-cardinality
    # column prune files (min/max stats would prune nothing — every
    # file spans the whole tag space), and a bloom can never produce a
    # false negative: all 60 values must come back exactly
    t = _tdir()
    rows = [(i, f"tag-{i * 7 % 60}") for i in range(240)]
    snap.write_snapshot(
        spark.createDataFrame(rows, "k int, tag string"),
        t, cluster_by=["k"], n_files=8, bloom_for=["tag"],
    )
    m = snap.read_manifest(t, 1)
    assert m["bloom_conf"]["cols"] == ["tag"]
    assert len(m["file_blooms"]) == len(m["files"])
    total = len(m["files"])
    pruned_any = False
    for val in range(60):
        df = snap.read_snapshot(spark, t, point=("tag", f"tag-{val}"))
        got = sorted(r.k for r in df.collect())
        assert got == sorted(i for i in range(240) if i * 7 % 60 == val)
        pruned_any = pruned_any or len(df.inputFiles()) < total
    assert pruned_any  # 1024-bit/3-hash filters over ~30 values/file prune
    # absent value: (whp) zero files open, always zero rows
    miss = snap.read_snapshot(spark, t, point=("tag", "no-such-tag"))
    assert miss.count() == 0
    # int-typed column probe casts to the column type (bigint vs int
    # literals hash differently — a wrong cast would skip every file);
    # k has no bloom: lookup still CORRECT (filter-only, no pruning)
    hit = snap.read_snapshot(spark, t, point=("k", 13)).collect()
    assert [(r.k, r.tag) for r in hit] == [(13, f"tag-{13 * 7 % 60}")]


def test_bloom_index_survives_merge_delete_compact_restore(spark):
    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame(
            [(i, f"u{i}") for i in range(40)], "k int, tag string"
        ),
        t, cluster_by=["k"], n_files=4, bloom_for=["tag"],
    )
    # MERGE rewrites some files: new files get filters, lookups stay exact
    snap.upsert_snapshot(
        spark, t,
        spark.createDataFrame([(3, "u3-new"), (99, "u99")], "k int, tag string"),
        ["k"],
    )
    assert {r.k for r in snap.read_snapshot(spark, t, point=("tag", "u3-new")).collect()} == {3}
    assert snap.read_snapshot(spark, t, point=("tag", "u3")).count() == 0
    m = snap.read_manifest(t, snap.latest_version(t))
    assert set(m["file_blooms"]) == set(m["files"])
    # DELETE keeps the index consistent
    from pyspark.sql import functions as SF

    snap.delete_where(spark, t, SF.col("tag") == "u7")
    assert snap.read_snapshot(spark, t, point=("tag", "u7")).count() == 0
    assert snap.read_snapshot(spark, t, point=("tag", "u8")).count() == 1
    # compact rewrites everything: filters recomputed, lookups exact
    snap.compact(spark, t, n_files=2)
    m2 = snap.read_manifest(t, snap.latest_version(t))
    assert set(m2["file_blooms"]) == set(m2["files"]) and len(m2["files"]) <= 2
    assert {r.k for r in snap.read_snapshot(spark, t, point=("tag", "u99")).collect()} == {99}
    # restore carries the target's index
    v = snap.restore_snapshot(t, 1)
    mv = snap.read_manifest(t, v)
    assert set(mv["file_blooms"]) == set(mv["files"])
    assert {r.k for r in snap.read_snapshot(spark, t, point=("tag", "u7")).collect()} == {7}


def test_scd2_history_and_asof_reads(spark):
    from pyspark.sql import functions as SF

    t = _tdir()
    base = spark.createDataFrame(
        [(1, "gold", 0, None), (2, "silver", 0, None)],
        "k int, tier string, effective_from long, effective_to long",
    )
    snap.write_snapshot(base, t, cluster_by=["k"])
    # t=10: k=1 upgrades; t=20: k=1 again + new key k=3
    snap.scd2_upsert(
        spark, t,
        spark.createDataFrame([(1, "plat", 10)], "k int, tier string, effective_from long"),
        ["k"],
    )
    snap.scd2_upsert(
        spark, t,
        spark.createDataFrame(
            [(1, "diamond", 20), (3, "bronze", 20)],
            "k int, tier string, effective_from long",
        ),
        ["k"], txn_app="scd", txn_version=2,
    )
    hist = {(r.k, r.effective_from): (r.tier, r.effective_to)
            for r in snap.read_snapshot(spark, t).collect()}
    assert hist == {
        (1, 0): ("gold", 10), (1, 10): ("plat", 20), (1, 20): ("diamond", None),
        (2, 0): ("silver", None), (3, 20): ("bronze", None),
    }
    # replayed txn batch is a no-op
    v = snap.latest_version(t)
    snap.scd2_upsert(
        spark, t,
        spark.createDataFrame([(1, "XXX", 20)], "k int, tier string, effective_from long"),
        ["k"], txn_app="scd", txn_version=2,
    )
    assert snap.latest_version(t) == v
    # point-in-time reads
    def asof(ts):
        return {r.k: r.tier for r in snap.read_scd2_asof(spark, t, ts).collect()}

    assert asof(5) == {1: "gold", 2: "silver"}
    assert asof(10) == {1: "plat", 2: "silver"}
    assert asof(15) == {1: "plat", 2: "silver"}
    assert asof(25) == {1: "diamond", 2: "silver", 3: "bronze"}
    # exactly one open row per live key at any time
    open_rows = snap.read_snapshot(spark, t).filter(SF.col("effective_to").isNull())
    assert open_rows.groupBy("k").count().filter("count > 1").count() == 0


def test_bloom_bits_validation_and_schema_evolution_merge(spark):
    # invalid geometry is loud at write time (silent truncation would
    # IndexError readers later); an evolve-schema merge whose update
    # batch lacks the bloom column must still commit (schema-pinned
    # bloom scan null-backfills) with lookups staying correct
    t = _tdir()
    df = spark.createDataFrame([(1, "a")], "k int, tag string")
    with pytest.raises(ValueError, match="multiple of 64"):
        snap.write_snapshot(df, t, bloom_for=["tag"], bloom_bits=1000)
    with pytest.raises(ValueError, match="multiple of 64"):
        snap.write_snapshot(df, t, bloom_for=["tag"], bloom_bits=32)
    snap.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, tag string"),
        t, bloom_for=["tag"],
    )
    # update batch WITHOUT 'tag' (dropped col) + a new column, new key
    # only -> the rewritten file physically lacks 'tag'
    snap.upsert_snapshot(
        spark, t,
        spark.createDataFrame([(3, 9.5)], "k int, score double"),
        ["k"], evolve_schema=True,
    )
    assert {r.k for r in snap.read_snapshot(spark, t, point=("tag", "a")).collect()} == {1}
    assert snap.read_snapshot(spark, t, point=("tag", "zzz")).count() == 0


# ---------------------------------------------------------------------------
# Deletion vectors (merge-on-read DELETE) — r8 verdict ask #1
# ---------------------------------------------------------------------------


def test_dv_point_delete_writes_zero_rewritten_data_files(spark):
    t = _tdir()
    df = spark.range(0, 400).selectExpr("cast(id as int) k", "id * 2 v")
    snap.write_snapshot(df, t, cluster_by=["k"], n_files=4)
    files_v1 = list(snap.read_manifest(t, 1)["files"])
    v2 = snap.delete_where(spark, t, F.col("k") == 123, dv=True)
    m2 = snap.read_manifest(t, v2)
    # the scale-economics contract: NO data file rewritten — the file
    # list is carried verbatim, only a (tiny) DV sidecar was added
    assert m2["files"] == files_v1
    assert m2["rewrote"] == [] and m2["dv"] is True
    dvm = m2["file_dvs"]
    assert sum(e["rows"] for e in dvm.values()) == 1
    dv_paths = {p for e in dvm.values() for p in e["paths"]}
    assert len(dv_paths) == 1  # one sidecar file per commit
    assert all(p not in files_v1 for p in dv_paths)
    got = snap.read_snapshot(spark, t)
    assert got.filter(F.col("k") == 123).count() == 0
    assert got.count() == 399
    assert snap.snapshot_rows(t) == 399
    # time travel still sees the pre-delete row
    assert snap.read_snapshot(spark, t, version=1).count() == 400


def test_dv_stacking_null_predicate_and_merge_no_resurrection(spark):
    t = _tdir()
    rows = [(i, "g" if i % 2 else None) for i in range(100)]
    snap.write_snapshot(
        spark.createDataFrame(rows, "k int, tag string"), t,
        cluster_by=["k"], n_files=4,
    )
    snap.delete_where(spark, t, F.col("k").between(10, 19), dv=True,
                      key_range=("k", 10, 19))
    # stacked second DV on overlapping files; NULL-predicate rows kept
    snap.delete_where(spark, t, (F.col("tag") == "g") & (F.col("k") < 30), dv=True)
    kept = {r.k for r in snap.read_snapshot(spark, t).collect()}
    expect = {
        i for i in range(100)
        if not (10 <= i <= 19) and not (i % 2 and i < 30)
    }
    assert kept == expect
    assert snap.snapshot_rows(t) == len(expect)
    # a delete matching only already-DV-deleted rows is a no-op commit
    v = snap.latest_version(t)
    assert snap.delete_where(spark, t, F.col("k") == 15, dv=True) == v
    # MERGE over the DV table: rewritten files shed their DVs, deleted
    # rows do NOT resurrect, untouched files keep their DV entries
    upd = spark.createDataFrame([(11, "u"), (50, "u")], "k int, tag string")
    mv = snap.upsert_snapshot(spark, t, upd, ["k"])
    got = {r.k: r.tag for r in snap.read_snapshot(spark, t).collect()}
    assert got[11] == "u" and got[50] == "u"
    assert 13 not in got and 21 not in got  # still deleted
    m = snap.read_manifest(t, mv)
    for rel in m.get("rewrote", []):
        assert rel not in m.get("file_dvs", {})


def test_dv_compact_materializes_restore_carries(spark):
    t = _tdir()
    snap.write_snapshot(
        spark.range(0, 50).selectExpr("cast(id as int) k", "id v"), t,
        cluster_by=["k"], n_files=2,
    )
    v2 = snap.delete_where(spark, t, F.col("k") % 10 == 0, dv=True)
    live = sorted(r.k for r in snap.read_snapshot(spark, t).collect())
    cv = snap.compact(spark, t, 1)
    cm = snap.read_manifest(t, cv)
    # compaction materialized the DVs away: fresh files, no file_dvs
    assert "file_dvs" not in cm
    assert sorted(r.k for r in snap.read_snapshot(spark, t).collect()) == live
    assert snap.snapshot_rows(t) == len(live)
    # restore back to the DV version: file_dvs carried, content matches
    rv = snap.restore_snapshot(t, v2)
    rm = snap.read_manifest(t, rv)
    assert rm.get("file_dvs") == snap.read_manifest(t, v2)["file_dvs"]
    assert sorted(r.k for r in snap.read_snapshot(spark, t).collect()) == live


def test_dv_vacuum_keeps_live_sidecars_then_reclaims(spark):
    import os as _os

    t = _tdir()
    snap.write_snapshot(
        spark.range(0, 40).selectExpr("cast(id as int) k", "id v"), t
    )
    snap.delete_where(spark, t, F.col("k") < 5, dv=True)
    m = snap.read_manifest(t, snap.latest_version(t))
    dv_paths = sorted({p for e in m["file_dvs"].values() for p in e["paths"]})
    # keep_last=1 (the DV version is current): sidecars must SURVIVE
    snap.vacuum(t, keep_last=1, orphan_ttl_seconds=0)
    for p in dv_paths:
        assert _os.path.exists(_os.path.join(t, p))
    assert snap.read_snapshot(spark, t).count() == 35
    # compact (DVs materialized), then vacuum: sidecars now unreferenced
    snap.compact(spark, t, 1)
    deleted = snap.vacuum(t, keep_last=1, orphan_ttl_seconds=0)
    assert set(dv_paths) <= set(deleted)
    assert snap.read_snapshot(spark, t).count() == 35


def test_dv_cdc_feed_diff_fallback_and_sidecar(spark, tmp_path):
    t = _tdir()
    snap.write_snapshot(
        spark.range(0, 30).selectExpr("cast(id as int) k", "id v"), t,
        cluster_by=["k"], n_files=2,
    )
    v2 = snap.delete_where(spark, t, F.col("k") == 3, dv=True)            # diff fallback
    v3 = snap.delete_where(spark, t, F.col("k").isin(4, 5), dv=True, cdc=True)  # labeled
    assert snap.read_manifest(t, v3).get("cdc_files")
    got = []
    q = (
        snap.read_snapshot_stream(spark, t, starting_version=v2)
        .writeStream.foreachBatch(lambda df, _b: got.extend(map(tuple, df.collect())))
        .option("checkpointLocation", str(tmp_path / "dv_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert sorted(got) == [
        (3, 3, "delete", v2), (4, 4, "delete", v3), (5, 5, "delete", v3)
    ]
    # snapshot_diff agrees across the DV-only version step
    d = snap.snapshot_diff(spark, t, 1, v3).collect()
    assert sorted((r.k, r._change) for r in d) == [
        (3, "delete"), (4, "delete"), (5, "delete")
    ]


def test_dv_nondeterministic_predicate_is_consistent(spark):
    # DV mode evaluates the predicate exactly ONCE: a rand() sampling
    # delete still yields kept + CDC sets that partition the table
    t = _tdir()
    snap.write_snapshot(
        spark.range(0, 200).selectExpr("cast(id as int) k", "id v"), t
    )
    v = snap.delete_where(spark, t, F.rand() < 0.5, dv=True, cdc=True)
    m = snap.read_manifest(t, v)
    n_dv = sum(e["rows"] for e in m.get("file_dvs", {}).values())
    kept = {r.k for r in snap.read_snapshot(spark, t).collect()}
    assert len(kept) == 200 - n_dv
    cdc_rels = m.get("cdc_files", [])
    if cdc_rels:
        import os as _os
        cdc = spark.read.parquet(*(_os.path.join(t, r) for r in cdc_rels))
        deleted = {r.k for r in cdc.collect()}
        assert len(deleted) == n_dv
        assert kept | deleted == set(range(200)) and not (kept & deleted)


def test_dv_stream_replay_excludes_deleted_rows(spark, tmp_path):
    # a feed whose FIRST version already carries DVs (vacuumed-parent /
    # initial-snapshot replay path) must replay live rows only
    t = _tdir()
    snap.write_snapshot(
        spark.range(0, 20).selectExpr("cast(id as int) k", "id v"), t
    )
    snap.delete_where(spark, t, F.col("k") < 3, dv=True)
    snap.vacuum(t, keep_last=1, orphan_ttl_seconds=0)  # drops v1 manifest
    v = snap.latest_version(t)
    got = []
    q = (
        snap.read_snapshot_stream(spark, t, starting_version=v)
        .writeStream.foreachBatch(lambda df, _b: got.extend(map(tuple, df.collect())))
        .option("checkpointLocation", str(tmp_path / "dv_replay_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    ks = sorted(r[0] for r in got)
    assert ks == list(range(3, 20))
    assert all(r[2] == "insert" for r in got)


def test_dv_merge_appends_without_rewriting(spark):
    # merge-on-read MERGE: matched pre-images tombstoned via sidecar,
    # the batch appended — every v1 data file carried verbatim
    t = _tdir()
    snap.write_snapshot(
        spark.range(0, 300).selectExpr("cast(id as int) k", "id * 2 v"), t,
        cluster_by=["k"], n_files=3,
    )
    files_v1 = list(snap.read_manifest(t, 1)["files"])
    upd = spark.createDataFrame([(7, -7), (150, -150), (900, -900)], "k int, v long")
    v2 = snap.upsert_snapshot(spark, t, upd, ["k"], dv=True)
    m2 = snap.read_manifest(t, v2)
    assert m2["rewrote"] == [] and m2["dv"] is True
    assert set(files_v1) <= set(m2["files"])  # no old file dropped
    new_files = [f for f in m2["files"] if f not in files_v1]
    assert new_files  # the batch landed as fresh files
    assert sum(e["rows"] for e in m2["file_dvs"].values()) == 2  # 7, 150 matched
    got = {r.k: r.v for r in snap.read_snapshot(spark, t).collect()}
    assert got[7] == -7 and got[150] == -150 and got[900] == -900
    assert got[8] == 16  # untouched neighbor intact
    assert len(got) == 301 and snap.snapshot_rows(t) == 301
    # time travel: v1 still shows the pre-merge values
    old = {r.k: r.v for r in snap.read_snapshot(spark, t, version=1).collect()}
    assert old[7] == 14 and 900 not in old


def test_dv_merge_equals_rewrite_merge_and_restacks(spark):
    # the two write paths must converge to identical table CONTENT,
    # including a second DV merge that tombstones the first's appends
    t_dv, t_rw = _tdir(), _tdir()
    base = spark.range(0, 120).selectExpr("cast(id as int) k", "id v")
    for t in (t_dv, t_rw):
        snap.write_snapshot(base, t, cluster_by=["k"], n_files=4)
    b1 = spark.createDataFrame([(5, 500), (60, 600), (200, 2000)], "k int, v long")
    b2 = spark.createDataFrame([(5, 501), (200, 2001), (300, 3000)], "k int, v long")
    snap.upsert_snapshot(spark, t_dv, b1, ["k"], dv=True)
    v_dv = snap.upsert_snapshot(spark, t_dv, b2, ["k"], dv=True)
    snap.upsert_snapshot(spark, t_rw, b1, ["k"])
    snap.upsert_snapshot(spark, t_rw, b2, ["k"])
    rows_dv = sorted(map(tuple, snap.read_snapshot(spark, t_dv).collect()))
    rows_rw = sorted(map(tuple, snap.read_snapshot(spark, t_rw).collect()))
    assert rows_dv == rows_rw
    # b2 re-hit key 5 (a v1 file) AND keys 5/200's b1 appends: both
    # generations tombstoned, exactly one live row per key
    m = snap.read_manifest(t_dv, v_dv)
    assert m["rewrote"] == []
    assert snap.snapshot_rows(t_dv) == len(rows_dv)


def test_dv_delete_keys_and_txn_idempotency(spark):
    t = _tdir()
    snap.write_snapshot(
        spark.range(0, 100).selectExpr("cast(id as int) k", "id v"), t,
        cluster_by=["k"], n_files=4,
    )
    files_v1 = list(snap.read_manifest(t, 1)["files"])
    dels = spark.createDataFrame([(3,), (44,), (999,)], "k int")
    v2 = snap.delete_keys(spark, t, dels, ["k"], dv=True,
                          txn_app="delapp", txn_version=1)
    m2 = snap.read_manifest(t, v2)
    assert m2["files"] == files_v1 and m2["op"] == "delete"
    assert sum(e["rows"] for e in m2["file_dvs"].values()) == 2
    assert snap.read_snapshot(spark, t).count() == 98
    # replayed txn: no-op at the same version
    assert snap.delete_keys(spark, t, dels, ["k"], dv=True,
                            txn_app="delapp", txn_version=1) == v2
    # keys matching nothing: metadata no-op (no txn to record)
    v3 = snap.delete_keys(
        spark, t, spark.createDataFrame([(999,)], "k int"), ["k"], dv=True
    )
    assert v3 == v2


def test_dv_merge_cdc_sidecar_and_diff(spark):
    t = _tdir()
    snap.write_snapshot(
        spark.range(0, 40).selectExpr("cast(id as int) k", "id v"), t,
        cluster_by=["k"], n_files=2,
    )
    upd = spark.createDataFrame([(10, -10), (50, -50)], "k int, v long")
    v2 = snap.upsert_snapshot(spark, t, upd, ["k"], dv=True, cdc=True)
    import os as _os
    cdc_rels = snap.read_manifest(t, v2).get("cdc_files")
    assert cdc_rels
    cdc = spark.read.parquet(*(_os.path.join(t, r) for r in cdc_rels))
    assert sorted((r.k, r.v, r._change) for r in cdc.collect()) == [
        (10, -10, "insert"), (10, 10, "delete"), (50, -50, "insert")
    ]
    # the generic differ nets the same deltas across the DV commit
    d = snap.snapshot_diff(spark, t, 1, v2).collect()
    assert sorted((r.k, r.v, r._change) for r in d) == [
        (10, -10, "insert"), (10, 10, "delete"), (50, -50, "insert")
    ]


def test_dv_merge_evolve_schema_and_compact(spark):
    t = _tdir()
    snap.write_snapshot(
        spark.range(0, 30).selectExpr("cast(id as int) k", "id v"), t,
        cluster_by=["k"], n_files=2,
    )
    # batch adds 'score', drops 'v' — appended files carry the union
    # schema with nulls; old files null-backfill 'score' via the pin
    upd = spark.createDataFrame([(3, 9.5), (77, 1.5)], "k int, score double")
    snap.upsert_snapshot(spark, t, upd, ["k"], dv=True, evolve_schema=True)
    got = {r.k: (r.v, r.score) for r in snap.read_snapshot(spark, t).collect()}
    assert got[3] == (None, 9.5) and got[77] == (None, 1.5)
    assert got[4] == (4, None)
    assert len(got) == 31
    live = sorted((k, *vs) for k, vs in got.items())
    cv = snap.compact(spark, t, 1)
    assert "file_dvs" not in snap.read_manifest(t, cv)
    got2 = {r.k: (r.v, r.score) for r in snap.read_snapshot(spark, t).collect()}
    assert sorted((k, *vs) for k, vs in got2.items()) == live


def test_scd2_non_monotone_effective_time_raises(spark):
    t = _tdir()
    base = spark.createDataFrame(
        [(1, "a", 100, None)], "k int, attr string, effective_from long, effective_to long"
    )
    snap.write_snapshot(base, t, cluster_by=["k"], n_files=1)
    upd_ok = spark.createDataFrame([(1, "b", 200)], "k int, attr string, effective_from long")
    snap.scd2_upsert(spark, t, upd_ok, ["k"])
    # equal-to-current and earlier-than-current must both raise loudly
    for ts in (200, 150):
        upd_bad = spark.createDataFrame(
            [(1, "c", ts)], "k int, attr string, effective_from long"
        )
        with pytest.raises(ValueError, match="non-monotone"):
            snap.scd2_upsert(spark, t, upd_bad, ["k"])
    # table unchanged by the failed merges: 2 history rows
    assert snap.read_snapshot(spark, t).count() == 2


def test_compact_small_rewrites_only_small_files(spark):
    import os as _os

    t = _tdir()
    # two well-sized files + a trickle of tiny merge leftovers
    big = spark.range(0, 20000).selectExpr("cast(id as int) k", "id v")
    snap.write_snapshot(big, t, cluster_by=["k"], n_files=2)
    for i in range(3):
        snap.upsert_snapshot(
            spark, t,
            spark.createDataFrame([(100000 + i, -i)], "k int, v long"),
            ["k"],
        )
    m = snap.read_manifest(t, snap.latest_version(t))
    sizes = {r: _os.path.getsize(_os.path.join(t, r)) for r in m["files"]}
    cut = 20000  # bytes: far below the two big files, above the tiny ones
    small = [r for r, s in sizes.items() if s < cut]
    bigs = [r for r, s in sizes.items() if s >= cut]
    assert len(small) >= 2 and len(bigs) == 2
    before = sorted(map(tuple, snap.read_snapshot(spark, t).collect()))
    v = snap.compact_small(spark, t, cut)
    m2 = snap.read_manifest(t, v)
    # big files carried verbatim; small ones replaced by one file
    assert set(bigs) <= set(m2["files"])
    assert not (set(small) & set(m2["files"]))
    assert len(m2["files"]) == len(bigs) + 1
    assert sorted(map(tuple, snap.read_snapshot(spark, t).collect())) == before
    # DV on a BIG file survives the small-file compaction untouched
    snap.delete_where(spark, t, F.col("k") == 7, dv=True)
    v2 = snap.compact_small(spark, t, cut)  # only one small file now: no-op
    assert v2 == snap.latest_version(t)
    assert snap.read_manifest(t, v2).get("file_dvs")  # DV carried, not purged
    assert snap.read_snapshot(spark, t).filter(F.col("k") == 7).count() == 0
    # fewer than two small files: metadata no-op
    assert snap.compact_small(spark, t, 10) == snap.latest_version(t)


def test_maintain_join_view_matches_rebuild(spark):
    from ray_beam_runner_spark.sources.snapshots import maintain_join_view

    a_dir, b_dir, v_dir = _tdir(), _tdir(), _tdir()
    a0 = spark.createDataFrame(
        [(i, i % 10, float(i)) for i in range(100)], "aid int, jk int, x double"
    )
    b0 = spark.createDataFrame(
        [(j, j % 10, f"b{j}") for j in range(20)], "bid int, bk int, tag string"
    )
    snap.write_snapshot(a0, a_dir, cluster_by=["aid"], n_files=2)
    snap.write_snapshot(b0, b_dir, cluster_by=["bid"], n_files=2)
    on = ("jk", "bk")
    v1 = maintain_join_view(spark, v_dir, a_dir, b_dir, on, "aid", "bid")
    # idempotent: nothing changed -> same version
    assert maintain_join_view(spark, v_dir, a_dir, b_dir, on, "aid", "bid") == v1

    def rebuilt():
        return sorted(
            map(tuple, snap.read_snapshot(spark, a_dir)
                .join(snap.read_snapshot(spark, b_dir),
                      F.col("jk") == F.col("bk")).collect())
        )

    def view():
        return sorted(map(tuple, snap.read_snapshot(spark, v_dir).collect()))

    assert view() == rebuilt()
    # A-side churn: update (jk moves key 5 to a new join group), insert, delete
    snap.upsert_snapshot(
        spark, a_dir,
        spark.createDataFrame([(5, 3, -5.0), (200, 7, 200.0)], "aid int, jk int, x double"),
        ["aid"],
    )
    snap.delete_where(spark, a_dir, F.col("aid").isin(6, 7))
    assert maintain_join_view(spark, v_dir, a_dir, b_dir, on, "aid", "bid") > v1
    assert view() == rebuilt()
    # B-side churn in a separate refresh: retag, delete a join group
    snap.upsert_snapshot(
        spark, b_dir,
        spark.createDataFrame([(3, 3, "B3")], "bid int, bk int, tag string"),
        ["bid"],
    )
    snap.delete_where(spark, b_dir, F.col("bid") == 4)
    maintain_join_view(spark, v_dir, a_dir, b_dir, on, "aid", "bid")
    assert view() == rebuilt()
    # BOTH sides churn between a single refresh
    snap.upsert_snapshot(
        spark, a_dir,
        spark.createDataFrame([(201, 4, 1.0)], "aid int, jk int, x double"), ["aid"],
    )
    snap.upsert_snapshot(
        spark, b_dir,
        spark.createDataFrame([(4, 4, "B4-new")], "bid int, bk int, tag string"), ["bid"],
    )
    maintain_join_view(spark, v_dir, a_dir, b_dir, on, "aid", "bid")
    assert view() == rebuilt()
    # rows actually exist (the join isn't vacuously empty)
    assert len(view()) > 50


def test_check_constraints_enforced_and_carried(spark):
    import pytest

    t = _tdir()
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, None)], "k int, v double, tag string"
    )
    cons = {"v_positive": "v > 0", "k_nonnull": "k IS NOT NULL"}
    # violating initial write never publishes
    bad0 = spark.createDataFrame([(3, -1.0, "x")], "k int, v double, tag string")
    with pytest.raises(ValueError, match="v_positive"):
        snap.write_snapshot(bad0, t, constraints=cons)
    assert snap.latest_version(t) is None
    snap.write_snapshot(df, t, cluster_by=["k"], n_files=2, constraints=cons)
    # NULL passes (SQL CHECK three-valued logic): tag None row is in
    assert snap.read_snapshot(spark, t).count() == 2
    # violating MERGE batch aborts before anything commits
    v1 = snap.latest_version(t)
    bad = spark.createDataFrame([(5, -3.0, "x")], "k int, v double, tag string")
    with pytest.raises(ValueError, match="v_positive"):
        snap.upsert_snapshot(spark, t, bad, ["k"])
    assert snap.latest_version(t) == v1
    # clean merge passes; DV-mode merge validates too
    ok = spark.createDataFrame([(5, 3.0, "x")], "k int, v double, tag string")
    snap.upsert_snapshot(spark, t, ok, ["k"])
    with pytest.raises(ValueError, match="v_positive"):
        snap.upsert_snapshot(spark, t, bad, ["k"], dv=True)
    # evolve_schema batch dropping 'v': NULL-backfilled -> passes CHECK
    ev = spark.createDataFrame([(7, 1.5)], "k int, score double")
    snap.upsert_snapshot(spark, t, ev, ["k"], evolve_schema=True)
    # constraints survive delete / compact / restore commits
    snap.delete_where(spark, t, F.col("k") == 2)
    snap.compact(spark, t, 1)
    m = snap.read_manifest(t, snap.latest_version(t))
    assert m.get("constraints") == cons
    rv = snap.restore_snapshot(t, v1)
    assert snap.read_manifest(t, rv).get("constraints") == cons
    with pytest.raises(ValueError, match="v_positive"):
        snap.upsert_snapshot(spark, t, bad, ["k"])


def test_token_index_maintenance_equals_rebuild(spark, tmp_path):
    import pytest

    from ray_beam_runner_spark.functions.search import (
        build_token_index,
        doc_postings,
        search_index,
        stream_maintain_token_index,
    )

    src, idx = _tdir(), _tdir()
    docs0 = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta beta delta"), (3, "gamma delta")],
        "doc_id long, text string",
    )
    snap.write_snapshot(docs0, src, cluster_by=["doc_id"], n_files=2)
    build_token_index(docs0, idx, "doc_id", "text", n_files=2)

    def drain(ck):
        feed = snap.read_snapshot_stream(spark, src, starting_version=2)
        q = stream_maintain_token_index(feed, idx, "doc_id", "text", str(ck))
        assert q.awaitTermination(120)

    # update doc 2 (beta count changes, delta disappears), add doc 4,
    # then delete doc 1 — two incremental drains
    snap.upsert_snapshot(
        spark, src,
        spark.createDataFrame(
            [(2, "beta epsilon"), (4, "alpha alpha beta")], "doc_id long, text string"
        ),
        ["doc_id"], cdc=True,
    )
    drain(tmp_path / "ck")
    snap.delete_where(spark, src, F.col("doc_id") == 1, cdc=True)
    drain(tmp_path / "ck")
    maintained = sorted(map(tuple, snap.read_snapshot(spark, idx).collect()))
    rebuilt = sorted(
        map(tuple, doc_postings(snap.read_snapshot(spark, src), "doc_id", "text").collect())
    )
    assert maintained == rebuilt
    # stale postings gone: doc 2's 'delta' and doc 1 entirely
    assert (2, ) not in {(d,) for t, d, _ in maintained if t == "delta"}
    assert all(d != 1 for _, d, _ in maintained)
    got = {r.doc_id: (r.n_terms, r.total_tf)
           for r in search_index(spark, idx, ["alpha", "beta"], "doc_id").collect()}
    assert got == {4: (2, 3)}
    got_or = {r.doc_id for r in
              search_index(spark, idx, ["alpha", "beta"], "doc_id", mode="or").collect()}
    assert got_or == {2, 4}
    with pytest.raises(ValueError, match="mode"):
        search_index(spark, idx, ["alpha"], "doc_id", mode="xor")
    with pytest.raises(ValueError, match="empty"):
        search_index(spark, idx, [], "doc_id")


def test_search_phrase_positional_folds(spark):
    import pytest

    from ray_beam_runner_spark.functions.search import (
        build_token_index,
        search_phrase,
    )

    idx = _tdir()
    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b"),     # "a b c" twice, "a b" three times
            (2, "a c b a"),             # contains a,b,c but never the phrase
            (3, "x a b c y"),           # once
            (4, "b c a"),               # tokens present, wrong order
        ],
        "doc_id long, text string",
    )
    build_token_index(docs, idx, "doc_id", "text", positional=True)
    got3 = {r.doc_id: r.n_occ
            for r in search_phrase(spark, idx, ["a", "b", "c"], "doc_id").collect()}
    assert got3 == {1: 2, 3: 1}
    got2 = {r.doc_id: r.n_occ
            for r in search_phrase(spark, idx, ["a", "b"], "doc_id").collect()}
    assert got2 == {1: 3, 3: 1}
    # a 4-term phrase that only overlaps matches ("a b c a" in doc 1)
    got4 = {r.doc_id: r.n_occ
            for r in search_phrase(spark, idx, ["a", "b", "c", "a"], "doc_id").collect()}
    assert got4 == {1: 2}
    with pytest.raises(ValueError, match="two terms"):
        search_phrase(spark, idx, ["a"], "doc_id")


def test_positional_index_cdc_maintenance(spark, tmp_path):
    from ray_beam_runner_spark.functions.search import (
        build_token_index,
        doc_postings,
        search_phrase,
        stream_maintain_token_index,
    )

    src, idx = _tdir(), _tdir()
    docs0 = spark.createDataFrame(
        [(1, "a b c"), (2, "c a b")], "doc_id long, text string"
    )
    snap.write_snapshot(docs0, src, cluster_by=["doc_id"], n_files=1)
    build_token_index(docs0, idx, "doc_id", "text", positional=True)
    snap.upsert_snapshot(
        spark, src,
        spark.createDataFrame([(2, "a b a b"), (3, "b a b")], "doc_id long, text string"),
        ["doc_id"], cdc=True,
    )
    feed = snap.read_snapshot_stream(spark, src, starting_version=2)
    q = stream_maintain_token_index(
        feed, idx, "doc_id", "text", str(tmp_path / "ck"), positional=True
    )
    assert q.awaitTermination(120)
    maintained = sorted(map(tuple, snap.read_snapshot(spark, idx).collect()))
    rebuilt = sorted(map(tuple, doc_postings(
        snap.read_snapshot(spark, src), "doc_id", "text", positional=True
    ).collect()))
    assert maintained == rebuilt
    got = {r.doc_id: r.n_occ
           for r in search_phrase(spark, idx, ["a", "b"], "doc_id").collect()}
    assert got == {1: 1, 2: 2, 3: 1}


def test_token_index_insert_then_delete_in_one_drain(spark, tmp_path):
    from ray_beam_runner_spark.functions.search import (
        build_token_index,
        stream_maintain_token_index,
    )

    src, idx = _tdir(), _tdir()
    docs0 = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    snap.write_snapshot(docs0, src, cluster_by=["doc_id"], n_files=1)
    build_token_index(docs0, idx, "doc_id", "text")
    # doc 9 is born AND dies before the index ever drains: it must
    # never appear; doc 1's update must land
    snap.upsert_snapshot(
        spark, src,
        spark.createDataFrame([(9, "ghost town"), (1, "alpha gamma")],
                              "doc_id long, text string"),
        ["doc_id"], cdc=True,
    )
    snap.delete_where(spark, src, F.col("doc_id") == 9, cdc=True)
    feed = snap.read_snapshot_stream(spark, src, starting_version=2)
    q = stream_maintain_token_index(feed, idx, "doc_id", "text", str(tmp_path / "ck"))
    assert q.awaitTermination(120)
    rows = {(r.token, r.doc_id) for r in snap.read_snapshot(spark, idx).collect()}
    assert all(d != 9 for _, d in rows), rows
    assert ("gamma", 1) in rows and ("beta", 1) not in rows


def test_merge_into_when_clauses(spark):
    import pytest

    from ray_beam_runner_spark.sources.snapshots import merge_into

    t = _tdir()
    base = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 200.0, "b"), (3, 30.0, "c"), (4, 40.0, "d")],
        "k int, v double, tag string",
    )
    snap.write_snapshot(base, t, cluster_by=["k"], n_files=2)
    src = spark.createDataFrame(
        [(1, 5.0, "s"), (2, 5.0, "s"), (9, 900.0, "s"), (10, 0.5, "s")],
        "k int, v double, tag string",
    )
    v = merge_into(
        spark, t, src, ["k"],
        delete_condition="t.v > 100",          # kills k=2
        update_set={"v": "t.v + s.v", "tag": "'M'"},  # k=1 -> 15.0
        insert_condition="s.v > 1",            # k=9 in, k=10 out
    )
    got = {r.k: (r.v, r.tag) for r in snap.read_snapshot(spark, t).collect()}
    assert got == {1: (15.0, "M"), 3: (30.0, "c"), 4: (40.0, "d"), 9: (900.0, "s")}
    # matched-by-no-clause rows (none here; use update_condition next)
    v2 = merge_into(
        spark, t, spark.createDataFrame([(3, 1.0, "x"), (4, 1.0, "x")],
                                        "k int, v double, tag string"),
        ["k"],
        update_condition="t.v < 35",  # only k=3 updates; k=4 untouched
        update_set={"v": "s.v"},
    )
    got = {r.k: (r.v, r.tag) for r in snap.read_snapshot(spark, t).collect()}
    assert got[3] == (1.0, "c") and got[4] == (40.0, "d")
    # a matched row hit by NO clause must not rewrite its file
    m = snap.read_manifest(t, v2)
    assert m["rewrote"] != []  # k=3's file moved...
    v3 = merge_into(
        spark, t, spark.createDataFrame([(4, 1.0, "x")], "k int, v double, tag string"),
        ["k"], update_condition="t.v < 0", update_set={"v": "s.v"}, insert=False,
    )
    m3 = snap.read_manifest(t, v3) if v3 != v2 else None
    if m3 is not None:
        assert m3["rewrote"] == []  # no clause fired: nothing rewritten
    assert {r.k for r in snap.read_snapshot(spark, t).collect()} == {1, 3, 4, 9}
    # SET on a merge key is rejected loudly
    with pytest.raises(ValueError, match="merge keys"):
        merge_into(spark, t, src, ["k"], update_set={"k": "s.k + 1"})
    # dv=True routes through the merge-on-read path with same content
    t2 = _tdir()
    snap.write_snapshot(base, t2, cluster_by=["k"], n_files=2)
    merge_into(
        spark, t2, src, ["k"],
        delete_condition="t.v > 100",
        update_set={"v": "t.v + s.v", "tag": "'M'"},
        insert_condition="s.v > 1",
        dv=True,
    )
    got2 = {r.k: (r.v, r.tag) for r in snap.read_snapshot(spark, t2).collect()}
    assert got2 == {1: (15.0, "M"), 3: (30.0, "c"), 4: (40.0, "d"), 9: (900.0, "s")}
    assert snap.read_manifest(t2, snap.latest_version(t2))["rewrote"] == []


def test_timestamp_as_of_reads(spark):
    import pytest

    from ray_beam_runner_spark.sources.snapshots import version_as_of

    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(1, "v1")], "k int, s string"), t
    )
    t1 = snap.read_manifest(t, 1)["committed_at"]
    snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(1, "v2"), (2, "v2")], "k int, s string"), ["k"]
    )
    t2 = snap.read_manifest(t, 2)["committed_at"]
    assert t2 >= t1
    # AS OF exactly each commit time resolves to that commit
    assert version_as_of(t, t1) == 1 or t1 == t2  # equal stamps -> later wins
    assert version_as_of(t, t2) == 2
    assert version_as_of(t, t2 + 3600) == 2
    got = {r.k: r.s for r in snap.read_snapshot(spark, t, as_of_ts=t2).collect()}
    assert got == {1: "v2", 2: "v2"}
    if t1 < t2:
        got1 = {r.k: r.s for r in snap.read_snapshot(spark, t, as_of_ts=t1).collect()}
        assert got1 == {1: "v1"}
    with pytest.raises(ValueError, match="predates"):
        version_as_of(t, t1 - 3600)
    with pytest.raises(ValueError, match="only one"):
        snap.read_snapshot(spark, t, version=1, as_of_ts=t1)


def test_maintain_join_view_handles_dv_deletes(spark):
    from ray_beam_runner_spark.sources.snapshots import maintain_join_view

    a_dir, b_dir, v_dir = _tdir(), _tdir(), _tdir()
    a0 = spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(40)], "aid int, jk int, x double"
    )
    b0 = spark.createDataFrame(
        [(j, j, f"b{j}") for j in range(5)], "bid int, bk int, tag string"
    )
    snap.write_snapshot(a0, a_dir, cluster_by=["aid"], n_files=2)
    snap.write_snapshot(b0, b_dir, cluster_by=["bid"], n_files=2)
    on = ("jk", "bk")
    maintain_join_view(spark, v_dir, a_dir, b_dir, on, "aid", "bid")
    # merge-on-read deletes on BOTH sources: the diff reads DV-applied
    # state, so the view must converge identically to rewrite deletes
    snap.delete_where(spark, a_dir, F.col("aid") % 4 == 0, dv=True)
    snap.delete_where(spark, b_dir, F.col("bid") == 2, dv=True)
    maintain_join_view(spark, v_dir, a_dir, b_dir, on, "aid", "bid")
    view = sorted(map(tuple, snap.read_snapshot(spark, v_dir).collect()))
    rebuilt = sorted(
        map(tuple, snap.read_snapshot(spark, a_dir)
            .join(snap.read_snapshot(spark, b_dir), F.col("jk") == F.col("bk"))
            .collect())
    )
    assert view == rebuilt and len(view) > 10


def test_compact_zorder_repairs_layout(spark):
    t = _tdir()
    # clustered by k only: a query on c prunes nothing
    df = spark.range(0, 4000).selectExpr(
        "cast(id as int) k", "cast(pmod(id * 37, 4000) as int) c", "id v"
    )
    snap.write_snapshot(df, t, cluster_by=["k"], n_files=8)
    before = sorted(map(tuple, snap.read_snapshot(spark, t).collect()))
    m1 = snap.read_manifest(t, 1)

    def files_scanned(version, col, lo, hi):
        m = snap.read_manifest(t, version)
        fs = m.get("file_stats", {})
        n = 0
        for rel in m["files"]:
            s = fs.get(rel, {}).get(col)
            if not s or s[0] is None or not (s[1] < lo or s[0] > hi):
                n += 1
        return n

    assert files_scanned(1, "c", 100, 150) == 8  # no c stats -> all files
    v = snap.compact(spark, t, 8, zorder_by=["k", "c"])
    # content identical, both columns now prune
    assert sorted(map(tuple, snap.read_snapshot(spark, t).collect())) == before
    assert files_scanned(v, "c", 100, 150) < 8
    assert files_scanned(v, "k", 100, 150) < 8
    # old layout untouched for time travel
    assert snap.read_manifest(t, 1)["files"] == m1["files"]


def test_stream_maintain_aggregate_sumsq_variance(spark, tmp_path):
    src, agg = _tdir(), _tdir()
    ckpt = str(tmp_path / "ivm_sq_ckpt")
    snap.write_snapshot(
        spark.createDataFrame(
            [(1, "g1", 10.0), (2, "g1", 20.0), (3, "g2", 5.0), (4, "g2", 9.0)],
            "k int, grp string, v double",
        ),
        src,
    )

    def refresh():
        feed = snap.read_snapshot_stream(spark, src)
        q = snap.stream_maintain_aggregate(
            feed, agg, ["grp"], ["v"], checkpoint_dir=ckpt,
            app_id="ivm-sq-test", sumsq_cols=["v"],
        )
        assert q.awaitTermination(180)

    def maintained():
        return {
            r.grp: (r.cnt, round(r.sum_v, 6), round(r.sumsq_v, 6))
            for r in snap.read_snapshot(spark, agg).collect() if r.cnt > 0
        }

    def direct():
        rows = snap.read_snapshot(spark, src).groupBy("grp").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("s"),
            F.sum(F.col("v") * F.col("v")).alias("sq"),
        ).collect()
        return {r.grp: (r.cnt, round(r.s, 6), round(r.sq, 6)) for r in rows}

    refresh()
    assert maintained() == direct()
    # churn: update (second moment must net the value change), insert,
    # delete — then derived variance matches the population variance
    snap.upsert_snapshot(
        spark, src,
        spark.createDataFrame([(2, "g1", 26.0), (5, "g2", 1.0)],
                              "k int, grp string, v double"),
        ["k"], cdc=True,
    )
    snap.delete_where(spark, src, F.col("k") == 3, cdc=True)
    refresh()
    assert maintained() == direct()
    m = maintained()
    import statistics
    src_rows = snap.read_snapshot(spark, src).collect()
    for grp in ("g1", "g2"):
        vs = [r.v for r in src_rows if r.grp == grp]
        cnt, s, sq = m[grp]
        var = sq / cnt - (s / cnt) ** 2
        assert abs(var - statistics.pvariance(vs)) < 1e-9, (grp, var)


def test_snapshot_history_describes_commits(spark):
    t = _tdir()
    snap.write_snapshot(
        spark.range(0, 100).selectExpr("cast(id as int) k", "id v"), t,
        cluster_by=["k"], n_files=2,
    )
    snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(5, -5)], "k int, v long"), ["k"],
        txn_app="h", txn_version=1,
    )
    snap.delete_where(spark, t, F.col("k") == 7, dv=True)
    h = {r.version: r for r in snap.snapshot_history(spark, t).collect()}
    assert set(h) == {1, 2, 3}
    assert h[1].op == "overwrite" and h[1].parent is None and h[1].n_rows == 100
    assert h[2].op == "merge" and h[2].n_rewrote >= 1 and '"h": 1' in h[2].txns
    assert h[3].op == "delete" and h[3].dv_rows == 1 and h[3].n_rewrote == 0
    assert h[3].n_rows == 99  # live rows net of DV tombstones
    assert h[3].committed_at >= h[1].committed_at


def test_snapshot_tags(spark):
    import pytest

    from ray_beam_runner_spark.sources.snapshots import resolve_tag, tag_snapshot

    t = _tdir()
    snap.write_snapshot(spark.createDataFrame([(1, "v1")], "k int, s string"), t)
    assert tag_snapshot(t, "release") == 1
    snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(1, "v2")], "k int, s string"), ["k"]
    )
    # tag keeps pointing at the old state across later commits
    assert {r.s for r in snap.read_snapshot(spark, t, tag="release").collect()} == {"v1"}
    assert {r.s for r in snap.read_snapshot(spark, t).collect()} == {"v2"}
    # re-tag moves; unknown tags and mixed selectors are loud
    assert tag_snapshot(t, "release") == 2
    assert resolve_tag(t, "release") == 2
    with pytest.raises(KeyError, match="unknown tag"):
        resolve_tag(t, "nope")
    with pytest.raises(ValueError, match="only one"):
        snap.read_snapshot(spark, t, version=1, tag="release")
    with pytest.raises(FileNotFoundError):
        tag_snapshot(t, "bad", version=99)


def test_merge_key_named_f_is_not_clobbered(spark):
    """Regression: touched-file detection's internal file-path working
    column used to be named plain 'f' — a table whose MERGE KEY is
    named f had the key silently replaced by file paths, corrupting
    the semi-join. Internal names now use the _mrg_ reserved prefix."""
    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "f int, v string"), t
    )
    snap.upsert_snapshot(
        spark, t,
        spark.createDataFrame([(2, "B2"), (3, "c")], "f int, v string"),
        ["f"],
    )
    got = sorted((r.f, r.v) for r in snap.read_snapshot(spark, t).collect())
    assert got == [(1, "a"), (2, "B2"), (3, "c")]
    # and with deletion vectors on the same keyed path
    snap.delete_keys(
        spark, t, spark.createDataFrame([(1,)], "f int"), ["f"], dv=True
    )
    got = sorted((r.f, r.v) for r in snap.read_snapshot(spark, t).collect())
    assert got == [(2, "B2"), (3, "c")]


def test_tags_survive_vacuum_and_concurrent_writes(spark):
    """Tags are one file each (no whole-file RMW race losing a racer's
    tag) and vacuum RETAINS tag-pinned versions: a named release stays
    readable after aggressive vacuum; delete_tag releases the pin."""
    from ray_beam_runner_spark.sources.snapshots import (
        delete_tag,
        resolve_tag,
        tag_snapshot,
    )

    t = _tdir()
    snap.write_snapshot(spark.createDataFrame([(1, "v1")], "k int, s string"), t)
    tag_snapshot(t, "pinned")
    for s in ("v2", "v3", "v4"):
        snap.upsert_snapshot(
            spark, t, spark.createDataFrame([(1, s)], "k int, s string"), ["k"]
        )
    # two tags written "concurrently" must both survive (per-tag files)
    tag_snapshot(t, "other", version=3)
    assert resolve_tag(t, "pinned") == 1 and resolve_tag(t, "other") == 3
    snap.vacuum(t, keep_last=1, orphan_ttl_seconds=0)
    # pinned versions 1 and 3 survive the keep_last=1 vacuum...
    assert {r.s for r in snap.read_snapshot(spark, t, tag="pinned").collect()} == {"v1"}
    assert {r.s for r in snap.read_snapshot(spark, t, tag="other").collect()} == {"v3"}
    # ...and the unpinned version 2 is gone
    import pytest
    with pytest.raises(FileNotFoundError):
        snap.read_manifest(t, 2)
    # delete_tag releases the pin: next vacuum reclaims it
    delete_tag(t, "pinned")
    with pytest.raises(KeyError):
        resolve_tag(t, "pinned")
    snap.vacuum(t, keep_last=1, orphan_ttl_seconds=0)
    with pytest.raises(FileNotFoundError):
        snap.read_manifest(t, 1)
    assert {r.s for r in snap.read_snapshot(spark, t, tag="other").collect()} == {"v3"}


def test_merge_into_recomputes_after_commit_race(spark, monkeypatch):
    """merge_into's post-images (t.total + s.delta) are read-modify-
    write against one snapshot: when a racer lands first, the commit
    is pinned to its parent and the WHOLE merge recomputes against
    the racer's state — never republishing stale post-images (the
    round-9 advisor's lost-update finding)."""
    t = _tdir()
    snap.write_snapshot(spark.createDataFrame([(1, 10)], "k int, total int"), t)
    orig = snap._publish
    state = {"raced": False}

    def flaky(table_dir, version, manifest):
        if not state["raced"]:
            state["raced"] = True
            # a racer lands a REAL commit first: total 10 -> 100
            monkeypatch.setattr(snap, "_publish", orig)
            try:
                snap.upsert_snapshot(
                    spark, t,
                    spark.createDataFrame([(1, 100)], "k int, total int"),
                    ["k"],
                )
            finally:
                monkeypatch.setattr(snap, "_publish", flaky)
            return orig(table_dir, version, manifest)  # loses -> raises
        return orig(table_dir, version, manifest)

    monkeypatch.setattr(snap, "_publish", flaky)
    snap.merge_into(
        spark, t,
        spark.createDataFrame([(1, 5)], "k int, delta int"),
        ["k"], update_set={"total": "t.total + s.delta"}, insert=False,
    )
    rows = {(r.k, r.total) for r in snap.read_snapshot(spark, t).collect()}
    assert rows == {(1, 105)}  # racer's 100 + 5, NOT stale 10 + 5 = 15

    # and with retries exhausted the conflict is LOUD, not a lost update
    state["raced"] = False
    with pytest.raises(snap.ConcurrentCommitError):
        snap.merge_into(
            spark, t,
            spark.createDataFrame([(1, 7)], "k int, delta int"),
            ["k"], update_set={"total": "t.total + s.delta"},
            insert=False, retries=0,
        )


def test_join_view_watermarks_atomic_with_materialization(spark):
    """The initial join-view commit carries BOTH source watermarks in
    the same manifest (no crash window between data and watermark); a
    view missing them is rejected loudly instead of silently skipping
    deltas by defaulting to the sources' current versions."""
    from ray_beam_runner_spark.sources.snapshots import maintain_join_view

    a_dir, b_dir, v_dir = _tdir(), _tdir(), _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(1, 1, 1.0)], "aid int, jk int, x double"), a_dir
    )
    snap.write_snapshot(
        spark.createDataFrame([(1, 1, "b")], "bid int, bk int, tag string"), b_dir
    )
    v = maintain_join_view(spark, v_dir, a_dir, b_dir, ("jk", "bk"), "aid", "bid")
    txns = snap.read_manifest(v_dir, v).get("txns", {})
    assert txns.get("jv:a") == 1 and txns.get("jv:b") == 1  # same commit

    # a table that is NOT a maintained join view (no watermarks) is loud
    rogue = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(1, 1, 1.0, 1, "b")],
                              "aid int, jk int, x double, bk int, tag string"),
        rogue,
    )
    with pytest.raises(RuntimeError, match="no jv:a/jv:b watermarks"):
        maintain_join_view(spark, rogue, a_dir, b_dir, ("jk", "bk"), "aid", "bid")


def test_rename_column_is_metadata_only_and_consistent(spark):
    """RENAME COLUMN across the full lifecycle: zero files rewritten,
    old files readable through the mapping, merge/delete/compact across
    the boundary, pre-rename time travel shows the old name, stats
    pruning still prunes, and a chained second rename works."""
    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(i, f"v{i}") for i in range(40)], "k int, val string"),
        t, cluster_by=["k"], n_files=4,
    )
    v2 = snap.rename_column(t, "val", "name")
    m2 = snap.read_manifest(t, v2)
    assert m2["files"] == snap.read_manifest(t, 1)["files"]  # zero rewrites
    # reads present the new name with old data intact
    got = {(r.k, r.name) for r in snap.read_snapshot(spark, t).collect()}
    assert got == {(i, f"v{i}") for i in range(40)}
    # time travel: pre-rename version shows the OLD name
    assert snap.read_snapshot(spark, t, version=1).columns == ["k", "val"]
    # merge across the boundary: only new-name schema accepted; rows
    # from OLD files must keep their values through the rewrite
    snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(3, "NEW3"), (100, "n100")], "k int, name string"),
        ["k"],
    )
    got = {r.k: r.name for r in snap.read_snapshot(spark, t).collect()}
    assert got[3] == "NEW3" and got[7] == "v7" and got[100] == "n100"
    # stats pruning on the merge key still prunes post-rename
    m = snap.read_manifest(t, snap.latest_version(t))
    assert m["pruned_by_stats"] > 0
    # delete + compact across the boundary
    snap.delete_where(spark, t, F.col("name") == "v5")
    snap.compact_small(spark, t, min_file_bytes=1 << 30, target_files=2)
    got = {r.k: r.name for r in snap.read_snapshot(spark, t).collect()}
    assert 5 not in got and got[7] == "v7" and len(got) == 40
    # chained rename
    snap.rename_column(t, "name", "title")
    got = {r.k: r.title for r in snap.read_snapshot(spark, t).collect()}
    assert got[7] == "v7" and got[3] == "NEW3"
    # key_range read through two renames still correct + pruned
    one = snap.read_snapshot(spark, t, key_range=("k", 7, 7)).collect()
    assert [(r.k, r.title) for r in one] == [(7, "v7")]


def test_rename_column_guards_and_diff_boundary(spark):
    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(1, 2.0)], "k int, x double"), t,
        constraints={"pos": "x > 0"},
    )
    with pytest.raises(ValueError, match="CHECK constraint"):
        snap.rename_column(t, "x", "y")
    with pytest.raises(ValueError, match="already exists"):
        snap.rename_column(t, "k", "x")
    with pytest.raises(ValueError, match="no column"):
        snap.rename_column(t, "zzz", "y")
    # unconstrained column renames fine; the feed refuses to span it
    v = snap.rename_column(t, "k", "id")
    with pytest.raises(ValueError, match="span a column rename"):
        snap.snapshot_diff(spark, t, 1, v)


def test_drop_column_no_resurrection(spark):
    """Dropping is metadata-only; a later re-added column of the same
    name must NOT resurrect the dead values from pre-drop files."""
    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(1, "old1"), (2, "old2")], "k int, note string"), t
    )
    v2 = snap.drop_column(t, "note")
    assert snap.read_snapshot(spark, t).columns == ["k"]
    assert snap.read_manifest(t, v2)["files"] == snap.read_manifest(t, 1)["files"]
    # time travel pre-drop still shows it
    assert {r.note for r in snap.read_snapshot(spark, t, version=1).collect()} == {"old1", "old2"}
    # re-add the name via evolve_schema merge: old rows read NULL, not old values
    snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(3, "fresh")], "k int, note string"),
        ["k"], evolve_schema=True,
    )
    got = {r.k: r.note for r in snap.read_snapshot(spark, t).collect()}
    assert got == {1: None, 2: None, 3: "fresh"}


def test_search_while_ingesting_prefix_consistent_and_isolated(spark, tmp_path):
    """The production search shape: queries run WHILE the corpus
    ingests. After every CDC drain, BM25 over the maintained index must
    equal BM25 over a from-scratch rebuild of the drained prefix (no
    stale postings, no lost updates mid-stream), and a reader PINNED to
    a pre-drain index version must keep seeing exactly the old postings
    while ingestion advances underneath it (snapshot isolation: search
    never reads a torn index)."""
    from ray_beam_runner_spark.functions.search import (
        build_token_index,
        doc_lengths,
        doc_postings,
        search_bm25,
        stream_maintain_token_index,
    )

    src, idx = _tdir(), _tdir()
    docs0 = spark.createDataFrame(
        [
            (1, "spark shuffles data across executors"),
            (2, "duck reads parquet"),
            (3, "spark reads parquet fast and scans parquet again"),
        ],
        "doc_id long, text string",
    )
    snap.write_snapshot(docs0, src, cluster_by=["doc_id"], n_files=2)
    build_token_index(docs0, idx, "doc_id", "text", n_files=2)

    def drain(ck):
        feed = snap.read_snapshot_stream(spark, src, starting_version=2)
        q = stream_maintain_token_index(feed, idx, "doc_id", "text", str(ck))
        assert q.awaitTermination(120)

    def bm25_maintained():
        ldir = _tdir()
        snap.write_snapshot(
            doc_lengths(snap.read_snapshot(spark, src), "doc_id", "text"), ldir
        )
        return [
            (r.doc_id, r.score, r.rank)
            for r in search_bm25(
                spark, idx, ldir, ["spark", "parquet"], "doc_id", topk=5
            ).collect()
        ]

    def bm25_rebuilt():
        ridx, ldir = _tdir(), _tdir()
        cur = snap.read_snapshot(spark, src)
        build_token_index(cur, ridx, "doc_id", "text")
        snap.write_snapshot(doc_lengths(cur, "doc_id", "text"), ldir)
        return [
            (r.doc_id, r.score, r.rank)
            for r in search_bm25(
                spark, ridx, ldir, ["spark", "parquet"], "doc_id", topk=5
            ).collect()
        ]

    batches = [
        # update 2 (gains 'spark'), insert 4 & 5
        lambda: snap.upsert_snapshot(
            spark, src,
            spark.createDataFrame(
                [
                    (2, "duck and spark both read parquet"),
                    (4, "spark spark spark tuning"),
                    (5, "unrelated prose entirely"),
                ],
                "doc_id long, text string",
            ),
            ["doc_id"], cdc=True,
        ),
        # delete 1, insert 6 (parquet-heavy)
        lambda: (
            snap.delete_where(spark, src, F.col("doc_id") == 1, cdc=True),
            snap.upsert_snapshot(
                spark, src,
                spark.createDataFrame(
                    [(6, "parquet parquet parquet footers")], "doc_id long, text string"
                ),
                ["doc_id"], cdc=True,
            ),
        ),
        # update 4 (loses 'spark' entirely — its postings must retract)
        lambda: snap.upsert_snapshot(
            spark, src,
            spark.createDataFrame([(4, "nothing relevant here")],
                                  "doc_id long, text string"),
            ["doc_id"], cdc=True,
        ),
    ]
    pinned_version = None
    pinned_expected = None
    for i, ingest in enumerate(batches):
        ingest()
        drain(tmp_path / "ck")
        got, want = bm25_maintained(), bm25_rebuilt()
        assert got == want and got, f"prefix {i}: {got} != {want}"
        if i == 0:
            # pin this index version; later drains must not disturb it
            pinned_version = snap.latest_version(idx)
            pinned_expected = sorted(
                map(tuple, snap.read_snapshot(spark, idx).collect())
            )
    assert pinned_version is not None
    pinned_now = sorted(
        map(tuple, snap.read_snapshot(spark, idx, version=pinned_version).collect())
    )
    assert pinned_now == pinned_expected
    # and the final maintained index equals a full rebuild, postings-level
    maintained = sorted(map(tuple, snap.read_snapshot(spark, idx).collect()))
    rebuilt = sorted(map(tuple, doc_postings(
        snap.read_snapshot(spark, src), "doc_id", "text"
    ).collect()))
    assert maintained == rebuilt


def test_delete_tag_also_clears_legacy_entry(spark):
    """Regression (round-10 advisor): a pre-round-10 table whose tag
    lived in the legacy single tags.json and was later re-tagged (per-
    tag file) must have BOTH entries removed on delete_tag — otherwise
    the stale legacy entry resurrects (resolve_tag returns the old
    version, vacuum keeps pinning it)."""
    import json

    from ray_beam_runner_spark.sources.snapshots import (
        _MANIFEST_DIR,
        delete_tag,
        resolve_tag,
        tag_snapshot,
    )

    t = _tdir()
    snap.write_snapshot(spark.createDataFrame([(1, "v1")], "k int, s string"), t)
    snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(1, "v2")], "k int, s string"), ["k"]
    )
    # simulate the legacy layout: tag "release" -> v1 in tags.json
    with open(os.path.join(t, _MANIFEST_DIR, "tags.json"), "w") as f:
        json.dump({"release": 1}, f)
    assert resolve_tag(t, "release") == 1
    # re-tag via the current per-tag-file path, then delete
    tag_snapshot(t, "release", version=2)
    assert resolve_tag(t, "release") == 2
    delete_tag(t, "release")
    # the legacy entry must NOT resurrect the tag
    with pytest.raises(KeyError, match="unknown tag"):
        resolve_tag(t, "release")
    # and vacuum no longer pins v1
    snap.vacuum(t, keep_last=1, orphan_ttl_seconds=0)
    with pytest.raises(FileNotFoundError):
        snap.read_manifest(t, 1)


def test_vacuum_refuses_unreadable_tag_file(spark):
    """Regression (round-10 advisor): vacuum consumes the tag set
    DESTRUCTIVELY — a tag file that exists but can't be parsed must
    abort the vacuum (raise), never be skipped as 'untagged', or a
    transient read blip deletes a pinned release's data files. Read
    paths (resolve_tag) keep the lenient skip."""
    from ray_beam_runner_spark.sources.snapshots import (
        _tag_file,
        resolve_tag,
        tag_snapshot,
    )

    t = _tdir()
    snap.write_snapshot(spark.createDataFrame([(1, "v1")], "k int, s string"), t)
    tag_snapshot(t, "pinned")
    snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(1, "v2")], "k int, s string"), ["k"]
    )
    # corrupt the tag file in place (parse error, not FileNotFound)
    with open(_tag_file(t, "pinned"), "w") as f:
        f.write("{not json")
    with pytest.raises(RuntimeError, match="unreadable tag"):
        snap.vacuum(t, keep_last=1, orphan_ttl_seconds=0)
    # nothing was deleted: v1 is still readable
    assert {r.s for r in snap.read_snapshot(spark, t, version=1).collect()} == {"v1"}
    # lenient read path skips the bad file instead of raising
    with pytest.raises(KeyError, match="unknown tag"):
        resolve_tag(t, "pinned")


def test_merge_when_not_matched_by_source(spark):
    """WHEN NOT MATCHED BY SOURCE (Delta 2.3+/SQL:2023): the full-sync
    merge — matched rows update, new rows insert, rows absent from the
    source delete (or get flagged via UPDATE SET). Conditions see t.*
    only; delete wins over update; key-span pruning is disabled for
    these merges (every target row must test source membership)."""
    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame(
            [(i, f"v{i}", "live") for i in range(1, 7)],
            "k int, val string, status string",
        ),
        t, cluster_by=["k"], n_files=3,
    )
    src = spark.createDataFrame(
        [(2, "v2-new", "live"), (3, "v3", "live"), (7, "v7", "live")],
        "k int, val string, status string",
    )
    # full sync: delete every target row the source no longer carries
    snap.merge_into(
        spark, t, src, ["k"], not_matched_by_source_delete=True, cdc=True
    )
    got = sorted((r.k, r.val) for r in snap.read_snapshot(spark, t).collect())
    assert got == [(2, "v2-new"), (3, "v3"), (7, "v7")]
    # CDC nets the sync: disappeared keys are pure deletes
    d = snap.snapshot_diff(spark, t, 1, 2)
    dels = {r.k for r in d.filter("_change = 'delete'").collect()}
    assert {1, 4, 5, 6} <= dels

    # soft-delete variant: flag orphans instead of removing them,
    # gated by a t.* condition
    t2 = _tdir()
    snap.write_snapshot(
        spark.createDataFrame(
            [(1, 10, "live"), (2, 20, "live"), (3, 30, "archived")],
            "k int, n int, status string",
        ),
        t2,
    )
    snap.merge_into(
        spark, t2,
        spark.createDataFrame([(1, 11, "live")], "k int, n int, status string"),
        ["k"],
        not_matched_by_source_set={"status": "'stale'", "n": "t.n + 1000"},
        not_matched_by_source_condition="t.status = 'live'",
    )
    got2 = {r.k: (r.n, r.status) for r in snap.read_snapshot(spark, t2).collect()}
    assert got2 == {
        1: (11, "live"),        # matched: replaced by source
        2: (1020, "stale"),     # orphan, condition true: flagged
        3: (30, "archived"),    # orphan, condition false: untouched
    }

    # delete wins over update when both clauses are present
    t3 = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), t3
    )
    snap.merge_into(
        spark, t3,
        spark.createDataFrame([(1, "a2")], "k int, v string"), ["k"],
        not_matched_by_source_delete="t.k = 2",
        not_matched_by_source_set={"v": "'flagged'"},
    )
    assert {(r.k, r.v) for r in snap.read_snapshot(spark, t3).collect()} == {
        (1, "a2")
    }
    # guards: SET cannot target keys or unknown columns
    import pytest

    with pytest.raises(ValueError, match="non-key table columns"):
        snap.merge_into(
            spark, t3, spark.createDataFrame([(1, "x")], "k int, v string"),
            ["k"], not_matched_by_source_set={"k": "t.k + 1"},
        )


def test_shallow_clone_lifecycle(spark):
    """clone_snapshot: zero-copy branch of a source snapshot —
    divergent merges rewrite only into the clone, the source is
    byte-for-byte untouched, carried DVs keep applying, the clone's
    vacuum can never delete source files, DV-mode writes are rejected
    until compact materializes the clone, and compact cuts the source
    dependency entirely."""
    import os

    from ray_beam_runner_spark.sources.snapshots import clone_snapshot

    src = _tdir()
    snap.write_snapshot(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(1, 9)], "k int, val string"
        ),
        src, cluster_by=["k"], n_files=2,
    )
    # a DV tombstone in the source must carry into the clone
    snap.delete_keys(
        spark, src, spark.createDataFrame([(8,)], "k int"), ["k"], dv=True
    )
    src_files = {
        os.path.join(r, f)
        for r, _, fs in os.walk(src) for f in fs
    }
    src_mtimes = {p: os.path.getmtime(p) for p in src_files}

    dst = _tdir()
    clone_snapshot(src, dst)
    m = snap.read_manifest(dst, 1)
    assert m["op"] == "clone" and all(os.path.isabs(f) for f in m["files"])
    got = sorted((r.k, r.val) for r in snap.read_snapshot(spark, dst).collect())
    assert got == [(i, f"v{i}") for i in range(1, 8)]  # DV applied (8 dead)

    # diverge the clone; the source must be untouched, byte for byte
    snap.upsert_snapshot(
        spark, dst,
        spark.createDataFrame([(2, "branched"), (9, "new")], "k int, val string"),
        ["k"],
    )
    got_dst = {r.k: r.val for r in snap.read_snapshot(spark, dst).collect()}
    assert got_dst[2] == "branched" and got_dst[9] == "new" and got_dst[3] == "v3"
    got_src = {r.k: r.val for r in snap.read_snapshot(spark, src).collect()}
    assert got_src[2] == "v2" and 9 not in got_src
    assert {p: os.path.getmtime(p) for p in src_files} == src_mtimes
    # untouched source files remain referenced (absolute), touched ones local
    m2 = snap.read_manifest(dst, 2)
    assert any(os.path.isabs(f) for f in m2["files"])
    assert any(not os.path.isabs(f) for f in m2["files"])

    # DV-mode writes rejected while foreign refs remain
    import pytest

    with pytest.raises(ValueError, match="clone_snapshot"):
        snap.delete_keys(
            spark, dst, spark.createDataFrame([(3,)], "k int"), ["k"], dv=True
        )

    # the clone's vacuum never deletes source files
    snap.vacuum(dst, keep_last=1, orphan_ttl_seconds=0)
    assert all(os.path.exists(p) for p in src_files)
    assert {r.k for r in snap.read_snapshot(spark, dst).collect()} == set(
        range(1, 10)
    ) - {8}

    # compact materializes: no foreign refs, DV mode now works, and the
    # clone survives the source's deletion outright
    snap.compact(spark, dst, n_files=1)
    snap.vacuum(dst, keep_last=1, orphan_ttl_seconds=0)
    assert all(
        not os.path.isabs(f)
        for f in snap.read_manifest(dst, snap.latest_version(dst))["files"]
    )
    snap.delete_keys(
        spark, dst, spark.createDataFrame([(3,)], "k int"), ["k"], dv=True
    )
    import shutil

    shutil.rmtree(src)
    got_final = {r.k: r.val for r in snap.read_snapshot(spark, dst).collect()}
    assert set(got_final) == set(range(1, 10)) - {3, 8}
    assert got_final[2] == "branched"

    # cloning over an existing table is loud
    with pytest.raises(FileExistsError):
        clone_snapshot(dst, dst)


def test_maintain_table_policy(spark):
    """maintain_table runs exactly the repairs the manifest's health
    numbers justify: small-file tail -> compact_small; DV debt -> full
    compact; healthy -> no-op; vacuum riding along when asked."""
    from ray_beam_runner_spark.sources.snapshots import maintain_table

    # fragmented table: 12 tiny files
    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(i, f"v{i}") for i in range(60)], "k int, v string"),
        t, cluster_by=["k"], n_files=12,
    )
    rep = maintain_table(spark, t, small_file_bytes=1 << 20, max_small_files=8)
    assert rep["actions"] == ["compact_small"] and rep["small_files"] == 12
    n_after = len(snap.read_manifest(t, snap.latest_version(t))["files"])
    assert n_after < 12
    # now healthy under the same thresholds (files merged; count <= max)
    rep2 = maintain_table(spark, t, small_file_bytes=1 << 20, max_small_files=8)
    assert rep2["actions"] == []
    assert {r.k for r in snap.read_snapshot(spark, t).collect()} == set(range(60))

    # DV debt: delete 30 of 60 rows merge-on-read, then maintain
    snap.delete_where(spark, t, F.col("k") < 30, dv=True)
    rep3 = maintain_table(
        spark, t, small_file_bytes=1, max_small_files=999, max_dv_ratio=0.2,
        vacuum_keep_last=1, vacuum_orphan_ttl_seconds=0,
    )
    assert rep3["actions"] == ["compact", "vacuum"] and rep3["dv_ratio"] >= 0.2
    m = snap.read_manifest(t, snap.latest_version(t))
    assert not m.get("file_dvs")  # debt paid down
    assert {r.k for r in snap.read_snapshot(spark, t).collect()} == set(range(30, 60))
    # vacuum pruned history down to keep_last
    import pytest

    with pytest.raises(FileNotFoundError):
        snap.read_manifest(t, 1)


def test_maintain_table_dv_ratio_skipped_on_legacy_row_accounting(spark):
    """Round-11 advice (low): a live file with no file_rows entry counts
    0 in the DV-ratio denominator while its tombstones still count in
    the numerator — the overstated ratio (>1.0 possible) must NOT
    trigger a premature full compact; skip the trigger instead (same
    None discipline as snapshot_rows)."""
    from ray_beam_runner_spark.sources.snapshots import (
        _manifest_path, maintain_table,
    )

    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(i, f"v{i}") for i in range(40)], "k int, v string"),
        t, cluster_by=["k"], n_files=2,
    )
    snap.delete_where(spark, t, F.col("k") < 10, dv=True)
    v = snap.latest_version(t)
    m = snap.read_manifest(t, v)
    # simulate a legacy file predating row accounting
    dropped = next(iter(m["file_rows"]))
    del m["file_rows"][dropped]
    import json as _json
    with open(_manifest_path(t, v), "w") as f:
        _json.dump(m, f)
    rep = maintain_table(
        spark, t, small_file_bytes=1, max_small_files=999, max_dv_ratio=0.2,
    )
    assert "compact" not in rep["actions"]
    assert rep["dv_ratio"] == 0.0  # unknown, not overstated


def test_update_where_semantics(spark):
    """UPDATE ... SET ... WHERE: pre-image simultaneous assignment,
    NULL predicate keeps rows, type discipline (results cast to the
    column's recorded type), file-pruned rewrite, CHECK re-validation,
    CDC delete+insert pairs, replay idempotency."""
    from ray_beam_runner_spark.sources.snapshots import update_where

    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame(
            [(1, 10, 20, "x"), (2, 30, 40, "y"), (3, None, 5, "x")],
            "k int, a int, b int, tag string",
        ),
        t, cluster_by=["k"], n_files=3, constraints={"b_pos": "b > 0"},
    )
    # simultaneous assignment: swap a and b where tag = 'x'; the NULL-a
    # row swaps too (predicate on tag, not a)
    update_where(spark, t, {"a": "b", "b": "a"}, "tag = 'x'", cdc=True)
    got = {r.k: (r.a, r.b) for r in snap.read_snapshot(spark, t).collect()}
    assert got == {1: (20, 10), 2: (30, 40), 3: (5, None)}
    # NULL predicate rows kept untouched
    update_where(spark, t, {"b": "b * 100"}, "a > 25")  # a NULL on k=3 -> kept
    got2 = {r.k: r.b for r in snap.read_snapshot(spark, t).collect()}
    assert got2 == {1: 10, 2: 4000, 3: None}
    # file pruning: only files containing matches rewrote
    m = snap.read_manifest(t, snap.latest_version(t))
    assert len(m["rewrote"]) < len(snap.read_manifest(t, 1)["files"])
    # type discipline: int column stays int even when the expr widens
    update_where(spark, t, {"b": "CAST(b AS BIGINT) + 1"}, "k = 1")
    assert dict(snap.read_snapshot(spark, t).dtypes)["b"] == "int"
    # CHECK constraints re-validated on post-images
    with pytest.raises(ValueError, match="b_pos"):
        update_where(spark, t, {"b": "-b"}, "k = 2")
    # CDC carries delete+insert pairs of the matched rows only
    d = snap.snapshot_diff(spark, t, 1, 2)
    ch = {(r.k, r.a, r.b, r._change) for r in d.collect()}
    assert (1, 10, 20, "delete") in ch and (1, 20, 10, "insert") in ch
    assert (3, None, 5, "delete") in ch and (3, 5, None, "insert") in ch
    assert not any(k == 2 for k, *_ in ch)
    # unknown SET target and empty SET are loud; no-match is a no-op
    with pytest.raises(ValueError, match="SET targets"):
        update_where(spark, t, {"nope": "1"}, "k = 1")
    with pytest.raises(ValueError, match="empty SET"):
        update_where(spark, t, {}, "k = 1")
    v = snap.latest_version(t)
    assert update_where(spark, t, {"b": "b"}, "k = 999") == v
    # replayed txn is a manifest-detected no-op
    update_where(spark, t, {"b": "b + 1"}, "k = 1", txn_app="u", txn_version=7)
    v2 = snap.latest_version(t)
    assert update_where(spark, t, {"b": "b + 1"}, "k = 1", txn_app="u", txn_version=7) == v2


def test_update_where_check_validates_when_set_changes_predicate_column(spark):
    """Round-11 advice (high): CHECK validation must run on the rows the
    predicate hit on the PRE-image. Re-evaluating the WHERE on the
    post-image misses every row whose SET changed a predicate column
    (the common 'SET status = done WHERE status = open' shape), letting
    constraint-violating data commit silently."""
    from ray_beam_runner_spark.sources.snapshots import update_where

    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(1, 1), (2, 10)], "k int, v int"),
        t, cluster_by=["k"], constraints={"v_pos": "v > 0"},
    )
    # SET targets the predicate column itself: post-image rows no longer
    # satisfy 'v = 10', yet they MUST be validated — and must fail v > 0
    with pytest.raises(ValueError, match="v_pos"):
        update_where(spark, t, {"v": "-5"}, "v = 10")
    got = {r.k: r.v for r in snap.read_snapshot(spark, t).collect()}
    assert got == {1: 1, 2: 10}  # nothing committed
    # a legal SET on the predicate column still works, and the CDC
    # matched set is the pre-image hit (not a post-image re-eval)
    update_where(spark, t, {"v": "99"}, "v = 10", cdc=True)
    got = {r.k: r.v for r in snap.read_snapshot(spark, t).collect()}
    assert got == {1: 1, 2: 99}
    d = snap.snapshot_diff(spark, t, 1, 2)
    ch = {(r.k, r.v, r._change) for r in d.collect()}
    assert ch == {(2, 10, "delete"), (2, 99, "insert")}


def test_point_in_batch_lookup_prunes_and_matches(spark):
    """point_in=(col, values): the batch point-lookup plan. Exactness
    (never a false negative across stats + bloom pruning), file
    pruning vs a full scan, null rejection, empty list, and the
    one-probe-job contract (values probed together)."""
    t = _tdir()
    rows = [(i, f"tag-{i * 7 % 60}") for i in range(240)]
    snap.write_snapshot(
        spark.createDataFrame(rows, "k int, tag string"),
        t, cluster_by=["k"], n_files=8, bloom_for=["tag"],
    )
    total = len(snap.read_manifest(t, 1)["files"])
    vals = ["tag-3", "tag-17", "no-such-tag"]
    df = snap.read_snapshot(spark, t, point_in=("tag", vals))
    got = sorted(r.k for r in df.collect())
    assert got == sorted(i for i in range(240) if f"tag-{i * 7 % 60}" in set(vals))
    # all-absent values: (whp) zero files open, always zero rows
    miss = snap.read_snapshot(spark, t, point_in=("tag", ["nope-1", "nope-2"]))
    assert miss.count() == 0 and len(miss.inputFiles()) < total
    # stats pruning on the CLUSTERED column: a narrow key batch reads a
    # strict subset of files even without a bloom on k
    kb = snap.read_snapshot(spark, t, point_in=("k", [2, 3, 5]))
    assert sorted(r.k for r in kb.collect()) == [2, 3, 5]
    assert len(kb.inputFiles()) < total
    # empty list: empty result, schema intact
    assert snap.read_snapshot(spark, t, point_in=("tag", [])).count() == 0
    with pytest.raises(ValueError, match="non-null"):
        snap.read_snapshot(spark, t, point_in=("tag", ["x", None]))


def test_point_in_on_format2_is_selective(spark, monkeypatch):
    """On a tiered-manifest table a point_in probe must use the
    rel-filtered selective bloom read, never full hydration."""
    t = _tdir()
    rows = [(i, i * 10, f"s{i}") for i in range(240)]
    snap.write_snapshot(
        spark.createDataFrame(rows, "k int, v int, s string"),
        t, cluster_by=["k"], n_files=24, stats_for=["k", "v"],
        bloom_for=["v"], meta_inline_max=4,
    )

    def _boom(self):
        raise AssertionError("point_in hydrated the FULL bloom column")

    monkeypatch.setattr(snap._LazyManifest, "_hydrate_blooms", _boom)
    got = sorted(
        r.k for r in snap.read_snapshot(spark, t, point_in=("v", [70, 1550])).collect()
    )
    assert got == [7, 155]


def test_point_in_large_batch_bounded_plans(spark):
    """A 2000-key point_in batch must still resolve correctly — the
    probe projection is built in bounded 256-value chunks so a huge
    IN-list cannot emit a len(values)*(k+1)-expression plan that blows
    codegen / constant-pool limits (round-13 ADVICE)."""
    t = _tdir()
    rows = [(i, f"tag-{i}") for i in range(300)]
    snap.write_snapshot(
        spark.createDataFrame(rows, "k int, tag string"),
        t, cluster_by=["k"], n_files=8, bloom_for=["tag"],
    )
    # 2000 probes: 290 present, 1710 absent -> 8 bounded probe jobs
    vals = [f"tag-{i}" for i in range(10, 2000)]
    df = snap.read_snapshot(spark, t, point_in=("tag", vals))
    assert sorted(r.k for r in df.collect()) == list(range(10, 300))
    # the chunker itself: per-value probes line up with one-at-a-time
    many = snap._bloom_probe_many(spark, vals[:600], "string", 1024, 3)
    assert len(many) == 600
    assert many[0] == snap._bloom_probe(spark, vals[0], "string", 1024, 3)
    assert many[599] == snap._bloom_probe(spark, vals[599], "string", 1024, 3)
