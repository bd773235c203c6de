"""Crash-injection for the composed corpus cascade: kill the pipeline
at every commit/drain seam and verify repair-on-restart converges to a
from-scratch batch recompute. The atomicity claims under test are the
ones corpus.py:24-41 makes — exactly the claims a 100 TB operator bets
on (reference analog: bundle retry/finalization semantics,
portability/execution.py:131-139).

Seams exercised:
  1. inside ``refresh_corpus_state``'s MERGE — data files written, crash
     BEFORE the manifest publish (the atomic commit point): the state
     must still read as the OLD version, and a re-run must converge;
  2. after the state commit but BEFORE any downstream drain;
  3. mid-drain BETWEEN maintainers (agg drained, token/ANN not);
  4. inside a downstream maintainer's MERGE (offsets written for the
     micro-batch, crash before its txn publishes) — restart replays the
     batch and applies it exactly once;
  5. after a maintainer's MERGE txn but BEFORE the streaming commit log
     records the batch (checkpoint commits/N deleted) — restart replays
     the batch and the (app, batch) txn makes it a no-op.

Every case ends with all five maintained tables (state + four views)
equal to independent batch recomputes."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from ray_beam_runner_spark.corpus import (
    corpus_enrich,
    drain_corpus_views,
    init_corpus_views,
    refresh_corpus_state,
    text_embedding,
)
from ray_beam_runner_spark.sources import snapshots as snap

GOOD = (
    "the quick brown fox jumps over a lazy dog while the rain in spain "
    "stays mainly on the plain and a cat naps"
)


def g(grp: int) -> str:
    return f"{GOOD} group {grp}"


def _mkdir():
    return tempfile.mkdtemp(prefix="rbrs_cfault_")


def _src_rows(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _build(spark):
    """Source v1 -> state -> views, drained clean. Returns dirs dict."""
    src, state, work = _mkdir(), _mkdir(), _mkdir()
    rows = [(i, f"src{i % 2}", g(i % 3)) for i in range(1, 8)]
    snap.write_snapshot(_src_rows(spark, rows), src, cluster_by=["doc_id"], n_files=2)
    refresh_corpus_state(spark, src, state)
    layout = init_corpus_views(spark, state, work)
    drain_corpus_views(spark, layout)
    return {"src": src, "state": state, "layout": layout}


def _commit_v2(spark, src):
    """A mixed commit: dup insert, unique insert, survivor delete."""
    snap.upsert_snapshot(
        spark, src,
        _src_rows(spark, [(8, "src1", g(1)), (9, "src0", GOOD + " fresh unique")]),
        ["doc_id"], cdc=True,
    )
    snap.delete_keys(
        spark, src, spark.createDataFrame([(1,)], "doc_id long"), ["doc_id"],
        cdc=True,
    )


def _assert_converged(spark, dirs):
    """All five maintained tables == independent batch recomputes."""
    from pyspark.sql import Window as W

    from ray_beam_runner_spark.functions.clustering import ivfpq_encode
    from ray_beam_runner_spark.functions.search import doc_postings

    layout = dirs["layout"]
    live = corpus_enrich(snap.read_snapshot(spark, dirs["src"])).filter(
        F.col("quality") >= 0.5
    )
    want_state = live.withColumn(
        "is_canon",
        F.row_number().over(W.partitionBy("fp").orderBy("doc_id")) == F.lit(1),
    )
    cols = ("doc_id", "source", "text", "fp", "n_tok", "quality", "is_canon")
    rows = lambda df, *c: {tuple(r) for r in df.select(*c).collect()}
    got_state = snap.read_snapshot(spark, dirs["state"])
    assert rows(got_state, *cols) == rows(want_state, *cols), "state diverged"

    canon = got_state.filter("is_canon")
    agg = snap.read_snapshot(spark, layout["agg"]).filter(F.col("cnt") > 0)
    want_agg = canon.groupBy("source").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n_tok").cast("long").alias("s"),
    )
    assert rows(
        agg.select("source", "cnt", F.col("sum_n_tok").cast("long").alias("s")),
        "source", "cnt", "s",
    ) == rows(want_agg, "source", "cnt", "s"), "aggregate view diverged"

    idx = snap.read_snapshot(spark, layout["idx"])
    want_idx = doc_postings(canon, "doc_id", "text")
    assert rows(idx, "token", "doc_id", "tf") == rows(
        want_idx, "token", "doc_id", "tf"
    ), "token index diverged"

    coarse = snap.read_snapshot(spark, layout["coarse"])
    books = snap.read_snapshot(spark, layout["books"])
    vecs = canon.select(
        "doc_id", text_embedding(F.col("text"), int(layout["emb_dim"])).alias("emb")
    )
    want_ann = ivfpq_encode(vecs, coarse, books, "doc_id", "emb")
    to_set = lambda df: {(r.doc_id, r.cell, tuple(r.codes)) for r in df.collect()}
    assert to_set(snap.read_snapshot(spark, layout["ann"])) == to_set(
        want_ann
    ), "ANN index diverged"

    from ray_beam_runner_spark.functions.dedup import lsh_index_buckets

    want_lsh = lsh_index_buckets(canon, "doc_id", "text", num_hashes=128, rows_per_band=4)
    assert rows(snap.read_snapshot(spark, layout["lsh"]), "doc_id", "sz", "bucket") == rows(
        want_lsh, "doc_id", "sz", "bucket"
    ), "LSH index diverged"


def _crash_publish_once(monkeypatch, target_dir: str):
    """Make the NEXT manifest publish on ``target_dir`` raise — data
    files are already on disk at that point, so this is precisely a
    crash between the write and the atomic commit."""
    real = snap._publish
    fired = {"done": False}

    def boom(table_dir, version, manifest):
        if os.path.abspath(table_dir) == os.path.abspath(target_dir) and not fired["done"]:
            fired["done"] = True
            raise RuntimeError("injected crash: power loss before manifest publish")
        return real(table_dir, version, manifest)

    monkeypatch.setattr(snap, "_publish", boom)
    return fired


def test_crash_inside_state_merge_then_rerun_converges(spark, monkeypatch):
    dirs = _build(spark)
    _commit_v2(spark, dirs["src"])
    v_before = snap.latest_version(dirs["state"])
    pre = {tuple(r) for r in snap.read_snapshot(spark, dirs["state"]).collect()}

    fired = _crash_publish_once(monkeypatch, dirs["state"])
    with pytest.raises(Exception, match="injected crash"):
        refresh_corpus_state(spark, dirs["src"], dirs["state"])
    assert fired["done"]
    # atomicity: the crash left the OLD state fully intact (manifest
    # never moved), not a half-applied refresh
    assert snap.latest_version(dirs["state"]) == v_before
    assert {tuple(r) for r in snap.read_snapshot(spark, dirs["state"]).collect()} == pre

    # restart: the re-run applies the same deltas once and converges
    monkeypatch.undo()
    refresh_corpus_state(spark, dirs["src"], dirs["state"])
    drain_corpus_views(spark, dirs["layout"])
    _assert_converged(spark, dirs)


def test_crash_between_state_commit_and_drains(spark):
    dirs = _build(spark)
    _commit_v2(spark, dirs["src"])
    refresh_corpus_state(spark, dirs["src"], dirs["state"])
    # "crash" here: the state moved, no view drained. Restart = drain.
    drain_corpus_views(spark, dirs["layout"])
    _assert_converged(spark, dirs)


def test_crash_between_maintainers_mid_drain(spark, monkeypatch):
    """Agg drains, then the token-index maintainer dies before starting;
    the restart must catch the token/ANN indexes up WITHOUT double-
    applying the already-drained agg deltas."""
    import ray_beam_runner_spark.functions.search as search_mod

    dirs = _build(spark)
    _commit_v2(spark, dirs["src"])
    refresh_corpus_state(spark, dirs["src"], dirs["state"])

    def boom(*a, **k):
        raise RuntimeError("injected crash between agg and token-index drains")

    monkeypatch.setattr(search_mod, "stream_maintain_token_index", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        drain_corpus_views(spark, dirs["layout"])
    monkeypatch.undo()
    drain_corpus_views(spark, dirs["layout"])
    _assert_converged(spark, dirs)


def test_crash_inside_maintainer_merge_replays_exactly_once(spark, monkeypatch):
    """The token-index maintainer's micro-batch MERGE dies after its
    data files are written but before its txn manifest publishes (the
    streaming offsets for the batch ARE written). Restart replays the
    batch; the MERGE applies exactly once."""
    dirs = _build(spark)
    _commit_v2(spark, dirs["src"])
    refresh_corpus_state(spark, dirs["src"], dirs["state"])

    fired = _crash_publish_once(monkeypatch, dirs["layout"]["idx"])
    with pytest.raises(Exception):  # surfaces as StreamingQueryException
        drain_corpus_views(spark, dirs["layout"])
    assert fired["done"], "injection never hit the token-index MERGE"
    monkeypatch.undo()
    drain_corpus_views(spark, dirs["layout"])
    _assert_converged(spark, dirs)


def test_checkpoint_commit_lost_after_merge_is_noop_replay(spark):
    """The other half of the torn two-phase boundary: the MERGE txn
    committed but the streaming commit log never recorded the batch
    (crash between them). Simulated by deleting the newest checkpoint
    commits/ entry after a clean drain: restart re-runs that batch and
    the (app, batch) txn id makes the replay a manifest-detected no-op
    — table version must NOT advance."""
    dirs = _build(spark)
    _commit_v2(spark, dirs["src"])
    refresh_corpus_state(spark, dirs["src"], dirs["state"])
    drain_corpus_views(spark, dirs["layout"])
    _assert_converged(spark, dirs)

    versions_before = {
        k: snap.latest_version(dirs["layout"][k]) for k in ("agg", "idx", "ann")
    }
    dropped = 0
    for ck in ("ckpt_agg", "ckpt_idx", "ckpt_ann"):
        cdir = os.path.join(dirs["layout"][ck], "commits")
        entries = sorted(
            e for e in os.listdir(cdir) if not e.startswith(".")
        )
        assert entries, f"no commits recorded under {cdir}"
        os.remove(os.path.join(cdir, entries[-1]))
        # the local ChecksumFs keeps a .N.crc sidecar; a stale one makes
        # the replayed commit's rename fail with FileAlreadyExists
        crc = os.path.join(cdir, f".{entries[-1]}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        dropped += 1
    assert dropped == 3
    drain_corpus_views(spark, dirs["layout"])  # replays the last batch of each
    versions_after = {
        k: snap.latest_version(dirs["layout"][k]) for k in ("agg", "idx", "ann")
    }
    assert versions_after == versions_before, (
        "a replayed micro-batch re-applied instead of deduping on its txn id"
    )
    _assert_converged(spark, dirs)
