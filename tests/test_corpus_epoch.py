"""Cascade READ EPOCHS (round-11 verdict ask #2): each maintained view
is individually snapshot-isolated, but a query that JOINS two views
(hybrid BM25+ANN, token index × aggregate) could see one view
post-drain and another pre-drain. drain_corpus_views now records the
version vector of every view in the state table's manifest;
read_corpus pins every view to one recorded vector — a reader can
never observe a torn cascade, even mid-drain."""

import tempfile

import pytest
from pyspark.sql import functions as F

from ray_beam_runner_spark.corpus import (
    drain_corpus_views,
    init_corpus_views,
    latest_corpus_epoch,
    read_corpus,
    refresh_corpus_state,
)
from ray_beam_runner_spark.sources import snapshots as snap

GOOD = (
    "the quick brown fox jumps over a lazy dog while the rain in spain "
    "stays mainly on the plain and a cat naps"
)


def _mkdir():
    return tempfile.mkdtemp(prefix="rbrs_epoch_")


def _rows(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


@pytest.fixture(scope="module")
def cascade(spark):
    src, state, work = _mkdir(), _mkdir(), _mkdir()
    snap.write_snapshot(
        _rows(spark, [(i, f"src{i % 2}", f"{GOOD} group {i}") for i in range(1, 7)]),
        src, cluster_by=["doc_id"], n_files=2,
    )
    refresh_corpus_state(spark, src, state)
    layout = init_corpus_views(spark, state, work)
    e1 = drain_corpus_views(spark, layout)
    return {"src": src, "state": state, "layout": layout, "e1": e1}


def test_epoch_recorded_in_state_manifest(spark, cascade):
    e = latest_corpus_epoch(cascade["state"])
    assert e is not None and set(e) >= {"state", "agg", "idx", "ann", "lsh"}
    assert e == cascade["e1"]
    # the record is a metadata-only commit: shares every file with its
    # parent, so the change feed across it is empty
    v = snap.latest_version(cascade["state"])
    m = snap.read_manifest(cascade["state"], v)
    assert m["op"] == "epoch"
    parent = snap.read_manifest(cascade["state"], v - 1)
    assert m["files"] == parent["files"]


def test_reader_never_sees_a_torn_cascade_mid_drain(spark, cascade):
    """Simulate the torn window the epoch closes: advance the state and
    drain ONLY the token index (exactly what a reader racing a drain
    observes between two maintainer stages). An epoch-pinned read must
    return the PRE-drain version of BOTH the token index and the ANN
    index — one vector, never a mix."""
    from ray_beam_runner_spark.corpus import corpus_feed
    from ray_beam_runner_spark.functions.search import stream_maintain_token_index

    layout = cascade["layout"]
    e1 = latest_corpus_epoch(cascade["state"])
    idx_v_before = snap.latest_version(layout["idx"])
    pinned_docs = {
        r.doc_id for r in read_corpus(spark, layout)["idx"].select("doc_id").distinct().collect()
    }
    # new doc lands in the state...
    snap.upsert_snapshot(
        spark, cascade["src"],
        _rows(spark, [(99, "src0", f"{GOOD} middrain epochword")]),
        ["doc_id"], cdc=True,
    )
    refresh_corpus_state(spark, cascade["src"], cascade["state"])
    # ...and ONLY the token-index maintainer has run so far (mid-drain)
    q = stream_maintain_token_index(
        corpus_feed(spark, cascade["state"], starting_version=layout["from_version"]),
        layout["idx"], "doc_id", "text", layout["ckpt_idx"], app_id="corpus:idx",
    )
    q.awaitTermination(300)
    assert snap.latest_version(layout["idx"]) > idx_v_before  # live idx advanced
    # the epoch-pinned reader still sees the PRE-drain cascade, whole
    c = read_corpus(spark, layout)
    assert c["epoch"] == e1
    got_docs = {r.doc_id for r in c["idx"].select("doc_id").distinct().collect()}
    assert got_docs == pinned_docs and 99 not in got_docs
    assert 99 not in {r.doc_id for r in c["ann"].collect()}
    assert 99 not in {r.doc_id for r in c["state"].collect()}
    # finishing the drain publishes the NEXT epoch; the reader moves as
    # one — token index AND ann now both contain the doc
    e2 = drain_corpus_views(spark, layout)
    assert e2 != e1 and e2["idx"] > e1["idx"] and e2["ann"] > e1["ann"]
    c2 = read_corpus(spark, layout)
    assert 99 in {r.doc_id for r in c2["idx"].select("doc_id").collect()}
    assert 99 in {r.doc_id for r in c2["ann"].collect()}
    # and the OLD vector remains replayable (audit / reproduction)
    c_old = read_corpus(spark, layout, epoch=e1)
    assert 99 not in {r.doc_id for r in c_old["idx"].select("doc_id").collect()}


def test_hybrid_join_through_one_epoch_is_consistent(spark, cascade):
    """The motivating query shape: BM25 over the token index joined
    with the per-source aggregate view, read through one epoch — the
    join's doc ids must all exist in the SAME epoch's state (no doc
    ranked by a newer index than the aggregate that counts it)."""
    layout = cascade["layout"]
    c = read_corpus(spark, layout)
    state_ids = {r.doc_id for r in c["state"].filter("is_canon").collect()}
    idx_ids = {r.doc_id for r in c["idx"].select("doc_id").distinct().collect()}
    assert idx_ids <= state_ids
    # aggregate totals equal the SAME epoch's state aggregation
    agg = {(r.source): r.cnt for r in c["agg"].collect()}
    want = {
        r.source: r.cnt
        for r in c["state"].filter("is_canon").groupBy("source").agg(
            F.count("*").alias("cnt")
        ).collect()
    }
    assert agg == want


def test_epoch_pinned_ann_survives_quantizer_refit(spark, cascade):
    """An epoch-pinned ANN read must stay generation-consistent across
    refit_corpus_ann: load_ivfpq(index_version=epoch['ann']) resolves
    the quantizer through THAT version's pins, never the post-refit
    live generation."""
    from ray_beam_runner_spark.corpus import refit_corpus_ann
    from ray_beam_runner_spark.functions.clustering import load_ivfpq

    layout = cascade["layout"]
    e = latest_corpus_epoch(cascade["state"])
    pinned_before = snap.read_manifest(layout["ann"], e["ann"]).get("txns", {})
    refit_corpus_ann(spark, layout)  # swaps quantizer + re-encodes
    live_pins = snap.read_manifest(
        layout["ann"], snap.latest_version(layout["ann"])
    ).get("txns", {})
    assert live_pins["ann:coarse"] > pinned_before["ann:coarse"]
    coarse, books, index = load_ivfpq(
        spark, layout["coarse"], layout["books"], layout["ann"],
        index_version=e["ann"],
    )
    # the pinned triple is the OLD generation, whole
    assert coarse.count() > 0 and books.count() > 0
    old_docs = {r.doc_id for r in index.select("doc_id").collect()}
    epoch_state_docs = {
        r.doc_id
        for r in snap.read_snapshot(
            spark, cascade["state"], version=e["state"]
        ).filter("is_canon").collect()
    }
    assert old_docs == epoch_state_docs


def test_corpus_hybrid_search_reads_one_epoch(spark, cascade):
    """corpus_hybrid_search: BM25 + IVF-PQ fused through ONE epoch.
    Pinned to an old vector it ranks exactly the docs of that epoch's
    state — a doc that joined the cascade later never appears — and
    the default (latest epoch) includes it."""
    from ray_beam_runner_spark.corpus import corpus_hybrid_search

    layout = cascade["layout"]
    # e1 predates doc 99 (added by the mid-drain test above)
    res_old = corpus_hybrid_search(
        spark, layout, ["epochword", "fox"], topk=10, epoch=cascade["e1"]
    )
    rows_old = res_old.collect()
    assert rows_old and all(r.doc_id != 99 for r in rows_old)
    assert [r.rank for r in rows_old] == list(range(1, len(rows_old) + 1))
    # latest epoch: doc 99 is canonical, contains 'epochword', and the
    # BM25 leg must surface it
    res_new = corpus_hybrid_search(spark, layout, ["epochword", "fox"], topk=10)
    assert any(r.doc_id == 99 for r in res_new.collect())


def test_vacuum_corpus_retains_pinned_epochs(spark, cascade):
    """vacuum_corpus keeps the last K epochs readable end to end: the
    pinned versions of every view (and the state manifests carrying the
    vectors) survive, older history is reclaimed, and read_corpus of a
    DROPPED epoch fails loudly rather than reading wrong data."""
    from ray_beam_runner_spark.corpus import vacuum_corpus

    layout = cascade["layout"]
    e_latest = latest_corpus_epoch(cascade["state"])
    e_old = cascade["e1"]
    assert e_old != e_latest  # earlier tests advanced the cascade
    vacuum_corpus(layout, keep_epochs=1, keep_last=1, orphan_ttl_seconds=0)
    # the latest epoch reads whole...
    c = read_corpus(spark, layout)
    assert c["epoch"] == e_latest
    assert c["idx"].count() > 0 and c["ann"].count() > 0 and c["agg"].count() > 0
    # ...and the dropped one fails loudly (its manifests were reclaimed)
    with pytest.raises(FileNotFoundError):
        read_corpus(spark, layout, epoch=e_old)["state"].count()


def test_epoch_record_skips_bloom_hydration_on_format2(spark, monkeypatch):
    """Round-12 advice (low): record_corpus_epoch on a format-2 state
    table must not hydrate the full bloom column (O(table) JSON decode
    per drain) — the shard-backed keys are carried by reference and
    _externalize_meta strips them from the published header anyway."""
    from ray_beam_runner_spark.corpus import record_corpus_epoch

    t = _mkdir()
    snap.write_snapshot(
        spark.createDataFrame(
            [(i, i * 10, f"s{i}") for i in range(60)], "k int, v int, s string"
        ),
        t, cluster_by=["k"], n_files=6, bloom_for=["v"], meta_inline_max=4,
    )
    calls = []
    orig = snap._LazyManifest._hydrate_blooms
    monkeypatch.setattr(
        snap._LazyManifest, "_hydrate_blooms",
        lambda self: (calls.append(1), orig(self))[1],
    )
    vector = record_corpus_epoch(spark, {"state": t})
    assert not calls  # metadata-only commit never decoded the bloom column
    assert vector["state"] == 1 and snap.latest_version(t) == 2
    # the epoch commit preserved blooms: a point read still prunes/hits
    hit = {r.k for r in snap.read_snapshot(spark, t, point=("v", 550)).collect()}
    assert hit == {55}
