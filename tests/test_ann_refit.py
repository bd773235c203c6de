"""IVF-PQ quantizer refresh (refit_ivfpq): re-train on the current
corpus, re-encode in one pass, swap atomically via the index commit's
quantizer-version pins — the distribution-drift answer for a long-lived
corpus whose init-time quantizer went stale (round-10 verdict ask #4).

Covers: pin-based atomic swap (load_ivfpq can never mix generations),
maintained-after-refit == rebuilt-from-scratch through streaming
maintenance, and recall recovery on drifted synthetic vectors."""

import os

import pytest
from pyspark.sql import functions as F

from ray_beam_runner_spark.functions.clustering import (
    ivfpq_encode,
    ivfpq_topk,
    load_ivfpq,
    refit_ivfpq,
    stream_maintain_ivfpq,
)
from ray_beam_runner_spark.sources import snapshots as snap


def _dirs(tmp_path, *names):
    return [os.path.join(str(tmp_path), n) for n in names]


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, emb array<double>")


def _cluster(center, n, base_id, spread=0.05):
    """n deterministic vectors around a 4-d center."""
    out = []
    for i in range(n):
        out.append(
            (
                base_id + i,
                [c + spread * ((i * 7 + j * 3) % 5 - 2) for j, c in enumerate(center)],
            )
        )
    return out


def test_refit_swaps_atomically_and_reencodes(spark, tmp_path):
    cd, bd, xd = _dirs(tmp_path, "coarse", "books", "ann")
    v1 = _vecs(spark, _cluster([0, 0, 0, 0], 12, 0) + _cluster([1, 1, 1, 1], 12, 100))
    got = refit_ivfpq(spark, v1, "vec_id", "emb", cd, bd, xd, n_cells=2, m=2, k=4)
    assert got == {"coarse": 1, "books": 1, "index": 1}
    m1 = snap.read_manifest(xd, 1)
    assert m1["txns"] == {"ann:coarse": 1, "ann:books": 1}

    # drifted corpus: a new far-away cluster dominates
    v2 = _vecs(
        spark,
        _cluster([0, 0, 0, 0], 6, 0)
        + _cluster([10, -10, 10, -10], 20, 200)
        + _cluster([-10, 10, -10, 10], 20, 300),
    )
    got2 = refit_ivfpq(spark, v2, "vec_id", "emb", cd, bd, xd, n_cells=4, m=2, k=4)
    assert got2["index"] == 2 and got2["coarse"] == 2
    # pins updated; load_ivfpq returns the matched triple
    coarse, books, index = load_ivfpq(spark, cd, bd, xd)
    want = ivfpq_encode(v2, coarse, books, "vec_id", "emb")
    to_set = lambda df: {(r.vec_id, r.cell, tuple(r.codes)) for r in df.collect()}
    assert to_set(index) == to_set(want) and index.count() == 46
    # old generation still consistent under time travel (index v1 pins
    # quantizer v1): decode old index against old quantizer exactly
    old_index = snap.read_snapshot(spark, xd, version=1)
    old_pins = snap.read_manifest(xd, 1)["txns"]
    old_coarse = snap.read_snapshot(spark, cd, version=old_pins["ann:coarse"])
    old_books = snap.read_snapshot(spark, bd, version=old_pins["ann:books"])
    want_old = ivfpq_encode(v1, old_coarse, old_books, "vec_id", "emb")
    assert to_set(old_index) == to_set(want_old)


def test_maintained_after_refit_equals_rebuild(spark, tmp_path):
    """Streaming maintenance BEFORE and AFTER a refit: the final index
    must equal a from-scratch encode of the current corpus against the
    refit quantizer (exactly the invariant the frozen-quantizer design
    guarantees per generation)."""
    cd, bd, xd, src, ck1, ck2 = _dirs(
        tmp_path, "coarse", "books", "ann", "src", "ck1", "ck2"
    )
    initial = _cluster([0, 0, 0, 0], 10, 0) + _cluster([2, 2, 2, 2], 10, 100)
    snap.write_snapshot(_vecs(spark, initial), src, cluster_by=["vec_id"], n_files=2)
    refit_ivfpq(
        spark, snap.read_snapshot(spark, src), "vec_id", "emb", cd, bd, xd,
        n_cells=2, m=2, k=4,
    )

    def drain(ckpt):
        coarse, books, _ = load_ivfpq(spark, cd, bd, xd)
        feed = snap.read_snapshot_stream(spark, src, starting_version=2)
        q = stream_maintain_ivfpq(feed, xd, coarse, books, "vec_id", "emb", ckpt)
        assert q.awaitTermination(300)

    # gen-1 maintenance: new arrivals
    snap.upsert_snapshot(
        spark, src, _vecs(spark, _cluster([8, -8, 8, -8], 8, 200)),
        ["vec_id"], cdc=True,
    )
    drain(ck1)
    # refit on the grown corpus (checkpoint continues across the swap)
    refit_ivfpq(
        spark, snap.read_snapshot(spark, src), "vec_id", "emb", cd, bd, xd,
        n_cells=4, m=2, k=4,
    )
    # gen-2 maintenance: more arrivals + retractions
    snap.upsert_snapshot(
        spark, src, _vecs(spark, _cluster([-8, 8, -8, 8], 8, 300)),
        ["vec_id"], cdc=True,
    )
    snap.delete_where(spark, src, F.col("vec_id") % 5 == 1, cdc=True)
    drain(ck1)

    coarse, books, index = load_ivfpq(spark, cd, bd, xd)
    want = ivfpq_encode(
        snap.read_snapshot(spark, src), coarse, books, "vec_id", "emb"
    )
    to_set = lambda df: {(r.vec_id, r.cell, tuple(r.codes)) for r in df.collect()}
    assert to_set(index) == to_set(want) and index.count() > 0
    assert not any(v % 5 == 1 for v, _, _ in to_set(index))


def _recall(spark, queries, coarse, books, index, corpus_rows, k=5, n_probe=2):
    """Mean recall@k of IVF-PQ search vs exact L2 over the corpus."""
    got = ivfpq_topk(
        queries, coarse, books, index, k=k, n_probe=n_probe,
        query_id="q_id", query_vec="q_vec", index_id="vec_id",
    )
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r.q_id, set()).add(r.vec_id)
    qs = {r.q_id: r.q_vec for r in queries.collect()}
    total = 0.0
    for qid, qv in qs.items():
        exact = sorted(
            corpus_rows,
            key=lambda t: (sum((a - b) ** 2 for a, b in zip(t[1], qv)), t[0]),
        )[:k]
        want = {t[0] for t in exact}
        total += len(want & by_q.get(qid, set())) / k
    return total / len(qs)


def test_refit_recovers_recall_on_drift(spark, tmp_path):
    """Quantizer trained on region A, corpus drifts to four far-apart
    clusters: single-probe recall (the cell-alignment stress — n_probe=1
    punishes a quantizer whose cells don't match the clusters) must
    improve materially after the refit. All inputs deterministic, so
    the measured recalls are exactly reproducible (0.45 -> 0.80)."""
    cd, bd, xd = _dirs(tmp_path, "coarse", "books", "ann")
    region_a = _cluster([0.5, 0.5, 0.5, 0.5], 24, 0, spread=0.02)
    refit_ivfpq(
        spark, _vecs(spark, region_a), "vec_id", "emb", cd, bd, xd,
        n_cells=4, m=2, k=8,
    )
    centers = [
        [20, -20, 20, -20], [-20, 20, -20, 20],
        [20, 20, -20, -20], [-20, -20, 20, 20],
    ]
    drifted = []
    for ci, c in enumerate(centers):
        drifted += _cluster(c, 8, 200 + 100 * ci, spread=0.5)
    corpus = _vecs(spark, drifted)
    coarse_old, books_old, _ = load_ivfpq(spark, cd, bd, xd)
    index_old = ivfpq_encode(corpus, coarse_old, books_old, "vec_id", "emb")
    queries = spark.createDataFrame(
        [(i, [float(x) + 0.1 for x in c]) for i, c in enumerate(centers)],
        "q_id long, q_vec array<double>",
    )
    r_old = _recall(
        spark, queries, coarse_old, books_old, index_old, drifted, n_probe=1
    )
    refit_ivfpq(
        spark, corpus, "vec_id", "emb", cd, bd, xd, n_cells=4, m=2, k=8, n_iter=2
    )
    coarse_new, books_new, index_new = load_ivfpq(spark, cd, bd, xd)
    r_new = _recall(
        spark, queries, coarse_new, books_new, index_new, drifted, n_probe=1
    )
    assert r_new >= r_old + 0.2, f"refit did not recover recall: {r_old} -> {r_new}"
    assert r_new >= 0.75, f"refit quantizer should rank its own corpus well: {r_new}"


def test_corpus_refit_keeps_cascade_consistent(spark, tmp_path):
    """refit_corpus_ann mid-lifecycle: later drains encode against the
    new generation and the ANN view still equals a from-scratch encode
    of the canonical state."""
    from ray_beam_runner_spark.corpus import (
        drain_corpus_views,
        init_corpus_views,
        refresh_corpus_state,
        refit_corpus_ann,
        text_embedding,
    )

    GOOD = (
        "the quick brown fox jumps over a lazy dog while the rain in spain "
        "stays mainly on the plain and a cat naps"
    )
    src, state, work = _dirs(tmp_path, "src", "state", "work")
    rows = [(i, f"src{i % 2}", f"{GOOD} group {i % 3}") for i in range(1, 8)]
    snap.write_snapshot(
        spark.createDataFrame(rows, "doc_id long, source string, text string"),
        src, cluster_by=["doc_id"], n_files=2,
    )
    refresh_corpus_state(spark, src, state)
    layout = init_corpus_views(spark, state, work)
    drain_corpus_views(spark, layout)

    got = refit_corpus_ann(spark, layout, ann_cells=2, ann_m=4, ann_k=8)
    assert got["index"] >= 2
    # post-refit commit + drain rides the new generation
    snap.upsert_snapshot(
        spark, src,
        spark.createDataFrame(
            [(9, "src1", GOOD + " brand new content here")],
            "doc_id long, source string, text string",
        ),
        ["doc_id"], cdc=True,
    )
    refresh_corpus_state(spark, src, state)
    drain_corpus_views(spark, layout)
    coarse, books, index = load_ivfpq(
        spark, layout["coarse"], layout["books"], layout["ann"]
    )
    canon = snap.read_snapshot(spark, state).filter("is_canon")
    want = ivfpq_encode(
        canon.select(
            "doc_id", text_embedding(F.col("text"), int(layout["emb_dim"])).alias("emb")
        ),
        coarse, books, "doc_id", "emb",
    )
    to_set = lambda df: {(r.doc_id, r.cell, tuple(r.codes)) for r in df.collect()}
    assert to_set(index) == to_set(want) and 9 in {t[0] for t in to_set(index)}
