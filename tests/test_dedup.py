"""Dedup operator unit tests beyond the oracle queries: SimHash banding
recall, hot-shingle cap behavior, exact-dedup survivors."""

import pytest
from pyspark.sql import functions as F

from ray_beam_runner_spark.functions.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "completely different content about spark engines here"),
        (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (4, "THE  QUICK   brown fox jumps over the lazy dog"),  # normalizes to 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_normalized(docs):
    out = {r.doc_id: r.n_copies for r in exact_dedup(docs, "text", "doc_id").collect()}
    # 0,3,4 collapse (min id 0 survives); 1 and 2 stand alone
    assert out == {0: 3, 1: 1, 2: 1}


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {(r.d1, r.d2) for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()}
    assert (0, 1) in pairs  # one-word difference
    assert (0, 3) in pairs and (0, 4) in pairs and (3, 4) in pairs  # exact dups: J=1
    assert not any(2 in p for p in pairs)


def test_hot_shingle_cap_is_conservative(docs):
    full = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    capped = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5, max_doc_freq=2)
    # dropping hot shingles can only remove pairs, never invent them
    f = {(r.d1, r.d2) for r in full.collect()}
    c = {(r.d1, r.d2) for r in capped.collect()}
    assert c <= f


def test_minhash_lsh_equals_exact(docs):
    exact = {(r.d1, r.d2, r.jaccard) for r in ngram_jaccard_pairs(docs, "doc_id", "text").collect()}
    # default (auto-sized) banding: recall-guaranteed at the threshold
    lsh = {(r.d1, r.d2, r.jaccard) for r in minhash_lsh_pairs(docs, "doc_id", "text").collect()}
    assert lsh == exact
    # explicit gapped-corpus banding still works as an opt-in
    sharp = {
        (r.d1, r.d2, r.jaccard)
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=64, rows_per_band=4
        ).collect()
    }
    assert sharp == exact


def test_lsh_banding_recall_guarantee():
    from ray_beam_runner_spark.functions.dedup import lsh_banding

    for t in (0.3, 0.5, 0.7, 0.8, 0.9):
        nh, r = lsh_banding(t)
        b = nh // r
        assert r >= 2  # r=1 candidate-precision collapse is never chosen
        assert 1 - (1 - t**r) ** b >= 1 - 1e-6  # detection AT the threshold
        assert nh <= 512
    with pytest.raises(ValueError):
        lsh_banding(0.05, max_hashes=64)  # budget too small must be loud
    with pytest.raises(ValueError):
        minhash_lsh_pairs(None, "id", "text", num_hashes=64)  # one without the other


def test_simhash_pairs_banding(docs):
    # exact dups must collide at hamming 0; banding must surface them
    pairs = {(r.d1, r.d2): r.hamming for r in simhash_pairs(docs, "doc_id", "text", max_hamming=3).collect()}
    assert pairs.get((0, 3)) == 0 and pairs.get((0, 4)) == 0 and pairs.get((3, 4)) == 0
    assert all(h <= 3 for h in pairs.values())
