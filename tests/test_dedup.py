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


def test_hamming_pairs_full_width_band(spark):
    """max_hamming=0 makes the single band the whole 64-bit word — the
    band value must be the full hash (no LongType-overflowing mask
    literal), so exact-hash pairs and ONLY exact-hash pairs surface.
    Covers signed hashes (bit 63 set) too."""
    from ray_beam_runner_spark.functions.dedup import hamming_pairs

    rows = [(1, -42), (2, -42), (3, -42 ^ 1), (4, 7), (5, 7)]
    df = spark.createDataFrame(rows, "id long, h long")
    pairs = {(r.d1, r.d2): r.hamming
             for r in hamming_pairs(df, "id", "h", max_hamming=0).collect()}
    assert pairs == {(1, 2): 0, (4, 5): 0}


# ---------------------------------------------------------------------------
# Substring-level span REMOVAL (Lee et al. 2022 rewrite step)
# ---------------------------------------------------------------------------


def _py_remove_spans(texts: dict, n: int, min_docs: int):
    """Independent pure-Python oracle for remove_repeated_spans: same
    normalization (lower, collapse whitespace, strip), word n-gram spans,
    hot = span in >= min_docs distinct docs, cut every covered token."""
    import re
    from collections import Counter

    toks = {i: re.sub(r"\s+", " ", t.lower()).strip().split(" ") for i, t in texts.items()}
    occ = {
        i: [(p, " ".join(w[p : p + n])) for p in range(len(w) - n + 1)]
        for i, w in toks.items()
    }
    dfreq = Counter()
    for i, os_ in occ.items():
        for g in {g for _, g in os_}:
            dfreq[g] += 1
    hot = {g for g, c in dfreq.items() if c >= min_docs}
    out = {}
    for i, w in toks.items():
        covered = set()
        for p, g in occ[i]:
            if g in hot:
                covered.update(range(p, p + n))
        kept = [(q, x) for q, x in enumerate(w) if q not in covered]
        out[i] = (len(w), len(kept), " ".join(x for _, x in kept), [q for q, _ in kept])
    return out, hot


def _random_corpus(seed: int, n_docs: int, vocab: int, max_len: int) -> dict:
    import random

    rng = random.Random(seed)
    words = [f"w{k}" for k in range(vocab)]
    # Seed shared boilerplate so hot spans actually occur.
    boiler = " ".join(rng.choices(words, k=rng.randint(3, 8)))
    docs = {}
    for i in range(n_docs):
        body = rng.choices(words, k=rng.randint(0, max_len))
        if rng.random() < 0.7:
            at = rng.randint(0, len(body))
            body = body[:at] + boiler.split(" ") + body[at:]
        docs[i] = " ".join(body)
    return docs


def test_remove_repeated_spans_cuts_boilerplate(spark):
    from ray_beam_runner_spark.functions.dedup import remove_repeated_spans

    rows = [
        (0, "alpha beta gamma unique zero tail"),
        (1, "intro one alpha beta gamma closing words"),
        (2, "totally unrelated text with nothing shared"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_repeated_spans(df, "doc_id", "text", n=3, min_docs=2).collect()}
    # "alpha beta gamma" appears in docs 0 and 1 -> hot; covered tokens cut.
    assert out[0].clean_text == "unique zero tail"
    assert out[1].clean_text == "intro one closing words"
    assert out[2].clean_text == "totally unrelated text with nothing shared"
    assert out[0].n_tok == 6 and out[0].n_kept == 3
    # surviving text contains no flagged span
    for r in out.values():
        assert "alpha beta gamma" not in r.clean_text


def test_remove_repeated_spans_differential(spark):
    """Spark output == independent Python oracle on randomized corpora
    (boilerplate-injected, empty docs, short docs, within-doc repeats)."""
    from ray_beam_runner_spark.functions.dedup import remove_repeated_spans

    for seed, n, min_docs in ((1, 3, 2), (2, 2, 2), (3, 4, 3), (4, 3, 2)):
        texts = _random_corpus(seed, n_docs=12, vocab=9, max_len=30)
        expect, _ = _py_remove_spans(texts, n, min_docs)
        df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
        got = {
            r.doc_id: (r.n_tok, r.n_kept, r.clean_text)
            for r in remove_repeated_spans(df, "doc_id", "text", n=n, min_docs=min_docs).collect()
        }
        assert got == {i: (a, b, c) for i, (a, b, c, _) in expect.items()}, f"seed={seed}"


def test_remove_repeated_spans_no_surviving_hot_window():
    """Property (hypothesis): after removal, NO original-contiguous window
    of n surviving tokens is a hot span — every such window was an
    occurrence and must have been covered. Pure-Python oracle side (the
    differential test pins Spark == oracle)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.integers(min_value=0, max_value=10_000),
        st.integers(min_value=2, max_value=4),
        st.integers(min_value=2, max_value=3),
    )
    @settings(max_examples=150, deadline=None)
    def run(seed, n, min_docs):
        import re

        texts = _random_corpus(seed, n_docs=8, vocab=6, max_len=20)
        out, hot = _py_remove_spans(texts, n, min_docs)
        for i, (_, _, _, kept_pos) in out.items():
            w = re.sub(r"\s+", " ", texts[i].lower()).strip().split(" ")
            # runs of original-consecutive kept positions
            for s in range(len(kept_pos) - n + 1):
                window = kept_pos[s : s + n]
                if window[-1] - window[0] == n - 1:  # contiguous originally
                    gram = " ".join(w[q] for q in window)
                    assert gram not in hot

    run()


def test_leakage_safe_split_never_straddles_pairs(spark):
    from ray_beam_runner_spark.functions.dedup import leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    # chains {0..3}, {10,11}, a big star {20..29}; rest singletons
    pair_rows = (
        [(0, 1), (1, 2), (2, 3), (10, 11)] + [(20, k) for k in range(21, 30)]
    )
    pairs = spark.createDataFrame(pair_rows, "d1 long, d2 long")
    out = leakage_safe_split(docs, pairs, id_col="doc_id", val_pct=30)
    rows = {r.doc_id: (r.cluster, r.split) for r in out.collect()}
    assert len(rows) == 200
    # every pair shares a side (the invariant the per-doc split breaks)
    for a, b in pair_rows:
        assert rows[a][1] == rows[b][1], (a, b)
        assert rows[a][0] == rows[b][0]
    # the split actually uses both sides and is cluster-deterministic
    assert {s for _, s in rows.values()} == {"train", "val"}
    again = {
        r.doc_id: (r.cluster, r.split)
        for r in leakage_safe_split(docs, pairs, id_col="doc_id", val_pct=30).collect()
    }
    assert again == rows


def test_lsh_index_maintained_equals_rebuild_and_pairs_exact(spark, tmp_path):
    """CDC-maintained LSH bucket index through insert/update/delete
    churn == lsh_index_buckets over the final corpus; pairs read from
    the maintained index == minhash_lsh_pairs on the same docs; a
    replayed drain is a no-op."""
    import os

    from ray_beam_runner_spark.functions.dedup import (
        lsh_index_buckets,
        lsh_pairs_from_index,
        minhash_lsh_pairs,
        stream_maintain_lsh_index,
    )
    from ray_beam_runner_spark.sources import snapshots as snap

    base = "the quick brown fox jumps over the lazy dog and then naps in the warm sun"
    rows = [(i, base + f" variant {i % 4}") for i in range(1, 13)]
    docs0 = spark.createDataFrame(rows, "doc_id long, text string")
    src = os.path.join(str(tmp_path), "src")
    idx = os.path.join(str(tmp_path), "idx")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    initial = docs0.filter(F.col("doc_id") % 3 != 0)
    snap.write_snapshot(initial, src, cluster_by=["doc_id"], n_files=2)
    snap.write_snapshot(
        lsh_index_buckets(initial, "doc_id", "text"),
        idx, cluster_by=["doc_id"], n_files=2,
    )

    def drain():
        feed = snap.read_snapshot_stream(spark, src, starting_version=2)
        q = stream_maintain_lsh_index(feed, idx, "doc_id", "text", ckpt)
        assert q.awaitTermination(180)

    # churn: insert the rest, update two texts, delete two docs
    snap.upsert_snapshot(
        spark, src, docs0.filter(F.col("doc_id") % 3 == 0), ["doc_id"], cdc=True
    )
    snap.upsert_snapshot(
        spark, src,
        spark.createDataFrame(
            [(2, base + " rewritten entirely different words now"),
             (5, base + " variant 0")],
            "doc_id long, text string",
        ),
        ["doc_id"], cdc=True,
    )
    snap.delete_keys(
        spark, src, spark.createDataFrame([(7,), (12,)], "doc_id long"),
        ["doc_id"], cdc=True,
    )
    drain()

    final_docs = snap.read_snapshot(spark, src)
    rows_set = lambda df: {tuple(r) for r in df.collect()}
    maintained = rows_set(snap.read_snapshot(spark, idx))
    rebuilt = rows_set(lsh_index_buckets(final_docs, "doc_id", "text"))
    assert maintained == rebuilt and maintained

    got_pairs = rows_set(
        lsh_pairs_from_index(
            snap.read_snapshot(spark, idx), final_docs, "doc_id", "text"
        )
    )
    want_pairs = rows_set(minhash_lsh_pairs(final_docs, "doc_id", "text"))
    assert got_pairs == want_pairs and got_pairs
    # deleted docs really retracted from the pair space
    assert not any(7 in (a, b) or 12 in (a, b) for a, b, _ in got_pairs)

    # replayed drain is a no-op (offsets consumed, txns dedupe)
    v = snap.latest_version(idx)
    drain()
    assert snap.latest_version(idx) == v


def test_lsh_maintainer_crash_inside_merge_replays_exactly_once(spark, tmp_path, monkeypatch):
    """Fault injection for the LSH maintainer (same discipline as the
    cascade's tests/test_corpus_faults.py): the micro-batch MERGE dies
    after its data files are written but BEFORE the manifest publish;
    restart replays the batch and applies it exactly once — the index
    still equals a batch rebuild."""
    import os

    import pytest

    from ray_beam_runner_spark.functions.dedup import (
        lsh_index_buckets,
        stream_maintain_lsh_index,
    )
    from ray_beam_runner_spark.sources import snapshots as snap

    base = "the quick brown fox jumps over the lazy dog and naps in warm sun"
    docs0 = spark.createDataFrame(
        [(i, base + f" variant {i % 3}") for i in range(1, 9)],
        "doc_id long, text string",
    )
    src = os.path.join(str(tmp_path), "src")
    idx = os.path.join(str(tmp_path), "idx")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    initial = docs0.filter(F.col("doc_id") % 2 != 0)
    snap.write_snapshot(initial, src, cluster_by=["doc_id"], n_files=2)
    snap.write_snapshot(
        lsh_index_buckets(initial, "doc_id", "text"), idx,
        cluster_by=["doc_id"], n_files=2,
    )
    snap.upsert_snapshot(
        spark, src, docs0.filter(F.col("doc_id") % 2 == 0), ["doc_id"], cdc=True
    )

    real = snap._publish
    fired = {"done": False}

    def boom(table_dir, version, manifest):
        if os.path.abspath(table_dir) == os.path.abspath(idx) and not fired["done"]:
            fired["done"] = True
            raise RuntimeError("injected crash before index manifest publish")
        return real(table_dir, version, manifest)

    monkeypatch.setattr(snap, "_publish", boom)

    def drain():
        feed = snap.read_snapshot_stream(spark, src, starting_version=2)
        q = stream_maintain_lsh_index(feed, idx, "doc_id", "text", ckpt)
        return q.awaitTermination(180)

    with pytest.raises(Exception):  # StreamingQueryException wraps it
        drain()
    assert fired["done"]
    monkeypatch.undo()
    assert drain()
    rows = lambda df: {tuple(r) for r in df.collect()}
    assert rows(snap.read_snapshot(spark, idx)) == rows(
        lsh_index_buckets(snap.read_snapshot(spark, src), "doc_id", "text")
    )
