"""BPE tokenizer training/encode tests: the distributed trainer must
match an independently written naive reference, and the encode step must
reproduce training segmentations."""

import pytest

from ray_beam_runner_spark.functions.bpe import (
    EOW,
    _learn_from_counts,
    bpe_encode,
    bpe_encode_word,
    bpe_learn,
)


def _naive_reference(word_counts, n_merges, min_freq=2):
    """Independent re-implementation (different data layout: expanded
    symbol lists, no dict-of-tuples) of Sennrich BPE for differential
    testing."""
    words = [(list(w) + [EOW], n) for w, n in word_counts]
    merges = []
    for _ in range(n_merges):
        counts = {}
        for seq, n in words:
            for i in range(len(seq) - 1):
                counts[(seq[i], seq[i + 1])] = counts.get((seq[i], seq[i + 1]), 0) + n
        if not counts:
            break
        best_pair, best_n = None, None
        for p, n in sorted(counts.items()):
            if best_n is None or n > best_n:
                best_pair, best_n = p, n
        if best_n < min_freq:
            break
        a, b = best_pair
        for seq, _n in words:
            i = 0
            while i < len(seq) - 1:
                if seq[i] == a and seq[i + 1] == b:
                    seq[i : i + 2] = [a + b]
                else:
                    i += 1
        merges.append(best_pair)
    return merges


def test_merge_loop_matches_naive_reference():
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3), ("low", 2)]
    for k in (1, 3, 8, 20):
        assert _learn_from_counts(wc, k, min_freq=2) == _naive_reference(wc, k)


def test_merge_loop_classic_example_and_determinism():
    # the canonical Sennrich example: 'es' (newest+widest, 9) wins first
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = _learn_from_counts(wc, 4, min_freq=2)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges == _learn_from_counts(list(reversed(wc)), 4, min_freq=2)


def test_min_freq_stops_and_ties_break_lexicographically():
    # all pairs frequency 1 -> below min_freq 2, nothing learned
    assert _learn_from_counts([("ab", 1), ("cd", 1)], 5, min_freq=2) == []
    # four distinct pairs all at count 2 (incl. the EOW pairs): the
    # lexicographically smallest wins deterministically
    merges = _learn_from_counts([("ab", 2), ("cd", 2)], 1, min_freq=2)
    assert merges == [("a", "b")]


def test_encode_word_applies_rank_order():
    merges = [("e", "s"), ("es", "t"), ("est", EOW), ("l", "o")]
    ranks = {m: i for i, m in enumerate(merges)}
    assert bpe_encode_word("newest", ranks) == ["n", "e", "w", "est" + EOW]
    assert bpe_encode_word("lowest", ranks) == ["lo", "w", "est" + EOW]
    # unknown chars fall through as singletons + EOW
    assert bpe_encode_word("xy", {}) == ["x", "y", EOW]


def test_distributed_learn_and_encode(spark):
    rows = [(i, "low lower newest widest newest") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_learn(df, "text", n_merges=6)
    # distributed counts == local counts: same merges as the reference
    wc = [("low", 20), ("lower", 20), ("newest", 40), ("widest", 20)]
    assert merges == _naive_reference(wc, 6)
    enc = bpe_encode(df, "text", merges)
    out = enc.select("doc_id", "bpe_tokens", "n_bpe_tokens").collect()
    assert len(out) == 20
    for r in out:
        # concatenating tokens reproduces the normalized text exactly
        joined = "".join(r.bpe_tokens).replace(EOW, " ").strip()
        assert joined == "low lower newest widest newest"
        assert r.n_bpe_tokens == len(r.bpe_tokens)


def test_max_words_caps_driver_table(spark):
    rows = [(i, f"common common rare{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # cap keeps only the most frequent word: merges come from 'common'
    merges = bpe_learn(df, "text", n_merges=3, max_words=1)
    assert merges == _naive_reference([("common", 100)], 3)


@pytest.mark.parametrize("k", [1, 5])
def test_learn_is_prefix_stable(k):
    # learning k merges equals the first k of learning many (greedy
    # algorithm invariant a refactor could silently break)
    wc = [("aaab", 4), ("abab", 3), ("bbba", 2)]
    assert _learn_from_counts(wc, k, 1) == _learn_from_counts(wc, 30, 1)[:k]
