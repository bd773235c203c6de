"""Byte-pair-encoding tokenizer TRAINING over a distributed corpus, plus
the matching encode step — the tokenizer-construction half of a
training-data pipeline (the reference has no tokenizer surface; its text
handling is opaque DoFn Python, e.g. examples/word_count_metrics.py:73-83).

Production shape (same recipe as HuggingFace/SentencePiece trainers):
the CORPUS-SIZED work — normalizing, word splitting, frequency counting
— is one distributed map-side-combinable aggregation; the merge-learning
loop then runs over the WORD-FREQUENCY TABLE, which is vocabulary-sized
(~10^5-10^6 rows at any corpus scale — Heaps' law), so it is driver-side
by design, not by accident. At 100 TB the aggregation shuffles once on
the word key and the driver never sees a document. ``max_words`` caps
the table at the most frequent words (standard trainer knob) so a
pathological corpus cannot blow up the driver.

Merges are learned on space-split words with an end-of-word marker
(classic Sennrich et al. 2016 formulation, public algorithm): each word
starts as its character sequence + '</w>'; each step merges the
globally most frequent adjacent symbol pair (ties broken
lexicographically for cross-run determinism) in every word.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ray_beam_runner_spark.functions.text import tokens

EOW = "</w>"


def word_count_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) frequency table of the normalized whitespace words —
    the one corpus-sized aggregation of BPE training (map-side
    combinable count keyed on the word)."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def char_pair_counts(df: DataFrame, text_col: str) -> DataFrame:
    """First-iteration BPE pair statistics as pure Catalyst expressions
    (oracle-able): adjacent CHARACTER pairs inside each word occurrence,
    counted corpus-wide. This is exactly the statistic the first merge
    step maximizes (modulo the end-of-word marker, which SQL cannot
    append without changing the pair alphabet — the q_bpe_pair_counts
    oracle states the marker-free form both engines can express)."""
    w = df.select(F.explode(tokens(F.col(text_col))).alias("w")).filter(
        F.length("w") >= 2
    )
    return (
        w.select(
            F.explode(
                F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
            ).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _learn_from_counts(
    word_counts: list[tuple[str, int]], n_merges: int, min_freq: int
) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a word-frequency table (driver-side;
    the table is vocabulary-sized — see module docstring)."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, n in word_counts:
        vocab[tuple(word) + (EOW,)] = vocab.get(tuple(word) + (EOW,), 0) + n
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for seq, n in vocab.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        # max by count, ties broken lexicographically -> deterministic
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        a, b = best[0]
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for seq, n in vocab.items():
            out = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
        merges.append((a, b))
    return merges


def bpe_learn(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_freq: int = 2,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a corpus: one distributed
    word-count aggregation, then the merge loop on the (vocab-sized)
    frequency table. ``max_words`` keeps the most frequent words only —
    the standard trainer bound that caps driver memory independent of
    corpus size (rare-tail words contribute ~nothing to merge counts)."""
    rows = (
        word_count_table(df, text_col)
        .orderBy(F.col("n").desc(), "word")
        .limit(max_words)
        .collect()
    )
    return _learn_from_counts([(r.word, r.n) for r in rows], n_merges, min_freq)


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with learned merges: start from characters+EOW,
    repeatedly apply the best-ranked (earliest-learned) applicable
    merge — the standard BPE encode, greedy in rank order."""
    seq = list(word) + [EOW]
    while len(seq) > 1:
        best_i, best_rank = -1, None
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    cache_counters=None,
) -> DataFrame:
    """Tokenize the corpus with learned merges (adds ``bpe_tokens``
    array<string> and ``n_bpe_tokens``). Arrow-batched mapInPandas —
    the encode loop is per-word Python (the documented slow path;
    production swaps in a compiled tokenizer with the same merge
    table), with a per-task LRU so repeated words encode once.
    ``cache_counters``: optional (words_total, words_missed)
    :class:`metrics.Counter` pair updated from the workers — the
    per-task cache hit rate is 1 - missed/total (the number that
    decides whether the Python encode amortizes at corpus scale)."""
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    # fresh StructType: StructType.add mutates in place, which would
    # poison the input DataFrame's cached schema
    out_schema = StructType(
        [
            *df.schema.fields,
            StructField("bpe_tokens", ArrayType(StringType())),
            StructField("n_bpe_tokens", LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        n_total = n_miss = 0

        def enc(text: str) -> list[str]:
            nonlocal n_total, n_miss
            toks: list[str] = []
            for w in (text or "").lower().split():
                n_total += 1
                if w not in cache:
                    n_miss += 1
                    if len(cache) > 200_000:
                        cache.clear()
                    cache[w] = bpe_encode_word(w, ranks)
                toks.extend(cache[w])
            return toks

        for pdf in batches:
            out = pdf.copy()
            out["bpe_tokens"] = [enc(t) for t in pdf[text_col]]
            out["n_bpe_tokens"] = [len(t) for t in out["bpe_tokens"]]
            yield out
        if cache_counters is not None:
            total_c, miss_c = cache_counters
            total_c.inc(n_total)
            miss_c.inc(n_miss)

    return df.mapInPandas(kernel, schema=out_schema)
