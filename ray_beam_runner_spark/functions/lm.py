"""Interpolated modified Kneser-Ney trigram language model as pure
DataFrame algebra (Chen & Goodman, "An empirical study of smoothing
techniques for language modeling", Computer Speech & Language 1999 —
the formulation KenLM/SRILM implement).

Extends the bigram KN path (queries.llm.q_bigram_kn_logppl) one order,
with the two upgrades production n-gram LMs carry:

- MODIFIED discounts: three per order (D1, D2, D3+ applied to counts
  1, 2, >=3), estimated closed-form from the order's count-of-counts
  (Y = n1/(n1+2 n2); Dk = k - (k+1) Y n_{k+1}/n_k, clamped to [0, k]).
- INTERPOLATION: every order mixes in the lower order with weight
  gamma(history) = (D1 N1 + D2 N2 + D3 N3+)/c(history) — the exact mass
  the discounts removed, so each conditional distribution sums to 1
  over the vocabulary (pytest-asserted; the bottom order interpolates
  with uniform 1/V, which is what makes the telescoping exact).

Middle and bottom orders use CONTINUATION counts (how many distinct
contexts precede the n-gram), the defining KN insight.

Everything — including the discount scalars — is computed IN-PLAN from
integer counts with expression shapes mirrored verbatim in the DuckDB
oracle, so both engines run the identical double arithmetic (no
driver-side floats whose formatting could drift). Scale shape: the LM
tables are vocabulary-sized (trigram table at worst corpus-distinct-
trigram-sized), every aggregate map-side combinable, scoring is a
chain of token-keyed joins + broadcast 1-row stat frames; the document
trigram frame is built join-free (zip-against-tail) and persisted once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["doc_trigrams", "kn3_model", "kn3_score_triples", "kn3_doc_logppl"]


def doc_trigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2, w3, c): per-document trigram counts, join-free —
    the token array zipped against its own 1- and 2-shifted tails."""
    from ray_beam_runner_spark.functions.text import tokens

    toks = docs.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("w"))
    return (
        toks.filter(F.size("w") >= 3)
        .select(
            "id",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(w, 1, size(w) - 2)"),
                    F.expr("slice(w, 2, size(w) - 2)"),
                    F.expr("slice(w, 3, size(w) - 2)"),
                )
            ).alias("t"),
        )
        .select(
            "id",
            F.col("t.0").alias("w1"),
            F.col("t.1").alias("w2"),
            F.col("t.2").alias("w3"),
        )
        .groupBy("id", "w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _discounts(counts: DataFrame, c_col: str, prefix: str) -> DataFrame:
    """1-row frame of modified-KN discounts for one order, from the
    order's count-of-counts — clamped to [0, k] so D(c) <= c holds for
    every count class (what keeps the interpolation mass exact)."""
    cc = counts.agg(
        *[
            F.sum(F.when(F.col(c_col) == k, 1).otherwise(0)).cast("double").alias(f"n{k}")
            for k in (1, 2, 3, 4)
        ]
    )
    # greatest(..., 1): an order whose count-of-counts are all zero
    # (every n-gram frequent) degrades to y=0 -> constant discounts
    # (D1,D2,D3)=(1,2,3) — deterministic on both engines, and still
    # mass-exact since D(c) <= c holds per class
    y = F.col("n1") / F.greatest(F.col("n1") + 2.0 * F.col("n2"), F.lit(1.0))

    def d(k: int) -> Column:
        return F.greatest(
            F.lit(0.0),
            F.lit(float(k))
            - (float(k) + 1.0) * y * F.col(f"n{k + 1}") / F.greatest(F.col(f"n{k}"), F.lit(1.0)),
        ) if k < 4 else None

    return cc.select(
        d(1).alias(f"{prefix}1"), d(2).alias(f"{prefix}2"), d(3).alias(f"{prefix}3")
    )


def _dsel(c: Column, d1: Column, d2: Column, d3: Column) -> Column:
    """The discount applying to a count: D1 at 1, D2 at 2, D3 at >=3."""
    return F.when(c == 1, d1).when(c == 2, d2).otherwise(d3)


def kn3_model(docs: DataFrame, id_col: str, text_col: str) -> dict:
    """Train the interpolated modified-KN trigram model over a corpus.
    Returns the model as a dict of DataFrames:
    tg (per-doc trigrams), lm123, h12, cb23, h2, cu3 (token-keyed
    tables) and stats (ONE broadcastable row carrying all nine
    discounts, tot_cu, gamma1, and V)."""
    from ray_beam_runner_spark.caches import track
    from ray_beam_runner_spark.functions.text import tokens

    tg = track(doc_trigrams(docs, id_col, text_col))
    lm123 = track(
        tg.groupBy("w1", "w2", "w3").agg(F.sum("c").cast("double").alias("c123"))
    )
    h12 = lm123.groupBy("w1", "w2").agg(
        F.sum("c123").alias("c12"),
        F.sum(F.when(F.col("c123") == 1, 1).otherwise(0)).cast("double").alias("nh1"),
        F.sum(F.when(F.col("c123") == 2, 1).otherwise(0)).cast("double").alias("nh2"),
        F.sum(F.when(F.col("c123") >= 3, 1).otherwise(0)).cast("double").alias("nh3"),
    )
    cb23 = track(
        lm123.groupBy("w2", "w3").agg(F.count(F.lit(1)).cast("double").alias("cb"))
    )
    h2 = cb23.groupBy("w2").agg(
        F.sum("cb").alias("cdot2"),
        F.sum(F.when(F.col("cb") == 1, 1).otherwise(0)).cast("double").alias("mh1"),
        F.sum(F.when(F.col("cb") == 2, 1).otherwise(0)).cast("double").alias("mh2"),
        F.sum(F.when(F.col("cb") >= 3, 1).otherwise(0)).cast("double").alias("mh3"),
    )
    cu3 = track(
        cb23.groupBy("w3").agg(F.count(F.lit(1)).cast("double").alias("cu"))
    )
    d3 = _discounts(lm123, "c123", "d3_")
    d2 = _discounts(cb23, "cb", "d2_")
    d1 = _discounts(cu3, "cu", "d1_")
    u = cu3.agg(
        F.sum("cu").alias("tot_cu"),
        F.sum(F.when(F.col("cu") == 1, 1).otherwise(0)).cast("double").alias("u1"),
        F.sum(F.when(F.col("cu") == 2, 1).otherwise(0)).cast("double").alias("u2"),
        F.sum(F.when(F.col("cu") >= 3, 1).otherwise(0)).cast("double").alias("u3"),
    )
    vocab = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("t"))
        .agg(F.count_distinct("t").cast("double").alias("v"))
    )
    stats = (
        d3.crossJoin(d2).crossJoin(d1).crossJoin(u).crossJoin(vocab)
        .withColumn(
            "gamma1",
            (
                F.col("d1_1") * F.col("u1")
                + F.col("d1_2") * F.col("u2")
                + F.col("d1_3") * F.col("u3")
            )
            / F.col("tot_cu"),
        )
        # lazy: truncates the cross-join lineage immediately (what the
        # checkpoint is for — the scoring plan would otherwise inline
        # nine aggregate subtrees), while the broadcast build in
        # kn3_score_triples materializes the one row in its own job
        # instead of a dedicated count() job here
        .localCheckpoint(eager=False)
    )
    return {
        "tg": tg, "lm123": lm123, "h12": h12, "cb23": cb23,
        "h2": h2, "cu3": cu3, "stats": stats,
    }


def kn3_score_triples(model: dict, triples: DataFrame) -> DataFrame:
    """Attach the interpolated modified-KN probability ``p`` to a frame
    of (w1, w2, w3) rows (other columns pass through). LEFT joins +
    null handling cover the full backoff lattice: unseen trigram ->
    discount mass times the bigram distribution; unseen bigram history
    -> the continuation-unigram distribution; unseen word -> the
    uniform 1/V floor. All joins are token-keyed; the stats row
    broadcasts."""
    m = model
    j = (
        triples
        .join(m["lm123"], ["w1", "w2", "w3"], "left")
        .join(m["h12"], ["w1", "w2"], "left")
        .join(m["cb23"], ["w2", "w3"], "left")
        .join(m["h2"], ["w2"], "left")
        .join(m["cu3"], ["w3"], "left")
        .crossJoin(F.broadcast(m["stats"]))
    )
    d1s = _dsel(F.coalesce(F.col("cu"), F.lit(0.0)), F.col("d1_1"), F.col("d1_2"), F.col("d1_3"))
    p1 = (
        F.greatest(F.coalesce(F.col("cu"), F.lit(0.0)) - d1s, F.lit(0.0)) / F.col("tot_cu")
        + F.col("gamma1") / F.col("v")
    )
    d2s = _dsel(F.coalesce(F.col("cb"), F.lit(0.0)), F.col("d2_1"), F.col("d2_2"), F.col("d2_3"))
    gamma2 = (
        F.col("d2_1") * F.col("mh1")
        + F.col("d2_2") * F.col("mh2")
        + F.col("d2_3") * F.col("mh3")
    ) / F.col("cdot2")
    p2 = F.when(F.col("cdot2").isNull(), p1).otherwise(
        F.greatest(F.coalesce(F.col("cb"), F.lit(0.0)) - d2s, F.lit(0.0)) / F.col("cdot2")
        + gamma2 * p1
    )
    d3s = _dsel(F.coalesce(F.col("c123"), F.lit(0.0)), F.col("d3_1"), F.col("d3_2"), F.col("d3_3"))
    gamma3 = (
        F.col("d3_1") * F.col("nh1")
        + F.col("d3_2") * F.col("nh2")
        + F.col("d3_3") * F.col("nh3")
    ) / F.col("c12")
    p3 = F.when(F.col("c12").isNull(), p2).otherwise(
        F.greatest(F.coalesce(F.col("c123"), F.lit(0.0)) - d3s, F.lit(0.0)) / F.col("c12")
        + gamma3 * p2
    )
    keep = triples.columns
    return j.withColumn("p", p3).select(*keep, "p")


def kn3_doc_logppl(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document trigram log-perplexity under the interpolated
    modified-KN model trained on the corpus itself: (id_col,
    n_trigrams, log_ppl_kn3 rounded to 6 dp). Scoring the training
    corpus keeps every scored trigram seen (c123 >= 1), so the top
    term never vanishes and the whole model is closed-form SQL."""
    m = kn3_model(docs, id_col, text_col)
    scored = kn3_score_triples(m, m["tg"])
    return (
        scored.groupBy("id")
        .agg(
            F.sum("c").alias("n_tri"),
            F.sum(F.col("c") * -F.log("p")).alias("_nll"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("n_tri").alias("n_trigrams"),
            F.round(F.col("_nll") / F.col("n_tri"), 6).alias("log_ppl_kn3"),
        )
    )
