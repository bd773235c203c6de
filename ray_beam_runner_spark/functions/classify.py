"""Supervised quality classifier trained as pure DataFrame algebra.

The production LLM-data stack (CCNet; LLaMA's quality filtering) trains
a LINEAR classifier on hashed bag-of-words features to separate a
high-quality reference slice from the crawl — complementing this repo's
heuristic quality family (Gopher rules, LM perplexity). This module is
that trainer, expressed so every round is one broadcast-weights join +
map-side-combinable gradient aggregation, and therefore one SQL CTE —
fully hash-checkable against DuckDB (q_quality_classifier).

Determinism recipe — stronger than the 9-dp rounding that pinned
q_kmeans/q_pagerank: BINARY FIXED-POINT rounding (:func:`fxp` =
floor(x * 2^bits + 0.5) / 2^bits). Sigmoid outputs round to 2^-20
multiples and weights to 2^-24 multiples, so every product with the
integer count features is EXACTLY representable and every SUM in the
pipeline (the per-doc score fold, the per-feature gradient) is exact
integer arithmetic in the double mantissa — associative, and therefore
identical across partial-sum orders, partitionings, and engines. The
only approximate step left is exp() inside the sigmoid (JVM vs libm
differ by <= 1 ulp, measured); the 2^-20 quantization absorbs that with
boundary probability ~4e-10 per evaluation. Plain decimal rounding
cannot give this: 1e-9 is not a binary fraction, so rounded values stay
inexact and sum order would still leak engine differences into the
gradient.

Scale shape (100 TB): the model is (n_features + 1) doubles — broadcast
into every join; each round touches the corpus exactly twice (score
join keyed by doc, gradient aggregation keyed by feature), both
map-side-combinable; weights localCheckpoint per round so plan depth
stays constant in n_iter. Full-batch GD is the oracle-checkable
formulation; a production run at 100 TB would subsample the reference
corpus per round (same plan shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fxp", "hashed_features", "logreg_fit", "logreg_score"]


def fxp(col: Column, bits: int) -> Column:
    """Round to the nearest multiple of 2^-bits (half toward +inf):
    floor(x * 2^bits + 0.5) / 2^bits. The result is exactly
    representable in a double (for the magnitudes used here), which is
    what makes downstream sums exact and order-independent."""
    scale = float(1 << bits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def hashed_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    seed_tag: str = "qc",
) -> DataFrame:
    """Sparse hashed features: (id, feat, x). Features 0..n_buckets-1
    are TERM FREQUENCIES (token count / doc token count — raw counts
    saturate the sigmoid for any usable learning rate) of md5 token
    buckets; feature n_buckets is a length feature
    (min(n_tokens, 100) / 100, the Gopher-style length signal). Every
    value is fixed-point-rounded (:func:`fxp` 20 bits) so its products
    with fixed-point weights stay exactly summable. md5 bucketing
    (text.hash_bucket contract) keeps the map engine-portable. Pass
    ``n_features = n_buckets + 1`` to :func:`logreg_fit`."""
    from ray_beam_runner_spark.functions.text import hash_bucket, tokens

    toks = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("ts")
    )
    tf = (
        toks.select("id", F.explode("ts").alias("t"), F.size("ts").alias("ntok"))
        .select("id", hash_bucket(F.col("t"), n_buckets, seed_tag).alias("feat"), "ntok")
        .groupBy("id", "feat")
        .agg(
            fxp(
                F.count(F.lit(1)).cast("double") / F.min("ntok").cast("double"), 20
            ).alias("x")
        )
    )
    length = toks.select(
        "id",
        F.lit(n_buckets).cast("long").alias("feat"),
        fxp(
            F.least(F.size("ts"), F.lit(100)).cast("double") / F.lit(100.0), 20
        ).alias("x"),
    )
    return tf.unionByName(length)


def logreg_fit(
    feats: DataFrame,
    labels: DataFrame,
    n_features: int,
    n_iter: int = 3,
    lr: float = 0.5,
) -> DataFrame:
    """Fixed-iteration full-batch logistic regression. ``feats`` is the
    sparse (id, feat, x) matrix, ``labels`` is (id, y) with y in
    {0.0, 1.0}. Returns (feat, w) with feat = n_features as the bias
    row. Deterministic by construction:

    - init: all-zero weights;
    - round: z_d = b + sum_j w_j x_dj (exact — fixed-point w times
      integer x), p_d = fxp(sigmoid(z_d), 20), gradient
      g_j = sum_d (p_d - y_d) x_dj (exact), update
      w_j <- fxp(w_j - lr * g_j / n, 24);
    - docs with no features still contribute through the bias (labels
      LEFT JOIN the score sum).

    ``lr`` should be a binary fraction (0.5, 0.25, ...) so the update
    arithmetic stays exactly reproducible.

    The weight vector lives on the DRIVER between rounds (model-sized:
    n_features + 1 doubles — the same bounded-collect contract as the
    manifest reads in sources.snapshots). Each round is then ONE Spark
    action: the gradient aggregation, collected as n_features + 1 rows;
    scores are computed against the weights as an array LITERAL, so no
    per-round broadcast-collect jobs, no weights join, and no per-round
    localCheckpoint. The update arithmetic below replicates the former
    in-plan expression operation for operation (w - lr * (g / n), then
    fxp-24 as floor(v * 2^24 + 0.5) / 2^24) in IEEE754 doubles, so the
    trained weights are bit-identical to the all-DataFrame formulation
    (pinned by test_quality_classifier_matches_numpy_gd)."""
    import math

    spark = feats.sparkSession
    n = labels.count()
    if n == 0:
        raise ValueError("logreg_fit: empty label set")
    lab = labels.select(F.col("id"), F.col("y").cast("double").alias("y"))
    nf, p24 = float(n), float(1 << 24)
    w = [0.0] * (n_features + 1)
    for _ in range(n_iter):
        p = _scores_lit(feats, lab, w, n_features)
        err = p.select("id", (F.col("p") - F.col("y")).alias("err"))
        # one pass: per-feature err*x terms plus the bias' bare err
        # terms, summed by feat — exact fixed-point sums, so the union
        # ordering cannot change the totals
        terms = (
            feats.join(err, "id")
            .select("feat", (F.col("err") * F.col("x")).alias("t"))
            .unionByName(
                err.select(
                    F.lit(n_features).cast("long").alias("feat"),
                    F.col("err").alias("t"),
                )
            )
        )
        g = {
            r.feat: r.g
            for r in terms.groupBy("feat").agg(F.sum("t").alias("g")).collect()
        }
        w = [
            math.floor((w[j] - lr * (g.get(j, 0.0) / nf)) * p24 + 0.5) / p24
            for j in range(n_features + 1)
        ]
    return spark.createDataFrame(
        [(j, wj) for j, wj in enumerate(w)], "feat long, w double"
    )


def _scores_lit(
    feats: DataFrame, lab: DataFrame, w: list, n_features: int
) -> DataFrame:
    """(id, y, p) under a driver-side weight list: the weights enter
    the plan as an array literal (element_at by feat) instead of a
    broadcast join — per-term products x * w[feat] and the per-doc sum
    are the same exact fixed-point values as the join formulation."""
    warr = F.array(*[F.lit(float(wj)) for wj in w[:n_features]])
    zsum = (
        feats.select(
            "id",
            (
                F.col("x")
                * F.element_at(warr, F.col("feat").cast("int") + F.lit(1))
            ).alias("xw"),
        )
        .groupBy("id")
        .agg(F.sum("xw").alias("z"))
    )
    return lab.join(zsum, "id", "left").select(
        "id",
        "y",
        fxp(
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -(
                        F.lit(float(w[n_features]))
                        + F.coalesce(F.col("z"), F.lit(0.0))
                    )
                )
            ),
            20,
        ).alias("p"),
    )


def _scores(
    feats: DataFrame, lab: DataFrame, weights: DataFrame, n_features: int
) -> DataFrame:
    """(id, y, p): per-doc fixed-point sigmoid scores under ``weights``.
    One broadcast join + one doc-keyed sum; the bias is a 1-row
    cross-joined scalar so empty-feature docs score through it."""
    bias = weights.filter(F.col("feat") == n_features).select(
        F.col("w").alias("_b")
    )
    zsum = (
        feats.join(
            F.broadcast(weights.filter(F.col("feat") < n_features)), "feat"
        )
        .groupBy("id")
        .agg(F.sum(F.col("x") * F.col("w")).alias("z"))
    )
    return (
        lab.join(zsum, "id", "left")
        .crossJoin(F.broadcast(bias))
        .select(
            "id",
            "y",
            fxp(
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-(F.col("_b") + F.coalesce(F.col("z"), F.lit(0.0))))),
                20,
            ).alias("p"),
        )
    )


def logreg_score(
    feats: DataFrame,
    labels: DataFrame,
    weights: DataFrame,
    n_features: int,
) -> DataFrame:
    """Score documents under trained weights: (id, y, p, pred) with
    pred = 1 iff p > 0.5 — the inference half, same exact arithmetic
    as the training rounds."""
    return _scores(feats, labels, weights, n_features).select(
        "id",
        "y",
        "p",
        F.when(F.col("p") > 0.5, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("pred"),
    )
