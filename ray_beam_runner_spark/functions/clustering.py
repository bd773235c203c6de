"""Distributed k-means and product quantization as pure DataFrame algebra.

The IVF/SemDeDup family trains its coarse quantizer with Spark ML KMeans
(`functions.similarity.ivf_fit` — sampled, convergence-based, fast), which
is NOT SQL-expressible, so those queries verify rows-only. This module is
the differential-testable twin: fixed-iteration Lloyd iteration (Lloyd,
"Least squares quantization in PCM", IEEE Trans. IT 1982) with
deterministic initialization, where every round is plain DataFrame
algebra and therefore one SQL CTE — the same design that made PageRank
hash-checkable against DuckDB (`functions.graph.pagerank`). Product
quantization (Jegou, Douze, Schmid, "Product quantization for nearest
neighbor search", IEEE TPAMI 2011) composes the same Lloyd core per
subspace: codebooks, code assignment, and asymmetric-distance (ADC)
search are all expressions, so the WHOLE compressed-ANN pipeline is
hash-checkable.

Scale shape (100 TB): centroids/codebooks are k x dim (resp. m x k x
dim/m) tables, BROADCAST into every assignment join — the corpus is
touched with one broadcast join + map-side-combinable aggregations per
round, no vector shuffle beyond cell-keyed partials. The corpus frame is
persisted once (tracked) and reused across rounds/subspaces; centroid
lineage is truncated per round with localCheckpoint so plan depth stays
constant in n_iter. PQ codes compress dim floats to m small ints (here
64 x f32 -> m bytes), which is what makes billion-vector ANN fit in
memory; ADC scores candidates with an m-term codebook lookup instead of
a dim-term dot product. Empty clusters follow Lloyd convention: a cell
that loses all members vanishes (k shrinks) — deterministic on both
engines.

Formulations measured and rejected (sf0.01, 500 x 64): driver-literal
centroids with zip_with against a literal array (interpreted HOFs
re-evaluate argument expressions PER ELEMENT — k x dim literals become
k x dim^2 evaluations/row; 2x slower) and an explicit k x dim flat
term chain (4000-node expression tree, whole-stage codegen compile
dominates; 3.5x slower). Column-to-column zip_with + broadcast join is
both the fastest here and the only shape whose cost model survives
k, dim growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "kmeans_lloyd",
    "pq_fit",
    "pq_encode",
    "pq_adc_topk",
    "ivfpq_index",
    "ivfpq_encode",
    "ivfpq_topk",
    "ivfpq_topk_rerank",
    "stream_maintain_ivfpq",
]


def _prepare(df: DataFrame, id_col: str, vec_col: str):
    """Persisted (vid, e::array<double>) frame + validated dimension.
    Loud error on NULL/ragged vectors: silent null-padding in zip_with
    would corrupt every distance (size(NULL) = -1 lands here too)."""
    from ray_beam_runner_spark.caches import track
    from ray_beam_runner_spark.session import ensure_min_parallelism

    v = track(
        ensure_min_parallelism(df).select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).cast("array<double>").alias("e"),
        )
    )
    stats = v.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.size("e")).alias("mn"),
        F.max(F.size("e")).alias("mx"),
    ).first()
    if stats.n == 0:
        return v, 0
    if stats.mn is None or stats.mn < 1 or stats.mn != stats.mx:
        v.unpersist()
        raise ValueError(
            "k-means requires non-null, fixed-dimension vectors; "
            f"observed size range [{stats.mn}, {stats.mx}]"
        )
    return v, stats.mx


def _assign(v: DataFrame, cent: DataFrame) -> DataFrame:
    """(vid, cell): argmin squared L2, ties to the lowest cell.
    Column-to-column zip_with — HOF argument evaluation is plain
    attribute access (no literal re-evaluation trap)."""
    d = v.crossJoin(F.broadcast(cent)).select(
        "vid",
        "cell",
        F.aggregate(
            F.zip_with("e", "c", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("d"),
    )
    return (
        d.groupBy("vid")
        .agg(F.min(F.struct("d", "cell")).alias("m"))
        .select("vid", F.col("m.cell").alias("cell"))
    )


def _lloyd_centroids(v: DataFrame, dim: int, k: int, n_iter: int) -> DataFrame:
    """(cell, c) after n_iter deterministic (assign, update) rounds.
    Init = vectors of the k smallest vids, cell = rank - 1."""
    from pyspark.sql import Window as W

    cent = (
        v.orderBy("vid")
        .limit(k)
        .select(
            (F.row_number().over(W.orderBy("vid")) - 1).cast("long").alias("cell"),
            F.col("e").alias("c"),
        )
    )
    for _ in range(n_iter):
        cent = (
            _assign(v, cent)
            .join(v, "vid")
            .groupBy("cell")
            # dim avg columns = ONE map-side-combinable shuffle of
            # k x dim partials; a posexplode mean costs two keyed
            # aggregations and a collect_list re-assembly. Means are
            # ROUNDED to 9 dp: double partial-sum order is partition-
            # dependent (and differs from DuckDB's), so raw avg is only
            # ulp-reproducible — rounding pins the centroids bit-exactly
            # across engines and runs, and the next round's distance
            # folds then agree exactly
            .agg(
                F.array(
                    *[F.round(F.avg(F.element_at("e", i + 1)), 9) for i in range(dim)]
                ).alias("c")
            )
            # k x dim rows: the checkpoint keeps the plan one round deep
            # however large n_iter grows. LAZY since round 17: the next
            # round's (or final assignment's) broadcast build is an
            # unconditional action that materializes the blocks in ITS
            # job — interleaved min-of-5 A/B read lazy equal-or-better
            # on all four ANN queries (q_kmeans 1.16 -> 1.13,
            # q_ivfpq_topk 2.02 -> 1.88), the round-16 eager/driver
            # variants both measured worse
            .localCheckpoint(eager=False)
        )
    return cent


def kmeans_lloyd(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    n_iter: int = 2,
) -> DataFrame:
    """Fixed-iteration Lloyd k-means over an embedding column. Returns
    (id_col, cell): each vector's cluster after ``n_iter``
    (assign, update) rounds and one final assignment against the final
    centroids.

    Deterministic by construction — what makes it ORACLE-EXPRESSIBLE:
    - init: the vectors of the ``k`` smallest ids, cell = rank - 1;
    - assignment: argmin squared L2 distance, ties to the lowest cell
      (min over (distance, cell) structs);
    - distances fold dimension-index order on both engines, so the
      double arithmetic agrees bit-for-bit;
    - centroid means round to 9 dp before the next round — the raw avg
      is only ulp-reproducible (partial-sum order is partition- and
      engine-dependent), so rounding is what pins the iteration, not
      luck.

    For the production ANN path use ``similarity.ivf_fit`` (Spark ML,
    sampled); this is the exact, differentially-checkable formulation.
    """
    v, dim = _prepare(df, id_col, vec_col)
    if dim == 0:
        v.unpersist()
        return v.select(F.col("vid").alias(id_col), F.lit(0).cast("long").alias("cell"))
    cent = _lloyd_centroids(v, dim, k, n_iter)
    return _assign(v, cent).select(F.col("vid").alias(id_col), "cell")


def _sub(j: int, d_sub: int):
    """Subspace j's slice of the vector column (1-based, length d_sub)."""
    return F.slice("e", j * d_sub + 1, d_sub)


def _explode_subspaces(df: DataFrame, m: int, d_sub: int, keep=("vid",)) -> DataFrame:
    """(keep..., j, e): every subvector of every row in ONE
    projection + explode — the corpus is touched once per pass, not m
    times (the sequential per-subspace loop this replaced launched m
    independent job chains per Lloyd round)."""
    return df.select(
        *keep,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), _sub(j, d_sub).alias("e"))
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select(*keep, F.col("s.j").alias("j"), F.col("s.e").alias("e"))


def _assign_keyed(v: DataFrame, cent: DataFrame) -> DataFrame:
    """(j, vid, cell): per-subspace argmin squared L2, ties to the
    lowest cell — all m subspaces in one broadcast join on j."""
    d = v.join(F.broadcast(cent), "j").select(
        "j",
        "vid",
        "cell",
        F.aggregate(
            F.zip_with("e", "c", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("d"),
    )
    return (
        d.groupBy("j", "vid")
        .agg(F.min(F.struct("d", "cell")).alias("m"))
        .select("j", "vid", F.col("m.cell").alias("cell"))
    )


def _lloyd_centroids_keyed(v: DataFrame, d_sub: int, k: int, n_iter: int) -> DataFrame:
    """(j, cell, c): m independent Lloyd iterations advanced in
    lockstep — each round is ONE corpus pass (assignment join grouped
    by (j, vid), mean grouped by (j, cell)) instead of m. Arithmetic
    identical per subspace to _lloyd_centroids (same init, ties,
    9-dp rounded means), so the oracle CTEs are unaffected."""
    from pyspark.sql import Window as W

    w = W.partitionBy("j").orderBy("vid")
    cent = (
        v.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .select("j", (F.col("_r") - 1).cast("long").alias("cell"), F.col("e").alias("c"))
    )
    for _ in range(n_iter):
        cent = (
            _assign_keyed(v, cent)
            .join(v, ["j", "vid"])
            .groupBy("j", "cell")
            .agg(
                F.array(
                    *[F.round(F.avg(F.element_at("e", i + 1)), 9) for i in range(d_sub)]
                ).alias("c")
            )
            # lazy for the same reason as _lloyd_centroids: the next
            # broadcast build materializes the blocks in its own job
            .localCheckpoint(eager=False)
        )
    return cent


def _check_query_vectors(q: DataFrame, dim: int, what: str) -> None:
    """Loud error on NULL/ragged/mis-sized QUERY vectors: the corpus
    goes through _prepare's check, but a wrong-dimension query would
    otherwise silently slice-truncate (too long) or null-pad distances
    and float garbage to the top ranks (too short / NULL)."""
    s = q.agg(F.min(F.size("e")).alias("mn"), F.max(F.size("e")).alias("mx")).first()
    if s.mn is None:
        return  # empty query set: vacuously fine
    if s.mn < 1 or s.mn != dim or s.mx != dim:
        raise ValueError(
            f"{what}: query vectors must be non-null {dim}-dim; "
            f"observed size range [{s.mn}, {s.mx}]"
        )


def pq_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 4,
    k: int = 16,
    n_iter: int = 2,
) -> DataFrame:
    """Train product-quantization codebooks: the vector splits into
    ``m`` contiguous subspaces and each gets its own deterministic
    Lloyd codebook of ``k`` centroids (Jegou et al. 2011 §II), all m
    trained in lockstep by the keyed Lloyd core (one corpus pass per
    round). Returns (j, cell, c) — an m x k x (dim/m) table,
    MODEL-sized, broadcastable. dim must divide evenly by m (loud
    error otherwise)."""
    v, dim = _prepare(df, id_col, vec_col)
    if dim == 0:
        v.unpersist()
        raise ValueError("pq_fit on an empty corpus")
    if dim % m:
        v.unpersist()
        raise ValueError(f"pq_fit: dim {dim} not divisible by m={m}")
    d_sub = dim // m
    vs = _explode_subspaces(v, m, d_sub)
    return _lloyd_centroids_keyed(vs, d_sub, k, n_iter).select("j", "cell", "c")


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Encode vectors against fitted codebooks: (id_col, codes) where
    codes[j] = argmin cell of subspace j (ties to lowest cell). One
    broadcast join over the subspace-exploded corpus; codes assemble
    in j order via an array_sort fold, so the array is deterministic."""
    v, dim = _prepare(df, id_col, vec_col)
    mk = [(int(r.j), int(r.mx) if r.mx is not None else 0)
          for r in codebooks.groupBy("j").agg(F.max(F.size("c")).alias("mx")).collect()]
    m = len(mk)
    if m == 0 or dim == 0 or dim % m or any(sz != dim // m for _, sz in mk):
        v.unpersist()
        raise ValueError(
            f"pq_encode: dim {dim} incompatible with {m} codebooks of "
            f"subspace sizes {sorted(mk)}"
        )
    d_sub = dim // m
    parts = _assign_keyed(
        _explode_subspaces(v, m, d_sub), codebooks.select("j", "cell", "c")
    )
    return (
        parts.groupBy("vid")
        .agg(F.array_sort(F.collect_list(F.struct("j", "cell"))).alias("jc"))
        .select(
            F.col("vid").alias(id_col),
            F.transform("jc", lambda s: s["cell"]).alias("codes"),
        )
    )


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    code_id: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: each query's distance to an
    encoded vector is the j-ordered sum of squared L2 distances from
    the query's subvectors to the vector's codebook entries (Jegou et
    al. 2011 §III) — an m-term lookup per candidate instead of a
    dim-term dot product, the economics of compressed billion-vector
    search.

    Scale shape: the (q x m x k) distance table is tiny and broadcast;
    candidates are scored by ONE join on (j, cell) against the exploded
    codes and one map-side-combinable per-(query, vector) fold. The
    fold runs in j order (array_sort before aggregate) and the result
    rounds to ``round_digits`` with rank ties broken by id — the same
    cross-engine determinism recipe as q_similarity_topk. Returns
    (q_id, vec_id, adc, rank), rank <= k."""
    from pyspark.sql import Window as W

    mrow = codebooks.agg(F.max("j")).first()[0]
    if mrow is None:
        raise ValueError("pq_adc_topk: empty codebooks")
    m = int(mrow) + 1
    d_sub = codebooks.select(F.size("c")).first()[0]
    q = queries.select(
        F.col(query_id).alias("vid"),
        F.col(query_vec).cast("array<double>").alias("e"),
    )
    _check_query_vectors(q, m * d_sub, "pq_adc_topk")
    # (qid, j, cell, dp): query subvector -> codebook entry partial dist
    qparts = (
        _explode_subspaces(q, m, d_sub)
        .join(F.broadcast(codebooks.select("j", "cell", "c")), "j")
        .select(
            F.col("vid").alias("qid"),
            "j",
            "cell",
            F.aggregate(
                F.zip_with("e", "c", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dp"),
        )
    )
    cand = codes.select(
        F.col(code_id).alias("vid"), F.posexplode("codes").alias("j", "cell")
    )
    scored = (
        cand.join(F.broadcast(qparts), ["j", "cell"])
        .groupBy("qid", "vid")
        .agg(F.array_sort(F.collect_list(F.struct("j", "dp"))).alias("jd"))
        .select(
            "qid",
            "vid",
            F.round(
                F.aggregate(
                    F.transform("jd", lambda s: s["dp"]),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                round_digits,
            ).alias("adc"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("adc"), F.col("vid"))
    return (
        scored.select(
            F.col("qid").alias(query_id),
            F.col("vid").alias(code_id),
            "adc",
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= k)
    )


def ivfpq_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int = 8,
    m: int = 4,
    k: int = 16,
    n_iter: int = 1,
):
    """Build a composed IVF-PQ index (FAISS IVFPQ, Jegou et al. 2011
    §IV): a deterministic Lloyd COARSE quantizer partitions the corpus
    into cells, and a product quantizer trained on the RESIDUALS
    (vector minus its cell centroid — far lower variance than raw
    vectors, so the same code budget quantizes much finer) compresses
    each vector to m codes. Returns (coarse, books, index):
    coarse = (cell, c), books = (j, cell, c) over residual subspaces,
    index = (id_col, cell, codes). All three stages reuse the
    deterministic Lloyd core (the PQ stage keyed — one residual pass
    per round for all m subspaces), so the whole index is reproducible
    and oracle-expressible.

    Scale shape: coarse and books are model-sized and broadcast; the
    corpus is touched by one assignment join per stage and one
    residual projection — no vector ever shuffles except as cell-keyed
    aggregate partials."""
    v, dim = _prepare(df, id_col, vec_col)
    if dim == 0:
        v.unpersist()
        raise ValueError("ivfpq_index on an empty corpus")
    if dim % m:
        v.unpersist()
        raise ValueError(f"ivfpq_index: dim {dim} not divisible by m={m}")
    d_sub = dim // m
    coarse = _lloyd_centroids(v, dim, n_cells, n_iter)
    res = _residuals(v, coarse)
    rs = _explode_subspaces(res.select("vid", "e"), m, d_sub)
    books = _lloyd_centroids_keyed(rs, d_sub, k, n_iter)
    index = _encode_residuals(res, rs, books, id_col)
    return coarse, books.select("j", "cell", "c"), index


def _residuals(v: DataFrame, coarse: DataFrame) -> DataFrame:
    """(vid, cell, e): each vector's coarse cell + residual against its
    centroid — one broadcast assignment join, tracked-persisted because
    both the codes and the (vid, cell) re-join read it."""
    from ray_beam_runner_spark.caches import track

    asg = _assign(v, coarse)
    return track(
        asg.join(v, "vid")
        .join(
            F.broadcast(
                coarse.withColumnRenamed("c", "cc").withColumnRenamed("cell", "vcell")
            ),
            F.col("cell") == F.col("vcell"),
        )
        .select(
            "vid",
            "cell",
            F.zip_with("e", "cc", lambda x, y: x - y).alias("e"),
        )
    )


def _encode_residuals(
    res: DataFrame, rs: DataFrame, books: DataFrame, id_col: str
) -> DataFrame:
    """(id_col, cell, codes) from residuals + exploded subspaces against
    fitted codebooks — the shared index/encode tail of ivfpq_index and
    ivfpq_encode (identical arithmetic is what makes an incrementally
    maintained index EQUAL a from-scratch rebuild)."""
    codes_parts = _assign_keyed(rs, books).withColumnRenamed("cell", "code")
    return (
        codes_parts.groupBy("vid")
        .agg(F.array_sort(F.collect_list(F.struct("j", "code"))).alias("jc"))
        .join(res.select("vid", "cell"), "vid")
        .select(
            F.col("vid").alias(id_col),
            "cell",
            F.transform("jc", lambda s: s["code"]).alias("codes"),
        )
    )


def ivfpq_encode(
    df: DataFrame,
    coarse: DataFrame,
    books: DataFrame,
    id_col: str,
    vec_col: str,
    m: int | None = None,
) -> DataFrame:
    """Encode vectors against a FROZEN IVF-PQ quantizer: coarse-cell
    assignment, residual, per-subspace code argmin — the index stage of
    :func:`ivfpq_index` factored out so NEW vectors arriving after the
    fit get (cell, codes) from the same quantizer with identical
    arithmetic. This is the ingestion half of incremental ANN index
    maintenance (a 100 TB embeddings pipeline fits the quantizer once
    on a sample, then encodes every incoming batch against it — FAISS
    add-after-train). Returns (id_col, cell, codes). ``m`` (subspace
    count) is derived from ``books`` when omitted; repeated callers
    (the streaming maintainer) pass it to skip that per-call job."""
    v, dim = _prepare(df, id_col, vec_col)
    if m is None:
        mrow = books.agg(F.max("j")).first()[0]
        if mrow is None:
            raise ValueError("ivfpq_encode: empty codebooks")
        m = int(mrow) + 1
    if dim == 0:
        v.unpersist()
        raise ValueError("ivfpq_encode on an empty corpus")
    if dim % m:
        v.unpersist()
        raise ValueError(f"ivfpq_encode: dim {dim} not divisible by m={m}")
    res = _residuals(v, coarse)
    rs = _explode_subspaces(res.select("vid", "e"), m, dim // m)
    return _encode_residuals(res, rs, books.select("j", "cell", "c"), id_col)


def stream_maintain_ivfpq(
    feed: DataFrame,
    index_dir: str,
    coarse: DataFrame,
    books: DataFrame,
    id_col: str,
    vec_col: str,
    checkpoint_dir: str,
    app_id: str | None = None,
):
    """Maintain an IVF-PQ index TABLE from an embeddings change feed
    (r8 verdict ask #3): each micro-batch nets its deltas per id (an
    update's delete+insert pair collapses to the insert; a later
    version wins), encodes surviving inserts against the FROZEN
    quantizer (:func:`ivfpq_encode`), MERGEs them into the index
    snapshot table, and retracts pure deletes via
    :func:`sources.snapshots.delete_keys`. Both commits carry
    (app, batch) transaction ids, so replayed batches are
    manifest-detected no-ops — exactly-once index state on top of the
    feed's checkpointed version offsets.

    Scale shape: per trigger the corpus is never touched — only the
    batch's vectors are encoded (model-sized broadcast joins) and only
    the index files containing affected ids are rewritten (file-pruned
    keyed MERGE/DELETE). An index maintained across N drains equals
    the index rebuilt from scratch with the same quantizer
    (tests/test_similarity.py::test_ivfpq_incremental_maintenance)."""
    import os as _os

    from pyspark.sql import Window as W

    from ray_beam_runner_spark.sources import snapshots as snap

    app = app_id or f"ivfpq:{_os.path.basename(_os.path.abspath(index_dir))}"
    # subspace count is a property of the frozen quantizer — derive it
    # once at stream construction, not once per micro-batch
    mrow = books.agg(F.max("j")).first()[0]
    if mrow is None:
        raise ValueError("stream_maintain_ivfpq: empty codebooks")
    m = int(mrow) + 1

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        w = W.partitionBy(id_col).orderBy(
            F.col("_commit_version").desc(),
            F.when(F.col("_change") == "insert", 1).otherwise(0).desc(),
        )
        # persist the NETTED frame, not the raw batch: the per-id window
        # feeds the insert/delete counts, the encode, and the retraction
        # — unpersisted it would recompute per consumer
        last = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .persist()
        )
        try:
            counts = dict(
                last.groupBy("_change").count().collect()
            )  # one job for both branch decisions
            if counts.get("insert"):
                ins = last.filter(F.col("_change") == "insert").select(id_col, vec_col)
                enc = ivfpq_encode(ins, coarse, books, id_col, vec_col, m=m)
                snap.upsert_snapshot(
                    spark, index_dir, enc, [id_col],
                    txn_app=app, txn_version=batch_id,
                )
            if counts.get("delete"):
                dels = last.filter(F.col("_change") == "delete").select(id_col)
                snap.delete_keys(
                    spark, index_dir, dels, [id_col],
                    txn_app=f"{app}#del", txn_version=batch_id,
                )
        finally:
            last.unpersist()

    return (
        feed.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def refit_ivfpq(
    spark,
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    coarse_dir: str,
    books_dir: str,
    index_dir: str,
    n_cells: int = 8,
    m: int = 4,
    k: int = 16,
    n_iter: int = 1,
    sample_mod: int | None = None,
) -> dict:
    """Re-train the IVF-PQ quantizer on the CURRENT corpus and swap the
    index to it — the distribution-drift answer for a long-lived corpus
    whose frozen quantizer (correct for incremental consistency,
    corpus.py) has gone stale. FAISS's retrain-and-add analog, done as
    table commits:

    1. FIT on the current vectors (optionally a deterministic hash
       sample — ``sample_mod=N`` keeps ids where xxhash64(id) % N == 0,
       the 100 TB path: quantizer quality needs a sample, not a scan);
    2. COMMIT the new coarse/books tables, then read them back so the
       encode uses exactly the committed quantizer bytes;
    3. RE-ENCODE the whole corpus in ONE partition-parallel pass
       (:func:`ivfpq_encode` — model-sized broadcast joins, the corpus
       never shuffles);
    4. COMMIT the re-encoded index LAST, carrying (a) the parent
       index's txn watermarks so the streaming maintainer's
       exactly-once dedupe survives the swap, and (b) ``ann:coarse`` /
       ``ann:books`` PINS naming the quantizer versions this index was
       encoded against.

    The index commit is the single atomicity point: a reader that
    resolves the triple through :func:`load_ivfpq` (index manifest →
    pinned quantizer versions) can never observe a mixed-generation
    quantizer/index pair, no matter how the three commits interleave
    with its reads. A maintainer drain AFTER the refit encodes new
    batches against the pinned tables, so maintained-after-refit equals
    rebuilt-from-scratch (tests/test_similarity.py). Returns
    {"coarse": v, "books": v, "index": v} — the committed versions."""
    from ray_beam_runner_spark.sources import snapshots as snap

    fit_df = vectors
    if sample_mod is not None and sample_mod > 1:
        sampled = vectors.filter(
            F.pmod(
                F.xxhash64(F.col(id_col).cast("string"), F.lit(0x5EED)),
                F.lit(sample_mod),
            )
            == 0
        )
        # a tiny corpus can sample to nothing — fall back to the full
        # set rather than raising from an empty fit
        fit_df = vectors if sampled.isEmpty() else sampled
    coarse_new, books_new, _ = ivfpq_index(
        fit_df, id_col, vec_col, n_cells=n_cells, m=m, k=k, n_iter=n_iter
    )
    snap.write_snapshot(coarse_new, coarse_dir)
    snap.write_snapshot(books_new, books_dir)
    vc = snap.latest_version(coarse_dir)
    vb = snap.latest_version(books_dir)
    coarse_t = snap.read_snapshot(spark, coarse_dir, version=vc)
    books_t = snap.read_snapshot(spark, books_dir, version=vb)
    enc = ivfpq_encode(vectors, coarse_t, books_t, id_col, vec_col, m=m)
    prev = snap.latest_version(index_dir)
    txns: dict = {}
    if prev is not None:
        txns.update(snap.read_manifest(index_dir, prev).get("txns", {}))
    txns.update({"ann:coarse": int(vc), "ann:books": int(vb)})
    snap.write_snapshot(enc, index_dir, cluster_by=[id_col], n_files=2, txns=txns)
    return {"coarse": vc, "books": vb, "index": snap.latest_version(index_dir)}


def load_ivfpq(
    spark, coarse_dir: str, books_dir: str, index_dir: str,
    index_version: int | None = None,
):
    """Resolve a CONSISTENT (coarse, books, index) triple: read the
    index's manifest first and open the quantizer tables at the
    versions its ``ann:coarse``/``ann:books`` txn pins name. Readers
    interleaving with :func:`refit_ivfpq` therefore see either the old
    generation whole or the new generation whole — never a new index
    decoded against old codebooks or vice versa. Pre-pinning indexes
    (no txn entries) fall back to latest-everything.

    ``index_version`` pins the INDEX itself (e.g. a cascade read
    epoch's vector entry — corpus.read_corpus): the quantizer then
    resolves through THAT version's pins, so an epoch-pinned ANN search
    is generation-consistent even after a later refit swapped the live
    quantizer."""
    from ray_beam_runner_spark.sources import snapshots as snap

    vi = index_version if index_version is not None else snap.latest_version(index_dir)
    if vi is None:
        raise FileNotFoundError(f"load_ivfpq: no index at {index_dir}")
    t = snap.read_manifest(index_dir, vi).get("txns", {})
    vc = t.get("ann:coarse")
    vb = t.get("ann:books")
    coarse = snap.read_snapshot(
        spark, coarse_dir, version=int(vc) if vc is not None else None
    )
    books = snap.read_snapshot(
        spark, books_dir, version=int(vb) if vb is not None else None
    )
    index = snap.read_snapshot(spark, index_dir, version=vi)
    return coarse, books, index


def ivfpq_topk_rerank(
    queries: DataFrame,
    coarse: DataFrame,
    books: DataFrame,
    index: DataFrame,
    vectors: DataFrame,
    k: int = 5,
    alpha: int = 4,
    n_probe: int | None = None,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    index_id: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Two-stage ANN search (production IVF-PQ, FAISS's refine step):
    stage 1 shortlists ``k * alpha`` candidates per query by
    residual-ADC (:func:`ivfpq_topk` — compressed-domain, probe-bound),
    stage 2 re-scores ONLY those candidates with EXACT squared-L2
    against the original vectors and keeps the true top-``k`` of the
    shortlist. Re-ranking recovers the recall that PQ quantization
    distortion costs at small ``n_probe``: the ADC ordering inside the
    shortlist is approximate, the exact ordering is not.

    Scale shape: the corpus is touched only by one semi-join pruned to
    the shortlist ids (``vectors`` clustered by id makes that a
    file-pruned point read; the shortlist itself is queries x k x
    alpha rows, broadcastable) — never a corpus scan, never an
    all-pairs score. Returns (query_id, index_id, dist, rank) with
    rank <= k, ties by (dist, id)."""
    from pyspark.sql import Window as W

    if alpha < 1:
        raise ValueError(f"ivfpq_topk_rerank: alpha must be >= 1, got {alpha}")
    shortlist = ivfpq_topk(
        queries, coarse, books, index, k=k * alpha, n_probe=n_probe,
        query_id=query_id, query_vec=query_vec, index_id=index_id,
        round_digits=round_digits,
    ).select(F.col(query_id).alias("qid"), F.col(index_id).alias("vid"))
    q = queries.select(
        F.col(query_id).alias("qid"),
        F.col(query_vec).cast("array<double>").alias("qe"),
    )
    v = vectors.select(
        F.col(index_id).alias("vid"), F.col(vec_col).cast("array<double>").alias("ve")
    )
    # candidates-only corpus read: the shortlist id set is tiny -> the
    # semi-join broadcasts, and a corpus clustered by id file-prunes
    cv = v.join(
        F.broadcast(shortlist.select("vid").distinct()), "vid", "left_semi"
    )
    scored = (
        shortlist.join(cv, "vid")
        .join(F.broadcast(q), "qid")
        .select(
            "qid",
            "vid",
            F.round(
                F.aggregate(
                    F.zip_with("qe", "ve", lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                round_digits,
            ).alias("dist"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("dist"), F.col("vid"))
    return (
        scored.select(
            F.col("qid").alias(query_id),
            F.col("vid").alias(index_id),
            "dist",
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= k)
    )


def ivfpq_topk(
    queries: DataFrame,
    coarse: DataFrame,
    books: DataFrame,
    index: DataFrame,
    k: int = 5,
    n_probe: int | None = None,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    index_id: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """IVF-PQ search: rank coarse cells per query by centroid distance,
    probe the ``n_probe`` nearest (None = all — the exhaustive-probe
    gating mode, where the result is pure residual-ADC and therefore
    oracle-checkable), subtract the probed centroid from the query, and
    score that cell's candidates by the j-ordered residual-ADC fold.
    Candidates in unprobed cells never join a query partial — probe
    semantics fall out of the (cell, j, code) equi-join. Returns
    (q_id, vec_id, adc, rank), rank <= k (ties: adc then id)."""
    from pyspark.sql import Window as W

    # ONE scalar probe for both codebook constants (m and d_sub were
    # two separate driver actions — two scheduler round-trips for two
    # numbers from the same model-sized frame)
    mrow = books.agg(
        F.max("j").alias("mj"), F.max(F.size("c")).alias("ds")
    ).first()
    if mrow.mj is None:
        raise ValueError("ivfpq_topk: empty codebooks")
    m = int(mrow.mj) + 1
    d_sub = mrow.ds
    q = queries.select(
        F.col(query_id).alias("qid"),
        F.col(query_vec).cast("array<double>").alias("e"),
    )
    _check_query_vectors(
        q.select(F.col("qid").alias("vid"), "e"), m * d_sub, "ivfpq_topk"
    )
    qcell = q.crossJoin(F.broadcast(coarse)).select(
        "qid",
        "cell",
        F.aggregate(
            F.zip_with("e", "c", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("cd"),
    )
    if n_probe is not None:
        w = W.partitionBy("qid").orderBy(F.col("cd"), F.col("cell"))
        qcell = (
            qcell.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= n_probe)
            .drop("_r")
        )
    qres = (
        qcell.join(q, "qid")
        .join(
            F.broadcast(
                coarse.withColumnRenamed("c", "cc").withColumnRenamed("cell", "pcell")
            ),
            F.col("cell") == F.col("pcell"),
        )
        .select("qid", "cell", F.zip_with("e", "cc", lambda x, y: x - y).alias("e"))
    )
    qparts = (
        _explode_subspaces(qres, m, d_sub, keep=("qid", "cell"))
        .join(
            F.broadcast(books.select("j", F.col("cell").alias("code"), "c")),
            "j",
        )
        .select(
            "qid",
            "cell",
            "j",
            "code",
            F.aggregate(
                F.zip_with("e", "c", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dp"),
        )
    )
    cand = index.select(
        F.col(index_id).alias("vid"), "cell", F.posexplode("codes").alias("j", "code")
    )
    scored = (
        cand.join(F.broadcast(qparts), ["cell", "j", "code"])
        .groupBy("qid", "vid")
        .agg(F.array_sort(F.collect_list(F.struct("j", "dp"))).alias("jd"))
        .select(
            "qid",
            "vid",
            F.round(
                F.aggregate(
                    F.transform("jd", lambda s: s["dp"]),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                round_digits,
            ).alias("adc"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("adc"), F.col("vid"))
    return (
        scored.select(
            F.col("qid").alias(query_id),
            F.col("vid").alias(index_id),
            "adc",
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= k)
    )
