"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k (exact; broadcast the bounded query
set, scan the corpus once — embarrassingly parallel at 100 TB). Scale
path: random-hyperplane LSH bucketing (Charikar 2002 sign-random-
projection; multi-table recall amplification per Indyk-Motwani 1998) —
subquadratic candidate generation with tunable recall, tested against the
brute-force baseline in tests/test_similarity.py.

Dot products are pure Catalyst expressions (zip_with + aggregate), cast
to double so results are comparable with the DuckDB oracle's
list_cosine_similarity.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = [
    "cosine_similarity_col",
    "cosine_pandas",
    "cosine_topk",
    "blocked_cosine_pairs",
    "semdedup_pairs",
    "random_hyperplane_buckets",
    "multi_table_buckets",
    "embedding_near_dup_pairs_lsh",
    "lsh_topk",
    "ivf_fit",
    "ivf_assign",
    "ivf_topk",
]


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_similarity_col(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<float|double> columns (double).

    Pure-expression form; correct everywhere but interpreted per element
    (Spark higher-order functions don't codegen). For bulk pair scoring
    use :func:`cosine_pandas` — Arrow-batched numpy, ~50x faster."""
    ad, bd = _as_double(a), _as_double(b)
    return _dot(ad, bd) / (F.sqrt(_dot(ad, ad)) * F.sqrt(_dot(bd, bd)))


_cosine_udf = None


def cosine_pandas(a, b) -> Column:
    """Vectorized cosine similarity over two array columns (Arrow batches →
    one numpy einsum per batch). Assumes fixed-dimension vectors. The
    pandas UDF is built lazily — decorating at import time would require
    an active SparkSession."""
    global _cosine_udf
    if _cosine_udf is None:
        from pyspark.sql import types as T

        def _kernel(sa: pd.Series, sb: pd.Series) -> pd.Series:
            import numpy as np

            ma = np.array(sa.tolist(), dtype=np.float64)
            mb = np.array(sb.tolist(), dtype=np.float64)
            dots = np.einsum("ij,ij->i", ma, mb)
            na = np.sqrt(np.einsum("ij,ij->i", ma, ma))
            nb = np.sqrt(np.einsum("ij,ij->i", mb, mb))
            return pd.Series(dots / (na * nb))

        _cosine_udf = F.pandas_udf(_kernel, T.DoubleType())
    return _cosine_udf(a, b)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast the (bounded) query set,
    one corpus scan, per-query top-k via window rank. Similarities are
    rounded before ranking so ordering is reproducible across engines;
    ties broken by corpus id. Returns (q_id, vec_id, sim, rank)."""
    q = F.broadcast(queries.select(F.col(query_id).alias("q_id"), F.col(query_vec).alias("q_vec")))
    scored = corpus.crossJoin(q).select(
        "q_id",
        F.col(corpus_id).alias("vec_id"),
        F.round(cosine_pandas(F.col("q_vec"), F.col(corpus_vec)), round_digits).alias("sim"),
    )
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    dup_threshold: float = 0.98,
    exclude: DataFrame | None = None,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """HARD-NEGATIVE mining for contrastive training (the
    retrieval/embedding-model data step, e.g. DPR/SimCSE-style): per
    anchor, the top-k most cosine-similar corpus vectors EXCLUDING
    near-duplicates — the "similar but not the same" examples that
    carry the training signal (random negatives are trivially easy;
    undetected duplicates among negatives are false negatives that
    poison the loss). Exclusion is two-layer: the ``dup_threshold``
    similarity cut (anything >= it is treated as a duplicate of the
    anchor, not a negative) and an optional explicit ``exclude`` pair
    frame (q_id, vec_id) — e.g. the semantic-dedup pair output — anti-
    joined before ranking. Same scale shape as :func:`cosine_topk`:
    broadcast anchors, one corpus scan, window rank; the exclude frame
    joins keyed on (q_id, vec_id). Returns (q_id, vec_id, sim, rank)."""
    q = F.broadcast(
        queries.select(F.col(query_id).alias("q_id"), F.col(query_vec).alias("q_vec"))
    )
    scored = corpus.crossJoin(q).select(
        "q_id",
        F.col(corpus_id).alias("vec_id"),
        F.round(
            cosine_pandas(F.col("q_vec"), F.col(corpus_vec)), round_digits
        ).alias("sim"),
    ).filter(F.col("sim") < dup_threshold)
    if exclude is not None:
        scored = scored.join(
            exclude.select(
                F.col(query_id).alias("q_id"), F.col(corpus_id).alias("vec_id")
            ),
            ["q_id", "vec_id"],
            "left_anti",
        )
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def blocked_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_blocks: int = 16,
    round_digits: int = 6,
    group_col: str | None = None,
) -> DataFrame:
    """EXACT all-pairs cosine join as a blocked matrix multiply.

    Vectors are hashed into ``n_blocks`` blocks; each vector is fanned out
    to the n_blocks block-PAIR groups it participates in (an equi-shuffle
    on the group key — the plan is Exchange + FlatMapGroupsInPandas, no
    CartesianProduct / BroadcastNestedLoopJoin). Each group computes one
    numpy float64 GEMM between its two blocks (the triangle for diagonal
    groups), so the O(n^2) inner work runs as BLAS flops, load-balanced
    across B(B+1)/2 uniformly-sized tasks.

    Why not LSH here: a subquadratic candidate filter needs a similarity
    GAP between matching and non-matching pairs. The synthetic embeddings
    corpus has none at the 0.4 threshold (measured: min qualifying sim
    0.4005, and 3217 pairs in [0.35, 0.4) at sf0.1 just below it; sign-LSH
    collision prob is 0.631/plane at sim 0.4 vs 0.597 at 0.3, and
    multi-table recall at the threshold measured 0.56) — an exact
    threshold join over a gap-free corpus is intrinsically all-pairs.
    This operator makes that honest case scale-shaped; for the true
    near-dup regime (threshold >= ~0.8 with a gap below it), use
    :func:`embedding_near_dup_pairs_lsh`, which IS subquadratic.

    Sizing: each group holds ~2n/B vectors; pick n_blocks so that fits an
    executor GEMM tile (10-50k rows) — B grows with sqrt of corpus size
    and task count grows as B^2, keeping per-task memory flat.

    With ``group_col`` set, pairing is restricted to rows sharing that
    column's value (the GEMM group key becomes (group, block-pair)) — the
    building block for cluster-first SemDeDup via :func:`semdedup_pairs`,
    which turns the global O(n^2) into sum-of-cell-squares. The block
    fan-out still applies within each group, so one skewed giant cell
    splits into B(B+1)/2 bounded GEMM tiles instead of one huge task.

    Returns (v1, v2, sim) with v1 < v2 and rounded sim >= threshold.
    """
    from pyspark.sql import types as T

    nb = n_blocks
    grp = [F.col(group_col).alias("_grp")] if group_col else []
    src = df.select(
        *grp,
        F.col(id_col).alias("_id"),
        _as_double(F.col(vec_col)).alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(nb)).cast("int").alias("_b"),
    )
    exploded = src.withColumn(
        "_g",
        F.explode(
            F.array(
                *[
                    (
                        F.least(F.col("_b"), F.lit(j)) * nb
                        + F.greatest(F.col("_b"), F.lit(j))
                    ).cast("int")
                    for j in range(nb)
                ]
            )
        ),
    )

    out_schema = T.StructType(
        [
            T.StructField("v1", T.LongType()),
            T.StructField("v2", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def _gemm(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        def _round_half_away(x):
            # Match Spark F.round / the DuckDB oracle (HALF_UP = ties away
            # from zero); np.round is half-even and would flip threshold
            # membership for a sim landing exactly on a decimal midpoint.
            scale = 10.0**round_digits
            return np.copysign(np.floor(np.abs(x) * scale + 0.5) / scale, x)

        g = int(pdf["_g"].iloc[0])
        i, j = divmod(g, nb)
        pdf = pdf.sort_values("_id")
        ids = pdf["_id"].to_numpy()
        V = np.array(pdf["_v"].tolist(), dtype=np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", V, V))
        blocks = pdf["_b"].to_numpy()
        empty = pd.DataFrame({"v1": [], "v2": [], "sim": []}).astype(
            {"v1": "int64", "v2": "int64", "sim": "float64"}
        )
        if i == j:
            sims = _round_half_away((V @ V.T) / np.outer(norms, norms))
            r, c = np.nonzero(np.triu(sims >= threshold, k=1))
            v1, v2, s = ids[r], ids[c], sims[r, c]
        else:
            ai = blocks == i
            aj = blocks == j
            A, B = V[ai], V[aj]
            if not len(A) or not len(B):
                return empty
            sims = _round_half_away((A @ B.T) / np.outer(norms[ai], norms[aj]))
            r, c = np.nonzero(sims >= threshold)
            ids_a, ids_b = ids[ai], ids[aj]
            left, right = ids_a[r], ids_b[c]
            v1, v2, s = np.minimum(left, right), np.maximum(left, right), sims[r, c]
        if not len(v1):
            return empty
        return pd.DataFrame({"v1": v1, "v2": v2, "sim": s})

    keys = (["_grp"] if group_col else []) + ["_g"]
    return exploded.groupBy(*keys).applyInPandas(_gemm, out_schema)


def semdedup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_cells: int = 16,
    n_blocks: int = 4,
    round_digits: int = 6,
    model=None,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Cluster-first semantic-dedup pair generation (SemDeDup, Abbas et
    al. 2023, arXiv:2303.09540 §3): spherical k-means partitions the
    corpus into ``n_cells`` IVF cells, then exact cosine pairs are
    computed ONLY within each cell. Cost drops from the global O(n^2) of
    :func:`blocked_cosine_pairs` to sum over cells of |cell|^2 — with
    n_cells grown proportionally to corpus size (the SemDeDup recipe:
    keep expected cell size constant), pair-generation flops scale
    LINEARLY in n. Cross-cell pairs are forgone by construction; that is
    the SemDeDup approximation — near-identical embeddings land in the
    same cell because the quantizer is trained on the same geometry.

    100 TB shape: ``sample_fraction`` trains the quantizer on a sample
    (assignment stays full-corpus, one broadcast-model map pass);
    ``n_blocks`` tiles each cell's GEMM so one skewed cell becomes
    B(B+1)/2 bounded tasks instead of an executor-OOM. Pass a pre-fitted
    ``model`` to amortize training across calls.

    Returns (v1, v2, sim) with v1 < v2 and rounded sim >= threshold —
    same contract as :func:`blocked_cosine_pairs`, which remains the
    exact/oracle path.
    """
    if model is None:
        if n_cells < 2:
            # one cell == all-pairs; skip the quantizer (Spark ML KMeans
            # rejects k=1) and run the exact blocked join directly
            return blocked_cosine_pairs(
                df, id_col, vec_col,
                threshold=threshold, n_blocks=n_blocks, round_digits=round_digits,
            )
        model = ivf_fit(
            df, vec_col, n_cells=n_cells, sample_fraction=sample_fraction
        )
    assigned = ivf_assign(model, df, vec_col)
    return blocked_cosine_pairs(
        assigned,
        id_col,
        vec_col,
        threshold=threshold,
        n_blocks=n_blocks,
        round_digits=round_digits,
        group_col="cell",
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure python, no numpy
    dependency at plan-build time; Box-Muller over a seeded LCG)."""
    import random

    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        nrm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / nrm for x in v])
    return planes


def random_hyperplane_buckets(
    df: DataFrame, vec_col: str, dim: int, n_planes: int = 8, seed: int = 42
) -> DataFrame:
    """Append a sign-bit LSH bucket id (long) for the vector column.
    Vectors with small angular distance land in the same bucket with
    probability (1 - theta/pi)^n_planes."""
    planes = _hyperplanes(dim, n_planes, seed)
    v = _as_double(F.col(vec_col))
    bucket = F.lit(0).cast("long")
    for j, p in enumerate(planes):
        proj = _dot(v, F.array(*[F.lit(x) for x in p]))
        bucket = bucket + F.when(proj >= 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.withColumn("bucket", bucket)


def multi_table_buckets(
    df: DataFrame, vec_col: str, dim: int, n_planes: int, n_tables: int, seed: int = 42
) -> DataFrame:
    """Explode each vector into one (table, bucket) row per hash table.
    Multi-table LSH is the standard recall lever: a neighbor with
    same-bucket probability p^k per table is found with 1-(1-p^k)^L over
    L tables. Fan-out is L rows per vector — shuffle-keyed, subquadratic."""
    v = _as_double(F.col(vec_col))
    entries = []
    for t_i in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t_i)
        bucket = F.lit(0).cast("long")
        for j, p in enumerate(planes):
            proj = _dot(v, F.array(*[F.lit(x) for x in p]))
            bucket = bucket + F.when(proj >= 0, F.lit(1 << j).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        entries.append(F.struct(F.lit(t_i).alias("table"), bucket.alias("bucket")))
    return df.withColumn("tb", F.explode(F.array(*entries))).select(
        *df.columns, F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket")
    )


def embedding_near_dup_pairs_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.4,
    n_planes: int = 6,
    n_tables: int = 12,
    round_digits: int = 6,
) -> DataFrame:
    """Scale path for embedding near-dup detection: candidate pairs from
    multi-table sign-LSH bucket collisions (self-join keyed on
    (table, bucket) — subquadratic), verified with exact cosine. Compare
    q_dedup_embedding's brute-force pair scan (exact, O(n^2)): this is
    what replaces it at 100 TB; recall vs brute force is tested.

    Shuffle discipline: the bucket self-join carries ONLY ids — vectors
    join back onto the deduped candidate pairs afterwards. Shipping the
    embedding through the n_tables-way explode and both join sides would
    multiply shuffle bytes by ~2*n_tables*dim.
    Returns (v1, v2, sim) with sim >= threshold."""
    ids_b = multi_table_buckets(
        df.select(id_col, vec_col), vec_col, dim, n_planes, n_tables
    ).select(id_col, "table", "bucket")
    a1 = ids_b.select(F.col(id_col).alias("v1"), "table", "bucket")
    a2 = ids_b.select(F.col(id_col).alias("v2"), "table", "bucket")
    cands = (
        a1.join(a2, ["table", "bucket"])
        .filter(F.col("v1") < F.col("v2"))
        .select("v1", "v2")
        .dropDuplicates(["v1", "v2"])
    )
    e1 = df.select(F.col(id_col).alias("v1"), F.col(vec_col).alias("e1"))
    e2 = df.select(F.col(id_col).alias("v2"), F.col(vec_col).alias("e2"))
    return (
        cands.join(e1, "v1")
        .join(e2, "v2")
        .select(
            "v1", "v2", F.round(cosine_pandas(F.col("e1"), F.col("e2")), round_digits).alias("sim")
        )
        .filter(F.col("sim") >= threshold)
    )


def ivf_fit(
    corpus: DataFrame,
    vec_col: str,
    n_cells: int = 16,
    seed: int = 42,
    max_iter: int = 20,
    sample_fraction: float | None = None,
):
    """Train an IVF coarse quantizer: distributed k-means over the corpus
    (Spark ML, cosine distance — spherical k-means, the standard coarse
    quantizer for cosine ANN; Jegou et al., "Product quantization for
    nearest neighbor search", 2011, use the same IVF cell structure).
    At 100 TB, pass ``sample_fraction`` — centroids converge on a sample
    and the full-corpus pass is assignment only. Returns the fitted
    KMeansModel."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(array_to_vector(_as_double(F.col(vec_col))).alias("features"))
    if sample_fraction is not None:
        train = train.sample(sample_fraction, seed=seed)
    km = KMeans(k=n_cells, seed=seed, maxIter=max_iter, distanceMeasure="cosine")
    return km.fit(train)


def ivf_assign(model, df: DataFrame, vec_col: str) -> DataFrame:
    """Append each vector's IVF cell id (the model broadcast rides the ML
    transform — one map pass, no shuffle)."""
    from pyspark.ml.functions import array_to_vector

    assigned = model.transform(
        df.withColumn("features", array_to_vector(_as_double(F.col(vec_col))))
    )
    return assigned.withColumnRenamed("prediction", "cell").drop("features")


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    round_digits: int = 6,
    model=None,
) -> DataFrame:
    """Approximate top-k via IVF: score only corpus vectors whose cell is
    among each query's ``n_probe`` nearest centroids. The alternative
    scale path to :func:`lsh_topk` — data-adaptive cells (k-means learns
    the corpus distribution) instead of data-oblivious hyperplanes, at
    the cost of a training pass; recall rises with n_probe/n_cells
    exactly as nprobe does in FAISS-style IVF indexes.

    Scale shape: centroids (n_cells x dim) are tiny and broadcast; the
    query->cell probe set is a broadcast equi-join key on the assigned
    corpus (shuffle-free candidate generation); exact cosine scoring +
    per-query top-k window run only on candidates. Pass a pre-fitted
    ``model`` (from :func:`ivf_fit`) to amortize training across calls —
    the production pattern; fitting in-line is the convenience path.
    Returns (q_id, vec_id, sim, rank)."""
    spark = corpus.sparkSession
    if model is None:
        model = ivf_fit(corpus, corpus_vec, n_cells=n_cells)
    cells = ivf_assign(model, corpus, corpus_vec)

    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    if centroids and len(centroids[0][1]) != dim:
        raise ValueError(
            f"ivf_topk dim={dim} does not match the fitted model's "
            f"centroid dimension {len(centroids[0][1])}"
        )
    cent_df = spark.createDataFrame(centroids, "cell int, centroid array<double>")
    q = queries.select(F.col(query_id).alias("q_id"), F.col(query_vec).alias("q_vec"))
    probed = (
        q.crossJoin(F.broadcast(cent_df))
        .select(
            "q_id",
            "q_vec",
            "cell",
            cosine_similarity_col(F.col("q_vec"), F.col("centroid")).alias("_csim"),
        )
        .withColumn(
            "_pr",
            F.row_number().over(
                W.partitionBy("q_id").orderBy(F.col("_csim").desc(), F.col("cell").asc())
            ),
        )
        .filter(F.col("_pr") <= n_probe)
        .select("q_id", "q_vec", "cell")
    )
    cands = cells.join(
        F.broadcast(probed.select("q_id", "cell")), "cell"
    ).dropDuplicates(["q_id", corpus_id])
    q_vecs = F.broadcast(probed.select("q_id", "q_vec").dropDuplicates(["q_id"]))
    scored = cands.join(q_vecs, "q_id").select(
        "q_id",
        F.col(corpus_id).alias("vec_id"),
        F.round(cosine_pandas(F.col("q_vec"), F.col(corpus_vec)), round_digits).alias("sim"),
    )
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 8,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing an LSH bucket
    with the query in at least one of ``n_tables`` hash tables. Candidate
    generation is an equi-join on (table, bucket) followed by a distinct —
    shuffle-keyed and subquadratic; recall = 1-(1-p^k)^L, tested against
    cosine_topk. Returns (q_id, vec_id, sim, rank)."""
    qb = multi_table_buckets(
        queries.select(F.col(query_id).alias("q_id"), F.col(query_vec).alias("q_vec")),
        "q_vec",
        dim,
        n_planes,
        n_tables,
    )
    cb = multi_table_buckets(corpus, corpus_vec, dim, n_planes, n_tables)
    cands = (
        cb.join(F.broadcast(qb.select("q_id", "table", "bucket")), ["table", "bucket"])
        .select("q_id", *[c for c in corpus.columns])
        .dropDuplicates(["q_id", corpus_id])
    )
    q_vecs = F.broadcast(qb.select("q_id", "q_vec").dropDuplicates(["q_id"]))
    scored = cands.join(q_vecs, "q_id").select(
        "q_id",
        F.col(corpus_id).alias("vec_id"),
        F.round(cosine_pandas(F.col("q_vec"), F.col(corpus_vec)), round_digits).alias("sim"),
    )
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def quantize_int8(df: DataFrame, vec_col: str, out_prefix: str = "q") -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q_i = floor(x_i / scale + 0.5). Adds ``{out_prefix}_scale`` (double)
    and ``{out_prefix}_vec`` (array<int> in [-127, 127]) columns.

    4x storage reduction for ANN corpora (the knob that matters at 100 TB
    of embeddings: a 64-dim float corpus becomes 64 bytes/vector + one
    scale). Reconstruction error is bounded by scale/2 per dimension.

    Engineering notes: the scale is materialized in a FIRST projection
    and the transform lambda references it as a plain attribute — Spark's
    higher-order functions are interpreted and re-evaluate embedded
    aggregate expressions per element, so inlining max|x| into the lambda
    is O(d^2) per row. Rounding is floor(x + 0.5) (half-toward-+inf), not
    round(): round() half-even vs half-away tie-breaks differ between
    engines, and the quantized grid makes midpoints reachable.
    Elements pass through an explicit double cast so the float32 source
    promotes identically in Spark and the DuckDB oracle."""
    eps = F.lit(1e-12)
    scaled = df.withColumn(
        f"{out_prefix}_scale",
        F.greatest(
            F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
            / F.lit(127.0),
            eps,
        ),
    )
    sc = F.col(f"{out_prefix}_scale")
    return scaled.withColumn(
        f"{out_prefix}_vec",
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") / sc + F.lit(0.5)).cast("int"),
        ),
    )
