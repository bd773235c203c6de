"""LLM-data-pipeline query coverage (SURVEY.md §7 step 9): deduplication,
similarity search, text analysis, multimodal plumbing, over the
``documents`` and ``embeddings`` tables.

Each query has a DuckDB oracle computing the identical deterministic
function (md5-based hashes, 6-decimal rounding) — the LSH-based operators
are engineered so their verified output equals the exact computation the
oracle runs (see functions.dedup docstrings), keeping them hash-checkable
while the Spark path stays subquadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ray_beam_runner_spark.queries import query, t

# Shared SQL fragments for the oracles (keep in lockstep with functions.text).
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS = f"string_split({_NORM}, ' ')"
_G3 = (
    "list_transform(generate_series(1, len(w) - 2), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])"
)
_STOP_EN = "'the','a','an','and','of','to','in','is','it','for','on','with'"
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
# Single quote doubled for embedding in a SQL string literal.
_PUNCT_RE = "[.,!?;:''\"()\\-]"


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "q_dedup_exact",
    oracle=f"""
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents GROUP BY {_NORM}
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: one hash-groupBy, min-id survivor."""
    from ray_beam_runner_spark.functions.dedup import exact_dedup

    return exact_dedup(t(spark, sf_dir, "documents"), "text", "doc_id")


_JACCARD_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS w FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id, unnest({_G3}) AS g FROM toks)),
    sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT d1, d2, jaccard FROM (
      SELECT d1, d2, round(i::DOUBLE / (s1.n + s2.n - i), 6) AS jaccard
      FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2)
    WHERE jaccard >= 0.5
    """


@query("q_dedup_ngram_jaccard", oracle=_JACCARD_ORACLE)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact word-3-gram Jaccard >= 0.5 (postings join)."""
    from ray_beam_runner_spark.functions.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(t(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.5)


@query("q_dedup_minhash_lsh", oracle=_JACCARD_ORACLE)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same pair set found via MinHash-LSH with exact-Jaccard verification
    of candidates only, over ONE persisted shingle-postings pass. Banding
    is auto-sized by lsh_banding(0.5) so a pair AT the threshold is
    detected with prob >= 1-1e-6 (r=3, b=104): the verified output equals
    the exact pair set the oracle computes for ANY corpus, not just ones
    with a similarity gap below the threshold. r>1 keeps the candidate
    set near the true near-dup set instead of every loosely-similar pair
    (the r=1 failure mode at corpus scale). See
    functions.dedup.minhash_lsh_pairs for the math."""
    from ray_beam_runner_spark.functions.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=3,
        threshold=0.5,
    )


@query(
    "q_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE
    toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id, unnest({_G3}) AS g FROM toks)),
    sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT d1, d2 FROM (
        SELECT d1, d2, round(i::DOUBLE / (s1.n + s2.n - i), 6) AS jaccard
        FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2)
      WHERE jaccard >= 0.5),
    edges AS (SELECT d1 AS u, d2 AS v FROM pairs UNION SELECT d2, d1 FROM pairs),
    reach(a, b) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u),
    comp AS (SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a)
    SELECT doc_id,
           coalesce(component, doc_id) AS cluster,
           coalesce(component, doc_id) = doc_id AS is_survivor
    FROM documents LEFT JOIN comp ON doc_id = node
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the exact-Jaccard
    pair graph (threshold 0.5), every document labeled with its
    component's min doc_id and a keep/drop survivor flag — the step a
    real dedup pipeline runs between pair generation and survivor
    selection. Spark side: alternating large-star/small-star rounds
    (Kiveris et al. 2014), O(log n) shuffle-keyed iterations with
    per-round lineage truncation; oracle side: DuckDB recursive-CTE
    transitive closure of the same pair set."""
    from ray_beam_runner_spark.functions.dedup import ngram_jaccard_pairs
    from ray_beam_runner_spark.functions.graph import dedup_clusters

    docs = t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    return dedup_clusters(docs, pairs, id_col="doc_id")


@query(
    "q_split_leakage_safe",
    oracle=f"""
    WITH RECURSIVE
    toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id, unnest({_G3}) AS g FROM toks)),
    sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT d1, d2 FROM (
        SELECT d1, d2, round(i::DOUBLE / (s1.n + s2.n - i), 6) AS jaccard
        FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2)
      WHERE jaccard >= 0.5),
    edges AS (SELECT d1 AS u, d2 AS v FROM pairs UNION SELECT d2, d1 FROM pairs),
    reach(a, b) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u),
    comp AS (SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a)
    SELECT doc_id,
           coalesce(component, doc_id) AS cluster,
           CASE WHEN ('0x' || substr(md5('leaksplit:' ||
                          coalesce(component, doc_id)::VARCHAR), 1, 8))::BIGINT
                     % 100 < 90
                THEN 'train' ELSE 'val' END AS split
    FROM documents LEFT JOIN comp ON doc_id = node
    """,
)
def q_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val split: the per-doc hash split
    (q_train_val_split) can strand one copy of a near-duplicate pair in
    train and its twin in validation — self-contamination that inflates
    eval exactly like benchmark contamination does. This query splits
    by near-dup CLUSTER instead (functions.dedup.leakage_safe_split):
    exact-Jaccard pairs at 0.5 → connected components → md5 hash of
    the CLUSTER id decides the side, so duplicates cannot straddle the
    boundary by construction. The oracle replays clustering (recursive
    CTE closure) and the cluster-keyed hash decision; a single doc
    split apart from its cluster breaks the hash. Scale: clustering
    cost is proportional to the near-dup graph, the split adds one
    expression — no new shuffle."""
    from ray_beam_runner_spark.functions.dedup import (
        leakage_safe_split,
        ngram_jaccard_pairs,
    )

    docs = t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    return leakage_safe_split(docs, pairs, id_col="doc_id", val_pct=10)


@query(
    "q_dedup_simhash",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, t FROM (
        SELECT doc_id, unnest({_TOKS}) AS t FROM documents)),
    h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS h FROM tok),
    bits AS (
      SELECT doc_id, j, sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h CROSS JOIN generate_series(0, 31) js(j)
      GROUP BY doc_id, j)
    SELECT doc_id, sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash signature per document (md5-derived token hashes so
    the oracle reproduces the exact value)."""
    from ray_beam_runner_spark.functions.dedup import simhash

    return simhash(t(spark, sf_dir, "documents"), "doc_id", "text").withColumnRenamed(
        "id", "doc_id"
    )


def _phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared pipeline for the perceptual-dedup queries: synthesize one
    8x8 PNG per document (group pattern + per-doc brightness offset),
    decode with the from-scratch codec, aHash, and band into Hamming<=3
    pairs. The doc_id projection prunes the scan to a few KB, which
    parquet split-sizing then reads as ONE task — serializing the
    per-image Python codec work behind it — so the synth/decode chain
    is spread across the session's cores explicitly (at corpus scale a
    real image table arrives already partitioned; this is the
    tiny-input analog). The 16-bytes-per-image hash frame is persisted:
    hamming_pairs self-joins it, and without the persist BOTH join
    sides would re-run the decode chain."""
    from collections.abc import Iterator

    import pandas as pd

    from ray_beam_runner_spark.caches import track
    from ray_beam_runner_spark.functions.dedup import hamming_pairs
    from ray_beam_runner_spark.functions.multimodal import (
        attach_media,
        extract_image_phash,
    )

    par = spark.sparkContext.defaultParallelism
    docs = t(spark, sf_dir, "documents").select("doc_id").repartition(par)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        from ray_beam_runner_spark.functions.multimodal import encode_png

        pattern_cache: dict[int, int] = {}

        def pattern(g: int) -> int:
            if g not in pattern_cache:
                pattern_cache[g] = int(
                    hashlib.md5(f"phash:{g}".encode()).hexdigest()[:15], 16
                )
            return pattern_cache[g]

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                p, o = pattern(d % 64), (d // 64) % 40
                bits = (p >> np.arange(64)) & 1
                arr = (50 + o + 150 * bits).astype(np.uint8).reshape(8, 8)
                payloads.append(encode_png(arr, filter_type=1))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    pngs = docs.mapInPandas(synth, schema="doc_id long, payload binary")
    media = attach_media(pngs, "doc_id", "payload", modality="image")
    hashes = track(extract_image_phash(media))
    return hamming_pairs(hashes, "media_id", "ahash", max_hamming=3, bits=64)


@query(
    "q_dedup_phash",
    oracle="""
    WITH pat AS (
      SELECT g, ('0x' || substr(md5('phash:' || g), 1, 15))::BIGINT AS p
      FROM (SELECT unnest(range(64)) AS g)),
    cnt AS (
      SELECT doc_id % 64 AS g, count(*)::BIGINT AS n
      FROM documents GROUP BY 1)
    SELECT c1.g AS g1, c2.g AS g2,
           bit_count(xor(p1.p, p2.p))::BIGINT AS hamming,
           (CASE WHEN c1.g = c2.g THEN (c1.n * (c1.n - 1)) // 2
                 ELSE c1.n * c2.n END)::BIGINT AS n_pairs
    FROM cnt c1 JOIN cnt c2 ON c1.g <= c2.g
    JOIN pat p1 ON p1.g = c1.g
    JOIN pat p2 ON p2.g = c2.g
    WHERE bit_count(xor(p1.p, p2.p)) <= 3
      AND (c1.g < c2.g OR c1.n >= 2)
    """,
)
def q_dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual IMAGE dedup end to end (r8 verdict ask #2): synthesize
    one 8x8 grayscale PNG per document — pixel (r, c) is 200 where bit
    r*8+c of a 60-bit md5-derived GROUP pattern (group = doc_id % 64)
    is set, else 50, plus a per-doc brightness offset (doc_id//64 % 40)
    — then decode with the from-scratch codec, compute the integer-exact
    64-bit AVERAGE HASH (functions.multimodal.ahash64: block means vs
    global mean via cross-multiplication, no floats), and find all
    pairs within Hamming distance 3 via pigeonhole banding
    (functions.dedup.hamming_pairs — keyed (band, value) self-join,
    NEVER all-pairs; plan-asserted in tests/test_plans.py). aHash is
    brightness-shift invariant, so same-group images hash identically
    despite different offsets; the result aggregates pairs per group
    pair. The oracle restates the hash in closed form: each group's
    aHash IS its md5 pattern (strict-majority threshold), so pair
    counts and Hamming distances are pure SQL over 64 patterns — a
    codec bug, a hash bit off, or a banding recall loss all break the
    hash. The DCT pHash variant (dct_phash64) shares the kernel and is
    differentially pytest-verified (float DCT is not SQL-restatable)."""
    pairs = _phash_pairs(spark, sf_dir)
    return (
        pairs.select(
            F.least(F.col("d1") % 64, F.col("d2") % 64).alias("g1"),
            F.greatest(F.col("d1") % 64, F.col("d2") % 64).alias("g2"),
            F.col("hamming").cast("long").alias("hamming"),
        )
        .groupBy("g1", "g2", "hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "q_dedup_phash_clusters",
    oracle="""
    WITH RECURSIVE pat AS (
      SELECT g, ('0x' || substr(md5('phash:' || g), 1, 15))::BIGINT AS p
      FROM (SELECT unnest(range(64)) AS g)),
    e0 AS (
      SELECT p1.g AS u, p2.g AS v FROM pat p1 JOIN pat p2
      ON p1.g < p2.g AND bit_count(xor(p1.p, p2.p)) <= 3),
    edges AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
    reach(a, b) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u),
    comp AS (SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a)
    SELECT d.doc_id,
           coalesce(comp.component, d.doc_id % 64) AS cluster,
           d.doc_id = coalesce(comp.component, d.doc_id % 64) AS is_survivor
    FROM documents d LEFT JOIN comp ON comp.node = d.doc_id % 64
    """,
)
def q_dedup_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image dup CLUSTERS — pair→cluster parity for the perceptual
    path (the text path has q_dedup_ngram_jaccard → q_dedup_clusters;
    this is q_dedup_phash → connected components): every document
    labeled with its Hamming-component's min doc_id and a survivor
    flag, the structure an image-dedup pipeline keys survivor
    selection on. Spark: the shared banded-pair pipeline feeds the
    large-star/small-star iteration — pairs are same-group (identical
    aHash) plus cross-group links within Hamming 3, so doc components
    are unions of GROUPS connected in pattern space. The oracle
    exploits exactly that: a recursive-CTE closure over the 64-node
    pattern graph, with each doc's cluster = its pattern component's
    min group (doc ids 0..63 realize every group, so the min group IS
    the min doc id). One mis-banded pair or a CC bug re-labels some
    doc and breaks the hash."""
    from ray_beam_runner_spark.functions.graph import dedup_clusters

    docs = t(spark, sf_dir, "documents")
    pairs = _phash_pairs(spark, sf_dir)
    return dedup_clusters(docs, pairs, id_col="doc_id")


@query(
    "q_dedup_embedding",
    oracle="""
    SELECT a.vec_id AS v1, b.vec_id AS v2, sim FROM (
      SELECT a.vec_id, b.vec_id,
             round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) s(vec_id, vec_id_b, sim)
    JOIN embeddings a ON a.vec_id = s.vec_id
    JOIN embeddings b ON b.vec_id = s.vec_id_b
    WHERE sim >= 0.4
    """,
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (sim >= 0.4), EXACT, via blocked
    all-pairs GEMM: equi-shuffle on block-pair key + one numpy matmul per
    group — no BroadcastNestedLoopJoin, no per-pair Python. Exact (not
    LSH) because this corpus has no similarity gap at the threshold
    (measured min qualifying sim 0.4005 with 3217 pairs just below at
    sf0.1; multi-table sign-LSH recall at the threshold measured 0.56) —
    see functions.similarity.blocked_cosine_pairs. The subquadratic LSH
    path (embedding_near_dup_pairs_lsh) remains the scale strategy for
    gapped near-dup regimes and is recall-tested separately."""
    from ray_beam_runner_spark.functions.similarity import blocked_cosine_pairs

    return blocked_cosine_pairs(
        t(spark, sf_dir, "embeddings"), "vec_id", "embedding", threshold=0.4, n_blocks=16
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@query(
    "q_similarity_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id >= 8),
    s AS (SELECT q_id, vec_id, round(list_cosine_similarity(qv, cv), 6) AS sim
          FROM q CROSS JOIN c)
    SELECT q_id, vec_id, sim, rank FROM (
      SELECT q_id, vec_id, sim,
             row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id)::INT AS rank
      FROM s)
    WHERE rank <= 5
    """,
)
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for a bounded query set (vec_id < 8) over
    the rest of the corpus: broadcast queries, one corpus scan, window
    rank. Similarities rounded to 6 decimals before ranking for
    cross-engine determinism."""
    from ray_beam_runner_spark.functions.similarity import cosine_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.filter(F.col("vec_id") >= 8)
    return cosine_topk(queries, corpus, k=5)


@query(
    "q_hard_negatives",
    oracle="""
    WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv, label AS ql
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS cv, label AS cl
          FROM embeddings WHERE vec_id >= 8),
    s AS (SELECT q_id, vec_id, round(list_cosine_similarity(qv, cv), 6) AS sim
          FROM q CROSS JOIN c WHERE ql <> cl)
    SELECT q_id, vec_id, sim, rank FROM (
      SELECT q_id, vec_id, sim,
             row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id)::INT AS rank
      FROM s WHERE sim < 0.9)
    WHERE rank <= 5
    """,
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE mining for contrastive training
    (functions.similarity.hard_negatives — the DPR/SimCSE data step):
    per anchor, the 5 most similar corpus vectors that are neither
    near-duplicates (sim >= 0.9 treated as duplicate, not negative —
    undetected dups among negatives are false negatives that poison
    the contrastive loss) nor same-label (in-class examples are
    potential positives, excluded via the explicit pair frame). Both
    exclusion layers sit inside the hash: a duplicate leaking into the
    negatives, a same-label pair surviving, or a rank shift all break
    it. Scale shape: broadcast anchors, one corpus scan, keyed
    anti-join, window rank — identical to q_similarity_topk plus the
    exclusions."""
    from ray_beam_runner_spark.functions.similarity import hard_negatives

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"), "label"
    )
    corpus = emb.filter(F.col("vec_id") >= 8)
    same_label = queries.select("q_id", "label").join(
        corpus.select("vec_id", "label"), "label"
    ).select("q_id", "vec_id")
    return hard_negatives(
        queries,
        corpus,
        k=5,
        dup_threshold=0.9,
        exclude=same_label,
        query_id="q_id",
        query_vec="q_vec",
    )


@query(
    "q_similarity_ivf",
    oracle="""
    WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id >= 8),
    s AS (SELECT q_id, vec_id, round(list_cosine_similarity(qv, cv), 6) AS sim
          FROM q CROSS JOIN c)
    SELECT q_id, vec_id, sim, rank FROM (
      SELECT q_id, vec_id, sim,
             row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id)::INT AS rank
      FROM s)
    WHERE rank <= 5
    """,
)
def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k through the IVF index machinery (k-means coarse quantizer +
    cell-probed search), hash-gated by probing ALL cells: with
    n_probe == n_cells the candidate set is the whole corpus, so the IVF
    path must reproduce the exact brute-force top-k the oracle computes —
    exercising training, assignment, probing, and scoring end-to-end.
    Production uses n_probe << n_cells (recall-tested in
    test_ivf_recall_vs_bruteforce)."""
    from ray_beam_runner_spark.functions.similarity import ivf_topk

    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.filter(F.col("vec_id") >= 8)
    return ivf_topk(q, corpus, dim=64, k=5, n_cells=8, n_probe=8)


def _kmeans_oracle(k: int, n_iter: int) -> str:
    """Per-round CTE oracle for fixed-iteration Lloyd k-means (the
    pagerank oracle pattern): c0 = vectors of the k smallest ids;
    each round computes exact squared-L2 assignments (tie to lowest
    cell) then per-(cell, dim) means; one final assignment. Distances
    fold dimension order with the same double subtract-square-add as
    the Spark side, so argmins agree exactly."""
    sq = (
        "(CAST(v.e[i] AS DOUBLE) - CAST({c}.c[i] AS DOUBLE))"
        " * (CAST(v.e[i] AS DOUBLE) - CAST({c}.c[i] AS DOUBLE))"
    )

    def d_cte(r, csrc):
        return f"""
    d{r} AS (
      SELECT v.vid, {csrc}.cell,
             list_sum(list_transform(generate_series(1, len(v.e)),
                      i -> {sq.format(c=csrc)})) AS d
      FROM v, {csrc}),
    a{r} AS (SELECT vid, cell FROM (
        SELECT vid, cell, row_number() OVER (PARTITION BY vid ORDER BY d, cell) AS rn
        FROM d{r}) WHERE rn = 1)"""

    parts = [
        f"""WITH v AS (SELECT vec_id AS vid, embedding AS e FROM embeddings),
    c0 AS (
      SELECT (row_number() OVER (ORDER BY vid) - 1) AS cell, e AS c
      FROM (SELECT vid, e FROM v ORDER BY vid LIMIT {k}))"""
    ]
    for r in range(1, n_iter + 1):
        parts.append(d_cte(r, f"c{r - 1}"))
        parts.append(f"""
    ex{r} AS (
      SELECT a{r}.cell, v.e, unnest(generate_series(1, len(v.e))) AS i
      FROM a{r} JOIN v USING (vid)),
    c{r} AS (
      SELECT cell, list(m ORDER BY i) AS c
      FROM (SELECT cell, i, round(avg(CAST(e[i] AS DOUBLE)), 9) AS m
            FROM ex{r} GROUP BY cell, i)
      GROUP BY cell)""")
    parts.append(d_cte(n_iter + 1, f"c{n_iter}"))
    return (
        ",".join(parts)
        + f"\n    SELECT vid AS vec_id, cell FROM a{n_iter + 1}"
    )


@query("q_kmeans", oracle=_kmeans_oracle(k=8, n_iter=2))
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (fixed-iteration Lloyd) as pure DataFrame
    algebra over the embedding corpus — the exact, hash-checkable twin
    of the Spark-ML quantizer behind IVF/SemDeDup (whose training was
    previously the one rows-only-verified piece of the ANN family).
    Deterministic init (k smallest ids), argmin ties to the lowest
    cell, 2 (assign, update) rounds + final assignment, centroid means
    rounded to 9 dp so summation order cannot skew the iteration; per
    round ONE broadcast join + map-side-combinable mean over the
    corpus. See functions.clustering.kmeans_lloyd."""
    from ray_beam_runner_spark.functions.clustering import kmeans_lloyd

    return kmeans_lloyd(t(spark, sf_dir, "embeddings"), "vec_id", "embedding", k=8, n_iter=2)


def _pq_oracle(m: int, k: int, n_iter: int, dim: int) -> str:
    """Full product-quantization pipeline oracle: per subspace the same
    per-round Lloyd CTEs as q_kmeans (on the DuckDB 1-based slice
    e[lo:hi]), then codes = final argmin, then ADC = j-ascending sum of
    query->codebook partial distances, rounded 6 dp with id tie-break
    (the q_similarity_topk determinism recipe)."""
    d = dim // m

    def sq(svar, cvar):
        diff = f"(CAST({svar}[i] AS DOUBLE) - CAST({cvar}[i] AS DOUBLE))"
        return f"{diff} * {diff}"

    def dist(src, cb, alias):
        return (
            f"{alias} AS (SELECT {src}.vid, {cb}.cell,\n"
            f"      list_sum(list_transform(generate_series(1, {d}),"
            f" i -> {sq(f'{src}.s', f'{cb}.c')})) AS dd\n"
            f"      FROM {src}, {cb})"
        )

    parts = [
        "WITH v AS (SELECT vec_id AS vid, embedding AS e FROM embeddings WHERE vec_id >= 8)",
        "q AS (SELECT vec_id AS qid, embedding AS e FROM embeddings WHERE vec_id < 8)",
    ]
    for j in range(m):
        lo, hi = j * d + 1, (j + 1) * d
        parts.append(f"s{j} AS (SELECT vid, e[{lo}:{hi}] AS s FROM v)")
        parts.append(
            f"cb{j}_0 AS (SELECT (row_number() OVER (ORDER BY vid) - 1) AS cell,"
            f" s AS c FROM (SELECT vid, s FROM s{j} ORDER BY vid LIMIT {k}))"
        )
        for r in range(1, n_iter + 1):
            parts.append(dist(f"s{j}", f"cb{j}_{r - 1}", f"dd{j}_{r}"))
            parts.append(
                f"asg{j}_{r} AS (SELECT vid, cell FROM (SELECT vid, cell,"
                f" row_number() OVER (PARTITION BY vid ORDER BY dd, cell) AS rn"
                f" FROM dd{j}_{r}) WHERE rn = 1)"
            )
            parts.append(
                f"cb{j}_{r} AS (SELECT cell, list(mm ORDER BY i) AS c FROM ("
                f"SELECT a.cell, t.i, round(avg(CAST(s{j}.s[t.i] AS DOUBLE)), 9) AS mm"
                f" FROM asg{j}_{r} a JOIN s{j} USING (vid),"
                f" (SELECT unnest(generate_series(1, {d})) AS i) t"
                f" GROUP BY a.cell, t.i) GROUP BY cell)"
            )
        fin = n_iter + 1
        parts.append(dist(f"s{j}", f"cb{j}_{n_iter}", f"dd{j}_{fin}"))
        parts.append(
            f"code{j} AS (SELECT vid, cell FROM (SELECT vid, cell,"
            f" row_number() OVER (PARTITION BY vid ORDER BY dd, cell) AS rn"
            f" FROM dd{j}_{fin}) WHERE rn = 1)"
        )
        parts.append(f"qs{j} AS (SELECT qid AS vid, e[{lo}:{hi}] AS s FROM q)")
        # query-side partials: same dist CTE with vid re-labeled qid
        parts.append(
            dist(f"qs{j}", f"cb{j}_{n_iter}", f"qd{j}").replace(
                f"qd{j} AS (SELECT qs{j}.vid",
                f"qd{j} AS (SELECT qs{j}.vid AS qid",
            )
        )
    joins = " ".join(
        f"JOIN code{j} c{j} USING (vid) JOIN qd{j} q{j} ON q{j}.cell = c{j}.cell"
        + (" AND q{}.qid = q0.qid".format(j) if j else "")
        for j in range(m)
    )
    adc = " + ".join(f"q{j}.dd" for j in range(m))
    parts.append(
        f"sc AS (SELECT q0.qid, b.vid, round({adc}, 6) AS adc\n"
        f"      FROM (SELECT DISTINCT vid FROM v) b {joins})"
    )
    return (
        ",\n    ".join(parts)
        + """
    SELECT qid AS q_id, vid AS vec_id, adc, rank FROM (
      SELECT qid, vid, adc,
             row_number() OVER (PARTITION BY qid ORDER BY adc, vid)::INT AS rank
      FROM sc)
    WHERE rank <= 5
    """
    )


@query("q_pq_topk", oracle=_pq_oracle(m=2, k=4, n_iter=1, dim=64))
def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN end to end, hash-checked: fit m=2
    deterministic Lloyd codebooks on the corpus (vec_id >= 8), encode
    it to 2 small codes per vector (64 floats -> 2 cells), then answer
    the q_similarity query set (vec_id < 8) by asymmetric distance —
    an m-term codebook lookup per candidate instead of a 64-term dot
    product (Jegou et al. 2011, the economics of billion-vector
    search). The oracle replays the IDENTICAL pipeline in SQL (per-
    round Lloyd CTEs per subspace, j-ordered ADC fold, 6-dp rounding,
    id tie-break), so training, encoding, and search are all inside
    the hash. See functions.clustering.pq_fit/pq_encode/pq_adc_topk."""
    from ray_beam_runner_spark.functions.clustering import (
        pq_adc_topk,
        pq_encode,
        pq_fit,
    )

    emb = t(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 8)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    books = pq_fit(corpus, "vec_id", "embedding", m=2, k=4, n_iter=1)
    codes = pq_encode(corpus, books, "vec_id", "embedding")
    return pq_adc_topk(queries, codes, books, k=5)


def _ivfpq_oracle(
    n_cells: int,
    m: int,
    k: int,
    n_iter: int,
    dim: int,
    corpus_where: str = "vec_id >= 8",
    train_where: str | None = None,
    prelude: list[str] | None = None,
    v_sql: str | None = None,
    q_sql: str | None = None,
    tail: str | None = None,
) -> str:
    """Composed IVF-PQ oracle: coarse Lloyd CTEs on full vectors,
    residuals against the final coarse centroids, per-subspace Lloyd
    CTEs on the residuals, codes, then exhaustive-probe residual-ADC
    (j-ascending fold, 6 dp, id tie-break). ``train_where`` (default:
    the corpus itself) restates the FROZEN-quantizer contract of
    incremental index maintenance: Lloyd CTEs (coarse + books) run over
    the TRAIN slice only, while assignments/codes/search run over
    ``corpus_where`` — exactly what ivfpq_encode against a fitted
    quantizer computes for vectors that arrived after the fit.

    Composition hooks (the corpus-cascade hybrid oracle builds its ANN
    leg from the same verified machinery): ``prelude`` = CTEs emitted
    before everything (e.g. computing embeddings from document text);
    ``v_sql``/``q_sql`` override the corpus/query CTE definitions (must
    define v(vid, e) and q(qid, e)); ``tail`` replaces the final SELECT
    — pass "" to keep composing CTEs after the ADC scores in ``sc``."""
    d = dim // m

    def sq(a, b):
        t = f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
        return f"{t} * {t}"

    def dist(src, cb, alias, length, id_cols="vid"):
        return (
            f"{alias} AS (SELECT {', '.join(f'{src}.{c}' for c in id_cols.split(','))},"
            f" {cb}.cell AS ccell,\n"
            f"      list_sum(list_transform(generate_series(1, {length}),"
            f" i -> {sq(f'{src}.s', f'{cb}.c')})) AS dd\n"
            f"      FROM {src}, {cb})"
        )

    def argmin(src, alias, id_cols="vid"):
        ids = ", ".join(id_cols.split(","))
        return (
            f"{alias} AS (SELECT {ids}, ccell AS cell FROM (SELECT {ids}, ccell,"
            f" row_number() OVER (PARTITION BY {ids} ORDER BY dd, ccell) AS rn"
            f" FROM {src}) WHERE rn = 1)"
        )

    def lloyd(prefix, src, length, kk):
        """CTEs prefix_0..prefix_{n_iter} codebooks over src(vid, s)."""
        out = [
            f"{prefix}_0 AS (SELECT (row_number() OVER (ORDER BY vid) - 1) AS cell,"
            f" s AS c FROM (SELECT vid, s FROM {src} ORDER BY vid LIMIT {kk}))"
        ]
        for r in range(1, n_iter + 1):
            out.append(dist(src, f"{prefix}_{r - 1}", f"{prefix}d{r}", length))
            out.append(argmin(f"{prefix}d{r}", f"{prefix}a{r}"))
            out.append(
                f"{prefix}_{r} AS (SELECT cell, list(mm ORDER BY i) AS c FROM ("
                f"SELECT a.cell, t.i, round(avg(CAST({src}.s[t.i] AS DOUBLE)), 9) AS mm"
                f" FROM {prefix}a{r} a JOIN {src} USING (vid),"
                f" (SELECT unnest(generate_series(1, {length})) AS i) t"
                f" GROUP BY a.cell, t.i) GROUP BY cell)"
            )
        return out

    parts = list(prelude or [])
    parts += [
        v_sql
        or f"v AS (SELECT vec_id AS vid, embedding AS e FROM embeddings"
        f" WHERE {corpus_where})",
        q_sql
        or "q AS (SELECT vec_id AS qid, embedding AS e FROM embeddings WHERE vec_id < 8)",
        "vs AS (SELECT vid, e AS s FROM v)",
    ]
    # training slice: defaults to the corpus itself; a distinct slice
    # models the frozen quantizer of incremental maintenance
    if train_where is None:
        train_src, train_res = "vs", "res"
    else:
        parts.append(
            f"vt AS (SELECT vec_id AS vid, embedding AS e FROM embeddings"
            f" WHERE {train_where})"
        )
        parts.append("vts AS (SELECT vid, e AS s FROM vt)")
        train_src, train_res = "vts", "resT"
    parts += lloyd("gc", train_src, dim, n_cells)
    parts.append(dist("vs", f"gc_{n_iter}", "gdF", dim))
    parts.append(argmin("gdF", "gaF"))
    parts.append(
        f"res AS (SELECT v.vid, a.cell, list_transform(generate_series(1, {dim}),"
        f" i -> CAST(v.e[i] AS DOUBLE) - CAST(c.c[i] AS DOUBLE)) AS e\n"
        f"      FROM v JOIN gaF a USING (vid) JOIN gc_{n_iter} c ON c.cell = a.cell)"
    )
    if train_where is not None:
        parts.append(dist("vts", f"gc_{n_iter}", "gdT", dim))
        parts.append(argmin("gdT", "gaT"))
        parts.append(
            f"resT AS (SELECT vt.vid, a.cell, list_transform(generate_series(1, {dim}),"
            f" i -> CAST(vt.e[i] AS DOUBLE) - CAST(c.c[i] AS DOUBLE)) AS e\n"
            f"      FROM vt JOIN gaT a USING (vid) JOIN gc_{n_iter} c ON c.cell = a.cell)"
        )
    parts.append(
        f"qres AS (SELECT q.qid, c.cell, list_transform(generate_series(1, {dim}),"
        f" i -> CAST(q.e[i] AS DOUBLE) - CAST(c.c[i] AS DOUBLE)) AS e\n"
        f"      FROM q, gc_{n_iter} c)"
    )
    for j in range(m):
        lo, hi = j * d + 1, (j + 1) * d
        parts.append(f"rs{j} AS (SELECT vid, e[{lo}:{hi}] AS s FROM res)")
        if train_where is not None:
            parts.append(f"rsT{j} AS (SELECT vid, e[{lo}:{hi}] AS s FROM {train_res})")
            parts += lloyd(f"pb{j}", f"rsT{j}", d, k)
        else:
            parts += lloyd(f"pb{j}", f"rs{j}", d, k)
        parts.append(dist(f"rs{j}", f"pb{j}_{n_iter}", f"pd{j}F", d))
        parts.append(argmin(f"pd{j}F", f"code{j}"))
        parts.append(f"qrs{j} AS (SELECT qid, cell, e[{lo}:{hi}] AS s FROM qres)")
        parts.append(
            f"qd{j} AS (SELECT qrs{j}.qid, qrs{j}.cell, b.cell AS code,\n"
            f"      list_sum(list_transform(generate_series(1, {d}),"
            f" i -> {sq(f'qrs{j}.s', 'b.c')})) AS dp\n"
            f"      FROM qrs{j}, pb{j}_{n_iter} b)"
        )
    code_joins = " ".join(
        f"JOIN code{j} c{j} USING (vid) "
        f"JOIN qd{j} q{j} ON q{j}.cell = a.cell AND q{j}.code = c{j}.cell"
        + (f" AND q{j}.qid = q0.qid" if j else "")
        for j in range(m)
    )
    adc = " + ".join(f"q{j}.dp" for j in range(m))
    parts.append(
        f"sc AS (SELECT q0.qid, a.vid, round({adc}, 6) AS adc\n"
        f"      FROM gaF a {code_joins})"
    )
    default_tail = """
    SELECT qid AS q_id, vid AS vec_id, adc, rank FROM (
      SELECT qid, vid, adc,
             row_number() OVER (PARTITION BY qid ORDER BY adc, vid)::INT AS rank
      FROM sc)
    WHERE rank <= 5
    """
    return (
        "WITH "
        + ",\n    ".join(parts)
        + (tail if tail is not None else default_tail)
    )


@query("q_ivfpq_topk", oracle=_ivfpq_oracle(n_cells=4, m=2, k=4, n_iter=1, dim=64))
def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed IVF-PQ ANN (FAISS IVFPQ) end to end, hash-checked:
    deterministic coarse Lloyd cells on the corpus (vec_id >= 8),
    product-quantization codebooks trained on the RESIDUALS (vector
    minus its cell centroid — the variance reduction that makes the
    code budget count), per-vector (cell, codes) index, then
    exhaustive-probe residual-ADC search for the query set (vec_id <
    8). Exhaustive probing is the gating mode — the answer is pure
    residual-ADC, fully deterministic, so the oracle replays the
    ENTIRE composed pipeline in SQL; production uses n_probe <<
    n_cells (recall-tested in test_ivfpq_recall). See
    functions.clustering.ivfpq_index/ivfpq_topk."""
    from ray_beam_runner_spark.functions.clustering import ivfpq_index, ivfpq_topk

    emb = t(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 8)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    coarse, books, index = ivfpq_index(
        corpus, "vec_id", "embedding", n_cells=4, m=2, k=4, n_iter=1
    )
    return ivfpq_topk(queries, coarse, books, index, k=5)


@query(
    "q_ivfpq_incremental",
    oracle=_ivfpq_oracle(
        n_cells=4, m=2, k=4, n_iter=1, dim=64,
        corpus_where="vec_id >= 8 AND vec_id % 7 <> 0",
        train_where="vec_id >= 8 AND vec_id % 3 <> 0",
    ),
)
def q_ivfpq_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTALLY MAINTAINED IVF-PQ index, oracle-checked through
    exhaustive-probe search (r8 verdict ask #3): fit the quantizer on
    the initial corpus slice (vec_id % 3 != 0 — FROZEN thereafter),
    seed source + index snapshot tables, then drive the index purely
    from the source's CHANGE FEED: a CDC merge ingests the remaining
    vectors (encoded against the frozen quantizer and MERGEd in —
    FAISS add-after-train), a CDC delete retracts every 7th vector
    (file-pruned keyed DELETE on the index). The search then runs over
    the MAINTAINED index table; the oracle replays the same contract in
    SQL — Lloyd CTEs over the TRAIN slice only, codes and residual-ADC
    over the final merged-minus-deleted corpus. A maintenance bug
    (stale codes, unretracted vectors, re-fit drift) breaks the hash.
    Per trigger the corpus is never rescanned: only batch vectors are
    encoded and only affected index files rewritten. See
    functions.clustering.stream_maintain_ivfpq / ivfpq_encode."""
    from ray_beam_runner_spark.functions.clustering import (
        ivfpq_index,
        ivfpq_topk,
        stream_maintain_ivfpq,
    )
    from ray_beam_runner_spark.queries import scratch_dir
    from ray_beam_runner_spark.sources import snapshots as snap

    emb = t(spark, sf_dir, "embeddings")
    initial = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") % 3 != 0)).select(
        "vec_id", "embedding"
    )
    arriving = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") % 3 == 0)).select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    coarse, books, idx0 = ivfpq_index(
        initial, "vec_id", "embedding", n_cells=4, m=2, k=4, n_iter=1
    )
    # freeze the quantizer: materialized once, identical in every batch
    coarse = coarse.localCheckpoint(eager=True)
    books = books.localCheckpoint(eager=True)
    src = scratch_dir("rbrs_annsrc_")
    idx = scratch_dir("rbrs_annidx_")
    ckpt = scratch_dir("rbrs_annckpt_")
    snap.write_snapshot(initial, src, cluster_by=["vec_id"], n_files=4)
    snap.write_snapshot(idx0, idx, cluster_by=["vec_id"], n_files=4)

    def drain() -> None:
        feed = snap.read_snapshot_stream(spark, src, starting_version=2)
        q = stream_maintain_ivfpq(
            feed, idx, coarse, books, "vec_id", "embedding", ckpt
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("ANN index maintenance drain exceeded 300s")

    snap.upsert_snapshot(spark, src, arriving, ["vec_id"], cdc=True)
    drain()  # batch: encode arrivals with the frozen quantizer, MERGE
    snap.delete_where(
        spark, src, (F.col("vec_id") % 7 == 0) & (F.col("vec_id") >= 8), cdc=True
    )
    drain()  # batch: retract deleted vectors from the index
    index = snap.read_snapshot(spark, idx)
    return ivfpq_topk(queries, coarse, books, index, k=5)


@query(
    "q_ann_refit",
    oracle=_ivfpq_oracle(
        n_cells=4, m=2, k=4, n_iter=1, dim=64,
        corpus_where="vec_id >= 8 AND vec_id % 7 <> 0",
        train_where="vec_id >= 8",
    ),
)
def q_ann_refit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTIZER REFRESH lifecycle, oracle-checked through
    exhaustive-probe search (round-11 verdict ask #4): fit the initial
    quantizer on the first corpus slice, CDC-ingest the rest under that
    frozen generation, then REFIT on the now-complete corpus
    (functions.clustering.refit_ivfpq — retrain, one-pass re-encode,
    index committed LAST with ann:coarse/ann:books version pins), and
    keep maintaining: a CDC delete drains against the NEW generation
    resolved through the pins (load_ivfpq). The oracle replays the END
    state in SQL — Lloyd trained on the FULL corpus (what the refit
    saw), codes and residual-ADC over the merged-minus-deleted rows —
    so a refit bug (stale codes from generation 1, a mixed
    quantizer/index pair, an unretracted delete) breaks the hash."""
    from ray_beam_runner_spark.functions.clustering import (
        ivfpq_topk,
        load_ivfpq,
        refit_ivfpq,
        stream_maintain_ivfpq,
    )
    from ray_beam_runner_spark.queries import scratch_dir
    from ray_beam_runner_spark.sources import snapshots as snap

    emb = t(spark, sf_dir, "embeddings")
    initial = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") % 3 != 0)).select(
        "vec_id", "embedding"
    )
    arriving = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") % 3 == 0)).select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    src = scratch_dir("rbrs_refsrc_")
    cd = scratch_dir("rbrs_refcoarse_")
    bd = scratch_dir("rbrs_refbooks_")
    xd = scratch_dir("rbrs_refidx_")
    ckpt = scratch_dir("rbrs_refckpt_")
    snap.write_snapshot(initial, src, cluster_by=["vec_id"], n_files=4)
    # generation 1: fit + encode the initial corpus
    refit_ivfpq(
        spark, initial, "vec_id", "embedding", cd, bd, xd,
        n_cells=4, m=2, k=4, n_iter=1,
    )

    def drain() -> None:
        coarse, books, _ = load_ivfpq(spark, cd, bd, xd)
        feed = snap.read_snapshot_stream(spark, src, starting_version=2)
        q = stream_maintain_ivfpq(
            feed, xd, coarse, books, "vec_id", "embedding", ckpt
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("ANN refit drain exceeded 300s")

    snap.upsert_snapshot(spark, src, arriving, ["vec_id"], cdc=True)
    drain()  # gen-1 maintenance: arrivals encoded under the old quantizer
    # REFIT on the complete corpus: retrain + one-pass re-encode + swap
    refit_ivfpq(
        spark, snap.read_snapshot(spark, src), "vec_id", "embedding",
        cd, bd, xd, n_cells=4, m=2, k=4, n_iter=1,
    )
    snap.delete_where(
        spark, src, (F.col("vec_id") % 7 == 0) & (F.col("vec_id") >= 8), cdc=True
    )
    drain()  # gen-2 maintenance through the pins
    coarse, books, index = load_ivfpq(spark, cd, bd, xd)
    return ivfpq_topk(queries, coarse, books, index, k=5)


def _logreg_oracle(n_buckets: int, n_iter: int, lr: float = 8.0) -> str:
    """Per-round CTE oracle for the quality classifier: fixed-point
    term-frequency features + a length feature, then one (score,
    gradient, update) CTE triple per GD round. Fixed-point binary
    rounding (floor(x*2^k + 0.5)/2^k) keeps every sum exact — see
    functions.classify module docstring. Labels: the repo's heuristic
    quality score >= 0.5 (the classifier DISTILLS the Gopher-style
    heuristic into a linear model — CCNet's reference-vs-rest framing
    with the heuristic as the reference signal)."""
    d = n_buckets + 1  # feature count incl. the length feature; bias = d
    p20, p24 = float(1 << 20), float(1 << 24)
    quality = (
        f"0.4 * (least(len(ws), 100) / 100.0)"
        f" + 0.4 * least((len(list_filter(ws, t -> t IN ({_STOP_EN})))::DOUBLE"
        f" / greatest(len(ws), 1)) * 4.0, 1.0)"
        f" + 0.2 * (1.0 - least((len(regexp_extract_all(text, '{_PUNCT_RE}'))::DOUBLE"
        f" / greatest(length(text), 1)) * 10.0, 1.0))"
    )
    parts = [
        f"""WITH docs AS MATERIALIZED (
      SELECT doc_id AS id, ws,
             CASE WHEN round({quality}, 6) >= 0.5 THEN 1.0 ELSE 0.0 END AS y
      FROM (SELECT doc_id, text, {_TOKS} AS ws FROM documents))""",
        "tok AS (SELECT id, unnest(ws) AS t, len(ws) AS ntok FROM docs)",
        f"""feat AS MATERIALIZED (
      SELECT id, ('0x' || substr(md5('qc:' || t), 1, 8))::BIGINT % {n_buckets} AS feat,
             floor((count(*)::DOUBLE / min(ntok)) * {p20} + 0.5) / {p20} AS x
      FROM tok GROUP BY 1, 2
      UNION ALL
      SELECT id, {n_buckets}::BIGINT AS feat,
             floor((least(len(ws), 100) / 100.0) * {p20} + 0.5) / {p20} AS x
      FROM docs)""",
        "lab AS MATERIALIZED (SELECT id, y FROM docs)",
        "n AS (SELECT count(*)::DOUBLE AS n FROM lab)",
        f"w0 AS (SELECT unnest(range({d + 1})) AS feat, 0.0 AS w)",
    ]
    for r in range(1, n_iter + 2):
        parts.append(
            f"""s{r} AS MATERIALIZED (
      SELECT l.id, l.y,
             floor((1.0 / (1.0 + exp(-((SELECT w FROM w{r - 1} WHERE feat = {d})
                    + coalesce(fs.z, 0.0))))) * {p20} + 0.5) / {p20} AS p
      FROM lab l LEFT JOIN (
        SELECT f.id, sum(f.x * w.w) AS z
        FROM feat f JOIN w{r - 1} w USING (feat) WHERE feat < {d}
        GROUP BY f.id) fs ON fs.id = l.id)"""
        )
        if r > n_iter:
            break  # s{n_iter+1} is the final scoring pass, no update
        parts.append(
            f"""g{r} AS (
      SELECT feat, sum((s.p - s.y) * f.x) AS g
      FROM feat f JOIN s{r} s USING (id) GROUP BY feat
      UNION ALL
      SELECT {d}::BIGINT AS feat, sum(p - y) AS g FROM s{r})"""
        )
        parts.append(
            f"""w{r} AS MATERIALIZED (
      SELECT w.feat,
             floor((w.w - {lr} * (coalesce(g.g, 0.0) / (SELECT n FROM n)))
                   * {p24} + 0.5) / {p24} AS w
      FROM w{r - 1} w LEFT JOIN g{r} g USING (feat))"""
        )
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT id AS doc_id, CAST(y AS BIGINT) AS y, p AS score,
           (CASE WHEN p > 0.5 THEN 1 ELSE 0 END)::BIGINT AS pred
    FROM s{n_iter + 1}
    """
    )


@query("q_quality_classifier", oracle=_logreg_oracle(n_buckets=32, n_iter=10))
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised quality classifier trained as DataFrame algebra (r8
    verdict ask #4, the CCNet/LLaMA-style linear filter): fixed-point
    term-frequency features over md5 token buckets + a length feature,
    10 rounds of full-batch logistic-regression GD — per round ONE
    broadcast-weights join + one doc-keyed score sum + one
    feature-keyed map-side gradient aggregation — then per-document
    scores and predictions under the final weights. Labels distill the
    repo's heuristic quality score (>= 0.5): the trained model beats
    the majority baseline by ~25 points (85% vs 59% at sf0.001,
    pytest-asserted), i.e. the GD genuinely learns the separator.
    Deterministic via BINARY fixed-point rounding (features + sigmoid
    -> 2^-20, weights -> 2^-24): every sum is exact integer arithmetic
    in the double mantissa, so partial-sum order cannot leak engine
    differences — a stronger pin than 9-dp decimal rounding
    (functions.classify docstring). The oracle replays every round as
    a CTE triple; a feature, gradient, update, or scoring divergence
    anywhere breaks the hash. Differential pytest vs an independent
    numpy GD: tests/test_training_data.py."""
    from ray_beam_runner_spark.caches import track
    from ray_beam_runner_spark.functions.classify import (
        hashed_features,
        logreg_fit,
        logreg_score,
    )
    from ray_beam_runner_spark.functions.text import quality_score

    docs = t(spark, sf_dir, "documents")
    # Both training inputs are consumed by id-keyed joins/aggregations
    # in EVERY GD round; hash-partition them by id once and persist, so
    # all 10 rounds' score/gradient joins reuse the partitioning — the
    # only per-round exchange left is the tiny feature-keyed gradient.
    labels = track(
        docs.select(
            F.col("doc_id").alias("id"),
            F.when(quality_score(F.col("text")) >= 0.5, 1.0).otherwise(0.0).alias("y"),
        ).repartition("id")
    )
    feats = track(hashed_features(docs, "doc_id", "text", 32).repartition("id"))
    w = logreg_fit(feats, labels, 33, n_iter=10, lr=8.0)
    return logreg_score(feats, labels, w, 33).select(
        F.col("id").alias("doc_id"),
        F.col("y").cast("long").alias("y"),
        F.col("p").alias("score"),
        "pred",
    )


@query(
    "q_embedding_stats",
    oracle="""
    SELECT label,
           count(*) AS n,
           round(avg(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x)))), 6) AS avg_l2,
           round(avg(embedding[1]::DOUBLE), 6) AS avg_dim0
    FROM embeddings GROUP BY label
    """,
)
def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function coverage on the embedding column: per-label L2 norm
    and first-component averages (pure Catalyst aggregate/transform)."""
    emb = t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    l2 = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    return (
        emb.select("label", l2.alias("l2"), F.element_at(v, 1).alias("d0"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("l2"), 6).alias("avg_l2"),
            F.round(F.avg("d0"), 6).alias("avg_dim0"),
        )
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "q_text_stats",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             length(text) AS n_chars_raw,
             len({_TOKS}) AS n_tok,
             len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe,
             len(regexp_extract_all(text, '{_PUNCT_RE}')) AS n_punct,
             len(list_filter({_TOKS}, t -> t IN ({_STOP_EN}))) AS n_stop
      FROM documents)
    SELECT doc_id, n_chars_raw, n_tok, n_bpe, n_punct, n_stop,
           round(0.4 * (least(n_tok, 100) / 100.0)
               + 0.4 * least((n_stop::DOUBLE / greatest(n_tok, 1)) * 4.0, 1.0)
               + 0.2 * (1.0 - least((n_punct::DOUBLE / greatest(n_chars_raw, 1)) * 10.0, 1.0)),
             6) AS quality
    FROM s
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text statistics + heuristic quality score — all
    JVM-side expressions (functions.text), no Python in the hot path.

    Staged as three projections so each expensive interpreted expression
    (tokenize, regexp_extract_all) evaluates exactly ONCE per row: stage 1
    materializes the token array + regex counts, stage 2 derives the
    token-based counts, stage 3 derives quality from the count attributes.
    Catalyst's CollapseProject keeps the stages separate because the
    intermediate aliases are non-cheap and multiply referenced. The
    collapsed single-projection form re-tokenized ~4x and re-ran the punct
    regex 2x per row (72.9s -> target <15s at sf0.1)."""
    from ray_beam_runner_spark.functions import text as X

    docs = t(spark, sf_dir, "documents")
    c = F.col("text")
    stage1 = docs.select(
        "doc_id",
        F.length(c).cast("long").alias("n_chars_raw"),
        X.tokens(c).alias("_toks"),
        X.bpe_token_count(c).cast("long").alias("n_bpe"),
        X.punct_count(c).cast("long").alias("n_punct"),
    )
    stage2 = stage1.select(
        "doc_id",
        "n_chars_raw",
        F.size("_toks").cast("long").alias("n_tok"),
        "n_bpe",
        "n_punct",
        X.stopword_count_from_tokens(F.col("_toks")).cast("long").alias("n_stop"),
    )
    return stage2.select(
        "doc_id",
        "n_chars_raw",
        "n_tok",
        "n_bpe",
        "n_punct",
        "n_stop",
        X.quality_from_counts(
            F.col("n_tok"), F.col("n_stop"), F.col("n_punct"), F.col("n_chars_raw")
        ).alias("quality"),
    )


@query(
    "q_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             len(list_filter({_TOKS}, t -> t IN ('the','and','of','is','with'))) AS s_en,
             len(list_filter({_TOKS}, t -> t IN ('der','die','das','und','ist'))) AS s_de,
             len(list_filter({_TOKS}, t -> t IN ('le','la','les','et','est'))) AS s_fr,
             len(list_filter({_TOKS}, t -> t IN ('el','los','las','y','es'))) AS s_es,
             len(regexp_extract_all(text, '[\\x{{4e00}}-\\x{{9fff}}]')) > 0 AS cjk
      FROM documents)
    SELECT pred_lang, count(*) AS n FROM (
      SELECT CASE WHEN cjk THEN 'zh'
                  WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                  WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                  WHEN s_fr >= s_es THEN 'fr'
                  ELSE 'es' END AS pred_lang
      FROM scored)
    GROUP BY pred_lang
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic marker-stopword language ID, aggregated to predicted-
    language counts (the synthetic corpus is English-like regardless of
    its lang label — the oracle computes the identical heuristic)."""
    from ray_beam_runner_spark.functions.text import lang_id

    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(lang_id(F.col("text")).alias("pred_lang"))
        .groupBy("pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_quality_filter",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             {_NORM} AS norm,
             {_TOKS} AS toks,
             len(regexp_extract_all(text, '{_PUNCT_RE}')) AS n_punct
      FROM documents),
    c AS (
      SELECT doc_id,
             len(toks)::BIGINT AS n_words,
             ((length(norm) - len(toks) + 1)::DOUBLE
               / greatest(len(toks), 1)) AS mean_wl,
             (len(list_filter(toks, t -> t IN ({_STOP_EN})))::DOUBLE
               / greatest(len(toks), 1)) AS stop_frac,
             (n_punct::DOUBLE / greatest(len(toks), 1)) AS sym_ratio
      FROM s)
    SELECT doc_id, n_words,
           round(mean_wl, 6) AS mean_word_len,
           round(stop_frac, 6) AS stop_frac,
           round(sym_ratio, 6) AS symbol_ratio,
           (n_words BETWEEN 20 AND 100000
            AND mean_wl BETWEEN 3 AND 10
            AND stop_frac >= 0.02
            AND sym_ratio <= 0.1) AS keep
    FROM c
    """,
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality gate (rules as published in Rae et
    al., "Scaling Language Models: Methods, Analysis & Insights from
    Training Gopher", 2021, Table A1): word-count window, mean-word-length
    window, minimum stopword fraction, maximum symbol-to-word ratio; a
    document is kept only if it passes all four. The mean word length is
    derived arithmetically from the normalized text length
    ((chars - spaces) / words), avoiding an interpreted per-token HOF
    aggregate; everything is Catalyst expressions evaluated once per row."""
    from ray_beam_runner_spark.functions import text as X

    docs = t(spark, sf_dir, "documents")
    c = F.col("text")
    stage1 = docs.select(
        "doc_id",
        X.normalize_text(c).alias("_norm"),
        X.tokens(c).alias("_toks"),
        X.punct_count(c).cast("long").alias("_n_punct"),
    )
    nt = F.size("_toks")
    denom = F.greatest(nt, F.lit(1)).cast("double")
    stage2 = stage1.select(
        "doc_id",
        nt.cast("long").alias("n_words"),
        ((F.length("_norm") - nt + 1).cast("double") / denom).alias("_mean_wl"),
        (
            X.stopword_count_from_tokens(F.col("_toks")).cast("double") / denom
        ).alias("_stop_frac"),
        (F.col("_n_punct").cast("double") / denom).alias("_sym_ratio"),
    )
    return stage2.select(
        "doc_id",
        "n_words",
        F.round("_mean_wl", 6).alias("mean_word_len"),
        F.round("_stop_frac", 6).alias("stop_frac"),
        F.round("_sym_ratio", 6).alias("symbol_ratio"),
        (
            F.col("n_words").between(20, 100000)
            & F.col("_mean_wl").between(3, 10)
            & (F.col("_stop_frac") >= 0.02)
            & (F.col("_sym_ratio") <= 0.1)
        ).alias("keep"),
    )


@query(
    "q_repetition",
    oracle=f"""
    WITH tc AS (
      SELECT doc_id, t, count(*) AS c FROM (
        SELECT doc_id, unnest({_TOKS}) AS t FROM documents)
      GROUP BY doc_id, t)
    SELECT doc_id,
           sum(c)::BIGINT AS n_tok,
           round(count(*)::DOUBLE / sum(c), 6) AS distinct_frac,
           round(max(c)::DOUBLE / sum(c), 6) AS top_token_frac
    FROM tc GROUP BY doc_id
    """,
)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition metrics for quality filtering (the Gopher rules also
    drop highly repetitious documents): distinct-token fraction and the
    mass of the single most frequent token. Two keyed aggregations —
    (doc, token) counts, then per-doc rollup — both partitioned by doc,
    so the shuffle is bounded by corpus token count and never collects a
    document's tokens into one row."""
    from ray_beam_runner_spark.functions.text import tokens

    docs = t(spark, sf_dir, "documents")
    tok_counts = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return tok_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tok"),
        F.round(F.count(F.lit(1)).cast("double") / F.sum("c"), 6).alias("distinct_frac"),
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("top_token_frac"),
    )


@query(
    "q_fingerprint",
    oracle=f"""
    WITH toks AS (SELECT doc_id, text, {_TOKS} AS w FROM documents)
    SELECT doc_id,
           md5({_NORM}) AS fp_md5,
           CASE WHEN len(w) >= 5 THEN
             list_aggregate(list_transform(
               list_transform(generate_series(1, len(w) - 4),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]),
               s -> md5(s)), 'min')
           ELSE NULL END AS fp_min_shingle
    FROM toks
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: full-text md5 + winnowing-style minimum
    5-gram-shingle md5 (robust to local edits)."""
    from ray_beam_runner_spark.functions.text import fingerprint_md5, fingerprint_min_shingle

    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        fingerprint_md5(F.col("text")).alias("fp_md5"),
        fingerprint_min_shingle(F.col("text"), 5).alias("fp_min_shingle"),
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


@query(
    "q_multimodal",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS byte_len,
           ascii(substr(text, 1, 1)) AS first_byte,
           substr(md5(text), 1, 8) AS content_md5_pfx
    FROM documents
    """,
)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column plumbing: wrap text bytes as an opaque binary
    payload + typed metadata struct, then run the Arrow-batched
    mapInPandas feature-extraction kernel (deterministic fake features —
    real codecs are stubbed; see functions.multimodal). Proves the
    full binary-column → pandas-UDF pipeline the image/audio path uses."""
    from ray_beam_runner_spark.functions.multimodal import attach_media, extract_features

    docs = t(spark, sf_dir, "documents")
    media = attach_media(
        docs.withColumn("payload", F.encode(F.col("text"), "UTF-8")), "doc_id", "payload"
    )
    return extract_features(media, fake_features=True)


@query(
    "q_multimodal_audio",
    oracle="""
    SELECT user_id,
           8000::BIGINT AS sample_rate,
           1::BIGINT AS channels,
           (800 + (user_id % 10) * 80)::BIGINT AS n_frames,
           ((800 + (user_id % 10) * 80) // 8)::BIGINT AS duration_ms
    FROM (SELECT DISTINCT user_id FROM events)
    """,
)
def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec end-to-end, driver-checkable: synthesize one
    PCM sine WAV per user (n_frames = 800 + (uid % 10) * 80 at 8 kHz,
    encoded with the stdlib wave module in an Arrow-batched kernel),
    wrap it in the media envelope, then decode with
    functions.multimodal.decode_audio — a genuine header+frame parse,
    not a stub — and return the integer-exact features. The oracle
    states the closed form of what was encoded; a decode that misreads
    headers, frame counts, or sample width breaks the hash. RMS is
    checked to analytic precision in pytest instead (floating sums
    aren't cross-engine stable). Both synth and decode run distributed;
    payload bytes never leave the executors."""
    import io
    import wave
    from collections.abc import Iterator

    import pandas as pd

    from ray_beam_runner_spark.functions.multimodal import (
        attach_media,
        extract_audio_features,
    )

    events = t(spark, sf_dir, "events")
    # NO ensure_min_parallelism here (unlike the doc-id codec queries,
    # whose single-row-group scans genuinely serialize): the distinct's
    # output is post-shuffle — shuffle_partitions wide at every scale,
    # never single-partition — and the r16 round's added RoundRobin
    # exchange measured ~2x SLOWER on both user-frame audio queries in
    # an interleaved min-of-7 A/B (q_audio_frames 0.54 vs 0.95 s,
    # q_multimodal_audio 0.40 vs 0.99 s): the extra exchange + sort of
    # the tiny user frame costs more than the small WAV kernel gains
    # from extra local parallelism.
    users = events.select("user_id").distinct()

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for uid in pdf["user_id"]:
                n = 800 + (int(uid) % 10) * 80
                ts = np.arange(n) / 8000.0
                samples = (
                    0.5 * np.iinfo(np.int16).max
                    * np.sin(2 * np.pi * (200 + int(uid) % 50) * ts)
                ).astype(np.int16)
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(samples.tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"user_id": pdf["user_id"], "payload": payloads})

    wavs = users.mapInPandas(synth, schema="user_id long, payload binary")
    media = attach_media(wavs, "user_id", "payload", modality="audio")
    feats = extract_audio_features(media)
    return feats.select(
        F.col("media_id").alias("user_id"),
        F.col("sample_rate").cast("long").alias("sample_rate"),
        F.col("channels").cast("long").alias("channels"),
        F.col("n_frames").alias("n_frames"),
        F.col("duration_ms").alias("duration_ms"),
    )


@query(
    "q_audio_frames",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    par AS (SELECT user_id, 800 + (user_id % 10) * 80 AS n FROM u),
    fr AS (
      SELECT user_id, n,
             unnest(generate_series(0, (n + 159) // 160 - 1)) AS f
      FROM par),
    s AS (
      SELECT user_id, f,
             list_transform(generate_series(f * 160, least(n, (f + 1) * 160) - 1),
                            i -> ((user_id * 31 + i * i) % 2003) - 1001) AS xs
      FROM fr)
    SELECT user_id, f AS frame_idx,
           len(xs)::BIGINT AS n_samples,
           list_sum(list_transform(xs, x -> x * x))::BIGINT AS energy,
           len(list_filter(generate_series(2, len(xs)),
                           j -> xs[j] * xs[j - 1] < 0))::BIGINT AS zero_crossings
    FROM s
    """,
)
def q_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framewise audio features through a REAL codec roundtrip, fully
    inside the hash: synthesize a deterministic integer PCM waveform
    per user (sample i = ((uid·31 + i²) mod 2003) − 1001, n = 800 +
    (uid%10)·80 — pure integer arithmetic, so the ORACLE regenerates
    the exact samples in SQL), encode to WAV (stdlib wave), decode with
    functions.multimodal.decode_audio, and emit per-160-sample-frame
    energy (Σx², exact in int64) and within-frame zero crossings — the
    speech front-end's voiced/unvoiced features. Unlike
    q_multimodal_audio (which hashes header fields and leaves float
    RMS to pytest), every value here is integer-exact: a codec bug
    that flips one sample byte changes some frame's energy and breaks
    the hash. Tail frames keep their partial length."""
    import io
    import wave
    from collections.abc import Iterator

    import pandas as pd

    from ray_beam_runner_spark.functions.multimodal import (
        attach_media,
        extract_audio_frames,
    )

    events = t(spark, sf_dir, "events")
    # NO ensure_min_parallelism here (unlike the doc-id codec queries,
    # whose single-row-group scans genuinely serialize): the distinct's
    # output is post-shuffle — shuffle_partitions wide at every scale,
    # never single-partition — and the r16 round's added RoundRobin
    # exchange measured ~2x SLOWER on both user-frame audio queries in
    # an interleaved min-of-7 A/B (q_audio_frames 0.54 vs 0.95 s,
    # q_multimodal_audio 0.40 vs 0.99 s): the extra exchange + sort of
    # the tiny user frame costs more than the small WAV kernel gains
    # from extra local parallelism.
    users = events.select("user_id").distinct()

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for uid in pdf["user_id"]:
                uid = int(uid)
                n = 800 + (uid % 10) * 80
                i = np.arange(n, dtype=np.int64)
                samples = ((uid * 31 + i * i) % 2003 - 1001).astype(np.int16)
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(samples.tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"user_id": pdf["user_id"], "payload": payloads})

    wavs = users.mapInPandas(synth, schema="user_id long, payload binary")
    media = attach_media(wavs, "user_id", "payload", modality="audio")
    return extract_audio_frames(media, frame=160).withColumnRenamed(
        "media_id", "user_id"
    )


@query(
    "q_multimodal_image",
    oracle="""
    SELECT doc_id,
           (8 + doc_id % 5)::BIGINT AS width,
           (6 + doc_id % 4)::BIGINT AS height,
           (3 + doc_id % 2)::BIGINT AS channels,
           8::BIGINT AS bit_depth,
           ((8 + doc_id % 5) * (3 + doc_id % 2)
            * list_sum(list_transform(range(0, 6 + doc_id % 4),
                                      r -> (doc_id + r) % 256)))::BIGINT AS px_sum
    FROM documents
    """,
)
def q_multimodal_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec end-to-end, driver-checkable (r6 verdict ask #3,
    the q_multimodal_audio recipe applied to images): synthesize one
    PNG per document — width 8+id%5, height 6+id%4, RGB or RGBA by id
    parity, every pixel in row y valued (id+y)%256, encoded with the
    from-scratch stdlib codec using the UP scanline filter so decode
    exercises real unfiltering — wrap in the media envelope, decode
    with functions.multimodal.decode_png (chunk CRCs verified, IDAT
    inflated, filters undone), and return integer-exact features. The
    oracle states the closed form of what was encoded, including the
    exact pixel sum: a decoder that mis-parses dimensions, color type,
    filters, or sample order breaks the hash. Both synth and decode run
    distributed; payload bytes never leave the executors."""
    from collections.abc import Iterator

    import pandas as pd

    from ray_beam_runner_spark.functions.multimodal import (
        attach_media,
        extract_image_features,
    )

    from ray_beam_runner_spark.session import ensure_min_parallelism

    # single-row-group scan = ONE task; spread the doc_id frame across
    # cores so the pure-Python codec kernel below parallelizes (same
    # guard _phash_pairs documents; no-op at production partition counts)
    docs = ensure_min_parallelism(t(spark, sf_dir, "documents").select("doc_id"))

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ray_beam_runner_spark.functions.multimodal import encode_png

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w_, h_, ch = 8 + d % 5, 6 + d % 4, 3 + d % 2
                rows = (d + np.arange(h_)) % 256
                arr = np.broadcast_to(
                    rows[:, None, None], (h_, w_, ch)
                ).astype(np.uint8)
                payloads.append(encode_png(arr, filter_type=2))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    pngs = docs.mapInPandas(synth, schema="doc_id long, payload binary")
    media = attach_media(pngs, "doc_id", "payload", modality="image")
    feats = extract_image_features(media)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("channels").cast("long").alias("channels"),
        F.col("bit_depth").cast("long").alias("bit_depth"),
        F.col("px_sum"),
    )


@query(
    "q_multimodal_jpeg",
    oracle="""
    SELECT doc_id,
           16::BIGINT AS width,
           16::BIGINT AS height,
           1::BIGINT AS channels,
           8::BIGINT AS bit_depth,
           (64 * list_sum(list_transform(range(0, 4),
                                         k -> (doc_id + 37 * k) % 256)))::BIGINT
             AS px_sum
    FROM documents
    """,
)
def q_multimodal_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG codec end to end, driver-checkable (r8
    verdict ask #8, the q_multimodal_image recipe applied to JPEG):
    synthesize one 16x16 grayscale JPEG per document — four flat 8x8
    blocks valued (doc_id + 37k) % 256 — with the from-scratch encoder
    (numpy DCT, canonical Huffman, unit quant table), decode with
    functions.multimodal.decode_jpeg (marker parse, table-driven
    entropy decode, dequant, IDCT), and return integer-exact features.
    Flat blocks concentrate all energy in the DC coefficient, which
    quantizes at q=1 to an exact integer, so the lossy format
    round-trips these images EXACTLY and the oracle states px_sum in
    closed form — a Huffman, zigzag, DC-prediction, dequant, or IDCT
    bug all break the hash (arbitrary-content near-losslessness is
    pytest-checked separately). Both synth and decode run distributed;
    payload bytes never leave the executors."""
    from collections.abc import Iterator

    import pandas as pd

    from ray_beam_runner_spark.functions.multimodal import (
        attach_media,
        extract_jpeg_features,
    )

    from ray_beam_runner_spark.session import ensure_min_parallelism

    # single-row-group scan = ONE task; spread the doc_id frame across
    # cores so the pure-Python codec kernel below parallelizes (same
    # guard _phash_pairs documents; no-op at production partition counts)
    docs = ensure_min_parallelism(t(spark, sf_dir, "documents").select("doc_id"))

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ray_beam_runner_spark.functions.multimodal import encode_jpeg

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                arr = np.zeros((16, 16), dtype=np.uint8)
                for k, (by, bx) in enumerate(((0, 0), (0, 8), (8, 0), (8, 8))):
                    arr[by: by + 8, bx: bx + 8] = (d + 37 * k) % 256
                payloads.append(encode_jpeg(arr))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    jpgs = docs.mapInPandas(synth, schema="doc_id long, payload binary")
    media = attach_media(jpgs, "doc_id", "payload", modality="image")
    feats = extract_jpeg_features(media)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("channels").cast("long").alias("channels"),
        F.col("bit_depth").cast("long").alias("bit_depth"),
        F.col("px_sum"),
    )


@query(
    "q_bpe_pair_counts",
    oracle=f"""
    WITH w AS (SELECT unnest({_TOKS}) AS w FROM documents),
    p AS (SELECT unnest(list_transform(range(1, length(w)),
                                       i -> substr(w, CAST(i AS INT), 2))) AS pair
          FROM w WHERE length(w) >= 2)
    SELECT pair, count(*) AS n
    FROM p GROUP BY pair
    ORDER BY n DESC, pair LIMIT 30
    """,
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training's first-iteration statistic, distributed: adjacent
    character pairs inside every word occurrence, counted corpus-wide
    (functions.bpe.char_pair_counts — pure Catalyst expressions, no
    Python). This is the corpus-sized half of tokenizer training; the
    merge loop itself then runs over the vocabulary-sized frequency
    table (q_bpe_merges). Top-30 with lexical tie-break keeps the cut
    cross-engine deterministic."""
    from ray_beam_runner_spark.functions.bpe import char_pair_counts

    docs = t(spark, sf_dir, "documents")
    return (
        char_pair_counts(docs, "text")
        .orderBy(F.col("n").desc(), "pair")
        .limit(30)
    )


@query("q_bpe_merges")  # iterative merge learning: not SQL-expressible,
# driver records the rows-only check; the algorithm is differentially
# tested against an independent naive trainer in tests/test_bpe.py
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn a 40-merge BPE tokenizer from the corpus (functions.bpe):
    ONE distributed word-frequency aggregation (the only corpus-sized
    pass), then the classic Sennrich merge loop over the vocab-sized
    table — the production trainer recipe, where corpus scale changes
    only the aggregation cost. Returns (rank, left, right, merged);
    deterministic across runs and cluster sizes (lexicographic tie
    break)."""
    from ray_beam_runner_spark.functions.bpe import bpe_learn

    docs = t(spark, sf_dir, "documents")
    merges = bpe_learn(docs, "text", n_merges=40)
    return spark.createDataFrame(
        [(i, a, b, a + b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string, merged string",
    )


@query(
    "q_multimodal_video",
    oracle="""
    SELECT doc_id,
           (6 + doc_id % 4)::BIGINT AS width,
           (5 + doc_id % 3)::BIGINT AS height,
           (2 + doc_id % 3)::BIGINT AS n_frames,
           256::BIGINT AS palette_size,
           ((6 + doc_id % 4) * (5 + doc_id % 3) * 3
            * list_sum(list_transform(range(0, 2 + doc_id % 3),
                                      f -> (doc_id + f) % 256)))::BIGINT AS px_sum
    FROM documents
    """,
)
def q_multimodal_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video codec end-to-end, driver-checkable (the audio/image
    recipe applied to the video modality): synthesize one animated GIF
    per document — width 6+id%4, height 5+id%3, 2+id%3 frames, frame f
    a constant (id+f)%256 over a 256-entry grayscale palette, encoded
    with the from-scratch pure-Python LZW codec — wrap in the media
    envelope, decode with functions.multimodal.decode_gif (header +
    color table + per-frame LZW inflate), and return integer-exact
    per-clip features. The oracle states the closed form of what was
    encoded, including the exact palette-mapped pixel sum across ALL
    frames: a codec that mis-parses the LZW stream, palette, frame
    count, or geometry breaks the hash. Both synth and decode run
    distributed; payload bytes never leave the executors. The sampled
    frames themselves feed extract_image_features via
    sample_gif_frames (pytest-covered pipeline)."""
    from collections.abc import Iterator

    import pandas as pd

    from ray_beam_runner_spark.functions.multimodal import (
        attach_media,
        extract_video_features,
    )

    from ray_beam_runner_spark.session import ensure_min_parallelism

    # single-row-group scan = ONE task; spread the doc_id frame across
    # cores so the pure-Python codec kernel below parallelizes (same
    # guard _phash_pairs documents; no-op at production partition counts)
    docs = ensure_min_parallelism(t(spark, sf_dir, "documents").select("doc_id"))

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ray_beam_runner_spark.functions.multimodal import encode_gif

        pal = np.arange(256, dtype=np.uint8).repeat(3).reshape(256, 3)
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w_, h_, nf = 6 + d % 4, 5 + d % 3, 2 + d % 3
                payloads.append(
                    encode_gif(
                        [np.full((h_, w_), (d + f) % 256, np.uint8)
                         for f in range(nf)],
                        pal,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    gifs = docs.mapInPandas(synth, schema="doc_id long, payload binary")
    media = attach_media(gifs, "doc_id", "payload", modality="video")
    feats = extract_video_features(media)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_frames").cast("long").alias("n_frames"),
        F.col("palette_size").cast("long").alias("palette_size"),
        F.col("px_sum"),
    )


@query(
    "q_wordcount",
    oracle=f"""
    SELECT t AS word, count(*) AS n FROM (
      SELECT unnest({_TOKS}) AS t FROM documents)
    GROUP BY t
    ORDER BY n DESC, word
    LIMIT 20
    """,
)
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's canonical end-to-end example (WordCount,
    examples/word_count_metrics.py:110-134) as a declared query: tokenize →
    explode → count per word → top-20. flatMap = explode of an array
    expression; GBK+sum = hash aggregate — all codegen'd, no Python."""
    from ray_beam_runner_spark.functions.text import tokens

    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Training-data pipeline: decontamination, PII scrubbing, deterministic
# splits, and source mixing (the assembly steps between raw corpus and
# training shards; none exist in the reference, which stops at GBK/Combine)
# ---------------------------------------------------------------------------


def _grams_sql(n: int) -> str:
    """DuckDB expression for word n-grams over a token list column ``w``."""
    concat = " || ' ' || ".join("w[i]" if j == 0 else f"w[i+{j}]" for j in range(n))
    return f"list_transform(generate_series(1, len(w) - {n - 1}), i -> {concat})"


@query(
    "q_decontaminate",
    oracle=f"""
    WITH toks AS (SELECT doc_id, source, {_TOKS} AS w FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, source, g FROM (
        SELECT doc_id, source, unnest({_grams_sql(8)}) AS g FROM toks)),
    ev AS (SELECT DISTINCT g FROM grams WHERE source = 'src0')
    SELECT doc_id, count(*)::BIGINT AS n_shared_grams
    FROM grams JOIN ev USING (g)
    WHERE source <> 'src0'
    GROUP BY doc_id
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (source != src0) that share
    any 8-gram with the held-out eval source. The eval gram set is a
    broadcast; the corpus side is pruned by a broadcast semi join and
    never shuffles — the shape that survives a 100 TB corpus against a
    fixed-size benchmark suite."""
    from ray_beam_runner_spark.functions.dedup import decontaminate_hits

    docs = t(spark, sf_dir, "documents")
    return decontaminate_hits(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        "doc_id",
        "text",
        n=8,
    )


# PII is synthesized deterministically from doc_id (the word-soup corpus
# contains none) so the scrub operator is exercised on varied, non-empty
# matches; the md5 of the redacted text makes the replacement itself part
# of the hash gate, not just the counts.
_PII_TEXT_SQL = """
    text
    || CASE WHEN doc_id % 3 <> 0
            THEN ' contact user' || doc_id::VARCHAR || '@example.com' ELSE '' END
    || CASE WHEN doc_id % 4 = 0
            THEN ' call +1-555-' || lpad(((doc_id * 7) % 10000)::VARCHAR, 4, '0') ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' ip 10.' || (doc_id % 256)::VARCHAR || '.0.' || ((doc_id * 3) % 256)::VARCHAR
            ELSE '' END
"""


@query(
    "q_pii_scrub",
    oracle=f"""
    WITH pii AS (SELECT doc_id, {_PII_TEXT_SQL} AS pt FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(pt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'))::BIGINT AS n_emails,
           len(regexp_extract_all(pt, '\\+[0-9]{{1,2}}-[0-9]{{3}}-[0-9]{{3,4}}(-[0-9]{{3,4}})?'))::BIGINT AS n_phones,
           len(regexp_extract_all(pt, '[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}'))::BIGINT AS n_ips,
           md5(regexp_replace(regexp_replace(regexp_replace(pt,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
               '\\+[0-9]{{1,2}}-[0-9]{{3}}-[0-9]{{3,4}}(-[0-9]{{3,4}})?', '<PHONE>', 'g'),
               '[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}', '<IP>', 'g')) AS scrub_md5
    FROM pii
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact: per-doc pattern counts and the md5 of the
    fully-redacted text. All passes are codegen'd regexp_replace /
    regexp_extract_all — no Python in the path, linear per row, trivially
    partition-parallel at 100 TB."""
    from ray_beam_runner_spark.functions.text import pii_count, redact_pii

    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    pii_text = F.concat(
        F.col("text"),
        F.when(
            did % 3 != 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
        ).otherwise(""),
        F.when(
            did % 4 == 0,
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad(((did * 7) % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(""),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" ip 10."),
                (did % 256).cast("string"),
                F.lit(".0."),
                ((did * 3) % 256).cast("string"),
            ),
        ).otherwise(""),
    )
    pt = F.col("_pii_text")
    return (
        d.select("doc_id", pii_text.alias("_pii_text"))
        .select(
            "doc_id",
            pii_count(pt, "email").cast("long").alias("n_emails"),
            pii_count(pt, "phone").cast("long").alias("n_phones"),
            pii_count(pt, "ipv4").cast("long").alias("n_ips"),
            F.md5(redact_pii(pt)).alias("scrub_md5"),
        )
    )


@query(
    "q_train_val_split",
    oracle="""
    SELECT source,
           CASE WHEN ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 90
                THEN 'train' ELSE 'val' END AS split,
           count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS total_chars
    FROM documents
    GROUP BY source, split
    ORDER BY source, split
    """,
)
def q_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/val split: md5-derived hash bucket on the
    doc id — reproducible across engines, runs, and cluster sizes (unlike
    rand() or xxhash64, which are engine-private). One narrow projection
    plus a tiny (source, split) agg; no data movement beyond the final
    20x2-row shuffle."""
    from ray_beam_runner_spark.functions.text import hash_bucket

    d = t(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"), 100, "split")
    return (
        d.select(
            "source",
            F.when(b < 90, "train").otherwise("val").alias("split"),
            "n_chars",
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source", "split")
    )


@query(
    "q_temperature_mix",
    oracle="""
    WITH d AS (
      SELECT source,
             ('0x' || substr(md5('temp:' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000 AS b
      FROM documents),
    c AS (SELECT source, count(*)::BIGINT AS n FROM d GROUP BY source),
    tot AS (SELECT sum(n)::DOUBLE AS total, sum(pow(n, 0.5)) AS sum_a FROM c),
    r AS (
      SELECT source, n,
             round(least(1.0, 0.5 * total * (pow(n, 0.5) / sum_a) / n), 6) AS rate
      FROM c, tot)
    SELECT r.source, r.n AS n_docs,
           coalesce(s.n_sampled, 0)::BIGINT AS n_sampled, r.rate
    FROM r LEFT JOIN (
      SELECT d.source, count(*)::BIGINT AS n_sampled
      FROM d JOIN r USING (source)
      WHERE d.b < floor(rate * 10000)
      GROUP BY d.source) s USING (source)
    """,
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source sampling (the multilingual-LM mixing
    rule — sampling mass proportional to n^alpha, alpha=0.5, as in
    UniMax / mT5-style corpus balancing): per-source keep rates are
    DERIVED FROM THE CORPUS (big sources downsampled toward the
    tempered distribution, small ones kept whole via the cap at 1.0)
    for a half-size target budget, then applied as a deterministic
    md5-threshold per doc — reproducible shards, no rand(). Two narrow
    aggregations build the 20-row rate table (broadcast back); rates
    round to 6 dp before the integer threshold so the float boundary
    is pinned across engines."""
    from ray_beam_runner_spark.functions.text import hash_bucket

    d = t(spark, sf_dir, "documents").select(
        "source", hash_bucket(F.col("doc_id"), 10000, "temp").alias("b")
    )
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum("n").cast("double").alias("total"),
        F.sum(F.pow("n", F.lit(0.5))).alias("sum_a"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(0.5) * F.col("total") * (F.pow("n", F.lit(0.5)) / F.col("sum_a"))
                / F.col("n"),
            ),
            6,
        ).alias("rate"),
    )
    sampled = (
        d.join(F.broadcast(rates.select("source", "rate")), "source")
        .filter(F.col("b") < F.floor(F.col("rate") * 10000))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return rates.join(F.broadcast(sampled), "source", "left").select(
        "source",
        F.col("n").alias("n_docs"),
        F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
        "rate",
    )


@query(
    "q_sample_mix",
    oracle="""
    WITH d AS (
      SELECT source,
             substr(source, 4)::INT AS src_num,
             ('0x' || substr(md5('mix:' || doc_id::VARCHAR), 1, 8))::BIGINT % 1000 AS b
      FROM documents)
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN b < (src_num % 5 + 1) * 100 THEN 1 ELSE 0 END)::BIGINT AS n_sampled,
           sum(CASE WHEN b < (src_num % 5 + 1) * 100 THEN src_num % 3 + 1 ELSE 0 END)::BIGINT AS n_mixed
    FROM d
    GROUP BY source
    ORDER BY source
    """,
)
def q_sample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted source mixing for training-corpus assembly: each source
    gets a deterministic sampling rate (10-50%, hash-thresholded — no
    rand(), so shards are reproducible) and an epoch multiplier (1-3x,
    a real array_repeat explode, the upsampling dataflow — not
    arithmetic). Per-source input/sampled/mixed counts come from three
    narrow aggs stitched with broadcast joins over the 20-row source
    dimension; the explode multiplies rows AFTER the filter, so the
    upsampled stream is never wider than rate x epochs x input."""
    from ray_beam_runner_spark.functions.text import hash_bucket

    d = (
        t(spark, sf_dir, "documents")
        .select(
            "source",
            "doc_id",
            F.substring("source", 4, 10).cast("int").alias("src_num"),
            hash_bucket(F.col("doc_id"), 1000, "mix").alias("b"),
        )
        .withColumn("epochs", F.col("src_num") % 3 + 1)
        .withColumn("keep", F.col("b") < (F.col("src_num") % 5 + 1) * 100)
    )
    n_in = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    sampled = d.filter(F.col("keep"))
    n_sampled = sampled.groupBy("source").agg(F.count(F.lit(1)).alias("n_sampled"))
    mixed = sampled.select(
        "source", F.explode(F.array_repeat(F.lit(1), F.col("epochs"))).alias("_rep")
    )
    n_mixed = mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n_mixed"))
    return (
        n_in.join(F.broadcast(n_sampled), "source", "left")
        .join(F.broadcast(n_mixed), "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            F.coalesce("n_mixed", F.lit(0)).alias("n_mixed"),
        )
        .orderBy("source")
    )


@query(
    "q_embedding_quantize",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding,
             greatest(list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0,
                      1e-12) AS scale
      FROM embeddings)
    SELECT vec_id,
           round(scale, 6) AS scale6,
           md5(array_to_string(
             list_transform(embedding, x -> floor(x::DOUBLE / scale + 0.5)::INT),
             ',')) AS q_md5,
           list_max(list_transform(embedding,
             x -> abs(x::DOUBLE - floor(x::DOUBLE / scale + 0.5) * scale)))
             <= scale * 0.5000001 AS err_ok
    FROM s
    """,
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization with an in-query error bound: the
    md5 of the quantized vector makes the exact int grid part of the
    hash gate, and err_ok asserts reconstruction error <= scale/2 per
    dimension. Pure Catalyst transforms — one narrow projection pair,
    no shuffle, linear at any corpus size."""
    from ray_beam_runner_spark.functions.similarity import quantize_int8

    emb = t(spark, sf_dir, "embeddings")
    q = quantize_int8(emb, "embedding")
    sc = F.col("q_scale")
    err = F.array_max(
        F.transform(
            F.col("embedding"),
            lambda x: F.abs(
                x.cast("double") - F.floor(x.cast("double") / sc + F.lit(0.5)) * sc
            ),
        )
    )
    return q.select(
        "vec_id",
        F.round(sc, 6).alias("scale6"),
        F.md5(F.concat_ws(",", F.col("q_vec"))).alias("q_md5"),
        (err <= sc * 0.5000001).alias("err_ok"),
    )


@query(
    "q_chunk_documents",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    starts AS (
      SELECT doc_id, w, unnest(generate_series(1, greatest(len(w), 1), 96)) AS s
      FROM toks)
    SELECT doc_id,
           ((s - 1) / 96)::BIGINT AS chunk_idx,
           len(w[s : s + 127])::BIGINT AS n_chunk_tokens,
           md5(array_to_string(w[s : s + 127], ' ')) AS chunk_md5
    FROM starts
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: sliding 128-token windows at stride 96
    (32-token overlap) — the document-to-training-sample step of an LLM
    data pipeline. The token array is materialized once per document in
    a projection, THEN starts explode (interpreted HOFs re-evaluate
    array arguments per output row, so inlining tokens(text) would
    re-tokenize per chunk). Pure narrow Catalyst ops — rows out ≈
    rows_in x tokens/stride, no shuffle at any corpus size."""
    from ray_beam_runner_spark.functions.text import chunk_starts, chunk_text, tokens

    d = t(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("_toks")
    )
    s = F.col("_start")
    ck = F.slice(F.col("_toks"), s, 128)
    return (
        d.select("doc_id", "_toks", F.explode(chunk_starts(F.col("_toks"), 96)).alias("_start"))
        .select(
            "doc_id",
            ((s - 1) / 96).cast("long").alias("chunk_idx"),
            F.size(ck).cast("long").alias("n_chunk_tokens"),
            F.md5(chunk_text(F.col("_toks"), s, 128)).alias("chunk_md5"),
        )
    )


@query(
    "q_chunk_cdc",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    pos AS (
      SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM toks),
    tok AS (
      SELECT doc_id, i, w[i] AS tk,
             CASE WHEN i > 1
                   AND ('0x' || substr(md5('cdc:' || w[i-1] || ':' || w[i]),
                                       1, 8))::BIGINT % 16 = 0
                  THEN 1 ELSE 0 END AS b
      FROM pos),
    ch AS (
      SELECT doc_id, i, tk,
             (sum(b) OVER (PARTITION BY doc_id ORDER BY i))::BIGINT AS chunk_idx
      FROM tok)
    SELECT doc_id, chunk_idx, count(*)::BIGINT AS n_tok,
           md5(string_agg(tk, ' ' ORDER BY i)) AS chunk_md5
    FROM ch GROUP BY doc_id, chunk_idx
    """,
)
def q_chunk_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTENT-DEFINED chunking (functions.text.cdc_chunks): a chunk
    boundary opens wherever the (prev, current) token-pair hash lands
    in a 1/16 bucket — boundaries depend only on local content, so an
    insertion re-synchronizes at the next boundary and later chunks
    keep their fingerprints (the rsync/LBFS property fixed-stride
    q_chunk_documents lacks; resync asserted in
    tests/test_training_data.py). The md5 chunk fingerprint is the
    cross-document chunk identity a dedup store keys on. The oracle
    replays the boundary rule, the running chunk index, and the
    ordered-aggregation fingerprint; one shifted boundary anywhere
    breaks the hash."""
    from ray_beam_runner_spark.functions.text import cdc_chunks

    return cdc_chunks(
        t(spark, sf_dir, "documents"), "doc_id", "text", divisor=16
    )


@query(
    "q_chunk_shared",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    pos AS (
      SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM toks),
    tok AS (
      SELECT doc_id, i, w[i] AS tk,
             CASE WHEN i > 1
                   AND ('0x' || substr(md5('cdc:' || w[i-1] || ':' || w[i]),
                                       1, 8))::BIGINT % 16 = 0
                  THEN 1 ELSE 0 END AS b
      FROM pos),
    ch AS (
      SELECT doc_id, i, tk,
             (sum(b) OVER (PARTITION BY doc_id ORDER BY i))::BIGINT AS chunk_idx
      FROM tok),
    chunks AS (
      SELECT doc_id, chunk_idx, count(*) AS n_tok,
             md5(string_agg(tk, ' ' ORDER BY i)) AS chunk_md5
      FROM ch GROUP BY doc_id, chunk_idx)
    SELECT chunk_md5,
           count(DISTINCT doc_id)::BIGINT AS n_docs,
           count(*)::BIGINT AS n_occurrences,
           min(n_tok)::BIGINT AS n_tok
    FROM chunks
    GROUP BY chunk_md5 HAVING count(DISTINCT doc_id) >= 2
    """,
)
def q_chunk_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARED-PASSAGE detection — what content-defined chunking is FOR:
    because q_chunk_cdc's boundaries depend only on local content, a
    passage duplicated across documents (boilerplate, quotes, licence
    headers, template text) produces byte-identical chunks wherever it
    appears, so cross-document passage sharing reduces to a GROUP BY
    on the chunk fingerprint — no pairwise comparison at any corpus
    size (the substring-dedup family's repeated_span_stats finds
    repeats by materializing n-gram postings; this finds them at chunk
    granularity with one aggregation over fingerprints). Returns every
    chunk appearing in >= 2 distinct docs with its spread. Scale: the
    chunking is one explode + window + agg; the sharing detection is
    ONE more fingerprint-keyed aggregation."""
    from ray_beam_runner_spark.functions.text import cdc_chunks

    chunks = cdc_chunks(t(spark, sf_dir, "documents"), "doc_id", "text", divisor=16)
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("n_tok").alias("n_tok"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@query(
    "q_text_search",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_TOKS} AS w FROM documents WHERE doc_id % 7 <> 0),
    tf AS (
      SELECT doc_id, t, count(*) AS tf
      FROM (SELECT doc_id, unnest(w) AS t FROM d) GROUP BY 1, 2),
    m AS (
      SELECT doc_id, count(*) AS n_terms, sum(tf) AS total_tf
      FROM tf WHERE t IN ('merge', 'window', 'scan') GROUP BY doc_id)
    SELECT doc_id, n_terms::BIGINT AS n_terms, total_tf::BIGINT AS total_tf
    FROM m WHERE n_terms = 3
    """,
)
def q_text_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-TEXT SEARCH over an incrementally maintained inverted
    index (functions.search): build the token-clustered postings table
    from the initial corpus slice (doc_id % 3 != 0), then drive it
    purely from the source's CHANGE FEED — a CDC merge ingests the
    remaining documents, a CDC delete removes every 7th (old postings
    die keyed (token, doc), computable from the feed's pre-image text,
    so the deletion is token-pruned, never an index scan) — and answer
    the conjunctive query merge AND window AND scan with one
    token-pruned read per term + one doc-keyed aggregation. The oracle
    computes the same conjunction directly over the FINAL document
    set: a stale posting (deleted doc still matching), a lost insert,
    or a wrong tf anywhere breaks the hash. At 100 TB the search opens
    the few files whose token range covers the terms; maintenance per
    trigger is O(batch tokens)."""
    from ray_beam_runner_spark.functions.search import (
        build_token_index,
        search_index,
        stream_maintain_token_index,
    )
    from ray_beam_runner_spark.queries import scratch_dir
    from ray_beam_runner_spark.sources import snapshots as snap

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    initial = docs.filter(F.col("doc_id") % 3 != 0)
    arriving = docs.filter(F.col("doc_id") % 3 == 0)
    src = scratch_dir("rbrs_ftsrc_")
    idx = scratch_dir("rbrs_ftidx_")
    ckpt = scratch_dir("rbrs_ftckpt_")
    snap.write_snapshot(initial, src, cluster_by=["doc_id"], n_files=4)
    build_token_index(initial, idx, "doc_id", "text")

    def drain() -> None:
        feed = snap.read_snapshot_stream(spark, src, starting_version=2)
        q = stream_maintain_token_index(feed, idx, "doc_id", "text", ckpt)
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("token index maintenance drain exceeded 300s")

    snap.upsert_snapshot(spark, src, arriving, ["doc_id"], cdc=True)
    drain()
    snap.delete_where(spark, src, F.col("doc_id") % 7 == 0, cdc=True)
    drain()
    return search_index(
        spark, idx, ["merge", "window", "scan"], "doc_id", mode="and"
    )


@query(
    "q_text_bm25",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    len AS (SELECT doc_id, len(w) AS dl FROM d),
    stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM len),
    tf AS (
      SELECT doc_id, t, count(*) AS tf
      FROM (SELECT doc_id, unnest(w) AS t FROM d) GROUP BY 1, 2),
    q AS (SELECT * FROM tf WHERE t IN ('merge', 'window', 'scan')),
    dfq AS (SELECT t, count(*) AS df FROM q GROUP BY t),
    sc AS (
      SELECT q.doc_id,
             round(sum(
               ln(1 + ((SELECT n FROM stats) - dfq.df + 0.5) / (dfq.df + 0.5))
               * q.tf
               / (q.tf + 1.2 * (0.25 + 0.75 * len.dl / (SELECT avgdl FROM stats)))
             ), 6) AS score
      FROM q JOIN dfq USING (t) JOIN len USING (doc_id)
      GROUP BY q.doc_id)
    SELECT doc_id, score, rank FROM (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id)::INT AS rank
      FROM sc)
    WHERE rank <= 20
    """,
)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-RANKED search over the inverted index
    (functions.search.search_bm25 — Robertson/Walker scoring in the
    Lucene idf parameterization): postings and doc-length tables
    materialized as snapshot tables, then the query 'merge window
    scan' ranked top-20. Reads touch ONLY the terms' token-pruned
    postings files and the doc-count-sized lengths relation; N comes
    from the lengths table's manifest row count (zero files opened).
    The oracle replays idf, the length norm, and the 6-dp-rounded
    score sum — a df off by one, a stale length, or a norm mistake
    reorders the ranking and breaks the hash. Engine determinism: the
    score rounds before ranking and every input to the float formula
    (tf, df, dl, exact-integer avgdl) is identical cross-engine."""
    from ray_beam_runner_spark.functions.search import (
        build_token_index,
        doc_lengths,
        search_bm25,
    )
    from ray_beam_runner_spark.queries import scratch_dir
    from ray_beam_runner_spark.sources import snapshots as snap

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    idx = scratch_dir("rbrs_bm25idx_")
    lens = scratch_dir("rbrs_bm25len_")
    build_token_index(docs, idx, "doc_id", "text")
    snap.write_snapshot(
        doc_lengths(docs, "doc_id", "text"), lens, cluster_by=["doc_id"], n_files=2
    )
    return search_bm25(
        spark, idx, lens, ["merge", "window", "scan"], "doc_id", topk=20
    )


@query(
    "q_text_phrase",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    m AS (
      SELECT doc_id,
             len(list_filter(generate_series(1, len(w) - 1),
                 i -> w[i] = 'order' AND w[i+1] = 'sort'
             ))::BIGINT AS n_occ
      FROM d)
    SELECT doc_id, n_occ FROM m WHERE n_occ > 0
    """,
)
def q_text_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PHRASE search through the POSITIONAL inverted index
    (functions.search.search_phrase): postings store each token's
    occurrence positions; the phrase "order sort" resolves by folding
    the first term's positions through array_intersect(positions + 1,
    next term's positions) — survivors are exactly the match end
    positions, so n_occ is the occurrence count (longer folds
    differentially pytest-covered). The two sides could not be more
    different — Spark walks a token-clustered index reading the terms'
    postings files, the oracle slides a window over every document —
    and the hash pins them equal: an off-by-one position, an unsorted
    postings list, or a lost occurrence breaks it. At scale the phrase
    query reads postings-of-the-terms, never the corpus."""
    from ray_beam_runner_spark.functions.search import (
        build_token_index,
        search_phrase,
    )
    from ray_beam_runner_spark.queries import scratch_dir

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    idx = scratch_dir("rbrs_phraseidx_")
    build_token_index(docs, idx, "doc_id", "text", positional=True)
    return search_phrase(spark, idx, ["order", "sort"], "doc_id")


@query(
    "q_hybrid_search_rrf",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    len AS (SELECT doc_id, len(w) AS dl FROM d),
    stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM len),
    tf AS (
      SELECT doc_id, t, count(*) AS tf
      FROM (SELECT doc_id, unnest(w) AS t FROM d) GROUP BY 1, 2),
    q AS (SELECT * FROM tf WHERE t IN ('merge', 'window', 'scan')),
    dfq AS (SELECT t, count(*) AS df FROM q GROUP BY t),
    sc AS (
      SELECT q.doc_id,
             round(sum(
               ln(1 + ((SELECT n FROM stats) - dfq.df + 0.5) / (dfq.df + 0.5))
               * q.tf
               / (q.tf + 1.2 * (0.25 + 0.75 * len.dl / (SELECT avgdl FROM stats)))
             ), 6) AS score
      FROM q JOIN dfq USING (t) JOIN len USING (doc_id)
      GROUP BY q.doc_id),
    bmr AS (
      SELECT doc_id, rank FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY score DESC, doc_id)::INT AS rank
        FROM sc)
      WHERE rank <= 20),
    sim AS (
      SELECT c.vec_id AS doc_id,
             round(list_cosine_similarity(
               (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0),
               c.embedding::DOUBLE[]), 6) AS sim
      FROM embeddings c),
    annr AS (
      SELECT doc_id, rank FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY sim DESC, doc_id)::INT AS rank
        FROM sim)
      WHERE rank <= 20),
    fused AS (
      SELECT doc_id,
             round(coalesce(1.0 / (60 + b.rank), 0)
                   + coalesce(1.0 / (60 + a.rank), 0), 9) AS score
      FROM bmr b FULL OUTER JOIN annr a USING (doc_id))
    SELECT doc_id, score, rank FROM (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id)::INT AS rank
      FROM fused)
    WHERE rank <= 15
    """,
)
def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID retrieval — lexical BM25 over the inverted index fused
    with vector cosine ranking by reciprocal-rank fusion
    (functions.search.rrf_fuse; Cormack et al. SIGIR'09), the standard
    production RAG retrieval stack: two independent top-20 pools (each
    bounded by its own TakeOrderedAndProject / window machinery — no
    corpus-sized frame ever reaches the fusion), full-outer-joined on
    doc id, score(d) = Σ 1/(60 + rank). The oracle replays BOTH
    retrievers end to end (BM25 idf/length-norm/6-dp rounding; exact
    cosine ranking against the vec_id=0 query embedding) AND the
    fusion arithmetic — a rank off by one in either system reorders
    the fused list and breaks the hash. documents.doc_id and
    embeddings.vec_id share an id space in the test corpus, standing
    in for a corpus with both text and embedding columns."""
    from ray_beam_runner_spark.functions.search import (
        build_token_index,
        doc_lengths,
        rrf_fuse,
        search_bm25,
    )
    from ray_beam_runner_spark.functions.similarity import cosine_topk
    from ray_beam_runner_spark.queries import scratch_dir
    from ray_beam_runner_spark.sources import snapshots as snap

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    idx = scratch_dir("rbrs_hybidx_")
    lens = scratch_dir("rbrs_hyblen_")
    build_token_index(docs, idx, "doc_id", "text")
    snap.write_snapshot(
        doc_lengths(docs, "doc_id", "text"), lens, cluster_by=["doc_id"], n_files=2
    )
    bm25 = search_bm25(
        spark, idx, lens, ["merge", "window", "scan"], "doc_id", topk=20
    ).select("doc_id", "rank")
    embs = t(spark, sf_dir, "embeddings")
    ann = (
        cosine_topk(
            embs.filter(F.col("vec_id") == 0).select(
                F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
            ),
            embs,
            k=20,
        )
        .select(F.col("vec_id").alias("doc_id"), "rank")
    )
    return rrf_fuse([bm25, ann], "doc_id", rrf_k=60, topk=15)


@query(
    "q_incremental_dedup",
    oracle=f"""
    WITH corpus AS (
      SELECT DISTINCT md5({_NORM}) AS fp FROM documents
      WHERE source NOT IN ('src18', 'src19')),
    incoming AS (
      SELECT doc_id, md5({_NORM}) AS fp FROM documents
      WHERE source IN ('src18', 'src19')
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, md5({_NORM}) AS fp FROM documents
      WHERE source NOT IN ('src18', 'src19') AND doc_id % 50 = 0)
    SELECT i.doc_id
    FROM incoming i JOIN corpus c ON i.fp = c.fp
    ORDER BY i.doc_id
    """,
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion dedup: which docs in an incoming increment
    already exist in the standing corpus, by exact normalized-text
    fingerprint. The increment is src18/src19 plus a deterministic
    re-ingestion of every 50th corpus doc (re-keyed +100000) — the
    synthetic corpus has no natural exact dups, and a gate that can only
    ever return empty would not test the probe. The shape that matters
    at scale: the corpus side reduces to a DISTINCT fingerprint column
    (16 bytes/doc — the only state a 100 TB corpus needs for exact
    dedup), and the increment probes it with a semi join keyed on the
    fingerprint; with the fingerprint table bucketed on fp, successive
    increments join with no corpus-side shuffle at all."""
    from ray_beam_runner_spark.functions.text import fingerprint_md5

    docs = t(spark, sf_dir, "documents")
    inc_src = F.col("source").isin("src18", "src19")
    corpus = docs.filter(~inc_src)
    corpus_fp = corpus.select(fingerprint_md5(F.col("text")).alias("fp")).distinct()
    incoming = (
        docs.filter(inc_src)
        .select("doc_id", fingerprint_md5(F.col("text")).alias("fp"))
        .unionByName(
            corpus.filter(F.col("doc_id") % 50 == 0).select(
                (F.col("doc_id") + 100000).alias("doc_id"),
                fingerprint_md5(F.col("text")).alias("fp"),
            )
        )
    )
    return incoming.join(corpus_fp, "fp", "left_semi").select("doc_id").orderBy("doc_id")


@query(
    "q_incremental_minhash",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 11 = 0 THEN ' refreshed edition' ELSE '' END AS text
      FROM documents WHERE doc_id % 7 <> 0),
    toks AS (
      SELECT doc_id, {_TOKS} AS w FROM docs),
    grams AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id, unnest({_G3}) AS g FROM toks)),
    sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT d1, d2, jaccard FROM (
      SELECT d1, d2, round(i::DOUBLE / (s1.n + s2.n - i), 6) AS jaccard
      FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2)
    WHERE jaccard >= 0.5
    """,
)
def q_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTALLY MAINTAINED MinHash-LSH dedup index, oracle-checked
    through exact-verified pairs (round 11: the dedup-family member of
    the maintained-index set — token index, IVF-PQ, fuzzy probe): seed
    the banded-signature bucket TABLE from the initial corpus slice,
    then drive it purely from the documents change feed — a CDC merge
    ingests the rest, an update commit re-signs the changed texts (the
    keyed MERGE swaps a doc's whole posting set atomically), a CDC
    delete retracts. Near-dup pairs then come from the MAINTAINED
    table's bucket self-join with exact-Jaccard verification of
    candidates only; signature hashing is amortized into ingestion
    instead of paid per query. The oracle computes exact threshold
    pairs over the same churned corpus — a maintenance bug (stale
    buckets, unretracted doc, missed re-sign) surfaces as a wrong pair
    set. See functions.dedup.stream_maintain_lsh_index /
    lsh_pairs_from_index."""
    from ray_beam_runner_spark.functions.dedup import (
        lsh_index_buckets,
        lsh_pairs_from_index,
        stream_maintain_lsh_index,
    )
    from ray_beam_runner_spark.queries import scratch_dir
    from ray_beam_runner_spark.sources import snapshots as snap

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    src = scratch_dir("rbrs_lshsrc_")
    idx = scratch_dir("rbrs_lshidx_")
    ckpt = scratch_dir("rbrs_lshckpt_")
    initial = docs.filter(F.col("doc_id") % 3 != 0)
    snap.write_snapshot(initial, src, cluster_by=["doc_id"], n_files=4)
    snap.write_snapshot(
        lsh_index_buckets(initial, "doc_id", "text"),
        idx, cluster_by=["doc_id"], n_files=4,
    )
    snap.upsert_snapshot(
        spark, src, docs.filter(F.col("doc_id") % 3 == 0), ["doc_id"], cdc=True
    )
    snap.upsert_snapshot(
        spark, src,
        docs.filter(F.col("doc_id") % 11 == 0).select(
            "doc_id", F.concat(F.col("text"), F.lit(" refreshed edition")).alias("text")
        ),
        ["doc_id"], cdc=True,
    )
    snap.delete_where(spark, src, F.col("doc_id") % 7 == 0, cdc=True)
    feed = snap.read_snapshot_stream(spark, src, starting_version=2)
    q = stream_maintain_lsh_index(feed, idx, "doc_id", "text", ckpt)
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("LSH index maintenance drain exceeded 300s")
    return lsh_pairs_from_index(
        snap.read_snapshot(spark, idx),
        snap.read_snapshot(spark, src),
        "doc_id", "text",
    )


@query(
    "q_stratified_sample",
    oracle="""
    SELECT source, doc_id
    FROM (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('strat:' || doc_id::VARCHAR), doc_id) AS rn
      FROM documents)
    WHERE rn <= 5
    ORDER BY source, doc_id
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified sampling: exactly k=5 docs per source, chosen by
    md5-hash order — a deterministic uniform draw reproducible across
    engines and runs (sampleBy() is only approximate and rand()-seeded
    per partition layout). The rank<=k predicate plans as
    WindowGroupLimit: each map task keeps only its top-k rows per
    stratum BEFORE the shuffle, so the exchange carries
    O(k x strata x tasks) rows, not the corpus — the per-group top-k
    shape that survives 100 TB. doc_id breaks md5 ties so the draw is
    total-ordered (collisions are 2^-64 but the gate must be exact)."""
    d = t(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))), F.col("doc_id")
    )
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    )


@query(
    "q_dedup_containment",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS w FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id, unnest({_G3}) AS g FROM toks)),
    sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT d1, d2, containment FROM (
      SELECT d1, d2, round(i::DOUBLE / least(s1.n, s2.n), 6) AS containment
      FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2)
    WHERE containment >= 0.8
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup by n-gram containment >= 0.8 — flags a doc
    quoted/wrapped inside a larger one, which Jaccard misses because the
    union is dominated by the larger doc. Same postings-join discipline
    as the Jaccard path; only the denominator differs."""
    from ray_beam_runner_spark.functions.dedup import ngram_containment_pairs

    return ngram_containment_pairs(
        t(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.8
    )


_FUZZY_KEY = f"array_to_string((string_split({_NORM}, ' '))[1:3], ' ')"


@query(
    "q_fuzzy_pairs",
    oracle=f"""
    WITH k AS (SELECT doc_id, {_FUZZY_KEY} AS key FROM documents)
    SELECT a.doc_id AS id_1, b.doc_id AS id_2,
           levenshtein(a.key, b.key) AS dist
    FROM k a JOIN k b ON a.doc_id < b.doc_id
    WHERE levenshtein(a.key, b.key) BETWEEN 1 AND 3
    """,
)
def q_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-miss entity pairs: every doc pair whose leading-3-word key is
    within edit distance 3 but not identical (exact matches belong to
    `q_dedup_exact`). The Spark plan is NOT the oracle's all-pairs
    levenshtein: PassJoin segment blocking turns it into a keyed postings
    equi-join with levenshtein only on the candidate superset — exact by
    the pigeonhole argument (functions/fuzzy.py), so it hash-matches the
    quadratic oracle while scaling as postings, not pairs."""
    from ray_beam_runner_spark.functions.fuzzy import edit_distance_pairs
    from ray_beam_runner_spark.functions.text import normalize_text

    keys = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(F.slice(F.split(normalize_text(F.col("text")), " "), 1, 3), " ").alias("key"),
    )
    return edit_distance_pairs(keys, "doc_id", "key", max_dist=3)


@query(
    "q_fuzzy_join",
    oracle=f"""
    WITH k AS (SELECT doc_id, source, {_FUZZY_KEY} AS key FROM documents)
    SELECT a.doc_id AS probe_id, b.doc_id AS corpus_id,
           levenshtein(a.key, b.key) AS dist
    FROM (SELECT doc_id, key FROM k
          WHERE source IN ('src0','src1','src2','src3','src4')) a
    JOIN (SELECT doc_id, key FROM k
          WHERE source NOT IN ('src0','src1','src2','src3','src4')) b
      ON levenshtein(a.key, b.key) <= 3
    """,
)
def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-relation fuzzy equi-join (entity resolution across feeds): docs
    from sources src0-4 matched against the rest of the corpus on the
    leading-3-word key within edit distance 3. The larger relation is
    segment-indexed; the smaller probes with O(d^3) substring keys/row, so
    probe cost rides the small side (functions/fuzzy.py fuzzy_join)."""
    from ray_beam_runner_spark.functions.fuzzy import fuzzy_join
    from ray_beam_runner_spark.functions.text import normalize_text

    probe_srcs = ("src0", "src1", "src2", "src3", "src4")
    keys = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.array_join(F.slice(F.split(normalize_text(F.col("text")), " "), 1, 3), " ").alias("key"),
    )
    left = keys.filter(F.col("source").isin(*probe_srcs)).select(
        F.col("doc_id").alias("probe_id"), F.col("key").alias("pkey")
    )
    right = keys.filter(~F.col("source").isin(*probe_srcs)).select(
        F.col("doc_id").alias("corpus_id"), F.col("key").alias("ckey")
    )
    return fuzzy_join(left, right, "pkey", "ckey", max_dist=3).select(
        "probe_id", "corpus_id", "dist"
    )


@query(
    "q_fuzzy_clusters",
    oracle=f"""
    WITH RECURSIVE
    k AS (SELECT doc_id, {_FUZZY_KEY} AS key FROM documents),
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2
      FROM k a JOIN k b ON a.doc_id < b.doc_id
      WHERE levenshtein(a.key, b.key) BETWEEN 1 AND 3),
    edges AS (SELECT d1 AS u, d2 AS v FROM pairs UNION SELECT d2, d1 FROM pairs),
    reach(a, b) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u),
    comp AS (SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a)
    SELECT doc_id,
           coalesce(component, doc_id) AS cluster,
           coalesce(component, doc_id) = doc_id AS is_survivor
    FROM documents LEFT JOIN comp ON doc_id = node
    """,
)
def q_fuzzy_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-key dedup CLUSTERS: connected components over the
    edit-distance pair graph (q_fuzzy_pairs' PassJoin output), every doc
    labeled with its component's min doc_id and a survivor flag — the
    near-miss-entity consolidation step (typo'd titles collapse to one
    canonical id). Same composition shape as q_dedup_clusters: banded
    pair generation feeds the alternating-star components operator;
    oracle is the all-pairs levenshtein graph's recursive-CTE closure."""
    from ray_beam_runner_spark.functions.fuzzy import edit_distance_pairs
    from ray_beam_runner_spark.functions.graph import dedup_clusters
    from ray_beam_runner_spark.functions.text import normalize_text

    docs = t(spark, sf_dir, "documents")
    keys = docs.select(
        "doc_id",
        F.array_join(F.slice(F.split(normalize_text(F.col("text")), " "), 1, 3), " ").alias("key"),
    )
    pairs = edit_distance_pairs(keys, "doc_id", "key", max_dist=3).select(
        F.col("id_1").alias("d1"), F.col("id_2").alias("d2")
    )
    return dedup_clusters(docs, pairs, id_col="doc_id")


@query(
    "q_incremental_fuzzy",
    oracle=f"""
    WITH k AS (SELECT doc_id, source, {_FUZZY_KEY} AS key FROM documents),
    corpus AS (
      SELECT DISTINCT key FROM k WHERE source NOT IN ('src18', 'src19')),
    inc AS (
      SELECT doc_id, key FROM k WHERE source IN ('src18', 'src19'))
    SELECT i.doc_id, min(levenshtein(i.key, c.key)) AS best_dist
    FROM inc i JOIN corpus c ON levenshtein(i.key, c.key) <= 2
    GROUP BY i.doc_id
    ORDER BY i.doc_id
    """,
)
def q_incremental_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-miss detection AT INGESTION: each incoming doc (src18/19)
    probed against the standing corpus's distinct keys for the closest
    match within 2 edits — the fuzzy sibling of q_incremental_dedup's
    exact-fingerprint probe (a typo'd near-copy slips an exact
    fingerprint; this catches it). The corpus side reduces to its
    distinct segment-indexable keys (the only standing state fuzzy
    ingestion needs — index it once, probe every increment); the small
    increment side pays the O(d^3) probe fan-out, so per-batch cost
    rides the batch. min() per incoming doc keeps the gate row one
    line per flagged doc."""
    from ray_beam_runner_spark.functions.fuzzy import fuzzy_join
    from ray_beam_runner_spark.functions.text import normalize_text

    docs = t(spark, sf_dir, "documents")
    key = F.array_join(
        F.slice(F.split(normalize_text(F.col("text")), " "), 1, 3), " "
    ).alias("key")
    inc_src = F.col("source").isin("src18", "src19")
    corpus = docs.filter(~inc_src).select(key).distinct().select(
        F.col("key").alias("ckey")
    )
    inc = docs.filter(inc_src).select("doc_id", key)
    return (
        fuzzy_join(inc, corpus, "key", "ckey", max_dist=2)
        .groupBy("doc_id")
        .agg(F.min("dist").alias("best_dist"))
        .orderBy("doc_id")
    )


@query(
    "q_weighted_sample",
    oracle="""
    WITH w AS (
      SELECT source, doc_id,
             (('0x' || substr(md5('wrace:' || doc_id::VARCHAR), 1, 8))::BIGINT
              + 1)::DOUBLE / n_chars AS key
      FROM documents WHERE n_chars > 0)
    SELECT source, doc_id FROM (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source ORDER BY key, doc_id) AS rn
      FROM w)
    WHERE rn <= 5
    ORDER BY source, doc_id
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional exactly-k sampling per stratum (the
    without-replacement draw corpus curation needs when 'sample 5 docs
    per source, longer docs more likely' must be reproducible): each doc
    draws a fixed-point md5 uniform u and finishes a race at time
    (u+1)/weight; the k earliest finishers per stratum win. This is
    Efraimidis-Sirmakis exponential-race sampling with the exponential
    -ln(U)/w replaced by its linear fixed-point surrogate U/w — the draw
    stays monotone in weight and deterministic, and the key needs ONLY
    integer hashing plus one IEEE-754 division of exactly-representable
    integers, so Spark and any oracle engine agree bitwise (pow/ln do
    not cross engines bit-exactly; division does). Same
    rank<=k-per-group shape as q_stratified_sample: WindowGroupLimit
    keeps k rows per stratum per map task BEFORE the shuffle, so the
    exchange carries O(k x strata x tasks) rows at any corpus size."""
    d = t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit("wrace:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    key = (u + F.lit(1)).cast("double") / F.col("n_chars")
    w = W.partitionBy("source").orderBy(key, F.col("doc_id"))
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    )


@query(
    "q_robust_outliers",
    oracle="""
    WITH med AS (
      SELECT source, median(n_chars) AS med
      FROM documents GROUP BY source),
    dev AS (
      SELECT d.source, d.doc_id, abs(d.n_chars - m.med) AS adev, m.med
      FROM documents d JOIN med m ON d.source = m.source),
    mad AS (
      SELECT source, median(adev) AS mad FROM dev GROUP BY source)
    SELECT v.source,
           round(v.med, 6) AS med,
           round(m.mad, 6) AS mad,
           count(*) FILTER (WHERE v.adev > 3 * m.mad) AS n_outliers,
           count(*) AS n_docs
    FROM dev v JOIN mad m ON v.source = m.source
    GROUP BY v.source, v.med, m.mad
    ORDER BY v.source
    """,
)
def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-stratum outlier detection (median/MAD, the
    length-anomaly screen that survives the heavy-tailed doc-length
    distributions a mean/stddev z-score drowns in): exact median and
    median-absolute-deviation per source, then a 3-MAD outlier count.
    Two narrow aggregations over the stratum key with the 20-row
    median table broadcast back between them — the exact-percentile
    sort is per-group and the group count is small; for
    high-cardinality keys at 100 TB the mergeable-sketch variant of
    this screen already exists (q_sketch_quantiles, DDSketch)."""
    d = t(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    med = d.groupBy("source").agg(F.percentile("n_chars", F.lit(0.5)).alias("med"))
    dev = d.join(F.broadcast(med), "source").select(
        "source", "med", F.abs(F.col("n_chars") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("source").agg(F.percentile("adev", F.lit(0.5)).alias("mad"))
    return (
        dev.join(F.broadcast(mad), "source")
        .groupBy("source", "med", "mad")
        .agg(
            F.count_if(F.col("adev") > 3 * F.col("mad")).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .select(
            "source",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n_outliers",
            "n_docs",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round-4 additions: semantic dedup, stutter cleanup, vocabulary extraction
# ---------------------------------------------------------------------------


@query(
    "q_dedup_semantic",
    oracle="""
    WITH RECURSIVE
    pairs AS (
      SELECT a.vec_id AS d1, b.vec_id AS d2
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
            >= 0.4),
    edges AS (SELECT d1 AS u, d2 AS v FROM pairs UNION SELECT d2, d1 FROM pairs),
    reach(a, b) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u),
    comp AS (SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a)
    SELECT vec_id,
           coalesce(component, vec_id) AS cluster,
           coalesce(component, vec_id) = vec_id AS is_survivor
    FROM embeddings LEFT JOIN comp ON vec_id = node
    """,
)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    cluster documents whose EMBEDDINGS are near-identical, keep one
    representative per cluster. This is the ORACLE form: pair generation
    is the exact blocked-GEMM cosine join (all-pairs — required because a
    SQL oracle cannot express the k-means quantizer, and the synthetic
    corpus is gap-free at the 0.4 threshold so no candidate filter is
    lossless). The production/scale form is :func:`q_dedup_semantic_scale`
    below — identical clustering, but pair generation is cluster-first
    within IVF cells (linear in n, SemDeDup-proper). Clustering is the
    same alternating-star connected components as the n-gram path —
    semantic dedup differs from lexical dedup only in the edge relation,
    so the cluster/survivor machinery is shared. Returns every vector
    labeled (cluster, is_survivor) with cluster = component min vec_id."""
    from ray_beam_runner_spark.functions.graph import dedup_clusters
    from ray_beam_runner_spark.functions.similarity import blocked_cosine_pairs

    emb = t(spark, sf_dir, "embeddings")
    pairs = blocked_cosine_pairs(emb, "vec_id", "embedding", threshold=0.4, n_blocks=16)
    return dedup_clusters(emb, pairs.select("v1", "v2"), id_col="vec_id", a="v1", b="v2")


@query("q_dedup_semantic_scale")  # no SQL oracle: k-means quantizer is not
# SQL-expressible; driver records a rows-only check. Exactness evidence
# lives in pytest (semdedup pairs ⊆ exact pairs, recall floor asserted)
# and BENCH_LLM_SCALING.json (subquadratic pair-generation growth).
def q_dedup_semantic_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production SemDeDup (Abbas et al. 2023 §3): spherical-k-means IVF
    cells first, exact cosine pairs only WITHIN each cell, then the same
    connected-components clustering as the oracle form. With n_cells
    grown ∝ corpus size (constant expected cell size), pair-generation
    flops are linear in n — this is the path that survives 100 TB, where
    :func:`q_dedup_semantic`'s all-pairs GEMM is quadratic. Cross-cell
    pairs are forgone by construction (the SemDeDup approximation);
    within-cell pairs are exact, so output is a labeled (cluster,
    is_survivor) per vector exactly like the oracle form."""
    from ray_beam_runner_spark.functions.graph import dedup_clusters
    from ray_beam_runner_spark.functions.similarity import semdedup_pairs

    emb = t(spark, sf_dir, "embeddings")
    pairs = semdedup_pairs(
        emb, "vec_id", "embedding", threshold=0.4, n_cells=16, n_blocks=4
    )
    return dedup_clusters(emb, pairs.select("v1", "v2"), id_col="vec_id", a="v1", b="v2")


@query(
    "q_collapse_repeats",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS ts FROM documents),
    kept AS (
      SELECT doc_id, len(ts) AS n_tok,
             list_filter(ts, (x, i) -> i = 1 OR x != ts[i - 1]) AS keep
      FROM toks)
    SELECT doc_id,
           n_tok::BIGINT AS n_tok,
           (n_tok - len(keep))::BIGINT AS n_removed,
           md5(array_to_string(keep, ' ')) AS clean_md5
    FROM kept
    """,
)
def q_collapse_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-duplicate-token cleanup (OCR stutter / boilerplate
    runs): collapse each run of a repeated token to its first occurrence
    and return the cleaned text's md5 so the REWRITE itself is in the hash
    gate, not just the counts. Two staged projections bind the token
    array once (HOF lambdas re-evaluate inline argument expressions per
    element — the q_text_stats lesson); the whole operator is expressions
    over one scan, no shuffle, no Python."""
    from ray_beam_runner_spark.functions import text as X

    docs = t(spark, sf_dir, "documents")
    stage1 = docs.select("doc_id", X.tokens(F.col("text")).alias("ts"))
    stage2 = stage1.select(
        "doc_id",
        F.size("ts").cast("long").alias("n_tok"),
        X.collapse_repeat_tokens(F.col("ts")).alias("keep"),
    )
    return stage2.select(
        "doc_id",
        "n_tok",
        (F.col("n_tok") - F.size("keep")).cast("long").alias("n_removed"),
        F.md5(F.array_join("keep", " ").cast("binary")).alias("clean_md5"),
    )


@query(
    "q_vocab_topk",
    oracle=f"""
    SELECT t AS token, count(*)::BIGINT AS cnt
    FROM (SELECT unnest({_TOKS}) AS t FROM documents)
    GROUP BY t ORDER BY cnt DESC, t LIMIT 20
    """,
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary heavy hitters: top-20 tokens by frequency
    (ties broken by token) — the first step of vocab/tokenizer training
    and boilerplate detection. Map-side partial aggregation shrinks the
    shuffle to distinct-token cardinality; the top-k is
    TakeOrderedAndProject (no global sort) like q_topk."""
    from ray_beam_runner_spark.functions import text as X

    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(X.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(20)
    )


# 20-token spans, built from the token array in DuckDB (inclusive 1-based
# slice); Spark builds the same spans with the word_ngrams regex (exact
# equivalence pinned in test_word_ngrams_regex_equivalence).
_G20 = "list_transform(generate_series(1, len(w) - 19), i -> array_to_string(w[i:i+19], ' '))"


@query(
    "q_dedup_spans",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id, unnest({_G20}) AS g FROM toks)),
    hot AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    per_doc AS (SELECT doc_id, count(*) AS n_spans FROM grams GROUP BY doc_id),
    dup AS (
      SELECT doc_id, count(*) AS n_dup_spans
      FROM grams WHERE g IN (SELECT g FROM hot) GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(n_spans, 0) AS n_spans,
           coalesce(n_dup_spans, 0) AS n_dup_spans,
           round(coalesce(n_dup_spans, 0) / greatest(coalesce(n_spans, 0), 1), 6) AS dup_frac
    FROM documents d
    LEFT JOIN per_doc USING (doc_id) LEFT JOIN dup USING (doc_id)
    """,
)
def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-SPAN detection (substring-level dedup, Lee et al.
    ACL 2022): per document, how many of its 20-token spans appear in 2+
    documents corpus-wide — the memorization-prone boilerplate signal
    that whole-document similarity misses. One persisted postings pass,
    both shuffles keyed by the span. See
    functions.dedup.repeated_span_stats."""
    from ray_beam_runner_spark.functions.dedup import repeated_span_stats

    return repeated_span_stats(t(spark, sf_dir, "documents"), "doc_id", "text", n=20, min_docs=2)


@query(
    "q_dedup_span_removal",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    occ AS (
      SELECT doc_id, i, array_to_string(w[i:i+19], ' ') AS g
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 19)) AS i FROM toks)),
    hot AS (
      SELECT g FROM (SELECT DISTINCT doc_id, g FROM occ)
      GROUP BY g HAVING count(*) >= 2),
    covered AS (
      SELECT DISTINCT doc_id, q FROM (
        SELECT doc_id, unnest(generate_series(i, i + 19)) AS q
        FROM occ WHERE g IN (SELECT g FROM hot))),
    words AS (
      SELECT doc_id, q, w[q] AS word
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS q FROM toks)),
    kept AS (
      SELECT words.doc_id, words.q, words.word
      FROM words LEFT JOIN covered c ON c.doc_id = words.doc_id AND c.q = words.q
      WHERE c.q IS NULL),
    rebuilt AS (
      SELECT doc_id, count(*) AS n_kept,
             md5(string_agg(word, ' ' ORDER BY q)) AS clean_md5
      FROM kept GROUP BY doc_id)
    SELECT t.doc_id,
           len(t.w)::BIGINT AS n_tok,
           coalesce(r.n_kept, 0)::BIGINT AS n_kept,
           coalesce(r.clean_md5, md5('')) AS clean_md5
    FROM toks t LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def q_dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup REMOVAL (Lee et al. ACL 2022 rewrite step):
    delete every token covered by an occurrence of a 20-token span that
    appears in 2+ documents, then rebuild the surviving text in order.
    q_dedup_spans measures the boilerplate; this query cuts it. All
    shuffles span- or doc-keyed over one persisted postings pass; the
    result hashes the cleaned text so the oracle compare stays compact.
    See functions.dedup.remove_repeated_spans."""
    from ray_beam_runner_spark.functions.dedup import remove_repeated_spans

    out = remove_repeated_spans(t(spark, sf_dir, "documents"), "doc_id", "text", n=20, min_docs=2)
    return out.select(
        "doc_id",
        "n_tok",
        "n_kept",
        F.md5(F.col("clean_text").cast("binary")).alias("clean_md5"),
    )


@query(
    "q_token_entropy",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, t, count(*) AS c
      FROM (SELECT doc_id, unnest({_TOKS}) AS t FROM documents)
      GROUP BY doc_id, t),
    n AS (SELECT doc_id, sum(c) AS n FROM tf GROUP BY doc_id)
    SELECT tf.doc_id,
           n::BIGINT AS n_tok,
           count(*)::BIGINT AS n_unique,
           round(-sum((c / n) * log2(c / n)), 6) AS entropy
    FROM tf JOIN n USING (doc_id)
    GROUP BY tf.doc_id, n.n
    """,
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (bits) —
    the model-free repetitiveness/quality signal: spam and boilerplate
    sit far below the corpus entropy band, random word soup at the top.
    One explode + two keyed aggregations, all map-side combinable; no
    Python. Complements the Gopher-rule gate (q_quality_filter) and the
    repetition metrics (q_repetition)."""
    from ray_beam_runner_spark.functions import text as X

    docs = t(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("tk"))
        .groupBy("doc_id", "tk")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tok"),
        F.count(F.lit(1)).alias("n_unique"),
        F.sum(F.col("c") * F.log2("c")).alias("_clogc"),
    )
    # -sum(c/n log2(c/n)) = log2(n) - sum(c log2 c)/n  (one pass, no
    # per-token division by a pre-joined total)
    return agg.select(
        "doc_id",
        "n_tok",
        "n_unique",
        F.round(F.log2("n_tok") - F.col("_clogc") / F.col("n_tok"), 6).alias("entropy"),
    )


@query(
    "q_tfidf_keywords",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, t, count(*) AS tf
      FROM (SELECT doc_id, unnest({_TOKS}) AS t FROM documents)
      GROUP BY doc_id, t),
    dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, t AS token,
             round(tf * ln(n_docs::DOUBLE / df), 6) AS score
      FROM tf JOIN dfreq USING (t) CROSS JOIN n)
    SELECT doc_id, token, score, rank FROM (
      SELECT doc_id, token, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token)::INT AS rank
      FROM scored)
    WHERE rank <= 3
    """,
)
def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keywords (top 3): term frequency per doc,
    document frequency from the same aggregate, idf = ln(N/df) with the
    corpus size joined in as a broadcast 1-row aggregate (no driver
    action in the query build). Ranking orders by the ROUNDED score then
    token, so cross-engine float ULP differences cannot flip ties. The
    window is per-doc (WindowGroupLimit prunes to 3 pre-shuffle on
    Spark 4), and both shuffles are map-side combinable counts."""
    from ray_beam_runner_spark.functions import text as X

    docs = t(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("score"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "token")
    return (
        scored.select("doc_id", "token", "score", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= 3)
    )


@query(
    "q_unigram_logppl",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, t, count(*) AS c
      FROM (SELECT doc_id, unnest({_TOKS}) AS t FROM documents)
      GROUP BY doc_id, t),
    lm AS (SELECT t, sum(c) AS cnt FROM tf GROUP BY t),
    total AS (SELECT sum(cnt) AS n FROM lm),
    scored AS (
      SELECT doc_id, sum(c) AS n_tok,
             sum(c * -ln(cnt / n)) AS nll
      FROM tf JOIN lm USING (t) CROSS JOIN total
      GROUP BY doc_id)
    SELECT doc_id, n_tok::BIGINT AS n_tok,
           round(nll / n_tok, 6) AS log_ppl
    FROM scored
    """,
)
def q_unigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model log-perplexity per document — the
    SQL-expressible analog of the KenLM perplexity filter CCNet-style
    pipelines run (Wenzek et al. 2020, arXiv:1911.00359): train unigram
    probabilities on the corpus itself (one aggregate), score each doc as
    mean negative log-likelihood via a token join. Documents far above
    the corpus band are gibberish/ocr noise; far below are boilerplate.
    Both shuffles are map-side combinable counts; the LM side joins on
    the token key (vocabulary-sized, broadcastable at typical vocab
    cardinality — left to the planner). The tf frame is persisted
    (session cache registry): it feeds both the score join and the
    lm/total lineage, and tokenization is the dominant cost — without
    the persist the duplicated branches tokenize the corpus twice."""
    from ray_beam_runner_spark.caches import track
    from ray_beam_runner_spark.functions import text as X

    docs = t(spark, sf_dir, "documents")
    tf = track(
        docs.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("tk"))
        .groupBy("doc_id", "tk")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    lm = tf.groupBy("tk").agg(F.sum("c").alias("cnt"))
    total = lm.agg(F.sum("cnt").alias("n"))
    return (
        tf.join(lm, "tk")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tok"),
            F.sum(F.col("c") * -F.log(F.col("cnt") / F.col("n"))).alias("_nll"),
        )
        .select(
            "doc_id",
            "n_tok",
            F.round(F.col("_nll") / F.col("n_tok"), 6).alias("log_ppl"),
        )
    )


@query(
    "q_decayed_engagement",
    oracle="""
    WITH mx AS (SELECT max(ts) AS m FROM events)
    SELECT user_id,
           count(*)::BIGINT AS n_events,
           round(sum(value * exp(-epoch(m - ts) / 604800.0)), 6) AS decayed_value
    FROM events CROSS JOIN mx
    GROUP BY user_id
    """,
)
def q_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement per user (1-week half-life
    scale): weight = exp(-age/604800s) relative to the corpus max
    timestamp — the standard recency-weighted feature aggregate. The max
    timestamp joins in as a broadcast 1-row aggregate; the group-by is
    map-side combinable because the weight is per-row, not per-group."""
    events = t(spark, sf_dir, "events")
    mx = events.agg(F.max("ts").alias("m"))
    age = F.col("m").cast("double") - F.col("ts").cast("double")
    return (
        events.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value") * F.exp(-age / 604800.0)), 6).alias("decayed_value"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing (training-batch prep)
# ---------------------------------------------------------------------------


@query(
    "q_sequence_pack",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id, len({_TOKS})::BIGINT AS n_tok FROM documents),
    packed AS (
      SELECT source, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
      FROM toks)
    SELECT source, doc_id, n_tok,
           ((cum - n_tok) // 2048)::BIGINT AS seq_id,
           ((cum - n_tok) % 2048)::BIGINT AS seq_offset
    FROM packed
    """,
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-split sequence packing: lay the corpus out as one
    token stream per source (docs in doc_id order) and cut it into
    fixed 2048-token training sequences — each doc gets the sequence id
    and offset where its tokens start. This is the standard packing
    recipe (no padding waste; a doc may straddle a boundary and the
    loader masks across it). The whole assignment is ONE windowed
    cumulative sum — no Python, no shuffle beyond the window's
    hash-partition by source.

    At 100 TB the packing domain must be data-parallel: partitioning by
    source alone can skew (one giant crawl source = one giant window
    partition). Production shape: domain = (source, shard) where shard
    is a deterministic hash bucket sized to ~1 GB of tokens (see
    text.hash_bucket) — same window expression, bounded partitions,
    identical semantics per domain. Sequence ids are then
    (domain, seq_id) pairs; nothing about the cumsum changes."""
    from ray_beam_runner_spark.functions.text import tokens

    docs = t(spark, sf_dir, "documents")
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    base = docs.select(
        "source", "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tok")
    ).withColumn("cum", F.sum("n_tok").over(w))
    start = F.col("cum") - F.col("n_tok")
    return base.select(
        "source",
        "doc_id",
        "n_tok",
        F.floor(start / 2048).cast("long").alias("seq_id"),
        (start % 2048).cast("long").alias("seq_offset"),
    )


@query(
    "q_sequence_pack_sharded",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id,
             ('0x' || substr(md5('pack:' || doc_id::VARCHAR), 1, 8))::BIGINT % 8
               AS shard,
             len({_TOKS})::BIGINT AS n_tok
      FROM documents),
    packed AS (
      SELECT source, shard, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
      FROM toks)
    SELECT source, shard, doc_id, n_tok,
           ((cum - n_tok) // 2048)::BIGINT AS seq_id,
           ((cum - n_tok) % 2048)::BIGINT AS seq_offset
    FROM packed
    """,
)
def q_sequence_pack_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing over the PRODUCTION domain (r6 verdict ask #6):
    (source, shard) where shard is a deterministic engine-portable hash
    bucket of the doc id (functions.text.hash_bucket — md5-based, so
    the oracle states the identical bucketing in SQL). q_sequence_pack
    documents why source-only packing skews at 100 TB (one giant crawl
    source = one giant window partition); this is that documented
    answer, oracle-checked: the same single windowed cumsum, but every
    window partition is bounded at ~1/n_shards of a source, so the
    biggest task stays O(source/shards) no matter how skewed the source
    mix. Sequence ids are per-(source, shard); a loader consumes shards
    independently, which is exactly how a 1000-executor job wants the
    batches laid out. In production size n_shards to ~1 GB of tokens;
    8 keeps the sf0.01 oracle readable."""
    from ray_beam_runner_spark.functions import text as X

    docs = t(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "doc_id",
        X.hash_bucket(F.col("doc_id"), 8, "pack").cast("long").alias("shard"),
        F.size(X.tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    w = (
        W.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = base.withColumn("cum", F.sum("n_tok").over(w))
    start = F.col("cum") - F.col("n_tok")
    return packed.select(
        "source",
        "shard",
        "doc_id",
        "n_tok",
        F.floor(start / 2048).cast("long").alias("seq_id"),
        (start % 2048).cast("long").alias("seq_offset"),
    )


@query("q_sequence_pack_ffd")  # rows-only: FFD bin ids have no closed SQL form
def q_sequence_pack_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-aware BEST-FIT packing (r8 verdict ask #7): first-fit-
    decreasing bin packing of whole documents into fixed 128-token
    sequences, per (source, hash-shard) domain — the packing recipe
    for models that exclude cross-document attention, minimizing
    padding instead of splitting docs (q_sequence_pack's concat-split
    is the zero-padding/straddling alternative). Deterministic: docs
    place in (length desc, doc_id asc) order into the first bin that
    fits; every run and engine yields the identical assignment —
    differentially pytest-verified against an independent FFD and
    invariant-checked (no bin overflows, bin count >= ceil(total/cap),
    waste strictly below the doc_id-order next-fit packer's). Bin
    assignment is order-sensitive with no closed SQL form, so this
    registers rows-only by design; the efficiency statistic is
    measured in scripts/bench_llm_scaling.py (padding-waste reduction
    vs the sequential packer). Parallel unit = the domain, exactly
    q_sequence_pack_sharded's skew answer. See functions.pack."""
    from ray_beam_runner_spark.functions import text as X
    from ray_beam_runner_spark.functions.pack import pack_ffd

    docs = t(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        X.hash_bucket(F.col("doc_id"), 4, "pack").cast("long").alias("shard"),
        "doc_id",
        F.size(X.tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    return pack_ffd(base, ["source", "shard"], "doc_id", "n_tok", capacity=128)


@query(
    "q_corpus_shuffle",
    oracle="""
    SELECT doc_id,
           row_number() OVER (
             ORDER BY md5('shuffle:42:' || doc_id::VARCHAR), doc_id
           )::BIGINT AS position
    FROM documents
    """,
)
def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training order: every doc gets a
    stable pseudo-random position (seeded md5 of its id) — rerunning the
    pipeline, on any cluster size, yields byte-identical training order.

    The oracle is a single global row_number; the implementation is the
    data-parallel equivalent a 100 TB corpus needs — a global window
    would serialize the whole corpus through one task. Two-pass bucketed
    rank: (1) bucket by the first hash byte (256 buckets), rank within
    each bucket by a PARALLEL per-bucket window; (2) the per-bucket
    counts (256 rows, the only driver traffic) prefix-sum into bucket
    offsets, broadcast back, position = offset + intra-bucket rank.
    Because buckets are ordered by hash prefix, offset+rank equals the
    global rank exactly. Same trick scales to any bucket count."""
    docs = t(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("shuffle:42:"), F.col("doc_id").cast("string")))
    tagged = docs.select("doc_id", h.alias("_h")).withColumn(
        "_b", F.conv(F.substring("_h", 1, 2), 16, 10).cast("int")
    )
    rn = F.row_number().over(W.partitionBy("_b").orderBy("_h", "doc_id"))
    ranked = tagged.withColumn("_rn", rn)
    counts = sorted(
        (r._b, r.n)
        for r in ranked.groupBy("_b").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for b, n in counts:
        offsets.append((b, acc))
        acc += n
    off_df = spark.createDataFrame(offsets, ["_b", "_off"])
    return (
        ranked.join(F.broadcast(off_df), "_b")
        .select("doc_id", (F.col("_off") + F.col("_rn")).cast("long").alias("position"))
    )


@query(
    "q_pmi_pairs",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    pairs_raw AS (
      SELECT least(w[i], w[i+1]) AS w1, greatest(w[i], w[i+1]) AS w2
      FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i)
      UNION ALL
      SELECT least(w[i], w[i+2]), greatest(w[i], w[i+2])
      FROM toks, unnest(generate_series(1, len(w) - 2)) AS t(i)),
    uni AS (SELECT unnest(w) AS t FROM toks),
    cw AS (SELECT t, count(*)::DOUBLE AS c FROM uni GROUP BY t),
    n AS (SELECT count(*)::DOUBLE AS n FROM uni),
    cp AS (SELECT w1, w2, count(*) AS c FROM pairs_raw GROUP BY w1, w2),
    p AS (SELECT count(*)::DOUBLE AS p FROM pairs_raw)
    SELECT w1, w2, cp.c::BIGINT AS n_pair,
           round(ln((cp.c / (SELECT p FROM p))
                 / ((c1.c / (SELECT n FROM n)) * (c2.c / (SELECT n FROM n)))),
                 6) AS pmi
    FROM cp JOIN cw c1 ON c1.t = cp.w1 JOIN cw c2 ON c2.t = cp.w2
    WHERE cp.c >= 5
    ORDER BY pmi DESC, w1, w2 LIMIT 50
    """,
)
def q_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over token co-occurrences (window
    ±2, unordered pairs): the distributional-semantics keyword-pair
    statistic (word2vec's implicit matrix). Pair generation is JOIN-FREE
    (r6 verdict ask #5): the (w[i], w[i+1]) and (w[i], w[i+2]) pairs
    come from zipping the token array against its own 1- and 2-shifted
    tails inside one narrow projection — the q_bigram_logppl pattern —
    so the exploded token table is never self-joined and never shuffled
    twice. Unigram and pair vocabularies aggregate map-side; the two
    vocab lookups broadcast (a token vocabulary is tiny next to the
    corpus; at web scale swap for a shuffle join and the plan is
    otherwise unchanged). Scalar totals ride in as broadcast 1-row
    frames. Top-50 by 6-decimal-rounded PMI with full lexical tie-break
    keeps the cut cross-engine deterministic."""
    from ray_beam_runner_spark.functions.text import tokens

    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("w"))
    # ±1 and ±2 neighbor pairs in ONE narrow pass: concat of two
    # zip-against-tail arrays, then a single explode. greatest(…, 0)
    # guards slice() against negative lengths on 1-token docs.
    pairs = (
        toks.select(
            F.explode(
                F.concat(
                    F.arrays_zip(
                        F.expr("slice(w, 1, greatest(size(w) - 1, 0))"),
                        F.expr("slice(w, 2, greatest(size(w) - 1, 0))"),
                    ),
                    F.arrays_zip(
                        F.expr("slice(w, 1, greatest(size(w) - 2, 0))"),
                        F.expr("slice(w, 3, greatest(size(w) - 2, 0))"),
                    ),
                )
            ).alias("p")
        )
        .select(
            F.least(F.col("p.0"), F.col("p.1")).alias("w1"),
            F.greatest(F.col("p.0"), F.col("p.1")).alias("w2"),
        )
    )
    ex = toks.select(F.explode("w").alias("w"))
    cw = ex.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("c"))
    n_tot = ex.agg(F.count(F.lit(1)).cast("double").alias("n"))
    cp = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    p_tot = pairs.agg(F.count(F.lit(1)).cast("double").alias("p"))
    c1 = cw.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    c2 = cw.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    return (
        cp.filter(F.col("c") >= 5)
        # c1/c2 are vocabulary-sized (grow with the corpus under Heaps'
        # law): no broadcast hint — AQE decides per scale.
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(n_tot))
        .crossJoin(F.broadcast(p_tot))
        .select(
            "w1",
            "w2",
            F.col("c").alias("n_pair"),
            F.round(
                F.log(
                    (F.col("c") / F.col("p"))
                    / ((F.col("c1") / F.col("n")) * (F.col("c2") / F.col("n")))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(50)
    )


# Shared bigram lineage (add-one + KN LM queries): per-doc bigram
# counts via the join-free zip-against-tail pass, and the matching
# oracle CTE prefix — ONE definition so the two smoothers can never
# silently diverge on tokenization/pair semantics.
_BIGRAM_CTE = f"""toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    bg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2, count(*) AS c
           FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i)
           GROUP BY doc_id, w1, w2),
    lm12 AS (SELECT w1, w2, sum(c) AS c12 FROM bg GROUP BY w1, w2)"""


def _doc_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w1, w2, c): consecutive pairs in ONE narrow pass —
    zip the token array against its own tail and explode (no join, no
    extra shuffle; plan-asserted in test_bigram_logppl_plan_no_join_
    for_pairs). Tracked-persisted: feeds both the LM lineage and the
    per-doc scoring join."""
    from ray_beam_runner_spark.caches import track
    from ray_beam_runner_spark.functions import text as X

    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", X.tokens(F.col("text")).alias("w"))
    return track(
        toks.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(w, 1, size(w) - 1)"),
                    F.expr("slice(w, 2, size(w) - 1)"),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )


@query(
    "q_bigram_logppl",
    oracle=f"""
    WITH {_BIGRAM_CTE},
    uni AS (SELECT t, count(*) AS c1
            FROM (SELECT unnest(w) AS t FROM toks) GROUP BY t),
    v AS (SELECT count(*)::DOUBLE AS v FROM uni),
    scored AS (
      SELECT doc_id, sum(bg.c) AS n_big,
             sum(bg.c * -ln((c12 + 1) / (c1 + (SELECT v FROM v)))) AS nll
      FROM bg JOIN lm12 USING (w1, w2) JOIN uni ON uni.t = bg.w1
      GROUP BY doc_id)
    SELECT doc_id, n_big::BIGINT AS n_bigrams, round(nll / n_big, 6) AS log_ppl2
    FROM scored
    """,
)
def q_bigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model log-perplexity per document (add-one
    smoothed): the order-sensitive upgrade of q_unigram_logppl — a doc
    of plausible words in implausible ORDER scores high here while the
    unigram filter cannot see it (word-salad/ngram-spam detection).
    Train on the corpus itself: P(w2|w1) = (c12+1)/(c1+V). Same scale
    shape as the unigram path — every aggregate map-side combinable,
    LM tables join on token keys (vocabulary-sized), the per-doc
    bigram frame persisted once since it feeds both the LM lineage and
    the scoring join."""
    from ray_beam_runner_spark.functions import text as X

    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", X.tokens(F.col("text")).alias("w"))
    bg = _doc_bigrams(spark, sf_dir)
    lm12 = bg.groupBy("w1", "w2").agg(F.sum("c").alias("c12"))
    uni = (
        toks.select(F.explode("w").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    v = uni.agg(F.count(F.lit(1)).cast("double").alias("v"))
    return (
        bg.join(lm12, ["w1", "w2"])
        .join(uni.withColumnRenamed("t", "w1"), "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_big"),
            F.sum(
                F.col("c")
                * -F.log((F.col("c12") + 1) / (F.col("c1") + F.col("v")))
            ).alias("_nll"),
        )
        .select(
            "doc_id",
            F.col("n_big").alias("n_bigrams"),
            F.round(F.col("_nll") / F.col("n_big"), 6).alias("log_ppl2"),
        )
    )


@query(
    "q_bigram_kn_logppl",
    oracle=f"""
    WITH {_BIGRAM_CTE},
    hist AS (SELECT w1, sum(c12)::DOUBLE AS c1, count(*)::DOUBLE AS n1f
             FROM lm12 GROUP BY w1),
    cont AS (SELECT w2, count(*)::DOUBLE AS n1b FROM lm12 GROUP BY w2),
    tt AS (SELECT count(*)::DOUBLE AS t FROM lm12),
    scored AS (
      SELECT doc_id, sum(bg.c) AS n_big,
             sum(bg.c * -ln(
               greatest(c12 - 0.75, 0) / c1
               + (0.75 * n1f / c1) * (n1b / (SELECT t FROM tt))
             )) AS nll
      FROM bg JOIN lm12 USING (w1, w2)
              JOIN hist USING (w1)
              JOIN cont USING (w2)
      GROUP BY doc_id)
    SELECT doc_id, n_big::BIGINT AS n_bigrams, round(nll / n_big, 6) AS log_ppl_kn
    FROM scored
    """,
)
def q_bigram_kn_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney smoothed bigram log-perplexity per document — the
    production-grade upgrade of q_bigram_logppl's add-one smoothing
    (absolute discount D=0.75 with the CONTINUATION back-off: a word is
    likely after an unseen history in proportion to how many DISTINCT
    histories it follows, the insight that makes KN the standard n-gram
    smoother). Scoring the training corpus itself means every scored
    bigram has c12 >= 1, so the discounted term never hits zero and the
    whole model is closed-form SQL. Same scale shape as the add-one
    path: join-free pair generation (zip-against-tail), every aggregate
    map-side combinable, the LM tables vocabulary-sized, history /
    continuation statistics two more small group-bys over the distinct
    bigram table."""
    from ray_beam_runner_spark.caches import track

    bg = _doc_bigrams(spark, sf_dir)
    lm12 = track(bg.groupBy("w1", "w2").agg(F.sum("c").alias("c12")))
    hist = lm12.groupBy("w1").agg(
        F.sum("c12").cast("double").alias("c1"),
        F.count(F.lit(1)).cast("double").alias("n1f"),
    )
    cont = lm12.groupBy("w2").agg(F.count(F.lit(1)).cast("double").alias("n1b"))
    tt = lm12.agg(F.count(F.lit(1)).cast("double").alias("t"))
    p_kn = (
        F.greatest(F.col("c12") - 0.75, F.lit(0.0)) / F.col("c1")
        + (0.75 * F.col("n1f") / F.col("c1")) * (F.col("n1b") / F.col("t"))
    )
    return (
        bg.join(lm12, ["w1", "w2"])
        .join(hist, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tt))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_big"),
            F.sum(F.col("c") * -F.log(p_kn)).alias("_nll"),
        )
        .select(
            "doc_id",
            F.col("n_big").alias("n_bigrams"),
            F.round(F.col("_nll") / F.col("n_big"), 6).alias("log_ppl_kn"),
        )
    )


@query(
    "q_trigram_kn_logppl",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    tg AS MATERIALIZED (
      SELECT doc_id, w[i] AS w1, w[i+1] AS w2, w[i+2] AS w3, count(*)::BIGINT AS c
      FROM toks, unnest(generate_series(1, len(w) - 2)) AS t(i)
      WHERE len(w) >= 3
      GROUP BY doc_id, w1, w2, w3),
    lm123 AS MATERIALIZED (
      SELECT w1, w2, w3, sum(c)::DOUBLE AS c123 FROM tg GROUP BY 1, 2, 3),
    h12 AS MATERIALIZED (
      SELECT w1, w2, sum(c123) AS c12,
             sum(CASE WHEN c123 = 1 THEN 1 ELSE 0 END)::DOUBLE AS nh1,
             sum(CASE WHEN c123 = 2 THEN 1 ELSE 0 END)::DOUBLE AS nh2,
             sum(CASE WHEN c123 >= 3 THEN 1 ELSE 0 END)::DOUBLE AS nh3
      FROM lm123 GROUP BY 1, 2),
    cb23 AS MATERIALIZED (
      SELECT w2, w3, count(*)::DOUBLE AS cb FROM lm123 GROUP BY 1, 2),
    h2 AS MATERIALIZED (
      SELECT w2, sum(cb) AS cdot2,
             sum(CASE WHEN cb = 1 THEN 1 ELSE 0 END)::DOUBLE AS mh1,
             sum(CASE WHEN cb = 2 THEN 1 ELSE 0 END)::DOUBLE AS mh2,
             sum(CASE WHEN cb >= 3 THEN 1 ELSE 0 END)::DOUBLE AS mh3
      FROM cb23 GROUP BY 1),
    cu3 AS MATERIALIZED (SELECT w3, count(*)::DOUBLE AS cu FROM cb23 GROUP BY 1),
    d3 AS (SELECT greatest(0.0, 1.0 - 2.0 * y * n2 / greatest(n1, 1.0)) AS d3_1,
                  greatest(0.0, 2.0 - 3.0 * y * n3 / greatest(n2, 1.0)) AS d3_2,
                  greatest(0.0, 3.0 - 4.0 * y * n4 / greatest(n3, 1.0)) AS d3_3
           FROM (SELECT n1, n2, n3, n4, n1 / greatest(n1 + 2.0 * n2, 1.0) AS y FROM (
             SELECT sum(CASE WHEN c123 = 1 THEN 1 ELSE 0 END)::DOUBLE AS n1,
                    sum(CASE WHEN c123 = 2 THEN 1 ELSE 0 END)::DOUBLE AS n2,
                    sum(CASE WHEN c123 = 3 THEN 1 ELSE 0 END)::DOUBLE AS n3,
                    sum(CASE WHEN c123 = 4 THEN 1 ELSE 0 END)::DOUBLE AS n4
             FROM lm123))),
    d2 AS (SELECT greatest(0.0, 1.0 - 2.0 * y * n2 / greatest(n1, 1.0)) AS d2_1,
                  greatest(0.0, 2.0 - 3.0 * y * n3 / greatest(n2, 1.0)) AS d2_2,
                  greatest(0.0, 3.0 - 4.0 * y * n4 / greatest(n3, 1.0)) AS d2_3
           FROM (SELECT n1, n2, n3, n4, n1 / greatest(n1 + 2.0 * n2, 1.0) AS y FROM (
             SELECT sum(CASE WHEN cb = 1 THEN 1 ELSE 0 END)::DOUBLE AS n1,
                    sum(CASE WHEN cb = 2 THEN 1 ELSE 0 END)::DOUBLE AS n2,
                    sum(CASE WHEN cb = 3 THEN 1 ELSE 0 END)::DOUBLE AS n3,
                    sum(CASE WHEN cb = 4 THEN 1 ELSE 0 END)::DOUBLE AS n4
             FROM cb23))),
    d1 AS (SELECT greatest(0.0, 1.0 - 2.0 * y * n2 / greatest(n1, 1.0)) AS d1_1,
                  greatest(0.0, 2.0 - 3.0 * y * n3 / greatest(n2, 1.0)) AS d1_2,
                  greatest(0.0, 3.0 - 4.0 * y * n4 / greatest(n3, 1.0)) AS d1_3
           FROM (SELECT n1, n2, n3, n4, n1 / greatest(n1 + 2.0 * n2, 1.0) AS y FROM (
             SELECT sum(CASE WHEN cu = 1 THEN 1 ELSE 0 END)::DOUBLE AS n1,
                    sum(CASE WHEN cu = 2 THEN 1 ELSE 0 END)::DOUBLE AS n2,
                    sum(CASE WHEN cu = 3 THEN 1 ELSE 0 END)::DOUBLE AS n3,
                    sum(CASE WHEN cu = 4 THEN 1 ELSE 0 END)::DOUBLE AS n4
             FROM cu3))),
    u AS (SELECT sum(cu) AS tot_cu,
                 sum(CASE WHEN cu = 1 THEN 1 ELSE 0 END)::DOUBLE AS u1,
                 sum(CASE WHEN cu = 2 THEN 1 ELSE 0 END)::DOUBLE AS u2,
                 sum(CASE WHEN cu >= 3 THEN 1 ELSE 0 END)::DOUBLE AS u3
          FROM cu3),
    vv AS (SELECT count(DISTINCT t)::DOUBLE AS v
           FROM (SELECT unnest(w) AS t FROM toks)),
    ds AS (SELECT *, (d1_1 * u1 + d1_2 * u2 + d1_3 * u3) / tot_cu AS gamma1
           FROM d3, d2, d1, u, vv),
    scored AS (
      SELECT tg.doc_id, sum(tg.c) AS n_tri,
             sum(tg.c * -ln(
               greatest(c123 - (CASE WHEN c123 = 1 THEN d3_1
                                     WHEN c123 = 2 THEN d3_2 ELSE d3_3 END), 0.0) / c12
               + ((d3_1 * nh1 + d3_2 * nh2 + d3_3 * nh3) / c12) * (
                   greatest(cb - (CASE WHEN cb = 1 THEN d2_1
                                       WHEN cb = 2 THEN d2_2 ELSE d2_3 END), 0.0) / cdot2
                   + ((d2_1 * mh1 + d2_2 * mh2 + d2_3 * mh3) / cdot2) * (
                       greatest(cu - (CASE WHEN cu = 1 THEN d1_1
                                           WHEN cu = 2 THEN d1_2 ELSE d1_3 END), 0.0)
                         / tot_cu
                       + gamma1 / v)))) AS nll
      FROM tg JOIN lm123 USING (w1, w2, w3)
              JOIN h12 USING (w1, w2)
              JOIN cb23 USING (w2, w3)
              JOIN h2 USING (w2)
              JOIN cu3 USING (w3), ds
      GROUP BY tg.doc_id)
    SELECT doc_id, n_tri::BIGINT AS n_trigrams, round(nll / n_tri, 6) AS log_ppl_kn3
    FROM scored
    """,
)
def q_trigram_kn_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated MODIFIED Kneser-Ney trigram log-perplexity per
    document (r8 verdict ask #6): the bigram KN path extended one order
    with the two production upgrades — three count-dependent discounts
    per order estimated closed-form from count-of-counts (Chen &
    Goodman 1999, the KenLM/SRILM formulation) and full interpolation,
    where each order mixes in the lower order with exactly the mass its
    discounts removed, so every conditional sums to 1 over the
    vocabulary (normalization pytest:
    tests/test_training_data.py::test_kn3_normalization_mass).
    Middle/bottom orders use continuation counts; the bottom
    interpolates with uniform 1/V. Discounts are computed IN-PLAN from
    integer counts with expression shapes mirrored verbatim in the
    oracle, so both engines run identical double arithmetic. Same
    scale shape as the bigram path: join-free zip-against-tail pair
    construction, vocabulary-sized LM tables, one broadcast stats row.
    See functions.lm."""
    from ray_beam_runner_spark.functions.lm import kn3_doc_logppl

    return kn3_doc_logppl(t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "q_sketch_freq",
    oracle=f"""
    WITH tok AS (SELECT source, unnest({_TOKS}) AS tk FROM documents),
    tf AS (SELECT tk, count(*)::BIGINT AS exact FROM tok GROUP BY tk),
    top AS (SELECT tk, exact FROM tf ORDER BY exact DESC, tk LIMIT 20),
    cells AS (
      SELECT t.j,
             ('0x' || substr(md5('cms' || t.j::VARCHAR || ':' || tok.tk), 1, 8))::BIGINT % 2048 AS pos,
             count(*)::BIGINT AS cnt
      FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS j) t
      GROUP BY 1, 2),
    est AS (
      SELECT top.tk, top.exact, min(c.cnt) AS est
      FROM top CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS j) t
      JOIN cells c
        ON c.j = t.j
       AND c.pos = ('0x' || substr(md5('cms' || t.j::VARCHAR || ':' || top.tk), 1, 8))::BIGINT % 2048
      GROUP BY top.tk, top.exact)
    SELECT tk AS token, exact, est, est >= exact AS never_under FROM est
    """,
)
def q_sketch_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable FREQUENCY sketch (Count-Min) — the counterpart of
    q_sketch_distinct's HLL cardinality blobs: per-source sparse CMS
    sketches of the token stream (bounded d x w rows per shard) union
    by a plain positional sum, and the merged sketch answers point
    queries for the corpus's top-20 tokens. Incremental-ingestion
    shape: tomorrow's shard sketch adds in O(sketch), no rescan. The
    md5-derived positions make every estimate deterministic, so exact
    counts, estimates, AND the never-undercount CMS property are all
    inside the hash. See functions.sketch."""
    from ray_beam_runner_spark.caches import track
    from ray_beam_runner_spark.functions import text as X
    from ray_beam_runner_spark.functions.sketch import (
        cms_estimate,
        cms_merge,
        cms_sketch,
    )

    docs = t(spark, sf_dir, "documents")
    # persisted: the tokenize+explode pass feeds BOTH the sketch and
    # the exact top-20 — without the persist each plan re-scans and
    # re-tokenizes the whole corpus
    toks = track(docs.select("source", F.explode(X.tokens(F.col("text"))).alias("tk")))
    merged = cms_merge(cms_sketch(toks, ["source"], "tk", w=2048, d=3), ["source"])
    top = (
        toks.groupBy("tk")
        .agg(F.count(F.lit(1)).alias("exact"))
        .orderBy(F.col("exact").desc(), "tk")
        .limit(20)
    )
    return cms_estimate(merged, top, "tk").select(
        F.col("tk").alias("token"),
        "exact",
        "est",
        (F.col("est") >= F.col("exact")).alias("never_under"),
    )


def _ddq_oracle(alpha: float, qs: list[float]) -> str:
    """DDSketch quantile oracle: replays the log-bucket index (with the
    9-dp ratio pin), the per-group cumulative rank walk, the midpoint
    estimate (6-dp pin), and the relative-error guarantee check. The γ
    and ln γ literals are the PYTHON-computed doubles repr()'d in, so
    both engines divide by bit-identical constants — DuckDB's own ln(γ)
    could differ from math.log by an ulp and shift a boundary bucket."""
    import math

    g = (1.0 + alpha) / (1.0 - alpha)
    lg, g1 = repr(math.log(g)), repr(g + 1.0)
    qlist = ", ".join(repr(float(q)) for q in qs)
    return f"""
    WITH v AS (SELECT source, n_chars::DOUBLE AS x FROM documents),
    b AS (
      SELECT source,
             (CASE WHEN x = 0 THEN -1000000000
                   ELSE ceil(round(ln(x) / {lg}, 9)) END)::BIGINT AS bucket,
             count(*)::BIGINT AS cnt
      FROM v GROUP BY 1, 2),
    qs AS (SELECT unnest([{qlist}]) AS q),
    cum AS (
      SELECT source, bucket, cnt,
             sum(cnt) OVER (PARTITION BY source ORDER BY bucket) AS c,
             sum(cnt) OVER (PARTITION BY source) AS n
      FROM b),
    hit AS (
      SELECT source, q, bucket FROM cum CROSS JOIN qs
      WHERE c >= floor(1 + q * (n - 1)) AND c - cnt < floor(1 + q * (n - 1))),
    est AS (
      SELECT source, q,
             CASE WHEN bucket = -1000000000 THEN 0.0
                  ELSE round(2 * power({repr(g)}, bucket) / {g1}, 6) END AS est
      FROM hit),
    rk AS (
      SELECT source, x, row_number() OVER (PARTITION BY source ORDER BY x) AS r,
             count(*) OVER (PARTITION BY source) AS n
      FROM v),
    ex AS (
      SELECT source, q, x AS exact FROM rk CROSS JOIN qs
      WHERE r = floor(1 + q * (n - 1)))
    SELECT e.source, e.q, e.est, ex.exact,
           ((ex.exact = 0 AND e.est = 0)
            OR abs(e.est - ex.exact) / ex.exact <= {alpha} + 1e-6) AS within_alpha
    FROM est e JOIN ex ON e.source = ex.source AND e.q = ex.q
    """


@query("q_sketch_quantiles", oracle=_ddq_oracle(0.02, [0.5, 0.9, 0.99]))
def q_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE sketch (DDSketch, Masson et al. VLDB 2019) —
    the third leg of the sketch family (HLL: distinct, CMS: frequency,
    this: distribution): per-(source, shard) log-bucket sketches of
    document lengths built in one map-side-combinable pass, merged
    across shards by a plain bucket sum (DDSketch merge is EXACT — the
    merged sketch equals the sketch of the merged stream), then
    p50/p90/p99 read off the merged sketch with a cumulative walk over
    BUCKETS, never data. The α = 2% relative-error guarantee is checked
    in-query against the true rank statistic and rides inside the hash,
    alongside the estimates themselves — deterministic because the
    bucket index pins the cross-engine log ratio at 9 dp and the
    midpoint estimate at 6 dp (the k-means recipe applied to
    sketching). Incremental-ingestion shape: tomorrow's shard adds in
    O(buckets). See functions.sketch.dd_sketch/dd_merge/dd_quantile."""
    from ray_beam_runner_spark.functions.sketch import (
        dd_merge,
        dd_quantile,
        dd_sketch,
    )

    qs = [0.5, 0.9, 0.99]
    docs = t(spark, sf_dir, "documents")
    vals = docs.select(
        "source",
        F.col("n_chars").cast("double").alias("v"),
        (F.col("doc_id") % 2).alias("shard"),
    )
    sk = dd_sketch(vals, ["source", "shard"], "v", alpha=0.02)
    est = dd_quantile(dd_merge(sk, ["shard"]), ["source"], qs)
    w_rk = W.partitionBy("source").orderBy("v")
    w_n = W.partitionBy("source")
    ranked = vals.select(
        "source",
        "v",
        F.row_number().over(w_rk).alias("r"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    exact = (
        ranked.crossJoin(F.broadcast(qdf))
        .filter(
            F.col("r")
            == F.floor(F.lit(1.0) + F.col("q") * (F.col("n") - 1)).cast("long")
        )
        .select("source", "q", F.col("v").alias("exact"))
    )
    return est.join(exact, ["source", "q"]).select(
        "source",
        "q",
        "est",
        "exact",
        (
            ((F.col("exact") == 0) & (F.col("est") == 0))
            | (F.abs(F.col("est") - F.col("exact")) / F.col("exact") <= 0.02 + 1e-6)
        ).alias("within_alpha"),
    )


@query(
    "q_sketch_distinct",
    oracle=f"""
    WITH fp AS (SELECT source, md5({_NORM}) AS fp FROM documents),
    per_src AS (SELECT source, count(DISTINCT fp) AS n_exact FROM fp GROUP BY source),
    tot AS (SELECT count(DISTINCT fp) AS total_exact FROM fp)
    SELECT source, n_exact::BIGINT AS n_exact, TRUE AS src_est_ok,
           (SELECT total_exact FROM tot)::BIGINT AS total_exact,
           TRUE AS union_est_ok
    FROM per_src ORDER BY source
    """,
)
def q_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    Spark's hll_sketch_agg/hll_union_agg): one pass builds a compact
    per-source sketch of document fingerprints, and the CORPUS-WIDE
    distinct count comes from unioning the 20 sketch blobs — never
    re-scanning the data. This is the incremental-ingestion shape: keep
    yesterday's per-shard sketches (bytes, not rows), union in today's
    increment, report corpus cardinality in O(sketches). Sketch values
    are engine-specific so, like q_approx_distinct, the gate checks the
    documented ERROR BOUND in-query: per-source and unioned estimates
    must land within 5% of exact (lgK=12 → ~1.6% rsd; deterministic for
    fixed input), emitted as booleans the oracle expects TRUE."""
    from ray_beam_runner_spark.functions.text import fingerprint_md5

    docs = t(spark, sf_dir, "documents").select(
        "source", fingerprint_md5(F.col("text")).alias("fp")
    )
    per_src = docs.groupBy("source").agg(
        F.expr("hll_sketch_agg(fp, 12)").alias("_sk"),
        F.count_distinct("fp").alias("n_exact"),
    )
    union_est = per_src.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(_sk))").alias("_uest")
    )
    total_exact = docs.agg(F.count_distinct("fp").alias("total_exact"))
    return (
        per_src.withColumn(
            "_est", F.expr("hll_sketch_estimate(_sk)")
        )
        .crossJoin(F.broadcast(union_est))
        .crossJoin(F.broadcast(total_exact))
        .select(
            "source",
            "n_exact",
            (
                F.abs(F.col("_est") - F.col("n_exact"))
                / F.greatest(F.col("n_exact"), F.lit(1))
                <= 0.05
            ).alias("src_est_ok"),
            "total_exact",
            (
                F.abs(F.col("_uest") - F.col("total_exact"))
                / F.greatest(F.col("total_exact"), F.lit(1))
                <= 0.05
            ).alias("union_est_ok"),
        )
        .orderBy("source")
    )


@query(
    "q_sketch_overlap",
    oracle="""
    WITH s AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'),
    p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    x AS (SELECT count(*) AS n_overlap FROM s JOIN p USING (user_id))
    SELECT (SELECT count(*) FROM s)::BIGINT AS n_signup,
           (SELECT count(*) FROM p)::BIGINT AS n_purchase,
           (SELECT n_overlap FROM x)::BIGINT AS n_overlap,
           TRUE AS overlap_est_ok
    """,
)
def q_sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL SET ALGEBRA (round 11): estimated audience overlap between
    two event populations by inclusion–exclusion over mergeable
    sketches — |A∩B| ≈ est(A) + est(B) − est(A∪B) — computed entirely
    from three sketch BLOBS, never a distinct-join of the populations.
    This is the sketch answer to "how many signup users also purchased"
    at 100 TB: each population keeps a bytes-sized HLL (maintained
    incrementally per shard/day), the union comes from hll_union_agg of
    the two blobs, and the overlap is arithmetic. Inclusion–exclusion
    compounds the individual estimator errors, so the in-query check
    uses a wider documented band (10% of the TRUE overlap + 2% of the
    union, covering small-intersection blowup); the oracle computes the
    exact populations and intersection and expects the flag TRUE."""
    ev = t(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select("user_id")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id")
    sk = (
        s.agg(F.expr("hll_sketch_agg(user_id, 12)").alias("_a"))
        .crossJoin(p.agg(F.expr("hll_sketch_agg(user_id, 12)").alias("_b")))
    )
    est = sk.select(
        F.expr("hll_sketch_estimate(_a)").alias("_ea"),
        F.expr("hll_sketch_estimate(_b)").alias("_eb"),
        F.expr(
            "hll_sketch_estimate(hll_union(_a, _b))"
        ).alias("_eu"),
    ).select((F.col("_ea") + F.col("_eb") - F.col("_eu")).alias("_eo"), "_eu")
    exact = (
        s.distinct().agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(p.distinct().agg(F.count(F.lit(1)).alias("n_purchase")))
        .crossJoin(
            s.distinct().join(p.distinct(), "user_id").agg(
                F.count(F.lit(1)).alias("n_overlap")
            )
        )
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "n_signup",
        "n_purchase",
        "n_overlap",
        (
            F.abs(F.col("_eo") - F.col("n_overlap"))
            <= F.greatest(
                F.col("n_overlap") * 0.10 + F.col("_eu") * 0.02, F.lit(5.0)
            )
        ).alias("overlap_est_ok"),
    )


_CORPUS_QUALITY = (
    "0.4 * (least(len(ws), 100) / 100.0)"
    f" + 0.4 * least((len(list_filter(ws, t -> t IN ({_STOP_EN})))::DOUBLE"
    " / greatest(len(ws), 1)) * 4.0, 1.0)"
    f" + 0.2 * (1.0 - least((len(regexp_extract_all(text, '{_PUNCT_RE}'))::DOUBLE"
    " / greatest(length(text), 1)) * 10.0, 1.0))"
)


@query(
    "q_corpus_epoch_read",
    oracle=f"""
    WITH a AS (
      SELECT doc_id, source, text FROM documents WHERE doc_id % 4 = 1),
    en AS (
      SELECT doc_id, source, text, {{TOKS}} AS ws, md5({{NORM}}) AS fp
      FROM a),
    sc AS (
      SELECT doc_id, source, fp, ws, len(ws) AS n_tok,
             round({{QUAL}}, 6) AS q
      FROM en),
    pass AS (SELECT * FROM sc WHERE q >= 0.5),
    canon AS (
      SELECT doc_id, source, ws, n_tok FROM (
        SELECT doc_id, source, ws, n_tok,
               row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM pass) WHERE rn = 1),
    agg AS (
      SELECT source, count(*)::BIGINT AS cnt, sum(n_tok)::BIGINT AS sum_n_tok
      FROM canon GROUP BY source),
    post AS (
      SELECT source, count(*)::BIGINT AS n_postings FROM (
        SELECT DISTINCT doc_id, source, unnest(ws) AS t FROM canon)
      GROUP BY source)
    SELECT source, cnt, sum_n_tok, n_postings
    FROM agg JOIN post USING (source) ORDER BY source
    """.replace("{TOKS}", _TOKS).replace("{NORM}", _NORM).replace(
        "{QUAL}", _CORPUS_QUALITY
    ),
)
def q_corpus_epoch_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascade READ EPOCHS (round 12 — corpus.record_corpus_epoch /
    read_corpus): cross-view read consistency for queries that JOIN
    maintained views. Builds the corpus cascade over batch A
    (doc_id % 4 = 1), drains — recording epoch E1's version vector in
    the state table's manifest — then ingests batch B (% 4 = 2) into
    the LIVE state WITHOUT draining. The returned query joins THREE
    views (token index × state × aggregate IVM) through read_corpus(),
    which pins all of them to E1: per-source canonical doc counts,
    token totals, and inverted-index posting counts. The oracle
    computes the same numbers from batch A ALONE — the hash therefore
    proves the epoch pin (any leakage of batch B through any of the
    three views, or a torn read mixing E1 and the advanced state,
    changes the counts). Each view alone was always snapshot-isolated;
    the epoch makes the JOIN isolated."""
    from ray_beam_runner_spark.corpus import (
        init_corpus_views,
        drain_corpus_views,
        read_corpus,
        refresh_corpus_state,
    )
    from ray_beam_runner_spark.queries import scratch_dir
    from ray_beam_runner_spark.sources import snapshots as snap

    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    src = scratch_dir("rbrs_epoch_src_")
    state = scratch_dir("rbrs_epoch_state_")
    work = scratch_dir("rbrs_epoch_work_")

    snap.write_snapshot(
        docs.filter(F.col("doc_id") % 4 == 1), src, cluster_by=["doc_id"], n_files=2
    )
    refresh_corpus_state(spark, src, state)
    layout = init_corpus_views(spark, state, work)
    drain_corpus_views(spark, layout)  # records epoch E1

    # batch B lands in the LIVE cascade state — but no drain, no epoch:
    # an unpinned multi-view join here could mix pre/post views
    snap.upsert_snapshot(
        spark, src, docs.filter(F.col("doc_id") % 4 == 2), ["doc_id"], cdc=True
    )
    refresh_corpus_state(spark, src, state)

    c = read_corpus(spark, layout)  # pinned to E1, all views at once
    canon = c["state"].filter("is_canon").select("doc_id", "source")
    postings = (
        c["idx"]
        .join(canon, "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_postings"))
    )
    agg = c["agg"].filter(F.col("cnt") > 0).select(
        "source", "cnt", F.col("sum_n_tok").cast("long").alias("sum_n_tok")
    )
    return agg.join(postings, "source").orderBy("source")


_HYBRID_TERMS = ("merge", "window", "scan")


def _corpus_hybrid_oracle() -> str:
    """Epoch-pinned hybrid retrieval replayed end to end in SQL: the
    cascade state at E1 (batch A enrich → quality gate → canonical
    election), the deterministic text embedding (md5 feature hashing,
    dim 8, L2-normalized — corpus.text_embedding's documented DuckDB
    analog), the CASCADE's IVF-PQ quantizer training + encode + ADC
    shortlist (the verified _ivfpq_oracle machinery via its composition
    hooks), exact-L2 re-rank of the shortlist, BM25 over the E1 token
    postings, and reciprocal-rank fusion. Any leakage of the advanced
    live state through any leg — or a torn read mixing quantizer
    generations — changes ranks and breaks the hash."""
    terms_in = ", ".join(f"'{t}'" for t in _HYBRID_TERMS)
    qtext = " ".join(_HYBRID_TERMS)
    bucket = "('0x' || substr(md5('emb:' || t), 1, 8))::BIGINT % 8"
    cnt_ws = (
        "list_transform(generate_series(0, 7), b -> "
        f"(len(list_filter(ws, t -> {bucket} = b)))::DOUBLE)"
    )
    norm = "greatest(sqrt(list_sum(list_transform(cnt, y -> y * y))), 1.0)"
    prelude = [
        "a AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 = 1)",
        f"en AS (SELECT doc_id, text, {_TOKS} AS ws, md5({_NORM}) AS fp FROM a)",
        "qual AS (SELECT doc_id, fp, ws, len(ws) AS n_tok, "
        f"round({_CORPUS_QUALITY}, 6) AS qq FROM en)",
        "pass AS (SELECT * FROM qual WHERE qq >= 0.5)",
        "canon AS (SELECT doc_id, ws, n_tok FROM ("
        "SELECT doc_id, ws, n_tok,"
        " row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn"
        " FROM pass) WHERE rn = 1)",
        f"vc AS (SELECT doc_id AS vid, {cnt_ws} AS cnt FROM canon)",
        f"qtv AS (SELECT {cnt_ws} AS cnt FROM "
        f"(SELECT {_TOKS} AS ws FROM (SELECT '{qtext}' AS text)))",
    ]
    ann = _ivfpq_oracle(
        n_cells=4, m=4, k=8, n_iter=1, dim=8,
        prelude=prelude,
        v_sql=f"v AS (SELECT vid, list_transform(cnt, x -> x / {norm}) AS e FROM vc)",
        q_sql=f"q AS (SELECT 0 AS qid, list_transform(cnt, x -> x / {norm}) AS e FROM qtv)",
        tail="",
    )
    more = [
        # ADC shortlist (k * alpha = 20 * 4, ivfpq_topk_rerank stage 1)
        "shortl AS (SELECT vid FROM ("
        "SELECT vid, row_number() OVER (ORDER BY adc, vid) AS rn FROM sc)"
        " WHERE rn <= 80)",
        # exact squared-L2 re-rank of the shortlist (stage 2)
        "rrd AS (SELECT v.vid, round(list_sum(list_transform(generate_series(1, 8),"
        " i -> (q.e[i] - v.e[i]) * (q.e[i] - v.e[i]))), 6) AS dist"
        " FROM v JOIN shortl USING (vid), q)",
        "annr AS (SELECT vid AS doc_id, rank FROM ("
        "SELECT vid, row_number() OVER (ORDER BY dist, vid)::INT AS rank FROM rrd)"
        " WHERE rank <= 20)",
        # BM25 over the E1 postings (tf per doc/term, df, n_tok lengths)
        "bmtok AS (SELECT doc_id, unnest(ws) AS t FROM canon)",
        f"bmtf AS (SELECT doc_id, t, count(*) AS tf FROM bmtok"
        f" WHERE t IN ({terms_in}) GROUP BY doc_id, t)",
        "bmdf AS (SELECT t, count(*) AS df FROM bmtf GROUP BY t)",
        "bmstat AS (SELECT count(*)::DOUBLE AS n, avg(n_tok) AS avgdl FROM canon)",
        "bmsc AS (SELECT f.doc_id, round(sum("
        "ln(1.0 + ((SELECT n FROM bmstat) - d.df + 0.5) / (d.df + 0.5))"
        " * f.tf / (f.tf + 1.2 * (0.25 + 0.75 * c.n_tok / (SELECT avgdl FROM bmstat)))"
        "), 6) AS score"
        " FROM bmtf f JOIN bmdf d USING (t) JOIN canon c USING (doc_id)"
        " GROUP BY f.doc_id)",
        "bmr AS (SELECT doc_id, rank FROM ("
        "SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)::INT AS rank"
        " FROM bmsc) WHERE rank <= 20)",
        "fused AS (SELECT doc_id,"
        " round(coalesce(1.0 / (60 + b.rank), 0)"
        " + coalesce(1.0 / (60 + a.rank), 0), 9) AS score"
        " FROM bmr b FULL OUTER JOIN annr a USING (doc_id))",
    ]
    tail = """
    SELECT doc_id, score, rank FROM (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id)::INT AS rank
      FROM fused)
    WHERE rank <= 10
    """
    return ann + ",\n    " + ",\n    ".join(more) + tail


@query("q_corpus_hybrid_search", oracle=_corpus_hybrid_oracle())
def q_corpus_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPOCH-PINNED HYBRID SEARCH over the corpus cascade (round-12
    verdict "What's missing" #5 — the epoch machinery's flagship query
    shape, now oracle-hashed): build the cascade over batch A
    (doc_id % 4 = 1), drain — epoch E1 — then ADVANCE the live state
    with batch B (% 4 = 2) WITHOUT draining, and run
    corpus.corpus_hybrid_search at E1: a BM25 top-20 pool over the E1
    token index (token-pruned point reads, lengths and N from the E1
    state) fused by reciprocal rank (k=60) with an IVF-PQ
    cosine-family pool (ADC shortlist 80 → exact-L2 re-rank top 20,
    quantizer generation pinned through the index's version pins).
    The oracle replays every leg from batch A alone — leaked batch-B
    postings, vectors, lengths, or a mixed quantizer generation all
    reorder the fused list and break the hash."""
    from ray_beam_runner_spark.corpus import (
        corpus_hybrid_search,
        drain_corpus_views,
        init_corpus_views,
        refresh_corpus_state,
    )
    from ray_beam_runner_spark.queries import scratch_dir
    from ray_beam_runner_spark.sources import snapshots as snap

    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    src = scratch_dir("rbrs_hyb_src_")
    state = scratch_dir("rbrs_hyb_state_")
    work = scratch_dir("rbrs_hyb_work_")

    snap.write_snapshot(
        docs.filter(F.col("doc_id") % 4 == 1), src, cluster_by=["doc_id"], n_files=2
    )
    refresh_corpus_state(spark, src, state)
    layout = init_corpus_views(spark, state, work)
    e1 = drain_corpus_views(spark, layout)  # epoch E1

    # live state advances past E1 — no drain, no new epoch: the search
    # below must not see ANY of this through ANY leg
    snap.upsert_snapshot(
        spark, src, docs.filter(F.col("doc_id") % 4 == 2), ["doc_id"], cdc=True
    )
    refresh_corpus_state(spark, src, state)

    return corpus_hybrid_search(
        spark, layout, list(_HYBRID_TERMS), topk=10, pool=20, epoch=e1
    )


@query(
    "q_corpus_ivm",
    oracle=f"""
    WITH init AS (
      SELECT doc_id, source, text FROM documents WHERE doc_id % 3 != 0
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, source, text FROM documents
      WHERE doc_id % 3 != 0 AND doc_id % 10 = 0),
    v2new AS (
      SELECT doc_id, source, text FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id, source, text || ' updated twice over' AS text
      FROM documents WHERE doc_id % 3 != 0 AND doc_id % 21 = 1),
    merged AS (
      SELECT * FROM v2new
      UNION ALL
      SELECT * FROM init WHERE doc_id NOT IN (SELECT doc_id FROM v2new)),
    live AS (
      SELECT * FROM merged WHERE NOT (doc_id % 10 = 0 AND doc_id < 100000)),
    en AS (
      SELECT doc_id, source, text, {{TOKS}} AS ws, md5({{NORM}}) AS fp
      FROM live),
    sc AS (
      SELECT doc_id, source, fp, len(ws) AS n_tok,
             round({_CORPUS_QUALITY}, 6) AS q
      FROM en),
    pass AS (SELECT * FROM sc WHERE q >= 0.5),
    canon AS (
      SELECT source, n_tok FROM (
        SELECT source, n_tok,
               row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM pass) WHERE rn = 1)
    SELECT source, count(*)::BIGINT AS cnt, sum(n_tok)::BIGINT AS sum_n_tok
    FROM canon GROUP BY source ORDER BY source
    """.replace("{TOKS}", _TOKS).replace("{NORM}", _NORM),
)
def q_corpus_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSED incremental corpus pipeline end to end
    (ray_beam_runner_spark.corpus): a documents snapshot table takes
    three mixed commits — initial load seeded with +100000-rekeyed
    duplicates, then an upsert batch (new docs + text updates), then a
    DELETE that removes every dup pair's survivor (forcing the state
    to RE-ELECT canonical docs — dedup with retraction) — and
    refresh_corpus_state folds each delta into the quality-gated,
    exact-deduped corpus_state table as ONE atomic watermarked commit
    per refresh. The per-source aggregate view is then maintained
    purely from corpus_state's change feed (is_canon-filtered CDC →
    stream_maintain_aggregate, exactly-once txns) and returned. The
    oracle recomputes the whole thing from scratch in SQL: the hash
    pins the cascaded incremental result to the batch semantics —
    wrong retraction handling, a stale watermark, or a double-counted
    delta all break it. Reference analog: arbitrary multi-stage
    pipeline composition (ray_runner_test.py:821-829,
    translations.greedily_fuse), re-expressed as change-feed algebra
    over tables. Cost shape at 100 TB: every refresh touches deltas +
    affected fingerprints only; the aggregate folds change-sized
    batches."""
    from ray_beam_runner_spark.corpus import corpus_feed, refresh_corpus_state
    from ray_beam_runner_spark.queries import scratch_dir
    from ray_beam_runner_spark.sources import snapshots as snap

    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    src = scratch_dir("rbrs_corpus_src_")
    state = scratch_dir("rbrs_corpus_state_")
    agg = scratch_dir("rbrs_corpus_agg_")
    ckpt = scratch_dir("rbrs_corpus_ckpt_")

    init = docs.filter(F.col("doc_id") % 3 != 0)
    dups = init.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "source", "text"
    )
    snap.write_snapshot(
        init.unionByName(dups), src, cluster_by=["doc_id"], n_files=2
    )
    refresh_corpus_state(spark, src, state)

    ins = docs.filter(F.col("doc_id") % 3 == 0)
    upd = init.filter(F.col("doc_id") % 21 == 1).select(
        "doc_id", "source",
        F.concat(F.col("text"), F.lit(" updated twice over")).alias("text"),
    )
    snap.upsert_snapshot(spark, src, ins.unionByName(upd), ["doc_id"], cdc=True)
    refresh_corpus_state(spark, src, state)

    snap.delete_where(
        spark, src,
        (F.col("doc_id") % 10 == 0) & (F.col("doc_id") < 100000), cdc=True,
    )
    refresh_corpus_state(spark, src, state)

    q = snap.stream_maintain_aggregate(
        corpus_feed(spark, state), agg, ["source"], ["n_tok"], ckpt,
        app_id="corpus:agg",
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("corpus aggregate drain exceeded 300s")
    return (
        snap.read_snapshot(spark, agg)
        .filter(F.col("cnt") > 0)
        .select(
            "source", "cnt", F.col("sum_n_tok").cast("long").alias("sum_n_tok")
        )
        .orderBy("source")
    )
