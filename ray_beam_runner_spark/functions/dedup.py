"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The reference's Beam model expresses dedup as GBK+first (SURVEY.md §2.3
'Distinct'); the near-dup family here is new capability for LLM training
data pipelines. Every operator is DataFrame→DataFrame, shuffle-bounded,
and driver-collect-free:

- exact:        one hash-groupBy on the normalized text.
- n-gram Jaccard: postings self-join on shingles (shuffle keyed by shingle)
                 with an optional hot-shingle cap for skew at 100 TB.
- MinHash LSH:  per-doc signatures in one pass (JVM-side xxhash64), band
                 self-join on (band, value), exact-Jaccard verification of
                 candidates only (Broder, "On the resemblance and
                 containment of documents", 1997; banding analysis as in
                 Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch.3).
- SimHash:      32-bit signature (Charikar, "Similarity estimation
                 techniques from rounding algorithms", 2002); banded
                 self-join gives exact recall for hamming distance <= 3
                 (pigeonhole over 4 bands, as in Manku et al.,
                 "Detecting near-duplicates for web crawling", 2007).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ray_beam_runner_spark.functions.text import normalize_text, tokens, word_ngrams

__all__ = [
    "exact_dedup",
    "shingle_postings",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_pairs",
]


def exact_dedup(df: DataFrame, text_col: str, id_col: str, normalized: bool = True) -> DataFrame:
    """Exact dedup: keep the minimum id per (normalized) text. One shuffle,
    map-side combinable (min). Returns (id_col, n_copies)."""
    key = normalize_text(F.col(text_col)) if normalized else F.col(text_col)
    return (
        df.groupBy(key.alias("__k"))
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .drop("__k")
    )


def shingle_postings(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) postings with distinct shingles per doc."""
    return (
        df.select(F.col(id_col).alias("id"), word_ngrams(F.col(text_col), n).alias("g"))
        .select("id", F.explode("g").alias("g"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All pairs (d1 < d2) with word-n-gram Jaccard >= threshold.

    Postings self-join: shuffle keyed by shingle, so cost is
    sum(df_g^2) over shingles g with document frequency df_g. At 100 TB,
    pass ``max_doc_freq`` to drop ultra-frequent shingles (boilerplate);
    this bounds per-key fan-out and is the standard skew guard — it makes
    the result a (very slightly) conservative underestimate, so the oracle
    queries use max_doc_freq=None.

    Returns (d1, d2, jaccard) with jaccard rounded to 6 decimals.
    """
    grams = shingle_postings(df, id_col, text_col, n)
    if max_doc_freq is not None:
        hot = grams.groupBy("g").count().filter(F.col("count") > max_doc_freq).select("g")
        grams = grams.join(F.broadcast(hot), "g", "left_anti")
    # No persist: grams is pure expression work over one scan; recomputing
    # beats pinning executor memory (and in long sessions, leaked caches
    # measurably degrade later queries).
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))

    a = grams.select(F.col("id").alias("d1"), "g")
    b = grams.select(F.col("id").alias("d2"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    s1 = sizes.select(F.col("id").alias("d1"), F.col("sz").alias("n1"))
    s2 = sizes.select(F.col("id").alias("d2"), F.col("sz").alias("n2"))
    jac = F.col("i") / (F.col("n1") + F.col("n2") - F.col("i"))
    return (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .select("d1", "d2", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 128
) -> DataFrame:
    """Per-doc MinHash signature: element i = min over shingles of
    xxhash64(i, shingle). One pass, JVM-side hashing, no UDF; docs with no
    shingles are dropped. Returns (id, sig array<long>)."""
    grams = shingle_postings(df, id_col, text_col, n)
    mins = grams.groupBy("id").agg(
        *[F.min(F.xxhash64(F.lit(i), F.col("g"))).alias(f"h{i}") for i in range(num_hashes)]
    )
    return mins.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 128,
    rows_per_band: int = 1,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs via MinHash LSH with exact-Jaccard verification.

    Candidate generation: signatures banded into num_hashes/rows_per_band
    bands; docs sharing any band bucket are candidates (self-join on
    (band, band-slice)). Verification: exact n-gram Jaccard computed only
    for candidate pairs. With rows_per_band=1 and 128 hashes the miss
    probability for a pair at J >= 0.5 is (1-J)^128 <= 3e-39 — the verified
    output equals the exact-threshold pair set (which is what the DuckDB
    oracle computes), while candidate generation stays subquadratic.
    """
    if num_hashes % rows_per_band:
        raise ValueError("num_hashes must be divisible by rows_per_band")
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes)
    n_bands = num_hashes // rows_per_band
    bands = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.col("sig")[b * rows_per_band + r].cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bv"),
    ).select("id", "bv.band", "bv.val")

    a = bands.select(F.col("id").alias("d1"), "band", "val")
    b = bands.select(F.col("id").alias("d2"), "band", "val")
    cands = (
        a.join(b, ["band", "val"]).filter(F.col("d1") < F.col("d2")).select("d1", "d2").distinct()
    )

    # Verify candidates with exact Jaccard over shingle postings.
    grams = shingle_postings(df, id_col, text_col, n)
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    g1 = grams.select(F.col("id").alias("d1"), "g")
    g2 = grams.select(F.col("id").alias("d2"), "g")
    inter = (
        cands.join(g1, "d1")
        .join(g2, ["d2", "g"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = F.col("i") / (F.col("n1") + F.col("n2") - F.col("i"))
    return (
        inter.join(sizes.select(F.col("id").alias("d1"), F.col("sz").alias("n1")), "d1")
        .join(sizes.select(F.col("id").alias("d2"), F.col("sz").alias("n2")), "d2")
        .select("d1", "d2", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _token_hash32(col):
    """Deterministic 32-bit token hash shared with the DuckDB oracle:
    first 8 hex chars of md5, as an unsigned value in a BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """32-bit SimHash over distinct whitespace tokens: bit j of the
    signature is 1 iff sum over tokens of (+1 if bit j of md5-derived
    token hash else -1) is > 0. md5-based so the oracle reproduces it.
    Returns (id, simhash long)."""
    toks = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("t"))
        .distinct()
        .select("id", _token_hash32(F.col("t")).alias("h"))
    )
    bit_sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(bits)
        ]
    )
    sig = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return bit_sums.select("id", sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Pairs with SimHash hamming distance <= max_hamming, found by banding
    the 32-bit signature into max_hamming+1 bands (8-bit each for the
    default 3): a pair within the distance budget must agree on at least
    one band (pigeonhole), so recall is exact while the join stays keyed.
    Returns (d1, d2, hamming)."""
    n_bands = max_hamming + 1
    width = 32 // n_bands
    sigs = simhash(df, id_col, text_col)
    bands = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bv"),
    ).select("id", "simhash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    a = bands.select(F.col("id").alias("d1"), F.col("simhash").alias("s1"), "band", "val")
    b = bands.select(F.col("id").alias("d2"), F.col("simhash").alias("s2"), "band", "val")
    ham = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2")))
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
