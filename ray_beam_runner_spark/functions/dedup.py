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

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ray_beam_runner_spark.functions.text import normalize_text, tokens, word_ngrams

__all__ = [
    "exact_dedup",
    "shingle_postings",
    "ngram_jaccard_pairs",
    "ngram_containment_pairs",
    "decontaminate_hits",
    "repeated_span_stats",
    "remove_repeated_spans",
    "lsh_banding",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "minhash_lsh_pairs",
    "lsh_index_buckets",
    "lsh_pairs_from_index",
    "stream_maintain_lsh_index",
    "simhash",
    "simhash_pairs",
    "hamming_pairs",
    "leakage_safe_split",
]


def lsh_banding(
    threshold: float,
    target_recall: float = 1.0 - 1e-6,
    min_rows_per_band: int = 2,
    max_hashes: int = 512,
) -> tuple[int, int]:
    """Size (num_hashes, rows_per_band) so a pair AT the verification
    threshold is detected with probability >= target_recall.

    Detection prob for Jaccard J with b bands of r rows is 1-(1-J^r)^b,
    so the required band count is b = ceil(ln(1-recall)/ln(1-t^r)).
    Larger r gives a sharper s-curve (fewer low-J candidates, the thing
    that matters at corpus scale) but needs more bands for the same
    at-threshold recall; this picks the LARGEST r whose b*r fits the
    hash budget, and never r=1 (with r=1 every pair sharing one min-hash
    is a candidate — the round-1 failure mode). For t=0.5 the default
    budget yields r=3, b=104 (312 hashes, detection 1-9e-7 at J=0.5).

    This decouples candidate generation from the verification threshold:
    the verified output equals the exact-threshold pair set for ANY
    corpus, not just gapped ones. Corpora with a known similarity gap
    can instead pass explicit (num_hashes, rows_per_band) to
    :func:`minhash_lsh_pairs` for sharper, cheaper banding.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    if not 0.0 < target_recall < 1.0:
        raise ValueError("target_recall must be in (0, 1)")
    miss_budget = math.log(1.0 - target_recall)
    best: tuple[int, int] | None = None
    r = min_rows_per_band
    while True:
        b = math.ceil(miss_budget / math.log(1.0 - threshold**r))
        if b * r > max_hashes:
            break
        best = (b * r, r)
        r += 1
    if best is None:
        raise ValueError(
            f"no (b, r>={min_rows_per_band}) meets recall {target_recall} at "
            f"threshold {threshold} within {max_hashes} hashes; raise max_hashes"
        )
    return best


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
    """(id, shingle) postings with distinct shingles per doc. The input
    is rebalanced to core count first when the scan cannot split (see
    ensure_min_parallelism) — shingling is the CPU-heavy step of every
    near-dup operator and must not run on one task."""
    from ray_beam_runner_spark.session import ensure_min_parallelism

    df = ensure_min_parallelism(df)
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
    this bounds per-key fan-out and is the standard skew guard. The cap
    is conservative on the CANDIDATE set (a pair can only lose shared
    shingles, never gain them — tightening the cap shrinks candidates
    monotonically, property-tested), but a surviving pair's Jaccard can
    shift either way: a dropped shingle in both docs lowers J (smaller
    intersection), one in a single doc raises it (smaller union). The
    oracle queries therefore use max_doc_freq=None.

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


_MINHASH_PRIME = 2038074743  # the ~2^31 prime Spark MLlib's MinHashLSH uses


def _minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Fixed-seed random affine coefficients (a_i, b_i) for h_i(g) =
    (a_i * g + b_i) mod P. The per-i coefficients must be RANDOM: an
    arithmetic schedule like h_i = a + i*b (Kirsch-Mitzenmacher double
    hashing, fine for Bloom filters) is linear in i, so a single set
    element with small (a, b) wins the min for nearly every i and
    signature agreement collapses far below J — measured 0/128 agreeing
    positions on a pair with J = 0.92."""
    import random

    rng = random.Random(20260813)
    return [
        (rng.randint(1, _MINHASH_PRIME - 1), rng.randint(0, _MINHASH_PRIME - 1))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    df: DataFrame | None,
    id_col: str = "id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
    grams: DataFrame | None = None,
    use_arrow: bool = True,
) -> DataFrame:
    """Per-doc MinHash signature: one JVM-side base hash per shingle
    (xxhash64 masked to 31 bits), then num_hashes independent affine
    transforms h_i(g) = (a_i * h(g) + b_i) mod P with P = 2038074743.
    a_i * h < 2^62, so no int64 overflow (numpy or ANSI long).

    Two identical-output execution strategies:

    - ``use_arrow=True`` (default): hash-partition the postings by id,
      then a mapInPandas kernel computes all k mins per doc with one
      vectorized numpy ``minimum.reduceat`` over the (rows x k) affine
      matrix. Cost is O(postings x k) C-speed flops and ONE shuffle —
      at k > 100 this beats codegen'd JVM expressions, which Spark
      evaluates interpreted here anyway (an aggregate with k min
      columns exceeds the codegen field limit).
    - ``use_arrow=False``: pure-JVM groupBy with k min-aggregate
      columns. Same shuffle shape, no Python workers; the right choice
      for small k or pickle-free deployments.

    Both drop docs with no shingles. Pass an existing postings DataFrame
    via ``grams`` to share (and persist) the shingle pass with a
    downstream verification join. Returns (id, sz, sig array<long>)
    where sz is the doc's distinct-shingle count — computed in the same
    pass so callers needing set sizes (Jaccard denominators) don't
    re-scan the postings.
    """
    if grams is None:
        grams = shingle_postings(df, id_col, text_col, n)
    prime = _MINHASH_PRIME
    coeffs = _minhash_coeffs(num_hashes)
    base = F.xxhash64(F.col("g")).bitwiseAND(F.lit(0x7FFFFFFF).cast("long"))
    proj = grams.select("id", base.alias("_h"))
    if use_arrow:
        # The Arrow kernel's output schema pins id to BIGINT; non-integral
        # ids (string/uuid keys) would crash or mislabel in the numpy
        # conversion, so they take the type-preserving JVM aggregate.
        from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

        id_type = proj.schema["id"].dataType
        use_arrow = isinstance(id_type, (ByteType, ShortType, IntegerType, LongType))
    if not use_arrow:
        mins = proj.groupBy("id").agg(
            F.count(F.lit(1)).alias("sz"),
            *[
                F.min(F.pmod(F.lit(a) * F.col("_h") + F.lit(b), F.lit(prime))).alias(f"h{i}")
                for i, (a, b) in enumerate(coeffs)
            ],
        )
        return mins.select(
            "id", "sz", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
        )

    import numpy as np

    a_vec = np.array([a for a, _ in coeffs], dtype=np.int64)
    b_vec = np.array([b for _, b in coeffs], dtype=np.int64)

    def kernel(batches):
        import pandas as pd

        # One partition holds every row of each id (hash-partitioned
        # below), possibly split across Arrow batches: concatenate, then
        # one reduceat per partition. Chunked over rows to bound the
        # (rows x k) temp at ~64 MB.
        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        pdf.sort_values("id", inplace=True, kind="stable")
        ids = pdf["id"].to_numpy(np.int64)
        h = pdf["_h"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        mins = np.empty((len(starts), len(a_vec)), dtype=np.int64)
        max_rows = max(1, (64 << 20) // (8 * len(a_vec)))
        # one reused (max_rows x k) scratch buffer: the expression
        # (h*a + b) % prime allocated three 64 MB temporaries per chunk
        # — in-place ufuncs keep the chunk loop at one allocation total
        # (the kernel is memory-bandwidth-sensitive at k ~ 300)
        buf = np.empty((max_rows, len(a_vec)), dtype=np.int64)
        lo = 0
        while lo < len(starts):
            # Advance by whole groups, capping the row span at max_rows
            # (always >= 1 group so oversized groups still progress).
            hi = int(np.searchsorted(starts, starts[lo] + max_rows, side="left"))
            hi = max(hi, lo + 1)
            row_lo = starts[lo]
            row_hi = starts[hi] if hi < len(starts) else len(ids)
            nrows = row_hi - row_lo
            if nrows <= max_rows:
                vals = buf[:nrows]
            else:  # single oversized group: one-off exact-size temp
                vals = np.empty((nrows, len(a_vec)), dtype=np.int64)
            np.multiply(h[row_lo:row_hi, None], a_vec[None, :], out=vals)
            np.add(vals, b_vec[None, :], out=vals)
            np.mod(vals, prime, out=vals)
            mins[lo:hi] = np.minimum.reduceat(vals, starts[lo:hi] - row_lo, axis=0)
            lo = hi
        sizes = np.diff(np.r_[starts, len(ids)])
        yield pd.DataFrame(
            {"id": ids[starts], "sz": sizes, "sig": list(mins)}
        )

    # Hash-partition by id with a PARALLELISM FLOOR: the kernel is
    # CPU-bound numpy (O(postings x k) int64 flops), and a keyless
    # repartition(col) inherits spark.sql.shuffle.partitions — sized
    # for shuffle overhead, not for a Python compute kernel (the bench
    # profile's 4 reduce tasks left 28 cores idle here). At cluster
    # scale shuffle_partitions >= cores and the floor is a no-op; the
    # id-hash grouping the reduceat relies on holds for any count.
    sc = proj.sparkSession.sparkContext
    n_parts = max(
        sc.defaultParallelism,
        int(proj.sparkSession.conf.get("spark.sql.shuffle.partitions")),
    )
    part = proj.repartition(n_parts, F.col("id"))
    return part.mapInPandas(kernel, schema="id long, sz long, sig array<long>")


def _band_buckets(sigs: DataFrame, num_hashes: int, rows_per_band: int) -> DataFrame:
    """(id, sz, bucket) banded-signature postings: one 64-bit hash of
    (band index, signature slice) per band per doc — the LSH bucket key
    both the in-memory candidate self-join and the MAINTAINED index
    table are built from (identical derivation is what makes the
    maintained index equal a batch rebuild)."""
    n_bands = num_hashes // rows_per_band
    return sigs.select(
        "id",
        "sz",
        F.explode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)],
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bucket"),
    )


def minhash_lsh_candidates(
    grams: DataFrame, num_hashes: int = 128, rows_per_band: int = 4
) -> DataFrame:
    """LSH candidate pairs from a shingle-postings DataFrame (id, g):
    signatures are banded into num_hashes/rows_per_band bands; docs whose
    signatures agree on an entire band are candidates. The join is keyed
    on a 64-bit hash of (band, slice) — an equi-join, never a cartesian.
    Returns (d1, d2, n1, n2) with d1 < d2, carrying the docs'
    distinct-shingle counts so verification needs no extra sizes pass.
    Bucket-hash collisions only ADD candidates (removed by exact
    verification downstream), never drop a true pair.

    The BANDED frame is persisted (session cache registry) for the
    duration of the self-join: both join sides derive from it, and
    without the persist Spark computes the whole signature + banding
    pass twice — measured 2x at sf0.1. Persisting the bands (rather
    than the r16 rounds' raw signatures) also runs the band-hash
    explode ONCE instead of once per join side: the banding alone was
    ~1.2 s of the 2.3 s candidate phase at sf0.1, and the cached rows
    are (id, sz, bucket) — a fraction of the 312-long signature
    arrays' footprint."""
    from ray_beam_runner_spark.caches import track

    sigs = minhash_signatures(None, num_hashes=num_hashes, grams=grams)
    bands = track(_band_buckets(sigs, num_hashes, rows_per_band))
    a = bands.select(F.col("id").alias("d1"), F.col("sz").alias("n1"), "bucket")
    b = bands.select(F.col("id").alias("d2"), F.col("sz").alias("n2"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2", "n1", "n2")
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int | None = None,
    rows_per_band: int | None = None,
    threshold: float = 0.5,
    persist_postings: bool = True,
    broadcast_candidates: bool = True,
) -> DataFrame:
    """Near-dup pairs via MinHash LSH with exact-Jaccard verification.

    Candidate generation: signatures banded into b = num_hashes/rows_per_band
    bands of r = rows_per_band rows; docs sharing any band bucket are
    candidates (self-join keyed on a 64-bit hash of (band, slice)).
    Verification: exact n-gram Jaccard computed only for candidate pairs,
    reusing ONE persisted shingle-postings pass for both the signatures and
    the verification join (MEMORY_AND_DISK; tracked in the session cache
    registry — call :func:`ray_beam_runner_spark.caches.release_tracked`
    (or ``spark.catalog.clearCache()``) when the result is consumed).

    Banding (Leskovec/Rajaraman/Ullman ch.3): a pair at Jaccard J collides
    in a band with prob J^r, so detection prob = 1-(1-J^r)^b. By DEFAULT
    (num_hashes/rows_per_band unset) the banding is sized by
    :func:`lsh_banding` so a pair AT the verification threshold is
    detected with prob >= 1-1e-6 — the verified output then equals the
    exact-threshold pair set for any corpus, which is what the DuckDB
    oracle checks. r must be > 1 at corpus scale — with r=1 ANY pair
    sharing a single min-hash is a candidate (per-band collision prob =
    J) and the candidate set degenerates toward all loosely-similar pairs
    (measured: 1.13M of 12.5M possible pairs share a shingle at sf0.1).

    Corpora with a measured similarity GAP below the threshold can pass
    explicit (num_hashes, rows_per_band) for sharper, cheaper banding —
    e.g. b=32/r=4 (128 hashes) detects J>=0.8 pairs with prob 1-5e-8 and
    admits far fewer low-J candidates, but detects a pair at exactly
    J=0.5 with only prob 0.87, so it is ONLY exact when nothing sits
    near the threshold.

    Hash collisions on the (band, slice) key can only ADD candidates
    (removed by exact verification), never drop a true pair.
    """
    if (num_hashes is None) != (rows_per_band is None):
        raise ValueError("pass both num_hashes and rows_per_band, or neither")
    if num_hashes is None:
        num_hashes, rows_per_band = lsh_banding(threshold)
    if num_hashes % rows_per_band:
        raise ValueError("num_hashes must be divisible by rows_per_band")
    grams = shingle_postings(df, id_col, text_col, n)
    if persist_postings:
        from ray_beam_runner_spark.caches import track

        grams = track(grams)
    cands = minhash_lsh_candidates(
        grams, num_hashes=num_hashes, rows_per_band=rows_per_band
    )

    # Verify candidates with exact Jaccard over the SAME persisted postings;
    # set sizes ride along from the signature aggregate (no extra pass).
    # With r>1 banding the candidate set is near the true near-dup set —
    # orders of magnitude smaller than the postings — so by default it
    # broadcasts and the verification becomes two broadcast joins over
    # one postings scan instead of shuffling every posting row. The hint
    # is FORCED, not advisory (AQE never demotes a user broadcast hint):
    # a corpus whose candidate pair list itself exceeds executor/driver
    # broadcast limits must pass broadcast_candidates=False to verify
    # through ordinary id-keyed shuffle joins instead of failing on the
    # 8 GB broadcast cap.
    return _verify_candidates(cands, grams, threshold, broadcast_candidates)


def _verify_candidates(
    cands: DataFrame, grams: DataFrame, threshold: float, broadcast_candidates: bool
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs ONLY (the shared
    verification tail of minhash_lsh_pairs and lsh_pairs_from_index):
    two postings joins intersect the candidates' shingle sets; set
    sizes ride on the candidate rows. Candidates broadcast by default
    (forced hint, see minhash_lsh_pairs docstring)."""
    cand_side = F.broadcast(cands) if broadcast_candidates else cands
    g1 = grams.select(F.col("id").alias("d1"), "g")
    g2 = grams.select(F.col("id").alias("d2"), "g")
    inter = (
        cand_side.join(g1, "d1")
        .join(g2, ["d2", "g"])
        .groupBy("d1", "d2", "n1", "n2")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = F.col("i") / (F.col("n1") + F.col("n2") - F.col("i"))
    return (
        inter.select("d1", "d2", F.round(jac, 6).alias("jaccard"))
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


def hamming_pairs(
    hashes: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
    bits: int = 64,
) -> DataFrame:
    """All id pairs whose ``bits``-wide integer hashes are within
    ``max_hamming``, via pigeonhole banding (Manku et al., WWW'07): the
    hash is split into max_hamming+1 disjoint bands covering all bits;
    a pair differing in <= max_hamming bits must agree EXACTLY on at
    least one band, so the self-join stays keyed on (band, value) —
    recall is exact, and there is never an all-pairs/cartesian plan.
    Works for any integer hash column (SimHash, perceptual image
    hashes, …); band extraction uses UNSIGNED shifts so signed int64
    hashes (bit 63 set) band correctly. Returns (d1, d2, hamming),
    d1 < d2. At corpus scale the cost is the banded join's bucket
    fan-out — shared band values, not n^2."""
    n_bands = max_hamming + 1
    if n_bands > bits:
        raise ValueError(f"max_hamming {max_hamming} needs more bands than {bits} bits")
    width, extra = divmod(bits, n_bands)
    # band b covers [off_b, off_{b+1}) with the first `extra` bands one
    # bit wider — bands partition the bits exactly (pigeonhole needs
    # full coverage, truncated coverage silently loses recall)
    offs = [0]
    for b in range(n_bands):
        offs.append(offs[-1] + width + (1 if b < extra else 0))
    sigs = hashes.select(F.col(id_col).alias("id"), F.col(hash_col).alias("_hp_h"))

    def _band_val(b: int):
        # max_hamming=0 makes the single band the full 64-bit word: the
        # mask literal 2^64-1 overflows LongType, but no mask is needed
        # — the unsigned shift by 0 already yields the whole hash.
        w = offs[b + 1] - offs[b]
        shifted = F.shiftrightunsigned(F.col("_hp_h"), offs[b])
        if w >= 64:
            return shifted
        return shifted.bitwiseAND(F.lit((1 << w) - 1))

    bands = sigs.select(
        "id",
        "_hp_h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _band_val(b).alias("val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bv"),
    ).select("id", "_hp_h", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    a = bands.select(F.col("id").alias("d1"), F.col("_hp_h").alias("s1"), "band", "val")
    b = bands.select(F.col("id").alias("d2"), F.col("_hp_h").alias("s2"), "band", "val")
    ham = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2")))
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Pairs with SimHash hamming distance <= max_hamming, found by banding
    the 32-bit signature into max_hamming+1 bands (8-bit each for the
    default 3): a pair within the distance budget must agree on at least
    one band (pigeonhole), so recall is exact while the join stays keyed.
    Returns (d1, d2, hamming). Delegates to :func:`hamming_pairs`."""
    return hamming_pairs(
        simhash(df, id_col, text_col), "id", "simhash",
        max_hamming=max_hamming, bits=32,
    )


def decontaminate_hits(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: training docs sharing any word n-gram
    with the evaluation set (the overlap check LLM pipelines run before
    training — e.g. the 13-gram filters described in the GPT-3/PaLM
    papers; n is configurable). Returns (id, n_shared_grams).

    Scale shape: the eval side is a benchmark (thousands of docs, not
    TBs), so its distinct gram set is broadcast and the 100 TB training
    corpus is pruned with a broadcast LEFT SEMI join on the gram — the
    training side never shuffles. The reference has no such operator;
    its GBK formulation would shuffle the full postings list
    (/root/reference/ray_beam_runner/portability/execution.py:268-291).
    """
    # Raw (id, gram) postings WITHOUT the per-doc distinct of
    # shingle_postings: that distinct is a full shuffle of every gram
    # string in the corpus, which is exactly what this operator must
    # avoid. The broadcast semi join prunes first (map-side, no
    # exchange); the distinct then runs on the tiny surviving hit set
    # so repeated grams within one doc still count once.
    from ray_beam_runner_spark.session import ensure_min_parallelism

    train_grams = ensure_min_parallelism(train).select(
        F.col(id_col).alias("id"), F.explode(word_ngrams(F.col(text_col), n)).alias("g")
    )
    eval_grams = shingle_postings(eval_set, id_col, text_col, n).select("g").distinct()
    return (
        train_grams.join(F.broadcast(eval_grams), "g", "left_semi")
        .distinct()
        .groupBy(F.col("id").alias(id_col))
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 10,
    seed_tag: str = "leaksplit",
) -> DataFrame:
    """Train/val split that cannot leak near-duplicates across the
    boundary: documents are first clustered by connected components
    over the near-dup pair graph (``pairs``: any of this module's pair
    generators), then the split decision hashes the CLUSTER id — so a
    doc and all its near-dups land on the same side BY CONSTRUCTION.
    A per-doc hash split (q_train_val_split) silently places a train
    doc's near-duplicate in validation, inflating eval scores — the
    contamination the decontamination/dedup literature warns about
    applied to a pipeline's own holdout. Returns
    (id_col, cluster, split) with split in {'train', 'val'};
    ``val_pct`` of clusters (md5 hash buckets, engine-portable and
    reshard-stable) go to 'val'.

    Scale shape: clustering is the O(log n)-round large-star/small-star
    iteration over the PAIR graph (proportional to near-dups, not the
    corpus); the split itself is one expression — no extra shuffle
    beyond the cluster join."""
    from ray_beam_runner_spark.functions.graph import dedup_clusters
    from ray_beam_runner_spark.functions.text import hash_bucket

    clusters = dedup_clusters(docs, pairs, id_col=id_col)
    b = hash_bucket(F.col("cluster"), 100, seed_tag)
    return clusters.select(
        id_col,
        "cluster",
        F.when(b < 100 - val_pct, "train").otherwise("val").alias("split"),
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.9,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Asymmetric near-dup pairs: containment = |A ∩ B| / min(|A|, |B|).

    Catches what Jaccard misses at corpus scale: a document quoted or
    boilerplate-wrapped inside a much larger one has high containment but
    low Jaccard (the union is dominated by the big doc). Same postings
    self-join as :func:`ngram_jaccard_pairs` — shingle-keyed shuffle,
    ``max_doc_freq`` hot-shingle cap for skew — only the denominator
    changes. Returns (d1, d2, containment) with d1 < d2, rounded to 6.
    """
    grams = shingle_postings(df, id_col, text_col, n)
    if max_doc_freq is not None:
        hot = grams.groupBy("g").count().filter(F.col("count") > max_doc_freq).select("g")
        grams = grams.join(F.broadcast(hot), "g", "left_anti")
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = grams.select(F.col("id").alias("d1"), "g")
    b = grams.select(F.col("id").alias("d2"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    s1 = sizes.select(F.col("id").alias("_k1"), F.col("sz").alias("n1"))
    s2 = sizes.select(F.col("id").alias("_k2"), F.col("sz").alias("n2"))
    cont = F.col("i") / F.least(F.col("n1"), F.col("n2"))
    return (
        inter.join(s1, F.col("d1") == F.col("_k1"))
        .join(s2, F.col("d2") == F.col("_k2"))
        .select("d1", "d2", F.round(cont, 6).alias("containment"))
        .filter(F.col("containment") >= threshold)
    )


def repeated_span_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 20,
    min_docs: int = 2,
) -> DataFrame:
    """Exact repeated-SPAN detection (substring-level dedup): for each
    document, how many of its word n-gram spans also appear in at least
    ``min_docs`` documents corpus-wide. This is the span-granular signal
    of Lee et al., "Deduplicating Training Data Makes Language Models
    Better" (ACL 2022, arXiv:2107.06499) — long exact repeats are
    memorization-prone boilerplate worth cutting even when whole-document
    similarity is low. (Their suffix-array formulation finds arbitrary-
    length repeats; fixed-n rolling spans are the standard shuffle-keyed
    approximation, and n is the minimum match length.)

    One postings pass (persisted): document frequency per span, then a
    semi join back to per-doc counts — both shuffles keyed by the span,
    the second reusing the first's partitioning. Returns every document:
    (id_col, n_spans, n_dup_spans, dup_frac).
    """
    from ray_beam_runner_spark.caches import track

    grams = track(shingle_postings(df, id_col, text_col, n))
    hot = grams.groupBy("g").count().filter(F.col("count") >= min_docs).select("g")
    per_doc = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_spans"))
    dup = (
        grams.join(hot, "g", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_dup_spans"))
    )
    base = df.select(F.col(id_col).alias("id"))
    return (
        base.join(per_doc, "id", "left")
        .join(dup, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.round(
                F.coalesce("n_dup_spans", F.lit(0))
                / F.greatest(F.coalesce("n_spans", F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_frac"),
        )
    )


def remove_repeated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 20,
    min_docs: int = 2,
) -> DataFrame:
    """Substring-level dedup REMOVAL (the rewrite step of Lee et al.,
    "Deduplicating Training Data Makes Language Models Better", ACL 2022):
    ``repeated_span_stats`` only *measures* duplicated spans; this
    operator deletes them. A span (word n-gram) is "hot" when it occurs
    in >= ``min_docs`` distinct documents; every token covered by any
    occurrence of a hot span is removed, and the surviving tokens are
    re-joined in original order. Guarantee (tested as a property): no
    original-contiguous window of the surviving text is a hot span —
    every such window was an occurrence and would have been covered.
    (Removal can create NEW adjacencies whose concatenation happens to
    equal a hot span; Lee et al.'s cut semantics share this property.)

    Scale shape (100 TB): the postings pass is persisted and reused;
    document frequency, the hot filter, and the occurrence semi join are
    all shuffles keyed by the span (the hot side is tiny after the
    ``min_docs`` filter). Covered positions explode hot occurrences by
    ``n`` — bounded by (duplicated spans x n), the same order as the
    text being deleted. Reconstruction is ONE doc-keyed aggregation
    (``collect_list`` bounded by document length, the working set any
    per-document text operator already carries); no text ever reaches
    the driver. Returns (id_col, n_tok, n_kept, clean_text).
    """
    from ray_beam_runner_spark.caches import track
    from ray_beam_runner_spark.session import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    # Every span occurrence with its 0-based token start (word_ngrams
    # emits overlapping grams in token order: gram i starts at token i).
    occ = track(base.select("id", F.posexplode(word_ngrams(F.col("_t"), n)).alias("p", "g")))
    hot = (
        occ.select("id", "g")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("g")
    )
    covered = (
        occ.join(hot, "g", "left_semi")
        .select("id", F.explode(F.sequence(F.col("p"), F.col("p") + F.lit(n - 1))).alias("q"))
        .distinct()
    )
    words = base.select("id", F.posexplode(tokens(F.col("_t"))).alias("q", "word"))
    kept = words.join(covered, ["id", "q"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("q", "word"))), lambda x: x["word"]
            ),
            " ",
        ).alias("clean_text"),
    )
    sizes = base.select("id", F.size(tokens(F.col("_t"))).cast("long").alias("n_tok"))
    return sizes.join(rebuilt, "id", "left").select(
        F.col("id").alias(id_col),
        "n_tok",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


def lsh_index_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int | None = None,
    rows_per_band: int | None = None,
    threshold: float = 0.5,
) -> DataFrame:
    """Batch-build the MAINTAINABLE LSH index content for a document
    frame: (id_col, sz, bucket) banded-signature postings, the exact
    rows :func:`stream_maintain_lsh_index` merges per micro-batch —
    one derivation shared by init, maintenance, and the
    maintained-equals-rebuilt comparison. Default banding sizes to the
    verification ``threshold`` (lsh_banding) so downstream
    :func:`lsh_pairs_from_index` is exact at that threshold."""
    if (num_hashes is None) != (rows_per_band is None):
        raise ValueError("pass both num_hashes and rows_per_band, or neither")
    if num_hashes is None:
        num_hashes, rows_per_band = lsh_banding(threshold)
    grams = shingle_postings(df, id_col, text_col, n)
    sigs = minhash_signatures(None, grams=grams, num_hashes=num_hashes)
    return _band_buckets(sigs, num_hashes, rows_per_band).select(
        F.col("id").alias(id_col), "sz", "bucket"
    )


def stream_maintain_lsh_index(
    feed: DataFrame,
    index_dir: str,
    id_col: str,
    text_col: str,
    checkpoint_dir: str,
    n: int = 3,
    num_hashes: int | None = None,
    rows_per_band: int | None = None,
    threshold: float = 0.5,
    app_id: str | None = None,
):
    """Maintain a near-dup LSH index TABLE from a documents change
    feed — the dedup-family member of the maintained-index set (token
    index, IVF-PQ): per micro-batch, net the deltas per id (a doc
    inserted then deleted within one drain never lands; an update's
    pair resolves to the insert), re-shingle + re-sign ONLY the batch's
    final inserts, and MERGE their (id, sz, bucket) band postings keyed
    by id — the keyed MERGE replaces the doc's whole posting set, so an
    updated text swaps its buckets atomically. Pure deletes retract via
    a keyed DELETE. Both commits carry (app, batch) txn ids: replayed
    batches are manifest-detected no-ops, exactly-once on top of the
    feed's checkpointed version offsets.

    Scale shape: per trigger the corpus is never touched — only batch
    docs are hashed (the banding math is per-doc), and only the index
    files containing affected ids are rewritten (id-clustered keyed
    MERGE). An index maintained across N drains equals
    :func:`lsh_index_buckets` over the final corpus
    (tests/test_dedup.py), which is what makes
    :func:`lsh_pairs_from_index` on the maintained table exact."""
    import os as _os

    from pyspark.sql import Window as W

    from ray_beam_runner_spark.sources import snapshots as snap

    if (num_hashes is None) != (rows_per_band is None):
        raise ValueError("pass both num_hashes and rows_per_band, or neither")
    if num_hashes is None:
        num_hashes, rows_per_band = lsh_banding(threshold)
    app = app_id or f"lshidx:{_os.path.basename(_os.path.abspath(index_dir))}"

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        w = W.partitionBy(id_col).orderBy(
            F.col("_commit_version").desc(),
            F.when(F.col("_change") == "insert", 1).otherwise(0).desc(),
        )
        last = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .persist()
        )
        try:
            counts = dict(last.groupBy("_change").count().collect())
            if counts.get("insert"):
                ins = last.filter(F.col("_change") == "insert").select(
                    id_col, text_col
                )
                snap.upsert_snapshot(
                    spark, index_dir,
                    lsh_index_buckets(
                        ins, id_col, text_col, n,
                        num_hashes=num_hashes, rows_per_band=rows_per_band,
                    ),
                    [id_col], txn_app=app, txn_version=batch_id,
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


def lsh_pairs_from_index(
    index_df: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    broadcast_candidates: bool = True,
) -> DataFrame:
    """Near-dup pairs from a MAINTAINED bucket index (the read side of
    :func:`stream_maintain_lsh_index`): candidate pairs come from the
    bucket-keyed self-join over the INDEX TABLE (no re-hashing of the
    corpus), then exact n-gram Jaccard verifies candidates only against
    the CURRENT documents. With default banding the index detects a
    threshold-J pair with prob >= 1-1e-6, so the verified output equals
    the exact pair set — same contract as minhash_lsh_pairs, with the
    signature work amortized into ingestion instead of paid per query."""
    from ray_beam_runner_spark.caches import track

    bands = index_df.select(F.col(id_col).alias("id"), "sz", "bucket")
    a = bands.select(F.col("id").alias("d1"), F.col("sz").alias("n1"), "bucket")
    b = bands.select(F.col("id").alias("d2"), F.col("sz").alias("n2"), "bucket")
    cands = (
        a.join(b, "bucket")
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2", "n1", "n2")
        .distinct()
    )
    grams = track(shingle_postings(docs, id_col, text_col, n))
    return _verify_candidates(cands, grams, threshold, broadcast_candidates)
