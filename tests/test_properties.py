"""Property-based tests (hypothesis) for the pure-function kernels, plus
seeded randomized differential tests for expression kernels (one Spark
job per property, not per example)."""

import math
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from ray_beam_runner_spark.functions.dedup import lsh_banding
from ray_beam_runner_spark.sources.tfrecord import decode_records, encode_record


@given(st.lists(st.binary(min_size=0, max_size=200), min_size=0, max_size=20))
@settings(max_examples=200, deadline=None)
def test_tfrecord_roundtrip_property(payloads):
    blob = b"".join(encode_record(p) for p in payloads)
    assert [bytes(x) for x in decode_records(blob)] == payloads


@given(
    st.floats(min_value=0.15, max_value=0.95),
    st.floats(min_value=0.9, max_value=1.0 - 1e-9),
)
@settings(max_examples=200, deadline=None)
def test_lsh_banding_property(threshold, target_recall):
    try:
        nh, r = lsh_banding(threshold, target_recall=target_recall)
    except ValueError:
        return  # budget infeasible for this (t, recall) — loud, allowed
    b = nh // r
    assert r >= 2 and nh == b * r and nh <= 512
    detection = 1 - (1 - threshold**r) ** b
    assert detection >= target_recall - 1e-12


def test_word_ngrams_matches_python_reference(spark):
    # differential: the slice+zip_with shingle expression vs a plain
    # python implementation, over 60 random token strings in ONE job
    from pyspark.sql import functions as F

    from ray_beam_runner_spark.functions.text import word_ngrams

    rng = random.Random(20260813)
    vocab = ["a", "bb", "ccc", "Dd", "e9", "ff!", "g"]
    rows = []
    for i in range(60):
        n_words = rng.randint(0, 12)
        # messy whitespace + case: normalization is part of the contract
        sep = lambda: " " * rng.randint(1, 3)
        text = sep().join(rng.choice(vocab) for _ in range(n_words))
        rows.append((i, text))
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r.id: list(r.g)
        for r in df.select("id", word_ngrams(F.col("text"), 3).alias("g")).collect()
    }

    def ref(text):
        toks = " ".join(text.lower().split()).split(" ")
        if text.strip() == "":
            toks = [""]
        return [" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))]

    for i, text in rows:
        assert got[i] == ref(text), (i, text, got[i], ref(text))


def test_crc32c_differential_random():
    # table-driven CRC vs an independent bit-at-a-time implementation
    from ray_beam_runner_spark.sources.tfrecord import crc32c

    def crc_bitwise(data):
        crc = 0xFFFFFFFF
        for byte in data:
            crc ^= byte
            for _ in range(8):
                crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
        return crc ^ 0xFFFFFFFF

    rng = random.Random(42)
    for n in (0, 1, 7, 64, 1000):
        data = bytes(rng.randrange(256) for _ in range(n))
        assert crc32c(data) == crc_bitwise(data)


def test_simhash_hamming_pigeonhole():
    # pigeonhole guarantee behind simhash_pairs: any two 32-bit values
    # within hamming distance 3 share at least one of the four 8-bit bands
    rng = random.Random(7)
    for _ in range(500):
        a = rng.getrandbits(32)
        b = a
        for _ in range(rng.randint(0, 3)):
            b ^= 1 << rng.randrange(32)
        shares = any(((a >> (8 * k)) & 0xFF) == ((b >> (8 * k)) & 0xFF) for k in range(4))
        assert shares


def test_hash_bucket_matches_python_reference(spark):
    # engine-portability proof for the split/sampling bucketer: the Spark
    # expression must equal a plain hashlib implementation of the
    # documented spec (first 8 md5 hex digits of "tag:value" mod buckets)
    # — the property that lets another engine (or a training loader)
    # reproduce shard/split membership without Spark
    import hashlib

    from pyspark.sql import functions as F

    from ray_beam_runner_spark.functions.text import hash_bucket

    rng = random.Random(20260813)
    ids = [rng.randint(-(2**40), 2**40) for _ in range(200)] + [0, 1, -1]
    df = spark.createDataFrame([(i,) for i in ids], "v long")
    got = {
        r.v: r.b
        for r in df.select("v", hash_bucket(F.col("v"), 1000, "t").alias("b")).collect()
    }
    for i in ids:
        expect = int(hashlib.md5(f"t:{i}".encode()).hexdigest()[:8], 16) % 1000
        assert got[i] == expect, (i, got[i], expect)


def test_chunking_stitch_property(spark):
    # for random (n_tokens, chunk, stride<=chunk): chunks cover the doc,
    # consecutive chunks overlap by chunk-stride, stitching non-overlap
    # prefixes + final tail reconstructs the token sequence; one Spark job
    # for all cases
    from pyspark.sql import functions as F

    from ray_beam_runner_spark.functions.text import chunk_starts, chunk_text, tokens

    rng = random.Random(4)
    cases = []
    for cid in range(40):
        n = rng.randint(1, 300)
        chunk = rng.randint(2, 64)
        stride = rng.randint(1, chunk)
        cases.append((cid, n, chunk, stride, " ".join(f"t{i}" for i in range(n))))
    df = spark.createDataFrame(cases, "cid long, n long, chunk long, stride long, text string")
    out = {}
    for chunk_sz in sorted({c for _, _, c, _, _ in cases}):
        for stride in sorted({s for _, _, c, s, _ in cases if c == chunk_sz}):
            sub = df.filter((F.col("chunk") == chunk_sz) & (F.col("stride") == stride))
            toks = sub.select("cid", "n", tokens(F.col("text")).alias("_t"))
            got = (
                toks.select(
                    "cid", "n", "_t",
                    F.explode(chunk_starts(F.col("_t"), stride)).alias("s"),
                )
                .select("cid", "n", "s", chunk_text(F.col("_t"), F.col("s"), chunk_sz).alias("c"))
                .collect()
            )
            for r in got:
                out.setdefault(r.cid, []).append((r.s, r.c, chunk_sz, stride))
    for cid, n, chunk, stride, text in cases:
        words = text.split(" ")
        pieces = sorted(out[cid])
        starts = [s for s, *_ in pieces]
        assert starts == list(range(1, max(n, 1) + 1, stride)), (cid, starts[:5])
        stitched: list[str] = []
        for k, (s, c, cz, st_) in enumerate(pieces):
            cw = c.split(" ") if c else []
            assert cw == words[s - 1 : s - 1 + chunk], (cid, k)
            stitched.extend(cw if k == len(pieces) - 1 else cw[:stride])
        # stitching may duplicate nothing and must cover the prefix it
        # reaches; full coverage holds whenever stride <= chunk
        assert stitched[: len(words)] == words, cid


def test_collapse_repeats_idempotent_and_entropy_bound(spark):
    # one Spark job checking two properties over 80 random documents:
    # collapse_repeat_tokens is idempotent (collapsing twice == once),
    # and token entropy <= log2(n_unique) with equality iff uniform
    from pyspark.sql import functions as F

    from ray_beam_runner_spark.functions.text import collapse_repeat_tokens, tokens

    rng = random.Random(20260814)
    vocab = ["x", "y", "zz", "q1"]
    rows = [
        (" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))),)
        for _ in range(80)
    ]
    df = spark.createDataFrame(rows, "text string")
    staged = df.select(tokens(F.col("text")).alias("ts"))
    once = staged.select(collapse_repeat_tokens(F.col("ts")).alias("c1"))
    twice = once.select("c1", collapse_repeat_tokens(F.col("c1")).alias("c2"))
    tf = (
        df.select(F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("t").count()
    )
    bad_idem = twice.filter(F.col("c1") != F.col("c2")).count()
    assert bad_idem == 0
    # entropy bound on the whole corpus distribution
    row = tf.agg(
        F.sum("count").alias("n"),
        F.count(F.lit(1)).alias("u"),
        F.sum(F.col("count") * F.log2("count")).alias("clogc"),
    ).collect()[0]
    entropy = math.log2(row.n) - row.clogc / row.n
    assert -1e-9 <= entropy <= math.log2(row.u) + 1e-9


def test_repeated_span_stats_invariants(spark, sf_dir):
    from ray_beam_runner_spark.functions.dedup import repeated_span_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = repeated_span_stats(docs, "doc_id", "text", n=20, min_docs=2).collect()
    assert len(out) == docs.count()  # every document labeled
    for r in out:
        assert 0 <= r.n_dup_spans <= r.n_spans
        assert 0.0 <= r.dup_frac <= 1.0
    # min_docs=1 makes every span "hot": n_dup_spans == n_spans everywhere
    all_hot = repeated_span_stats(docs, "doc_id", "text", n=20, min_docs=1).collect()
    assert all(r.n_dup_spans == r.n_spans for r in all_hot)


def test_span_stats_min_docs_monotone(spark, sf_dir):
    # raising min_docs can only shrink the hot-span set, so every
    # document's n_dup_spans is non-increasing in min_docs — the skew
    # knob is monotone, never surprising
    from ray_beam_runner_spark.functions.dedup import repeated_span_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    by_k = {}
    for k in (2, 3, 5):
        by_k[k] = {
            r.doc_id: r.n_dup_spans
            for r in repeated_span_stats(docs, "doc_id", "text", n=20, min_docs=k).collect()
        }
    assert set(by_k[2]) == set(by_k[3]) == set(by_k[5])
    for d in by_k[2]:
        assert by_k[2][d] >= by_k[3][d] >= by_k[5][d]


def test_max_doc_freq_cap_monotone_candidates(spark, sf_dir):
    # the hot-shingle cap is conservative on the CANDIDATE set: capped
    # postings are a subset of uncapped, so the candidate pairs (threshold
    # 0 = every pair sharing a surviving shingle) shrink monotonically as
    # the cap tightens, for both the Jaccard and the containment operator;
    # and a cap larger than the corpus is an exact no-op (values included)
    from ray_beam_runner_spark.functions.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter("doc_id < 150")
    n_docs = docs.count()

    def pairs(fn, cap):
        return {
            (r.d1, r.d2)
            for r in fn(docs, "doc_id", "text", n=3, threshold=0.0, max_doc_freq=cap).collect()
        }

    for fn in (ngram_jaccard_pairs, ngram_containment_pairs):
        uncapped = pairs(fn, None)
        loose = pairs(fn, 20)
        tight = pairs(fn, 5)
        assert tight <= loose <= uncapped
        assert pairs(fn, n_docs + 1) == uncapped  # cap beyond corpus = no-op
        # no-op cap must also preserve the similarity VALUES, not just ids
        full = {
            tuple(r)
            for r in fn(docs, "doc_id", "text", n=3, threshold=0.5).collect()
        }
        noop = {
            tuple(r)
            for r in fn(
                docs, "doc_id", "text", n=3, threshold=0.5, max_doc_freq=n_docs + 1
            ).collect()
        }
        assert noop == full


@given(
    st.integers(min_value=2, max_value=8),
    st.lists(st.integers(min_value=0, max_value=255), min_size=0, max_size=3000),
)
@settings(max_examples=150, deadline=None)
def test_gif_lzw_roundtrip_property(min_code_size, syms):
    from ray_beam_runner_spark.functions.multimodal import _lzw_decode, _lzw_encode

    syms = [s % (1 << min_code_size) for s in syms]
    assert _lzw_decode(_lzw_encode(syms, min_code_size), min_code_size) == bytes(syms)


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([1, 3, 4]),
    st.integers(min_value=0, max_value=4),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=120, deadline=None)
def test_png_roundtrip_property(h, w, ch, filter_type, seed):
    import numpy as np

    from ray_beam_runner_spark.functions.multimodal import decode_png, encode_png

    arr = np.random.RandomState(seed).randint(0, 256, size=(h, w, ch)).astype(np.uint8)
    d = decode_png(encode_png(arr, filter_type=filter_type), return_pixels=True)
    assert np.array_equal(d["pixels"], arr)
    assert d["px_sum"] == int(arr.astype(np.int64).sum())


@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=2, max_value=256),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=120, deadline=None)
def test_gif_roundtrip_property(h, w, n_frames, n_pal, seed):
    import numpy as np

    from ray_beam_runner_spark.functions.multimodal import decode_gif, encode_gif

    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, size=(n_pal, 3)).astype(np.uint8)
    frames = [rng.randint(0, n_pal, size=(h, w)).astype(np.uint8) for _ in range(n_frames)]
    d = decode_gif(encode_gif(frames, pal), return_frames=True)
    assert d["n_frames"] == n_frames and (d["width"], d["height"]) == (w, h)
    for i, f in enumerate(frames):
        assert np.array_equal(d["frames"][i], pal[f])


@given(
    st.lists(
        st.tuples(st.text(alphabet="abcdef", min_size=1, max_size=6),
                  st.integers(min_value=1, max_value=9)),
        min_size=1, max_size=12,
    ),
    st.integers(min_value=1, max_value=15),
)
@settings(max_examples=150, deadline=None)
def test_bpe_encode_reconstructs_and_respects_merges(word_counts, n_merges):
    from ray_beam_runner_spark.functions.bpe import (
        EOW,
        _learn_from_counts,
        bpe_encode_word,
    )

    merges = _learn_from_counts(word_counts, n_merges, min_freq=1)
    ranks = {m: i for i, m in enumerate(merges)}
    vocab = {EOW, *"abcdef", *(a + b for a, b in merges)}
    for w, _ in word_counts:
        toks = bpe_encode_word(w, ranks)
        assert "".join(toks) == w + EOW          # lossless segmentation
        assert all(t in vocab for t in toks)     # only learned symbols
        # greedy completeness: no adjacent pair is still mergeable
        assert all(
            (toks[i], toks[i + 1]) not in ranks for i in range(len(toks) - 1)
        )


def test_widening_legality_properties():
    """Property: every legal widening is value-preserving — any value
    representable in the narrow type is exactly representable in the
    wide type — and the relation is transitive and irreflexive."""
    from decimal import Decimal

    from hypothesis import given
    from hypothesis import strategies as st

    from ray_beam_runner_spark.sources.snapshots import _WIDENINGS, _is_widening

    # scalar chain: ranges nest
    ranges = {
        "tinyint": (-(1 << 7), (1 << 7) - 1),
        "smallint": (-(1 << 15), (1 << 15) - 1),
        "int": (-(1 << 31), (1 << 31) - 1),
        "bigint": (-(1 << 63), (1 << 63) - 1),
    }
    for old, news in _WIDENINGS.items():
        for new in news:
            if old in ranges and new in ranges:
                lo_o, hi_o = ranges[old]
                lo_n, hi_n = ranges[new]
                assert lo_n <= lo_o and hi_o <= hi_n, (old, new)
            if new == "double" and old in ranges:
                # every int up to 2^31 is exact in a float64 (2^53 mantissa)
                assert ranges[old][1] < (1 << 53)
    assert not _is_widening("bigint", "double")  # >2^53 would be lossy
    # irreflexive + no narrowing anywhere in the scalar chain
    for t in ("tinyint", "smallint", "int", "bigint", "float", "double"):
        assert not _is_widening(t, t)
    assert not _is_widening("bigint", "int") and not _is_widening("double", "float")

    dec = st.tuples(st.integers(1, 38), st.integers(0, 37)).filter(
        lambda ps: ps[1] < ps[0]
    )

    @given(dec, dec)
    def decimal_widening_preserves_values(a, b):
        (pa, sa), (pb, sb) = a, b
        ta, tb = f"decimal({pa},{sa})", f"decimal({pb},{sb})"
        legal = _is_widening(ta, tb)
        # legality == both digit budgets non-shrinking (and not equal)
        assert legal == ((pb - sb >= pa - sa) and (sb >= sa) and (pa, sa) != (pb, sb))
        if legal:
            # the extreme narrow value fits the wide type exactly
            extreme = Decimal(f"{'9' * (pa - sa)}.{'9' * sa}" if sa else "9" * (pa - sa))
            assert len(str(extreme).replace(".", "").replace("-", "")) <= pb

    decimal_widening_preserves_values()
    assert _is_widening("date", "timestamp_ntz")
    assert not _is_widening("timestamp_ntz", "date")


def test_decimal_money_sum_parity_randomized(spark):
    """The round-14 exact-DECIMAL money protocol's load-bearing claims,
    differentially on 20k seeded random 2-decimal values (one Spark job,
    one DuckDB query): (a) Spark's double->DECIMAL(12,2) cast recovers
    the intended 2-dec value exactly for every row (so does DuckDB's —
    their SUMs agree bit-for-bit), and (b) the decimal sum is
    summation-ORDER independent (shuffled copy sums identical), which
    double sums are not."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os
    from decimal import Decimal

    from pyspark.sql import functions as F

    rng = random.Random(1405)
    cents = [rng.randrange(100, 10_000_000_00) for _ in range(20_000)]
    vals = [c / 100.0 for c in cents]
    discs = [rng.randrange(0, 11) / 100.0 for _ in range(20_000)]
    d = tempfile.mkdtemp(prefix="rbrs_decpar_")
    path = os.path.join(d, "t.parquet")
    pq.write_table(
        pa.table({"price": vals, "disc": discs}), path
    )
    sdf = spark.read.parquet(path)
    dec_rev = F.sum(
        F.col("price").cast("decimal(12,2)")
        * (F.lit(1) - F.col("disc").cast("decimal(3,2)"))
    )
    row = sdf.agg(
        dec_rev.cast("double").alias("rev"),
        F.sum(F.col("price").cast("decimal(12,2)")).cast("double").alias("base"),
    ).collect()[0]
    # exact rational ground truth from the integer cents
    disc_pct = [round(x * 100) for x in discs]
    want_rev = float(
        sum(Decimal(c) * (100 - p) for c, p in zip(cents, disc_pct)) / 10_000
    )
    want_base = float(sum(Decimal(c) for c in cents) / 100)
    assert row.rev == want_rev and row.base == want_base  # BIT equality
    con = duckdb.connect()
    drev, dbase = con.execute(
        "SELECT CAST(sum(CAST(price AS DECIMAL(12,2))"
        "  * (1 - CAST(disc AS DECIMAL(3,2)))) AS DOUBLE),"
        " CAST(sum(CAST(price AS DECIMAL(12,2))) AS DOUBLE)"
        f" FROM read_parquet('{path}')"
    ).fetchone()
    assert (drev, dbase) == (row.rev, row.base)  # cross-engine BIT equality
    # order independence: a reversed/shuffled copy sums identically
    order = list(range(len(vals)))
    rng.shuffle(order)
    pq.write_table(
        pa.table({"price": [vals[i] for i in order], "disc": [discs[i] for i in order]}),
        os.path.join(d, "t2.parquet"),
    )
    row2 = (
        spark.read.parquet(os.path.join(d, "t2.parquet"))
        .agg(dec_rev.cast("double").alias("rev"))
        .collect()[0]
    )
    assert row2.rev == row.rev
    # the integer-CENTS route (the fast helper form): round(v*100)
    # recovers every cent exactly, both engines sum the same exact
    # integer and round it to double the same way
    cents_col = F.round(F.col("price") * 100).cast("long")
    dpct_col = F.round(F.col("disc") * 100).cast("long")
    srow = sdf.agg(
        F.sum(cents_col).alias("c"),
        F.sum(cents_col * (F.lit(100) - dpct_col)).alias("u"),
    ).collect()[0]
    assert srow.c == sum(cents)  # every cents extraction exact
    assert srow.u == sum(c * (100 - p) for c, p in zip(cents, disc_pct))
    dc, du = con.execute(
        "SELECT sum(CAST(round(price*100) AS BIGINT)),"
        " sum(CAST(round(price*100) AS BIGINT)"
        "     * (100 - CAST(round(disc*100) AS BIGINT)))"
        f" FROM read_parquet('{path}')"
    ).fetchone()
    assert (int(dc), int(du)) == (srow.c, srow.u)


def test_split_long_money_sum_exact_randomized(spark):
    """The round-15 split-LONG money helpers (_cents/_split_sum in
    queries/relational.py): on 20k seeded random 2-decimal values —
    including NEGATIVE money (acctbal-like) — the helpers' result is
    bit-identical to the exact Decimal ground truth AND to DuckDB's
    round()-based HUGEINT oracle spelling, and summation order never
    matters. Pins the two load-bearing identities:
      * floor(x*100 + 0.5) == round-to-nearest for near-integer x of
        either sign;
      * x == (x >> 15)*2^15 + (x & 32767) for all signed longs, so the
        two primitive long sums recombine to the exact total."""
    import os
    import random
    import tempfile
    from decimal import Decimal

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from ray_beam_runner_spark.queries.relational import (
        _cents,
        _dec_sum,
        _revenue_sum,
    )

    rng = random.Random(1501)
    # prices positive (lineitem-like), bal signed (acctbal-like)
    price_c = [rng.randrange(100, 10_000_000_00) for _ in range(20_000)]
    bal_c = [rng.randrange(-99_999, 999_999_99) for _ in range(20_000)]
    disc_pct = [rng.randrange(0, 11) for _ in range(20_000)]
    d = tempfile.mkdtemp(prefix="rbrs_splitsum_")
    path = os.path.join(d, "t.parquet")
    pq.write_table(
        pa.table(
            {
                "l_extendedprice": [c / 100.0 for c in price_c],
                "l_discount": [p / 100.0 for p in disc_pct],
                "bal": [c / 100.0 for c in bal_c],
            }
        ),
        path,
    )
    sdf = spark.read.parquet(path)
    # per-row cents extraction exact for BOTH signs
    n_bad = sdf.filter(
        (_cents("l_extendedprice") != F.round(F.col("l_extendedprice") * 100))
        | (_cents("bal") != F.round(F.col("bal") * 100))
    ).count()
    assert n_bad == 0
    row = sdf.agg(
        _dec_sum("l_extendedprice", "base"),
        _dec_sum("bal", "balsum"),
        _revenue_sum("rev"),
    ).collect()[0]
    want_base = float(Decimal(sum(price_c)) / 100)
    want_bal = float(Decimal(sum(bal_c)) / 100)
    want_rev = float(
        Decimal(sum(c * (100 - p) for c, p in zip(price_c, disc_pct))) / 10_000
    )
    assert (row.base, row.balsum, row.rev) == (want_base, want_bal, want_rev)
    # cross-engine bit equality with the oracle spelling
    con = duckdb.connect()
    db, dbal, dr = con.execute(
        "SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0,"
        " CAST(sum(CAST(round(bal*100) AS BIGINT)) AS DOUBLE)/100.0,"
        " CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)"
        "     * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0"
        f" FROM read_parquet('{path}')"
    ).fetchone()
    assert (db, dbal, dr) == (row.base, row.balsum, row.rev)
    # order independence: a shuffled copy sums bit-identically
    order = list(range(len(price_c)))
    rng.shuffle(order)
    pq.write_table(
        pa.table(
            {
                "l_extendedprice": [price_c[i] / 100.0 for i in order],
                "l_discount": [disc_pct[i] / 100.0 for i in order],
                "bal": [bal_c[i] / 100.0 for i in order],
            }
        ),
        os.path.join(d, "t2.parquet"),
    )
    row2 = (
        spark.read.parquet(os.path.join(d, "t2.parquet"))
        .agg(
            _dec_sum("l_extendedprice", "base"),
            _dec_sum("bal", "balsum"),
            _revenue_sum("rev"),
        )
        .collect()[0]
    )
    assert tuple(row2) == tuple(row)
