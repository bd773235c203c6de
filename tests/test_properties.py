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
