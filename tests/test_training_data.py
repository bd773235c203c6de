"""Training-data pipeline operators: decontamination, PII scrub,
deterministic splits, source mixing (no reference analog — the reference
stops at GBK/Combine; these are the corpus-assembly steps)."""

from pyspark.sql import functions as F

from ray_beam_runner_spark.functions.dedup import decontaminate_hits
from ray_beam_runner_spark.functions.text import hash_bucket, pii_count, redact_pii


def test_redact_pii_order_and_tokens(spark):
    df = spark.createDataFrame(
        [("mail bob.smith+x@corp.example.org call +1-555-0100 from 192.168.1.200 twice 10.0.0.1",)],
        "t string",
    )
    row = df.select(
        redact_pii(F.col("t")).alias("clean"),
        pii_count(F.col("t"), "email").alias("ne"),
        pii_count(F.col("t"), "phone").alias("np"),
        pii_count(F.col("t"), "ipv4").alias("ni"),
    ).collect()[0]
    assert row.clean == "mail <EMAIL> call <PHONE> from <IP> twice <IP>"
    assert (row.ne, row.np, row.ni) == (1, 1, 2)
    # emails redact before IPs: a dotted domain never half-matches IPv4
    assert "<IP>>" not in row.clean


def test_hash_bucket_deterministic_and_uniform(spark):
    df = spark.range(2000).select(hash_bucket(F.col("id"), 100, "split").alias("b"))
    stats = df.agg(
        F.min("b").alias("lo"), F.max("b").alias("hi"), F.countDistinct("b").alias("nd")
    ).collect()[0]
    assert stats.lo >= 0 and stats.hi <= 99
    assert stats.nd > 90  # roughly uniform over 2000 draws
    # stable across evaluations (pure function of the value, no rand())
    a = sorted(r.b for r in df.collect())
    b = sorted(r.b for r in df.collect())
    assert a == b


def test_decontaminate_hits_exact(spark):
    train = spark.createDataFrame(
        [(1, "a b c d e f g h tail words here"),   # shares the 8-gram
         (2, "totally different words with no overlap at all"),
         (3, "x a b c d e f g h y")],              # shares it mid-doc
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "a b c d e f g h"), (101, "unrelated eval doc content")],
        "doc_id long, text string",
    )
    hits = {r.doc_id: r.n_shared_grams for r in
            decontaminate_hits(train, ev, "doc_id", "text", n=8).collect()}
    assert hits == {1: 1, 3: 1}


def test_sample_mix_invariants(spark, sf_dir):
    from ray_beam_runner_spark.queries import QUERIES

    rows = QUERIES["q_sample_mix"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r.n_sampled <= r.n_docs
        assert r.n_sampled <= r.n_mixed <= 3 * r.n_sampled


def test_chunking_covers_document_with_overlap(spark):
    from ray_beam_runner_spark.functions.text import chunk_starts, chunk_text, tokens

    words = " ".join(f"w{i}" for i in range(250))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    toks = df.select("doc_id", tokens(F.col("text")).alias("_toks"))
    chunks = (
        toks.select("doc_id", "_toks", F.explode(chunk_starts(F.col("_toks"), 96)).alias("s"))
        .select("s", chunk_text(F.col("_toks"), F.col("s"), 128).alias("c"))
        .collect()
    )
    # starts advance by the stride; 250 tokens -> starts 1, 97, 193
    assert [r.s for r in chunks] == [1, 97, 193]
    split = [r.c.split(" ") for r in chunks]
    assert len(split[0]) == 128 and len(split[1]) == 128
    assert len(split[2]) == 250 - 192  # tail chunk shorter
    # consecutive chunks overlap by chunk_size - stride = 32 tokens
    assert split[0][96:] == split[1][:32]
    # stitching non-overlapping prefixes reconstructs the document
    stitched = split[0][:96] + split[1][:96] + split[2]
    assert stitched == words.split(" ")
