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


def test_corpus_pipeline_end_to_end(spark, sf_dir, tmp_path):
    # the full corpus-assembly user story composed as ONE dataflow:
    # quality gate -> exact dedup -> benchmark decontamination ->
    # deterministic split -> context chunking -> sharded JSONL write,
    # with row accounting at every stage (each operator is oracle-gated
    # individually; this pins that they COMPOSE)
    import glob

    from ray_beam_runner_spark.functions.dedup import decontaminate_hits
    from ray_beam_runner_spark.functions.text import (
        chunk_starts,
        chunk_text,
        fingerprint_md5,
        hash_bucket,
        quality_score,
        tokens,
    )
    from ray_beam_runner_spark.sources.io import read_json, write_jsonl_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_in = docs.count()

    # 1. quality gate
    kept = docs.filter(quality_score(F.col("text")) >= 0.5)
    n_kept = kept.count()
    assert 0 < n_kept <= n_in

    # 2. exact dedup (min-id survivor per normalized text)
    surv = kept.withColumn("_fp", fingerprint_md5(F.col("text")))
    firsts = surv.groupBy("_fp").agg(F.min("doc_id").alias("doc_id"))
    deduped = surv.join(firsts, ["_fp", "doc_id"], "left_semi").drop("_fp")
    n_dedup = deduped.count()
    assert n_dedup <= n_kept

    # 3. decontaminate against the src0 eval slice
    train = deduped.filter(F.col("source") != "src0")
    hits = decontaminate_hits(
        train, deduped.filter(F.col("source") == "src0"), "doc_id", "text", n=8
    )
    clean = train.join(hits, "doc_id", "left_anti")
    n_clean = clean.count()
    assert n_clean == train.count() - hits.count()

    # 4. deterministic split: partition function — every doc in exactly one side
    b = hash_bucket(F.col("doc_id"), 100, "split")
    tr = clean.filter(b < 90)
    va = clean.filter(b >= 90)
    assert tr.count() + va.count() == n_clean

    # 5. chunk the training side
    toks = tr.select("doc_id", tokens(F.col("text")).alias("_t"))
    chunks = toks.select(
        "doc_id",
        F.explode(chunk_starts(F.col("_t"), 96)).alias("s"),
    ).join(toks, "doc_id").select(
        "doc_id", "s", chunk_text(F.col("_t"), F.col("s"), 128).alias("chunk")
    )
    n_chunks = chunks.count()
    assert n_chunks >= tr.count()  # every doc yields at least one chunk

    # 6. shard out; manifest must account for every chunk
    out = str(tmp_path / "corpus_shards")
    manifest = write_jsonl_shards(
        chunks.withColumn("chunk_id", F.concat_ws("_", "doc_id", "s")),
        out,
        "chunk_id",
        n_shards=4,
    )
    assert sum(manifest.values()) == n_chunks
    assert read_json(spark, out).count() == n_chunks
    assert len(glob.glob(f"{out}/_shard=*")) == 4


def test_collapse_repeat_tokens_runs_and_edges(spark):
    from ray_beam_runner_spark.functions.text import collapse_repeat_tokens, tokens

    df = spark.createDataFrame(
        [
            (1, "filter filter filter fast fast slow filter"),
            (2, "a"),
            (3, "x x"),
        ],
        "doc_id long, text string",
    )
    staged = df.select("doc_id", tokens(F.col("text")).alias("ts"))
    out = {
        r.doc_id: r.keep
        for r in staged.select(
            "doc_id", collapse_repeat_tokens(F.col("ts")).alias("keep")
        ).collect()
    }
    # runs collapse to first occurrence; non-adjacent repeats survive
    assert out[1] == ["filter", "fast", "slow", "filter"]
    assert out[2] == ["a"]
    assert out[3] == ["x"]


def test_dedup_semantic_matches_union_find(spark, sf_dir):
    from ray_beam_runner_spark.functions.graph import dedup_clusters
    from ray_beam_runner_spark.functions.similarity import blocked_cosine_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = blocked_cosine_pairs(emb, "vec_id", "embedding", threshold=0.4, n_blocks=4)
    got = {
        r.vec_id: (r.cluster, r.is_survivor)
        for r in dedup_clusters(
            emb, pairs.select("v1", "v2"), id_col="vec_id", a="v1", b="v2"
        ).collect()
    }
    # driver-side union-find over the same edges is the ground truth
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = pairs.select("v1", "v2").collect()
    for e in edges:
        ra, rb = find(e.v1), find(e.v2)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    n_vecs = emb.count()
    assert len(got) == n_vecs
    for vid, (cluster, survivor) in got.items():
        expected = find(vid) if vid in parent else vid
        assert cluster == expected, (vid, cluster, expected)
        assert survivor == (cluster == vid)
    assert edges, "fixture should contain at least one near-dup edge"


def test_word_ngrams_regex_equivalence(spark, sf_dir):
    # the regex formulation must equal the straightforward slice+zip_with
    # token-window construction on real corpus text, for both shingle sizes
    from ray_beam_runner_spark.functions.text import tokens, word_ngrams

    def hof_ngrams(col, n):
        toks = tokens(col)
        win = F.greatest(F.size(toks) - (n - 1), F.lit(0))
        parts = [F.slice(toks, F.lit(j + 1), win) for j in range(n)]
        grams = parts[0]
        for p in parts[1:]:
            grams = F.zip_with(grams, p, lambda a, b: F.concat_ws(" ", a, b))
        return grams

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    edge = spark.createDataFrame(
        [("one two",), ("one two three",), ("  padded   spaces  here now  ",), ("solo",)],
        "text string",
    )
    for df in (docs, edge):
        for n in (3, 8):
            bad = (
                df.select(
                    word_ngrams(F.col("text"), n).alias("a"),
                    hof_ngrams(F.col("text"), n).alias("b"),
                )
                .filter(F.col("a") != F.col("b"))
                .count()
            )
            assert bad == 0, (n, bad)


def test_incremental_corpus_maintenance_with_snapshot_table(spark, sf_dir, tmp_path):
    """The standing-corpus user story: a snapshot table holds the deduped
    corpus; each incoming increment is fingerprint-deduped against the
    table's state, merged atomically, and the change data feed reports
    exactly what entered — the incremental path a 100 TB corpus runs
    daily, composed from individually-gated operators."""
    from ray_beam_runner_spark.functions.text import fingerprint_md5
    from ray_beam_runner_spark.sources import snapshots as snap

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    ).withColumn("fp", fingerprint_md5(F.col("text")))
    standing = docs.filter(~F.col("source").isin("src18", "src19"))
    table = str(tmp_path / "corpus")
    v1 = snap.write_snapshot(standing, table, cluster_by=["doc_id"], n_files=4)
    n_standing = snap.snapshot_rows(table)
    assert n_standing == standing.count()

    # increment = new sources PLUS a re-ingestion of every 25th standing
    # doc (exact dup by fingerprint, re-keyed) that dedup must reject
    increment = docs.filter(F.col("source").isin("src18", "src19")).unionByName(
        standing.filter(F.col("doc_id") % 25 == 0).withColumn(
            "doc_id", F.col("doc_id") + 500_000
        )
    )
    corpus_fp = snap.read_snapshot(spark, table).select("fp").distinct()
    fresh = increment.join(corpus_fp, "fp", "left_anti")
    n_dupes = increment.count() - fresh.count()
    assert n_dupes == standing.filter(F.col("doc_id") % 25 == 0).count()

    v2 = snap.upsert_snapshot(spark, table, fresh, ["doc_id"])
    assert snap.snapshot_rows(table) == n_standing + fresh.count()

    # CDF: exactly the fresh docs entered, nothing deleted
    diff = snap.snapshot_diff(spark, table, v1, v2)
    by_change = {r["_change"]: r["n"] for r in
                 diff.groupBy("_change").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_change == {"insert": fresh.count()}
    # compaction restores file hygiene without changing contents
    v3 = snap.compact(spark, table, n_files=4)
    assert snap.snapshot_rows(table, version=v3) == n_standing + fresh.count()


def test_kneser_ney_bigram_probabilities_normalize(spark, tmp_path):
    # interpolated KN must be a proper distribution: for every history
    # w1, sum over the continuation vocabulary of P_KN(w2|w1) == 1
    # (discount mass exactly redistributed). Computed with the same
    # formula q_bigram_kn_logppl uses, over a tiny corpus with repeats.
    import itertools
    from collections import Counter

    docs = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog",
    ]
    pairs = Counter(
        p
        for d in docs
        for p in itertools.pairwise(d.split())
    )
    c1 = Counter()
    n1f = Counter()
    n1b = Counter()
    for (w1, w2), c in pairs.items():
        c1[w1] += c
        n1f[w1] += 1
        n1b[w2] += 1
    t_types = len(pairs)
    vocab_w2 = set(n1b)
    d_const = 0.75
    for w1 in c1:
        total = sum(
            max(pairs.get((w1, w2), 0) - d_const, 0) / c1[w1]
            + (d_const * n1f[w1] / c1[w1]) * (n1b[w2] / t_types)
            for w2 in vocab_w2
        )
        assert abs(total - 1.0) < 1e-12, (w1, total)
    # and the Spark query runs + scores every multi-token doc
    from ray_beam_runner_spark.queries import QUERIES

    df = spark.createDataFrame(
        [(i, d, "en", "s", len(d)) for i, d in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    corpus = str(tmp_path / "kn_corpus")
    df.write.parquet(f"{corpus}/documents.parquet")
    rows = {r.doc_id: r for r in QUERIES["q_bigram_kn_logppl"](spark, corpus).collect()}
    assert len(rows) == 3
    assert all(r.n_bigrams >= 4 and r.log_ppl_kn > 0 for r in rows.values())


def test_temperature_mix_downsamples_skewed_sources(spark, tmp_path):
    # the testdata corpus is source-uniform (every rate = 0.5), so the
    # tempered behavior needs a skewed corpus: big sources downsample
    # hardest, tiny sources cap at rate 1.0, and the sampled
    # distribution sits closer to uniform than the raw one
    import os

    from ray_beam_runner_spark.queries.llm import q_temperature_mix

    rows = []
    did = 0
    for src, n in (("big", 800), ("mid", 150), ("tiny", 20)):
        for _ in range(n):
            rows.append((did, f"doc text {did}", "en", src, 10))
            did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = str(tmp_path / "skew_sf")
    os.makedirs(sf)
    df.coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    out = {r.source: r for r in q_temperature_mix(spark, sf).collect()}
    assert out["tiny"].rate == 1.0  # capped: small sources kept whole
    assert out["big"].rate < out["mid"].rate < 1.0  # bigger -> harder cut
    assert out["tiny"].n_sampled == 20
    # tempered shares are flatter than raw shares
    raw_big = out["big"].n_docs / sum(r.n_docs for r in out.values())
    smp_big = out["big"].n_sampled / max(sum(r.n_sampled for r in out.values()), 1)
    assert smp_big < raw_big


def test_cms_sketch_merge_and_bounds(spark):
    # CMS invariants on a known stream: merged shard sketches answer
    # point queries that NEVER undercount, exact for items without
    # collisions at a generous width, and shard-merge == global sketch
    from ray_beam_runner_spark.functions.sketch import (
        cms_estimate,
        cms_merge,
        cms_sketch,
    )
    from pyspark.sql import functions as SF

    rows = [("s1", "a")] * 50 + [("s1", "b")] * 20 + [("s2", "a")] * 30 + [("s2", "c")] * 7
    df = spark.createDataFrame(rows, "source string, item string")
    shard = cms_sketch(df, ["source"], "item", w=256, d=3)
    merged = cms_merge(shard, ["source"])
    glob = cms_sketch(df.select("item"), [], "item", w=256, d=3)
    assert sorted(map(tuple, merged.drop("source").collect() if "source" in merged.columns
                      else merged.collect())) == sorted(map(tuple, glob.collect()))
    items = spark.createDataFrame([("a",), ("b",), ("c",), ("zz",)], "item string")
    est = {r.item: r.est for r in cms_estimate(merged, items, "item").collect()}
    # never undercount; with 3 distinct items in 256 buckets no
    # collisions -> exact; absent item estimates 0 unless it collides
    assert est["a"] == 80 and est["b"] == 20 and est["c"] == 7
    assert est["zz"] in (0, 7, 20, 80)
    # REGRESSION (review find): estimating against the UNMERGED
    # per-shard sketch must still see the summed counts — a bare
    # min over duplicate (j, pos) rows undercounted (est 30 for 80)
    est_shard = {r.item: r.est for r in cms_estimate(shard, items, "item").collect()}
    assert est_shard["a"] == 80
    # geometry is read off the sketch (mismatched w cannot be passed);
    # colliding caller columns are a loud error
    import pytest

    with pytest.raises(ValueError, match="must not carry"):
        cms_estimate(merged, items.withColumn("est", SF.lit(1)), "item")
    # reserved probe-internal names are guarded too (an items frame
    # carrying j/pos/cnt would make the probe join ambiguous)
    with pytest.raises(ValueError, match="must not carry"):
        cms_estimate(merged, items.withColumn("cnt", SF.lit(1)), "item")
    # mixed-geometry unions are rejected loudly: summing/probing across
    # different (w, d) silently breaks the no-undercount guarantee
    other = cms_sketch(df.select("item"), [], "item", w=128, d=3)
    mixed = glob.unionByName(other)
    with pytest.raises(ValueError, match="mixed sketch geometries"):
        cms_merge(mixed, [])
    with pytest.raises(ValueError, match="mixed sketch geometries"):
        cms_estimate(mixed, items, "item")


def test_cms_sketch_size_bound_is_load_bearing(spark):
    # 1000 distinct items into a w=16, d=2 sketch: the groupBy collapse
    # must cap the sketch at d x w rows — an implementation keeping one
    # row per occurrence would blow straight past it
    from ray_beam_runner_spark.functions.sketch import cms_estimate, cms_sketch

    df = spark.createDataFrame([(f"it{i}",) for i in range(1000)], "item string")
    sk = cms_sketch(df, [], "item", w=16, d=2)
    assert sk.count() <= 2 * 16
    # saturated sketch still never undercounts (massive overcounts OK)
    some = spark.createDataFrame([(f"it{i}",) for i in range(0, 1000, 97)], "item string")
    assert all(r.est >= 1 for r in cms_estimate(sk, some, "item").collect())


def test_quality_classifier_matches_numpy_gd(spark, sf_dir):
    # differential: the DataFrame-algebra logistic regression must
    # reproduce an INDEPENDENT numpy implementation of the same
    # fixed-point GD bit-for-bit (weights and per-doc scores)
    import hashlib
    import math
    import re

    import numpy as np
    from pyspark.sql import functions as SF

    from ray_beam_runner_spark.functions.classify import (
        hashed_features,
        logreg_fit,
        logreg_score,
    )

    B, ITERS, LR = 16, 4, 8.0  # B token buckets + 1 length feature
    D = B + 1
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200).cache()
    rows = [(r.doc_id, r.text, r.lang) for r in docs.collect()]

    # --- independent numpy path -------------------------------------
    def fxp_np(x, bits):
        s = float(1 << bits)
        return np.floor(x * s + 0.5) / s

    X = np.zeros((len(rows), D))
    y = np.zeros(len(rows))
    ids = []
    for i, (did, text, lang) in enumerate(rows):
        ids.append(did)
        y[i] = 1.0 if lang == "en" else 0.0
        norm = re.sub(r"\s+", " ", text.lower()).strip()
        toks = norm.split(" ")
        for tok in toks:
            b = int(hashlib.md5(f"qc:{tok}".encode()).hexdigest()[:8], 16) % B
            X[i, b] += 1.0
        X[i, :B] = fxp_np(X[i, :B] / len(toks), 20)
        X[i, B] = fxp_np(min(len(toks), 100) / 100.0, 20)
    w = np.zeros(D + 1)
    n = float(len(rows))
    for _ in range(ITERS):
        z = X @ w[:D] + w[D]
        p = fxp_np(1.0 / (1.0 + np.exp(-z)), 20)
        g = np.concatenate([X.T @ (p - y), [np.sum(p - y)]])
        w = fxp_np(w - LR * g / n, 24)
    p_final = fxp_np(1.0 / (1.0 + np.exp(-(X @ w[:D] + w[D]))), 20)

    # --- Spark path --------------------------------------------------
    labels = docs.select(
        SF.col("doc_id").alias("id"),
        SF.when(SF.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    )
    feats = hashed_features(docs, "doc_id", "text", B)
    wdf = logreg_fit(feats, labels, D, n_iter=ITERS, lr=LR)
    got_w = {r.feat: r.w for r in wdf.collect()}
    for j in range(D + 1):
        assert got_w[j] == w[j], (j, got_w[j], w[j])
    got_p = {r.id: r.p for r in logreg_score(feats, labels, wdf, D).collect()}
    for i, did in enumerate(ids):
        assert got_p[did] == p_final[i], (did, got_p[did], p_final[i])
    docs.unpersist()


def test_quality_classifier_learns_above_baseline(spark, sf_dir):
    # the trained model must beat the majority-class baseline on its
    # training set — i.e. the GD actually moves the weights toward a
    # useful separator, not just deterministically
    from ray_beam_runner_spark.queries import QUERIES

    out = QUERIES["q_quality_classifier"](spark, sf_dir).collect()
    n = len(out)
    acc = sum(1 for r in out if r.pred == r.y) / n
    base = max(sum(1 for r in out if r.y == 1), sum(1 for r in out if r.y == 0)) / n
    assert acc > base, (acc, base)
    # scores are fixed-point 2^-20 multiples (the determinism contract)
    for r in out[:50]:
        assert abs(r.score * (1 << 20) - round(r.score * (1 << 20))) < 1e-9


def test_kn3_normalization_mass(spark, sf_dir):
    # the interpolated modified-KN contract: for ANY history (w1, w2),
    # sum over the FULL vocabulary of p(w3 | w1 w2) == 1 — including
    # unseen-trigram backoff, unseen-bigram backoff, and the uniform
    # 1/V floor. This is what "interpolation weight = exactly the
    # discounted mass" buys; an off-by-anything in a discount, gamma,
    # or continuation count breaks it.
    from ray_beam_runner_spark.functions.lm import kn3_model, kn3_score_triples
    from ray_beam_runner_spark.functions.text import tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100).cache()
    m = kn3_model(docs, "doc_id", "text")
    vocab = docs.select(F.explode(tokens(F.col("text"))).alias("w3")).distinct()
    # histories: 5 seen bigram histories + 2 fully unseen ones
    seen = (
        m["lm123"].select("w1", "w2").distinct().orderBy("w1", "w2").limit(5)
    )
    unseen = spark.createDataFrame(
        [("@@never", "@@seen"), ("zzz_x", "zzz_y")], "w1 string, w2 string"
    )
    hists = seen.unionByName(unseen)
    triples = hists.crossJoin(vocab)
    mass = (
        kn3_score_triples(m, triples)
        .groupBy("w1", "w2")
        .agg(F.sum("p").alias("mass"), F.count(F.lit(1)).alias("nv"))
        .collect()
    )
    assert len(mass) == 7
    v = vocab.count()
    for r in mass:
        assert r.nv == v
        assert abs(r.mass - 1.0) < 1e-9, (r.w1, r.w2, r.mass)
    # probabilities are strictly positive everywhere (uniform floor)
    pmin = kn3_score_triples(m, triples).agg(F.min("p")).first()[0]
    assert pmin > 0
    docs.unpersist()


def test_kn3_backoff_ordering(spark, sf_dir):
    # a seen trigram must outscore the same history with a w3 never
    # seen in ANY context (which only gets the uniform floor share)
    from ray_beam_runner_spark.functions.lm import kn3_model, kn3_score_triples

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    m = kn3_model(docs, "doc_id", "text")
    top = m["lm123"].orderBy(F.col("c123").desc()).first()
    triples = spark.createDataFrame(
        [(top.w1, top.w2, top.w3), (top.w1, top.w2, "@@oov")],
        "w1 string, w2 string, w3 string",
    )
    got = {r.w3: r.p for r in kn3_score_triples(m, triples).collect()}
    assert got[top.w3] > got["@@oov"] > 0


def test_pack_ffd_matches_independent_packer(spark, sf_dir):
    # differential: the distributed FFD kernel must reproduce an
    # INDEPENDENT pure-python first-fit-decreasing bit-for-bit, and
    # satisfy the packing invariants in every domain
    import math
    from collections import defaultdict

    from ray_beam_runner_spark.queries import QUERIES

    CAP = 128
    rows = QUERIES["q_sequence_pack_ffd"](spark, sf_dir).collect()
    assert rows
    by_dom = defaultdict(list)
    for r in rows:
        by_dom[(r.source, r.shard)].append((r.doc_id, r.n_tok, r.bin_id))
    for dom, docs in by_dom.items():
        # independent FFD (naive O(n^2) list scan)
        expect = {}
        bins = []
        for did, n, _ in sorted(docs, key=lambda x: (-x[1], x[0])):
            placed = False
            for i, resid in enumerate(bins):
                if resid >= n:
                    bins[i] -= n
                    expect[did] = i
                    placed = True
                    break
            if not placed:
                bins.append(CAP - n)
                expect[did] = len(bins) - 1
        got = {did: b for did, _n, b in docs}
        assert got == expect, dom
        # invariants: no overflow; bin count >= lower bound
        fill = defaultdict(int)
        for _did, n, b in docs:
            fill[b] += n
            assert n <= CAP
        assert all(v <= CAP for v in fill.values())
        total = sum(n for _d, n, _b in docs)
        n_bins = max(b for _d, _n, b in docs) + 1
        assert n_bins == len(fill) == len(bins)
        assert n_bins >= math.ceil(total / CAP)


def test_pack_ffd_beats_sequential_next_fit(spark, sf_dir):
    # padding-efficiency: FFD waste must not exceed the doc_id-order
    # next-fit packer's (close bin when the next doc doesn't fit) —
    # and on this corpus it should be strictly better overall
    from collections import defaultdict

    from ray_beam_runner_spark.functions.pack import packing_stats
    from ray_beam_runner_spark.queries import QUERIES

    CAP = 128
    packed = QUERIES["q_sequence_pack_ffd"](spark, sf_dir)
    stats = {
        (r.source, r.shard): r
        for r in packing_stats(packed, ["source", "shard"], CAP).collect()
    }
    rows = packed.collect()
    by_dom = defaultdict(list)
    for r in rows:
        by_dom[(r.source, r.shard)].append((r.doc_id, r.n_tok))
    total_ffd = total_seq = 0
    for dom, docs in by_dom.items():
        seq_bins, resid = 1, CAP
        for _did, n in sorted(docs):
            if n > resid:
                seq_bins += 1
                resid = CAP
            resid -= n
        seq_waste = seq_bins * CAP - sum(n for _d, n in docs)
        st = stats[dom]
        assert st.padding_waste <= seq_waste, dom
        assert st.n_bins <= seq_bins
        assert 0 < st.fill_ratio <= 1.0
        total_ffd += st.padding_waste
        total_seq += seq_waste
    assert total_ffd < total_seq  # measurable padding reduction


def test_cdc_chunks_resynchronize_after_insertion(spark):
    # the content-defined property: prepending text shifts only the
    # chunks up to the first boundary after the edit; every later
    # chunk keeps its fingerprint (fixed-stride chunking shifts ALL)
    from ray_beam_runner_spark.functions.text import cdc_chunks

    base = " ".join(f"tok{i}" for i in range(400))
    edited = "inserted words here " + base
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    out = cdc_chunks(docs, "doc_id", "text", divisor=16).collect()
    fp1 = [r.chunk_md5 for r in sorted(out, key=lambda r: r.chunk_idx) if r.doc_id == 1]
    fp2 = [r.chunk_md5 for r in sorted(out, key=lambda r: r.chunk_idx) if r.doc_id == 2]
    assert len(fp1) > 5
    shared = set(fp1) & set(fp2)
    # all but the first chunk survive the edit (boundaries after the
    # first post-edit boundary are pure functions of local content)
    assert len(shared) >= len(fp1) - 1
    # and the suffix ORDER matches, not just the set
    assert fp1[1:] == fp2[len(fp2) - len(fp1) + 1:]
    # determinism across runs
    again = cdc_chunks(docs, "doc_id", "text", divisor=16).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_dd_sketch_merge_quantiles_and_guarantee(spark):
    import pytest
    from pyspark.sql import functions as F

    from ray_beam_runner_spark.functions.sketch import (
        dd_merge,
        dd_quantile,
        dd_sketch,
    )

    # deterministic heavy-tailed values incl. zeros, split into shards
    vals = [(i, float((i * i) % 997) if i % 50 else 0.0, i % 3) for i in range(600)]
    df = spark.createDataFrame(vals, "id long, v double, shard long")
    per_shard = dd_sketch(df, ["shard"], "v", alpha=0.02)
    merged = dd_merge(per_shard, ["shard"])
    direct = dd_sketch(df.select("v"), [], "v", alpha=0.02)
    # merge exactness: shard-merged sketch == sketch of the whole stream
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    # sketch size is bucket-bounded, not row-bounded
    assert merged.count() < 400
    qs = [0.1, 0.5, 0.9, 0.99]
    est = {r.q: r.est for r in dd_quantile(merged, [], qs).collect()}
    xs = sorted(v for _, v, _ in vals)
    for q in qs:
        exact = xs[int(1 + q * (len(xs) - 1)) - 1]
        if exact == 0:
            assert est[q] == 0.0
        else:
            assert abs(est[q] - exact) / exact <= 0.02 + 1e-6, (q, est[q], exact)
    # mixed alphas must refuse to compose
    other = dd_sketch(df, ["shard"], "v", alpha=0.05)
    with pytest.raises(ValueError, match="mixed sketch alphas"):
        dd_merge(per_shard.unionByName(other), ["shard"])


def test_dd_sketch_rejects_negative_and_null_values(spark):
    import pytest

    from ray_beam_runner_spark.functions.sketch import dd_sketch

    neg = spark.createDataFrame([(1, 5.0), (2, -0.5)], "id long, v double")
    with pytest.raises(ValueError, match="non-null and >= 0"):
        dd_sketch(neg, [], "v")
    withnull = spark.createDataFrame([(1, 5.0), (2, None)], "id long, v double")
    with pytest.raises(ValueError, match="non-null and >= 0"):
        dd_sketch(withnull, [], "v")
