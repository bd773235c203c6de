"""Composed incremental corpus pipeline: ONE source change feed drives
a cascade of continuously-maintained tables — the table-level analog of
the reference runner's arbitrary pipeline composition
(ray_runner_test.py:821-829 multi-stage fused pipelines,
translations.greedily_fuse), re-expressed as change-feed algebra over
snapshot tables.

Topology::

    documents (source snapshot table, CDC commits)
        │ snapshot_diff(wm → cur)                [refresh_corpus_state]
        ▼
    corpus_state    one row per LIVE quality-passing doc; is_canon
                    marks the exact-dedup survivor (min doc_id per
                    fingerprint) — dedup WITH retraction: deleting a
                    survivor re-elects the smallest remaining dup,
                    so the state always equals a batch recompute
        │ change feed, filtered to is_canon rows  [corpus_feed]
        ├──────────────► per-source aggregate view   (IVM: cnt, sum tokens)
        ├──────────────► inverted token index        (CDC-maintained postings)
        ├──────────────► IVF-PQ ANN index            (frozen quantizer, CDC)
        └──────────────► MinHash-LSH dedup index     (banded buckets, CDC)

Scale/consistency invariants (the properties that make this hold at
100 TB of continuously-ingesting corpus):

- Each refresh is ONE atomic snapshot commit on corpus_state (updates
  + deletes + the ``corpus:src`` watermark in the same manifest), so a
  crash leaves either the old state or the new — never a half-applied
  refresh whose end-state-netted diff a re-run could mis-read.
- Refresh cost is change-proportional: the source deltas come from
  :func:`sources.snapshots.snapshot_diff` (immutable-version diff,
  shared files skipped); the standing corpus is touched only by one
  fingerprint semi-join (narrow fp column probe, batch side broadcast
  — the q_incremental_dedup shape) and the keyed MERGE's file-pruned
  rewrite.
- Downstream views consume corpus_state's change feed with
  checkpointed version offsets and (app, batch) transaction ids —
  exactly-once per stage, replay-safe end to end. The ``is_canon``
  filter makes survivor flips compose: a canon→non-canon flip emits
  only its delete half downstream (the non-canon insert is filtered),
  so indexes retract exactly the rows they had admitted.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ray_beam_runner_spark.functions.text import (
    fingerprint_md5,
    hash_bucket,
    n_tokens,
    quality_score,
    tokens,
)
from ray_beam_runner_spark.sources import snapshots as snap

__all__ = [
    "text_embedding",
    "corpus_enrich",
    "refresh_corpus_state",
    "corpus_feed",
    "init_corpus_views",
    "drain_corpus_views",
    "refit_corpus_ann",
    "record_corpus_epoch",
    "latest_corpus_epoch",
    "read_corpus",
    "corpus_hybrid_search",
    "vacuum_corpus",
]

# Table directories every epoch vector pins (quantizer tables resolve
# through the ANN index's own version pins — see clustering.load_ivfpq —
# so pinning "ann" pins the whole generation)
_EPOCH_VIEWS = ("agg", "idx", "ann", "lsh")

WATERMARK_APP = "corpus:src"


def text_embedding(col: Column, dim: int = 8, seed_tag: str = "emb") -> Column:
    """Deterministic dense text embedding (feature hashing): token
    md5-bucket counts over ``dim`` buckets, L2-normalized —
    engine-portable (md5 buckets, text.hash_bucket contract) and pure
    JVM array expressions, so the ANN leg of the pipeline is driven by
    a reproducible vector without any Python in the hot path. Zero
    vector for empty docs (integer counts make any non-empty norm
    >= 1, so the greatest() guard only ever rescues the empty case)."""
    toks = tokens(col)
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.size(
            F.filter(toks, lambda t: hash_bucket(t, dim, seed_tag) == i)
        ).cast("double"),
    )
    norm = F.sqrt(F.aggregate(counts, F.lit(0.0), lambda a, x: a + x * x))
    return F.transform(counts, lambda x: x / F.greatest(norm, F.lit(1.0)))


def corpus_enrich(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Project a documents frame to the corpus_state schema minus the
    survivor flag: (id, source, text, fp, n_tok, quality)."""
    return df.select(
        F.col(id_col),
        F.col("source"),
        F.col(text_col).alias("text"),
        fingerprint_md5(F.col(text_col)).alias("fp"),
        n_tokens(F.col(text_col)).alias("n_tok"),
        quality_score(F.col(text_col)).alias("quality"),
    )


def _elect(pool: DataFrame, id_col: str) -> DataFrame:
    """Mark the min-id row per fingerprint as the canonical survivor —
    partitioned window over a batch-proportional pool, never the
    corpus."""
    from pyspark.sql import Window as W

    w = W.partitionBy("fp").orderBy(F.col(id_col))
    return pool.withColumn("is_canon", F.row_number().over(w) == F.lit(1))


def refresh_corpus_state(
    spark: SparkSession,
    src_dir: str,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.5,
) -> int:
    """Bring ``state_dir`` up to date with the source's latest version:
    live quality-passing docs, exact-dedup survivor elected per
    fingerprint (min id wins — and RE-elected when a survivor is
    deleted, so the state equals a from-scratch batch recompute after
    any commit sequence). First call materializes; later calls apply
    only the source deltas since the recorded watermark. The whole
    refresh publishes as ONE snapshot commit carrying the watermark
    (txn ``corpus:src`` = source version): crash-atomic, replayed
    refreshes are manifest-detected no-ops. Returns the state
    version."""
    cur = snap.latest_version(src_dir)
    if cur is None:
        raise FileNotFoundError(f"refresh_corpus_state: no snapshots in {src_dir}")

    base = snap.latest_version(state_dir)
    if base is None:
        enriched = corpus_enrich(
            snap.read_snapshot(spark, src_dir, cur), id_col, text_col
        ).filter(F.col("quality") >= quality_min)
        state = _elect(enriched, id_col)
        # clustered by the merge key: later delta MERGEs prune to the
        # files whose id range the batch touches
        snap.write_snapshot(
            state, state_dir, cluster_by=[id_col], n_files=4,
            txns={WATERMARK_APP: cur},
        )
        return snap.latest_version(state_dir)

    txns = snap.read_manifest(state_dir, base).get("txns", {})
    if WATERMARK_APP not in txns:
        raise RuntimeError(
            f"refresh_corpus_state: {state_dir} exists but has no "
            f"{WATERMARK_APP} watermark — not a corpus state table"
        )
    wm = int(txns[WATERMARK_APP])
    if cur <= wm:
        return base  # nothing new

    d = snap.snapshot_diff(spark, src_dir, wm, cur).persist()
    ins_en = None
    try:
        dels = d.filter(F.col("_change") == "delete")
        ins = d.filter(F.col("_change") == "insert")
        ins_en = corpus_enrich(ins, id_col, text_col).persist()
        ins_ok = ins_en.filter(F.col("quality") >= quality_min)
        # fingerprints whose membership may change: every delete's
        # pre-image fp + every admitted insert's fp (a failing insert's
        # NEW fp is irrelevant — the doc never enters; its OLD fp rides
        # on the update's delete half)
        aff_fps = (
            dels.select(fingerprint_md5(F.col(text_col)).alias("fp"))
            .unionByName(ins_ok.select("fp"))
            .distinct()
        )
        # ids leaving the state: source deletes + quality-failing
        # inserts (an update can flip a doc below the gate), minus ids
        # whose update is re-admitted (they are REPLACED, not deleted)
        gone = (
            dels.select(id_col)
            .unionByName(
                ins_en.filter(F.col("quality") < quality_min).select(id_col)
            )
            .distinct()
            .join(ins_ok.select(id_col), id_col, "left_anti")
        )
        # pool: standing rows of the affected fingerprints (one narrow
        # fp probe of the state — batch side broadcast), minus rows
        # being deleted/replaced, plus the admitted inserts; then
        # re-elect survivors per fp
        replaced = (
            dels.select(id_col).unionByName(ins.select(id_col)).distinct()
        )
        standing = (
            snap.read_snapshot(spark, state_dir)
            .drop("is_canon")
            .join(F.broadcast(aff_fps), "fp", "left_semi")
            .join(replaced, id_col, "left_anti")
        )
        pool = standing.unionByName(ins_ok.select(*standing.columns))
        updates = _elect(pool, id_col)
        snap.upsert_snapshot(
            spark, state_dir, updates, [id_col],
            delete_keys_df=gone, cdc=True,
            txn_app=WATERMARK_APP, txn_version=cur,
        )
        return snap.latest_version(state_dir)
    finally:
        d.unpersist()
        if ins_en is not None:
            ins_en.unpersist()


def corpus_feed(
    spark: SparkSession, state_dir: str, starting_version: int = 1
) -> DataFrame:
    """corpus_state's change feed restricted to CANONICAL rows — the
    stream every downstream view consumes. The ``is_canon`` filter
    applies to inserts (only survivors enter a view) AND to deletes
    via the pre-image flag (a delete of a row a view never admitted
    must not retract anything); a survivor flip therefore arrives as
    exactly the delete or insert half the view needs."""
    return snap.read_snapshot_stream(
        spark, state_dir, starting_version=starting_version
    ).filter(F.col("is_canon"))


def _drain(q, timeout: float, what: str) -> None:
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(f"{what} drain exceeded {timeout}s")


def init_corpus_views(
    spark: SparkSession,
    state_dir: str,
    work_dir: str,
    emb_dim: int = 8,
    ann_cells: int = 4,
    ann_m: int = 4,
    ann_k: int = 8,
) -> dict[str, str]:
    """Materialize the downstream views from the CURRENT corpus_state
    and freeze the ANN quantizer; returns the layout dict that
    :func:`drain_corpus_views` consumes. The token and ANN indexes are
    batch-built here and stream-maintained from the NEXT state version
    on (the q_text_search / stream_maintain_ivfpq pattern); the
    aggregate view is created by its own first micro-batch (delta fold
    from empty == batch aggregate)."""
    from ray_beam_runner_spark.functions.clustering import ivfpq_index
    from ray_beam_runner_spark.functions.dedup import lsh_index_buckets
    from ray_beam_runner_spark.functions.search import build_token_index

    base = snap.latest_version(state_dir)
    if base is None:
        raise FileNotFoundError(f"init_corpus_views: no state at {state_dir}")
    layout = {
        "state": state_dir,
        "agg": os.path.join(work_dir, "agg"),
        "idx": os.path.join(work_dir, "idx"),
        "ann": os.path.join(work_dir, "ann"),
        "lsh": os.path.join(work_dir, "lsh"),
        "coarse": os.path.join(work_dir, "ann_coarse"),
        "books": os.path.join(work_dir, "ann_books"),
        "ckpt_agg": os.path.join(work_dir, "ckpt_agg"),
        "ckpt_idx": os.path.join(work_dir, "ckpt_idx"),
        "ckpt_ann": os.path.join(work_dir, "ckpt_ann"),
        "ckpt_lsh": os.path.join(work_dir, "ckpt_lsh"),
        "from_version": base + 1,
        "emb_dim": emb_dim,
    }
    canon = snap.read_snapshot(spark, state_dir).filter(F.col("is_canon"))
    build_token_index(canon, layout["idx"], "doc_id", "text")
    # near-dup LSH bucket index over the CANONICAL docs: exact dedup is
    # the state's own survivor election; this view serves NEAR-dup
    # queries (lsh_pairs_from_index) with ingestion-amortized hashing.
    # Explicit b=32/r=4 banding (the documented gapped-corpus preset:
    # detection 1-5e-8 at J>=0.8, 2.4x fewer hashes than the
    # threshold-exact default) — the cascade's near-dup use is
    # high-similarity lookup, not threshold-exact pair enumeration
    snap.write_snapshot(
        lsh_index_buckets(
            canon, "doc_id", "text", num_hashes=128, rows_per_band=4
        ),
        layout["lsh"], cluster_by=["doc_id"], n_files=2,
    )
    vecs = canon.select(
        "doc_id", text_embedding(F.col("text"), emb_dim).alias("emb")
    )
    coarse, books, index = ivfpq_index(
        vecs, "doc_id", "emb", n_cells=ann_cells, m=ann_m, k=ann_k
    )
    # quantizer frozen as tables: every later drain (and any rebuild
    # comparison) encodes against the exact same centroids. The index
    # commit PINS the quantizer versions it was encoded against
    # (ann:coarse/ann:books txns — see clustering.load_ivfpq), so a
    # reader can never pair the index with a different quantizer
    # generation, even while refit_corpus_ann swaps them.
    snap.write_snapshot(coarse, layout["coarse"])
    snap.write_snapshot(books, layout["books"])
    snap.write_snapshot(
        index, layout["ann"], cluster_by=["doc_id"], n_files=2,
        txns={
            "ann:coarse": snap.latest_version(layout["coarse"]),
            "ann:books": snap.latest_version(layout["books"]),
        },
    )
    # initial read epoch: the batch-built views are mutually consistent
    # right now — record it so read_corpus works before the first drain.
    # (The aggregate view materializes on its first drain; the vector
    # simply omits it until then.)
    record_corpus_epoch(spark, layout)
    return layout


def drain_corpus_views(
    spark: SparkSession, layout: dict, timeout: float = 300.0
) -> dict:
    """One availableNow maintenance pass of every downstream view over
    the state versions committed since the last drain (checkpointed
    offsets). Each view's MERGEs carry (app, batch) txn ids —
    exactly-once per stage even if a drain is replayed. Returns the
    recorded read-epoch vector (:func:`record_corpus_epoch`)."""
    from ray_beam_runner_spark.functions.clustering import stream_maintain_ivfpq
    from ray_beam_runner_spark.functions.dedup import stream_maintain_lsh_index
    from ray_beam_runner_spark.functions.search import stream_maintain_token_index

    state_dir = layout["state"]
    # per-source corpus stats: the aggregate maintainer creates its
    # table from the first batch, so it streams from version 1
    agg_q = snap.stream_maintain_aggregate(
        corpus_feed(spark, state_dir, starting_version=1),
        layout["agg"], ["source"], ["n_tok"], layout["ckpt_agg"],
        app_id="corpus:agg",
    )
    _drain(agg_q, timeout, "corpus aggregate")
    idx_q = stream_maintain_token_index(
        corpus_feed(spark, state_dir, starting_version=layout["from_version"]),
        layout["idx"], "doc_id", "text", layout["ckpt_idx"],
        app_id="corpus:idx",
    )
    _drain(idx_q, timeout, "corpus token index")
    # quantizer resolved through the index's version pins: a drain
    # interleaving with refit_corpus_ann encodes against the generation
    # the index currently IS, never a half-swapped pair
    from ray_beam_runner_spark.functions.clustering import load_ivfpq

    coarse, books, _ = load_ivfpq(
        spark, layout["coarse"], layout["books"], layout["ann"]
    )
    emb_dim = int(layout["emb_dim"])
    ann_feed = corpus_feed(
        spark, state_dir, starting_version=layout["from_version"]
    ).select(
        "doc_id",
        text_embedding(F.col("text"), emb_dim).alias("emb"),
        "_change",
        "_commit_version",
    )
    ann_q = stream_maintain_ivfpq(
        ann_feed, layout["ann"], coarse, books, "doc_id", "emb",
        layout["ckpt_ann"], app_id="corpus:ann",
    )
    _drain(ann_q, timeout, "corpus ANN index")
    if "lsh" in layout:  # pre-round-11 layouts have no LSH view
        lsh_q = stream_maintain_lsh_index(
            corpus_feed(spark, state_dir, starting_version=layout["from_version"]),
            layout["lsh"], "doc_id", "text", layout["ckpt_lsh"],
            num_hashes=128, rows_per_band=4,  # must match the init banding
            app_id="corpus:lsh",
        )
        _drain(lsh_q, timeout, "corpus LSH index")
    # publish the READ EPOCH: cross-view consistency for readers that
    # join two views (read_corpus) — recorded in the state table's
    # manifest so it is atomic, time-travellable, and vacuums with the
    # history it describes
    return record_corpus_epoch(spark, layout)


def record_corpus_epoch(spark: SparkSession, layout: dict) -> dict:
    """Commit a cascade READ EPOCH: one metadata-only commit on the
    STATE table whose manifest records the version vector of every
    maintained view at this moment — {state, agg, idx, ann, lsh}. A
    reader that pins each view to one recorded vector
    (:func:`read_corpus`) can never observe a torn cascade: each view
    is individually snapshot-isolated already, but a query JOINING two
    views (hybrid BM25+ANN, token index × aggregate) could previously
    see the token index post-drain and the ANN index pre-drain. The
    epoch closes that.

    The commit shares every data file with its parent (the widen-commit
    pattern: the change feed's file diff across it is empty, so
    downstream maintainers see no phantom rows) and is idempotent to
    replay. Single-maintainer discipline (the same assumption the rest
    of the cascade makes): the recorded vector is mutually consistent
    because nothing advances the views between the last maintainer
    drain and this commit."""
    state_dir = layout["state"]
    vector = {}
    for name in _EPOCH_VIEWS:
        if name in layout:
            v = snap.latest_version(layout[name])
            if v is not None:  # e.g. the agg view before its first drain
                vector[name] = v
    for attempt in range(3):
        base = snap.latest_version(state_dir)
        m = snap.read_manifest(state_dir, base)
        vector = {**vector, "state": base}
        nm = {
            "version": base + 1,
            "parent": base,
            "files": m["files"],
            "op": "epoch",
            "corpus_epoch": vector,
            "schema": m.get("schema"),
            "schema_json": m.get("schema_json"),
        }
        fmt2 = dict.get(m, "meta_format") == 2
        for key in (
            "file_stats", "file_rows", "bloom_conf", "file_blooms",
            "bloom_types", "file_dvs", "constraints", "renames", "dropped",
            "txns",
        ):
            # On a format-2 parent the shard-backed keys stay in the
            # parent's shards (files are unchanged, so _externalize_meta
            # carries them by reference) — dict.get avoids hydrating the
            # full bloom column (O(table) JSON) for a metadata-only commit
            # that would strip those keys back out anyway.
            v = dict.get(m, key) if (fmt2 and key in snap._SHARD_KEYS) else m.get(key)
            if v:
                nm[key] = v
        try:
            snap._publish(state_dir, base + 1, nm)
            return vector
        except snap.ConcurrentCommitError:
            if attempt == 2:
                raise
    raise AssertionError("unreachable")


def latest_corpus_epoch(state_dir: str) -> dict | None:
    """The most recent recorded epoch vector, scanning manifests from
    the head (epochs are recorded every drain, so this reads one or two
    headers in steady state). None before the first record."""
    latest = snap.latest_version(state_dir)
    if latest is None:
        return None
    for v in range(latest, 0, -1):
        try:
            m = snap.read_manifest(state_dir, v)
        except FileNotFoundError:
            return None  # older manifests vacuumed
        e = m.get("corpus_epoch")
        if e is not None:
            return dict(e)
    return None


def read_corpus(
    spark: SparkSession, layout: dict, epoch: dict | None = None
) -> dict:
    """Epoch-pinned cascade read: every maintained view as a DataFrame
    time-travelled to ONE recorded version vector — the cross-view
    read-consistency contract. ``epoch=None`` resolves the latest
    recorded vector; passing a previously returned vector replays that
    exact cascade state (audit / reproduction). Returns
    {"state", "agg", "idx", "ann", "lsh", "epoch"}; a query that joins
    any two of these sees the cascade as of one drain, never a mix —
    even while a drain is advancing the live tables."""
    if epoch is None:
        epoch = latest_corpus_epoch(layout["state"])
        if epoch is None:
            raise FileNotFoundError(
                "read_corpus: no epoch recorded yet — run drain_corpus_views "
                "(or record_corpus_epoch) first"
            )
    out: dict = {"epoch": dict(epoch)}
    out["state"] = snap.read_snapshot(
        spark, layout["state"], version=epoch["state"]
    )
    for name in _EPOCH_VIEWS:
        if name in layout and name in epoch:
            out[name] = snap.read_snapshot(
                spark, layout[name], version=epoch[name]
            )
    return out


def vacuum_corpus(
    layout: dict,
    keep_epochs: int = 2,
    keep_last: int = 1,
    orphan_ttl_seconds: float = 24 * 3600,
) -> dict:
    """Vacuum every cascade table WITHOUT stranding read epochs: the
    last ``keep_epochs`` recorded vectors (and the state manifests that
    carry them) are pinned through each table's vacuum, so
    ``read_corpus(epoch=...)`` keeps working for exactly the retained
    epochs — the cascade analog of Delta's retention window. Each
    table's own ``keep_last``/tag pins still apply on top. Returns
    {table: [deleted rel paths]}."""
    state_dir = layout["state"]
    latest = snap.latest_version(state_dir)
    epochs: list[tuple[int, dict]] = []  # (record version, vector)
    if latest is not None:
        for v in range(latest, 0, -1):
            if len(epochs) >= keep_epochs:
                break
            try:
                m = snap.read_manifest(state_dir, v)
            except FileNotFoundError:
                break
            e = m.get("corpus_epoch")
            if e is not None:
                epochs.append((v, dict(e)))
    out: dict = {}
    state_pins = {v for v, _ in epochs} | {e["state"] for _, e in epochs}
    out["state"] = snap.vacuum(
        state_dir, keep_last=keep_last,
        orphan_ttl_seconds=orphan_ttl_seconds, pin_versions=state_pins,
    )
    for name in _EPOCH_VIEWS:
        if name not in layout or snap.latest_version(layout[name]) is None:
            continue
        pins = {e[name] for _, e in epochs if name in e}
        out[name] = snap.vacuum(
            layout[name], keep_last=keep_last,
            orphan_ttl_seconds=orphan_ttl_seconds, pin_versions=pins,
        )
    return out


def corpus_hybrid_search(
    spark: SparkSession,
    layout: dict,
    terms: list[str],
    query_text: str | None = None,
    topk: int = 10,
    pool: int = 20,
    epoch: dict | None = None,
) -> DataFrame:
    """HYBRID retrieval over the cascade through ONE read epoch: a BM25
    pool over the token index fused (reciprocal-rank, k=60) with an
    IVF-PQ cosine pool over the ANN index — the query shape the epoch
    machinery exists for. Every leg reads epoch-pinned versions: the
    token postings (token-pruned point reads at the pinned index
    version), document lengths and N from the pinned STATE (n_tok is
    already materialized there — no lengths side-table needed), and the
    ANN triple through load_ivfpq(index_version=...) so the quantizer
    generation matches the pinned index even across a refit. A drain
    (or refit) racing this query cannot tear the result: both pools
    rank one cascade state. ``query_text`` defaults to the terms joined
    — the ANN query embeds it with the cascade's own text_embedding.

    Returns (doc_id, score, rank), rank <= topk."""
    from functools import reduce

    from pyspark.sql import Window as W

    from ray_beam_runner_spark.functions.clustering import (
        ivfpq_topk_rerank,
        load_ivfpq,
    )
    from ray_beam_runner_spark.functions.search import rrf_fuse

    if not terms:
        raise ValueError("corpus_hybrid_search: empty term list")
    if epoch is None:
        epoch = latest_corpus_epoch(layout["state"])
        if epoch is None:
            raise FileNotFoundError(
                "corpus_hybrid_search: no epoch recorded — drain first"
            )
    state = snap.read_snapshot(
        spark, layout["state"], version=epoch["state"]
    ).filter(F.col("is_canon"))
    lengths = state.select("doc_id", F.col("n_tok").alias("dl"))
    # N and avgdl stay IN-PLAN as one broadcast 1-row stat instead of
    # two driver round-trips (same doubles — Spark computed them either
    # way; nullif reproduces the old `or 1.0` None/0.0 guard): two
    # fewer Spark actions per search call
    stat = lengths.agg(
        F.count(F.lit(1)).cast("double").alias("_ndocs"),
        F.coalesce(F.nullif(F.avg("dl"), F.lit(0.0)), F.lit(1.0)).alias("_avgdl"),
    )
    parts = [
        snap.read_snapshot(
            spark, layout["idx"], version=epoch["idx"], key_range=("token", t, t)
        ).filter(F.col("token") == t)
        for t in sorted(set(terms))
    ]
    post = reduce(lambda a, b: a.unionByName(b), parts)
    df_t = post.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("_ndocs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    k1, b = 1.2, 0.75
    contrib = idf * F.col("tf") / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("_avgdl"))
    )
    scored = (
        post.join(df_t, "token")
        .join(lengths, "doc_id")
        .crossJoin(F.broadcast(stat))
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    # Top-pool via orderBy+limit -> TakeOrderedAndProject (per-partition
    # heaps + driver merge), NOT an unpartitioned Window over the whole
    # match set — the same scale fix search_bm25 carries (round-9
    # verdict finding #1); the residual window ranks <= pool rows.
    cut = scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(pool)
    bm25 = cut.select(
        "doc_id",
        F.row_number().over(
            W.orderBy(F.col("score").desc(), F.col("doc_id"))
        ).cast("int").alias("rank"),
    )
    coarse, books, index = load_ivfpq(
        spark, layout["coarse"], layout["books"], layout["ann"],
        index_version=epoch["ann"],
    )
    emb_dim = int(layout["emb_dim"])
    q_df = spark.createDataFrame(
        [(0, query_text if query_text is not None else " ".join(terms))],
        "q_id long, q_text string",
    ).select("q_id", text_embedding(F.col("q_text"), emb_dim).alias("q_vec"))
    vectors = state.select(
        "doc_id", text_embedding(F.col("text"), emb_dim).alias("emb")
    )
    ann = ivfpq_topk_rerank(
        q_df, coarse, books, index, vectors, k=pool,
        index_id="doc_id", vec_col="emb",
    ).select("doc_id", "rank")
    return rrf_fuse([bm25, ann], "doc_id", rrf_k=60, topk=topk)


def refit_corpus_ann(
    spark: SparkSession,
    layout: dict,
    ann_cells: int = 4,
    ann_m: int = 4,
    ann_k: int = 8,
    sample_mod: int | None = None,
) -> dict:
    """Re-train the corpus ANN quantizer on the CURRENT canonical
    corpus and atomically swap the index to it
    (:func:`functions.clustering.refit_ivfpq`) — the drift answer for a
    long-lived corpus whose init-time quantizer no longer matches the
    embedding distribution. Drain the views first (the refit encodes
    the state the index is supposed to reflect); later drains pick up
    the new generation through the index's version pins and stay
    incrementally consistent: maintained-after-refit equals a from-
    scratch rebuild against the refit quantizer. Returns the committed
    {"coarse", "books", "index"} versions."""
    from ray_beam_runner_spark.functions.clustering import refit_ivfpq

    emb_dim = int(layout["emb_dim"])
    canon = snap.read_snapshot(spark, layout["state"]).filter(F.col("is_canon"))
    vecs = canon.select(
        "doc_id", text_embedding(F.col("text"), emb_dim).alias("emb")
    )
    out = refit_ivfpq(
        spark, vecs, "doc_id", "emb",
        layout["coarse"], layout["books"], layout["ann"],
        n_cells=ann_cells, m=ann_m, k=ann_k, sample_mod=sample_mod,
    )
    # the refit is a generation swap over the SAME cascade state —
    # publish a fresh epoch so pinned readers can adopt the new
    # quantizer without waiting for the next drain (older epochs keep
    # resolving the old generation through the index version pins)
    record_corpus_epoch(spark, layout)
    return out
