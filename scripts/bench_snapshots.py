"""Snapshot-table MERGE scaling: show that a narrow keyed upsert's cost
is governed by the files it touches, not the table size.

Three clustered tables at x1/x4/x16 rows get the same narrow-range
100-key update + 50 inserts; manifest-stats pruning should hold the
scanned-file count ~constant while the table (and its file count)
grows 16x. A non-clustered control at the largest leg shows the
alternative: no stats, every file scanned. Prints one JSON line;
committed as BENCH_SNAPSHOTS.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ray_beam_runner_spark import get_spark
from ray_beam_runner_spark.sources import snapshots as snap

BASE_ROWS = 200_000
ROWS_PER_FILE = 100_000


def build(spark, rows: int, clustered: bool) -> str:
    tdir = tempfile.mkdtemp(prefix="rbrs_snapbench_")
    df = spark.range(0, rows).select(
        F.col("id").alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    if clustered:
        snap.write_snapshot(
            df, tdir, cluster_by=["k"], n_files=max(2, rows // ROWS_PER_FILE)
        )
    else:
        snap.write_snapshot(
            df.repartition(max(2, rows // ROWS_PER_FILE)), tdir
        )
    return tdir


def narrow_update(spark, rows: int):
    # 100 updates confined to the lowest key range + 50 inserts past max
    upd = spark.range(0, 100).select(
        F.col("id").alias("k"), F.lit("UPDATED").alias("payload")
    )
    ins = spark.range(rows, rows + 50).select(
        F.col("id").alias("k"), F.lit("NEW").alias("payload")
    )
    return upd.unionByName(ins)


def leg(spark, mult: int, clustered: bool) -> dict:
    rows = BASE_ROWS * mult
    tdir = build(spark, rows, clustered)
    try:
        updates = narrow_update(spark, rows)
        updates.collect()  # materialize input cost outside the timed merge
        t0 = time.perf_counter()
        v = snap.upsert_snapshot(spark, tdir, updates, ["k"])
        dt = time.perf_counter() - t0
        m = snap.read_manifest(tdir, v)
        parent = snap.read_manifest(tdir, v - 1)
        total = len(parent["files"])
        pruned = m.get("pruned_by_stats", 0)
        return {
            "rows": rows,
            "files_total": total,
            "pruned_by_stats": pruned,
            "files_scanned": total - pruned,
            "files_rewritten": len(m["rewrote"]),
            "merge_sec": round(dt, 3),
        }
    finally:
        shutil.rmtree(tdir, ignore_errors=True)


def feed_leg(spark, mult: int) -> dict:
    """Change-feed trigger cost vs table size: a cdc=True narrow merge
    writes its delta sidecar at commit; draining the feed for THAT
    version reads only the sidecar — wall time must stay flat while the
    table grows 16x (cost tracks the CHANGE, not the table)."""
    rows = BASE_ROWS * mult
    tdir = build(spark, rows, clustered=True)
    ckpt = tempfile.mkdtemp(prefix="rbrs_feedbench_ckpt_")
    try:
        updates = narrow_update(spark, rows)
        updates.collect()
        v = snap.upsert_snapshot(spark, tdir, updates, ["k"], cdc=True)
        emitted = []
        t0 = time.perf_counter()
        feed = snap.read_snapshot_stream(spark, tdir, starting_version=v)
        q = (
            feed.writeStream.foreachBatch(
                lambda df, _b: emitted.append(df.count())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        dt = time.perf_counter() - t0
        m = snap.read_manifest(tdir, v)
        return {
            "table_rows": rows,
            "cdc_files": len(m.get("cdc_files", [])),
            "rows_emitted": int(sum(emitted)),
            "drain_sec": round(dt, 3),
        }
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def dv_leg(spark, mult: int) -> dict:
    """Write amplification of the same narrow merge under the two write
    paths: copy-on-write rewrites every touched file whole; merge-on-read
    (dv=True) writes the position sidecar + the batch itself. The
    BYTES-WRITTEN ratio is the deletion-vector economics claim measured
    — it widens linearly with file size, so at production file sizes
    (~1 GB) the observed ratio scales to ~1000x."""
    rows = BASE_ROWS * mult
    out = {}
    for mode in ("rewrite", "dv"):
        tdir = build(spark, rows, clustered=True)
        try:
            updates = narrow_update(spark, rows)
            updates.collect()
            t0 = time.perf_counter()
            v = snap.upsert_snapshot(
                spark, tdir, updates, ["k"], dv=(mode == "dv")
            )
            dt = time.perf_counter() - t0
            m = snap.read_manifest(tdir, v)
            parent = snap.read_manifest(tdir, v - 1)
            new_files = [f for f in m["files"] if f not in set(parent["files"])]
            parent_dv = {
                p
                for e in (parent.get("file_dvs") or {}).values()
                for p in e["paths"]
            }
            new_sidecars = sorted(
                {
                    p
                    for e in (m.get("file_dvs") or {}).values()
                    for p in e["paths"]
                }
                - parent_dv
            )
            data_bytes = sum(
                os.path.getsize(os.path.join(tdir, f)) for f in new_files
            )
            sidecar_bytes = sum(
                os.path.getsize(os.path.join(tdir, p)) for p in new_sidecars
            )
            out[mode] = {
                "rows": rows,
                "files_rewritten": len(m["rewrote"]),
                "new_data_files": len(new_files),
                "bytes_written": data_bytes + sidecar_bytes,
                "merge_sec": round(dt, 3),
            }
        finally:
            shutil.rmtree(tdir, ignore_errors=True)
    out["bytes_ratio"] = round(
        out["rewrite"]["bytes_written"] / max(out["dv"]["bytes_written"], 1), 1
    )
    return out


def join_view_leg(spark, mult: int) -> dict:
    """Change-proportional JOIN-view refresh: after the one-time full
    materialization, a narrow source commit's refresh cost must stay
    ~flat while the fact table grows 16x — the delta joins the pruned
    partner slice, never the tables (maintain_join_view)."""
    rows = BASE_ROWS * mult
    a_dir = build(spark, rows, clustered=True)
    b_dir = tempfile.mkdtemp(prefix="rbrs_jvbench_b_")
    v_dir = tempfile.mkdtemp(prefix="rbrs_jvbench_v_")
    try:
        # dimension: 1000 keys the fact's low range joins against
        snap.write_snapshot(
            spark.range(0, 1000).select(
                F.col("id").alias("bid"), F.col("id").alias("bk"),
                F.md5(F.col("id").cast("string")).alias("tag"),
            ),
            b_dir, cluster_by=["bid"], n_files=2,
        )
        from ray_beam_runner_spark.sources.snapshots import maintain_join_view

        t0 = time.perf_counter()
        maintain_join_view(spark, v_dir, a_dir, b_dir, ("k", "bk"), "k", "bid")
        init_dt = time.perf_counter() - t0
        updates = narrow_update(spark, rows)
        updates.collect()
        snap.upsert_snapshot(spark, a_dir, updates, ["k"])
        t0 = time.perf_counter()
        maintain_join_view(spark, v_dir, a_dir, b_dir, ("k", "bk"), "k", "bid")
        refresh_dt = time.perf_counter() - t0
        return {
            "fact_rows": rows,
            "init_sec": round(init_dt, 2),
            "refresh_sec": round(refresh_dt, 2),
        }
    finally:
        shutil.rmtree(a_dir, ignore_errors=True)
        shutil.rmtree(b_dir, ignore_errors=True)
        shutil.rmtree(v_dir, ignore_errors=True)


CORPUS_BASE_DOCS = 20_000


def _corpus_docs(spark, lo: int, hi: int, salt: str):
    """Deterministic pseudo-docs: 8 hash-word tokens; every 10th doc
    repeats its neighbor's text so exact dedup has real survivors."""
    base = F.when(
        F.col("id") % 10 == 9, F.col("id") - 1
    ).otherwise(F.col("id"))
    words = [
        F.substring(F.md5(F.concat(base.cast("string"), F.lit(f":{salt}:{i}"))), 1, 6)
        for i in range(8)
    ]
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("string").alias("source"),
        F.concat_ws(" ", *words).alias("text"),
    )


def corpus_leg(spark, mult: int) -> dict:
    """End-to-end refresh cost of the COMPOSED corpus pipeline
    (corpus.py: source CDC -> dedup/quality state -> aggregate IVM +
    token index + ANN index) vs corpus size: after the one-time
    materialization, a constant-size mixed batch (400 inserts, 200
    updates, 100 deletes incl. dedup survivors forcing re-election)
    must refresh the whole cascade in ~flat time while the corpus
    grows 16x — every stage reads deltas, probes the standing tables
    by key/fingerprint, and MERGEs file-pruned."""
    from ray_beam_runner_spark import corpus

    rows = CORPUS_BASE_DOCS * mult
    src = tempfile.mkdtemp(prefix="rbrs_corpbench_src_")
    state = tempfile.mkdtemp(prefix="rbrs_corpbench_state_")
    work = tempfile.mkdtemp(prefix="rbrs_corpbench_work_")
    try:
        snap.write_snapshot(
            _corpus_docs(spark, 0, rows, "v0"), src,
            cluster_by=["doc_id"], n_files=max(2, rows // 40_000),
        )
        t0 = time.perf_counter()
        corpus.refresh_corpus_state(spark, src, state, quality_min=0.0)
        layout = corpus.init_corpus_views(spark, state, work)
        init_dt = time.perf_counter() - t0
        # constant-size mixed batch regardless of corpus size
        ups = _corpus_docs(spark, 1000, 1200, "v1").unionByName(
            _corpus_docs(spark, rows, rows + 400, "v0")
        )
        dels = spark.range(2000, 2100).select(F.col("id").alias("doc_id"))
        ups.collect()
        snap.upsert_snapshot(
            spark, src, ups, ["doc_id"], delete_keys_df=dels, cdc=True
        )
        t0 = time.perf_counter()
        corpus.refresh_corpus_state(spark, src, state, quality_min=0.0)
        corpus.drain_corpus_views(spark, layout)
        refresh_dt = time.perf_counter() - t0
        return {
            "corpus_rows": rows,
            "init_sec": round(init_dt, 2),
            "refresh_sec": round(refresh_dt, 2),
        }
    finally:
        for d in (src, state, work):
            shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", default="all", help="comma list or 'all'")
    ap.add_argument("--out", default=None, help="merge results into this JSON file")
    args = ap.parse_args()
    want = None if args.legs == "all" else set(args.legs.split(","))

    def on(name: str) -> bool:
        return want is None or name in want

    spark = get_spark("bench_snapshots")
    out = {}
    if args.out and os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)
    if on("merge"):
        out["clustered"] = {
            f"x{m}": leg(spark, m, clustered=True) for m in (1, 4, 16)
        }
        out["control_unclustered"] = {"x16": leg(spark, 16, clustered=False)}
    if on("feed"):
        out["change_feed"] = {f"x{m}": feed_leg(spark, m) for m in (1, 4, 16)}
    if on("dv"):
        out["dv_merge_x16"] = dv_leg(spark, 16)
    if on("join_view"):
        out["join_view"] = {
            "x1": join_view_leg(spark, 1),
            "x16": join_view_leg(spark, 16),
        }
    if on("corpus"):
        out["corpus_pipeline"] = {
            "x1": corpus_leg(spark, 1),
            "x16": corpus_leg(spark, 16),
        }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
