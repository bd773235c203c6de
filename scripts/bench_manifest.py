"""Manifest scalability bench (round-11 verdict ask #1): commit +
planning cost at 10^3 / 10^4 / 10^5 files, inline JSON manifests vs
tiered meta_format-2 shards.

Synthesizes manifests with realistic per-file metadata (min/max stats
for 3 columns, footer row counts, and 8192-bit bloom bitsets on 2
columns — 128 int64 words each, what a 100k-row file would carry) but
NO data files: commit and planning cost live entirely in the metadata
layer, which is exactly what this measures.

Four timings per scale, per format:
  commit_full   publish a manifest carrying every file (initial load)
  commit_incr   publish a child commit that touched 16 files — the
                steady-state MERGE shape. Inline re-serializes the
                whole table every commit; shards write one 16-row delta
                and reference the parent.
  plan_light    read_manifest + file list + stats + rows (the pruning
                path every read takes). Inline parses the full JSON
                including blooms; shards decode three light columns.
  plan_blooms   additionally decode the bloom column (point-lookup
                path only).
  probe_point   cold-driver point probe: read_manifest + blooms of 8
                stats-surviving candidate files. Shards answer via the
                rel-filtered selective read (round-13: O(candidates)
                bloom bytes); inline pays its full JSON parse.

Writes BENCH_MANIFEST.json and prints one JSON line.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ray_beam_runner_spark.sources import snapshots as snap  # noqa: E402

WORDS = 128  # 8192-bit bloom = 128 int64 words
BLOOM_COLS = ("v", "s")
STATS_COLS = ("k", "v", "ts")


def _meta(n):
    """Per-file metadata for n fabricated files. Bloom word lists share
    one object (memory), but every serialization pays full price."""
    words = [(i * 2654435761) % (1 << 63) for i in range(WORDS)]
    rels = [f"data/commit-{i // 512:08d}/part-{i % 512:05d}.parquet" for i in range(n)]
    stats = {r: {c: [i * 100, i * 100 + 99] for c in STATS_COLS} for i, r in enumerate(rels)}
    rows = {r: 100_000 for r in rels}
    blooms = {r: {c: words for c in BLOOM_COLS} for r in rels}
    return rels, stats, rows, blooms


def _manifest(version, parent, rels, stats, rows, blooms, **extra):
    m = {
        "version": version,
        "parent": parent,
        "files": list(rels),
        "op": "bench",
        "schema": ["k", "v", "s", "ts"],
        "schema_json": '{"type":"struct","fields":[]}',
        "bloom_conf": {"cols": list(BLOOM_COLS), "bits": WORDS * 64, "k": 3},
        "file_stats": stats,
        "file_rows": rows,
        "file_blooms": blooms,
    }
    m.update(extra)
    return m


def _bench_format(n, sharded):
    t = tempfile.mkdtemp(prefix=f"bm_{'s' if sharded else 'i'}_{n}_")
    try:
        rels, stats, rows, blooms = _meta(n)
        prop = {"meta_inline_max": 16} if sharded else {"meta_inline_max": 1 << 40}

        t0 = time.perf_counter()
        snap._publish(t, 1, _manifest(1, None, rels, stats, rows, blooms, **prop))
        commit_full = time.perf_counter() - t0

        # steady-state incremental commit: 16 files rewritten into 16
        m1 = snap.read_manifest(t, 1)
        touched, kept = rels[:16], rels[16:]
        new_rels = [f"data/commit-incr/part-{i:05d}.parquet" for i in range(16)]
        words = blooms[touched[0]][BLOOM_COLS[0]]
        new_stats = {**{r: stats[r] for r in kept}, **{r: stats[touched[0]] for r in new_rels}}
        new_rows = {**{r: rows[r] for r in kept}, **{r: 100_000 for r in new_rels}}
        new_bloom_delta = {r: {c: words for c in BLOOM_COLS} for r in new_rels}
        if isinstance(m1, snap._LazyManifest):
            new_blooms = snap._CarriedBlooms(m1, kept, new_bloom_delta)
        else:
            new_blooms = {**{r: blooms[r] for r in kept}, **new_bloom_delta}
        t0 = time.perf_counter()
        snap._publish(
            t, 2,
            _manifest(2, 1, [*kept, *new_rels], new_stats, new_rows, new_blooms),
        )
        commit_incr = time.perf_counter() - t0

        t0 = time.perf_counter()
        m = snap.read_manifest(t, 2)
        n_live = len(m["files"])
        _ = m.get("file_stats", {})
        _ = m.get("file_rows", {})
        plan_light = time.perf_counter() - t0
        assert n_live == n, (n_live, n)

        t0 = time.perf_counter()
        nb = len(m.get("file_blooms", {}))
        plan_blooms = time.perf_counter() - t0
        assert nb == n

        # probe_point: blooms of 8 stats-surviving candidate files, cold
        # driver (fresh manifest, shard cache cleared). The round-12 ask:
        # a point lookup must decode O(candidates) bloom bytes — the
        # rel-filtered shard read — not the whole bloom column. Inline
        # pays its full JSON parse by construction.
        cand = kept[:: max(1, len(kept) // 8)][:8]
        snap._SHARD_CACHE.clear()
        t0 = time.perf_counter()
        mp = snap.read_manifest(t, 2)
        if isinstance(mp, snap._LazyManifest):
            pb = mp.blooms_for(cand)
        else:
            fb = mp.get("file_blooms", {})
            pb = {r: fb[r] for r in cand if r in fb}
        probe_point = time.perf_counter() - t0
        assert len(pb) == len(cand)

        hdr_bytes = os.path.getsize(snap._manifest_path(t, 2))
        return {
            "commit_full_s": round(commit_full, 4),
            "commit_incr_s": round(commit_incr, 4),
            "plan_light_s": round(plan_light, 4),
            "plan_blooms_s": round(plan_blooms, 4),
            "probe_point_s": round(probe_point, 4),
            "header_bytes": hdr_bytes,
        }
    finally:
        shutil.rmtree(t, ignore_errors=True)


def main():
    scales = [1_000, 10_000, 100_000]
    out = {"metric": "manifest_scaling", "unit": "sec", "rows": []}
    for n in scales:
        row = {"n_files": n}
        for label, sharded in (("inline", False), ("shard", True)):
            r = _bench_format(n, sharded)
            row.update({f"{label}_{k}": v for k, v in r.items()})
            print(f"[{n}] {label}: {r}", file=sys.stderr)
        out["rows"].append(row)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_MANIFEST.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
