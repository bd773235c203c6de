"""Skew-resilience leg: a large-large join with one pathological hot key,
at a scale where production AQE defaults genuinely fire.

Real corpora are power-law distributed — one document id, user id, or
order key can own a double-digit percentage of a join's rows, and at
100 TB the task holding that key is the stage's straggler. This leg
measures the engine's answer (AQE skew-join splitting, on in
ray_beam_runner_spark.session by default) instead of asserting it:

1. Builds a skewed replica of the x1000 scaling leg's lineitem
   (~600 M rows, ~15 GB): 10% of all lineitems are remapped to ONE hot
   orderkey (a ~2.5 GB shuffle partition — far beyond the 256 MB
   production-default `skewedPartitionThresholdInBytes`, so NO
   thresholds are hand-tuned for the demo), the rest keep their
   original key distribution. orders (~150 M rows) is hard-linked
   unchanged.
2. Times the canonical fact-fact join (lineitem ⨝ orders on orderkey,
   group by status) three ways on the SAME files:
   - DuckDB (the BASELINE.md engine, warm-cache protocol),
   - Spark with AQE skew-join splitting ON (the shipped session conf),
   - Spark with skew-join splitting OFF (the straggler control: one
     task sorts the whole hot partition).
   Broadcast is disabled for both Spark runs so the measurement is the
   shuffle-join path the hot key actually stresses at cluster scale —
   at 100 TB neither fact side broadcasts.
3. Records whether the AQE run's executed plan actually marked the
   join skewed (``skew=true``), and — the number that actually
   generalizes to a cluster — the PER-TASK duration spread of each
   run's heaviest stage, read from the Spark status REST API. On a
   1000-executor cluster a stage finishes when its LONGEST task does;
   every other core idles behind the straggler, so max-task vs
   median-task IS the stage's skew cost. local[32] wall-clock cannot
   show that cost (the 31 "idle" cores here share one memory bus and
   one spill disk with the straggler, so the un-split control loses
   nothing by queueing behind it, while the split pays duplicated
   shuffle reads against the same saturated disk) — which is why the
   task-time distribution, not elapsed seconds, is the reported
   evidence.

Usage: python scripts/bench_skew.py [--out BENCH_SKEW.json]
Requires .benchdata/x1000 (scripts/bench_scaling.py --mults 1000).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".benchdata")
BASE = os.path.join(ROOT, "x1000")
SKEW_DIR = os.path.join(ROOT, "x1000_skew")
HOT_FRACTION = 1  # 1/10 of lineitem rows funnel to one orderkey

SQL = """
SELECT o_orderstatus,
       count(*) AS cnt,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def _parts(path: str) -> list[str]:
    """Part files of a table path (directory-table or single file)."""
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        )
    return [path]


def _glob(path: str) -> str:
    return f"{path}/*.parquet" if os.path.isdir(path) else path


def build_skewed() -> str:
    import duckdb

    done = os.path.join(SKEW_DIR, ".done")
    if os.path.exists(done):
        return SKEW_DIR
    if not os.path.exists(os.path.join(BASE, ".done")):
        raise SystemExit("build .benchdata/x1000 first (scripts/bench_scaling.py --mults 1000)")
    os.makedirs(SKEW_DIR, exist_ok=True)
    con = duckdb.connect()
    hot = con.execute(
        f"SELECT min(o_orderkey) FROM read_parquet('{_glob(f'{BASE}/orders.parquet')}')"
    ).fetchone()[0]
    li_parts = _parts(f"{BASE}/lineitem.parquet")
    cols = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{li_parts[0]}')"
        ).fetchall()
    ]
    sel = ", ".join(
        f"CASE WHEN hash(l_orderkey * 31 + l_linenumber) % 10 < {HOT_FRACTION} "
        f"THEN {hot} ELSE l_orderkey END AS l_orderkey"
        if c == "l_orderkey"
        else c
        for c in cols
    )
    # per-part rewrite: bounded memory, same multi-file layout
    li_out = os.path.join(SKEW_DIR, "lineitem.parquet")
    os.makedirs(li_out, exist_ok=True)
    for i, part in enumerate(li_parts):
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{part}')) "
            f"TO '{li_out}/part-{i:04d}.parquet' (FORMAT PARQUET)"
        )
    o_out = os.path.join(SKEW_DIR, "orders.parquet")
    o_parts = _parts(f"{BASE}/orders.parquet")
    if len(o_parts) == 1 and not os.path.isdir(f"{BASE}/orders.parquet"):
        if not os.path.exists(o_out):
            os.link(o_parts[0], o_out)
    else:
        os.makedirs(o_out, exist_ok=True)
        for i, part in enumerate(o_parts):
            dst = os.path.join(o_out, f"part-{i:04d}.parquet")
            if not os.path.exists(dst):
                os.link(part, dst)
    open(done, "w").close()
    return SKEW_DIR


def time_duckdb(data_dir: str) -> float:
    import duckdb

    con = duckdb.connect()
    for tbl in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{_glob(f'{data_dir}/{tbl}.parquet')}')"
        )
    con.execute(SQL).df()  # warm
    t0 = time.perf_counter()
    con.execute(SQL).df()
    return round(time.perf_counter() - t0, 4)


def _rest(spark, path: str):
    """Spark status REST API (the UI is enabled for this bench only)."""
    import urllib.request

    app = spark.sparkContext.applicationId
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def _task_spread(spark, before_ids: set[int]) -> dict:
    """Max / median / total task duration of the heaviest stage run
    since ``before_ids`` — the straggler measurement: on a cluster the
    stage's elapsed time is its max task, so bounding max/p50 is
    exactly what AQE's skew split buys."""
    stages = [
        s
        for s in _rest(spark, "/stages?status=complete")
        if s["stageId"] not in before_ids
    ]
    heavy = max(stages, key=lambda s: s.get("executorRunTime", 0))
    q = _rest(
        spark,
        f"/stages/{heavy['stageId']}/{heavy['attemptId']}/taskSummary"
        "?quantiles=0.5,1.0",
    )
    p50_ms, max_ms = q["duration"]
    return {
        "stage": heavy["name"].split("\n")[0],
        "num_tasks": heavy["numCompleteTasks"],
        "task_p50_s": round(p50_ms / 1000, 2),
        "task_max_s": round(max_ms / 1000, 2),
        "max_over_p50": round(max_ms / max(p50_ms, 1.0), 1),
        "stage_cpu_s": round(heavy["executorRunTime"] / 1000, 1),
    }


def time_spark(data_dir: str, skew_join: bool) -> tuple[float, bool, dict]:
    from ray_beam_runner_spark import get_spark

    # UI on: the status REST API is the per-task duration source
    spark = get_spark("bench-skew", extra_conf={"spark.ui.enabled": "true"})
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_join).lower())
    # force the shuffle-join path: at 100 TB neither fact side broadcasts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    for tbl in ("lineitem", "orders"):
        spark.read.parquet(f"{data_dir}/{tbl}.parquet").createOrReplaceTempView(tbl)
    before = {s["stageId"] for s in _rest(spark, "/stages")}
    df = spark.sql(SQL)
    t0 = time.perf_counter()
    df.toPandas()
    elapsed = round(time.perf_counter() - t0, 4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    spread = _task_spread(spark, before)
    spark.catalog.dropTempView("lineitem")
    spark.catalog.dropTempView("orders")
    return elapsed, "skew=true" in plan, spread


def time_spj_skew(data_dir: str) -> dict:
    """Hot-key BUCKETED-layout leg (round-13 verdict ask #4). AQE's
    skew-join splitting re-plans the exchange; an exchange-free
    storage-partitioned join has no exchange to re-plan, so the hot
    key's bucket is ONE unsplittable task — the single skew class the
    layout makes worse. This measures that cost on the same skewed
    x1000 data as the shuffle legs, then the escape hatch:
    ``skew_fallback_rows`` reads the manifests' per-bucket row counts,
    detects the hot bucket, and reverts to the shuffle+AQE path. The
    per-task duration spread is the cluster-relevant evidence (module
    doc: a stage ends when its LONGEST task does)."""
    from pyspark.sql import functions as F

    from ray_beam_runner_spark import get_spark
    from ray_beam_runner_spark.plans.explain import count_exchanges
    from ray_beam_runner_spark.sources import bucketed as bkt

    spark = get_spark("bench-skew", extra_conf={"spark.ui.enabled": "true"})
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    base = os.path.join(SKEW_DIR, "_spj")
    li_dir = os.path.join(base, "lineitem")
    ord_dir = os.path.join(base, "orders")
    n_buckets = 64
    t0 = time.perf_counter()
    if not os.path.exists(li_dir):
        bkt.write_bucketed(
            spark.read.parquet(f"{data_dir}/lineitem.parquet").select(
                "l_orderkey", "l_extendedprice", "l_discount"
            ),
            li_dir, ["l_orderkey"], n_buckets,
        )
        bkt.write_bucketed(
            spark.read.parquet(f"{data_dir}/orders.parquet").select(
                "o_orderkey", "o_orderstatus"
            ),
            ord_dir, ["o_orderkey"], n_buckets,
        )
    build_s = round(time.perf_counter() - t0, 3)
    from ray_beam_runner_spark.sources import snapshots as snap

    m = snap.read_manifest(li_dir, 1)
    rows_map = m.get("file_rows") or {}
    avg_rows = int(sum(rows_map.values()) / max(len(rows_map), 1))
    hot_rows = bkt._max_bucket_rows(li_dir)
    threshold = 4 * avg_rows  # a bucket 4x the mean is a straggler

    def q(**kw):
        j = bkt.storage_partitioned_join(
            spark, li_dir, ord_dir, "l_orderkey", **kw
        )
        return (
            j.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("rev"),
            )
            .orderBy("o_orderstatus")
        )

    legs: dict[str, dict] = {}
    for label, kw in (
        # as-is = the layout with skew handling PINNED OFF (r15 made
        # "auto" the default, so the unprotected plan needs explicit None)
        ("spj_hot_bucket", {"skew_fallback_rows": None}),
        ("spj_skew_fallback", {"skew_fallback_rows": threshold, "skew_mode": "fallback"}),
        # bucket-subset split: cold buckets stay exchange-free, only the
        # hot bucket's files shuffle (AQE splits that one partition)
        ("spj_hybrid", {"skew_fallback_rows": threshold, "skew_mode": "hybrid"}),
        # the r15 DEFAULT: skew_fallback_rows="auto" derives the
        # threshold from the manifests (4x each side's own mean) — a
        # deployment gets the hybrid remedy with zero call-site opt-in
        ("spj_default_auto", {}),
    ):
        before = {s["stageId"] for s in _rest(spark, "/stages")}
        df = q(**kw)
        n_exch = count_exchanges(df)
        t0 = time.perf_counter()
        df.toPandas()
        elapsed = round(time.perf_counter() - t0, 4)
        plan = df._jdf.queryExecution().executedPlan().toString()
        legs[label] = {
            "elapsed_s": elapsed,
            "plan_exchanges": n_exch,
            "aqe_marked_skew": "skew=true" in plan,
            "tasks": _task_spread(spark, before),
        }
        print(f"[spj-skew] {label} {elapsed}s", file=sys.stderr)
    return {
        "n_buckets": n_buckets,
        "bucketed_build_s": build_s,
        "avg_bucket_rows": avg_rows,
        "hot_bucket_rows": hot_rows,
        "fallback_threshold_rows": threshold,
        **legs,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_SKEW.json")
    args = ap.parse_args()
    data_dir = build_skewed()
    duck = time_duckdb(data_dir)
    # single timed run per mode (symmetric protocol; the page cache is
    # warm from DuckDB's two passes over the same files, and the
    # straggler control's giant single-task sort spills tens of GB —
    # repeating it risks filling the disk for no protocol value)
    with_skew, fired, spread_on = time_spark(data_dir, skew_join=True)
    without_skew, _, spread_off = time_spark(data_dir, skew_join=False)
    spj = time_spj_skew(data_dir)
    out = {
        "leg": "x1000_skew",
        "rows_lineitem": "~600M",
        "hot_key_row_share": HOT_FRACTION / 10,
        "duckdb": duck,
        "spark_skewjoin_on": with_skew,
        "spark_skewjoin_off": without_skew,
        "aqe_marked_skew": fired,
        # the cluster-relevant evidence: a stage ends when its LONGEST
        # task does, so max-task (and max/p50) is the straggler cost
        # the split bounds; local wall-clock shares one disk/membus
        # across all 32 threads and cannot show it (see module doc)
        "tasks_skewjoin_on": spread_on,
        "tasks_skewjoin_off": spread_off,
        # hot-key bucketed layout vs its fallback heuristic (round-14)
        "bucketed_spj": spj,
    }
    print(json.dumps(out), flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
