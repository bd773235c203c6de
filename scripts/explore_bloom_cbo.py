"""Round-16 experiment (verdict ask #2): quantify what engine-level
levers buy on the x100 family's un-rewritten multi-join shapes.

Variants, timed interleaved (min over timed sweeps, same session):
  base   — the family bench's tuned session as-is
  bloom  — runtime bloom-filter join injection UNSUPPRESSED: the stock
           applicationSideScanSizeThreshold (10 GB) silently disables
           injection on any scan below 10 GB, i.e. everywhere at x100
           (~1 GB lineitem); lowered so a dim-filtered join side can
           prune the fact scan before the shuffle
  cbo    — queries.enable_stats (ANALYZE'd catalog tables + cost-based
           join reordering)
  both   — bloom + cbo together

Also reports whether BloomFilterMightContain actually appears in each
query's optimized plan per variant, so "bloom fired" is a plan fact,
not an inference from timings.

Usage: python scripts/explore_bloom_cbo.py [--mult 100] [--queries q_a,q_b]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_tpch_scaling import TPCH_SET, ensure_dims, _tuned_session  # noqa: E402
from scripts.bench_scaling import build_scaled  # noqa: E402

BLOOM_CONFS = {
    # injection is ON by default but gated: the application (pruned)
    # side must scan >10 GB and the creation (filter-building) side
    # must be <10 MB. At bench scale both gates misfire; on a 100 TB
    # cluster the scan gate passes naturally and only the creation
    # bound matters.
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "64MB",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}

DEFAULT_QS = (
    "q_product_profit", "q_returned_items", "q_min_cost_supplier",
    "q_large_volume_customer", "q_local_supplier_volume",
    "q_order_exists", "q_waiting_supplier", "q_supplier_relationship",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--queries", default=",".join(DEFAULT_QS))
    ap.add_argument("--sweeps", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    qs = [q for q in args.queries.split(",") if q in TPCH_SET]

    data_dir = build_scaled(args.mult)
    ensure_dims(data_dir)

    from ray_beam_runner_spark import queries as Q

    spark = _tuned_session(data_dir, args.mult)
    base_bloom = {
        k: spark.conf.get(k, None) for k in BLOOM_CONFS
    }

    def set_bloom(on: bool) -> None:
        for k, v in BLOOM_CONFS.items():
            spark.conf.set(k, v if on else (base_bloom[k] or "10GB"))

    def set_cbo(on: bool) -> None:
        if on:
            Q.enable_stats(spark, data_dir)
        else:
            Q.disable_stats(spark, data_dir)
            if hasattr(spark, "_rbrs_tables"):
                spark._rbrs_tables.clear()

    variants = {
        "base": (False, False),
        "bloom": (True, False),
        "cbo": (False, True),
        "both": (True, True),
    }
    timings: dict[str, dict[str, float]] = {v: {} for v in variants}
    bloom_fired: dict[str, dict[str, bool]] = {v: {} for v in variants}

    for sweep in range(args.sweeps + 1):  # sweep 0 untimed warm-up
        for vname, (bloom, cbo) in variants.items():
            set_bloom(bloom)
            set_cbo(cbo)
            for name in qs:
                df = Q.QUERIES[name](spark, data_dir)
                if sweep == 0:
                    plan = df._jdf.queryExecution().optimizedPlan().toString()
                    bloom_fired[vname][name] = "bloom_filter" in plan.lower() or (
                        "BloomFilter" in plan
                    )
                t0 = time.perf_counter()
                len(df.toPandas())
                dt = round(time.perf_counter() - t0, 4)
                if sweep and (
                    name not in timings[vname] or dt < timings[vname][name]
                ):
                    timings[vname][name] = dt
        print(f"[sweep {sweep}] done", file=sys.stderr)
    set_bloom(False)
    set_cbo(False)

    out = {
        "mult": args.mult,
        "timings": timings,
        "bloom_fired": bloom_fired,
        "totals": {v: round(sum(t.values()), 3) for v, t in timings.items()},
    }
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
