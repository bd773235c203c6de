"""Isolated routed-vs-plain measurement of single family queries — the
noise-controlled companion to bench_tpch_scaling's interleaved sweeps
(see BASELINE.md §18: leg-after-leg family sweeps drift 10-30% on this
box, enough to invert a 1.7x win).

For each named query: min-of-N plain, then min-of-N routed through
queries.route_query with the standard family layouts, same session,
back to back. Round-15 reference results on the x100 replica:
  q_order_count_dist   plain 1.122 s  routed 0.663 s  (exchanges 4->2)
  q_idle_rich_customers plain 0.931 s routed 0.747 s  (5->3)

Usage: python scripts/measure_routed_isolated.py [--mult 100] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_scaling import build_scaled  # noqa: E402
from scripts.bench_tpch_scaling import _tuned_session  # noqa: E402

DEFAULT = ("q_order_count_dist", "q_idle_rich_customers")
LAYOUT_SUBS = (
    ("lineitem", "lineitem"),
    ("lineitem", "lineitem_by_shipdate"),
    ("orders", "orders"),
    ("orders", "orders_by_orderdate"),
    ("orders", "orders_by_custkey"),
    ("customer", "customer_by_custkey"),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument(
        "--subs", default=None,
        help="comma-separated layout SUBDIR names to register (default: all "
        "of LAYOUT_SUBS); lets one run compare e.g. the key-sorted "
        "lineitem layout against the shipdate-sorted one",
    )
    ap.add_argument("queries", nargs="*", default=list(DEFAULT))
    args = ap.parse_args()
    if args.subs:
        wanted = set(args.subs.split(","))
        known = {s for _t, s in LAYOUT_SUBS}
        unknown = sorted(wanted - known)
        if unknown:
            raise SystemExit(
                f"unknown --subs entries {unknown}; valid: {sorted(known)}"
            )
        subs = [(t, s) for t, s in LAYOUT_SUBS if s in wanted]
    else:
        subs = list(LAYOUT_SUBS)

    from ray_beam_runner_spark import queries as Q
    from ray_beam_runner_spark.plans.explain import count_exchanges

    data_dir = build_scaled(args.mult)
    spark = _tuned_session(data_dir, args.mult)
    base = os.path.join(data_dir, "_spj_family")
    missing = [s for _t, s in subs if not os.path.exists(os.path.join(base, s))]
    if missing:
        raise SystemExit(
            f"layouts missing under {base}: {missing} — run "
            "bench_tpch_scaling once at this mult to build them"
        )

    def timed(fn):
        fn().toPandas()  # warm
        best = None
        for _ in range(args.runs):
            t0 = time.perf_counter()
            len(fn().toPandas())
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        return round(best, 3)

    out = {}
    for name in args.queries:
        plain = lambda: Q.QUERIES[name](spark, data_dir)  # noqa: B023
        res = {"plain_exch": count_exchanges(plain()), "plain_s": timed(plain)}
        for tbl, sub in subs:
            Q.register_layout(data_dir, tbl, os.path.join(base, sub))
        if hasattr(spark, "_rbrs_tables"):
            spark._rbrs_tables.clear()
        try:
            routed = lambda: Q.route_query(spark, data_dir, name)  # noqa: B023
            res["routed_exch"] = count_exchanges(routed())
            res["routed_s"] = timed(routed)
            # the layouts the router actually served (decision record;
            # read BEFORE clear_layouts wipes the memo)
            sel = Q._ROUTE_MEMO.get((os.path.abspath(data_dir), name), {})
            res["routed_layouts"] = sorted(
                os.path.basename(d) for d in sel.values()
            )
        finally:
            Q.clear_layouts()
            spark._rbrs_tables.clear()
        out[name] = res
        print(name, res, flush=True)
    print(json.dumps({"mult": args.mult, "results": out}))


if __name__ == "__main__":
    main()
