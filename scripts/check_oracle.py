"""Run every declared query against its DuckDB oracle at a given sf.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ray_beam_runner_spark import get_spark
from ray_beam_runner_spark.plans.differential import compare
from ray_beam_runner_spark.queries import ORACLE, QUERIES


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    json_out = None
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            json_out = a.split("=", 1)[1]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    spark = get_spark("check_oracle")
    failures = 0
    results: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in ORACLE:
                ok, msg = compare(df, ORACLE[name], sf_dir)
            else:
                n = df.count()
                ok, msg = n >= 0, f"rows-only: {n} rows"
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION: {type(e).__name__}: {e}"
        dt = time.time() - t0
        status = "PASS" if ok else "FAIL"
        print(f"[{status}] {name:28s} {dt:6.2f}s  {msg}")
        results[name] = {"ok": ok, "sec": round(dt, 2), "msg": msg}
        failures += 0 if ok else 1
        # Release per-query tracked persists so one query's cached
        # frames never pressure its sweep NEIGHBORS' timings (measured:
        # the heavy lifecycle queries inflate adjacent queries 1.5-2.5x
        # without this) — each row then times an independent session
        # state, which is what makes sweep timings comparable across
        # rounds.
        try:
            from ray_beam_runner_spark.caches import release_tracked

            release_tracked()
        except Exception:  # noqa: BLE001
            pass
    print(f"\n{len(QUERIES) if not only else len(only)} queries, {failures} failures")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
