"""Isolated re-measure of flagged extended-set movers (r14 verdict ask
#6: q_quality_classifier +20%, q_trigram_kn_logppl +45% in both r14
isolated runs, neither touched that round). Mirrors bench.py's
protocol for just the named queries: warm call, release tracked
persists, then the budgeted-min loop (>=3 runs, ~2s budget, cap 8).

Usage: python scripts/remeasure_movers.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ray_beam_runner_spark import get_spark
from ray_beam_runner_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT = ("q_quality_classifier", "q_trigram_kn_logppl")


def main():
    names = sys.argv[1:] or list(DEFAULT)
    spark = get_spark(app_name="remeasure_movers")
    try:
        from ray_beam_runner_spark.caches import release_tracked
    except Exception:  # noqa: BLE001
        release_tracked = lambda: None  # noqa: E731
    out = {}
    for name in names:
        fn = QUERIES[name]
        fn(spark, SF_DIR).collect()  # warm
        release_tracked()
        s, spent = [], 0.0
        while True:
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            dt = time.perf_counter() - t0
            s.append(dt)
            spent += dt
            if len(s) >= 3 and (spent >= 2.0 or len(s) >= 8 or s[0] >= 1.0 and len(s) >= 3):
                break
        out[name] = {"min_s": round(min(s), 4), "n": len(s)}
        release_tracked()
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
