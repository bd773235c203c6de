"""Isolated bench-protocol measurement of named queries: same session
confs as bench.py, warm once, then budgeted-min samples. Prints one JSON
line {name: {min, samples:[...]}}.

Usage: python scripts/measure_one.py q_name [q_name ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_RUNS
(default 4).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ray_beam_runner_spark import get_spark
from ray_beam_runner_spark.queries import QUERIES


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "4"))
    spark = get_spark(
        "measure_one",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "4")),
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.constraintPropagation.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "2m",
        },
    )
    from ray_beam_runner_spark.caches import release_tracked

    out = {}
    for name in names:
        fn = QUERIES[name]
        samples = []
        for i in range(runs + 1):
            t0 = time.perf_counter()
            len(fn(spark, sf_dir).toPandas())
            dt = time.perf_counter() - t0
            release_tracked()
            spark.catalog.clearCache()
            if i:  # first is warm-up
                samples.append(round(dt, 4))
        out[name] = {"min": min(samples), "samples": samples}
        print(f"# {name}: min={min(samples):.4f} {samples}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
