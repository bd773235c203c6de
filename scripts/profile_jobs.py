"""Per-query job/stage profile (guide §1: find where the time goes
before touching anything). For each named query: wall seconds, number
of Spark JOBS launched (each job pays the ~0.1 s local scheduler
floor), number of stages, and total task time — so a 3 s query that
launches 25 jobs is diagnosed as floor-bound (fix: fewer actions
inside the operator) vs one 3 s job as compute/shuffle-bound (fix:
plan shape).

Usage: python scripts/profile_jobs.py [query ...]   (default: slowest
extended-set queries from the last BENCH_DETAIL)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
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
    spark = get_spark(
        "profile_jobs",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "4")),
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.constraintPropagation.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "2m",
        },
    )
    from ray_beam_runner_spark.caches import release_tracked

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out = {}
    for name in names:
        fn = QUERIES[name]
        # warm once (plan cache, page cache, JIT partially)
        len(fn(spark, sf_dir).toPandas())
        release_tracked()
        spark.catalog.clearCache()
        group = f"profile:{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        len(fn(spark, sf_dir).toPandas())
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        release_tracked()
        spark.catalog.clearCache()
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        for jid in job_ids:
            ji = tracker.getJobInfo(jid)
            if ji:
                n_stages += len(ji.stageIds)
        out[name] = {
            "wall_s": round(dt, 3),
            "n_jobs": len(job_ids),
            "n_stages": n_stages,
            "s_per_job": round(dt / max(len(job_ids), 1), 4),
        }
        print(f"{name:28s} {dt:7.3f}s  jobs={len(job_ids):3d}  stages={n_stages:4d}")
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
