"""Attribute Spark JOBS to package call sites (guide §1/§5: find the
driver actions before removing any). Wraps every DataFrame action —
collect/first/head/count/toPandas/foreach(Partition)/saveAsTable/
parquet-write — to record the deepest ray_beam_runner_spark stack frame
and the number of Spark jobs the action launched. Prints a per-call-site
job tally for each named query.

Usage: python scripts/profile_actions.py q_name [q_name ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import collections
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, DataFrameWriter

from ray_beam_runner_spark import get_spark
from ray_beam_runner_spark.queries import QUERIES

TALLY: collections.Counter = collections.Counter()
JOBS: collections.Counter = collections.Counter()
_tracker = None
_spark = None


def _site() -> str:
    stack = traceback.extract_stack()
    pkg_frames = [f for f in stack if "ray_beam_runner_spark" in f.filename]
    best = pkg_frames[-1] if pkg_frames else stack[-4]
    short = os.path.relpath(best.filename, "/root/repo")
    return f"{short}:{best.lineno} ({best.name})"


def _wrap(cls, name):
    orig = getattr(cls, name)

    def wrapped(self, *a, **k):
        before = len(_tracker.getJobIdsForGroup(None)) if _tracker else 0
        out = orig(self, *a, **k)
        after = len(_tracker.getJobIdsForGroup(None)) if _tracker else 0
        site = _site()
        TALLY[f"{name} @ {site}"] += 1
        JOBS[f"{name} @ {site}"] += max(after - before, 0)
        return out

    setattr(cls, name, wrapped)


def main() -> int:
    global _tracker, _spark
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "profile_actions",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "4")),
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.constraintPropagation.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "2m",
        },
    )
    _spark = spark
    _tracker = spark.sparkContext.statusTracker()
    # Spark 4: pyspark.sql.DataFrame is an ABC — instances are
    # pyspark.sql.classic.dataframe.DataFrame, whose own method
    # definitions shadow a wrapper installed on the base class. Wrap
    # the CLASSIC class (falling back to the base for older Sparks) or
    # every DataFrame action is silently missing from the profile.
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _ClassicDF
    except ImportError:
        _ClassicDF = DataFrame
    for m in (
        "collect", "count", "first", "head", "toPandas", "foreach",
        "foreachPartition", "localCheckpoint", "checkpoint", "isEmpty",
        "tail", "toLocalIterator",
    ):
        _wrap(_ClassicDF, m)
    for m in ("parquet", "save", "csv", "text", "json"):
        _wrap(DataFrameWriter, m)
    from pyspark.sql.session import SparkSession as _S

    _wrap(_S, "sql")

    from ray_beam_runner_spark.caches import release_tracked

    for qname in names:
        TALLY.clear()
        JOBS.clear()
        fn = QUERIES[qname]
        len(fn(spark, sf_dir).toPandas())
        release_tracked()
        spark.catalog.clearCache()
        print(f"\n=== {qname}: action call sites (calls / jobs) ===")
        for site, njobs in JOBS.most_common():
            print(f"  jobs={njobs:3d} calls={TALLY[site]:3d}  {site}")
        print(f"  TOTAL actions={sum(TALLY.values())} jobs={sum(JOBS.values())}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
