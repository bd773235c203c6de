"""Per-JOB wall breakdown for one query via the Spark event log
(guide §1: measure where the time goes — per job, not per query).
Runs each named query once (after one warm run of the SAME query when
--warm), with spark.eventLog.enabled, then parses the event log:
job id, submission→completion wall, task time, and the call site
(spark.jobGroup / description when set, else the job's first stage
name). Prints jobs in submission order so the commit protocol's
action sequence is readable.

Usage: python scripts/joblog.py q_name [q_name ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ray_beam_runner_spark import get_spark
from ray_beam_runner_spark.queries import QUERIES


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = tempfile.mkdtemp(prefix="rbrs_evlog_")
    spark = get_spark(
        "joblog",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "4")),
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.constraintPropagation.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    from ray_beam_runner_spark.caches import release_tracked

    for name in names:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        len(fn(spark, sf_dir).toPandas())
        warm_dt = time.perf_counter() - t0
        release_tracked()
        spark.catalog.clearCache()
        marker = spark.sparkContext.parallelize([1], 1)
        spark.sparkContext.setJobDescription(f"__marker_start_{name}")
        marker.count()
        spark.sparkContext.setJobDescription(None)
        t0 = time.perf_counter()
        len(fn(spark, sf_dir).toPandas())
        dt = time.perf_counter() - t0
        release_tracked()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"__marker_end_{name}")
        marker.count()
        spark.sparkContext.setJobDescription(None)
        print(f"\n=== {name}: warm {warm_dt:.2f}s, measured {dt:.2f}s ===")
        sys.stdout.flush()

    # flush the event log
    app_id = spark.sparkContext.applicationId
    spark.stop()
    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):
        cands = [os.path.join(evdir, f) for f in os.listdir(evdir)]
        path = max(cands, key=os.path.getmtime)
    if os.path.isdir(path):  # Spark 4 rolling event log: a directory
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("events_")
        )
    else:
        files = [path]
    lines = []
    for fp in files:
        with open(fp) as f:
            lines.extend(f)
    jobs = {}
    stage_names = {}
    if True:
        for line in lines:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                desc = props.get("spark.job.description") or ""
                sids = ev.get("Stage IDs", [])
                jobs[jid] = {
                    "t0": ev["Submission Time"],
                    "desc": desc,
                    "stages": sids,
                    "t1": None,
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                stage_names[si["Stage ID"]] = si.get("Details", "").split("\n")
    # slice per query between markers, print
    order = sorted(jobs)
    cur = None
    prev_end = None
    tot_job = tot_gap = 0.0
    for jid in order:
        j = jobs[jid]
        d = j["desc"]
        if d.startswith("__marker_start_"):
            cur = d.replace("__marker_start_", "")
            prev_end = j["t1"]
            tot_job = tot_gap = 0.0
            print(f"\n--- jobs for {cur} ---")
            continue
        if d.startswith("__marker_end_"):
            if cur is not None and prev_end is not None:
                tot_gap += max(0.0, (j["t0"] - prev_end) / 1000.0)
            print(f"  TOTAL job wall {tot_job:.2f}s, driver gaps {tot_gap:.2f}s")
            cur = None
            continue
        if cur is None:
            continue
        dur = (j["t1"] - j["t0"]) / 1000.0 if j["t1"] else float("nan")
        gap = (
            max(0.0, (j["t0"] - prev_end) / 1000.0)
            if prev_end is not None
            else 0.0
        )
        prev_end = j["t1"] if j["t1"] else prev_end
        tot_job += dur if dur == dur else 0.0
        tot_gap += gap
        label = d.split("\n")[0][:48] if d else ""
        print(f"  job {jid:4d}  gap {gap:6.3f}s  run {dur:7.3f}s  {label}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
