"""Phase-level wall-clock breakdown of q_ivfpq_incremental (guide §1:
time the phases, then optimize the expensive one). Mirrors the query
body with a timer around each lifecycle step, plus job counts.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ray_beam_runner_spark import get_spark
from ray_beam_runner_spark.queries import scratch_dir, t


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "profile_ivfpq_inc",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.constraintPropagation.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "2m",
        },
    )
    tracker = spark.sparkContext.statusTracker()

    from ray_beam_runner_spark.functions.clustering import (
        ivfpq_index,
        ivfpq_topk,
        stream_maintain_ivfpq,
    )
    from ray_beam_runner_spark.sources import snapshots as snap

    for it in range(2):
        marks: list[tuple[str, float, int]] = []
        t_last = time.perf_counter()
        j_last = len(tracker.getJobIdsForGroup(None))

        def mark(label: str) -> None:
            nonlocal t_last, j_last
            now = time.perf_counter()
            jobs = len(tracker.getJobIdsForGroup(None))
            marks.append((label, now - t_last, jobs - j_last))
            t_last, j_last = now, jobs

        emb = t(spark, sf_dir, "embeddings")
        initial = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") % 3 != 0)).select(
            "vec_id", "embedding"
        )
        arriving = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") % 3 == 0)).select(
            "vec_id", "embedding"
        )
        queries = emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        coarse, books, idx0 = ivfpq_index(
            initial, "vec_id", "embedding", n_cells=4, m=2, k=4, n_iter=1
        )
        mark("build_index_plan")
        coarse = coarse.localCheckpoint(eager=True)
        books = books.localCheckpoint(eager=True)
        mark("checkpoint_quantizer")
        src = scratch_dir("rbrs_annsrc_")
        idx = scratch_dir("rbrs_annidx_")
        ckpt = scratch_dir("rbrs_annckpt_")
        snap.write_snapshot(initial, src, cluster_by=["vec_id"], n_files=4)
        mark("write_src_snapshot")
        snap.write_snapshot(idx0, idx, cluster_by=["vec_id"], n_files=4)
        mark("write_idx_snapshot")

        def drain() -> None:
            feed = snap.read_snapshot_stream(spark, src, starting_version=2)
            q = stream_maintain_ivfpq(
                feed, idx, coarse, books, "vec_id", "embedding", ckpt
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError("drain exceeded 300s")

        snap.upsert_snapshot(spark, src, arriving, ["vec_id"], cdc=True)
        mark("upsert_arrivals")
        drain()
        mark("drain_1_merge")
        snap.delete_where(
            spark, src, (F.col("vec_id") % 7 == 0) & (F.col("vec_id") >= 8), cdc=True
        )
        mark("delete_where")
        drain()
        mark("drain_2_retract")
        index = snap.read_snapshot(spark, idx)
        out = ivfpq_topk(queries, coarse, books, index, k=5)
        n = len(out.toPandas())
        mark("final_topk")
        print(f"\n--- iteration {it} (rows={n}) ---")
        for label, dt, jobs in marks:
            print(f"  {label:22s} {dt:7.3f}s  jobs={jobs}")
        print(f"  TOTAL                  {sum(m[1] for m in marks):7.3f}s  jobs={sum(m[2] for m in marks)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
