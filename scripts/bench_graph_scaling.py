"""Scaling leg for the graph family (round 11): the iterative
keyed-join operators — connected components, PageRank, multi-source
BFS, weighted shortest paths — measured on the scaled trade graph
(.benchdata/x{N} replicas of orders x lineitem). Each op's cost is
rounds x (frontier-proportional joins); the number that generalizes to
a cluster is edges/s holding flat-to-rising as the graph grows 10-100x,
i.e. per-edge cost amortizing the same way the relational and sweep
legs do.

Usage: python scripts/bench_graph_scaling.py [--mults 1,10] [--out BENCH_GRAPH_SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".benchdata"
)


def _read(spark, data_dir: str, tbl: str):
    from ray_beam_runner_spark.session import read_parquet_normalized

    return read_parquet_normalized(spark, os.path.join(data_dir, f"{tbl}.parquet"))


def build_graph(spark, data_dir: str):
    """Customer-supplier trade graph of the leg: one edge per distinct
    (cust, supp) pair, weighted by min quantity."""
    from pyspark.sql import functions as F

    orders = _read(spark, data_dir, "orders")
    li = _read(spark, data_dir, "lineitem")
    edges = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
            F.col("l_quantity").cast("long").alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    n_edges = edges.count()
    return edges, n_edges


def time_ops(spark, edges, seeds) -> dict[str, float]:
    from ray_beam_runner_spark.functions.graph import (
        bfs_layers,
        connected_components,
        pagerank,
        shortest_paths,
    )

    out: dict[str, float] = {}

    def leg(name, fn):
        t0 = time.perf_counter()
        n = fn().count()
        out[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {out[name]}s ({n} rows)", file=sys.stderr)

    leg("connected_components", lambda: connected_components(edges, "src", "dst"))
    leg("pagerank_5it", lambda: pagerank(edges, "src", "dst", n_iter=5))
    leg("bfs_3hop", lambda: bfs_layers(
        edges, seeds, "src", "dst", "node", max_depth=3, undirected=True
    ))
    leg("sssp_3hop", lambda: shortest_paths(
        edges, seeds, "src", "dst", "w", "node", max_iters=3, undirected=True
    ))
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from ray_beam_runner_spark import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,10")
    ap.add_argument("--out", default="BENCH_GRAPH_SCALING.json")
    args = ap.parse_args()
    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    spark = get_spark("bench-graph-scaling")
    for mult in [int(m) for m in args.mults.split(",")]:
        data_dir = SRC if mult == 1 else os.path.join(ROOT, f"x{mult}")
        if mult != 1 and not os.path.exists(os.path.join(data_dir, ".done")):
            print(f"[x{mult}] missing {data_dir} — run bench_scaling.py first", file=sys.stderr)
            continue
        spark.conf.set("spark.sql.shuffle.partitions", str({1: 16, 10: 32}.get(mult, 64)))
        edges, n_edges = build_graph(spark, data_dir)
        seeds = (
            _read(spark, data_dir, "supplier") if os.path.exists(
                os.path.join(data_dir, "supplier.parquet")
            ) else _read(spark, SRC, "supplier")
        ).filter(F.col("s_suppkey") <= 3).select(
            F.concat(F.lit("s"), F.col("s_suppkey")).alias("node")
        )
        print(f"[x{mult}] {n_edges} edges", file=sys.stderr)
        timings = time_ops(spark, edges, seeds)
        edges.unpersist()
        results[f"x{mult}"] = {
            "edges": n_edges,
            "sec": timings,
            "edges_per_sec": {k: round(n_edges / v) for k, v in timings.items()},
        }
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
