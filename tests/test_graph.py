"""Connected-components tests: adversarial graph shapes (path graphs are
the worst case for star-contraction), cluster assignment semantics."""

import pytest
from pyspark.sql import functions as F

from ray_beam_runner_spark.functions.graph import connected_components, dedup_clusters


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "d1 long, d2 long")
    return {(r.node, r.component) for r in connected_components(df).collect()}


def test_cc_path_graph(spark):
    # chains maximize round count for star contraction
    assert _cc(spark, [(0, 1), (1, 2), (2, 3), (3, 4)]) == {(i, 0) for i in range(5)}


def test_cc_mixed_components(spark):
    got = _cc(spark, [(5, 4), (4, 3), (9, 8), (8, 9), (3, 5)])
    assert got == {(3, 3), (4, 3), (5, 3), (8, 8), (9, 8)}


def test_cc_star_triangle_edge(spark):
    got = _cc(
        spark,
        [(10, 11), (10, 12), (10, 13), (20, 21), (21, 22), (20, 22), (30, 31)],
    )
    assert got == {
        (10, 10), (11, 10), (12, 10), (13, 10),
        (20, 20), (21, 20), (22, 20),
        (30, 30), (31, 30),
    }


def test_cc_long_chain_converges(spark):
    n0, n1 = 100, 150
    got = _cc(spark, [(i, i + 1) for i in range(n0, n1 - 1)])
    assert got == {(i, n0) for i in range(n0, n1)}


def test_dedup_clusters_singletons_and_survivors(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "d1 long, d2 long")
    rows = {r.doc_id: (r.cluster, r.is_survivor) for r in dedup_clusters(docs, pairs).collect()}
    assert rows == {
        0: (0, True), 3: (0, False), 5: (0, False),  # one component, min survives
        1: (1, True), 2: (2, True), 4: (4, True),    # untouched docs are singletons
    }


def test_pagerank_path_graph_matches_hand_iteration(spark):
    import pytest as _pt

    from ray_beam_runner_spark.functions.graph import pagerank

    # undirected path a-b-c: degrees 1,2,1; N=3, d=0.85, uniform start
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], "s string, t string")
    got = {r.node: r.rank for r in pagerank(edges, "s", "t", n_iter=2).collect()}

    def step(r):
        base = 0.15 / 3
        return {
            "a": base + 0.85 * (r["b"] / 2),
            "b": base + 0.85 * (r["a"] / 1 + r["c"] / 1),
            "c": base + 0.85 * (r["b"] / 2),
        }

    exp = step(step({k: 1 / 3 for k in "abc"}))
    for k in "abc":
        assert got[k] == _pt.approx(exp[k], abs=1e-12)
    # symmetry: a and c are graph-isomorphic, ranks identical
    assert got["a"] == _pt.approx(got["c"], abs=1e-15)
    # probability mass is conserved (no dangling leakage when symmetrized)
    assert sum(got.values()) == _pt.approx(1.0, abs=1e-9)


def test_pagerank_directed_mode_and_duplicate_edges(spark):
    from ray_beam_runner_spark.functions.graph import pagerank

    # duplicate edges collapse (distinct); directed mode keeps direction
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "a")], "s string, t string"
    )
    got = {r.node: r.rank
           for r in pagerank(edges, "s", "t", n_iter=5, undirected=False).collect()}
    # a<->b two-cycle: symmetric stationary ranks 0.5/0.5
    assert abs(got["a"] - 0.5) < 1e-9 and abs(got["b"] - 0.5) < 1e-9


def test_pagerank_empty_edges_returns_empty(spark):
    from ray_beam_runner_spark.functions.graph import pagerank

    empty = spark.createDataFrame([], "s string, t string")
    out = pagerank(empty, "s", "t", n_iter=3)
    assert out.columns == ["node", "rank"] and out.count() == 0


def test_pagerank_convergence_matches_fixed_iteration(spark):
    # tol-mode must equal a fixed-iteration run of the same depth, stop
    # early once the L1 delta drops below tol, and conserve rank mass
    from ray_beam_runner_spark.functions.graph import pagerank

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3), (4, 0)], "s long, d long"
    )
    # huge tol: stops after exactly one round == fixed n_iter=1
    one = {r.node: r.rank for r in pagerank(edges, "s", "d", n_iter=1).collect()}
    early = {
        r.node: r.rank
        for r in pagerank(edges, "s", "d", n_iter=50, tol=10.0).collect()
    }
    assert early == pytest.approx(one)
    # tight tol: converged ranks match a deep fixed run and sum to 1
    conv = {
        r.node: r.rank
        for r in pagerank(edges, "s", "d", n_iter=60, tol=1e-10).collect()
    }
    deep = {r.node: r.rank for r in pagerank(edges, "s", "d", n_iter=40).collect()}
    assert conv == pytest.approx(deep, abs=1e-8)
    assert sum(conv.values()) == pytest.approx(1.0, abs=1e-9)


def test_triangle_count_known_graphs(spark):
    from ray_beam_runner_spark.functions.graph import triangle_count

    # K4: 4 triangles, every node in 3; plus a pendant edge (no effect)
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(3, 9)]
    edges = spark.createDataFrame(k4, "u long, v long")
    got = {r.node: r.triangles for r in triangle_count(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # triangle-free graph (path): empty result
    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "u long, v long")
    assert triangle_count(path).count() == 0
    # duplicate + reversed edges collapse to the same canonical set
    dup = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (0, 1)], "u long, v long"
    )
    got = {r.node: r.triangles for r in triangle_count(dup).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_triangle_count_matches_bruteforce(spark):
    # deterministic pseudo-random graph vs an independent Python count
    import hashlib
    from itertools import combinations

    from ray_beam_runner_spark.functions.graph import triangle_count

    n = 40
    edges = [
        (a, b)
        for a, b in combinations(range(n), 2)
        if int(hashlib.md5(f"tg:{a}:{b}".encode()).hexdigest()[:8], 16) % 4 == 0
    ]
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expect: dict[int, int] = {}
    for a, b, c in combinations(range(n), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for x in (a, b, c):
                expect[x] = expect.get(x, 0) + 1
    got = {
        r.node: r.triangles
        for r in triangle_count(
            spark.createDataFrame(edges, "u long, v long")
        ).collect()
    }
    assert got == expect


def test_bfs_layers_directed_min_hops(spark):
    from ray_beam_runner_spark.functions.graph import bfs_layers

    # 0->1->2->3->4 plus shortcut 0->3; 9 unreachable; 4 has no out-edges
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3), (9, 0)], "src int, dst int"
    )
    seeds = spark.createDataFrame([(0,)], "node int")
    out = {r.node: r.hops for r in bfs_layers(edges, seeds, max_depth=10).collect()}
    # shortcut wins: 3 settles at hop 1, 4 at hop 2; 9 not reached (directed)
    assert out == {0: 0, 1: 1, 3: 1, 2: 2, 4: 2}


def test_bfs_layers_undirected_depth_bound_and_multi_seed(spark):
    from ray_beam_runner_spark.functions.graph import bfs_layers

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (9, 0)], "src int, dst int"
    )
    seeds = spark.createDataFrame([(2,), (9,)], "node int")
    out = {
        r.node: r.hops
        for r in bfs_layers(
            edges, seeds, max_depth=1, undirected=True
        ).collect()
    }
    # depth bound cuts the walk after ring 1; both seeds at 0; min over seeds
    assert out == {2: 0, 9: 0, 1: 1, 3: 1, 0: 1}


def test_shortest_paths_equals_dijkstra(spark):
    """Frontier Bellman-Ford == driver-side Dijkstra on a small random
    weighted graph (deterministic edges), directed and undirected,
    including parallel edges (min wins) and an unreachable island."""
    import heapq

    from ray_beam_runner_spark.functions.graph import shortest_paths

    edges = []
    for i in range(30):
        edges.append((f"n{i}", f"n{(i * 7 + 3) % 30}", (i * 13) % 9 + 1))
        edges.append((f"n{i}", f"n{(i + 1) % 30}", (i * 5) % 7 + 1))
    edges.append(("n0", "n1", 100))  # parallel edge: min must win
    edges.append(("island_a", "island_b", 2))  # unreachable from seeds
    e = spark.createDataFrame(edges, "src string, dst string, w long")
    seeds = spark.createDataFrame([("n0",), ("n17",)], "node string")

    def dijkstra(adj, starts):
        dist = {s: 0 for s in starts}
        pq = [(0, s) for s in starts]
        heapq.heapify(pq)
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist.get(u, float("inf")):
                continue
            for v, w in adj.get(u, ()):
                nd = d + w
                if nd < dist.get(v, float("inf")):
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        return dist

    for undirected in (False, True):
        adj = {}
        for s, d, w in edges:
            adj.setdefault(s, []).append((d, w))
            if undirected:
                adj.setdefault(d, []).append((s, w))
        want = dijkstra(adj, ["n0", "n17"])
        got = {
            r.node: r.dist
            for r in shortest_paths(
                e, seeds, max_iters=40, undirected=undirected
            ).collect()
        }
        assert got == {k: float(v) for k, v in want.items()}, f"undirected={undirected}"
        assert "island_a" not in got

    # bounded-hop semantics: with max_iters=1 only direct neighbors appear
    one = {
        r.node: r.dist
        for r in shortest_paths(e, seeds, max_iters=1).collect()
    }
    direct = {"n0": 0.0, "n17": 0.0}
    for s, d, w in edges:
        if s in ("n0", "n17"):
            direct[d] = min(direct.get(d, float("inf")), float(w) + (0.0))
    assert one == direct

    # negative weights are loud
    import pytest

    neg = spark.createDataFrame([("a", "b", -1)], "src string, dst string, w long")
    with pytest.raises(ValueError, match="negative edge weight"):
        shortest_paths(neg, spark.createDataFrame([("a",)], "node string"))


def test_iteration_rounds_pay_one_action(spark):
    """r16 §10 regression pin: the iterative loops' lazy checkpoints mean
    each round launches ONE Spark job (the round's probe materializes the
    checkpoint) — the eager form paid 2 (CC) to 3 (BFS/SP) jobs/round."""
    from ray_beam_runner_spark.functions.graph import bfs_layers

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # 6-node path graph from seed 0: exactly 5 expansion rounds + the
    # empty 6th round = 6 frontier counts; plus 2 setup jobs (the edge
    # distinct persist materialization happens inside round-1's count,
    # so the budget is rounds + final collect + small slack)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    group = "jobcount_bfs"
    # AQE executes each exchange as its own job, which makes job counts
    # measure AQE internals instead of driver actions — pin it off for
    # the count (the bench/profile sessions run AQE off at this scale)
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup(group, group)
    try:
        got = {(r.node, r.hops) for r in bfs_layers(edges, seeds, max_depth=10).collect()}
    finally:
        sc.setJobGroup(None, None)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    assert got == {(i, i) for i in range(6)}
    n_jobs = len(tracker.getJobIdsForGroup(group))
    # Measured on the lazy-checkpoint form: 12 jobs = 6 per-round
    # frontier counts (round 6 is the empty exit) + per-round broadcast
    # builds at this tiny scale + the final collect. The eager form
    # paid 3 driver actions per round (frontier checkpoint, emptiness
    # probe, visited checkpoint) => ~23 jobs on this graph. The bound
    # sits midway: far above the lazy form's 12 (headroom for
    # engine-version/broadcast-count drift, r16 advice), still clearly
    # below the ~23 the eager regression would produce.
    assert n_jobs <= 17, f"bfs_layers launched {n_jobs} jobs for 6 rounds"
