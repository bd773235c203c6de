"""Distributed connected components — dedup clustering.

A near-dup pipeline needs more than pairs: pairs form a graph whose
connected components are the duplicate CLUSTERS (keep one survivor per
component). The reference has no graph machinery at all; on Spark this is
the alternating large-star / small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014) — the standard
O(log n)-round, shuffle-keyed method that needs no driver-side graph:

- large-star: every node points its LARGER neighbors at its current
  minimum neighbor (or itself) — strictly decreases large labels.
- small-star: every node points its smaller-or-equal neighbors at the
  minimum — flattens stars.

Each round is two keyed aggregations (groupBy node -> min) + an edge
rewrite; convergence when the edge multiset stops changing, checked by a
cheap count+hash aggregate, not by collecting edges. Each round's
frontier is eagerly localCheckpoint-ed to truncate lineage (the classic
iterative-Spark trap); prior rounds' checkpoint blocks are freed by the
ContextCleaner once their Python references drop (pyspark exposes no
direct unpersist for checkpointed plans), so peak storage is a few
frontiers — edge lists of ids, small relative to the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "dedup_clusters",
    "pagerank",
    "shortest_paths",
    "triangle_count",
]


def _canonical_edges(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Undirected edge list as (u, v) with u < v, deduped."""
    return (
        pairs.select(
            F.least(F.col(a), F.col(b)).alias("u"), F.greatest(F.col(a), F.col(b)).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star (large=True) or small-star round over canonical
    (u < v) edges. Emits the rewritten canonical edge list.

    The per-node neighborhood minimum is a window MIN over the node
    partition — ONE shuffle per round, where the groupBy-then-join
    formulation shuffled the neighborhoods twice (the aggregate and the
    re-join). Same keyed repartition either way, so the rewrite is
    plan-shape-neutral at scale and halves per-round latency in the
    iteration-dominated regime."""
    from pyspark.sql import Window as W

    # neighborhoods in both directions: (node, neighbor)
    nbrs = edges.select(F.col("u").alias("n"), F.col("v").alias("m")).unionAll(
        edges.select(F.col("v").alias("n"), F.col("u").alias("m"))
    )
    # each node's minimum over neighborhood and itself
    joined = nbrs.withColumn(
        "mn", F.least(F.min("m").over(W.partitionBy("n")), F.col("n"))
    )
    if large:
        # large-star(n): connect strictly larger neighbors to
        # min(neighborhood ∪ self)
        out = joined.filter(F.col("m") > F.col("n")).select(
            F.col("m").alias("a"), F.col("mn").alias("b")
        )
    else:
        # small-star(n): connect smaller-or-equal neighbors AND n itself
        # to the min — omitting the self edge loses the chain links and
        # the iteration collapses to an empty set (measured on a path
        # graph). (n, mn) repeats once per neighbor; the closing
        # distinct dedups.
        out = joined.filter(F.col("m") <= F.col("n")).select(
            F.col("m").alias("a"), F.col("mn").alias("b")
        ).unionAll(joined.select(F.col("n").alias("a"), F.col("mn").alias("b")))
    return (
        out.select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def triangle_count(pairs: DataFrame, a: str = "u", b: str = "v") -> DataFrame:
    """Per-node triangle counts via degree-ordered edge orientation
    (Suri & Vassilvitskii, "Counting Triangles and the Curse of the
    Last Reducer", WWW 2011): orient every undirected edge from its
    lower-(degree, id) endpoint to the higher, enumerate wedges as a
    self-join on the oriented tail, and keep wedges whose heads close
    against the edge set. Returns (node, triangles) for every node in
    at least one triangle.

    Why this shape survives 100× scale: naive wedge enumeration joins
    full neighborhoods, so one hub of degree d contributes d² wedge
    rows — the "last reducer" that stalls the stage. Orientation by the
    (degree, id) total order bounds every out-degree by O(√m), so the
    per-key fan-out of the wedge self-join is balanced regardless of
    hubs; the closure test is ONE more equi-join against the canonical
    edge list (no membership broadcast needed). Each triangle is
    counted exactly once — at its orientation-minimal vertex, the only
    one with out-edges to both others. Everything is plain DataFrame
    algebra: the same triangles fall out of a 3-way self-join in SQL,
    which is what makes q_triangle_count hash-checkable."""
    from ray_beam_runner_spark.caches import track

    e = track(_canonical_edges(pairs, a, b))
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    # canonical edges have u < v, so an equal-degree tie orients u -> v
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = track(
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    wedges = (
        oriented.select("s", F.col("t").alias("t1"))
        .join(oriented.select("s", F.col("t").alias("t2")), "s")
        .filter(F.col("t1") < F.col("t2"))
    )
    closed = wedges.join(
        e,
        (F.col("t1") == F.col("u")) & (F.col("t2") == F.col("v")),
        "left_semi",
    )
    return (
        closed.select(
            F.explode(F.array("s", "t1", "t2")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )


def _frontier_signature(edges: DataFrame) -> tuple:
    """(count, xor-ish hash) — one tiny aggregate; equal signatures on
    canonical deduped edge sets imply (whp) the iteration converged."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return (row.n, row.h)


def connected_components(
    pairs: DataFrame, a: str = "d1", b: str = "d2", max_rounds: int = 25
) -> DataFrame:
    """Connected components of the undirected pair graph. Returns
    (node, component) for every node appearing in an edge, where
    component is the MINIMUM node id in the component.

    Alternating star rounds converge in O(log n) (Kiveris et al. 2014);
    ``max_rounds`` is a safety rail, not tuning. After convergence every
    edge is (root, child), so labels read directly off the edges.

    Each round's frontier is localCheckpoint-ed: without lineage
    truncation the plan doubles every round and Catalyst planning time
    dominates by round ~5 (measured: a 50-node path graph went from
    timeout to seconds). The checkpoint is LAZY (eager=False) — the
    plan is truncated immediately either way, and the signature
    aggregate that follows unconditionally is a full-scan action, so it
    materializes the checkpoint blocks in ITS job instead of paying a
    separate count() job per round (one driver action per round, not
    two). localCheckpoint trades executor-loss tolerance for speed —
    the right trade for an iterative refinement that can simply be
    rerun; long-lived cluster jobs can switch to
    ``spark.sparkContext.setCheckpointDir`` + ``checkpoint()``."""
    edges = _canonical_edges(pairs, a, b).localCheckpoint(eager=False)
    sig = _frontier_signature(edges)
    for _ in range(max_rounds):
        nxt = _star_round(edges, large=True)
        nxt = _star_round(nxt, large=False).localCheckpoint(eager=False)
        nsig = _frontier_signature(nxt)
        edges = nxt
        if nsig == sig:
            break
        sig = nsig
    else:  # pragma: no cover - would need a pathological graph
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")
    # converged star graph: v's label is u; roots label themselves
    # (the checkpointed frontier backs the lazy result; its blocks free
    # when the DataFrame is garbage collected)
    members = edges.select(F.col("v").alias("node"), F.col("u").alias("component"))
    roots = edges.select(F.col("u").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return members.unionByName(roots).groupBy("node").agg(
        F.min("component").alias("component")
    )


def dedup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id", a: str = "d1", b: str = "d2"
) -> DataFrame:
    """Cluster assignment for EVERY document: near-dup components get
    their component min-id, untouched docs are their own singleton
    cluster. Returns (id_col, cluster, is_survivor)."""
    comp = connected_components(pairs, a, b)
    joined = docs.select(F.col(id_col)).join(
        comp, docs[id_col] == comp["node"], "left"
    )
    cluster = F.coalesce(F.col("component"), F.col(id_col))
    return joined.select(
        F.col(id_col),
        cluster.alias("cluster"),
        (cluster == F.col(id_col)).alias("is_survivor"),
    )


def pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    n_iter: int | None = None,
    damping: float = 0.85,
    undirected: bool = True,
    tol: float | None = None,
) -> DataFrame:
    """PageRank as pure DataFrame algebra: returns (node, rank) after
    power-iteration rounds with uniform 1/N initialization.
    ``undirected=True`` (default) symmetrizes the edge list first,
    which also guarantees every participating node has out-degree >= 1
    — no dangling-mass redistribution step needed (the usual extra
    global aggregate per round on directed graphs).

    Two modes:
    - fixed-iteration (``tol=None``): exactly ``n_iter`` rounds
      (default 3) — deterministic and ORACLE-EXPRESSIBLE (each round
      is one SQL CTE).
    - convergence (``tol=`` set): stop as soon as the L1 rank delta of
      a round falls below ``tol`` (the 1-row signature pattern of
      ``connected_components``: one tiny aggregate per round, never a
      collected rank vector); ``n_iter`` becomes the safety cap and
      DEFAULTS TO 50 in this mode — a caller passing only ``tol``
      gets a cap that can actually reach the fixed point, not the
      fixed-mode default. Matches fixed-iteration run to the same
      depth exactly (pinned by test).

    Shape per round: one join of ranks to edges (co-partitioned on the
    node key once the first round establishes the hash partitioning —
    Exchange reuse keeps later rounds join-only) and one map-side
    combinable sum per destination. Lineage: linear in rounds for the
    short fixed plans; in convergence mode or past 5 rounds each
    round's ranks are eagerly localCheckpoint-ed (the
    connected_components recipe) so the plan stays one round deep no
    matter how many rounds convergence takes."""
    from ray_beam_runner_spark.caches import track

    if n_iter is None:
        n_iter = 3 if tol is None else 50
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    if undirected:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    # tracked persists (session cache registry): e feeds every round's
    # join and nodes every round's backfill — without release_tracked()
    # awareness these would pin executor storage for session lifetime
    e = track(e)
    nodes = track(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_total = nodes.count()
    if n_total == 0:
        # empty edge frame (e.g. an upstream filter matched nothing):
        # empty (node, rank) result, and drop the tracked persists now
        e.unpersist()
        nodes.unpersist()
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_total))
    truncate = tol is not None or n_iter > 5
    for _ in range(n_iter):
        contrib = (
            ranks.join(e, ranks["node"] == e["src"])
            .join(out_deg, "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_total)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if truncate:
            # lazy: the plan is truncated immediately; in convergence
            # mode the full-scan delta probe below materializes the
            # blocks in its own job (no separate checkpoint job per
            # round), and in long fixed-iteration runs the rounds chain
            # into the consumer's single job with each round's blocks
            # cached as they are first computed
            new_ranks = new_ranks.localCheckpoint(eager=False)
        if tol is not None:
            old = ranks.select("node", F.col("rank").alias("_pr_old"))
            delta = (
                new_ranks.join(old, "node")
                .agg(F.sum(F.abs(F.col("rank") - F.col("_pr_old"))).alias("d"))
                .first()[0]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks
    if tol is None and truncate:
        # Fixed-iteration mode materialized nothing inside the loop (no
        # convergence probe): finalize the chained lazy checkpoints with
        # ONE full-scan action here. Without it, a caller whose first
        # action is partial (first/show/limit) finalizes each round's
        # checkpoint with follow-up jobs for the partitions the partial
        # action skipped — a per-round job storm slower than the eager
        # form this replaced (r16 advice).
        ranks.count()
    return ranks


def bfs_layers(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    max_depth: int = 10,
    undirected: bool = False,
) -> DataFrame:
    """Multi-source BFS: (node, hops) with the MINIMUM hop count from
    any seed, bounded by ``max_depth`` — reachability rings, blast
    radius, k-hop neighborhood extraction. Pregel-style frontier
    expansion as pure DataFrame algebra:

    per round: frontier ⋈ edges (one keyed equi-join — the frontier is
    node ids only, tiny relative to the corpus) → distinct successors →
    anti-join against the visited set so each node settles at its first
    (= minimum) depth and is never expanded twice. Round k's shuffle is
    proportional to the k-ring's edge boundary, never the graph; the
    visited set carries one row per reached node. Frontier and visited
    are localCheckpoint-ed each round (the module's lineage discipline
    — see connected_components) so the plan stays one round deep; the
    checkpoints are LAZY, so the frontier count() that decides the
    early exit is the round's ONLY driver action — it materializes the
    frontier blocks (and, through the anti-join lineage, the previous
    round's visited union) in the same job, where the eager form paid
    three jobs per round (frontier checkpoint, emptiness probe,
    visited checkpoint)."""
    e = edges.select(F.col(src).alias("_bf_s"), F.col(dst).alias("_bf_d")).distinct()
    if undirected:
        e = e.unionByName(
            e.select(F.col("_bf_d").alias("_bf_s"), F.col("_bf_s").alias("_bf_d"))
        ).distinct()
    from ray_beam_runner_spark.caches import track

    e = track(e)
    visited = (
        seeds.select(F.col(node).alias("node")).distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint(eager=False)
    )
    frontier = visited
    for k in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["_bf_s"])
            .select(F.col("_bf_d").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .withColumn("hops", F.lit(k))
            .localCheckpoint(eager=False)
        )
        # count() (not isEmpty/take(1)) so the lazy checkpoint is
        # materialized in FULL by this round's one action
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    e.unpersist()
    return visited


def shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    node: str = "node",
    max_iters: int = 10,
    undirected: bool = False,
) -> DataFrame:
    """Multi-source WEIGHTED shortest paths: (node, dist) with the
    minimum total edge weight from any seed, over paths of at most
    ``max_iters`` hops — the weighted sibling of :func:`bfs_layers`
    (routing cost, trust propagation, cheapest-supply-chain radius).
    Frontier Bellman-Ford as pure DataFrame algebra:

    per round, relax ONLY the edges leaving nodes whose distance
    improved last round (one keyed equi-join on a frontier of (node,
    dist) rows), take the per-destination min, and keep the strictly
    better entries. The ≤k-hop guarantee of textbook Bellmann-Ford is
    preserved — a node settled at round j has its out-edges relaxed at
    round j+1 — while each round's shuffle is proportional to the
    improved frontier's edge boundary, never the graph. Parallel edges
    pre-aggregate to their min weight; round frames are lazily
    localCheckpoint-ed (the module's lineage discipline; the frontier
    count() that decides the early exit is the round's only driver
    action and materializes the round's blocks). After
    ``max_iters`` rounds the result is exactly "min distance over paths
    of ≤ max_iters hops" — pass iters ≥ the graph's hop diameter for
    the true fixpoint (non-negative weights enforced, so the fixpoint
    exists). Unreached nodes are absent, like bfs_layers."""
    from ray_beam_runner_spark.caches import track

    e = (
        edges.select(
            F.col(src).alias("_sp_s"),
            F.col(dst).alias("_sp_d"),
            F.col(weight).cast("double").alias("_sp_w"),
        )
    )
    if undirected:
        e = e.unionByName(
            e.select(
                F.col("_sp_d").alias("_sp_s"),
                F.col("_sp_s").alias("_sp_d"),
                "_sp_w",
            )
        )
    # parallel edges: only the cheapest matters for any shortest path
    e = track(e.groupBy("_sp_s", "_sp_d").agg(F.min("_sp_w").alias("_sp_w")))
    wmin = e.agg(F.min("_sp_w")).first()[0]
    if wmin is not None and wmin < 0:
        e.unpersist()
        raise ValueError(
            f"shortest_paths: negative edge weight {wmin} (Bellman-Ford "
            "relaxation would not converge to a fixpoint on cycles)"
        )
    dist = (
        seeds.select(F.col(node).alias("node")).distinct()
        .withColumn("dist", F.lit(0.0))
        .localCheckpoint(eager=False)
    )
    frontier = dist
    for _ in range(max_iters):
        improved = (
            frontier.join(e, frontier["node"] == e["_sp_s"])
            .select(
                F.col("_sp_d").alias("node"),
                (F.col("dist") + F.col("_sp_w")).alias("dist"),
            )
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .join(
                dist.withColumnRenamed("dist", "_sp_old"), "node", "left"
            )
            .filter(F.col("_sp_old").isNull() | (F.col("dist") < F.col("_sp_old")))
            .select("node", "dist")
            .localCheckpoint(eager=False)
        )
        # count() (not isEmpty/take(1)) so the lazy checkpoint is
        # materialized in FULL by this round's one action
        if improved.count() == 0:
            break
        dist = (
            dist.join(improved.select("node"), "node", "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=False)
        )
        frontier = improved
    e.unpersist()
    return dist
