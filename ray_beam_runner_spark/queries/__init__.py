"""Declared query registry: every implemented operator from SURVEY.md §2
(and the LLM-data extensions) is exercised by at least one named query with
a DuckDB oracle where SQL can express it.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable registered via the
``@query`` decorator together with the ANSI-SQL oracle DuckDB runs on the
same parquet tables. Column names/aliases are kept identical on both sides —
the driver's compare sorts columns by name before hashing.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a declared query; ``oracle`` is DuckDB SQL over the
    pre-registered views (region nation customer supplier part orders
    lineitem events documents embeddings). ``oracle=None`` → the driver
    records a weaker rows-only check (used for genuinely non-SQL ops)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


_SCRATCH_ROOT: list[str] = []


def scratch_dir(prefix: str) -> str:
    """Fresh scratch dir under ONE process-scoped root removed at
    interpreter exit — repeated gate/sweep/bench invocations no longer
    leak table copies / stream fixtures across runs (r6 ADVICE).
    Cleanup is deferred to atexit so returned DataFrames stay readable
    until the driver has consumed them."""
    import atexit
    import shutil
    import tempfile

    if not _SCRATCH_ROOT:
        root = tempfile.mkdtemp(prefix="rbrs_scratch_")
        _SCRATCH_ROOT.append(root)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH_ROOT[0])


# Storage-layout routing (round-14, SHAPE-AWARE since round-15): map
# (sf_dir, table) -> one or more BUCKETED snapshot table dirs. When
# registered, t() can serve the table through read_bucketed, whose scan
# REPORTS its HashPartitioning — a query then plans its joins/
# aggregates on that key without an exchange, with zero per-query
# changes. This is the deployment story: a 100 TB cluster buckets
# lineitem/orders ONCE and routes every orderkey join through the
# layout; a custkey-heavy workload adds a SECONDARY orders layout
# bucketed on o_custkey (Iceberg's second-sort-order pattern — a
# deliberate storage x2 the registration makes explicit).
#
# Round-14 routing was all-or-nothing per table: once registered,
# EVERY query read the bucketed dir, including scan-bound shapes that
# get no join benefit and LOSE row-group pruning to hash-scattered
# keys (measured: q_priority_counts 9.0x -> 10.8x vs DuckDB routed,
# BASELINE.md §17). route_query() is the shape-aware entry: it builds
# the plain plan first, reads the plan's shuffle structure
# (plans.explain.shuffle_key_structure — join-equality pairs, grouping
# keys, window partitions), pairs CO-LOCATED layouts (a one-sided
# bucketed join is refused — it drops an exchange but measured a net
# x100 loss to the hash-scattered scan), and keeps the routed plan
# only when its PHYSICAL plan drops at least one shuffle exchange vs
# plain. bench_tpch_scaling's routed leg uses this; gates/sweeps run
# with no registrations.
LAYOUTS: dict[tuple[str, str], list[str]] = {}

# thread-local routing context: None -> legacy behavior (first
# registered layout serves every read); a dict -> ONLY the selected
# (sf_dir, table) entries read bucketed, everything else plain. An
# EMPTY dict is how route_query builds its plain probe plan.
import threading as _threading

_ROUTE_CTX = _threading.local()


# route_query's per-(sf_dir, query) layout selection, memoized so
# repeated calls pay the probe plan once (any registration change
# invalidates it); _ROUTE_TRACE records WHY each decision landed
# (route_explain's backing store, same lifecycle); _ROUTE_HINTS
# records which selected tables earned the SHUFFLE_HASH serving hint
# for that query (key-route sort-order picks only — see t())
_ROUTE_MEMO: dict[tuple[str, str], dict[tuple[str, str], str]] = {}
_ROUTE_TRACE: dict[tuple[str, str], dict] = {}
_ROUTE_HINTS: dict[tuple[str, str], set[tuple[str, str]]] = {}
# per-(sf_dir, query) CBO join-reorder acceptance trace — see
# _reorder_decision; "accepted" False means the declared join order is
# pinned for this query even though stats serving is on
_ROUTE_REORDER: dict[tuple[str, str], dict] = {}


def register_layout(sf_dir: str, table: str, table_dir: str) -> None:
    LAYOUTS.setdefault((os.path.abspath(sf_dir), table), []).append(table_dir)
    _ROUTE_MEMO.clear()
    _ROUTE_TRACE.clear()
    _ROUTE_HINTS.clear()
    _ROUTE_REORDER.clear()


def clear_layouts() -> None:
    LAYOUTS.clear()
    _ROUTE_MEMO.clear()
    _ROUTE_TRACE.clear()
    _ROUTE_HINTS.clear()
    _ROUTE_REORDER.clear()


# Catalog-statistics serving mode (round-16, r15 verdict ask #1):
# ENGINE-level join reordering. The round-15 dim-first wins
# (q_local_supplier_volume 12.54 -> 3.14 s at x100) were HAND-written
# into three query declarations because Catalyst will not reorder
# joins without CBO statistics. enable_stats() closes that gap: it
# registers each parquet table as an external CATALOG table, feeds it
# row-count + column statistics (ANALYZE), turns on
# spark.sql.cbo.enabled + joinReorder, and t() then serves
# spark.table(...) instead of the path read — so a query declared
# dims-LAST plans dims-FIRST with NO query change (plan-asserted in
# tests/test_cbo_reorder.py: the declared lineitem x orders innermost
# join becomes nation x region innermost, lineitem joined last).
# At 100 TB the ANALYZE cost is one metadata-bound count + one
# column-stats scan per table, paid once per layout build (the same
# lifecycle as a bucketed layout; manifests already carry the row
# counts that seed it). Bucketed LAYOUTS take precedence over the
# stats table for routed reads — their scan-reported partitioning is
# worth more than a reorder for the shapes the router admits.
STATS: dict[str, dict[str, str]] = {}  # sf_abs -> {table: catalog name}

_CBO_CONFS = {
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    # Bucketed scans stopped reporting their SORTED BY order by default
    # in Spark 3.0 (planning must list files to prove one-file-per-
    # bucket, expensive on arbitrary tables) — which silently re-adds
    # BOTH SortMergeJoin sorts to every co-located layout join, and at
    # x100 those sorts ARE the dominant cost (q_order_exists routed
    # 3.6 s -> 0.65 s with reporting on, measured round 17). The
    # engine's layouts are written one-file-per-bucket by construction
    # (write_bucketed repartitions to n_buckets before bucketBy) and
    # their file counts are manifest-bounded, so the planning-time
    # listing is O(n_buckets) metadata — turned on only while layout/
    # stats serving is registered, restored by disable_stats.
    "spark.sql.legacy.bucketedTableScan.outputOrdering": "true",
}

# Spark's SHIPPED runtime bloom-filter injection gates (SPARK-32268):
# the pruned side must scan > applicationSideScanSizeThreshold (10 GB)
# and the filter-building side must estimate < creationSideThreshold
# (10 MB). On a 100 TB deployment the scan gate passes naturally and
# only the creation bound needs raising; on a bench-scale replica the
# 10 GB gate silently disables injection EVERYWHERE, hiding exactly the
# dim-filtered fact-prune behavior production would get. enable_stats
# therefore scales the scan gate to the registered corpus (biggest
# table / 8, clamped to [32 MB, stock 10 GB]) and raises the creation
# bound as the guide prescribes for build sides with statistics.
# Measured (scripts/explore_bloom_cbo.py, x100 family, min-of-3):
# reorder+bloom 29.6 s vs 35.3 s base; bloom fires only alongside the
# reorder gate's shapes, so the two serve together.
_BLOOM_STOCK = {
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
}


def _bloom_confs_for(biggest_bytes: int) -> dict[str, str]:
    scan_gate = min(10 << 30, max(32 << 20, biggest_bytes // 8))
    creation = max(10 << 20, min(256 << 20, biggest_bytes // 16))
    return {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": str(scan_gate),
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": str(creation),
    }


def enable_stats(
    spark: SparkSession,
    sf_dir: str,
    tables: list[str] | None = None,
    analyze_columns: bool = True,
) -> dict[str, str]:
    """Register ``sf_dir``'s parquet tables as ANALYZE'd catalog tables
    and enable cost-based join reordering for the session. Idempotent:
    existing catalog tables are reused (per-session check — a new
    session re-creates them even when the registration survives in
    module state). ``analyze_columns=False`` computes row counts only
    (cheaper; reordering still fires, with coarser selectivity
    estimates). Returns {table: catalog name}."""
    import hashlib

    sf_abs = os.path.abspath(sf_dir)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    h = hashlib.md5(sf_abs.encode()).hexdigest()[:8]
    if tables is None:
        tables = sorted(
            f[: -len(".parquet")]
            for f in os.listdir(sf_abs)
            if f.endswith(".parquet")
        )
    names = dict(STATS.get(sf_abs, {}))
    for tb in tables:
        path = os.path.join(sf_abs, f"{tb}.parquet")
        if not os.path.exists(path):
            continue
        name = f"rbrs_{h}_{tb}"
        if not spark.catalog.tableExists(name):
            spark.sql(
                f"CREATE TABLE {name} USING parquet LOCATION '{path}'"
            )
            stats_cols: list[str] = []
            if analyze_columns:
                # TIMESTAMP_NTZ (and the ns-as-long columns that read
                # back NTZ-adjacent) are EXCLUDED from column stats:
                # Spark 4.1's FilterEstimation.evaluateBinary has no
                # TimestampNTZType case and a filter estimate over such
                # stats MatchErrors the whole optimization phase
                # (reproduced on the x100 replica's o_orderdate).
                # Without column stats the filter falls back to default
                # selectivity — reordering still fires, slightly
                # coarser.
                from ray_beam_runner_spark.session import _timestamp_columns

                skip = set().union(*_timestamp_columns(path))
                stats_cols = [
                    f.name
                    for f in spark.table(name).schema.fields
                    if f.name not in skip
                ]
            if stats_cols:
                spark.sql(
                    f"ANALYZE TABLE {name} COMPUTE STATISTICS "
                    f"FOR COLUMNS {', '.join(stats_cols)}"
                )
            else:
                spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
        names[tb] = name
    STATS[sf_abs] = names
    for k, v in _CBO_CONFS.items():
        spark.conf.set(k, v)
    # runtime bloom-filter gates scaled to the registered corpus (see
    # _bloom_confs_for): sized from on-disk bytes, a pure metadata read
    biggest = 0
    for tb in names:
        p = os.path.join(sf_abs, f"{tb}.parquet")
        if os.path.isdir(p):
            sz = sum(
                os.path.getsize(os.path.join(p, f)) for f in os.listdir(p)
            )
        elif os.path.exists(p):
            sz = os.path.getsize(p)
        else:
            continue
        biggest = max(biggest, sz)
    if biggest:
        for k, v in _bloom_confs_for(biggest).items():
            spark.conf.set(k, v)
    # plans (and so routing decisions) change under stats serving
    _ROUTE_MEMO.clear()
    _ROUTE_TRACE.clear()
    _ROUTE_HINTS.clear()
    _ROUTE_REORDER.clear()
    return names


def disable_stats(spark: SparkSession | None = None, sf_dir: str | None = None) -> None:
    """Deregister stats serving (catalog tables stay — they're cheap
    metadata — but t() returns to path reads). CBO confs revert too
    when a session is passed."""
    if sf_dir is None:
        STATS.clear()
    else:
        STATS.pop(os.path.abspath(sf_dir), None)
    if spark is not None:
        for k in _CBO_CONFS:
            spark.conf.set(k, "false")
        for k, v in _BLOOM_STOCK.items():
            spark.conf.set(k, v)
    _ROUTE_MEMO.clear()
    _ROUTE_TRACE.clear()
    _ROUTE_HINTS.clear()
    _ROUTE_REORDER.clear()


def _layout_for(sf_abs: str, table: str) -> str | None:
    sel = getattr(_ROUTE_CTX, "selection", None)
    if sel is not None:
        return sel.get((sf_abs, table))
    dirs = LAYOUTS.get((sf_abs, table))
    return dirs[0] if dirs else None


def _size_bytes(conf_val: str) -> int:
    """Parse a Spark byte-size conf string ('10m', '64MB', '-1',
    '10485760b', bare digits) to bytes; negative stays negative."""
    s = str(conf_val).strip().lower().rstrip("b")
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40)):
        if s.endswith(suffix):
            s, mult = s[: -1], m
            break
    try:
        return int(float(s) * mult)
    except ValueError:
        return -1


def _reorder_decision(
    spark: SparkSession, sf_abs: str, sf_dir: str, name: str, fn
) -> bool:
    """Accept or reject CBO join reordering for ONE query (memoized).

    Catalyst's cost model is blind to non-sargable predicates — LIKE
    '%..%' / UDF filters return no FilterEstimation, so a dim the
    author joins early BECAUSE its filter decimates it looks unfiltered
    to the reorderer, which then demotes it (measured +40% on the Q9
    shape, scripts/explore_bloom_cbo.py r16). The gate compares the
    DECLARED join order (reorder off) against the CBO order and accepts
    only when no SELECTIVELY FILTERED, NON-BROADCASTABLE relation moved
    later: a promotion or a no-op keeps the evidence-backed reorder
    (the dims-last Q5 clone still plans dim-first), a demotion of a
    filtered fact pins the author's order; demoting a broadcast-sized
    dim is exempt (its join is map-side pipelined wherever it lands).
    Plan-only — two logical plan builds, no execution, memoized with
    the route memos."""
    key = (sf_abs, name)
    if key in _ROUTE_REORDER:
        return _ROUTE_REORDER[key]["accepted"]
    from ray_beam_runner_spark.plans.explain import (
        filtered_relations,
        relation_print_order,
    )

    conf = "spark.sql.cbo.joinReorder.enabled"
    prev = spark.conf.get(conf, "false")
    _ROUTE_CTX.selection = {}
    try:
        spark.conf.set(conf, "false")
        declared = fn(spark, sf_dir)
        d_order = relation_print_order(declared)
        sel = filtered_relations(declared)
        spark.conf.set(conf, "true")
        cbo = fn(spark, sf_dir)
        c_order = relation_print_order(cbo)
    finally:
        spark.conf.set(conf, prev)
        _ROUTE_CTX.selection = None
    demoted: list[str] = []
    for rid in set(sel):
        d_pos = [i for i, r in enumerate(d_order) if r == rid]
        c_pos = [i for i, r in enumerate(c_order) if r == rid]
        # k-th occurrence pairs with k-th (duplicate relations, e.g. a
        # dim joined twice, keep positional identity)
        if any(c > d for d, c in zip(d_pos, c_pos)):
            demoted.append(rid)
    # BROADCAST EXEMPTION: demoting a relation small enough to
    # broadcast is harmless — its join is map-side pipelined wherever
    # it lands, no shuffle moves. Only a demoted NON-broadcastable
    # relation (a filtered fact whose early reduction the declared
    # order exploits, e.g. Q10's l_returnflag='R' lineitem) is
    # evidence the cost model missed a reduction it cannot defer.
    blocking = list(demoted)
    thr = _size_bytes(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m")
    )
    if blocking and thr > 0:
        cats = set(STATS.get(sf_abs, {}).values())
        kept = []
        for rid in blocking:
            sz = None
            if rid in cats:
                try:
                    sz = int(
                        str(
                            spark.table(rid)
                            ._jdf.queryExecution()  # noqa: SLF001
                            .optimizedPlan()
                            .stats()
                            .sizeInBytes()
                        )
                    )
                except Exception:  # noqa: BLE001 — unknown size = big
                    sz = None
            if sz is None or sz > thr:
                kept.append(rid)
        blocking = kept
    accepted = not blocking
    _ROUTE_REORDER[key] = {
        "accepted": accepted,
        "demoted": demoted,
        "blocking": blocking,
        "filtered": sorted(set(sel)),
        "declared_order": d_order,
        "cbo_order": c_order,
    }
    return accepted


def route_query(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shape-aware routing entry: layout selection (_route_query_inner)
    plus, when enable_stats serving is registered for ``sf_dir``, the
    per-query CBO join-reorder acceptance gate (_reorder_decision). The
    decided reorder conf is held for the whole plan build and the
    returned DataFrame's OPTIMIZED plan is forced while it holds, so
    the join order is pinned regardless of session confs at execution
    time (logical plans are lazy vals — later conf flips can't re-order
    a materialized plan)."""
    sf_abs = os.path.abspath(sf_dir)
    if not STATS.get(sf_abs):
        return _route_query_inner(spark, sf_dir, name)
    ok = _reorder_decision(spark, sf_abs, sf_dir, name, QUERIES[name])
    conf = "spark.sql.cbo.joinReorder.enabled"
    prev = spark.conf.get(conf, "false")
    try:
        spark.conf.set(conf, "true" if ok else "false")
        df = _route_query_inner(spark, sf_dir, name)
        df._jdf.queryExecution().optimizedPlan()  # noqa: SLF001 — pin
        return df
    finally:
        spark.conf.set(conf, prev)


def _route_query_inner(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shape-aware layout routing: run QUERIES[name], serving each
    registered table through the bucketed layout its own optimized plan
    EARNS — plain parquet otherwise. A layout is selected when its
    bucket key is a grouping/window key (single-table exchange elision)
    or when it joins another selected layout with the same bucket count
    on the paired columns (co-located join; a ONE-sided bucketed join
    is refused — it drops an exchange but nets a measured x100 loss to
    the hash-scattered scan). Builds the plan twice when a layout
    matches (probe + routed), memoized per (sf_dir, query); a no-match
    query returns the probe plan unchanged."""
    fn = QUERIES[name]
    sf_abs = os.path.abspath(sf_dir)
    tables = {tb: ds for (sd, tb), ds in LAYOUTS.items() if sd == sf_abs}
    if not tables:
        return fn(spark, sf_dir)
    selection = _ROUTE_MEMO.get((sf_abs, name))
    if selection is None:
        _ROUTE_CTX.selection = {}
        _ROUTE_CTX.hints = set()
        try:
            plain = fn(spark, sf_dir)
        finally:
            _ROUTE_CTX.selection = None
        from ray_beam_runner_spark.plans.explain import (
            scan_range_predicates,
            shuffle_key_structure,
        )
        from ray_beam_runner_spark.sources.bucketed import (
            bucket_spec,
            rowgroup_survival_cols,
        )

        st = shuffle_key_structure(plain)
        keys_used = set(st["groupings"])
        for p in st["join_pairs"]:
            keys_used |= p
        preds = scan_range_predicates(plain)
        trace: dict = {
            "groupings": sorted(st["groupings"]),
            "join_pairs": sorted(sorted(p) for p in st["join_pairs"]),
            "predicates": {c: list(ps) for c, ps in preds.items()},
            "tables": {},
        }
        # candidates: every layout whose bucket key the plan shuffles
        # on. When a table registers SEVERAL layouts on the same key
        # with different SORT orders (Iceberg sort-order pattern),
        # prefer one sorted within buckets by a column this plan
        # filters on — but only when the parquet FOOTER probe estimates
        # the filter actually prunes row groups (survival <= 60%); the
        # key-sorted layout keeps SortMergeJoin's sort elision
        # otherwise. The probe is metadata-only and O(1) per decision
        # (rowgroup_survival doc), and route decisions stay memoized.
        cand: list[tuple[str, str, dict]] = []
        for tb, dirs in tables.items():
            ttr = trace["tables"].setdefault(
                tb, {"key_match": [], "survival": {}, "decision": "no key match"}
            )
            matches: list[tuple[str, dict]] = []
            for d in dirs:
                spec = bucket_spec(d)
                if spec and all(c in keys_used for c in spec["cols"]):
                    matches.append((d, spec))
                    ttr["key_match"].append(os.path.basename(d))
            def _survival_pick(pool):
                # probe EVERY sorted column the plan filters on (r15
                # verdict ask #4: first-column-only under-informed
                # multi-predicate scans); the conjunction is evaluated
                # per row group, so correlated predicates combine
                # exactly, not by an independence guess
                for d, spec in pool:
                    scols = [
                        c for c in spec.get("sorted", [])
                        if c not in spec["cols"] and c in preds
                    ]
                    if not scols:
                        continue
                    surv = rowgroup_survival_cols(
                        d, {c: preds[c] for c in scols}
                    )
                    ttr["survival"][os.path.basename(d)] = surv  # noqa: B023
                    if surv is not None and surv <= 0.6:
                        return (d, spec), ",".join(scols), surv
                return None, None, None
            if not matches:
                # SCAN-ONLY route (round 15, second block): no join/
                # grouping uses this table's bucket key, but a layout
                # sorted by a column the plan RANGE-FILTERS still wins
                # on pure row-group pruning (measured x1000: a one-year
                # shipdate scan-agg is 5.5x faster on the sorted layout
                # than on plain parquet, whose unsorted row groups
                # cannot prune). Admitted purely on survival evidence;
                # the pairing rule and the exchange-drop gate don't
                # apply (there is no exchange to drop — the gain is IO),
                # so these carry a 'scan' kind through selection.
                choice, scol, surv = _survival_pick(
                    [(d, s) for d in dirs if (s := bucket_spec(d))]
                )
                if choice is not None:
                    ttr["decision"] = (
                        f"scan-only sort-order route ({scol} survival {surv:.2f})"
                    )
                    cand.append((tb, choice[0], {**choice[1], "_kind": "scan"}))
                continue
            choice, scol, surv = _survival_pick(matches)
            if choice is not None:
                ttr["decision"] = (
                    f"sort-order layout ({scol} survival {surv:.2f})"
                )
                # the KEY-route sort-order pick is the one case where
                # the SHUFFLE_HASH serving hint is safe: the survival
                # gate (<=60% row groups) guarantees the hinted side is
                # the FILTERED build side, and the layout's bucket key
                # matches the join. Scan-only routes and key-sorted
                # layouts never carry the hint — attaching it to every
                # join through the table risked building the hash map
                # on an unfiltered 100 TB fact side (r15 ADVICE).
                choice = (choice[0], {**choice[1], "_hint": True})
            else:
                choice = next(
                    (
                        (d, s) for d, s in matches
                        if s.get("sorted", s["cols"]) == s["cols"]
                    ),
                    matches[0],
                )
                ttr["decision"] = "key-sorted layout (sort elision)"
            cand.append((tb, choice[0], choice[1]))
        # pairing rule (x100-measured, plans/explain.shuffle_key_structure
        # doc): a layout earns its scan trade-off only when (a) its key
        # is a GROUPING/WINDOW key — single-table exchange elision — or
        # (b) it joins another CANDIDATE layout with the same bucket
        # count on the paired columns, so BOTH sides skip the exchange.
        # One-sided join elision measured a net loss; iterate to a
        # fixpoint since dropping one candidate can orphan its partner.
        while True:
            keep: list[tuple[str, str, dict]] = []
            for tb, d, spec in cand:
                if spec.get("_kind") == "scan":
                    # scan-only routes stand on survival evidence alone
                    keep.append((tb, d, spec))
                    continue
                cols = set(spec["cols"])
                if cols & st["groupings"]:
                    keep.append((tb, d, spec))
                    continue
                partnered = False
                for pair in st["join_pairs"]:
                    if not (cols & pair):
                        continue
                    other = set(pair) - cols
                    for tb2, d2, spec2 in cand:
                        if d2 != d and spec2["n"] == spec["n"] and (
                            other & set(spec2["cols"])
                        ):
                            partnered = True
                            break
                    if partnered:
                        break
                if partnered:
                    keep.append((tb, d, spec))
            if len(keep) == len(cand):
                break
            cand = keep
        kept_tables = {tb for tb, _d, _s in cand}
        for tb, ttr in trace["tables"].items():
            if ttr["key_match"] and tb not in kept_tables:
                ttr["decision"] = "refused: no co-located partner"
        scan_route = any(s.get("_kind") == "scan" for _tb, _d, s in cand)
        selection = {(sf_abs, tb): d for tb, d, _ in cand}
        hints = {(sf_abs, tb) for tb, _d, s in cand if s.get("_hint")}
        if selection:
            # verify on the PHYSICAL plan: the layout must actually
            # drop a shuffle exchange, else the query pays the
            # hash-scattered scan for nothing (x100-measured:
            # q_idle_rich_customers routed with equal exchange counts
            # ran 1.5x slower) — fall back to plain and memoize that.
            from ray_beam_runner_spark.plans.explain import count_exchanges

            _ROUTE_CTX.selection = selection
            _ROUTE_CTX.hints = hints
            try:
                routed = fn(spark, sf_dir)
            finally:
                _ROUTE_CTX.selection = None
            n_routed, n_plain = count_exchanges(routed), count_exchanges(plain)
            trace["exchanges"] = {"plain": n_plain, "routed": n_routed}
            # a scan-only route wins on row-group IO, not exchanges: it
            # must merely not make the plan WORSE (equal counts ok);
            # key routes still owe a strict drop
            key_route = any(s.get("_kind") != "scan" for _t, _d, s in cand)
            ok = (n_routed < n_plain) if key_route else (n_routed <= n_plain)
            if not ok and key_route and scan_route:
                # the key side failed its drop: retry serving ONLY the
                # scan-evidence layouts before giving up entirely
                selection = {
                    (sf_abs, tb): d for tb, d, s in cand
                    if s.get("_kind") == "scan"
                }
                hints = set()  # scan routes never carry the SHJ hint
                _ROUTE_CTX.selection = selection
                _ROUTE_CTX.hints = hints
                try:
                    routed = fn(spark, sf_dir)
                finally:
                    _ROUTE_CTX.selection = None
                n_routed = count_exchanges(routed)
                trace["exchanges"]["routed"] = n_routed
                trace["outcome"] = "key route refused; scan-only retry"
                ok = n_routed <= n_plain
            if not ok:
                selection = {}
                trace["outcome"] = "fell back: no exchange drop"
                _ROUTE_TRACE[(sf_abs, name)] = trace
            else:
                trace["outcome"] = (
                    "routed (scan-only after key refusal)"
                    if trace.get("outcome") == "key route refused; scan-only retry"
                    else "routed"
                )
                _ROUTE_MEMO[(sf_abs, name)] = selection
                _ROUTE_HINTS[(sf_abs, name)] = hints
                _ROUTE_TRACE[(sf_abs, name)] = trace
                return routed
        else:
            trace["outcome"] = "plain: no layout earned"
            _ROUTE_TRACE[(sf_abs, name)] = trace
        _ROUTE_MEMO[(sf_abs, name)] = selection
        _ROUTE_HINTS[(sf_abs, name)] = set()
        if not selection:
            return plain
    if not selection:
        return fn(spark, sf_dir)
    _ROUTE_CTX.selection = selection
    _ROUTE_CTX.hints = _ROUTE_HINTS.get((sf_abs, name), set())
    try:
        return fn(spark, sf_dir)
    finally:
        _ROUTE_CTX.selection = None


def route_explain(spark: SparkSession, sf_dir: str, name: str) -> dict:
    """EXPLAIN for the router: why each registered table was (not)
    served a layout for this query. Runs the routing decision if it
    isn't memoized yet, then returns a JSON-friendly trace:

    - ``selection``: {table: layout dir basename} actually served;
    - ``outcome``: "routed" | "plain: no layout earned" |
      "fell back: no exchange drop" | "no layouts registered";
    - ``groupings`` / ``join_pairs`` / ``predicates``: what the
      optimized plan's shuffle structure and Filter nodes exposed;
    - per table: which layouts key-matched, each sort-order
      candidate's footer-probe survival, and the decision taken
      ("sort-order layout (col survival 0.29)", "key-sorted layout
      (sort elision)", "refused: no co-located partner", ...);
    - ``exchanges``: plain vs routed physical counts (present when the
      physical check ran).

    The deployment story: a 100 TB operator asks WHY a query reads
    plain parquet before paying for another layout — this is that
    answer, from the same decision path the router actually took."""
    sf_abs = os.path.abspath(sf_dir)
    if not any(sd == sf_abs for (sd, _tb) in LAYOUTS) and not STATS.get(sf_abs):
        return {"outcome": "no layouts registered", "selection": {}}
    route_query(spark, sf_dir, name)
    sel = _ROUTE_MEMO.get((sf_abs, name), {})
    out = dict(_ROUTE_TRACE.get((sf_abs, name), {}))
    out["selection"] = {
        tb: os.path.basename(d) for (_sd, tb), d in sel.items()
    }
    if (sf_abs, name) in _ROUTE_REORDER:
        out["cbo_reorder"] = dict(_ROUTE_REORDER[(sf_abs, name)])
    if not out.get("outcome"):
        out["outcome"] = "stats serving only (no layouts registered)"
    return out


def _resolve_columns(sf_dir: str) -> dict[str, str]:
    """column name -> owning table, from parquet footers. Handles both
    single-file tables (``orders.parquet``) and DIRECTORY tables (a
    ``orders.parquet/`` dir of part files — the shape every real table
    takes at scale; r15 verdict ask #3): for a directory, the first
    part file's footer carries the schema. Column names appearing in
    MORE than one table are EXCLUDED entirely (r15 ADVICE: setdefault
    silently attributed them to the alphabetically-first table — on
    schemas without TPC-H-style prefixes the advisor could recommend a
    layout against the wrong table; dropping is the safe direction and
    matches the docstring). Unparseable footers are skipped."""
    import pyarrow.parquet as pq

    seen: dict[str, set[str]] = {}
    for f in sorted(os.listdir(sf_dir)):
        if not f.endswith(".parquet"):
            continue
        p = os.path.join(sf_dir, f)
        if os.path.isdir(p):
            parts = sorted(
                x for x in os.listdir(p) if x.endswith(".parquet")
            )
            if not parts:
                continue
            p = os.path.join(p, parts[0])
        try:
            sch = pq.read_schema(p)
        except Exception:  # noqa: BLE001
            continue
        for c in sch.names:
            seen.setdefault(c, set()).add(f[: -len(".parquet")])
    return {c: next(iter(ts)) for c, ts in seen.items() if len(ts) == 1}


def advise_layouts(
    spark: SparkSession, sf_dir: str, names: list[str], top: int = 8
) -> list[dict]:
    """Workload-driven LAYOUT ADVISOR — the design-time complement of
    route_query: given a workload (registry query names), read each
    query's optimized plan (no execution; plain-parquet probe plans)
    and recommend which storage layouts would earn their build cost,
    ranked by how many queries vote for them:

    - a join-equality pair whose two columns resolve to two tables ->
      a CO-LOCATED bucket pair recommendation (the only kind
      route_query's pairing rule will serve to a join);
    - a grouping/window key -> a single-table bucket recommendation
      (exchange-free aggregation);
    - a recurring range predicate on a column -> a SORT-WITHIN
      recommendation attached to that table's bucket layout (row-group
      pruning; served through the footer-probe survival gate).

    Columns resolve to tables via the parquet footers' schemas (one
    footer read per table; ambiguous/derived columns are dropped — the
    safe direction, matching the router's own heuristic). Each
    recommendation lists its voting queries, so the storage-times-N
    cost of every layout is justified by named workload evidence.
    Plan-only and driver-side: safe to run against a 100 TB catalog."""
    col_table = _resolve_columns(sf_dir)

    from ray_beam_runner_spark.plans.explain import (
        scan_range_predicates,
        shuffle_key_structure,
    )

    join_votes: dict[frozenset, list[str]] = {}
    group_votes: dict[tuple, list[str]] = {}
    pred_votes: dict[tuple, list[str]] = {}
    for name in names:
        _ROUTE_CTX.selection = {}
        try:
            df = QUERIES[name](spark, sf_dir)
        finally:
            _ROUTE_CTX.selection = None
        st = shuffle_key_structure(df)
        for pair in st["join_pairs"]:
            tcols = frozenset(
                (col_table[c], c) for c in pair if c in col_table
            )
            if len(tcols) == 2 and len({t for t, _ in tcols}) == 2:
                join_votes.setdefault(tcols, []).append(name)
        for c in st["groupings"]:
            if c in col_table:
                group_votes.setdefault((col_table[c], c), []).append(name)
        for c in scan_range_predicates(df):
            if c in col_table:
                pred_votes.setdefault((col_table[c], c), []).append(name)

    recs: list[dict] = []
    keyed: set[tuple] = set()  # (table, col) already covered by a pair
    for pair, qs in sorted(join_votes.items(), key=lambda kv: -len(kv[1])):
        (t1, c1), (t2, c2) = sorted(pair)
        recs.append({
            "kind": "co-located bucket pair",
            "build": [{"table": t1, "bucket_by": [c1]},
                      {"table": t2, "bucket_by": [c2]}],
            "queries": sorted(set(qs)),
            "votes": len(qs),
        })
        keyed.update([(t1, c1), (t2, c2)])
    for (tb, c), qs in sorted(group_votes.items(), key=lambda kv: -len(kv[1])):
        if (tb, c) in keyed:
            continue
        recs.append({
            "kind": "bucket layout (grouping key)",
            "build": [{"table": tb, "bucket_by": [c]}],
            "queries": sorted(set(qs)),
            "votes": len(qs),
        })
        keyed.add((tb, c))
    # each table's best-voted bucket key (recs are appended in vote
    # order, first mention wins) — sort-within layouts attach to it so
    # they can PAIR with the already-recommended key layouts
    best_key: dict[str, str] = {}
    for r in recs:
        for b in r["build"]:
            best_key.setdefault(b["table"], b["bucket_by"][0])
    for (tb, c), qs in sorted(pred_votes.items(), key=lambda kv: -len(kv[1])):
        key = (tb, best_key[tb]) if tb in best_key else None
        recs.append({
            "kind": "sort-within layout (range predicates)",
            "build": [{
                "table": tb,
                "bucket_by": [key[1]] if key else ["<any stable key>"],
                "sort_within": [c],
            }],
            "queries": sorted(set(qs)),
            "votes": len(qs),
            "note": (
                "served by route_query under the footer-probe survival "
                "gate; pairs with the existing bucket key"
                if key else
                "no bucket key voted for this table: scan-only routes "
                "still serve it — pick any stable id as the bucket key"
            ),
        })
    recs.sort(key=lambda r: -r["votes"])
    return recs[:top]


def build_advised(
    spark: SparkSession,
    sf_dir: str,
    recs: list[dict],
    budget_layouts: int | None = None,
    base_dir: str | None = None,
    n_buckets: int = 16,
    parquet_block_size: int | None = None,
) -> list[str]:
    """Close the advisor loop (round 16, r15 verdict ask #3): BUILD and
    REGISTER the advisor's top recommendations, so the whole routing
    story is self-driving — ``advise_layouts`` names the layouts a
    workload earns, this materializes them, ``route_query`` then serves
    them per-query with no hand registration anywhere.

    Walks ``recs`` in their vote order. ``budget_layouts`` caps the
    number of DISTINCT physical layouts written (a co-located pair
    counts as two) — the operator's storage budget; unbuildable
    recommendations (a sort-within whose table drew no bucket-key vote:
    ``"<any stable key>"`` placeholder) are skipped with their slot
    freed. A (table, key, sort) combination appearing in several
    recommendations builds once. Identical write path as the hand
    registrations (sources.bucketed.write_bucketed with bucket-key
    blooms), so everything route_query measures about hand layouts
    holds for advised ones. ``n_buckets`` defaults test-scale; a real
    deployment passes ~10^5 and its own durable ``base_dir`` (default
    is process-scoped scratch). Returns the built layout dirs."""
    from ray_beam_runner_spark.sources import bucketed as bkt

    base_dir = base_dir or scratch_dir("rbrs_advised_")
    built: dict[tuple, str] = {}
    out: list[str] = []
    for r in recs:
        for b in r.get("build", []):
            keys = tuple(b["bucket_by"])
            if any(k.startswith("<") for k in keys):
                continue
            sort = tuple(b.get("sort_within", ()))
            sig = (b["table"], keys, sort)
            if sig in built:
                continue
            if budget_layouts is not None and len(built) >= budget_layouts:
                continue
            d = os.path.join(
                base_dir,
                f"{b['table']}__{'_'.join(keys)}"
                + (f"__s_{'_'.join(sort)}" if sort else ""),
            )
            if not os.path.exists(d):
                bkt.write_bucketed(
                    t(spark, sf_dir, b["table"]), d, list(keys), n_buckets,
                    sort_by=(list(sort) or None),
                    bloom_for=list(keys),
                    parquet_block_size=parquet_block_size,
                )
            register_layout(sf_dir, b["table"], d)
            built[sig] = d
            out.append(d)
    return out


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a synthetic table. The (immutable) DataFrame handle is cached
    ON the session object: repeated reads re-open parquet footers through
    the JVM (~100 ms per query build) for identical plans. Storing the
    cache on the session (not a module global) lets it die with the
    session instead of pinning stopped sessions for process lifetime.
    The test tables are static/read-only; if a path's files were ever
    regenerated in place, clear ``spark._rbrs_tables``.

    A registered storage layout (``register_layout``) overrides the
    plain parquet read: the table is served through its bucketed
    snapshot dir, same rows and schema, scan-reported partitioning.
    Under route_query's selection context, only the tables the current
    query's plan shuffles on read bucketed (see route_query)."""
    from ray_beam_runner_spark.session import read_parquet_normalized

    sf_abs = os.path.abspath(sf_dir)
    override = _layout_for(sf_abs, name)
    path = override or os.path.join(sf_dir, f"{name}.parquet")
    cat = None if override else STATS.get(sf_abs, {}).get(name)
    key = f"stats:{cat}" if cat else path
    cache = getattr(spark, "_rbrs_tables", None)
    if cache is None:
        cache = {}
        spark._rbrs_tables = cache  # noqa: SLF001
    if key not in cache:
        if override:
            from ray_beam_runner_spark.sources.bucketed import read_bucketed

            cache[key] = read_bucketed(spark, override)
        elif cat:
            # stats-catalog serving (enable_stats): the SAME rows and
            # normalized schema, but scanned through a catalog relation
            # carrying ANALYZE statistics — Catalyst's cost-based join
            # reordering keys off them
            from ray_beam_runner_spark.session import normalize_timestamps

            cache[key] = normalize_timestamps(spark.table(cat), path)
        else:
            cache[key] = read_parquet_normalized(spark, path)
    df = cache[key]
    if override and (sf_abs, name) in getattr(_ROUTE_CTX, "hints", set()):
        # PER-ROUTE SHUFFLE_HASH hint (r15 ADVICE fix: it used to live
        # on the cached DataFrame, leaking into every join through the
        # table). A SORT-ORDER layout (sorted within buckets by a
        # non-key column) cannot give SortMergeJoin its sort elision —
        # but a SHUFFLED HASH join needs NO sort and, over a bucketed
        # scan's reported HashPartitioning, NO exchange either.
        # route_query marks the hint ONLY for the key-route sort-order
        # pick, where the <=60%-survival footer gate guarantees the
        # hinted side is the filtered (naturally small) build side.
        # Measured x1000 (q_late_shipments shape): SHJ 4.92 s vs SMJ
        # 5.51 s on the same sorted layout, plan-verified 0-exchange,
        # 4 fewer Sort nodes.
        df = df.hint("shuffle_hash")
    return df


# Import for registration side effects (order = SURVEY §2 build order).
from ray_beam_runner_spark.queries import relational  # noqa: E402,F401
from ray_beam_runner_spark.queries import llm  # noqa: E402,F401
from ray_beam_runner_spark.queries import streaming_q  # noqa: E402,F401
from ray_beam_runner_spark.queries import scalars  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLE", "query", "t"]
