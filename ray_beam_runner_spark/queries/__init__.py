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
# (route_explain's backing store, same lifecycle)
_ROUTE_MEMO: dict[tuple[str, str], dict[tuple[str, str], str]] = {}
_ROUTE_TRACE: dict[tuple[str, str], dict] = {}


def register_layout(sf_dir: str, table: str, table_dir: str) -> None:
    LAYOUTS.setdefault((os.path.abspath(sf_dir), table), []).append(table_dir)
    _ROUTE_MEMO.clear()
    _ROUTE_TRACE.clear()


def clear_layouts() -> None:
    LAYOUTS.clear()
    _ROUTE_MEMO.clear()
    _ROUTE_TRACE.clear()


def _layout_for(sf_abs: str, table: str) -> str | None:
    sel = getattr(_ROUTE_CTX, "selection", None)
    if sel is not None:
        return sel.get((sf_abs, table))
    dirs = LAYOUTS.get((sf_abs, table))
    return dirs[0] if dirs else None


def route_query(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
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
            rowgroup_survival,
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
                for d, spec in pool:
                    scols = [
                        c for c in spec.get("sorted", [])
                        if c not in spec["cols"] and c in preds
                    ]
                    if not scols:
                        continue
                    surv = rowgroup_survival(d, scols[0], preds[scols[0]])
                    ttr["survival"][os.path.basename(d)] = surv  # noqa: B023
                    if surv is not None and surv <= 0.6:
                        return (d, spec), scols[0], surv
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
        if selection:
            # verify on the PHYSICAL plan: the layout must actually
            # drop a shuffle exchange, else the query pays the
            # hash-scattered scan for nothing (x100-measured:
            # q_idle_rich_customers routed with equal exchange counts
            # ran 1.5x slower) — fall back to plain and memoize that.
            from ray_beam_runner_spark.plans.explain import count_exchanges

            _ROUTE_CTX.selection = selection
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
                _ROUTE_CTX.selection = selection
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
                _ROUTE_TRACE[(sf_abs, name)] = trace
                return routed
        else:
            trace["outcome"] = "plain: no layout earned"
            _ROUTE_TRACE[(sf_abs, name)] = trace
        _ROUTE_MEMO[(sf_abs, name)] = selection
        if not selection:
            return plain
    if not selection:
        return fn(spark, sf_dir)
    _ROUTE_CTX.selection = selection
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
    if not any(sd == sf_abs for (sd, _tb) in LAYOUTS):
        return {"outcome": "no layouts registered", "selection": {}}
    route_query(spark, sf_dir, name)
    sel = _ROUTE_MEMO.get((sf_abs, name), {})
    out = dict(_ROUTE_TRACE.get((sf_abs, name), {}))
    out["selection"] = {
        tb: os.path.basename(d) for (_sd, tb), d in sel.items()
    }
    return out


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
    import pyarrow.parquet as pq

    col_table: dict[str, str] = {}
    for f in sorted(os.listdir(sf_dir)):
        if not f.endswith(".parquet"):
            continue
        try:
            sch = pq.read_schema(os.path.join(sf_dir, f))
        except Exception:  # noqa: BLE001
            continue
        for c in sch.names:
            col_table.setdefault(c, f[: -len(".parquet")])

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

    override = _layout_for(os.path.abspath(sf_dir), name)
    path = override or os.path.join(sf_dir, f"{name}.parquet")
    cache = getattr(spark, "_rbrs_tables", None)
    if cache is None:
        cache = {}
        spark._rbrs_tables = cache  # noqa: SLF001
    if path not in cache:
        if override:
            from ray_beam_runner_spark.sources.bucketed import (
                bucket_spec,
                read_bucketed,
            )

            df = read_bucketed(spark, override)
            spec = bucket_spec(override)
            if spec and spec.get("sorted", spec["cols"]) != spec["cols"]:
                # a SORT-ORDER layout (sorted within buckets by a
                # non-key column) cannot give SortMergeJoin its sort
                # elision — but a SHUFFLED HASH join needs NO sort and,
                # over a bucketed scan's reported HashPartitioning, NO
                # exchange either. The router only serves this layout
                # under the footer probe's <=60% row-group survival, so
                # the hinted (filtered) side is the naturally small
                # build side. Measured x1000 (q_late_shipments shape):
                # SHJ 4.92 s vs SMJ 5.51 s on the same sorted layout,
                # plan-verified 0-exchange, 4 fewer Sort nodes.
                df = df.hint("shuffle_hash")
            cache[path] = df
        else:
            cache[path] = read_parquet_normalized(spark, path)
    return cache[path]


# Import for registration side effects (order = SURVEY §2 build order).
from ray_beam_runner_spark.queries import relational  # noqa: E402,F401
from ray_beam_runner_spark.queries import llm  # noqa: E402,F401
from ray_beam_runner_spark.queries import streaming_q  # noqa: E402,F401
from ray_beam_runner_spark.queries import scalars  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLE", "query", "t"]
