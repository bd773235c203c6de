"""Physical-plan inspection helpers: programmatic assertions that the
plans Catalyst produces are the plans we want at 100 TB (SURVEY.md §4).

The reference has no optimizer to inspect (opaque Python DoFns); for us
the plan IS the product — these helpers let tests pin down predicate
pushdown, column pruning, broadcast joins, partial aggregation, and
whole-stage codegen, so regressions in plan shape fail CI rather than
show up as 10x slowdowns on the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def assert_pushed_filters(df: DataFrame, *fragments: str):
    """Assert parquet-level pushed filters mention every fragment."""
    plan = formatted_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    text = "\n".join(pushed)
    missing = [f for f in fragments if f not in text]
    assert not missing, f"filters not pushed to scan: {missing}\n{text or plan}"


def assert_pruned_schema(df: DataFrame, max_cols: int, table_fragment: str = ""):
    """Assert the parquet ReadSchema was pruned to at most max_cols columns."""
    plan = formatted_plan(df)
    for ln in plan.splitlines():
        # table_fragment must match THIS ReadSchema line (its column set),
        # not just appear anywhere in the plan — multi-scan plans would
        # otherwise assert against the wrong scan.
        if "ReadSchema" in ln and (not table_fragment or table_fragment in ln):
            struct = ln.split("struct<", 1)[-1]
            ncols = struct.count(":")
            assert ncols <= max_cols, f"scan reads {ncols} columns (> {max_cols}): {ln.strip()}"
            return
    raise AssertionError(f"no ReadSchema matching {table_fragment!r} found in plan:\n{plan}")


def assert_broadcast_join(df: DataFrame, expect: bool = True):
    plan = formatted_plan(df)
    has = "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert has == expect, f"broadcast join {'missing' if expect else 'unexpected'}:\n{plan[:4000]}"


def assert_partial_aggregation(df: DataFrame):
    """Partial (map-side) + final hash aggregation present — the combiner
    lifting the reference implements manually (translations.lift_combiners,
    ray_fn_runner.py:178) and Spark plans automatically."""
    plan = formatted_plan(df)
    assert plan.count("HashAggregate") >= 2 or "partial" in plan, (
        f"no partial/final aggregate split:\n{plan[:4000]}"
    )


def assert_whole_stage_codegen(df: DataFrame):
    # AQE reports 0 codegen subtrees until the adaptive plan is finalized —
    # execute this exact plan once (collect, not count: count builds a
    # separate queryExecution), then inspect the final *(N) markers.
    df.collect()
    plan = physical_plan(df)
    assert "*(" in plan or "WholeStageCodegen" in plan, (
        f"no whole-stage codegen span in final plan:\n{plan[:2000]}"
    )


import re as _re


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (lower = better;
    every groupBy/join/repartition pays one). Counts the formatted-plan
    details entries '(N) Exchange' once each; broadcast exchanges and
    reused exchanges excluded."""
    plan = formatted_plan(df)
    return len(_re.findall(r"\(\d+\) Exchange$", plan, flags=_re.MULTILINE))


def optimized_logical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()  # noqa: SLF001


def shuffle_key_structure(df: DataFrame) -> dict:
    """The plan's repartitioning structure, read from the OPTIMIZED
    logical plan (post pushdown/pruning/decorrelation, pre physical
    planning, so the answer is the same whatever layout the tables were
    scanned from):

    - ``groupings``: column names in Aggregate grouping lists and
      Window partition specs — a bucketed layout on such a column
      elides that exchange with no partner table needed;
    - ``join_pairs``: the {left, right} column-name pairs of Join
      equality conditions — an exchange-free join needs BOTH sides
      served with the same partitioning, which is what
      queries.route_query's pairing rule checks (measured x100: a
      ONE-sided bucketed join drops its exchange but nets a LOSS —
      q_order_count_dist 2.14 -> 3.72 s routed through a lone custkey
      layout — because the hash-scattered scan costs more than the one
      exchange saved; the co-located two-sided form wins 2-3x).

    Heuristic by design: an aliased/derived key column won't match
    (routes plain — the safe direction), and a grouping on an
    EXPRESSION of the key matches even though bucketing can't serve it
    (routes bucketed — the cost is one scan trade, never
    correctness)."""
    groupings: set[str] = set()
    pairs: set[frozenset] = set()
    attr = r"([A-Za-z_][A-Za-z0-9_]*)#\d+"
    for ln in optimized_logical_plan(df).splitlines():
        s = ln.lstrip(" +-:|")
        if s.startswith("Join "):
            for a, b in _re.findall(rf"\({attr}L? = {attr}L?\)", s):
                pairs.add(frozenset((a, b)))
        elif s.startswith("Aggregate ["):
            frag = s[len("Aggregate ") :].split("]", 1)[0]  # grouping list
            groupings.update(_re.findall(attr, frag))
        elif s.startswith("Window ["):
            groupings.update(_re.findall(attr, s))
    return {"groupings": groupings, "join_pairs": pairs}


def _paren_balanced(s: str) -> bool:
    depth = 0
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return False
    return depth == 0


def _split_top_and(cond: str) -> list[str]:
    """Split a printed boolean condition on top-level ``AND`` only —
    paren depth is tracked so disjunction branches stay intact."""
    parts: list[str] = []
    depth = start = i = 0
    while i < len(cond):
        ch = cond[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and cond.startswith(" AND ", i):
            parts.append(cond[start:i])
            i += 5
            start = i
            continue
        i += 1
    parts.append(cond[start:])
    return parts


def _conjuncts(cond: str) -> list[str]:
    """Flatten a printed condition into its top-level AND conjuncts,
    recursing through nested ``((a) AND (b))`` parenthesization. An OR
    disjunction (or any other non-AND composite) comes back as ONE
    opaque conjunct — callers matching simple atoms will reject it."""
    cond = cond.strip()
    while (
        cond.startswith("(")
        and cond.endswith(")")
        and _paren_balanced(cond[1:-1])
    ):
        cond = cond[1:-1].strip()
    parts = _split_top_and(cond)
    if len(parts) == 1:
        return [cond]
    out: list[str] = []
    for p in parts:
        out.extend(_conjuncts(p))
    return out


def scan_range_predicates(df: DataFrame) -> dict[str, list[tuple[str, str]]]:
    """Pushable comparisons on base columns, read from the optimized
    plan's Filter nodes: ``{column: [(op, literal_string), ...]}``.
    Conditions are flattened to their TOP-LEVEL AND conjuncts first
    (paren-depth aware — r15 ADVICE: a comparison inside an OR/NOT
    disjunction is NOT a pushable conjunct and is dropped whole), then
    only simple atoms are collected — the forms parquet row-group
    min/max stats can act on:

    - ``col OP literal`` for OP in ``> >= < <= =``;
    - ``col IN (a,b,c)`` / ``col INSET a, b, c`` → ``("in", "a,b,c")``
      (rowgroup_survival keeps a row group when ANY point intersects
      its [min,max]).

    ``isnotnull`` guards and expression-wrapped columns are ignored.
    Columns are keyed by bare name (no table qualification) — a
    heuristic: a same-named column on another table can contribute
    predicates, costing at worst a scan trade via the router's
    survival gate, never correctness. queries.route_query uses this to
    prefer a layout SORTED WITHIN buckets by a filtered column;
    sources.bucketed.rowgroup_survival turns the predicates into an
    estimated surviving-row-group fraction from parquet footers."""
    preds: dict[str, list[tuple[str, str]]] = {}
    attr = r"([A-Za-z_][A-Za-z0-9_]*)#\d+L?"
    for ln in optimized_logical_plan(df).splitlines():
        s = ln.lstrip(" +-:|")
        if not s.startswith("Filter "):
            continue
        for conj in _conjuncts(s[len("Filter ") :]):
            m = _re.fullmatch(rf"{attr} (>=|<=|=|>|<) ([^()]+)", conj)
            if m:
                preds.setdefault(m.group(1), []).append(
                    (m.group(2), m.group(3).strip())
                )
                continue
            m = _re.fullmatch(rf"{attr} IN \(([^()]+)\)", conj) or _re.fullmatch(
                rf"{attr} INSET ([^()]+)", conj
            )
            if m:
                if "..." in m.group(2):  # plan truncates long INSETs
                    continue
                items = ",".join(x.strip() for x in m.group(2).split(","))
                preds.setdefault(m.group(1), []).append(("in", items))
    return preds


def relation_print_order(df: DataFrame) -> list[str]:
    """Base-relation identifiers in the OPTIMIZED plan's print order —
    depth-first, so for a join tree the innermost (first-joined) leaves
    print before later ones. Catalog relations come back as their table
    name; path relations as their first column name (a usable proxy for
    this repo's prefixed schemas). Lets tests assert JOIN ORDER: e.g.
    after enable_stats, a dims-last-declared Q5 must print nation/region
    before lineitem (CBO reordered), where the declared order prints
    lineitem first."""
    out: list[str] = []
    for ln in optimized_logical_plan(df).splitlines():
        s = ln.lstrip(" +-:|")
        if not s.startswith("Relation "):
            continue
        m = _re.match(r"Relation ([\w.]+)\[([A-Za-z_][A-Za-z0-9_]*)", s)
        if m:
            out.append(m.group(1).rsplit(".", 1)[-1])
        else:
            m = _re.match(r"Relation \[([A-Za-z_][A-Za-z0-9_]*)", s)
            out.append(m.group(1) if m else "?")
    return out


def _relation_id(stripped_line: str) -> str:
    """Relation identifier for a printed ``Relation ...`` plan line —
    the catalog table name when present, else the first column name
    (relation_print_order's scheme)."""
    m = _re.match(r"Relation ([\w.]+)\[([A-Za-z_][A-Za-z0-9_]*)", stripped_line)
    if m:
        return m.group(1).rsplit(".", 1)[-1]
    m = _re.match(r"Relation \[([A-Za-z_][A-Za-z0-9_]*)", stripped_line)
    return m.group(1) if m else "?"


def filtered_relations(df: DataFrame) -> list[str]:
    """Base relations that carry a SELECTIVE filter in the optimized
    plan — a Filter in their unary chain (Project/Filter nodes between
    the relation leaf and its nearest multi-child ancestor) with any
    conjunct beyond ``isnotnull`` null guards. Identifiers match
    relation_print_order.

    Consumer: queries.route_query's CBO-reorder acceptance gate.
    Catalyst's FilterEstimation returns no estimate for non-sargable
    predicates (``p_name LIKE '%red%'`` prints as ``Contains``), so
    under stats its join reordering can DEMOTE a filtered dim the
    declared order joins early — measured +40% on the Q9 shape at x100
    (scripts/explore_bloom_cbo.py). A reorder that moves any of THESE
    relations later than the author placed them is evidence the cost
    model missed their reduction."""
    lines: list[tuple[int, str]] = []
    for ln in optimized_logical_plan(df).splitlines():
        s = ln.lstrip(" +-:|")
        lines.append((len(ln) - len(s), s))
    out: list[str] = []
    for i, (indent, s) in enumerate(lines):
        if not s.startswith("Relation"):
            continue
        cur = indent
        selective = False
        for j in range(i - 1, -1, -1):
            pj, sj = lines[j]
            if pj >= cur:
                continue  # a sibling subtree's node, not an ancestor
            cur = pj
            if sj.startswith("Filter "):
                cond = sj[len("Filter ") :]
                if any(
                    not _re.fullmatch(r"isnotnull\([^()]*\)", c.strip())
                    for c in _conjuncts(cond)
                ):
                    selective = True
            elif not sj.startswith("Project"):
                break  # Join/Aggregate/...: left the unary chain
        if selective:
            out.append(_relation_id(s))
    return out


def shuffle_key_columns(df: DataFrame) -> set[str]:
    """Flat union of shuffle_key_structure's columns (grouping keys +
    both sides of every join-equality pair)."""
    st = shuffle_key_structure(df)
    cols = set(st["groupings"])
    for p in st["join_pairs"]:
        cols |= p
    return cols
