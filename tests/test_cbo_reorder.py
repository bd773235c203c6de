"""Engine-level join reordering (round 16, r15 verdict ask #1):
queries.enable_stats registers ANALYZE'd catalog tables and turns on
cost-based join reordering, so a query declared with the WORST join
order (facts first, dims last) plans dim-first with NO query change —
the decision the round-15 hand-rewrites (queries/relational.py
q_local_supplier_volume doc) made per-query now belongs to the engine.

Reference analog: none — the reference executes DoFns in declaration
order (ray_beam_runner/portability/execution.py); join ordering is a
capability only a planner-backed engine can offer.
"""

import os

import pytest
from pyspark.sql import functions as F

from ray_beam_runner_spark import queries as Q
from ray_beam_runner_spark.plans.explain import relation_print_order
from ray_beam_runner_spark.queries import t


def _dims_last_q5(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("n_name")
    )


TABLES = ["region", "nation", "customer", "supplier", "orders", "lineitem"]


@pytest.fixture()
def stats_scope(spark, sf_dir):
    yield
    Q.disable_stats(spark, sf_dir)
    if hasattr(spark, "_rbrs_tables"):
        spark._rbrs_tables.clear()


def test_cbo_reorders_dims_last_declaration(spark, sf_dir, stats_scope):
    """The headline assertion: WITHOUT stats the optimized plan keeps
    the declared order (lineitem innermost/first); WITH stats Catalyst
    reorders so nation/region join BEFORE lineitem — and the rows are
    identical (reordering is plan, never semantics)."""
    plain = _dims_last_q5(spark, sf_dir)
    order0 = relation_print_order(plain)
    # path relations print as their first column name (proxy)
    assert order0[0].startswith("l_"), order0  # declared: lineitem first

    Q.enable_stats(spark, sf_dir, tables=TABLES)
    if hasattr(spark, "_rbrs_tables"):
        spark._rbrs_tables.clear()
    routed = _dims_last_q5(spark, sf_dir)
    order1 = relation_print_order(routed)
    li_at = next(i for i, r in enumerate(order1) if r.endswith("lineitem"))
    dim_at = [
        i for i, r in enumerate(order1) if r.endswith(("nation", "region"))
    ]
    assert dim_at and max(dim_at) < li_at, order1
    assert sorted(map(tuple, routed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_stats_serving_is_scoped_and_reversible(spark, sf_dir, stats_scope):
    """t() serves catalog relations only while the registration is
    live; disable_stats returns to path reads (and flips CBO off)."""
    Q.enable_stats(spark, sf_dir, tables=["orders"])
    if hasattr(spark, "_rbrs_tables"):
        spark._rbrs_tables.clear()
    df = t(spark, sf_dir, "orders")
    assert any("rbrs_" in r for r in relation_print_order(df))
    # normalized schema matches the path read exactly
    from ray_beam_runner_spark.session import read_parquet_normalized

    p = read_parquet_normalized(spark, os.path.join(sf_dir, "orders.parquet"))
    assert df.schema == p.schema
    Q.disable_stats(spark, sf_dir)
    spark._rbrs_tables.clear()
    df2 = t(spark, sf_dir, "orders")
    assert not any("rbrs_" in r for r in relation_print_order(df2))
    assert spark.conf.get("spark.sql.cbo.enabled") == "false"


def test_runtime_bloom_gates_scale_with_corpus(spark, sf_dir, stats_scope):
    """enable_stats scales the runtime bloom-filter injection gates to
    the registered corpus (the stock 10 GB scan gate disables injection
    on any sub-10GB replica — exactly the dim-filtered fact prune a
    100 TB deployment gets for free); disable_stats restores stock."""
    scan_key = (
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold"
    )
    create_key = "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
    Q.enable_stats(spark, sf_dir, tables=["orders", "lineitem"])
    biggest = max(
        os.path.getsize(os.path.join(sf_dir, f"{tb}.parquet"))
        for tb in ("orders", "lineitem")
    )
    expect = Q._bloom_confs_for(biggest)
    assert spark.conf.get(scan_key) == expect[scan_key]
    assert spark.conf.get(create_key) == expect[create_key]
    # clamped to the floor on tiny corpora, never above stock
    assert 32 << 20 <= int(expect[scan_key]) <= 10 << 30
    assert 10 << 20 <= int(expect[create_key]) <= 256 << 20
    Q.disable_stats(spark, sf_dir)
    if hasattr(spark, "_rbrs_tables"):
        spark._rbrs_tables.clear()
    assert spark.conf.get(scan_key) == "10GB"
    assert spark.conf.get(create_key) == "10MB"


def test_layout_override_beats_stats_table(spark, sf_dir, stats_scope):
    """A registered bucketed LAYOUT takes precedence over the stats
    catalog table: scan-reported partitioning is worth more than a
    reorder for routed shapes."""
    import tempfile

    from ray_beam_runner_spark.sources import bucketed as bkt

    Q.enable_stats(spark, sf_dir, tables=["orders"])
    d = tempfile.mkdtemp(prefix="rbrs_cbo_lay_")
    bkt.write_bucketed(t(spark, sf_dir, "orders"), d, ["o_orderkey"], 2)
    Q.register_layout(sf_dir, "orders", d)
    spark._rbrs_tables.clear()
    try:
        df = t(spark, sf_dir, "orders")
        pl = "\n".join(relation_print_order(df))
        assert bkt._reg_name(d, 1) in pl or "rbrs_" not in pl
    finally:
        Q.clear_layouts()
        spark._rbrs_tables.clear()


def test_gate_query_q_cbo_star_join(spark, sf_dir):
    """The registry gate query end-to-end at the test SF: plan-asserted
    reorder + 5 Asia nations out."""
    df = Q.QUERIES["q_cbo_star_join"](spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 5
    assert [f.name for f in df.schema.fields] == ["n_name", "revenue"]


# ---------------------------------------------------------------------------
# Round-16: per-query CBO reorder acceptance gate (r15 verdict ask #2 —
# the x100 measurement found Catalyst's reorder REGRESSES shapes whose
# filtered relation carries a non-sargable predicate it cannot
# estimate; route_query now probes declared vs CBO order and pins the
# declared order when a filtered non-broadcastable relation demotes).
# ---------------------------------------------------------------------------


def test_filtered_relations_plan_parse(spark, sf_dir):
    """Selective filters are attributed to their base relation through
    the Project/Filter unary chain; isnotnull guards alone don't count."""
    from ray_beam_runner_spark.plans.explain import filtered_relations

    # Q9: only part carries a selective filter (p_name LIKE '%red%')
    fr = filtered_relations(Q.QUERIES["q_product_profit"](spark, sf_dir))
    assert any(r.startswith("p_") or r.endswith("part") for r in fr), fr
    assert not any(r.startswith("s_") for r in fr), fr
    # Q10: lineitem (returnflag) AND orders (date range) both filtered
    fr10 = filtered_relations(Q.QUERIES["q_returned_items"](spark, sf_dir))
    assert len(fr10) >= 2, fr10


def test_size_bytes_parse():
    assert Q._size_bytes("10m") == 10 * 1024 * 1024
    assert Q._size_bytes("64MB") == 64 * 1024 * 1024
    assert Q._size_bytes("1k") == 1024
    assert Q._size_bytes("-1") == -1
    assert Q._size_bytes("1048576b") == 1048576


def test_reorder_gate_accepts_promotion(spark, sf_dir, stats_scope):
    """The dims-last Q5 clone promotes its filtered region dim under
    CBO — the gate must accept, and route_query must serve the
    REORDERED plan (dims before lineitem)."""
    Q.enable_stats(spark, sf_dir, tables=TABLES)
    spark._rbrs_tables.clear()
    name = "q_local_supplier_volume"
    df = Q.route_query(spark, sf_dir, name)
    rr = Q._ROUTE_REORDER[(os.path.abspath(sf_dir), name)]
    assert rr["accepted"], rr
    assert rr["blocking"] == [], rr
    ex = Q.route_explain(spark, sf_dir, name)
    assert ex["cbo_reorder"]["accepted"] is True
    assert df.count() > 0


def test_reorder_gate_blocks_fact_demotion(spark, sf_dir, stats_scope):
    """With the broadcast exemption disabled (threshold -1 makes every
    relation non-broadcastable), ANY demoted filtered relation blocks —
    route_query then pins the DECLARED order: the served plan's
    relation order must equal the reorder-off order, not the CBO one."""
    Q.enable_stats(spark, sf_dir, tables=TABLES + ["part"])
    spark._rbrs_tables.clear()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        name = "q_product_profit"
        df = Q.route_query(spark, sf_dir, name)
        rr = Q._ROUTE_REORDER[(os.path.abspath(sf_dir), name)]
        if rr["demoted"]:
            # Catalyst demoted a filtered relation: gate must block and
            # the served order must match the declared one
            assert not rr["accepted"], rr
            assert rr["blocking"] == rr["demoted"], rr
            assert relation_print_order(df) == rr["declared_order"], (
                relation_print_order(df),
                rr,
            )
        else:
            # stats at this SF produced no demotion — the gate is then
            # a no-op accept by design
            assert rr["accepted"], rr
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_reorder_gate_broadcast_exemption(spark, sf_dir, stats_scope):
    """Same query, default (generous) broadcast threshold: a demoted
    dim small enough to broadcast is exempt, so the reorder is accepted
    even when Catalyst moved the filtered part dim later."""
    Q.enable_stats(spark, sf_dir, tables=TABLES + ["part"])
    spark._rbrs_tables.clear()
    name = "q_product_profit"
    Q.route_query(spark, sf_dir, name)
    rr = Q._ROUTE_REORDER[(os.path.abspath(sf_dir), name)]
    assert rr["accepted"], rr
    assert rr["blocking"] == [], rr


def test_reorder_pin_survives_conf_flip(spark, sf_dir, stats_scope):
    """route_query pins the decided join order by forcing the optimized
    plan while its conf holds — flipping the session conf afterwards
    must not re-order the returned DataFrame."""
    Q.enable_stats(spark, sf_dir, tables=TABLES)
    spark._rbrs_tables.clear()
    name = "q_local_supplier_volume"
    df = Q.route_query(spark, sf_dir, name)
    order_before = relation_print_order(df)
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    try:
        assert relation_print_order(df) == order_before
    finally:
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
