"""Snapshot column type widening (Delta type widening / Iceberg schema
evolution): int->bigint etc. with ZERO data rewritten — old files keep
their narrow physical type and promote at scan time under the pinned
wider schema. Everything downstream must stay consistent across the
boundary: merge, DV-delete, compact, CDC diff, time travel, CHECK
constraints, and — the subtle one — bloom point reads (xxhash64 is
type-sensitive, so pre-widen filters must be probed with the type they
hashed or they false-negative and silently drop rows)."""

import tempfile

import pytest
from pyspark.sql import functions as F

from ray_beam_runner_spark.sources import snapshots as snap
from ray_beam_runner_spark.sources.snapshots import widen_column_type

BIG = 2**40  # needs int64


def _tdir():
    return tempfile.mkdtemp(prefix="rbrs_widen_")


def test_widen_is_metadata_only_and_promotes_reads(spark):
    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(1, 10), (2, 20)], "k int, v int"),
        t, cluster_by=["k"], n_files=1,
    )
    files_before = snap.read_manifest(t, 1)["files"]
    v = widen_column_type(t, "v", "bigint")
    assert v == 2
    m = snap.read_manifest(t, 2)
    assert m["files"] == files_before  # zero rewrite
    assert m["op"] == "widen"
    df = snap.read_snapshot(spark, t)
    assert dict(df.dtypes)["v"] == "bigint"
    assert sorted((r.k, r.v) for r in df.collect()) == [(1, 10), (2, 20)]
    # time travel to the pre-widen version shows the narrow type
    old = snap.read_snapshot(spark, t, version=1)
    assert dict(old.dtypes)["v"] == "int"
    # idempotent no-op; illegal targets and narrowing are loud
    assert widen_column_type(t, "v", "bigint") == 2
    with pytest.raises(ValueError, match="not a lossless widening"):
        widen_column_type(t, "v", "int")
    with pytest.raises(ValueError, match="not a lossless widening"):
        widen_column_type(t, "v", "double")  # bigint->double is lossy
    with pytest.raises(ValueError, match="no column"):
        widen_column_type(t, "nope", "bigint")


def test_merge_dv_delete_compact_cdc_across_widen_boundary(spark):
    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(i, i * 10) for i in range(1, 7)], "k int, v int"),
        t, cluster_by=["k"], n_files=2,
    )
    widen_column_type(t, "v", "bigint")
    # post-widen MERGE carries a genuinely-int64 value into a mixed-
    # generation table (narrow parquet + wide parquet under one schema)
    snap.upsert_snapshot(
        spark, t,
        spark.createDataFrame([(2, BIG), (7, BIG + 1)], "k long, v long").select(
            F.col("k").cast("int"), "v"
        ),
        ["k"], cdc=True,
    )
    got = {r.k: r.v for r in snap.read_snapshot(spark, t).collect()}
    assert got[2] == BIG and got[7] == BIG + 1 and got[3] == 30
    # DV-delete across the boundary (no rewrite of narrow files)
    snap.delete_keys(
        spark, t, spark.createDataFrame([(4,)], "k int"), ["k"], dv=True, cdc=True
    )
    assert 4 not in {r.k for r in snap.read_snapshot(spark, t).collect()}
    # CDC diff spanning the widen commit: the widen itself contributes
    # nothing (no rows changed); the merge + delete deltas come back
    # with the widened type
    d = snap.snapshot_diff(spark, t, 1, snap.latest_version(t))
    changes = {(r.k, r.v, r._change) for r in d.collect()}
    assert (2, 20, "delete") in changes and (2, BIG, "insert") in changes
    assert (7, BIG + 1, "insert") in changes and (4, 40, "delete") in changes
    assert dict(d.dtypes)["v"] == "bigint"
    # compact materializes the widening (new files physically wide)
    snap.compact(spark, t, n_files=1)
    got2 = {r.k: r.v for r in snap.read_snapshot(spark, t).collect()}
    assert got2 == {k: v for k, v in got.items() if k != 4}
    # time travel to v1 still narrow and complete
    v1 = snap.read_snapshot(spark, t, version=1)
    assert dict(v1.dtypes)["v"] == "int" and v1.count() == 6


def test_bloom_point_reads_survive_widening(spark):
    """THE regression: pre-widen blooms hashed int; probing them with a
    bigint literal hashes to different positions and would prune every
    pre-widen file — silently losing rows. bloom_types records the
    hashed type per (file, column) and the probe honors it."""
    t = _tdir()
    rows = [(i, (i * 7919) % 1000) for i in range(200)]
    snap.write_snapshot(
        spark.createDataFrame(rows, "k int, v int"),
        t, cluster_by=["k"], n_files=6, bloom_for=["v"],
    )
    widen_column_type(t, "v", "bigint")
    m = snap.read_manifest(t, 2)
    # every filter-carrying file got stamped with the narrow type
    assert m.get("bloom_types"), "widen did not stamp bloom hash types"
    assert all(e.get("v") == "int" for e in m["bloom_types"].values())
    total = len(m["files"])
    pruned_any = False
    for i in (0, 17, 99, 123):
        want_v = (i * 7919) % 1000
        df = snap.read_snapshot(spark, t, point=("v", want_v))
        ks = sorted(r.k for r in df.collect())
        assert ks == sorted(j for j, w in rows if w == want_v), f"v={want_v} lost rows"
        pruned_any = pruned_any or len(df.inputFiles()) < total
    assert pruned_any, "bloom stopped pruning entirely"
    # post-widen merge: NEW files' blooms hash the wide type and carry
    # no stamp; old files keep theirs — mixed probing stays exact
    snap.upsert_snapshot(
        spark, t,
        spark.createDataFrame([(500, BIG)], "k int, v long"), ["k"],
    )
    hit = snap.read_snapshot(spark, t, point=("v", BIG)).collect()
    assert [(r.k, r.v) for r in hit] == [(500, BIG)]
    old_hit = snap.read_snapshot(spark, t, point=("v", (17 * 7919) % 1000))
    assert 17 in {r.k for r in old_hit.collect()}


def test_evolve_schema_merge_widens_in_flight(spark):
    """upsert_snapshot(evolve_schema=True) with a wider batch widens the
    logical schema in the same commit — rewrite mode and DV mode."""
    for dv in (False, True):
        t = _tdir()
        snap.write_snapshot(
            spark.createDataFrame([(1, 1.5), (2, 2.5)], "k int, v float"),
            t, cluster_by=["k"], n_files=1,
        )
        snap.upsert_snapshot(
            spark, t,
            spark.createDataFrame([(2, 1e300), (3, 3.5)], "k int, v double"),
            ["k"], evolve_schema=True, dv=dv,
        )
        df = snap.read_snapshot(spark, t)
        assert dict(df.dtypes)["v"] == "double", f"dv={dv}"
        got = {r.k: r.v for r in df.collect()}
        assert got[2] == 1e300 and got[1] == 1.5 and got[3] == 3.5


def test_type_guard_is_loud(spark):
    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(1, 10)], "k int, v int"), t,
    )
    # wider batch without evolve_schema: actionable error
    with pytest.raises(ValueError, match="evolve_schema=True to widen"):
        snap.upsert_snapshot(
            spark, t, spark.createDataFrame([(2, BIG)], "k int, v long"), ["k"]
        )
    # incompatible type: loud even WITH evolve_schema
    with pytest.raises(ValueError, match="incompatible"):
        snap.upsert_snapshot(
            spark, t,
            spark.createDataFrame([(2, "x")], "k int, v string"),
            ["k"], evolve_schema=True,
        )
    # NARROWER batch is fine (the written file promotes at read)
    widen_column_type(t, "v", "bigint")
    snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(2, 20)], "k int, v int"), ["k"]
    )
    assert {(r.k, r.v) for r in snap.read_snapshot(spark, t).collect()} == {
        (1, 10), (2, 20)
    }


def test_check_constraints_enforced_across_widen(spark):
    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(1, 10)], "k int, v int"),
        t, constraints={"v_pos": "v > 0"},
    )
    widen_column_type(t, "v", "bigint")
    assert snap.read_manifest(t, 2)["constraints"] == {"v_pos": "v > 0"}
    # still enforced on post-widen merges, now over int64 values
    with pytest.raises(ValueError, match="v_pos"):
        snap.upsert_snapshot(
            spark, t, spark.createDataFrame([(2, -BIG)], "k int, v long"), ["k"]
        )
    snap.upsert_snapshot(
        spark, t, spark.createDataFrame([(2, BIG)], "k int, v long"), ["k"]
    )
    assert {r.v for r in snap.read_snapshot(spark, t).collect()} == {10, BIG}


def test_widen_composes_with_column_mapping(spark):
    """rename -> widen -> merge: per-generation physical schemas take
    the widened logical type, so all three file generations read as one
    frame."""
    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(1, 10), (2, 20)], "k int, cnt int"),
        t, cluster_by=["k"], n_files=1,
    )
    snap.rename_column(t, "cnt", "total")
    widen_column_type(t, "total", "bigint")
    snap.upsert_snapshot(
        spark, t,
        spark.createDataFrame([(3, BIG)], "k int, total long"), ["k"],
    )
    df = snap.read_snapshot(spark, t)
    assert dict(df.dtypes)["total"] == "bigint"
    assert sorted((r.k, r.total) for r in df.collect()) == [
        (1, 10), (2, 20), (3, BIG)
    ]
    # pre-rename version: old name, narrow type
    v1 = snap.read_snapshot(spark, t, version=1)
    assert dict(v1.dtypes)["cnt"] == "int"


def test_widen_decimal_and_date(spark):
    """The non-scalar widenings: decimal precision/scale growth (no
    integral or fractional digits lost) and date -> timestamp_ntz —
    both metadata-only, both promoted at scan time."""
    import datetime
    from decimal import Decimal

    t = _tdir()
    snap.write_snapshot(
        spark.sql(
            "SELECT 1 AS k, CAST(1.25 AS DECIMAL(10,2)) AS amt, "
            "CAST('2024-03-05' AS DATE) AS d"
        ),
        t,
    )
    files = snap.read_manifest(t, 1)["files"]
    widen_column_type(t, "amt", "decimal(20,4)")
    widen_column_type(t, "d", "timestamp_ntz")
    m = snap.read_manifest(t, 3)
    assert m["files"] == files  # still zero rewrite
    df = snap.read_snapshot(spark, t)
    assert dict(df.dtypes) == {"k": "int", "amt": "decimal(20,4)", "d": "timestamp_ntz"}
    row = df.first()
    assert row.amt == Decimal("1.2500")
    assert row.d == datetime.datetime(2024, 3, 5, 0, 0)
    # shrinking digits is loud in both dimensions
    with pytest.raises(ValueError, match="not a lossless widening"):
        widen_column_type(t, "amt", "decimal(20,2)")  # scale 4->2: fractional digits lost
    with pytest.raises(ValueError, match="not a lossless widening"):
        widen_column_type(t, "amt", "decimal(10,4)")  # p-s 16->6: integral digits lost
    # post-widen merge with the wide types round-trips
    snap.upsert_snapshot(
        spark, t,
        spark.sql(
            "SELECT 2 AS k, CAST(123456789012345.6789 AS DECIMAL(20,4)) AS amt, "
            "CAST('2024-03-05 12:34:56' AS TIMESTAMP_NTZ) AS d"
        ),
        ["k"],
    )
    got = {r.k: (r.amt, r.d) for r in snap.read_snapshot(spark, t).collect()}
    assert got[2][0] == Decimal("123456789012345.6789")
    assert got[1][0] == Decimal("1.2500")


def test_unrepresentable_probe_cached_once_per_type(spark, monkeypatch):
    """Round-11 advice (low): a point value unrepresentable in a file's
    hashed type caches a None probe result; the probe job must run once
    per distinct bloom TYPE, not once per file of that type."""
    t = _tdir()
    snap.write_snapshot(
        spark.createDataFrame([(i, i) for i in range(40)], "k int, v int"),
        t, cluster_by=["k"], n_files=4, bloom_for=["v"],
    )
    widen_column_type(t, "v", "bigint")
    calls = []
    real = snap._bloom_probe

    def counting(*a, **kw):
        calls.append(a)
        return real(*a, **kw)

    monkeypatch.setattr(snap, "_bloom_probe", counting)
    # BIG fits bigint but not the int the 4 pre-widen files hashed:
    # every file prunes, and the None verdict is computed exactly once
    out = snap.read_snapshot(spark, t, point=("v", BIG)).collect()
    assert out == []
    assert len(calls) == 1
