"""DuckDB-oracle differential harness (SURVEY.md §5 'our strategy').

Mirrors the driver's protocol (FIXTURES.md): run the Spark query and the
DuckDB oracle over the same parquet tables, canonicalize (sort columns by
name, sort rows, round doubles to 9 significant digits, timestamps as UTC
ISO), and compare values. Used by tests/ to catch mismatches before the
driver's CORRECTNESS gate does.
"""

from __future__ import annotations

import math
import os

import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_connect(sf_dir: str):
    """In-process DuckDB with the synthetic tables registered as views."""
    import duckdb

    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _round_sig(x: float, sig: int = 9) -> float:
    if x is None or (isinstance(x, float) and (math.isnan(x) or math.isinf(x))):
        return x
    if x == 0:
        return 0.0
    return float(f"{x:.{sig - 1}e}")


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    out = pdf.copy()
    out = out[sorted(out.columns)]
    for col in out.columns:
        s = out[col]
        if pd.api.types.is_float_dtype(s):
            out[col] = s.map(lambda v: _round_sig(v) if pd.notna(v) else None)
        elif pd.api.types.is_datetime64_any_dtype(s):
            dt = s.dt.tz_localize(None) if getattr(s.dt, "tz", None) is not None else s
            out[col] = dt.dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        else:
            out[col] = s.map(_canon_cell)
    out = out.astype(str)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def _canon_cell(v):
    if isinstance(v, float):
        return _round_sig(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(str(_canon_cell(x)) for x in v) + "]"
    return v


def _boundary_margin(pdf: pd.DataFrame, sig: int = 9) -> float | None:
    """Minimum RELATIVE distance of any float cell to its nearest
    9-significant-digit rounding boundary — the gate's latent-fragility
    metric (round-13 verdict: q_spj_merge's red row was unexplainable
    because nothing recorded how close values sat to a hash boundary).
    A margin near 0.5 is maximally safe; a margin ~1e-12 means an
    engine-order-of-summation wobble could flip the hashed digit.
    None when the frame has no finite float cells.

    Interpretation: the margin flags RISK only for values the two
    engines compute through independent float paths (big double sums,
    differing interpolation formulas). Columns produced by the exact
    DECIMAL protocol (queries/relational.py helpers) or by round(x, 6)
    of a small-error value are bit-identical on both sides, so a 0
    margin there (a decimal ending in 5 at the 10th significant digit,
    e.g. a .xx05 interpolated midpoint) is exact-on-boundary but
    unflippable."""
    import numpy as np

    worst: float | None = None
    # iterate POSITIONALLY: with duplicated column labels pdf[col]
    # returns a DataFrame and to_numpy(dtype=float) raises, turning a
    # green compare into a sweep exception (r14 ADVICE #5)
    for i in range(pdf.shape[1]):
        s = pdf.iloc[:, i]
        if not pd.api.types.is_float_dtype(s):
            continue
        a = s.to_numpy(dtype=float)
        a = np.abs(a[np.isfinite(a) & (a != 0)])
        if not len(a):
            continue
        # position of |x| within its last KEPT significant digit: the
        # round-to-nearest boundary sits at frac = 0.5 of that digit's
        # weight, so the margin is |frac - 0.5| (0 = on the boundary,
        # 0.5 = exactly representable, maximally safe).
        digit = 10.0 ** (np.floor(np.log10(a)) - sig + 1)
        frac = a / digit % 1.0
        m = float(np.min(np.abs(frac - 0.5)))
        worst = m if worst is None else min(worst, m)
    return worst


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    """Returns (match, message). Row count, column set, then value-frame.
    On a value mismatch the message names the differing COLUMNS and both
    sides' values (round-13 verdict ask 1c: a red gate row must be
    diagnosable from the artifact alone); on a match it reports the
    minimum float boundary margin so latent hash fragility is visible in
    every sweep artifact."""
    con = duckdb_connect(sf_dir)
    try:
        oracle_pdf = con.execute(oracle_sql).fetchdf()
    finally:
        con.close()
    spark_pdf = spark_df.toPandas()

    if len(spark_pdf) != len(oracle_pdf):
        return False, f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return False, f"columns: spark={s_cols} oracle={o_cols}"

    s_c, o_c = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    if s_c.equals(o_c):
        margin = _boundary_margin(spark_pdf)
        extra = "" if margin is None else f"; min 9-sig boundary margin {margin:.3g}"
        return True, f"ok ({len(s_c)} rows){extra}"
    neq = s_c != o_c
    diff_mask = neq.any(axis=1)
    n_diff = int(diff_mask.sum())
    diff_cols = [c for c in s_c.columns if bool(neq[c].any())]
    sample = pd.concat(
        [
            s_c[diff_mask].head(3)[diff_cols].add_prefix("spark_"),
            o_c[diff_mask].head(3)[diff_cols].add_prefix("oracle_"),
        ],
        axis=1,
    )
    return False, (
        f"{n_diff}/{len(s_c)} rows differ in columns {diff_cols}; sample:\n"
        f"{sample.to_string()}"
    )
