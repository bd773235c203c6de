"""Skew mitigation: salting for hot keys (SURVEY.md 'partitioning &
shuffle' design rules).

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; these operators cover the two patterns AQE cannot fix:

- a hash aggregation where one key holds a large share of all rows
  (``salted_aggregate``: two-phase partial→final over a deterministic
  salt, for re-aggregatable functions);
- a shuffle join whose build side is too big to broadcast while the probe
  side has hot keys (``salted_join``: probe rows deterministically salted,
  build rows replicated across the salt domain — fan-out × n_salts on the
  build side only).

The reference has no analog — its GBK funnels every key group through a
single GroupingBuffer merge (`/root/reference/ray_beam_runner/portability/
execution.py:268-291`), and its state lives in one actor, so hot keys
serialize there by construction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["add_salt", "salted_aggregate", "salted_join"]

# Aggregates that re-aggregate losslessly: final(fn) over partial(fn).
# count follows SQL count(col) semantics (NULLs skipped), matching the
# plain groupBy().agg(F.count(col)) it replaces.
_REAGG = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def add_salt(df: DataFrame, n_salts: int, *cols: str) -> DataFrame:
    """Deterministic salt in [0, n_salts): hash of ``cols`` (or of every
    column when none given). Deterministic so retried tasks salt
    identically — never use rand() for salts under speculative execution."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn("__salt", F.pmod(F.xxhash64(*basis), F.lit(n_salts)).cast("int"))


def salted_aggregate(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: groupBy(key, salt) partial →
    groupBy(key) final. ``aggs`` maps output name → (fn, input_col) with
    fn in {sum, count, min, max} (the losslessly re-aggregatable set;
    avg = sum/count composed by the caller).

    Spark's hash agg already does map-side partial aggregation, so this
    only wins when a hot key overwhelms its single final-stage reducer —
    the salt fans that key's final aggregation across n_salts reducers."""
    for name, (fn, _col) in aggs.items():
        if fn not in _REAGG:
            raise ValueError(f"{name}: {fn} is not losslessly re-aggregatable")
    salted = add_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[_REAGG[fn][0](col).alias(name) for name, (fn, col) in aggs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[_REAGG[fn][1](name).alias(name) for name, (fn, _col) in aggs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-tolerant equi-join: left rows get a deterministic salt, right
    rows replicate across all n_salts values, join keys become
    (key..., salt). A left hot key's rows spread over n_salts reducers
    instead of one. Right-side cost: x n_salts rows through the shuffle —
    use only when right is too large to broadcast but much smaller than
    left. Supports inner/left joins (right replication breaks right-outer
    semantics)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("salted_join supports inner/left joins only")
    on_cols = [on] if isinstance(on, str) else list(on)
    # Salt from ALL left columns, not the join key: a hot key's rows must
    # land on different salts to spread (identical full rows share one).
    l = add_salt(left, n_salts)
    r = right.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = l.join(r, [*on_cols, "__salt"], how)
    return out.drop("__salt")
