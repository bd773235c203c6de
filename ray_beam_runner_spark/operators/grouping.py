"""Grouping / aggregation operators (SURVEY.md §2.3).

Reference: GroupByKey decomposition `overrides.py:84-90`, hash-regroup
`translator.py:341-390`, combiner lifting via Beam's optimizer
(`ray_fn_runner.py:177-178`) — all of which Spark's partial/final hash
aggregation plans natively.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_by_key(df: DataFrame, key_cols: Sequence[str], value_col: str) -> DataFrame:
    """GBK → (keys..., values array). The sort/serialize of the collected
    list belongs in a post-aggregation projection: mixing declarative aggs
    with collect_list inside one .agg() pushes ObjectHashAggregate into its
    sort-based fallback (~9x slower measured at sf0.1)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.collect_list(value_col).alias("values"))
        .select(*key_cols, "values", F.size("values").cast("long").alias("n"))
    )


def combine_per_key(df: DataFrame, key_cols: Sequence[str], *agg_exprs: Column) -> DataFrame:
    """CombinePerKey with packed combiners: one .agg() with N expressions
    runs all combiners in a single pass with automatic partial/final split
    (reference needs pack_combiners + lift_combiners phases for this)."""
    return df.groupBy(*key_cols).agg(*agg_exprs)


def combine_globally(df: DataFrame, *agg_exprs: Column) -> DataFrame:
    return df.agg(*agg_exprs)


def cogroup_apply(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    fn: Callable[[pd.DataFrame, pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """CoGroupByKey with arbitrary Python combine: both sides shuffle once
    on the key, the user fn sees the two per-key pandas groups (reference
    expands CoGBK to Flatten+GBK; Spark cogroups directly)."""

    def kernel(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        return fn(lpdf, rpdf)

    return left.groupBy(*key_cols).cogroup(right.groupBy(*key_cols)).applyInPandas(kernel, schema)


def cogroup_counts(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """Expression-only CoGBK for the common count/agg case: per-side
    pre-aggregation then full outer join — the shuffle carries one row per
    key per side instead of every element (used by q_cogroup)."""
    l_agg = left.groupBy(key).agg(F.count(F.lit(1)).alias("n_left"))
    r_agg = right.groupBy(key).agg(F.count(F.lit(1)).alias("n_right"))
    return (
        l_agg.join(r_agg, key, "full_outer")
        .select(
            key,
            F.coalesce("n_left", F.lit(0)).alias("n_left"),
            F.coalesce("n_right", F.lit(0)).alias("n_right"),
        )
    )
