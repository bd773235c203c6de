"""Event-time windowing on the DataFrame surface (SURVEY.md §2.2
WindowInto; reference translator.py:393-416, tests 880-908).

Beam-API windowing (incl. custom merging WindowFns and the numeric-
timestamp envelope) lives in :mod:`ray_beam_runner_spark.windowing` +
:meth:`PCollection.window_into`; these helpers are the timestamp-column
shapes used directly on DataFrames and in Structured Streaming.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling(df: DataFrame, ts_col: str, duration: str, *group_cols: str):
    """Fixed windows: groupBy(window(ts, d), keys). Works identically on
    batch and streaming DataFrames (add withWatermark upstream for
    streams)."""
    return df.groupBy(F.window(ts_col, duration).alias("w"), *group_cols)


def sliding(df: DataFrame, ts_col: str, duration: str, slide: str, *group_cols: str):
    return df.groupBy(F.window(ts_col, duration, slide).alias("w"), *group_cols)


def session(df: DataFrame, ts_col: str, gap: str, *group_cols: str):
    """Session windows: native session_window merges per grouping key
    (GroupAlsoByWindow for sessions — reference runs a Beam DoFn for this,
    overrides.py:72-79)."""
    return df.groupBy(*group_cols, F.session_window(ts_col, gap).alias("w"))


def custom_merging_sessions(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    assign_fn,
    merge_fn,
    agg_fn,
    schema: str,
) -> DataFrame:
    """Custom merging WindowFn on a timestamp column: per-key applyInPandas
    assigns proto-windows (assign_fn(ts) -> [(start, end)]), merges them
    (merge_fn), then aggregates each merged window's rows with
    agg_fn(window, pdf) -> dict. The arbitrary-merge analog of
    ray_runner_test.py:2028-2047 for plain DataFrames."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pdf[ts_col].astype("int64") / 1e9
        protos = []
        for t in ts:
            protos.extend(assign_fn(float(t)))
        merged = merge_fn(protos)

        def locate(t: float):
            for s, e in merged:
                for ps, pe in assign_fn(t):
                    if s <= ps and pe <= e:
                        return (s, e)
            raise AssertionError("merge did not cover element")

        buckets: dict = {}
        for i, t in enumerate(ts):
            buckets.setdefault(locate(float(t)), []).append(i)
        rows = []
        for (s, e), idxs in buckets.items():
            row = {c: pdf[c].iloc[idxs[0]] for c in key_cols}
            row.update({"win_start": s, "win_end": e})
            row.update(agg_fn((s, e), pdf.iloc[idxs]))
            rows.append(row)
        return pd.DataFrame(rows)

    return df.groupBy(*key_cols).applyInPandas(run, schema)
