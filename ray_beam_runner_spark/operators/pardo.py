"""Element-wise operators on the DataFrame surface (SURVEY.md §2.2).

Reference: ParDo/DoFn execution at `translator.py:157-338` (batch DoFn
invoker 283-326), tagged-output demux at `translator.py:559-576`.

The Beam-API equivalents live in :mod:`ray_beam_runner_spark.pipeline`;
these are the DataFrame-native shapes: expressions first (Catalyst sees
through them — the single biggest architectural win over the reference's
opaque Python, SURVEY §4.1), Arrow-batched Python only when genuinely
needed.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def select_map(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Map as projection — the expression fast path for 1→1 transforms."""
    return df.select(*cols)


def flat_map_explode(df: DataFrame, array_col: Column, alias: str, keep: list[str] | None = None) -> DataFrame:
    """FlatMap as explode of an array expression (1→N, zero Python)."""
    return df.select(*(keep or df.columns), F.explode(array_col).alias(alias))


def map_in_arrow(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    setup: Callable[[], object] | None = None,
    teardown: Callable[[object], None] | None = None,
) -> DataFrame:
    """Opaque-Python ParDo: Arrow-batched mapInPandas with the DoFn
    lifecycle — ``setup()`` once per task before the first batch (model
    load, codec init), ``teardown`` after the last (reference lifecycle:
    translator.py:283-326)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = setup() if setup else None
        try:
            for pdf in batches:
                out = fn(pdf) if ctx is None else fn(pdf, ctx)  # type: ignore[call-arg]
                if out is not None and len(out):
                    yield out
        finally:
            if teardown:
                teardown(ctx)

    return df.mapInPandas(kernel, schema=schema)


class TaggedViews(dict):
    """dict of tag → DataFrame that owns the persisted parent; call
    .release() when the views are no longer needed."""

    def __init__(self, views: dict, parent: DataFrame | None):
        super().__init__(views)
        self._parent = parent

    def release(self):
        if self._parent is not None:
            self._parent.unpersist()
            self._parent = None


def tagged_outputs(df: DataFrame, tag_col: str, tags: Iterable[str], persist: bool = True) -> TaggedViews:
    """Multi-output demux: one pass computes a tag column; each tagged view
    filters it (reference TaggingReceiver translator.py:180-206 + demux
    559-576). ``persist`` caches the parent so N views cost one upstream
    computation instead of N — call ``.release()`` on the result when done
    (pinned caches degrade later queries in long sessions)."""
    src = df.persist() if persist else df
    return TaggedViews(
        {tag: src.filter(F.col(tag_col) == tag).drop(tag_col) for tag in tags},
        src if persist else None,
    )
