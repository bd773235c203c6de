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


_table_cache: dict[tuple[int, str], DataFrame] = {}


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a synthetic table. The (immutable) DataFrame handle is cached
    per (session, path): repeated reads re-open parquet footers through the
    JVM (~100 ms per query build) for identical plans."""
    from ray_beam_runner_spark.session import read_parquet_normalized

    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (id(spark), path)
    if key not in _table_cache:
        _table_cache[key] = read_parquet_normalized(spark, path)
    return _table_cache[key]


# Import for registration side effects (order = SURVEY §2 build order).
from ray_beam_runner_spark.queries import relational  # noqa: E402,F401
from ray_beam_runner_spark.queries import llm  # noqa: E402,F401
from ray_beam_runner_spark.queries import streaming_q  # noqa: E402,F401
from ray_beam_runner_spark.queries import scalars  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLE", "query", "t"]
