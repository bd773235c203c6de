"""Session-level registry for DataFrames persisted inside library operators.

Operators that must persist an intermediate (e.g. the shingle-postings pass
shared by MinHash signature generation and candidate verification in
``functions.dedup.minhash_lsh_pairs``) return lazy DataFrames, so they cannot
unpersist before the caller consumes the result — and a leaked executor cache
measurably degrades later queries in long sessions. Instead of relying on
every caller to ``spark.catalog.clearCache()``, operators register the
persisted handle here and callers (bench harness, tests, services) release
them once results are materialized.

Mirrors ``Pipeline.release()`` (pipeline.py) for the Beam-model API; this
registry covers the standalone DataFrame-function library.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame, storage_level=None) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK unless overridden) and register the
    handle for a later :func:`release_tracked`. Returns the persisted df."""
    from pyspark import StorageLevel

    df = df.persist(storage_level or StorageLevel.MEMORY_AND_DISK)
    _TRACKED.append(df)
    return df


def track_persisted(df: DataFrame) -> DataFrame:
    """Register an ALREADY-persisted DataFrame for release_tracked()."""
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked DataFrame (best-effort; a stopped session
    just drops the handles). Returns how many were released."""
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 - session may already be stopped
            pass
    _TRACKED.clear()
    return n
