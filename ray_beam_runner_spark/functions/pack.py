"""Length-aware sequence packing: first-fit-decreasing bin packing per
domain (r8 verdict ask #7).

q_sequence_pack's concat-then-split layout has zero padding but lets
documents straddle sequence boundaries (the loader must mask attention
across the cut). Production packing for models that want WHOLE
documents per sequence (no cross-doc attention) instead solves bin
packing: place each document into a fixed-capacity sequence so total
padding is minimized. First-fit-decreasing is the classic
approximation (Johnson 1973: FFD uses at most 11/9 OPT + 2/3 bins) and
is DETERMINISTIC given a deterministic order — here (length desc,
doc id asc), so every engine/run produces the identical assignment
(differentially pytest-checked against an independent implementation).

Scale shape (100 TB): packing is inherently sequential WITHIN a bin
stream, so the parallel unit is the DOMAIN — (source, hash-shard)
exactly like q_sequence_pack_sharded, each shard sized to ~1 GB of
tokens. Within a domain the kernel is a numpy first-fit over bin
residuals (vectorized scan; swap in a max-residual segment tree for
multi-million-doc domains). Documents longer than the capacity are
truncated to it (the standard loader contract — split-before-pack if
truncation is unacceptable). No data ever reaches the driver; the
kernel emits one row per document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pack_ffd", "pack_next_fit", "packing_stats"]


def pack_ffd(
    df: DataFrame,
    domain_cols: list[str],
    id_col: str,
    len_col: str,
    capacity: int,
) -> DataFrame:
    """First-fit-decreasing packing per domain. Input: one row per
    document with an integer length column. Output: (domain_cols...,
    id_col, n_tok, bin_id) where n_tok = min(length, capacity) and
    bin_id numbers this domain's bins in creation order (0-based).
    Deterministic: docs are placed in (n_tok desc, id asc) order, each
    into the FIRST bin (creation order) with enough residual, else a
    new bin."""
    import pandas as pd

    out_schema = ", ".join(
        [
            *(f"{c} {t}" for c, t in _domain_types(df, domain_cols)),
            f"{id_col} long",
            "n_tok long",
            "bin_id long",
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        lens = np.minimum(pdf[len_col].to_numpy(np.int64), capacity)
        order = np.lexsort((pdf[id_col].to_numpy(np.int64), -lens))
        res: np.ndarray = np.empty(0, dtype=np.int64)  # residual per bin
        bin_of = np.empty(len(pdf), dtype=np.int64)
        for pos in order:
            need = lens[pos]
            fit = np.flatnonzero(res >= need)
            if fit.size:
                b = int(fit[0])
            else:
                b = res.size
                res = np.append(res, np.int64(capacity))
            res[b] -= need
            bin_of[pos] = b
        out = pdf[[*domain_cols, id_col]].copy()
        out["n_tok"] = lens
        out["bin_id"] = bin_of
        return out

    return df.groupBy(*domain_cols).applyInPandas(kernel, schema=out_schema)


def pack_next_fit(
    df: DataFrame,
    domain_cols: list[str],
    id_col: str,
    len_col: str,
    capacity: int,
) -> DataFrame:
    """The sequential baseline packer: docs in id order, close the
    current bin whenever the next doc doesn't fit. Same output shape as
    :func:`pack_ffd`; exists as the padding-waste comparison baseline
    (bench_llm_scaling measures FFD's reduction against it)."""
    import pandas as pd

    out_schema = ", ".join(
        [
            *(f"{c} {t}" for c, t in _domain_types(df, domain_cols)),
            f"{id_col} long",
            "n_tok long",
            "bin_id long",
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(id_col)
        lens = np.minimum(pdf[len_col].to_numpy(np.int64), capacity)
        bins = np.empty(len(pdf), dtype=np.int64)
        b, resid = 0, capacity
        for i, need in enumerate(lens):
            if need > resid:
                b += 1
                resid = capacity
            resid -= need
            bins[i] = b
        out = pdf[[*domain_cols, id_col]].copy()
        out["n_tok"] = lens
        out["bin_id"] = bins
        return out

    return df.groupBy(*domain_cols).applyInPandas(kernel, schema=out_schema)


def _domain_types(df: DataFrame, domain_cols: list[str]) -> list[tuple[str, str]]:
    by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return [(c, by_name[c]) for c in domain_cols]


def packing_stats(
    packed: DataFrame, domain_cols: list[str], capacity: int
) -> DataFrame:
    """Padding-efficiency observables per domain from a pack_ffd
    assignment: n_docs, n_bins, total_tok, padding_waste
    (= n_bins * capacity - total_tok) and fill_ratio. Pure
    aggregation — the observable a 100 TB packing job reports per
    partition so skewed domains are visible."""
    return (
        packed.groupBy(*domain_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.max("bin_id") + 1).alias("n_bins"),
            F.sum("n_tok").alias("total_tok"),
        )
        .select(
            *domain_cols,
            "n_docs",
            "n_bins",
            "total_tok",
            (F.col("n_bins") * capacity - F.col("total_tok")).alias("padding_waste"),
            F.round(
                F.col("total_tok") / (F.col("n_bins") * F.lit(float(capacity))), 6
            ).alias("fill_ratio"),
        )
    )
