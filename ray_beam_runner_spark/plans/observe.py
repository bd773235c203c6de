"""Engine-level monitoring: per-transform element counts/sizes via the
Observation API.

Reference parity: the portability runner tracks element-count and
sampled-byte-size monitoring infos per PCollection
(`/root/reference/ray_beam_runner/portability/ray_fn_runner.py:462-534`;
metric tests `ray_runner_test.py:1195-1615`). Spark's ``Observation``
attaches the same accounting to a plan node with zero extra actions —
metrics ride along with whatever action executes the DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_counts(df: DataFrame, name: str) -> tuple[DataFrame, Observation]:
    """Attach element-count + byte-size accounting at this point of the
    plan. Returns (df, observation); read ``observation.get`` after an
    action. Cheap: an aggregate piggybacked on the existing pass."""
    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("element_count"),
        F.sum(F.length(F.to_json(F.struct(*df.columns)))).alias("approx_bytes"),
    )
    return observed, obs


def observed_result(obs: Observation) -> dict:
    return dict(obs.get)
