"""ray_beam_runner_spark — a PySpark-native analytics engine with the
capabilities of ray-project/ray_beam_runner (an Apache Beam runner on Ray).

The reference executes the Beam model (ParDo / GroupByKey / Combine /
windowing / state+timers / side inputs) by shipping coder-encoded byte
bundles through Ray tasks. This engine re-expresses the same pipeline
semantics **declaratively on Spark**: user pipelines compile to DataFrame
expressions that Catalyst optimizes and Tungsten executes; opaque user
Python runs only through Arrow-vectorized pandas UDFs; unbounded inputs
run through Structured Streaming with the identical API.

Package map
-----------
- :mod:`ray_beam_runner_spark.session`   — tuned SparkSession builder
- :mod:`ray_beam_runner_spark.pipeline`  — Beam-model Pipeline / PCollection API
- :mod:`ray_beam_runner_spark.operators` — grouping, windowing, joins, set ops,
  stateful ParDo + timers
- :mod:`ray_beam_runner_spark.sources`   — batch + streaming sources/sinks
- :mod:`ray_beam_runner_spark.functions` — LLM-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal columns)
- :mod:`ray_beam_runner_spark.plans`     — plan inspection / explain helpers

Parity citations to the reference (`/root/reference/...`) appear in each
module docstring so coverage can be checked line-by-line against
SURVEY.md §2.
"""

from ray_beam_runner_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
