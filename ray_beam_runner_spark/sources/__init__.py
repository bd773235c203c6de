"""Sources and sinks (SURVEY.md §2.1).

- :mod:`ray_beam_runner_spark.sources.io` — batch readers/writers (text,
  parquet, csv, json) and the nanos-normalizing parquet reader.
- :mod:`ray_beam_runner_spark.sources.custom` — Python Data Source API
  implementations: the splittable-source (SDF) analog with partition-level
  splitting and checkpointable streaming offsets.
- Streaming fixtures live in :mod:`ray_beam_runner_spark.streaming`.
"""
