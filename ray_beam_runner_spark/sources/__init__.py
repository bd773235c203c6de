"""Sources and sinks (SURVEY.md §2.1).

- :mod:`ray_beam_runner_spark.sources.io` — batch readers/writers (text,
  parquet, csv, json, orc) and the nanos-normalizing parquet reader.
- :mod:`ray_beam_runner_spark.sources.custom` — Python Data Source API
  implementations: the splittable-source (SDF) analog with partition-level
  splitting and checkpointable streaming offsets.
- :mod:`ray_beam_runner_spark.sources.tfrecord` — TFRecord wire format
  (CRC-32C) sink/source + DSv2 write format.
- :mod:`ray_beam_runner_spark.sources.snapshots` — snapshot-manifest
  parquet tables: atomic commits, stats-pruned keyed MERGE, time travel,
  schema evolution, exactly-once streaming CDC sink, change data feed,
  compaction, vacuum.
- Streaming fixtures live in :mod:`ray_beam_runner_spark.streaming`.
"""
