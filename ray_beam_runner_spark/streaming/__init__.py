"""Structured Streaming surface (SURVEY.md §2.5, §7 step 6).

The reference's unbounded-pipeline support is partial: it REJECTS
TestStream (`portability/ray_fn_runner.py:92-93`), allows only event-time
timers (94-100), and its watermark manager is a TODO
(`ray_fn_runner.py:284-294`). Our streaming surface is therefore defined
by Spark semantics with the Beam default-trigger behavior: watermark-
delayed windowed aggregation (late data dropped), append/update output
modes, availableNow as the drain analog (reference drain tests
`ray_runner_test.py:761-819`), and foreachBatch as the bundle-
finalization hook (`execution.py:131-139`).
"""

from ray_beam_runner_spark.streaming.fixtures import FileDropStream
from ray_beam_runner_spark.streaming.ops import (
    run_to_memory,
    windowed_agg_stream,
)

__all__ = ["FileDropStream", "windowed_agg_stream", "run_to_memory"]
