"""Structured Streaming jobs (SURVEY.md §3.9).

The reference's Celery-beat polling ETL maps onto micro-batch Structured
Streaming: ``readStream`` file source ≙ arriving API batches,
``trigger(processingTime="120 seconds")`` ≙ the 2-minute polling cycle, and
``availableNow`` for deterministic test runs (SURVEY §6.3 batch-equivalence).
"""

from transilien_api_etl_spark.streaming.jobs import (  # noqa: F401
    read_events_stream,
    run_stream_to_memory,
)
