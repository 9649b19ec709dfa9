"""Event-stream batch operators over the `events` table: pivot (the
reconcile-input reshape, SURVEY.md §2.2), sessionization (gap-based), and
tumbling-window aggregation — the batch twins of the streaming module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tpch import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]  # pinned for pivot
SESSION_GAP_S = 30 * 60


def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() — the reconcile `properties` reshape
    (wikifier_service.py:73-98): one column per event type with count +
    total value. Pivot values pinned → no extra distinct-scan job."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, [t for t in EVENT_TYPES])
    )
    renamed = out.select(
        "user_id", *[F.col(t).alias(f"n_{t}") for t in EVENT_TYPES]
    )
    totals = ev.groupBy("user_id").agg(
        F.round(F.sum("value"), 4).alias("total_value"),
        F.count("*").alias("n_events"),
    )
    return renamed.join(totals, "user_id")


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + cumulative sum
    over the per-user time window, then per-session stats."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = F.col("ts").cast("timestamp").cast("double")
    gap = ts_s - F.lag(ts_s).over(w)
    sess = (
        ev.withColumn("new_sess", F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0))
        .withColumn("session_idx", F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        )
    )


def hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type (batch twin of the
    streaming windowed count)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    )


def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the props column (the reference's
    context JSONL analogue). The oracle can't run get_json_object, so BOTH
    sides extract with the identical integer regex — parity holds for
    negative / fractional / quoted / nested k values instead of depending
    on the datagen only emitting non-negative integers."""
    ev = load_table(spark, sf_dir, "events")
    rx = F.regexp_extract("props", r'"k":\s*(-?\d+)', 1)
    return (
        ev.select("event_id", rx.alias("_k"))
        .where(F.col("_k") != "")
        .select("event_id", F.col("_k").cast("int").alias("k"))
    )
