"""Structured Streaming ingest: the streaming windowed aggregate must
equal the batch hourly aggregate over the same files."""

from __future__ import annotations

import pyspark.sql.functions as F

from wikidata_wikifier_spark.streaming.ingest import (
    read_event_stream,
    run_available_now,
    windowed_counts,
)


def test_stream_matches_batch(spark, sf_small, tmp_path):
    import shutil

    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(f"{sf_small}/events.parquet", stream_dir / "part-0.parquet")
    path = str(stream_dir)
    stream = read_event_stream(spark, path)
    assert stream.isStreaming
    run_available_now(windowed_counts(stream), "win_counts")
    got = spark.sql("select * from win_counts")

    batch = (
        spark.read.parquet(path)
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
    )
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0
