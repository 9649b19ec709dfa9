"""Stateful streaming sessionization (applyInPandasWithState) agrees with
the batch sessionize operator: every session the stream CLOSES (a later
event arrived past the gap) must match a batch session exactly; the only
sessions allowed to be missing are each user's final (still-open) one."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidata_wikifier_spark.operators.events import sessionize
from wikidata_wikifier_spark.streaming.ingest import EVENTS_SCHEMA
from wikidata_wikifier_spark.streaming.sessionize import sessionize_stream


def test_stream_sessions_match_batch(spark, sf_small, tmp_path):
    import shutil

    stream_dir = tmp_path / "events_sess_stream"
    stream_dir.mkdir()
    shutil.copy(f"{sf_small}/events.parquet", stream_dir / "part-0.parquet")
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(stream_dir))
    out = sessionize_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.table("sessions_stream")
        .select(
            "user_id",
            F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
            F.round("session_value", 4).alias("session_value"),
        )
        .toPandas()
    )

    batch = sessionize(spark, sf_small)  # user_id, session_idx, n_events, ...
    w_last = (
        batch.groupBy("user_id").agg(F.max("session_idx").alias("_last"))
    )
    closed_batch = (
        batch.join(w_last, "user_id")
        .where(F.col("session_idx") < F.col("_last"))
        .select("user_id", "session_start", "n_events",
                F.round("session_value", 4).alias("session_value"))
        .toPandas()
    )

    key = ["user_id", "session_start", "n_events", "session_value"]
    got_set = set(map(tuple, got[key].itertuples(index=False)))
    closed_set = set(map(tuple, closed_batch[key].itertuples(index=False)))
    # every batch-closed session must be emitted by the stream...
    missing = closed_set - got_set
    assert not missing, f"stream missed {len(missing)} closed sessions"
    # ...and the stream must not invent sessions absent from batch (open
    # sessions can additionally appear if the event-time timeout fired)
    all_batch = set(
        map(
            tuple,
            batch.select(
                "user_id", "session_start", "n_events",
                F.round("session_value", 4).alias("session_value"),
            ).toPandas()[key].itertuples(index=False),
        )
    )
    extra = got_set - all_batch
    assert not extra, f"stream invented {len(extra)} sessions"
