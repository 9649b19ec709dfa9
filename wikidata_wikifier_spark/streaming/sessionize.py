"""Custom STATEFUL streaming operator: per-user session aggregation with
applyInPandasWithState (capability extension, SURVEY.md §2.6 — the
reference is batch-only; Structured Streaming has no built-in session
gap-window aggregation with arbitrary per-session payloads).

Semantics match the batch operator events.py::sessionize: events of one
user belong to the same session while consecutive event-time gaps are
≤ GAP; a longer gap closes the session. The stream variant keeps ONE open
session per user in the state store (constant state per key — bounded
memory at any stream length) and EMITS a session the moment an event
closes it; the currently-open session stays in state until either a
closing event or an event-time timeout fires past the watermark.

Scale: state is (4 numbers + key) per ACTIVE user, partitioned by the
grouping key across executors — the classic keyed-state layout that
survives 10^9 users; no per-event state growth, no unbounded buffers.
Arrow-batched pandas transfer, no per-row Python round trips.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

SESSION_GAP_SECONDS = 1800  # 30 min, same as events.py::sessionize

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp,"
    " n_events long, session_value double"
)
# open-session state: epoch-microsecond bounds + running aggregates
STATE_SCHEMA = "start long, last long, n long, vsum double"


def _emit_frame(user_id: int, closed: list[tuple]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(closed),
            "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
            "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
            "n_events": [c[2] for c in closed],
            "session_value": [round(c[3], 4) for c in closed],
        }
    )


def make_sessionize_fn(gap_seconds: int = SESSION_GAP_SECONDS):
    gap_us = gap_seconds * 1_000_000

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed the open session's end + gap: close and emit
            closed = [tuple(state.get)] if state.exists else []
            state.remove()
            if closed:
                yield _emit_frame(user_id, closed)
            return
        st = tuple(state.get) if state.exists else None
        closed: list[tuple] = []
        # applyInPandasWithState gives NO ordering guarantee across the
        # chunks of one group (chunks split at arrow.maxRecordsPerBatch and
        # across partitions) — sorting each chunk independently would let an
        # out-of-order later chunk produce a negative gap and silently merge
        # sessions. Materialize the whole group's micro-batch slice first
        # (bounded: one user's events in one micro-batch), sort ONCE.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, val in zip(pdf["ts"], pdf["value"]):
                t = int(ts.value // 1_000)  # ns → µs
                v = float(val)
                if st is None:
                    st = (t, t, 1, v)
                elif t - st[1] > gap_us:
                    closed.append(st)
                    st = (t, t, 1, v)
                else:
                    st = (st[0], t, st[2] + 1, st[3] + v)
        if st is not None:
            state.update(st)
            # timeout once the watermark passes the would-be session close
            state.setTimeoutTimestamp(st[1] // 1_000 + gap_seconds * 1_000)
        if closed:
            yield _emit_frame(user_id, closed)

    return fn


def sessionize_stream(stream, gap_seconds: int = SESSION_GAP_SECONDS):
    """events stream (event_id, ts, user_id, event_type, value, props) →
    stream of CLOSED sessions per user."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.withWatermark("ts", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionize_fn(gap_seconds),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
