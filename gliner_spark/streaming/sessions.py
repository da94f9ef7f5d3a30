"""Streaming sessionization: watermarked native session windows.

The batch operator (``operators.sessions.sessionize``) needs the whole
event history per user; a continuously-ingesting pipeline can't have
that. Spark's built-in ``session_window`` keeps per-user open-session
state in the state store, merges events that arrive within the gap,
and FINALIZES a session once the watermark passes its close — so late
events inside the watermark still extend their session, and state for
closed sessions is dropped (bounded memory at any stream length).

This is the built-in-operator path the task rules prefer: no custom
applyInPandasWithState needed — the engine's session-window state
management (merge, watermark eviction, RocksDB spill) is exactly the
semantics required. Compare ``streaming/stateful.py`` where the
first-seen semantics genuinely need custom state.

Boundary semantics vs the batch operator: ``session_window`` merges
events with inter-arrival STRICTLY LESS than its window gap, while the
batch operator keeps ``delta == gap`` in-session (LAG-based ``> gap``
split). To reconcile the off-by-one (ADVICE r4: exact-cadence event
data showed divergent session counts to consumers comparing the two
tables), the internal window is ``gap_seconds*1000 + 1`` MILLISECONDS:
both operators now split exactly when ``delta >= gap + 1ms``, and the
equivalence test includes exact-gap deltas. Event timestamps have ms
precision here (ts_epoch_ms), so the +1 ms can never move a real
event across the boundary the other way.

Scale notes: state is keyed by (user, open session) — O(active users)
rows, not O(events). A bot user with events every second keeps ONE
open session row, not unbounded state; the watermark bounds how long
a session can stay open after its last event. The shuffle is the same
single user-keyed exchange as the batch plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_sessionize(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 7200,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked per-user session aggregation over an event stream.

    Returns one row per finalized session:
    (user_id, session_start_ms, session_end_ms, n_events, duration_ms)
    where start/end are the first/last EVENT timestamps in epoch ms
    (matching the batch operator's columns; ``session_window.end`` —
    last event + gap — is deliberately not exposed).
    """
    from ..operators.sessions import ts_epoch_ms

    ms = ts_epoch_ms(ts_col)
    # Watermarks/session windows require TIMESTAMP (an instant); event
    # files use naive NTZ. Build the instant FROM the tz-free epoch-ms
    # value — timestamp_millis(ms) — NOT via cast(ts as timestamp):
    # the cast interprets the NTZ value in the session timezone, and
    # around a DST spring-forward two NTZ values 30 minutes apart map
    # to instants ~90 minutes apart (the skipped hour), which would
    # split sessions the batch operator (pure NTZ math) keeps together.
    # timestamp_millis makes inter-event gaps equal the NTZ deltas in
    # EVERY session timezone, so window membership matches batch.
    with_event_ts = stream_df.withColumn("__event_ts", F.timestamp_millis(ms))
    # gap + 1 ms: batch-parity boundary (see module docstring)
    gap_ms = gap_seconds * 1000 + 1
    return (
        with_event_ts.withWatermark("__event_ts", watermark)
        .groupBy(
            F.col(user_col).alias("user_id"),
            F.session_window(F.col("__event_ts"), f"{gap_ms} milliseconds"),
        )
        .agg(
            F.min(ms).alias("session_start_ms"),
            F.max(ms).alias("session_end_ms"),
            F.count(F.lit(1)).alias("n_events"),
            (F.max(ms) - F.min(ms)).alias("duration_ms"),
        )
        .drop("session_window")
    )
