"""Streaming sessionization — the batch sessionize contract on a live
feed, expressed with Spark's NATIVE session windows.

Reference framing: the stream frontend (frontend/stream) pushes raw
writes; session analytics happen downstream.  This keeps them in the
engine: ``F.session_window`` + a watermark is the idiomatic Structured
Streaming form — built-in state management, late-data handling, and
session MERGING across micro-batches (two half-sessions arriving in
different batches coalesce), none of which a hand-rolled
applyInPandasWithState fold gets for free.

Boundary contract: the batch operator (operators/sessionize.py) breaks
a session when the inter-event gap is STRICTLY GREATER than
``gap_seconds``.  Spark's session windows merge an event landing
exactly at the previous window's end (probed: two events exactly
``gap`` apart form ONE session), i.e. they also break only at
gap > window — the two contracts agree at every integer-µs gap, so
per-session (key, start, end, n_events) rows equal the batch
operator's exactly — pinned in tests/test_streaming.py by replaying a
2-batch split, including a session that straddles the batch boundary
and an exactly-at-gap pair.

No session_id column: a global per-key ordinal is inherently
retrospective (numbering session k requires knowing all earlier
sessions are closed), so the streaming twin identifies sessions by
(key, session_start) — the natural streaming key; the batch operator
remains the source of ordinals for replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marketstore_spark.functions.timeutil import with_instant_ts


def stream_sessions(
    stream: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-(key, session) rows (n_events, session_start, session_end)
    over a streaming DataFrame; emission follows the watermark (a
    session row finalizes once the watermark passes its close —
    append-mode semantics, the standard late-data contract)."""
    if gap_seconds <= 0:
        raise ValueError("gap_seconds must be positive")
    s = with_instant_ts(stream, ts_col)
    return (
        s.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), f"{int(gap_seconds)} seconds"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(key_col, "n_events", "session_start", "session_end")
    )


def session_window_agg(
    df: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """The same native ``F.session_window`` grouping applied in BATCH
    (no watermark) — one definition of a session for both execution
    modes, which is the point of exposing it through the MarketSQL
    registry: a query validated here runs unchanged (plus a
    watermark) on the live feed via :func:`stream_sessions`."""
    if gap_seconds <= 0:
        raise ValueError("gap_seconds must be positive")
    s = with_instant_ts(df, ts_col)
    return (
        s.groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), f"{int(gap_seconds)} seconds"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(key_col, "n_events", "session_start", "session_end")
    )
