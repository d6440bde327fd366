"""Streaming exact dedup — the ingest-path guard against duplicate
ticks/documents (SURVEY §2 #30's streaming analogue; reference feeders
re-deliver on reconnect, and the reference dedupes by (Epoch, index)
on write — executor/writer.go).

Spark design: ``dropDuplicatesWithinWatermark`` keys the state store
on the id columns and expires state past the watermark — bounded
memory at any throughput, exactly-once output per key within the
dedup horizon.  At 100 TB/day the state is O(keys within horizon),
partitioned by key hash across executors; a wider horizon trades
state size for dedup reach.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from marketstore_spark.functions.timeutil import with_instant_ts


def dedup_stream(
    stream: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    horizon: str = "10 minutes",
) -> DataFrame:
    """Drop re-deliveries of the same key arriving within ``horizon``
    of the watermark.  Rows later than the horizon are a replay — they
    pass through (state already expired), which is the standard
    at-least-once/bounded-state trade-off."""
    stream = with_instant_ts(stream, ts_col)  # watermark needs instant ts
    return stream.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
