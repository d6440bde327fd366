"""Gap-based sessionization — the events-table idiom behind session
analytics and the batch analogue of the stream gap watcher
(streaming/gapwatch.py; reference: uda/gap/gap.go's gap detection).

A session breaks where the inter-event gap exceeds a threshold; the
session id is the running count of breaks — one window pass, then one
aggregate.  Scale shape: both the window and the groupBy partition on
the entity key, so the shuffle is reused (no extra exchange between
the two), and per-key window state is O(1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from marketstore_spark.functions.timeutil import epoch_us


def sessionize(
    df: DataFrame,
    gap_seconds: int = 1800,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    tiebreak: Sequence[str] = ("event_id",),
) -> DataFrame:
    """One row per (key, session): session_id (1-based, per key),
    n_events, session start/end.  All arithmetic is integer
    microseconds — engine-exact."""
    wo = Window.partitionBy(*key_cols).orderBy(ts_col, *tiebreak)
    us = epoch_us(F.col(ts_col))
    prev = F.lag(us).over(wo)
    brk = F.when(prev.isNull() | (us - prev > gap_seconds * 1_000_000), 1).otherwise(0)
    wcum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sid = F.sum(brk).over(wcum)
    return (
        df.withColumn("session_id", sid)
        .groupBy(*key_cols, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )
