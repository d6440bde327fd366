"""UDA equivalents: min / max / avg / count / gap.

Reference: uda/min/min.go, uda/max/max.go, uda/avg/avg.go,
uda/count/count.go — scalar aggregates over a queried column series,
executed per TimeBucketKey; uda/gap/gap.go — detect abnormal holes in
the Epoch index, either by a fixed threshold (seconds) or by z-score>3
over the gap distribution.

Spark design: plain per-key hash aggregates (one shuffle, map-side
combine).  Gap detection is `lag(ts) over (partition by key order by
ts)` — one shuffle per key, each key's series sorted only within its
partition; the z-score variant joins per-key mean/std back, computed in
the same pass (no second scan of the base table).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from marketstore_spark.functions.timeutil import epoch_us

_AGGS = {
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
    "count": F.count,
    "sum": F.sum,
}


def scalar_agg(
    df: DataFrame,
    agg: str,
    value_col: str = "value",
    key_cols: Sequence[str] = ("user_id",),
    alias: str | None = None,
) -> DataFrame:
    """uda/{min,max,avg,count}: one row per key."""
    fn = _AGGS[agg]
    return df.groupBy(*key_cols).agg(fn(value_col).alias(alias or f"{agg}_{value_col}"))


def _gaps(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    order_tiebreak: Sequence[str],
) -> DataFrame:
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *order_tiebreak)
    prev = F.lag(ts_col).over(w)
    return df.select(
        *key_cols,
        F.col(ts_col),
        prev.alias("prev_ts"),
        (epoch_us(F.col(ts_col)) - epoch_us(prev)).alias("gap_us"),
    ).filter(F.col("prev_ts").isNotNull())


def gap_threshold(
    df: DataFrame,
    threshold_seconds: float,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    order_tiebreak: Sequence[str] = ("event_id",),
) -> DataFrame:
    """uda/gap fixed-threshold mode (gap.go bigGapIdxsByThreshold):
    rows (key, prev_ts, ts, gap_seconds) where the hole exceeds the
    threshold."""
    g = _gaps(df, key_cols, ts_col, order_tiebreak)
    return (
        g.filter(F.col("gap_us") > threshold_seconds * 1_000_000)
        .select(
            *key_cols,
            "prev_ts",
            F.col(ts_col).alias("next_ts"),
            (F.col("gap_us") / F.lit(1_000_000.0)).alias("gap_seconds"),
        )
    )


def gap_zscore(
    df: DataFrame,
    z: float = 3.0,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    order_tiebreak: Sequence[str] = ("event_id",),
) -> DataFrame:
    """uda/gap z-score mode (gap.go bigGapIdxsByZScoreThreshold):
    |(gap - mean)/std| > z per key, std==0 treated as 1."""
    g = _gaps(df, key_cols, ts_col, order_tiebreak)
    stats = Window.partitionBy(*key_cols)
    m = F.avg("gap_us").over(stats)
    # Population stddev to match gonum stat.StdDev? gonum uses sample
    # (n-1); use sample stddev and pin it in the oracle too.
    s = F.stddev_samp("gap_us").over(stats)
    s = F.when(F.coalesce(s, F.lit(0.0)) == 0.0, F.lit(1.0)).otherwise(s)
    return (
        g.withColumn("zscore", F.abs((F.col("gap_us") - m) / s))
        .filter(F.col("zscore") > z)
        .select(
            *key_cols,
            "prev_ts",
            F.col(ts_col).alias("next_ts"),
            (F.col("gap_us") / F.lit(1_000_000.0)).alias("gap_seconds"),
            "zscore",
        )
    )
