"""Financial column expressions (marketstore's analytics idioms:
backtesting/charting on bar data — models/bar.go, README use cases)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def vwap(price_col: str | Column, volume_col: str | Column) -> Column:
    """Volume-weighted average price aggregate expression."""
    p = F.col(price_col) if isinstance(price_col, str) else price_col
    v = F.col(volume_col) if isinstance(volume_col, str) else volume_col
    return F.sum(p * v) / F.sum(v)


def twap(price_col: str | Column) -> Column:
    """Time-weighted average price over uniform samples = plain avg."""
    p = F.col(price_col) if isinstance(price_col, str) else price_col
    return F.avg(p)


def simple_returns(
    df: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    price_col: str = "value",
    tiebreak: Sequence[str] = ("event_id",),
) -> DataFrame:
    """p_t / p_{t-1} - 1 per key in time order; NULL when there is no
    previous price or it is zero (a zero price has no defined return —
    and ANSI mode would otherwise fail the whole job on one bad tick)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *tiebreak)
    prev = F.lag(price_col).over(w)
    safe_prev = F.when(prev == 0, F.lit(None)).otherwise(prev)
    return df.withColumn("ret", F.col(price_col) / safe_prev - 1)


def log_returns(
    df: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    price_col: str = "value",
    tiebreak: Sequence[str] = ("event_id",),
) -> DataFrame:
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *tiebreak)
    prev = F.lag(price_col).over(w)
    return df.withColumn("log_ret", F.log(F.col(price_col)) - F.log(prev))
