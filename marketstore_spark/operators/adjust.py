"""Corporate-action price adjustment (splits / dividends).

Reference: uda/adjust/adjust.go + caloader.go — for each symbol, load
rate-change events (split ratios, dividend adjustments) and multiply
every price strictly before a corporate action by the product of all
later ratios; results rounded to 4 decimals (adjust.go
roundToDecimals=4).

Spark design: no per-symbol loop.  Union the price stream with the CA
stream, then a single descending window per symbol computes the running
product of ratios via exp(sum(ln ratio)) — an O(n) windowed scan, one
shuffle on symbol.  At 100 TB the CA side is tiny; it rides along in the
union and the window state is a single float per partition stream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def adjust(
    prices: DataFrame,
    actions: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    price_col: str = "value",
    ratio_col: str = "ratio",
    round_to: int = 4,
) -> DataFrame:
    """Return ``prices`` with ``adjusted`` = price × ∏(ratio of CAs with
    ca_ts strictly > row ts), per key.  Matches uda/adjust semantics
    (backward adjustment, 4-decimal rounding).
    """
    keys = list(key_cols)
    p = prices.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.col(price_col).alias("__price"),
        F.lit(1.0).alias("__ratio"),
        F.lit(0).alias("__is_ca"),
    )
    a = actions.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(None).cast("double").alias("__price"),
        F.col(ratio_col).cast("double").alias("__ratio"),
        F.lit(1).alias("__is_ca"),
    )
    u = p.unionByName(a)
    # Descending time; at equal ts the price row sorts first so a CA at
    # exactly t does not adjust the price at t (strict inequality).
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").desc(), F.col("__is_ca").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    factor = F.exp(F.sum(F.log("__ratio")).over(w))
    out = (
        u.withColumn("__factor", factor)
        .filter(F.col("__is_ca") == 0)
        .select(
            *keys,
            F.col("__ts").alias(ts_col),
            F.col("__price").alias(price_col),
            F.round(F.col("__price") * F.col("__factor"), round_to).alias("adjusted"),
        )
    )
    return out
