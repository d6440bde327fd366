"""Quant idioms over tick streams: TWAP and cross-symbol correlation.

Both are marketstore use-case surface: the reference serves OHLCV and
tick queries over TimeBucketKey series (uda/, catalog/) that clients
then post-process; these two operators move the standard
post-processing INTO the engine as declarative plans.

Determinism policy (the repo-wide oracle-parity rule): no
order-dependent double summation.  Every aggregate here sums exact
DECIMALs or integer microseconds; doubles appear only in the final
scalar expression per output row, which both engines evaluate
identically (IEEE sqrt is correctly rounded, unlike exp/ln/pow).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from marketstore_spark.functions.timeutil import epoch_us


def _dec(c: str, scale: int = 2) -> Column:
    return F.col(c).cast(f"decimal(18,{scale})")


def twap(
    df: DataFrame,
    timeframe: str = "1 day",
    symbol_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average price per (symbol, bucket).

    Each tick is weighted by the integer MICROSECONDS until the next
    tick of the same symbol in the same bucket; the bucket's last tick
    carries to the bucket end (the standard TWAP convention — a price
    is in force until superseded).  Duplicate timestamps get zero
    weight except the last by ``tiebreak_col``, so the result is
    deterministic on any row order.  weight × DECIMAL price sums
    exactly; the single division to double happens per output row.

    Shape: one window (partition symbol+bucket, sort ts) + one groupBy
    on the same key — the sort-window exchange is reused by the
    aggregation, so the operator costs ONE shuffle.
    """
    w = F.window(ts_col, timeframe)
    ticks = df.select(
        F.col(symbol_col).alias("symbol"),
        F.col(ts_col).alias("__ts"),
        F.col(tiebreak_col).alias("__tb"),
        _dec(value_col).alias("__px"),
        w.alias("__w"),
    )
    nxt = F.lead(epoch_us(F.col("__ts"))).over(
        Window.partitionBy("symbol", "__w").orderBy("__ts", "__tb")
    )
    weighted = ticks.withColumn(
        "__dt",
        F.coalesce(nxt, epoch_us(F.col("__w.end"))) - epoch_us(F.col("__ts")),
    )
    return (
        weighted.groupBy("symbol", "__w")
        .agg(
            F.sum(F.col("__px") * F.col("__dt")).alias("__pv"),
            F.sum("__dt").alias("__tt"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            "symbol",
            F.col("__w.start").alias("epoch"),
            F.round(
                F.col("__pv").cast("double")
                / F.when(F.col("__tt") == 0, F.lit(None)).otherwise(F.col("__tt")),
                6,
            ).alias("twap"),
            "n_ticks",
        )
    )


def pairwise_corr(
    df: DataFrame,
    timeframe: str = "1 day",
    symbol_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    min_obs: int = 3,
) -> DataFrame:
    """Pearson correlation of per-bucket CLOSES for every symbol pair.

    Closes (last tick per symbol-bucket by (ts, tiebreak)) are original
    DECIMAL values — no intermediate arithmetic — so the five
    correlation sums (Σx, Σy, Σxy, Σx², Σy²) are EXACT decimal
    aggregates; the Pearson formula is then one double expression per
    pair (engine-identical: only *, -, /, and IEEE-rounded sqrt).
    Pairs with fewer than ``min_obs`` shared buckets or zero variance
    on either side are dropped.

    Shape: one window for closes (shuffle on symbol+bucket), one
    shuffle join on the bucket to form pairs (u1 < u2 — each unordered
    pair once), one groupBy (u1, u2).  The per-bucket pair fan-out is
    k² by definition of the operator; k = symbol count, which is the
    small dimension even at 100 TB of ticks.
    """
    w = F.window(ts_col, timeframe)
    base = df.select(
        F.col(symbol_col).alias("symbol"),
        F.col(ts_col).alias("__ts"),
        F.col(tiebreak_col).alias("__tb"),
        _dec(value_col).alias("close"),
        w["start"].alias("bucket"),
    )
    rn = F.row_number().over(
        Window.partitionBy("symbol", "bucket").orderBy(
            F.col("__ts").desc(), F.col("__tb").desc()
        )
    )
    closes = base.withColumn("__rn", rn).filter(F.col("__rn") == 1)
    a = closes.select(
        F.col("symbol").alias("sym_a"), "bucket", F.col("close").alias("x")
    )
    b = closes.select(
        F.col("symbol").alias("sym_b"), "bucket", F.col("close").alias("y")
    )
    pairs = a.join(b, "bucket").filter(F.col("sym_a") < F.col("sym_b"))
    agg = pairs.groupBy("sym_a", "sym_b").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("x").alias("__sx"),
        F.sum("y").alias("__sy"),
        F.sum(F.col("x") * F.col("y")).alias("__sxy"),
        F.sum(F.col("x") * F.col("x")).alias("__sxx"),
        F.sum(F.col("y") * F.col("y")).alias("__syy"),
    )
    n = F.col("n_obs").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx, syy = F.col("__sxx").cast("double"), F.col("__syy").cast("double")
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    return (
        agg.filter((F.col("n_obs") >= min_obs) & (varx > 0) & (vary > 0))
        .select(
            "sym_a",
            "sym_b",
            "n_obs",
            F.round((n * sxy - sx * sy) / (F.sqrt(varx) * F.sqrt(vary)), 6).alias(
                "corr"
            ),
        )
    )
