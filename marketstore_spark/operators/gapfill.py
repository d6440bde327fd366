"""Gap-filling / continuous-series resampling.

Reference: marketstore serves fixed-interval timeframe dirs (1Min/1D);
a query over a range returns one row per interval that has data — the
client-visible contract for charting is a continuous series, with holes
filled from the previous bar.  (See also uda/gap which *detects* holes.)

Spark design: bucket the ticks, then per key compute ``lead(epoch)``
and explode ``sequence(epoch, next_epoch - step, step)`` — each bucket
row directly emits itself plus the gap rows it forward-fills.  One
shuffle for the bucket agg, one window pass over the *bucketed* rows
(not the dense grid), no grid/left-join stage at all.  At 100 TB this
matters: the dense grid can be orders of magnitude larger than the
data (sparse series), and this plan never shuffles or sorts it — the
grid rows are generated JVM-side after the window, inside the same
stage that writes the result.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from marketstore_spark.operators.candler import timeframe_to_duration


def gapfill_ffill(
    df: DataFrame,
    timeframe: str,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    agg: str = "avg",
) -> DataFrame:
    """Bucket ``df`` to ``timeframe`` (agg of value per bucket), densify
    each key's series over its own [min,max] bucket span, forward-fill
    missing buckets.  Output: key, epoch, value, filled(0/1).
    """
    dur = timeframe_to_duration(timeframe)
    step = F.expr(f"INTERVAL {dur}")
    keys = list(key_cols)

    bucketed = (
        df.groupBy(*keys, F.window(F.col(ts_col), dur).alias("__w"))
        .agg(getattr(F, agg)(value_col).alias("value"))
        .select(*keys, F.col("__w.start").alias("epoch"), "value")
    )
    w = Window.partitionBy(*keys).orderBy("epoch")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fanned = bucketed.select(
        *keys,
        "epoch",
        "value",
        F.lead("epoch").over(w).alias("__next"),
        # carry-forward value as of this bucket (a present bucket whose
        # agg is NULL inherits the previous non-null value, matching the
        # grid+ffill formulation)
        F.last("value", ignorenulls=True).over(wcum).alias("__fv"),
    )
    stop = F.coalesce(F.col("__next") - step, F.col("epoch"))
    exploded = fanned.select(
        *keys,
        "value",
        "__fv",
        F.posexplode(F.sequence(F.col("epoch"), stop, step)).alias("__pos", "epoch"),
    )
    return exploded.select(
        *keys,
        "epoch",
        F.col("__fv").alias("value"),
        F.when(
            (F.col("__pos") > 0) | F.col("value").isNull(), F.lit(1)
        ).otherwise(F.lit(0)).alias("filled"),
    )


_US_PER = {
    "second": 1_000_000, "seconds": 1_000_000,
    "minute": 60_000_000, "minutes": 60_000_000,
    "hour": 3_600_000_000, "hours": 3_600_000_000,
    "day": 86_400_000_000, "days": 86_400_000_000,
    "week": 604_800_000_000, "weeks": 604_800_000_000,
}


def _duration_us(dur: str) -> int:
    n, unit = dur.split()
    if unit not in _US_PER:
        raise ValueError(
            f"linear interpolation needs a fixed-length step; {dur!r} is "
            "calendar-variable — use gapfill_ffill for 1Mo/1Y series"
        )
    return int(n) * _US_PER[unit]


def gapfill_interp(
    df: DataFrame,
    timeframe: str,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    agg: str = "max",
) -> DataFrame:
    """Like :func:`gapfill_ffill` but gap rows are LINEARLY
    INTERPOLATED between the surrounding present buckets — the other
    half of the continuous-series serving contract (charting overlays
    interpolate; step series forward-fill).

    Same single-fan-out plan as ffill: one bucket agg shuffle, one
    window pass over the bucketed rows, grid rows generated JVM-side
    in the explode — the dense grid is never shuffled or sorted.  The
    gap length is computed ARITHMETICALLY from the epoch delta (never
    ``size(sequence(...))`` next to the explode — Catalyst collapses
    projections through Generate and would rebuild the array per
    emitted row).  The interpolation expression
    ``v0 + (v1 − v0) · pos / gap_len`` is a fixed-order IEEE chain on
    exact inputs (default agg is an exact pick), so results are
    engine-reproducible.  Only fixed-length timeframes are accepted —
    a calendar month has no well-defined fractional position.
    """
    from marketstore_spark.functions.timeutil import epoch_us

    dur = timeframe_to_duration(timeframe)
    step_us = _duration_us(dur)
    step = F.expr(f"INTERVAL {dur}")
    keys = list(key_cols)

    bucketed = (
        df.groupBy(*keys, F.window(F.col(ts_col), dur).alias("__w"))
        .agg(getattr(F, agg)(value_col).alias("value"))
        .select(*keys, F.col("__w.start").alias("epoch"), "value")
    )
    w = Window.partitionBy(*keys).orderBy("epoch")
    fanned = bucketed.select(
        *keys,
        "epoch",
        "value",
        F.lead("epoch").over(w).alias("__next"),
        F.lead("value").over(w).alias("__nv"),
    )
    gap_len = (
        (epoch_us(F.col("__next")) - epoch_us(F.col("epoch"))) / F.lit(step_us)
    ).cast("long")
    stop = F.coalesce(F.col("__next") - step, F.col("epoch"))
    exploded = fanned.select(
        *keys,
        F.col("value").alias("__v0"),
        F.col("__nv"),
        gap_len.alias("__gap"),
        F.posexplode(F.sequence(F.col("epoch"), stop, step)).alias("__pos", "epoch"),
    )
    interp = F.col("__v0") + (F.col("__nv") - F.col("__v0")) * F.col("__pos") / F.col("__gap")
    return exploded.select(
        *keys,
        "epoch",
        F.when(F.col("__pos") == 0, F.col("__v0")).otherwise(interp).alias("value"),
        F.when(F.col("__pos") > 0, F.lit(1)).otherwise(F.lit(0)).alias("filled"),
    )
