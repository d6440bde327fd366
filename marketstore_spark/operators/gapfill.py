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
