"""Gap-filling / continuous-series resampling.

Reference: marketstore serves fixed-interval timeframe dirs (1Min/1D);
a query over a range returns one row per interval that has data — the
client-visible contract for charting is a continuous series, with holes
filled from the previous bar.  (See also uda/gap which *detects* holes.)

Spark design: generate the dense per-key time grid with
``sequence()``+``explode`` (JVM-side, no driver loop), left-join the
bucketed aggregates, and forward-fill with last(..., ignorenulls) over
the key window.  Grid generation is O(span/step) rows per key produced
in parallel; the fill is one window pass per key.
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
    span = bucketed.groupBy(*keys).agg(
        F.min("epoch").alias("__lo"), F.max("epoch").alias("__hi")
    )
    # The span table is tiny (one row per key) and AQE coalesces it to
    # very few partitions — but the explode fans each row out to
    # span/step rows.  Repartition by key first so grid generation and
    # the downstream join parallelize.
    span = span.repartition(span.sparkSession.sparkContext.defaultParallelism, *keys)
    grid = span.select(
        *keys, F.explode(F.sequence("__lo", "__hi", step)).alias("epoch")
    )
    joined = grid.join(bucketed, on=keys + ["epoch"], how="left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("epoch")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *keys,
        "epoch",
        F.last("value", ignorenulls=True).over(w).alias("value"),
        F.when(F.col("value").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("filled"),
    )
