"""Exponentially-weighted idioms (EMA) — per-symbol stateful recursion.

marketstore serves EMA-style overlays from its timeseries API (the
charting/backtesting use case behind uda/ and contrib/candler).  An
EMA is a linear recurrence (ema_t = α·x_t + (1−α)·ema_{t−1}), which no
window frame expresses — this is the sanctioned ``applyInPandas`` case
(SURVEY §6): per-key ordered recursion, Arrow-batched, vectorized by
pandas' C ewm kernel.

Scale shape: one shuffle on the symbol key; each group is one symbol's
history processed in a single Arrow batch.  State is O(1) per key but
the batch is O(rows-per-symbol) — for multi-year tick histories at
100 TB, split the recurrence by time-chunk (carry ema forward with the
identity ema_chunk = α·Σ(1−α)^i·x + (1−α)^n·carry) or serve from the
candle rollups instead of raw ticks.  The streaming analogue lives in
streaming/gapwatch.py (applyInPandasWithState).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def ema(
    df: DataFrame,
    span: int = 20,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: Sequence[str] = ("event_id",),
    out_col: str = "ema",
) -> DataFrame:
    """Per-key EMA with α = 2/(span+1), seeded at the first value
    (pandas ``ewm(adjust=False)`` semantics — the trading convention)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(df.schema.fields + [StructField(out_col, DoubleType())])
    alpha = 2.0 / (span + 1.0)
    order = [ts_col, *tiebreak]

    def fn(pdf):
        pdf = pdf.sort_values(order, ignore_index=True)
        pdf[out_col] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    return df.groupBy(*key_cols).applyInPandas(fn, schema)
