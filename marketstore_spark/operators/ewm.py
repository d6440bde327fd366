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
    (pandas ``ewm(adjust=False)`` semantics — the trading convention).

    The recurrence is evaluated as the literal float64 expression
    ``α·x + (1−α)·prev`` (plain IEEE multiply/add, no FMA contraction,
    no normalizing divide), so any engine replaying that expression —
    e.g. the DuckDB recursive-CTE oracle — reproduces it bitwise.
    pandas' C ewm kernel is ~1-6 ulp off that expression (contraction +
    its `/(old_wt+new_wt)` normalization), which is why it is not used
    here; the per-row Python loop costs ~0.5 s per million rows per
    key, amortized across Arrow batches — acceptable for per-symbol
    histories, and the chunked-carry identity in the module docstring
    is the path if a single key's history outgrows a batch."""
    import numpy as np
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(df.schema.fields + [StructField(out_col, DoubleType())])
    alpha = 2.0 / (span + 1.0)
    beta = 1.0 - alpha
    order = [ts_col, *tiebreak]

    def fn(pdf):
        pdf = pdf.sort_values(order, ignore_index=True)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        out = np.empty_like(vals)
        if len(vals):
            acc = float(vals[0])
            out[0] = acc
            for i in range(1, len(vals)):
                acc = alpha * float(vals[i]) + beta * acc
                out[i] = acc
        pdf[out_col] = out
        return pdf

    return df.groupBy(*key_cols).applyInPandas(fn, schema)


def macd(
    df: DataFrame,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: Sequence[str] = ("event_id",),
) -> DataFrame:
    """MACD per key: fast/slow EMA difference plus its signal-line EMA
    and the histogram — three coupled linear recurrences evaluated in
    ONE applyInPandas pass (one shuffle; the ema() scale notes apply).

    Bit-reproducibility contract (the ema() policy extended): each
    step is the literal float64 sequence ``α·x + (1−α)·prev`` per EMA,
    one subtract for the MACD line, and the same literal step for the
    signal EMA seeded at the first MACD value (exactly 0.0, since both
    EMAs seed at x₀) — so a recursive-CTE oracle carrying all three
    accumulators replays it bitwise.
    """
    import numpy as np
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        df.schema.fields
        + [
            StructField("macd", DoubleType()),
            StructField("signal", DoubleType()),
            StructField("histogram", DoubleType()),
        ]
    )
    af, bf = 2.0 / (fast + 1.0), 1.0 - 2.0 / (fast + 1.0)
    as_, bs = 2.0 / (slow + 1.0), 1.0 - 2.0 / (slow + 1.0)
    ag, bg = 2.0 / (signal + 1.0), 1.0 - 2.0 / (signal + 1.0)
    order = [ts_col, *tiebreak]

    def fn(pdf):
        pdf = pdf.sort_values(order, ignore_index=True)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        m = np.empty_like(vals)
        s = np.empty_like(vals)
        if len(vals):
            ef = es = float(vals[0])
            line = ef - es  # exactly 0.0
            sig = line
            m[0], s[0] = line, sig
            for i in range(1, len(vals)):
                x = float(vals[i])
                ef = af * x + bf * ef
                es = as_ * x + bs * es
                line = ef - es
                sig = ag * line + bg * sig
                m[i], s[i] = line, sig
        pdf["macd"] = m
        pdf["signal"] = s
        pdf["histogram"] = m - s
        return pdf

    return df.groupBy(*key_cols).applyInPandas(fn, schema)
