"""Exponentially-weighted idioms (EMA) — per-symbol stateful recursion.

marketstore serves EMA-style overlays from its timeseries API (the
charting/backtesting use case behind uda/ and contrib/candler).  An
EMA is a linear recurrence (ema_t = α·x_t + (1−α)·ema_{t−1}), which no
window frame expresses — this is the sanctioned Pandas-UDF case
(SURVEY §6): per-key ordered recursion, Arrow-batched.

Scale shape: ONE shuffle hash-partitioned on the key plus a
within-partition sort, then a single ``mapInPandas`` streaming pass
per partition that folds every key's recurrence with carry state
across Arrow batches.  (The earlier ``groupBy().applyInPandas``
formulation invoked Python once per KEY — pandas construction,
per-group sort, and Arrow framing ~1500× at sf0.1 dominated the
actual ~1M-step fold by ~5×; the partition-streaming pass pays those
costs once per partition and handles a key whose history spans many
Arrow batches, which the one-group-one-batch contract could not.)
The streaming analogue lives in streaming/gapwatch.py
(applyInPandasWithState).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame


def _partition_sorted(
    df: DataFrame, key_cols: Sequence[str], order: Sequence[str]
) -> DataFrame:
    """Hash-partition on the key and sort each partition by
    (key, order): every key's rows become one contiguous, time-ordered
    run inside a partition — the layout the streaming fold consumes.
    Arrow batching may split a run across batches; the fold carries
    its accumulators over the boundary."""
    return df.repartition(*[df[c] for c in key_cols]).sortWithinPartitions(
        *key_cols, *order
    )


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
    here."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(df.schema.fields + [StructField(out_col, DoubleType())])
    alpha = 2.0 / (span + 1.0)
    beta = 1.0 - alpha
    keys = list(key_cols)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_key = None
        acc = 0.0
        for pdf in batches:
            vals = pdf[value_col].to_numpy(dtype=np.float64)
            kcols = [pdf[k].to_numpy() for k in keys]
            out = np.empty_like(vals)
            for i in range(len(vals)):
                k = tuple(c[i] for c in kcols)
                x = float(vals[i])
                if k != cur_key:
                    cur_key, acc = k, x
                else:
                    acc = alpha * x + beta * acc
                out[i] = acc
            pdf[out_col] = out
            yield pdf

    return _partition_sorted(df, keys, [ts_col, *tiebreak]).mapInPandas(gen, schema)


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
    and the histogram — three coupled linear recurrences folded in the
    same single partition-streaming pass as :func:`ema` (one shuffle).

    Bit-reproducibility contract (the ema() policy extended): each
    step is the literal float64 sequence ``α·x + (1−α)·prev`` per EMA,
    one subtract for the MACD line, and the same literal step for the
    signal EMA seeded at the first MACD value (exactly 0.0, since both
    EMAs seed at x₀) — so a recursive-CTE oracle carrying all three
    accumulators replays it bitwise.
    """
    import numpy as np
    import pandas as pd
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
    keys = list(key_cols)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_key = None
        ef = es = sig = 0.0
        for pdf in batches:
            vals = pdf[value_col].to_numpy(dtype=np.float64)
            kcols = [pdf[k].to_numpy() for k in keys]
            m = np.empty_like(vals)
            s = np.empty_like(vals)
            for i in range(len(vals)):
                k = tuple(c[i] for c in kcols)
                x = float(vals[i])
                if k != cur_key:
                    cur_key = k
                    ef = es = x
                    line = ef - es  # exactly 0.0
                    sig = line
                else:
                    ef = af * x + bf * ef
                    es = as_ * x + bs * es
                    line = ef - es
                    sig = ag * line + bg * sig
                m[i], s[i] = line, sig
            pdf["macd"] = m
            pdf["signal"] = s
            pdf["histogram"] = m - s
            yield pdf

    return _partition_sorted(df, keys, [ts_col, *tiebreak]).mapInPandas(gen, schema)
