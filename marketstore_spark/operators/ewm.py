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


# Use the across-runs ("diagonal") kernel when the LONGEST run is at
# most n/32 — i.e. ≥32 chains are active on average per step, so each
# vector op amortizes its numpy dispatch over ≥32 lanes.  Measured on
# 10M rows (rows/s/core): per-row tuple loop ~1.3M flat; per-run
# Python-float loop ~5-6.6M; diagonal 17.6M @100 keys, 48M @10k keys,
# 2.1M @10 keys (lane-starved → the threshold sends that case to the
# per-run loop).  All three are bitwise-identical by construction.
_DIAG_MAX_RUN_FRAC = 32


def _run_starts(np, kcols, carry_key):
    """Vectorized run-boundary detection over an (already sorted)
    batch: row i starts a new run iff any key column changes at i, or
    row 0 does not continue the key carried from the previous batch.
    Works for object (string) and numeric key arrays alike."""
    n = len(kcols[0])
    change = np.zeros(n, dtype=bool)
    change[0] = carry_key is None or tuple(c[0] for c in kcols) != carry_key
    for c in kcols:
        np.logical_or(change[1:], c[1:] != c[:-1], out=change[1:])
    return np.flatnonzero(change)


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
            n = len(pdf)
            if n == 0:
                pdf[out_col] = np.empty(0)
                yield pdf
                continue
            vals = pdf[value_col].to_numpy(dtype=np.float64)
            kcols = [pdf[k].to_numpy() for k in keys]
            starts = _run_starts(np, kcols, cur_key)
            out = np.empty_like(vals)
            lead = int(starts[0]) if len(starts) else n
            if lead:  # rows continuing the chain carried across batches
                a = acc
                res = []
                for x in vals[:lead].tolist():
                    a = alpha * x + beta * a
                    res.append(a)
                out[:lead] = res
                acc = a
            if len(starts):
                bounds = np.append(starts, n)
                lens = np.diff(bounds)
                if int(lens.max()) * _DIAG_MAX_RUN_FRAC <= n:
                    # diagonal: step t advances every still-active
                    # chain with one elementwise α·x + β·acc (numpy
                    # mul,mul,add per lane — the identical scalar IEEE
                    # sequence; + and · commute bitwise, no FMA)
                    order = np.argsort(-lens, kind="stable")
                    s0 = starts[order]
                    ln = lens[order]
                    maxlen = int(ln[0])
                    # lanes with length > t form a prefix of the
                    # desc-sorted runs; m_at[t] is that prefix length
                    m_at = np.searchsorted(
                        -ln, -(np.arange(maxlen) + 1), side="right"
                    )
                    lanes = np.empty(len(s0))
                    for t in range(maxlen):
                        m = int(m_at[t])
                        idx = s0[:m] + t
                        x = vals[idx]
                        if t == 0:
                            lanes[:m] = x
                        else:
                            np.multiply(x, alpha, out=x)
                            lanes[:m] *= beta
                            lanes[:m] += x
                        out[idx] = lanes[:m]
                    last_lane = int(np.flatnonzero(order == len(starts) - 1)[0])
                    acc = float(lanes[last_lane])
                else:  # lane-starved (few long runs): per-run fold
                    xs = vals.tolist()
                    res = []
                    a = acc
                    for si in range(len(starts)):
                        s, e = int(starts[si]), int(bounds[si + 1])
                        a = xs[s]
                        res.append(a)
                        for j in range(s + 1, e):
                            a = alpha * xs[j] + beta * a
                            res.append(a)
                    out[lead:] = res
                    acc = a
                cur_key = tuple(c[n - 1] for c in kcols)
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
            n = len(pdf)
            if n == 0:
                for c in ("macd", "signal", "histogram"):
                    pdf[c] = np.empty(0)
                yield pdf
                continue
            vals = pdf[value_col].to_numpy(dtype=np.float64)
            kcols = [pdf[k].to_numpy() for k in keys]
            starts = _run_starts(np, kcols, cur_key)
            m = np.empty_like(vals)
            s = np.empty_like(vals)
            lead = int(starts[0]) if len(starts) else n
            if lead:  # continue the chain carried across batches
                rm, rs = [], []
                for x in vals[:lead].tolist():
                    ef = af * x + bf * ef
                    es = as_ * x + bs * es
                    line = ef - es
                    sig = ag * line + bg * sig
                    rm.append(line)
                    rs.append(sig)
                m[:lead] = rm
                s[:lead] = rs
            if len(starts):
                bounds = np.append(starts, n)
                lens = np.diff(bounds)
                if int(lens.max()) * _DIAG_MAX_RUN_FRAC <= n:
                    # diagonal kernel (see ema): three coupled
                    # recurrences advance lane-wise per step with the
                    # identical scalar IEEE op sequence
                    order = np.argsort(-lens, kind="stable")
                    s0 = starts[order]
                    ln = lens[order]
                    maxlen = int(ln[0])
                    m_at = np.searchsorted(
                        -ln, -(np.arange(maxlen) + 1), side="right"
                    )
                    nr = len(s0)
                    lf = np.empty(nr)
                    ls = np.empty(nr)
                    lg = np.empty(nr)
                    for t in range(maxlen):
                        k = int(m_at[t])
                        idx = s0[:k] + t
                        x = vals[idx]
                        if t == 0:
                            lf[:k] = x
                            ls[:k] = x
                            line = lf[:k] - ls[:k]  # exactly ±0.0
                            lg[:k] = line
                        else:
                            lf[:k] *= bf
                            lf[:k] += x * af
                            ls[:k] *= bs
                            ls[:k] += x * as_
                            line = lf[:k] - ls[:k]
                            lg[:k] *= bg
                            lg[:k] += line * ag
                        m[idx] = line
                        s[idx] = lg[:k]
                    last = int(np.flatnonzero(order == len(starts) - 1)[0])
                    ef, es, sig = float(lf[last]), float(ls[last]), float(lg[last])
                else:  # lane-starved: per-run Python-float fold
                    xs = vals.tolist()
                    rm, rs = [], []
                    for si in range(len(starts)):
                        b, e = int(starts[si]), int(bounds[si + 1])
                        ef = es = xs[b]
                        line = ef - es  # exactly 0.0
                        sig = line
                        rm.append(line)
                        rs.append(sig)
                        for j in range(b + 1, e):
                            x = xs[j]
                            ef = af * x + bf * ef
                            es = as_ * x + bs * es
                            line = ef - es
                            sig = ag * line + bg * sig
                            rm.append(line)
                            rs.append(sig)
                    m[lead:] = rm
                    s[lead:] = rs
                cur_key = tuple(c[n - 1] for c in kcols)
            pdf["macd"] = m
            pdf["signal"] = s
            pdf["histogram"] = m - s
            yield pdf

    return _partition_sorted(df, keys, [ts_col, *tiebreak]).mapInPandas(gen, schema)
