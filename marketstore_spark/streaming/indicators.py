"""Stateful streaming indicators — the batch recurrence family
(operators/ewm) kept live across micro-batches.

Reference: the websocket stream (frontend/stream) pushes writes to
subscribers who then maintain indicator state client-side; this moves
the recurrence INTO the engine so a subscriber receives ticks already
carrying the live EMA.  Windowed aggregation can't express an
infinite-horizon recurrence (every prior tick contributes), so this is
the ``applyInPandasWithState`` case, exactly like the gap watcher:
per-key state is O(1) — the carried EMA (and OBV accumulator + last
price) — each micro-batch folds its ticks in event order and updates
the state.

Exactness contract: the fold evaluates the SAME literal float64 steps
as operators/ewm.ema (``α·x + (1−α)·prev``), so feeding the identical
tick sequence through any micro-batch slicing yields bitwise the same
values as the batch operator — pinned in tests/test_streaming.py by
comparing a 2-batch replay against the one-shot batch result.

Ordering: within a key, ticks must arrive time-ordered ACROSS batches
(true of an ordered per-symbol feed; replays that violate this should
use the batch operator).  Within a batch, ticks are sorted before the
fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_ema_obv(
    stream: DataFrame,
    span: int = 20,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    volume_col: str = "volume",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-tick live EMA + OBV: emits every input tick with the
    updated indicator values, carrying (ema, last_price, obv) per key
    across micro-batches."""
    out_schema = (
        f"{key_col} long, {ts_col} timestamp, {tiebreak_col} long, "
        f"{value_col} double, ema double, obv long"
    )
    state_schema = "ema double, last_px double, obv long"
    alpha = 2.0 / (span + 1.0)
    beta = 1.0 - alpha

    def fold(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.exists:
            ema, last_px, obv = state.get
        else:
            ema = last_px = None
            obv = 0
        rows = []
        # Materialize the whole micro-batch before sorting: pdf_iter
        # yields Arrow chunks (~10k rows each), and sorting chunks
        # independently would let out-of-order rows straddling a chunk
        # boundary reach the recurrence unsorted.  Per-key state is
        # O(1) but the batch itself is already resident executor-side,
        # so one concat does not change the memory envelope.
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = (
                chunks[0]
                if len(chunks) == 1
                else pd.concat(chunks, ignore_index=True)
            )
            pdf = pdf.sort_values([ts_col, tiebreak_col], ignore_index=True)
            for ts, tb, px, vol in zip(
                pdf[ts_col], pdf[tiebreak_col], pdf[value_col], pdf[volume_col]
            ):
                px = float(px)
                # identical literal steps to operators/ewm.ema and
                # operators/quant.obv
                ema = px if ema is None else alpha * px + beta * ema
                if last_px is not None:
                    if px > last_px:
                        obv += int(vol)
                    elif px < last_px:
                        obv -= int(vol)
                last_px = px
                rows.append((key[0], ts, int(tb), px, ema, obv))
        state.update((ema, last_px, obv))
        if rows:
            yield pd.DataFrame(
                rows, columns=[key_col, ts_col, tiebreak_col, value_col, "ema", "obv"]
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
