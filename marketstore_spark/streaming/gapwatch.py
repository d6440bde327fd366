"""Stateful streaming gap watcher — uda/gap as a live monitor.

Reference: uda/gap/gap.go detects holes in the Epoch index after the
fact; a live feed wants the same signal as ticks arrive ("symbol X has
gone quiet / had a hole > threshold").  Windowed aggregation can't
express this — the gap is BETWEEN events, and its length isn't known
until the next event lands — so this is the genuinely-stateful case
the task reserves for ``applyInPandasWithState``: per-key state is one
value (last seen event time), each micro-batch compares its ticks to
that carried state, emits any hole over the threshold, and updates the
state.

Scale: state size is O(#keys) × one timestamp — the minimum possible;
batches stream through Arrow in pandas chunks (no per-row Python).
Delivery within a key must be time-ordered across micro-batches for
exact results (true for an ordered feed per symbol; an out-of-order
replay should use the batch operator instead).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_gap_detector(
    stream: DataFrame,
    threshold_seconds: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Emit (key, prev_ts, next_ts, gap_seconds) whenever consecutive
    events for a key are more than ``threshold_seconds`` apart,
    including across micro-batch boundaries (carried state)."""
    out_schema = (
        f"{key_col} long, prev_ts timestamp, next_ts timestamp, gap_seconds double"
    )
    state_schema = "last_us long"
    thr_us = int(threshold_seconds * 1_000_000)

    def detect(key, pdf_iter, state: GroupState):
        import pandas as pd

        last_us = state.get[0] if state.exists else None
        out = []
        for pdf in pdf_iter:
            ts = pdf[ts_col].sort_values()
            us = (ts.astype("int64") // 1000).to_list()  # ns -> us
            for t_us in us:
                if last_us is not None and t_us - last_us > thr_us:
                    out.append((key[0], last_us, t_us, (t_us - last_us) / 1e6))
                last_us = t_us
        if last_us is not None:
            state.update((last_us,))
        if out:
            yield pd.DataFrame(
                {
                    key_col: [r[0] for r in out],
                    "prev_ts": pd.to_datetime([r[1] * 1000 for r in out]),
                    "next_ts": pd.to_datetime([r[2] * 1000 for r in out]),
                    "gap_seconds": [r[3] for r in out],
                }
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        detect,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
