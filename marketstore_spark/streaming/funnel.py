"""Stateful streaming funnel — the batch event_funnel chain kept live
across micro-batches.

Reference: the websocket stream (frontend/stream) pushes raw writes and
leaves sequence analytics to the client; this moves the funnel chain
INTO the engine so a dashboard subscribes to per-user funnel depth
instead of replaying the event log.  Windowed aggregation can't
express "earliest step-k event after the step-(k−1) time" (the chain
is a per-user recurrence over the whole history), so this is the
``applyInPandasWithState`` case.

Exactness contract: for a feed that arrives time-ordered within each
user (the same ordering contract as the other streaming folds), the
carried chain equals operators/funnel.event_funnel's greedy-earliest
chain on the union of all micro-batches — the first step-1 event seen
IS the minimum, and the first qualifying step-k event after the carried
step-(k−1) time IS that minimum too.  Pinned in tests/test_streaming.py
by replaying a 2-batch split against the batch operator.

State per user is O(#steps): the chain's epoch-µs times (−1 = not yet
reached).  Output is ONE row per (user, micro-batch) carrying the
updated chain and depth — the dashboard tick, not per-event fan-out.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_UNSET = -1


def stream_funnel(
    stream: DataFrame,
    steps: Sequence[str],
    window_us: int | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Live per-user funnel chain over ``steps`` (see
    operators/funnel.event_funnel for the chain semantics).  Emits
    (user, depth, chain_us) after every micro-batch that contains
    events for the user; ``chain_us[i]`` is the epoch-µs time step
    ``i+1`` was reached, −1 if not yet."""
    if not steps:
        raise ValueError("steps must be non-empty")
    steps = list(steps)
    step_idx = {s: i for i, s in enumerate(steps)}
    if len(step_idx) != len(steps):
        raise ValueError("steps must be distinct event types")
    n_steps = len(steps)
    key_type = stream.schema[key_col].dataType.simpleString()
    out_schema = f"{key_col} {key_type}, depth long, chain_us array<long>"
    state_schema = "chain array<long>"

    def fold(key, pdf_iter, state: GroupState):
        import pandas as pd

        chain = list(state.get[0]) if state.exists else [_UNSET] * n_steps
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if not chunks:
            state.update((chain,))
            return
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values([ts_col, tiebreak_col], ignore_index=True)
        ts_us = (pdf[ts_col].astype("datetime64[us]").astype("int64")).tolist()
        for t, et in zip(ts_us, pdf[type_col].tolist()):
            i = step_idx.get(et)
            if i is None or chain[i] != _UNSET:
                continue
            if i == 0:
                chain[0] = t
            elif (
                chain[i - 1] != _UNSET
                and t > chain[i - 1]
                and (window_us is None or t <= chain[0] + window_us)
            ):
                chain[i] = t
        state.update((chain,))
        depth = 0
        for t in chain:
            if t == _UNSET:
                break
            depth += 1
        yield pd.DataFrame(
            {key_col: [key[0]], "depth": [depth], "chain_us": [list(chain)]}
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_transitions(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Live event-type transition counts — the streaming twin of
    operators/funnel.event_transitions.  State per user is O(1): the
    last seen event type.  Each micro-batch folds its events in
    (ts, tiebreak) order and emits the batch's (from_type, to_type,
    transitions) partial counts for the user, INCLUDING the
    batch-boundary transition from the carried state, so summing the
    emitted rows over any micro-batch slicing equals the batch
    operator's counts exactly (pinned in tests/test_streaming.py).
    A consumer keeps the running matrix with a trivial rollup."""
    key_type = stream.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, from_type string, to_type string, transitions long"
    )
    state_schema = "last_type string"

    def fold(key, pdf_iter, state: GroupState):
        import pandas as pd

        last = state.get[0] if state.exists else None
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if not chunks:
            state.update((last,))
            return
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values([ts_col, tiebreak_col], ignore_index=True)
        counts: dict[tuple[str, str], int] = {}
        for et in pdf[type_col].tolist():
            if last is not None:
                pair = (last, et)
                counts[pair] = counts.get(pair, 0) + 1
            last = et
        state.update((last,))
        if counts:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(counts),
                    "from_type": [a for a, _ in counts],
                    "to_type": [b for _, b in counts],
                    "transitions": list(counts.values()),
                }
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
