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


def stream_nbbo(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    venue_col: str = "event_type",
    bid_col: str = "bid_c",
    ask_col: str = "ask_c",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Live consolidated NBBO: after each micro-batch, emit the current
    best bid / best ask per symbol across every venue's LAST quote —
    the streaming face of operators/quant.nbbo, and the engine-side
    version of what a subscriber to the reference's quote stream
    (frontend/stream + models/quote.go) assembles client-side.

    State per symbol is one quote per venue — venue count is a small
    constant (dozens), so state is O(venues), carried as parallel
    arrays in the state struct.  Each batch folds its quotes in
    (ts, tiebreak) order updating the per-venue last; the emitted row
    is the argmax/argmin over the venue map with the SAME tie rule as
    the batch operator (greatest venue name on bid ties, smallest on
    ask ties).  One output row per (symbol, batch) — the consolidated
    tape tick, not per-quote fan-out.
    """
    key_type = stream.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, asof_ts timestamp, best_bid_c long, "
        f"best_ask_c long, bid_venue string, ask_venue string, "
        f"spread_c long, n_venues int"
    )
    state_schema = (
        "venues array<string>, ts_us array<long>, tbs array<long>, "
        "bids array<long>, asks array<long>"
    )

    def fold(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.exists:
            venues, ts_us, tbs, bids, asks = state.get
            book = {
                v: (t, tb, b, a)
                for v, t, tb, b, a in zip(venues, ts_us, tbs, bids, asks)
            }
        else:
            book = {}
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if not chunks:
            # Nothing to fold: the book is unchanged from state, and
            # un-updated state persists as-is under NoTimeout — so no
            # state.update here.  (Updating would also MATERIALIZE
            # empty state for keys whose batches carry only junk rows
            # — unbounded state-store growth.)
            return
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        # Rows without an identity (ts/tiebreak/venue) can't be placed
        # in the book at all; a null SIDE, however, still REPLACES the
        # venue's last quote (the batch struct-max picks the latest
        # quote first and only then compares sides) — the null side
        # simply contributes no candidate.  int() guards below keep
        # NaN (nullable-int-as-float) from killing the query.
        pdf = pdf.dropna(subset=[ts_col, tiebreak_col, venue_col])
        if not len(pdf):
            # Nothing placeable this batch: emit NOTHING (a re-emitted
            # previous row would carry a stale asof_ts and duplicate
            # the consolidated tick in append mode), and leave state
            # untouched — same rationale as the empty-chunks branch.
            return
        pdf = pdf.sort_values([ts_col, tiebreak_col], ignore_index=True)
        for ts, tb, venue, bid, ask in zip(
            pdf[ts_col], pdf[tiebreak_col], pdf[venue_col],
            pdf[bid_col], pdf[ask_col],
        ):
            t_us = int(pd.Timestamp(ts).value // 1000)
            prev = book.get(venue)
            # last-quote-wins within and across batches, (ts, tiebreak)
            # ordered — identical pick rule to the batch struct-max
            if prev is None or (t_us, int(tb)) >= (prev[0], prev[1]):
                book[venue] = (
                    t_us,
                    int(tb),
                    None if pd.isna(bid) else int(bid),
                    None if pd.isna(ask) else int(ask),
                )
        # argmax bid (ties -> greatest venue), argmin ask (ties ->
        # smallest venue): the batch operator's struct ordering.
        # Venues whose latest quote has a null side contribute no
        # candidate on that side; if EVERY side is null the price is
        # null with the struct ordering's venue-only fallback.
        bids = [(q[2], v) for v, q in book.items() if q[2] is not None]
        bid_px, bid_venue = max(bids) if bids else (None, None)
        asks = [q[3] for q in book.values() if q[3] is not None]
        if asks:
            ask_px = min(asks)
            ask_venue = min(v for v, q in book.items() if q[3] == ask_px)
        else:
            ask_px, ask_venue = None, None
        asof_us = max(q[0] for q in book.values())
        state.update(
            (
                list(book),
                [book[v][0] for v in book],
                [book[v][1] for v in book],
                [book[v][2] for v in book],
                [book[v][3] for v in book],
            )
        )
        yield pd.DataFrame(
            [
                (
                    key[0],
                    pd.Timestamp(asof_us * 1000),
                    bid_px,
                    ask_px,
                    bid_venue,
                    ask_venue,
                    (
                        None
                        if bid_px is None or ask_px is None
                        else ask_px - bid_px
                    ),
                    len(book),
                )
            ],
            columns=[
                key_col, "asof_ts", "best_bid_c", "best_ask_c",
                "bid_venue", "ask_venue", "spread_c", "n_venues",
            ],
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
