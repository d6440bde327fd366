"""Streaming event-driven bars: the live face of operators/bars.
event_bars, mirroring how contrib/ondiskagg keeps wall-clock candles
continuously materialized for the reference's stream subscribers —
here the bar clock is cumulative ACTIVITY (volume / dollar notional),
so no window aggregation can express it: bar membership depends on the
running total over every prior tick, which is per-key state.

``applyInPandasWithState`` carries (running activity total, the OPEN
partial bar) per symbol.  Each micro-batch folds its ticks in
(ts, tiebreak) order; a tick whose bar id exceeds the open bar's
COMPLETES that bar (emitted this batch) and opens the next.  The open
partial is never emitted — a bar row appears exactly once, when it
closes (append semantics; the same bar never needs upserting
downstream).

Exactness contract: bar assignment and every OHLC/volume/notional
field replicate operators/bars.event_bars integer-for-integer —
pinned in tests by replaying a multi-batch slicing against the batch
operator and comparing completed bars exactly.

Ordering: within a key, ticks must arrive time-ordered ACROSS batches
(the stream_ema_obv contract); within a batch they are sorted before
the fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_EMPTY = (0, -1, 0, 0, 0, 0, 0, 0, 0, 0, 0)  # cum + no open bar


def stream_event_bars(
    stream: DataFrame,
    threshold: int,
    measure: str = "volume",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    volume_col: str = "volume",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Live volume/dollar bars per symbol: emits each bar ONCE, when a
    later tick's running activity crosses into the next bar.  Prices
    are folded as integer cents (``round(value·100)`` — identical to
    the batch DECIMAL(8,2) cast for 2-dp feeds, the tick contract)."""
    if measure not in ("volume", "dollar"):
        raise ValueError(f"measure must be 'volume' or 'dollar', got {measure!r}")
    if threshold <= 0:
        raise ValueError("threshold must be positive")
    out_schema = (
        f"{key_col} long, bar_id long, open_c long, high_c long, low_c long, "
        f"close_c long, volume long, notional_c long, n_ticks long, "
        f"t_open timestamp, t_close timestamp, vwap double"
    )
    state_schema = (
        "cum long, bar_id long, open_c long, high_c long, low_c long, "
        "close_c long, volume long, notional_c long, n_ticks long, "
        "t_open_us long, t_close_us long"
    )
    dollar = measure == "dollar"
    thr = int(threshold)

    def fold(key, pdf_iter, state: GroupState):
        import pandas as pd

        st = state.get if state.exists else _EMPTY
        cum, bar_id, o, h, lo, c, vol, notional, n, t0, t1 = st
        done = []

        def close_bar():
            done.append(
                (
                    key[0],
                    bar_id,
                    o,
                    h,
                    lo,
                    c,
                    vol,
                    notional,
                    n,
                    pd.Timestamp(t0, unit="us"),
                    pd.Timestamp(t1, unit="us"),
                    (notional / 1e2 / vol) if vol else None,
                )
            )

        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = (
                chunks[0]
                if len(chunks) == 1
                else pd.concat(chunks, ignore_index=True)
            )
            pdf = pdf.sort_values([ts_col, tiebreak_col], ignore_index=True)
            for ts, px, v in zip(pdf[ts_col], pdf[value_col], pdf[volume_col]):
                px_c = int(round(float(px) * 100))
                v = int(v)
                act = px_c * v if dollar else v
                b = cum // thr  # pre-tick total, the batch rule
                cum += act
                t_us = int(pd.Timestamp(ts).value // 1000)
                if b != bar_id:
                    if bar_id >= 0:
                        close_bar()
                    bar_id, o, h, lo, c = b, px_c, px_c, px_c, px_c
                    vol, notional, n, t0, t1 = 0, 0, 0, t_us, t_us
                h, lo, c = max(h, px_c), min(lo, px_c), px_c
                vol += v
                notional += px_c * v
                n += 1
                t1 = t_us
            state.update((cum, bar_id, o, h, lo, c, vol, notional, n, t0, t1))
        if done:
            yield pd.DataFrame(
                done,
                columns=[
                    key_col,
                    "bar_id",
                    "open_c",
                    "high_c",
                    "low_c",
                    "close_c",
                    "volume",
                    "notional_c",
                    "n_ticks",
                    "t_open",
                    "t_close",
                    "vwap",
                ],
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_vpin(
    stream: DataFrame,
    bucket_volume: int = 2000,
    n: int = 10,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    volume_col: str = "volume",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Live VPIN (operators/bars.vpin kept live): per symbol, carries
    the tick-rule direction, the running volume total, the OPEN
    volume bucket's buy/sell/total, and the trailing ``n−1`` CLOSED
    buckets' (imbalance, total) — O(n) state.  A row emits each time
    a volume bucket closes, carrying that bucket's flow split and the
    trailing-``n`` ``Σ|imbalance| / Σtotal`` ratio (NULL during
    warm-up) — integer-for-integer the batch operator's value for
    every closed bucket, under any micro-batch slicing (pinned in
    tests).  The still-open bucket is never emitted."""
    if bucket_volume <= 0 or n <= 0:
        raise ValueError("bucket_volume and n must be positive")
    out_schema = (
        f"{key_col} long, bucket_id long, buy_vol long, sell_vol long, "
        f"total_vol long, n_ticks long, imbalance long, vpin double"
    )
    state_schema = (
        "last_px long, side int, cum long, bucket_id long, buy long, "
        "sell long, total long, nt long, tail_imb array<long>, "
        "tail_tot array<long>"
    )
    thr, win = int(bucket_volume), int(n)

    def fold(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.exists:
            last_px, side, cum, bid, buy, sell, tot, nt, t_imb, t_tot = state.get
            t_imb, t_tot = list(t_imb), list(t_tot)
        else:
            last_px, side, cum, bid = None, 0, 0, -1
            buy = sell = tot = nt = 0
            t_imb, t_tot = [], []
        done = []

        def close_bucket():
            imb = abs(buy - sell)
            t_imb.append(imb)
            t_tot.append(tot)
            # the trailing window covers the closing bucket + n-1 prior
            del t_imb[:-win], t_tot[:-win]
            vp = (
                float(sum(t_imb)) / float(sum(t_tot))
                if len(t_imb) == win and sum(t_tot) > 0
                else None
            )
            done.append((key[0], bid, buy, sell, tot, nt, imb, vp))

        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = (
                chunks[0]
                if len(chunks) == 1
                else pd.concat(chunks, ignore_index=True)
            )
            pdf = pdf.sort_values([ts_col, tiebreak_col], ignore_index=True)
            for px, v in zip(pdf[value_col], pdf[volume_col]):
                px_c = int(round(float(px) * 100))
                v = int(v)
                if last_px is not None and px_c != last_px:
                    side = 1 if px_c > last_px else -1
                last_px = px_c
                b = cum // thr
                cum += v
                if b != bid:
                    if bid >= 0:
                        close_bucket()
                    bid, buy, sell, tot, nt = b, 0, 0, 0, 0
                if side == 1:
                    buy += v
                elif side == -1:
                    sell += v
                tot += v
                nt += 1
            state.update(
                (last_px, side, cum, bid, buy, sell, tot, nt, t_imb, t_tot)
            )
        if done:
            yield pd.DataFrame(
                done,
                columns=[
                    key_col, "bucket_id", "buy_vol", "sell_vol",
                    "total_vol", "n_ticks", "imbalance", "vpin",
                ],
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
