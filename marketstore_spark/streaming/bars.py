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

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_EMPTY = (0, -1, 0, 0, 0, 0, 0, 0, 0, 0, 0)  # cum + no open bar

_CENT = Decimal("0.01")


def _cents(px) -> int:
    """Integer cents, HALF_UP — bitwise the batch operators'
    ``cast(decimal(8,2))``.  Python's ``round()`` is banker's rounding
    and diverges on exact half-cents (1.005 -> 100 vs the engines'
    101); Spark's double->decimal cast goes through the double's
    SHORTEST decimal repr (``BigDecimal.valueOf``/``Double.toString``)
    then rounds HALF_UP, which ``Decimal(str(px))`` replicates exactly
    (CPython ``str`` is the same shortest-repr algorithm)."""
    return int(Decimal(str(float(px))).quantize(_CENT, rounding=ROUND_HALF_UP).scaleb(2))


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
    are folded as integer cents via HALF_UP (``_cents`` — bitwise the
    batch DECIMAL(8,2) cast for ANY float feed, not just 2-dp)."""
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
                px_c = _cents(px)
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
                px_c = _cents(px)
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


def stream_adx(
    stream: DataFrame,
    n: int = 14,
    timeframe: str = "1 day",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Live ADX (operators/quant.adx kept live): per symbol, carries
    the OPEN wall-clock candle, the last CLOSED candle's H/L/C, and
    the four Wilder-RMA accumulators — O(1) state.  A row emits each
    time a candle closes (from the SECOND closed candle on — the first
    has no predecessor, the batch rule), carrying that candle's exact
    integer DM/TR and the ±DI/DX/ADX doubles, float64-for-float64 the
    batch operator's values under any micro-batch slicing (pinned in
    tests).  The still-open candle is never emitted (append
    semantics).

    Buckets are epoch-aligned fixed windows (``ts_us DIV duration`` —
    exactly ``F.window``'s alignment), so a streaming row and its
    batch backfill land in the same bucket.  Ticks must arrive
    time-ordered across batches per key (the stream_ema_obv
    contract); within a batch they are sorted before the fold.
    """
    from marketstore_spark.operators.gapfill import _duration_us

    if n <= 0:
        raise ValueError("n must be positive")
    dur = _duration_us(timeframe)
    a = 1.0 / float(n)
    b = 1.0 - a
    out_schema = (
        f"{key_col} long, epoch timestamp, dmp long, dmm long, tr long, "
        f"di_plus double, di_minus double, dx double, adx double"
    )
    state_schema = (
        "ph long, pl long, pc long, has_prev boolean, "
        "ob long, oh long, ol long, oc long, has_open boolean, "
        "sdp double, sdm double, st double, sadx double, has_rma boolean"
    )

    def fold(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.exists:
            (ph, pl, pc, has_prev, ob, oh, ol, oc, has_open,
             sdp, sdm, st, sadx, has_rma) = state.get
        else:
            ph = pl = pc = ob = oh = ol = oc = 0
            has_prev = has_open = has_rma = False
            sdp = sdm = st = sadx = 0.0
        done = []

        def close_candle():
            # the batch chain, literally: ints -> a*x + b*prev -> the
            # guarded DI/DX expressions (operators/quant.adx's fold)
            nonlocal ph, pl, pc, has_prev, sdp, sdm, st, sadx, has_rma
            if has_prev:
                up = oh - ph
                dn = pl - ol
                dmp = up if (up > dn and up > 0) else 0
                dmm = dn if (dn > up and dn > 0) else 0
                tr = max(oh - ol, abs(oh - pc), abs(ol - pc))
                if not has_rma:
                    sdp, sdm, st = float(dmp), float(dmm), float(tr)
                    first = True
                else:
                    sdp = a * float(dmp) + b * sdp
                    sdm = a * float(dmm) + b * sdm
                    st = a * float(tr) + b * st
                    first = False
                dip = (100.0 * sdp) / st if st > 0.0 else 0.0
                dim = (100.0 * sdm) / st if st > 0.0 else 0.0
                s = dip + dim
                dx = (100.0 * abs(dip - dim)) / s if s > 0.0 else 0.0
                sadx = dx if first else a * dx + b * sadx
                has_rma = True
                done.append(
                    (key[0], pd.Timestamp(ob, unit="us"), dmp, dmm, tr,
                     dip, dim, dx, sadx)
                )
            ph, pl, pc, has_prev = oh, ol, oc, True

        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = (
                chunks[0]
                if len(chunks) == 1
                else pd.concat(chunks, ignore_index=True)
            )
            pdf = pdf.sort_values([ts_col, tiebreak_col], ignore_index=True)
            for ts, px in zip(pdf[ts_col], pdf[value_col]):
                px_c = _cents(px)
                t_us = int(pd.Timestamp(ts).value // 1000)
                bkt = (t_us // dur) * dur
                if not has_open:
                    ob, oh, ol, oc, has_open = bkt, px_c, px_c, px_c, True
                elif bkt != ob:
                    close_candle()
                    ob, oh, ol, oc = bkt, px_c, px_c, px_c
                else:
                    oh, ol = max(oh, px_c), min(ol, px_c)
                oc = px_c
            state.update(
                (ph, pl, pc, has_prev, ob, oh, ol, oc, has_open,
                 sdp, sdm, st, sadx, has_rma)
            )
        if done:
            yield pd.DataFrame(
                done,
                columns=[key_col, "epoch", "dmp", "dmm", "tr",
                         "di_plus", "di_minus", "dx", "adx"],
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_mfi(
    stream: DataFrame,
    n: int = 14,
    timeframe: str = "1 day",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    volume_col: str = "volume",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Live Money Flow Index (operators/quant.mfi kept live): per
    symbol, carries the OPEN wall-clock candle (H/L/C + volume), the
    last closed candle's tripled typical price, and the trailing ``n``
    closed candles' (positive, negative) integer flows — O(n) state,
    serialized as decimal strings (arbitrary-precision: the batch
    operator sums flows in DECIMAL(38,0); long state would overflow).
    A row emits each time a candle closes, carrying that candle's MFI
    (NULL during warm-up, exactly the batch rule ``rn > n``) —
    float64-for-float64 the batch operator under any micro-batch
    slicing (pinned in tests).  The open candle never emits.
    """
    from marketstore_spark.operators.gapfill import _duration_us

    if n <= 0:
        raise ValueError("n must be positive")
    dur = _duration_us(timeframe)
    win = int(n)
    out_schema = f"{key_col} long, epoch timestamp, mfi double"
    # Flows live in state as DECIMAL-STRING arrays, not array<long>:
    # a single candle's flow is tp3*volume and the batch operator
    # deliberately sums flows in DECIMAL(38,0) because hot-symbol
    # money flow clears 2^63 — long state would overflow where batch
    # is guarded.  Python ints are arbitrary-precision, so the fold's
    # arithmetic is exact; only the serialized form changes.
    state_schema = (
        "ptp long, has_prev boolean, rn long, "
        "ob long, oh long, ol long, oc long, ovol long, has_open boolean, "
        "tail_pos array<string>, tail_neg array<string>"
    )

    def fold(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.exists:
            (ptp, has_prev, rn, ob, oh, ol, oc, ovol, has_open,
             t_pos, t_neg) = state.get
            t_pos, t_neg = [int(x) for x in t_pos], [int(x) for x in t_neg]
        else:
            ptp = rn = ob = oh = ol = oc = ovol = 0
            has_prev = has_open = False
            t_pos, t_neg = [], []
        done = []

        def close_candle():
            # the batch chain: integer flows signed by the tripled
            # typical price's direction, window = trailing n flows
            nonlocal ptp, has_prev, rn
            tp3 = oh + ol + oc
            mf = tp3 * ovol
            pos = mf if (has_prev and tp3 > ptp) else 0
            neg = mf if (has_prev and tp3 < ptp) else 0
            rn += 1
            t_pos.append(pos)
            t_neg.append(neg)
            del t_pos[:-win], t_neg[:-win]
            sp, sn = sum(t_pos), sum(t_neg)
            val = (
                100.0 * float(sp) / float(sp + sn)
                if rn > win and (sp + sn) > 0
                else None
            )
            done.append((key[0], pd.Timestamp(ob, unit="us"), val))
            ptp, has_prev = tp3, True

        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = (
                chunks[0]
                if len(chunks) == 1
                else pd.concat(chunks, ignore_index=True)
            )
            pdf = pdf.sort_values([ts_col, tiebreak_col], ignore_index=True)
            for ts, px, v in zip(pdf[ts_col], pdf[value_col], pdf[volume_col]):
                px_c = _cents(px)
                v = int(v)
                t_us = int(pd.Timestamp(ts).value // 1000)
                bkt = (t_us // dur) * dur
                if not has_open:
                    ob, oh, ol, oc, ovol, has_open = bkt, px_c, px_c, px_c, 0, True
                elif bkt != ob:
                    close_candle()
                    ob, oh, ol, oc, ovol = bkt, px_c, px_c, px_c, 0
                else:
                    oh, ol = max(oh, px_c), min(ol, px_c)
                oc = px_c
                ovol += v
            state.update(
                (ptp, has_prev, rn, ob, oh, ol, oc, ovol, has_open,
                 [str(x) for x in t_pos], [str(x) for x in t_neg])
            )
        if done:
            yield pd.DataFrame(done, columns=[key_col, "epoch", "mfi"])

    return stream.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
