"""Concrete exchange-connector payload normalizers.

The reference ships one Go module per exchange connector —
``contrib/binancefeeder/binancefeeder.go`` (klines → OHLCV CSM),
``contrib/polygon/api/schema.go`` + ``handlers/handlers.go`` (REST
aggregates and websocket trade/quote/agg events → TICK/QUOTE/OHLCV
buckets, with a trade-condition skip list), and ``contrib/iex/iex.go``
+ ``api/api.go`` (chart responses → OHLCV, NY-time bars, zero-volume
skip).  The live HTTP/websocket pull needs API credentials this
environment doesn't have, so the *fetch* stays an injected callable
(the :mod:`~marketstore_spark.streaming.feeder` contract); everything
else each connector does — the wire-shape schema, the field mapping,
the row-validity rules, the timezone handling — is implemented and
tested here against fixture payloads shaped exactly like the public
APIs.

Spark posture: every normalizer is a pure DataFrame transform over a
column of raw JSON payload strings — ``from_json`` with an explicit
wire schema, ``explode``, and JVM-side filters.  That makes the same
code serve both deployment shapes:

* **poll path** — a feeder tick wraps one API response in a one-row
  DataFrame (driver-side, KB-sized, exactly like the reference's
  in-process ``json.Unmarshal``);
* **landing-zone path** — at 100 TB you don't poll, you bulk-load: a
  directory of raw API responses (one JSON document per line/file)
  becomes ``spark.read.text`` → the same normalizer, and the parse
  distributes across executors with no Python in the loop.

No UDFs anywhere: JSON decode, timestamp parsing (including the IEX
America/New_York → UTC conversion) and the polygon condition filter
(``arrays_overlap`` against a literal skip set) are all Catalyst
expressions inside whole-stage codegen.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "BINANCE_KLINES_SCHEMA",
    "POLYGON_AGGS_SCHEMA",
    "POLYGON_EVENTS_SCHEMA",
    "IEX_CHART_SCHEMA",
    "binance_interval",
    "normalize_binance_klines",
    "normalize_polygon_aggs",
    "normalize_polygon_trades",
    "normalize_polygon_quotes",
    "normalize_iex_chart",
    "normalize_gdax_candles",
    "normalize_bitmex_bucketed",
    "normalize_alpaca_trades",
    "normalize_alpaca_quotes",
    "normalize_alpaca_aggregates",
    "XIGNITE_QUOTES_SCHEMA",
    "XIGNITE_BARS_SCHEMA",
    "XIGNITE_QUOTES_RANGE_SCHEMA",
    "normalize_xignite_quotes",
    "normalize_xignite_bars",
    "normalize_xignite_quotes_range",
    "xignite_list_symbols",
    "connector_fetch",
]


# ---------------------------------------------------------------------
# Binance — /api/v3/klines (contrib/binancefeeder/binancefeeder.go)
# ---------------------------------------------------------------------

#: A klines response is a JSON array of 12-element arrays with mixed
#: number/string entries (``[openTime, "open", "high", "low", "close",
#: "volume", closeTime, ...]``).  Parsing every element as *string*
#: keeps the exact lexical form the exchange sent (the reference also
#: receives prices as strings and strconv-parses them —
#: binancefeeder.go:100 convertStringToFloat).
BINANCE_KLINES_SCHEMA = T.ArrayType(T.ArrayType(T.StringType()))

#: marketstore timeframe suffix → binance interval suffix
#: (binancefeeder.go:32 suffixBinanceDefs).
_BINANCE_SUFFIX = {"Min": "m", "H": "h", "D": "d", "W": "w"}

_TIMEFRAME_RE = re.compile(r"^(\d+)\s*([A-Za-z]+)$")


def binance_interval(timeframe: str) -> str:
    """``"1Min"`` → ``"1m"``, ``"4H"`` → ``"4h"`` — the timeframe
    translation the reference applies before calling the klines API
    (binancefeeder.go:201-215)."""
    m = _TIMEFRAME_RE.match(timeframe.strip())
    if not m or m.group(2) not in _BINANCE_SUFFIX:
        raise ValueError(
            f"unsupported binance timeframe {timeframe!r} — "
            f"suffix must be one of {sorted(_BINANCE_SUFFIX)}"
        )
    return m.group(1) + _BINANCE_SUFFIX[m.group(2)]


def normalize_binance_klines(
    raw: DataFrame,
    payload_col: str = "payload",
    symbol_col: str = "symbol",
) -> DataFrame:
    """Klines payloads → (symbol, ts, open, high, low, close, volume).

    Mirrors convertRateToRecords (binancefeeder.go:325-356): a kline
    is kept only when its openTime is non-zero and every price string
    is non-empty/parseable; ts is the bar OPEN time (epoch ms).  The
    symbol rides alongside the payload because the klines body doesn't
    carry it (the reference tracks it in the request loop).
    """
    k = F.col("_k")
    parsed = (
        raw.withColumn("_ks", F.from_json(F.col(payload_col), BINANCE_KLINES_SCHEMA))
        .select(F.col(symbol_col).alias("symbol"), F.explode("_ks").alias("_k"))
        # try_cast: an empty/garbled exchange string becomes NULL and
        # the validity filter drops the bar — the reference's strconv
        # error path (ANSI cast would instead fail the whole batch)
        .select(
            "symbol",
            k.getItem(0).try_cast("long").alias("_open_ms"),
            k.getItem(1).try_cast("double").alias("open"),
            k.getItem(2).try_cast("double").alias("high"),
            k.getItem(3).try_cast("double").alias("low"),
            k.getItem(4).try_cast("double").alias("close"),
            k.getItem(5).try_cast("double").alias("volume"),
        )
    )
    valid = (
        (F.col("_open_ms").isNotNull())
        & (F.col("_open_ms") != 0)
        & F.col("open").isNotNull()
        & F.col("high").isNotNull()
        & F.col("low").isNotNull()
        & F.col("close").isNotNull()
        & F.col("volume").isNotNull()
    )
    return parsed.filter(valid).select(
        "symbol",
        F.timestamp_millis(F.col("_open_ms")).alias("ts"),
        "open",
        "high",
        "low",
        "close",
        "volume",
    )


# ---------------------------------------------------------------------
# Polygon — REST v2 aggregates + websocket T/Q events
# (contrib/polygon/api/schema.go, handlers/handlers.go, handlers/writer.go)
# ---------------------------------------------------------------------

POLYGON_AGGS_SCHEMA = T.StructType(
    [
        T.StructField("ticker", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("adjusted", T.BooleanType()),
        T.StructField("queryCount", T.IntegerType()),
        T.StructField("resultCount", T.IntegerType()),
        T.StructField(
            "results",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("v", T.DoubleType()),
                        T.StructField("o", T.DoubleType()),
                        T.StructField("c", T.DoubleType()),
                        T.StructField("h", T.DoubleType()),
                        T.StructField("l", T.DoubleType()),
                        T.StructField("t", T.LongType()),
                        T.StructField("n", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)

#: One websocket frame is a JSON array of events; trade (ev=T), quote
#: (ev=Q) and minute-agg (ev=AM) fields union into one struct
#: (api/schema.go PolyTrade/PolyQuote/PolyAggregate).
POLYGON_EVENTS_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("ev", T.StringType()),
            T.StructField("sym", T.StringType()),
            T.StructField("p", T.DoubleType()),
            T.StructField("s", T.LongType()),
            T.StructField("t", T.LongType()),
            T.StructField("c", T.ArrayType(T.IntegerType())),
            T.StructField("bp", T.DoubleType()),
            T.StructField("bs", T.LongType()),
            T.StructField("ap", T.DoubleType()),
            T.StructField("as", T.LongType()),
        ]
    )
)

#: Trade conditions that exclude a tick from the bucket
#: (handlers/handlers.go:18-31): exchange summaries and official
#: open/close/reopen prints are session markers, not trades.
POLYGON_SKIP_CONDITIONS = (15, 16, 17, 18, 19, 51)


def normalize_polygon_aggs(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """HistoricAggregates responses → (symbol, ts, open, high, low,
    close, volume, trade_count).  handlers.go:125-142 maps
    o/h/l/c/v/t onto the OHLCV bucket; t is epoch ms."""
    r = F.col("_r")
    return (
        raw.withColumn("_a", F.from_json(F.col(payload_col), POLYGON_AGGS_SCHEMA))
        .select(F.col("_a.ticker").alias("symbol"), F.explode("_a.results").alias("_r"))
        .select(
            "symbol",
            F.timestamp_millis(r.getField("t")).alias("ts"),
            r.getField("o").alias("open"),
            r.getField("h").alias("high"),
            r.getField("l").alias("low"),
            r.getField("c").alias("close"),
            r.getField("v").alias("volume"),
            r.getField("n").alias("trade_count"),
        )
        .filter(F.col("ts").isNotNull())
    )


def _polygon_events(raw: DataFrame, payload_col: str, ev: str) -> DataFrame:
    return (
        raw.withColumn("_es", F.from_json(F.col(payload_col), POLYGON_EVENTS_SCHEMA))
        .select(F.explode("_es").alias("_e"))
        .filter(F.col("_e.ev") == ev)
    )


def normalize_polygon_trades(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Websocket T events → (symbol, ts, price, size).

    Applies the reference's tick-validity rule (handlers.go:49-55):
    drop the print when a skip-listed condition is present, or size or
    price is non-positive.  ts keeps millisecond precision — the
    reference splits it into Epoch seconds + a Nanoseconds column
    (handlers/writer.go:51-52); one timestamp column carries the same
    information in the parquet engine.
    """
    skip = F.array(*[F.lit(c) for c in POLYGON_SKIP_CONDITIONS])
    e = F.col("_e")
    return (
        _polygon_events(raw, payload_col, "T")
        .filter(
            ~F.coalesce(
                F.arrays_overlap(e.getField("c"), skip), F.lit(False)
            )
            & (e.getField("s") > 0)
            & (e.getField("p") > 0)
        )
        .select(
            e.getField("sym").alias("symbol"),
            F.timestamp_millis(e.getField("t")).alias("ts"),
            e.getField("p").alias("price"),
            e.getField("s").alias("size"),
        )
    )


def normalize_polygon_quotes(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Websocket Q events → (symbol, ts, bid_price, bid_size,
    ask_price, ask_size) — handlers/writer.go:51-56's QUOTE bucket."""
    e = F.col("_e")
    return _polygon_events(raw, payload_col, "Q").select(
        e.getField("sym").alias("symbol"),
        F.timestamp_millis(e.getField("t")).alias("ts"),
        e.getField("bp").alias("bid_price"),
        e.getField("bs").alias("bid_size"),
        e.getField("ap").alias("ask_price"),
        e.getField("as").alias("ask_size"),
    )


# ---------------------------------------------------------------------
# IEX — /stable/stock/market/batch chart responses
# (contrib/iex/api/api.go, contrib/iex/iex.go)
# ---------------------------------------------------------------------

_IEX_CHART_FIELDS = T.StructType(
    [
        T.StructField("date", T.StringType()),
        T.StructField("minute", T.StringType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.LongType()),
        T.StructField("numberOfTrades", T.IntegerType()),
        T.StructField("average", T.DoubleType()),
        T.StructField("notional", T.DoubleType()),
    ]
)

#: GetBarsResponse is a map keyed by symbol (api/api.go:41); daily
#: pulls fill ``chart``, intraday pulls fill ``intraday-prices``.
IEX_CHART_SCHEMA = T.MapType(
    T.StringType(),
    T.StructType(
        [
            T.StructField("chart", T.ArrayType(_IEX_CHART_FIELDS)),
            T.StructField("intraday-prices", T.ArrayType(_IEX_CHART_FIELDS)),
        ]
    ),
)

_NY = "America/New_York"


def normalize_iex_chart(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Batch chart responses → (symbol, ts, open, high, low, close,
    volume).

    Semantics from the reference: intraday responses land under the
    ``intraday-prices`` key and are folded into the chart slot
    (api/api.go:199-206); zero-volume bars are skipped (iex.go:244);
    a bar with an empty ``minute`` is a daily bar at New-York midnight,
    otherwise ``date + minute`` is a New-York wall-clock time
    (api/api.go:72-82 GetTimestamp with ParseInLocation NY) — both
    convert to UTC here with ``to_utc_timestamp``, which applies the
    correct EST/EDT offset per date.
    """
    b = F.col("_b")
    bars = (
        raw.withColumn("_m", F.from_json(F.col(payload_col), IEX_CHART_SCHEMA))
        .select(F.explode("_m").alias("symbol", "_resp"))
        # api.go:202 — fall back to intraday-prices when chart is absent
        .select(
            "symbol",
            F.explode(
                F.coalesce(
                    F.col("_resp.chart"), F.col("_resp.`intraday-prices`")
                )
            ).alias("_b"),
        )
        .filter(b.getField("volume") > 0)
    )
    minute = b.getField("minute")
    local = F.when(
        minute.isNull() | (minute == ""),
        F.to_timestamp(b.getField("date"), "yyyy-MM-dd"),
    ).otherwise(
        F.to_timestamp(
            F.concat_ws(" ", b.getField("date"), minute), "yyyy-MM-dd HH:mm"
        )
    )
    return bars.select(
        "symbol",
        F.to_utc_timestamp(local, _NY).alias("ts"),
        b.getField("open").alias("open"),
        b.getField("high").alias("high"),
        b.getField("low").alias("low"),
        b.getField("close").alias("close"),
        b.getField("volume").alias("volume"),
    ).filter(F.col("ts").isNotNull())


# ---------------------------------------------------------------------
# GDAX / Coinbase Pro — /products/<id>/candles
# (contrib/gdaxfeeder/gdaxfeeder.go)
# ---------------------------------------------------------------------

#: A candles response is an array of 6-number arrays:
#: ``[time_sec, low, high, open, close, volume]`` (the gdax
#: HistoricRate field order).  Epoch seconds fit a double exactly.
GDAX_CANDLES_SCHEMA = T.ArrayType(T.ArrayType(T.DoubleType()))


def normalize_gdax_candles(
    raw: DataFrame,
    payload_col: str = "payload",
    symbol_col: str = "symbol",
) -> DataFrame:
    """Candles payloads → (symbol, ts, open, high, low, close,
    volume).  gdaxfeeder.go:222-235 maps rate.Time.Unix() +
    Open/High/Low/Close/Volume onto the OHLCV bucket; like binance,
    the response body carries no symbol, so it rides alongside."""
    c = F.col("_c")
    return (
        raw.withColumn("_cs", F.from_json(F.col(payload_col), GDAX_CANDLES_SCHEMA))
        .select(F.col(symbol_col).alias("symbol"), F.explode("_cs").alias("_c"))
        .select(
            "symbol",
            F.timestamp_seconds(c.getItem(0).try_cast("long")).alias("ts"),
            c.getItem(3).alias("open"),
            c.getItem(2).alias("high"),
            c.getItem(1).alias("low"),
            c.getItem(4).alias("close"),
            c.getItem(5).alias("volume"),
        )
        .filter(F.col("ts").isNotNull())
    )


# ---------------------------------------------------------------------
# BitMEX — /api/v1/trade/bucketed (contrib/bitmexfeeder/api/api.go)
# ---------------------------------------------------------------------

BITMEX_BUCKETED_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("timestamp", T.StringType()),
            T.StructField("symbol", T.StringType()),
            T.StructField("open", T.DoubleType()),
            T.StructField("high", T.DoubleType()),
            T.StructField("low", T.DoubleType()),
            T.StructField("close", T.DoubleType()),
            T.StructField("trades", T.DoubleType()),
            T.StructField("volume", T.DoubleType()),
            T.StructField("vwap", T.DoubleType()),
        ]
    )
)


def normalize_bitmex_bucketed(
    raw: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """TradeBucketed responses → (symbol, ts, open, high, low, close,
    volume, trades, vwap).  Timestamps are RFC3339 strings
    (bitmexfeeder.go:227 time.Parse(time.RFC3339)); try_cast drops a
    malformed row instead of failing the batch."""
    b = F.col("_b")
    return (
        raw.withColumn("_bs", F.from_json(F.col(payload_col), BITMEX_BUCKETED_SCHEMA))
        .select(F.explode("_bs").alias("_b"))
        .select(
            b.getField("symbol").alias("symbol"),
            b.getField("timestamp").try_cast("timestamp").alias("ts"),
            b.getField("open").alias("open"),
            b.getField("high").alias("high"),
            b.getField("low").alias("low"),
            b.getField("close").alias("close"),
            b.getField("volume").alias("volume"),
            b.getField("trades").alias("trades"),
            b.getField("vwap").alias("vwap"),
        )
        .filter(F.col("ts").isNotNull() & F.col("symbol").isNotNull())
    )


# ---------------------------------------------------------------------
# Alpaca — websocket envelopes {ev, data} (contrib/alpaca/api/schema.go)
# contrib/polyiex speaks the same trade shape with split sec/nanos.
# ---------------------------------------------------------------------

#: Alpaca's wire reuses one letter in both cases with different
#: meanings per event type: trades carry data.T (symbol) AND data.t
#: (epoch ns); quotes carry p/P and s/S for bid/ask.  Catalyst's
#: default case-INSENSITIVE field resolution makes a from_json struct
#: with those pairs unreferencable (AMBIGUOUS_REFERENCE_TO_FIELDS), so
#: these normalizers extract with ``get_json_object`` — JSONPath is
#: case-sensitive — still entirely JVM-side.


def _gjo(payload_col: str, path: str, typ: str):
    return F.get_json_object(F.col(payload_col), path).try_cast(typ)


def _alpaca_ev(raw: DataFrame, payload_col: str, ev: str) -> DataFrame:
    return raw.filter(
        F.get_json_object(F.col(payload_col), "$.ev") == ev
    )


def _ns_to_ts(col):
    # Spark timestamps are µs precision; alpaca stamps are epoch ns
    # (handlers/writer.go:20 time.Unix(0, t.Timestamp)).  Epoch-ns
    # longs (~1.7e18) exceed double's 2^53 exact range, so `col / 1000`
    # in double precision can floor to the wrong microsecond; DECIMAL
    # division is exact at this width.
    micros = F.floor(col.cast("decimal(20,0)") / F.lit(1000)).cast("long")
    return F.timestamp_micros(micros)


def normalize_alpaca_trades(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    return _alpaca_ev(raw, payload_col, "T").select(
        _gjo(payload_col, "$.data.T", "string").alias("symbol"),
        _ns_to_ts(_gjo(payload_col, "$.data.t", "long")).alias("ts"),
        _gjo(payload_col, "$.data.p", "double").alias("price"),
        _gjo(payload_col, "$.data.s", "long").alias("size"),
    ).filter((F.col("price") > 0) & (F.col("size") > 0))


def normalize_alpaca_quotes(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    return _alpaca_ev(raw, payload_col, "Q").select(
        _gjo(payload_col, "$.data.T", "string").alias("symbol"),
        _ns_to_ts(_gjo(payload_col, "$.data.t", "long")).alias("ts"),
        _gjo(payload_col, "$.data.p", "double").alias("bid_price"),
        _gjo(payload_col, "$.data.s", "long").alias("bid_size"),
        _gjo(payload_col, "$.data.P", "double").alias("ask_price"),
        _gjo(payload_col, "$.data.S", "long").alias("ask_size"),
    )


def normalize_alpaca_aggregates(
    raw: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    return _alpaca_ev(raw, payload_col, "AM").select(
        _gjo(payload_col, "$.data.T", "string").alias("symbol"),
        F.timestamp_millis(_gjo(payload_col, "$.data.s", "long")).alias("ts"),
        _gjo(payload_col, "$.data.o", "double").alias("open"),
        _gjo(payload_col, "$.data.h", "double").alias("high"),
        _gjo(payload_col, "$.data.l", "double").alias("low"),
        _gjo(payload_col, "$.data.c", "double").alias("close"),
        _gjo(payload_col, "$.data.v", "long").alias("volume"),
        _gjo(payload_col, "$.data.vw", "double").alias("vwap"),
    ).filter(F.col("ts").isNotNull())


# ---------------------------------------------------------------------
# Xignite — QUICKEquityRealTime GetQuotes / QUICKEquityHistorical
# GetBars + GetQuotesRange (contrib/xignitefeeder/api/model.go,
# writer/quotes_writer.go, writer/bar_writer.go,
# writer/quotes_range_writer.go)
# ---------------------------------------------------------------------

#: Xignite datetimes are strings in ``yyyy/MM/dd HH:mm:ss`` local
#: exchange time with a per-record ``UTCOffSet`` hour count
#: (api/model.go XigniteDateTimeLayout); dates are ``yyyy/MM/dd``.
_XIG_DT_FMT = "yyyy/MM/dd HH:mm:ss"
_XIG_DAY_FMT = "yyyy/MM/dd"

_XIG_QUOTE_FIELDS = T.StructType(
    [
        T.StructField("DateTime", T.StringType()),
        T.StructField("Ask", T.DoubleType()),
        T.StructField("AskSize", T.DoubleType()),
        T.StructField("AskDateTime", T.StringType()),
        T.StructField("Bid", T.DoubleType()),
        T.StructField("BidSize", T.DoubleType()),
        T.StructField("BidDateTime", T.StringType()),
        T.StructField("LastMarketDate", T.StringType()),
        T.StructField("Last", T.DoubleType()),
        T.StructField("LastSize", T.DoubleType()),
        T.StructField("Open", T.DoubleType()),
        T.StructField("High", T.DoubleType()),
        T.StructField("Low", T.DoubleType()),
        T.StructField("Close", T.DoubleType()),
        T.StructField("PreviousClose", T.DoubleType()),
        T.StructField("Volume", T.LongType()),
        T.StructField("ExchangeOfficialClose", T.DoubleType()),
        T.StructField("PreviousExchangeOfficialClose", T.DoubleType()),
        T.StructField("ChangeFromPreviousClose", T.DoubleType()),
        T.StructField("PercentChangeFromPreviousClose", T.DoubleType()),
        T.StructField("UTCOffSet", T.IntegerType()),
    ]
)

XIGNITE_QUOTES_SCHEMA = T.StructType(
    [
        T.StructField("Delay", T.DoubleType()),
        T.StructField("Message", T.StringType()),
        T.StructField(
            "ArrayOfEquityQuote",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("Outcome", T.StringType()),
                        T.StructField("Message", T.StringType()),
                        T.StructField(
                            "Security",
                            T.StructType(
                                [T.StructField("Symbol", T.StringType())]
                            ),
                        ),
                        T.StructField("Quote", _XIG_QUOTE_FIELDS),
                    ]
                )
            ),
        ),
    ]
)

_XIG_BAR_FIELDS = T.StructType(
    [
        T.StructField("StartDateTime", T.StringType()),
        T.StructField("EndDateTime", T.StringType()),
        T.StructField("UTCOffSet", T.IntegerType()),
        T.StructField("Open", T.DoubleType()),
        T.StructField("High", T.DoubleType()),
        T.StructField("Low", T.DoubleType()),
        T.StructField("Close", T.DoubleType()),
        T.StructField("Volume", T.DoubleType()),  # float in GetBars
    ]
)

XIGNITE_BARS_SCHEMA = T.StructType(
    [
        T.StructField("Outcome", T.StringType()),
        T.StructField("Delay", T.DoubleType()),
        T.StructField("Message", T.StringType()),
        T.StructField(
            "Security", T.StructType([T.StructField("Symbol", T.StringType())])
        ),
        # GetIndexBars spells the security field IndexAndGroup
        T.StructField(
            "IndexAndGroup",
            T.StructType([T.StructField("Symbol", T.StringType())]),
        ),
        T.StructField("ArrayOfBar", T.ArrayType(_XIG_BAR_FIELDS)),
    ]
)

XIGNITE_QUOTES_RANGE_SCHEMA = T.StructType(
    [
        T.StructField("Outcome", T.StringType()),
        T.StructField("Message", T.StringType()),
        T.StructField(
            "Security", T.StructType([T.StructField("Symbol", T.StringType())])
        ),
        T.StructField(
            "IndexAndGroup",
            T.StructType([T.StructField("Symbol", T.StringType())]),
        ),
        T.StructField(
            "ArrayOfEndOfDayQuote",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("Date", T.StringType()),
                        T.StructField("Open", T.DoubleType()),
                        T.StructField("High", T.DoubleType()),
                        T.StructField("Low", T.DoubleType()),
                        T.StructField("Close", T.DoubleType()),
                        T.StructField(
                            "ExchangeOfficialClose", T.DoubleType()
                        ),
                        T.StructField("PreviousClose", T.DoubleType()),
                        T.StructField("Volume", T.LongType()),
                        T.StructField(
                            "PreviousExchangeOfficialClose", T.DoubleType()
                        ),
                        T.StructField(
                            "ChangeFromPreviousClose", T.DoubleType()
                        ),
                        T.StructField(
                            "PercentChangeFromPreviousClose", T.DoubleType()
                        ),
                    ]
                )
            ),
        ),
    ]
)


def _xig_ts(local_str, offset_hours):
    """Local exchange time string + UTCOffSet → UTC timestamp
    (quotes_writer.go:58 ``Add(-UTCOffSet hours)``).  Parse, shift by
    whole hours in integer seconds — exact, no double math."""
    local = F.to_timestamp(local_str, _XIG_DT_FMT)
    return F.timestamp_seconds(
        local.cast("long") - F.coalesce(offset_hours, F.lit(0)) * 3600
    )


def normalize_xignite_quotes(
    raw: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """GetQuotes response → realtime TICK rows (quotes_writer.go
    convertToCSM): keep Outcome=Success quotes with a non-empty
    LastMarketDate (listed symbols only), stamp each row with the
    LATEST of DateTime/AskDateTime/BidDateTime shifted to UTC."""
    eq = raw.select(
        F.explode(
            F.from_json(F.col(payload_col), XIGNITE_QUOTES_SCHEMA)[
                "ArrayOfEquityQuote"
            ]
        ).alias("eq")
    ).select("eq.*")
    q = F.col("Quote")
    # greatest() skips NULLs — same selection as getLatestTime, where
    # an absent datetime (zero time.Time) can never win
    latest = F.greatest(
        F.to_timestamp(q["DateTime"], _XIG_DT_FMT),
        F.to_timestamp(q["AskDateTime"], _XIG_DT_FMT),
        F.to_timestamp(q["BidDateTime"], _XIG_DT_FMT),
    )
    return (
        eq.filter(
            (F.col("Outcome") == "Success")
            & (F.col("Quote").isNotNull())
            & (F.length(F.coalesce(q["LastMarketDate"], F.lit(""))) > 0)
        )
        .select(
            F.col("Security")["Symbol"].alias("symbol"),
            F.timestamp_seconds(
                latest.cast("long")
                - F.coalesce(q["UTCOffSet"], F.lit(0)) * 3600
            ).alias("ts"),
            q["Ask"].alias("ask"),
            q["AskSize"].alias("ask_size"),
            q["Bid"].alias("bid"),
            q["BidSize"].alias("bid_size"),
            q["Last"].alias("last"),
            q["LastSize"].alias("last_size"),
            F.to_timestamp(q["DateTime"], _XIG_DT_FMT)
            .cast("long")
            .alias("quote_datetime_epoch"),
            q["Open"].alias("open"),
            q["High"].alias("high"),
            q["Low"].alias("low"),
            q["Close"].alias("close"),
            q["Volume"].alias("volume"),
            q["PreviousClose"].alias("previous_close"),
            q["ExchangeOfficialClose"].alias("exchange_official_close"),
            q["PreviousExchangeOfficialClose"].alias(
                "previous_exchange_official_close"
            ),
            q["ChangeFromPreviousClose"].alias("change_from_previous_close"),
            q["PercentChangeFromPreviousClose"].alias(
                "percent_change_from_previous_close"
            ),
        )
        .filter(F.col("ts").isNotNull() & F.col("symbol").isNotNull())
    )


def normalize_xignite_bars(
    raw: DataFrame, payload_col: str = "payload", is_index: bool = False
) -> DataFrame:
    """GetBars / GetIndexBars response → OHLCV rows (bar_writer.go
    convertToCSM): bar epoch is StartDateTime shifted to UTC; bars
    missing either boundary datetime are skipped, and zero-volume bars
    are skipped unless the symbol is an index (index volume is always
    0)."""
    parsed = raw.select(
        F.from_json(F.col(payload_col), XIGNITE_BARS_SCHEMA).alias("r")
    ).filter(F.col("r")["Outcome"] == "Success")
    bars = parsed.select(
        F.coalesce(
            F.col("r")["Security"]["Symbol"],
            F.col("r")["IndexAndGroup"]["Symbol"],
        ).alias("symbol"),
        F.explode(F.col("r")["ArrayOfBar"]).alias("b"),
    )
    b = F.col("b")
    out = bars.filter(
        (F.length(F.coalesce(b["StartDateTime"], F.lit(""))) > 0)
        & (F.length(F.coalesce(b["EndDateTime"], F.lit(""))) > 0)
    )
    if not is_index:
        out = out.filter(b["Volume"] != 0)
    return out.select(
        "symbol",
        _xig_ts(b["StartDateTime"], b["UTCOffSet"]).alias("ts"),
        b["Open"].alias("open"),
        b["High"].alias("high"),
        b["Low"].alias("low"),
        b["Close"].alias("close"),
        b["Volume"].alias("volume"),
    ).filter(F.col("ts").isNotNull() & F.col("symbol").isNotNull())


def normalize_xignite_quotes_range(
    raw: DataFrame, payload_col: str = "payload", is_index: bool = False
) -> DataFrame:
    """GetQuotesRange response → daily OHLCV rows
    (quotes_range_writer.go convertToCSMForQuotesRange): epoch is the
    quote Date at UTC midnight; empty dates skipped; zero-volume days
    skipped unless index."""
    parsed = raw.select(
        F.from_json(
            F.col(payload_col), XIGNITE_QUOTES_RANGE_SCHEMA
        ).alias("r")
    ).filter(F.col("r")["Outcome"] == "Success")
    days = parsed.select(
        F.coalesce(
            F.col("r")["Security"]["Symbol"],
            F.col("r")["IndexAndGroup"]["Symbol"],
        ).alias("symbol"),
        F.explode(F.col("r")["ArrayOfEndOfDayQuote"]).alias("d"),
    )
    d = F.col("d")
    out = days.filter(F.length(F.coalesce(d["Date"], F.lit(""))) > 0)
    if not is_index:
        out = out.filter(d["Volume"] != 0)
    return out.select(
        "symbol",
        F.to_timestamp(d["Date"], _XIG_DAY_FMT).alias("ts"),
        d["Open"].alias("open"),
        d["High"].alias("high"),
        d["Low"].alias("low"),
        d["Close"].alias("close"),
        d["ExchangeOfficialClose"].alias("exchange_official_close"),
        d["PreviousClose"].alias("previous_close"),
        d["Volume"].alias("volume"),
        d["PreviousExchangeOfficialClose"].alias(
            "previous_exchange_official_close"
        ),
        d["ChangeFromPreviousClose"].alias("change_from_previous_close"),
        d["PercentChangeFromPreviousClose"].alias(
            "percent_change_from_previous_close"
        ),
    ).filter(F.col("ts").isNotNull() & F.col("symbol").isNotNull())


def xignite_list_symbols(
    payload, exchange: str, not_quote=(), index: bool = False
):
    """ListSymbols / ListIndexSymbols response → identifier list
    (symbols/manager.go UpdateSymbols / UpdateIndexSymbols).

    Driver-side pure Python by design: the symbol universe is
    config-scale (thousands of rows refreshed daily), the same posture
    as the reference's in-process manager — no reason to spin a Spark
    job for it.  Returns ``None`` when Outcome isn't Success (the
    reference keeps the previous universe rather than wiping it).
    Rules mirrored: skip 5-plus-digit stock codes (equities only),
    skip the not_quote_stock_list, skip empty symbols; identifiers are
    ``{symbol}.{exchange}``.
    """
    doc = json.loads(payload) if isinstance(payload, str) else payload
    if doc.get("Outcome") != "Success":
        return None
    arr_key = "ArrayOfIndex" if index else "ArrayOfSecurityDescription"
    blocked = set(not_quote)
    out = []
    for entry in doc.get(arr_key) or []:
        sym = (entry or {}).get("Symbol") or ""
        if not sym or sym in blocked:
            continue
        if not index and len(sym) >= 5:
            continue  # manager.go:91 ignores 5-digit stock codes
        out.append(f"{sym}.{exchange}")
    return out


# ---------------------------------------------------------------------
# Feeder integration
# ---------------------------------------------------------------------

_NORMALIZERS = {
    "binance_klines": normalize_binance_klines,
    "polygon_aggs": normalize_polygon_aggs,
    "polygon_trades": normalize_polygon_trades,
    "polygon_quotes": normalize_polygon_quotes,
    "iex_chart": normalize_iex_chart,
    "gdax_candles": normalize_gdax_candles,
    "bitmex_bucketed": normalize_bitmex_bucketed,
    "alpaca_trades": normalize_alpaca_trades,
    "alpaca_quotes": normalize_alpaca_quotes,
    "alpaca_aggregates": normalize_alpaca_aggregates,
    "xignite_quotes": normalize_xignite_quotes,
    "xignite_bars": normalize_xignite_bars,
    "xignite_quotes_range": normalize_xignite_quotes_range,
}

#: connectors whose payloads carry no symbol: the provider returns
#: (symbol, payload) pairs (their reference feeders track the symbol
#: in the request loop)
_SYMBOL_PAIRED = {"binance_klines", "gdax_candles"}


def connector_fetch(spark: SparkSession, kind: str, provider):
    """Wrap a payload provider into a :class:`ConfiguredFeeder` fetch.

    ``provider(symbols, timeframe, since)`` performs the exchange I/O
    (live HTTP in production, canned fixtures in tests) and returns
    payloads: for ``binance_klines`` and ``gdax_candles`` a list of
    ``(symbol, payload)`` pairs (those bodies carry no symbol — their
    feeders track it in the request loop); for the others a list of
    payload strings.
    Returns ``fetch(symbols, timeframe, since) -> DataFrame`` in the
    feeder's normalized (symbol, ts, ...) shape, or None when the
    provider produced nothing this tick.
    """
    try:
        normalize = _NORMALIZERS[kind]
    except KeyError:
        raise ValueError(
            f"unknown connector {kind!r} — supported: {sorted(_NORMALIZERS)}"
        ) from None

    def fetch(symbols, timeframe, since):
        payloads = provider(symbols, timeframe, since)
        if not payloads:
            return None
        if kind in _SYMBOL_PAIRED:
            rows = [
                (str(sym), p if isinstance(p, str) else json.dumps(p))
                for sym, p in payloads
            ]
            raw = spark.createDataFrame(rows, ["symbol", "payload"])
        else:
            rows = [
                (p if isinstance(p, str) else json.dumps(p),) for p in payloads
            ]
            raw = spark.createDataFrame(rows, ["payload"])
        return normalize(raw)

    return fetch
