"""Canonical record schemas — models/bar.go, models/trade.go,
models/quote.go in the reference.

These are the AttributeGroup record layouts marketstore stores per
bucket (OHLCV bars, trades with price/size/exchange/cond, quotes with
bid/ask).  Converters build them from a generic tick table so the rest
of the engine (candlers, rollups, adjust) can assume the canonical
column names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# models/bar.go: Epoch, Open, High, Low, Close, Volume
BAR_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("epoch", TimestampType()),
        StructField("open", DoubleType()),
        StructField("high", DoubleType()),
        StructField("low", DoubleType()),
        StructField("close", DoubleType()),
        StructField("volume", LongType()),
    ]
)

# models/trade.go: Epoch, Nanos, Price, Size, Exchange, TapeID, Cond1..4
TRADE_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("epoch", TimestampType()),
        StructField("price", DoubleType()),
        StructField("size", LongType()),
        StructField("exchange", StringType()),
        StructField("cond", IntegerType()),
    ]
)

# models/quote.go: Epoch, Nanos, BidPrice, AskPrice, BidSize, AskSize, ...
QUOTE_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("epoch", TimestampType()),
        StructField("bid_price", DoubleType()),
        StructField("ask_price", DoubleType()),
        StructField("bid_size", LongType()),
        StructField("ask_size", LongType()),
    ]
)


# Variable-length attribute payload of the events table — the analogue
# of the reference's variable-record attribute columns
# (executor/readvariable.go): typed fields ride along with each fixed
# record.
PROPS_SCHEMA = "k BIGINT"


def typed_attrs(
    events: DataFrame,
    schema: str = PROPS_SCHEMA,
    json_col: str = "props",
    out_col: str = "attrs",
) -> DataFrame:
    """Parse the variable-length attribute JSON ONCE into a typed
    struct column (executor/readvariable.go's typed read path).  Every
    downstream expression then reads struct fields — no re-parse per
    referencing expression, which is what per-column
    ``get_json_object`` calls would cost."""
    return events.withColumn(out_col, F.from_json(F.col(json_col), schema))


def trades_from_events(events: DataFrame) -> DataFrame:
    """Map the generic events tick table onto the Trade model."""
    return typed_attrs(events).select(
        F.concat(F.lit("SYM"), F.col("user_id")).alias("symbol"),
        F.col("ts").alias("epoch"),
        F.col("value").alias("price"),
        F.col("attrs.k").alias("size"),
        F.col("event_type").alias("exchange"),
        (F.col("event_id") % 4).cast("int").alias("cond"),
    )


def bars_from_trades(trades: DataFrame, timeframe: str = "1Min") -> DataFrame:
    """Trades → canonical OHLCV bars (the 1Min base timeframe the
    reference's candlers and ondiskagg consume)."""
    from marketstore_spark.operators.candler import tick_candles

    c = tick_candles(
        trades,
        timeframe,
        key_cols=["symbol"],
        ts_col="epoch",
        price_col="price",
        sum_cols=["size"],
        tiebreak=["cond"],
    )
    return c.select(
        "symbol",
        "epoch",
        "open",
        "high",
        "low",
        "close",
        F.col("size_sum").cast("long").alias("volume"),
    )
