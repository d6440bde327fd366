"""Corporate-actions surface: CA table, announcement-file ingest, and
rate-change selection feeding the price adjuster.

Reference: uda/adjust/caloader.go — corporate actions live in their own
bucket per symbol; ``RateChangeEvents(includeSplits, includeDividends)``
(caloader.go:236) turns effective announcements into (epoch, rate, type)
rate changes keyed on the EXPIRATION date, which ``adjust.go`` then
applies backward to prices.  The announcements themselves arrive as ICE
reorg/SIRS text files (contrib/ice/reorg/announcement.go — notification
type, expiration/effective/record dates, rate; contrib/ice/sirs/parser.go
scans them line-by-line).

Spark design: the CA table is an ordinary (tiny) DataFrame
``(symbol, ex_ts, ratio, type)``; ingest parses announcement lines with
a distributed text read and appends to a catalog bucket; the adjuster
aggregates it per symbol into broadcast arrays and applies the factor
as a pure projection over the price stream (operators/adjust.py) — CA
data is dims-scale, so at 100 TB the fact side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: split | reverse_split | dividend — the three notification types
#: RateChangeEvents selects (enum.StockSplit / ReverseStockSplit /
#: StockDividend in the reference).
CA_TYPES = ("split", "reverse_split", "dividend")

CA_SCHEMA = "symbol string, ex_ts timestamp, ratio double, type string"

#: Canonical catalog bucket for corporate actions (the reference keeps
#: CA data in its own per-symbol buckets; one combined bucket here).
CA_BUCKET = "CA/EVENT/ACTIONS"


def synthetic_corporate_actions(events: DataFrame) -> DataFrame:
    """Deterministic CA table derived from the test tick stream (the
    fixed testdata ships no CA file): every 97th purchase is a 1:2
    split (ratio 0.5), every 89th a 2% stock dividend (ratio 0.98).
    Column semantics match caloader.go's RateChange: the ratio applies
    to all prices strictly before ``ex_ts``."""
    # single scan: an event divisible by both 97 and 89 yields BOTH a
    # split and a dividend row (the explode over a conditional struct
    # array is the one-pass equivalent of the two-filter union)
    legs = F.array_compact(
        F.array(
            F.when(
                F.col("event_id") % 97 == 0,
                F.struct(F.lit(0.5).alias("ratio"), F.lit("split").alias("type")),
            ),
            F.when(
                F.col("event_id") % 89 == 0,
                F.struct(F.lit(0.98).alias("ratio"), F.lit("dividend").alias("type")),
            ),
        )
    )
    return (
        events.filter(
            (F.col("event_type") == "purchase")
            & ((F.col("event_id") % 97 == 0) | (F.col("event_id") % 89 == 0))
        )
        .select(
            F.col("user_id").cast("string").alias("symbol"),
            F.col("ts").alias("ex_ts"),
            F.explode(legs).alias("leg"),
        )
        .select("symbol", "ex_ts", F.col("leg.ratio").alias("ratio"), F.col("leg.type").alias("type"))
    )


def parse_announcements(spark: SparkSession, path: str) -> DataFrame:
    """Parse a corporate-action announcement file into the CA schema.

    Line format (a readable stand-in for the ICE reorg fixed-width
    records of contrib/ice/reorg/announcement.go, keeping its essential
    fields): ``TYPE|SYMBOL|EXPIRATION(yyyy-mm-dd[ HH:MM:SS])|RATE``.
    ``H...`` header lines and ``#`` comments are skipped, mirroring the
    SIRS scanner's record-type dispatch (contrib/ice/sirs/parser.go).
    The read is a distributed text scan — a day's announcement batch is
    small, but a decade of history across exchanges need not be.
    """
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), r"\|")
    return (
        lines.filter(~F.col("value").startswith("H"))
        .filter(~F.col("value").startswith("#"))
        .filter(F.trim(F.col("value")) != "")
        .select(
            F.lower(F.trim(parts.getItem(0))).alias("type"),
            F.trim(parts.getItem(1)).alias("symbol"),
            F.to_timestamp(F.trim(parts.getItem(2))).alias("ex_ts"),
            F.trim(parts.getItem(3)).cast("double").alias("ratio"),
        )
        .filter(F.col("type").isin(*CA_TYPES))
        .select("symbol", "ex_ts", "ratio", "type")
    )


def ingest_announcements(catalog, path: str, key: str = CA_BUCKET) -> int:
    """Append parsed announcements to the catalog's CA bucket (the
    analogue of contrib/ice's reorg import writing per-symbol CA
    buckets; one combined bucket here — symbol is a column, and the
    bucket is dims-scale).  Returns rows ingested."""
    ca = parse_announcements(catalog.spark, path)
    n = ca.count()
    if n:
        catalog.write(key, ca)
    return n


def rate_changes(
    ca: DataFrame, include_splits: bool = True, include_dividends: bool = True
) -> DataFrame:
    """caloader.go:236 RateChangeEvents: select the rate-change types
    the adjuster should apply."""
    types = []
    if include_splits:
        types += ["split", "reverse_split"]
    if include_dividends:
        types += ["dividend"]
    return ca.filter(F.col("type").isin(*types))


def adjust_with_actions(
    prices: DataFrame,
    ca: DataFrame,
    symbol_col: str = "user_id",
    ts_col: str = "ts",
    price_col: str = "value",
    include_splits: bool = True,
    include_dividends: bool = True,
    ratios: list[float] | None = None,
) -> DataFrame:
    """Backward-adjust ``prices`` against a first-class CA table
    (uda/adjust applied to caloader's rate changes)."""
    from marketstore_spark.operators.adjust import adjust

    rc = rate_changes(ca, include_splits, include_dividends).select(
        # symbol is a string in the CA table; follow the price stream's
        # key dtype so the union in adjust() lines up
        F.col("symbol").cast(dict(prices.dtypes)[symbol_col]).alias(symbol_col),
        F.col("ex_ts").alias(ts_col),
        "ratio",
    )
    return adjust(
        prices, rc, key_cols=(symbol_col,), ts_col=ts_col, price_col=price_col,
        ratios=ratios,
    )
