"""QueryRequest → DataFrame planner.

Reference: frontend/query.go QueryRequest — destination key(s), epoch
start/end (+nanos), limit_record_count + limit_from_start, columns, and
an experimental ``Functions`` chain resolved through the UDA registry
(sqlparser/registry.go NewDefaultAggRunner, Run).

Spark design: the request compiles to one declarative DataFrame plan —
Catalyst then pushes the time predicates and the projection into the
Parquet scan.  The function chain is a fold over registered
DataFrame→DataFrame operators, mirroring AggRunner.Run's
chain-the-output-into-the-next-input loop (registry.go:52-64).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marketstore_spark.operators import candler, slice as slice_ops, uda


@dataclass
class QueryParams:
    """Mirror of frontend/query.go QueryRequest (msgpack fields)."""

    symbols: Sequence[str] | None = None  # Destination symbols (None = all)
    epoch_start: object | None = None
    epoch_end: object | None = None
    limit_record_count: int | None = None
    limit_from_start: bool = False
    columns: Sequence[str] | None = None
    functions: Sequence[str] = field(default_factory=list)

    symbol_col: str = "user_id"
    ts_col: str = "ts"
    value_col: str = "value"
    tiebreak: Sequence[str] = ("event_id",)
    # corporate-actions table for the adjust() UDA — the reference's
    # adjust loads this from the catalog's CA bucket (uda/adjust/
    # caloader.go); Client.query wires it in when the bucket exists
    ca_df: DataFrame | None = None


Operator = Callable[[DataFrame, QueryParams, list[str]], DataFrame]


def _scalar(agg: str) -> Operator:
    def op(df: DataFrame, p: QueryParams, args: list[str]) -> DataFrame:
        col = args[0] if args else p.value_col
        return uda.scalar_agg(df, agg, col, key_cols=[p.symbol_col])

    return op


def _gap(df: DataFrame, p: QueryParams, args: list[str]) -> DataFrame:
    if args:
        return uda.gap_threshold(
            df, float(args[0]), key_cols=[p.symbol_col], ts_col=p.ts_col,
            order_tiebreak=p.tiebreak,
        )
    return uda.gap_zscore(
        df, key_cols=[p.symbol_col], ts_col=p.ts_col, order_tiebreak=p.tiebreak
    )


def _adjust(df: DataFrame, p: QueryParams, args: list[str]) -> DataFrame:
    """adjust('split,dividend'): backward price adjustment against the
    catalog's CA table (uda/adjust; GetRateChanges' includeSplits /
    includeDividends map to the kind list)."""
    if p.ca_df is None:
        raise ValueError(
            "adjust() needs a corporate-actions table: populate the "
            "CA/EVENT/ACTIONS bucket (operators/ca.ingest_announcements) "
            "or set QueryParams.ca_df"
        )
    from marketstore_spark.operators.ca import adjust_with_actions

    # the arg parser splits on commas, so accept both adjust('split') /
    # adjust('split,dividend') spellings
    kinds = [k for a in args for k in a.split(",")] or ["split", "dividend"]
    return adjust_with_actions(
        df,
        p.ca_df,
        symbol_col=p.symbol_col,
        ts_col=p.ts_col,
        price_col=p.value_col,
        include_splits="split" in kinds,
        include_dividends="dividend" in kinds,
    )


def _tickcandler(df: DataFrame, p: QueryParams, args: list[str]) -> DataFrame:
    tf = args[0] if args else "5Min"
    sums = [a.split("::", 1)[1] for a in args[1:] if a.lower().startswith("sum::")]
    avgs = [a.split("::", 1)[1] for a in args[1:] if a.lower().startswith("avg::")]
    return candler.tick_candles(
        df, tf, key_cols=[p.symbol_col], ts_col=p.ts_col, price_col=p.value_col,
        sum_cols=sums, avg_cols=avgs, tiebreak=p.tiebreak,
    )


def _candlecandler(df: DataFrame, p: QueryParams, args: list[str]) -> DataFrame:
    tf = args[0] if args else "5Min"
    sums = [a.split("::", 1)[1] for a in args[1:] if a.lower().startswith("sum::")]
    avgs = [a.split("::", 1)[1] for a in args[1:] if a.lower().startswith("avg::")]
    return candler.candle_candles(
        df, tf, key_cols=[p.symbol_col], ts_col="epoch", sum_cols=sums, avg_cols=avgs
    )


def _tb1(p: QueryParams) -> str:
    return p.tiebreak[0] if p.tiebreak else p.ts_col


def _ema(df: DataFrame, p: QueryParams, args: list[str]) -> DataFrame:
    from marketstore_spark.operators.ewm import ema

    return ema(
        df, span=int(args[0]) if args else 20, key_cols=[p.symbol_col],
        ts_col=p.ts_col, value_col=p.value_col, tiebreak=p.tiebreak,
    )


def _macd(df: DataFrame, p: QueryParams, args: list[str]) -> DataFrame:
    from marketstore_spark.operators.ewm import macd

    defaults = (12, 26, 9)
    vals = [int(a) for a in args[:3]] + list(defaults[len(args):])
    fast, slow, sig = vals
    return macd(
        df, fast=fast, slow=slow, signal=sig, key_cols=[p.symbol_col],
        ts_col=p.ts_col, value_col=p.value_col, tiebreak=p.tiebreak,
    )


def _obv(df: DataFrame, p: QueryParams, args: list[str]) -> DataFrame:
    from marketstore_spark.operators.quant import obv

    return obv(
        df, symbol_col=p.symbol_col, ts_col=p.ts_col, value_col=p.value_col,
        volume_col=args[0] if args else "volume", tiebreak_col=_tb1(p),
    )


def _stochastic(df: DataFrame, p: QueryParams, args: list[str]) -> DataFrame:
    from marketstore_spark.operators.quant import stochastic_k

    return stochastic_k(
        df, n=int(args[0]) if args else 14,
        d_periods=int(args[1]) if len(args) > 1 else 3,
        symbol_col=p.symbol_col, ts_col=p.ts_col, value_col=p.value_col,
        tiebreak_col=_tb1(p),
    )


def _twap(df: DataFrame, p: QueryParams, args: list[str]) -> DataFrame:
    from marketstore_spark.operators.candler import timeframe_to_duration
    from marketstore_spark.operators.quant import twap

    tf = timeframe_to_duration(args[0]) if args else "1 day"
    return twap(
        df, tf, symbol_col=p.symbol_col, ts_col=p.ts_col,
        value_col=p.value_col, tiebreak_col=_tb1(p),
    )


REGISTRY: dict[str, Operator] = {
    "min": _scalar("min"),
    "max": _scalar("max"),
    "avg": _scalar("avg"),
    "count": _scalar("count"),
    "gap": _gap,
    "adjust": _adjust,
    "tickcandler": _tickcandler,
    "candlecandler": _candlecandler,
    # round-5 indicator family: the same operators the driver keys use,
    # callable through the Params.functions / MarketSQL UDA chain
    # (sqlparser/registry.go registers UDAs once for both paths too)
    "ema": _ema,
    "macd": _macd,
    "obv": _obv,
    "stochastic": _stochastic,
    "twap": _twap,
}


def parse_function_call(call: str) -> tuple[str, list[str]]:
    """Parse ``name(arg1,'lit',Sum::Col)`` → (name, [args...]).
    Reference: sqlparser/registry.go ParseFunctionCall."""
    call = call.strip()
    lp, rp = call.index("("), call.rindex(")")
    name = call[:lp].strip().lower()
    args = [a.strip().strip("'") for a in call[lp + 1 : rp].split(",") if a.strip()]
    return name, args


def run_query(df: DataFrame, params: QueryParams) -> DataFrame:
    """Compile a QueryRequest to a single DataFrame plan."""
    if params.symbols:
        df = df.filter(F.col(params.symbol_col).isin(list(params.symbols)))
    df = slice_ops.time_range(df, params.ts_col, params.epoch_start, params.epoch_end)
    if params.limit_record_count is not None:
        df = slice_ops.limit_records(
            df,
            params.limit_record_count,
            key_cols=[params.symbol_col],
            order_cols=[params.ts_col, *params.tiebreak],
            from_start=params.limit_from_start,
        )
    df = slice_ops.project_columns(df, params.columns)
    for call in params.functions:
        name, args = parse_function_call(call)
        if name not in REGISTRY:
            raise KeyError(f"no function in the UDA registry named {name!r}")
        df = REGISTRY[name](df, params, args)
    return df
