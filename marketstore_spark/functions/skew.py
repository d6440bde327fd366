"""Skew-aware aggregation helpers.

Symbol-keyed partitioning (SURVEY §6) is only as good as the symbol
distribution: one SPY-like symbol can hold a large fraction of all
ticks, so a plain ``groupBy(symbol)`` funnels it into one task.  AQE's
skew-join splitting covers joins but not aggregations, so hot
aggregations use the classic two-phase salt: aggregate on
(key, salt) first — spreading the hot key over ``salts`` tasks — then
re-aggregate the partial results on the key alone.  The second pass
touches ``salts`` rows per key, not the raw data.

Only aggregations with a distributive merge (sum/count/min/max and
anything built from them, e.g. avg = sum/count, OHLC candles) can be
salted this way; the helpers take explicit partial/final expression
pairs so the algebra stays visible at the call site.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salts: int = 16, col_name: str = "__salt") -> DataFrame:
    """Deterministic row salt in [0, salts): a hash of the whole row is
    stable across retries (rand() is not, which breaks speculative
    execution and recomputed partitions)."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salts))
    )


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    salts: int = 16,
) -> DataFrame:
    """Two-phase skew-resistant aggregation.

    ``partial_aggs``: name -> agg expression over the raw rows
    (phase 1, grouped by key+salt).
    ``final_aggs``: name -> agg expression over the phase-1 columns
    (phase 2, grouped by key).

    Example — skew-proof per-symbol avg::

        salted_agg(df, ["symbol"],
                   {"s": F.sum("value"), "n": F.count(F.lit(1))},
                   {"avg_value": F.sum("s") / F.sum("n")})
    """
    keys = list(key_cols)
    salted = with_salt(df, salts)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(n) for n, c in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(*[c.alias(n) for n, c in final_aggs.items()])
