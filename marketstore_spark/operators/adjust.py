"""Corporate-action price adjustment (splits / dividends).

Reference: uda/adjust/adjust.go + caloader.go — for each symbol, load
rate-change events (split ratios, dividend adjustments) and multiply
every price strictly before a corporate action by the product of all
later ratios; results rounded to 4 decimals (adjust.go
roundToDecimals=4).

Spark design: no per-symbol loop.  Union the price stream with the CA
stream, then a single descending window per symbol computes the running
product of ratios via exp(sum(ln ratio)) — an O(n) windowed scan, one
shuffle on symbol.  At 100 TB the CA side is tiny; it rides along in the
union and the window state is a single float per partition stream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


MAX_ACTIONS_PER_KEY = 512  # power-table length for the exact path


def ratio_power_table(ratio: float, n: int = MAX_ACTIONS_PER_KEY) -> list[float]:
    """[ratio^0, ratio^1, ..., ratio^(n-1)] built by repeated IEEE
    double multiplication.  Emitted as LITERALS into both the Spark
    plan and any oracle SQL, so every engine reads identical constants
    — the basis of the bit-reproducible exact adjustment path."""
    out = [1.0]
    for _ in range(n - 1):
        out.append(out[-1] * ratio)
    return out


def adjust(
    prices: DataFrame,
    actions: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    price_col: str = "value",
    ratio_col: str = "ratio",
    round_to: int = 4,
    exact_ratio_limit: int = 8,
    ratios: Sequence[float] | None = None,
) -> DataFrame:
    """Return ``prices`` with ``adjusted`` = price × ∏(ratio of CAs with
    ca_ts strictly > row ts), per key.  Matches uda/adjust semantics
    (backward adjustment, 4-decimal rounding).

    Determinism: when the CA stream holds at most ``exact_ratio_limit``
    distinct ratios (real corporate actions do — split legs and
    dividend rates repeat), the factor is computed EXACTLY as
    ∏ ratio_r^count_r: integer counts from order-insensitive window
    sums, powers from literal tables (:func:`ratio_power_table`).  No
    exp/ln — whose libm implementations differ across engines by an
    ulp and flip 4-decimal rounding at boundaries — anywhere on the
    path.  Falls back to the running exp(sum(ln)) product for
    pathological ratio sets; the distinct-ratio probe is a collect on
    the CA table, which is dims-scale by construction — pass ``ratios``
    when the caller already knows the set to skip the probe job.
    """
    keys = list(key_cols)
    p = prices.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.col(price_col).alias("__price"),
        F.lit(1.0).alias("__ratio"),
        F.lit(0).alias("__is_ca"),
    )
    a = actions.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(None).cast("double").alias("__price"),
        F.col(ratio_col).cast("double").alias("__ratio"),
        F.lit(1).alias("__is_ca"),
    )
    u = p.unionByName(a)
    # Descending time; at equal ts the price row sorts first so a CA at
    # exactly t does not adjust the price at t (strict inequality).
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").desc(), F.col("__is_ca").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    if ratios is None:
        ratios = [
            r[0]
            for r in actions.select(ratio_col).distinct().collect()
            if r[0] is not None
        ]
    ratios = sorted(ratios)
    if 0 < len(ratios) <= exact_ratio_limit and all(r > 0 for r in ratios):
        # exact path: factor = ∏ ratio^count(later CAs with that ratio)
        factor = F.lit(1.0)
        for r in ratios:
            cnt = F.sum(
                F.when((F.col("__is_ca") == 1) & (F.col("__ratio") == r), 1).otherwise(0)
            ).over(w)
            table = F.array(*[F.lit(v) for v in ratio_power_table(r)])
            # element_at is 1-based and yields NULL past the table end,
            # so an overflow (> MAX_ACTIONS_PER_KEY CAs on one key)
            # surfaces as NULL adjusted values, never a silent clamp
            factor = factor * F.element_at(table, (cnt + 1).cast("int"))
    else:
        factor = F.exp(F.sum(F.log("__ratio")).over(w))
    out = (
        u.withColumn("__factor", factor)
        .filter(F.col("__is_ca") == 0)
        .select(
            *keys,
            F.col("__ts").alias(ts_col),
            F.col("__price").alias(price_col),
            F.round(F.col("__price") * F.col("__factor"), round_to).alias("adjusted"),
        )
    )
    return out
