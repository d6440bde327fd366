"""Corporate-action price adjustment (splits / dividends).

Reference: uda/adjust/adjust.go + caloader.go — for each symbol, load
rate-change events (split ratios, dividend adjustments) and multiply
every price strictly before a corporate action by the product of all
later ratios; results rounded to 4 decimals (adjust.go
roundToDecimals=4).

Spark design: corporate actions are dims-scale (the reference loads
them as a small in-memory table per symbol — caloader.go), so the
price stream must never shuffle for them.  The CA table is aggregated
per symbol into one array of action timestamps per distinct ratio,
broadcast-joined onto the prices, and the adjustment factor is a pure
projection: ``count = size(filter(ca_arr, t -> t > ts))`` per ratio,
then a lookup into a literal power table.  Zero exchanges on the fact
side — at 100 TB the plan is scan → broadcast-hash-join → project.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
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
    ∏ ratio_r^count_r: integer counts from the broadcast per-key CA
    arrays, powers from literal tables (:func:`ratio_power_table`).  No
    exp/ln — whose libm implementations differ across engines by an
    ulp and flip 4-decimal rounding at boundaries — anywhere on the
    path.  Falls back to a per-row log-sum over the broadcast (ts,
    ratio) array for pathological ratio sets; the distinct-ratio probe
    is a collect on the CA table, which is dims-scale by construction —
    pass ``ratios`` when the caller already knows the set to skip the
    probe job.

    Scale: the price side is never shuffled or sorted — the only
    exchanges are the CA-side aggregate (dims-scale) and its broadcast.
    ``element_at`` past the power-table end (> MAX_ACTIONS_PER_KEY CAs
    on one key) surfaces as NULL adjusted values, never a silent clamp.
    """
    keys = list(key_cols)
    a = actions.select(
        *keys,
        F.col(ts_col).alias("__ca_ts"),
        F.col(ratio_col).cast("double").alias("__ca_ratio"),
    )

    if ratios is None:
        ratios = [
            r[0]
            for r in actions.select(ratio_col).distinct().collect()
            if r[0] is not None
        ]
    ratios = sorted(ratios)
    exact = 0 < len(ratios) <= exact_ratio_limit and all(r > 0 for r in ratios)

    if exact:
        # one timestamp array per distinct ratio, per key
        aggs = [
            F.collect_list(
                F.when(F.col("__ca_ratio") == r, F.col("__ca_ts"))
            ).alias(f"__ca_{i}")
            for i, r in enumerate(ratios)
        ]
    else:
        aggs = [
            F.collect_list(
                F.when(
                    F.col("__ca_ratio").isNotNull(),
                    F.struct(
                        F.col("__ca_ts").alias("t"), F.col("__ca_ratio").alias("r")
                    ),
                )
            ).alias("__ca_all")
        ]
    ca_per_key = a.groupBy(*keys).agg(*aggs)

    joined = prices.join(F.broadcast(ca_per_key), on=keys, how="left")
    ts = F.col(ts_col)

    if exact:
        # factor = ∏ ratio^count(later CAs with that ratio) — a pure
        # projection over the broadcast arrays (strictly-later: a CA at
        # exactly t does not adjust the price at t).  The whole factor
        # is ONE parsed SQL expression: the element-wise F.lit /
        # Column-algebra form pays hundreds of py4j round trips
        # (~0.5s of driver time per query build); the string parses
        # JVM-side in ~1ms.  The 'D' suffix makes each power-table
        # element a DOUBLE literal of the shortest-roundtrip repr —
        # bitwise the Python values — and the left-associative `*`
        # chain evaluates the identical float64 steps as the Column
        # form did.  try_element_at (not element_at): past-the-end
        # lookups (> MAX_ACTIONS_PER_KEY CAs on one key) yield NULL
        # under ANSI and non-ANSI alike, never a silent clamp or an
        # ANSI-mode-dependent error.
        def _lit(v: float) -> str:
            # repr(inf) is 'inf', which is not a SQL literal — a ratio
            # above ~4.03 overflows the tail of its 512-entry power
            # table, and 'infD' would fail to PARSE (killing the whole
            # query) where the overflowed lookup itself is a perfectly
            # valid Infinity result.
            if v == float("inf"):
                return "CAST('Infinity' AS DOUBLE)"
            return repr(v) + "D"

        terms = []
        for i, r in enumerate(ratios):
            tbl = "array(" + ",".join(_lit(v) for v in ratio_power_table(r)) + ")"
            cnt = (
                f"(CASE WHEN `__ca_{i}` IS NULL THEN 0 "
                f"ELSE size(filter(`__ca_{i}`, t -> t > `{ts_col}`)) END)"
            )
            terms.append(f"try_element_at({tbl}, cast(({cnt} + 1) AS int))")
        factor = F.expr("1.0D" + "".join(" * " + t for t in terms))
    else:
        # log-sum accumulated in descending ts order, mirroring the
        # order a descending window scan would use (non-parity path).
        # Non-positive ratios are excluded from the fold — log(r<=0) is
        # NULL and one NULL would poison the whole accumulator, whereas
        # the window-SUM formulation this replaced skipped them.
        arr = F.col("__ca_all")
        later = F.reverse(
            F.array_sort(F.filter(arr, lambda x: (x["t"] > ts) & (x["r"] > 0)))
        )
        factor = F.when(arr.isNull(), F.lit(1.0)).otherwise(
            F.exp(F.aggregate(later, F.lit(0.0), lambda acc, x: acc + F.log(x["r"])))
        )

    return joined.select(
        *keys,
        F.col(ts_col),
        F.col(price_col),
        F.round(F.col(price_col) * factor, round_to).alias("adjusted"),
    )
