"""As-of (previous-tick) join.

Reference: marketstore's Epoch index serves "value as of time T" reads
(executor/scanner.go backward scans; LimitRecordCount from end with an
end predicate is exactly a point-in-time lookup).  Generalized here to a
relational as-of join: for each left row, the latest right row with
right.ts <= left.ts for the same key.

Spark design: union-and-window, not a range join.  Tag both sides, sort
within key by (ts, side), carry the last right value forward with
last(..., ignorenulls) — one shuffle on the key, O(n) per partition,
no O(n×m) cross/range join and no per-row subquery.  This is the plan
that survives 100 TB; a broadcast-range join would not.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from marketstore_spark.functions.timeutil import epoch_us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    strict: bool = False,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row: latest right values with right_ts <= left_ts
    (or < when ``strict``), matched on ``on`` keys.  Output = all left
    columns + ``value_cols`` (null when no prior right row).
    ``tolerance_seconds`` additionally nulls matches older than the
    tolerance (pandas ``merge_asof(tolerance=...)`` semantics) — the
    match's own timestamp rides the same window, so the bound costs no
    extra shuffle.
    """
    keys = list(on)
    lcols = [c for c in left.columns]
    vals = list(value_cols)

    lhs = left.select(
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in vals],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
    )
    rhs = right.select(
        *[F.col(c) for c in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys],
        *[F.col(c) for c in vals],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
    )
    u = lhs.unionByName(rhs)

    # At equal ts: right rows (side 0) sort before left rows (side 1) so
    # a right row at exactly t is visible to a left row at t; flip the
    # order for strict (<) semantics.
    side_order = F.col("__side").desc() if strict else F.col("__side").asc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn(
        "__rt", F.when(F.col("__side") == 0, F.col("__t"))
    ).withColumn("__rt", F.last(F.col("__rt"), ignorenulls=True).over(w))
    for c in vals:
        filled = filled.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    out = filled.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        stale = (
            epoch_us(F.col("__t")) - epoch_us(F.col("__rt"))
            > tolerance_seconds * 1_000_000
        )
        for c in vals:
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
    return out.select(*lcols, *vals)
