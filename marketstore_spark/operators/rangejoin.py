"""Range (interval) join — point-in-interval matching with NO equi key.

marketstore's epoch-indexed reads make "which window does this tick
fall in" cheap locally (executor/reader.go walks the index); on Spark a
naive `ts BETWEEN start AND end` join with no equality conjunct
becomes BroadcastNestedLoopJoin (or worse, a cartesian) — O(|L|·|R|)
at scale.

Scale design — time-bucket blocking: quantize time into fixed buckets;
each interval explodes to the buckets it overlaps, each point maps to
exactly one bucket, and the join becomes an equi-join on the bucket id
followed by the exact containment filter.  Cost is
O(|L| + |R|·avg_buckets_per_interval + candidate pairs): candidates
are only point/interval pairs sharing a bucket — the classic
spatial-grid trick in one dimension.  Each point lands in ONE bucket,
so a (point, interval) pair meets at most once: no dedup pass.
``bucket_seconds`` tunes the explode factor vs candidate precision;
set it near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from marketstore_spark.functions.timeutil import epoch_us


def _bucket_of(ts: Column, bucket_seconds: int) -> Column:
    # Exact floor division on the long micros: (us - pmod(us, w)) is
    # divisible by w, so the double division is exact.  A plain
    # cast('long') would truncate toward zero and mis-bucket pre-1970
    # timestamps (floor(-0.5) = -1, trunc(-0.5) = 0).
    us = epoch_us(ts)
    w = F.lit(bucket_seconds * 1_000_000)
    return ((us - F.pmod(us, w)) / w).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    start ≤ ts < end.  Output columns: all of ``points`` plus all of
    ``intervals``.  ``how='inner'`` only (the blocked plan loses
    unmatched rows by construction; outer flavors would need an
    anti-join complement)."""
    if how != "inner":
        raise ValueError("interval_join supports how='inner' only")
    p = points.withColumn("__b", _bucket_of(F.col(ts_col), bucket_seconds))
    i = intervals.withColumn(
        "__bs",
        F.sequence(
            _bucket_of(F.col(start_col), bucket_seconds),
            # end is exclusive, but a point in end's bucket can still
            # precede it — include that bucket
            _bucket_of(F.col(end_col), bucket_seconds),
        ),
    ).withColumn("__b", F.explode("__bs")).drop("__bs")
    return (
        p.join(i, "__b")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("__b")
    )
