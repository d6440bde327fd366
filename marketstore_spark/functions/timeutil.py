"""Timestamp-type-tolerant time helpers.

Parquet timestamps arrive as TIMESTAMP (instant / LTZ) or
TIMESTAMP_NTZ depending on how the file was written
(``isAdjustedToUTC``) and on ``spark.sql.parquet.inferTimestampNTZ``
— Spark 4 infers NTZ for naive-written files where Spark 3.3 read
them as instants.  Functions like ``unix_micros`` accept only the
instant type, so every epoch computation in the engine routes through
:func:`epoch_us`, which normalizes first.  Sessions created by this
package pin ``spark.sql.session.timeZone=UTC`` (session.py), making
the NTZ→instant cast a pure reinterpretation: the resulting epoch
equals DuckDB's ``epoch_us`` on the same naive value, which is what
the oracle parity harness compares against.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_instant(c: Column) -> Column:
    """Cast to the instant TIMESTAMP type; no-op when already instant."""
    return c.cast("timestamp")


def epoch_us(c: Column) -> Column:
    """Epoch microseconds of a TIMESTAMP or TIMESTAMP_NTZ column."""
    return F.unix_micros(as_instant(c))


def with_instant_ts(df, ts_col: str):
    """Normalize ``ts_col`` to the instant type in place — required
    before ``withWatermark`` (event time must be TIMESTAMP, not NTZ).
    No-op re-cast when already instant."""
    return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
