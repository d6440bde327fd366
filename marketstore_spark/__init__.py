"""marketstore_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of alpacahq/marketstore.

The reference (marketstore, Go) is a financial time-series DataFrame
server: TimeBucketKey-addressed columnar storage, a time-range query API
with row limits and a UDA function chain, SQL, on-write multi-timeframe
rollups, and streaming pub/sub.  Here every capability is re-expressed
as declarative DataFrame plans so Catalyst/Tungsten pick the physical
strategy; storage is partitioned Parquet.

See SURVEY.md for the capability inventory and design notes.
"""

from marketstore_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
