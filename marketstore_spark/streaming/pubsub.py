"""Streaming pub/sub — the websocket stream plugin as foreachBatch.

Reference: frontend/stream/stream.go — clients subscribe with a
TimeBucketKey glob (e.g. ``*/1Min/OHLCV``); every write is pushed to
matching subscribers.

Scale design: the driver holds ONLY subscription state (name, glob).
Per micro-batch it routes by evaluating each subscriber's glob against
the batch's distinct keys (a tiny metadata collect — key cardinality,
not row count), then delivery happens entirely executor-side: the
(key → subscriber) routing table broadcast-joins onto the batch and one
distributed ``partitionBy(subscriber)`` write fans rows out to
per-subscriber delivery directories.  No row ever transits the driver,
so subscriber throughput scales with the cluster, not the driver; a
real deployment points ``delivery_root`` at a message-bus connector or
object store prefix per subscriber.
"""

from __future__ import annotations

import fnmatch
import os
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


@dataclass
class Subscriber:
    name: str
    pattern: str  # TBK-style glob, matched against the key column
    hub: "StreamHub" = field(default=None, repr=False)

    def matches(self, key: str) -> bool:
        return fnmatch.fnmatchcase(key, self.pattern)

    @property
    def received(self) -> list:
        """Rows delivered so far (reads this subscriber's delivery
        directory; test/driver convenience — consumers at scale tail
        the directory or bus partition themselves)."""
        return self.hub.delivered(self.name)


class StreamHub:
    """Routes micro-batches to glob subscribers (stream.Catalog in the
    reference)."""

    def __init__(self, key_col: str = "tbk", delivery_root: str | None = None):
        self.key_col = key_col
        self.delivery_root = delivery_root or tempfile.mkdtemp(prefix="msprk_pubsub_")
        self.subscribers: list[Subscriber] = []

    def subscribe(self, name: str, pattern: str) -> Subscriber:
        sub = Subscriber(name, pattern, hub=self)
        self.subscribers.append(sub)
        return sub

    def unsubscribe(self, name: str) -> None:
        self.subscribers = [s for s in self.subscribers if s.name != name]

    def delivered(self, name: str) -> list:
        path = os.path.join(self.delivery_root, f"__sub={name}")
        if not os.path.isdir(path):
            return []
        import pyarrow.dataset as ds

        return ds.dataset(path, format="parquet").to_table().to_pylist()

    def push_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: glob-match the batch's distinct keys
        (routing only — cardinality of keys, not rows), then ONE
        distributed write fans matched rows out per subscriber."""
        if not self.subscribers:
            return
        keys = [r[0] for r in batch_df.select(self.key_col).distinct().collect()]
        routes = [
            (k, sub.name) for k in keys for sub in self.subscribers if sub.matches(k)
        ]
        if not routes:
            return
        spark = batch_df.sparkSession
        routes_df = spark.createDataFrame(routes, f"{self.key_col} string, __sub string")
        (
            batch_df.withColumn("__batch_id", F.lit(batch_id))
            .join(F.broadcast(routes_df), self.key_col)
            .write.mode("append")
            .partitionBy("__sub")
            .parquet(self.delivery_root)
        )

    def attach(self, df: DataFrame, available_now: bool = True) -> StreamingQuery:
        writer = df.writeStream.foreachBatch(self.push_batch).outputMode("append")
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
