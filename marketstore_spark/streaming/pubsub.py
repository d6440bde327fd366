"""Streaming pub/sub — the websocket stream plugin as foreachBatch.

Reference: frontend/stream/stream.go — clients subscribe with a
TimeBucketKey glob (e.g. ``*/1Min/OHLCV``); every write is pushed to
matching subscribers.

Scale design: the driver holds ONLY subscription state (name, glob).
Each glob compiles to an anchored regex in a small broadcast pattern
table; per micro-batch ONE broadcast join evaluates ``key rlike
pattern`` executor-side (JVM regex inside codegen — no shuffle, no
driver collect of any batch content) and a distributed
``partitionBy(subscriber)`` write fans matched rows out to
per-subscriber delivery directories.  No row or key ever transits the
driver, so both row AND key cardinality scale with the cluster; a real
deployment points ``delivery_root`` at a message-bus connector or
object store prefix per subscriber.  (With very large subscriber
counts the rows×patterns regex work grows — pre-matching on a
``distinct`` of the key column would trade one shuffle for it.)
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

    def delivered_count(self, name: str) -> int:
        """Row count of the subscriber's delivery directory from parquet
        FOOTER metadata only — the cheap probe a poll loop should use
        while waiting (materializing every delivered row per 0.2s tick
        is O(history) work; the footers are O(#files))."""
        path = os.path.join(self.delivery_root, f"__sub={name}")
        if not os.path.isdir(path):
            return 0
        import pyarrow.dataset as ds

        return sum(
            f.metadata.num_rows
            for f in ds.dataset(path, format="parquet").get_fragments()
            if f.metadata is not None
        )

    def push_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: broadcast the compiled glob patterns and
        match them executor-side (``rlike`` theta-join), then ONE
        distributed write fans matched rows out per subscriber.  The
        driver never collects keys or rows from the batch."""
        if not self.subscribers:
            return
        spark = batch_df.sparkSession
        # \A anchor: rlike is a regex *search*; fnmatch.translate only
        # end-anchors (\Z), and its (?s:...)\Z output is Java-regex
        # compatible, so anchoring the start makes it a full match.
        pats = [
            (s.name, "\\A" + fnmatch.translate(s.pattern))
            for s in self.subscribers
        ]
        pats_df = spark.createDataFrame(pats, "__sub string, __regex string")
        (
            batch_df.withColumn("__batch_id", F.lit(batch_id))
            .join(
                F.broadcast(pats_df),
                F.regexp_like(F.col(self.key_col), F.col("__regex")),
            )
            .drop("__regex")
            .write.mode("append")
            .partitionBy("__sub")
            .parquet(self.delivery_root)
        )

    def attach(self, df: DataFrame, available_now: bool = True) -> StreamingQuery:
        writer = df.writeStream.foreachBatch(self.push_batch).outputMode("append")
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
