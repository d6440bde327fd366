"""Streaming pub/sub — the websocket stream plugin as foreachBatch.

Reference: frontend/stream/stream.go — clients subscribe with a
TimeBucketKey glob (e.g. ``*/1Min/OHLCV``); every write is pushed to
matching subscribers.  Here each micro-batch is routed to subscribers
by evaluating their glob against the batch's key column; the push
callback receives (subscriber, batch rows).  At scale the callback
would publish to a message bus partition per subscriber — the routing
plan (filter per glob inside one foreachBatch pass) is the same.
"""

from __future__ import annotations

import fnmatch
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


@dataclass
class Subscriber:
    name: str
    pattern: str  # TBK-style glob, matched against the key column
    received: list = field(default_factory=list)

    def matches(self, key: str) -> bool:
        return fnmatch.fnmatchcase(key, self.pattern)


class StreamHub:
    """Routes micro-batches to glob subscribers (stream.Catalog in the
    reference)."""

    def __init__(self, key_col: str = "tbk"):
        self.key_col = key_col
        self.subscribers: list[Subscriber] = []

    def subscribe(self, name: str, pattern: str) -> Subscriber:
        sub = Subscriber(name, pattern)
        self.subscribers.append(sub)
        return sub

    def unsubscribe(self, name: str) -> None:
        self.subscribers = [s for s in self.subscribers if s.name != name]

    def push_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: one pass over the batch's distinct keys,
        then per-subscriber filtered collect.  The distinct-key probe is
        tiny; the data push stays columnar until the callback."""
        if not self.subscribers:
            return
        keys = [r[0] for r in batch_df.select(self.key_col).distinct().collect()]
        for sub in self.subscribers:
            matched = [k for k in keys if sub.matches(k)]
            if not matched:
                continue
            rows = batch_df.filter(batch_df[self.key_col].isin(matched)).collect()
            sub.received.extend((batch_id, r) for r in rows)

    def attach(self, df: DataFrame, available_now: bool = True) -> StreamingQuery:
        writer = df.writeStream.foreachBatch(self.push_batch).outputMode("append")
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
