"""Write-path trigger framework (reference: plugins/trigger/trigger.go).

The reference fires registered trigger plugins after each bucket write:
a trigger declares an ``on`` pattern (a TimeBucketKey glob like
``*/1Min/OHLCV``), and ``Fire(keyPath, records)`` runs once the new
content is durably on disk.  contrib/ondiskagg/aggtrigger is the
canonical trigger: it re-aggregates the written epoch range into
coarser-timeframe buckets.

Spark design: triggers are plain Python objects on the driver — the
*work* they kick off is a distributed DataFrame job, so the framework
itself needs no cluster machinery.  ``Catalog.write`` fires matching
triggers after the parquet commit (same durability guarantee as the
reference: parquet file commits are atomic, so a trigger can re-read
the bucket).  The ondiskagg trigger recomputes ONLY the touched coarse
buckets — at 100 TB an append of one day re-aggregates one day, not
the bucket's history.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Protocol

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marketstore_spark.operators.candler import candle_candles, tick_candles


class Trigger(Protocol):
    def fire(self, key: str, written: DataFrame) -> None: ...


def _glob_to_re(pattern: str) -> re.Pattern:
    """plugins/trigger/trigger.go Matcher: '*' wildcards, anchored."""
    return re.compile("^" + ".*".join(re.escape(p) for p in pattern.split("*")) + "$")


@dataclass
class Matcher:
    on: str
    trigger: Trigger

    def matches(self, key: str) -> bool:
        return _glob_to_re(self.on).match(key) is not None


@dataclass
class TriggerRegistry:
    matchers: list[Matcher] = field(default_factory=list)

    def register(self, on: str, trigger: Trigger) -> None:
        self.matchers.append(Matcher(on, trigger))

    def fire(self, key: str, written: DataFrame) -> None:
        for m in self.matchers:
            if m.matches(key):
                m.trigger.fire(key, written)


def _touched_window(spark, bounds, dest_tf: str):
    """[bucket_start(lo), bucket_end(hi)) in the DESTINATION timeframe,
    derived from the same bucketing the candler aggregates with — so a
    1W destination is Monday-aligned (4-day startTime shift) and
    calendar timeframes (1Mo/1Y) truncate on the calendar instead of
    raising.  Using plain F.window here (the round-1 bug) produced
    Thursday-aligned deletes that straddled real weekly buckets."""
    from marketstore_spark.operators.candler import _CALENDAR, _bucket

    one = spark.range(1)
    # two selects: Spark allows only one window() per projection
    lo_b = one.select(_bucket(F.lit(bounds["lo"]), dest_tf).alias("w")).first()["w"]
    hi_b = one.select(_bucket(F.lit(bounds["hi"]), dest_tf).alias("w")).first()["w"]
    lo_v = lo_b["start"]
    if dest_tf in _CALENDAR:
        s = hi_b["start"]
        if _CALENDAR[dest_tf] == "month":
            hi_v = (
                s.replace(year=s.year + 1, month=1)
                if s.month == 12
                else s.replace(month=s.month + 1)
            )
        else:
            hi_v = s.replace(year=s.year + 1)
    else:
        hi_v = hi_b["end"]
    return lo_v, hi_v


class OnDiskAggTrigger:
    """contrib/ondiskagg/aggtrigger re-expressed: on write to a fine
    bucket, re-aggregate the affected epoch window into each
    destination timeframe's bucket.

    Incremental semantics match the reference (aggtrigger.go recomputes
    from the written indexes): the touched window is
    [floor(min_ts, dest_tf), floor(max_ts, dest_tf) + dest_tf); the
    destination rows in that window are deleted and recomputed from the
    source bucket — idempotent, so replaying a write (WAL-recovery
    analogue, or a Structured-Streaming retry) converges to the same
    state.  Only the touched window is scanned: the source read is a
    pushed-down ts range filter, so cost scales with the write size,
    not bucket history.
    """

    def __init__(self, catalog, destinations: list[str], ts_col: str = "ts"):
        self.catalog = catalog
        self.destinations = destinations
        self.ts_col = ts_col

    def fire(self, key: str, written: DataFrame) -> None:
        from marketstore_spark.catalog import TimeBucketKey

        tbk = TimeBucketKey(key)
        bounds = written.agg(
            F.min(self.ts_col).alias("lo"), F.max(self.ts_col).alias("hi")
        ).first()
        if bounds["lo"] is None:
            return
        for dest_tf in self.destinations:
            lo_v, hi_v = _touched_window(written.sparkSession, bounds, dest_tf)

            src = self.catalog.read(key).filter(
                (F.col(self.ts_col) >= F.lit(lo_v)) & (F.col(self.ts_col) < F.lit(hi_v))
            )
            cols = set(src.columns)
            if {"open", "high", "low", "close"} <= cols:
                out = candle_candles(
                    src, dest_tf, key_cols=(), ts_col=self.ts_col,
                    sum_cols=[c for c in ("volume",) if c in cols],
                )
            else:
                out = tick_candles(
                    src, dest_tf, key_cols=(), ts_col=self.ts_col,
                    price_col="value" if "value" in cols else "close",
                    tiebreak=[c for c in ("event_id",) if c in cols],
                )
            dest_key = f"{tbk.symbol}/{dest_tf}/{tbk.attribute_group}"
            dest_path = TimeBucketKey(dest_key).path(self.catalog.root)
            import datetime
            import os

            if os.path.isdir(dest_path):
                # delete-then-append upsert of the touched window only;
                # delete_range is inclusive and the window end exclusive,
                # so back off 1µs to spare the next bucket's row
                self.catalog.delete_range(
                    dest_key,
                    lo_v,
                    hi_v - datetime.timedelta(microseconds=1),
                    ts_col="epoch",
                )
            self.catalog.write(dest_key, out)


def new_trigger(config: dict, catalog) -> OnDiskAggTrigger:
    """Config-file trigger factory (the plugin-loader convention used
    by ``serve --config``; see marketstore_spark.config): a
    ``triggers:`` entry with ``module: marketstore_spark.triggers``
    builds the ondiskagg rollup trigger from ``config:
    {destinations: [...], ts_col: ...}`` — the analogue of loading
    contrib/ondiskagg via mkts.yml."""
    destinations = list(config.get("destinations") or [])
    if not destinations:
        raise ValueError("ondiskagg trigger config needs destinations: [...]")
    return OnDiskAggTrigger(
        catalog, destinations, ts_col=str(config.get("ts_col", "ts"))
    )
