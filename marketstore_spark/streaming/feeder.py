"""Declarative feeder configuration — the contrib feeder config
surface, driving the generic ingest framework.

Reference: ``contrib/xignitefeeder/configs/config.go`` (DefaultConfig:
exchanges / symbol lists, timeframe, interval, off_hours_schedule,
backfill{enabled, since, timeframe}, recent-backfill days) and
``contrib/alpacabkfeeder`` (interval polling loop + startup backfill
since a configured date).  The concrete exchange connectors need live
API credentials, so the *fetch* stays injectable; everything the
reference expresses as feeder CONFIG — what symbols, what cadence,
what calendar gate, how far back to backfill — is data here, and one
``ConfiguredFeeder`` turns any fetch callable into a calendar-gated,
interval-paced, idempotently-backfilled ingest into catalog buckets.

Spark posture: the feeder is a DRIVER-side scheduler (a clock check
per tick); every data move is a DataFrame append through the catalog's
atomic commit path.  Backfill filters (symbol ∈ spec, ts ≥ since) are
Column predicates pushed to the source scan, and the per-bucket
high-water-mark dedup is :func:`~marketstore_spark.streaming.writer.
backfill`'s one-row MAX(ts) probe — no driver-side row iteration at
any size.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marketstore_spark.functions.calendar import NASDAQ_LIKE, MarketCalendar
from marketstore_spark.streaming.writer import backfill as _backfill

_SPEC_KEYS = {
    "symbols",
    "timeframe",
    "attribute_group",
    "interval_seconds",
    "off_hours_schedule",
    "calendar",
    "backfill",
}
_BACKFILL_KEYS = {"enabled", "since", "timeframe"}


@dataclass
class BackfillSpec:
    """``backfill:`` block (configs/config.go Backfill struct)."""

    enabled: bool = False
    since: str | None = None  # ISO date — window start, inclusive
    timeframe: str | None = None  # None → the feeder's timeframe


@dataclass
class FeederSpec:
    """One feeder's declarative config (configs/config.go
    DefaultConfig, minus the live-API endpoint/token fields)."""

    symbols: list[str]
    timeframe: str = "1Min"
    attribute_group: str = "OHLCV"
    interval_seconds: int = 60
    #: minutes-of-the-hour at which to poll even while the market is
    #: closed (configs/config.go OffHoursSchedule: "0,15,30,45")
    off_hours_schedule: tuple[int, ...] = ()
    calendar: dict = field(default_factory=lambda: dict(NASDAQ_LIKE))
    backfill: BackfillSpec = field(default_factory=BackfillSpec)

    @classmethod
    def from_dict(cls, raw: dict) -> "FeederSpec":
        """Parse + validate a config mapping.  Unknown keys are loud
        (the load_config posture: a key this engine doesn't support
        means the operator expects behavior it won't get)."""
        if not isinstance(raw, dict):
            raise ValueError("feeder spec must be a mapping")
        unknown = sorted(set(raw) - _SPEC_KEYS)
        if unknown:
            raise ValueError(
                f"feeder spec: unknown key(s) {unknown} — supported: "
                f"{sorted(_SPEC_KEYS)}"
            )
        symbols = [str(s) for s in (raw.get("symbols") or [])]
        if not symbols:
            raise ValueError("feeder spec: symbols is required and non-empty")
        sched = raw.get("off_hours_schedule", ())
        if isinstance(sched, str):  # xignite spelling: "0,15,30,45"
            sched = [p for p in (s.strip() for s in sched.split(",")) if p]
        try:
            sched = tuple(sorted({int(m) for m in sched}))
        except (TypeError, ValueError) as exc:
            raise ValueError(f"feeder spec: bad off_hours_schedule: {exc}") from exc
        if any(not 0 <= m <= 59 for m in sched):
            raise ValueError("feeder spec: off_hours_schedule minutes must be 0-59")
        bf_raw = raw.get("backfill") or {}
        unknown = sorted(set(bf_raw) - _BACKFILL_KEYS)
        if unknown:
            raise ValueError(f"feeder spec: unknown backfill key(s) {unknown}")
        bf = BackfillSpec(
            enabled=bool(bf_raw.get("enabled", False)),
            since=str(bf_raw["since"]) if bf_raw.get("since") else None,
            timeframe=(
                str(bf_raw["timeframe"]) if bf_raw.get("timeframe") else None
            ),
        )
        if bf.since is not None:
            dt.date.fromisoformat(bf.since)  # loud on a malformed date
        interval = int(raw.get("interval_seconds", 60))
        if interval <= 0:
            raise ValueError("feeder spec: interval_seconds must be positive")
        return cls(
            symbols=symbols,
            timeframe=str(raw.get("timeframe", "1Min")),
            attribute_group=str(raw.get("attribute_group", "OHLCV")),
            interval_seconds=interval,
            off_hours_schedule=sched,
            calendar=dict(raw.get("calendar") or NASDAQ_LIKE),
            backfill=bf,
        )

    def keys(self) -> list[str]:
        """The TBK bucket keys this feeder appends to."""
        return [
            f"{s}/{self.timeframe}/{self.attribute_group}" for s in self.symbols
        ]


class ConfiguredFeeder:
    """A FeederSpec + a fetch callable = a running feeder.

    ``fetch(symbols, timeframe, since)`` returns a DataFrame with at
    least (``symbol``, ``ts``) columns covering any subset of the
    requested symbols; ``since`` is None for a live poll and an ISO
    date for the backfill pull.  ``tick(now)`` applies the reference's
    gating stack in order (alpacabkfeeder's loop): interval pacing
    first, then the calendar gate — with xignitefeeder's
    off-hours-schedule override letting configured minutes poll
    through a closed market.  Appends go per-bucket through the
    catalog's atomic commit path.
    """

    def __init__(self, spec: FeederSpec, catalog, fetch, clock=None):
        self.spec = spec
        self.catalog = catalog
        self.fetch = fetch
        self.calendar = MarketCalendar.from_config(spec.calendar)
        self.clock = clock or (lambda: dt.datetime.now(dt.timezone.utc))
        self.polls = 0
        self.skips = 0
        self.rows_appended = 0
        self._last_poll: dt.datetime | None = None

    # -- gating ---------------------------------------------------------
    def _off_hours_match(self, now: dt.datetime) -> bool:
        return now.minute in self.spec.off_hours_schedule

    def should_poll(self, now: dt.datetime) -> bool:
        if (
            self._last_poll is not None
            and (now - self._last_poll).total_seconds() < self.spec.interval_seconds
        ):
            return False
        return self.calendar.is_market_open(now) or self._off_hours_match(now)

    # -- polling --------------------------------------------------------
    def tick(self) -> bool:
        """One scheduler tick; returns whether a poll ran."""
        now = self.clock()
        if not self.should_poll(now):
            self.skips += 1
            return False
        df = self.fetch(self.spec.symbols, self.spec.timeframe, None)
        self._append(df)
        self.polls += 1
        self._last_poll = now
        return True

    def _append(self, df: DataFrame) -> None:
        if df is None:
            return
        for sym in self.spec.symbols:
            key = f"{sym}/{self.spec.timeframe}/{self.spec.attribute_group}"
            part = df.filter(F.col("symbol") == sym)
            self.rows_appended += _backfill(self.catalog, key, part)

    # -- backfill -------------------------------------------------------
    def run_backfill(self) -> int:
        """Startup catch-up (alpacabkfeeder backfill / xignite
        Backfill.Since): fetch history from the configured date and
        append only past each bucket's high-water mark — a crashed
        run re-appends nothing.  Returns rows appended."""
        bf = self.spec.backfill
        if not bf.enabled:
            return 0
        tf = bf.timeframe or self.spec.timeframe
        df = self.fetch(self.spec.symbols, tf, bf.since)
        if df is None:
            return 0
        if bf.since is not None:
            df = df.filter(F.col("ts") >= F.lit(bf.since).cast("timestamp"))
        appended = 0
        for sym in self.spec.symbols:
            key = f"{sym}/{tf}/{self.spec.attribute_group}"
            appended += _backfill(
                self.catalog, key, df.filter(F.col("symbol") == sym)
            )
        self.rows_appended += appended
        return appended
