"""Market calendar — trading-day / trading-hours predicates.

Reference: contrib/calendar/calendar.go — a calendar is configured from
JSON (non_trading_days, early_closes, timezone, open/close/early-close
times; nasdaq.go ships the NASDAQ instance) and answers
``IsMarketDay(t)`` / ``IsMarketOpen(t)`` / ``EpochIsMarketOpen``; the
exchange feeders (contrib/alpacabkfeeder et al.) consult it on every
poll so nothing is fetched or written off-hours.

Spark design: the same calendar yields BOTH a driver-side predicate
(gating feeder polls — cheap, a clock check) and a Column predicate
(gating rows distributively — weekday/holiday/session-window tests all
JVM-side expressions, no UDF), so a backfill over years of mixed
on/off-hours data filters at scan speed.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field
from zoneinfo import ZoneInfo

from pyspark.sql import Column
from pyspark.sql import functions as F

#: A NASDAQ-shaped default (contrib/calendar/nasdaq.go): 09:30-16:00
#: America/New_York, 13:00 early closes.  Holiday lists are config —
#: this ships a representative 2024 set; real deployments load their
#: exchange's JSON just like the reference.
NASDAQ_LIKE = {
    "timezone": "America/New_York",
    "open_time": "09:30:00",
    "close_time": "16:00:00",
    "early_close_time": "13:00:00",
    "non_trading_days": [
        "2024-01-01", "2024-01-15", "2024-02-19", "2024-03-29",
        "2024-05-27", "2024-06-19", "2024-07-04", "2024-09-02",
        "2024-11-28", "2024-12-25",
    ],
    "early_closes": ["2024-07-03", "2024-11-29", "2024-12-24"],
}


def _parse_t(s: str) -> dt.time:
    h, m, sec = (int(x) for x in s.split(":"))
    return dt.time(h, m, sec)


@dataclass
class MarketCalendar:
    """calendar.Calendar re-expressed; construct with the same JSON
    shape the reference consumes (``from_config``)."""

    tz: str = "America/New_York"
    open_time: dt.time = dt.time(9, 30)
    close_time: dt.time = dt.time(16, 0)
    early_close_time: dt.time = dt.time(13, 0)
    non_trading_days: frozenset = field(default_factory=frozenset)
    early_closes: frozenset = field(default_factory=frozenset)

    @classmethod
    def from_config(cls, cfg: dict = NASDAQ_LIKE) -> "MarketCalendar":
        return cls(
            tz=cfg["timezone"],
            open_time=_parse_t(cfg["open_time"]),
            close_time=_parse_t(cfg["close_time"]),
            early_close_time=_parse_t(cfg["early_close_time"]),
            non_trading_days=frozenset(cfg.get("non_trading_days", ())),
            early_closes=frozenset(cfg.get("early_closes", ())),
        )

    # -- driver-side (feeder gating) ----------------------------------
    def _local(self, t: dt.datetime) -> dt.datetime:
        if t.tzinfo is None:
            t = t.replace(tzinfo=dt.timezone.utc)
        return t.astimezone(ZoneInfo(self.tz))

    def is_market_day(self, t: dt.datetime) -> bool:
        loc = self._local(t)
        return loc.weekday() < 5 and loc.date().isoformat() not in self.non_trading_days

    def is_market_open(self, t: dt.datetime) -> bool:
        loc = self._local(t)
        if not self.is_market_day(t):
            return False
        close = (
            self.early_close_time
            if loc.date().isoformat() in self.early_closes
            else self.close_time
        )
        return self.open_time <= loc.time() < close

    # -- Column predicate (distributed gating) ------------------------
    def is_open_col(self, ts_col: str = "ts") -> Column:
        """JVM-side market-hours predicate over a UTC timestamp column
        — the distributed analogue of EpochIsMarketOpen.  Pure builtin
        expressions (tz conversion, weekday, time-of-day, literal-set
        membership), so it inlines into the scan filter."""
        loc = F.from_utc_timestamp(F.col(ts_col).cast("timestamp"), self.tz)
        day = F.date_format(loc, "yyyy-MM-dd")
        tod = F.date_format(loc, "HH:mm:ss")
        is_day = ~F.dayofweek(loc).isin(1, 7)  # Sunday=1, Saturday=7
        if self.non_trading_days:
            is_day = is_day & ~day.isin(*sorted(self.non_trading_days))
        close = (
            F.when(day.isin(*sorted(self.early_closes)),
                   F.lit(self.early_close_time.isoformat()))
            .otherwise(F.lit(self.close_time.isoformat()))
            if self.early_closes
            else F.lit(self.close_time.isoformat())
        )
        return is_day & (tod >= F.lit(self.open_time.isoformat())) & (tod < close)


class ScheduledFeeder:
    """The contrib/*feeder polling loop: on each tick, poll only while
    the market is open (feeders consult the calendar before fetching).

    ``poll`` is the source pull (returns rows fetched or a no-op);
    ``clock`` is injectable for tests and replayed backfills.
    """

    def __init__(self, calendar: MarketCalendar, poll, clock=None):
        self.calendar = calendar
        self.poll = poll
        self.clock = clock or (lambda: dt.datetime.now(dt.timezone.utc))
        self.polls = 0
        self.skips = 0

    def tick(self) -> bool:
        """One scheduler tick; returns whether a poll ran."""
        if self.calendar.is_market_open(self.clock()):
            self.poll()
            self.polls += 1
            return True
        self.skips += 1
        return False
