"""Declarative feeder spec (streaming/feeder.py) — the
contrib/xignitefeeder/configs/config.go + alpacabkfeeder backfill
surface: config → scheduled polls → calendar-gated bucket appends,
plus an idempotent startup backfill."""

import datetime as dt
import os

import pytest

from marketstore_spark.catalog import Catalog
from marketstore_spark.streaming.feeder import (
    BackfillSpec,
    ConfiguredFeeder,
    FeederSpec,
)

UTC = dt.timezone.utc


# ---------------------------------------------------------------------
# spec parsing
# ---------------------------------------------------------------------


def test_spec_from_dict_full():
    spec = FeederSpec.from_dict(
        {
            "symbols": ["AAPL", "MSFT"],
            "timeframe": "5Min",
            "attribute_group": "TICK",
            "interval_seconds": 300,
            "off_hours_schedule": "0, 15,30,45",  # xignite spelling
            "backfill": {"enabled": True, "since": "2024-01-02",
                         "timeframe": "1D"},
        }
    )
    assert spec.symbols == ["AAPL", "MSFT"]
    assert spec.off_hours_schedule == (0, 15, 30, 45)
    assert spec.backfill == BackfillSpec(True, "2024-01-02", "1D")
    assert spec.keys() == ["AAPL/5Min/TICK", "MSFT/5Min/TICK"]


@pytest.mark.parametrize(
    "raw",
    [
        {},  # no symbols
        {"symbols": ["A"], "polling": 5},  # unknown key
        {"symbols": ["A"], "off_hours_schedule": "61"},  # bad minute
        {"symbols": ["A"], "interval_seconds": 0},
        {"symbols": ["A"], "backfill": {"enabled": True, "from": "x"}},
        {"symbols": ["A"], "backfill": {"since": "not-a-date"}},
    ],
)
def test_spec_rejects_bad_config(raw):
    with pytest.raises(ValueError):
        FeederSpec.from_dict(raw)


# ---------------------------------------------------------------------
# gating: interval pacing, calendar, off-hours schedule
# ---------------------------------------------------------------------


def _feeder(spark, tmp_path, clock_times, spec=None, rows=None):
    cat = Catalog(spark, os.path.join(str(tmp_path), "root"))
    spec = spec or FeederSpec.from_dict(
        {"symbols": ["AAPL"], "interval_seconds": 60}
    )
    times = iter(clock_times)
    fetched = []

    def fetch(symbols, timeframe, since):
        fetched.append((tuple(symbols), timeframe, since))
        data = rows or [
            ("AAPL", dt.datetime(2024, 1, 3, 15, 0), 101.0),
        ]
        return spark.createDataFrame(data, ["symbol", "ts", "value"])

    return ConfiguredFeeder(spec, cat, fetch, clock=lambda: next(times)), fetched, cat


def test_tick_polls_only_when_market_open_and_interval_elapsed(spark, tmp_path):
    # 2024-01-03 is a Wednesday; 15:00 UTC = 10:00 ET (open),
    # 02:00 UTC = 21:00 ET prior day (closed)
    t_open1 = dt.datetime(2024, 1, 3, 15, 0, tzinfo=UTC)
    t_open2 = dt.datetime(2024, 1, 3, 15, 0, 30, tzinfo=UTC)  # 30s later
    t_open3 = dt.datetime(2024, 1, 3, 15, 2, tzinfo=UTC)
    t_closed = dt.datetime(2024, 1, 4, 2, 0, tzinfo=UTC)
    feeder, fetched, cat = _feeder(
        spark, tmp_path, [t_open1, t_open2, t_open3, t_closed]
    )
    assert feeder.tick() is True  # open, first poll
    assert feeder.tick() is False  # interval not elapsed
    assert feeder.tick() is True  # 2min later: polls
    assert feeder.tick() is False  # closed market
    assert feeder.polls == 2 and feeder.skips == 2
    assert len(fetched) == 2
    # the poll appended to the bucket through the catalog commit path
    assert cat.read("AAPL/1Min/OHLCV").count() == 1  # HWM dedup across polls


def test_off_hours_schedule_polls_through_closed_market(spark, tmp_path):
    # Saturday 03:15 UTC — market closed; minute 15 is on the schedule
    t_sched = dt.datetime(2024, 1, 6, 3, 15, tzinfo=UTC)
    t_off = dt.datetime(2024, 1, 6, 3, 20, tzinfo=UTC)
    spec = FeederSpec.from_dict(
        {"symbols": ["AAPL"], "interval_seconds": 1,
         "off_hours_schedule": "15,45"}
    )
    feeder, fetched, _ = _feeder(spark, tmp_path, [t_sched, t_off], spec=spec)
    assert feeder.tick() is True  # minute matches the off-hours schedule
    assert feeder.tick() is False  # minute 20: no match, market closed
    assert feeder.polls == 1 and feeder.skips == 1


# ---------------------------------------------------------------------
# backfill
# ---------------------------------------------------------------------


def test_backfill_window_and_idempotence(spark, tmp_path):
    cat = Catalog(spark, os.path.join(str(tmp_path), "root"))
    spec = FeederSpec.from_dict(
        {
            "symbols": ["AAPL", "MSFT"],
            "timeframe": "1Min",
            "backfill": {"enabled": True, "since": "2024-01-02"},
        }
    )
    hist = [
        ("AAPL", dt.datetime(2024, 1, 1, 12, 0), 1.0),  # before window
        ("AAPL", dt.datetime(2024, 1, 2, 12, 0), 2.0),
        ("AAPL", dt.datetime(2024, 1, 3, 12, 0), 3.0),
        ("MSFT", dt.datetime(2024, 1, 3, 12, 0), 9.0),
    ]
    calls = []

    def fetch(symbols, timeframe, since):
        calls.append(since)
        return spark.createDataFrame(hist, ["symbol", "ts", "value"])

    feeder = ConfiguredFeeder(spec, cat, fetch)
    assert feeder.run_backfill() == 3  # 2024-01-01 row excluded
    assert calls == ["2024-01-02"]  # since passed to the source pull
    assert cat.read("AAPL/1Min/OHLCV").count() == 2
    assert cat.read("MSFT/1Min/OHLCV").count() == 1
    # re-run: high-water mark appends nothing twice (crash-safe catch-up)
    assert feeder.run_backfill() == 0
    assert cat.read("AAPL/1Min/OHLCV").count() == 2


def test_backfill_disabled_is_noop(spark, tmp_path):
    cat = Catalog(spark, os.path.join(str(tmp_path), "root"))
    spec = FeederSpec.from_dict({"symbols": ["AAPL"]})
    feeder = ConfiguredFeeder(
        spec, cat, lambda *a: pytest.fail("fetch must not run")
    )
    assert feeder.run_backfill() == 0


def test_connector_feeder_trigger_end_to_end(spark, tmp_path):
    """The full reference ingest story in one test: a declarative
    FeederSpec + a concrete connector payload (xignite GetBars) +
    calendar gating + the backfill high-water mark, landing in a
    1Min bucket with an ondiskagg rollup trigger attached — feeder →
    write → ondiskagg, the contrib/xignitefeeder + contrib/ondiskagg
    composition."""
    import json

    from marketstore_spark.streaming.connectors import connector_fetch
    from marketstore_spark.triggers import OnDiskAggTrigger, TriggerRegistry

    cat = Catalog(spark, os.path.join(str(tmp_path), "root"))
    reg = TriggerRegistry()
    reg.register("*/1Min/OHLCV", OnDiskAggTrigger(cat, destinations=["5Min"]))
    cat.triggers = reg

    def bars_payload(minutes):
        return json.dumps(
            {
                "Outcome": "Success",
                "Security": {"Symbol": "AAPL"},
                "ArrayOfBar": [
                    {
                        "StartDateTime": f"2024/01/03 15:{m:02d}:00",
                        "EndDateTime": f"2024/01/03 15:{m + 1:02d}:00",
                        "UTCOffSet": 0,
                        "Open": 100.0 + m,
                        "High": 101.0 + m,
                        "Low": 99.0 + m,
                        "Close": 100.5 + m,
                        "Volume": 1000.0,
                    }
                    for m in minutes
                ],
            }
        )

    # backfill serves history; the live poll re-serves an overlapping
    # window (the HWM must drop the duplicate bar)
    calls = []

    def provider(symbols, timeframe, since):
        calls.append(since)
        return [bars_payload([0, 1] if since else [1, 2])]

    spec = FeederSpec.from_dict(
        {
            "symbols": ["AAPL"],
            "interval_seconds": 60,
            "backfill": {"enabled": True, "since": "2024-01-02"},
        }
    )
    t_open = dt.datetime(2024, 1, 3, 15, 3, tzinfo=UTC)  # Wed 10:03 ET
    t_closed = dt.datetime(2024, 1, 4, 2, 0, tzinfo=UTC)
    times = iter([t_open, t_closed])
    feeder = ConfiguredFeeder(
        spec,
        cat,
        connector_fetch(spark, "xignite_bars", provider),
        clock=lambda: next(times),
    )

    assert feeder.run_backfill() == 2  # bars 15:00, 15:01
    assert calls == ["2024-01-02"]
    assert feeder.tick() is True  # open market: polls, HWM keeps 15:02
    assert feeder.tick() is False  # closed market: gated, no fetch
    assert len(calls) == 2 and calls[1] is None
    assert feeder.rows_appended == 3

    fine = cat.read("AAPL/1Min/OHLCV")
    assert fine.count() == 3  # the overlap bar appended once

    # the rollup trigger maintained the 5Min bucket on BOTH commits:
    # one 15:00-15:05 candle aggregating all three bars
    coarse = cat.read("AAPL/5Min/OHLCV").collect()
    assert len(coarse) == 1
    r = coarse[0]
    assert r["epoch"] == dt.datetime(2024, 1, 3, 15, 0)
    assert (r["open"], r["close"]) == (100.0, 102.5)  # first open, last close
    assert (r["high"], r["low"]) == (103.0, 99.0)
    assert r["volume_sum"] == pytest.approx(3000.0)
