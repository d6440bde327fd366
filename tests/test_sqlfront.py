"""marketstore-flavored SQL front-end (sqlparser/ surface):
backtick-TBK tables, WHERE/LIMIT, candler UDAs in the select list,
INSERT INTO a bucket, native scalar aggs passing through to Catalyst.
Statement shapes mirror sqlparser/all_test.go:66,351."""

import os

import pytest
from pyspark.sql import functions as F

from marketstore_spark.catalog import Catalog, load_table
from marketstore_spark.operators.candler import candle_candles, tick_candles
from marketstore_spark.plans.sqlfront import MarketSQL


@pytest.fixture(scope="module")
def msql(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sqlroot"))
    cat = Catalog(spark, root)
    ev = load_table(spark, sf_dir, "events")
    cat.write("EV1/1Min/TICK", ev.filter(F.col("user_id") == 1))
    return MarketSQL(cat)


def test_select_range_and_limit(msql):
    out = msql.sql(
        "SELECT event_id, ts, value FROM `EV1/1Min/TICK` "
        "WHERE ts BETWEEN '2024-01-05' AND '2024-01-10' ORDER BY ts LIMIT 7;"
    )
    rows = out.collect()
    assert len(rows) == 7
    assert all("2024-01-05" <= str(r["ts"]) <= "2024-01-10" for r in rows)


def test_native_agg_passthrough(msql):
    row = msql.sql(
        "SELECT min(value) AS lo, max(value) AS hi, count(*) AS n FROM `EV1/1Min/TICK`"
    ).first()
    base = msql.catalog.read("EV1/1Min/TICK")
    exp = base.agg(F.min("value"), F.max("value"), F.count(F.lit(1))).first()
    assert (row["lo"], row["hi"], row["n"]) == tuple(exp)


def test_tickcandler_matches_operator(msql):
    out = msql.sql("SELECT tickcandler('5Min', value) FROM `EV1/1Min/TICK`")
    exp = tick_candles(
        msql.catalog.read("EV1/1Min/TICK"), "5Min", key_cols=(), price_col="value"
    )
    assert out.exceptAll(exp).count() == 0 and exp.exceptAll(out).count() == 0


def test_tickcandler_where_and_sum_tag(msql):
    out = msql.sql(
        "SELECT tickcandler('15Min', value, Sum::value) FROM `EV1/1Min/TICK` "
        "WHERE ts < '2024-01-03'"
    )
    assert "value_sum" in out.columns
    exp_rows = (
        msql.catalog.read("EV1/1Min/TICK").filter("ts < '2024-01-03'")
        .select(F.window("ts", "15 minutes")).distinct().count()
    )
    assert out.count() == exp_rows


def test_candlecandler_rollup(msql, spark):
    fine = tick_candles(
        msql.catalog.read("EV1/1Min/TICK"), "1Min", key_cols=(), price_col="value"
    )
    msql.catalog.write("EV1/1MinBars/OHLC", fine, mode="overwrite")
    out = msql.sql(
        "SELECT candlecandler('1H', open, high, low, close) FROM `EV1/1MinBars/OHLC`"
    )
    exp = candle_candles(fine, "1H", key_cols=())
    assert out.exceptAll(exp).count() == 0 and exp.exceptAll(out).count() == 0


def test_insert_into_bucket(msql):
    n_before = set(msql.catalog.list_buckets())
    out = msql.sql(
        "INSERT INTO `EV1/5Min/OHLC` SELECT tickcandler('5Min', value) FROM `EV1/1Min/TICK`;"
    )
    assert "EV1/5Min/OHLC" in msql.catalog.list_buckets()
    stored = msql.catalog.read("EV1/5Min/OHLC")
    assert stored.count() == out.count() > 0


def test_explain_statement(msql):
    out = msql.sql("EXPLAIN SELECT min(value) AS lo FROM `EV1/1Min/TICK`;")
    text = "\n".join(r["plan"] for r in out.collect())
    assert "Scan parquet" in text and "Aggregate" in text


def test_create_view_statement(msql, spark):
    out = msql.sql(
        "CREATE VIEW candle5Min AS SELECT tickcandler('5Min', value) FROM `EV1/1Min/TICK`;"
    )
    got = spark.sql("SELECT count(*) AS n FROM candle5Min").first()["n"]
    assert got == out.count() > 0


def test_show_and_describe_passthrough(msql, spark):
    """sqlparser grammar parses SHOW TABLES / DESCRIBE (statement types
    16-22); Spark SQL speaks them natively, so MarketSQL passes them
    through — DESCRIBE resolves a backtick TBK into its temp view."""
    desc = msql.sql("DESCRIBE SELECT * FROM `EV1/1Min/TICK`;").collect()
    cols = {r["col_name"] for r in desc}
    assert {"ts", "value", "user_id"} <= cols

    msql.sql("CREATE VIEW showme AS SELECT 1 AS one;")
    shown = {r["tableName"] for r in msql.sql("SHOW TABLES;").collect()}
    assert "showme" in shown


def test_sql_gap_and_adjust_udas(spark, sf_dir, tmp_path):
    """The SQL registry's gap and adjust UDAs (sqlparser/registry.go
    NewDefaultAggRunner) work through MarketSQL: gap(threshold) over a
    bucket; adjust() pulling rate changes from the CA bucket."""
    import datetime as dt
    import os

    from pyspark.sql import functions as F

    from marketstore_spark.catalog import Catalog
    from marketstore_spark.operators.ca import ingest_announcements
    from marketstore_spark.operators.uda import gap_threshold
    from marketstore_spark.catalog import load_table
    from marketstore_spark.plans.sqlfront import MarketSQL

    cat = Catalog(spark, os.path.join(str(tmp_path), "root"))
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") == 1)
    cat.write("SYM1/1Min/TICK", ev)
    msql = MarketSQL(cat)

    got = msql.sql("SELECT gap(1800) FROM `SYM1/1Min/TICK`")
    want = gap_threshold(ev, 1800.0, key_cols=(), order_tiebreak=["event_id"])
    assert got.count() == want.count() > 0

    prices = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 5), 100.0),
            (2, dt.datetime(2024, 1, 15), 100.0),
        ],
        "event_id long, ts timestamp, value double",
    )
    cat.write("AAPL/1D/TICK", prices)
    f = tmp_path / "reorg"
    f.write_text("SPLIT|AAPL|2024-01-10|0.5\n")
    ingest_announcements(cat, str(f))
    adj = {
        r["ts"].day: r["adjusted"]
        for r in msql.sql("SELECT adjust('split,dividend', value) FROM `AAPL/1D/TICK`").collect()
    }
    assert adj == {5: 50.0, 15: 100.0}


def test_ema_uda_matches_operator(msql):
    from marketstore_spark.operators.ewm import ema

    out = msql.sql("SELECT ema('20', value) FROM `EV1/1Min/TICK`")
    base = msql.catalog.read("EV1/1Min/TICK").withColumn("__symbol", F.lit("_"))
    exp = ema(base, span=20, key_cols=("__symbol",), tiebreak=("event_id",)).drop(
        "__symbol"
    )
    got = {r["event_id"]: r["ema"] for r in out.collect()}
    want = {r["event_id"]: r["ema"] for r in exp.collect()}
    assert got == want  # bitwise


def test_macd_uda_custom_spans(msql):
    out = msql.sql("SELECT macd('5,10,3', value) FROM `EV1/1Min/TICK` LIMIT 5")
    rows = out.collect()
    assert len(rows) == 5
    assert {"macd", "signal", "histogram"} <= set(out.columns)


def test_atr_donchian_udas(msql):
    out = msql.sql("SELECT atr('3', '1D', value) FROM `EV1/1Min/TICK`")
    rows = out.collect()
    assert rows and {"epoch", "tr", "atr"} <= set(out.columns)
    out2 = msql.sql("SELECT donchian('2', '1D', value) FROM `EV1/1Min/TICK`")
    assert {"upper_c", "lower_c", "mid_c"} <= set(out2.columns)
    # warm-up rows are NULL, later rows are bounded
    vals = [r for r in out2.collect() if r["upper_c"] is not None]
    assert vals and all(r["lower_c"] <= r["mid_c"] <= r["upper_c"] for r in vals)


def test_uda_bare_numeric_args(msql):
    """ema(5, value) with an UNQUOTED span must run with span 5 (the
    gap arm accepts gap(1800) the same way) — silently falling back to
    the default span would return wrong indicator values."""
    from marketstore_spark.operators.ewm import ema

    out = msql.sql("SELECT ema(5, value) FROM `EV1/1Min/TICK`")
    base = msql.catalog.read("EV1/1Min/TICK").withColumn("__symbol", F.lit("_"))
    exp = ema(base, span=5, key_cols=("__symbol",), tiebreak=("event_id",)).drop(
        "__symbol"
    )
    got = {r["event_id"]: r["ema"] for r in out.collect()}
    want = {r["event_id"]: r["ema"] for r in exp.collect()}
    assert got == want and got != {}


def test_tickrule_uda_matches_operator(msql):
    from marketstore_spark.operators.quant import tick_rule

    out = msql.sql("SELECT tickrule(value, value) FROM `EV1/1Min/TICK`")
    base = msql.catalog.read("EV1/1Min/TICK").withColumn("__symbol", F.lit("_"))
    exp = tick_rule(
        base.withColumn("volume", F.col("value")),
        symbol_col="__symbol",
    ).drop("symbol")
    got = {r["event_id"]: (r["side"], r["cum_flow"]) for r in out.collect()}
    want = {r["event_id"]: (r["side"], r["cum_flow"]) for r in exp.collect()}
    assert got == want and got


def test_nbbo_uda_consolidates(msql):
    out = msql.sql("SELECT nbbo('5Min') FROM `EV1/1Min/TICK`")
    rows = out.collect()
    assert rows
    assert {"epoch", "best_bid_c", "best_ask_c", "spread_c"} <= set(out.columns)
    assert all(r["best_bid_c"] <= r["best_ask_c"] for r in rows)


def test_nbbo_uda_bare_timeframe_and_tickrule_volume_guard(msql):
    """nbbo(5Min) with an UNQUOTED timeframe must bucket at 5 minutes
    (the bare-number-led-token parsing rule); tickrule with no volume
    argument and no volume column must refuse instead of silently
    computing price-weighted flow."""
    import pytest as _pytest

    q = msql.sql("SELECT nbbo('5Min') FROM `EV1/1Min/TICK`")
    b = msql.sql("SELECT nbbo(5Min) FROM `EV1/1Min/TICK`")
    assert sorted(map(tuple, b.collect())) == sorted(map(tuple, q.collect()))

    with _pytest.raises(ValueError, match="volume"):
        msql.sql("SELECT tickrule(value) FROM `EV1/1Min/TICK`")


def test_nbbo_uda_without_tiebreak_or_sides_fails_loud(
    spark, sf_dir, tmp_path_factory
):
    """A bucket with neither an integer event_id tiebreak nor pre-sided
    bid_c/ask_c columns cannot derive synthetic sides — the fallback
    tiebreak is the timestamp, and pmod(<timestamp>, 4) dies in
    analysis with a cryptic DATATYPE_MISMATCH.  The registry must
    raise a clear ValueError first (the tickrule volume guard's
    treatment)."""
    import pytest as _pytest

    root = str(tmp_path_factory.mktemp("nbboguard"))
    cat = Catalog(spark, root)
    ev = load_table(spark, sf_dir, "events")
    cat.write(
        "BARE/1Min/TICK",
        ev.filter(F.col("user_id") == 1).select("ts", "value"),
    )
    msql2 = MarketSQL(cat)
    with _pytest.raises(ValueError, match="event_id|bid_c"):
        msql2.sql("SELECT nbbo('5Min') FROM `BARE/1Min/TICK`")


def test_heikinashi_uda_matches_operator(msql):
    from marketstore_spark.operators.bars import heikin_ashi

    out = msql.sql("SELECT heikinashi('1D', value) FROM `EV1/1Min/TICK`")
    base = msql.catalog.read("EV1/1Min/TICK").withColumn("__symbol", F.lit("_"))
    exp = heikin_ashi(base, timeframe="1 day", symbol_col="__symbol").drop("symbol")
    got = {r["epoch"]: (r["ha_open"], r["ha_close"]) for r in out.collect()}
    want = {r["epoch"]: (r["ha_open"], r["ha_close"]) for r in exp.collect()}
    assert got == want and got


def test_ichimoku_uda_periods_and_default(msql):
    from marketstore_spark.operators.quant import ichimoku

    out = msql.sql("SELECT ichimoku('2,3,4', '1D', value) FROM `EV1/1Min/TICK`")
    base = msql.catalog.read("EV1/1Min/TICK").withColumn("__symbol", F.lit("_"))
    exp = ichimoku(base, 2, 3, 4, timeframe="1 day", symbol_col="__symbol").drop(
        "symbol"
    )
    got = {r["epoch"]: (r["tenkan"], r["kijun"], r["senkou_b"]) for r in out.collect()}
    want = {r["epoch"]: (r["tenkan"], r["kijun"], r["senkou_b"]) for r in exp.collect()}
    assert got == want and got
    # a lone token is the timeframe, not a period list
    d = msql.sql("SELECT ichimoku('1D') FROM `EV1/1Min/TICK`")
    assert {"tenkan", "kijun", "senkou_a", "senkou_b", "chikou_c"} <= set(d.columns)
    assert d.count() == len(want)


def test_amihud_uda_matches_operator_and_volume_guard(msql):
    import pytest as _pytest

    from marketstore_spark.operators.quant import amihud_illiquidity

    out = msql.sql("SELECT amihud('1D', value, event_id) FROM `EV1/1Min/TICK`")
    base = msql.catalog.read("EV1/1Min/TICK").withColumn("__symbol", F.lit("_"))
    exp = amihud_illiquidity(
        base, timeframe="1 day", symbol_col="__symbol", volume_col="event_id"
    ).drop("symbol")
    got = {r["epoch"]: (r["ret"], r["illiq"]) for r in out.collect()}
    want = {r["epoch"]: (r["ret"], r["illiq"]) for r in exp.collect()}
    assert got == want and got
    # no volume arg + no volume column in the bucket -> loud refusal
    # (the tickrule guard: price-weighted flow is a plausible-looking
    # wrong answer)
    with _pytest.raises(ValueError, match="volume"):
        msql.sql("SELECT amihud('1D', value) FROM `EV1/1Min/TICK`")


def test_rollspread_autocorr_varratio_udas(msql):
    from marketstore_spark.operators.quant import (
        autocorr_returns,
        roll_spread,
        variance_ratio,
    )

    base = msql.catalog.read("EV1/1Min/TICK").withColumn("__symbol", F.lit("_"))
    out = msql.sql("SELECT rollspread('1D', value) FROM `EV1/1Min/TICK`").collect()
    exp = roll_spread(base, symbol_col="__symbol").collect()
    assert [r["roll_spread_c"] for r in out] == [r["roll_spread_c"] for r in exp]
    out = msql.sql("SELECT autocorr('1D', value) FROM `EV1/1Min/TICK`").collect()
    exp = autocorr_returns(base, symbol_col="__symbol").collect()
    assert [r["autocorr"] for r in out] == [r["autocorr"] for r in exp]
    out = msql.sql("SELECT varratio('2', '1D', value) FROM `EV1/1Min/TICK`").collect()
    exp = variance_ratio(base, q=2, symbol_col="__symbol").collect()
    assert [r["vr"] for r in out] == [r["vr"] for r in exp] and out


def test_kylelambda_vpin_markout_udas(msql):
    import pytest as _pytest

    from marketstore_spark.operators.bars import vpin
    from marketstore_spark.operators.quant import kyle_lambda, markout_returns

    base = msql.catalog.read("EV1/1Min/TICK").withColumn("__symbol", F.lit("_"))
    out = msql.sql(
        "SELECT kylelambda('1H', value, event_id) FROM `EV1/1Min/TICK`"
    ).collect()
    exp = kyle_lambda(base, symbol_col="__symbol", volume_col="event_id").collect()
    assert [r["kyle_lambda"] for r in out] == [r["kyle_lambda"] for r in exp] and out
    out = msql.sql(
        "SELECT vpin('500', '3', value, event_id) FROM `EV1/1Min/TICK`"
    ).collect()
    exp = vpin(
        base, bucket_volume=500, n=3, symbol_col="__symbol", volume_col="event_id"
    ).collect()
    got = {r["bucket_id"]: r["vpin"] for r in out}
    want = {r["bucket_id"]: r["vpin"] for r in exp}
    assert got == want and got
    out = msql.sql("SELECT markout('1', '1H', value) FROM `EV1/1Min/TICK`").collect()
    exp = markout_returns(base, horizon=1, symbol_col="__symbol").collect()
    got = {r["epoch"]: r["avg_markout_c"] for r in out}
    want = {r["epoch"]: r["avg_markout_c"] for r in exp}
    assert got == want and got
    # volume guards refuse rather than silently price-weight
    with _pytest.raises(ValueError, match="volume"):
        msql.sql("SELECT vpin('500', '3', value) FROM `EV1/1Min/TICK`")
    with _pytest.raises(ValueError, match="volume"):
        msql.sql("SELECT kylelambda('1H', value) FROM `EV1/1Min/TICK`")


def test_rangevol_corwinschultz_kaufmaner_udas(msql):
    from marketstore_spark.operators.quant import (
        corwin_schultz,
        kaufman_er,
        range_vol,
    )

    base = msql.catalog.read("EV1/1Min/TICK").withColumn("__symbol", F.lit("_"))
    out = msql.sql("SELECT rangevol('1D', value) FROM `EV1/1Min/TICK`").collect()
    exp = range_vol(base, symbol_col="__symbol").collect()
    got = {r["epoch"]: (r["park_var"], r["gk_var"], r["rs_var"]) for r in out}
    want = {r["epoch"]: (r["park_var"], r["gk_var"], r["rs_var"]) for r in exp}
    assert got == want and got
    out = msql.sql(
        "SELECT corwinschultz('1D', value) FROM `EV1/1Min/TICK`"
    ).collect()
    exp = corwin_schultz(base, symbol_col="__symbol").collect()
    got = {r["epoch"]: (r["cs_spread"], r["cs_spread_pos"]) for r in out}
    want = {r["epoch"]: (r["cs_spread"], r["cs_spread_pos"]) for r in exp}
    assert got == want and got
    out = msql.sql(
        "SELECT kaufmaner('2', '1D', value) FROM `EV1/1Min/TICK` LIMIT 5"
    ).collect()
    exp = kaufman_er(base, n=2, symbol_col="__symbol").collect()
    want = {r["epoch"]: r["er"] for r in exp}
    assert len(out) == 5
    assert all(want[r["epoch"]] == r["er"] for r in out)


def test_trimmedmean_realizedmoments_udas(msql):
    from marketstore_spark.operators.quant import realized_moments, trimmed_mean

    base = msql.catalog.read("EV1/1Min/TICK").withColumn("__symbol", F.lit("_"))
    out = msql.sql(
        "SELECT trimmedmean('5', '1D', value) FROM `EV1/1Min/TICK`"
    ).collect()
    exp = trimmed_mean(base, trim_pct=5, symbol_col="__symbol").collect()
    got = {r["epoch"]: (r["n_used"], r["trimmed_mean_c"]) for r in out}
    want = {r["epoch"]: (r["n_used"], r["trimmed_mean_c"]) for r in exp}
    assert got == want and got
    out = msql.sql(
        "SELECT realizedmoments('1D', value) FROM `EV1/1Min/TICK`"
    ).collect()
    exp = realized_moments(base, symbol_col="__symbol").collect()
    got = {r["epoch"]: (r["rskew"], r["rkurt"]) for r in out}
    want = {r["epoch"]: (r["rskew"], r["rkurt"]) for r in exp}
    assert got == want and got


def test_mfi_uda(msql):
    import pytest as _pytest

    from marketstore_spark.operators.quant import mfi

    base = msql.catalog.read("EV1/1Min/TICK").withColumn("__symbol", F.lit("_"))
    out = msql.sql(
        "SELECT mfi('2', '1D', value, event_id) FROM `EV1/1Min/TICK`"
    ).collect()
    exp = mfi(base, n=2, symbol_col="__symbol", volume_col="event_id").collect()
    got = {r["epoch"]: r["mfi"] for r in out}
    want = {r["epoch"]: r["mfi"] for r in exp}
    assert got == want and got
    # volume guard: refuse rather than silently price-weight
    with _pytest.raises(ValueError):
        msql.sql("SELECT mfi('2', '1D') FROM `EV1/1Min/TICK`").collect()


def test_cci_uda(msql):
    from marketstore_spark.operators.quant import cci

    base = msql.catalog.read("EV1/1Min/TICK").withColumn("__symbol", F.lit("_"))
    out = msql.sql("SELECT cci('3', '1D', value) FROM `EV1/1Min/TICK`").collect()
    exp = cci(base, n=3, symbol_col="__symbol").collect()
    got = {r["epoch"]: r["cci"] for r in out}
    want = {r["epoch"]: r["cci"] for r in exp}
    assert got == want and got


def test_aroon_uda(msql):
    from marketstore_spark.operators.quant import aroon

    base = msql.catalog.read("EV1/1Min/TICK").withColumn("__symbol", F.lit("_"))
    out = msql.sql("SELECT aroon('2', '1D', value) FROM `EV1/1Min/TICK`").collect()
    exp = aroon(base, n=2, symbol_col="__symbol").collect()
    got = {r["epoch"]: (r["aroon_up"], r["aroon_down"]) for r in out}
    want = {r["epoch"]: (r["aroon_up"], r["aroon_down"]) for r in exp}
    assert got == want and got


def test_adx_uda(msql):
    from marketstore_spark.operators.quant import adx

    base = msql.catalog.read("EV1/1Min/TICK").withColumn("__symbol", F.lit("_"))
    out = msql.sql("SELECT adx('2', '1D', value) FROM `EV1/1Min/TICK`").collect()
    exp = adx(base, n=2, symbol_col="__symbol").collect()
    got = {r["epoch"]: (r["di_plus"], r["di_minus"], r["adx"]) for r in out}
    want = {r["epoch"]: (r["di_plus"], r["di_minus"], r["adx"]) for r in exp}
    assert got == want and got


def test_liquiditypanel_uda(msql):
    from marketstore_spark.operators.quant import liquidity_panel

    base = msql.catalog.read("EV1/1Min/TICK").withColumn("__symbol", F.lit("_"))
    out = msql.sql(
        "SELECT liquiditypanel('2', '1D', value) FROM `EV1/1Min/TICK`"
    ).collect()
    exp = liquidity_panel(base, q=2, symbol_col="__symbol").collect()
    assert len(out) == len(exp) == 1
    for c in ("n_pairs", "move_autocov", "roll_spread_c", "autocorr", "vr"):
        assert out[0][c] == exp[0][c], c


@pytest.fixture(scope="module")
def msql_events(spark, sf_dir, tmp_path_factory):
    """Multi-user events bucket for the event-analytics UDAs."""
    root = str(tmp_path_factory.mktemp("sqlev"))
    cat = Catalog(spark, root)
    ev = load_table(spark, sf_dir, "events")
    cat.write("EVALL/1Min/EVENT", ev.filter(F.col("user_id") <= 20))
    return MarketSQL(cat)


def test_sessions_uda_matches_operator(msql_events):
    from marketstore_spark.operators.sessionize import sessionize

    out = msql_events.sql("SELECT sessions(900) FROM `EVALL/1Min/EVENT`")
    base = msql_events.catalog.read("EVALL/1Min/EVENT")
    exp = sessionize(base, gap_seconds=900)
    got = {(r["user_id"], r["session_id"]): r["n_events"] for r in out.collect()}
    want = {(r["user_id"], r["session_id"]): r["n_events"] for r in exp.collect()}
    assert got == want and got


def test_funnel_uda_matches_operator(msql_events):
    from marketstore_spark.operators.funnel import event_funnel

    base = msql_events.catalog.read("EVALL/1Min/EVENT")
    steps = [
        r["event_type"]
        for r in base.groupBy("event_type").count()
        .orderBy(F.col("count").desc()).limit(2).collect()
    ]
    q = f"SELECT funnel('{','.join(steps)}') FROM `EVALL/1Min/EVENT`"
    out = msql_events.sql(q)
    exp = event_funnel(base, steps)
    got = {r["step"]: r["users"] for r in out.collect()}
    want = {r["step"]: r["users"] for r in exp.collect()}
    assert got == want and got


def test_rfm_uda_matches_operator(msql_events):
    from marketstore_spark.operators.funnel import rfm_segments

    out = msql_events.sql("SELECT rfm(value) FROM `EVALL/1Min/EVENT` LIMIT 500")
    base = msql_events.catalog.read("EVALL/1Min/EVENT")
    exp = rfm_segments(base)
    got = {
        (r["r_score"], r["f_score"], r["m_score"]): (r["n_users"], r["segment_cents"])
        for r in out.collect()
    }
    want = {
        (r["r_score"], r["f_score"], r["m_score"]): (r["n_users"], r["segment_cents"])
        for r in exp.collect()
    }
    assert got == want and got


def test_event_uda_guards(msql):
    """Buckets without the required event columns fail LOUD (the
    tickrule volume-guard treatment), and funnel requires a step
    list."""
    with pytest.raises(ValueError, match="step list"):
        msql.sql("SELECT funnel() FROM `EV1/1Min/TICK`")


def test_session_window_uda_matches_sessionize(msql_events):
    """session_window(gap) — the native F.session_window form of 21g —
    through the MarketSQL registry: per-(user, session) boundaries and
    counts equal the batch sessionize operator's session summary (the
    two gap contracts agree at every integer-µs gap)."""
    from marketstore_spark.operators.sessionize import sessionize

    out = msql_events.sql("SELECT session_window(900) FROM `EVALL/1Min/EVENT`")
    assert set(out.columns) == {
        "user_id", "n_events", "session_start", "session_end"
    }
    base = msql_events.catalog.read("EVALL/1Min/EVENT")
    exp = sessionize(base, gap_seconds=900)  # already session-grain
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["session_end"])
        for r in out.collect()
    }
    want = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["session_end"])
        for r in exp.collect()
    }
    assert got == want and got
