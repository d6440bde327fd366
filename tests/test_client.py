"""pymarketstore-shaped client facade: Params/Client/QueryReply
(reference client surface over frontend/query.go + write.go)."""

import os

import pytest
from pyspark.sql import functions as F

from marketstore_spark.catalog import Catalog, load_table
from marketstore_spark.client import Client, Params


@pytest.fixture(scope="module")
def cli(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cliroot"))
    cat = Catalog(spark, root)
    ev = load_table(spark, sf_dir, "events")
    for sym in (1, 2):
        cat.write(f"SYM{sym}/1Min/TICK", ev.filter(F.col("user_id") == sym))
    return Client(cat)


def test_query_range_limit_tail(cli):
    p = Params("SYM1", "1Min", "TICK", start="2024-01-05", end="2024-01-20", limit=9)
    ds = cli.query(p).first()
    pdf = ds.df()
    assert len(pdf) == 9
    # tail semantics: the 9 LAST rows of the range, ascending
    full = cli.catalog.read("SYM1/1Min/TICK").filter(
        (F.col("ts") >= "2024-01-05") & (F.col("ts") <= "2024-01-20")
    )
    last9 = [r["event_id"] for r in full.orderBy(F.col("ts").desc()).limit(9).collect()]
    assert sorted(pdf["event_id"]) == sorted(last9)
    assert pdf["ts"].is_monotonic_increasing


def test_query_head_and_columns(cli):
    p = Params(
        "SYM1", "1Min", "TICK", limit=5, limit_from_start=True,
        columns=["ts", "value"],
    )
    pdf = cli.query(p).first().df()
    assert list(pdf.columns) == ["ts", "value"] and len(pdf) == 5


def test_multi_symbol_reply(cli):
    p = Params(["SYM1", "SYM2"], "1Min", "TICK", limit=3)
    reply = cli.query(p)
    assert reply.keys() == ["SYM1/1Min/TICK", "SYM2/1Min/TICK"]
    assert all(len(d.df()) == 3 for d in reply.all().values())


def test_function_chain_tickcandler(cli):
    p = Params("SYM1", "1Min", "TICK", functions=["tickcandler('1H',value)"])
    pdf = cli.query(p).first().df()
    assert {"open", "high", "low", "close", "epoch"} <= set(pdf.columns)
    assert len(pdf) > 0


def test_write_and_list_and_destroy(cli, spark):
    src = cli.query(Params("SYM1", "1Min", "TICK", limit=20)).first().df()
    cli.write(src, "NEW/1Min/TICK")
    assert "NEW" in cli.list_symbols()
    assert len(cli.query(Params("NEW", "1Min", "TICK")).first().df()) == 20
    cli.destroy("NEW/1Min/TICK")
    assert "NEW/1Min/TICK" not in cli.catalog.list_buckets()


def test_sql_via_client(cli):
    pdf = cli.sql("SELECT count(*) AS n FROM `SYM1/1Min/TICK`").toPandas()
    assert pdf["n"][0] == cli.catalog.read("SYM1/1Min/TICK").count()


def test_numpy_arrays_output(cli):
    """The reference's npy response format: name→ndarray per column
    with value fidelity vs the pandas path."""
    import numpy as np

    ds = cli.query(Params("SYM1", "1Min", "TICK", limit=25)).first()
    arrs = ds.arrays()
    pdf = ds.df()
    assert set(arrs) == set(pdf.columns)
    for c, a in arrs.items():
        assert isinstance(a, np.ndarray) and len(a) == len(pdf)
    assert np.array_equal(arrs["value"], pdf["value"].to_numpy())


def test_list_symbols_formats_and_hadoop_fs_listing(spark, sf_dir, tmp_path):
    """ListSymbols format=symbol|tbk over a real bucket root, listed
    via the Hadoop FS API (object-store-safe), plus category gathering
    and multi-symbol TimeBucketKey expansion."""
    import os

    from marketstore_spark.catalog import Catalog, TimeBucketKey, load_table

    ev = load_table(spark, sf_dir, "events").limit(100)
    cat = Catalog(spark, os.path.join(str(tmp_path), "root"))
    cat.write("TSLA/1Min/TICK", ev)
    cat.write("TSLA/1H/OHLCV", ev)
    cat.write("AAPL/1Min/TICK", ev)

    assert cat.list_symbols() == ["AAPL", "TSLA"]
    assert cat.list_symbols(format="tbk") == [
        "AAPL/1Min/TICK",
        "TSLA/1H/OHLCV",
        "TSLA/1Min/TICK",
    ]
    with pytest.raises(ValueError):
        cat.list_symbols(format="nope")

    cats = cat.gather_categories_and_items()
    assert cats["Symbol"] == {"AAPL", "TSLA"}
    assert cats["Timeframe"] == {"1Min", "1H"}
    assert cats["AttributeGroup"] == {"TICK", "OHLCV"}

    # client pass-through
    client = Client(cat)
    assert client.list_symbols(format="tbk") == cat.list_buckets()

    # multi-symbol destination (frontend/query.go:148)
    tbk = TimeBucketKey("TSLA,AAPL/1Min/TICK")
    assert tbk.symbols == ["TSLA", "AAPL"]
    with pytest.raises(ValueError):
        tbk.path(str(tmp_path))
    # custom key category reorders the slots
    k2 = TimeBucketKey("1Min/TSLA/TICK", key_category="Timeframe/Symbol/AttributeGroup")
    assert (k2.symbol, k2.timeframe, k2.attribute_group) == ("TSLA", "1Min", "TICK")


def test_client_adjust_uda_reads_ca_bucket(spark, tmp_path):
    """The adjust() UDA in a client function chain pulls rate changes
    from the store's CA bucket (caloader analogue)."""
    import datetime as dt
    import os

    from marketstore_spark.catalog import Catalog
    from marketstore_spark.operators.ca import ingest_announcements

    cat = Catalog(spark, os.path.join(str(tmp_path), "root"))
    prices = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 5), "AAPL", 100.0),
            (2, dt.datetime(2024, 1, 15), "AAPL", 100.0),
        ],
        "event_id long, ts timestamp, symbol string, value double",
    )
    cat.write("AAPL/1Min/TICK", prices)
    f = tmp_path / "reorg"
    f.write_text("SPLIT|AAPL|2024-01-10|0.5\nDIVIDEND|AAPL|2024-01-20|0.9\n")
    ingest_announcements(cat, str(f))

    client = Client(cat)
    reply = client.query(
        Params("AAPL", "1Min", "TICK", functions=["adjust('split,dividend')"])
    )
    got = {r["ts"].day: r["adjusted"] for r in reply.first().dataframe().collect()}
    assert got[5] == round(100.0 * 0.5 * 0.9, 4)
    assert got[15] == round(100.0 * 0.9, 4)

    # split-only selection
    reply2 = client.query(Params("AAPL", "1Min", "TICK", functions=["adjust('split')"]))
    got2 = {r["ts"].day: r["adjusted"] for r in reply2.first().dataframe().collect()}
    assert got2[5] == 50.0 and got2[15] == 100.0


def test_function_chain_indicators(cli):
    # round-5 indicator UDAs ride the same chain as tickcandler
    p = Params("SYM1", "1Min", "TICK", functions=["ema(12)"])
    pdf = cli.query(p).first().df()
    assert "ema" in pdf.columns and pdf["ema"].notna().all()
    p = Params("SYM1", "1Min", "TICK", functions=["macd(12,26,9)"])
    pdf = cli.query(p).first().df()
    assert {"macd", "signal", "histogram"} <= set(pdf.columns)
    p = Params("SYM1", "1Min", "TICK", functions=["stochastic(5,3)"])
    pdf = cli.query(p).first().df()
    assert {"pct_k", "pct_d"} <= set(pdf.columns)
    p = Params("SYM1", "1Min", "TICK", functions=["twap('1D')"])
    pdf = cli.query(p).first().df()
    assert {"twap", "n_ticks"} <= set(pdf.columns) and len(pdf) > 0


def test_macd_partial_args_fall_back_to_defaults(cli):
    p = Params("SYM1", "1Min", "TICK", functions=["macd(10)"])
    pdf = cli.query(p).first().df()
    assert {"macd", "signal", "histogram"} <= set(pdf.columns)
