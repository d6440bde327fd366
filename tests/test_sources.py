"""Sources & DDL coverage: CSV import, range delete, SQL INSERT INTO
(sqlparser/insertintostatement.go surface)."""

import os

from pyspark.sql import functions as F

from marketstore_spark.catalog import Catalog, load_table
from marketstore_spark.sources.csv import import_csv_to_bucket


def test_csv_import_roundtrip(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").limit(200)
    csv_dir = os.path.join(str(tmp_path), "in_csv")
    ev.withColumn("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")).write.option(
        "header", "true"
    ).csv(csv_dir)

    cat = Catalog(spark, os.path.join(str(tmp_path), "root"))
    n = import_csv_to_bucket(
        spark, csv_dir, cat, "CSV/1Min/TICK",
        schema="event_id long, ts string, user_id long, event_type string, value double, props string",
        ts_format="yyyy-MM-dd HH:mm:ss.SSSSSS",
    )
    assert n == 200
    got = cat.read("CSV/1Min/TICK")
    assert got.count() == 200
    assert dict(got.dtypes)["ts"] == "timestamp"


def test_delete_range(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    cat = Catalog(spark, os.path.join(str(tmp_path), "root"))
    cat.write("DEL/1Min/TICK", ev)
    lo, hi = "2024-01-10 00:00:00", "2024-01-20 00:00:00"
    in_range = ev.filter((F.col("ts") >= lo) & (F.col("ts") <= hi)).count()
    removed = cat.delete_range("DEL/1Min/TICK", lo, hi)
    assert removed == in_range
    left = cat.read("DEL/1Min/TICK")
    assert left.count() == ev.count() - in_range
    assert left.filter((F.col("ts") >= lo) & (F.col("ts") <= hi)).count() == 0


def test_sql_insert_into(spark, sf_dir, tmp_path):
    """INSERT INTO via Spark SQL on a parquet-backed table."""
    ev = load_table(spark, sf_dir, "events")
    loc = os.path.join(str(tmp_path), "tbl")
    ev.limit(0).write.parquet(loc)
    spark.sql(f"CREATE OR REPLACE TEMP VIEW ins_src AS SELECT * FROM parquet.`{loc}`")
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS ins_events USING parquet LOCATION '{loc}'"
    )
    ev.limit(50).createOrReplaceTempView("ins_batch")
    spark.sql("INSERT INTO ins_events SELECT * FROM ins_batch")
    assert spark.sql("SELECT COUNT(*) c FROM ins_events").first()["c"] == 50
    spark.sql("INSERT INTO ins_events SELECT * FROM ins_batch")
    assert spark.sql("SELECT COUNT(*) c FROM ins_events").first()["c"] == 100
    spark.sql("DROP TABLE ins_events")


def test_compact_bucket(spark, sf_dir, tmp_path):
    """Append-heavy bucket: many small files → one compaction pass."""
    ev = load_table(spark, sf_dir, "events").limit(2000)
    cat = Catalog(spark, os.path.join(str(tmp_path), "root"))
    for i in range(5):  # five append commits → ≥5 files
        cat.write("CMP/1Min/TICK", ev.limit(400))
    stats = cat.compact("CMP/1Min/TICK")
    assert stats["files_before"] >= 5
    assert stats["files_after"] < stats["files_before"]
    assert stats["rows"] == cat.read("CMP/1Min/TICK").count() == 2000


def test_salted_agg_matches_plain(spark, sf_dir):
    from pyspark.sql import functions as F2
    from marketstore_spark.functions.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    got = salted_agg(
        ev, ["user_id"],
        {"s": F2.sum("value"), "n": F2.count(F2.lit(1)), "mx": F2.max("value")},
        {"avg_value": F2.round(F2.sum("s") / F2.sum("n"), 9),
         "n_rows": F2.sum("n"), "max_value": F2.max("mx")},
    )
    exp = ev.groupBy("user_id").agg(
        F2.round(F2.avg("value"), 9).alias("avg_value"),
        F2.count(F2.lit(1)).alias("n_rows"),
        F2.max("value").alias("max_value"),
    )
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_json_import_roundtrip(spark, sf_dir, tmp_path):
    from marketstore_spark.sources.json import import_json_to_bucket

    ev = load_table(spark, sf_dir, "events").limit(150)
    jdir = os.path.join(str(tmp_path), "in_json")
    ev.withColumn("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")).write.json(jdir)

    cat = Catalog(spark, os.path.join(str(tmp_path), "root"))
    n = import_json_to_bucket(
        spark, jdir, cat, "JSN/1Min/TICK",
        schema="event_id long, ts string, user_id long, event_type string, value double, props string",
        ts_format="yyyy-MM-dd HH:mm:ss.SSSSSS",
    )
    assert n == 150
    got = cat.read("JSN/1Min/TICK")
    assert got.count() == 150
    assert dict(got.dtypes)["ts"] == "timestamp"
    assert got.agg(F.sum("event_id")).first()[0] == ev.agg(F.sum("event_id")).first()[0]


def test_corpus_store_partition_pruning(spark, sf_dir, tmp_path):
    """(lang, tier)-partitioned corpus: a language filter must prune to
    that language's directories before any file opens, and the rows
    must round-trip."""
    from marketstore_spark.sources.corpus import read_corpus_store, write_corpus_store
    from marketstore_spark.sources.parquet import explain_str

    docs = load_table(spark, sf_dir, "documents")
    root = os.path.join(str(tmp_path), "corpus")
    write_corpus_store(docs, root)

    store = read_corpus_store(spark, root)
    assert store.count() == docs.count()

    en = store.filter(F.col("lang") == "en")
    plan = explain_str(en)
    assert "PartitionFilters: [" in plan and "lang" in plan.split("PartitionFilters")[1][:200]
    langs = {r["lang"] for r in en.select("lang").distinct().collect()}
    assert langs <= {"en"}


def test_ca_announcement_ingest_and_adjust(spark, tmp_path):
    """Announcement-file ingest (contrib/ice analogue): parse, land in
    a CA bucket, and drive the adjuster off the loaded table."""
    import datetime as dt
    import os

    from pyspark.sql import functions as F

    from marketstore_spark.catalog import Catalog
    from marketstore_spark.operators.ca import (
        adjust_with_actions,
        ingest_announcements,
        parse_announcements,
        rate_changes,
    )

    f = tmp_path / "reorg.20240110"
    f.write_text(
        "H0|processdate|2024-01-10\n"
        "# comment line\n"
        "SPLIT|AAPL|2024-01-10|0.5\n"
        "DIVIDEND|AAPL|2024-01-20|0.98\n"
        "REVERSE_SPLIT|MSFT|2024-01-15|2.0\n"
        "BOGUS|ZZZ|2024-01-15|1.0\n"
        "\n"
    )
    ca = parse_announcements(spark, str(f))
    rows = {(r["type"], r["symbol"]) for r in ca.collect()}
    assert rows == {("split", "AAPL"), ("dividend", "AAPL"), ("reverse_split", "MSFT")}

    cat = Catalog(spark, os.path.join(str(tmp_path), "root"))
    assert ingest_announcements(cat, str(f)) == 3
    loaded = cat.read("CA/EVENT/ACTIONS")
    assert loaded.count() == 3
    assert rate_changes(loaded, include_dividends=False).count() == 2

    prices = spark.createDataFrame(
        [
            ("AAPL", dt.datetime(2024, 1, 5), 100.0),   # before both AAPL CAs
            ("AAPL", dt.datetime(2024, 1, 15), 100.0),  # between split and dividend
            ("AAPL", dt.datetime(2024, 1, 25), 100.0),  # after both
            ("MSFT", dt.datetime(2024, 1, 10), 50.0),   # before reverse split
        ],
        "user_id string, ts timestamp, value double",
    )
    adj = {
        (r["user_id"], r["ts"].day): r["adjusted"]
        for r in adjust_with_actions(prices, loaded).collect()
    }
    assert adj[("AAPL", 5)] == round(100.0 * 0.5 * 0.98, 4)
    assert adj[("AAPL", 15)] == round(100.0 * 0.98, 4)
    assert adj[("AAPL", 25)] == 100.0
    assert adj[("MSFT", 10)] == 100.0  # 50 × 2.0 reverse split


def _mk_warc(records):
    """Build WARC/1.0 bytes from (type, uri, payload) triples."""
    out = bytearray()
    for i, (wtype, uri, payload) in enumerate(records):
        hdr = (
            f"WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n"
            f"WARC-Date: 2024-01-01T00:00:0{i}Z\r\n"
            + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
            + f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        out += hdr + payload + b"\r\n\r\n"
    return bytes(out)


def test_warc_ingestion_plain_and_gzip(spark, tmp_path):
    """WARC archives (Common Crawl shape) parse into the record table
    and map onto the documents schema; gz archives decode per-file."""
    import gzip as _gzip

    from marketstore_spark.sources.warc import read_warc, warc_to_documents

    http_ok = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        b"<html>hello corpus</html>"
    )
    http_404 = b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\ngone"
    warc = _mk_warc(
        [
            ("warcinfo", "", b"software: test\r\n"),
            ("request", "http://a.example/", b"GET / HTTP/1.1\r\n\r\n"),
            ("response", "http://a.example/", http_ok),
            ("response", "http://b.example/", http_404),
        ]
    )
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "part-0.warc").write_bytes(warc)
    (d / "part-1.warc.gz").write_bytes(_gzip.compress(warc))

    recs = read_warc(spark, str(d) + "/*").collect()
    # responses only (default pruning), from BOTH archives
    assert len(recs) == 4 and all(r["warc_type"] == "response" for r in recs)
    ok = [r for r in recs if r["http_status"] == 200]
    assert len(ok) == 2 and ok[0]["body"] == bytearray(b"<html>hello corpus</html>")
    assert ok[0]["http_content_type"].startswith("text/html")

    docs = warc_to_documents(read_warc(spark, str(d) + "/*")).collect()
    assert len(docs) == 2  # one 200 per archive
    assert all(doc["text"] == "<html>hello corpus</html>" for doc in docs)
    assert len({doc["doc_id"] for doc in docs}) == 1  # same record id hashes equal

    # keep-all mode sees every record type
    allrecs = read_warc(spark, str(d / "part-0.warc"), warc_types=None).collect()
    assert sorted({r["warc_type"] for r in allrecs}) == ["request", "response", "warcinfo"]


def test_warc_corrupt_archive_degrades_not_fails(spark, tmp_path):
    """One corrupt archive costs its own tail, never the job: records
    before the corruption survive, other archives are untouched, and a
    truncated gzip member yields zero records instead of an error
    (corrupt payload is data, not a bug)."""
    import gzip as _gzip

    from marketstore_spark.sources.warc import read_warc

    http_ok = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nbody-%d"
    good2 = _mk_warc(
        [("response", "http://a.example/1", http_ok % 1),
         ("response", "http://a.example/2", http_ok % 2)]
    )
    # good record, then a garbled version line -> desync: tail is lost
    corrupt = good2 + b"NOT-A-WARC-RECORD\r\njunk\r\n\r\n" + _mk_warc(
        [("response", "http://a.example/3", http_ok % 3)]
    )
    # a record whose Content-Length isn't an int dies mid-header
    bad_len = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:x>\r\n"
        b"Content-Length: NaN\r\n\r\npayload\r\n\r\n"
    )
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "a-good.warc").write_bytes(good2)
    (d / "b-corrupt.warc").write_bytes(corrupt)
    (d / "c-badlen.warc").write_bytes(bad_len)
    (d / "d-truncated.warc.gz").write_bytes(_gzip.compress(good2)[:20])

    recs = read_warc(spark, str(d) + "/*").collect()
    by_file = {}
    for r in recs:
        by_file.setdefault(r["source_file"].rsplit("/", 1)[-1], []).append(r)
    assert len(by_file.get("a-good.warc", [])) == 2  # untouched archive intact
    assert len(by_file.get("b-corrupt.warc", [])) == 2  # pre-corruption records kept
    assert "c-badlen.warc" not in by_file  # malformed header: no records, no error
    assert "d-truncated.warc.gz" not in by_file  # torn gzip: skipped, no error


def test_table_cache_evicts_stopped_and_collected_sessions(spark, sf_dir):
    """The per-session reader cache must not grow without bound across
    sessions in one process (ADVICE r12): entries whose session is
    STOPPED (SparkContext._jsc is None) or garbage-collected are swept
    on the next access, while the live session keeps its cache hit."""
    import weakref

    from marketstore_spark import catalog

    class _SC:
        def __init__(self, jsc):
            self._jsc = jsc

    class _Fake:
        def __init__(self, alive=True):
            self._sc = _SC(object() if alive else None)

    live, dead = _Fake(True), _Fake(False)
    catalog._TABLE_CACHE[id(live)] = (weakref.ref(live), {"k": "v"})
    catalog._TABLE_CACHE[id(dead)] = (weakref.ref(dead), {"k": "v"})
    df = load_table(spark, sf_dir, "region")
    try:
        assert id(dead) not in catalog._TABLE_CACHE, "stopped session not swept"
        assert id(live) in catalog._TABLE_CACHE, "live session wrongly swept"
        # real-session cache hit: the SAME DataFrame object comes back
        assert load_table(spark, sf_dir, "region") is df
        # a collected session's entry is dropped too (dead weakref)
        gone = _Fake(True)
        catalog._TABLE_CACHE[id(gone)] = (weakref.ref(gone), {})
        gid = id(gone)
        del gone
        load_table(spark, sf_dir, "region")
        assert gid not in catalog._TABLE_CACHE, "collected session not swept"
    finally:
        catalog._TABLE_CACHE.pop(id(live), None)
