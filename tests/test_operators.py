"""Operator semantics tests — hand-built micro-inputs with known
answers, mirroring the reference's unit-test strategy
(contrib/candler/*/all_test.go, uda/*_test.go, executor/sort_test.go).
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from marketstore_spark.operators.adjust import adjust
from marketstore_spark.operators.asof import asof_join
from marketstore_spark.operators.candler import tick_candles, timeframe_to_duration
from marketstore_spark.operators.slice import limit_records, time_range


def _ts(*args):
    return datetime(*args)


@pytest.fixture()
def ticks(spark):
    rows = [
        # symbol, ts, tick id, price
        (1, _ts(2024, 1, 1, 9, 30, 0), 1, 100.0),
        (1, _ts(2024, 1, 1, 9, 30, 30), 2, 105.0),
        (1, _ts(2024, 1, 1, 9, 34, 59), 3, 95.0),   # same 5-min bucket
        (1, _ts(2024, 1, 1, 9, 35, 0), 4, 101.0),   # boundary → next bucket
        (2, _ts(2024, 1, 1, 9, 30, 0), 5, 50.0),
        (2, _ts(2024, 1, 1, 9, 30, 0), 6, 51.0),    # same ts → tie-break by id
    ]
    return spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])


def test_tick_candles_bucket_edges_and_ties(ticks):
    out = tick_candles(ticks, "5Min").orderBy("user_id", "epoch").collect()
    assert len(out) == 3
    b1 = out[0]  # sym1 09:30
    assert b1["epoch"] == _ts(2024, 1, 1, 9, 30)
    assert (b1["open"], b1["high"], b1["low"], b1["close"]) == (100.0, 105.0, 95.0, 95.0)
    b2 = out[1]  # sym1 09:35 — boundary tick starts the next bucket
    assert b2["epoch"] == _ts(2024, 1, 1, 9, 35)
    assert b2["open"] == b2["close"] == 101.0
    b3 = out[2]  # sym2: equal timestamps → open/close by event_id order
    assert (b3["open"], b3["close"]) == (50.0, 51.0)


def test_timeframe_rejects_unknown():
    with pytest.raises(ValueError):
        timeframe_to_duration("3Fortnights")
    assert timeframe_to_duration("7 minutes") == "7 minutes"


def test_time_range_inclusive(ticks):
    out = time_range(ticks, "ts", _ts(2024, 1, 1, 9, 30, 30), _ts(2024, 1, 1, 9, 35, 0))
    got = {r["event_id"] for r in out.collect()}
    assert got == {2, 3, 4}  # both endpoints inclusive (reference semantics)


def test_limit_records_direction_and_ties(ticks):
    tail = limit_records(ticks, 1, from_start=False)
    got = {(r["user_id"], r["event_id"]) for r in tail.collect()}
    assert got == {(1, 4), (2, 6)}  # last by (ts, event_id)
    head = limit_records(ticks, 1, from_start=True)
    got = {(r["user_id"], r["event_id"]) for r in head.collect()}
    assert got == {(1, 1), (2, 5)}


def test_asof_join_nonstrict_and_strict(spark):
    left = spark.createDataFrame(
        [(1, _ts(2024, 1, 1, 10, 0), 100), (1, _ts(2024, 1, 1, 12, 0), 101)],
        ["user_id", "ts", "order_id"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts(2024, 1, 1, 9, 0), 10.0),
            (1, _ts(2024, 1, 1, 10, 0), 20.0),   # exactly at left ts
            (1, _ts(2024, 1, 1, 11, 0), 30.0),
        ],
        ["user_id", "ts", "px"],
    )
    out = asof_join(left, right, on=["user_id"], left_ts="ts", right_ts="ts",
                    value_cols=["px"]).orderBy("order_id").collect()
    assert [r["px"] for r in out] == [20.0, 30.0]  # ts<=: same-instant visible
    out = asof_join(left, right, on=["user_id"], left_ts="ts", right_ts="ts",
                    value_cols=["px"], strict=True).orderBy("order_id").collect()
    assert [r["px"] for r in out] == [10.0, 30.0]  # strict <: same-instant hidden


def test_asof_join_no_prior_row_is_null(spark):
    left = spark.createDataFrame([(1, _ts(2024, 1, 1, 8, 0), 1)], ["user_id", "ts", "order_id"])
    right = spark.createDataFrame([(1, _ts(2024, 1, 1, 9, 0), 10.0)], ["user_id", "ts", "px"])
    out = asof_join(left, right, on=["user_id"], left_ts="ts", right_ts="ts",
                    value_cols=["px"]).collect()
    assert out[0]["px"] is None


def test_adjust_backward_ratio(spark):
    """A 2:1 split (ratio .5) at t2 halves prices strictly before t2;
    uda/adjust/adjust.go semantics incl. 4-decimal rounding."""
    prices = spark.createDataFrame(
        [
            (1, _ts(2024, 1, 1), 100.0),
            (1, _ts(2024, 1, 2), 110.0),
            (1, _ts(2024, 1, 3), 56.0),   # post-split price level
        ],
        ["user_id", "ts", "value"],
    )
    actions = spark.createDataFrame(
        [(1, _ts(2024, 1, 3), 0.5)], ["user_id", "ts", "ratio"]
    )
    out = {r["ts"]: r["adjusted"] for r in adjust(prices, actions).collect()}
    assert out[_ts(2024, 1, 1)] == pytest.approx(50.0, abs=1e-4)
    assert out[_ts(2024, 1, 2)] == pytest.approx(55.0, abs=1e-4)
    assert out[_ts(2024, 1, 3)] == pytest.approx(56.0, abs=1e-4)  # at CA ts: unadjusted


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    """ann_lsh must achieve non-trivial recall of the true top-5 on the
    test embeddings (approximate ≠ arbitrary)."""
    from marketstore_spark.catalog import load_table
    from marketstore_spark.operators.simsearch import brute_force_topk, lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(emb, q, k=5, num_planes=4).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.2, f"LSH recall too low: {recall:.2f}"


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """ann_ivf: probing 4 of 16 inverted lists must recover a solid
    share of the true top-5, and with nprobe == nlist (probe everything)
    the result must be EXACTLY brute force — the IVF invariant."""
    from marketstore_spark.catalog import load_table
    from marketstore_spark.operators.simsearch import brute_force_topk, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, q, k=5, nlist=16, nprobe=4).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.4, f"IVF recall too low: {recall:.2f}"

    full = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, q, k=5, nlist=8, nprobe=8).collect()
    }
    assert full == truth, "nprobe=nlist must equal brute force"


def test_ivf_centroids_deterministic(spark, sf_dir):
    """Same corpus → bit-identical centroids (no RNG anywhere)."""
    import numpy as np

    from marketstore_spark.catalog import load_table
    from marketstore_spark.operators.simsearch import train_ivf_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    c1 = train_ivf_centroids(emb, nlist=8)
    c2 = train_ivf_centroids(emb.repartition(7), nlist=8)
    assert np.array_equal(c1, c2)


def test_ema_matches_references(spark, sf_dir):
    """Distributed EMA must equal a single-process replay of the exact
    recurrence bitwise (same float64 expression — this is also what
    the DuckDB recursive-CTE oracle evaluates), and stay within float
    noise of pandas' ewm kernel (which contracts/normalizes ~ulps
    differently)."""
    import numpy as np

    from marketstore_spark.catalog import load_table
    from marketstore_spark.operators.ewm import ema

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    got = ema(ev, span=20).toPandas().sort_values(["user_id", "ts", "event_id"], ignore_index=True)
    ref = ev.toPandas().sort_values(["user_id", "ts", "event_id"], ignore_index=True)
    alpha = 2.0 / 21.0

    def replay(s):
        out, acc = [], None
        for x in s:
            acc = x if acc is None else alpha * x + (1.0 - alpha) * acc
            out.append(acc)
        return out

    ref["ema_exact"] = ref.groupby("user_id")["value"].transform(replay)
    assert (got["ema"] == ref["ema_exact"]).all()  # bitwise
    ref["ema_pandas"] = ref.groupby("user_id")["value"].transform(
        lambda s: s.ewm(alpha=alpha, adjust=False).mean()
    )
    assert np.allclose(got["ema"], ref["ema_pandas"], rtol=1e-12, atol=0)


def test_interval_join_matches_naive_and_avoids_nested_loop(spark, sf_dir):
    """Bucket-blocked range join == naive theta join, including
    intervals shorter/longer than the bucket and boundary timestamps;
    the physical plan must be an equi (hash) join, not a nested loop."""
    import datetime as dt

    from marketstore_spark.operators.rangejoin import interval_join

    t0 = dt.datetime(2024, 5, 1)
    pts = spark.createDataFrame(
        [(i, t0 + dt.timedelta(hours=i * 7)) for i in range(60)], "pid long, ts timestamp"
    )
    iv = spark.createDataFrame(
        [
            (1, t0 + dt.timedelta(hours=3), t0 + dt.timedelta(hours=9)),     # < bucket
            (2, t0 + dt.timedelta(days=2), t0 + dt.timedelta(days=5)),       # > bucket
            (3, t0, t0 + dt.timedelta(days=1)),                              # aligned
            (4, t0 + dt.timedelta(days=10), t0 + dt.timedelta(days=10)),     # empty
        ],
        "iid long, start timestamp, end timestamp",
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(pts, iv, bucket_seconds=86400).collect()
    }
    want = {
        (r["pid"], r["iid"])
        for r in pts.crossJoin(iv)
        .filter((F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end")))
        .collect()
    }
    assert got == want and len(got) > 0

    plan = interval_join(pts, iv, bucket_seconds=86400)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_approx_percentile_close_to_exact(spark, sf_dir):
    """The sketch path must stay within a tight rank-error band of the
    exact percentiles (it is the documented 100 TB substitute)."""
    from marketstore_spark.queries import SPARK_QUERIES

    import numpy as np

    from marketstore_spark.catalog import load_table

    approx = (
        SPARK_QUERIES["percentiles_approx"](spark, sf_dir).toPandas().set_index("user_id")
    )
    vals = load_table(spark, sf_dir, "events").select("user_id", "value").toPandas()
    # GK's guarantee is on RANK, not value (tail value gaps can be
    # wide): the returned element's rank must sit within ~n/accuracy
    # (+1 for boundary rounding) of the target rank
    for uid, g in vals.groupby("user_id"):
        v = np.sort(g["value"].to_numpy())
        n = len(v)
        for c, q in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
            got = approx.loc[uid, c]
            rank = np.searchsorted(v, got, side="left")
            assert abs(rank - q * n) <= n / 10000 + 1.0, (uid, c, rank, q * n)


def test_models_bars_roundtrip(spark, sf_dir):
    from marketstore_spark.catalog import load_table
    from marketstore_spark.models import bars_from_trades, trades_from_events

    ev = load_table(spark, sf_dir, "events")
    trades = trades_from_events(ev)
    assert set(trades.columns) == {"symbol", "epoch", "price", "size", "exchange", "cond"}
    bars = bars_from_trades(trades, "1H")
    assert set(bars.columns) == {"symbol", "epoch", "open", "high", "low", "close", "volume"}
    assert bars.count() > 0
    # high >= open/close >= low invariant
    bad = bars.filter(
        (F.col("high") < F.col("open")) | (F.col("high") < F.col("close"))
        | (F.col("low") > F.col("open")) | (F.col("low") > F.col("close"))
    ).count()
    assert bad == 0


def test_tz_anchored_daily_bars(spark):
    """1D buckets anchor to the market timezone's midnight
    (utils/timeframe + contrib/calendar): a tick at 01:00 UTC belongs
    to the PREVIOUS New York trading day."""
    import datetime as dt
    from marketstore_spark.operators.candler import tick_candles

    rows = [
        # 2024-06-10 01:00 UTC == 2024-06-09 21:00 America/New_York
        (1, dt.datetime(2024, 6, 10, 1, 0), 1, 10.0),
        # 2024-06-10 12:00 UTC == 2024-06-10 08:00 America/New_York
        (2, dt.datetime(2024, 6, 10, 12, 0), 1, 20.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    utc = tick_candles(df, "1D").collect()
    ny = tick_candles(df, "1D", tz="America/New_York").collect()
    assert len(utc) == 1  # same UTC day
    assert len(ny) == 2   # different NY days
    # NY daily epochs are NY midnights expressed in UTC (UTC-4 in June)
    assert sorted(r["epoch"].hour for r in ny) == [4, 4]


def test_embedding_lsh_dedup_precision_and_recall(spark, sf_dir):
    """Blocked embedding dedup: every found pair must be a true pair
    (exact verify => precision 1.0) with non-trivial recall."""
    from marketstore_spark.catalog import load_table
    from marketstore_spark.operators.dedup import (
        embedding_dup_pairs,
        embedding_dup_pairs_lsh,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs(emb, threshold=0.35).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs_lsh(emb, threshold=0.35).collect()
    }
    assert exact, "exact pair set must be non-empty at this threshold"
    assert got <= exact              # precision == 1.0
    assert len(got) / len(exact) >= 0.2  # recall floor for 4 planes × 6 tables


def test_calendar_timeframes_month_and_week_alignment(spark):
    """utils/timeframe.go semantics: 1Mo buckets truncate to the first
    of the month; 1W buckets start on Monday (Go's zero time), not on
    Spark's Thursday epoch origin."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 31, 23, 59), 1, 10.0),  # last tick of Jan
        (2, dt.datetime(2024, 2, 1, 0, 0), 1, 20.0),     # first tick of Feb
        (3, dt.datetime(2024, 2, 29, 12, 0), 1, 30.0),   # leap-day tick
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    from marketstore_spark.operators.candler import tick_candles

    mo = {r["epoch"]: (r["open"], r["close"]) for r in tick_candles(df, "1Mo").collect()}
    assert mo == {
        dt.datetime(2024, 1, 1): (10.0, 10.0),
        dt.datetime(2024, 2, 1): (20.0, 30.0),
    }

    # 2024-05-01 is a Wednesday; its week bucket must start Mon Apr 29
    wk = tick_candles(
        spark.createDataFrame(
            [(1, dt.datetime(2024, 5, 1, 12, 0), 1, 5.0)],
            "event_id long, ts timestamp, user_id long, value double",
        ),
        "1W",
    ).collect()
    assert wk[0]["epoch"] == dt.datetime(2024, 4, 29)


def test_asof_join_tolerance(spark):
    """merge_asof-style tolerance: matches older than the bound null
    out; in-bound matches are unchanged."""
    left = spark.createDataFrame(
        [(1, _ts(2024, 1, 1, 10, 0), 100), (1, _ts(2024, 1, 1, 12, 0), 101)],
        ["user_id", "ts", "order_id"],
    )
    right = spark.createDataFrame(
        [(1, _ts(2024, 1, 1, 9, 59), 10.0)], ["user_id", "ts", "px"]
    )
    out = asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        value_cols=["px"], tolerance_seconds=300,
    ).orderBy("order_id").collect()
    assert out[0]["px"] == 10.0      # 1 min old: within 5-min tolerance
    assert out[1]["px"] is None      # 2h old: stale


def test_connected_components_match_union_find(spark, sf_dir):
    """Label propagation must produce exactly the union-find components
    (component id = min doc id in the set) on the real pair graph."""
    from marketstore_spark.catalog import load_table
    from marketstore_spark.operators.dedup import connected_components, minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs).select("doc_a", "doc_b")
    edges = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    assert edges, "fixture corpus should contain near-dups"

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}

    got = {r["doc_id"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == want


def test_embedding_exact_dedup_guard_trips(spark):
    """The unblocked O(n²) embedding self-join must refuse to run above
    the row threshold unless explicitly opted in."""
    import pytest

    from marketstore_spark.operators.dedup import embedding_dup_pairs

    df = spark.range(0, 20).select(
        F.col("id").alias("vec_id"),
        F.array(F.col("id").cast("float"), F.lit(1.0).cast("float")).alias("embedding"),
    )
    with pytest.raises(ValueError, match="O\\(n²\\)|allow_quadratic"):
        embedding_dup_pairs(df, threshold=0.9, max_exact_rows=10)
    # opt-in and block_col paths still run
    assert embedding_dup_pairs(
        df, threshold=0.99, max_exact_rows=10, allow_quadratic=True
    ).count() >= 0
    blocked = df.withColumn("blk", F.col("vec_id") % 2)
    assert embedding_dup_pairs(
        blocked, threshold=0.99, max_exact_rows=10, block_col="blk"
    ).count() >= 0


def test_lsh_band_buckets_below_cap(spark, sf_dir):
    """minhash_lsh_pairs/simhash_pairs silently drop band buckets above
    max_bucket (10k) — the DuckDB oracles don't.  Parity is only sound
    while no bucket approaches the cap at test scale; pin that."""
    from marketstore_spark.catalog import load_table
    from marketstore_spark.operators.dedup import _minhash_cols, word_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = word_shingles(docs, 3, "text", "doc_id", distinct=False)
    per_doc = sh.groupBy("doc_id").agg(*_minhash_cols(32))
    rows = 32 // 8
    band_structs = [
        F.struct(
            F.lit(bi).alias("band_idx"),
            F.md5(
                F.concat_ws(",", *[F.col(f"mh{bi * rows + r}") for r in range(rows)])
            ).alias("band_key"),
        )
        for bi in range(8)
    ]
    banded = per_doc.select("doc_id", F.explode(F.array(*band_structs)).alias("b"))
    biggest = (
        banded.groupBy("b.band_idx", "b.band_key")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert biggest < 10_000, f"band bucket of {biggest} docs hits the cap — oracle diverges"


# ---------------------------------------------------------------------
# corpus hygiene: repetition / decontamination / sampling
# ---------------------------------------------------------------------


def test_repetition_stats_known_doc(spark):
    from marketstore_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),       # 4 words, 2 uniq; top=3; 2-grams: aa,aa,ab → 2 uniq of 3
            (2, "x y z"),          # no repetition at all
            (3, "solo"),           # 1 word → no 2-grams → NULL frac
            (4, "   "),            # blank → filtered out
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert set(rows) == {1, 2, 3}
    r1 = rows[1]
    assert r1["n_words"] == 4
    assert r1["dup_word_frac"] == 0.5
    assert r1["top_word_frac"] == 0.75
    assert r1["dup_2gram_frac"] == round(1 - 2 / 3, 6)
    r2 = rows[2]
    assert r2["dup_word_frac"] == 0.0 and r2["dup_2gram_frac"] == 0.0
    assert r2["top_word_frac"] == round(1 / 3, 6)
    assert rows[3]["dup_2gram_frac"] is None


def test_benchmark_overlap_counts_and_broadcast(spark):
    from marketstore_spark.operators.dedup import benchmark_overlap

    bench = spark.createDataFrame(
        [(100, "one two three four five"), (101, "alpha beta gamma delta epsilon")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            # shares 2 distinct 3-grams with bench doc 100
            (1, "zero one two three four six"),
            # shares nothing
            (2, "p q r s t u"),
            # shares the SAME 3-gram twice → counted once (distinct)
            (3, "alpha beta gamma x alpha beta gamma"),
        ],
        ["doc_id", "text"],
    )
    out = benchmark_overlap(corpus, bench, n=3)
    rows = {r["doc_id"]: r["n_overlap"] for r in out.collect()}
    assert rows == {1: 2, 3: 1}
    plan = out._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "BroadcastHashJoin" in plan  # bench side must broadcast


def test_hash_sample_deterministic_and_validated(spark):
    import pytest as _pytest

    from marketstore_spark.operators.sampling import hash_sample

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = sorted(r["doc_id"] for r in hash_sample(df).collect())
    b = sorted(r["doc_id"] for r in hash_sample(df).collect())
    assert a == b and 0 < len(a) < 2000
    # ~51/256 of 2000 ≈ 398; generous determinism-not-statistics bounds
    assert 250 < len(a) < 560
    # disjoint salts give a different (deterministic) subset
    c = sorted(r["doc_id"] for r in hash_sample(df, salt="other").collect())
    assert c != a
    with _pytest.raises(ValueError):
        hash_sample(df, rate_den=100)
    with _pytest.raises(ValueError):
        hash_sample(df, rate_num=300)


# ---------------------------------------------------------------------
# quant idioms: twap / pairwise_corr
# ---------------------------------------------------------------------


def test_twap_interval_weights_and_ties(spark):
    from marketstore_spark.operators.quant import twap

    rows = [
        # symbol 1, one day: price 100 for 6h, then 200 for the rest
        (1, _ts(2024, 1, 1, 0, 0, 0), 1, 100.0),
        (1, _ts(2024, 1, 1, 6, 0, 0), 2, 200.0),
        # symbol 2: duplicate timestamp — the later event_id wins the
        # whole interval; the earlier one gets zero weight
        (2, _ts(2024, 1, 1, 0, 0, 0), 3, 50.0),
        (2, _ts(2024, 1, 1, 0, 0, 0), 4, 70.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = {r["symbol"]: r for r in twap(df, "1 day").collect()}
    # 100*(6/24) + 200*(18/24) = 175
    assert out[1]["twap"] == 175.0 and out[1]["n_ticks"] == 2
    assert out[2]["twap"] == 70.0 and out[2]["n_ticks"] == 2


def test_pairwise_corr_perfect_and_inverse(spark):
    from marketstore_spark.operators.quant import pairwise_corr

    rows = []
    eid = 0
    for d, (a, b, c) in enumerate([(1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0)]):
        for sym, px in ((1, a), (2, b), (3, c)):
            eid += 1
            rows.append((sym, _ts(2024, 1, 1 + d, 12, 0, 0), eid, px))
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = {(r["sym_a"], r["sym_b"]): r for r in pairwise_corr(df, "1 day").collect()}
    assert out[(1, 2)]["corr"] == 1.0      # y = 2x
    assert out[(1, 3)]["corr"] == -1.0     # perfectly inverse
    assert out[(2, 3)]["corr"] == -1.0
    assert all(r["n_obs"] == 3 for r in out.values())


def test_pairwise_corr_drops_constant_series(spark):
    from marketstore_spark.operators.quant import pairwise_corr

    rows = [
        (1, _ts(2024, 1, 1 + d, 0, 0, 0), d * 2 + 1, 5.0) for d in range(3)
    ] + [
        (2, _ts(2024, 1, 1 + d, 0, 0, 0), d * 2 + 2, float(d)) for d in range(3)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    assert pairwise_corr(df, "1 day").count() == 0  # zero variance on sym 1


def test_pairwise_corr_guards_runaway_bucket_count(spark):
    """A tick-grained timeframe would collect millions of buckets to
    the driver and hold dense block×buckets matrices per task — the
    guard must fail fast with a pointer at coarser timeframes, before
    any matrix work, and raising max_buckets must re-enable the call."""
    from marketstore_spark.operators.quant import pairwise_corr

    rows = [
        (sym, _ts(2024, 1, 1, 0, m, 0), m * 2 + sym, float(m + sym))
        for m in range(10)
        for sym in (1, 2)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    with pytest.raises(ValueError, match="coarser timeframe"):
        pairwise_corr(df, "1 minute", max_buckets=5)
    assert pairwise_corr(df, "1 minute", max_buckets=100).count() == 1


def test_obv_direction_signed_running_sum(spark):
    from marketstore_spark.operators.quant import obv

    rows = [
        # symbol, ts, id, price, volume
        (1, _ts(2024, 1, 1, 9, 30, 0), 1, 100.0, 10),
        (1, _ts(2024, 1, 1, 9, 31, 0), 2, 101.0, 5),   # up   → +5
        (1, _ts(2024, 1, 1, 9, 32, 0), 3, 99.0, 7),    # down → -7
        (1, _ts(2024, 1, 1, 9, 33, 0), 4, 99.0, 9),    # flat → +0
        (2, _ts(2024, 1, 1, 9, 30, 0), 5, 50.0, 3),    # first tick of sym2 → 0
        (2, _ts(2024, 1, 1, 9, 30, 0), 6, 51.0, 4),    # same ts: id order → up
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value", "volume"])
    got = {r["event_id"]: r["obv"] for r in obv(df).collect()}
    assert got == {1: 0, 2: 5, 3: -2, 4: -2, 5: 0, 6: 4}


def test_stochastic_k_warmup_flat_and_values(spark):
    from marketstore_spark.operators.quant import stochastic_k

    rows = [(1, _ts(2024, 1, 1, 9, 30, i), i, float(p), 0)
            for i, p in enumerate([10, 20, 15, 15])]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value", "volume"])
    out = {r["event_id"]: (r["pct_k"], r["pct_d"]) for r in
           stochastic_k(df, n=3, d_periods=2).collect()}
    # warm-up (fewer than n ticks) → NULL
    assert out[0] == (None, None)
    assert out[1] == (None, None)
    # window [10,20,15]: (15-10)/(20-10)*100 = 50
    assert out[2][0] == 50.0
    # window [20,15,15]: (15-15)/(20-15) = 0
    assert out[3][0] == 0.0
    assert out[3][1] == 25.0  # (0 + 50) / 2
    # flat window → NULL (max == min)
    flat = spark.createDataFrame(
        [(1, _ts(2024, 1, 1, 9, 30, i), i, 5.0, 0) for i in range(3)],
        ["user_id", "ts", "event_id", "value", "volume"],
    )
    assert all(r["pct_k"] is None for r in stochastic_k(flat, n=3).collect())


def test_span_dedup_groups_window_edges(spark):
    from marketstore_spark.operators.dedup import span_dedup_groups

    shared = "a b c d e"                       # one full 5-word span
    rows = [
        (1, shared + " tail1 x"),              # trailing partial dropped
        (2, shared),                           # exact span again
        (3, "one two three"),                  # shorter than span → no spans
        (4, "p q r s t " + shared),            # 10 words = two aligned windows;
                                               # the second, [a..e], IS the
                                               # shared span → doc 4 is found.
                                               # (Alignment matters: a 1-word
                                               # prefix would hide it.)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = span_dedup_groups(df, span_words=5, min_docs=2).collect()
    assert len(out) == 1
    g = out[0]
    assert g["n_docs"] == 3 and g["n_occurrences"] == 3 and g["first_doc_id"] == 1


def test_scrub_pii_masks_and_counts(spark):
    from marketstore_spark.operators.text import scrub_pii

    rows = [
        (1, "mail me at alice.smith+x@example.co.uk or call 415-555-1234."),
        (2, "server at 10.0.255.7 responded; versions 1.2.3.4.5 stay."),
        (3, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert "|||EMAIL|||" in out[1]["text"] and "|||PHONE|||" in out[1]["text"]
    assert "alice" not in out[1]["text"] and "555" not in out[1]["text"]
    assert out[2]["n_ipv4"] == 1 and "|||IPV4|||" in out[2]["text"]
    # 1.2.3.4.5 is not an IPv4 (digit lookarounds) — unchanged
    assert "1.2.3.4.5" in out[2]["text"]
    assert out[3]["text"] == "no pii here at all"
    assert (out[3]["n_email"], out[3]["n_phone"], out[3]["n_ipv4"]) == (0, 0, 0)


def test_macd_matches_ema_composition_and_pandas(spark):
    import numpy as np
    import pandas as pd
    from marketstore_spark.operators.ewm import ema, macd

    rows = [(1, _ts(2024, 1, 1, 9, 30, i), i, float(100 + ((i * 37) % 11) - 5))
            for i in range(60)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = macd(df).orderBy("event_id").toPandas()
    # histogram ≡ macd − signal, bitwise
    assert (out["histogram"] == out["macd"] - out["signal"]).all()
    # macd line ≡ ema(fast) − ema(slow) from the standalone operator
    e12 = ema(df, span=12, out_col="e").orderBy("event_id").toPandas()["e"]
    e26 = ema(df, span=26, out_col="e").orderBy("event_id").toPandas()["e"]
    assert (out["macd"].to_numpy() == (e12 - e26).to_numpy()).all()
    # semantics vs pandas' C kernel (ulp-level differences allowed)
    s = pd.Series([r[3] for r in rows])
    ref = s.ewm(span=12, adjust=False).mean() - s.ewm(span=26, adjust=False).mean()
    assert np.allclose(out["macd"], ref, rtol=1e-12, atol=1e-12)
    refsig = ref.ewm(span=9, adjust=False).mean()
    assert np.allclose(out["signal"], refsig, rtol=1e-12, atol=1e-12)


def test_gapfill_interp_linear_values_and_calendar_guard(spark):
    from marketstore_spark.operators.gapfill import gapfill_interp

    rows = [
        (1, _ts(2024, 1, 1, 0, 15), 1, 10.0),
        (1, _ts(2024, 1, 1, 3, 45), 2, 40.0),   # 3-bucket gap: 00,01,02,03
        (2, _ts(2024, 1, 1, 5, 0), 3, 7.0),     # lone bucket, no fan-out
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = {(r["user_id"], r["epoch"].hour): (r["value"], r["filled"])
           for r in gapfill_interp(df, "1H").collect()}
    assert out[(1, 0)] == (10.0, 0)
    assert out[(1, 1)] == (20.0, 1)   # 10 + (40-10)*1/3
    assert out[(1, 2)] == (30.0, 1)
    assert out[(1, 3)] == (40.0, 0)
    assert out[(2, 5)] == (7.0, 0)
    assert len(out) == 5
    # calendar timeframes have no fixed step: rejected at either layer
    with pytest.raises(ValueError):
        gapfill_interp(df, "1Mo")
    with pytest.raises(ValueError, match="calendar-variable"):
        gapfill_interp(df, "1 month")


def test_pack_documents_next_fit_and_oversized(spark):
    from marketstore_spark.operators.sampling import pack_documents

    rows = [
        ("en", 1, "a b c"),                    # 3 tokens → pack 0 @ 0
        ("en", 2, "d e f g"),                  # 4 → pack 0 @ 3
        ("en", 3, "h i j k l"),                # 5 > remaining 3 → pack 1 @ 0
        ("en", 4, " ".join(["x"] * 20)),       # oversized → own pack 2
        ("en", 5, "m n"),                      # after oversized → pack 3
        ("de", 6, "p q r s t u v w x y"),      # other shard packs from 0
    ]
    df = spark.createDataFrame(rows, ["lang", "doc_id", "text"])
    out = {r["doc_id"]: (r["pack_id"], r["pack_offset"], r["n_tokens"])
           for r in pack_documents(df, capacity=10).collect()}
    assert out[1] == (0, 0, 3)
    assert out[2] == (0, 3, 4)
    assert out[3] == (1, 0, 5)
    assert out[4] == (2, 0, 20)
    assert out[5] == (3, 0, 2)
    assert out[6] == (0, 0, 10)


def test_scrub_pii_counts_match_masks(spark):
    """A phone-shaped local part inside an email must not inflate
    n_phone: counts run on the progressively-masked value, so every
    n_<class> equals the markers actually inserted."""
    from marketstore_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [(1, "reach me at 415.555.1234@example.com")], ["doc_id", "text"]
    )
    r = scrub_pii(df).collect()[0]
    assert r["n_email"] == 1 and r["text"].count("|||EMAIL|||") == 1
    assert r["n_phone"] == r["text"].count("|||PHONE|||") == 0
    assert r["n_ipv4"] == r["text"].count("|||IPV4|||") == 0


def test_pack_documents_integer_shard_key(spark):
    from marketstore_spark.operators.sampling import pack_documents

    df = spark.createDataFrame(
        [(7, 1, "a b c"), (7, 2, "d e")], ["bucket", "doc_id", "text"]
    )
    out = pack_documents(df, capacity=4, shard_col="bucket").collect()
    assert {r["shard"] for r in out} == {7}


def test_beta_vs_market_proportional_movers(spark):
    """Two symbols where B always moves twice A: market move = 3x, so
    beta_B = cov(2x,3x)/var(3x) = 2/3 and beta_A = 1/3 — the 2:1
    ratio is preserved under the against-the-sum definition."""
    from datetime import timedelta
    from marketstore_spark.operators.quant import beta_vs_market

    rows = []
    base = _ts(2024, 1, 1, 12, 0)
    moves = [3, -2, 5, -1, 4]  # dollars, varying so var > 0
    pa, pb = 100, 200
    rows.append((1, base, 1, float(pa)))
    rows.append((2, base, 2, float(pb)))
    for i, m in enumerate(moves, start=1):
        pa += m
        pb += 2 * m
        rows.append((1, base + timedelta(days=i), 10 + i, float(pa)))
        rows.append((2, base + timedelta(days=i), 20 + i, float(pb)))
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = {r["symbol"]: r for r in beta_vs_market(df, "1 day").collect()}
    assert out[1]["n_obs"] == 5 and out[2]["n_obs"] == 5
    assert out[1]["beta"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[2]["beta"] == pytest.approx(2 / 3, abs=1e-6)


def test_realized_vol_known_window(spark):
    from datetime import timedelta
    import math
    from marketstore_spark.operators.quant import realized_vol

    # moves (cents): 100, -200, 300 → sample std over the 3-move window
    prices = [10.0, 11.0, 9.0, 12.0]
    base = _ts(2024, 1, 1, 12, 0)
    rows = [(1, base + timedelta(days=i), i, p) for i, p in enumerate(prices)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = {r["epoch"].day: r for r in realized_vol(df, window_buckets=3).collect()}
    assert out[2]["realized_vol"] is None  # warm-up
    assert out[3]["realized_vol"] is None
    moves = [100, -200, 300]
    mean = sum(moves) / 3
    want = math.sqrt(sum((m - mean) ** 2 for m in moves) / 2)
    assert out[4]["realized_vol"] == pytest.approx(want, abs=1e-6)


def test_cms_overestimates_and_converges_when_wide(spark):
    """Count-Min property: estimate >= true count always; with width
    large enough that no collisions occur the estimates are EXACT."""
    from collections import Counter
    from marketstore_spark.operators.sketch import cms_heavy_hitters

    docs = [
        (1, "a a a b b c"),
        (2, "a b d d d d"),
        (3, "c c e"),
    ]
    truth = Counter(" ".join(t for _, t in docs).split())
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    # narrow sketch: collisions likely → overestimates allowed, never under
    narrow = {r["term"]: r["est_count"]
              for r in cms_heavy_hitters(df, width=2, depth=2, top_k=10).collect()}
    assert set(narrow) == set(truth)
    for t, c in truth.items():
        assert narrow[t] >= c
    # wide sketch: 5 terms in 4096 slots × 4 rows → exact with near-certainty
    wide = {r["term"]: r["est_count"]
            for r in cms_heavy_hitters(df, width=4096, depth=4, top_k=10).collect()}
    assert wide == dict(truth)


def test_hll_distinct_within_rsd_of_exact(spark, sf_dir):
    """approx_count_distinct(rsd=0.02) must land within a conservative
    3x-rsd band of the exact per-group cardinality on the test data."""
    from marketstore_spark.queries import SPARK_QUERIES

    exact = {r["event_type"]: r["n_users"]
             for r in SPARK_QUERIES["distinct_users"](spark, sf_dir).collect()}
    approx = {r["event_type"]: r["n_users_approx"]
              for r in SPARK_QUERIES["distinct_users_approx"](spark, sf_dir).collect()}
    assert set(exact) == set(approx) and len(exact) > 0
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.06 * n), (k, n, approx[k])


def test_adjust_no_actions_key_and_fallback_path(spark):
    """Keys absent from the CA table pass through with factor 1 (the
    broadcast join is left-outer), and a ratio set larger than
    exact_ratio_limit falls back to the log-sum path with the same
    strictly-before semantics."""
    prices = spark.createDataFrame(
        [(1, _ts(2024, 1, 1), 100.0), (2, _ts(2024, 1, 1), 40.0)],
        ["user_id", "ts", "value"],
    )
    actions = spark.createDataFrame(
        [(1, _ts(2024, 1, 2), 0.5)], ["user_id", "ts", "ratio"]
    )
    out = {r["user_id"]: r["adjusted"] for r in adjust(prices, actions).collect()}
    assert out[1] == pytest.approx(50.0, abs=1e-4)
    assert out[2] == pytest.approx(40.0, abs=1e-4)  # no CA for key 2

    # fallback: force via exact_ratio_limit=0
    out2 = {
        r["user_id"]: r["adjusted"]
        for r in adjust(prices, actions, exact_ratio_limit=0).collect()
    }
    assert out2[1] == pytest.approx(50.0, abs=1e-4)
    assert out2[2] == pytest.approx(40.0, abs=1e-4)


# ---------------------------------------------------------------------
# Round-6 indicator family: ATR / Donchian / cross-sectional momentum
# ---------------------------------------------------------------------


@pytest.fixture()
def daily_ticks(spark):
    """Two symbols, four days; day 3 of symbol 1 gaps up so the true
    range is driven by |H - prev_C|, not H - L."""
    rows = [
        # sym, ts, id, price
        (1, _ts(2024, 1, 1, 10), 1, 10.00),
        (1, _ts(2024, 1, 1, 15), 2, 12.00),   # d1: H=12 L=10 C=12
        (1, _ts(2024, 1, 2, 10), 3, 11.00),
        (1, _ts(2024, 1, 2, 15), 4, 9.00),    # d2: H=11 L=9 C=9
        (1, _ts(2024, 1, 3, 10), 5, 20.00),
        (1, _ts(2024, 1, 3, 15), 6, 21.00),   # d3: gap up, H=21 L=20 C=21
        (1, _ts(2024, 1, 4, 10), 7, 21.00),   # d4: flat H=L=C=21
        (2, _ts(2024, 1, 1, 10), 8, 50.00),
        (2, _ts(2024, 1, 2, 10), 9, 55.00),
    ]
    return spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])


def test_atr_true_range_and_warmup(daily_ticks):
    from marketstore_spark.operators.quant import atr

    out = {
        (r["symbol"], r["epoch"].day): r
        for r in atr(daily_ticks, n=3).collect()
    }
    # TR in cents: d1 first bucket = H-L = 200; d2 = max(200, |1100-1200|,
    # |900-1200|) = 300; d3 gap = max(100, |2100-900|, |2000-900|) = 1200;
    # d4 flat = max(0, 0, 0) = 0
    assert out[(1, 1)]["tr"] == 200
    assert out[(1, 2)]["tr"] == 300
    assert out[(1, 3)]["tr"] == 1200
    assert out[(1, 4)]["tr"] == 0
    # warm-up: n=3 → first two days NULL, d3 = (200+300+1200)/3
    assert out[(1, 1)]["atr"] is None and out[(1, 2)]["atr"] is None
    assert out[(1, 3)]["atr"] == round((200 + 300 + 1200) / 3, 6)
    assert out[(1, 4)]["atr"] == round((300 + 1200 + 0) / 3, 6)
    # symbol 2 never reaches 3 buckets
    assert out[(2, 1)]["atr"] is None and out[(2, 2)]["atr"] is None


def test_donchian_extrema_and_midline(daily_ticks):
    from marketstore_spark.operators.quant import donchian

    out = {
        (r["symbol"], r["epoch"].day): r
        for r in donchian(daily_ticks, n=2).collect()
    }
    assert out[(1, 1)]["upper_c"] is None  # warm-up
    d2 = out[(1, 2)]
    assert (d2["upper_c"], d2["lower_c"], d2["mid_c"]) == (1200, 900, 1050.0)
    d3 = out[(1, 3)]
    assert (d3["upper_c"], d3["lower_c"], d3["mid_c"]) == (2100, 900, 1500.0)


def test_xs_momentum_rank_and_ties(spark):
    from marketstore_spark.operators.quant import xs_momentum

    rows = []
    eid = 0
    # three symbols over three days; with lookback=1, day-2 moves are
    # +10% (sym1), +10% (sym2 — tie), -10% (sym3)
    for day, prices in [(1, (10.0, 20.0, 30.0)), (2, (11.0, 22.0, 27.0)),
                        (3, (11.0, 22.0, 27.0))]:
        for sym, px in enumerate(prices, start=1):
            eid += 1
            rows.append((sym, _ts(2024, 1, day, 12), eid, px))
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = xs_momentum(df, lookback=1)
    d2 = {r["symbol"]: r for r in out.filter(F.dayofmonth("epoch") == 2).collect()}
    assert d2[1]["xs_rank"] == 1 and d2[2]["xs_rank"] == 1  # tied +10%
    assert d2[3]["xs_rank"] == 3  # rank (not dense_rank) skips 2
    assert d2[1]["ret"] == 0.1 and d2[3]["ret"] == -0.1
    d3 = {r["symbol"]: r for r in out.filter(F.dayofmonth("epoch") == 3).collect()}
    assert all(r["mom_c"] == 0 for r in d3.values())


# ---------------------------------------------------------------------
# Round-6 corpus shaping: chunking, stratified sampling, unigram score
# ---------------------------------------------------------------------


def test_chunk_documents_windows_and_tail(spark):
    from marketstore_spark.operators.sampling import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x"), (3, "   ")], ["doc_id", "text"]
    )
    out = chunk_documents(docs, chunk_tokens=3, stride=2)
    got = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # doc 1: starts 0,2,4 → [a b c][c d e][e]
    assert got[(1, 0)]["chunk_text"] == "a b c"
    assert got[(1, 1)]["chunk_text"] == "c d e"
    assert got[(1, 2)]["chunk_text"] == "e"
    assert got[(1, 2)]["n_tokens"] == 1
    # doc 2: one short chunk; doc 3 (blank): none
    assert got[(2, 0)]["chunk_text"] == "x"
    assert len(got) == 4
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=3, stride=4)


def test_stratified_hash_sample_rates_and_determinism(spark):
    from marketstore_spark.operators.sampling import stratified_hash_sample

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh") for i in range(400)],
        ["doc_id", "lang"],
    )
    # full rate keeps every row of the stratum (the 'zz' sentinel: a
    # '100' threshold would sort BELOW 'ff' and drop most rows)
    full = stratified_hash_sample(docs, rates={"en": 256}, default_num=0)
    assert full.count() == 200
    assert full.filter(F.col("lang") == "zh").count() == 0
    # zero rate drops the stratum entirely
    none = stratified_hash_sample(docs, rates={"en": 0}, default_num=256)
    assert none.filter(F.col("lang") == "en").count() == 0
    assert none.filter(F.col("lang") == "zh").count() == 200
    # deterministic: same inputs → identical keep set
    a = sorted(
        r[0]
        for r in stratified_hash_sample(docs, rates={"en": 64}, default_num=32)
        .select("doc_id").collect()
    )
    b = sorted(
        r[0]
        for r in stratified_hash_sample(docs, rates={"en": 64}, default_num=32)
        .select("doc_id").collect()
    )
    assert a == b
    with pytest.raises(ValueError):
        stratified_hash_sample(docs, rates={"en": 300})


def test_doc_freq_score_hand_counts(spark):
    from marketstore_spark.operators.text import doc_freq_score

    docs = spark.createDataFrame(
        [(1, "the cat"), (2, "the the dog"), (3, "")],
        ["doc_id", "text"],
    )
    # corpus counts: the=3, cat=1, dog=1
    out = {r["doc_id"]: r for r in doc_freq_score(docs).collect()}
    assert out[1]["sum_freq"] == 4 and out[1]["n_tokens"] == 2
    assert out[1]["mean_term_freq"] == 2.0
    assert out[2]["sum_freq"] == 7 and out[2]["n_tokens"] == 3
    assert out[2]["mean_term_freq"] == 7 / 3
    assert 3 not in out  # empty docs yield no score


def test_spread_for_narrow_work_size_gate(spark):
    from marketstore_spark.functions.layout import spread_for_narrow_work

    # tiny input (an in-memory relation with known stats): both modes
    # skip — the shuffle can't pay for itself
    tiny = spark.range(10).selectExpr("id AS doc_id", "'x' AS text")
    assert spread_for_narrow_work(tiny, "doc_id").rdd.getNumPartitions() == \
        tiny.rdd.getNumPartitions()
    # a LocalRelation under ~64KB skips even in heavy mode
    assert spread_for_narrow_work(tiny, "doc_id", heavy=True) is tiny or \
        spread_for_narrow_work(tiny, "doc_id", heavy=True).rdd.getNumPartitions() == \
        tiny.rdd.getNumPartitions()
    # a heavy-mode input above the floor spreads to defaultParallelism
    big = spark.range(200_000).selectExpr(
        "id AS doc_id", "repeat('word ', 20) AS text"
    )
    spread = spread_for_narrow_work(big, "doc_id", heavy=True)
    assert spread.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_semantic_dedup_within_cluster_only(spark):
    from marketstore_spark.operators.dedup import semantic_dedup_pairs

    # two tight clusters on orthogonal axes + one outlier; seeds are
    # md5-sampled so we only assert STRUCTURAL properties (pairs stay
    # within a cluster; all near-identical same-axis pairs found)
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0]),
        (3, [0.98, 0.02, 0.0]),
        (10, [0.0, 1.0, 0.0]),
        (11, [0.0, 0.99, 0.01]),
        (20, [0.5, 0.5, 0.7]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = semantic_dedup_pairs(df, n_clusters=2, threshold=0.9)
    got = {(r["id_a"], r["id_b"]): r for r in out.collect()}
    # same-axis pairs have cosine ~0.9998 — must appear if their
    # members share a cluster; orthogonal pairs (1,10) must NOT
    assert (1, 10) not in got and (1, 11) not in got
    for (a, b), r in got.items():
        assert r["cosine"] >= 0.9
    # determinism: second run identical
    again = {(r["id_a"], r["id_b"]) for r in
             semantic_dedup_pairs(df, n_clusters=2, threshold=0.9).collect()}
    assert set(got) == again


def test_semantic_dedup_assignment_is_argmax(spark):
    """With every vector as its own seed (n_clusters >= n), each vector
    clusters to itself (cos(v,v)=1 beats all) — so no pairs survive
    unless two vectors are in the same direction and one seed wins
    both by the tie rule."""
    from marketstore_spark.operators.dedup import semantic_dedup_pairs

    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, -1.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = semantic_dedup_pairs(df, n_clusters=3, threshold=0.5).collect()
    assert out == []


def test_semantic_dedup_keep_drops_larger_ids(spark):
    from marketstore_spark.operators.dedup import (
        semantic_dedup_keep,
        semantic_dedup_pairs,
    )

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.001, 0.0]),
        (3, [0.998, 0.002, 0.0]),
        (10, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = semantic_dedup_pairs(df, n_clusters=2, threshold=0.99)
    kept = {r["vec_id"] for r in semantic_dedup_keep(df, n_clusters=2,
                                                     threshold=0.99).collect()}
    dropped = {r["id_b"] for r in pairs.collect()}
    assert kept == {1, 2, 3, 10} - dropped
    # every id_a smaller than its id_b by construction
    assert all(r["id_a"] < r["id_b"] for r in pairs.collect())


def test_corpus_pack_carries_state_across_arrow_batches(spark):
    """A shard spanning many Arrow batches must pack identically to the
    one-batch case — force 3-row batches over a 20-doc shard and
    compare to the recurrence computed directly."""
    from marketstore_spark.operators.sampling import pack_documents

    docs = [(i, "en", "w " * ((i % 7) + 1)) for i in range(20)]
    df = spark.createDataFrame(docs, ["doc_id", "lang", "text"])
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
        got = {
            r["doc_id"]: (r["pack_id"], r["pack_offset"], r["n_tokens"])
            for r in pack_documents(df, capacity=10).collect()
        }
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    # replay the next-fit recurrence directly
    pack = fill = 0
    first = True
    for i in range(20):
        n = (i % 7) + 1
        if not first and fill + n > 10:
            pack += 1
            fill = 0
        first = False
        assert got[i] == (pack, fill, n), (i, got[i], (pack, fill, n))
        fill += n


def test_adjust_large_ratio_power_table_overflow(spark):
    """A 1:5 reverse split (ratio 5.0) overflows the tail of its
    512-entry power table; the SQL-literal table must still PARSE
    (repr(inf) is not a SQL literal) and small counts must adjust
    exactly."""
    prices = spark.createDataFrame(
        [(1, _ts(2024, 1, 1), 10.0), (1, _ts(2024, 1, 3), 10.0)],
        ["user_id", "ts", "value"],
    )
    ca = spark.createDataFrame(
        [(1, _ts(2024, 1, 2), 5.0)], ["user_id", "ts", "ratio"]
    )
    out = {r["ts"].day: r["adjusted"] for r in adjust(prices, ca).collect()}
    assert out[1] == 50.0  # one later CA: x5
    assert out[3] == 10.0  # none later


def test_adjust_fallback_skips_nonpositive_ratios(spark):
    """A ratio <= 0 routes the whole CA set to the log-sum fallback;
    log(0) is NULL and must NOT poison the factor — the valid ratios
    still apply (the window-SUM behavior the fold replaced)."""
    prices = spark.createDataFrame(
        [(1, _ts(2024, 1, 1), 10.0)], ["user_id", "ts", "value"]
    )
    ca = spark.createDataFrame(
        [(1, _ts(2024, 1, 2), 2.0), (1, _ts(2024, 1, 3), 0.0)],
        ["user_id", "ts", "ratio"],
    )
    out = adjust(prices, ca).collect()
    assert out[0]["adjusted"] == 20.0  # x2 applies; the 0-ratio is skipped


def test_tick_rule_carry_and_flow(spark):
    from marketstore_spark.operators.quant import tick_rule

    rows = [
        # symbol, ts, id, price, volume
        (1, _ts(2024, 1, 1, 9, 30, 0), 1, 100.0, 10),  # leading run → 0
        (1, _ts(2024, 1, 1, 9, 31, 0), 2, 100.0, 5),   # still unresolved → 0
        (1, _ts(2024, 1, 1, 9, 32, 0), 3, 101.0, 7),   # uptick → +1
        (1, _ts(2024, 1, 1, 9, 33, 0), 4, 101.0, 9),   # flat carries +1
        (1, _ts(2024, 1, 1, 9, 34, 0), 5, 99.0, 2),    # downtick → -1
        (1, _ts(2024, 1, 1, 9, 35, 0), 6, 99.0, 4),    # flat carries -1
        (2, _ts(2024, 1, 1, 9, 30, 0), 7, 50.0, 3),    # other symbol isolated
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "value", "volume"]
    )
    got = {
        r["event_id"]: (r["side"], r["signed_vol"], r["cum_flow"])
        for r in tick_rule(df).collect()
    }
    assert got == {
        1: (0, 0, 0),
        2: (0, 0, 0),
        3: (1, 7, 7),
        4: (1, 9, 16),
        5: (-1, -2, 14),
        6: (-1, -4, 10),
        7: (0, 0, 0),
    }


def test_nbbo_best_pick_and_venue_attribution(spark):
    from marketstore_spark.operators.quant import nbbo

    rows = [
        # symbol, ts, id, venue, bid_c, ask_c — venue A updates its
        # quote inside the bucket: only the LAST one counts.
        (1, _ts(2024, 1, 1, 9, 30, 0), 1, "A", 10000, 10400),
        (1, _ts(2024, 1, 1, 9, 30, 40), 2, "A", 10100, 10300),
        (1, _ts(2024, 1, 1, 9, 30, 20), 3, "B", 10100, 10200),
        (1, _ts(2024, 1, 1, 9, 30, 30), 4, "C", 9900, 10250),
    ]
    # deliberately NO value column: a pre-sided frame must not need
    # one (the documented contract — regression-pinned)
    df = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "event_type", "bid_c", "ask_c"]
    )
    out = nbbo(df).collect()
    assert len(out) == 1
    r = out[0]
    # best bid 10100 is a tie between A (last quote) and B → greatest
    # venue name wins; best ask 10200 is B alone.
    assert (r["best_bid_c"], r["bid_venue"]) == (10100, "B")
    assert (r["best_ask_c"], r["ask_venue"]) == (10200, "B")
    assert r["spread_c"] == 100
    assert r["mid_c"] == 10150.0


def test_bm25_hand_formula(spark):
    import math

    from marketstore_spark.operators.text import bm25_score

    docs = [
        (1, "scan scan join"),
        (2, "merge sort line"),
        (3, "window window window window"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r["bm25"] for r in bm25_score(df, ["scan", "window"]).collect()}

    def expected(tf_by_term, dl, n=3, sum_dl=10, k1=1.2, b=0.75):
        s = 0.0
        for term in sorted(tf_by_term):
            tf, dfreq = tf_by_term[term]
            idf = math.log(1.0 + (float(n) - dfreq + 0.5) / (dfreq + 0.5))
            denom = tf + k1 * ((1.0 - b) + b * (float(dl) * n) / sum_dl)
            s += idf * (tf * (k1 + 1.0)) / denom
        return s

    assert got[1] == pytest.approx(
        expected({"scan": (2.0, 1), "window": (0.0, 1)}, dl=3), abs=1e-12
    )
    assert got[2] == pytest.approx(0.0, abs=0.0)
    assert got[3] == pytest.approx(
        expected({"scan": (0.0, 1), "window": (4.0, 1)}, dl=4), abs=1e-12
    )


def test_knn_label_eval_majority_and_ties(spark):
    from marketstore_spark.operators.simsearch import knn_label_eval

    # axis-aligned vectors: cosine is 1 for same axis, 0 across axes.
    # test vec 0 (axis x) -> train neighbors: two x-axis label-1 vecs
    # and one y-axis label-2 vec; k=3 votes 2:1 -> pred 1 (correct).
    # test vec 5 (axis y, label 9) -> neighbors vote 1:1:1 between
    # labels 2, 3, 4 (one each) -> smallest label 2 wins (tie rule).
    rows = [
        (0, [1.0, 0.0, 0.0], 1),   # test (0 % 5 == 0)
        (5, [0.0, 1.0, 0.0], 9),   # test
        (1, [1.0, 0.0, 0.0], 1),   # train, x
        (2, [0.9, 0.1, 0.0], 1),   # train, x-ish
        (3, [0.0, 1.0, 0.0], 2),   # train, y
        (4, [0.0, 0.9, 0.1], 3),   # train, y-ish
        (6, [0.0, 1.0, 0.1], 4),   # train, y-ish
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {
        r["vec_id"]: (r["label"], r["pred"], r["correct"])
        for r in knn_label_eval(df, k=3).collect()
    }
    assert out[0] == (1, 1, 1)
    # vec 5's 3 nearest are the three y-ish vecs (labels 2, 3, 4) —
    # one vote each, smallest label wins, prediction is wrong vs 9
    assert out[5] == (9, 2, 0)


def test_training_shuffle_is_a_dense_deterministic_permutation(spark):
    from marketstore_spark.operators.sampling import training_shuffle

    docs = spark.createDataFrame([(i, "x") for i in range(200)], ["doc_id", "text"])
    out = training_shuffle(docs, num_shards=4).collect()
    assert len(out) == 200
    assert {r["doc_id"] for r in out} == set(range(200))
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["position"])
    assert set(by_shard) <= {0, 1, 2, 3}
    for shard, poss in by_shard.items():
        # positions are dense 1..n within each shard
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # deterministic: same seed reproduces the permutation exactly...
    again = training_shuffle(docs, num_shards=4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    # ...and a different seed produces a different order
    other = training_shuffle(docs, num_shards=4, seed="epoch2").collect()
    assert sorted(map(tuple, other)) != sorted(map(tuple, out))


def test_lee_ready_quote_rule_and_tick_fallback(spark):
    from marketstore_spark.operators.quant import lee_ready

    quotes = spark.createDataFrame(
        [
            # symbol, ts, mid2 (= 2 * midpoint in cents)
            (1, _ts(2024, 1, 1, 9, 30, 0), 20000),   # mid 100.00
            (1, _ts(2024, 1, 1, 9, 32, 0), 20400),   # mid 102.00
        ],
        "user_id long, ts timestamp, mid2 long",
    )
    trades = spark.createDataFrame(
        [
            # before any quote: no mid -> tick test; first trade -> 0
            (1, _ts(2024, 1, 1, 9, 29, 0), 1, 10050),
            # above mid 100 -> buy regardless of tick direction
            (1, _ts(2024, 1, 1, 9, 30, 30), 2, 10010),
            # AT mid 100.00 -> tick test: down from 10010 -> sell
            (1, _ts(2024, 1, 1, 9, 31, 0), 3, 10000),
            # below mid 102 -> sell
            (1, _ts(2024, 1, 1, 9, 32, 30), 4, 10150),
            # at mid 102, up-tick from 10150 -> buy
            (1, _ts(2024, 1, 1, 9, 33, 0), 5, 10200),
        ],
        "user_id long, ts timestamp, event_id long, px_c long",
    )
    got = {r["event_id"]: r["side"] for r in lee_ready(trades, quotes).collect()}
    assert got == {1: 0, 2: 1, 3: -1, 4: -1, 5: 1}


def test_donchian_without_tiebreak_column(spark):
    """donchian never uses an order key, so a frame with only
    symbol/ts/value columns must work (MarketSQL buckets may lack
    event_id — regression: the shared tick projection used to select
    it unconditionally and fail analysis)."""
    from marketstore_spark.operators.quant import donchian

    rows = [(1, _ts(2024, 1, d, 12, 0, 0), float(100 + d)) for d in range(1, 6)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = donchian(df, n=2).collect()
    vals = [r for r in out if r["upper_c"] is not None]
    assert vals and all(r["lower_c"] <= r["upper_c"] for r in vals)


def test_nbbo_null_sides_contribute_no_candidate(spark):
    """A venue whose last quote has a null side must not win (or nuke)
    that side of the consolidation — bare min(struct) would pick the
    null-ask struct as minimum (struct ordering sorts a null field
    first); the when()-guarded aggregate skips it."""
    from marketstore_spark.operators.quant import nbbo

    rows = [
        (1, _ts(2024, 1, 1, 9, 30, 0), 1, "A", 10000, 10100),
        (1, _ts(2024, 1, 1, 9, 30, 10), 2, "B", None, 10050),
        (1, _ts(2024, 1, 1, 9, 30, 20), 3, "C", 10020, None),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string, bid_c long, ask_c long"
    )
    r = nbbo(df).collect()[0]
    assert (r["best_bid_c"], r["bid_venue"]) == (10020, "C")
    assert (r["best_ask_c"], r["ask_venue"]) == (10050, "B")


# ---------------------------------------------------------------------
# round 8: serial-dependence estimators + lexical diversity
# ---------------------------------------------------------------------


def _r8_closes(spark):
    """One symbol, five daily closes 100, 110, 104, 112, 106 dollars
    (one tick per day) — moves +1000, -600, +800, -600 cents."""
    rows = [
        (1, _ts(2024, 1, 1 + d, 12), d + 1, p)
        for d, p in enumerate([100.0, 110.0, 104.0, 112.0, 106.0])
    ]
    return spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])


def test_roll_spread_hand_computed(spark):
    import math

    from marketstore_spark.operators.quant import roll_spread

    out = roll_spread(_r8_closes(spark)).collect()
    assert len(out) == 1
    r = out[0]
    # pairs (x=move_t, y=move_{t-1}): (-600,1000), (800,-600), (-600,800)
    # n=3  sx=-400  sy=1200  sxy=-1_560_000
    # num = 3*sxy - sx*sy = -4_680_000 + 480_000 = -4_200_000
    assert r["n_pairs"] == 3
    assert r["move_autocov"] == -4_200_000.0 / 9.0
    assert r["roll_spread_c"] == 2.0 * math.sqrt(4_200_000.0) / 3.0


def test_autocorr_returns_hand_computed(spark):
    import math

    from marketstore_spark.operators.quant import autocorr_returns

    r = autocorr_returns(_r8_closes(spark)).collect()[0]
    # sxx=1_360_000  syy=2_000_000
    # vx = 3*sxx - sx^2 = 4_080_000 - 160_000 = 3_920_000
    # vy = 3*syy - sy^2 = 6_000_000 - 1_440_000 = 4_560_000
    assert r["n_pairs"] == 3
    assert r["autocorr"] == -4_200_000.0 / (
        math.sqrt(3_920_000.0) * math.sqrt(4_560_000.0)
    )


def test_variance_ratio_hand_computed_q2(spark):
    from marketstore_spark.operators.quant import variance_ratio

    r = variance_ratio(_r8_closes(spark), q=2).collect()[0]
    # m1: 1000,-600,800,-600 -> n1=4 sm=600 smm=2_360_000
    # m2: 400,200,200        -> nq=3 sq=800 sqq=240_000
    # var1num = 4*2_360_000 - 360_000 = 9_080_000
    # varqnum = 3*240_000 - 640_000 = 80_000
    assert (r["n1"], r["nq"]) == (4, 3)
    assert r["vr"] == (80_000.0 * 16.0) / (2.0 * 9.0 * 9_080_000.0)


def test_variance_ratio_null_when_constant(spark):
    from marketstore_spark.operators.quant import variance_ratio

    rows = [(1, _ts(2024, 1, 1 + d, 12), d, 50.0) for d in range(6)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    r = variance_ratio(df, q=2).collect()[0]
    assert r["vr"] is None  # zero 1-move variance -> undefined


def test_kyle_lambda_hand_computed(spark):
    from marketstore_spark.operators.quant import kyle_lambda

    # one tick per hourly bucket; sides by tick rule: 0, +1, -1, +1
    rows = [
        (1, _ts(2024, 1, 1, 9), 1, 100.0, 10),
        (1, _ts(2024, 1, 1, 10), 2, 101.0, 20),
        (1, _ts(2024, 1, 1, 11), 3, 100.0, 30),
        (1, _ts(2024, 1, 1, 12), 4, 102.0, 40),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value", "volume"])
    r = kyle_lambda(df).collect()[0]
    # pairs (x=sv, dp): (20,100), (-30,-100), (40,200)
    # n=3 sx=30 sy=200 sxy=13_000 sxx=2_900
    # num = 39_000 - 6_000 = 33_000 ; den = 8_700 - 900 = 7_800
    assert r["n"] == 3
    assert r["kyle_lambda"] == 33_000.0 / 7_800.0


def test_vpin_bucketing_and_ratio_of_sums(spark):
    from marketstore_spark.operators.bars import vpin

    rows = [
        (1, _ts(2024, 1, 1, 9, 30, 0), 1, 100.0, 5),   # side 0 (leading)
        (1, _ts(2024, 1, 1, 9, 31, 0), 2, 101.0, 5),   # +1
        (1, _ts(2024, 1, 1, 9, 32, 0), 3, 99.0, 10),   # -1
        (1, _ts(2024, 1, 1, 9, 33, 0), 4, 100.0, 5),   # +1
        (1, _ts(2024, 1, 1, 9, 34, 0), 5, 101.0, 5),   # +1
        (1, _ts(2024, 1, 1, 9, 35, 0), 6, 102.0, 10),  # +1
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value", "volume"])
    out = {r["bucket_id"]: r for r in vpin(df, bucket_volume=10, n=2).collect()}
    # cum_before: 0,5,10,20,25,30 -> buckets 0,0,1,2,2,3
    assert set(out) == {0, 1, 2, 3}
    b0, b1, b2, b3 = out[0], out[1], out[2], out[3]
    assert (b0["buy_vol"], b0["sell_vol"], b0["total_vol"], b0["imbalance"]) == (
        5, 0, 10, 5,
    )
    assert (b1["sell_vol"], b1["imbalance"]) == (10, 10)
    assert b0["vpin"] is None  # warm-up (rn < n)
    assert b1["vpin"] == (5 + 10) / 20.0
    assert b2["vpin"] == (10 + 10) / 20.0
    assert b3["vpin"] == (10 + 10) / 20.0


def test_vpin_rejects_bad_params(spark):
    from marketstore_spark.operators.bars import vpin

    df = spark.createDataFrame(
        [(1, _ts(2024, 1, 1, 9), 1, 1.0, 1)],
        ["user_id", "ts", "event_id", "value", "volume"],
    )
    with pytest.raises(ValueError, match="positive"):
        vpin(df, bucket_volume=0)
    with pytest.raises(ValueError, match="positive"):
        vpin(df, n=0)


def test_lexical_diversity_hand_computed(spark):
    from marketstore_spark.operators.text import lexical_diversity

    df = spark.createDataFrame(
        [
            (1, "the cat sat the mat"),   # 5 tokens, 4 types, 3 hapax
            (2, "hello"),                 # 1/1/1
            (3, "a a a"),                 # 3/1/0
            (4, "  "),                    # filtered (empty after trim)
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in lexical_diversity(df).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1]["n_tokens"], out[1]["n_types"], out[1]["n_hapax"]) == (5, 4, 3)
    assert (out[1]["ttr"], out[1]["hapax_frac"]) == (0.8, 0.6)
    assert (out[2]["n_tokens"], out[2]["n_types"], out[2]["n_hapax"]) == (1, 1, 1)
    assert (out[2]["ttr"], out[2]["hapax_frac"]) == (1.0, 1.0)
    assert (out[3]["n_tokens"], out[3]["n_types"], out[3]["n_hapax"]) == (3, 1, 0)
    assert (out[3]["ttr"], out[3]["hapax_frac"]) == (0.333333, 0.0)


def test_markout_wall_clock_horizon_and_signing(spark):
    from marketstore_spark.operators.quant import markout_returns

    # one tick per hourly bucket; sides 0, +1, -1, +1; horizon 1
    rows = [
        (1, _ts(2024, 1, 1, 9), 1, 100.0),
        (1, _ts(2024, 1, 1, 10), 2, 101.0),
        (1, _ts(2024, 1, 1, 11), 3, 100.0),
        (1, _ts(2024, 1, 1, 12), 4, 102.0),
        # gap: no 13:00 bucket -> the 12:00 trade has no markout
        (1, _ts(2024, 1, 1, 14), 5, 103.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = {r["epoch"]: r for r in markout_returns(df, horizon=1).collect()}
    # 10:00 trade (side +1, px 10100): fut close 11:00 = 10000 -> -100
    # 11:00 trade (side -1, px 10000): fut close 12:00 = 10200 -> -200
    # 12:00 trade (side +1): 13:00 bucket MISSING -> excluded
    # 14:00 trade (side +1): 15:00 missing -> excluded
    assert len(out) == 2
    r10 = out[_ts(2024, 1, 1, 10)]
    assert (r10["n_trades"], r10["sum_markout_c"], r10["avg_markout_c"]) == (
        1, -100, -100.0,
    )
    r11 = out[_ts(2024, 1, 1, 11)]
    assert (r11["n_trades"], r11["sum_markout_c"], r11["avg_markout_c"]) == (
        1, -200, -200.0,
    )


def test_intraday_seasonality_hand_computed(spark):
    from marketstore_spark.operators.quant import intraday_seasonality

    rows = [
        (1, _ts(2024, 1, 1, 9, 0, 0), 1, 100.0, 10),
        (1, _ts(2024, 1, 1, 9, 30, 0), 2, 101.0, 20),  # move +100 in h9
        (1, _ts(2024, 1, 1, 10, 0, 0), 3, 99.0, 30),   # move -200 in h10
        (1, _ts(2024, 1, 2, 9, 0, 0), 4, 99.0, 40),    # move 0 in h9 (day 2)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value", "volume"])
    out = {r["hour"]: r for r in intraday_seasonality(df).collect()}
    h9, h10 = out[9], out[10]
    # h9: 3 ticks (first has no move), moves {100, 0} -> avg 50.0
    assert (h9["n_ticks"], h9["total_volume"]) == (3, 70)
    assert h9["avg_volume"] == 70.0 / 3.0
    assert h9["avg_abs_move_c"] == 50.0
    assert (h10["n_ticks"], h10["avg_abs_move_c"]) == (1, 200.0)


def test_dup_size_histogram_hand_computed(spark):
    from marketstore_spark.operators.dedup import dup_size_histogram

    df = spark.createDataFrame(
        [
            (1, "a b"),
            (2, "A  b "),   # normalizes to the same content
            (3, "c"),
            (4, "d"),
            (5, "d"),
        ],
        ["doc_id", "text"],
    )
    out = {r["cluster_size"]: r for r in dup_size_histogram(df).collect()}
    assert set(out) == {1, 2}
    assert (out[2]["n_clusters"], out[2]["n_docs_total"], out[2]["n_removable"]) == (
        2, 4, 2,
    )
    assert (out[1]["n_clusters"], out[1]["n_docs_total"], out[1]["n_removable"]) == (
        1, 1, 0,
    )


def test_effective_spread_hand_computed(spark):
    from marketstore_spark.operators.quant import effective_spread

    trades = spark.createDataFrame(
        [
            (1, _ts(2024, 1, 1, 9, 30, 10), 1, 10050),
            (1, _ts(2024, 1, 1, 9, 30, 20), 2, 10040),  # at mid -> tick test
            (1, _ts(2024, 1, 1, 9, 31, 0), 3, 10000),
        ],
        "user_id long, ts timestamp, event_id long, px_c long",
    )
    quotes = spark.createDataFrame(
        [(1, _ts(2024, 1, 1, 9, 30, 0), 20080)],  # mid 100.40
        "user_id long, ts timestamp, mid2 long",
    )
    out = effective_spread(trades, quotes).collect()
    assert len(out) == 1
    r = out[0]
    # es: +1*(20100-20080)=20 ; -1*(20080-20080)=0 ; -1*(20000-20080)=80
    assert (r["n_trades"], r["sum_eff_spread_c"]) == (3, 100)
    assert r["avg_eff_spread_c"] == 100.0 / 3.0


def test_vpin_matches_direct_model_on_random_walks(spark):
    """Property check: the whole VPIN chain (tick-rule carry, volume
    bucketing, trailing ratio-of-sums) vs a direct Python fold on
    pseudo-random walks, multiple symbols."""
    import random

    from marketstore_spark.operators.bars import vpin

    rng = random.Random(13)
    rows = []
    model = {}  # sym -> list of (side, vol)
    for sym in (1, 2):
        px = 100.0
        for i in range(300):
            px = round(max(1.0, px + rng.randint(-200, 200) / 100.0), 2)
            v = rng.randint(1, 50)
            rows.append((sym, _ts(2024, 1, 1 + i // 96, (i // 4) % 24, (i % 4) * 15, 0), i, px, v))
            model.setdefault(sym, []).append((round(px * 100), v))
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value", "volume"])
    got = {
        (r["symbol"], r["bucket_id"]): r
        for r in vpin(df, bucket_volume=100, n=3).collect()
    }
    for sym, ticks in model.items():
        # direct fold
        side, last, cum = 0, None, 0
        per = {}
        for px_c, v in ticks:
            if last is not None and px_c != last:
                side = 1 if px_c > last else -1
            last = px_c
            b = cum // 100
            cum += v
            d = per.setdefault(b, [0, 0, 0])  # buy, sell, tot
            if side == 1:
                d[0] += v
            elif side == -1:
                d[1] += v
            d[2] += v
        bids = sorted(per)
        for i, b in enumerate(bids):
            r = got[(sym, b)]
            buy, sell, tot = per[b]
            assert (r["buy_vol"], r["sell_vol"], r["total_vol"]) == (buy, sell, tot)
            if i >= 2:
                si = sum(abs(per[x][0] - per[x][1]) for x in bids[i - 2 : i + 1])
                st = sum(per[x][2] for x in bids[i - 2 : i + 1])
                assert r["vpin"] == float(si) / float(st)
            else:
                assert r["vpin"] is None


def test_filter_funnel_cumulative_gates(spark):
    from marketstore_spark.operators.text import filter_funnel

    df = spark.createDataFrame(
        [
            (1, "the cat sat on a mat today fine"),        # passes all
            (2, ""),                                        # empty
            (3, "one two"),                                 # < 5 words
            (4, "a b c d e !!!!!!!!!!!!!!!!!!!!!!!!!!!"),   # punct heavy
            (5, "a1 2b 3c 44 55 66 77 88"),                 # digit heavy
            (6, "ab " * 4 + "abcdefghijklmnopqrstuvwxyzabcdefghijklmnopqrstuvwxyzabcdefghijklmnopqrstuvwxyzabcdefghijklmnopqrst"),  # avg word len >= 20
        ],
        ["doc_id", "text"],
    )
    r = filter_funnel(df).collect()[0]
    assert r["n_total"] == 6
    assert r["n_nonempty"] == 5
    assert r["n_min_len"] == 4       # docs 1, 4, 5, 6
    assert r["n_punct"] == 3         # drop 4
    assert r["n_digit"] == 2         # drop 5
    assert r["n_word_len"] == 1      # drop 6 -> only doc 1


def test_length_percentiles_hand_computed(spark):
    from marketstore_spark.operators.sampling import length_percentiles

    rows = [(i, "en", "s1", "w " * n) for i, n in enumerate([1, 2, 3, 4, 5])]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "source", "text"])
    r = length_percentiles(df).collect()[0]
    # trailing space: "w " * n splits to n tokens after trim
    assert (r["lang"], r["source"], r["n_docs"]) == ("en", "s1", 5)
    assert (r["p10_tokens"], r["p50_tokens"], r["p90_tokens"]) == (1.4, 3.0, 4.6)


# ---------------------------------------------------------------------
# round 8 second wave: range volatility, Corwin-Schultz, Kaufman ER,
# per-source vocabulary surfaces
# ---------------------------------------------------------------------


def test_range_vol_hand_computed(spark):
    import math

    from marketstore_spark.operators.quant import range_vol

    rows = [
        (1, _ts(2024, 1, 1, 12, 0), 1, 100.0),
        (1, _ts(2024, 1, 1, 12, 1), 2, 110.0),
        (1, _ts(2024, 1, 1, 12, 2), 3, 95.0),
        (1, _ts(2024, 1, 1, 12, 3), 4, 105.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    r = range_vol(df).collect()[0]
    assert (r["o"], r["h"], r["l"], r["c"]) == (10000, 11000, 9500, 10500)
    hl = math.log(11000.0 / 9500.0)
    co = math.log(10500.0 / 10000.0)
    ho = math.log(11000.0 / 10000.0)
    lo = math.log(9500.0 / 10000.0)
    assert math.isclose(r["park_var"], hl * hl / 2.772588722239781, abs_tol=1e-6)
    assert math.isclose(
        r["gk_var"], 0.5 * hl * hl - 0.3862943611198906 * co * co, abs_tol=1e-6
    )
    assert math.isclose(
        r["rs_var"], ho * (ho - co) + lo * (lo - co), abs_tol=1e-6
    )


def test_range_vol_nonpositive_price_nulls_estimators(spark):
    from marketstore_spark.operators.quant import range_vol

    rows = [
        (1, _ts(2024, 1, 1, 12, 0), 1, 100.0),
        (1, _ts(2024, 1, 1, 12, 1), 2, 0.0),  # zero low
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    r = range_vol(df).collect()[0]
    assert r["l"] == 0
    assert r["park_var"] is None and r["gk_var"] is None and r["rs_var"] is None


def test_corwin_schultz_hand_computed(spark):
    import math

    from marketstore_spark.operators.quant import corwin_schultz

    # day 1: H=102, L=98; day 2: H=103, L=99 (two ticks per day set H/L)
    rows = [
        (1, _ts(2024, 1, 1, 10), 1, 102.0),
        (1, _ts(2024, 1, 1, 11), 2, 98.0),
        (1, _ts(2024, 1, 2, 10), 3, 103.0),
        (1, _ts(2024, 1, 2, 11), 4, 99.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = corwin_schultz(df).collect()
    assert len(out) == 1  # first bar has no predecessor
    r = out[0]
    r1 = math.log(10300.0 / 9900.0)
    r0 = math.log(10200.0 / 9800.0)
    beta = r1 * r1 + r0 * r0
    rg = math.log(10300.0 / 9800.0)
    den = 0.1715728752538097
    alpha = (math.sqrt(2.0 * beta) - math.sqrt(beta)) / den - math.sqrt(
        rg * rg / den
    )
    spread = 2.0 * (math.exp(alpha) - 1.0) / (1.0 + math.exp(alpha))
    assert math.isclose(r["cs_spread"], spread, abs_tol=1e-6)
    # overlapping day ranges -> positive estimate, _pos passes through
    assert r["cs_spread"] > 0
    assert r["cs_spread_pos"] == r["cs_spread"]


def test_corwin_schultz_trend_floors_negative(spark):
    from marketstore_spark.operators.quant import corwin_schultz

    # disjoint day ranges (a strong trend): the two-day range gamma
    # dominates beta -> negative raw estimate, floored in _pos
    rows = [
        (1, _ts(2024, 1, 1, 10), 1, 102.0),
        (1, _ts(2024, 1, 1, 11), 2, 98.0),
        (1, _ts(2024, 1, 2, 10), 3, 112.0),
        (1, _ts(2024, 1, 2, 11), 4, 108.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    r = corwin_schultz(df).collect()[0]
    assert r["cs_spread"] < 0
    assert r["cs_spread_pos"] == 0.0


def test_corwin_schultz_flat_bars_zero_spread(spark):
    from marketstore_spark.operators.quant import corwin_schultz

    rows = [
        (1, _ts(2024, 1, 1, 10), 1, 100.0),
        (1, _ts(2024, 1, 2, 10), 2, 100.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    r = corwin_schultz(df).collect()[0]
    # H=L both days: beta = gamma = alpha = 0 -> S = 0
    assert r["cs_spread"] == 0.0 and r["cs_spread_pos"] == 0.0


def test_kaufman_er_trend_vs_churn(spark):
    from marketstore_spark.operators.quant import kaufman_er

    # symbol 1: monotone +1.00/day -> ER = 1 once warm
    # symbol 2: alternating +/-1.00 -> net change 0 over n=2 -> ER = 0
    rows = [
        (1, _ts(2024, 1, 1 + d, 12), d + 1, 100.0 + d) for d in range(4)
    ] + [
        (2, _ts(2024, 1, 1 + d, 12), d + 1, 100.0 + (d % 2)) for d in range(4)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = {(r["symbol"], r["epoch"].day): r["er"] for r in kaufman_er(df, n=2).collect()}
    assert out[(1, 1)] is None and out[(1, 2)] is None  # warm-up: rn <= n
    assert out[(1, 3)] == 1.0 and out[(1, 4)] == 1.0
    assert out[(2, 3)] == 0.0 and out[(2, 4)] == 0.0


def test_kaufman_er_zero_path_null(spark):
    from marketstore_spark.operators.quant import kaufman_er

    rows = [(1, _ts(2024, 1, 1 + d, 12), d + 1, 100.0) for d in range(4)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = kaufman_er(df, n=2).collect()
    assert all(r["er"] is None for r in out)  # flatline: path sum 0


def test_kaufman_er_rejects_bad_n(spark):
    import pytest as _pytest

    from marketstore_spark.operators.quant import kaufman_er

    df = spark.createDataFrame([], "user_id long, ts timestamp, event_id long, value double")
    with _pytest.raises(ValueError):
        kaufman_er(df, n=0)


def test_source_token_jaccard_hand_computed(spark):
    from marketstore_spark.operators.text import source_token_jaccard

    rows = [
        (1, "a b c", "A"),
        (2, "b c d", "B"),
        (3, "x", "C"),
        (4, "  ", "D"),  # blank doc: no vocabulary contribution
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {(r["src_a"], r["src_b"]): r for r in source_token_jaccard(df).collect()}
    assert set(out) == {("A", "B")}  # zero-overlap pairs are absent
    r = out[("A", "B")]
    assert (r["n_a"], r["n_b"], r["n_common"]) == (3, 3, 2)
    assert r["jaccard"] == 2.0 / 4.0


def test_source_token_stats_hand_computed(spark):
    from marketstore_spark.operators.text import source_token_stats

    rows = [
        (1, "a a b c", "A"),
        (2, "p q p Q", "B"),  # lowercased: p=2 q=2 -> tie, top = 'q'
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["source"]: r for r in source_token_stats(df).collect()}
    a = out["A"]
    assert (a["n_tokens"], a["vocab"], a["n_hapax"]) == (4, 3, 2)
    assert (a["top_tok"], a["top_count"]) == ("a", 2)
    assert a["simpson"] == 0.375  # (4+1+1)/16
    assert a["effective_vocab"] == round(16.0 / 6.0, 6)
    b = out["B"]
    # count ties break on the lexicographically largest token
    assert (b["top_tok"], b["top_count"]) == ("q", 2)
    assert b["simpson"] == 0.5 and b["effective_vocab"] == 2.0


def test_vocab_growth_hand_computed(spark):
    from marketstore_spark.operators.text import vocab_growth

    rows = [
        (0, "a b", "A"),   # bin 0: 2 tokens, new types a,b
        (1, "b c", "A"),   # bin 0: +2 tokens, new type c
        (2, "  ", "A"),    # blank: stays on the curve, 0 tokens
        (3, "a d", "A"),   # bin 1: new type d
        (0, "z", "B"),     # other source: independent curve
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {(r["source"], r["bin"]): r for r in vocab_growth(df, bin_docs=3).collect()}
    a0, a1 = out[("A", 0)], out[("A", 1)]
    assert (a0["n_docs"], a0["n_tokens"], a0["new_types"]) == (3, 4, 3)
    assert (a0["cum_tokens"], a0["cum_types"]) == (4, 3)
    assert (a1["n_docs"], a1["n_tokens"], a1["new_types"]) == (1, 2, 1)
    assert (a1["cum_tokens"], a1["cum_types"]) == (6, 4)
    b0 = out[("B", 0)]
    assert (b0["cum_tokens"], b0["cum_types"]) == (1, 1)


def test_vocab_growth_rejects_bad_bin(spark):
    import pytest as _pytest

    from marketstore_spark.operators.text import vocab_growth

    df = spark.createDataFrame([], "doc_id long, text string, source string")
    with _pytest.raises(ValueError):
        vocab_growth(df, bin_docs=0)


def test_kmeans_update_hand_computed_and_iterates(spark):
    from marketstore_spark.operators.simsearch import (
        kmeans_assign,
        kmeans_centroids,
        kmeans_update,
    )

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.9, 0.1]),
        (3, [0.1, 0.9]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    up = kmeans_update(df, k=2)
    got = {(r["cluster"], r["dim"]): r for r in up.collect()}
    assert len(got) == 4  # 2 clusters x 2 dims
    assert got[(0, 0)]["n_members"] == 2
    assert got[(0, 0)]["centroid_comp"] == (1900000.0 / 2.0) / 1000000.0  # 0.95
    assert got[(0, 1)]["centroid_comp"] == (100000.0 / 2.0) / 1000000.0  # 0.05
    assert got[(1, 0)]["centroid_comp"] == 0.05
    assert got[(1, 1)]["centroid_comp"] == 0.95

    # full Lloyd iteration: reassembled centroids feed the E-step and
    # the (already converged) assignment is stable
    cents = kmeans_centroids(up)
    a = {r["vec_id"]: r["cluster"] for r in kmeans_assign(df, k=2, centroids=cents).collect()}
    assert a == {0: 0, 1: 1, 2: 0, 3: 1}


def test_realized_moments_hand_computed(spark):
    import math

    from marketstore_spark.operators.quant import realized_moments

    # one day, 4 ticks -> moves +100, -200, +100 cents
    rows = [
        (1, _ts(2024, 1, 1, 10, 0), 1, 100.0),
        (1, _ts(2024, 1, 1, 11, 0), 2, 101.0),
        (1, _ts(2024, 1, 1, 12, 0), 3, 99.0),
        (1, _ts(2024, 1, 1, 13, 0), 4, 100.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    r = realized_moments(df).collect()[0]
    assert r["n_moves"] == 3
    s2 = 100**2 + 200**2 + 100**2          # 60_000
    s3 = 100**3 - 200**3 + 100**3          # -6_000_000
    s4 = 100**4 + 200**4 + 100**4          # 1_800_000_000
    assert r["rskew"] == math.sqrt(3.0) * float(s3) / (
        math.sqrt(float(s2)) * float(s2)
    )
    assert r["rkurt"] == 3.0 * float(s4) / (float(s2) * float(s2))


def test_realized_moments_degenerate_null(spark):
    from marketstore_spark.operators.quant import realized_moments

    # single move (n=1) and a flat bucket (s2=0): both NULL
    rows = [
        (1, _ts(2024, 1, 1, 10), 1, 100.0),
        (1, _ts(2024, 1, 1, 11), 2, 101.0),
        (2, _ts(2024, 1, 1, 10), 3, 50.0),
        (2, _ts(2024, 1, 1, 11), 4, 50.0),
        (2, _ts(2024, 1, 1, 12), 5, 50.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = {r["symbol"]: r for r in realized_moments(df).collect()}
    assert out[1]["rskew"] is None and out[1]["rkurt"] is None  # n_moves=1
    assert out[2]["rskew"] is None and out[2]["rkurt"] is None  # zero variance


def test_benchmark_coverage_hand_computed(spark):
    from marketstore_spark.operators.dedup import benchmark_coverage

    bench = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y z w")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [(10, "a b c q r s"), (11, "p q a b c")], ["doc_id", "text"]
    )
    out = {r["bench_id"]: r for r in benchmark_coverage(corpus, bench, n=3).collect()}
    # bench doc 1: shingles {a b c, b c d}; corpus contains 'a b c'
    # (twice, in both docs - still ONE matched shingle)
    assert (out[1]["n_shingles"], out[1]["n_matched"]) == (2, 1)
    assert out[1]["coverage"] == 0.5
    # bench doc 2: no overlap -> present with zero coverage
    assert (out[2]["n_shingles"], out[2]["n_matched"]) == (2, 0)
    assert out[2]["coverage"] == 0.0


def test_trimmed_mean_hand_computed(spark):
    from marketstore_spark.operators.quant import trimmed_mean

    # 20 ticks, one outlier low and one outlier high; trim 5% -> k=1,
    # exactly the two outliers drop
    prices = [1.0] + [100.0 + i for i in range(18)] + [10000.0]
    rows = [
        (1, _ts(2024, 1, 1, 9, i), i + 1, p) for i, p in enumerate(prices)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    r = trimmed_mean(df, trim_pct=5).collect()[0]
    assert (r["n_ticks"], r["n_used"]) == (20, 18)
    want = sum(int(p * 100) for p in prices[1:-1]) / 18.0
    assert r["trimmed_mean_c"] == want


def test_trimmed_mean_small_bucket_keeps_all(spark):
    from marketstore_spark.operators.quant import trimmed_mean

    # n=3: k = 15 DIV 100 = 0 -> nothing trimmed
    rows = [(1, _ts(2024, 1, 1, 9, i), i + 1, p) for i, p in enumerate([1.0, 2.0, 3.0])]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    r = trimmed_mean(df, trim_pct=5).collect()[0]
    assert (r["n_ticks"], r["n_used"]) == (3, 3)
    assert r["trimmed_mean_c"] == 200.0


def test_trimmed_mean_rejects_bad_pct(spark):
    import pytest as _pytest

    from marketstore_spark.operators.quant import trimmed_mean

    df = spark.createDataFrame([], "user_id long, ts timestamp, event_id long, value double")
    with _pytest.raises(ValueError):
        trimmed_mean(df, trim_pct=50)


def test_kmeans_update_pick_matches_assign(spark, sf_dir):
    """The M-step's fold argmax (strict > over the cluster-sorted
    centroid array) must pick exactly what the E-step's max_by picks —
    cluster memberships agree on real data."""
    from marketstore_spark.catalog import load_table
    from marketstore_spark.operators.simsearch import kmeans_assign, kmeans_update

    emb = load_table(spark, sf_dir, "embeddings")
    a = kmeans_assign(emb, k=8).groupBy("cluster").count()
    am = {r["cluster"]: r["count"] for r in a.collect()}
    u = kmeans_update(emb, k=8).filter("dim = 0")
    um = {r["cluster"]: r["n_members"] for r in u.collect()}
    assert am == um and sum(am.values()) > 0


def test_mfi_hand_computed(spark):
    from marketstore_spark.operators.quant import mfi

    # one tick/day: tp3 = 3*close; n=2; volumes vary
    # closes: 100, 102, 101, 103 -> dirs: _, up, down, up
    days = [(100.0, 10), (102.0, 20), (101.0, 30), (103.0, 40)]
    rows = [
        (1, _ts(2024, 1, 1 + i, 12), i + 1, px, vol)
        for i, (px, vol) in enumerate(days)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double, volume long"
    )
    out = {r["epoch"].day: r["mfi"] for r in mfi(df, n=2).collect()}
    assert out[1] is None and out[2] is None  # warm-up (rn <= n)
    # day 3 window = days 2,3: pos = 3*10200*20, neg = 3*10100*30
    p, q = 3 * 10200 * 20, 3 * 10100 * 30
    assert out[3] == 100.0 * float(p) / float(p + q)
    # day 4 window = days 3,4: pos = 3*10300*40, neg = 3*10100*30
    p2 = 3 * 10300 * 40
    assert out[4] == 100.0 * float(p2) / float(p2 + q)


def test_mfi_flat_window_null(spark):
    from marketstore_spark.operators.quant import mfi

    rows = [
        (1, _ts(2024, 1, 1 + i, 12), i + 1, 100.0, 10) for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double, volume long"
    )
    assert all(r["mfi"] is None for r in mfi(df, n=2).collect())


def test_fixed_n_sample_exact_count_and_determinism(spark):
    import hashlib

    from marketstore_spark.operators.sampling import fixed_n_sample

    rows = [(i, "en", "s") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "source"])
    out = fixed_n_sample(df, n=10).collect()
    assert len(out) == 10
    want = sorted(
        range(50), key=lambda i: hashlib.md5(f"fixedn|{i}".encode()).hexdigest()
    )[:10]
    assert sorted(r["doc_id"] for r in out) == sorted(want)
    # n > rows: whole table, no error
    assert fixed_n_sample(df, n=100).count() == 50
    import pytest as _pytest

    with _pytest.raises(ValueError):
        fixed_n_sample(df, n=0)


def test_cci_hand_computed(spark):
    from marketstore_spark.operators.quant import cci

    # one tick/day, n=3: closes 100, 104, 101, 106 -> tp3 = 3*close
    closes = [100.0, 104.0, 101.0, 106.0]
    rows = [
        (1, _ts(2024, 1, 1 + i, 12), i + 1, c) for i, c in enumerate(closes)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = {r["epoch"].day: r["cci"] for r in cci(df, n=3).collect()}
    assert out[1] is None and out[2] is None  # warm-up
    tp = [3 * int(c * 100) for c in closes]

    def want(i):
        wnd = tp[i - 2 : i + 1]
        s = sum(wnd)
        num = 3 * tp[i] - s
        md = sum(abs(3 * x - s) for x in wnd)
        return 3.0 * float(num) / (0.015 * float(md))

    assert out[3] == want(2)
    assert out[4] == want(3)


def test_cci_flat_window_null(spark):
    from marketstore_spark.operators.quant import cci

    rows = [(1, _ts(2024, 1, 1 + i, 12), i + 1, 50.0) for i in range(4)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    assert all(r["cci"] is None for r in cci(df, n=3).collect())


def test_aroon_hand_computed(spark):
    from marketstore_spark.operators.quant import aroon

    # one tick/day, n=2 (frame = current + 2 prior bars)
    # closes double as H and L: 100, 105, 103, 105
    closes = [100.0, 105.0, 103.0, 105.0]
    rows = [
        (1, _ts(2024, 1, 1 + i, 12), i + 1, c) for i, c in enumerate(closes)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = {r["epoch"].day: r for r in aroon(df, n=2).collect()}
    assert out[1]["aroon_up"] is None and out[2]["aroon_up"] is None
    # day 3 (rn=3): window days 1-3; high at day 2 -> since=1 -> 50;
    # low at day 1 -> since=2 -> 0
    assert out[3]["aroon_up"] == 50.0 and out[3]["aroon_down"] == 0.0
    # day 4 (rn=4): window days 2-4; highs 105,103,105 tie -> MOST
    # RECENT (day 4) -> since=0 -> 100; low 103 at day 3 -> since=1
    assert out[4]["aroon_up"] == 100.0 and out[4]["aroon_down"] == 50.0


def test_adx_hand_computed(spark):
    from marketstore_spark.operators.quant import adx

    # one tick/day -> H=L=C, so TR = |move| and DM is one-sided
    closes = [100.0, 102.0, 101.0, 104.0]
    rows = [
        (1, _ts(2024, 1, 1 + i, 12), i + 1, c) for i, c in enumerate(closes)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = {r["epoch"].day: r for r in adx(df, n=2).collect()}
    assert set(out) == {2, 3, 4}  # first bar has no predecessor
    a, b = 1.0 / 2.0, 1.0 - 1.0 / 2.0
    # day 2: up-move 200 -> dmp=200 dmm=0 tr=200; seeds
    assert (out[2]["dmp"], out[2]["dmm"], out[2]["tr"]) == (200, 0, 200)
    assert out[2]["di_plus"] == 100.0 and out[2]["di_minus"] == 0.0
    assert out[2]["dx"] == 100.0 and out[2]["adx"] == 100.0
    # day 3: down-move 100 -> dmp=0 dmm=100 tr=100
    sdp, sdm, st = a * 0 + b * 200.0, a * 100.0 + b * 0.0, a * 100.0 + b * 200.0
    dip, dim = (100.0 * sdp) / st, (100.0 * sdm) / st
    dx3 = (100.0 * abs(dip - dim)) / (dip + dim)
    assert out[3]["di_plus"] == dip and out[3]["di_minus"] == dim
    assert out[3]["adx"] == a * dx3 + b * 100.0


def test_adx_flat_series_zero(spark):
    from marketstore_spark.operators.quant import adx

    rows = [(1, _ts(2024, 1, 1 + i, 12), i + 1, 100.0) for i in range(4)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = adx(df, n=2).collect()
    # flat: TR=0 -> DI=0 by the guard -> DX=0 -> ADX=0, never NaN
    assert all(
        r["di_plus"] == 0.0 and r["di_minus"] == 0.0 and r["adx"] == 0.0
        for r in out
    )


def test_volume_profile_hand_computed(spark):
    from marketstore_spark.operators.quant import volume_profile

    # one day: prices 100.50, 100.80 (level 100), 101.20 (level 101)
    rows = [
        (1, _ts(2024, 1, 1, 9), 1, 100.50, 10),
        (1, _ts(2024, 1, 1, 10), 2, 100.80, 20),
        (1, _ts(2024, 1, 1, 11), 3, 101.20, 5),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double, volume long"
    )
    out = {r["level"]: r for r in volume_profile(df, bin_cents=100).collect()}
    assert set(out) == {100, 101}
    assert (out[100]["level_volume"], out[100]["n_ticks"]) == (30, 2)
    assert (out[101]["level_volume"], out[101]["n_ticks"]) == (5, 1)
    assert out[100]["poc_level"] == 100 and out[101]["poc_level"] == 100
    assert out[100]["volume_share"] == 30.0 / 35.0
    assert out[101]["volume_share"] == 5.0 / 35.0


def test_volume_profile_poc_tie_highest_level(spark):
    from marketstore_spark.operators.quant import volume_profile

    rows = [
        (1, _ts(2024, 1, 1, 9), 1, 100.0, 10),
        (1, _ts(2024, 1, 1, 10), 2, 105.0, 10),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double, volume long"
    )
    out = volume_profile(df, bin_cents=100).collect()
    assert all(r["poc_level"] == 105 for r in out)  # tie -> highest level


def test_unigram_nll_hand_computed(spark):
    import math

    from marketstore_spark.operators.text import unigram_nll

    # corpus: "a a b" + "a c" -> N=5; counts a=3 b=1 c=1
    rows = [(1, "a a b"), (2, "a c"), (3, "  ")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in unigram_nll(df).collect()}
    assert set(out) == {1, 2}  # blank doc contributes nothing

    def q(c):
        return math.floor(math.log(c / 5.0) * 1000000.0 + 0.5)

    sq1 = q(3) + q(3) + q(1)
    assert out[1]["n_tokens"] == 3
    assert out[1]["nll"] == (-(float(sq1) / 3.0)) / 1000000.0
    sq2 = q(3) + q(1)
    assert out[2]["nll"] == (-(float(sq2) / 2.0)) / 1000000.0
    # the common-token doc is more corpus-typical -> lower NLL
    assert out[1]["nll"] < out[2]["nll"]


def test_kmeans_iterate_converges_and_is_deterministic(spark):
    import pytest as _pytest

    from marketstore_spark.operators.simsearch import kmeans_iterate

    # two tight groups around orthogonal directions: one Lloyd round
    # already separates them; more rounds must not move anything
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.9, 0.1]),
        (3, [0.1, 0.9]),
        (4, [0.95, 0.05]),
        (5, [0.05, 0.95]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a1, c1 = kmeans_iterate(df, k=2, iters=1)
    a3, c3 = kmeans_iterate(df, k=2, iters=3)
    m1 = {r["vec_id"]: r["cluster"] for r in a1.collect()}
    m3 = {r["vec_id"]: r["cluster"] for r in a3.collect()}
    assert m1 == m3  # converged after one round
    assert m1 == {0: 0, 1: 1, 2: 0, 3: 1, 4: 0, 5: 1}
    # centroids are the exact fixed-point means of the members
    cents = {r["vec_id"]: r["embedding"] for r in c3.collect()}
    assert cents[0] == [(1000000 + 900000 + 950000) / 3.0 / 1000000.0,
                       (0 + 100000 + 50000) / 3.0 / 1000000.0]
    with _pytest.raises(ValueError):
        kmeans_iterate(df, k=2, iters=0)


def test_liquidity_panel_matches_standalone_operators(spark, sf_dir):
    """The fused panel must equal roll_spread / autocorr_returns /
    variance_ratio value-for-value on real data (same lags, same
    sums, same final expressions)."""
    from marketstore_spark.catalog import load_table
    from marketstore_spark.operators.quant import (
        autocorr_returns,
        liquidity_panel,
        roll_spread,
        variance_ratio,
    )

    ev = load_table(spark, sf_dir, "events")
    panel = {r["symbol"]: r for r in liquidity_panel(ev, q=5).collect()}
    rs = {r["symbol"]: r for r in roll_spread(ev).collect()}
    ac = {r["symbol"]: r for r in autocorr_returns(ev).collect()}
    vr = {r["symbol"]: r for r in variance_ratio(ev, q=5).collect()}
    assert set(rs) <= set(panel) and rs
    for sym, want in rs.items():
        assert panel[sym]["move_autocov"] == want["move_autocov"]
        assert panel[sym]["roll_spread_c"] == want["roll_spread_c"]
    for sym, want in ac.items():
        assert panel[sym]["autocorr"] == want["autocorr"]
    for sym, want in vr.items():
        assert panel[sym]["vr"] == want["vr"]


def test_gap_percentiles_exact_interpolation(spark):
    from marketstore_spark.operators.quant import gap_percentiles

    # gaps between 5 ticks: 10, 30, 20, 40 seconds -> sorted s
    # [10, 20, 30, 40]; n=4
    import datetime as _dt

    base = _ts(2024, 1, 1, 9, 0, 0)
    secs = [0, 10, 40, 60, 100]
    rows = [
        (1, base + _dt.timedelta(seconds=s), i + 1) for i, s in enumerate(secs)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    r = gap_percentiles(df).collect()[0]
    g = [10e6, 20e6, 30e6, 40e6]
    assert (r["n_gaps"], r["max_gap_us"]) == (4, 40_000_000)
    # p50: rank 1.5 -> (lo*1 + hi*1)/2 = (20M + 30M)/2
    assert r["p50_gap_us"] == (int(g[1]) * 1 + int(g[2]) * 1) / 2.0
    # p90: rank 2.7 -> idx 2 rem 7 -> (30M*3 + 40M*7)/10
    assert r["p90_gap_us"] == (int(g[2]) * 3 + int(g[3]) * 7) / 10.0
    # p99: rank 2.97 -> (30M*3 + 40M*97)/100
    assert r["p99_gap_us"] == (int(g[2]) * 3 + int(g[3]) * 97) / 100.0


def test_gap_percentiles_single_gap(spark):
    from marketstore_spark.operators.quant import gap_percentiles

    rows = [(1, _ts(2024, 1, 1, 9, 0, 0), 1), (1, _ts(2024, 1, 1, 9, 0, 7), 2)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    r = gap_percentiles(df).collect()[0]
    # n=1: every percentile is the single gap (rem always 0)
    assert r["p50_gap_us"] == r["p90_gap_us"] == r["p99_gap_us"] == 7_000_000.0


def test_price_impact_curve_hand_computed(spark):
    from marketstore_spark.operators.quant import price_impact_curve

    # 5 ticks -> 4 moves; rank deciles at n_buckets=2 (halves by size)
    # moves and sizes: (|move|, vol) = (100, 1), (200, 2), (50, 3), (300, 4)
    rows = [
        (1, _ts(2024, 1, 1, 9, 0), 1, 100.0, 9),
        (1, _ts(2024, 1, 1, 9, 1), 2, 101.0, 1),
        (1, _ts(2024, 1, 1, 9, 2), 3, 99.0, 2),
        (1, _ts(2024, 1, 1, 9, 3), 4, 99.5, 3),
        (1, _ts(2024, 1, 1, 9, 4), 5, 102.5, 4),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double, volume long"
    )
    out = {r["size_bucket"]: r for r in price_impact_curve(df, n_buckets=2).collect()}
    # size order: vol 1 (move 100), vol 2 (move 200) | vol 3 (50), vol 4 (300)
    assert (out[0]["n_trades"], out[1]["n_trades"]) == (2, 2)
    assert out[0]["avg_volume"] == 1.5 and out[1]["avg_volume"] == 3.5
    assert out[0]["avg_abs_move_c"] == 150.0
    assert out[1]["avg_abs_move_c"] == 175.0


def test_price_impact_curve_rejects_bad_buckets(spark):
    import pytest as _pytest

    from marketstore_spark.operators.quant import price_impact_curve

    df = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_id long, value double, volume long"
    )
    with _pytest.raises(ValueError):
        price_impact_curve(df, n_buckets=0)


def test_language_mix_hand_computed(spark):
    from marketstore_spark.operators.text import language_mix

    rows = [
        (1, "the cat and the dog is here", "en", "A"),   # en markers win
        (2, "el que la los es", "es", "A"),               # es markers win
        (3, "the and is of to in", "es", "A"),            # mislabeled: pred en
        (4, "der die das und ist", "de", "B"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    out = {
        (r["source"], r["predicted_lang"]): r for r in language_mix(df).collect()
    }
    a_en = out[("A", "en")]
    assert (a_en["n_docs"], a_en["n_label_match"]) == (2, 1)  # doc 3 disagrees
    assert a_en["share"] == 2.0 / 3.0
    assert a_en["label_agreement"] == 0.5
    a_es = out[("A", "es")]
    assert (a_es["n_docs"], a_es["n_label_match"]) == (1, 1)
    b_de = out[("B", "de")]
    assert b_de["share"] == 1.0 and b_de["label_agreement"] == 1.0


def test_move_percentiles_signed_interpolation(spark):
    from marketstore_spark.operators.quant import move_percentiles

    # daily closes 100, 98, 101, 99, 103 -> moves -200, +300, -200, +400
    # sorted: [-200, -200, 300, 400]; n=4
    closes = [100.0, 98.0, 101.0, 99.0, 103.0]
    rows = [
        (1, _ts(2024, 1, 1 + i, 12), i + 1, c) for i, c in enumerate(closes)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    r = move_percentiles(df).collect()[0]
    assert (r["n_moves"], r["min_move_c"], r["max_move_c"]) == (4, -200, 400)
    # p01: rank 0.03 -> (-200*97 + -200*3)/100 = -200
    assert r["p01_move_c"] == -200.0
    # p50: rank 1.5 -> (-200*1 + 300*1)/2 = 50
    assert r["p50_move_c"] == 50.0
    # p99: rank 2.97 -> (300*3 + 400*97)/100
    assert r["p99_move_c"] == (300 * 3 + 400 * 97) / 100.0


def test_market_concentration_hand_computed(spark):
    from marketstore_spark.operators.quant import market_concentration

    # one day, 2 symbols: dv = 100.00*10 = 100000c and 100.00*30 = 300000c
    rows = [
        (1, _ts(2024, 1, 1, 10), 1, 100.0, 10),
        (2, _ts(2024, 1, 1, 11), 2, 100.0, 30),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double, volume long"
    )
    r = market_concentration(df).collect()[0]
    assert (r["n_symbols"], r["total_dv_c"]) == (2, 400000)
    dv2 = 100000**2 + 300000**2
    assert r["hhi"] == round(dv2 / 400000.0**2, 6)  # 0.625
    assert r["effective_symbols"] == round(400000.0**2 / dv2, 6)  # 1.6
    assert r["top_share"] == 300000.0 / 400000.0


def test_market_concentration_single_symbol(spark):
    from marketstore_spark.operators.quant import market_concentration

    rows = [(1, _ts(2024, 1, 1, 10), 1, 50.0, 7)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double, volume long"
    )
    r = market_concentration(df).collect()[0]
    assert r["hhi"] == 1.0 and r["effective_symbols"] == 1.0
    assert r["top_share"] == 1.0


def test_dedup_rate_by_source_hand_computed(spark):
    from marketstore_spark.operators.dedup import dedup_rate_by_source

    rows = [
        (1, "Hello  World", "A"),
        (2, "hello world", "A"),   # normalized duplicate of doc 1
        (3, "something else", "A"),
        (4, "hello world", "B"),   # cross-source copy counts per-source
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["source"]: r for r in dedup_rate_by_source(df).collect()}
    a = out["A"]
    assert (a["n_docs"], a["n_distinct"], a["n_removable"]) == (3, 2, 1)
    assert a["dup_rate"] == 1.0 / 3.0
    b = out["B"]
    assert (b["n_docs"], b["n_distinct"], b["n_removable"]) == (1, 1, 0)
    assert b["dup_rate"] == 0.0


def test_acf_spectrum_lag1_matches_autocorr_and_model(spark, sf_dir):
    from marketstore_spark.catalog import load_table
    from marketstore_spark.operators.quant import acf_spectrum, autocorr_returns

    ev = load_table(spark, sf_dir, "events")
    spec = {
        (r["symbol"], r["lag"]): r for r in acf_spectrum(ev, lags=(1, 2)).collect()
    }
    ac = {r["symbol"]: r for r in autocorr_returns(ev).collect()}
    assert ac
    for sym, want in ac.items():
        r = spec[(sym, 1)]
        assert r["n_pairs"] == want["n_pairs"]
        assert r["acf"] == want["autocorr"]
    # every symbol carries one row per requested lag
    syms = {s for s, _ in spec}
    assert all((s, 2) in spec for s in syms)


def test_acf_spectrum_rejects_bad_lags(spark):
    import pytest as _pytest

    from marketstore_spark.operators.quant import acf_spectrum

    df = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_id long, value double"
    )
    with _pytest.raises(ValueError):
        acf_spectrum(df, lags=(0, 1))


def test_substring_dup_spans_offset_and_merge(spark):
    from marketstore_spark.operators.dedup import substring_dup_spans

    # Docs 1 and 2 share an 6-word boilerplate at DIFFERENT offsets —
    # the non-overlapping span dedup can straddle it, the overlapping
    # k-gram detector must not.  k=3: positions whose 3-gram repeats
    # corpus-wide merge into one maximal span covering the shared text.
    shared = "one two three four five six"
    rows = [
        (1, f"{shared} tail1 tail2 tail3"),
        (2, f"head1 {shared} tail4 tail5"),          # shifted by 1 word
        (3, "alpha beta gamma delta epsilon zeta"),  # unique
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["start_word"], r["end_word"], r["width_words"])
        for r in substring_dup_spans(df, k=3).collect()
    }
    # doc 1: words [0, 6) shared → positions 0..3 duplicated → span [0, 6)
    assert out[1] == (0, 6, 6)
    # doc 2: words [1, 7) shared → positions 1..4 duplicated → span [1, 7)
    assert out[2] == (1, 7, 6)
    assert 3 not in out


def test_substring_dup_spans_within_doc_and_split_runs(spark):
    from marketstore_spark.operators.dedup import substring_dup_spans

    # A 3-gram repeated WITHIN one doc counts as duplicated (Lee et al.
    # semantics), and two separated repeats yield two maximal spans.
    rows = [(1, "a b c x y z q a b c")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = sorted(
        (r["start_word"], r["end_word"]) for r in substring_dup_spans(df, k=3).collect()
    )
    assert out == [(0, 3), (7, 10)]


def test_event_funnel_window_and_order_semantics(spark):
    from marketstore_spark.operators.funnel import event_funnel

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def at(sec):
        return datetime(2024, 1, 1, 0, 0, 0) if sec == 0 else datetime.fromtimestamp(
            t0.timestamp() + sec
        )

    rows = [
        # user 10: full chain inside the window
        (1, at(0), 10, "view"),
        (2, at(10), 10, "click"),
        (3, at(20), 10, "purchase"),
        # user 20: click BEFORE view — order violated, depth 1
        (4, at(5), 20, "click"),
        (5, at(6), 20, "view"),
        # user 30: click lands past the window anchor → depth 1
        (6, at(0), 30, "view"),
        (7, at(200), 30, "click"),
        # user 40: never does step 1
        (8, at(0), 40, "purchase"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {
        r["step_name"]: r["users"]
        for r in event_funnel(
            df, ["view", "click", "purchase"], window_us=100 * 1_000_000
        ).collect()
    }
    assert out == {"view": 3, "click": 1, "purchase": 1}
    # unwindowed: user 30's late click now counts
    out2 = {
        r["step_name"]: r["users"]
        for r in event_funnel(df, ["view", "click", "purchase"]).collect()
    }
    assert out2 == {"view": 3, "click": 2, "purchase": 1}


def test_retention_cohorts_hand_computed(spark):
    from marketstore_spark.operators.funnel import retention_cohorts

    # Weeks of 2024-01: Mon 2024-01-01, 2024-01-08, 2024-01-15.
    rows = [
        (1, datetime(2024, 1, 2), 100),   # cohort wk0
        (2, datetime(2024, 1, 9), 100),   # active wk1
        (3, datetime(2024, 1, 16), 100),  # active wk2
        (4, datetime(2024, 1, 3), 200),   # cohort wk0, never returns
        (5, datetime(2024, 1, 10), 300),  # cohort wk1
        (6, datetime(2024, 1, 17), 300),  # active wk2
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    out = {
        (str(r["cohort_week"]), r["week_offset"]): (
            r["users"],
            r["cohort_size"],
            r["retained_frac"],
        )
        for r in retention_cohorts(df).collect()
    }
    assert out[("2024-01-01", 0)] == (2, 2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 2, 0.5)
    assert out[("2024-01-01", 2)] == (1, 2, 0.5)
    assert out[("2024-01-08", 0)] == (1, 1, 1.0)
    assert out[("2024-01-08", 1)] == (1, 1, 1.0)
    assert len(out) == 5


def test_event_transitions_counts_and_shares(spark):
    from marketstore_spark.operators.funnel import event_transitions

    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 10, "view"),
        (2, datetime(2024, 1, 1, 0, 0, 1), 10, "click"),
        (3, datetime(2024, 1, 1, 0, 0, 2), 10, "view"),
        (4, datetime(2024, 1, 1, 0, 0, 3), 10, "click"),
        # same timestamp → event_id tie-break decides the order
        (5, datetime(2024, 1, 1, 0, 0, 0), 20, "view"),
        (6, datetime(2024, 1, 1, 0, 0, 0), 20, "purchase"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {
        (r["from_type"], r["to_type"]): (r["transitions"], r["from_share"])
        for r in event_transitions(df).collect()
    }
    assert out[("view", "click")] == (2, 2.0 / 3.0)
    assert out[("view", "purchase")] == (1, 1.0 / 3.0)
    assert out[("click", "view")] == (1, 1.0)
    assert len(out) == 3


def test_substring_dup_rate_by_source_hand_computed(spark):
    from marketstore_spark.operators.dedup import substring_dup_rate_by_source

    shared = "one two three four five six"  # 6 words, k=3 → full cover
    rows = [
        (1, f"{shared} tailA tailB", "A"),    # 8 words, 6 duplicated
        (2, f"headX {shared}", "B"),          # 7 words, 6 duplicated
        (3, "alpha beta gamma delta", "B"),   # 4 words, none duplicated
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["source"]: r for r in substring_dup_rate_by_source(df, k=3).collect()}
    a = out["A"]
    assert (a["n_docs"], a["total_words"], a["dup_span_words"]) == (1, 8, 6)
    assert a["dup_word_rate"] == 6.0 / 8.0
    b = out["B"]
    assert (b["n_docs"], b["total_words"], b["dup_span_words"]) == (2, 11, 6)
    assert b["dup_word_rate"] == 6.0 / 11.0


def test_active_users_window_hand_computed(spark):
    from marketstore_spark.operators.funnel import active_users_window

    rows = [
        (1, datetime(2024, 1, 1, 5), 100),
        (2, datetime(2024, 1, 1, 9), 200),
        (3, datetime(2024, 1, 2, 5), 100),   # user 100 active both days
        (4, datetime(2024, 1, 5, 5), 300),   # gap day; 1/1 still in 1/5's window
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    out = {
        r["day"]: (r["dau"], r["window_users"], r["stickiness"])
        for r in active_users_window(df, window_days=3).collect()
    }
    # day 1/1: dau 2, window {100,200}; 1/2: dau 1, window {100,200};
    # 1/5: dau 1, window = users active in [1/3..1/5] = {300} only
    assert out == {
        "2024-01-01": (2, 2, 1.0),
        "2024-01-02": (1, 2, 0.5),
        "2024-01-05": (1, 1, 1.0),
    }
    assert len(out) == 3  # only observed activity days reported


def test_pq_recall_vs_brute_force_and_exhaustive_invariant(spark, sf_dir):
    """ann_pq: the 8×16 codebook ADC prune at rerank=4 must recover a
    solid share of the true top-5, and with rerank·k ≥ corpus (every
    row survives the prune) the exact re-rank must EQUAL brute force —
    the PQ analogue of IVF's nprobe == nlist invariant."""
    from marketstore_spark.catalog import load_table
    from marketstore_spark.operators.simsearch import brute_force_topk, pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(emb, q, k=5, m=8, ksub=16, rerank=4).collect()
    }
    recall = len(truth & approx) / len(truth)
    # the test embeddings are near-random (no cluster structure — the
    # hardest PQ case); 0.4 matches the IVF pin at the same k
    assert recall >= 0.4, f"PQ recall too low: {recall:.2f}"

    full = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in pq_topk(emb, q, k=5, m=8, ksub=16, rerank=500).collect()
    }
    exact = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    assert full == exact


def test_ngram_containment_detects_embedded_quote(spark):
    from marketstore_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "to be or not to be that is the question"
    host = (
        "the prince ponders aloud saying "
        + quote
        + " while the court watches in silence from the gallery above"
    )
    rows = [
        (1, quote),
        (2, host),
        (3, "completely unrelated text about market data engines"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in ngram_containment_pairs(df, n=3, threshold=0.9).collect()
    }
    # every 3-gram of the quote appears in the host → containment 1.0
    assert (1, 2) in got and got[(1, 2)]["containment"] == 1.0
    assert got[(1, 2)]["inter"] == got[(1, 2)]["size_a"]
    assert len(got) == 1
    # ...while Jaccard at the near-dup threshold misses the pair
    assert not ngram_jaccard_pairs(df, n=3, threshold=0.8).collect()


def test_event_anomaly_hand_computed(spark):
    from marketstore_spark.operators.funnel import event_anomaly

    # 5 days of 'error': 10,10,10,10,30 → mean 14, pop σ = 8 → z(30)=2.0
    rows = []
    eid = 0
    for d, cnt in zip(range(1, 6), [10, 10, 10, 10, 30]):
        for _ in range(cnt):
            rows.append((eid, datetime(2024, 1, d, 12), 1, "error"))
            eid += 1
    # 'view' flat at 5/day — never anomalous
    for d in range(1, 6):
        for _ in range(5):
            rows.append((eid, datetime(2024, 1, d, 12), 1, "view"))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {(r["event_type"], r["day"]): r for r in event_anomaly(df, 2.0).collect()}
    assert list(out) == [("error", "2024-01-05")]
    r = out[("error", "2024-01-05")]
    assert r["cnt"] == 30
    assert r["zscore"] == 2.0  # exact: (5*30-70)/sqrt(5*1500-70^2) = 80/40


def test_ngram_novelty_by_source_hand_computed(spark):
    from marketstore_spark.operators.dedup import ngram_novelty_by_source

    rows = [
        (1, "a b c d", "A"),        # grams: abc, bcd — both first here
        (2, "a b c e", "B"),        # grams: abc (seen), bce (novel)
        (3, "a b c d", "B"),        # exact copy: zero novel
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["source"]: r for r in ngram_novelty_by_source(df, n=3).collect()}
    a, b = out["A"], out["B"]
    assert (a["n_docs"], a["total_grams"], a["novel_grams"]) == (1, 2, 2)
    assert a["novelty_rate"] == 1.0
    assert (b["n_docs"], b["total_grams"], b["novel_grams"]) == (2, 4, 1)
    assert b["novelty_rate"] == 0.25


def test_session_cooccurrence_hand_computed(spark):
    from marketstore_spark.operators.funnel import session_cooccurrence

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def at(sec):
        return datetime(2024, 1, 1, 0, 0, 0) + __import__("datetime").timedelta(
            seconds=sec
        )

    rows = [
        # user 1, session A: view+click; session B (gap > 30min): view only
        (1, at(0), 1, "view"),
        (2, at(10), 1, "click"),
        (3, at(10_000), 1, "view"),
        # user 2, one session: view+click+view (duplicate type collapses)
        (4, at(0), 2, "view"),
        (5, at(5), 2, "click"),
        (6, at(9), 2, "view"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {
        (r["type_a"], r["type_b"]): r for r in session_cooccurrence(df).collect()
    }
    # 3 sessions; view in 3, click in 2, co-present in 2
    r = out[("click", "view")]
    assert (r["n_ab"], r["n_a"], r["n_b"]) == (2, 2, 3)
    assert r["lift"] == (3 * 2) / (2 * 3)  # exactly 1.0
    assert len(out) == 1


def test_session_cooccurrence_adversarial_type_names(spark):
    """Event types named '__SESSION__' or '' are ordinary types: the
    kind-tag column (not an in-band sentinel) classifies rows, so N and
    every lift stay exact (VERDICT r09 item 2)."""
    from marketstore_spark.operators.funnel import session_cooccurrence

    def at(sec):
        return datetime(2024, 1, 1, 0, 0, 0) + __import__("datetime").timedelta(
            seconds=sec
        )

    rows = [
        # user 1, one session: '__SESSION__' + 'view'
        (1, at(0), 1, "__SESSION__"),
        (2, at(5), 1, "view"),
        # user 2, one session: '' + 'view'
        (3, at(0), 2, ""),
        (4, at(5), 2, "view"),
        # user 3, one session: 'view' alone (bumps N to 3)
        (5, at(0), 3, "view"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {
        (r["type_a"], r["type_b"]): r for r in session_cooccurrence(df).collect()
    }
    # N=3 sessions; '__SESSION__' in 1, '' in 1, 'view' in 3
    r = out[("__SESSION__", "view")]
    assert (r["n_ab"], r["n_a"], r["n_b"]) == (1, 1, 3)
    assert r["lift"] == (3 * 1) / (1 * 3)
    r = out[("", "view")]
    assert (r["n_ab"], r["n_a"], r["n_b"]) == (1, 1, 3)
    assert len(out) == 2


def test_ngram_hot_gram_stress_bounded_buffers(spark):
    """A boilerplate gram shared by 20k documents (2000x the cap) must
    neither OOM nor surface: the doc-frequency window prunes it before
    collect_set, so the only posting lists built are <= max_doc_freq.
    At 100 TB the same plan holds at 10^8 sites because the window
    group spills to disk instead of growing an aggregation buffer
    (the buffer-bound argument; the count is what matters, not this
    test's absolute size)."""
    from marketstore_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "all rights reserved worldwide"
    rows = [(i, f"{boiler} unique{i} token{i} tail{i}") for i in range(20_000)]
    # two true near-dups that must still be found
    rows += [(90_001, "alpha beta gamma delta epsilon"),
             (90_002, "alpha beta gamma delta epsilon")]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)
    got = ngram_jaccard_pairs(df, n=3, threshold=0.8, max_doc_freq=10).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in got}
    assert (90_001, 90_002) in pairs
    # no boilerplate-driven pair survives (the shared grams were pruned)
    assert all(a >= 90_000 for a, b in pairs), sorted(pairs)[:5]


def test_zipf_fit_perfect_zipf_slope(spark):
    from marketstore_spark.operators.text import zipf_fit

    # a perfect Zipf-1 corpus: term t_r appears floor(120/r) times →
    # log-log regression over the 6-term head must slope ≈ −1
    words = []
    for r, term in enumerate(["t1", "t2", "t3", "t4", "t5", "t6"], start=1):
        words += [term] * (120 // r)
    df = spark.createDataFrame([(1, " ".join(words), "Z")],
                               ["doc_id", "text", "source"])
    r = zipf_fit(df, top_k=1000).collect()[0]
    assert r["source"] == "Z" and r["n_terms"] == 6
    assert -1.05 < r["zipf_slope"] < -0.95


def test_dedup_funnel_stage_priority_and_cumulative_counts(spark):
    from marketstore_spark.operators.dedup import dedup_funnel

    boiler = " ".join(f"x{i}" for i in range(10))     # 10 words
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))  # noqa: E731
    rows = [
        (1, "alpha beta gamma delta", "A"),
        (2, "ALPHA  beta   gamma DELTA", "A"),  # exact dup (normalized) → stage 1
        (3, f"{boiler} {uniq('t', 3)}", "A"),   # 10/13 words duplicated → stage 2
        (4, f"{boiler} {uniq('u', 3)}", "A"),   # 〃 (the boiler's other site)
        # near-dup pair: 12 shared words + 1 differing → jaccard > 0.8,
        # substring rate 10/13 < ... wait keep them below the span rate:
        (5, uniq("v", 30) + " endA", "B"),
        (6, uniq("v", 30) + " endB", "B"),      # stage 3 candidate (larger id)
        (7, "totally unrelated text here", "B"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    # docs 5/6 share a 30-word prefix → their substring rate is high
    # too, so they fall to stage 2 by priority; drive stage 3 with a
    # k large enough that no 12-gram repeats but 3-gram jaccard holds
    out = {
        r["stage"]: r for r in dedup_funnel(df, k=40, span_rate=0.3).collect()
    }
    assert out[1]["docs_removed"] == 1          # doc 2
    # with k=40 no substring spans exist → stage 2 empty
    assert out[2]["docs_removed"] == 0
    assert out[3]["docs_removed"] == 1          # doc 6 (larger id of the pair)
    assert out[3]["docs_remaining"] == 5
    # words_remaining = total - removed docs' words
    total_words = sum(len(t.split()) for _, t, _ in rows)
    removed_words = len(rows[1][1].split()) + len(rows[5][1].split())
    assert out[3]["words_remaining"] == total_words - removed_words


def test_ivfpq_recall_and_double_vacuous_invariant(spark, sf_dir):
    """ann_ivfpq: coarse pruning (4/16 lists) stacked on ADC pruning
    must still recover a solid share of the true top-5, and with BOTH
    prunes vacuous (nprobe == nlist, rerank·k ≥ corpus) the result must
    EQUAL brute force — the composed analogue of the IVF and PQ
    invariants."""
    from marketstore_spark.catalog import load_table
    from marketstore_spark.operators.simsearch import brute_force_topk, ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_topk(emb, q, k=5, nlist=16, nprobe=4, rerank=4).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.3, f"IVF+PQ recall too low: {recall:.2f}"

    full = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in ivfpq_topk(
            emb, q, k=5, nlist=16, nprobe=16, rerank=500
        ).collect()
    }
    exact = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    assert full == exact


def test_rfm_segments_hand_computed(spark):
    from marketstore_spark.operators.funnel import rfm_segments

    # 5 users with strictly ordered metrics → each lands in its own
    # quintile on every axis; user u's last day = Jan u, count = u,
    # per-event value = u dollars
    rows = []
    eid = 0
    for u in range(1, 6):
        for i in range(u):
            rows.append((eid, datetime(2024, 1, u, 12), u, float(u)))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    out = {
        (r["r_score"], r["f_score"], r["m_score"]): r
        for r in rfm_segments(df).collect()
    }
    # user 5: most recent (r=1), most events (f=1), highest spend (m=1)
    assert out[(1, 1, 1)]["n_users"] == 1
    assert out[(1, 1, 1)]["segment_cents"] == 5 * 500  # 5 events × $5
    # user 1: oldest, fewest, lowest → (5, 5, 5)
    assert out[(5, 5, 5)]["n_users"] == 1
    assert out[(5, 5, 5)]["segment_cents"] == 100
    assert len(out) == 5  # perfectly anti-diagonal grid
    assert all(r == f == m for (r, f, m) in out)


def test_dsir_weights_rank_target_domain_higher(spark):
    """DSIR behavioral contract (Xie 2023): documents drawn from the
    target domain's vocabulary island must carry higher importance
    weights than documents from a disjoint island, and an unseen-vocab
    doc sits between (pure smoothing mass on the target side vs real
    probability mass on the raw side)."""
    from pyspark.sql import functions as F

    from marketstore_spark.operators.text import dsir_weights

    rows = (
        [(i, "alpha beta gamma beta alpha", "tgt") for i in range(5)]
        + [(10 + i, "delta epsilon zeta epsilon", "other") for i in range(5)]
        + [(20, "alpha beta gamma", "other")]  # target-vocab doc, other source
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {
        r["doc_id"]: r["log_w"]
        for r in dsir_weights(df, F.col("source") == "tgt").collect()
    }
    # target-island docs: positive weight; disjoint island: negative
    assert out[0] > 0 > out[10]
    # a doc written in the target's vocabulary scores target-like even
    # though its own source label isn't the target
    assert out[20] > 0
    # per-token normalization exists and is finite everywhere
    assert all(abs(v) < 100 for v in out.values())


def test_dsir_weights_hashed_matches_contract_and_bounded_state(spark):
    """The hashed estimator keeps the plain variant's ORDERING
    contract (target island above target-vocab doc above disjoint
    island) while its count state is capped at B buckets; with
    vocab << B and no md5-bucket collisions the two variants differ
    ONLY in the smoothing denominator (N+V vs N+B), which preserves
    per-token rank but NOT absolute sign at toy scale (B=4096 >> N
    deflates every smoothed target probability), so the pins below
    are ordering pins."""
    from pyspark.sql import functions as F

    from marketstore_spark.operators.text import (
        dsir_weights,
        dsir_weights_hashed,
    )

    rows = (
        [(i, "alpha beta gamma beta alpha", "tgt") for i in range(5)]
        + [(10 + i, "delta epsilon zeta epsilon", "other") for i in range(5)]
        + [(20, "alpha beta gamma", "other")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    tgt = F.col("source") == "tgt"
    hashed = {
        r["doc_id"]: r for r in dsir_weights_hashed(df, tgt).collect()
    }
    # ordering contract per token: target island > target-vocab doc
    # from another source > disjoint island
    assert hashed[0]["avg_log_w"] > hashed[10]["avg_log_w"]
    assert hashed[20]["avg_log_w"] > hashed[10]["avg_log_w"]
    # token counts ride through the bucketing unchanged
    plain = {r["doc_id"]: r for r in dsir_weights(df, tgt).collect()}
    assert all(
        hashed[d]["n_tokens"] == plain[d]["n_tokens"] for d in hashed
    )
    # rank extremes over the islands are preserved under hashing
    rank = sorted(hashed, key=lambda d: hashed[d]["avg_log_w"])
    assert rank[0] in range(10, 15) and rank[-1] in range(5)
    # collision behavior is deterministic, not an error: B=1 folds the
    # whole vocabulary into one bucket -> both LMs identical -> all 0
    one = {
        r["doc_id"]: r["log_w"]
        for r in dsir_weights_hashed(df, tgt, num_buckets=1).collect()
    }
    assert all(v == 0.0 for v in one.values())


def test_gopher_rules_flag_semantics(spark):
    """Rule battery behavioral pins: a clean prose doc passes, a
    symbol-heavy doc fails the symbol rule, a bullet-list doc fails
    the bullet rule, and the duplicate-line fraction sees repeats."""
    from marketstore_spark.operators.text import gopher_rules

    prose = ("the quick brown fox jumps over the lazy dog and then "
             "runs off to be with the pack that have gone ahead ") * 3
    bullets = "intro line\n" + "\n".join(f"- item {i}" for i in range(20))
    symbols = "#### ## # word " * 10
    dups = "same line\nsame line\nsame line\nother line"
    df = spark.createDataFrame(
        [(1, prose), (2, bullets), (3, symbols), (4, dups), (5, "")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert out[1]["gopher_pass"] == 1
    assert out[1]["pass_stopwords"] == 1 and out[1]["pass_alpha_words"] == 1
    assert out[2]["pass_bullet_lines"] == 0  # 20/21 lines bullet-started
    assert out[3]["pass_symbol_ratio"] == 0
    assert out[4]["dup_line_frac"] == pytest.approx(0.5)  # 2 dup of 4
    assert out[5]["n_words"] == 0 and out[5]["gopher_pass"] == 0
    assert out[5]["mean_word_len"] is None  # guarded division


def test_c4_clean_line_and_page_rules(spark):
    """C4 recipe pins (Raffel 2020 s2.2): terminal-punctuation lines
    with >=3 words survive, javascript/short/unpunctuated lines drop,
    lorem-ipsum and brace pages are rejected, and the cleaned text is
    the surviving lines rejoined in order."""
    from marketstore_spark.operators.text import c4_clean

    good = ("This is the first real sentence of prose.\n"
            "short line\n"
            "Please enable javascript to view this page.\n"
            "Another proper sentence follows right here!\n"
            "no punctuation at the end\n"
            "Is this a question with enough words?\n"
            "More sentences. Even more. And more. Sure thing.")
    lorem = "Lorem ipsum dolor sit amet. " * 10
    brace = "A sentence with code { inside it. " * 10
    df = spark.createDataFrame(
        [(1, good), (2, lorem), (3, brace)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in c4_clean(df).collect()}
    r = out[1]
    assert r["clean_text"].split("\n") == [
        "This is the first real sentence of prose.",
        "Another proper sentence follows right here!",
        "Is this a question with enough words?",
        "More sentences. Even more. And more. Sure thing.",
    ]
    assert (r["n_lines"], r["n_lines_kept"]) == (7, 4)
    assert r["keep_doc"] == 1 and r["n_sentences"] >= 5
    assert out[2]["has_lorem_ipsum"] == 1 and out[2]["keep_doc"] == 0
    assert out[3]["has_brace"] == 1 and out[3]["keep_doc"] == 0
