"""Property tests (hypothesis) for bucket-boundary semantics.

Reference test strategy: contrib/candler/*/all_test.go exercises candle
bucket edges and tie handling; executor/all_test.go exercises boundary
epochs.  Here hypothesis generates arbitrary small tick sets and the
Spark results are checked against a direct Python model of the same
semantics — open/high/low/close per bucket with deterministic
tie-breaks, and gapfill's dense-contiguous-grid + forward-fill
contract.
"""

import datetime as dt
from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from marketstore_spark.operators.candler import tick_candles
from marketstore_spark.operators.gapfill import gapfill_ffill

EPOCH0 = dt.datetime(2024, 3, 1, 0, 0, 0)
BUCKET_S = 300  # 5Min

tick = st.tuples(
    st.integers(min_value=0, max_value=3600),  # offset seconds within an hour
    st.integers(min_value=-50, max_value=50),  # value
)
tickset = st.lists(tick, min_size=1, max_size=40)


def _mk_df(spark, ticks):
    rows = [
        (i, EPOCH0 + dt.timedelta(seconds=off), 1, float(v))
        for i, (off, v) in enumerate(ticks)
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")


def _python_candles(ticks):
    """Direct model: bucket by floor(offset/300); open/close by
    (offset, event_id) order; high/low by value."""
    buckets = defaultdict(list)
    for i, (off, v) in enumerate(ticks):
        buckets[off // BUCKET_S].append((off, i, float(v)))
    out = {}
    for b, rows in buckets.items():
        rows.sort(key=lambda r: (r[0], r[1]))
        vals = [r[2] for r in rows]
        out[b] = (rows[0][2], max(vals), min(vals), rows[-1][2])
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(ticks=tickset)
def test_tick_candles_match_python_model(spark, ticks):
    got = {
        int((r["epoch"] - EPOCH0).total_seconds()) // BUCKET_S: (
            r["open"], r["high"], r["low"], r["close"]
        )
        for r in tick_candles(_mk_df(spark, ticks), "5Min").collect()
    }
    assert got == _python_candles(ticks)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(ticks=tickset)
def test_gapfill_contiguous_and_ffilled(spark, ticks):
    out = gapfill_ffill(_mk_df(spark, ticks), "5Min", agg="max").collect()
    rows = sorted((r["epoch"], r["value"], r["filled"]) for r in out)
    epochs = [e for e, _, _ in rows]
    # dense contiguous grid from first to last bucket
    assert all(
        (b - a).total_seconds() == BUCKET_S for a, b in zip(epochs, epochs[1:])
    )
    model = _python_candles(ticks)  # high == max per bucket
    lo = min(model)
    prev = None
    for e, v, filled in rows:
        b = int((e - EPOCH0).total_seconds()) // BUCKET_S
        if b in model:
            assert filled == 0 and v == model[b][1]
        else:
            assert filled == 1 and v == prev
        prev = v


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(ticks=tickset)
def test_finance_idiom_invariants(spark, ticks):
    """Indicator invariants on arbitrary tick sets: drawdown ≤ 0 with
    peak = running max, bollinger lower ≤ mid ≤ upper with mid inside
    the window's [min, max], RSI in [0, 100] (100 iff no losses)."""
    from marketstore_spark.queries import SPARK_QUERIES
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        _mk_df(spark, ticks).withColumn(
            "event_type", F.lit("t")
        ).withColumn("props", F.lit("{}")).write.parquet(os.path.join(d, "events.parquet"))

        dd = SPARK_QUERIES["drawdown"](spark, d).collect()
        for r in dd:
            if r["peak"] > 0:
                assert r["drawdown"] <= 0
            else:  # non-positive peak: undefined, never an ANSI abort
                assert r["drawdown"] is None

        bb = SPARK_QUERIES["bollinger"](spark, d).collect()
        for r in bb:
            assert r["lower"] <= r["mid"] + 1e-9 and r["mid"] <= r["upper"] + 1e-9

        rs = SPARK_QUERIES["rsi"](spark, d).collect()
        for r in rs:
            if r["rsi14"] is not None:
                assert -1e-9 <= r["rsi14"] <= 100 + 1e-9


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lefts=st.lists(st.integers(min_value=0, max_value=3600), min_size=1, max_size=20),
    rights=st.lists(
        st.tuples(st.integers(min_value=0, max_value=3600), st.integers(-50, 50)),
        min_size=0,
        max_size=20,
    ),
)
def test_asof_join_matches_bisect_model(spark, lefts, rights):
    """asof_join == per-row bisect over the sorted right side (the
    textbook definition), including duplicate timestamps (latest right
    at equal ts wins) and no-prior-row nulls."""
    import bisect

    from marketstore_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(1, EPOCH0 + dt.timedelta(seconds=off), i) for i, off in enumerate(lefts)],
        "user_id long, ts timestamp, order_id long",
    )
    rdf = spark.createDataFrame(
        [(1, EPOCH0 + dt.timedelta(seconds=off), float(v), i) for i, (off, v) in enumerate(rights)],
        "user_id long, ts timestamp, px double, rid long",
    )
    got = {
        r["order_id"]: r["px"]
        for r in asof_join(
            ldf, rdf, on=["user_id"], left_ts="ts", right_ts="ts", value_cols=["px"]
        ).collect()
    }
    # model: latest right with ts <= left ts; ties among equal right ts
    # resolve to the one latest in (ts, rid) window order
    rs = sorted((off, i, float(v)) for i, (off, v) in enumerate(rights))
    rts = [r[0] for r in rs]
    for i, off in enumerate(lefts):
        j = bisect.bisect_right(rts, off)
        want = rs[j - 1][2] if j else None
        assert got[i] == want, (i, off, got[i], want)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    points=st.lists(st.integers(-5_000_000, 5_000_000), min_size=1, max_size=40),
    ivs=st.lists(
        st.tuples(st.integers(-5_000_000, 5_000_000), st.integers(0, 500_000)),
        min_size=1,
        max_size=12,
    ),
    bucket=st.sampled_from([3600, 86400, 100_000]),
)
def test_interval_join_matches_naive_incl_pre_epoch(spark, points, ivs, bucket):
    """Bucket-blocked interval join == the naive O(n·m) definition on
    BOTH sides of the 1970 epoch (truncation-vs-floor bucketing would
    drop matches for negative epoch seconds)."""
    from marketstore_spark.operators.rangejoin import interval_join

    # anchored at 1970 so offsets straddle epoch 0 (negative unix micros)
    base = dt.datetime(1970, 1, 1)
    pdf = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=off)) for i, off in enumerate(points)],
        "pid long, ts timestamp",
    )
    idf = spark.createDataFrame(
        [
            (j, base + dt.timedelta(seconds=s), base + dt.timedelta(seconds=s + d))
            for j, (s, d) in enumerate(ivs)
        ],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            pdf, idf, ts_col="ts", start_col="start_ts", end_col="end_ts",
            bucket_seconds=bucket,
        ).collect()
    }
    want = {
        (i, j)
        for i, off in enumerate(points)
        for j, (s, d) in enumerate(ivs)
        if s <= off < s + d
    }
    assert got == want


# ---------------------------------------------------------------------
# Codec properties (pure functions — no Spark session needed)
# ---------------------------------------------------------------------

import numpy as np  # noqa: E402

img = st.tuples(
    st.integers(min_value=1, max_value=24),  # height
    st.integers(min_value=1, max_value=24),  # width
    st.integers(min_value=0, max_value=2**32 - 1),  # content seed
)


@given(img)
@settings(max_examples=30, deadline=None)
def test_png_roundtrip_property(spec):
    from marketstore_spark.operators.multimodal import decode_png, encode_png

    h, w, seed = spec
    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_png(encode_png(px)) == px).all()


@given(img)
@settings(max_examples=30, deadline=None)
def test_bmp_roundtrip_property(spec):
    from marketstore_spark.operators.multimodal import decode_bmp, encode_bmp

    h, w, seed = spec
    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(px)) == px).all()


@given(img, st.sampled_from(["444", "420"]))
@settings(max_examples=15, deadline=None)
def test_jpeg_decodes_whatever_it_encodes(spec, sub):
    """JPEG is lossy, so the property is structural: every encodable
    image decodes back to the same shape with all samples in range and
    flat regions preserved within quantization error."""
    from marketstore_spark.operators.jpeg import decode_jpeg, encode_jpeg

    h, w, seed = spec
    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(px, quality=90, subsampling=sub))
    assert dec.shape == (h, w, 3) and dec.dtype == np.uint8


@given(
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=5),
)
@settings(max_examples=20, deadline=None)
def test_avi_roundtrip_property(n, h, w, step):
    from marketstore_spark.operators.video import decode_avi_frames, encode_avi

    frames = np.random.default_rng(n * 1000 + h * 10 + w).integers(
        0, 256, size=(n, h, w, 3), dtype=np.uint8
    )
    got = dict(decode_avi_frames(encode_avi(frames), every_n=step))
    assert sorted(got) == list(range(0, n, step))
    assert all((got[i] == frames[i]).all() for i in got)


@given(
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=4),
    st.booleans(),
)
@settings(max_examples=20, deadline=None)
def test_mp4_raw_roundtrip_property(n, h, w, step, spc, fragmented):
    """ISO-BMFF raw essence is bit-exact for EVERY geometry, sampling
    step, chunk grouping (stsc run shapes), and both layouts (classic
    stbl tables vs moof/traf/trun fragments)."""
    from marketstore_spark.operators.mp4 import decode_mp4_frames, encode_mp4

    frames = np.random.default_rng(n * 999 + h * 13 + w + spc).integers(
        0, 256, size=(n, h, w, 3), dtype=np.uint8
    )
    blob = encode_mp4(
        frames, codec="raw", samples_per_chunk=spc, fragmented=fragmented
    )
    got = dict(decode_mp4_frames(blob, every_n=step))
    assert sorted(got) == list(range(0, n, step))
    assert all((got[i] == frames[i]).all() for i in got)


@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=15, deadline=None)
def test_mjpeg_avi_roundtrip_property(n, h, w, step):
    """MJPEG essence is lossy, so the property is structural (shape,
    dtype, frame indexing incl. odd dimensions) plus flat-field
    accuracy: a constant-color frame decodes within quantization
    error."""
    from marketstore_spark.operators.video import decode_avi_frames, encode_avi

    color = (n * 37 + h * 11 + w) % 240 + 8
    frames = np.full((n, h, w, 3), color, dtype=np.uint8)
    got = dict(decode_avi_frames(encode_avi(frames, codec="MJPG", quality=90), every_n=step))
    assert sorted(got) == list(range(0, n, step))
    for i, px in got.items():
        assert px.shape == (h, w, 3) and px.dtype == np.uint8
        assert np.abs(px.astype(int) - color).max() <= 3


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs_words=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "dd", "eee"]), min_size=1, max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_repetition_stats_matches_bruteforce(spark, docs_words):
    """repetition_stats ≡ the obvious per-doc Python computation."""
    from collections import Counter

    from marketstore_spark.operators.text import repetition_stats

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    out = {
        r["doc_id"]: r
        for r in repetition_stats(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    for i, ws in enumerate(docs_words):
        n = len(ws)
        grams = [" ".join(ws[j : j + 2]) for j in range(n - 1)]
        r = out[i]
        assert r["n_words"] == n
        assert r["dup_word_frac"] == round(1 - len(set(ws)) / n, 6)
        assert r["top_word_frac"] == round(Counter(ws).most_common(1)[0][1] / n, 6)
        if grams:
            assert r["dup_2gram_frac"] == round(1 - len(set(grams)) / len(grams), 6)
        else:
            assert r["dup_2gram_frac"] is None


def test_hash_sample_rate_edges_and_nesting(spark):
    """rate 0 keeps nothing, 256 keeps everything, and lower rates are
    strict subsets of higher ones (same salt → same byte ordering)."""
    from marketstore_spark.operators.sampling import hash_sample

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    assert hash_sample(df, rate_num=0).count() == 0
    assert hash_sample(df, rate_num=256).count() == 500
    lo = {r["doc_id"] for r in hash_sample(df, rate_num=32).collect()}
    hi = {r["doc_id"] for r in hash_sample(df, rate_num=64).collect()}
    assert lo <= hi and len(lo) < len(hi)


# ---------------------------------------------------------------------
# round-5 corpus operators vs direct Python models
# ---------------------------------------------------------------------

_words = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e"]), min_size=0, max_size=24
)
_corpus = st.lists(_words, min_size=1, max_size=8)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_corpus)
def test_span_dedup_matches_python_model(spark, docs):
    """span_dedup_groups == a direct model: non-overlapping w-word
    windows (trailing partial dropped), grouped by content, reported
    iff seen in >= 2 distinct docs."""
    import hashlib

    from marketstore_spark.operators.dedup import span_dedup_groups

    w = 3
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["span_hash"]: (r["n_docs"], r["n_occurrences"], r["first_doc_id"])
        for r in span_dedup_groups(df, span_words=w).collect()
    }

    model = defaultdict(list)  # span text -> [(doc, idx)]
    for i, ws in enumerate(docs):
        for s in range(0, len(ws) - w + 1, w):
            model[" ".join(ws[s:s + w])].append(i)
    want = {}
    for span, ds in model.items():
        if len(set(ds)) >= 2:
            h = hashlib.md5(span.encode()).hexdigest()
            want[h] = (len(set(ds)), len(ds), min(ds))
    assert got == want


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    toks=st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=20),
    cap=st.integers(min_value=1, max_value=8),
)
def test_pack_documents_matches_python_model(spark, toks, cap):
    """pack_documents == the sequential next-fit model, and satisfies
    the packing invariants (offset+tokens <= capacity unless the doc
    alone exceeds it; pack ids contiguous from 0)."""
    from marketstore_spark.operators.sampling import pack_documents

    rows = [(("en"), i, " ".join(["x"] * n) if n else "") for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, text string")
    out = sorted(
        ((r["doc_id"], r["n_tokens"], r["pack_id"], r["pack_offset"])
         for r in pack_documents(df, capacity=cap).collect())
    )
    # direct model
    pack = fill = 0
    want = []
    for i, n in enumerate(toks):
        if i > 0 and fill + n > cap:
            pack += 1
            fill = 0
        want.append((i, n, pack, fill))
        fill += n
    assert out == want
    # invariants
    for _, n, p, off in out:
        assert off == 0 or off + n <= cap
    packs = [p for _, _, p, _ in out]
    assert packs == sorted(packs) and packs[0] == 0


gif_spec = st.tuples(
    st.integers(min_value=1, max_value=3),    # frames
    st.integers(min_value=1, max_value=12),   # h
    st.integers(min_value=1, max_value=12),   # w
    st.integers(min_value=2, max_value=9),    # palette size
)


@settings(max_examples=25, deadline=None)
@given(spec=gif_spec)
def test_gif_roundtrip_property(spec):
    import numpy as np
    from marketstore_spark.operators.gif import decode_gif, encode_gif

    n, h, w, pal = spec
    rng = np.random.RandomState(n * 1000 + h * 100 + w * 10 + pal)
    palette = rng.randint(0, 256, (pal, 3)).astype("uint8")
    frames = palette[rng.randint(0, pal, (n, h, w))]
    got = decode_gif(encode_gif(frames))
    assert got.shape == frames.shape
    assert (got == frames).all()


def test_gif_feature_extraction_through_spark(spark):
    import numpy as np
    from marketstore_spark.operators.gif import encode_gif
    from marketstore_spark.operators.multimodal import extract_features

    frame = np.full((5, 7, 3), 33, np.uint8)
    rows = [(1, "image", "gif", 7, 5, 0, bytearray(encode_gif(frame))),
            (2, "image", "gif", 1, 1, 0, bytearray(b"GIFnot really"))]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, format string, width int, height int, "
        "n_bytes long, payload binary",
    )
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    assert out[1]["decoded_ok"] == 1 and out[1]["feat_dim"] == 32
    assert out[2]["decoded_ok"] == 0  # corrupt payload is data, not a bug


def test_gif_background_color_index_seeds_canvas():
    """Foreign GIFs can set the logical-screen background-color index
    to a non-zero palette entry; uncovered canvas pixels must compose
    from gct[bg], not palette entry 0 (spec 89a §18).  Hand-built 3x3
    GIF, bg=2, single 1x1 frame of palette entry 1 at (0,0)."""
    import struct
    import numpy as np
    from marketstore_spark.operators.gif import decode_gif

    gct = [(10, 10, 10), (20, 20, 20), (30, 30, 30), (40, 40, 40)]
    buf = bytearray(b"GIF89a")
    buf += struct.pack("<HHBBB", 3, 3, 0x81, 2, 0)  # canvas 3x3, GCT(4), bg=2
    for rgb in gct:
        buf += bytes(rgb)
    buf += b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0)  # 1x1 frame at 0,0
    # LZW min-code-size 2: clear(4), literal 1, EOI(5) packed LSB-first
    buf += b"\x02" + b"\x02\x4c\x01" + b"\x00"
    buf += b"\x3b"
    got = decode_gif(bytes(buf))
    assert got.shape == (1, 3, 3, 3)
    want = np.full((3, 3, 3), 30, np.uint8)
    want[0, 0] = (20, 20, 20)
    assert (got[0] == want).all()


# ---------------------------------------------------------------------
# Round-6 operators vs direct Python models
# ---------------------------------------------------------------------


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "bb", "ccc", "d"]), min_size=0, max_size=23),
        min_size=1,
        max_size=8,
    ),
    chunk=st.integers(min_value=1, max_value=6),
)
def test_chunk_documents_matches_python_model(spark, docs, chunk):
    """Chunking == the direct sliding-window model, for every
    (chunk_tokens, stride) combination with stride <= chunk_tokens;
    and with stride == chunk_tokens, re-joining chunks reconstructs
    the tokenized document exactly."""
    from marketstore_spark.operators.sampling import chunk_documents

    stride = max(1, chunk - 1)
    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, chunk_tokens=chunk, stride=stride).collect()
    }
    want = {}
    for i, words in enumerate(docs):
        if not words:
            continue
        for ci, start in enumerate(range(0, len(words), stride)):
            seg = words[start : start + chunk]
            want[(i, ci)] = (" ".join(seg), len(seg))
    assert got == want
    # exact-cover reconstruction at stride == chunk_tokens
    cover = chunk_documents(df, chunk_tokens=chunk, stride=chunk).collect()
    rebuilt = defaultdict(list)
    for r in sorted(cover, key=lambda r: (r["doc_id"], r["chunk_id"])):
        rebuilt[r["doc_id"]].append(r["chunk_text"])
    for i, words in enumerate(docs):
        if words:
            assert " ".join(rebuilt[i]).split(" ") == words


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    ticks=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),       # day
            st.integers(min_value=0, max_value=3),       # symbol
            st.integers(min_value=100, max_value=9999),  # cents
        ),
        min_size=1,
        max_size=40,
    ),
    n=st.integers(min_value=1, max_value=4),
)
def test_atr_matches_python_model(spark, ticks, n):
    """ATR == the direct candle/true-range/rolling-mean model."""
    from marketstore_spark.operators.quant import atr

    rows = [
        (i, dt.datetime(2024, 1, 1 + day, 12, 0, i % 60), sym, c / 100.0)
        for i, (day, sym, c) in enumerate(ticks)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {
        (r["symbol"], r["epoch"].day): (r["tr"], r["atr"])
        for r in atr(df, n=n).collect()
    }
    # direct model
    candles = {}
    for i, (day, sym, c) in enumerate(ticks):
        key = (sym, day)
        h, l, last_i, close = candles.get(key, (c, c, -1, c))
        candles[key] = (max(h, c), min(l, c), max(last_i, i), c if i > last_i else close)
    bysym = defaultdict(list)
    for (sym, day), (h, l, _, c) in sorted(candles.items()):
        bysym[sym].append((day, h, l, c))
    want = {}
    for sym, days in bysym.items():
        trs = []
        prev_c = None
        for day, h, l, c in days:
            tr = h - l if prev_c is None else max(h - l, abs(h - prev_c), abs(l - prev_c))
            trs.append(tr)
            a = round(sum(trs[-n:]) / float(n), 6) if len(trs) >= n else None
            want[(sym, day + 1)] = (tr, a)
            prev_c = c
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60
    ),
    span=st.integers(min_value=2, max_value=30),
)
def test_ema_streaming_fold_bitwise_vs_direct_loop(spark, vals, span):
    """The partition-streaming EMA equals the literal per-row float64
    loop bit for bit, under forced tiny Arrow batches (cross-batch
    carry exercised)."""
    from marketstore_spark.operators.ewm import ema

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=i), 1, float(v))
        for i, (v) in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
        got = {r["event_id"]: r["ema"] for r in ema(df, span=span).collect()}
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    alpha = 2.0 / (span + 1.0)
    beta = 1.0 - alpha
    acc = None
    for i, v in enumerate(vals):
        x = float(v)
        acc = x if acc is None else alpha * x + beta * acc
        assert got[i] == acc  # bitwise


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ticks=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=600),   # ts offset s
            st.integers(min_value=-3, max_value=3),    # price level
            st.integers(min_value=0, max_value=20),    # volume
        ),
        min_size=1,
        max_size=30,
    )
)
def test_tick_rule_matches_direct_model(spark, ticks):
    """tick_rule == the textbook tick test evaluated row by row in
    Python: sign by price change, carry the last resolved sign on flat
    ticks, 0 before any move; cumulative flow is the running sum.
    Narrow price levels force plenty of flat ticks and sign flips."""
    from marketstore_spark.operators.quant import tick_rule

    rows = [
        (i, EPOCH0 + dt.timedelta(seconds=off), 1, float(100 + lvl), v)
        for i, (off, lvl, v) in enumerate(ticks)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double, volume long"
    )
    got = {
        r["event_id"]: (r["side"], r["signed_vol"], r["cum_flow"])
        for r in tick_rule(df).collect()
    }

    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    side, prev, cum = 0, None, 0
    want = {}
    for eid, _ts, _sym, px, vol in ordered:
        if prev is not None and px > prev:
            side = 1
        elif prev is not None and px < prev:
            side = -1
        prev = px
        cum += side * vol
        want[eid] = (side, side * vol, cum)
    assert got == want


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    closes=st.lists(
        st.integers(min_value=1, max_value=2000), min_size=3, max_size=30
    )
)
def test_serial_dependence_family_matches_exact_models(spark, closes):
    """roll_spread / autocorr_returns / variance_ratio(2) vs exact
    unbounded-int models evaluating the SAME final float expressions
    — bitwise, any close path (constant runs force the NULL guards)."""
    import math

    from marketstore_spark.operators.quant import (
        autocorr_returns,
        roll_spread,
        variance_ratio,
    )

    rows = [
        (i, EPOCH0 + dt.timedelta(days=i), 1, float(c))
        for i, c in enumerate(closes)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    m = [(closes[i] - closes[i - 1]) * 100 for i in range(1, len(closes))]
    pairs = [(m[i], m[i - 1]) for i in range(1, len(m))]

    rs = roll_spread(df).collect()
    ac = autocorr_returns(df).collect()
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    num = n * sxy - sx * sy
    assert len(rs) == 1 and rs[0]["n_pairs"] == n
    assert rs[0]["move_autocov"] == float(num) / float(n * n)
    want_spread = (
        2.0 * math.sqrt(float(-num)) / float(n) if num < 0 else None
    )
    assert rs[0]["roll_spread_c"] == want_spread
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    want_ac = (
        float(num) / (math.sqrt(float(vx)) * math.sqrt(float(vy)))
        if vx > 0 and vy > 0
        else None
    )
    assert ac[0]["autocorr"] == want_ac

    vr = variance_ratio(df, q=2).collect()[0]
    mq = [(closes[i] - closes[i - 2]) * 100 for i in range(2, len(closes))]
    n1, sm, smm = len(m), sum(m), sum(v * v for v in m)
    nq, sq, sqq = len(mq), sum(mq), sum(v * v for v in mq)
    v1n = n1 * smm - sm * sm
    vqn = nq * sqq - sq * sq
    want_vr = (
        (float(vqn) * float(n1 * n1))
        / (2.0 * float(nq * nq) * float(v1n))
        if nq > 0 and v1n > 0
        else None
    )
    assert (vr["n1"], vr["nq"]) == (n1, nq)
    assert vr["vr"] == want_vr


def _spark_round6(x):
    """Spark's round(double, 6): HALF_UP on the shortest decimal repr
    (BigDecimal.valueOf) — the exact Python emulation."""
    from decimal import ROUND_HALF_UP, Decimal

    if x is None:
        return None
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    closes=st.lists(st.integers(min_value=1, max_value=2000), min_size=3, max_size=25),
    n=st.integers(min_value=2, max_value=5),
)
def test_kaufman_er_matches_exact_model(spark, closes, n):
    """ER vs an unbounded-int model of the row-based lag/frame
    semantics — bitwise, including warm-up NULLs and zero-path
    flatlines."""
    from marketstore_spark.operators.quant import kaufman_er

    rows = [
        (i, EPOCH0 + dt.timedelta(days=i), 1, float(c))
        for i, c in enumerate(closes)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    c = [v * 100 for v in closes]
    got = {r["epoch"]: r["er"] for r in kaufman_er(df, n=n).collect()}
    assert len(got) == len(c)
    for i, (_, er) in enumerate(sorted(got.items())):
        if i < n:
            assert er is None
            continue
        chg = abs(c[i] - c[i - n])
        path = sum(abs(c[j] - c[j - 1]) for j in range(max(1, i - n + 1), i + 1))
        want = float(chg) / float(path) if path > 0 else None
        assert er == want, (i, er, want)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    prices=st.lists(st.integers(min_value=1, max_value=5000), min_size=2, max_size=30)
)
def test_realized_moments_matches_exact_model(spark, prices):
    """rskew/rkurt vs unbounded-int moment sums evaluating the SAME
    sqrt-only float chain — bitwise; constant runs force the
    zero-variance NULL guard."""
    import math

    from marketstore_spark.operators.quant import realized_moments

    rows = [
        (i, EPOCH0 + dt.timedelta(minutes=i), 1, float(p))
        for i, p in enumerate(prices)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    m = [(prices[i] - prices[i - 1]) * 100 for i in range(1, len(prices))]
    r = realized_moments(df).collect()[0]
    nm = len(m)
    s2 = sum(v * v for v in m)
    s3 = sum(v * v * v for v in m)
    s4 = sum(v * v * v * v for v in m)
    assert r["n_moves"] == nm
    if nm < 2 or s2 == 0:
        assert r["rskew"] is None and r["rkurt"] is None
    else:
        assert r["rskew"] == math.sqrt(float(nm)) * float(s3) / (
            math.sqrt(float(s2)) * float(s2)
        )
        assert r["rkurt"] == float(nm) * float(s4) / (float(s2) * float(s2))


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "cc", "dd", "e"]), min_size=1, max_size=8
        ),
        min_size=1,
        max_size=10,
    )
)
def test_source_token_stats_matches_counter_model(spark, docs):
    """Per-source vocabulary profile vs a Python Counter model —
    exact counts and the 6dp-rounded Simpson / effective-vocab
    doubles (Spark-rounding emulation)."""
    from collections import Counter

    from marketstore_spark.operators.text import source_token_stats

    rows = [(i, " ".join(words), "S") for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    r = source_token_stats(df).collect()[0]
    cnt = Counter(w for words in docs for w in words)
    n = sum(cnt.values())
    c2 = sum(c * c for c in cnt.values())
    assert r["n_tokens"] == n
    assert r["vocab"] == len(cnt)
    assert r["n_hapax"] == sum(1 for c in cnt.values() if c == 1)
    top = max(cnt.items(), key=lambda kv: (kv[1], kv[0]))
    assert (r["top_tok"], r["top_count"]) == top
    assert r["simpson"] == _spark_round6(float(c2) / (float(n) * float(n)))
    assert r["effective_vocab"] == _spark_round6(float(n) * float(n) / float(c2))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    closes=st.lists(st.integers(min_value=1, max_value=500), min_size=2, max_size=20),
    n=st.integers(min_value=2, max_value=5),
)
def test_cci_matches_exact_model(spark, closes, n):
    """CCI vs the unbounded-int 3n-scaled identity — bitwise; constant
    runs force the flat-window NULL guard."""
    from marketstore_spark.operators.quant import cci

    rows = [
        (i, EPOCH0 + dt.timedelta(days=i), 1, float(c))
        for i, c in enumerate(closes)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    tp = [3 * c * 100 for c in closes]
    got = {r["epoch"]: r["cci"] for r in cci(df, n=n).collect()}
    for i, (_, v) in enumerate(sorted(got.items())):
        if i + 1 < n:
            assert v is None
            continue
        wnd = tp[i - n + 1 : i + 1]
        s = sum(wnd)
        num = n * tp[i] - s
        md = sum(abs(n * x - s) for x in wnd)
        want = (
            float(n) * float(num) / (0.015 * float(md)) if md > 0 else None
        )
        assert v == want, (i, v, want)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    closes=st.lists(st.integers(min_value=1, max_value=500), min_size=2, max_size=20),
    n=st.integers(min_value=2, max_value=5),
)
def test_aroon_matches_exact_model(spark, closes, n):
    """Aroon vs an exact most-recent-extreme argmax model (H=L=C with
    one tick per bar)."""
    from marketstore_spark.operators.quant import aroon

    rows = [
        (i, EPOCH0 + dt.timedelta(days=i), 1, float(c))
        for i, c in enumerate(closes)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {r["epoch"]: (r["aroon_up"], r["aroon_down"]) for r in aroon(df, n=n).collect()}
    for i, (_, (u, d)) in enumerate(sorted(got.items())):
        if i < n:
            assert u is None and d is None
            continue
        wnd = closes[i - n : i + 1]
        hi = max(range(len(wnd)), key=lambda j: (wnd[j], j))
        lo = max(range(len(wnd)), key=lambda j: (-wnd[j], j))
        since_hi, since_lo = len(wnd) - 1 - hi, len(wnd) - 1 - lo
        assert u == 100.0 * (float(n) - float(since_hi)) / float(n)
        assert d == 100.0 * (float(n) - float(since_lo)) / float(n)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ticks=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=300),   # price
            st.integers(min_value=1, max_value=50),    # volume
        ),
        min_size=1,
        max_size=30,
    ),
    pct=st.integers(min_value=0, max_value=49),
)
def test_trimmed_mean_matches_exact_model(spark, ticks, pct):
    """Rank-trim vs a Python sort model — identical kept sets for any
    trim percentage, including ties (deterministic rank keys)."""
    from marketstore_spark.operators.quant import trimmed_mean

    rows = [
        (i, EPOCH0 + dt.timedelta(minutes=i), 1, float(p))
        for i, (p, _) in enumerate(ticks)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    r = trimmed_mean(df, trim_pct=pct).collect()[0]
    px = sorted(
        (p * 100, i) for i, (p, _) in enumerate(ticks)
    )  # rank by (price, arrival) — the operator's tie order
    nt = len(px)
    k = nt * pct // 100
    kept = [p for p, _ in px[k : nt - k]]
    assert (r["n_ticks"], r["n_used"]) == (nt, len(kept))
    assert r["trimmed_mean_c"] == float(sum(kept)) / float(len(kept))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    days=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=300),  # close (dollars)
            st.integers(min_value=1, max_value=50),   # volume
        ),
        min_size=1,
        max_size=15,
    ),
    n=st.integers(min_value=2, max_value=4),
)
def test_mfi_matches_exact_model(spark, days, n):
    """MFI vs an unbounded-int flow model — bitwise, including the
    Wilder unchanged-price rule and the all-flat NULL guard."""
    from marketstore_spark.operators.quant import mfi

    rows = [
        (1, EPOCH0 + dt.timedelta(days=i), i + 1, float(px), vol)
        for i, (px, vol) in enumerate(days)
    ]
    df = spark.createDataFrame(
        rows,
        "user_id long, ts timestamp, event_id long, value double, volume long",
    )
    got = {r["epoch"]: r["mfi"] for r in mfi(df, n=n).collect()}
    tp3 = [3 * px * 100 for px, _ in days]
    flows = []
    for i, (px, vol) in enumerate(days):
        mf = tp3[i] * vol
        pos = mf if i > 0 and tp3[i] > tp3[i - 1] else 0
        neg = mf if i > 0 and tp3[i] < tp3[i - 1] else 0
        flows.append((pos, neg))
    for i, (_, v) in enumerate(sorted(got.items())):
        wnd = flows[max(0, i - n + 1) : i + 1]
        sp, sn = sum(p for p, _ in wnd), sum(q for _, q in wnd)
        want = (
            100.0 * float(sp) / float(sp + sn)
            if i + 1 > n and (sp + sn) > 0
            else None
        )
        assert v == want, (i, v, want)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    syms=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=200),  # price
            st.integers(min_value=1, max_value=99),   # volume
        ),
        min_size=1,
        max_size=12,
    )
)
def test_market_concentration_matches_exact_model(spark, syms):
    """HHI/effective-count vs an unbounded-int Simpson model (one tick
    per symbol, one bucket) — rounding via the Spark emulation."""
    from marketstore_spark.operators.quant import market_concentration

    rows = [
        (i + 1, EPOCH0 + dt.timedelta(hours=i % 20), i + 1, float(px), vol)
        for i, (px, vol) in enumerate(syms)
    ]
    df = spark.createDataFrame(
        rows,
        "user_id long, ts timestamp, event_id long, value double, volume long",
    )
    r = market_concentration(df).collect()[0]
    dv = [px * 100 * vol for px, vol in syms]
    tot, dv2 = sum(dv), sum(v * v for v in dv)
    assert (r["n_symbols"], r["total_dv_c"]) == (len(syms), tot)
    assert r["hhi"] == _spark_round6(float(dv2) / (float(tot) * float(tot)))
    assert r["effective_symbols"] == _spark_round6(
        (float(tot) * float(tot)) / float(dv2)
    )
    assert r["top_share"] == float(max(dv)) / float(tot)


def test_ema_macd_diagonal_kernel_bitwise_vs_direct_loop(spark):
    """Many short per-key runs inside one Arrow batch routes the fold
    through the diagonal (across-runs vectorized) kernel; the trailing
    short batch routes through the per-run loop; a run spanning the
    batch boundary exercises the carry.  Every path must equal the
    literal per-row float64 recurrence bit for bit."""
    import random

    from marketstore_spark.operators.ewm import ema, macd

    rng = random.Random(99)
    rows = []
    i = 0
    # 1000 keys of 3-5 rows hash into ~500-row per-partition batches
    # (8 test shuffle partitions): max run 5 → 5·32 ≤ 500 routes the
    # full batches through the diagonal kernel, while sub-160-row
    # trailing batches fall back to the per-run loop — both covered.
    for uid in range(1000):
        for _ in range(rng.randint(3, 5)):
            rows.append(
                (
                    i,
                    dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i),
                    uid,
                    rng.uniform(-1000.0, 1000.0),
                )
            )
            i += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        got_e = {r["event_id"]: r["ema"] for r in ema(df, span=20).collect()}
        got_m = {
            r["event_id"]: (r["macd"], r["signal"], r["histogram"])
            for r in macd(df).collect()
        }
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    a, b = 2.0 / 21.0, 1.0 - 2.0 / 21.0
    af, bf = 2.0 / 13.0, 1.0 - 2.0 / 13.0
    as_, bs = 2.0 / 27.0, 1.0 - 2.0 / 27.0
    ag, bg = 2.0 / 10.0, 1.0 - 2.0 / 10.0
    per_key = defaultdict(list)
    for eid, _, uid, v in rows:
        per_key[uid].append((eid, float(v)))
    for uid, kvs in per_key.items():
        acc = ef = es = sig = None
        for eid, x in kvs:  # already time-ordered by construction
            if acc is None:
                acc, ef, es = x, x, x
                line = ef - es
                sig = line
            else:
                acc = a * x + b * acc
                ef = af * x + bf * ef
                es = as_ * x + bs * es
                line = ef - es
                sig = ag * line + bg * sig
            assert got_e[eid] == acc  # bitwise
            gm, gs, gh = got_m[eid]
            assert gm == line and gs == sig and gh == line - sig


# ---------------------------------------------------------------------
# event-funnel greedy-chain property
# ---------------------------------------------------------------------

_STEPS = ["view", "click", "purchase"]
_event = st.tuples(
    st.integers(min_value=0, max_value=40),   # user (forces collisions)
    st.integers(min_value=0, max_value=500),  # offset seconds
    st.sampled_from(["view", "click", "purchase", "error"]),
)
_eventset = st.lists(_event, min_size=1, max_size=60)


def _greedy_chain(evts, window_us):
    """Direct Python model of the greedy-earliest windowed chain over
    one user's (epoch_us, tiebreak, type) events."""
    chain = [None] * len(_STEPS)
    idx = {s: i for i, s in enumerate(_STEPS)}
    for t, _tb, et in sorted(evts):
        i = idx.get(et)
        if i is None or chain[i] is not None:
            continue
        if i == 0:
            chain[0] = t
        elif (
            chain[i - 1] is not None
            and t > chain[i - 1]
            and (window_us is None or t <= chain[0] + window_us)
        ):
            chain[i] = t
    d = 0
    for t in chain:
        if t is None:
            break
        d += 1
    return d


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(evts=_eventset, winsec=st.sampled_from([None, 30, 120, 1000]))
def test_event_funnel_matches_greedy_model(spark, evts, winsec):
    from marketstore_spark.operators.funnel import event_funnel

    rows = [
        (
            i,
            EPOCH0 + dt.timedelta(seconds=off),
            uid,
            et,
        )
        for i, (uid, off, et) in enumerate(evts)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    window_us = None if winsec is None else winsec * 1_000_000
    got = {
        r["step"]: r["users"]
        for r in event_funnel(df, _STEPS, window_us=window_us).collect()
    }
    per_user = defaultdict(list)
    base = int(EPOCH0.timestamp()) * 1_000_000
    for i, (uid, off, et) in enumerate(evts):
        per_user[uid].append((base + off * 1_000_000, i, et))
    depths = [_greedy_chain(v, window_us) for v in per_user.values()]
    want = {s + 1: sum(1 for d in depths if d >= s + 1) for s in range(len(_STEPS))}
    assert got == want


# ---------------------------------------------------------------------
# exact-substring span property
# ---------------------------------------------------------------------

_doc = st.lists(
    st.integers(min_value=0, max_value=7).map(lambda i: f"w{i}"),
    min_size=0,
    max_size=30,
)
_corpus = st.lists(_doc, min_size=1, max_size=8)


def _model_spans(texts, k):
    """Direct Python model of substring_dup_spans: count every
    overlapping k-gram corpus-wide, mark positions whose gram occurs
    at >= 2 sites, merge consecutive positions into maximal spans."""
    from collections import Counter

    grams = Counter()
    sites = []
    for doc_id, words in enumerate(texts):
        pos = [tuple(words[p : p + k]) for p in range(len(words) - k + 1)]
        sites.append(pos)
        grams.update(pos)
    out = set()
    for doc_id, pos in enumerate(sites):
        run = None
        for p, g in enumerate(pos):
            if grams[g] >= 2:
                run = p if run is None else run
            else:
                if run is not None:
                    out.add((doc_id, run, p - 1 + k))
                run = None
        if run is not None:
            out.add((doc_id, run, len(pos) - 1 + k))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_corpus, k=st.sampled_from([2, 3, 5]))
def test_substring_dup_spans_matches_python_model(spark, texts, k):
    from marketstore_spark.operators.dedup import substring_dup_spans

    rows = [(i, " ".join(words)) for i, words in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["start_word"], r["end_word"])
        for r in substring_dup_spans(df, k=k).collect()
    }
    want = _model_spans(texts, k)
    assert got == want


def test_gif_interlaced_frame_decodes_row_exact():
    """An interlaced GIF frame (GIF89a appendix E four-pass row order,
    interlace flag set in the image descriptor) must decode to the
    same pixels as its sequential twin — including heights where late
    passes are empty."""
    import struct

    import numpy as np

    from marketstore_spark.operators.gif import decode_gif, encode_gif

    rng = np.random.default_rng(13)
    for h, w in [(16, 4), (9, 3), (1, 5), (3, 2), (8, 8)]:
        palette = np.array(
            [[i * 16, 255 - i * 16, (i * 37) % 256] for i in range(16)], np.uint8
        )
        px = palette[rng.integers(0, 16, size=(h, w))]
        plain = encode_gif(px)
        # rewrite the single image block into interlaced row order:
        # set the interlace bit and re-encode rows in pass order
        body = bytearray(plain)
        # find the image descriptor (0x2C) — encode_gif writes one frame
        at = body.index(0x2C, 13)
        ox, oy, fw, fh = struct.unpack_from("<HHHH", bytes(body), at + 1)
        assert (fw, fh) == (w, h)
        body[at + 9] |= 0x40  # interlace flag (no local table → bit 6)
        # reorder pixel rows into the 4-pass layout and re-LZW
        from marketstore_spark.operators.gif import _sub_blocks, lzw_encode_flat

        colors = np.unique(px.reshape(-1, 3), axis=0)
        lut = {tuple(c): i for i, c in enumerate(colors)}
        idx = np.array(
            [lut[tuple(p)] for p in px.reshape(-1, 3)], np.int32
        ).reshape(h, w)
        passes = np.concatenate(
            [idx[s::st] for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))]
        )
        bits = max(2, int(len(colors) - 1).bit_length())
        mcs = max(2, bits)
        new_data = bytes([mcs]) + _sub_blocks(
            lzw_encode_flat(passes.reshape(-1), mcs)
        )
        # splice: descriptor (10 bytes incl. 0x2C..flags) + old data runs
        # to the trailer (single-frame file encode_gif produced)
        inter = bytes(body[: at + 10]) + new_data + b"\x3b"
        got = decode_gif(inter)
        want = decode_gif(plain)
        assert (got == want).all(), (h, w)


def test_gif_restore_disposal_modes():
    """Disposal 2 (restore-to-background) clears the frame rect to the
    background color before the next frame; disposal 3 (restore-to-
    previous) puts back the pre-frame canvas.  Built with encode_gif's
    per-frame disposal parameter, checked frame-for-frame."""
    import numpy as np

    from marketstore_spark.operators.gif import decode_gif, encode_gif

    red = np.full((2, 2, 3), [200, 10, 10], np.uint8)
    blue = np.full((2, 2, 3), [10, 10, 200], np.uint8)
    green = np.full((2, 2, 3), [10, 200, 10], np.uint8)

    # canvas 4x4; frame rects at different offsets
    gif = encode_gif(
        np.stack([red, blue, green]),
        offsets=[(0, 0), (2, 2), (0, 2)],
        disposals=[2, 3, 0],
    )
    frames = decode_gif(gif)
    assert frames.shape == (3, 4, 4, 3)
    bg = frames[0][3, 3].copy()  # untouched corner = background color
    # frame 0: red block at (0,0)
    assert (frames[0][0:2, 0:2] == red).all()
    # frame 1: red was disposed to background, blue drawn at (2,2)
    assert (frames[1][0:2, 0:2] == bg).all()
    assert (frames[1][2:4, 2:4] == blue).all()
    # frame 2: blue was restore-to-PREVIOUS → its rect reverts to what
    # the canvas held before frame 1 (background), green drawn at (0,2)
    assert (frames[2][2:4, 2:4] == bg).all()
    assert (frames[2][2:4, 0:2] == green).all()
    # and frame 2's own disposal (0) leaves everything in place


# ---------------------------------------------------------------------
# round-10 re-plans: capped posting lists and prefix-sum rolling moments
# ---------------------------------------------------------------------

_doctexts = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f"]),
        min_size=0, max_size=8,
    ).map(" ".join),
    min_size=1, max_size=12,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_doctexts, cap=st.integers(min_value=1, max_value=6))
def test_ngram_jaccard_matches_python_model_with_cap(spark, texts, cap):
    """The window-pruned posting-list pipeline must equal a direct
    Python model of the documented semantics: drop shingles whose
    doc frequency exceeds the cap, Jaccard over the CAPPED sets for
    both sides identically."""
    from marketstore_spark.operators.dedup import ngram_jaccard_pairs

    n = 2
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, n=n, threshold=0.0, max_doc_freq=cap
        ).collect()
    }

    # python model
    def grams(t):
        ws = t.split()
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    sets = {i: grams(t) for i, t in rows if t.strip() and len(t.split()) >= n}
    freq = defaultdict(int)
    for s in sets.values():
        for g in s:
            freq[g] += 1
    capped = {i: {g for g in s if freq[g] <= cap} for i, s in sets.items()}
    want = {}
    ids = sorted(capped)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(capped[a] & capped[b])
            if inter == 0:
                continue
            union = len(capped[a]) + len(capped[b]) - inter
            want[(a, b)] = inter / union
    assert got == pytest.approx(want)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    closes=st.lists(
        st.integers(min_value=1, max_value=99_999_99), min_size=1, max_size=40
    ),
    n=st.integers(min_value=2, max_value=8),
)
def test_rolling_corr_prefix_sums_equal_direct_frames(spark, closes, n):
    """run_i − run_{i−n} must equal the direct sliding-frame sum
    BITWISE: all moments are exact integers (LONG / DECIMAL(38,0)),
    so the final double conversion sees identical values.  The model
    computes every moment in unbounded Python ints and converts once
    — exactly the engine's documented arithmetic."""
    import math

    from marketstore_spark.operators.quant import rolling_corr_vs_market

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i, c in enumerate(closes):
        # two symbols so the market index differs from each close
        rows.append((i * 2, base + dt.timedelta(days=i), 1, c / 100.0))
        rows.append((i * 2 + 1, base + dt.timedelta(days=i), 2, (c + 7) / 100.0))
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    got = {
        (r["symbol"], r["epoch"]): r["corr"]
        for r in rolling_corr_vs_market(df, n=n).collect()
    }

    # python model in exact ints
    xs = {1: [c for c in closes], 2: [c + 7 for c in closes]}
    mkt = [xs[1][i] + xs[2][i] for i in range(len(closes))]
    for sym in (1, 2):
        for i in range(len(closes)):
            key = (sym, base + dt.timedelta(days=i))
            if i + 1 < n:
                assert got[key] is None
                continue
            w = range(i - n + 1, i + 1)
            sx = sum(xs[sym][j] for j in w)
            sy = sum(mkt[j] for j in w)
            sxy = sum(xs[sym][j] * mkt[j] for j in w)
            sxx = sum(xs[sym][j] ** 2 for j in w)
            syy = sum(mkt[j] ** 2 for j in w)
            cov = float(n * sxy - sx * sy)
            vx = float(n * sxx - sx * sx)
            vy = float(n * syy - sy * sy)
            if vx > 0 and vy > 0:
                want = cov / (math.sqrt(vx) * math.sqrt(vy))
                assert got[key] == want  # bitwise
            else:
                assert got[key] is None


# ---------------------------------------------------------------------
# Gopher / C4 quality transforms vs an independent pure-Python model
# (three-way with the DuckDB oracle: HOF semantics pinned exactly)
# ---------------------------------------------------------------------

_doc_line = st.text(
    alphabet="ab .!?#…{-*•\t", min_size=0, max_size=24
)
_doc_text = st.lists(_doc_line, min_size=0, max_size=6).map("\n".join)


def _py_gopher(text):
    import re as _re

    t0 = text.lower()
    words = [w for w in _re.split(r"\s+", t0) if w != ""]
    lines = [l for l in t0.split("\n") if _re.search(r"\S", l)]
    w, l = len(words), len(lines)
    sl = sum(len(x) for x in words)
    syms = t0.count("#") + len(_re.findall(r"\.\.\.", t0)) + t0.count("…")
    aw = sum(1 for x in words if _re.search("[a-z]", x))
    stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
    sh = len(set(words) & stops)
    b = sum(
        1 for x in lines if _re.search(r"\S", x).group(0) in ("-", "*", "•")
    )
    el = sum(1 for x in lines if _re.search(r"(\.\.\.|…)\s*$", x))
    dl = len(set(lines))
    return dict(
        n_words=w, n_lines=l,
        stopword_hits=sh,
        pass_word_count=int(50 <= w <= 100000),
        pass_mean_word_len=int(w > 0 and 3 * w <= sl <= 10 * w),
        pass_symbol_ratio=int(w > 0 and 10 * syms <= w),
        pass_bullet_lines=int(l == 0 or 10 * b <= 9 * l),
        pass_ellipsis_lines=int(l == 0 or 10 * el <= 3 * l),
        pass_alpha_words=int(w > 0 and 5 * aw >= 4 * w),
        pass_stopwords=int(sh >= 2),
        dup=(l - dl, l),
    )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(_doc_text, min_size=1, max_size=8))
def test_gopher_rules_match_python_model(spark, texts):
    from marketstore_spark.operators.text import gopher_rules

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert len(got) == len(texts)
    for i, text in enumerate(texts):
        want = _py_gopher(text)
        r = got[i]
        for k, v in want.items():
            if k == "dup":
                dups, l = v
                if l:
                    assert r["dup_line_frac"] == pytest.approx(dups / l), text
                else:
                    assert r["dup_line_frac"] is None, text
            else:
                assert r[k] == v, (k, repr(text))


def _py_c4(text):
    import re as _re

    kept = [
        x
        for x in text.split("\n")
        if _re.search(r'[.!?"]\s*$', x)
        and len(_re.findall(r"\S+", x)) >= 3
        and "javascript" not in x.lower()
    ]
    clean = "\n".join(kept)
    n_sent = len(_re.findall(r"[.!?]", clean))
    keep = (
        "lorem ipsum" not in text.lower()
        and "{" not in text
        and n_sent >= 5
    )
    return clean, len(kept), n_sent, int(keep)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(_doc_text, min_size=1, max_size=8))
def test_c4_clean_matches_python_model(spark, texts):
    from marketstore_spark.operators.text import c4_clean

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {r["doc_id"]: r for r in c4_clean(df).collect()}
    for i, text in enumerate(texts):
        clean, nk, ns, keep = _py_c4(text)
        r = got[i]
        assert (r["clean_text"], r["n_lines_kept"]) == (clean, nk), repr(text)
        assert (r["n_sentences"], r["keep_doc"]) == (ns, keep), repr(text)
