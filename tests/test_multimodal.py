"""Multimodal plumbing tests (SURVEY §2 #41): the binary-column
pipeline is real (schema, Arrow batching, partition behavior); only the
codec itself is stubbed."""

import pytest
from pyspark.sql import functions as F

from marketstore_spark.catalog import load_table
from marketstore_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    extract_features,
    fake_decode,
    frame_sample,
    media_from_documents,
)


@pytest.fixture()
def media(spark, sf_dir):
    return media_from_documents(load_table(spark, sf_dir, "documents"))


def test_media_schema_and_payload(media):
    got = [(f.name, f.dataType) for f in media.schema.fields]
    want = [(f.name, f.dataType) for f in MEDIA_SCHEMA.fields]
    assert got == want
    row = media.filter(F.col("n_bytes") > 0).first()
    assert isinstance(row["payload"], bytearray | bytes)
    assert len(bytes(row["payload"])) == row["n_bytes"]
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_stub_raises_flagged(media):
    """Default decoder is the honest NotImplementedError stub: rows come
    back flagged undecoded rather than crashing the pipeline."""
    out = extract_features(media.limit(10))
    assert out.schema == FEATURE_SCHEMA
    rows = out.collect()
    assert len(rows) == 10
    assert all(r["decoded_ok"] == 0 for r in rows)


def test_extract_features_fake_decoder_deterministic(media):
    out1 = extract_features(media.limit(20), decoder=fake_decode).orderBy("media_id").collect()
    out2 = extract_features(media.limit(20), decoder=fake_decode).orderBy("media_id").collect()
    assert [r["feat_norm"] for r in out1] == [r["feat_norm"] for r in out2]
    assert all(r["decoded_ok"] == 1 and r["feat_dim"] == 64 for r in out1)


def test_extract_features_arrow_batching(media):
    """The binary column must arrive at Python in Arrow batches (many
    rows per pandas frame), not row-at-a-time."""
    import pandas as pd

    def batch_sizes(batches):
        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})

    sizes = media.coalesce(1).mapInPandas(batch_sizes, "n long").toPandas()
    assert sizes["n"].sum() == media.count()
    assert sizes["n"].max() > 1


def test_frame_sample_plan(media):
    frames = frame_sample(media, every_n=10)
    assert frames.columns == ["media_id", "frame_idx"]
    pdf = frames.groupBy("media_id").agg(F.max("frame_idx").alias("mx")).toPandas()
    assert (pdf["mx"] % 10 == 0).all()
    only_video = media.filter(F.col("kind") == "video").count()
    assert frames.select("media_id").distinct().count() == only_video


def test_resize_images_plumbing(spark, sf_dir):
    from marketstore_spark.operators.multimodal import media_from_documents, resize_images

    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    out = resize_images(media, 32, 16)
    rows = out.limit(20).collect()
    assert len(rows) > 0
    assert all(r["kind"] == "image" for r in rows)
    assert all(r["width"] == 32 and r["height"] == 16 for r in rows)
    assert all(len(r["payload"]) == 32 * 16 == r["n_bytes"] for r in rows)
    # deterministic: same input -> same payload
    again = {r["media_id"]: r["payload"] for r in out.limit(20).collect()}
    assert all(again[r["media_id"]] == r["payload"] for r in rows)


def test_real_bmp_wav_decode_roundtrip():
    """Pure-numpy/stdlib codecs: BMP and WAV byte-level roundtrips."""
    import numpy as np

    from marketstore_spark.operators.multimodal import (
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav_pcm16,
        resize_nearest,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)  # odd width → padding
    assert (decode_bmp(encode_bmp(px)) == px).all()
    small = resize_nearest(px, 2, 2)
    assert small.shape == (2, 2, 3)

    samples = (np.sin(np.linspace(0, 40, 400)) * 20000).astype(np.int16)
    rate, got = decode_wav(encode_wav_pcm16(samples, rate=8000))
    assert rate == 8000 and (got == samples).all()


def test_real_decode_feature_extract_in_spark(spark):
    """extract_features with the DEFAULT decoder: bmp/wav rows decode
    for real inside mapInPandas; codec-less formats record
    decoded_ok=0 instead of failing the job."""
    import numpy as np

    from marketstore_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        encode_wav_pcm16,
        extract_features,
        resize_images,
    )

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    bmp = encode_bmp(px)
    wav = encode_wav_pcm16((rng.normal(0, 3000, 500)).astype(np.int16))
    rows = [
        (1, "image", "bmp", 6, 8, len(bmp), bytearray(bmp)),
        (2, "audio", "wav", 0, 0, len(wav), bytearray(wav)),
        (3, "video", "mp4", 0, 0, 9, bytearray(b"notavideo")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    got = {r["media_id"]: r for r in extract_features(media).collect()}
    assert got[1]["decoded_ok"] == 1 and got[1]["feat_dim"] == 32  # 8 u32 fields
    assert got[2]["decoded_ok"] == 1 and got[2]["feat_dim"] == 16  # 4 u32 fields
    assert got[3]["decoded_ok"] == 0

    # real BMP resize through the distributed path
    from marketstore_spark.operators.multimodal import decode_bmp

    out = {r["media_id"]: r for r in resize_images(media, 3, 4).collect()}
    resized = decode_bmp(bytes(out[1]["payload"]))
    assert resized.shape == (4, 3, 3)
    assert out[1]["width"] == 3 and out[1]["height"] == 4


def test_png_roundtrip_and_filters():
    """encode_png→decode_png round-trips pixels exactly, and the
    decoder reconstructs every PNG filter type (Sub/Up/Average/Paeth)
    from hand-filtered scanlines built per RFC 2083 §6."""
    import struct
    import zlib

    import numpy as np

    from marketstore_spark.operators.multimodal import (
        _PNG_SIG,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(9, 5, 3), dtype=np.uint8)
    assert (decode_png(encode_png(px)) == px).all()

    # Forward-filter each row with filter type (y % 5) and check the
    # decoder inverts all of them.
    h, w, ch = px.shape
    stride = w * ch
    flat = px.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        f = y % 5
        line = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        filt = np.empty(stride, np.int32)
        for x in range(stride):
            a = line[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[x] = (line[x] - pred) & 0xFF
        raw += bytes([f]) + filt.astype(np.uint8).tobytes()

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    png = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(png) == px).all()

    # RGBA drops alpha; unsupported shapes raise cleanly
    rgba = np.dstack([px, np.full((h, w), 128, np.uint8)])
    raw4 = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
    png4 = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw4))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(png4) == px).all()

    import pytest as _pytest

    # 16-bit depth stays out of scope (palette decode landed round 10)
    deep = _PNG_SIG + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
    with _pytest.raises(NotImplementedError):
        decode_png(deep)


def test_png_decode_resize_in_spark(spark):
    """PNG rows decode and resize for real through the distributed
    mapInPandas path, alongside bmp/wav."""
    import numpy as np

    from marketstore_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_png,
        encode_png,
        extract_features,
        resize_images,
    )

    rng = np.random.default_rng(23)
    px = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    png = encode_png(px)
    media = spark.createDataFrame(
        [(9, "image", "png", 7, 10, len(png), bytearray(png))], MEDIA_SCHEMA
    )
    feat = extract_features(media).collect()[0]
    assert feat["decoded_ok"] == 1 and feat["feat_dim"] == 32

    out = resize_images(media, 3, 4).collect()[0]
    assert decode_png(bytes(out["payload"])).shape == (4, 3, 3)
    assert out["n_bytes"] == len(bytes(out["payload"]))


def test_audio_features_known_clip_and_corrupt_payload(spark):
    from marketstore_spark.operators.multimodal import (
        audio_features,
        encode_wav_pcm16,
        synth_square_wav,
    )
    import numpy as np

    # known clip: [5, -5, 5, 0, 0] → peak 5, energy 75, 2 crossings,
    # trailing silence 2
    wav = encode_wav_pcm16(np.array([5, -5, 5, 0, 0], dtype=np.int16), rate=8000)
    rows = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"not a wav")),
         (3, bytearray(synth_square_wav(123)))],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in audio_features(rows).collect()}
    r1 = out[1]
    assert (r1["rate"], r1["n_samples"], r1["peak"], r1["energy"]) == (8000, 5, 5, 75)
    assert (r1["zero_crossings"], r1["trailing_silence"], r1["decoded_ok"]) == (2, 2, 1)
    # corrupt payload is data, not a bug
    assert out[2]["decoded_ok"] == 0 and out[2]["n_samples"] == 0
    # synth closed forms (the oracle's contract)
    r3 = out[3]
    assert r3["peak"] == (123 % 8 + 1) * 1000
    assert r3["zero_crossings"] == (123 % 400 + 100 - 1) // (123 % 5 + 2)


def test_png_adam7_interlaced_decode():
    """An Adam7-interlaced PNG (7 independently-filtered sub-images,
    built per spec §8.2 with a mix of None/Up filters) must decode to
    the exact pixels of its non-interlaced twin — including edge
    geometries where late passes are empty (1×1) or partial."""
    import struct
    import zlib

    import numpy as np

    from marketstore_spark.operators.multimodal import (
        _ADAM7,
        _PNG_SIG,
        decode_png,
        encode_png,
    )

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    def interlaced_png(px):
        h, w, ch = px.shape
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            ph, pw = sub.shape[:2]
            if pw == 0 or ph == 0:
                continue
            flat = sub.reshape(ph, pw * ch).astype(np.int32)
            for y in range(ph):
                if y % 2:  # Up filter within the pass
                    prev = flat[y - 1]
                    raw += b"\x02" + ((flat[y] - prev) & 0xFF).astype(
                        np.uint8
                    ).tobytes()
                else:
                    raw += b"\x00" + flat[y].astype(np.uint8).tobytes()
        return (
            _PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    rng = np.random.default_rng(11)
    for shape in [(16, 16), (9, 5), (1, 1), (3, 10), (8, 1)]:
        px = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        got = decode_png(interlaced_png(px))
        assert (got == px).all(), shape
        # twin check: same pixels through the non-interlaced path
        assert (decode_png(encode_png(px)) == px).all()


def test_wav_ieee_float_decode():
    """An IEEE-float32 WAV (format tag 3 — stdlib wave rejects it)
    decodes through the manual RIFF path with the deterministic
    clip + floor(x*32767 + 0.5) conversion; stereo keeps channel 0."""
    import struct

    import numpy as np

    from marketstore_spark.operators.multimodal import decode_wav

    def float_wav(samples, rate=8000, nch=1):
        data = samples.astype("<f4").tobytes()
        fmt = struct.pack("<HHIIHH", 3, nch, rate, rate * 4 * nch, 4 * nch, 32)
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    x = np.array([0.0, 0.5, -0.5, 1.0, -1.0, 2.0, -2.0, 1e-4], np.float32)
    rate, got = decode_wav(float_wav(x))
    assert rate == 8000
    want = np.floor(np.clip(x.astype(np.float64), -1, 1) * 32767.0 + 0.5).astype(
        np.int16
    )
    assert (got == want).all()
    # out-of-range values clip, tiny values round to 3 (1e-4*32767≈3.3)
    assert got[3] == 32767 and got[4] == -32767 and got[5] == 32767
    assert got[7] == 3

    # stereo: channel 0 only
    stereo = np.empty(8, np.float32)
    stereo[0::2] = x[:4]
    stereo[1::2] = 9.9  # garbage on channel 1
    rate2, got2 = decode_wav(float_wav(stereo, nch=2))
    assert (got2 == want[:4]).all()

    # unsupported tags still raise
    import pytest as _pytest

    bad = float_wav(x)
    bad = bad.replace(struct.pack("<HH", 3, 1), struct.pack("<HH", 7, 1), 1)
    with _pytest.raises(NotImplementedError):
        decode_wav(bad)


# ---------------------------------------------------------------------
# round 10: remaining common uncompressed variants — paletted/32-bit
# BMP, gray/palette PNG color types, PCM8/24/32 WAV widths
# ---------------------------------------------------------------------


def _png_chunks(ihdr_fields, extra_chunks, raw):
    import struct as _s
    import zlib

    def chunk(typ, data):
        return (
            _s.pack(">I", len(data)) + typ + data
            + _s.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    from marketstore_spark.operators.multimodal import _PNG_SIG

    out = _PNG_SIG + chunk(b"IHDR", _s.pack(">IIBBBBB", *ihdr_fields))
    for typ, data in extra_chunks:
        out += chunk(typ, data)
    return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def test_bmp_palette_and_32bit_decode():
    import struct as _s

    from marketstore_spark.operators.multimodal import decode_bmp

    # 8-bit paletted, 3x2, bottom-up, 4 palette entries (BGRX)
    pal = bytes([255, 0, 0, 0,    # index 0 → blue-? stored BGR: B=255 → RGB (0,0,255)
                 0, 255, 0, 0,    # index 1 → green
                 0, 0, 255, 0,    # index 2 → red
                 7, 8, 9, 0])     # index 3 → RGB (9,8,7)
    rows = bytes([0, 1, 2, 0]) + bytes([3, 3, 0, 0])  # 3px + 1 pad each
    offset = 14 + 40 + len(pal)
    header = _s.pack("<2sIHHI", b"BM", offset + len(rows), 0, 0, offset)
    info = _s.pack("<IiiHHIIiiII", 40, 3, 2, 1, 8, 0, len(rows), 0, 0, 4, 0)
    img = decode_bmp(header + info + pal + rows)
    assert img.shape == (2, 3, 3)
    # bottom-up: file row 0 is image row 1
    assert img[1].tolist() == [[0, 0, 255], [0, 255, 0], [255, 0, 0]]
    assert img[0].tolist() == [[9, 8, 7], [9, 8, 7], [0, 0, 255]]

    # 32-bit BGRA, 1x2 top-down (negative height), alpha dropped
    body = bytes([10, 20, 30, 99]) + bytes([40, 50, 60, 99])
    header = _s.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = _s.pack("<IiiHHIIiiII", 40, 1, -2, 1, 32, 0, len(body), 0, 0, 0, 0)
    img = decode_bmp(header + info + body)
    assert img.shape == (2, 1, 3)
    assert img[0, 0].tolist() == [30, 20, 10]  # BGR → RGB
    assert img[1, 0].tolist() == [60, 50, 40]

    # 1-bit is now decoded (round 12); a truncated 1-bit payload with
    # no palette bytes stays inside the ValueError contract
    info = _s.pack("<IiiHHIIiiII", 40, 1, 1, 1, 1, 0, 4, 0, 0, 0, 0)
    with pytest.raises(ValueError):
        decode_bmp(_s.pack("<2sIHHI", b"BM", 58, 0, 0, 54) + info + b"\x00" * 4)


def test_png_gray_palette_grayalpha_decode():
    import numpy as np

    from marketstore_spark.operators.multimodal import decode_png

    # color type 0 (grayscale): 3x2, filter 0 rows
    raw = b"\x00" + bytes([0, 128, 255]) + b"\x00" + bytes([10, 20, 30])
    img = decode_png(_png_chunks((3, 2, 8, 0, 0, 0, 0), [], raw))
    assert img.shape == (2, 3, 3)
    assert img[0, 1].tolist() == [128, 128, 128]  # replicated channels
    assert img[1, 2].tolist() == [30, 30, 30]

    # color type 3 (palette): PLTE lookup
    plte = bytes([255, 0, 0, 0, 255, 0, 1, 2, 3])
    raw = b"\x00" + bytes([2, 1, 0])
    img = decode_png(_png_chunks((3, 1, 8, 3, 0, 0, 0), [(b"PLTE", plte)], raw))
    assert img[0].tolist() == [[1, 2, 3], [0, 255, 0], [255, 0, 0]]

    # color type 4 (gray+alpha): alpha dropped, Sub filter exercised
    # row: filter 1 (Sub, ch=2): raw deltas reconstruct to 50,70 / 90,110
    raw = b"\x01" + bytes([50, 200, 40, 166])
    img = decode_png(_png_chunks((2, 1, 8, 4, 0, 0, 0), [], raw))
    assert img[0, 0].tolist() == [50, 50, 50]
    assert img[0, 1].tolist() == [90, 90, 90]

    # paletted without PLTE is loud
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(_png_chunks((1, 1, 8, 3, 0, 0, 0), [], b"\x00\x00"))


def test_wav_pcm_8_24_32_widths():
    import io as _io
    import wave as _wave

    import numpy as np

    from marketstore_spark.operators.multimodal import decode_wav

    def make(width, frames_bytes, nch=1, rate=8000):
        buf = _io.BytesIO()
        with _wave.open(buf, "wb") as wf:
            wf.setnchannels(nch)
            wf.setsampwidth(width)
            wf.setframerate(rate)
            wf.writeframes(frames_bytes)
        return buf.getvalue()

    # PCM8 (unsigned): 128 → 0, 0 → -32768, 255 → 32512
    rate, s = decode_wav(make(1, bytes([128, 0, 255])))
    assert rate == 8000 and s.tolist() == [0, -32768, 32512]

    # PCM24: little-endian; high 16 bits kept
    frames = (
        (0x123456).to_bytes(3, "little")
        + (0x800000).to_bytes(3, "little")   # most negative → -32768
        + (0xFFFFFF).to_bytes(3, "little")   # -1 → -1>>8 == -1 → int16 -1
    )
    _rate, s = decode_wav(make(3, frames))
    assert s.tolist() == [0x1234, -32768, -1]

    # PCM32: high 16 bits kept; stereo keeps channel 0
    a = np.array([0x7FFF0000, -0x80000000, 11 << 16, 22 << 16], dtype="<i4")
    _rate, s = decode_wav(make(4, a.tobytes(), nch=2))
    assert s.tolist() == [0x7FFF, 11]


def test_bmp_bitfields_16bit_565():
    """BI_BITFIELDS with the classic RGB565 masks: channel extraction
    and exact span rescale (31→255, 63→255)."""
    import struct

    import numpy as np

    from marketstore_spark.operators.multimodal import decode_bmp

    # one row, two px: pure red (0xF800) and mid-green (0x0400 = 32/63)
    px = struct.pack("<HH", 0xF800, 0x0400)
    rowb = len(px) + (4 - len(px) % 4) % 4
    data = px + b"\x00" * (rowb - len(px))
    info = struct.pack("<IiiHHIIiiII", 40, 2, -1, 1, 16, 3, len(data),
                       2835, 2835, 0, 0)
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    off = 14 + 40 + 12
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    out = decode_bmp(hdr + info + masks + data)
    assert out.shape == (1, 2, 3)
    assert tuple(out[0, 0]) == (255, 0, 0)
    assert tuple(out[0, 1]) == (0, 32 * 255 // 63, 0)


_WILD_MEDIA = [
    ("/root/.pyenv/versions/3.11.7/lib/python3.11/test/imghdrdata", True),
]


def test_wild_bmp_matches_png_twin():
    """The stdlib test-suite icon ships as BOTH a BI_BITFIELDS 32-bit
    BMP and a PNG of the same pixels: both decoders must produce the
    identical array — cross-FORMAT conformance, not just
    self-consistency."""
    import os

    import numpy as np

    from marketstore_spark.operators.multimodal import decode_bmp, decode_png

    base = "/root/.pyenv/versions/3.11.7/lib/python3.11/test/imghdrdata"
    bmp, png = os.path.join(base, "python.bmp"), os.path.join(base, "python.png")
    if not (os.path.exists(bmp) and os.path.exists(png)):
        pytest.skip("stdlib imghdrdata fixtures not on this machine")
    a = decode_bmp(open(bmp, "rb").read())
    b = decode_png(open(png, "rb").read())
    assert np.array_equal(a, b)


def test_wild_png_gif_wav_sweep():
    """Every real PNG/GIF/WAV findable in the stdlib test data decodes
    cleanly — arbitrary-producer conformance (machine-specific;
    skips when the tree is absent)."""
    import glob
    import os

    from marketstore_spark.operators.gif import decode_gif
    from marketstore_spark.operators.multimodal import decode_png, decode_wav

    root = "/root/.pyenv/versions/3.11.7/lib/python3.11"
    if not os.path.isdir(root):
        pytest.skip("pyenv stdlib tree not on this machine")
    checked = 0
    for pat, fn in (
        ("test/imghdrdata/*.png", decode_png),
        ("idlelib/Icons/*.png", decode_png),
        ("idlelib/Icons/*.gif", decode_gif),
        ("test/sndhdrdata/sndhdr.wav", decode_wav),
        ("test/audiodata/pluck-pcm*.wav", decode_wav),
    ):
        for f in glob.glob(os.path.join(root, pat)):
            r = fn(open(f, "rb").read())
            arr = r[1] if isinstance(r, tuple) else r
            assert arr.size > 0, f
            checked += 1
    assert checked >= 10  # the sweep actually ran over real files


def test_wild_bmp_au_aiff_sweep():
    """Round-12 extension of the wild sweep (VERDICT r11 next #3):
    every real BMP / Sun AU / AIFF / AIFC in ANY stdlib tree on this
    machine decodes cleanly — files from multiple CPython eras and
    independent producers (dedup by (size, name) across trees)."""
    import glob
    import os

    from marketstore_spark.operators.multimodal import (
        decode_aiff,
        decode_au,
        decode_bmp,
    )

    pats = (
        ("/root/.pyenv/versions/*/lib/python*/test/imghdrdata/*.bmp",
         decode_bmp),
        ("/root/.pyenv/versions/*/lib/python*/test/test_email/data/*.bmp",
         decode_bmp),
        ("/root/.pyenv/versions/*/lib/python*/test/sndhdrdata/sndhdr.au",
         decode_au),
        ("/root/.pyenv/versions/*/lib/python*/test/*.au", decode_au),
        ("/root/.pyenv/versions/*/lib/python*/test/audiodata/*.au",
         decode_au),
        ("/root/.pyenv/versions/*/lib/python*/test/sndhdrdata/sndhdr.aif*",
         decode_aiff),
        ("/root/.pyenv/versions/*/lib/python*/test/audiodata/*.aiff",
         decode_aiff),
        ("/root/.pyenv/versions/*/lib/python*/test/audiodata/*.aifc",
         decode_aiff),
    )
    seen = set()
    checked = 0
    for pat, fn in pats:
        for f in glob.glob(pat):
            ident = (os.path.getsize(f), os.path.basename(f))
            if ident in seen:
                continue
            seen.add(ident)
            r = fn(open(f, "rb").read())
            arr = r[1] if isinstance(r, tuple) else r
            assert arr.size > 0, f
            checked += 1
    if checked == 0:
        pytest.skip("no stdlib BMP/AU/AIFF fixtures on this machine")
    assert checked >= 5


def test_ulaw_matches_audioop_table():
    """The closed-form G.711 µ-law decode must reproduce CPython's
    audioop table for all 256 codes (audioop is the stdlib's
    C implementation of the same spec — an independent oracle)."""
    import numpy as np

    audioop = pytest.importorskip("audioop")
    from marketstore_spark.operators.multimodal import _ulaw_to_int16

    mine = _ulaw_to_int16(np.arange(256, dtype=np.uint8))
    ref = np.frombuffer(audioop.ulaw2lin(bytes(range(256)), 2), "<i2")
    assert np.array_equal(mine, ref)


def _gradient_img(h=16, w=16, inv=False):
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    px = np.zeros((h, w, 3), np.uint8)
    px[..., 0] = (xx * 255) // max(w - 1, 1)
    px[..., 1] = (yy * 255) // max(h - 1, 1)
    px[..., 2] = ((xx + yy) * 7) % 256
    return 255 - px if inv else px


def test_image_dhash_pinned_against_literal_reference():
    """image_dhash_array must equal a from-scratch nested-loop dHash
    (independent luma/grid/packing arithmetic) on a structured image."""
    import numpy as np

    from marketstore_spark.operators.multimodal import image_dhash_array

    px = _gradient_img()
    h, w = 16, 16
    expect = 0
    for r in range(8):
        y = min(r * h // 8, h - 1)
        row = []
        for c in range(9):
            x = min(c * w // 9, w - 1)
            p = px[y, x]
            row.append((int(p[0]) * 299 + int(p[1]) * 587 + int(p[2]) * 114) // 1000)
        for c in range(8):
            expect = (expect << 1) | (1 if row[c + 1] > row[c] else 0)
    if expect >= 1 << 63:
        expect -= 1 << 64
    assert image_dhash_array(px) == expect


def test_decode_image_any_sniffs_all_four_formats():
    """The same pixels in BMP and PNG (lossless) hash identically
    through the sniffing dispatch; GIF and JPEG payloads decode too."""
    import numpy as np

    from marketstore_spark.operators.gif import encode_gif
    from marketstore_spark.operators.jpeg import encode_jpeg
    from marketstore_spark.operators.multimodal import (
        decode_image_any,
        encode_bmp,
        encode_png,
        image_dhash_array,
    )

    px = _gradient_img()
    bmp = decode_image_any(encode_bmp(px))
    png = decode_image_any(encode_png(px))
    assert np.array_equal(bmp, px) and np.array_equal(png, px)
    assert image_dhash_array(bmp) == image_dhash_array(png)
    coarse = (px // 64) * 64  # ≤ 255 distinct colors for the GIF palette
    gif = decode_image_any(encode_gif(coarse[None]))
    assert np.array_equal(gif, coarse)
    jpg = decode_image_any(encode_jpeg(px, quality=95))
    assert jpg.shape == px.shape
    with pytest.raises(ValueError):
        decode_image_any(b"RIFF....WAVE")


def test_image_near_dup_pairs_through_spark(spark):
    """End-to-end multimodal near-dup: dHash signatures in one
    mapInPandas hop, banded integer buckets + bit_count verify in pure
    JVM — a noise twin pairs with its original, a far image and a
    corrupt payload do not."""
    import numpy as np

    from marketstore_spark.operators.dedup import hash_near_dup_pairs
    from marketstore_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        image_dhash,
    )

    a = _gradient_img()
    b = a.copy()
    b[1::2, :, 2] ^= 3  # touch only rows the 8-row grid never samples
    c = _gradient_img(inv=True)
    rows = [
        (1, "image", "bmp", 16, 16, 0, bytearray(encode_bmp(a))),
        (2, "image", "bmp", 16, 16, 0, bytearray(encode_bmp(b))),
        (3, "image", "bmp", 16, 16, 0, bytearray(encode_bmp(c))),
        (4, "image", "bmp", 16, 16, 0, bytearray(b"garbage-bytes")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    sigs = image_dhash(media)
    got = {r["media_id"]: r for r in sigs.collect()}
    assert got[4]["decoded_ok"] == 0
    assert got[1]["dhash"] == got[2]["dhash"]  # unsampled rows only
    pairs = hash_near_dup_pairs(
        sigs.filter("decoded_ok = 1"), max_hamming=3
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    assert all(r["hamming"] <= 3 for r in pairs)


def test_video_near_dup_pairs_through_spark(spark):
    """Video near-dup by shared frame fingerprints: a trimmed/offset
    cut of the same footage pairs with the original (2 shared sampled
    frames), inverted footage does not — across MIXED containers (AVI
    and fragmented MP4)."""
    import numpy as np

    from marketstore_spark.operators.dedup import video_near_dup_pairs
    from marketstore_spark.operators.mp4 import encode_mp4
    from marketstore_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        video_frame_dhash,
    )
    from marketstore_spark.operators.video import encode_avi

    from marketstore_spark.operators.multimodal import image_dhash_array

    # distinct content per frame (a mere brightness shift would NOT
    # be distinct — dHash is invariant to it by construction)
    pool = np.stack(
        [
            np.random.default_rng(100 + i).integers(
                0, 256, size=(16, 16, 3), dtype=np.uint8
            )
            for i in range(13)
        ]
    )
    assert len({image_dhash_array(f) for f in pool}) == 13
    v1 = encode_avi(pool[0:9], fps=10)  # frames 0..8
    v2 = encode_mp4(pool[4:13], fps=10, codec="raw", fragmented=True)
    v3 = encode_mp4(255 - pool[0:9], fps=10, codec="raw")
    rows = [
        (1, "video", "avi", 16, 16, 0, bytearray(v1)),
        (2, "video", "mp4", 16, 16, 0, bytearray(v2)),
        (3, "video", "mp4", 16, 16, 0, bytearray(v3)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    sigs = video_frame_dhash(media, every_n=4)  # samples frames 0,4,8
    pairs = video_near_dup_pairs(sigs, min_shared=2).collect()
    assert {(r["id_a"], r["id_b"], r["shared_frames"]) for r in pairs} == {
        (1, 2, 2)  # pool[4] and pool[8] sampled by both cuts
    }


def _tone_clip(freqs, n=4000, rate=16000, amp=8000):
    import numpy as np

    t = np.arange(n) / rate
    x = sum(np.sin(2 * np.pi * f * t) for f in freqs)
    return (amp * x / max(len(freqs), 1)).astype(np.int16)


def test_audio_fingerprint_invariances():
    """The Haitsma-Kalker construction is exactly invariant to
    amplitude scaling (double-differencing cancels the constant log
    shift, up to int16 requantization) and far for different
    spectral content."""
    import numpy as np

    from marketstore_spark.operators.multimodal import audio_fingerprint_array

    a = _tone_clip([440, 880, 1760])
    b = (a.astype(np.float64) * 0.5).astype(np.int16)  # 6 dB quieter
    c = _tone_clip([330, 700, 2500])
    fa = audio_fingerprint_array(a, 16000)
    fb = audio_fingerprint_array(b, 16000)
    fc = audio_fingerprint_array(c, 16000)
    ham = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")
    assert ham(fa, fb) <= 4
    assert ham(fa, fc) >= 16
    with pytest.raises(ValueError):
        audio_fingerprint_array(np.zeros(10, np.int16), 16000)


def test_audio_fingerprint_cross_container(spark):
    """The same clip stored as WAV, AU-path G.711 WAV, and MP4 'sowt'
    fingerprints near-identically through the Spark operator, and the
    banded pair generation finds exactly the cross-container dup
    pairs, not the different clip."""
    import numpy as np

    from marketstore_spark.operators.dedup import hash_near_dup_pairs
    from marketstore_spark.operators.mp4 import encode_mp4_audio
    from marketstore_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_fingerprint,
        encode_wav_pcm16,
    )

    x = _tone_clip([440, 1200])
    y = _tone_clip([600, 2300, 3100])
    rows = [
        (1, "audio", "wav", 0, 0, 0, bytearray(encode_wav_pcm16(x, 16000))),
        (2, "audio", "m4a", 0, 0, 0, bytearray(encode_mp4_audio(x, 16000, "sowt"))),
        (3, "audio", "wav", 0, 0, 0, bytearray(encode_wav_pcm16(y, 16000))),
        (4, "audio", "wav", 0, 0, 0, bytearray(b"corrupt")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    sigs = audio_fingerprint(media)
    got = {r["media_id"]: r for r in sigs.collect()}
    assert got[4]["decoded_ok"] == 0
    assert got[1]["afp"] == got[2]["afp"]  # identical samples, identical hash
    pairs = hash_near_dup_pairs(
        sigs.filter("decoded_ok = 1"), sig_col="afp", max_hamming=3
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_media_dedup_keep_transitive_chain(spark):
    """Capstone funnel on crafted signatures: a Hamming chain
    1~2~3 (1 and 3 never pair directly at max_hamming=1) collapses to
    one canonical survivor under transitive clustering; the greedy
    rule keeps the same set here; far ids survive."""
    from marketstore_spark.operators.dedup import media_dedup_keep

    rows = [
        (1, 0),            # base
        (2, 1),            # ham(1,2)=1
        (3, 3),            # ham(2,3)=1, ham(1,3)=2 > max_hamming
        (4, 0x0F0F0F0F0F0F0F0F),   # far from everything
        (5, -0x7000000000000000),  # negative long: sign-bit band path
    ]
    sigs = spark.createDataFrame(rows, "media_id long, dhash long")
    for transitive in (True, False):
        keep = {
            r["media_id"]
            for r in media_dedup_keep(
                sigs, max_hamming=1, transitive=transitive
            ).collect()
        }
        assert keep == {1, 4, 5}, transitive


def test_media_pair_plans_have_no_joins(spark):
    """Plan-shape pin for the 100 TB claims: hash_near_dup_pairs and
    video_near_dup_pairs generate candidates inside band/fingerprint
    buckets with the signature riding the posting list — NO Join node
    anywhere (no all-pairs, no signature re-attach), and the only
    exchanges are the bucket aggregate and the result-side
    distinct/aggregate."""
    import re

    from marketstore_spark.operators.dedup import (
        hash_near_dup_pairs,
        video_near_dup_pairs,
    )

    sigs = spark.createDataFrame(
        [(1, 7), (2, 9)], "media_id long, dhash long"
    )
    plan = hash_near_dup_pairs(sigs)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    frames = spark.createDataFrame(
        [(1, 0, 7), (2, 0, 7)], "media_id long, frame_idx int, dhash long"
    )
    plan = (
        video_near_dup_pairs(frames)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan
    assert len(re.findall(r"Exchange", plan)) <= 3, plan


def test_g711_encoders_match_audioop_full_domain():
    """The closed-form G.711 ENCODERS must reproduce CPython's
    audioop lin2ulaw/lin2alaw for ALL 65536 int16 inputs — the write
    half of the telephony pair, exhaustively pinned."""
    import numpy as np

    audioop = pytest.importorskip("audioop")
    from marketstore_spark.operators.multimodal import (
        _int16_to_alaw,
        _int16_to_ulaw,
    )

    x = np.arange(-32768, 32768, dtype=np.int16)
    raw = x.astype("<i2").tobytes()
    assert np.array_equal(
        _int16_to_ulaw(x), np.frombuffer(audioop.lin2ulaw(raw, 2), np.uint8)
    )
    assert np.array_equal(
        _int16_to_alaw(x), np.frombuffer(audioop.lin2alaw(raw, 2), np.uint8)
    )


def test_g711_wav_writer_roundtrip():
    """encode_wav_g711 → decode_wav is code-transparent: decoding the
    written file equals decoding the codes directly, for both laws,
    and re-encoding the decoded samples is idempotent (G.711 decode
    values are exact code representatives)."""
    import numpy as np

    from marketstore_spark.operators.multimodal import (
        _alaw_to_int16,
        _int16_to_alaw,
        _int16_to_ulaw,
        _ulaw_to_int16,
        decode_wav,
        encode_wav_g711,
    )

    rng = np.random.default_rng(11)
    x = rng.integers(-32768, 32768, size=700, dtype=np.int16)
    for law, enc, dec in (
        ("ulaw", _int16_to_ulaw, _ulaw_to_int16),
        ("alaw", _int16_to_alaw, _alaw_to_int16),
    ):
        wav = encode_wav_g711(x, rate=8000, law=law)
        rate, s = decode_wav(wav)
        assert rate == 8000 and np.array_equal(s, dec(enc(x))), law
        # companding idempotence on representatives
        assert np.array_equal(enc(s), enc(x)), law


def test_mp4_g711_int16_input():
    """encode_mp4_audio compands int16 through the closed-form
    encoders; decoding the track equals the direct encode→decode
    chain."""
    import numpy as np

    from marketstore_spark.operators.mp4 import (
        decode_mp4_audio,
        encode_mp4_audio,
    )
    from marketstore_spark.operators.multimodal import (
        _alaw_to_int16,
        _int16_to_alaw,
        _int16_to_ulaw,
        _ulaw_to_int16,
    )

    rng = np.random.default_rng(12)
    x = rng.integers(-32768, 32768, size=300, dtype=np.int16)
    for codec, enc, dec in (
        ("ulaw", _int16_to_ulaw, _ulaw_to_int16),
        ("alaw", _int16_to_alaw, _alaw_to_int16),
    ):
        rate, s = decode_mp4_audio(encode_mp4_audio(x, rate=8000, codec=codec))
        assert rate == 8000 and np.array_equal(s, dec(enc(x))), codec


def test_alaw_matches_audioop_table():
    """The closed-form G.711 A-law decode must reproduce CPython's
    audioop table for all 256 codes."""
    import numpy as np

    audioop = pytest.importorskip("audioop")
    from marketstore_spark.operators.multimodal import _alaw_to_int16

    mine = _alaw_to_int16(np.arange(256, dtype=np.uint8))
    ref = np.frombuffer(audioop.alaw2lin(bytes(range(256)), 2), "<i2")
    assert np.array_equal(mine, ref)


def test_g711_wav_tags_and_float_containers():
    """Round-12 audio closures, pinned by synthetic round-trips:
    G.711 WAV tags 6/7 decode through the same tables as AU/AIFC, and
    fl32/fl64 AIFC + AU float encodings share decode_wav's
    deterministic float→int16 convention."""
    import struct

    import numpy as np

    audioop = pytest.importorskip("audioop")
    from marketstore_spark.operators.multimodal import (
        decode_aiff,
        decode_au,
        decode_wav,
    )

    lin = (np.arange(-100, 100, dtype=np.int16) * 300).astype("<i2")

    def wav(tag, bits, data, nch=1, rate=8000):
        fmt = struct.pack("<HHIIHH", tag, nch, rate, 0, 0, bits)
        chunks = (
            b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    # tag 6 (A-law) / tag 7 (µ-law): wav path == audioop round decode
    for tag, enc, dec in (
        (6, audioop.lin2alaw, audioop.alaw2lin),
        (7, audioop.lin2ulaw, audioop.ulaw2lin),
    ):
        coded = enc(lin.tobytes(), 2)
        r, s = decode_wav(wav(tag, 8, coded))
        assert r == 8000
        assert np.array_equal(s, np.frombuffer(dec(coded, 2), "<i2"))

    # fl32 AIFC == float32 WAV (tag 3) == AU encoding 6, same samples
    x = (np.linspace(-1.2, 1.2, 64)).astype(np.float32)  # incl. clip range
    rw, sw = decode_wav(wav(3, 32, x.astype("<f4").tobytes()))

    def aifc(ctype, raw, bits):
        comm = (
            struct.pack(">HIH", 1, len(raw), bits)
            + b"\x40\x0b\xfa\x00\x00\x00\x00\x00\x00\x00"  # 8000.0 f80
            + ctype + b"\x00\x00"  # pstring pad
        )
        ssnd = struct.pack(">II", 0, 0) + raw
        body = (
            b"AIFC"
            + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
        )
        return b"FORM" + struct.pack(">I", len(body)) + body

    rf, sf = decode_aiff(aifc(b"fl32", x.astype(">f4").tobytes(), 32))
    assert rf == 8000 and np.array_equal(sw, sf)
    rf64, sf64 = decode_aiff(aifc(b"fl64", x.astype(">f8").tobytes(), 64))
    assert np.array_equal(sw, sf64)

    au = b".snd" + struct.pack(">IIIII", 24, len(x) * 4, 6, 8000, 1)
    ra, sa = decode_au(au + x.astype(">f4").tobytes())
    assert ra == 8000 and np.array_equal(sw, sa)
    # AU encoding 27 (A-law) through the pinned table
    coded = audioop.lin2alaw(lin.tobytes(), 2)
    au27 = b".snd" + struct.pack(">IIIII", 24, len(coded), 27, 8000, 1)
    _, s27 = decode_au(au27 + coded)
    assert np.array_equal(s27, np.frombuffer(audioop.alaw2lin(coded, 2), "<i2"))
    # float64 WAV (tag 3, 64-bit)
    rw64, sw64 = decode_wav(wav(3, 64, x.astype("<f8").tobytes()))
    assert np.array_equal(sw, sw64)


_AUDIODATA = "/root/.pyenv/versions/3.11.7/lib/python3.11/test/audiodata"


def test_au_aiff_cross_container_conformance():
    """One clip shipped by the stdlib in three containers: AU and AIFF
    decode with the same int16 normalization as WAV.  The 24/32-bit
    fixtures are bit-identical across containers (pinned exact); the
    8/16-bit and ulaw masters were made with independent ±1 code
    rounding, so those pin to one quantization step instead."""
    import os

    import numpy as np

    from marketstore_spark.operators.multimodal import (
        decode_aiff,
        decode_au,
        decode_wav,
    )

    if not os.path.isdir(_AUDIODATA):
        pytest.skip("stdlib audiodata fixtures not on this machine")

    def load(name):
        return open(os.path.join(_AUDIODATA, name), "rb").read()

    for width in ("24", "32"):
        rw, sw = decode_wav(load(f"pluck-pcm{width}.wav"))
        ra, sa = decode_au(load(f"pluck-pcm{width}.au"))
        rf, sf = decode_aiff(load(f"pluck-pcm{width}.aiff"))
        assert rw == ra == rf == 11025
        assert np.array_equal(sw, sa) and np.array_equal(sw, sf), width
    # the 8- and 16-bit masters were made with independent ±1 code
    # rounding, so those pin to one quantization step instead
    for width, step in (("8", 256), ("16", 16)):
        rw, sw = decode_wav(load(f"pluck-pcm{width}.wav"))
        _, sa = decode_au(load(f"pluck-pcm{width}.au"))
        _, sf = decode_aiff(load(f"pluck-pcm{width}.aiff"))
        assert np.abs(sw.astype(int) - sa.astype(int)).max() <= step, width
        assert np.abs(sw.astype(int) - sf.astype(int)).max() <= step, width
    # µ-law in both containers, decoded through one table
    ru, su = decode_au(load("pluck-ulaw.au"))
    rc, sc = decode_aiff(load("pluck-ulaw.aifc"))
    assert ru == rc == 11025 and len(su) == len(sc) == len(sw)
    assert np.abs(su.astype(int) - sc.astype(int)).max() <= 1024  # ±1 code
    # companded 8-bit stream still tracks the 16-bit master closely
    corr = np.corrcoef(su.astype(float), sw.astype(float))[0, 1]
    assert corr > 0.999
    # A-law (round 12): the other G.711 half, wild stdlib fixture —
    # coarsest A-law segment step is 1024, masters made with ±1 code
    ra, sa = decode_aiff(load("pluck-alaw.aifc"))
    assert ra == 11025 and len(sa) == len(sw)
    assert np.abs(sa.astype(int) - sw.astype(int)).max() <= 2048
    corr_a = np.corrcoef(sa.astype(float), sw.astype(float))[0, 1]
    assert corr_a > 0.999


def test_au_aiff_through_feature_pipeline(spark):
    """au/aiff formats flow through extract_features' real decoder."""
    import os

    from marketstore_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    if not os.path.isdir(_AUDIODATA):
        pytest.skip("stdlib audiodata fixtures not on this machine")
    rows = []
    for i, name in enumerate(["pluck-pcm16.au", "pluck-pcm16.aiff",
                              "pluck-ulaw.aifc"]):
        payload = open(os.path.join(_AUDIODATA, name), "rb").read()
        fmt = name.rsplit(".", 1)[1]
        rows.append((i, "audio", fmt, 0, 0, len(payload), bytearray(payload)))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_features(media).collect()
    assert len(out) == 3 and all(r["decoded_ok"] == 1 for r in out)


def test_bmp_rle8_decode():
    """BI_RLE8: runs, absolute mode (word-aligned), delta jumps, EOL
    and EOB escapes — hand-assembled fixture vs the expected index
    plane rendered through the same palette as the uncompressed path."""
    import struct

    import numpy as np

    from marketstore_spark.operators.multimodal import decode_bmp

    w, h = 6, 3
    # palette: index i → gray i*40 (BGRX entries)
    pal = b"".join(bytes([i * 40, i * 40, i * 40, 0]) for i in range(4))
    # bottom row: run 3×idx1, absolute [2,3,2] (odd → pad), EOL
    # middle row: run 2×idx3, delta (+2,0), run 2×idx1, EOL
    # top row: run 6×idx2, EOB
    rle = bytes(
        [3, 1, 0, 3, 2, 3, 2, 0, 0, 0]
        + [2, 3, 0, 2, 2, 0, 2, 1, 0, 0]
        + [6, 2, 0, 1]
    )
    off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(rle), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(rle), 2835, 2835, 4, 0
    )
    out = decode_bmp(hdr + info + pal + rle)
    assert out.shape == (h, w, 3)
    g = out[:, :, 0]  # grayscale palette → any channel
    assert list(g[2]) == [40, 40, 40, 80, 120, 80]  # bottom (stored 1st)
    assert list(g[1]) == [120, 120, 0, 0, 40, 40]  # delta leaves zeros
    assert list(g[0]) == [80] * 6
    assert (out[:, :, 0] == out[:, :, 1]).all()  # gray palette


def test_bmp_rle4_decode():
    """BI_RLE4: runs alternate the value byte's nibbles; absolute mode
    packs nibbles word-aligned."""
    import struct

    import numpy as np

    from marketstore_spark.operators.multimodal import decode_bmp

    w, h = 5, 2
    pal = b"".join(bytes([i * 60, i * 60, i * 60, 0]) for i in range(4))
    # bottom row: run of 5 alternating idx 1,2 → [1,2,1,2,1], EOL
    # top row: absolute 3 nibbles [3,0,3] (2 packed bytes + pad), then
    # run 2×idx2, EOB
    rle = bytes([5, 0x12, 0, 0]
                + [0, 3, 0x30, 0x30, 2, 0x22, 0, 1])
    off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(rle), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 4, 2, len(rle), 2835, 2835, 4, 0
    )
    out = decode_bmp(hdr + info + pal + rle)
    g = out[:, :, 0]
    assert list(g[1]) == [60, 120, 60, 120, 60]  # bottom (stored first)
    assert list(g[0]) == [180, 0, 180, 120, 120]


def _bmp_rle8(w, h, rle, npal=4):
    import struct

    pal = b"".join(bytes([i * 40, i * 40, i * 40, 0]) for i in range(npal))
    off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(rle), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(rle), 2835, 2835, npal, 0
    )
    return hdr + info + pal + rle


def test_bmp_rle_corrupt_stays_valueerror():
    """Corrupt RLE payloads must raise ValueError (the decoded_ok=0
    contract resize_images catches), never IndexError: a delta that
    jumps outside the bitmap, and a stream truncated mid-delta."""
    import pytest

    from marketstore_spark.operators.multimodal import decode_bmp

    # delta jumps y past the bitmap height then writes a run
    bad_y = bytes([0, 2, 0, 9] + [3, 1, 0, 1])
    with pytest.raises(ValueError):
        decode_bmp(_bmp_rle8(6, 3, bad_y))
    # delta jumps x past the row width
    bad_x = bytes([0, 2, 200, 0] + [3, 1, 0, 1])
    with pytest.raises(ValueError):
        decode_bmp(_bmp_rle8(6, 3, bad_x))
    # stream ends immediately after the delta escape marker
    trunc = bytes([3, 1, 0, 2])
    with pytest.raises(ValueError):
        decode_bmp(_bmp_rle8(6, 3, trunc))


def test_bmp_bitfields_noncontiguous_mask_raises():
    """A non-contiguous BI_BITFIELDS channel mask cannot be rescaled
    by the span formula — it must raise (decoded_ok=0), not silently
    produce wrong channel values."""
    import struct

    import pytest

    from marketstore_spark.operators.multimodal import decode_bmp

    w, h = 2, 1
    masks = struct.pack("<III", 0x00F000F0, 0x0000FF00, 0x0000000F)
    body = struct.pack("<II", 0xFFFFFFFF, 0)
    off = 14 + 40 + 12
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 32, 3, len(body), 2835, 2835, 0, 0
    )
    with pytest.raises(ValueError):
        decode_bmp(hdr + info + masks + body)


def test_bmp_1bit_and_4bit_uncompressed():
    """The last uncompressed BMP variants: 1-bit bit-packed MSB-first
    rows and 4-bit nibble-packed rows, DWORD-padded, bottom-up, via
    the palette."""
    import struct

    from marketstore_spark.operators.multimodal import decode_bmp

    # 1-bit, 10×2: bottom row 1010101010, top row all ones
    pal = bytes([0, 0, 0, 0, 255, 255, 255, 0])  # idx0 black, idx1 white
    rows = [0b10101010_10 << 6, 0b11111111_11 << 6]  # bottom stored 1st
    body = b"".join(
        struct.pack(">H", r) + b"\x00\x00" for r in rows
    )  # 2 data bytes + 2 pad = DWORD stride
    off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, 10, 2, 1, 1, 0, len(body), 2835, 2835, 2, 0
    )
    out = decode_bmp(hdr + info + pal + body)
    assert out.shape == (2, 10, 3)
    assert list(out[1, :, 0]) == [255, 0] * 5  # bottom row → last
    assert list(out[0, :, 0]) == [255] * 10
    # 4-bit, 3×1: nibbles [1, 2, 3], padded to DWORD
    pal4 = b"".join(bytes([i * 50, i * 50, i * 50, 0]) for i in range(4))
    body4 = bytes([0x12, 0x30, 0, 0])
    off4 = 14 + 40 + len(pal4)
    hdr4 = b"BM" + struct.pack("<IHHI", off4 + len(body4), 0, 0, off4)
    info4 = struct.pack(
        "<IiiHHIIiiII", 40, 3, 1, 1, 4, 0, len(body4), 2835, 2835, 4, 0
    )
    out4 = decode_bmp(hdr4 + info4 + pal4 + body4)
    assert list(out4[0, :, 0]) == [50, 100, 150]


def test_synth_gradient_closed_form_dhash():
    """synth_gradient_image's contract with the multimodal_image_dhash
    oracle: for ANY id, decoding the (BMP or PNG) payload and hashing
    it yields (id%256) repeated in all 8 bytes, two's complement — the
    closed form the SQL oracle computes.  Also pins that the even/odd
    container split really produces two formats through one sniffing
    decode path."""
    from marketstore_spark.operators.multimodal import (
        decode_image_any,
        image_dhash_array,
        synth_gradient_image,
        synth_gradient_pixels,
    )

    for mid in [0, 1, 2, 5, 127, 128, 200, 255, 256, 300, 511, 77777]:
        payload = synth_gradient_image(mid)
        magic = payload[:2]
        assert magic == (b"BM" if mid % 2 == 0 else b"\x89P")
        px = decode_image_any(payload)
        assert px.shape == (16, 18, 3)
        got = image_dhash_array(px)
        p = mid % 256
        exp = p * 0x0101010101010101
        if exp >= 1 << 63:
            exp -= 1 << 64
        assert got == exp, (mid, got, exp)
    # the pixel builder's brightness walk never leaves uint8 range
    for p in range(256):
        px = synth_gradient_pixels(p)
        assert px.min() >= 64 - 8 and px.max() <= 192 + 8


def test_video_near_dup_across_reencodes_spark(spark):
    """The pipeline case P-slice decode exists for: the SAME footage
    re-encoded three ways — uncompressed DIB AVI, all-intra avc1, and
    an IDR+P avc1 GOP (motion compensation, skip runs, DPB) — yields
    identical per-frame fingerprints, so all three pair as near-dups;
    different footage in the same IPPP format does not."""
    import numpy as np

    from marketstore_spark.operators.dedup import video_near_dup_pairs
    from marketstore_spark.operators.mp4 import encode_mp4
    from marketstore_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        synth_gradient_pixels,
        video_frame_dhash,
    )
    from marketstore_spark.operators.video import encode_avi

    # gradient-walk frames: dHash closed form tolerates the +/-2 QP-0
    # residual, so fingerprints are EXACTLY equal across re-encodes
    clip = np.stack([synth_gradient_pixels(37 + 7 * i) for i in range(4)])
    other = np.stack([synth_gradient_pixels(200 - 11 * i) for i in range(4)])
    rows = [
        (1, "video", "avi", 18, 16, 0, bytearray(encode_avi(clip, fps=10))),
        (2, "video", "mp4", 18, 16, 0,
         bytearray(encode_mp4(clip, fps=10, codec="h264", quality=100))),
        (3, "video", "mp4", 18, 16, 0,
         bytearray(encode_mp4(clip, fps=10, codec="h264", quality=100,
                              keyint=4))),
        (4, "video", "mp4", 18, 16, 0,
         bytearray(encode_mp4(other, fps=10, codec="h264", quality=100,
                              keyint=4))),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    sigs = video_frame_dhash(media, every_n=1)
    assert sigs.count() == 16  # 4 media x 4 decoded frames each
    pairs = video_near_dup_pairs(sigs, min_shared=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2), (1, 3), (2, 3)}
