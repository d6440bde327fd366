"""Baseline JPEG codec tests (operators/jpeg.py).

JPEG is lossy, so round-trip assertions use quantization-error bounds
(tight on smooth/flat content, looser on noise); structural assertions
(dimensions, marker layout, subsampling factors) are exact.
"""

import struct

import numpy as np
import pytest

from marketstore_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.dstack(
        [(xx * 255 / w), (yy * 255 / h), ((xx + yy) * 255 / (w + h))]
    ).astype(np.uint8)


def test_roundtrip_smooth_444_and_420():
    px = _gradient(21, 35)  # odd dims exercise MCU edge padding
    for sub, bound in (("444", 6), ("420", 14)):
        dec = decode_jpeg(encode_jpeg(px, quality=90, subsampling=sub))
        assert dec.shape == px.shape
        err = np.abs(dec.astype(int) - px.astype(int))
        assert err.max() <= bound, (sub, int(err.max()))


def test_flat_color_nearly_exact():
    for val in (0, 99, 130, 255):
        flat = np.full((17, 9, 3), val, np.uint8)
        dec = decode_jpeg(encode_jpeg(flat, quality=80, subsampling="420"))
        assert np.abs(dec.astype(int) - val).max() <= 2


def test_quality_tradeoff_monotone_size():
    px = _gradient(32, 32)
    sizes = [len(encode_jpeg(px, quality=q)) for q in (30, 60, 90)]
    assert sizes == sorted(sizes)  # higher quality → more bytes


def test_noise_bounded_error():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(px, quality=95))
    assert np.abs(dec.astype(int) - px.astype(int)).mean() < 8


def test_marker_layout_and_rejections():
    px = _gradient(8, 8)
    data = encode_jpeg(px)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in data[:30]

    with pytest.raises(ValueError):
        decode_jpeg(b"notajpeg")

    # a baseline stream relabeled SOF2 is a degenerate one-scan
    # progressive file: the unified coefficient-store path decodes it
    # pixel-identically (same scan, same coefficients)
    sof0_at = data.find(b"\xff\xc0")
    prog = data[:sof0_at] + b"\xff\xc2" + data[sof0_at + 2 :]
    assert np.array_equal(decode_jpeg(prog), decode_jpeg(data))

    # arithmetic-coded (SOF9) stays out of scope
    arith = data[:sof0_at] + b"\xff\xc9" + data[sof0_at + 2 :]
    with pytest.raises(NotImplementedError):
        decode_jpeg(arith)


def test_sof_subsampling_factors_written():
    px = _gradient(16, 16)
    d444 = encode_jpeg(px, subsampling="444")
    d420 = encode_jpeg(px, subsampling="420")

    def luma_factor(data):
        at = data.find(b"\xff\xc0")
        # SOF0: marker(2) len(2) prec(1) h(2) w(2) nc(1), comp0: id, HV, q
        return data[at + 11]

    assert luma_factor(d444) == 0x11
    assert luma_factor(d420) == 0x22


def test_jpeg_through_spark_pipeline(spark):
    from marketstore_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        resize_images,
    )

    px = _gradient(20, 14)
    for sub in ("444", "420"):
        jpg = encode_jpeg(px, quality=90, subsampling=sub)
        media = spark.createDataFrame(
            [(5, "image", "jpeg", 14, 20, len(jpg), bytearray(jpg))], MEDIA_SCHEMA
        )
        feat = extract_features(media).collect()[0]
        assert feat["decoded_ok"] == 1 and feat["feat_dim"] == 32

        out = resize_images(media, 7, 10).collect()[0]
        resized = decode_jpeg(bytes(out["payload"]))
        assert resized.shape == (10, 7, 3)
        # content preserved through decode→resize→re-encode (nearest
        # neighbor of a gradient stays within quantization error)
        ref = px[::2, ::2]
        assert np.abs(resized.astype(int) - ref.astype(int)).mean() < 12


def test_restart_markers_roundtrip():
    """DRI + RSTn emission (camera-style error resilience): the
    decoder's realignment path must reproduce the no-restart decode
    exactly — same coefficients, same pixels."""
    px = _gradient(40, 48)  # several MCU rows → multiple RSTn fire
    for ri in (1, 2, 5):
        for sub in ("444", "420"):
            ref = decode_jpeg(encode_jpeg(px, quality=90, subsampling=sub))
            rst = decode_jpeg(
                encode_jpeg(px, quality=90, subsampling=sub, restart_interval=ri)
            )
            assert (rst == ref).all(), (ri, sub)
    # DRI segment present only when requested
    assert b"\xff\xdd" in encode_jpeg(px, restart_interval=2)
    assert b"\xff\xdd" not in encode_jpeg(px)


# ---------------------------------------------------------------------
# progressive (SOF2) — T.81 Annex G
# ---------------------------------------------------------------------

import os

_REAL_PROGRESSIVE = (
    "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/share/doc/"
    "rust/html/embedded-book/assets/f3.jpg"
)


def test_progressive_decode_equals_baseline():
    """The scan script re-layers the SAME quantized coefficients, so
    progressive decode must be pixel-identical to baseline decode —
    this exercises every scan kind: shifted DC + refinement, split AC
    first scans at Al=2, two AC refinement passes with EOB runs and
    correction bits."""
    rng = np.random.default_rng(7)
    images = [
        _gradient(33, 21),  # odd dims: MCU padding + true-dims AC grids
        rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8),  # dense AC
        np.full((17, 9, 3), 130, np.uint8),  # EOB-run heavy
    ]
    for img in images:
        for sub in ("444", "420"):
            base = encode_jpeg(img, quality=85, subsampling=sub)
            prog = encode_jpeg(img, quality=85, subsampling=sub, progressive=True)
            assert np.array_equal(decode_jpeg(prog), decode_jpeg(base)), sub


def test_progressive_marker_structure():
    data = encode_jpeg(_gradient(16, 16), progressive=True)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data  # SOF2, no SOF0
    # libjpeg-shaped script: DC + 6 AC-first + 6 AC-refine + DC-refine
    assert data.count(b"\xff\xda") == 14


@pytest.mark.skipif(
    not os.path.exists(_REAL_PROGRESSIVE),
    reason="third-party progressive fixture not on this machine",
)
def test_progressive_real_world_conformance():
    """A real libjpeg-produced progressive photo (public Rust
    embedded-book asset, 10 scans, 2x1 sampling, successive
    approximation): all scans must decode without entropy desync and
    produce photo statistics — a derailed bitstream yields noise
    (neighbor MAD ≈ 85 for uniform random) or raises."""
    img = decode_jpeg(open(_REAL_PROGRESSIVE, "rb").read())
    assert img.shape == (477, 720, 3)
    assert 40 < img.mean() < 220  # sane exposure
    mad_h = np.abs(np.diff(img.astype(int), axis=1)).mean()
    mad_v = np.abs(np.diff(img.astype(int), axis=0)).mean()
    assert mad_h < 30 and mad_v < 30  # strongly correlated neighbors
    assert img.std() > 20  # and not a flat smear


def test_16bit_quant_tables_decode():
    """DQT with Pq=1 (16-bit entries, T.81 B.2.4.1): rewrite a
    baseline file's 8-bit tables as big-endian 16-bit with the same
    values — decode must be pixel-identical."""
    data = encode_jpeg(_gradient(16, 16), quality=90)
    out = bytearray()
    pos = 0
    while pos < len(data):
        if data[pos] == 0xFF and pos + 4 <= len(data) and data[pos + 1] == 0xDB:
            (ln,) = struct.unpack_from(">H", data, pos + 2)
            body = data[pos + 4 : pos + 2 + ln]
            new = bytearray()
            while body:
                tid, entries = body[0], body[1:65]
                new += bytes([0x10 | tid])  # Pq=1
                for v in entries:
                    new += struct.pack(">H", v)
                body = body[65:]
            out += b"\xff\xdb" + struct.pack(">H", len(new) + 2) + new
            pos += 2 + ln
        else:
            out.append(data[pos])
            pos += 1
    wide = bytes(out)
    assert wide != data and b"\xff\xdb" in wide
    assert np.array_equal(decode_jpeg(wide), decode_jpeg(data))


def test_fill_bytes_before_markers_skipped():
    """T.81 §B.1.1.2: any run of 0xFF fill bytes may pad before a
    marker.  The scanner must not read the fill as marker 0xFFFF and
    then consume bogus 'segment length' bytes (ADVICE r10)."""
    px = _gradient(16, 16)
    data = encode_jpeg(px, quality=85)
    # pad before DQT (first marker after SOI/APP0) and before EOI —
    # both sit outside entropy-coded data, where fill bytes are legal
    dqt = data.index(b"\xff\xdb")
    padded = data[:dqt] + b"\xff" * 3 + data[dqt:]
    eoi = padded.rindex(b"\xff\xd9")
    padded = padded[:eoi] + b"\xff" * 2 + padded[eoi:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(data))


def _twelve_bit_flat_jpeg(value=3000):
    """Minimal conformant 12-bit grayscale baseline JPEG: one flat
    8x8 block, unit 16-bit quant table (Pq=1), one-code DC/AC Huffman
    tables.  Flat sample v level-shifts to v-2048, so the lone DC
    coefficient is 8*(v-2048) — for v=3000 that's 7616, size category
    13: a category only the extended 12-bit DC range reaches."""
    dc = 8 * (value - 2048)
    size = dc.bit_length()  # positive → appended bits are the value
    assert size == 13
    out = bytearray(b"\xff\xd8")
    # DQT, Pq=1 (16-bit entries), all ones
    out += b"\xff\xdb" + (2 + 1 + 128).to_bytes(2, "big") + b"\x10"
    out += b"".join((1).to_bytes(2, "big") for _ in range(64))
    # SOF0: precision 12, 8x8, 1 component 1x1
    out += b"\xff\xc0" + (11).to_bytes(2, "big")
    out += struct.pack(">BHHB", 12, 8, 8, 1) + bytes([1, 0x11, 0])
    # DC table: single symbol `size` with the 1-bit code '0'
    counts = [0] * 16
    counts[0] = 1
    out += b"\xff\xc4" + (2 + 1 + 16 + 1).to_bytes(2, "big")
    out += bytes([0x00] + counts + [size])
    # AC table: single symbol 0x00 (EOB) with the 1-bit code '0'
    out += b"\xff\xc4" + (2 + 1 + 16 + 1).to_bytes(2, "big")
    out += bytes([0x10] + counts + [0x00])
    # SOS
    out += b"\xff\xda" + (8).to_bytes(2, "big")
    out += bytes([1, 1, 0x00, 0, 63, 0])
    # entropy: DC code '0' + 13 magnitude bits + AC EOB '0', 1-padded
    bits = "0" + format(dc, f"0{size}b") + "0"
    bits += "1" * (-len(bits) % 8)
    out += int(bits, 2).to_bytes(len(bits) // 8, "big")
    out += b"\xff\xd9"
    return bytes(out)


def test_12bit_precision_decodes_with_downshift():
    """T.81 12-bit sample precision rides the unified path: 16-bit
    quant tables, extended DC categories, 2048 level shift — output
    down-shifted to 8 bits (3000 >> 4 == 187)."""
    px = decode_jpeg(_twelve_bit_flat_jpeg(3000))
    assert px.shape == (8, 8, 3)
    assert (px == 187).all()
    # and a second value to pin the shift isn't a fluke
    assert (decode_jpeg(_twelve_bit_flat_jpeg(2560)) == 160).all()


def test_unsupported_precision_still_fenced():
    bad = bytearray(_twelve_bit_flat_jpeg())
    sof = bad.index(b"\xff\xc0")
    bad[sof + 4] = 16  # precision byte inside SOF0
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(bad))


# Real-world files from unrelated packages on this machine — a mix of
# encoders, subsamplings, and frame types (SOF0 and SOF2, 2x2 px to
# 2241x2013).  Machine-specific fixtures: each skips when absent.
_WILD_JPEGS = [
    ("/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/share/doc/"
     "rust/html/embedded-book/assets/verify.jpeg", (477, 720)),
    ("/root/.pyenv/versions/3.11.7/lib/python3.11/test/imghdrdata/"
     "python.jpg", (16, 16)),
    ("/usr/share/doc/nodejs/thin-white-stripe.jpg", (58, 493)),
    ("/usr/lib/google-cloud-sdk/platform/gsutil/third_party/pyparsing/"
     "docs/_static/pyparsingClassDiagram_1.5.2.jpg", (1659, 1155)),
    ("/usr/lib/google-cloud-sdk/platform/gsutil/third_party/requests/"
     "ext/flower-of-life.jpg", (161, 161)),
    ("/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
     "multi-channel/grayscale.jpg", (215, 300)),
    ("/usr/lib/google-cloud-sdk/platform/google_appengine/google/"
     "appengine/tools/java/jetty12/jetty-home/modules/demo.d/root/"
     "images/webtide_logo.jpg", (60, 245)),
]


@pytest.mark.parametrize("path,shape", _WILD_JPEGS)
def test_wild_jpeg_conformance(path, shape):
    """Every real-world JPEG findable on this machine decodes with
    plausible photo statistics — the 'arbitrary corpus file' claim,
    not just our own encoder's output."""
    import os

    if not os.path.exists(path):
        pytest.skip(f"fixture not on this machine: {path}")
    px = decode_jpeg(open(path, "rb").read())
    assert px.shape == (*shape, 3)
    assert px.std() > 5.0  # real content, not a flat decode artifact
