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

    # progressive (SOF2) must raise NotImplementedError, not garble
    sof0_at = data.find(b"\xff\xc0")
    prog = data[:sof0_at] + b"\xff\xc2" + data[sof0_at + 2 :]
    with pytest.raises(NotImplementedError):
        decode_jpeg(prog)


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
