"""Uncompressed-AVI container tests (operators/video.py) and the real
video frame operators in multimodal.py."""

import numpy as np
import pytest

from marketstore_spark.operators.video import (
    decode_avi_frames,
    encode_avi,
    probe_avi,
)


def _frames(n=12, h=10, w=14, seed=1):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def test_avi_roundtrip_exact():
    frames = _frames()
    avi = encode_avi(frames, fps=30)
    info = probe_avi(avi)
    assert info == {"width": 14, "height": 10, "n_frames": 12, "fps": 30, "codec": "DIB"}
    got = dict(decode_avi_frames(avi, every_n=1))
    assert sorted(got) == list(range(12))
    for i in range(12):
        assert (got[i] == frames[i]).all()  # uncompressed: bit-exact


def test_avi_frame_stepping_and_rejection():
    frames = _frames(n=10)
    avi = encode_avi(frames)
    got = dict(decode_avi_frames(avi, every_n=3))
    assert sorted(got) == [0, 3, 6, 9]
    with pytest.raises(ValueError):
        probe_avi(b"RIFFxxxxWAVE")
    # compressed essence is an honest NotImplementedError
    h264 = avi.replace(b"DIB ", b"H264", 1)
    with pytest.raises(NotImplementedError):
        list(decode_avi_frames(h264))


def _smooth_frames(n=6, h=16, w=24):
    """Gradient frames with per-frame motion — JPEG-friendly content
    (random noise is the known worst case for DCT codecs)."""
    yy, xx = np.mgrid[0:h, 0:w]
    out = np.zeros((n, h, w, 3), np.uint8)
    for i in range(n):
        out[i, ..., 0] = ((xx * 255) // max(w - 1, 1) + i * 7) % 256
        out[i, ..., 1] = ((yy * 255) // max(h - 1, 1)) % 256
        out[i, ..., 2] = ((xx + yy + i * 11) * 3) % 256
    return out


def test_mjpeg_avi_roundtrip_close_and_smaller():
    """MJPG essence: real compressed video through the repo's own JPEG
    codec — decodes close to the source and smaller than raw DIB."""
    frames = _smooth_frames()
    mjpg = encode_avi(frames, fps=15, codec="MJPG", quality=95)
    dib = encode_avi(frames, fps=15, codec="DIB")
    info = probe_avi(mjpg)
    assert info["codec"] == "MJPG" and info["n_frames"] == 6
    assert len(mjpg) < len(dib)  # actually compressed
    got = dict(decode_avi_frames(mjpg, every_n=1))
    assert sorted(got) == list(range(6))
    for i in range(6):
        err = np.abs(got[i].astype(int) - frames[i].astype(int))
        assert err.mean() < 8 and got[i].shape == frames[i].shape


def test_mjpeg_frame_stepping():
    frames = _smooth_frames(n=9)
    mjpg = encode_avi(frames, codec="MJPG")
    got = dict(decode_avi_frames(mjpg, every_n=4))
    assert sorted(got) == [0, 4, 8]


def test_mjpeg_through_spark_extract(spark):
    from marketstore_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_bmp,
        extract_frames,
    )

    frames = _smooth_frames(n=5, h=8, w=8)
    mjpg = encode_avi(frames, fps=10, codec="MJPG", quality=95)
    media = spark.createDataFrame(
        [(7, "video", "avi", 8, 8, len(mjpg), bytearray(mjpg))], MEDIA_SCHEMA
    )
    out = extract_frames(media, every_n=2).collect()
    assert {(r["media_id"], r["frame_idx"]) for r in out} == {(7, 0), (7, 2), (7, 4)}
    for r in out:
        px = decode_bmp(bytes(r["payload"]))
        err = np.abs(px.astype(int) - frames[r["frame_idx"]].astype(int))
        assert err.mean() < 8


def test_frame_ops_through_spark(spark):
    from marketstore_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_bmp,
        extract_frames,
        frame_sample_avi,
    )

    frames = _frames(n=9, h=6, w=8, seed=4)
    avi = encode_avi(frames, fps=10)
    rows = [
        (1, "video", "avi", 8, 6, len(avi), bytearray(avi)),
        (2, "video", "mp4", 0, 0, 7, bytearray(b"notavid")),  # skipped
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    meta = frame_sample_avi(media, every_n=4).collect()
    assert {(r["media_id"], r["frame_idx"]) for r in meta} == {(1, 0), (1, 4), (1, 8)}
    assert all(r["width"] == 8 and r["fps"] == 10 for r in meta)

    out = extract_frames(media, every_n=4).collect()
    assert {(r["media_id"], r["frame_idx"]) for r in out} == {(1, 0), (1, 4), (1, 8)}
    for r in out:
        px = decode_bmp(bytes(r["payload"]))
        assert (px == frames[r["frame_idx"]]).all()  # container→BMP exact
