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
