"""MP4 / ISO-BMFF container tests (operators/mp4.py) and the
container-sniffing video dispatch."""

import struct

import numpy as np
import pytest

from marketstore_spark.operators.mp4 import (
    decode_mp4_frames,
    encode_mp4,
    probe_mp4,
)
from marketstore_spark.operators.video import decode_video_frames, probe_video


def _frames(n=7, h=10, w=14, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def _smooth_frames(n=6, h=16, w=24):
    yy, xx = np.mgrid[0:h, 0:w]
    out = np.zeros((n, h, w, 3), np.uint8)
    for i in range(n):
        out[i, ..., 0] = ((xx * 255) // max(w - 1, 1) + i * 7) % 256
        out[i, ..., 1] = ((yy * 255) // max(h - 1, 1)) % 256
        out[i, ..., 2] = ((xx + yy + i * 11) * 3) % 256
    return out


def test_raw_roundtrip_exact_multi_sample_chunks():
    """7 samples at 3 per chunk → chunks of (3,3,1), i.e. a 2-run stsc
    — the layout naive parsers break on."""
    frames = _frames(n=7)
    mp4 = encode_mp4(frames, fps=30, codec="raw", samples_per_chunk=3)
    info = probe_mp4(mp4)
    assert info["width"] == 14 and info["height"] == 10
    assert info["n_frames"] == 7 and info["fps"] == 30 and info["codec"] == "raw"
    got = dict(decode_mp4_frames(mp4, every_n=1))
    assert sorted(got) == list(range(7))
    for i in range(7):
        assert (got[i] == frames[i]).all()  # uncompressed: bit-exact


def test_raw_single_sample_per_chunk_and_stepping():
    frames = _frames(n=9, h=6, w=8)
    mp4 = encode_mp4(frames, codec="raw", samples_per_chunk=1)
    got = dict(decode_mp4_frames(mp4, every_n=4))
    assert sorted(got) == [0, 4, 8]
    for i in got:
        assert (got[i] == frames[i]).all()


def test_photo_jpeg_roundtrip_close_and_smaller():
    frames = _smooth_frames()
    mp4 = encode_mp4(frames, fps=15, codec="jpeg", quality=95)
    raw = encode_mp4(frames, fps=15, codec="raw")
    info = probe_mp4(mp4)
    assert info["codec"] == "jpeg" and info["n_frames"] == 6
    assert info["duration_s"] == pytest.approx(6 / 15)
    assert len(mp4) < len(raw)  # actually compressed
    got = dict(decode_mp4_frames(mp4, every_n=1))
    assert sorted(got) == list(range(6))
    for i in range(6):
        err = np.abs(got[i].astype(int) - frames[i].astype(int))
        assert err.mean() < 8 and got[i].shape == frames[i].shape


def test_co64_and_version1_boxes():
    """64-bit chunk offsets and version-1 mvhd/tkhd/mdhd parse to the
    same answers as the 32-bit forms."""
    frames = _frames(n=5, h=8, w=8)
    for kw in ({"use_co64": True}, {"version1": True},
               {"use_co64": True, "version1": True}):
        mp4 = encode_mp4(frames, fps=12, codec="raw", **kw)
        info = probe_mp4(mp4)
        assert (info["width"], info["height"], info["n_frames"], info["fps"]) == (
            8, 8, 5, 12,
        )
        got = dict(decode_mp4_frames(mp4))
        assert all((got[i] == frames[i]).all() for i in range(5))


def test_interframe_codec_probes_but_decode_fences():
    """avc1 metadata probes fine (that's what a corpus pipeline needs
    for sampling plans); only decode raises."""
    mp4 = encode_mp4(_frames(n=4, h=8, w=8), codec="jpeg")
    avc1 = mp4.replace(b"jpeg", b"avc1", 1)  # stsd entry fourcc only
    info = probe_mp4(avc1)
    assert info["codec"] == "avc1" and info["n_frames"] == 4
    with pytest.raises(NotImplementedError):
        list(decode_mp4_frames(avc1))


def test_corrupt_and_foreign_payloads_raise_valueerror():
    with pytest.raises(ValueError):
        probe_mp4(b"notaniso-bmff-stream")
    mp4 = encode_mp4(_frames(n=3, h=6, w=6), codec="raw")
    with pytest.raises(ValueError):
        probe_mp4(mp4[: len(mp4) // 2])  # moov truncated away/overrun
    # sample table claiming data beyond mdat
    bad = bytearray(mp4)
    pos = bad.find(b"stco")
    (nc,) = struct.unpack_from(">I", bad, pos + 8)
    struct.pack_into(">I", bad, pos + 12, len(bad) + 1000)
    with pytest.raises(ValueError):
        list(decode_mp4_frames(bytes(bad)))
    # audio-only container: hdlr vide → soun is the honest NIE fence
    soun = mp4.replace(b"vide", b"soun", 1)
    with pytest.raises(NotImplementedError):
        probe_mp4(soun)


def test_container_sniffing_dispatch():
    from marketstore_spark.operators.video import encode_avi

    frames = _frames(n=4, h=6, w=8)
    avi = encode_avi(frames, fps=10)
    mp4 = encode_mp4(frames, fps=10, codec="raw")
    assert probe_video(avi)["codec"] == "DIB"
    assert probe_video(mp4)["codec"] == "raw"
    for blob in (avi, mp4):
        got = dict(decode_video_frames(blob, every_n=2))
        assert sorted(got) == [0, 2]
        assert all((got[i] == frames[i]).all() for i in got)
    with pytest.raises(ValueError):
        probe_video(b"\x89PNG\r\n\x1a\nnot-a-video")


def test_mp4_through_spark_frame_ops(spark):
    """MP4 media rows flow through the same mapInPandas operators as
    AVI — probe-only sampling AND full decode-to-BMP — alongside an
    avc1 row that yields metadata but no frames."""
    from marketstore_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_bmp,
        extract_frames,
        frame_sample_avi,
    )

    frames = _frames(n=9, h=6, w=8, seed=5)
    mp4 = encode_mp4(frames, fps=10, codec="raw", samples_per_chunk=4)
    avc1 = encode_mp4(frames, fps=10, codec="jpeg").replace(b"jpeg", b"avc1", 1)
    rows = [
        (1, "video", "mp4", 8, 6, len(mp4), bytearray(mp4)),
        (2, "video", "mp4", 8, 6, len(avc1), bytearray(avc1)),
        (3, "video", "mp4", 0, 0, 7, bytearray(b"notavid")),  # skipped
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    meta = frame_sample_avi(media, every_n=4).collect()
    # probing works for BOTH media 1 (raw) and 2 (avc1): sampling
    # plans over inter-frame corpora need counts without decode
    assert {(r["media_id"], r["frame_idx"]) for r in meta} == {
        (1, 0), (1, 4), (1, 8), (2, 0), (2, 4), (2, 8),
    }
    assert all(r["width"] == 8 and r["fps"] == 10 for r in meta)

    out = extract_frames(media, every_n=4).collect()
    assert {(r["media_id"], r["frame_idx"]) for r in out} == {(1, 0), (1, 4), (1, 8)}
    for r in out:
        px = decode_bmp(bytes(r["payload"]))
        assert (px == frames[r["frame_idx"]]).all()  # container→BMP exact
