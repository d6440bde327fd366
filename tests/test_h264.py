"""H.264 baseline IDR intra codec (operators/h264.py): VLC table
structure, CAVLC round-trips, bitwise encoder-twin round-trips, QP
quality scaling, the avc1 MP4 path, and the honest fences."""

import numpy as np
import pytest

from marketstore_spark.operators.h264 import (
    BitReader,
    BitWriter,
    _COEFF_TOKEN_CHROMA_DC,
    _COEFF_TOKEN_NC0,
    _COEFF_TOKEN_NC2,
    _COEFF_TOKEN_NC4,
    _RUN_BEFORE,
    _TOTAL_ZEROS_4x4,
    _TOTAL_ZEROS_CHROMA_DC,
    _dequant4x4,
    _fwd4x4,
    _inv4x4,
    _quant4x4,
    cavlc_decode_block,
    cavlc_encode_block,
    decode_h264,
    decode_h264_frames,
    ebsp_to_rbsp,
    encode_h264,
    parse_pps,
    parse_sps,
    rbsp_to_ebsp,
    rgb_to_yuv420,
    split_annexb,
    yuv420_to_rgb,
)


def _gradient(n, h, w, step=2, base=40):
    yy, xx = np.mgrid[0:h, 0:w]
    out = np.zeros((n, h, w, 3), np.uint8)
    for i in range(n):
        g = np.clip(base + xx * step + yy + i * 5, 0, 255).astype(np.uint8)
        out[i] = np.stack([g, g, g], -1)
    return out


# ---------------------------------------------------------------------
# bit layer
# ---------------------------------------------------------------------


def test_exp_golomb_roundtrip():
    w = BitWriter()
    ue_vals = list(range(200)) + [2**10, 2**16 - 1]
    se_vals = list(range(-100, 101))
    for v in ue_vals:
        w.ue(v)
    for v in se_vals:
        w.se(v)
    w.rbsp_trailing()
    r = BitReader(w.tobytes())
    assert [r.ue() for _ in ue_vals] == ue_vals
    assert [r.se() for _ in se_vals] == se_vals


def test_emulation_prevention_roundtrip():
    """Zero-heavy RBSPs must survive the 0x03 escape both ways —
    including the patterns 00 00 00 / 00 00 01 / 00 00 03 that force
    escaping, at buffer boundaries."""
    cases = [
        b"\x00\x00\x00\x00\x00",
        b"\x00\x00\x01\x02\x03",
        b"\x00\x00\x03\x00\x00\x02",
        b"\xff\x00\x00\x00\x01\x00\x00",
        bytes(range(256)) + b"\x00\x00\x00",
    ]
    for rbsp in cases:
        ebsp = rbsp_to_ebsp(rbsp)
        # no start-code emulation survives in the escaped stream
        assert b"\x00\x00\x00" not in ebsp and b"\x00\x00\x01" not in ebsp
        assert ebsp_to_rbsp(ebsp) == rbsp


# ---------------------------------------------------------------------
# VLC tables: prefix-free, complete, bijective
# ---------------------------------------------------------------------


def _assert_prefix_free(codes, name):
    codes = list(codes)
    assert len(set(codes)) == len(codes), f"{name}: duplicate codewords"
    s = sorted(codes)
    for i, a in enumerate(s):
        for b in s[i + 1 :]:
            assert not b.startswith(a), f"{name}: {a} prefixes {b}"


def test_vlc_tables_prefix_free_and_complete():
    for name, tab in [
        ("coeff_token nC<2", _COEFF_TOKEN_NC0),
        ("coeff_token 2<=nC<4", _COEFF_TOKEN_NC2),
        ("coeff_token 4<=nC<8", _COEFF_TOKEN_NC4),
        ("coeff_token chromaDC", _COEFF_TOKEN_CHROMA_DC),
    ]:
        _assert_prefix_free(tab.values(), name)
        maxtc = 4 if "chroma" in name else 16
        for tc in range(maxtc + 1):
            for t1 in range(min(3, tc) + 1):
                assert (t1, tc) in tab, f"{name} missing ({t1},{tc})"
    for tc, lst in _TOTAL_ZEROS_4x4.items():
        assert len(lst) == 16 - tc + 1
        _assert_prefix_free(lst, f"total_zeros tc={tc}")
    for tc, lst in _TOTAL_ZEROS_CHROMA_DC.items():
        assert len(lst) == 4 - tc + 1
        _assert_prefix_free(lst, f"chromaDC total_zeros tc={tc}")
    for z, lst in _RUN_BEFORE.items():
        _assert_prefix_free(lst, f"run_before zl={z}")


def test_cavlc_block_roundtrip_randomized():
    """Encode->decode identity over random sparse blocks at every nC
    class, including trailing-ones edge shapes, suffix-length
    adaptation, the 12-bit escape, and prefix>=16 large levels."""
    rng = np.random.default_rng(7)
    for trial in range(4000):
        n = 16 if trial % 3 else 15
        nc = [-1, 0, 1, 2, 3, 4, 7, 8, 20][trial % 9]
        if nc == -1:
            n = 4
        coeffs = np.zeros(n, np.int64)
        k = rng.integers(0, n + 1)
        coeffs[rng.choice(n, size=k, replace=False)] = rng.choice(
            [-1, 1, -2, 2, -3, 3, -17, 40, -300, 5000, -70000], size=k
        )
        coeffs = [int(c) for c in coeffs]
        w = BitWriter()
        total = cavlc_encode_block(w, coeffs, nc)
        w.rbsp_trailing()
        got = cavlc_decode_block(BitReader(w.tobytes()), nc, n)
        assert got == coeffs, (trial, nc)
        assert total == sum(1 for c in coeffs if c)


def test_transform_quant_qp0_near_lossless():
    rng = np.random.default_rng(3)
    worst = 0
    for _ in range(300):
        x = rng.integers(-255, 256, (4, 4)).astype(np.int64)
        r = _inv4x4(_dequant4x4(_quant4x4(_fwd4x4(x), 0), 0))
        worst = max(worst, int(np.abs(r - x).max()))
    assert worst <= 2, worst


# ---------------------------------------------------------------------
# frame-level encoder-twin round-trips (the validation strategy)
# ---------------------------------------------------------------------


def test_frame_roundtrip_bitwise_across_qp_and_size():
    rng = np.random.default_rng(5)
    configs = [
        ((16, 16), 20), ((32, 32), 20), ((48, 64), 28),
        ((32, 32), 0), ((34, 38), 24),  # non-MB-multiple -> cropping
    ]
    for (h, w), qp in configs:
        f = _gradient(2, h, w)
        blob, recon = encode_h264(f, qp=qp, return_recon=True)
        dec = decode_h264(blob)
        assert dec.shape == f.shape
        assert np.array_equal(dec, recon), f"{h}x{w} qp{qp} not bitwise"
    # dense noise stresses CAVLC (high TotalCoeff, all nC classes)
    f = rng.integers(0, 256, (1, 48, 48, 3), dtype=np.uint8)
    for qp in (0, 10, 30):
        blob, recon = encode_h264(f, qp=qp, return_recon=True)
        assert np.array_equal(decode_h264(blob), recon)


def test_mode_coverage_in_one_stream():
    """The twin only validates what the stream exercises: build
    content that makes the encoder emit I_4x4 (many prediction
    modes), I_16x16 (flat MBs), and forced I_PCM, and require the
    round-trip bitwise on that mixed stream."""
    rng = np.random.default_rng(11)
    h, w = 64, 64
    f = np.zeros((1, h, w, 3), np.uint8)
    yy, xx = np.mgrid[0:16, 0:16]
    tiles = [
        np.full((16, 16), 77),                       # flat -> I_16x16 DC
        40 + xx * 10,                                # vertical edges
        40 + yy * 10,                                # horizontal
        40 + (xx + yy) * 6,                          # diagonal
        40 + np.abs(xx - yy) * 8,                    # ridge
        rng.integers(0, 256, (16, 16)),              # noise -> I_4x4
        200 - (xx * 12) % 160,                       # sawtooth
        30 + xx * 2 + yy * 9,                        # plane -> I_16x16 plane
    ]
    for my in range(4):
        for mx in range(4):
            t = np.clip(tiles[(my * 4 + mx) % len(tiles)], 0, 255)
            f[0, my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = t[..., None]
    blob, recon = encode_h264(
        f, qp=22, pcm_mbs={(3, 3), (0, 2)}, return_recon=True
    )
    dec = decode_h264(blob)
    assert np.array_equal(dec, recon)
    # the PCM MBs round-trip EXACTLY (their YUV is stored verbatim)
    y, cb, cr = rgb_to_yuv420(f[0])
    exact = yuv420_to_rgb(y, cb, cr)
    for mbx, mby in [(3, 3), (0, 2)]:
        sl = np.s_[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16]
        assert np.array_equal(dec[0][sl], exact[sl])


def test_quality_scales_with_qp_and_qp0_lossless_gray():
    """Smooth neutral-chroma content: QP 0 reconstructs exactly (the
    4:2:0 conversion is lossless for gray) and error grows with QP —
    the scaling chain (MF/V tables, DC Hadamard paths) is wired
    correctly end to end."""
    f = _gradient(1, 48, 64)
    errs = []
    for qp in (0, 10, 20, 28, 36):
        blob, recon = encode_h264(f, qp=qp, return_recon=True)
        dec = decode_h264(blob)
        assert np.array_equal(dec, recon)
        errs.append(float(np.abs(dec.astype(int) - f.astype(int)).mean()))
    assert errs[0] == 0.0, "QP 0 should be lossless on gray gradients"
    # broadly increasing: small wiggles allowed (coarser QPs can flip
    # mode decisions toward smoother predictors), big picture must hold
    assert all(b >= a - 0.2 for a, b in zip(errs, errs[1:])), errs
    assert errs[-1] > errs[1] > 0.0 and errs[-1] > 1.0, errs


def test_sps_pps_parse_own_stream():
    blob = encode_h264(_gradient(1, 34, 38), qp=24)
    nals = split_annexb(blob)
    types = [n[0] & 0x1F for n in nals]
    assert types == [7, 8, 5]
    sps = parse_sps(ebsp_to_rbsp(nals[0][1:]))
    assert (sps["width"], sps["height"]) == (38, 34)
    assert (sps["mb_w"], sps["mb_h"]) == (3, 3)
    assert sps["profile"] == 66
    pps = parse_pps(ebsp_to_rbsp(nals[1][1:]))
    assert pps["init_qp"] == 24 and pps["deblock_ctl"] == 1


def test_every_n_frame_stepping():
    f = _gradient(5, 16, 16)
    blob = encode_h264(f, qp=20)
    idxs = [i for i, _ in decode_h264_frames(blob, every_n=2)]
    assert idxs == [0, 2, 4]


# ---------------------------------------------------------------------
# fences: wrong shapes raise the right exception types
# ---------------------------------------------------------------------


def test_fences_and_corruption():
    blob = encode_h264(_gradient(1, 16, 16), qp=20)
    nals = split_annexb(blob)
    # non-IDR slice NAL (type 1) -> inter prediction fence
    p_slice = b"\x00\x00\x00\x01" + bytes([0x61]) + nals[2][1:]
    with pytest.raises(NotImplementedError):
        list(decode_h264_frames(
            b"\x00\x00\x00\x01" + nals[0]
            + b"\x00\x00\x00\x01" + nals[1] + p_slice
        ))
    # CABAC PPS -> fence at parse
    w = BitWriter()
    w.ue(0); w.ue(0); w.u(1, 1)  # entropy_coding_mode_flag = 1
    w.ue(0); w.ue(0); w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 2)
    w.se(0); w.se(0); w.se(0); w.u(0, 3)
    w.rbsp_trailing()
    with pytest.raises(NotImplementedError):
        parse_pps(w.tobytes())
    # truncated slice -> ValueError, not garbage output
    bad = blob[: len(blob) - 12]
    with pytest.raises(ValueError):
        decode_h264(bad)
    # odd dimensions refused at encode (4:2:0 crop units)
    with pytest.raises(ValueError):
        encode_h264(np.zeros((1, 15, 16, 3), np.uint8))
    with pytest.raises(ValueError):
        decode_h264(b"\x12\x34\x56")  # no start codes


# ---------------------------------------------------------------------
# MP4 'avc1' integration
# ---------------------------------------------------------------------


def test_avc1_mp4_roundtrip_and_dispatch():
    from marketstore_spark.operators.h264 import annexb_to_avcc_samples
    from marketstore_spark.operators.mp4 import (
        decode_mp4_frames,
        encode_mp4,
        probe_mp4,
    )
    from marketstore_spark.operators.video import (
        decode_video_frames,
        probe_video,
    )

    frames = _gradient(4, 32, 48, step=5)
    blob = encode_mp4(frames, fps=10, codec="h264", quality=85)
    info = probe_mp4(blob)
    assert (info["codec"], info["n_frames"], info["width"]) == ("avc1", 4, 48)
    qp = max(0, min(51, 51 - round(85 * 34 / 100)))
    _, recon = encode_h264(frames, qp=qp, return_recon=True)
    got = dict(decode_mp4_frames(blob))
    assert sorted(got) == [0, 1, 2, 3]
    assert all(np.array_equal(got[i], recon[i]) for i in range(4))
    # the container-sniffing dispatcher decodes it too
    assert probe_video(blob)["codec"] == "avc1"
    got2 = dict(decode_video_frames(blob, every_n=2))
    assert sorted(got2) == [0, 2]
    assert np.array_equal(got2[2], recon[2])
    # avcC survives a re-parse of its own samples
    annexb = encode_h264(frames, qp=qp)
    avcc, samples = annexb_to_avcc_samples(annexb)
    assert avcc[0] == 1 and len(samples) == 4


def test_avc1_through_spark_dhash(spark):
    """avc1 MP4 payloads flow through the same Arrow hop as every
    other container: video_frame_dhash yields REAL per-frame hashes
    (no fence), completing the media near-dup path for the dominant
    wild codec's intra form."""
    from marketstore_spark.operators.mp4 import encode_mp4
    from marketstore_spark.operators.multimodal import (
        image_dhash_array,
        video_frame_dhash,
    )

    frames = _gradient(3, 16, 32, step=7)
    payload = encode_mp4(frames, fps=5, codec="h264", quality=90)
    media = spark.createDataFrame(
        [(1, "video", bytearray(payload))], "media_id long, kind string, payload binary"
    )
    rows = video_frame_dhash(media, every_n=1).collect()
    assert {r["frame_idx"] for r in rows} == {0, 1, 2}
    qp = max(0, min(51, 51 - round(90 * 34 / 100)))
    _, recon = encode_h264(frames, qp=qp, return_recon=True)
    for r in rows:
        assert r["dhash"] == image_dhash_array(recon[r["frame_idx"]])


def test_sei_and_aud_nals_are_skipped():
    """Wild Annex-B streams interleave SEI (6) and AUD (9) NALs with
    the slices; the decoder must skip them, not choke."""
    blob = encode_h264(_gradient(2, 16, 16), qp=20)
    nals = split_annexb(blob)
    sei = b"\x00\x00\x00\x01" + bytes([0x06]) + b"\x05\x04deadbeef\x80"
    aud = b"\x00\x00\x00\x01" + bytes([0x09]) + b"\x10\x80"
    interleaved = (
        aud
        + b"\x00\x00\x00\x01" + nals[0]
        + sei
        + b"\x00\x00\x00\x01" + nals[1]
        + sei
        + b"\x00\x00\x00\x01" + nals[2]
        + aud
        + b"\x00\x00\x00\x01" + nals[3]
    )
    _, recon = encode_h264(_gradient(2, 16, 16), qp=20, return_recon=True)
    dec = decode_h264(interleaved)
    assert np.array_equal(dec, recon)


def test_avc1_sample_with_p_slice_fences_in_mp4():
    """An avc1 track whose sample carries a non-IDR (type 1) NAL must
    fence with NotImplementedError THROUGH the MP4 walk — the
    real-stream shape (IDR + P frames) never silently yields wrong
    pixels."""
    import struct as _struct

    from marketstore_spark.operators.mp4 import decode_mp4_frames, encode_mp4

    blob = encode_mp4(_gradient(2, 16, 16), codec="h264", quality=85)
    # rewrite the SECOND sample's first NAL header to non-IDR type 1
    # (nal_ref_idc preserved): find the mdat payload's NAL lengths
    from marketstore_spark.operators.mp4 import _children

    mdat_s, _mdat_e = _children(blob, 0, len(blob))[b"mdat"]
    (ln1,) = _struct.unpack_from(">I", blob, mdat_s)
    hdr_pos = mdat_s + 4 + ln1 + 4  # second sample's first NAL header
    patched = bytearray(blob)
    patched[hdr_pos] = (patched[hdr_pos] & 0x60) | 1
    it = decode_mp4_frames(bytes(patched))
    idx0, _f0 = next(it)  # first sample still decodes (it is IDR)
    assert idx0 == 0
    with pytest.raises(NotImplementedError):
        next(it)
