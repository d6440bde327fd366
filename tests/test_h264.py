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
    # a non-IDR NAL whose payload is really an IDR slice header is
    # corrupt syntax (misaligned header fields), never silent output
    p_slice = b"\x00\x00\x00\x01" + bytes([0x61]) + nals[2][1:]
    with pytest.raises((ValueError, NotImplementedError)):
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


def test_avc1_sample_with_fake_p_header_errors_in_mp4():
    """An avc1 sample whose NAL header claims non-IDR (type 1) while
    the payload is really an IDR slice header is CORRUPT — the fields
    after frame_num misalign.  The MP4 walk must raise (ValueError on
    the garbage syntax, or NotImplementedError if the misread lands on
    a fenced feature flag), never silently yield wrong pixels."""
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
    with pytest.raises((ValueError, NotImplementedError)):
        list(decode_mp4_frames(bytes(patched)))


# ---------------------------------------------------------------------
# P slices: inter prediction
# ---------------------------------------------------------------------


def _moving_scene(n, h, w, dx=3, dy=2, color=(200, 30, 90)):
    """Gradient background with a square translating dx/dy px per
    frame — exercises MC, skip (static background), and residuals."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 3 + yy * 5) % 256).astype(np.uint8)
    frames = []
    for i in range(n):
        f = np.stack([base, (base + 50) % 256, (base + 100) % 256], -1)
        y0, x0 = 4 + dy * i, 6 + dx * i
        f[y0 : y0 + 10, x0 : x0 + 10] = color
        frames.append(f.astype(np.uint8))
    return np.stack(frames)


def test_cbp_inter_table_structure():
    from marketstore_spark.operators.h264 import _CBP_INTER, _CBP_INTRA

    assert len(_CBP_INTER) == 48
    assert sorted(_CBP_INTER) == list(range(48))
    assert sorted(_CBP_INTER) == sorted(_CBP_INTRA)
    assert _CBP_INTER[0] == 0  # no-residual MB gets the shortest code


def _interp_luma_literal(refy, px, py, mvx, mvy, w, h):
    """Per-pixel transcription of spec 8.4.2.2.1 — shares NO code with
    the module's vectorized implementation."""
    H, W = refy.shape

    def S(y, x):
        return int(refy[min(max(y, 0), H - 1), min(max(x, 0), W - 1)])

    def b1(y, x):
        return (S(y, x - 2) - 5 * S(y, x - 1) + 20 * S(y, x)
                + 20 * S(y, x + 1) - 5 * S(y, x + 2) + S(y, x + 3))

    def h1(y, x):
        return (S(y - 2, x) - 5 * S(y - 1, x) + 20 * S(y, x)
                + 20 * S(y + 1, x) - 5 * S(y + 2, x) + S(y + 3, x))

    def clip(v):
        return min(255, max(0, v))

    def bb(y, x):
        return clip((b1(y, x) + 16) >> 5)

    def hh(y, x):
        return clip((h1(y, x) + 16) >> 5)

    def jj(y, x):
        j1 = (b1(y - 2, x) - 5 * b1(y - 1, x) + 20 * b1(y, x)
              + 20 * b1(y + 1, x) - 5 * b1(y + 2, x) + b1(y + 3, x))
        return clip((j1 + 512) >> 10)

    out = np.zeros((h, w), np.int64)
    for yy in range(h):
        for xx in range(w):
            xq, yq = 4 * (px + xx) + mvx, 4 * (py + yy) + mvy
            xi, yi, xf, yf = xq >> 2, yq >> 2, xq & 3, yq & 3
            G, Hs, M = S(yi, xi), S(yi, xi + 1), S(yi + 1, xi)
            b, hv, j = bb(yi, xi), hh(yi, xi), jj(yi, xi)
            m, s = hh(yi, xi + 1), bb(yi + 1, xi)
            out[yy, xx] = {
                (0, 0): G, (1, 0): (G + b + 1) >> 1, (2, 0): b,
                (3, 0): (Hs + b + 1) >> 1,
                (0, 1): (G + hv + 1) >> 1, (1, 1): (b + hv + 1) >> 1,
                (2, 1): (b + j + 1) >> 1, (3, 1): (b + m + 1) >> 1,
                (0, 2): hv, (1, 2): (hv + j + 1) >> 1, (2, 2): j,
                (3, 2): (j + m + 1) >> 1,
                (0, 3): (M + hv + 1) >> 1, (1, 3): (hv + s + 1) >> 1,
                (2, 3): (j + s + 1) >> 1, (3, 3): (m + s + 1) >> 1,
            }[(xf, yf)]
    return out


def test_interp_luma_matches_literal_spec_transcription():
    from marketstore_spark.operators.h264 import _interp_luma

    rng = np.random.default_rng(11)
    refy = rng.integers(0, 256, (24, 20)).astype(np.int64)
    for base_mv in [(0, 0), (-9, 6), (30, -17), (-80, -80), (120, 90)]:
        for xf in range(4):
            for yf in range(4):
                mv = (4 * base_mv[0] + xf, 4 * base_mv[1] + yf)
                got = _interp_luma(refy, 4, 8, mv[0], mv[1], 8, 8)
                want = _interp_luma_literal(refy, 4, 8, mv[0], mv[1], 8, 8)
                assert np.array_equal(got, want), (base_mv, xf, yf)


def test_interp_chroma_matches_literal_spec_transcription():
    from marketstore_spark.operators.h264 import _interp_chroma

    rng = np.random.default_rng(12)
    refc = rng.integers(0, 256, (12, 10)).astype(np.int64)
    Hc, Wc = refc.shape

    def S(y, x):
        return int(refc[min(max(y, 0), Hc - 1), min(max(x, 0), Wc - 1)])

    for mvx in (-13, -3, 0, 5, 41):
        for mvy in (-7, 0, 3, 22):
            got = _interp_chroma(refc, 2, 3, mvx, mvy, 4, 4)
            for yy in range(4):
                for xx in range(4):
                    x8, y8 = 8 * (2 + xx) + mvx, 8 * (3 + yy) + mvy
                    xi, yi, xf, yf = x8 >> 3, y8 >> 3, x8 & 7, y8 & 7
                    want = ((8 - xf) * (8 - yf) * S(yi, xi)
                            + xf * (8 - yf) * S(yi, xi + 1)
                            + (8 - xf) * yf * S(yi + 1, xi)
                            + xf * yf * S(yi + 1, xi + 1) + 32) >> 6
                    assert got[yy, xx] == want, (mvx, mvy, xx, yy)


def test_mvp_median_and_shortcut_rules():
    from marketstore_spark.operators.h264 import _FrameCtx, _mvp, _set_part_mv

    ctx = _FrameCtx(4, 4)
    ctx.slice_ids[:] = ctx.cur_slice  # single-slice picture
    # current MB at (1,1): blocks (4..7, 4..7)
    _set_part_mv(ctx, 0, 4, 4, 4, 0, (8, -4))    # A: left MB
    _set_part_mv(ctx, 4, 0, 4, 4, 0, (-12, 16))  # B: above MB
    _set_part_mv(ctx, 8, 0, 4, 4, 0, (2, 6))     # C: above-right MB
    # all three share ref 0 -> component median
    assert _mvp(ctx, 4, 4, 4, 4, 0) == (2, 6)
    # exactly one neighbour matches ref 1 -> its mv verbatim
    _set_part_mv(ctx, 0, 4, 4, 4, 1, (8, -4))
    assert _mvp(ctx, 4, 4, 4, 4, 1) == (8, -4)
    # 16x8 directional: top partition takes B when refs match
    assert _mvp(ctx, 4, 4, 4, 2, 0, "16x8_top") == (-12, 16)
    # bottom partition takes A when refs match (A is ref 1 now)
    assert _mvp(ctx, 4, 6, 4, 2, 1, "16x8_bot") == (8, -4)
    # 8x16 right partition takes C
    assert _mvp(ctx, 6, 4, 2, 4, 0, "8x16_right") == (2, 6)
    # top-row rule: nothing above -> A verbatim even with ref mismatch
    ctx2 = _FrameCtx(4, 4)
    ctx2.slice_ids[:] = ctx2.cur_slice
    _set_part_mv(ctx2, 0, 0, 4, 4, 1, (20, 12))
    assert _mvp(ctx2, 4, 0, 4, 4, 0) == (20, 12)
    # D fallback: C outside picture, D (above-left) fills the slot
    ctx3 = _FrameCtx(2, 2)
    ctx3.slice_ids[:] = ctx3.cur_slice
    _set_part_mv(ctx3, 0, 0, 4, 4, 0, (4, 4))   # covers B and D columns
    _set_part_mv(ctx3, 0, 4, 4, 4, 0, (0, 8))   # A
    # current MB (1,1); C=(8,3) outside -> D=(3,3) from MB (0,0); B is
    # the undecoded MB (1,0) -> (-1, (0,0)); two ref-0 matches -> median
    assert _mvp(ctx3, 4, 4, 4, 4, 0) == (0, 4)  # median(0,0,4 / 8,0,4)


def test_skip_mv_zero_conditions():
    from marketstore_spark.operators.h264 import _FrameCtx, _set_part_mv, _skip_mv

    ctx = _FrameCtx(4, 4)
    ctx.slice_ids[:] = ctx.cur_slice
    # top-left MB: A and B missing -> zero
    assert _skip_mv(ctx, 0, 0) == (0, 0)
    # zero-MV ref-0 left neighbour -> zero even with a moving B
    _set_part_mv(ctx, 0, 4, 4, 4, 0, (0, 0))
    _set_part_mv(ctx, 4, 0, 4, 4, 0, (8, 8))
    _set_part_mv(ctx, 8, 0, 4, 4, 0, (8, 8))
    assert _skip_mv(ctx, 1, 1) == (0, 0)
    # otherwise: the 16x16 MVP (all three neighbours ref 0 -> median)
    _set_part_mv(ctx, 0, 4, 4, 4, 0, (4, -8))
    assert _skip_mv(ctx, 1, 1) == (8, 8)  # median(4,8,8 / -8,8,8)


def test_p_roundtrip_bitwise_across_qp_sizes_and_gops():
    for qp, (h, w), keyint in [
        (0, (32, 48), 4), (18, (48, 32), 3), (32, (34, 50), 2),
        (44, (16, 16), 8),
    ]:
        frames = _moving_scene(6, h, w)
        data, recon = encode_h264(
            frames, qp=qp, keyint=keyint, return_recon=True
        )
        dec = decode_h264(data)
        assert dec.shape == recon.shape
        assert np.array_equal(dec, recon), (qp, h, w, keyint)


def test_p_partition_shapes_bitwise():
    """Force every inter partition shape (16x8, 8x16, all four 8x8
    sub-MB splits) plus intra-in-P MBs in one stream; the round-trip
    stays bitwise."""
    frames = _moving_scene(3, 48, 64)
    force = {}
    for fi in (1, 2):
        force[(fi, 0, 0)] = "16x8"
        force[(fi, 1, 0)] = "8x16"
        force[(fi, 2, 0)] = ("8x8", [0, 1, 2, 3])
        force[(fi, 0, 1)] = ("8x8", [3, 2, 1, 0])
        force[(fi, 1, 1)] = "i4"
        force[(fi, 2, 1)] = "i16"
        force[(fi, 3, 2)] = "16x16"
    data, recon = encode_h264(
        frames, qp=26, keyint=3, force_mb=force, return_recon=True
    )
    dec = decode_h264(data)
    assert np.array_equal(dec, recon)


def test_p_static_scene_compresses_without_drift():
    """A static source: P frames cost a fraction of intra (skips plus
    small refinements toward the source — the reference is the LOSSY
    IDR reconstruction, so refinement is legitimate), the round-trip
    is bitwise, and quality never drifts away from the source."""
    f0 = _moving_scene(1, 32, 48)[0]
    frames = np.stack([f0] * 4)
    data, recon = encode_h264(frames, qp=30, keyint=4, return_recon=True)
    data_intra = encode_h264(frames, qp=30)
    assert len(data) < len(data_intra) * 0.45  # P frames nearly free
    dec = decode_h264(data)
    assert np.array_equal(dec, recon)
    err = [int(np.abs(dec[i].astype(int) - f0.astype(int)).sum())
           for i in range(4)]
    assert max(err[1:]) <= err[0]  # refinement, never drift


def test_p_true_static_reference_is_all_skip():
    """When the P-frame sources equal the IDR RECONSTRUCTION exactly,
    every MB satisfies the skip conditions: each P slice is a few
    bytes (one skip run) and decodes identical to the IDR frame.
    Grayscale keeps the RGB<->YUV hop an exact identity (chroma is a
    constant 128), so the recon really is the reference."""
    g = _moving_scene(1, 32, 48)[0][..., 0]
    f0 = np.stack([g, g, g], -1)
    _, r0 = encode_h264(f0[None], qp=30, return_recon=True)
    frames = np.stack([f0, r0[0], r0[0], r0[0]])
    data = encode_h264(frames, qp=30, keyint=4)
    nals = split_annexb(data)
    p_slices = nals[3:]
    assert len(p_slices) == 3
    assert all(len(n) <= 8 for n in p_slices)  # header + one skip run
    dec = decode_h264(data)
    for i in range(1, 4):
        assert np.array_equal(dec[i], dec[0])


def test_p_integer_translation_predicts_exactly():
    """EXTERNAL MC pin: frame 1 is frame 0 translated by a whole-pel
    (dx, dy).  Inside the valid region the motion search must find
    that vector, prediction is exact, the residual is zero, and the
    decoded P frame equals the translated decoded IDR bit-for-bit —
    no encoder-reconstruction circularity."""
    rng = np.random.default_rng(5)
    h, w, dx, dy = 32, 48, 3, -2
    base = rng.integers(0, 256, (h, w), dtype=np.uint8)
    g0 = np.stack([base] * 3, -1)
    g1 = np.stack([np.roll(np.roll(base, dy, 0), dx, 1)] * 3, -1)
    data = encode_h264(np.stack([g0, g1]), qp=24, keyint=2, search_range=4)
    dec = decode_h264(data)
    shifted = np.roll(np.roll(dec[0], dy, 0), dx, 1)
    # interior: exclude the wrap margin of np.roll and the MB columns
    # touching it (MC clamps at edges instead of wrapping)
    inner = (slice(16, h - 16), slice(16, w - 16))
    assert np.array_equal(dec[1][inner], shifted[inner])


def test_p_multi_reference_roundtrip():
    """Two sliding-window references with te(v) ref indices: an
    alternating-flicker scene makes ref 1 the better match for every
    even P frame; the round-trip stays bitwise and beats single-ref
    size."""
    a = _moving_scene(1, 32, 48, color=(250, 250, 250))[0]
    b = _moving_scene(1, 32, 48, color=(10, 10, 10))[0]
    frames = np.stack([a, b, a, b, a, b])
    d2, recon = encode_h264(
        frames, qp=28, keyint=6, num_refs=2, return_recon=True
    )
    assert np.array_equal(decode_h264(d2), recon)
    d1 = encode_h264(frames, qp=28, keyint=6, num_refs=1)
    assert len(d2) < len(d1)


def test_p_every_n_sampling_still_decodes_references():
    frames = _moving_scene(6, 32, 32)
    data, recon = encode_h264(frames, qp=24, keyint=6, return_recon=True)
    got = dict(decode_h264_frames(data, every_n=3))
    assert sorted(got) == [0, 3]
    assert np.array_equal(got[3], recon[3])


def test_p_fences_and_stream_errors():
    from marketstore_spark.operators.h264 import _nal

    frames = _moving_scene(4, 16, 16)
    data = encode_h264(frames, qp=24, keyint=4)
    nals = split_annexb(data)
    sps_nal, pps_nal = nals[0], nals[1]

    def stream(*slice_nals):
        out = b"\x00\x00\x00\x01" + sps_nal + b"\x00\x00\x00\x01" + pps_nal
        for nal in slice_nals:
            out += b"\x00\x00\x00\x01" + nal
        return out

    # B slice -> NotImplementedError at the header
    w = BitWriter()
    w.ue(0)   # first_mb
    w.ue(6)   # slice_type: B
    w.ue(0)
    w.u(1, 4)
    w.rbsp_trailing()
    b_nal = bytes([0x41]) + w.tobytes()
    with pytest.raises(NotImplementedError):
        list(decode_h264_frames(stream(nals[2], b_nal)))
    # P slice before any IDR -> ValueError (no reference)
    with pytest.raises(ValueError):
        list(decode_h264_frames(stream(nals[3])))
    # dropping a middle P frame -> frame_num gap ValueError
    with pytest.raises(ValueError):
        list(decode_h264_frames(stream(nals[2], nals[4], nals[5])))
    # ref_pic_list_modification flag set -> fence
    w = BitWriter()
    w.ue(0); w.ue(5); w.ue(0); w.u(1, 4)
    w.u(0, 1)  # no num_ref override
    w.u(1, 1)  # ref_pic_list_modification_flag_l0 = 1
    w.rbsp_trailing()
    with pytest.raises(NotImplementedError):
        list(decode_h264_frames(stream(nals[2], bytes([0x41]) + w.tobytes())))
    # adaptive ref marking -> fence
    w = BitWriter()
    w.ue(0); w.ue(5); w.ue(0); w.u(1, 4)
    w.u(0, 1); w.u(0, 1)
    w.u(1, 1)  # adaptive_ref_pic_marking_mode_flag
    w.rbsp_trailing()
    with pytest.raises(NotImplementedError):
        list(decode_h264_frames(stream(nals[2], bytes([0x41]) + w.tobytes())))
    # truncated P slice -> ValueError
    with pytest.raises(ValueError):
        list(decode_h264_frames(stream(nals[2], nals[3][: len(nals[3]) - 4])))
    _ = _nal  # imported for parity with encoder internals


def test_p_track_in_mp4_roundtrip_with_stss():
    from marketstore_spark.operators.mp4 import (
        _children,
        decode_mp4_frames,
        encode_mp4,
        probe_mp4,
    )

    frames = _moving_scene(6, 32, 48)
    blob = encode_mp4(frames, fps=10, codec="h264", quality=80, keyint=3)
    assert probe_mp4(blob)["n_frames"] == 6
    # the stss box exists and lists exactly the IDR samples (1-based)
    import struct as _struct

    def find_stss(data, s, e):
        for fourcc, (cs, ce) in _children(data, s, e).items():
            if fourcc == b"stss":
                return data[cs:ce]
            if fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                r = find_stss(data, cs, ce)
                if r is not None:
                    return r
        return None

    stss = find_stss(blob, 0, len(blob))
    assert stss is not None
    (cnt,) = _struct.unpack_from(">I", stss, 4)
    entries = _struct.unpack_from(f">{cnt}I", stss, 8)
    assert list(entries) == [1, 4]
    qp = max(0, min(51, 51 - round(80 * 34 / 100)))
    _, recon = encode_h264(frames, qp=qp, keyint=3, return_recon=True)
    got = dict(decode_mp4_frames(blob))
    assert all(np.array_equal(got[i], recon[i]) for i in range(6))
    # sampling a P track still decodes the references internally
    got2 = dict(decode_mp4_frames(blob, every_n=4))
    assert sorted(got2) == [0, 4]
    assert np.array_equal(got2[4], recon[4])


def test_qp_delta_roundtrip_and_stream_shape():
    """Rate-control syntax (the shape every real encoder emits):
    per-frame slice_qp_delta and per-MB chained mb_qp_delta round-trip
    bitwise through IDR and P frames, including extreme jumps (51->0
    wraps through the mod-52 residue)."""
    frames = _moving_scene(4, 48, 64)
    qp_map = {(0, 1, 1): 40, (0, 2, 0): 8, (1, 0, 0): 35, (1, 3, 2): 12,
              (2, 1, 1): 51, (3, 2, 1): 0}
    data, recon = encode_h264(
        frames, qp=28, keyint=4, slice_qps=[24, 30, 28, 44],
        qp_map=qp_map, return_recon=True,
    )
    assert np.array_equal(decode_h264(data), recon)
    # all-intra with per-slice QPs: lower slice QP -> larger slice
    data2, recon2 = encode_h264(
        frames, qp=30, slice_qps=[6, 44, 6, 44], return_recon=True
    )
    assert np.array_equal(decode_h264(data2), recon2)
    sizes = [len(n) for n in split_annexb(data2)[2:]]
    assert sizes[0] > sizes[1] and sizes[2] > sizes[3]
    # quality follows the slice QP: the QP-6 frames are closer to source
    dec2 = decode_h264(data2)
    err = [np.abs(dec2[i].astype(int) - frames[i].astype(int)).mean()
           for i in range(4)]
    assert err[0] < err[1] and err[2] < err[3]
    # invalid inputs refused
    with pytest.raises(ValueError):
        encode_h264(frames, qp=28, slice_qps=[24])  # wrong length
    with pytest.raises(ValueError):
        encode_h264(frames, qp=28, qp_map={(0, 0, 0): 60})
    # decode-side: slice QP outside [0, 51] is corrupt
    nals = split_annexb(encode_h264(frames[:1], qp=2))
    w = BitWriter()
    w.ue(0); w.ue(7); w.ue(0); w.u(0, 4); w.ue(0)
    w.u(0, 1); w.u(0, 1)
    w.se(-10)  # slice_qp_delta -> QP 2-10 < 0
    w.ue(1)
    w.rbsp_trailing()
    bad = (b"\x00\x00\x00\x01" + nals[0] + b"\x00\x00\x00\x01" + nals[1]
           + b"\x00\x00\x00\x01" + bytes([0x65]) + w.tobytes())
    with pytest.raises(ValueError):
        decode_h264(bad)


# ---------------------------------------------------------------------
# multi-slice pictures
# ---------------------------------------------------------------------


def test_multislice_roundtrip_bitwise():
    """Horizontal-band slicing (the common encoder shape): IDR and P
    pictures split 2 and 4 ways round-trip bitwise, composable with
    the QP machinery."""
    frames = _moving_scene(4, 64, 48)
    for slices in (2, 4):
        data, recon = encode_h264(
            frames, qp=26, keyint=4, slices=slices, return_recon=True
        )
        assert np.array_equal(decode_h264(data), recon), slices
        n_slice_nals = sum(
            1 for n in split_annexb(data) if (n[0] & 0x1F) in (1, 5)
        )
        assert n_slice_nals == 4 * slices
    data, recon = encode_h264(
        frames, qp=28, keyint=2, slices=3, slice_qps=[22, 30, 35, 28],
        qp_map={(1, 1, 1): 44}, return_recon=True,
    )
    assert np.array_equal(decode_h264(data), recon)


def test_multislice_slice2_independent_of_slice1():
    """EXTERNAL slice-independence pin: splice slice 2 of picture A
    after slice 1 of picture B (same geometry) — band 2 must decode
    EXACTLY as in A, proving no prediction/nC/QP state crosses the
    slice boundary (6.4.8).  A decoder that leaked ANY cross-slice
    state would change band 2's pixels."""
    fa = _moving_scene(1, 64, 48, color=(220, 40, 90))
    fb = _moving_scene(1, 64, 48, color=(15, 200, 160))
    da, ra = encode_h264(fa, qp=24, slices=2, return_recon=True)
    db, rb = encode_h264(fb, qp=24, slices=2, return_recon=True)
    na, nb = split_annexb(da), split_annexb(db)
    sc = b"\x00\x00\x00\x01"
    spliced = sc + na[0] + sc + na[1] + sc + nb[2] + sc + na[3]
    dec = decode_h264(spliced)
    assert np.array_equal(dec[0][32:], ra[0][32:])
    assert np.array_equal(dec[0][:32], rb[0][:32])


def test_multislice_mp4_sample_grouping():
    """An 'avc1' sample is one ACCESS UNIT: multi-slice pictures group
    all their slice NALs into one sample, and the stateful track walk
    decodes them bitwise."""
    from marketstore_spark.operators.h264 import annexb_to_avcc_samples
    from marketstore_spark.operators.mp4 import (
        _box,
        decode_mp4_frames,
        mux_mp4_samples,
        probe_mp4,
    )

    frames = _moving_scene(4, 64, 48)
    annexb, recon = encode_h264(
        frames, qp=24, keyint=2, slices=2, return_recon=True
    )
    avcc, samples = annexb_to_avcc_samples(annexb)
    assert len(samples) == 4  # pictures, not slices
    blob = mux_mp4_samples(
        samples, 48, 64, fps=5, fourcc=b"avc1", compressor=b"AVC Coding",
        extra_entry_boxes=_box(b"avcC", avcc), sync_samples=[1, 3],
    )
    assert probe_mp4(blob)["n_frames"] == 4
    got = dict(decode_mp4_frames(blob))
    assert all(np.array_equal(got[i], recon[i]) for i in range(4))


def test_multislice_stream_errors():
    frames = _moving_scene(2, 64, 48)
    data = encode_h264(frames, qp=24, keyint=2, slices=2)
    nals = split_annexb(data)
    sc = b"\x00\x00\x00\x01"
    # continuation slice with no picture pending -> refuse
    with pytest.raises(ValueError):
        list(decode_h264_frames(sc + nals[0] + sc + nals[1] + sc + nals[3]))
    # missing continuation -> incomplete picture at finalize
    with pytest.raises(ValueError):
        list(decode_h264_frames(
            sc + nals[0] + sc + nals[1] + sc + nals[2] + sc + nals[4]
            + sc + nals[5]
        ))
    # duplicated slice -> overlap refuse
    with pytest.raises(ValueError):
        list(decode_h264_frames(
            sc + nals[0] + sc + nals[1] + sc + nals[2] + sc + nals[3]
            + sc + nals[3]
        ))
    # encoder bound: more slices than MB rows
    with pytest.raises(ValueError):
        encode_h264(frames, qp=24, slices=9)


def test_multiple_pps_selected_by_slice_header():
    """Wild streams carry several PPSs; the slice header's
    pic_parameter_set_id must select the ACTIVE one.  Build a stream
    with PPS 0 at a wrong QP and PPS 1 at the real QP, repoint the
    slices at PPS 1, and require a bitwise decode — a decoder that
    ignores pps_id picks the wrong quantizer and fails this."""
    from marketstore_spark.operators.h264 import _write_pps

    frames = _gradient(2, 32, 32)
    qp = 24
    data, recon = encode_h264(frames, qp=qp, return_recon=True)
    nals = split_annexb(data)

    def repoint(rbsp, new_id):
        r, w = BitReader(rbsp), BitWriter()
        w.ue(r.ue())          # first_mb
        w.ue(r.ue())          # slice_type
        r.ue()                # old pps_id
        w.ue(new_id)
        total = len(rbsp) * 8
        while r._pos < total:
            w._bits.append(r.u(1))
        while len(w._bits) % 8:
            w._bits.append(0)
        return w.tobytes()

    wrong = BitWriter(); _write_pps(wrong, 51, pps_id=0)
    right = BitWriter(); _write_pps(right, qp, pps_id=1)
    sc = b"\x00\x00\x00\x01"
    stream = (
        sc + nals[0]
        + sc + bytes([0x68]) + wrong.tobytes()
        + sc + bytes([0x68]) + right.tobytes()
    )
    for nal in nals[2:]:
        stream += sc + bytes([0x65]) + rbsp_to_ebsp(
            repoint(ebsp_to_rbsp(nal[1:]), 1)
        )
    assert np.array_equal(decode_h264(stream), recon)
    # a slice naming an unregistered PPS refuses
    bad = sc + nals[0] + sc + bytes([0x68]) + wrong.tobytes()
    bad += sc + bytes([0x65]) + rbsp_to_ebsp(
        repoint(ebsp_to_rbsp(nals[2][1:]), 3)
    )
    with pytest.raises(ValueError):
        decode_h264(bad)


def test_avc3_inband_parameter_sets_in_mp4():
    """'avc3' (the DASH packaging variant): the avcC record carries NO
    parameter sets — SPS/PPS arrive in-band before each IDR sample —
    and the stateful walk picks them up mid-track.  IDR+P GOPs decode
    bitwise; probe reports the codec and the stss sync count."""
    from marketstore_spark.operators.h264 import annexb_to_avc3_samples
    from marketstore_spark.operators.mp4 import (
        _box,
        decode_mp4_frames,
        mux_mp4_samples,
        probe_mp4,
    )

    frames = _moving_scene(4, 32, 48)
    annexb, recon = encode_h264(frames, qp=24, keyint=2, return_recon=True)
    avcc, samples = annexb_to_avc3_samples(annexb)
    assert avcc[5] & 0x1F == 0 and avcc[6] == 0  # no sets in the record
    blob = mux_mp4_samples(
        samples, 48, 32, fps=5, fourcc=b"avc3", compressor=b"AVC Coding",
        extra_entry_boxes=_box(b"avcC", avcc), sync_samples=[1, 3],
    )
    info = probe_mp4(blob)
    assert (info["codec"], info["n_frames"], info["n_sync"]) == ("avc3", 4, 2)
    got = dict(decode_mp4_frames(blob))
    assert all(np.array_equal(got[i], recon[i]) for i in range(4))


def test_probe_n_sync_reports_keyframe_count():
    from marketstore_spark.operators.mp4 import encode_mp4, probe_mp4

    frames = _moving_scene(4, 32, 48)
    # absent stss: every sample is a random-access point
    assert probe_mp4(encode_mp4(frames, codec="h264", quality=85))["n_sync"] == 4
    assert probe_mp4(
        encode_mp4(frames, codec="h264", quality=85, keyint=2)
    )["n_sync"] == 2
