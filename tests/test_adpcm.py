"""IMA (DVI4) and Microsoft ADPCM (operators/adpcm.py) + the WAV
tag 0x11/0x02 wiring in decode_wav: recurrence pinned against
CPython's independent audioop implementation, block structure mono and
stereo, fact-chunk trimming, and corrupt-payload contracts."""

import struct
import warnings

import numpy as np
import pytest

from marketstore_spark.operators.adpcm import (
    IMA_STEP_TABLE,
    decode_ima_wav,
    decode_ms_adpcm,
    encode_ima_wav,
    encode_ms_adpcm,
    ima_decode_nibble,
    ima_encode_sample,
    ima_wav_samples_per_block,
    ms_samples_per_block,
)
from marketstore_spark.operators.multimodal import (
    decode_audio_any,
    decode_wav,
    encode_wav_adpcm,
)


def _sig(n=3000, amp=3000):
    t = np.arange(n, dtype=np.float64)
    return (amp * np.sin(t / 20) + amp / 6 * np.sin(t / 3)).astype(np.int16)


def test_ima_recurrence_matches_audioop():
    """The core IMA step ladder against CPython's audioop.adpcm2lin —
    an INDEPENDENT C implementation of the same public algorithm — on
    4000 random nibbles from state (0, 0).  The same external-oracle
    strategy that pinned G.711."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    rng = np.random.default_rng(0)
    nibbles = rng.integers(0, 16, 4000)
    packed = bytes(
        (int(nibbles[i]) << 4) | int(nibbles[i + 1])
        for i in range(0, len(nibbles), 2)
    )
    ref = np.frombuffer(audioop.adpcm2lin(packed, 2, (0, 0))[0], "<i2")
    pred, idx = 0, 0
    mine = []
    for nib in nibbles:
        pred, idx = ima_decode_nibble(int(nib), pred, idx)
        mine.append(pred)
    assert np.array_equal(np.array(mine, np.int16), ref)


def test_ima_encoder_tracks_decoder_state():
    """ima_encode_sample must return exactly the decoder's
    reconstruction for its chosen nibble — the property that makes
    decode(encode(x)) deterministic."""
    rng = np.random.default_rng(1)
    pred, idx = 0, 0
    for s in rng.integers(-32768, 32768, 2000):
        nib, new_pred, new_idx = ima_encode_sample(int(s), pred, idx)
        dec_pred, dec_idx = ima_decode_nibble(nib, pred, idx)
        assert (new_pred, new_idx) == (dec_pred, dec_idx)
        pred, idx = new_pred, new_idx
    assert len(IMA_STEP_TABLE) == 89


@pytest.mark.parametrize("codec", ["ima", "ms"])
@pytest.mark.parametrize("nch", [1, 2])
def test_wav_adpcm_roundtrip(codec, nch):
    """encode→decode across multiple blocks, mono and stereo: exact
    sample count back (fact trim), bounded reconstruction error, and
    stereo channel 0 really is channel 0 (interleave order)."""
    sig = _sig(2777)  # deliberately not a block multiple
    x = sig if nch == 1 else np.stack([sig, (-sig // 3)], -1)
    wav = encode_wav_adpcm(x, rate=11025, codec=codec)
    rate, s = decode_wav(wav)
    assert rate == 11025 and len(s) == 2777
    ch0 = sig.astype(int)
    err = np.abs(s.astype(int) - ch0)
    assert err.mean() < 120, err.mean()
    # ADPCM is 4:1-ish: the payload is really compressed
    assert len(wav) < x.size * 2 * 0.35
    # the sniffing dispatcher handles it too
    rate2, s2 = decode_audio_any(wav)
    assert rate2 == rate and np.array_equal(s2, s)
    if nch == 2:
        # decoding the raw chunk gives both channels; ch1 differs
        tag = 0x11 if codec == "ima" else 0x02
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(wav):
            cid = wav[pos : pos + 4]
            (ln,) = struct.unpack_from("<I", wav, pos + 4)
            if cid == b"fmt ":
                fmt = wav[pos + 8 : pos + 8 + ln]
            elif cid == b"data":
                data = wav[pos + 8 : pos + 8 + ln]
            pos += 8 + ln + (ln & 1)
        got_tag, got_nch, _r, _a, ba, bits = struct.unpack_from("<HHIIHH", fmt)
        assert (got_tag, got_nch, bits) == (tag, 2, 4)
        dec = decode_ima_wav if codec == "ima" else decode_ms_adpcm
        both = dec(bytes(data), 2, ba)
        assert np.array_equal(both[: len(s), 0], s)
        err1 = np.abs(both[:2777, 1].astype(int) - (-sig // 3).astype(int))
        assert err1.mean() < 120
        assert not np.array_equal(both[:2777, 0], both[:2777, 1])


def test_block_geometry_helpers():
    assert ima_wav_samples_per_block(256, 1) == 505
    assert ima_wav_samples_per_block(512, 2) == 505
    assert ms_samples_per_block(256, 1) == 500
    with pytest.raises(ValueError):
        ima_wav_samples_per_block(6, 2)
    with pytest.raises(ValueError):
        ms_samples_per_block(6, 1)


def test_ima_block_headers_reanchor():
    """Every IMA block header re-anchors the predictor at the true
    first sample: decoding only the SECOND block (from its own header)
    must reproduce exactly the same samples as decoding both — damage
    cannot propagate across blocks."""
    sig = _sig(505 * 2)  # exactly two mono blocks at the default align
    data, ba, spb = encode_ima_wav(sig)
    assert spb == 505 and len(data) == 2 * ba
    full = decode_ima_wav(data, 1, ba)
    second = decode_ima_wav(data[ba:], 1, ba)
    assert np.array_equal(full[spb:], second)


def test_adpcm_corrupt_payloads_stay_in_contract():
    sig = _sig(600)
    for codec in ("ima", "ms"):
        wav = encode_wav_adpcm(sig, 8000, codec)
        # truncation, bit flips: ValueError/NotImplementedError only
        for mutant in (wav[:40], wav[: len(wav) // 2], wav[:-3]):
            try:
                decode_wav(mutant)
            except (ValueError, NotImplementedError):
                pass
        # out-of-range step index / predictor index raise cleanly
        bad = bytearray(wav)
        pos = bad.find(b"data") + 8
        if codec == "ima":
            bad[pos + 2] = 200  # step index > 88
        else:
            bad[pos] = 9  # predictor index > 6
        with pytest.raises(ValueError):
            decode_wav(bytes(bad))


def test_adpcm_through_feature_pipeline(spark):
    """ADPCM WAVs flow through audio_features like every other
    container: real decode, decoded_ok=1, plausible signal stats."""
    from marketstore_spark.operators.multimodal import audio_features

    sig = _sig(1500, amp=8000)
    rows = [
        (1, bytearray(encode_wav_adpcm(sig, 8000, "ima"))),
        (2, bytearray(encode_wav_adpcm(sig, 8000, "ms"))),
        (3, bytearray(b"RIFF\x00\x00\x00\x00WAVEjunk")),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in audio_features(media).collect()}
    for mid in (1, 2):
        assert out[mid]["decoded_ok"] == 1
        assert out[mid]["n_samples"] == 1500
        assert 6000 < out[mid]["peak"] < 11000
    assert out[3]["decoded_ok"] == 0


def test_ima4_mp4_audio_roundtrip():
    """QuickTime 'ima4' in an MP4 'soun' track — real COMPRESSED audio
    in the container: the track decodes bitwise-identically to the
    bare packet-stream twin, mono and stereo, through both
    decode_mp4_audio and the sniffing dispatcher; the preamble's 9-bit
    predictor truncation is part of the lockstep (the encoder
    re-anchors to it)."""
    from marketstore_spark.operators.adpcm import decode_ima_qt, encode_ima_qt
    from marketstore_spark.operators.mp4 import (
        decode_mp4_audio,
        encode_mp4_audio,
    )

    sig = _sig(2000, amp=6000)
    for x in (sig, np.stack([sig, -sig // 4], -1)):
        nch = 1 if x.ndim == 1 else 2
        blob = encode_mp4_audio(x, rate=22050, codec="ima4")
        rate, s = decode_mp4_audio(blob)
        data, _npk = encode_ima_qt(x.astype(np.int16))
        ref = decode_ima_qt(data, nch)[:, 0]
        assert rate == 22050 and np.array_equal(s, ref)
        err = np.abs(s[:2000].astype(int) - sig.astype(int))
        assert err.mean() < 120
        assert len(blob) < x.size * 2 * 0.5  # really compressed
        r2, s2 = decode_audio_any(blob)
        assert r2 == rate and np.array_equal(s2, s)
    # malformed packet stream refuses
    with pytest.raises(ValueError):
        decode_ima_qt(b"\x00" * 35, 1)
    with pytest.raises(ValueError):
        decode_ima_qt(bytes([0x00, 0x59]) + b"\x00" * 32, 1)  # index 89


def test_audio_fingerprint_operating_envelope():
    """Pin the audio fingerprint's measured operating envelope against
    lossy re-encoding: ADPCM transcodes of tonal+noise content move
    the 64-bit hash by MANY bits (double-digit Hamming) — consistent
    with Haitsma & Kalker's 0.35-BER matching regime — while the
    invariances the near-dup pipeline actually relies on (amplitude
    scaling, PCM re-containering) stay bitwise.  If a future change
    makes transcodes land within the banded max_hamming=3 window, the
    docs' scope statement must be revisited (and vice versa: if
    scaling invariance breaks, dedup silently loses its guarantee)."""
    from marketstore_spark.operators.multimodal import (
        audio_fingerprint_array,
        decode_wav,
        encode_wav_pcm16,
    )

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    rng = np.random.default_rng(2)
    t = np.arange(4000, dtype=np.float64)
    lossy_hams = []
    for trial in range(4):
        f1, f2 = 300 + trial * 80, 900 + trial * 130
        sig = (
            6000 * np.sin(2 * np.pi * f1 * t / 8000)
            + 3000 * np.sin(2 * np.pi * f2 * t / 8000)
            + 800 * rng.standard_normal(len(t))
        ).clip(-32000, 32000).astype(np.int16)
        h = audio_fingerprint_array(sig, 8000)
        # invariances the banded pipeline relies on: bitwise
        half = (sig.astype(np.int32) // 2).astype(np.int16)
        assert audio_fingerprint_array(half, 8000) == h
        r, dec = decode_wav(encode_wav_pcm16(sig, 8000))
        assert audio_fingerprint_array(dec, r) == h
        # lossy transcode: hash moves well beyond the banding window
        for codec in ("ima", "ms"):
            r, dec = decode_wav(encode_wav_adpcm(sig, 8000, codec))
            lossy_hams.append(ham(h, audio_fingerprint_array(dec, r)))
    assert min(lossy_hams) > 3, lossy_hams   # transcodes are OUT of scope
    assert max(lossy_hams) < 32, lossy_hams  # but still far from random


def test_aifc_ima4_cross_container_identity():
    """The SAME QuickTime ima4 packet stream shipped as an AIFC (AIFF-C
    compression type 'ima4' — what Apple tools emit) and as an MP4
    'soun' track must decode to IDENTICAL samples — the compressed-
    audio extension of the cross-container identity pin that already
    covers PCM and G.711."""
    from marketstore_spark.operators.adpcm import decode_ima_qt, encode_ima_qt
    from marketstore_spark.operators.mp4 import encode_mp4_audio
    from marketstore_spark.operators.multimodal import decode_aiff

    sig = _sig(1500, amp=7000)
    data, _npk = encode_ima_qt(sig)

    comm = (
        struct.pack(">HIH", 1, len(sig), 16)
        + b"\x40\x0b\xfa\x00\x00\x00\x00\x00\x00\x00"  # 8000.0 as float80
        + b"ima4" + b"\x00\x00"  # compression fourcc + pstring pad
    )
    ssnd = struct.pack(">II", 0, 0) + data
    body = (
        b"AIFC"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    )
    aifc = b"FORM" + struct.pack(">I", len(body)) + body

    ra, sa = decode_aiff(aifc)
    assert ra == 8000
    ref = decode_ima_qt(data, 1)[:, 0]
    assert np.array_equal(sa, ref)
    from marketstore_spark.operators.mp4 import decode_mp4_audio

    rm, sm = decode_mp4_audio(encode_mp4_audio(sig, 8000, "ima4"))
    assert np.array_equal(sa, sm)
    # the sniffing dispatcher sees the AIFC too
    r2, s2 = decode_audio_any(aifc)
    assert r2 == ra and np.array_equal(s2, sa)
