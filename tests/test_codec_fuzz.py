"""Corrupt-payload contract sweep (operators/codecutil.corrupt_guard).

The multimodal operators catch exactly (ValueError,
NotImplementedError) and record decoded_ok=0 / skip the row; ANY other
exception escaping a decoder fails the whole Spark task on one corrupt
corpus file.  This seeded truncation/bit-flip sweep pins that contract
for every container family — it caught struct.error (mp4/avi/bmp/png),
EOFError/wave.Error (wav), and KeyError (JPEG scans referencing
undefined tables) when first written.
"""

import random
import struct

import numpy as np
import pytest

from marketstore_spark.operators import h264, mp4, video
from marketstore_spark.operators.gif import decode_gif, encode_gif
from marketstore_spark.operators.jpeg import decode_jpeg, encode_jpeg
from marketstore_spark.operators.multimodal import (
    decode_aiff,
    decode_au,
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav_adpcm,
    encode_wav_g711,
    encode_wav_pcm16,
)

_FRAMES = np.random.default_rng(0).integers(0, 256, (3, 6, 6, 3), dtype=np.uint8)
_CLIP = np.random.default_rng(1).integers(-3000, 3000, 400).astype(np.int16)
_AU = (
    b".snd"
    + struct.pack(">IIIII", 24, 800, 3, 8000, 1)
    + _CLIP.astype(">i2").tobytes()
)


def _mutations(blob: bytes, seed: int, trials: int):
    rng = random.Random(seed)
    for _ in range(trials):
        b = bytearray(blob)
        mode = rng.randrange(3)
        if mode in (0, 2):
            b = b[: rng.randrange(len(b))]
        if mode in (1, 2):
            for _ in range(rng.randrange(1, 6)):
                if b:
                    b[rng.randrange(len(b))] = rng.randrange(256)
        yield bytes(b)


_CASES = [
    ("mp4raw", lambda: mp4.encode_mp4(_FRAMES, codec="raw"),
     lambda b: list(mp4.decode_mp4_frames(b))),
    ("mp4frag", lambda: mp4.encode_mp4(_FRAMES, codec="raw", fragmented=True),
     lambda b: list(mp4.decode_mp4_frames(b))),
    ("mp4jpeg", lambda: mp4.encode_mp4(_FRAMES, codec="jpeg"),
     lambda b: list(mp4.decode_mp4_frames(b))),
    ("mp4audio", lambda: mp4.encode_mp4_audio(_CLIP, 8000, "twos"),
     mp4.decode_mp4_audio),
    ("mp4ima4", lambda: mp4.encode_mp4_audio(_CLIP, 8000, "ima4"),
     mp4.decode_mp4_audio),
    ("mp4lpcm2", lambda: mp4.encode_mp4_audio(_CLIP, 8000, "lpcm16"),
     mp4.decode_mp4_audio),
    ("avi", lambda: video.encode_avi(_FRAMES),
     lambda b: list(video.decode_avi_frames(b))),
    ("mjpg", lambda: video.encode_avi(_FRAMES, codec="MJPG"),
     lambda b: list(video.decode_avi_frames(b))),
    ("wav", lambda: encode_wav_pcm16(_CLIP, 8000), decode_wav),
    ("wav_g711", lambda: encode_wav_g711(_CLIP, 8000, "alaw"), decode_wav),
    ("wav_ima", lambda: encode_wav_adpcm(_CLIP, 8000, "ima"), decode_wav),
    ("wav_msadpcm", lambda: encode_wav_adpcm(_CLIP, 8000, "ms"), decode_wav),
    ("au", lambda: _AU, decode_au),
    ("aiff_foreign", lambda: _AU, decode_aiff),  # wrong container entirely
    ("bmp", lambda: encode_bmp(_FRAMES[0]), decode_bmp),
    ("png", lambda: encode_png(_FRAMES[0]), decode_png),
    ("gif", lambda: encode_gif((_FRAMES[0] // 64 * 64)[None]), decode_gif),
    ("jpeg", lambda: encode_jpeg(_FRAMES[0]), decode_jpeg),
    ("h264", lambda: h264.encode_h264(_FRAMES, qp=20), h264.decode_h264),
    ("h264p", lambda: h264.encode_h264(_FRAMES, qp=20, keyint=2),
     h264.decode_h264),
    ("h264ms", lambda: h264.encode_h264(  # 2 MB rows -> 2 slices
        np.tile(_FRAMES, (1, 6, 6, 1)), qp=20, keyint=2, slices=2),
     h264.decode_h264),
    ("mp4avc1", lambda: mp4.encode_mp4(_FRAMES, codec="h264"),
     lambda b: list(mp4.decode_mp4_frames(b))),
    ("mp4avc1p", lambda: mp4.encode_mp4(_FRAMES, codec="h264", keyint=2),
     lambda b: list(mp4.decode_mp4_frames(b))),
]


@pytest.mark.parametrize("name,make,dec", _CASES, ids=[c[0] for c in _CASES])
def test_corrupt_payloads_stay_in_contract(name, make, dec):
    blob = make()
    bad = {}
    for mutant in _mutations(blob, seed=hash(name) & 0xFFFF, trials=120):
        try:
            dec(mutant)
        except (ValueError, NotImplementedError):
            pass
        except Exception as ex:  # noqa: BLE001 — the point of the sweep
            bad.setdefault(type(ex).__name__, 0)
            bad[type(ex).__name__] += 1
    assert not bad, f"{name}: non-contract exceptions {bad}"
