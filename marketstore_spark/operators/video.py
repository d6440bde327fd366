"""Uncompressed AVI (RIFF) container codec — pure stdlib + numpy.

Gives the multimodal video path a REAL container format: frames are
24-bit bottom-up BGR DIB bitmaps ('00db' chunks), the layout every
AVI tool emits for raw video.  Compressed codecs inside the container
(mp4/h264 — need ffmpeg, absent here) still raise; the honest boundary
is now "compressed essence", not "video at all".

Layout written/parsed:
  RIFF('AVI ')
    LIST('hdrl') avih + LIST('strl') strh('vids','DIB ') strf(BITMAPINFOHEADER)
    LIST('movi') '00db' frame chunks
    idx1 (written for tool compatibility; parser tolerates absence)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(fourcc: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + data)


def encode_avi(frames: np.ndarray, fps: int = 25) -> bytes:
    """(n, H, W, 3) uint8 RGB frames → uncompressed AVI bytes."""
    n, h, w, _ = frames.shape
    row = w * 3
    stride = row + (4 - row % 4) % 4
    frame_size = stride * h

    payloads = []
    for f in frames:
        body = bytearray()
        for y in range(h - 1, -1, -1):  # DIB rows are bottom-up BGR
            body += f[y, :, ::-1].tobytes() + b"\x00" * (stride - row)
        payloads.append(bytes(body))

    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 // fps,  # microseconds per frame
            frame_size * fps,  # max bytes/sec
            0, 0x10,           # padding, flags (HASINDEX)
            n, 0, 1, frame_size, w, h, 0, 0, 0, 0,
        ),
    )
    strh = _chunk(
        b"strh",
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIIhhhh",
            0, 0, 0, 0, 1, fps, 0, n, frame_size, 0xFFFFFFFF, 0, 0, 0, w, h),
    )
    strf = _chunk(
        b"strf",
        struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    movi_body = b"".join(_chunk(b"00db", p) for p in payloads)
    movi = _list(b"movi", movi_body)
    # idx1: one entry per frame (offset relative to 'movi' fourcc)
    idx, off = bytearray(), 4
    for p in payloads:
        idx += b"00db" + struct.pack("<III", 0x10, off, len(p))
        off += 8 + len(p) + (len(p) % 2)
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk_chunks(data: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, data_start, data_len) over a chunk run."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        yield fourcc, pos + 8, ln
        pos += 8 + ln + (ln % 2)


def probe_avi(payload: bytes) -> dict:
    """Container metadata without decoding frames: {width, height,
    fps, n_frames, codec}."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    info: dict = {}
    for fourcc, start, ln in _walk_chunks(payload, 12, len(payload)):
        if fourcc != b"LIST":
            continue
        kind = payload[start : start + 4]
        if kind == b"hdrl":
            for f2, s2, l2 in _walk_chunks(payload, start + 4, start + ln):
                if f2 == b"avih":
                    us_frame, _, _, _, n = struct.unpack_from("<5I", payload, s2)
                    w, h = struct.unpack_from("<II", payload, s2 + 32)
                    info.update(
                        width=w, height=h, n_frames=n,
                        fps=round(1_000_000 / us_frame) if us_frame else 0,
                    )
                elif f2 == b"LIST" and payload[s2 : s2 + 4] == b"strl":
                    for f3, s3, _ in _walk_chunks(payload, s2 + 4, s2 + l2):
                        if f3 == b"strh" and payload[s3 : s3 + 4] == b"vids":
                            info["codec"] = payload[s3 + 4 : s3 + 8].decode(
                                "ascii", "replace"
                            ).strip()
    if "n_frames" not in info:
        raise ValueError("AVI missing avih header")
    return info


def decode_avi_frames(
    payload: bytes, every_n: int = 1
) -> Iterator[tuple[int, np.ndarray]]:
    """Yield (frame_idx, H×W×3 uint8 RGB) for every ``every_n``-th
    frame.  Only uncompressed DIB essence decodes; compressed codecs
    raise NotImplementedError."""
    info = probe_avi(payload)
    if info.get("codec", "DIB") not in ("DIB", ""):
        raise NotImplementedError(
            f"compressed AVI essence {info['codec']!r} needs ffmpeg"
        )
    w, h = info["width"], info["height"]
    row = w * 3
    stride = row + (4 - row % 4) % 4
    idx = 0
    for fourcc, start, ln in _walk_chunks(payload, 12, len(payload)):
        if fourcc != b"LIST" or payload[start : start + 4] != b"movi":
            continue
        for f2, s2, l2 in _walk_chunks(payload, start + 4, start + ln):
            if f2[2:4] not in (b"db", b"dc"):
                continue
            if idx % every_n == 0:
                rows = [
                    np.frombuffer(payload, np.uint8, count=row, offset=s2 + y * stride)
                    for y in range(h)
                ]
                arr = np.stack(rows).reshape(h, w, 3)[::-1]  # bottom-up
                yield idx, arr[:, :, ::-1].copy()  # BGR → RGB
            idx += 1
