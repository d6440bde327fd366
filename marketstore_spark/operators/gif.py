"""Pure-python GIF87a/89a codec (palette + LZW), numpy pixels.

Web corpora are full of GIFs (Common Crawl image payloads), so the
multimodal pipeline decodes them natively like BMP/PNG/JPEG/AVI —
no imaging library in this container, and none needed: GIF's LZW is
~80 lines.  Public spec: GIF89a specification (CompuServe 1990) and
the standard LZW variant with growing code width (max 12 bits), CLEAR
and END codes.

Decode composes animated frames onto the logical-screen canvas
honoring frame offsets, the transparency index, four-pass interlace,
and ALL FOUR disposal methods (unspecified / do-not-dispose /
restore-to-background / restore-to-previous — round 9 closed the
restore pair).  Encode emits valid LZW without dictionary growth by
interleaving CLEAR codes (the classic "uncompressed GIF" stream) —
simple, spec-conformant, and exactly round-trippable, which is what
the property tests need.

Reference parity: none (the reference serves bytes; this is SURVEY §2
#41 pipeline surface).
"""

from __future__ import annotations

import struct

import numpy as np

from marketstore_spark.operators.codecutil import corrupt_guard


# ---------------------------------------------------------------------
# LZW (GIF variant)
# ---------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        out = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("LZW stream truncated")
            bit = (self.data[byte] >> (self.pos & 7)) & 1
            out |= bit << i
            self.pos += 1
        return out


def lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW: little-endian bit packing, growing code width,
    CLEAR resets the dictionary, END terminates."""
    if not 1 <= min_code_size <= 11:
        # GIF codes never exceed 12 bits, so min_code_size + 1 <= 12;
        # a corrupt byte here would otherwise size the fresh dictionary
        # at 2^min_code_size entries — found by the corrupt-payload
        # fuzz sweep as an unbounded loop, not an exception
        raise ValueError(f"LZW minimum code size {min_code_size} out of range")
    clear = 1 << min_code_size
    end = clear + 1
    br = _BitReader(data)

    def fresh():
        return {i: [i] for i in range(clear)}, min_code_size + 1, clear + 2

    table, width, next_code = fresh()
    out: list[int] = []
    prev: list[int] | None = None
    while True:
        code = br.read(width)
        if code == clear:
            table, width, next_code = fresh()
            prev = None
            continue
        if code == end:
            return out
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None:
            table[next_code] = prev + [entry[0]]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


def lzw_encode_flat(indices: "np.ndarray", min_code_size: int) -> bytes:
    """Valid LZW with NO dictionary growth: every index is emitted as a
    literal code, with a CLEAR before the table would need to grow
    (the classic 'uncompressed GIF' technique).  width stays
    min_code_size+1 throughout; decoders reproduce the input exactly."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    bits: list[int] = []

    def emit(code: int):
        for i in range(width):
            bits.append((code >> i) & 1)

    emit(clear)
    # after CLEAR, a decoder adds one table entry per emitted literal
    # (beyond the first); re-CLEAR before code width would change
    budget = (1 << width) - clear - 3
    count = 0
    for idx in np.asarray(indices).ravel():
        if count > budget:
            emit(clear)
            count = 0
        emit(int(idx))
        count += 1
    emit(end)
    by = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i:i + 8]):
            b |= bit << j
        by.append(b)
    return bytes(by)


def _sub_blocks(raw: bytes) -> bytes:
    out = bytearray()
    n = len(raw)
    i = 0
    while i < n:
        out.append(min(255, n - i))
        out.extend(raw[i:i + 255])
        i += 255
    out.append(0)
    return bytes(out)


# ---------------------------------------------------------------------
# container
# ---------------------------------------------------------------------


def encode_gif(
    frames: "np.ndarray",
    offsets: list[tuple[int, int]] | None = None,
    transparent: int | None = None,
    disposals: list[int] | None = None,
) -> bytes:
    """RGB frames (n, h, w, 3 uint8; ≤ 255 distinct colors total) →
    animated GIF89a.  ``offsets`` places frame f at (left, top) on a
    canvas sized to contain every frame; ``transparent`` marks one
    palette index as transparent in frames > 0; ``disposals`` sets the
    per-frame disposal method (0–3) in a graphics-control block."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        frames = frames[None]
    n, h, w, _ = frames.shape
    offsets = offsets or [(0, 0)] * n
    cw = max(ox + w for ox, _ in offsets)
    ch = max(oy + h for _, oy in offsets)

    colors = np.unique(frames.reshape(-1, 3), axis=0)
    if len(colors) > 255:
        raise ValueError("encode_gif: more than 255 distinct colors")
    lut = {tuple(c): i for i, c in enumerate(colors)}
    bits = max(2, int(len(colors) - 1).bit_length())
    table = np.zeros((1 << bits, 3), np.uint8)
    table[: len(colors)] = colors

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", cw, ch)
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag + size, bg, aspect
    out += table.tobytes()
    for f in range(n):
        disp = disposals[f] if disposals else 0
        if (transparent is not None and f > 0) or disp:
            tflag = 0x01 if (transparent is not None and f > 0) else 0
            tidx = transparent if tflag else 0
            out += bytes([0x21, 0xF9, 4, (disp << 2) | tflag, 0, 0, tidx, 0])
        ox, oy = offsets[f]
        out += bytes([0x2C]) + struct.pack("<HHHH", ox, oy, w, h) + bytes([0])
        idx = np.array(
            [lut[tuple(px)] for px in frames[f].reshape(-1, 3)], dtype=np.int32
        )
        mcs = max(2, bits)
        out += bytes([mcs]) + _sub_blocks(lzw_encode_flat(idx, mcs))
    out += bytes([0x3B])
    return bytes(out)


@corrupt_guard
def decode_gif(payload: bytes) -> "np.ndarray":
    """GIF bytes → composed RGB frames (n, canvas_h, canvas_w, 3)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    cw, ch = struct.unpack_from("<HH", payload, 6)
    flags, _bg, _aspect = struct.unpack_from("<BBB", payload, 10)
    pos = 13
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, size * 3, pos).reshape(-1, 3)
        pos += size * 3

    if cw * ch > 1 << 28:
        # 268M pixels (16k×16k) is beyond any real GIF; a corrupt
        # 16-bit dimension field would otherwise allocate/compose a
        # multi-GB canvas from a tiny payload instead of erroring
        raise ValueError(f"implausible GIF canvas {cw}x{ch}")
    canvas = np.zeros((ch, cw, 3), np.uint8)
    if gct is not None:
        # Seed with the logical-screen descriptor's background color
        # index (spec 89a §18) — foreign GIFs whose frames don't cover
        # the canvas expect gct[bg], not palette entry 0.  Guard the
        # index: some encoders write bg past a truncated palette, in
        # which case entry 0 is the conventional fallback.
        canvas[:] = gct[_bg if _bg < len(gct) else 0]
    bg_rgb = canvas[0, 0].copy()
    frames = []
    transparent = None
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphics control
                blen = payload[pos]
                gc_flags = payload[pos + 1]
                disposal = (gc_flags >> 2) & 0x07
                transparent = payload[pos + 4] if gc_flags & 1 else None
                pos += blen + 1
            while payload[pos] != 0:  # remaining sub-blocks
                pos += payload[pos] + 1
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        ox, oy, fw, fh = struct.unpack_from("<HHHH", payload, pos)
        lflags = payload[pos + 8]
        pos += 9
        interlaced = bool(lflags & 0x40)
        ltable = gct
        if lflags & 0x80:
            size = 2 << (lflags & 0x07)
            ltable = np.frombuffer(payload, np.uint8, size * 3, pos).reshape(-1, 3)
            pos += size * 3
        if ltable is None:
            raise ValueError("GIF frame with no color table")
        mcs = payload[pos]
        pos += 1
        raw = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            raw += payload[pos + 1:pos + 1 + ln]
            pos += ln + 1
        pos += 1
        idx = np.array(lzw_decode(bytes(raw), mcs), np.int32)
        if len(idx) != fw * fh:
            raise ValueError("GIF frame pixel count mismatch")
        idx = idx.reshape(fh, fw)
        if interlaced:
            # GIF89a interlace (appendix E): rows arrive in four passes
            # (0::8, 4::8, 2::4, 1::2) — scatter them back in place
            deinter = np.empty_like(idx)
            src = 0
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                n_rows = len(range(start, fh, step))
                deinter[start::step] = idx[src : src + n_rows]
                src += n_rows
            idx = deinter
        # restore-to-previous (disposal 3) needs the pre-compose canvas
        before = canvas.copy() if disposal == 3 else None
        region = canvas[oy:oy + fh, ox:ox + fw]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = ltable[idx[mask]]
        else:
            region[:] = ltable[idx]
        frames.append(canvas.copy())
        # disposal applies AFTER display, before the next frame
        # (spec 89a §23): 2 = restore the frame rect to the background
        # color; 3 = restore the pre-frame canvas content
        if disposal == 2:
            canvas[oy:oy + fh, ox:ox + fw] = bg_rgb
        elif disposal == 3:
            canvas = before
        transparent = None
        disposal = 0
    return np.stack(frames) if frames else np.zeros((0, ch, cw, 3), np.uint8)
