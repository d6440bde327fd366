"""JPEG codec — pure stdlib + numpy (no PIL/libjpeg).

Implements the subset that covers the overwhelming majority of corpus
JPEGs: baseline sequential DCT (SOF0/1) AND progressive DCT (SOF2 —
spectral selection + successive approximation, ITU-T T.81 G.1/G.2:
interleaved DC scans with refinement passes, per-component AC band
scans with EOB-run coding and the correction-bit refinement
algorithm), 8-bit samples, YCbCr (3 component) or grayscale (1
component), 4:4:4 / 4:2:0 / 4:2:2-style sampling factors, restart
markers, with Huffman tables read from the file.  Both frame types
share one decode path: every scan accumulates into per-component
coefficient stores; dequantization + IDCT happen once at the end —
exactly the structure T.81 prescribes, which is why a baseline scan
is just the degenerate single full-band scan.  12-bit sample
precision decodes on the same path (16-bit quant tables, extended DC
categories) with samples reconstructed in the 12-bit domain and
down-shifted to the 8-bit output (s >> 4).  Arithmetic coding raises
NotImplementedError — callers record decoded_ok=0 (data, not a bug).

The encoder emits baseline JFIF with the spec's example tables
(ITU-T T.81 Annex K: quantization tables scaled by quality, typical
luma/chroma Huffman tables), so decode(encode(x)) round-trips within
normal quantization error and any standards-conforming decoder can
read the output.  ``progressive=True`` emits an SOF2 scan script
(libjpeg's default shape: shifted DC, split AC bands at Al=2, two AC
refinement passes, DC refinement) whose decode is pixel-identical to
the baseline encoding at the same quality — the coefficient arrays
are the same, only the entropy layering differs; tests pin that
equality.

Everything is vectorized numpy except the entropy-coded segment, which
is inherently serial bit I/O — fine for thumbnail-scale payloads
inside an Arrow batch; a hot 100 TB image pipeline swaps in a
compiled codec behind the same ``decoder=`` seam (multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

from marketstore_spark.operators.codecutil import corrupt_guard

# -- ITU-T T.81 Annex K example tables --------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# (bits-per-length counts for code lengths 1..16, symbol values) —
# Annex K.3 typical tables
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    n = 8
    k = np.arange(n)
    m = np.sqrt(2.0 / n) * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / (2 * n))
    m[0] = np.sqrt(1.0 / n)
    return m


_DCT = _dct_matrix()


def _fdct(blocks: np.ndarray) -> np.ndarray:
    """Forward 2-D DCT-II over an (n, 8, 8) stack (matrix form)."""
    return _DCT @ blocks @ _DCT.T


def _idct(blocks: np.ndarray) -> np.ndarray:
    return _DCT.T @ blocks @ _DCT


# -- bit I/O ----------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def pad_to_byte(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec

    def write_marker(self, second_byte: int) -> None:
        """Emit a marker (0xFF second_byte) — bypasses byte stuffing,
        marker FFs are intentional."""
        self.pad_to_byte()
        self.out += bytes([0xFF, second_byte])

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:  # marker — entropy data ends; feed 1-bits
                    self.pos -= 1
                    byte = 0xFF
                    self.acc = (self.acc << 8) | byte
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read(self, length: int) -> int:
        if length == 0:
            return 0
        self._fill()
        if self.nbits < length:  # ran off the end: pad with 1s
            self.acc = (self.acc << 8) | 0xFF
            self.nbits += 8
        self.nbits -= length
        return (self.acc >> self.nbits) & ((1 << length) - 1)


def _build_huffman_codes(counts, symbols):
    """symbol → (code, length) per the canonical JPEG assignment."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_huffman_lut(counts, symbols):
    """(code, length) → symbol lookup for decoding."""
    lut, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            lut[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return lut


def _read_code(reader: _BitReader, lut) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read(1)
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy segment")


def _magnitude(value: int) -> tuple[int, int]:
    """value → (size category, appended bits) per F.1.2.1."""
    if value == 0:
        return 0, 0
    size = int(value if value > 0 else -value).bit_length()
    bits = value if value >= 0 else value + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# -- encoder ----------------------------------------------------------


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


#: fixed prefix codes for progressive scans — compression-neutral but
#: complete: progressive needs EOBn symbols (r<<4, r≤14) that the
#: Annex K baseline tables don't define.  DC: all 12 size categories
#: at 4 bits; AC: every possible RS byte, 254 at 8 bits + 2 at 9
#: (Kraft < 1, so the all-ones code stays unused per C.2).
FLAT_DC = ([0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
FLAT_AC = (
    [0, 0, 0, 0, 0, 0, 0, 254, 2, 0, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)


def _encode_block(bw, block, q, dct_codes, act_codes, prev_dc):
    coef = np.round(_fdct(block - 128.0) / q).astype(np.int32).ravel()
    zz = coef[ZIGZAG]
    diff = int(zz[0]) - prev_dc
    size, bits = _magnitude(diff)
    code, length = dct_codes[size]
    bw.write(code, length)
    bw.write(bits, size)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    last = last_nz[-1] + 1 if len(last_nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = act_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = act_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
    if last < 63:
        code, length = act_codes[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def _prepare_planes(pixels: np.ndarray, quality: int, subsampling: str):
    """Shared encode front half: RGB → padded YCbCr component planes
    plus quantization tables and MCU grid."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w, _ = pixels.shape
    rgb = pixels.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
    cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128

    qy = _quality_scale(QUANT_LUMA, quality).reshape(8, 8)
    qc = _quality_scale(QUANT_CHROMA, quality).reshape(8, 8)

    if subsampling == "420":
        # pad to even, then 2×2 mean-pool the chroma planes
        ph, pw = (h + 1) & ~1, (w + 1) & ~1
        cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
        crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
        cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        factors = [(2, 2), (1, 1), (1, 1)]
    else:
        factors = [(1, 1), (1, 1), (1, 1)]

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for plane, (fh, fv) in zip((y, cb, cr), factors):
        th, tw = mcus_y * fv * 8, mcus_x * fh * 8
        planes.append(
            np.pad(
                plane,
                ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
                mode="edge",
            )
        )
    return h, w, factors, planes, qy, qc, mcus_x, mcus_y


def _jfif_headers(h, w, qy, qc, factors, sof_marker):
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(q.ravel()[ZIGZAG].astype(np.uint8)))

    sof = seg(
        sof_marker,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes(
            [
                1, (factors[0][0] << 4) | factors[0][1], 0,
                2, (factors[1][0] << 4) | factors[1][1], 1,
                3, (factors[2][0] << 4) | factors[2][1], 1,
            ]
        ),
    )
    jfif = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return b"\xff\xd8" + jfif + dqt(0, qy) + dqt(1, qc) + sof


def _dht_segment(cls: int, tid: int, table) -> bytes:
    counts, symbols = table
    payload = bytes([(cls << 4) | tid]) + bytes(counts) + bytes(symbols)
    return struct.pack(">HH", 0xFFC4, len(payload) + 2) + payload


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """H×W×3 uint8 RGB → JFIF bytes (Annex-K tables).
    ``subsampling='420'`` downsamples chroma 2×2 (the camera-default
    layout); ``'444'`` keeps full-resolution chroma.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every that many MCUs (DC predictors reset) — what cameras write
    for error resilience.  ``progressive=True`` emits an SOF2 scan
    script instead (see :func:`_encode_progressive`); decode is
    pixel-identical to the baseline encoding at the same settings."""
    if progressive:
        return _encode_progressive(pixels, quality, subsampling)
    h, w, factors, planes, qy, qc, mcus_x, mcus_y = _prepare_planes(
        pixels, quality, subsampling
    )
    dc_l = _build_huffman_codes(*HUFF_DC_LUMA)
    ac_l = _build_huffman_codes(*HUFF_AC_LUMA)
    dc_c = _build_huffman_codes(*HUFF_DC_CHROMA)
    ac_c = _build_huffman_codes(*HUFF_AC_CHROMA)
    comps = [(None, qy, dc_l, ac_l), (None, qc, dc_c, ac_c), (None, qc, dc_c, ac_c)]

    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.write_marker(0xD0 + (mcu_count // restart_interval - 1) % 8)
                prev_dc = [0, 0, 0]
            mcu_count += 1
            for ci, ((_, q, dcc, acc), (fh, fv)) in enumerate(zip(comps, factors)):
                for by in range(fv):
                    for bx in range(fh):
                        py, px = (my * fv + by) * 8, (mx * fh + bx) * 8
                        block = planes[ci][py : py + 8, px : px + 8]
                        prev_dc[ci] = _encode_block(bw, block, q, dcc, acc, prev_dc[ci])
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(q.ravel()[ZIGZAG].astype(np.uint8)))

    def dht(cls: int, tid: int, table) -> bytes:
        counts, symbols = table
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(counts) + bytes(symbols))

    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes(
            [
                1, (factors[0][0] << 4) | factors[0][1], 0,
                2, (factors[1][0] << 4) | factors[1][1], 1,
                3, (factors[2][0] << 4) | factors[2][1], 1,
            ]
        ),
    )
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    jfif = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return (
        b"\xff\xd8"
        + jfif
        + dri
        + dqt(0, qy)
        + dqt(1, qc)
        + sof
        + dht(0, 0, HUFF_DC_LUMA)
        + dht(1, 0, HUFF_AC_LUMA)
        + dht(0, 1, HUFF_DC_CHROMA)
        + dht(1, 1, HUFF_AC_CHROMA)
        + sos
        + entropy
        + b"\xff\xd9"
    )


# -- progressive encoder (T.81 Annex G) -------------------------------


class _ProgScanWriter:
    """Entropy writer for one progressive scan.  Mirrors the decode
    algorithms exactly: EOB-run accumulation across blocks, buffered
    correction bits (the BE/BR discipline of G.1.2.3 — corrections
    crossed before a symbol are emitted right after that symbol and
    its sign bit; corrections inside an EOB run ride with the EOBn)."""

    def __init__(self, dc_codes, ac_codes):
        self.bw = _BitWriter()
        self.dc = dc_codes
        self.ac = ac_codes
        self.eobrun = 0
        self.be: list[int] = []  # correction bits owned by the EOB run

    def _sym(self, s):
        code, length = self.ac[s]
        self.bw.write(code, length)

    def emit_eobrun(self):
        if self.eobrun > 0:
            n = self.eobrun
            nbits = n.bit_length() - 1
            self._sym(nbits << 4)
            if nbits:
                self.bw.write(n & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
            for b in self.be:
                self.bw.write(b, 1)
            self.be = []

    # -- DC scans (G.1.2.1) -------------------------------------------
    def dc_first_block(self, zz, prev: int, al: int) -> int:
        v = int(zz[0]) >> al  # point transform: arithmetic shift
        diff = v - prev
        size, bits = _magnitude(diff)
        code, length = self.dc[size]
        self.bw.write(code, length)
        self.bw.write(bits, size)
        return v

    def dc_refine_block(self, zz, al: int) -> None:
        self.bw.write((int(zz[0]) >> al) & 1, 1)

    # -- AC scans (G.1.2.2 / G.1.2.3) ---------------------------------
    def ac_first_block(self, zz, ss: int, se: int, al: int) -> None:
        r = 0
        for k in range(ss, se + 1):
            v = int(zz[k])
            t = abs(v) >> al  # magnitude point transform (toward zero)
            if t == 0:
                r += 1
                continue
            self.emit_eobrun()
            while r > 15:
                self._sym(0xF0)
                r -= 16
            size, bits = _magnitude(t if v >= 0 else -t)
            self._sym((r << 4) | size)
            self.bw.write(bits, size)
            r = 0
        if r > 0:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.emit_eobrun()

    def ac_refine_block(self, zz, ss: int, se: int, al: int) -> None:
        absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        eob = 0  # last newly-significant position; 0 = none
        for k in range(ss, se + 1):
            if absv[k - ss] == 1:
                eob = k
        r = 0
        br: list[int] = []  # this block's pending correction bits
        for k in range(ss, se + 1):
            t = absv[k - ss]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                self.emit_eobrun()
                self._sym(0xF0)
                r -= 16
                for b in br:
                    self.bw.write(b, 1)
                br = []
            if t > 1:  # history-nonzero: one correction bit, no run
                br.append(t & 1)
                continue
            self.emit_eobrun()
            self._sym((r << 4) | 1)
            self.bw.write(0 if int(zz[k]) < 0 else 1, 1)
            r = 0
            for b in br:
                self.bw.write(b, 1)
            br = []
        if r > 0 or br:
            self.eobrun += 1
            self.be.extend(br)
            if self.eobrun == 0x7FFF:
                self.emit_eobrun()

    def finish(self) -> bytes:
        self.emit_eobrun()
        return self.bw.flush()


def _encode_progressive(pixels: np.ndarray, quality: int, subsampling: str) -> bytes:
    """SOF2 encoding with libjpeg's default scan-script shape: shifted
    interleaved DC (Al=1), split AC first scans at Al=2 (bands 1–5 and
    6–63), two AC refinement passes (2→1, 1→0) and a DC refinement —
    every progressive decode path in this module has an encode twin, so
    decode(progressive) ≡ decode(baseline) is testable bit-for-bit."""
    h, w, factors, planes, qy, qc, mcus_x, mcus_y = _prepare_planes(
        pixels, quality, subsampling
    )
    qs = [qy, qc, qc]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)

    # quantized coefficients per component, zigzag order
    stores = []
    for ci, ((fh, fv), plane) in enumerate(zip(factors, planes)):
        bh, bwid = mcus_y * fv, mcus_x * fh
        store = np.zeros((bh, bwid, 64), np.int32)
        for by in range(bh):
            for bx in range(bwid):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = np.round(_fdct(block - 128.0) / qs[ci])
                store[by, bx] = coef.astype(np.int32).ravel()[ZIGZAG]
        stores.append(store)

    # non-interleaved block grids (true component dims, §A.2.2)
    true_dims = []
    for fh, fv in factors:
        cw = (w * fh + hmax - 1) // hmax
        chh = (h * fv + vmax - 1) // vmax
        true_dims.append(((chh + 7) // 8, (cw + 7) // 8))

    dc_codes = _build_huffman_codes(*FLAT_DC)
    ac_codes = _build_huffman_codes(*FLAT_AC)

    def sos(scomps, ss, se, ah, al):
        body = bytes([len(scomps)])
        for cid in scomps:
            body += bytes([cid, 0x00])  # dc table 0, ac table 0
        body += bytes([ss, se, (ah << 4) | al])
        return struct.pack(">HH", 0xFFDA, len(body) + 2) + body

    def dc_scan(ah, al):
        wtr = _ProgScanWriter(dc_codes, ac_codes)
        prev = [0, 0, 0]
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (fh, fv) in enumerate(factors):
                    for by in range(fv):
                        for bx in range(fh):
                            zz = stores[ci][my * fv + by, mx * fh + bx]
                            if ah == 0:
                                prev[ci] = wtr.dc_first_block(zz, prev[ci], al)
                            else:
                                wtr.dc_refine_block(zz, al)
        return sos([1, 2, 3], 0, 0, ah, al) + wtr.finish()

    def ac_scan(ci, ss, se, ah, al):
        wtr = _ProgScanWriter(dc_codes, ac_codes)
        bh, bwid = true_dims[ci]
        for by in range(bh):
            for bx in range(bwid):
                if ah == 0:
                    wtr.ac_first_block(stores[ci][by, bx], ss, se, al)
                else:
                    wtr.ac_refine_block(stores[ci][by, bx], ss, se, al)
        return sos([ci + 1], ss, se, ah, al) + wtr.finish()

    scans = [dc_scan(0, 1)]
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(3):
            scans.append(ac_scan(ci, ss, se, 0, 2))
    for ah, al in ((2, 1), (1, 0)):
        for ci in range(3):
            scans.append(ac_scan(ci, 1, 63, ah, al))
    scans.append(dc_scan(1, 0))

    return (
        _jfif_headers(h, w, qy, qc, factors, 0xFFC2)
        + _dht_segment(0, 0, FLAT_DC)
        + _dht_segment(1, 0, FLAT_AC)
        + b"".join(scans)
        + b"\xff\xd9"
    )


# -- decoder ----------------------------------------------------------


@corrupt_guard
def decode_jpeg(payload: bytes) -> np.ndarray:
    """JFIF bytes (baseline SOF0/1 or progressive SOF2) → H×W×3 uint8
    RGB (grayscale replicates).

    One architecture for both frame types (T.81 §E/G): each SOS scan
    entropy-decodes into persistent per-component coefficient stores —
    a baseline file is simply the single full-band scan — and the
    image reconstructs once from the final coefficients.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    precision = 8
    restart_interval = 0
    coefs = None
    got_scan = False
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        # T.81 §B.1.1.2: any number of 0xFF fill bytes may pad before
        # a marker — skip them so the fill isn't read as marker 0xFFFF
        # (which would then consume bogus "segment length" bytes)
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(payload):
            break
        marker = struct.unpack_from(">H", payload, pos)[0]
        pos += 2
        if marker in (0xFFD8, 0xFF01) or 0xFFD0 <= marker <= 0xFFD7:
            continue
        if marker == 0xFFD9:
            break
        (ln,) = struct.unpack_from(">H", payload, pos)
        data = payload[pos + 2 : pos + ln]
        if marker == 0xFFDB:
            d = data
            while d:
                prec16 = d[0] >> 4  # Pq=1: 16-bit table entries (B.2.4.1)
                tab = np.zeros(64, np.int32)
                if prec16:
                    tab[ZIGZAG] = np.frombuffer(d[1:129], ">u2").astype(np.int32)
                    step = 129
                else:
                    tab[ZIGZAG] = np.frombuffer(d[1:65], np.uint8)
                    step = 65
                quant[d[0] & 0xF] = tab.reshape(8, 8)
                d = d[step:]
        elif marker == 0xFFC4:
            d = data
            while d:
                cls, tid = d[0] >> 4, d[0] & 0xF
                counts = list(d[1:17])
                n = sum(counts)
                huff[(cls, tid)] = _build_huffman_lut(counts, list(d[17 : 17 + n]))
                d = d[17 + n :]
        elif marker in (0xFFC0, 0xFFC1, 0xFFC2):
            prec, h, w, nc = struct.unpack_from(">BHHB", data, 0)
            if prec not in (8, 12):
                raise NotImplementedError("only 8-bit and 12-bit JPEG")
            precision = prec
            progressive = marker == 0xFFC2
            comps = []
            for i in range(nc):
                cid, samp, qid = data[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0xF, qid))
            frame = (h, w, comps)
        elif marker in (0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise NotImplementedError(
                "only baseline (SOF0/1) and progressive (SOF2) JPEG"
            )
        elif marker == 0xFFDD:
            restart_interval = struct.unpack_from(">H", data, 0)[0]
        elif marker == 0xFFDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = data[0]
            scomps = []
            for i in range(ns):
                cid, tids = data[1 + 2 * i : 3 + 2 * i]
                scomps.append((cid, tids >> 4, tids & 0xF))
            ss, se = data[1 + 2 * ns], data[2 + 2 * ns]
            a = data[3 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            if not progressive:
                # baseline SOS always covers the full band unshifted
                ss, se, ah, al = 0, 63, 0, 0
            if coefs is None:
                coefs = _alloc_coefs(frame)
            pos = _decode_entropy(
                payload, pos + ln, frame, scomps, ss, se, ah, al,
                coefs, huff, restart_interval,
            )
            got_scan = True
            continue
        pos += ln
    if not got_scan:
        raise ValueError("no scan data found")
    return _reconstruct(frame, coefs, quant, precision)


def _alloc_coefs(frame):
    """Per-component coefficient stores sized to the padded MCU grid
    (natural order, (block_rows, block_cols, 64))."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    return [
        np.zeros((mcus_y * cv, mcus_x * ch, 64), np.int32)
        for _cid, ch, cv, _qid in comps
    ]


def _component_block_dims(frame, ci):
    """True (non-interleaved) block grid of one component (T.81 §A.2.2:
    ceil of the scaled sample dimensions over 8)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    _cid, ch, cv, _qid = comps[ci]
    cw = (w * ch + hmax - 1) // hmax
    chh = (h * cv + vmax - 1) // vmax
    return (chh + 7) // 8, (cw + 7) // 8


def _sync_restart(reader: _BitReader) -> None:
    """Drop partial bits and skip past the next RSTn marker."""
    reader.nbits = 0
    reader.acc = 0
    d = reader.data
    p = reader.pos
    while p + 1 < len(d) and not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
        p += 1
    reader.pos = p + 2


def _entropy_end(payload: bytes, start: int) -> int:
    """Position of the first real marker after an entropy segment
    (skipping stuffed 0xFF00 and RSTn, which belong to the segment)."""
    p = start
    n = len(payload)
    while p + 1 < n:
        if (
            payload[p] == 0xFF
            and payload[p + 1] != 0x00
            and not (0xD0 <= payload[p + 1] <= 0xD7)
        ):
            return p
        p += 1
    return n


# -- per-block entropy decoders (T.81 F.2.2 / G.2) --------------------


def _dec_dc_first(reader, block, dc_lut, prev_dc, cid, al):
    size = _read_code(reader, dc_lut)
    diff = _extend(reader.read(size), size)
    prev_dc[cid] += diff
    block[0] = prev_dc[cid] << al


def _dec_dc_refine(reader, block, al):
    if reader.read(1):
        block[0] |= 1 << al


def _dec_ac_first(reader, block, ac_lut, ss, se, al, state):
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _read_code(reader, ac_lut)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r != 15:
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += reader.read(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            break  # tolerate corrupt run like the baseline path
        block[ZIGZAG[k]] = _extend(reader.read(s), s) << al
        k += 1


def _dec_ac_refine(reader, block, ac_lut, ss, se, al, state):
    """Successive-approximation AC refinement (T.81 G.2.2): one
    correction bit per already-nonzero coefficient crossed, new
    coefficients appear as ±1<<Al after their zero run."""
    p1 = 1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _read_code(reader, ac_lut)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += reader.read(r)
                    break  # the tail below consumes this block
                # r == 15: ZRL — cross 16 zero-history positions
            else:
                val = p1 if reader.read(1) else -p1
            while k <= se:
                z = ZIGZAG[k]
                if block[z] != 0:
                    if reader.read(1) and (block[z] & p1) == 0:
                        block[z] += p1 if block[z] >= 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                block[ZIGZAG[k]] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            z = ZIGZAG[k]
            if block[z] != 0:
                if reader.read(1) and (block[z] & p1) == 0:
                    block[z] += p1 if block[z] >= 0 else -p1
            k += 1
        state["eobrun"] -= 1


def _decode_entropy(
    payload, start, frame, scomps, ss, se, ah, al, coefs, huff, restart_interval
):
    """Decode one scan's entropy segment into the coefficient stores;
    returns the payload position just past the segment."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if not all(c[1] in (1, 2) and c[2] in (1, 2) for c in comps):
        raise NotImplementedError("only 1x1/2x2 sampling factors")
    ci_by_cid = {cid: i for i, (cid, *_rest) in enumerate(comps)}
    # validate scan references up front: a corrupt SOS can name a
    # component or entropy table that was never defined, and the bare
    # dict lookups in decode_block would surface that as KeyError —
    # outside the decoded_ok=0 (ValueError) contract
    for _cid, _dc_tid, _ac_tid in scomps:
        if _cid not in ci_by_cid:
            raise ValueError(f"SOS references undefined component {_cid}")
        if ss == 0 and ah == 0 and (0, _dc_tid) not in huff:
            raise ValueError(f"SOS references undefined DC table {_dc_tid}")
        if se > 0 and (1, _ac_tid) not in huff:
            raise ValueError(f"SOS references undefined AC table {_ac_tid}")
    reader = _BitReader(payload[start:])
    prev_dc = {cid: 0 for cid, _dc, _ac in scomps}
    state = {"eobrun": 0}
    unit = 0  # MCU (interleaved) / block (single-component) counter

    def maybe_restart():
        nonlocal unit
        if restart_interval and unit and unit % restart_interval == 0:
            _sync_restart(reader)
            for cid in prev_dc:
                prev_dc[cid] = 0
            state["eobrun"] = 0
        unit += 1

    def decode_block(block, cid, dc_tid, ac_tid):
        if ss == 0:
            if ah == 0:
                _dec_dc_first(reader, block, huff[(0, dc_tid)], prev_dc, cid, al)
            else:
                _dec_dc_refine(reader, block, al)
        if se > 0:
            lut = huff[(1, ac_tid)]
            lo = max(ss, 1)
            if ah == 0:
                _dec_ac_first(reader, block, lut, lo, se, al, state)
            else:
                _dec_ac_refine(reader, block, lut, lo, se, al, state)

    if len(scomps) > 1:  # interleaved MCU order (baseline, or DC scans)
        mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_restart()
                for cid, dc_tid, ac_tid in scomps:
                    ci = ci_by_cid[cid]
                    _c, ch, cv, _q = comps[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            decode_block(
                                coefs[ci][my * cv + by, mx * ch + bx],
                                cid, dc_tid, ac_tid,
                            )
    else:  # non-interleaved: the component's own block grid
        cid, dc_tid, ac_tid = scomps[0]
        ci = ci_by_cid[cid]
        bh, bw = _component_block_dims(frame, ci)
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                decode_block(coefs[ci][by, bx], cid, dc_tid, ac_tid)

    return _entropy_end(payload, start)


def _reconstruct(frame, coefs, quant, precision=8):
    """Final coefficients → dequantize, IDCT, upsample, color-convert.

    12-bit frames (T.81 sample precision P=12) reconstruct in the
    full 12-bit domain — level shift 2^(P-1)=2048, clip to 4095 — and
    the output samples are down-shifted to 8 bits (s >> 4), the
    documented convention for the uint8 pipeline downstream."""
    h, w, comps = frame
    half = float(1 << (precision - 1))
    maxval = (1 << precision) - 1
    shift = precision - 8
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for ci, (cid, ch, cv, qid) in enumerate(comps):
        store = coefs[ci]
        if qid not in quant:
            raise ValueError(f"frame references undefined quant table {qid}")
        q = quant[qid]
        bh, bw = store.shape[:2]
        plane = np.zeros((bh * 8, bw * 8), np.float64)
        for by in range(bh):
            for bx in range(bw):
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _idct(store[by, bx].reshape(8, 8) * q) + half
                )
        if ch != hmax or cv != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1
            )
        full.append(plane[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0], 0, maxval)
        g = (g.astype(np.uint16) >> shift).astype(np.uint8)
        return np.dstack([g, g, g])
    y, cb, cr = full[0], full[1] - half, full[2] - half
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.dstack([r, g, b]), 0, maxval)
    return (rgb.astype(np.uint16) >> shift).astype(np.uint8)
