"""HPACK (RFC 7541) header compression for the HTTP/2 front end.

gRPC rides on HTTP/2, and HTTP/2 headers are HPACK-coded — so the
gRPC twin of ``frontend/grpc.go`` needs this layer.  No ``hpack``
wheel exists in the container; like :mod:`~marketstore_spark.websocket`
(RFC 6455) and :mod:`~marketstore_spark.msgpacklite`, this implements
the public spec directly:

* integer representation with N-bit prefix (§5.1) and string literals
  with optional Huffman coding (§5.2, Appendix B code table);
* the 61-entry static table (Appendix A) and a size-bounded dynamic
  table with entry overhead 32 (§4.1);
* all six binary patterns: indexed field, literal with incremental
  indexing, literal without indexing, literal never-indexed, and
  dynamic-table size update (§6).

The decoder is complete (a conforming peer may send any of the above,
Huffman-coded or not).  The encoder deliberately emits only
literal-without-indexing fields with indexed names where the static
table has them and raw (non-Huffman) values — a fully conformant,
stateless subset (§2.2 allows any encoding strategy), which keeps the
server's responses decodable by any client with zero dynamic-table
state to corrupt.

Correctness pins (tests/test_grpc.py): the RFC's Appendix C stories —
C.3 (request sequence, plain), C.4 (same, Huffman), C.5 (response
sequence with a 256-byte table forcing evictions), C.6 (same, Huffman)
— plus structural proofs that the Huffman table is a complete
prefix-free code (Kraft sum) before trusting it.
"""

from __future__ import annotations

__all__ = ["Encoder", "Decoder", "huffman_decode", "huffman_encode",
           "STATIC_TABLE"]

# ---------------------------------------------------------------------
# static table — RFC 7541 Appendix A (1-indexed)
# ---------------------------------------------------------------------

STATIC_TABLE: list[tuple[str, str]] = [
    (":authority", ""),
    (":method", "GET"),
    (":method", "POST"),
    (":path", "/"),
    (":path", "/index.html"),
    (":scheme", "http"),
    (":scheme", "https"),
    (":status", "200"),
    (":status", "204"),
    (":status", "206"),
    (":status", "304"),
    (":status", "400"),
    (":status", "404"),
    (":status", "500"),
    ("accept-charset", ""),
    ("accept-encoding", "gzip, deflate"),
    ("accept-language", ""),
    ("accept-ranges", ""),
    ("accept", ""),
    ("access-control-allow-origin", ""),
    ("age", ""),
    ("allow", ""),
    ("authorization", ""),
    ("cache-control", ""),
    ("content-disposition", ""),
    ("content-encoding", ""),
    ("content-language", ""),
    ("content-length", ""),
    ("content-location", ""),
    ("content-range", ""),
    ("content-type", ""),
    ("cookie", ""),
    ("date", ""),
    ("etag", ""),
    ("expect", ""),
    ("expires", ""),
    ("from", ""),
    ("host", ""),
    ("if-match", ""),
    ("if-modified-since", ""),
    ("if-none-match", ""),
    ("if-range", ""),
    ("if-unmodified-since", ""),
    ("last-modified", ""),
    ("link", ""),
    ("location", ""),
    ("max-forwards", ""),
    ("proxy-authenticate", ""),
    ("proxy-authorization", ""),
    ("range", ""),
    ("referer", ""),
    ("refresh", ""),
    ("retry-after", ""),
    ("server", ""),
    ("set-cookie", ""),
    ("strict-transport-security", ""),
    ("transfer-encoding", ""),
    ("user-agent", ""),
    ("vary", ""),
    ("via", ""),
    ("www-authenticate", ""),
]

_STATIC_NAME_INDEX = {}
for _i, (_n, _v) in enumerate(STATIC_TABLE, start=1):
    _STATIC_NAME_INDEX.setdefault(_n, _i)

# ---------------------------------------------------------------------
# Huffman code — RFC 7541 Appendix B: (code value, bit length) per
# symbol 0..255, then EOS (256).
# ---------------------------------------------------------------------

HUFFMAN_TABLE: list[tuple[int, int]] = [
    (0x1FF8, 13), (0x7FFFD8, 23), (0xFFFFFE2, 28), (0xFFFFFE3, 28),
    (0xFFFFFE4, 28), (0xFFFFFE5, 28), (0xFFFFFE6, 28), (0xFFFFFE7, 28),
    (0xFFFFFE8, 28), (0xFFFFEA, 24), (0x3FFFFFFC, 30), (0xFFFFFE9, 28),
    (0xFFFFFEA, 28), (0x3FFFFFFD, 30), (0xFFFFFEB, 28), (0xFFFFFEC, 28),
    (0xFFFFFED, 28), (0xFFFFFEE, 28), (0xFFFFFEF, 28), (0xFFFFFF0, 28),
    (0xFFFFFF1, 28), (0xFFFFFF2, 28), (0x3FFFFFFE, 30), (0xFFFFFF3, 28),
    (0xFFFFFF4, 28), (0xFFFFFF5, 28), (0xFFFFFF6, 28), (0xFFFFFF7, 28),
    (0xFFFFFF8, 28), (0xFFFFFF9, 28), (0xFFFFFFA, 28), (0xFFFFFFB, 28),
    (0x14, 6), (0x3F8, 10), (0x3F9, 10), (0xFFA, 12),
    (0x1FF9, 13), (0x15, 6), (0xF8, 8), (0x7FA, 11),
    (0x3FA, 10), (0x3FB, 10), (0xF9, 8), (0x7FB, 11),
    (0xFA, 8), (0x16, 6), (0x17, 6), (0x18, 6),
    (0x0, 5), (0x1, 5), (0x2, 5), (0x19, 6),
    (0x1A, 6), (0x1B, 6), (0x1C, 6), (0x1D, 6),
    (0x1E, 6), (0x1F, 6), (0x5C, 7), (0xFB, 8),
    (0x7FFC, 15), (0x20, 6), (0xFFB, 12), (0x3FC, 10),
    (0x1FFA, 13), (0x21, 6), (0x5D, 7), (0x5E, 7),
    (0x5F, 7), (0x60, 7), (0x61, 7), (0x62, 7),
    (0x63, 7), (0x64, 7), (0x65, 7), (0x66, 7),
    (0x67, 7), (0x68, 7), (0x69, 7), (0x6A, 7),
    (0x6B, 7), (0x6C, 7), (0x6D, 7), (0x6E, 7),
    (0x6F, 7), (0x70, 7), (0x71, 7), (0x72, 7),
    (0xFC, 8), (0x73, 7), (0xFD, 8), (0x1FFB, 13),
    (0x7FFF0, 19), (0x1FFC, 13), (0x3FFC, 14), (0x22, 6),
    (0x7FFD, 15), (0x3, 5), (0x23, 6), (0x4, 5),
    (0x24, 6), (0x5, 5), (0x25, 6), (0x26, 6),
    (0x27, 6), (0x6, 5), (0x74, 7), (0x75, 7),
    (0x28, 6), (0x29, 6), (0x2A, 6), (0x7, 5),
    (0x2B, 6), (0x76, 7), (0x2C, 6), (0x8, 5),
    (0x9, 5), (0x2D, 6), (0x77, 7), (0x78, 7),
    (0x79, 7), (0x7A, 7), (0x7B, 7), (0x7FFE, 15),
    (0x7FC, 11), (0x3FFD, 14), (0x1FFD, 13), (0xFFFFFFC, 28),
    (0xFFFE6, 20), (0x3FFFD2, 22), (0xFFFE7, 20), (0xFFFE8, 20),
    (0x3FFFD3, 22), (0x3FFFD4, 22), (0x3FFFD5, 22), (0x7FFFD9, 23),
    (0x3FFFD6, 22), (0x7FFFDA, 23), (0x7FFFDB, 23), (0x7FFFDC, 23),
    (0x7FFFDD, 23), (0x7FFFDE, 23), (0xFFFFEB, 24), (0x7FFFDF, 23),
    (0xFFFFEC, 24), (0xFFFFED, 24), (0x3FFFD7, 22), (0x7FFFE0, 23),
    (0xFFFFEE, 24), (0x7FFFE1, 23), (0x7FFFE2, 23), (0x7FFFE3, 23),
    (0x7FFFE4, 23), (0x1FFFDC, 21), (0x3FFFD8, 22), (0x7FFFE5, 23),
    (0x3FFFD9, 22), (0x7FFFE6, 23), (0x7FFFE7, 23), (0xFFFFEF, 24),
    (0x3FFFDA, 22), (0x1FFFDD, 21), (0xFFFE9, 20), (0x3FFFDB, 22),
    (0x3FFFDC, 22), (0x7FFFE8, 23), (0x7FFFE9, 23), (0x1FFFDE, 21),
    (0x7FFFEA, 23), (0x3FFFDD, 22), (0x3FFFDE, 22), (0xFFFFF0, 24),
    (0x1FFFDF, 21), (0x3FFFDF, 22), (0x7FFFEB, 23), (0x7FFFEC, 23),
    (0x1FFFE0, 21), (0x1FFFE1, 21), (0x3FFFE0, 22), (0x1FFFE2, 21),
    (0x7FFFED, 23), (0x3FFFE1, 22), (0x7FFFEE, 23), (0x7FFFEF, 23),
    (0xFFFEA, 20), (0x3FFFE2, 22), (0x3FFFE3, 22), (0x3FFFE4, 22),
    (0x7FFFF0, 23), (0x3FFFE5, 22), (0x3FFFE6, 22), (0x7FFFF1, 23),
    (0x3FFFFE0, 26), (0x3FFFFE1, 26), (0xFFFEB, 20), (0x7FFF1, 19),
    (0x3FFFE7, 22), (0x7FFFF2, 23), (0x3FFFE8, 22), (0x1FFFFEC, 25),
    (0x3FFFFE2, 26), (0x3FFFFE3, 26), (0x3FFFFE4, 26), (0x7FFFFDE, 27),
    (0x7FFFFDF, 27), (0x3FFFFE5, 26), (0xFFFFF1, 24), (0x1FFFFED, 25),
    (0x7FFF2, 19), (0x1FFFE3, 21), (0x3FFFFE6, 26), (0x7FFFFE0, 27),
    (0x7FFFFE1, 27), (0x3FFFFE7, 26), (0x7FFFFE2, 27), (0xFFFFF2, 24),
    (0x1FFFE4, 21), (0x1FFFE5, 21), (0x3FFFFE8, 26), (0x3FFFFE9, 26),
    (0xFFFFFFD, 28), (0x7FFFFE3, 27), (0x7FFFFE4, 27), (0x7FFFFE5, 27),
    (0xFFFEC, 20), (0xFFFFF3, 24), (0xFFFED, 20), (0x1FFFE6, 21),
    (0x3FFFE9, 22), (0x1FFFE7, 21), (0x1FFFE8, 21), (0x7FFFF3, 23),
    (0x3FFFEA, 22), (0x3FFFEB, 22), (0x1FFFFEE, 25), (0x1FFFFEF, 25),
    (0xFFFFF4, 24), (0xFFFFF5, 24), (0x3FFFFEA, 26), (0x7FFFF4, 23),
    (0x3FFFFEB, 26), (0x7FFFFE6, 27), (0x3FFFFEC, 26), (0x3FFFFED, 26),
    (0x7FFFFE7, 27), (0x7FFFFE8, 27), (0x7FFFFE9, 27), (0x7FFFFEA, 27),
    (0x7FFFFEB, 27), (0xFFFFFFE, 28), (0x7FFFFEC, 27), (0x7FFFFED, 27),
    (0x7FFFFEE, 27), (0x7FFFFEF, 27), (0x7FFFFF0, 27), (0x3FFFFEE, 26),
    (0x3FFFFFFF, 30),
]

_EOS = 256

#: (nbits, code) → symbol, for the bounded-window decoder
_HUFF_DECODE = {}
for _sym, (_code, _nbits) in enumerate(HUFFMAN_TABLE):
    key = (_nbits, _code)
    if key in _HUFF_DECODE:  # pragma: no cover — table defect guard
        raise AssertionError(f"duplicate huffman code {key}")
    _HUFF_DECODE[key] = _sym

_MIN_CODE_LEN = min(n for _, n in HUFFMAN_TABLE)
_MAX_CODE_LEN = max(n for _, n in HUFFMAN_TABLE)


def huffman_decode(data: bytes) -> bytes:
    """Appendix B decode.  Per §5.2, the end-of-string padding must be
    the most-significant bits of EOS (all ones) and strictly shorter
    than 8 bits; anything else is a coding error."""
    out = bytearray()
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= _MIN_CODE_LEN:
            matched = False
            for ln in range(_MIN_CODE_LEN, min(nbits, _MAX_CODE_LEN) + 1):
                sym = _HUFF_DECODE.get(
                    (ln, (acc >> (nbits - ln)) & ((1 << ln) - 1))
                )
                if sym is not None:
                    if sym == _EOS:
                        raise ValueError("hpack: EOS symbol in huffman string")
                    out.append(sym)
                    nbits -= ln
                    acc &= (1 << nbits) - 1
                    matched = True
                    break
            if not matched:
                if nbits >= _MAX_CODE_LEN:
                    raise ValueError("hpack: invalid huffman sequence")
                break  # need more input bits
    if nbits >= 8:
        raise ValueError("hpack: huffman padding longer than 7 bits")
    if nbits and acc != (1 << nbits) - 1:
        raise ValueError("hpack: huffman padding is not EOS prefix")
    return bytes(out)


def huffman_encode(data: bytes) -> bytes:
    acc = 0
    nbits = 0
    out = bytearray()
    for byte in data:
        code, ln = HUFFMAN_TABLE[byte]
        acc = (acc << ln) | code
        nbits += ln
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append(((acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)) & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------
# primitive representations (§5)
# ---------------------------------------------------------------------


def encode_int(value: int, prefix_bits: int, flags: int = 0) -> bytes:
    """§5.1 integer with an N-bit prefix; ``flags`` fills the
    non-prefix bits of the first byte."""
    limit = (1 << prefix_bits) - 1
    if value < limit:
        return bytes([flags | value])
    out = bytearray([flags | limit])
    value -= limit
    while value >= 128:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)
    return bytes(out)


def decode_int(data: bytes, pos: int, prefix_bits: int) -> tuple[int, int]:
    limit = (1 << prefix_bits) - 1
    if pos >= len(data):
        raise ValueError("hpack: truncated integer")
    value = data[pos] & limit
    pos += 1
    if value < limit:
        return value, pos
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("hpack: truncated integer continuation")
        b = data[pos]
        pos += 1
        value += (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return value, pos
        if shift > 63:
            raise ValueError("hpack: integer overflow")


def _encode_str(raw: bytes, huffman: bool = False) -> bytes:
    if huffman:
        enc = huffman_encode(raw)
        return encode_int(len(enc), 7, 0x80) + enc
    return encode_int(len(raw), 7, 0x00) + raw


def _decode_str(data: bytes, pos: int) -> tuple[bytes, int]:
    if pos >= len(data):
        raise ValueError("hpack: truncated string")
    huff = bool(data[pos] & 0x80)
    ln, pos = decode_int(data, pos, 7)
    raw = data[pos : pos + ln]
    if len(raw) != ln:
        raise ValueError("hpack: truncated string literal")
    pos += ln
    return (huffman_decode(raw) if huff else bytes(raw)), pos


# ---------------------------------------------------------------------
# decoder with dynamic table (§2.3, §4)
# ---------------------------------------------------------------------

_ENTRY_OVERHEAD = 32  # §4.1


class Decoder:
    """Stateful HPACK decoder — one per HTTP/2 connection direction."""

    def __init__(self, max_table_size: int = 4096):
        self.max_size = max_table_size  # protocol ceiling (SETTINGS)
        self.table_size_limit = max_table_size  # current, ≤ max
        self.dynamic: list[tuple[bytes, bytes]] = []  # newest first
        self.size = 0

    # -- table ops ----------------------------------------------------
    def _evict(self) -> None:
        while self.size > self.table_size_limit and self.dynamic:
            name, value = self.dynamic.pop()
            self.size -= len(name) + len(value) + _ENTRY_OVERHEAD

    def _insert(self, name: bytes, value: bytes) -> None:
        self.dynamic.insert(0, (name, value))
        self.size += len(name) + len(value) + _ENTRY_OVERHEAD
        self._evict()

    def _lookup(self, index: int) -> tuple[bytes, bytes]:
        if index <= 0:
            raise ValueError("hpack: index 0 is invalid")
        if index <= len(STATIC_TABLE):
            n, v = STATIC_TABLE[index - 1]
            return n.encode(), v.encode()
        dyn = index - len(STATIC_TABLE) - 1
        if dyn >= len(self.dynamic):
            raise ValueError(f"hpack: index {index} beyond table")
        return self.dynamic[dyn]

    # -- header block -------------------------------------------------
    def decode(self, block: bytes) -> list[tuple[str, str]]:
        headers: list[tuple[bytes, bytes]] = []
        pos = 0
        while pos < len(block):
            b = block[pos]
            if b & 0x80:  # §6.1 indexed
                idx, pos = decode_int(block, pos, 7)
                headers.append(self._lookup(idx))
            elif b & 0x40:  # §6.2.1 literal, incremental indexing
                idx, pos = decode_int(block, pos, 6)
                name = self._lookup(idx)[0] if idx else None
                if name is None:
                    name, pos = _decode_str(block, pos)
                value, pos = _decode_str(block, pos)
                self._insert(name, value)
                headers.append((name, value))
            elif b & 0x20:  # §6.3 dynamic table size update
                new, pos = decode_int(block, pos, 5)
                if new > self.max_size:
                    raise ValueError("hpack: table size update above maximum")
                self.table_size_limit = new
                self._evict()
            else:  # §6.2.2 / §6.2.3 literal, not indexed (0x10 = never)
                idx, pos = decode_int(block, pos, 4)
                name = self._lookup(idx)[0] if idx else None
                if name is None:
                    name, pos = _decode_str(block, pos)
                value, pos = _decode_str(block, pos)
                headers.append((name, value))
        return [(n.decode("latin-1"), v.decode("latin-1")) for n, v in headers]


class Encoder:
    """Stateless conformant encoder: literal-without-indexing fields,
    static-table indexed names where available, raw string values
    (``huffman=True`` opts values into Huffman coding)."""

    def __init__(self, huffman: bool = False):
        self.huffman = huffman

    def encode(self, headers: list[tuple[str, str]]) -> bytes:
        out = bytearray()
        for name, value in headers:
            lname = name.lower()
            raw_value = value.encode("latin-1")
            idx = None
            # exact (name, value) static match → one-byte indexed field
            for i, (sn, sv) in enumerate(STATIC_TABLE, start=1):
                if sn == lname and sv == value:
                    idx = i
                    break
            if idx is not None:
                out += encode_int(idx, 7, 0x80)
                continue
            name_idx = _STATIC_NAME_INDEX.get(lname)
            if name_idx:
                out += encode_int(name_idx, 4, 0x00)
            else:
                out += b"\x00" + _encode_str(lname.encode("latin-1"))
            out += _encode_str(raw_value, self.huffman)
        return bytes(out)
