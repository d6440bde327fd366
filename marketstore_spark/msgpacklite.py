"""Pure-stdlib MessagePack codec — the wire format of the reference's
RPC frontend (frontend/server.go:74 registers the msgpack codec for
``application/x-msgpack``; utils/rpc/msgpack2 is gorilla JSON-RPC-2.0
envelopes ENCODED as msgpack).  The container has no msgpack package,
and the format spec (msgpack.org, public) is small, so the codec is
implemented here directly: ~100 lines each way over ``struct``.

Scope — exactly the object model JSON-RPC needs, which is also all the
reference envelope uses: nil/bool/int/float64/str/bin/array/map.  On
decode every spec family is accepted (both int widths, float32, all
str/bin/array/map length forms, and ext — surfaced as :class:`Ext` so
unknown extensions round-trip instead of failing).  On encode ints pick
the smallest form, strs are UTF-8, ``bytes`` go to bin — the same
choices msgpack-python makes, so frames interoperate with any
spec-compliant peer.

Not a copy: written from the format table in the public spec; the
reference's Go codec is a vendored third-party library we only needed
the CONTENT-TYPE and envelope shapes from.
"""

from __future__ import annotations

import struct
from typing import Any, Callable, NamedTuple

__all__ = ["Ext", "packb", "unpackb"]


class Ext(NamedTuple):
    """Decoded msgpack extension value (type code, raw payload)."""

    code: int
    data: bytes


# ---------------------------------------------------------------------
# Encoding
# ---------------------------------------------------------------------


def packb(obj: Any, default: Callable[[Any], Any] | None = None) -> bytes:
    """Serialize ``obj`` to msgpack bytes.  ``default`` converts
    unsupported types (mirrors ``json.dumps(default=...)`` — the
    server passes ``str`` so numpy scalars / Decimals degrade the same
    way on both codecs)."""
    out = bytearray()
    _pack(obj, out, default)
    return bytes(out)


def _pack(obj: Any, out: bytearray, default) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        _pack_int(obj, out)
    elif isinstance(obj, float):
        out.append(0xCB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        n = len(b)
        if n < 32:
            out.append(0xA0 | n)
        elif n < 0x100:
            out += struct.pack(">BB", 0xD9, n)
        elif n < 0x10000:
            out += struct.pack(">BH", 0xDA, n)
        else:
            out += struct.pack(">BI", 0xDB, n)
        out += b
    elif isinstance(obj, (bytes, bytearray, memoryview)):
        b = bytes(obj)
        n = len(b)
        if n < 0x100:
            out += struct.pack(">BB", 0xC4, n)
        elif n < 0x10000:
            out += struct.pack(">BH", 0xC5, n)
        else:
            out += struct.pack(">BI", 0xC6, n)
        out += b
    elif isinstance(obj, Ext):  # before list/tuple — Ext IS a tuple
        _pack_ext(obj, out)
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n < 16:
            out.append(0x90 | n)
        elif n < 0x10000:
            out += struct.pack(">BH", 0xDC, n)
        else:
            out += struct.pack(">BI", 0xDD, n)
        for v in obj:
            _pack(v, out, default)
    elif isinstance(obj, dict):
        n = len(obj)
        if n < 16:
            out.append(0x80 | n)
        elif n < 0x10000:
            out += struct.pack(">BH", 0xDE, n)
        else:
            out += struct.pack(">BI", 0xDF, n)
        for k, v in obj.items():
            _pack(k, out, default)
            _pack(v, out, default)
    elif default is not None:
        _pack(default(obj), out, None)
    else:
        raise TypeError(f"msgpack: cannot serialize {type(obj).__name__}")


def _pack_int(v: int, out: bytearray) -> None:
    if 0 <= v < 0x80:
        out.append(v)
    elif -32 <= v < 0:
        out.append(v & 0xFF)
    elif 0 <= v < 0x100:
        out += struct.pack(">BB", 0xCC, v)
    elif 0 <= v < 0x10000:
        out += struct.pack(">BH", 0xCD, v)
    elif 0 <= v < 0x100000000:
        out += struct.pack(">BI", 0xCE, v)
    elif 0 <= v < 0x10000000000000000:
        out += struct.pack(">BQ", 0xCF, v)
    elif -0x80 <= v < 0:
        out += struct.pack(">Bb", 0xD0, v)
    elif -0x8000 <= v < 0:
        out += struct.pack(">Bh", 0xD1, v)
    elif -0x80000000 <= v < 0:
        out += struct.pack(">Bi", 0xD2, v)
    elif -0x8000000000000000 <= v < 0:
        out += struct.pack(">Bq", 0xD3, v)
    else:
        raise OverflowError(f"msgpack: int out of 64-bit range: {v}")


_EXT_FIX = {1: 0xD4, 2: 0xD5, 4: 0xD6, 8: 0xD7, 16: 0xD8}


def _pack_ext(e: Ext, out: bytearray) -> None:
    n = len(e.data)
    if n in _EXT_FIX:
        out.append(_EXT_FIX[n])
    elif n < 0x100:
        out += struct.pack(">BB", 0xC7, n)
    elif n < 0x10000:
        out += struct.pack(">BH", 0xC8, n)
    else:
        out += struct.pack(">BI", 0xC9, n)
    out += struct.pack(">b", e.code)
    out += e.data


# ---------------------------------------------------------------------
# Decoding
# ---------------------------------------------------------------------


#: Container-nesting bound for ``unpackb``: a ~1 KB body of repeated
#: fixarray bytes (0x91…) would otherwise recurse past Python's stack
#: and escape the servers' ``except (ValueError, TypeError)`` with a
#: RecursionError — a cheap remote annoyance on a network-facing
#: parser.  128 is far above any real RPC payload.
MAX_DEPTH = 128


def unpackb(data: bytes) -> Any:
    """Deserialize one msgpack object; raises ``ValueError`` on a
    truncated or malformed frame, trailing bytes, or nesting deeper
    than ``MAX_DEPTH``."""
    obj, pos = _unpack(memoryview(data), 0)
    if pos != len(data):
        raise ValueError(f"msgpack: {len(data) - pos} trailing bytes")
    return obj


def _need(data, pos: int, n: int) -> None:
    if pos + n > len(data):
        raise ValueError("msgpack: truncated input")


def _unpack(data, pos: int, depth: int = 0):
    if depth > MAX_DEPTH:
        raise ValueError("msgpack: nesting exceeds MAX_DEPTH")
    _need(data, pos, 1)
    b = data[pos]
    pos += 1
    if b < 0x80:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 0x100, pos
    if 0x80 <= b < 0x90:  # fixmap
        return _unpack_map(data, pos, b & 0x0F, depth)
    if 0x90 <= b < 0xA0:  # fixarray
        return _unpack_array(data, pos, b & 0x0F, depth)
    if 0xA0 <= b < 0xC0:  # fixstr
        return _unpack_str(data, pos, b & 0x1F)
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xC4, 0xC5, 0xC6):  # bin 8/16/32
        n, pos = _unpack_len(data, pos, b - 0xC4)
        _need(data, pos, n)
        return bytes(data[pos : pos + n]), pos + n
    if b in (0xC7, 0xC8, 0xC9):  # ext 8/16/32
        n, pos = _unpack_len(data, pos, b - 0xC7)
        return _unpack_ext(data, pos, n)
    if b == 0xCA:
        _need(data, pos, 4)
        return struct.unpack_from(">f", data, pos)[0], pos + 4
    if b == 0xCB:
        _need(data, pos, 8)
        return struct.unpack_from(">d", data, pos)[0], pos + 8
    if 0xCC <= b <= 0xCF:  # uint 8/16/32/64
        fmt = "BHIQ"[b - 0xCC]
        n = (1, 2, 4, 8)[b - 0xCC]
        _need(data, pos, n)
        return struct.unpack_from(">" + fmt, data, pos)[0], pos + n
    if 0xD0 <= b <= 0xD3:  # int 8/16/32/64
        fmt = "bhiq"[b - 0xD0]
        n = (1, 2, 4, 8)[b - 0xD0]
        _need(data, pos, n)
        return struct.unpack_from(">" + fmt, data, pos)[0], pos + n
    if 0xD4 <= b <= 0xD8:  # fixext 1/2/4/8/16
        return _unpack_ext(data, pos, 1 << (b - 0xD4))
    if b == 0xD9:
        n, pos = _unpack_len(data, pos, 0)
        return _unpack_str(data, pos, n)
    if b == 0xDA:
        n, pos = _unpack_len(data, pos, 1)
        return _unpack_str(data, pos, n)
    if b == 0xDB:
        n, pos = _unpack_len(data, pos, 2)
        return _unpack_str(data, pos, n)
    if b == 0xDC:
        n, pos = _unpack_len(data, pos, 1)
        return _unpack_array(data, pos, n, depth)
    if b == 0xDD:
        n, pos = _unpack_len(data, pos, 2)
        return _unpack_array(data, pos, n, depth)
    if b == 0xDE:
        n, pos = _unpack_len(data, pos, 1)
        return _unpack_map(data, pos, n, depth)
    if b == 0xDF:
        n, pos = _unpack_len(data, pos, 2)
        return _unpack_map(data, pos, n, depth)
    raise ValueError(f"msgpack: reserved type byte 0x{b:02x}")


def _unpack_len(data, pos: int, width_idx: int):
    n = (1, 2, 4)[width_idx]
    _need(data, pos, n)
    return int.from_bytes(data[pos : pos + n], "big"), pos + n


def _unpack_str(data, pos: int, n: int):
    _need(data, pos, n)
    return bytes(data[pos : pos + n]).decode("utf-8"), pos + n


def _unpack_array(data, pos: int, n: int, depth: int = 0):
    out = []
    for _ in range(n):
        v, pos = _unpack(data, pos, depth + 1)
        out.append(v)
    return out, pos


def _unpack_map(data, pos: int, n: int, depth: int = 0):
    out = {}
    for _ in range(n):
        k, pos = _unpack(data, pos, depth + 1)
        if isinstance(k, (dict, list)):
            raise ValueError("msgpack: unhashable map key")
        v, pos = _unpack(data, pos, depth + 1)
        out[k] = v
    return out, pos


def _unpack_ext(data, pos: int, n: int):
    _need(data, pos, 1 + n)
    code = struct.unpack_from(">b", data, pos)[0]
    return Ext(code, bytes(data[pos + 1 : pos + 1 + n])), pos + 1 + n
