"""Protobuf wire-format codec for the marketstore gRPC surface.

The reference serves a gRPC ``Marketstore`` service defined in
``proto/marketstore.proto`` (Query / Create / Write / Destroy /
ListSymbols / ServerVersion over NumpyDataset-shaped payloads).  The
container has no ``grpcio``/``protobuf`` wheels, so — in the same
spirit as :mod:`~marketstore_spark.msgpacklite` and
:mod:`~marketstore_spark.websocket` — this module implements the
protobuf *wire format* (the public "Protocol Buffers Encoding" spec)
directly, specialized to the fixed message set of that .proto file.

Scope: proto3 semantics for the field kinds that file actually uses —
varint scalars (int32, int64, bool, enum), length-delimited scalars
(string, bytes), embedded messages, repeated fields, and
``map<string, int32>`` (wire-encoded as a repeated two-field entry
message).  Unknown fields are skipped (forward compatibility), default
values are omitted on encode and filled on decode, exactly as proto3
prescribes.

Messages are plain dicts; a decoded message always contains every
declared field so handler code never guards key presence.
"""

from __future__ import annotations

__all__ = ["encode", "decode", "MESSAGES"]

_U64 = (1 << 64) - 1
_WT_VARINT = 0
_WT_I64 = 1
_WT_LEN = 2
_WT_I32 = 5


# ---------------------------------------------------------------------
# varints
# ---------------------------------------------------------------------


def _encode_varint(n: int) -> bytes:
    """Unsigned LEB128.  Negative int32/int64 values are encoded as
    their 64-bit two's complement (always 10 bytes), per the spec."""
    if n < 0:
        n &= _U64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    n = 0
    while True:
        if pos >= len(buf):
            raise ValueError("protowire: truncated varint")
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            if n > _U64:
                raise ValueError("protowire: varint exceeds 64 bits")
            return n, pos
        shift += 7
        if shift >= 70:
            raise ValueError("protowire: varint too long")


def _to_signed(n: int, bits: int) -> int:
    """Negative values travel as 64-bit two's complement varints; an
    int32 keeps only its low 32 bits before sign extension."""
    n &= _U64
    if bits == 32:
        n &= 0xFFFFFFFF
    if n >= 1 << (bits - 1):
        n -= 1 << bits
    return n


# ---------------------------------------------------------------------
# message descriptors (proto/marketstore.proto)
# ---------------------------------------------------------------------

#: field kinds: "string" "bytes" "bool" "int32" "int64" "enum"
#: prefix "repeated " for repeated fields, "msg:<Name>" for embedded
#: messages, "map_str_i32" for map<string, int32>.
MESSAGES: dict[str, dict[int, tuple[str, str]]] = {
    # proto/marketstore.proto:32
    "DataShape": {1: ("name", "string"), 2: ("type", "string")},
    # proto/marketstore.proto:47
    "NumpyDataset": {
        1: ("column_types", "repeated string"),
        2: ("column_names", "repeated string"),
        3: ("column_data", "repeated bytes"),
        4: ("length", "int32"),
        5: ("data_shapes", "repeated msg:DataShape"),
    },
    # proto/marketstore.proto:41
    "NumpyMultiDataset": {
        1: ("data", "msg:NumpyDataset"),
        2: ("start_index", "map_str_i32"),
        3: ("lengths", "map_str_i32"),
    },
    # proto/marketstore.proto:60
    "CreateRequest": {
        1: ("key", "string"),
        2: ("data_shapes", "repeated msg:DataShape"),
        3: ("row_type", "string"),
    },
    "MultiCreateRequest": {1: ("requests", "repeated msg:CreateRequest")},
    # proto/marketstore.proto:77
    "QueryRequest": {
        1: ("is_sql_statement", "bool"),
        2: ("sql_statement", "string"),
        3: ("destination", "string"),
        4: ("key_category", "string"),
        5: ("epoch_start", "int64"),
        6: ("epoch_start_nanos", "int64"),
        7: ("epoch_end", "int64"),
        8: ("epoch_end_nanos", "int64"),
        9: ("limit_record_count", "int32"),
        10: ("limit_from_start", "bool"),
        11: ("columns", "repeated string"),
        12: ("functions", "repeated string"),
    },
    "MultiQueryRequest": {1: ("requests", "repeated msg:QueryRequest")},
    "QueryResponse": {1: ("result", "msg:NumpyMultiDataset")},
    "MultiQueryResponse": {
        1: ("responses", "repeated msg:QueryResponse"),
        2: ("version", "string"),
        3: ("timezone", "string"),
    },
    "WriteRequest": {
        1: ("data", "msg:NumpyMultiDataset"),
        2: ("is_variable_length", "bool"),
    },
    "MultiWriteRequest": {1: ("requests", "repeated msg:WriteRequest")},
    "ServerResponse": {1: ("error", "string"), 2: ("version", "string")},
    "MultiServerResponse": {1: ("responses", "repeated msg:ServerResponse")},
    "KeyRequest": {1: ("key", "string")},
    "MultiKeyRequest": {1: ("requests", "repeated msg:KeyRequest")},
    # Format enum: 0 = SYMBOL, 1 = TIME_BUCKET_KEY
    "ListSymbolsRequest": {1: ("format", "enum")},
    "ListSymbolsResponse": {1: ("results", "repeated string")},
    "ServerVersionRequest": {},
    "ServerVersionResponse": {1: ("version", "string")},
    # -- replication service (proto/replication.proto:120) --------------
    # GetWALStreamRequest is EMPTY in the reference (replicas bootstrap
    # by snapshot copy, the offline gap is unaddressed, and replay
    # ordering is a known TODO — replication/replay.go:39 "replay
    # ordered by transactionGroupID");
    # field 1 here is a forward-compatible extension carrying the
    # replica's durable resume cursors, which is what makes the twin's
    # replay exactly-once across disconnects.  A reference server
    # would skip the unknown field; a reference client sends none and
    # gets the full log.
    "BucketCursor": {1: ("key", "string"), 2: ("next_version", "int64")},
    "GetWALStreamRequest": {1: ("cursors", "repeated msg:BucketCursor")},
    "GetWALStreamResponse": {1: ("transaction_group", "bytes")},
    # the transaction-group payload (opaque bytes on the wire, like the
    # reference's serialized WAL TG): one manifest commit + the data
    # files it added
    "WALDataFile": {1: ("rel_path", "string"), 2: ("payload", "bytes")},
    "TransactionGroup": {
        1: ("key", "string"),
        2: ("version", "int64"),
        3: ("manifest_json", "string"),
        4: ("files", "repeated msg:WALDataFile"),
    },
}

_MAP_ENTRY = {1: ("key", "string"), 2: ("value", "int32")}


def _default(kind: str):
    if kind.startswith("repeated "):
        return []
    if kind == "map_str_i32":
        return {}
    if kind == "string":
        return ""
    if kind == "bytes":
        return b""
    if kind == "bool":
        return False
    if kind.startswith("msg:"):
        return None
    return 0  # int32 / int64 / enum


# ---------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------


def _tag(field_no: int, wire_type: int) -> bytes:
    return _encode_varint((field_no << 3) | wire_type)


def _encode_scalar(field_no: int, kind: str, value) -> bytes:
    if kind in ("int32", "int64", "enum"):
        if not value:
            return b""
        return _tag(field_no, _WT_VARINT) + _encode_varint(int(value))
    if kind == "bool":
        if not value:
            return b""
        return _tag(field_no, _WT_VARINT) + b"\x01"
    if kind == "string":
        if not value:
            return b""
        raw = value.encode("utf-8") if isinstance(value, str) else bytes(value)
        return _tag(field_no, _WT_LEN) + _encode_varint(len(raw)) + raw
    if kind == "bytes":
        if not value:
            return b""
        raw = bytes(value)
        return _tag(field_no, _WT_LEN) + _encode_varint(len(raw)) + raw
    raise ValueError(f"protowire: unsupported scalar kind {kind!r}")


def encode(msg_name: str, obj: dict | None) -> bytes:
    """Encode ``obj`` as the named message.  Missing keys encode as
    proto3 defaults (i.e. nothing on the wire)."""
    fields = MESSAGES[msg_name]
    obj = obj or {}
    out = bytearray()
    for field_no in sorted(fields):
        name, kind = fields[field_no]
        value = obj.get(name)
        if value is None:
            continue
        if kind.startswith("repeated msg:"):
            sub = kind[len("repeated msg:"):]
            for item in value:
                body = encode(sub, item)
                out += _tag(field_no, _WT_LEN) + _encode_varint(len(body)) + body
        elif kind.startswith("repeated "):
            scalar = kind[len("repeated "):]
            for item in value:
                enc = _encode_scalar(field_no, scalar, item)
                if not enc:  # default-valued items must still appear
                    if scalar in ("string", "bytes"):
                        enc = _tag(field_no, _WT_LEN) + b"\x00"
                    else:
                        enc = _tag(field_no, _WT_VARINT) + b"\x00"
                out += enc
        elif kind == "map_str_i32":
            for k in value:
                body = bytearray()
                body += _encode_scalar(1, "string", k)
                body += _encode_scalar(2, "int32", value[k])
                out += _tag(field_no, _WT_LEN) + _encode_varint(len(body))
                out += body
        elif kind.startswith("msg:"):
            body = encode(kind[4:], value)
            out += _tag(field_no, _WT_LEN) + _encode_varint(len(body)) + body
        else:
            out += _encode_scalar(field_no, kind, value)
    return bytes(out)


# ---------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------


def _skip(buf: bytes, pos: int, wire_type: int) -> int:
    """Skip an unknown field (forward compatibility).  Bounds every
    advance against the buffer end so a truncated or corrupt message
    raises like the known-field paths do instead of silently
    terminating the decode loop."""
    if wire_type == _WT_VARINT:
        _, pos = _decode_varint(buf, pos)
        return pos
    if wire_type == _WT_I64:
        pos += 8
    elif wire_type == _WT_LEN:
        ln, pos = _decode_varint(buf, pos)
        pos += ln
    elif wire_type == _WT_I32:
        pos += 4
    else:
        raise ValueError(f"protowire: unsupported wire type {wire_type}")
    if pos > len(buf):
        raise ValueError("protowire: truncated unknown field")
    return pos


def _decode_scalar(kind: str, wire_type: int, buf: bytes, pos: int):
    if kind in ("int32", "int64", "enum", "bool"):
        if wire_type != _WT_VARINT:
            raise ValueError(f"protowire: {kind} field with wire type {wire_type}")
        n, pos = _decode_varint(buf, pos)
        if kind == "bool":
            return bool(n), pos
        if kind == "int32":
            return _to_signed(n, 32), pos
        if kind == "enum":
            return _to_signed(n, 32), pos
        return _to_signed(n, 64), pos
    if kind in ("string", "bytes"):
        if wire_type != _WT_LEN:
            raise ValueError(f"protowire: {kind} field with wire type {wire_type}")
        ln, pos = _decode_varint(buf, pos)
        if pos + ln > len(buf):
            raise ValueError("protowire: truncated length-delimited field")
        raw = buf[pos : pos + ln]
        pos += ln
        return (raw.decode("utf-8") if kind == "string" else bytes(raw)), pos
    raise ValueError(f"protowire: unsupported scalar kind {kind!r}")


def _decode_into(fields, buf: bytes) -> dict:
    out = {name: _default(kind) for name, kind in fields.values()}
    pos = 0
    while pos < len(buf):
        tag, pos = _decode_varint(buf, pos)
        field_no, wire_type = tag >> 3, tag & 0x7
        if field_no not in fields:
            pos = _skip(buf, pos, wire_type)
            continue
        name, kind = fields[field_no]
        if kind.startswith("repeated msg:") or kind.startswith("msg:"):
            sub = kind.split("msg:", 1)[1]
            if wire_type != _WT_LEN:
                raise ValueError("protowire: message field with bad wire type")
            ln, pos = _decode_varint(buf, pos)
            inner = buf[pos : pos + ln]
            if len(inner) != ln:
                raise ValueError("protowire: truncated embedded message")
            pos += ln
            msg = decode(sub, inner)
            if kind.startswith("repeated "):
                out[name].append(msg)
            else:
                out[name] = msg
        elif kind == "map_str_i32":
            if wire_type != _WT_LEN:
                raise ValueError("protowire: map field with bad wire type")
            ln, pos = _decode_varint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError("protowire: truncated map entry")
            entry = _decode_into(_MAP_ENTRY, buf[pos : pos + ln])
            pos += ln
            out[name][entry["key"]] = entry["value"]
        elif kind.startswith("repeated "):
            scalar = kind[len("repeated "):]
            value, pos = _decode_scalar(scalar, wire_type, buf, pos)
            out[name].append(value)
        else:
            out[name], pos = _decode_scalar(kind, wire_type, buf, pos)
    return out


def decode(msg_name: str, data: bytes) -> dict:
    """Decode the named message; every declared field is present in the
    result (proto3 defaults for absent fields)."""
    return _decode_into(MESSAGES[msg_name], data)
