"""gRPC front end — the ``Marketstore`` DataService twin of
``frontend/grpc.go``.

The reference exposes the same backend over three wires: msgpack-RPC,
JSON-RPC (both in :mod:`~marketstore_spark.server`) and a gRPC service
(``proto/marketstore.proto:163``).  This module closes the third:
gRPC's unary protocol over cleartext HTTP/2, speaking the exact proto
wire format — message framing per the public "gRPC over HTTP/2"
protocol spec (5-byte ``[compressed-flag][length]`` prefixes, POST to
``/proto.Marketstore/<Method>``, ``application/grpc`` content type,
``grpc-status`` trailers), protobuf payloads via
:mod:`~marketstore_spark.protowire`, HTTP/2 + HPACK via
:mod:`~marketstore_spark.http2lite` / :mod:`~marketstore_spark.hpacklite`.

All six RPCs dispatch into the SAME :class:`~marketstore_spark.server.
DataService` instance the JSON/msgpack wire uses — one backend, three
codecs, mirroring how grpc.go and the JSON frontend share the executor:

* ``Query``   — MultiQueryRequest → MultiQueryResponse with
  NumpyMultiDataset payloads (column buffers + per-TBK start/length
  maps, grpc.go:175 ToProtoNumpyMultiDataSet); SQL statements ride the
  same RPC behind ``is_sql_statement`` with the result keyed by the
  statement (grpc.go:65).
* ``Write``   — NumpyMultiDataset buffers → per-TBK bucket appends.
  Reference column conventions are honored on ingest: an ``Epoch``
  (i8 seconds) column, plus optional ``Nanoseconds``, folds into the
  engine's ``ts`` timestamp.
* ``Create`` / ``Destroy`` / ``ListSymbols`` (SYMBOL and
  TIME_BUCKET_KEY formats, grpc.go:290) / ``ServerVersion``.

Scale posture: the gRPC layer is a *serving* surface — request
decode and response encode are driver-side by construction (like
frontend/grpc.go itself); every data-plane operation behind it is the
catalog's Spark path.  Errors map to canonical gRPC status codes
(INVALID_ARGUMENT / NOT_FOUND / UNIMPLEMENTED / UNKNOWN) in trailers.
"""

from __future__ import annotations

import socketserver
import struct
import threading

import numpy as np
import pandas as pd

from marketstore_spark import protowire
from marketstore_spark.http2lite import H2ClientConnection, H2Server

__all__ = ["GrpcServer", "GrpcClient", "GrpcError", "serve_grpc_background"]

_SERVICE_PREFIX = "/proto.Marketstore/"

# canonical gRPC status codes
OK = 0
UNKNOWN = 2
INVALID_ARGUMENT = 3
NOT_FOUND = 5
UNIMPLEMENTED = 12


class GrpcError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(f"grpc-status {status}: {message}")
        self.status = status
        self.message = message


# ---------------------------------------------------------------------
# gRPC message framing (5-byte prefix per message)
# ---------------------------------------------------------------------


def _wrap(msg: bytes) -> bytes:
    return b"\x00" + len(msg).to_bytes(4, "big") + msg


def _unwrap_unary(body: bytes) -> bytes:
    if len(body) < 5:
        raise GrpcError(INVALID_ARGUMENT, "truncated grpc frame")
    compressed = body[0]
    if compressed:
        raise GrpcError(UNIMPLEMENTED, "compressed messages not supported")
    (ln,) = struct.unpack("!I", body[1:5])
    if 5 + ln > len(body):
        raise GrpcError(INVALID_ARGUMENT, "grpc frame length beyond body")
    return body[5 : 5 + ln]


# ---------------------------------------------------------------------
# NumpyDataset ⇄ pandas
# ---------------------------------------------------------------------


def _column_array(values: list) -> np.ndarray:
    """A ColumnSeries list (from DataService) → a typed, little-endian
    numpy array.  Nulls demote integer columns to f8/NaN — the
    NumpyDataset wire has fixed-width buffers with no null mask, the
    same constraint the reference's fixed record format imposes."""
    arr = np.asarray(values)
    if arr.ndim != 1:
        # array-typed bucket columns have no NumpyDataset buffer form
        # (the reference's fixed records can't carry them either) —
        # query them over the JSON/msgpack wire instead
        raise GrpcError(
            UNIMPLEMENTED, "nested array columns are not wire-encodable"
        )
    if arr.dtype == object:
        arr = np.array([np.nan if v is None else v for v in values], dtype="f8")
    if arr.dtype.kind in "iu":
        arr = arr.astype("<i8")
    elif arr.dtype.kind == "f":
        arr = arr.astype("<f8")
    elif arr.dtype.kind == "b":
        arr = arr.astype("u1")
    elif arr.dtype.kind in "US":
        arr = arr.astype(f"<U{max(1, max((len(str(v)) for v in values), default=1))}")
    else:
        raise GrpcError(
            UNIMPLEMENTED, f"column dtype {arr.dtype} not wire-encodable"
        )
    return arr


def _column_series_to_nmds(results: dict[str, dict[str, list]]) -> dict:
    """{tbk: {column: [values]}} → NumpyMultiDataset dict (grpc.go:227
    ToProtoNumpyMultiDataSet: one concatenated NumpyDataset + per-TBK
    start_index/lengths)."""
    start_index: dict[str, int] = {}
    lengths: dict[str, int] = {}
    names: list[str] = []
    per_key_arrays: list[dict[str, np.ndarray]] = []
    per_key_rows: list[int] = []
    total = 0
    for key, cols in results.items():
        n = len(next(iter(cols.values()))) if cols else 0
        start_index[key] = total
        lengths[key] = n
        total += n
        per_key_rows.append(n)
        arrays = {c: _column_array(v) for c, v in cols.items()}
        per_key_arrays.append(arrays)
        # union of column names across ALL TBKs in first-seen order —
        # a column present only in a later bucket must still occupy a
        # full-length buffer or the flat start_index/lengths offsets
        # silently misalign on the wire (ToProtoNumpyMultiDataSet
        # builds from a uniform CSM; heterogeneous results must pad)
        for c in cols:
            if c not in names:
                names.append(c)
    column_types, column_data = [], []
    for c in names:
        parts = [a[c] for a in per_key_arrays if c in a]
        # unify dtypes across tbks (e.g. differing string widths)
        widest = max(parts, key=lambda a: a.dtype.itemsize).dtype
        segs: list[np.ndarray] = []
        for arrays, n in zip(per_key_arrays, per_key_rows):
            if c in arrays:
                segs.append(arrays[c].astype(widest))
            else:
                # pad a TBK missing this column so every buffer is
                # exactly `total` rows: NaN for floats, zero otherwise
                fill = np.zeros(n, dtype=widest)
                if np.issubdtype(widest, np.floating):
                    fill[:] = np.nan
                segs.append(fill)
        buf = (
            np.concatenate(segs) if segs else np.array([], dtype=widest)
        )
        column_types.append(buf.dtype.str.lstrip("<>=|"))
        column_data.append(buf.tobytes())
    return {
        "data": {
            "column_types": column_types,
            "column_names": names,
            "column_data": column_data,
            "length": total,
            "data_shapes": [
                {"name": n, "type": t} for n, t in zip(names, column_types)
            ],
        },
        "start_index": start_index,
        "lengths": lengths,
    }


def _nmds_to_frames(nmds: dict) -> dict[str, pd.DataFrame]:
    """NumpyMultiDataset dict → one pandas DataFrame per TBK."""
    ds = nmds.get("data") or {}
    names = ds.get("column_names", [])
    types = ds.get("column_types", [])
    data = ds.get("column_data", [])
    if not (len(names) == len(types) == len(data)):
        raise GrpcError(INVALID_ARGUMENT, "ragged NumpyDataset")
    cols = {}
    for name, t, raw in zip(names, types, data):
        try:
            cols[name] = np.frombuffer(raw, dtype=np.dtype(t))
        except (TypeError, ValueError) as exc:
            raise GrpcError(INVALID_ARGUMENT, f"bad column {name}: {exc}") from exc
    out = {}
    start_index = nmds.get("start_index") or {}
    lengths = nmds.get("lengths") or {}
    for key, start in start_index.items():
        n = lengths.get(key, 0)
        out[key] = pd.DataFrame(
            {c: v[start : start + n] for c, v in cols.items()}
        )
    return out


_NS_PER_SEC = 1_000_000_000


def _fold_epoch(pdf: pd.DataFrame) -> tuple[dict[str, list], list[str]]:
    """Reference write convention → engine columns: ``Epoch`` i8
    seconds (+ optional ``Nanoseconds``) becomes ``ts`` epoch-ns; a
    ``ts`` column is taken as epoch ns directly.  Sub-microsecond
    precision truncates on ingest — the engine's ts is a Spark
    TIMESTAMP (µs), vs the reference's Epoch+Nanoseconds i8/i4 pair."""
    cols = {c: pdf[c].tolist() for c in pdf.columns}
    ts_columns = []
    if "Epoch" in cols and "ts" not in cols:
        ns = [int(e) * _NS_PER_SEC for e in cols.pop("Epoch")]
        if "Nanoseconds" in cols:
            ns = [t + int(x) for t, x in zip(ns, cols.pop("Nanoseconds"))]
        cols["ts"] = ns
        ts_columns = ["ts"]
    elif "ts" in cols:
        ts_columns = ["ts"]
    return cols, ts_columns


# ---------------------------------------------------------------------
# server
# ---------------------------------------------------------------------


class _MethodTable:
    """Translate decoded proto dicts ⇄ DataService calls."""

    def __init__(self, service):
        self.service = service

    # -- Query ----------------------------------------------------------
    def Query(self, req: dict) -> dict:
        responses = []
        for q in req["requests"]:
            if q["is_sql_statement"]:
                reply = self.service.SQL({"statements": [q["sql_statement"]]})
                results = {
                    q["sql_statement"]: r["result"] for r in reply["responses"]
                }
                responses.append({"result": _column_series_to_nmds(results)})
                continue
            params = {
                "destination": q["destination"],
                "limit_record_count": q["limit_record_count"] or None,
                "limit_from_start": q["limit_from_start"],
                "columns": q["columns"] or None,
                "functions": q["functions"],
            }
            if q["epoch_start"] or q["epoch_start_nanos"]:
                params["epoch_start"] = (
                    q["epoch_start"] * _NS_PER_SEC + q["epoch_start_nanos"]
                )
            if q["epoch_end"] or q["epoch_end_nanos"]:
                params["epoch_end"] = (
                    q["epoch_end"] * _NS_PER_SEC + q["epoch_end_nanos"]
                )
            reply = self.service.Query({"requests": [params]})
            for r in reply["responses"]:
                responses.append({"result": _column_series_to_nmds(r["result"])})
        from marketstore_spark import __version__

        return {"responses": responses, "version": __version__, "timezone": "UTC"}

    # -- Write ----------------------------------------------------------
    def Write(self, req: dict) -> dict:
        responses = []
        for w in req["requests"]:
            if w["data"] is None:
                responses.append({"error": "write request without data"})
                continue
            try:
                for tbk, pdf in _nmds_to_frames(w["data"]).items():
                    cols, ts_columns = _fold_epoch(pdf)
                    self.service.Write(
                        {
                            "requests": [
                                {
                                    "key": tbk,
                                    "data": {
                                        "columns": cols,
                                        "ts_columns": ts_columns,
                                    },
                                }
                            ]
                        }
                    )
                responses.append({"error": ""})
            except GrpcError:
                raise
            except Exception as exc:  # noqa: BLE001 — per-request error slot
                responses.append({"error": str(exc)})
        return {"responses": responses}

    # -- Create ---------------------------------------------------------
    #: DataShape type strings → numpy dtypes (proto DataType enum set;
    #: unsigned widths ride pandas→Spark inference onto the next wider
    #: signed type, BOOL onto BooleanType)
    _TYPE_MAP = {
        "i1": "int8", "i2": "int16", "i4": "int32", "i8": "int64",
        "u1": "uint8", "u2": "uint16", "u4": "uint32",
        "f4": "float32", "f8": "float64", "b1": "bool",
    }

    def Create(self, req: dict) -> dict:
        responses = []
        for c in req["requests"]:
            try:
                sample = {}
                ts_columns = []
                for shape in c["data_shapes"]:
                    name, typ = shape["name"], shape["type"]
                    if name in ("Epoch", "ts"):
                        sample["ts"] = [0]
                        ts_columns = ["ts"]
                        continue
                    np_t = self._TYPE_MAP.get(typ)
                    if np_t is None:
                        raise ValueError(f"unsupported data shape type {typ!r}")
                    sample[name] = np.zeros(1, dtype=np_t)
                self.service.Create(
                    {
                        "requests": [
                            {
                                "key": c["key"],
                                "columns": sample,
                                "ts_columns": ts_columns,
                            }
                        ]
                    }
                )
                responses.append({"error": ""})
            except Exception as exc:  # noqa: BLE001
                responses.append({"error": str(exc)})
        return {"responses": responses}

    # -- Destroy ---------------------------------------------------------
    def Destroy(self, req: dict) -> dict:
        responses = []
        for k in req["requests"]:
            try:
                self.service.Destroy({"requests": [{"key": k["key"]}]})
                responses.append({"error": ""})
            except Exception as exc:  # noqa: BLE001
                responses.append({"error": str(exc)})
        return {"responses": responses}

    # -- ListSymbols ------------------------------------------------------
    def ListSymbols(self, req: dict) -> dict:
        fmt = "tbk" if req["format"] == 1 else "symbol"
        return {"results": self.service.ListSymbols({"format": fmt})["results"]}

    # -- ServerVersion ----------------------------------------------------
    def ServerVersion(self, req: dict) -> dict:
        return {"version": self.service.ServerVersion({})["version"]}


#: method → (request message, response message)
_METHODS = {
    "Query": ("MultiQueryRequest", "MultiQueryResponse"),
    "Create": ("MultiCreateRequest", "MultiServerResponse"),
    "Write": ("MultiWriteRequest", "MultiServerResponse"),
    "Destroy": ("MultiKeyRequest", "MultiServerResponse"),
    "ListSymbols": ("ListSymbolsRequest", "ListSymbolsResponse"),
    "ServerVersion": ("ServerVersionRequest", "ServerVersionResponse"),
}


class GrpcServer(socketserver.ThreadingTCPServer):
    """h2c gRPC server fronting a DataService (proto/marketstore.proto
    service Marketstore)."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, service, host: str = "127.0.0.1", port: int = 0):
        self.methods = _MethodTable(service)
        outer = self

        class _ConnHandler(socketserver.BaseRequestHandler):
            def handle(self):
                H2Server(self.request, outer._handle_request).serve()

        super().__init__((host, port), _ConnHandler)

    @property
    def port(self) -> int:
        return self.server_address[1]

    # -- one unary exchange ----------------------------------------------
    def _handle_request(self, headers, body):
        hmap = {}
        for name, value in headers:
            hmap.setdefault(name, value)
        path = hmap.get(":path", "")
        try:
            if hmap.get(":method") != "POST":
                raise GrpcError(INVALID_ARGUMENT, "grpc requires POST")
            ctype = hmap.get("content-type", "")
            if not ctype.startswith("application/grpc"):
                raise GrpcError(INVALID_ARGUMENT, f"bad content-type {ctype!r}")
            if not path.startswith(_SERVICE_PREFIX):
                raise GrpcError(UNIMPLEMENTED, f"unknown service path {path!r}")
            method = path[len(_SERVICE_PREFIX):]
            if method not in _METHODS:
                raise GrpcError(UNIMPLEMENTED, f"unknown method {method!r}")
            req_msg, resp_msg = _METHODS[method]
            req = protowire.decode(req_msg, _unwrap_unary(body))
            try:
                resp = getattr(self.methods, method)(req)
            except GrpcError:
                raise
            except (ValueError, KeyError) as exc:
                raise GrpcError(INVALID_ARGUMENT, str(exc)) from exc
            except FileNotFoundError as exc:
                raise GrpcError(NOT_FOUND, str(exc)) from exc
            except NotImplementedError as exc:
                raise GrpcError(UNIMPLEMENTED, str(exc)) from exc
            except Exception as exc:  # noqa: BLE001 — wire boundary
                raise GrpcError(UNKNOWN, f"{type(exc).__name__}: {exc}") from exc
            payload = _wrap(protowire.encode(resp_msg, resp))
            return (
                [(":status", "200"), ("content-type", "application/grpc")],
                payload,
                [("grpc-status", "0"), ("grpc-message", "")],
            )
        except GrpcError as err:
            # trailers-only error response (the gRPC protocol spec's
            # error shape for failed unary calls)
            return (
                [(":status", "200"), ("content-type", "application/grpc")],
                b"",
                [
                    ("grpc-status", str(err.status)),
                    ("grpc-message", err.message.replace("\n", " ")[:512]),
                ],
            )


def serve_grpc_background(service, host: str = "127.0.0.1", port: int = 0):
    """Start a GrpcServer on a daemon thread; returns (server, thread).
    Mirrors server.serve_background for the JSON/msgpack wire."""
    srv = GrpcServer(service, host, port)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    return srv, thread


# ---------------------------------------------------------------------
# client
# ---------------------------------------------------------------------


class GrpcClient:
    """Minimal gRPC client for the Marketstore service — the
    pymarketstore grpc-client twin, over our own h2c stack."""

    def __init__(self, host: str = "127.0.0.1", port: int = 5995,
                 timeout: float = 30.0):
        self.host = host
        self.port = port
        self.conn = H2ClientConnection(host, port, timeout=timeout)

    def call(self, method: str, req: dict | None = None) -> dict:
        req_msg, resp_msg = _METHODS[method]
        payload = _wrap(protowire.encode(req_msg, req or {}))
        headers = [
            (":method", "POST"),
            (":scheme", "http"),
            (":path", _SERVICE_PREFIX + method),
            (":authority", f"{self.host}:{self.port}"),
            ("content-type", "application/grpc"),
            ("te", "trailers"),
        ]
        resp_headers, body, trailers = self.conn.request(headers, payload)
        tmap = dict(trailers or [])
        if not tmap:  # trailers-only response arrives as one block
            tmap = dict(resp_headers)
        status = int(tmap.get("grpc-status", "2"))
        if status != OK:
            raise GrpcError(status, tmap.get("grpc-message", ""))
        return protowire.decode(resp_msg, _unwrap_unary(body))

    # -- convenience -----------------------------------------------------
    def server_version(self) -> str:
        return self.call("ServerVersion")["version"]

    def list_symbols(self, fmt: str = "symbol") -> list[str]:
        return self.call(
            "ListSymbols", {"format": 1 if fmt == "tbk" else 0}
        )["results"]

    def query(self, destination: str, **kw) -> dict[str, pd.DataFrame]:
        req = {"requests": [{"destination": destination, **kw}]}
        resp = self.call("Query", req)
        frames: dict[str, pd.DataFrame] = {}
        for r in resp["responses"]:
            if r["result"]:
                frames.update(_nmds_to_frames(r["result"]))
        return frames

    def sql(self, statement: str) -> dict[str, pd.DataFrame]:
        resp = self.call(
            "Query",
            {"requests": [{"is_sql_statement": True, "sql_statement": statement}]},
        )
        frames: dict[str, pd.DataFrame] = {}
        for r in resp["responses"]:
            if r["result"]:
                frames.update(_nmds_to_frames(r["result"]))
        return frames

    def write(self, pdf: pd.DataFrame, tbk: str) -> dict:
        # _column_series normalizes datetime columns to epoch-ns ints,
        # the engine's ts wire convention (server.py Write folds them
        # back through ts_columns)
        from marketstore_spark.server import _column_series

        nmds = _column_series_to_nmds({tbk: _column_series(pdf)})
        return self.call(
            "Write", {"requests": [{"data": nmds, "is_variable_length": False}]}
        )

    def destroy(self, tbk: str) -> dict:
        return self.call("Destroy", {"requests": [{"key": tbk}]})

    def close(self) -> None:
        self.conn.close()
