"""msgpack wire codec (msgpacklite) + msgpack-RPC content negotiation
on the live server — the reference serves DataService over msgpack-RPC
(frontend/server.go:74 registers the codec for application/x-msgpack;
utils/rpc/msgpack2 is JSON-RPC-2.0 envelopes encoded as msgpack), so a
reference-shaped client sends msgpack frames to /rpc and must get
msgpack frames back, while the JSON path keeps working on the SAME
server (mirrors frontend/server_test.go's method-surface shapes)."""

import json
import math
import struct
import urllib.request

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from marketstore_spark.catalog import Catalog, load_table
from marketstore_spark.client import HttpClient
from marketstore_spark.msgpacklite import Ext, packb, unpackb
from marketstore_spark.server import serve_background

# ---------------------------------------------------------------------
# Codec unit tests
# ---------------------------------------------------------------------


@pytest.mark.parametrize(
    "obj",
    [
        None, True, False,
        0, 1, 127, 128, 255, 256, 65535, 65536, 2**32 - 1, 2**32, 2**63 - 1,
        -1, -32, -33, -128, -129, -32768, -32769, -(2**31), -(2**31) - 1, -(2**63),
        1.5, -0.0, 3.141592653589793,
        "", "a", "x" * 31, "x" * 32, "x" * 255, "x" * 256, "x" * 70000, "héllo ✓",
        b"", b"\x00\xff", b"y" * 300, b"z" * 70000,
        [], [1, 2, 3], list(range(20)),
        {}, {"a": 1}, {str(i): i for i in range(20)},
        [None, {"k": [1, [2, {"n": None}]]}],
        Ext(5, b"abcd"), Ext(-1, b"\x00" * 8), Ext(3, b"q" * 17),
    ],
)
def test_roundtrip(obj):
    assert unpackb(packb(obj)) == obj


def test_large_collections_use_32bit_headers():
    big_list = list(range(70000))
    assert unpackb(packb(big_list)) == big_list
    big_map = {str(i): i for i in range(70000)}
    assert unpackb(packb(big_map)) == big_map


def test_spec_pinned_frames():
    # byte-exact frames from the public msgpack format table — pins
    # interop with any spec-compliant peer, not just ourselves
    assert packb(None) == b"\xc0"
    assert packb(True) == b"\xc3"
    assert packb(127) == b"\x7f"
    assert packb(-32) == b"\xe0"
    assert packb(255) == b"\xcc\xff"
    assert packb(2**63 - 1) == b"\xcf\x7f\xff\xff\xff\xff\xff\xff\xff"
    assert packb(-(2**63)) == b"\xd3\x80\x00\x00\x00\x00\x00\x00\x00"
    assert packb("abc") == b"\xa3abc"
    assert packb([1, 2]) == b"\x92\x01\x02"
    assert packb({"a": 1}) == b"\x81\xa1a\x01"
    assert packb(1.0) == b"\xcb" + struct.pack(">d", 1.0)
    assert packb(b"\x01") == b"\xc4\x01\x01"


def test_float_roundtrip_bitwise_and_float32_decode():
    for f in [1e-308, 1e308, 0.1, float("inf"), float("-inf")]:
        assert struct.pack(">d", unpackb(packb(f))) == struct.pack(">d", f)
    assert math.isnan(unpackb(packb(float("nan"))))
    assert unpackb(b"\xca" + struct.pack(">f", 2.5)) == 2.5


@pytest.mark.parametrize(
    "bad",
    [
        b"",                      # empty
        b"\xa3ab",                # truncated fixstr
        b"\xc1",                  # reserved byte
        b"\x92\x01\x02\x00",      # trailing bytes
        b"\xdc\x00",              # truncated array16 header
        b"\xcb\x00\x00",          # truncated float64
        b"\x81\x91\x01\x01",      # array as map key
    ],
)
def test_malformed_frames_raise(bad):
    with pytest.raises(ValueError):
        unpackb(bad)


def test_int_out_of_64bit_range_raises():
    with pytest.raises(OverflowError):
        packb(2**64)
    with pytest.raises(OverflowError):
        packb(-(2**63) - 1)


def test_default_hook_mirrors_json():
    import decimal

    obj = {"v": decimal.Decimal("1.5")}
    assert unpackb(packb(obj, default=str)) == json.loads(
        json.dumps(obj, default=str)
    )
    with pytest.raises(TypeError):
        packb({"v": decimal.Decimal("1.5")})  # no hook -> loud


_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**64 - 1),
    st.floats(allow_nan=False),
    st.text(max_size=40),
    st.binary(max_size=40),
)
_value = st.recursive(
    _scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=6),
        st.dictionaries(st.text(max_size=10), children, max_size=6),
    ),
    max_leaves=25,
)


@settings(max_examples=200, deadline=None)
@given(_value)
def test_roundtrip_property(obj):
    assert unpackb(packb(obj)) == obj


# ---------------------------------------------------------------------
# Live-server msgpack-RPC (content negotiation on /rpc)
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def msrv(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("msgpackroot"))
    cat = Catalog(spark, root)
    ev = load_table(spark, sf_dir, "events")
    for sym in (1, 2):
        cat.write(f"MSG{sym}/1Min/TICK", ev.filter(F.col("user_id") == sym))
    srv, _t = serve_background(cat)
    yield srv.server_address[1]
    srv.shutdown()


def _post(port, body, ctype):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/rpc",
        data=body,
        headers={"Content-Type": ctype},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.headers.get("Content-Type"), resp.read()


def _mp_call(port, method, params, rid=1):
    body = packb(
        {"jsonrpc": "2.0", "id": rid, "method": method, "params": params}
    )
    ctype, raw = _post(port, body, "application/x-msgpack")
    assert ctype == "application/x-msgpack"
    return unpackb(raw)


def test_msgpack_list_symbols(msrv):
    out = _mp_call(msrv, "DataService.ListSymbols", {})
    assert out["jsonrpc"] == "2.0" and out["id"] == 1
    assert sorted(out["result"]["results"]) == ["MSG1", "MSG2"]


def test_msgpack_query_roundtrip_matches_json(msrv):
    params = {
        "requests": [
            {"destination": "MSG1/1Min/TICK", "limit_record_count": 5}
        ]
    }
    mp = _mp_call(msrv, "DataService.Query", params)
    # same request over JSON — byte-identical payload semantics
    body = json.dumps(
        {"jsonrpc": "2.0", "id": 1, "method": "DataService.Query", "params": params}
    ).encode()
    ctype, raw = _post(msrv, body, "application/json")
    assert ctype == "application/json"
    js = json.loads(raw)
    assert mp["result"] == js["result"]
    series = mp["result"]["responses"][0]["result"]["MSG1/1Min/TICK"]
    assert len(series["ts"]) == 5  # epoch-ns ints survive msgpack exactly
    assert all(isinstance(v, int) for v in series["ts"])


def test_msgpack_write_getinfo_destroy(msrv):
    wr = _mp_call(
        msrv,
        "DataService.Write",
        {
            "requests": [
                {
                    "key": "WIRE/1Min/TICK",
                    "data": {
                        "columns": {"ts": [1, 2, 3], "value": [1.5, 2.5, 3.5]},
                        "ts_columns": ["ts"],
                    },
                    "mode": "append",
                }
            ]
        },
    )
    assert wr["result"]["responses"][0]["error"] is None
    info = _mp_call(
        msrv, "DataService.GetInfo", {"requests": [{"key": "WIRE/1Min/TICK"}]}
    )
    assert info["result"]["responses"][0]["rows"] == 3
    gone = _mp_call(
        msrv, "DataService.Destroy", {"requests": [{"key": "WIRE/1Min/TICK"}]}
    )
    assert "error" not in gone or gone["error"] is None


def test_msgpack_parse_error_replies_in_msgpack(msrv):
    ctype, raw = _post(msrv, b"\xc1\xc1\xc1", "application/x-msgpack")
    assert ctype == "application/x-msgpack"
    out = unpackb(raw)
    assert out["error"]["code"] == -32700


def test_msgpack_method_not_found(msrv):
    out = _mp_call(msrv, "DataService.__init__", {})
    assert out["error"]["code"] == -32601


def test_http_client_msgpack_codec(msrv):
    cli = HttpClient(f"http://127.0.0.1:{msrv}", codec="msgpack")
    assert sorted(cli.list_symbols()) == ["MSG1", "MSG2"]
    series = cli.query("MSG2/1Min/TICK", limit_record_count=4)[
        "MSG2/1Min/TICK"
    ]
    jcli = HttpClient(f"http://127.0.0.1:{msrv}")  # JSON twin
    jseries = jcli.query("MSG2/1Min/TICK", limit_record_count=4)[
        "MSG2/1Min/TICK"
    ]
    assert series == jseries
    ver = cli.server_version()
    assert "version" in ver


def test_http_client_rejects_unknown_codec():
    with pytest.raises(ValueError):
        HttpClient("http://x", codec="protobuf")


def test_unpackb_depth_bound_is_valueerror_not_recursionerror():
    """A ~1 KB body of repeated fixarray bytes must be a clean parse
    error: RecursionError would escape the server's
    except (ValueError, TypeError) and kill the request with an
    unhandled traceback."""
    from marketstore_spark import msgpacklite

    with pytest.raises(ValueError):
        msgpacklite.unpackb(b"\x91" * 1000 + b"\xc0")
    # maps recurse too
    with pytest.raises(ValueError):
        msgpacklite.unpackb(b"\x81\xa1k" * 1000 + b"\xc0")
    # depth *at* the bound still parses
    ok = b"\x91" * 100 + b"\xc0"
    v = msgpacklite.unpackb(ok)
    for _ in range(100):
        assert isinstance(v, list) and len(v) == 1
        v = v[0]
    assert v is None
