"""RFC 6455 websocket push (server.py /ws + websocket.py framing) —
the reference's streaming interface (cmd/start/main.go:129 →
frontend/stream/stream.go): subscribe by TBK glob with a msgpack
message, receive msgpack {"key", "data"} payloads pushed on write."""

import json as _json
import os
import socket
import struct
import threading

import pytest

from marketstore_spark import websocket as ws
from marketstore_spark.catalog import Catalog
from marketstore_spark.msgpacklite import packb, unpackb
from marketstore_spark.server import serve_background
from marketstore_spark.streaming.pubsub import StreamHub

# ---------------------------------------------------------------------
# Framing layer
# ---------------------------------------------------------------------


def test_accept_key_rfc_example():
    # the worked example from RFC 6455 §1.3 — pins the GUID + sha1+b64
    assert (
        ws.accept_key("dGhlIHNhbXBsZSBub25jZQ==")
        == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="
    )


@pytest.mark.parametrize("mask", [False, True])
@pytest.mark.parametrize("size", [0, 1, 125, 126, 65535, 65536, 70000])
def test_frame_roundtrip_all_length_forms(mask, size):
    a, b = socket.socketpair()
    try:
        payload = os.urandom(size)
        threading.Thread(
            target=ws.write_frame, args=(a, ws.OP_BINARY, payload, mask)
        ).start()
        fin, op, got = ws.read_frame(b)
        assert fin and op == ws.OP_BINARY and got == payload
    finally:
        a.close()
        b.close()


def test_read_message_answers_ping_and_assembles_fragments():
    a, b = socket.socketpair()
    try:
        # fragmented text message with a ping interleaved
        frames = bytearray()
        frames += bytes([0x01, 2]) + b"he"          # TEXT, no FIN
        frames += bytes([0x89, 4]) + b"ping"        # PING (control, FIN)
        frames += bytes([0x80, 3]) + b"llo"         # CONT, FIN
        a.sendall(bytes(frames))
        conn = ws.Conn(b)
        op, payload = conn.read_message()
        assert op == ws.OP_TEXT and payload == b"hello"
        # the PONG echoing the ping payload went back to the peer
        fin, op2, pong = ws.read_frame(a)
        assert op2 == ws.OP_PONG and pong == b"ping"
    finally:
        a.close()
        b.close()


def test_read_message_pong_mid_fragment_does_not_orphan_buffer():
    """RFC 6455 §5.4: a PONG interleaved with a fragmented message must
    not disrupt assembly — the server pings every 45s, so a client
    fragmenting a subscribe while a pong is in flight hits this."""
    a, b = socket.socketpair()
    try:
        frames = bytearray()
        frames += bytes([0x01, 2]) + b"he"          # TEXT, no FIN
        frames += bytes([0x8A, 4]) + b"pong"        # PONG (control, FIN)
        frames += bytes([0x80, 3]) + b"llo"         # CONT, FIN
        a.sendall(bytes(frames))
        conn = ws.Conn(b)
        op, payload = conn.read_message()
        assert op == ws.OP_TEXT and payload == b"hello"
        # with no fragment pending, a pong IS surfaced
        a.sendall(bytes([0x8A, 2]) + b"hi")
        op, payload = conn.read_message()
        assert op == ws.OP_PONG and payload == b"hi"
    finally:
        a.close()
        b.close()


def test_write_frame_rejects_oversized_control_payload():
    # RFC 6455 §5.5: control payloads cap at 125 bytes
    a, b = socket.socketpair()
    try:
        with pytest.raises(ValueError):
            ws.write_frame(a, ws.OP_PING, b"x" * 126)
        ws.write_frame(a, ws.OP_PING, b"x" * 125)  # at the cap: fine
        fin, op, got = ws.read_frame(b)
        assert op == ws.OP_PING and len(got) == 125
    finally:
        a.close()
        b.close()


def test_server_side_rejects_unmasked_client_frame():
    # RFC 6455 §5.1: a server must fail the connection on an unmasked
    # client frame
    a, b = socket.socketpair()
    try:
        a.sendall(bytes([0x82, 0x02]) + b"ok")  # BINARY, unmasked
        conn = ws.Conn(b, require_masked=True)
        with pytest.raises(ValueError):
            conn.read_message()
    finally:
        a.close()
        b.close()


def test_conn_initial_bytes_feed_frame_reader():
    """Bytes pipelined behind the handshake (drained from the HTTP
    handler's rfile buffer) must reach the frame reader first."""
    a, b = socket.socketpair()
    try:
        whole = bytes([0x81, 0x03]) + b"abc"
        head, tail = whole[:3], whole[3:]
        a.sendall(tail)
        conn = ws.Conn(b, initial=head)
        assert conn.pending
        op, payload = conn.read_message()
        assert op == ws.OP_TEXT and payload == b"abc"
        assert not conn.pending
    finally:
        a.close()
        b.close()


def test_frame_protocol_violations():
    for raw in (
        bytes([0xF1, 0x00]),                          # reserved bits
        bytes([0x82, 0x7F]) + struct.pack(">Q", 2**40),  # oversized len
    ):
        a, b = socket.socketpair()
        try:
            a.sendall(raw)
            with pytest.raises(ValueError):
                ws.read_frame(b)
        finally:
            a.close()
            b.close()


def test_peer_close_mid_frame_raises_connection_error():
    a, b = socket.socketpair()
    try:
        a.sendall(bytes([0x82, 10]) + b"abc")  # promises 10, sends 3
        a.close()
        with pytest.raises(ConnectionError):
            ws.read_frame(b)
    finally:
        b.close()


# ---------------------------------------------------------------------
# Live server: subscribe + push
# ---------------------------------------------------------------------


@pytest.fixture()
def wsrv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("wsroot")
    cat = Catalog(spark, str(root / "cat"))
    hub = StreamHub(key_col="tbk", delivery_root=str(root / "deliveries"))
    srv, _t = serve_background(cat, hub=hub)
    yield srv, hub, root, spark
    srv.shutdown()


def _port(srv):
    return srv.server_address[1]


def _connect(port):
    sock = socket.create_connection(("127.0.0.1", port), timeout=120)
    return ws.client_handshake(sock, f"127.0.0.1:{port}", "/ws"), sock


def _push_batch(spark, hub, src_dir, rows):
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, "b0.json"), "w") as fh:
        for row in rows:
            fh.write(_json.dumps(row) + "\n")
    stream = spark.readStream.schema("tbk string, v long").json(src_dir)
    hub.attach(stream).awaitTermination(120)


def test_ws_subscribe_ack_and_push(wsrv):
    srv, hub, root, spark = wsrv
    port = _port(srv)
    conn, sock = _connect(port)
    try:
        sub = packb({"streams": ["SYM1/1Min/*"]})
        conn.send(sub)
        op, ack = conn.read_message()
        assert ack == sub  # server acks by echoing the subscribe frame

        _push_batch(
            spark, hub, str(root / "src1"),
            [
                {"tbk": "SYM1/1Min/TICK", "v": 1},
                {"tbk": "SYM2/1Min/TICK", "v": 2},
                {"tbk": "SYM1/1Min/TICK", "v": 3},
            ],
        )
        got = []
        while len(got) < 2:
            op, payload = conn.read_message()
            assert op == ws.OP_BINARY
            got.append(unpackb(payload))
        assert all(p["key"] == "SYM1/1Min/TICK" for p in got)
        assert sorted(p["data"]["v"] for p in got) == [1, 3]  # glob filtered
        conn.close()
    finally:
        sock.close()


def test_ws_invalid_stream_gets_error_message(wsrv):
    srv, _hub, _root, _spark = wsrv
    port = _port(srv)
    conn, sock = _connect(port)
    try:
        conn.send(packb({"streams": ["not-a-tbk"]}))
        _op, payload = conn.read_message()
        out = unpackb(payload)
        assert out["error"] == "not-a-tbk is an invalid stream"
        # malformed msgpack is an error too, and the socket survives
        conn.send(b"\xc1\xc1")
        _op, payload = conn.read_message()
        assert "error" in unpackb(payload)
        # a valid subscribe still works afterwards
        sub = packb({"streams": ["A/B/C"]})
        conn.send(sub)
        _op, ack = conn.read_message()
        assert ack == sub
    finally:
        sock.close()


def test_ws_resubscribe_replaces_stream_set(wsrv):
    srv, hub, root, spark = wsrv
    port = _port(srv)
    conn, sock = _connect(port)
    try:
        sub1 = packb({"streams": ["RE1/1Min/*"]})
        conn.send(sub1)
        conn.read_message()
        sub2 = packb({"streams": ["RE2/1Min/*"]})  # replaces, not adds
        conn.send(sub2)
        conn.read_message()
        _push_batch(
            spark, hub, str(root / "src2"),
            [
                {"tbk": "RE1/1Min/TICK", "v": 10},
                {"tbk": "RE2/1Min/TICK", "v": 20},
            ],
        )
        _op, payload = conn.read_message()
        got = unpackb(payload)
        assert got["key"] == "RE2/1Min/TICK" and got["data"]["v"] == 20
        # nothing else arrives for the dropped RE1 subscription
        sock.settimeout(2.0)
        with pytest.raises((socket.timeout, TimeoutError)):
            conn.read_message()
    finally:
        sock.close()


def test_ws_push_resumes_after_subscribe_not_history(wsrv):
    """Rows written BEFORE the subscribe are not replayed — the
    reference pushes on write only (stream.go Push)."""
    srv, hub, root, spark = wsrv
    port = _port(srv)
    _push_batch(
        spark, hub, str(root / "src3a"), [{"tbk": "HIS/1Min/TICK", "v": 1}]
    )
    conn, sock = _connect(port)
    try:
        # the pre-subscribe row exists only if some subscriber glob
        # matched it; subscribe now and push a second batch
        sub = packb({"streams": ["HIS/1Min/*"]})
        conn.send(sub)
        conn.read_message()
        _push_batch(
            spark, hub, str(root / "src3b"), [{"tbk": "HIS/1Min/TICK", "v": 2}]
        )
        _op, payload = conn.read_message()
        assert unpackb(payload)["data"]["v"] == 2
        sock.settimeout(2.0)
        with pytest.raises((socket.timeout, TimeoutError)):
            conn.read_message()  # v=1 never replayed
    finally:
        sock.close()


def test_ws_upgrade_required(wsrv):
    srv, _hub, _root, _spark = wsrv
    port = _port(srv)
    import urllib.error
    import urllib.request

    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(f"http://127.0.0.1:{port}/ws", timeout=30)
    assert ei.value.code == 400


def test_ws_server_ping_keepalive(wsrv):
    srv, _hub, _root, _spark = wsrv
    # shrink the period for THIS server only; ws_ping_interval is read
    # each loop tick so the running handler picks it up
    srv.RequestHandlerClass.ws_ping_interval = 1.0
    conn, sock = _connect(_port(srv))
    try:
        sub = packb({"streams": ["PING/1Min/*"]})
        conn.send(sub)
        conn.read_message()
        # read_frame directly: read_message would auto-reply and keep
        # waiting for a data frame, but we want to SEE the ping
        sock.settimeout(120)
        fin, op, payload = ws.read_frame(sock)
        assert op == ws.OP_PING
        # answer pong; connection stays healthy for a close handshake
        ws.write_frame(sock, ws.OP_PONG, payload, mask=True)
        conn.close()
    finally:
        sock.close()
