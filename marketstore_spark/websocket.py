"""RFC 6455 websocket framing — pure stdlib (hashlib/base64/struct).

The reference streams live data over a websocket endpoint
(``/ws``, cmd/start/main.go:129 → frontend/stream/stream.go): a client
upgrades the connection, sends a msgpack ``{"streams": [globs]}``
subscribe message, and receives msgpack ``{"key": tbk, "data": ...}``
payloads as binary frames whenever a write matches a subscribed glob.
gorilla/websocket supplies the framing there; this module supplies the
same wire layer from the public RFC: handshake accept-key, frame
reader (client frames are masked per the RFC; unmasking is the XOR
loop the spec defines), and frame writer (server frames unmasked,
client frames masked — both directions so tests and wire clients can
use the same codec).

Fragmentation: ``read_frame`` returns raw (fin, opcode, payload)
triples; ``Conn.read_message`` assembles continuation frames and
answers pings transparently, which is all the subscribe protocol
needs.  Payload sizes are bounded by ``MAX_FRAME`` — a subscribe
message is tiny, and refusing a rogue 2⁶³-byte length is what keeps a
malformed client from pinning server memory.
"""

from __future__ import annotations

import base64
import hashlib
import os
import socket
import struct

#: RFC 6455 §4.2.2 — the fixed GUID appended to the client key.
GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT = 0x0
OP_TEXT = 0x1
OP_BINARY = 0x2
OP_CLOSE = 0x8
OP_PING = 0x9
OP_PONG = 0xA

#: Upper bound on a single frame's payload (16 MiB) — far above any
#: subscribe message or pushed batch row, far below a memory DoS.
MAX_FRAME = 16 * 1024 * 1024


def accept_key(client_key: str) -> str:
    """``Sec-WebSocket-Accept`` for a client's ``Sec-WebSocket-Key``."""
    digest = hashlib.sha1((client_key + GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def write_frame(sock, opcode: int, payload: bytes, mask: bool = False) -> None:
    """Send one frame (FIN always set — callers don't fragment).
    ``mask=True`` is the CLIENT side: the RFC requires every
    client-to-server frame to carry a 4-byte masking key."""
    if opcode >= 0x8 and len(payload) > 125:
        # RFC 6455 §5.5: control-frame payloads are capped at 125
        # bytes; emitting more is a protocol violation strict peers
        # close on (e.g. a PONG echoing an oversized PING).
        raise ValueError("websocket: control frame payload exceeds 125 bytes")
    head = bytearray([0x80 | (opcode & 0x0F)])
    n = len(payload)
    mask_bit = 0x80 if mask else 0
    if n < 126:
        head.append(mask_bit | n)
    elif n < 0x10000:
        head.append(mask_bit | 126)
        head += struct.pack(">H", n)
    else:
        head.append(mask_bit | 127)
        head += struct.pack(">Q", n)
    if mask:
        key = os.urandom(4)
        head += key
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    sock.sendall(bytes(head) + payload)


def _recv_exact(sock, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("websocket: peer closed mid-frame")
        buf += chunk
    return buf


def read_frame(sock, require_masked: bool = False) -> tuple[bool, int, bytes]:
    """Read one frame → (fin, opcode, unmasked payload).  Raises
    ``ConnectionError`` on EOF, ``ValueError`` on protocol violations
    (oversized length, reserved bits, or — when ``require_masked`` is
    set, the server side per RFC 6455 §5.1 — an unmasked client
    frame)."""
    b1, b2 = _recv_exact(sock, 2)
    fin = bool(b1 & 0x80)
    if b1 & 0x70:
        raise ValueError("websocket: reserved bits set (no extensions negotiated)")
    opcode = b1 & 0x0F
    masked = bool(b2 & 0x80)
    if require_masked and not masked:
        raise ValueError("websocket: client frame not masked (RFC 6455 §5.1)")
    n = b2 & 0x7F
    if n == 126:
        n = struct.unpack(">H", _recv_exact(sock, 2))[0]
    elif n == 127:
        n = struct.unpack(">Q", _recv_exact(sock, 8))[0]
    if n > MAX_FRAME:
        raise ValueError(f"websocket: frame of {n} bytes exceeds cap")
    if masked:
        key = _recv_exact(sock, 4)
        raw = _recv_exact(sock, n)
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(raw))
    else:
        payload = _recv_exact(sock, n)
    return fin, opcode, payload


class _BufferedSock:
    """``recv()`` facade serving pre-read bytes before the raw socket —
    bytes a client pipelined behind its upgrade request land in the
    HTTP handler's buffered ``rfile``; dropping them would corrupt
    framing, so the server drains them here (RFC-compliant clients
    wait for the 101, but the frame reader must not depend on that)."""

    def __init__(self, sock: socket.socket, initial: bytes):
        self.sock = sock
        self.buf = bytearray(initial)

    def recv(self, n: int) -> bytes:
        if self.buf:
            out = bytes(self.buf[:n])
            del self.buf[:n]
            return out
        return self.sock.recv(n)


class Conn:
    """One websocket connection after the upgrade (either side).

    ``read_message`` assembles fragmented data messages, transparently
    answers PING with PONG, and returns ``(opcode, payload)`` where
    opcode is TEXT/BINARY/CLOSE/PONG.  Raises ``socket.timeout``
    through — the server's push loop uses a short socket timeout to
    interleave reads with pushes.

    ``require_masked=True`` is the server side: RFC 6455 §5.1 requires
    a server to fail the connection on an unmasked client frame.
    ``initial`` is any already-buffered post-handshake bytes (see
    ``_BufferedSock``); ``pending`` tells a select()-based caller that
    a read may succeed without socket readability."""

    def __init__(
        self,
        sock: socket.socket,
        mask_outgoing: bool = False,
        initial: bytes = b"",
        require_masked: bool = False,
    ):
        self.sock = sock
        self.mask_outgoing = mask_outgoing
        self.require_masked = require_masked
        self._rsock = _BufferedSock(sock, initial) if initial else sock

    @property
    def pending(self) -> bool:
        """True when pre-read bytes await the frame reader."""
        return bool(getattr(self._rsock, "buf", b""))

    def send(self, payload: bytes, opcode: int = OP_BINARY) -> None:
        write_frame(self.sock, opcode, payload, mask=self.mask_outgoing)

    def ping(self, payload: bytes = b"") -> None:
        write_frame(self.sock, OP_PING, payload, mask=self.mask_outgoing)

    def close(self, code: int = 1000) -> None:
        try:
            write_frame(
                self.sock, OP_CLOSE, struct.pack(">H", code), mask=self.mask_outgoing
            )
        except OSError:
            pass

    def read_message(self) -> tuple[int, bytes]:
        buf = b""
        first_op = None
        while True:
            fin, op, payload = read_frame(
                self._rsock, require_masked=self.require_masked
            )
            if op == OP_PING:  # control frames may interleave fragments
                write_frame(self.sock, OP_PONG, payload, mask=self.mask_outgoing)
                continue
            if op == OP_PONG:
                # RFC 6455 §5.4: control frames may interleave a
                # fragmented message without disrupting it — surface a
                # pong only when no fragment is pending (returning
                # mid-assembly would orphan buf and make the next
                # OP_CONT a bogus 'continuation with no message').
                if first_op is None:
                    return op, payload
                continue
            if op == OP_CLOSE:
                return op, payload
            if op == OP_CONT:
                if first_op is None:
                    raise ValueError("websocket: continuation with no message")
            else:
                if first_op is not None:
                    raise ValueError("websocket: interleaved data message")
                first_op = op
            buf += payload
            if len(buf) > MAX_FRAME:
                raise ValueError("websocket: fragmented message exceeds cap")
            if fin:
                return first_op, buf


def client_handshake(sock: socket.socket, host: str, path: str = "/ws") -> Conn:
    """Client-side upgrade over a connected socket → masked ``Conn``.
    Validates the server's ``Sec-WebSocket-Accept``."""
    key = base64.b64encode(os.urandom(16)).decode()
    req = (
        f"GET {path} HTTP/1.1\r\n"
        f"Host: {host}\r\n"
        "Upgrade: websocket\r\n"
        "Connection: Upgrade\r\n"
        f"Sec-WebSocket-Key: {key}\r\n"
        "Sec-WebSocket-Version: 13\r\n\r\n"
    )
    sock.sendall(req.encode())
    # read the 101 response head
    head = b""
    while b"\r\n\r\n" not in head:
        chunk = sock.recv(4096)
        if not chunk:
            raise ConnectionError("websocket: server closed during handshake")
        head += chunk
        if len(head) > 65536:
            raise ValueError("websocket: oversized handshake response")
    status, _, rest = head.partition(b"\r\n")
    if b"101" not in status:
        raise ConnectionError(f"websocket: upgrade refused: {status.decode()!r}")
    accept = None
    for line in rest.split(b"\r\n"):
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"sec-websocket-accept":
            accept = v.strip().decode()
    if accept != accept_key(key):
        raise ConnectionError("websocket: bad Sec-WebSocket-Accept")
    return Conn(sock, mask_outgoing=True)
