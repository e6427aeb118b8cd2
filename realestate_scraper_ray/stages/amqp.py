"""Minimal AMQP 0-9-1 publisher (stdlib sockets) for the completion
notification (S15, core/backend.py:189-234).

The reference publishes ``{"apartment_id": N}`` to the durable queue
``scraper_new_offers`` with persistent delivery (pika
BlockingConnection → queue_declare(durable=True) → basic_publish with
delivery_mode=2). This container has no pika, so the publisher speaks
the wire protocol directly from the public AMQP 0-9-1 specification —
only the five method classes a fire-and-forget publish needs:

    Connection.Start/StartOk (PLAIN auth) → Tune/TuneOk → Open/OpenOk
    → Channel.Open/OpenOk → Queue.Declare/DeclareOk (durable)
    → Basic.Publish + content header (delivery-mode 2) + body
    → Connection.Close/CloseOk

Frames are ``type(1) channel(2) size(4) payload… 0xCE``; method frames
open with class-id(2) method-id(2). Everything is big-endian. Tested
against an in-process fake broker that runs the server side of the same
handshake and records the declared queue + published message.
"""

from __future__ import annotations

import json
import socket
import struct
from dataclasses import dataclass

FRAME_METHOD, FRAME_HEADER, FRAME_BODY = 1, 2, 3
FRAME_END = 0xCE

# (class, method) ids from the public spec
CONN_START, CONN_START_OK = (10, 10), (10, 11)
CONN_TUNE, CONN_TUNE_OK = (10, 30), (10, 31)
CONN_OPEN, CONN_OPEN_OK = (10, 40), (10, 41)
CONN_CLOSE, CONN_CLOSE_OK = (10, 50), (10, 51)
CHAN_OPEN, CHAN_OPEN_OK = (20, 10), (20, 11)
QUEUE_DECLARE, QUEUE_DECLARE_OK = (50, 10), (50, 11)
BASIC_PUBLISH = (60, 40)
BASIC_CLASS = 60
FLAG_DELIVERY_MODE = 1 << 12  # property-flag bit for delivery-mode


def shortstr(s: str) -> bytes:
    b = s.encode()
    if len(b) > 255:
        raise ValueError("shortstr > 255 bytes")
    return struct.pack("B", len(b)) + b


def longstr(b: bytes) -> bytes:
    return struct.pack(">I", len(b)) + b


def read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("AMQP peer closed mid-frame")
        buf += chunk
    return buf


def read_frame(sock: socket.socket) -> tuple[int, int, bytes]:
    """Returns (frame_type, channel, payload)."""
    head = read_exact(sock, 7)
    ftype, channel, size = struct.unpack(">BHI", head)
    payload = read_exact(sock, size)
    if read_exact(sock, 1)[0] != FRAME_END:
        raise ConnectionError("bad AMQP frame end octet")
    return ftype, channel, payload


def write_frame(sock: socket.socket, ftype: int, channel: int,
                payload: bytes) -> None:
    sock.sendall(struct.pack(">BHI", ftype, channel, len(payload))
                 + payload + bytes([FRAME_END]))


def method_frame(cm: tuple[int, int], args: bytes = b"") -> bytes:
    return struct.pack(">HH", *cm) + args


def parse_method(payload: bytes) -> tuple[tuple[int, int], bytes]:
    return tuple(struct.unpack(">HH", payload[:4])), payload[4:]


@dataclass
class AmqpPublisher:
    """One durable-queue publish per call, reference-shaped
    (backend.py:196-227): connect, declare the durable queue, publish
    the JSON body persistently, close. Deliberately connectionless
    across calls like the reference (one BlockingConnection per
    notification) — notifications are rare relative to offers, and a
    dropped broker never wedges a held socket in a long-lived actor."""

    host: str = "localhost"
    port: int = 5672
    user: str = "guest"
    password: str = "guest"
    vhost: str = "/"
    timeout_s: float = 5.0

    def publish(self, queue: str, message: dict) -> bool:
        try:
            with socket.create_connection((self.host, self.port),
                                          timeout=self.timeout_s) as s:
                self._handshake(s)
                self._open_channel(s)
                self._declare_durable(s, queue)
                self._basic_publish(s, queue, json.dumps(message).encode())
                self._close(s)
            return True
        except (OSError, ConnectionError, struct.error):
            # the reference swallows broker failures per notification
            # (backend.py:228-234 logs and returns False)
            return False

    # -- protocol steps ------------------------------------------------------

    def _expect(self, sock: socket.socket, cm: tuple[int, int]) -> bytes:
        ftype, _, payload = read_frame(sock)
        if ftype != FRAME_METHOD:
            raise ConnectionError(f"expected method frame, got {ftype}")
        got, args = parse_method(payload)
        if got != cm:
            raise ConnectionError(f"expected {cm}, got {got}")
        return args

    def _handshake(self, s: socket.socket) -> None:
        s.sendall(b"AMQP\x00\x00\x09\x01")
        self._expect(s, CONN_START)
        sasl = longstr(b"\x00" + self.user.encode()
                       + b"\x00" + self.password.encode())
        # client-properties: empty field table
        args = longstr(b"") + shortstr("PLAIN") + sasl + shortstr("en_US")
        write_frame(s, FRAME_METHOD, 0, method_frame(CONN_START_OK, args))
        tune = self._expect(s, CONN_TUNE)
        chan_max, frame_max, heartbeat = struct.unpack(">HIH", tune)
        write_frame(s, FRAME_METHOD, 0, method_frame(
            CONN_TUNE_OK, struct.pack(">HIH", chan_max, frame_max, 0)))
        write_frame(s, FRAME_METHOD, 0, method_frame(
            CONN_OPEN, shortstr(self.vhost) + shortstr("") + b"\x00"))
        self._expect(s, CONN_OPEN_OK)

    def _open_channel(self, s: socket.socket) -> None:
        write_frame(s, FRAME_METHOD, 1, method_frame(CHAN_OPEN, shortstr("")))
        self._expect(s, CHAN_OPEN_OK)

    def _declare_durable(self, s: socket.socket, queue: str) -> None:
        # bits octet: passive=0, durable=1, exclusive=0, auto-delete=0,
        # no-wait=0 → 0b00010
        args = (struct.pack(">H", 0) + shortstr(queue)
                + bytes([0b00010]) + longstr(b""))
        write_frame(s, FRAME_METHOD, 1, method_frame(QUEUE_DECLARE, args))
        self._expect(s, QUEUE_DECLARE_OK)

    def _basic_publish(self, s: socket.socket, routing_key: str,
                       body: bytes) -> None:
        args = (struct.pack(">H", 0) + shortstr("")  # default exchange
                + shortstr(routing_key) + b"\x00")   # mandatory/immediate=0
        write_frame(s, FRAME_METHOD, 1, method_frame(BASIC_PUBLISH, args))
        header = struct.pack(">HHQH", BASIC_CLASS, 0, len(body),
                             FLAG_DELIVERY_MODE) + bytes([2])  # persistent
        write_frame(s, FRAME_HEADER, 1, header)
        write_frame(s, FRAME_BODY, 1, body)

    def _close(self, s: socket.socket) -> None:
        write_frame(s, FRAME_METHOD, 0, method_frame(
            CONN_CLOSE, struct.pack(">H", 200) + shortstr("bye")
            + struct.pack(">HH", 0, 0)))
        self._expect(s, CONN_CLOSE_OK)
