"""RabbitMQ sink — minimal AMQP 0-9-1 publisher over a raw socket.

Reference: publish to exchange/routing_key (rabbitmq_pipeline.ex;
routing defaults in routing/consumers/rabbitmq parity — exchange +
per-event routing key). Implements the public AMQP 0-9-1 wire protocol
(spec is open): connection handshake with PLAIN auth, one channel,
publisher confirms (Confirm.Select → wait Basic.Ack) so delivery is
server-confirmed before the engine acks — the same at-least-once
contract as the other sinks.

Only the publish path is implemented (the engine never consumes from
RabbitMQ); tests run against a fake server speaking the same frames.
"""

from __future__ import annotations

import socket
import struct

from sequin_spark.sinks.base import Sink, SinkBatch, register_sink

FRAME_METHOD, FRAME_HEADER, FRAME_BODY = 1, 2, 3
FRAME_END = 0xCE

# class.method ids (AMQP 0-9-1 spec)
CONN_START, CONN_START_OK = (10, 10), (10, 11)
CONN_TUNE, CONN_TUNE_OK = (10, 30), (10, 31)
CONN_OPEN, CONN_OPEN_OK = (10, 40), (10, 41)
CHAN_OPEN, CHAN_OPEN_OK = (20, 10), (20, 11)
CONFIRM_SELECT, CONFIRM_SELECT_OK = (85, 10), (85, 11)
BASIC_PUBLISH, BASIC_ACK, BASIC_NACK = (60, 40), (60, 80), (60, 120)


def shortstr(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">B", len(b)) + b


def longstr(b: bytes) -> bytes:
    return struct.pack(">I", len(b)) + b


def frame(ftype: int, channel: int, payload: bytes) -> bytes:
    return struct.pack(">BHI", ftype, channel, len(payload)) + payload + bytes([FRAME_END])


def method_frame(channel: int, cm: tuple[int, int], args: bytes = b"") -> bytes:
    return frame(FRAME_METHOD, channel, struct.pack(">HH", *cm) + args)


def parse_frame(buf) -> tuple[int, int, bytes]:
    head = buf.read(7)
    if len(head) < 7:
        raise RuntimeError("amqp: connection closed")
    ftype, channel, size = struct.unpack(">BHI", head)
    payload = buf.read(size)
    end = buf.read(1)
    if end != bytes([FRAME_END]):
        raise RuntimeError("amqp: bad frame end")
    return ftype, channel, payload


def parse_method(payload: bytes) -> tuple[tuple[int, int], bytes]:
    cls, meth = struct.unpack_from(">HH", payload)
    return (cls, meth), payload[4:]


class RabbitMqSink(Sink):
    sink_type = "rabbitmq"
    default_batch_size = 10

    def open(self) -> None:
        host = self.config.get("host", "127.0.0.1")
        port = int(self.config.get("port", 5672))
        user = self.config.get("username", "guest")
        password = self.config.get("password", "guest")
        vhost = self.config.get("vhost", "/")
        self._sock = socket.create_connection((host, port), timeout=10)
        self._buf = self._sock.makefile("rb")
        self._sock.sendall(b"AMQP\x00\x00\x09\x01")
        self._expect_method(CONN_START)
        auth = b"\x00" + user.encode() + b"\x00" + password.encode()
        self._sock.sendall(
            method_frame(0, CONN_START_OK,
                         struct.pack(">I", 0)            # empty client-properties table
                         + shortstr("PLAIN") + longstr(auth) + shortstr("en_US"))
        )
        self._expect_method(CONN_TUNE)
        self._sock.sendall(method_frame(0, CONN_TUNE_OK, struct.pack(">HIH", 0, 131072, 0)))
        self._sock.sendall(method_frame(0, CONN_OPEN, shortstr(vhost) + shortstr("") + b"\x00"))
        self._expect_method(CONN_OPEN_OK)
        self._sock.sendall(method_frame(1, CHAN_OPEN, shortstr("")))
        self._expect_method(CHAN_OPEN_OK)
        self._sock.sendall(method_frame(1, CONFIRM_SELECT, b"\x00"))
        self._expect_method(CONFIRM_SELECT_OK)

    def _expect_method(self, cm: tuple[int, int]) -> bytes:
        while True:
            ftype, _, payload = parse_frame(self._buf)
            if ftype != FRAME_METHOD:
                continue
            got, args = parse_method(payload)
            if got == cm:
                return args
            if got in (BASIC_ACK, BASIC_NACK):
                continue  # stale confirms
            raise RuntimeError(f"amqp: expected {cm}, got {got}")

    def deliver(self, batch: SinkBatch) -> None:
        exchange = batch.routing.get("exchange") or self.config.get("exchange", "sequin")
        out = bytearray()
        for row in batch.rows:
            rk = row.get("routing_key") or batch.routing.get("routing_key") or "sequin"
            body = (row.get("value") or "").encode()
            out += method_frame(
                1, BASIC_PUBLISH,
                struct.pack(">H", 0) + shortstr(exchange) + shortstr(rk) + b"\x00",
            )
            # content header: class, weight, body size, property flags (none)
            out += frame(FRAME_HEADER, 1, struct.pack(">HHQH", 60, 0, len(body), 0))
            out += frame(FRAME_BODY, 1, body)
        self._sock.sendall(bytes(out))
        # publisher confirms: wait for acks covering all publishes
        remaining = len(batch.rows)
        while remaining > 0:
            ftype, _, payload = parse_frame(self._buf)
            if ftype != FRAME_METHOD:
                continue
            cm, args = parse_method(payload)
            if cm == BASIC_ACK:
                _tag, multiple = struct.unpack(">QB", args[:9])
                remaining = 0 if multiple else remaining - 1
            elif cm == BASIC_NACK:
                raise RuntimeError("amqp: broker nacked publish")

    def close(self) -> None:
        try:
            self._sock.close()
        except Exception:  # noqa: BLE001
            pass


register_sink("rabbitmq", RabbitMqSink)
