"""RabbitMQ sink against a fake AMQP 0-9-1 server (handshake + confirms)."""

import socket
import struct
import threading

import pytest

from sequin_spark.sinks.base import SinkBatch, create_sink
from sequin_spark.sinks.rabbitmq import (
    BASIC_ACK,
    BASIC_PUBLISH,
    CHAN_OPEN,
    CHAN_OPEN_OK,
    CONFIRM_SELECT,
    CONFIRM_SELECT_OK,
    CONN_OPEN,
    CONN_OPEN_OK,
    CONN_START,
    CONN_START_OK,
    CONN_TUNE,
    CONN_TUNE_OK,
    FRAME_BODY,
    FRAME_HEADER,
    FRAME_METHOD,
    frame,
    method_frame,
    parse_frame,
    parse_method,
    shortstr,
)


class FakeAmqp:
    def __init__(self):
        self.published = []
        self.auth = None
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        s.listen(1)
        self.port = s.getsockname()[1]
        self._srv = s
        threading.Thread(target=self._serve, daemon=True).start()

    def _serve(self):
        conn, _ = self._srv.accept()
        buf = conn.makefile("rb")
        assert buf.read(8) == b"AMQP\x00\x00\x09\x01"
        conn.sendall(method_frame(0, CONN_START, struct.pack(">BB", 0, 9)
                                  + struct.pack(">I", 0) + struct.pack(">I", 5) + b"PLAIN"
                                  + struct.pack(">I", 5) + b"en_US"))
        pending_body = None
        while True:
            try:
                ftype, channel, payload = parse_frame(buf)
            except Exception:
                return
            if ftype == FRAME_METHOD:
                cm, args = parse_method(payload)
                if cm == CONN_START_OK:
                    # client-properties table (longstr), mechanism shortstr, response longstr
                    off = 4 + struct.unpack_from(">I", args)[0]
                    mlen = args[off]
                    off += 1 + mlen
                    rlen = struct.unpack_from(">I", args, off)[0]
                    self.auth = args[off + 4 : off + 4 + rlen]
                    conn.sendall(method_frame(0, CONN_TUNE, struct.pack(">HIH", 0, 131072, 0)))
                elif cm == CONN_TUNE_OK:
                    pass
                elif cm == CONN_OPEN:
                    conn.sendall(method_frame(0, CONN_OPEN_OK, shortstr("")))
                elif cm == CHAN_OPEN:
                    conn.sendall(method_frame(1, CHAN_OPEN_OK, struct.pack(">I", 0)))
                elif cm == CONFIRM_SELECT:
                    conn.sendall(method_frame(1, CONFIRM_SELECT_OK))
                elif cm == BASIC_PUBLISH:
                    off = 2
                    elen = args[off]; exchange = args[off + 1 : off + 1 + elen].decode()
                    off += 1 + elen
                    rlen = args[off]; rk = args[off + 1 : off + 1 + rlen].decode()
                    pending_body = (exchange, rk)
            elif ftype == FRAME_HEADER:
                pass
            elif ftype == FRAME_BODY and pending_body is not None:
                exchange, rk = pending_body
                self.published.append((exchange, rk, payload.decode()))
                pending_body = None
                conn.sendall(method_frame(1, BASIC_ACK, struct.pack(">QB", len(self.published), 0)))


def test_rabbitmq_publish_with_confirms():
    fake = FakeAmqp()
    sink = create_sink("rabbitmq", {"host": "127.0.0.1", "port": fake.port,
                                    "username": "u1", "password": "p1"})
    sink.open()
    assert fake.auth == b"\x00u1\x00p1"  # PLAIN credentials made it over
    rows = [
        {"routing_key": "sequin.public.orders.insert", "value": '{"n":1}'},
        {"routing_key": "sequin.public.orders.delete", "value": '{"n":2}'},
    ]
    sink.deliver(SinkBatch(routing={"exchange": "cdc"}, rows=rows))
    assert fake.published == [
        ("cdc", "sequin.public.orders.insert", '{"n":1}'),
        ("cdc", "sequin.public.orders.delete", '{"n":2}'),
    ]
    sink.close()


def test_rabbitmq_bad_protocol_header():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    s.listen(1)

    def serve():
        conn, _ = s.accept()
        conn.sendall(frame(FRAME_METHOD, 0, struct.pack(">HH", 99, 99)))

    threading.Thread(target=serve, daemon=True).start()
    sink = create_sink("rabbitmq", {"host": "127.0.0.1", "port": s.getsockname()[1]})
    with pytest.raises(RuntimeError, match="expected"):
        sink.open()
