"""GCP Pub/Sub REST + NATS wire-protocol sinks against fake local servers."""

import base64
import http.server
import json
import socket
import threading

import pytest

from sequin_spark.sinks.base import SinkBatch, create_sink

ROWS = [
    {"group_id": "g1", "value": '{"n":1}'},
    {"group_id": "g2", "value": '{"n":2}'},
]


def test_gcp_pubsub_publish():
    received = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            received.append((self.path, self.headers.get("Authorization"), body))
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            ids = [str(i) for i in range(len(body["messages"]))]
            self.wfile.write(json.dumps({"messageIds": ids}).encode())

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        sink = create_sink(
            "gcp_pubsub",
            {"endpoint": f"http://127.0.0.1:{srv.server_address[1]}",
             "project": "p1", "token": "tok"},
        )
        sink.open()
        sink.deliver(SinkBatch(routing={"topic_id": "events"}, rows=ROWS))
        path, auth, body = received[0]
        assert path == "/v1/projects/p1/topics/events:publish"
        assert auth == "Bearer tok"
        msgs = body["messages"]
        assert base64.b64decode(msgs[0]["data"]).decode() == '{"n":1}'
        assert msgs[0]["orderingKey"] == "g1"
    finally:
        srv.shutdown()


class FakeNats:
    """Minimal NATS server: greets with INFO, answers PING with PONG,
    records PUB frames."""

    def __init__(self):
        self.published = []
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        threading.Thread(target=self._serve, daemon=True).start()

    def _serve(self):
        conn, _ = self.sock.accept()
        conn.sendall(b'INFO {"server_id":"fake"}\r\n')
        buf = conn.makefile("rb")
        while True:
            line = buf.readline()
            if not line:
                return
            if line.startswith(b"CONNECT"):
                continue
            if line.startswith(b"PUB"):
                _, subject, nbytes = line.strip().split(b" ")
                payload = buf.read(int(nbytes))
                buf.read(2)  # trailing \r\n
                self.published.append((subject.decode(), payload.decode()))
            elif line.strip() == b"PING":
                conn.sendall(b"PONG\r\n")


def test_nats_publish_wire_protocol():
    fake = FakeNats()
    sink = create_sink("nats", {"host": "127.0.0.1", "port": fake.port})
    sink.open()
    sink.deliver(
        SinkBatch(routing={"subject": "sequin.public.orders.insert"}, rows=ROWS)
    )
    assert fake.published == [
        ("sequin.public.orders.insert", '{"n":1}'),
        ("sequin.public.orders.insert", '{"n":2}'),
    ]
    sink.close()


def test_nats_bad_greeting_fails():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    s.listen(1)

    def serve():
        conn, _ = s.accept()
        conn.sendall(b"NOT-NATS\r\n")

    threading.Thread(target=serve, daemon=True).start()
    sink = create_sink("nats", {"host": "127.0.0.1", "port": s.getsockname()[1]})
    with pytest.raises(RuntimeError, match="unexpected greeting"):
        sink.open()
