"""S2 and Azure Event Hub sinks against fake HTTP servers + SAS token math."""

import http.server
import json
import threading
import urllib.parse

import pytest

from sequin_spark.sinks.base import SinkBatch, create_sink
from sequin_spark.sinks.s2_azure import azure_sas_token

ROWS = [
    {"group_id": "g1", "value": '{"n":1}'},
    {"group_id": "g2", "value": '{"n":2}'},
]


@pytest.fixture()
def server():
    received = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers.get("Content-Length") or 0))
            received.append((self.path, dict(self.headers), body.decode()))
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"{}")

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", received
    srv.shutdown()


def test_s2_append(server):
    url, received = server
    sink = create_sink("s2", {"endpoint": url, "token": "tok", "stream": "events"})
    sink.open()
    sink.deliver(SinkBatch(routing={}, rows=ROWS))
    path, headers, body = received[0]
    assert path == "/v1/streams/events/records"
    assert headers["Authorization"] == "Bearer tok"
    recs = json.loads(body)["records"]
    assert recs[0]["body"] == '{"n":1}' and recs[0]["headers"] == [["group", "g1"]]


def test_azure_event_hub_publish(server):
    url, received = server
    sink = create_sink(
        "azure_event_hub",
        {"endpoint": url, "event_hub_name": "hub1", "sas_key": "secret", "sas_key_name": "kn"},
    )
    sink.open()
    sink.deliver(SinkBatch(routing={}, rows=ROWS))
    path, headers, body = received[0]
    assert path == "/hub1/messages"
    assert headers["Authorization"].startswith("SharedAccessSignature sr=")
    assert "skn=kn" in headers["Authorization"]
    msgs = json.loads(body)
    assert msgs[0]["Body"] == '{"n":1}'
    assert msgs[0]["BrokerProperties"]["PartitionKey"] == "g1"


def test_azure_sas_token_deterministic():
    tok = azure_sas_token("https://ns.servicebus.windows.net/hub/messages",
                          "kn", "secret", ttl_s=100, now=1_700_000_000)
    parts = dict(p.split("=", 1) for p in tok.removeprefix("SharedAccessSignature ").split("&"))
    assert parts["se"] == "1700000100" and parts["skn"] == "kn"
    assert urllib.parse.unquote_plus(parts["sr"]) == "https://ns.servicebus.windows.net/hub/messages"
    # reproducible HMAC
    assert tok == azure_sas_token("https://ns.servicebus.windows.net/hub/messages",
                                  "kn", "secret", ttl_s=100, now=1_700_000_000)
