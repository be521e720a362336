"""Webhook via-SQS buffering (http_push_sqs_pipeline.ex parity):
enqueue envelopes, drain-and-POST worker, DLQ after max receives."""

import base64
import http.server
import json
import threading
import uuid

import pytest

from sequin_spark.sinks.base import SinkBatch, create_sink
from sequin_spark.sinks.http_push_sqs import HttpPushSqsWorker


class FakeSqs:
    """In-memory SQS: visibility is modeled by receive bumping
    ApproximateReceiveCount; undeleted messages stay receivable."""

    def __init__(self):
        self.queues: dict[str, list[dict]] = {}

    def _q(self, url):
        return self.queues.setdefault(url, [])

    def send_message(self, QueueUrl, Body):  # noqa: N803
        self._q(QueueUrl).append({"Body": Body, "receives": 0})

    def send_message_batch(self, QueueUrl, Entries):  # noqa: N803
        for e in Entries:
            self.send_message(QueueUrl, e["MessageBody"])
        return {"Successful": [{"Id": e["Id"]} for e in Entries], "Failed": []}

    def receive_message(self, QueueUrl, MaxNumberOfMessages=10, **_kw):  # noqa: N803
        out = []
        for m in self._q(QueueUrl)[:MaxNumberOfMessages]:
            m["receives"] += 1
            m["handle"] = uuid.uuid4().hex
            out.append({
                "Body": m["Body"],
                "ReceiptHandle": m["handle"],
                "Attributes": {"ApproximateReceiveCount": str(m["receives"])},
            })
        return {"Messages": out}

    def delete_message(self, QueueUrl, ReceiptHandle):  # noqa: N803
        self.queues[QueueUrl] = [
            m for m in self._q(QueueUrl) if m.get("handle") != ReceiptHandle
        ]


class _Capture(http.server.BaseHTTPRequestHandler):
    received: list = []
    fail_paths: set = set()

    def do_POST(self):  # noqa: N802
        body = self.rfile.read(int(self.headers["Content-Length"]))
        if self.path in _Capture.fail_paths:
            self.send_response(503)
            self.end_headers()
            return
        _Capture.received.append(json.loads(body))
        self.send_response(200)
        self.end_headers()

    def log_message(self, *args):
        pass


@pytest.fixture()
def http_server():
    _Capture.received = []
    _Capture.fail_paths = set()
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Capture)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv
    srv.shutdown()


def test_via_sqs_enqueue_envelope():
    sqs = FakeSqs()
    sink = create_sink(
        "http_push",
        {"via_sqs": True, "sqs_queue_url": "q://main", "client_factory": lambda: sqs},
    )
    sink.open()
    rows = [{"key": "k1", "value": json.dumps({"n": 1})}]
    sink.deliver(SinkBatch(routing={}, rows=rows))
    (msg,) = sqs.queues["q://main"]
    envelope = json.loads(msg["Body"])
    assert json.loads(base64.b64decode(envelope["data"])) == rows[0]


def test_via_sqs_enqueue_chunks_beyond_sqs_batch_limit():
    """batch_size > 10 must not silently drop rows 11+ (at-least-once):
    the sink loops SendMessageBatch calls of ≤10 entries each."""
    sqs = FakeSqs()
    sink = create_sink(
        "http_push",
        {"via_sqs": True, "sqs_queue_url": "q://main", "client_factory": lambda: sqs},
    )
    sink.open()
    rows = [{"key": f"k{i}", "value": json.dumps({"n": i})} for i in range(27)]
    sink.deliver(SinkBatch(routing={}, rows=rows))
    bodies = [
        json.loads(base64.b64decode(json.loads(m["Body"])["data"]))
        for m in sqs.queues["q://main"]
    ]
    assert bodies == rows  # all 27, in order


def test_worker_drains_to_endpoint(http_server):
    port = http_server.server_address[1]
    sqs = FakeSqs()
    sink = create_sink(
        "http_push",
        {"via_sqs": True, "sqs_queue_url": "q://main", "client_factory": lambda: sqs},
    )
    sink.open()
    rows = [{"key": f"k{i}", "value": json.dumps({"n": i})} for i in range(5)]
    sink.deliver(SinkBatch(routing={}, rows=rows))
    worker = HttpPushSqsWorker(
        sqs, "q://main", http_config={"url": f"http://127.0.0.1:{port}", "max_retries": 0}
    )
    stats = worker.drain()
    assert stats == {"delivered": 5, "failed": 0, "dead_lettered": 0}
    assert sqs.queues["q://main"] == []  # deleted after success
    assert sorted(m["n"] for m in _Capture.received) == [0, 1, 2, 3, 4]


def test_worker_dead_letters_after_max_receives(http_server):
    port = http_server.server_address[1]
    _Capture.fail_paths = {"/"}
    sqs = FakeSqs()
    sink = create_sink(
        "http_push",
        {"via_sqs": True, "sqs_queue_url": "q://main", "client_factory": lambda: sqs},
    )
    sink.open()
    sink.deliver(SinkBatch(routing={}, rows=[{"key": "k", "value": "{}"}]))
    worker = HttpPushSqsWorker(
        sqs, "q://main", dlq_url="q://dlq",
        http_config={"url": f"http://127.0.0.1:{port}", "max_retries": 0},
        max_receive_count=3,
    )
    # first two drains fail but keep the message in the main queue
    assert worker.drain(max_batches=1)["failed"] == 1
    assert worker.drain(max_batches=1)["failed"] == 1
    # third receive hits max_receive_count → DLQ
    stats = worker.drain(max_batches=1)
    assert stats["dead_lettered"] == 1
    assert sqs.queues["q://main"] == []
    assert len(sqs.queues["q://dlq"]) == 1
    # endpoint recovers: DLQ can be drained by a worker pointed at it
    _Capture.fail_paths = set()
    dlq_worker = HttpPushSqsWorker(
        sqs, "q://dlq", http_config={"url": f"http://127.0.0.1:{port}", "max_retries": 0}
    )
    assert dlq_worker.drain()["delivered"] == 1
    assert sqs.queues["q://dlq"] == []
