"""GCP Pub/Sub (REST) and NATS (wire protocol) sinks.

Reference delivery semantics:
- gcp_pubsub: publish to topic with ordering_key support
  (gcp_pubsub_pipeline.ex) — the REST surface is
  ``POST /v1/projects/{p}/topics/{t}:publish`` with base64 data;
- nats: publish to a routed subject (nats_pipeline.ex) — the NATS text
  protocol is ``PUB <subject> <#bytes>\\r\\n<payload>\\r\\n`` over TCP.

Both implemented with the standard library (urllib / socket), so they
run against real endpoints; tests use local fake servers. Auth: Pub/Sub
takes a bearer token in config (production would refresh via service
account); NATS supports the no-auth/default deployment.
"""

from __future__ import annotations

import base64
import json
import socket
import urllib.request

from sequin_spark.sinks.base import Sink, SinkBatch, register_sink


class GcpPubsubSink(Sink):
    sink_type = "gcp_pubsub"
    default_batch_size = 10
    # pub/sub's 10 MB publish limit at 90% headroom
    # (gcp_pubsub_pipeline.ex:20,28)
    default_batch_bytes = int(10 * 1024 * 1024 * 0.9)

    def deliver(self, batch: SinkBatch) -> None:
        topic_id = batch.routing.get("topic_id") or self.config["topic_id"]
        project = self.config.get("project", "local")
        base = self.config.get("endpoint", "https://pubsub.googleapis.com").rstrip("/")
        messages = []
        for row in batch.rows:
            msg = {"data": base64.b64encode((row.get("value") or "").encode()).decode()}
            if row.get("group_id"):
                msg["orderingKey"] = row["group_id"]
            messages.append(msg)
        body = json.dumps({"messages": messages}).encode()
        headers = {"Content-Type": "application/json"}
        if self.config.get("token"):
            headers["Authorization"] = f"Bearer {self.config['token']}"
        req = urllib.request.Request(
            f"{base}/v1/projects/{project}/topics/{topic_id}:publish",
            data=body, headers=headers, method="POST",
        )
        with urllib.request.urlopen(req, timeout=15) as resp:
            if not (200 <= resp.status < 300):
                raise RuntimeError(f"pubsub http {resp.status}")
            parsed = json.loads(resp.read() or b"{}")
            if len(parsed.get("messageIds", [])) != len(messages):
                raise RuntimeError(f"pubsub acked {parsed.get('messageIds')} of {len(messages)}")


class NatsSink(Sink):
    """NATS core publish over the text wire protocol (no client library
    needed): INFO ← , CONNECT →, then PUB per message, flush with PING/PONG
    so delivery is confirmed server-side before acking."""

    sink_type = "nats"
    default_batch_size = 10

    def open(self) -> None:
        host = self.config.get("host", "127.0.0.1")
        port = int(self.config.get("port", 4222))
        self._sock = socket.create_connection((host, port), timeout=10)
        self._buf = self._sock.makefile("rb")
        info = self._buf.readline()  # INFO {...}
        if not info.startswith(b"INFO"):
            raise RuntimeError(f"nats: unexpected greeting {info[:40]!r}")
        self._sock.sendall(b'CONNECT {"verbose":false,"pedantic":false}\r\n')

    def deliver(self, batch: SinkBatch) -> None:
        out = bytearray()
        for row in batch.rows:
            subject = row.get("subject") or batch.routing.get("subject") or "sequin"
            payload = (row.get("value") or "").encode()
            out += f"PUB {subject} {len(payload)}\r\n".encode() + payload + b"\r\n"
        out += b"PING\r\n"
        self._sock.sendall(bytes(out))
        # read until PONG — confirms the server consumed our publishes
        while True:
            line = self._buf.readline()
            if not line:
                raise RuntimeError("nats: connection closed before PONG")
            if line.strip() == b"PONG":
                return
            if line.startswith(b"-ERR"):
                raise RuntimeError(f"nats error: {line.decode(errors='replace').strip()}")

    def close(self) -> None:
        try:
            self._sock.close()
        except Exception:  # noqa: BLE001
            pass


register_sink("gcp_pubsub", GcpPubsubSink)
register_sink("nats", NatsSink)
