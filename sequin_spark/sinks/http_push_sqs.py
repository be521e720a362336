"""Webhook via-SQS buffering — decouple delivery from the stream.

Reference: lib/sequin/runtime/http_push_sqs_pipeline.ex — when
HttpPushSink has ``via_sqs: true`` (consumers/http_push_sink.ex:17-25),
the sink pipeline does NOT push HTTP inline; it enqueues each event to
SQS as ``{"data": base64(serialized event)}`` (http_push_sqs_pipeline
.ex:156-167) and a separate consumer pipeline drains the queue, POSTs
to the endpoint, and after repeated failures moves the message to a
DLQ (main_queue/dlq split, http_push_sqs_pipeline.ex:37-69; backoff
1min→10min, :339-361). The buffer absorbs slow/flaky endpoints without
backpressuring the WAL stream.

Spark mapping: ``HttpPushSqsEnqueueSink`` is what the delivery engine
calls (selected automatically by create_sink for http_push +
via_sqs); ``HttpPushSqsWorker.drain()`` is the queue-consumer side —
on a cluster it runs as its own job, polling with long-poll receives.
The reference serializes events with Erlang binary terms; we use JSON
inside the same base64 envelope (documented deviation, same shape).
"""

from __future__ import annotations

import base64
import json

from sequin_spark.sinks.base import HttpPushSink, Sink, SinkBatch


class HttpPushSqsEnqueueSink(Sink):
    """The stream-side half: base64-wrap each event into the main queue
    (http_push_sqs_pipeline.ex:156-167 envelope)."""

    sink_type = "http_push"  # selected via via_sqs config
    default_batch_size = 10  # SQS SendMessageBatch limit

    def open(self) -> None:
        factory = self.config.get("client_factory")
        if factory is not None:
            self._client = factory()
            return
        import boto3

        self._client = boto3.client("sqs", region_name=self.config.get("region", "us-east-1"))

    def deliver(self, batch: SinkBatch) -> None:
        queue_url = self.config["sqs_queue_url"]
        # SendMessageBatch accepts at most 10 entries; a consumer configured
        # with a larger batch_size must not lose rows 11+ (at-least-once).
        for start in range(0, len(batch.rows), 10):
            entries = []
            for i, row in enumerate(batch.rows[start : start + 10]):
                envelope = json.dumps(
                    {"data": base64.b64encode(json.dumps(row).encode()).decode()}
                )
                entries.append({"Id": str(start + i), "MessageBody": envelope})
            resp = self._client.send_message_batch(QueueUrl=queue_url, Entries=entries)
            if resp.get("Failed"):
                raise RuntimeError(f"sqs partial failure: {resp['Failed']}")


class HttpPushSqsWorker:
    """The queue-consumer half (http_push_sqs_pipeline.ex handle_message):
    receive → decode base64 envelope → POST to the endpoint → delete on
    success; after ``max_receive_count`` failed receives the message
    moves to the DLQ (and is deleted from the main queue)."""

    def __init__(
        self,
        sqs_client,
        queue_url: str,
        dlq_url: str | None = None,
        http_config: dict | None = None,
        max_receive_count: int = 3,
    ):
        self.client = sqs_client
        self.queue_url = queue_url
        self.dlq_url = dlq_url
        self.http = HttpPushSink(http_config or {})
        self.max_receive_count = max_receive_count

    def drain(self, max_batches: int = 100, wait_seconds: int = 0) -> dict:
        """Poll until the queue is empty (or max_batches); returns
        counters {delivered, failed, dead_lettered}."""
        stats = {"delivered": 0, "failed": 0, "dead_lettered": 0}
        for _ in range(max_batches):
            resp = self.client.receive_message(
                QueueUrl=self.queue_url,
                MaxNumberOfMessages=10,
                WaitTimeSeconds=wait_seconds,
                AttributeNames=["ApproximateReceiveCount"],
            )
            messages = resp.get("Messages", [])
            if not messages:
                break
            for msg in messages:
                envelope = json.loads(msg["Body"])
                row = json.loads(base64.b64decode(envelope["data"]))
                try:
                    self.http.deliver(SinkBatch(routing=row.get("routing") or {}, rows=[row]))
                except Exception:  # noqa: BLE001 - endpoint failure
                    receives = int(
                        (msg.get("Attributes") or {}).get("ApproximateReceiveCount", 1)
                    )
                    if self.dlq_url and receives >= self.max_receive_count:
                        self.client.send_message(QueueUrl=self.dlq_url, Body=msg["Body"])
                        self.client.delete_message(
                            QueueUrl=self.queue_url, ReceiptHandle=msg["ReceiptHandle"]
                        )
                        stats["dead_lettered"] += 1
                    else:
                        stats["failed"] += 1  # visibility timeout → redelivery
                    continue
                self.client.delete_message(
                    QueueUrl=self.queue_url, ReceiptHandle=msg["ReceiptHandle"]
                )
                stats["delivered"] += 1
        return stats
