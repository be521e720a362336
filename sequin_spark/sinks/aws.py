"""AWS sinks: SNS and Kinesis (SQS lives in base.py).

Reference delivery semantics:
- sns: PublishBatch ≤10, FIFO group/dedup ids (sns_pipeline.ex);
- kinesis: PutRecords with partition key = group_id (kinesis_pipeline.ex).

Clients are boto3 (present in this environment); tests exercise the
request shape with botocore's Stubber, so delivery is verified without
AWS. ``client_factory`` in config lets tests (and alternative endpoints
like localstack) inject a prepared client.
"""

from __future__ import annotations

from sequin_spark.sinks.base import Sink, SinkBatch, register_sink


class SnsSink(Sink):
    sink_type = "sns"
    default_batch_size = 10

    def open(self) -> None:
        factory = self.config.get("client_factory")
        if factory is not None:
            self._client = factory()
        else:
            import boto3

            self._client = boto3.client("sns", region_name=self.config.get("region", "us-east-1"))

    def deliver(self, batch: SinkBatch) -> None:
        entries = []
        for i, row in enumerate(batch.rows[:10]):
            e = {"Id": str(i), "Message": row["value"]}
            if self.config.get("is_fifo"):
                e["MessageGroupId"] = row.get("group_id") or "default"
                e["MessageDeduplicationId"] = row.get("idempotency_key") or str(i)
            entries.append(e)
        resp = self._client.publish_batch(
            TopicArn=batch.routing.get("topic_arn") or self.config["topic_arn"],
            PublishBatchRequestEntries=entries,
        )
        if resp.get("Failed"):
            raise RuntimeError(f"sns partial failure: {resp['Failed']}")


class KinesisSink(Sink):
    sink_type = "kinesis"
    default_batch_size = 100

    def open(self) -> None:
        factory = self.config.get("client_factory")
        if factory is not None:
            self._client = factory()
        else:
            import boto3

            self._client = boto3.client("kinesis", region_name=self.config.get("region", "us-east-1"))

    def deliver(self, batch: SinkBatch) -> None:
        records = [
            {
                "Data": row["value"].encode() if isinstance(row["value"], str) else row["value"],
                "PartitionKey": row.get("partition_key") or row.get("group_id") or "default",
            }
            for row in batch.rows
        ]
        resp = self._client.put_records(
            StreamARN=batch.routing.get("stream_arn") or self.config["stream_arn"],
            Records=records,
        )
        if resp.get("FailedRecordCount", 0) > 0:
            raise RuntimeError(f"kinesis failed records: {resp['FailedRecordCount']}")


register_sink("sns", SnsSink)
register_sink("kinesis", KinesisSink)
