"""S2 stream sink and Azure Event Hubs sink (REST transports).

Reference delivery semantics:
- s2: append a batch of records to an S2 stream (s2_pipeline.ex) —
  public REST surface ``POST /v1/streams/{stream}/records`` with a
  bearer token;
- azure_event_hub: batched publish (azure_event_hub_pipeline.ex) —
  public REST surface ``POST https://{ns}.servicebus.windows.net/{hub}/
  messages`` with a SharedAccessSignature (HMAC-SHA256 over the
  URL-encoded resource URI — computable with the stdlib).

Both run against real endpoints; tests use local fake servers.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time
import urllib.parse
import urllib.request

from sequin_spark.sinks.base import Sink, SinkBatch, register_sink


def _post(url: str, body: bytes, headers: dict) -> bytes:
    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    with urllib.request.urlopen(req, timeout=15) as resp:
        if not (200 <= resp.status < 300):
            raise RuntimeError(f"{url} → http {resp.status}")
        return resp.read()


class S2Sink(Sink):
    sink_type = "s2"
    default_batch_size = 10

    def deliver(self, batch: SinkBatch) -> None:
        stream = batch.routing.get("stream") or self.config["stream"]
        base = self.config.get("endpoint", "https://aws.s2.dev").rstrip("/")
        records = [
            {"body": row.get("value") or "", **({"headers": [["group", row["group_id"]]]} if row.get("group_id") else {})}
            for row in batch.rows
        ]
        headers = {"Content-Type": "application/json"}
        if self.config.get("token"):
            headers["Authorization"] = f"Bearer {self.config['token']}"
        _post(f"{base}/v1/streams/{stream}/records", json.dumps({"records": records}).encode(), headers)


def azure_sas_token(resource_uri: str, key_name: str, key: str, ttl_s: int = 3600, now: float | None = None) -> str:
    """SharedAccessSignature per the public Event Hubs auth scheme:
    HMAC-SHA256(key, url-encoded-uri + '\\n' + expiry)."""
    expiry = int((now if now is not None else time.time()) + ttl_s)
    encoded = urllib.parse.quote_plus(resource_uri)
    to_sign = f"{encoded}\n{expiry}".encode()
    sig = base64.b64encode(hmac.new(key.encode(), to_sign, hashlib.sha256).digest()).decode()
    return (
        f"SharedAccessSignature sr={encoded}&sig={urllib.parse.quote_plus(sig)}"
        f"&se={expiry}&skn={key_name}"
    )


class AzureEventHubSink(Sink):
    sink_type = "azure_event_hub"
    default_batch_size = 10

    def deliver(self, batch: SinkBatch) -> None:
        hub = batch.routing.get("event_hub_name") or self.config["event_hub_name"]
        base = self.config.get(
            "endpoint", f"https://{self.config.get('namespace', 'ns')}.servicebus.windows.net"
        ).rstrip("/")
        url = f"{base}/{hub}/messages"
        # vnd.microsoft.servicebus.json: batch of {Body, BrokerProperties}
        payload = json.dumps(
            [
                {
                    "Body": row.get("value") or "",
                    "BrokerProperties": {"PartitionKey": row.get("group_id") or "default"},
                }
                for row in batch.rows
            ]
        ).encode()
        headers = {"Content-Type": "application/vnd.microsoft.servicebus.json"}
        if self.config.get("sas_key"):
            headers["Authorization"] = azure_sas_token(
                url, self.config.get("sas_key_name", "RootManageSharedAccessKey"),
                self.config["sas_key"],
            )
        _post(url, payload, headers)


register_sink("s2", S2Sink)
register_sink("azure_event_hub", AzureEventHubSink)
