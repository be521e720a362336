"""Search-index sinks: Elasticsearch, Typesense, Meilisearch.

Reference delivery semantics:
- elasticsearch: ``_bulk`` with index/delete actions keyed by record_pks
  (elasticsearch_pipeline.ex, sinks/elasticsearch/client.ex);
- typesense: documents import with action upsert / per-id delete
  (typesense_pipeline.ex);
- meilisearch: documents add / delete-batch (meilisearch_pipeline.ex).

All three speak plain REST — implemented over urllib (no client
libraries needed), so they run for real against any endpoint; tests
drive them against a local capture server. Payload builders are pure
functions (unit-testable without any server).
"""

from __future__ import annotations

import json
import urllib.request

from sequin_spark.sinks.base import Sink, SinkBatch


def _doc_id(row: dict) -> str:
    # document identity = joined record PKs (elasticsearch_pipeline.ex)
    return str(row.get("group_id") or row.get("key") or "")


def _doc(row: dict) -> dict:
    val = row.get("value")
    try:
        parsed = json.loads(val) if isinstance(val, str) else val
    except (TypeError, ValueError):
        parsed = {"value": val}
    if isinstance(parsed, dict):
        parsed.setdefault("id", _doc_id(row))
        return parsed
    return {"id": _doc_id(row), "value": parsed}


def build_es_bulk(index: str, rows: list[dict]) -> str:
    """NDJSON ``_bulk`` body: delete action for CDC deletes, index for
    the rest (upsert semantics — last write wins by _id)."""
    lines = []
    for row in rows:
        action = row.get("index_action") or ("delete" if row.get("redis_action") == "del" else "index")
        if action == "delete":
            lines.append(json.dumps({"delete": {"_index": index, "_id": _doc_id(row)}}))
        else:
            lines.append(json.dumps({"index": {"_index": index, "_id": _doc_id(row)}}))
            lines.append(json.dumps(_doc(row)))
    return "\n".join(lines) + "\n"


def _post(url: str, body: bytes, content_type: str, headers: dict | None = None, method: str = "POST"):
    req = urllib.request.Request(
        url, data=body, method=method,
        headers={"Content-Type": content_type, **(headers or {})},
    )
    with urllib.request.urlopen(req, timeout=15) as resp:
        if not (200 <= resp.status < 300):
            raise RuntimeError(f"{url} → http {resp.status}")
        return resp.read()


class ElasticsearchSink(Sink):
    sink_type = "elasticsearch"
    default_batch_size = 100

    def deliver(self, batch: SinkBatch) -> None:
        index = batch.routing.get("index_name") or self.config.get("index", "sequin")
        body = build_es_bulk(index, batch.rows)
        headers = {}
        if self.config.get("api_key"):
            headers["Authorization"] = f"ApiKey {self.config['api_key']}"
        resp = _post(
            self.config["url"].rstrip("/") + "/_bulk",
            body.encode(), "application/x-ndjson", headers,
        )
        parsed = json.loads(resp or b"{}")
        if parsed.get("errors"):
            raise RuntimeError(f"elasticsearch bulk errors: {str(parsed)[:300]}")


class TypesenseSink(Sink):
    sink_type = "typesense"
    default_batch_size = 40

    def deliver(self, batch: SinkBatch) -> None:
        coll = batch.routing.get("collection") or self.config.get("collection", "sequin")
        base = self.config["url"].rstrip("/")
        headers = {}
        if self.config.get("api_key"):
            headers["X-TYPESENSE-API-KEY"] = self.config["api_key"]
        upserts = [r for r in batch.rows if (r.get("index_action") or "upsert") != "delete"]
        deletes = [r for r in batch.rows if (r.get("index_action") or "upsert") == "delete"]
        if upserts:
            body = "\n".join(json.dumps(_doc(r)) for r in upserts) + "\n"
            _post(
                f"{base}/collections/{coll}/documents/import?action=upsert",
                body.encode(), "text/plain", headers,
            )
        for r in deletes:
            _post(
                f"{base}/collections/{coll}/documents/{_doc_id(r)}",
                b"", "application/json", headers, method="DELETE",
            )


class MeilisearchSink(Sink):
    sink_type = "meilisearch"
    default_batch_size = 100

    def deliver(self, batch: SinkBatch) -> None:
        index = batch.routing.get("index_name") or self.config.get("index", "sequin")
        base = self.config["url"].rstrip("/")
        headers = {}
        if self.config.get("api_key"):
            headers["Authorization"] = f"Bearer {self.config['api_key']}"
        upserts = [_doc(r) for r in batch.rows if (r.get("index_action") or "upsert") != "delete"]
        deletes = [_doc_id(r) for r in batch.rows if (r.get("index_action") or "upsert") == "delete"]
        if upserts:
            _post(f"{base}/indexes/{index}/documents", json.dumps(upserts).encode(),
                  "application/json", headers, method="PUT")
        if deletes:
            _post(f"{base}/indexes/{index}/documents/delete-batch",
                  json.dumps(deletes).encode(), "application/json", headers)
