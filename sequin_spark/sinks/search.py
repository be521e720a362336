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


def build_meili_edit_body(filter_expr: str, function_expr: str,
                          context: dict | None = None) -> dict:
    """Body for POST /indexes/:index/documents/edit — the function-based
    document update (sinks/meilisearch/client.ex:180-193). ``filter`` and
    ``function`` are required, 1..10_000 chars (routing/consumers/
    meilisearch.ex:27-38); ``context`` attached only when non-empty."""
    for name, val in (("filter", filter_expr), ("function", function_expr)):
        if not val or not isinstance(val, str):
            raise ValueError(f"meilisearch function update requires {name!r}")
        if len(val) > 10_000:
            raise ValueError(f"meilisearch {name} exceeds 10000 chars")
    body = {"filter": filter_expr, "function": function_expr}
    if context:
        body["context"] = context
    return body


class MeilisearchSink(Sink):
    sink_type = "meilisearch"
    default_batch_size = 100

    def _wait_for_task(self, base: str, headers: dict, task_uid: int) -> None:
        """Poll /tasks/:uid until terminal (client.ex wait_for_task) —
        async task acceptance isn't delivery; a failed task must fail the
        batch so retry/backoff semantics hold."""
        import time
        deadline = time.monotonic() + float(self.config.get("task_timeout_s", 15))
        while True:
            req = urllib.request.Request(f"{base}/tasks/{task_uid}", headers=headers)
            with urllib.request.urlopen(req, timeout=15) as resp:
                task = json.loads(resp.read() or b"{}")
            status = task.get("status")
            if status == "succeeded":
                return
            if status in ("failed", "canceled"):
                raise RuntimeError(f"meilisearch task {task_uid} {status}: "
                                   f"{str(task.get('error'))[:200]}")
            if time.monotonic() > deadline:
                raise RuntimeError(f"meilisearch task {task_uid} timed out ({status})")
            time.sleep(0.05)

    def _request(self, base: str, path: str, payload, headers: dict,
                 method: str = "POST") -> None:
        resp = _post(f"{base}{path}", json.dumps(payload).encode(),
                     "application/json", headers, method=method)
        parsed = json.loads(resp or b"{}") if resp else {}
        if isinstance(parsed, dict) and parsed.get("taskUid") is not None:
            self._wait_for_task(base, headers, parsed["taskUid"])

    def deliver(self, batch: SinkBatch) -> None:
        index = batch.routing.get("index_name") or self.config.get("index", "sequin")
        base = self.config["url"].rstrip("/")
        headers = {}
        if self.config.get("api_key"):
            headers["Authorization"] = f"Bearer {self.config['api_key']}"
        upserts, deletes, functions = [], [], []
        for r in batch.rows:
            action = r.get("index_action") or "upsert"
            if action == "function":
                functions.append(r)
            elif action == "delete":
                deletes.append(_doc_id(r))
            else:
                upserts.append(_doc(r))
        if upserts:
            self._request(base, f"/indexes/{index}/documents", upserts,
                          headers, method="PUT")
        if deletes:
            self._request(base, f"/indexes/{index}/documents/delete-batch",
                          deletes, headers)
        # function updates apply per-message, in order (meilisearch_pipeline
        # .ex:120-163 handle_batch {"function", index} maps each message)
        for r in functions:
            ctx = r.get("context")
            if isinstance(ctx, str):
                try:
                    ctx = json.loads(ctx)
                except ValueError:
                    ctx = {"value": ctx}
            body = build_meili_edit_body(r.get("filter"), r.get("function"), ctx)
            self._request(base, f"/indexes/{index}/documents/edit", body, headers)
