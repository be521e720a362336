"""Search/Redis/Postgres sink delivery tests (per-sink pipeline test
analog — elasticsearch/typesense/meilisearch against a live capture
HTTP server; redis/postgres via their pure payload builders)."""

import http.server
import json
import threading

import pytest

from sequin_spark.sinks.base import SinkBatch, create_sink
from sequin_spark.sinks.postgres import build_wal_insert_sql, wal_event_row
from sequin_spark.sinks.redis import build_stream_commands, build_string_commands
from sequin_spark.sinks.search import build_es_bulk


class _Capture(http.server.BaseHTTPRequestHandler):
    requests: list = []

    def _handle(self):
        ln = int(self.headers.get("Content-Length") or 0)
        body = self.rfile.read(ln).decode() if ln else ""
        _Capture.requests.append((self.command, self.path, body))
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(b'{"errors": false}')

    do_POST = do_PUT = do_DELETE = _handle

    def log_message(self, *a):
        pass


@pytest.fixture()
def server():
    _Capture.requests = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Capture)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


ROWS = [
    {"group_id": "1", "key": "1", "value": '{"id": "1", "name": "ada"}', "index_action": "index"},
    {"group_id": "2", "key": "2", "value": '{"id": "2", "name": "grace"}', "index_action": "delete"},
]


def test_elasticsearch_bulk(server):
    sink = create_sink("elasticsearch", {"url": server})
    sink.open()
    sink.deliver(SinkBatch(routing={"index_name": "chars"}, rows=ROWS))
    method, path, body = _Capture.requests[0]
    assert (method, path) == ("POST", "/_bulk")
    lines = [json.loads(l) for l in body.strip().splitlines()]
    assert lines[0] == {"index": {"_index": "chars", "_id": "1"}}
    assert lines[1]["name"] == "ada"
    assert lines[2] == {"delete": {"_index": "chars", "_id": "2"}}


def test_typesense_import_and_delete(server):
    sink = create_sink("typesense", {"url": server, "api_key": "k"})
    sink.open()
    sink.deliver(
        SinkBatch(routing={"collection": "chars", "index_action": None}, rows=[
            {**ROWS[0], "index_action": "upsert"},
            {**ROWS[1], "index_action": "delete"},
        ])
    )
    methods = [(m, p) for m, p, _ in _Capture.requests]
    assert ("POST", "/collections/chars/documents/import?action=upsert") in methods
    assert ("DELETE", "/collections/chars/documents/2") in methods


def test_meilisearch_put_and_delete_batch(server):
    sink = create_sink("meilisearch", {"url": server})
    sink.open()
    sink.deliver(SinkBatch(routing={"index_name": "chars"}, rows=[
        {**ROWS[0], "index_action": "upsert"},
        {**ROWS[1], "index_action": "delete"},
    ]))
    methods = [(m, p) for m, p, _ in _Capture.requests]
    assert ("PUT", "/indexes/chars/documents") in methods
    assert ("POST", "/indexes/chars/documents/delete-batch") in methods


def test_redis_command_builders():
    cmds = build_string_commands([
        {"key": "sequin:t:1", "value": "{}", "redis_action": "set", "expire_ms": 500},
        {"key": "sequin:t:2", "redis_action": "del"},
    ])
    assert cmds == [("SET", "sequin:t:1", "{}", "PX", 500), ("DEL", "sequin:t:2")]
    xcmds = build_stream_commands([{"stream_key": "s", "value": "v"}])
    assert xcmds == [("XADD", "s", "*", "data", "v")]
    # client library absent → loud failure at open()
    with pytest.raises(NotImplementedError, match="redis-py"):
        create_sink("redis_string", {}).open()


def test_wal_insert_sql_builder():
    row = wal_event_row(
        {"commit_lsn": 77, "group_id": "5", "committed_at": "2024-01-01 00:00:00",
         "value": json.dumps({"action": "update", "record": {"id": 5},
                              "changes": {"id": 4},
                              "metadata": {"table_schema": "public", "table_name": "t"}})},
        source_database_id="db-1",
    )
    sql = build_wal_insert_sql("wal_events", [row])
    assert sql.startswith("INSERT INTO wal_events (seq, source_database_id")
    assert "ON CONFLICT (source_database_id, committed_at, seq, record_pk) DO NOTHING" in sql
    assert "'{\"id\": 5}'" in sql and "77" in sql
    # SQL-injection guard: quotes escaped
    evil = wal_event_row({"commit_lsn": 1, "group_id": "x'); DROP TABLE wal_events;--",
                          "value": "{}", "committed_at": None})
    assert "DROP TABLE" in build_wal_insert_sql("w", [evil])  # present but inert:
    assert "'x''); DROP TABLE wal_events;--'" in build_wal_insert_sql("w", [evil])
    with pytest.raises(NotImplementedError, match="psycopg2"):
        create_sink("postgres", {"dsn": "x"}).open()
