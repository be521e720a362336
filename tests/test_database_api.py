"""Postgres database resource API (router.ex:160,175-178,
postgres_database_controller.ex / postgres_database_json.ex parity):
CRUD with password obfuscation, test_connection, refresh_tables, and
schema/table introspection over a parquet-directory source."""

import json
import urllib.error
import urllib.request

import pytest

from sequin_spark.plans.config_api import ConfigApiServer
from sequin_spark.plans.database_api import (
    DatabaseRegistry,
    PostgresDatabaseSpec,
    obfuscate,
)


def _req(url, method="GET", body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        url, data=data, method=method,
        headers={"Content-Type": "application/json"} if data else {},
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, json.loads(resp.read() or b"{}")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


@pytest.fixture()
def server():
    srv = ConfigApiServer(databases=DatabaseRegistry()).start()
    yield srv
    srv.stop()


def test_obfuscate_rule():
    # string.ex:21-40 masks by length class
    assert obfuscate("") == ""
    assert obfuscate("abc") == "***"
    assert obfuscate("hunter2") == "h*****2"
    assert obfuscate("correct-horse-battery") == "cor*****************y"


def test_database_crud_and_obfuscation(server, sf_dir):
    base = f"http://127.0.0.1:{server.port}/api/postgres_databases"
    code, db = _req(base, "POST", {
        "name": "testdata", "path": sf_dir, "password": "hunter2",
        "username": "sequin",
    })
    assert code == 201 and db["name"] == "testdata"
    assert db["password"] == "h*****2"  # obfuscated by default

    # index + show (by name and by id), show_sensitive reveals
    code, idx = _req(base)
    assert code == 200 and [d["name"] for d in idx["data"]] == ["testdata"]
    code, shown = _req(f"{base}/testdata")
    assert code == 200 and shown["id"] == db["id"]
    code, shown = _req(f"{base}/{db['id']}?show_sensitive=true")
    assert shown["password"] == "hunter2"

    # update (PATCH merges; unknown fields 422; duplicate names 422)
    code, upd = _req(f"{base}/testdata", "PATCH", {"pool_size": 10})
    assert code == 200 and upd["pool_size"] == 10
    code, err = _req(f"{base}/testdata", "PATCH", {"bogus": 1})
    assert code == 422 and "bogus" in err["error"]
    code, err = _req(base, "POST", {"name": "testdata", "path": sf_dir})
    assert code == 422 and "already taken" in err["error"]

    # delete.json shape (postgres_database_json.ex:15-17)
    code, deleted = _req(f"{base}/testdata", "DELETE")
    assert code == 200 and deleted == {"success": True, "id": db["id"]}
    code, _ = _req(f"{base}/testdata")
    assert code == 404


def test_database_validation(server):
    base = f"http://127.0.0.1:{server.port}/api/postgres_databases"
    code, err = _req(base, "POST", {"name": "x"})
    assert code == 422 and "hostname or path" in err["error"]
    code, err = _req(base, "POST", {"name": "x", "hostname": "h", "port": 0})
    assert code == 422 and "port" in err["error"]


def test_test_connection_and_refresh_tables(server, sf_dir):
    base = f"http://127.0.0.1:{server.port}/api/postgres_databases"
    _req(base, "POST", {"name": "td", "path": sf_dir})
    code, res = _req(f"{base}/td/test_connection", "POST")
    assert (code, res) == (200, {"success": True})
    code, res = _req(f"{base}/td/refresh_tables", "POST")
    assert (code, res) == (200, {"success": True})

    _req(base, "POST", {"name": "bad", "path": "/nonexistent-dir"})
    code, res = _req(f"{base}/bad/test_connection", "POST")
    assert code == 422 and res["success"] is False and "not a directory" in res["reason"]


def test_schema_and_table_introspection(server, sf_dir):
    """Parquet footer introspection → postgres_database_table.ex shape
    (oid, schema, name, columns[attnum, name, type, is_pk?, pg_typtype])."""
    base = f"http://127.0.0.1:{server.port}/api/postgres_databases"
    _req(base, "POST", {"name": "td", "path": sf_dir})

    code, res = _req(f"{base}/td/schemas")
    assert (code, res) == (200, {"schemas": ["public"]})

    code, res = _req(f"{base}/td/schemas/public/tables")
    assert code == 200
    tables = {t["name"]: t for t in res["tables"]}
    # all ten testdata tables surfaced
    assert set(tables) >= {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    orders = tables["orders"]
    assert orders["schema"] == "public" and orders["oid"] >= 16384
    cols = {c["name"]: c for c in orders["columns"]}
    # pg-typed columns, 1-based attnums, PK heuristic hits o_orderkey
    assert cols["o_orderkey"]["type"] == "bigint"
    assert cols["o_orderkey"]["is_pk?"] is True
    assert cols["o_totalprice"]["type"] == "double precision"
    assert cols["o_orderdate"]["type"].startswith("timestamp")
    assert [c["attnum"] for c in orders["columns"]] == list(
        range(1, len(orders["columns"]) + 1)
    )
    emb = tables["embeddings"]
    etypes = {c["name"]: c["type"] for c in emb["columns"]}
    assert any(t.endswith("[]") for t in etypes.values())  # array column

    # oids are stable across refreshes
    code2, res2 = _req(f"{base}/td/schemas/public/tables")
    assert {t["name"]: t["oid"] for t in res2["tables"]} == {
        t["name"]: t["oid"] for t in res["tables"]
    }


def test_explicit_primary_keys_override_heuristic(server, sf_dir):
    base = f"http://127.0.0.1:{server.port}/api/postgres_databases"
    _req(base, "POST", {
        "name": "td", "path": sf_dir,
        "primary_keys": {"lineitem": ["l_orderkey", "l_linenumber"]},
    })
    code, res = _req(f"{base}/td/schemas/public/tables")
    li = next(t for t in res["tables"] if t["name"] == "lineitem")
    pks = [c["name"] for c in li["columns"] if c["is_pk?"]]
    assert pks == ["l_orderkey", "l_linenumber"]


def test_registry_direct_resolution():
    reg = DatabaseRegistry()
    db = reg.create({"name": "a", "hostname": "h"})
    assert reg.resolve("a") is db and reg.resolve(db.id) is db
    assert reg.resolve("nope") is None
    with pytest.raises(KeyError):
        reg.update("nope", {})
    spec = PostgresDatabaseSpec(name="ok", hostname="h")
    assert spec.to_external()["port"] == 5432


def test_unknown_database_404_is_clean(server):
    """GET for a nonexistent database must produce exactly one clean
    404 response.  The _resolve_* helpers return (obj, self._json(404,
    ...)) and callers branch on `if err` — _json returning None made
    err always falsy, so the handler fell through with obj=None and
    crashed the request thread AFTER the 404 hit the wire (socketserver
    tracebacks in the r11 full-suite run).  The fix makes _json return
    a truthy marker; this pins the whole resolve-miss family."""
    for path in ("/api/postgres_databases/nope",
                 "/api/postgres_databases/nope/schemas",
                 "/api/postgres_databases/nope/schemas/public/tables"):
        status, body = _req(f"http://127.0.0.1:{server.port}{path}")
        assert status == 404, path
        assert "no postgres database" in body.get("error", ""), body
    # and a healthy request still works after the misses (the thread
    # pool did not lose workers to crashes)
    status, body = _req(
        f"http://127.0.0.1:{server.port}/api/postgres_databases")
    assert status == 200
