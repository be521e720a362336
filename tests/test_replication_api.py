"""Postgres replication-slot resources, local-tunnel index, /health and
/api/info (router.ex:48-49,149-153,164-165;
postgres_replication_controller.ex, local_tunnel_controller.ex,
health_check_controller.ex, info_controller.ex parity)."""

import json
import urllib.error
import urllib.request

import pytest

from sequin_spark.plans.config_api import ConfigApiServer, ConfigRegistry
from sequin_spark.plans.endpoints_api import HttpEndpointRegistry
from sequin_spark.plans.replication_api import (
    PostgresReplicationSpec,
    ReplicationRegistry,
    local_tunnels,
)


def _req(base, path, method="GET", body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        base + path, data=data, method=method,
        headers={"Content-Type": "application/json"} if body is not None else {},
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        return resp.status, json.loads(resp.read())


@pytest.fixture()
def api():
    endpoints = HttpEndpointRegistry()
    server = ConfigApiServer(
        ConfigRegistry(),
        replications=ReplicationRegistry(),
        endpoints=endpoints,
    ).start()
    server._endpoints_fixture = endpoints
    yield server
    server.stop()


def _base(api):
    return f"http://127.0.0.1:{api.port}"


def test_replication_crud(api):
    base = _base(api)
    # create (validate_required publication_name + slot_name)
    status, slot = _req(base, "/api/postgres_replications", "POST", {
        "publication_name": "sequin_pub", "slot_name": "sequin_slot",
        "postgres_database_id": "db-1",
    })
    assert status == 200 and slot["status"] == "active"
    slot_id = slot["id"]
    # index
    _, body = _req(base, "/api/postgres_replications")
    assert [s["id"] for s in body["data"]] == [slot_id]
    # show renders show_with_info.json: {postgres_replication, info}
    _, body = _req(base, f"/api/postgres_replications/{slot_id}")
    assert body["postgres_replication"]["slot_name"] == "sequin_slot"
    assert set(body["info"]) == {"last_committed_at", "total_ingested_messages"}
    # update; postgres_database_id is immutable (parse_update_params)
    _, body = _req(base, f"/api/postgres_replications/{slot_id}", "PATCH",
                   {"status": "disabled"})
    assert body["status"] == "disabled"
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, f"/api/postgres_replications/{slot_id}", "PATCH",
             {"postgres_database_id": "db-2"})
    assert e.value.code == 422
    assert "not allowed" in json.loads(e.value.read())["error"]
    # unique (slot_name, postgres_database_id)
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "/api/postgres_replications", "POST", {
            "publication_name": "p2", "slot_name": "sequin_slot",
            "postgres_database_id": "db-1",
        })
    assert e.value.code == 422
    # delete → {id, deleted: true}
    _, body = _req(base, f"/api/postgres_replications/{slot_id}", "DELETE")
    assert body == {"id": slot_id, "deleted": True}
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, f"/api/postgres_replications/{slot_id}")
    assert e.value.code == 404


def test_replication_validation():
    reg = ReplicationRegistry()
    for bad in (
        {"slot_name": "s"},                          # missing publication
        {"publication_name": "p"},                   # missing slot
        {"publication_name": "p", "slot_name": "s", "status": "nope"},
        {"publication_name": "p", "slot_name": "s", "partition_count": 0},
        {"publication_name": "p", "slot_name": "s", "bogus": 1},
    ):
        with pytest.raises(ValueError):
            reg.create(bad)


def test_rejected_patch_leaves_spec_intact():
    """A 422 PATCH must not corrupt the stored resource: merge happens
    on a copy, committed only after validate + uniqueness pass."""
    reg = ReplicationRegistry()
    a = reg.create({"publication_name": "p", "slot_name": "a",
                    "postgres_database_id": "db-1"})
    reg.create({"publication_name": "p", "slot_name": "b",
                "postgres_database_id": "db-1"})
    # invalid status rejected, stored values untouched
    with pytest.raises(ValueError):
        reg.update(a.id, {"status": "nope", "publication_name": "other"})
    cur = reg.resolve(a.id)
    assert (cur.status, cur.publication_name) == ("active", "p")
    # duplicate (slot_name, db) rejected, slot_name untouched
    with pytest.raises(ValueError):
        reg.update(a.id, {"slot_name": "b"})
    assert reg.resolve(a.id).slot_name == "a"
    # a subsequent valid update still works
    assert reg.update(a.id, {"status": "disabled"}).status == "disabled"


def test_tunnel_ports_content_hashed():
    """Non-UUID entity ids get ports from a content hash (stable across
    processes), not builtin hash() (PYTHONHASHSEED-dependent)."""

    class _EP:
        id, name, local = "ep-name-1", "ep", True

    class _Reg:
        def list(self):
            return [_EP()]

    out = local_tunnels(endpoints=_Reg())
    assert out[0]["bastion_port"] == 49152 + int(
        __import__("hashlib").md5(b"ep-name-1").hexdigest(), 16) % 16384


def test_replication_info_provider():
    reg = ReplicationRegistry(
        info_provider=lambda s: {"last_committed_at": "2026-01-01T00:00:00Z",
                                 "total_ingested_messages": 42})
    slot = reg.create({"publication_name": "p", "slot_name": "s"})
    assert reg.info_for(slot)["total_ingested_messages"] == 42


def test_local_tunnels_index(api):
    base = _base(api)
    # no tunnel-enabled entities → empty
    _, body = _req(base, "/api/local_tunnels")
    assert body == {"data": []}
    # a local (tunnel) endpoint appears with a stable bastion port
    api._endpoints_fixture.create({"name": "dev-hook", "local": True,
                                   "path": "/hook"})
    _, body = _req(base, "/api/local_tunnels")
    (row,) = body["data"]
    assert row["entity_name"] == "dev-hook"
    assert 49152 <= row["bastion_port"] < 65536
    # deterministic across calls
    _, body2 = _req(base, "/api/local_tunnels")
    assert body2 == body


def test_local_tunnels_unwired():
    assert local_tunnels(None, None) == []


def test_health_and_info(api):
    base = _base(api)
    status, body = _req(base, "/health")
    assert status == 200 and body["ok"] is True and body["rev"]
    _, body = _req(base, "/api/info/version")
    assert body == {"version": api.version}
    _, body = _req(base, "/api/info")
    assert body == {"version": api.version, "nodes": []}


def test_health_failure_is_500():
    server = ConfigApiServer(
        ConfigRegistry(), health_check=lambda: (False, "state dir unwritable"),
    ).start()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"http://127.0.0.1:{server.port}/health",
                                   timeout=10)
        assert e.value.code == 500
        assert json.loads(e.value.read()) == {
            "ok": False, "error": "state dir unwritable"}
    finally:
        server.stop()


def test_spec_external_shape():
    spec = PostgresReplicationSpec(publication_name="p", slot_name="s",
                                   postgres_database_id="d")
    ext = spec.to_external()
    assert set(ext) == {"id", "publication_name", "slot_name",
                        "postgres_database_id", "status", "partition_count"}
