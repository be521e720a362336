"""Config round-trip (to_external / export_yaml) and the management
REST API (POST /api/config/{plan,apply}, GET /api/config/export —
router.ex:191-193, yaml_controller.ex parity)."""

import json
import urllib.error
import urllib.request

import pytest

from sequin_spark.operators.source_filter import Source
from sequin_spark.plans.config_api import ConfigApiServer, ConfigRegistry
from sequin_spark.plans.spec import (
    ConsumerSpec,
    export_yaml,
    load_yaml,
    spec_from_dict,
    to_external,
)

SPEC = ConsumerSpec(
    name="orders-to-kafka",
    sink_type="kafka",
    sink_config={"hosts": "k1:9092", "topic": "orders", "password": "hunter2"},
    source=Source(include_schemas=["public"], include_tables=["orders"]),
    actions=["insert", "update"],
    filter="record['o_totalprice'] > 100",
    transform="record_only",
    batch_size=50,
)


def test_to_external_round_trip():
    ext = to_external(SPEC, show_sensitive=True)
    assert spec_from_dict(ext) == SPEC
    # defaults are omitted from the export (minimal YAML)
    assert "partition_count" not in ext and "max_retry_count" not in ext


def test_to_external_redacts_secrets():
    ext = to_external(SPEC)
    assert ext["sink_config"]["password"] == "****"
    assert ext["sink_config"]["hosts"] == "k1:9092"


def test_export_yaml_round_trip():
    specs = [SPEC, ConsumerSpec(name="noop", sink_type="benchmark")]
    doc = export_yaml(specs, show_sensitive=True)
    assert load_yaml(doc) == specs  # YAML out == YAML in


def _post(url, yaml_text):
    req = urllib.request.Request(
        url, data=yaml_text.encode(),
        headers={"Content-Type": "application/yaml"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        return resp.status, json.loads(resp.read())


@pytest.fixture()
def api():
    server = ConfigApiServer(ConfigRegistry()).start()
    yield server
    server.stop()


YAML_V1 = """
consumers:
  - name: orders-webhook
    sink_type: http_push
    sink_config: {url: "http://example.test/hook"}
    batch_size: 10
  - name: noop
    sink_type: benchmark
"""

YAML_V2 = """
consumers:
  - name: orders-webhook
    sink_type: http_push
    sink_config: {url: "http://example.test/hook"}
    batch_size: 25
"""


def test_config_plan_apply_export_round_trip(api):
    # plan against an empty registry: everything is a create
    status, body = _post(api.url("plan"), YAML_V1)
    assert status == 200
    assert {c["name"]: c["action"] for c in body["changes"]} == {
        "orders-webhook": "create", "noop": "create",
    }
    # nothing committed by plan
    status, body = _post(api.url("apply"), YAML_V1)
    assert status == 200 and len(body["resources"]) == 2
    # re-plan: unchanged + update + delete envelopes
    status, body = _post(api.url("plan"), YAML_V2)
    actions = {c["name"]: c["action"] for c in body["changes"]}
    assert actions == {"orders-webhook": "update", "noop": "delete"}
    # export returns a loadable YAML equal to what was applied
    with urllib.request.urlopen(api.url("export"), timeout=10) as resp:
        yaml_out = json.loads(resp.read())["yaml"]
    assert [s.name for s in load_yaml(yaml_out)] == ["orders-webhook", "noop"]
    # and the exported YAML re-applies to an unchanged plan
    status, body = _post(api.url("plan"), yaml_out)
    assert all(c["action"] == "unchanged" for c in body["changes"])


def test_config_apply_validates_all_or_nothing(api):
    bad = """
consumers:
  - name: ok
    sink_type: benchmark
  - name: bad
    sink_type: no_such_sink
"""
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(api.url("apply"), bad)
    assert e.value.code == 422
    assert "bad" in json.loads(e.value.read())["errors"]
    # nothing was committed
    with urllib.request.urlopen(api.url("export"), timeout=10) as resp:
        assert json.loads(resp.read())["yaml"].strip() == "consumers: []"


def test_config_bad_yaml_400(api):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(api.url("apply"), "consumers:\n  - {nope: 1}")
    assert e.value.code == 400


def test_sinks_resource_read_api(api):
    # router.ex:157-178 /api/sinks read surface over applied resources
    _post(api.url("apply"), YAML_V1)
    base = api.url("plan").rsplit("/config", 1)[0]
    with urllib.request.urlopen(f"{base}/sinks", timeout=10) as resp:
        names = [c["name"] for c in json.loads(resp.read())["data"]]
    assert names == ["orders-webhook", "noop"]
    with urllib.request.urlopen(f"{base}/sinks/noop", timeout=10) as resp:
        assert json.loads(resp.read())["sink_type"] == "benchmark"
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{base}/sinks/ghost", timeout=10)
    assert e.value.code == 404


def _req(url, method="GET", body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        url, data=data, method=method,
        headers={"Content-Type": "application/json"} if body is not None else {},
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        return resp.status, json.loads(resp.read())


def test_sinks_crud_api(api):
    """sink_consumer_controller.ex create/update/delete over /api/sinks."""
    base = api.url("plan").rsplit("/config", 1)[0]
    # create (rendered to_external, like show.json)
    status, body = _req(f"{base}/sinks", "POST", {
        "name": "evt", "sink_type": "http_push",
        "sink_config": {"url": "http://example.test/hook"},
        "batch_size": 10,
    })
    assert status == 200 and body["name"] == "evt" and body["batch_size"] == 10
    # duplicate create rejected
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(f"{base}/sinks", "POST", {"name": "evt", "sink_type": "benchmark"})
    assert e.value.code == 422
    # partial update merges over the stored external form
    status, body = _req(f"{base}/sinks/evt", "PATCH", {"batch_size": 25})
    assert status == 200 and body["batch_size"] == 25
    assert body["sink_config"]["url"] == "http://example.test/hook"
    # validation failures are 422 (unknown sink type / unknown field)
    for bad in ({"sink_type": "no_such"}, {"bogus_field": 1}):
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(f"{base}/sinks/evt", "PATCH", bad)
        assert e.value.code == 422
    # delete renders {id, deleted: true} (sink_consumer_json.ex delete)
    status, body = _req(f"{base}/sinks/evt", "DELETE")
    assert status == 200 and body == {"id": "evt", "deleted": True}
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(f"{base}/sinks/evt", "DELETE")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(f"{base}/sinks/ghost", "PATCH", {"batch_size": 1})
    assert e.value.code == 404


def test_sinks_rename_collision_rejected(api):
    """Renaming a consumer onto another existing consumer's name must
    422, not silently overwrite (create rejects duplicates; so does
    update)."""
    base = api.url("plan").rsplit("/config", 1)[0]
    _req(f"{base}/sinks", "POST", {"name": "a", "sink_type": "benchmark"})
    _req(f"{base}/sinks", "POST", {"name": "b", "sink_type": "benchmark",
                                   "batch_size": 7})
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(f"{base}/sinks/a", "PATCH", {"name": "b"})
    assert e.value.code == 422
    # 'b' survives untouched, 'a' still exists
    _, body = _req(f"{base}/sinks/b")
    assert body["batch_size"] == 7
    _, body = _req(f"{base}/sinks/a")
    assert body["name"] == "a"
    # a rename to a FREE name still works
    status, body = _req(f"{base}/sinks/a", "PATCH", {"name": "c"})
    assert status == 200 and body["name"] == "c"


def test_sinks_create_then_export_round_trips(api):
    base = api.url("plan").rsplit("/config", 1)[0]
    _req(f"{base}/sinks", "POST", {
        "name": "k", "sink_type": "kafka",
        "sink_config": {"hosts": "h:9092", "topic": "t", "password": "s3cret"},
    })
    # created resources participate in config export, secrets redacted
    with urllib.request.urlopen(api.url("export"), timeout=10) as resp:
        yaml_out = json.loads(resp.read())["yaml"]
    assert "s3cret" not in yaml_out and "'****'" in yaml_out
    specs = load_yaml(yaml_out)
    assert [s.name for s in specs] == ["k"]
