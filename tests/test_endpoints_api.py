"""HTTP endpoint resource API (router.ex:168, http_endpoint_controller /
http_endpoint_json / transforms.ex:133-161 parity): CRUD, sensitive
header obfuscation, local-tunnel variant, sink-config resolution."""

import json
import urllib.error
import urllib.request

import pytest

from sequin_spark.plans.config_api import ConfigApiServer
from sequin_spark.plans.endpoints_api import HttpEndpointRegistry


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
def api():
    srv = ConfigApiServer(endpoints=HttpEndpointRegistry()).start()
    yield f"http://127.0.0.1:{srv.port}/api/destinations/http_endpoints", srv
    srv.stop()


def test_endpoint_crud_and_sensitive_headers(api):
    base, _ = api
    code, ep = _req(base, "POST", {
        "name": "orders-hook", "url": "https://hooks.example.com/v1",
        "headers": {"X-Env": "prod"},
        "encrypted_headers": {"Authorization": "Bearer hunter2secret"},
    })
    assert code == 201 and ep["url"] == "https://hooks.example.com/v1"
    assert ep["headers"] == {"X-Env": "prod"}
    # SensitiveValue rendering: obfuscated by default, revealed on demand
    assert ep["encrypted_headers"]["Authorization"].startswith("Bea")
    assert "hunter2" not in ep["encrypted_headers"]["Authorization"]
    code, shown = _req(f"{base}/orders-hook?show_sensitive=true")
    assert shown["encrypted_headers"]["Authorization"] == "Bearer hunter2secret"

    code, idx = _req(base)
    assert code == 200 and [e["name"] for e in idx["data"]] == ["orders-hook"]

    code, upd = _req(f"{base}/orders-hook", "PATCH",
                     {"url": "https://hooks.example.com/v2"})
    assert code == 200 and upd["url"].endswith("/v2")
    code, err = _req(f"{base}/orders-hook", "PATCH", {"nope": 1})
    assert code == 422 and "nope" in err["error"]

    # delete shape (http_endpoint_json.ex:19-21)
    code, deleted = _req(f"{base}/{ep['id']}", "DELETE")
    assert code == 200 and deleted == {"id": ep["id"], "deleted": True}
    assert _req(f"{base}/orders-hook")[0] == 404


def test_endpoint_validation_and_local_variant(api):
    base, _ = api
    code, err = _req(base, "POST", {"name": "bad", "url": "ftp://x"})
    assert code == 422 and "http" in err["error"]
    code, err = _req(base, "POST", {"name": ""})
    assert code == 422
    code, local = _req(base, "POST", {"name": "tunnel", "local": True,
                                      "path": "/hooks"})
    assert code == 201 and local["local"] is True and local["path"] == "/hooks"
    assert "url" not in local
    code, err = _req(base, "POST", {"name": "tunnel", "local": True})
    assert code == 422 and "already taken" in err["error"]


def test_sink_config_resolution():
    reg = HttpEndpointRegistry()
    reg.create({
        "name": "hook", "url": "https://h.example.com/base/",
        "headers": {"X-A": "1"}, "encrypted_headers": {"Auth": "s3cret"},
    })
    cfg = reg.sink_config_for("hook", "/orders")
    assert cfg == {"url": "https://h.example.com/base/orders",
                   "headers": {"X-A": "1", "Auth": "s3cret"}}
    reg.create({"name": "t", "local": True, "path": "/x"})
    with pytest.raises(ValueError, match="local tunnel"):
        reg.sink_config_for("t")
    with pytest.raises(KeyError):
        reg.sink_config_for("missing")
