"""API key resources + bearer auth (router.ex:161 /api/api_keys,
api_key_controller.ex, and the :api pipeline's token authentication)."""

import json
import urllib.error
import urllib.request

import pytest

from sequin_spark.plans.apikeys_api import ApiKeyRegistry
from sequin_spark.plans.config_api import ConfigApiServer


def _req(url, method="GET", body=None, token=None):
    data = json.dumps(body).encode() if body is not None else None
    headers = {}
    if data:
        headers["Content-Type"] = "application/json"
    if token:
        headers["Authorization"] = f"Bearer {token}"
    req = urllib.request.Request(url, data=data, method=method, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, json.loads(resp.read() or b"{}")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def test_api_key_crud():
    srv = ConfigApiServer(api_keys=ApiKeyRegistry()).start()
    base = f"http://127.0.0.1:{srv.port}/api/api_keys"
    try:
        code, key = _req(base, "POST", {"name": "ci"})
        assert code == 201 and key["name"] == "ci"
        assert key["token"].startswith("sequin_") and len(key["token"]) > 20
        code, idx = _req(base)
        assert code == 200 and [k["name"] for k in idx["data"]] == ["ci"]
        code, err = _req(base, "POST", {})
        assert code == 422 and "name" in err["error"]
        code, res = _req(f"{base}/{key['id']}", "DELETE")
        assert (code, res) == (200, {"success": True})
        assert _req(f"{base}/{key['id']}", "DELETE")[0] == 404
    finally:
        srv.stop()


def test_bearer_auth_gates_every_route():
    """require_auth=True → all /api routes demand a verifying bearer
    token (pipe_through :api parity); bad/missing tokens get 401."""
    keys = ApiKeyRegistry()
    seeded = keys.create("bootstrap")
    srv = ConfigApiServer(api_keys=keys, require_auth=True).start()
    root = f"http://127.0.0.1:{srv.port}"
    try:
        assert _req(f"{root}/api/sinks")[0] == 401                      # none
        assert _req(f"{root}/api/sinks", token="sequin_wrong")[0] == 401
        assert _req(f"{root}/api/config/export", token=seeded.token)[0] == 200
        code, idx = _req(f"{root}/api/api_keys", token=seeded.token)
        assert code == 200 and idx["data"][0]["name"] == "bootstrap"
        # POST/PATCH/DELETE equally gated
        assert _req(f"{root}/api/api_keys", "POST", {"name": "x"})[0] == 401
        assert _req(f"{root}/api/sinks/nope/backfills/1", "PATCH", {})[0] == 401
        assert _req(f"{root}/api/api_keys/zzz", "DELETE")[0] == 401
        # a second key created over the API authenticates immediately
        code, k2 = _req(f"{root}/api/api_keys", "POST", {"name": "n2"},
                        token=seeded.token)
        assert code == 201
        assert _req(f"{root}/api/sinks", token=k2["token"])[0] == 200
        # deleting a key revokes it
        _req(f"{root}/api/api_keys/{k2['id']}", "DELETE", token=seeded.token)
        assert _req(f"{root}/api/sinks", token=k2["token"])[0] == 401
    finally:
        srv.stop()


def test_registry_verify_is_hash_based():
    reg = ApiKeyRegistry()
    key = reg.create("k")
    assert reg.verify(key.token)
    assert not reg.verify(None) and not reg.verify("") and not reg.verify("nope")
    assert key.hashed_token != key.token
