"""Accounts/users/sessions (accounts.ex register/login/session-token/
password flows; user_session_controller.ex create/delete; user.ex
email + password rules; user_token.ex 60-day session validity)."""

import json
import time
import urllib.error
import urllib.request

import pytest

from sequin_spark.plans.accounts_api import (
    SESSION_VALIDITY_S,
    AccountsRegistry,
)
from sequin_spark.plans.config_api import ConfigApiServer, ConfigRegistry


# -- registry unit surface --------------------------------------------------

def test_register_validation_rules():
    reg = AccountsRegistry()
    with pytest.raises(ValueError, match="@"):
        reg.register_user("not-an-email", "password123")
    with pytest.raises(ValueError, match="@"):
        reg.register_user("has space@x.com", "password123")
    with pytest.raises(ValueError, match="password"):
        reg.register_user("a@b.com", "short")  # < 8 (user.ex min: 8)
    with pytest.raises(ValueError, match="password"):
        reg.register_user("a@b.com", "x" * 73)  # > 72
    user = reg.register_user("a@b.com", "password123", name="Ada")
    # first signup bootstraps an account (register_user/3 account \\ nil)
    assert user.account_id in reg.accounts
    with pytest.raises(ValueError, match="already been taken"):
        reg.register_user("A@B.com", "password456")  # case-insensitive


def test_login_and_enumeration_safety():
    reg = AccountsRegistry()
    reg.register_user("a@b.com", "password123")
    assert reg.get_user_by_email_and_password("a@b.com", "wrong") is None
    # unknown email behaves identically (controller's enumeration note)
    assert reg.get_user_by_email_and_password("ghost@b.com", "x") is None
    user, token = reg.login("a@b.com", "password123")
    assert user.last_login_at is not None
    assert reg.get_user_by_session_token(token).id == user.id
    # hashes are salted: two users, same password, different hashes
    other = reg.register_user("c@d.com", "password123",
                              account_id=user.account_id)
    assert other.hashed_password != user.hashed_password


def test_session_expiry_and_logout():
    reg = AccountsRegistry()
    user = reg.register_user("a@b.com", "password123")
    token = reg.generate_session_token(user)
    assert reg.get_user_by_session_token(token) is not None
    # expire it (user_token.ex @session_validity_in_days)
    key = next(iter(reg._sessions))
    reg._sessions[key] = (user.id, time.time() - SESSION_VALIDITY_S - 1)
    assert reg.get_user_by_session_token(token) is None
    token2 = reg.generate_session_token(user)
    reg.delete_session_token(token2)
    assert reg.get_user_by_session_token(token2) is None


def test_password_update_revokes_sessions():
    reg = AccountsRegistry()
    user = reg.register_user("a@b.com", "password123")
    t1 = reg.generate_session_token(user)
    with pytest.raises(ValueError):
        reg.update_user_password(user, "wrong-current", "newpassword1")
    reg.update_user_password(user, "password123", "newpassword1")
    # old sessions revoked; old password dead; new one works
    assert reg.get_user_by_session_token(t1) is None
    assert reg.get_user_by_email_and_password("a@b.com", "password123") is None
    assert reg.get_user_by_email_and_password("a@b.com", "newpassword1")


# -- REST e2e ---------------------------------------------------------------

def _req(url, method="GET", body=None, token=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    req.add_header("Content-Type", "application/json")
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def api():
    srv = ConfigApiServer(ConfigRegistry(), users=AccountsRegistry()).start()
    yield f"http://127.0.0.1:{srv.port}"
    srv.stop()


def test_rest_register_login_me_logout(api):
    code, user = _req(f"{api}/register", "POST",
                      {"email": "ops@example.com",
                       "password": "password123", "name": "Ops"})
    assert code == 201 and "hashed_password" not in user
    # nested controller param shape also accepted
    code, body = _req(f"{api}/login", "POST",
                      {"user": {"email": "ops@example.com",
                                "password": "password123"}})
    assert code == 200
    token = body["token"]
    code, me = _req(f"{api}/api/users/me", token=token)
    assert code == 200 and me["email"] == "ops@example.com"
    # bad login: same message for wrong password and unknown email
    c1, e1 = _req(f"{api}/login", "POST",
                  {"email": "ops@example.com", "password": "nope-nope"})
    c2, e2 = _req(f"{api}/login", "POST",
                  {"email": "ghost@example.com", "password": "nope-nope"})
    assert (c1, e1) == (c2, e2) == (401,
                                    {"error": "Invalid email or password"})
    # logout invalidates the session
    code, _ = _req(f"{api}/logout", "DELETE", token=token)
    assert code == 200
    assert _req(f"{api}/api/users/me", token=token)[0] == 401


def test_rest_password_update_flow(api):
    _req(f"{api}/register", "POST",
         {"email": "a@b.com", "password": "password123"})
    _, body = _req(f"{api}/login", "POST",
                   {"email": "a@b.com", "password": "password123"})
    token = body["token"]
    code, _ = _req(f"{api}/api/users/password", "PATCH",
                   {"current_password": "wrong", "password": "newpassword1"},
                   token=token)
    assert code == 422
    code, _ = _req(f"{api}/api/users/password", "PATCH",
                   {"current_password": "password123",
                    "password": "newpassword1"}, token=token)
    assert code == 200
    # session was revoked by the change
    assert _req(f"{api}/api/users/me", token=token)[0] == 401
    code, _ = _req(f"{api}/login", "POST",
                   {"email": "a@b.com", "password": "newpassword1"})
    assert code == 200


def test_rest_register_validation_and_duplicates(api):
    assert _req(f"{api}/register", "POST",
                {"email": "bad", "password": "password123"})[0] == 422
    assert _req(f"{api}/register", "POST",
                {"email": "a@b.com", "password": "pw"})[0] == 422
    assert _req(f"{api}/register", "POST",
                {"email": "a@b.com", "password": "password123"})[0] == 201
    code, err = _req(f"{api}/register", "POST",
                     {"email": "a@b.com", "password": "password456"})
    assert code == 422 and "taken" in err["error"]


def test_rest_accounts_not_enabled():
    srv = ConfigApiServer(ConfigRegistry()).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        assert _req(f"{base}/login", "POST", {})[0] == 404
        assert _req(f"{base}/api/users/me")[0] == 404
    finally:
        srv.stop()
