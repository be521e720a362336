"""Accounts, users and sessions — the management-plane identity layer.

Reference: lib/sequin/accounts/accounts.ex (register_user :123-156,
get_user_by_email_and_password :79-82, generate_user_session_token :328,
get_user_by_session_token :337, delete_user_session_token :351,
update_user_password :307 — which revokes every session token),
accounts/user.ex (email format ``^[^\\s]+@[^\\s]+$`` max 160, password
length 8..72, Argon2 hash — here PBKDF2-HMAC-SHA256 with a per-user
salt, the stdlib equivalent since argon2 isn't available),
accounts/user_token.ex (32-byte random session tokens, 60-day validity)
and the login/logout flows of
sequin_web/controllers/user_session_controller.ex:104-135 (failed login
reveals nothing about whether the email exists — the same "Invalid email
or password" either way).

First registration bootstraps the account (the self-hosted /setup flow,
router.ex SetupLive): ``register_user`` with no account joins/creates a
default account, mirroring ``Accounts.register_user(:identity, attrs)``.
"""

from __future__ import annotations

import hashlib
import hmac
import os
import re
import threading
import time
import uuid
from dataclasses import dataclass, field

_EMAIL_RE = re.compile(r"^[^\s]+@[^\s]+$")
SESSION_VALIDITY_S = 60 * 24 * 3600  # @session_validity_in_days 60
_PBKDF2_ITERS = 100_000


def _hash_password(password: str, salt: bytes | None = None) -> str:
    salt = salt or os.urandom(16)
    digest = hashlib.pbkdf2_hmac(
        "sha256", password.encode(), salt, _PBKDF2_ITERS)
    return f"pbkdf2${salt.hex()}${digest.hex()}"


def _verify_password(password: str, hashed: str) -> bool:
    try:
        _, salt_hex, digest_hex = hashed.split("$")
    except ValueError:
        return False
    digest = hashlib.pbkdf2_hmac(
        "sha256", password.encode(), bytes.fromhex(salt_hex), _PBKDF2_ITERS)
    return hmac.compare_digest(digest.hex(), digest_hex)


@dataclass
class Account:
    id: str
    name: str

    def to_external(self) -> dict:
        return {"id": self.id, "name": self.name}


@dataclass
class User:
    id: str
    email: str
    name: str | None
    account_id: str
    hashed_password: str
    auth_provider: str = "identity"
    last_login_at: float | None = None
    inserted_at: float = field(default_factory=time.time)

    def to_external(self) -> dict:
        # user-facing render: never the hash (user JSON in settings)
        return {
            "id": self.id, "email": self.email, "name": self.name,
            "account_id": self.account_id,
            "auth_provider": self.auth_provider,
            "last_login_at": self.last_login_at,
        }


class AccountsRegistry:
    """In-memory accounts/users/session-token store (the Repo-backed
    Accounts context collapsed to the semantics the API needs)."""

    def __init__(self):
        self.accounts: dict[str, Account] = {}
        self.users: dict[str, User] = {}           # by id
        self._by_email: dict[str, str] = {}        # email → user id
        # sha256(token) → (user_id, issued_at); tokens themselves are
        # never stored (user_token.ex hashes reset/confirm tokens; we
        # extend that to sessions)
        self._sessions: dict[str, tuple[str, float]] = {}
        self._lock = threading.Lock()

    # -- registration (accounts.ex:123-156) ---------------------------------

    def register_user(self, email: str, password: str,
                      name: str | None = None,
                      account_id: str | None = None) -> User:
        errs = []
        if not email or not _EMAIL_RE.fullmatch(email or ""):
            errs.append("email must have the @ sign and no spaces")
        if email and len(email) > 160:
            errs.append("email should be at most 160 character(s)")
        if not password or not (8 <= len(password) <= 72):
            errs.append("password should be at least 8 character(s)")
        if errs:
            raise ValueError("; ".join(errs))
        with self._lock:
            if email.lower() in self._by_email:
                raise ValueError("email has already been taken")
            if account_id is None:
                # first identity signup bootstraps an account
                # (register_user/3 with account \\ nil)
                account = Account(id=uuid.uuid4().hex, name="default")
                self.accounts[account.id] = account
                account_id = account.id
            elif account_id not in self.accounts:
                raise ValueError("account not found")
            user = User(
                id=uuid.uuid4().hex, email=email, name=name,
                account_id=account_id,
                hashed_password=_hash_password(password),
            )
            self.users[user.id] = user
            self._by_email[email.lower()] = user.id
        return user

    # -- login (accounts.ex:79-82; user_session_controller.ex:104-127) ------

    def get_user_by_email_and_password(self, email: str,
                                       password: str) -> User | None:
        """None on any failure — never discloses whether the email
        exists (the controller's enumeration-attack note)."""
        with self._lock:
            user_id = self._by_email.get((email or "").lower())
            user = self.users.get(user_id) if user_id else None
        if user is None:
            # burn a hash anyway so timing doesn't leak existence
            # (Argon2.no_user_verify analog)
            _verify_password(password or "", _hash_password("x"))
            return None
        return user if _verify_password(password or "",
                                        user.hashed_password) else None

    def login(self, email: str, password: str) -> tuple[User, str] | None:
        user = self.get_user_by_email_and_password(email, password)
        if user is None:
            return None
        user.last_login_at = time.time()
        return user, self.generate_session_token(user)

    # -- session tokens (user_token.ex:58-82) -------------------------------

    def generate_session_token(self, user: User) -> str:
        token = os.urandom(32).hex()
        with self._lock:
            self._sessions[hashlib.sha256(token.encode()).hexdigest()] = (
                user.id, time.time())
        return token

    def get_user_by_session_token(self, token: str | None) -> User | None:
        if not token:
            return None
        key = hashlib.sha256(token.encode()).hexdigest()
        with self._lock:
            entry = self._sessions.get(key)
            if entry is None:
                return None
            user_id, issued = entry
            if time.time() - issued > SESSION_VALIDITY_S:
                del self._sessions[key]
                return None
            return self.users.get(user_id)

    def delete_session_token(self, token: str | None) -> None:
        if not token:
            return
        with self._lock:
            self._sessions.pop(
                hashlib.sha256(token.encode()).hexdigest(), None)

    # -- password update (accounts.ex:307-326) ------------------------------

    def update_user_password(self, user: User, current_password: str,
                             new_password: str) -> User:
        if not _verify_password(current_password or "",
                                user.hashed_password):
            raise ValueError("is not valid")
        if not (8 <= len(new_password or "") <= 72):
            raise ValueError("password should be at least 8 character(s)")
        with self._lock:
            user.hashed_password = _hash_password(new_password)
            # revoke every session (the reference deletes all user
            # tokens in the same transaction)
            self._sessions = {
                k: v for k, v in self._sessions.items() if v[0] != user.id
            }
        return user

    # -- account scoping ----------------------------------------------------

    def users_for_account(self, account_id: str) -> list[User]:
        with self._lock:
            return [u for u in self.users.values()
                    if u.account_id == account_id]
