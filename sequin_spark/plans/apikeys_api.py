"""API key resources + bearer-token authentication for the management API.

Reference: router.ex:161 ``resources("/api_keys", only: [:index, :create,
:delete])`` over api_key_controller.ex; tokens are random secrets stored
alongside a hash (api_tokens/api_token.ex:15-19 name/token/hashed_token)
and the ``:api`` pipeline authenticates every ``/api`` request with one.

The server shell (plans/config_api.py) accepts this registry plus
``require_auth=True`` to enforce ``Authorization: Bearer <token>`` on all
routes — the reference's pipe_through(:api) behavior.
"""

from __future__ import annotations

import hashlib
import hmac
import secrets
import threading
import time
import uuid
from dataclasses import dataclass, field


def _hash(token: str) -> str:
    return hashlib.sha256(token.encode()).hexdigest()


@dataclass
class ApiKey:
    name: str
    token: str
    id: str = field(default_factory=lambda: str(uuid.uuid4()))
    inserted_at: float = field(default_factory=time.time)

    @property
    def hashed_token(self) -> str:
        return _hash(self.token)

    def to_external(self) -> dict:
        # api_key_json.ex renders the record incl. the (decrypted) token —
        # keys are secrets the caller created and may need to re-read
        return {"id": self.id, "name": self.name, "token": self.token,
                "inserted_at": self.inserted_at}


class ApiKeyRegistry:
    def __init__(self):
        self.keys: dict[str, ApiKey] = {}  # by id
        self._lock = threading.Lock()

    def create(self, name: str | None) -> ApiKey:
        if not name or not isinstance(name, str):
            raise ValueError("name is required")
        # token shape mirrors ApiTokens.create_for_account's random secret
        key = ApiKey(name=name, token="sequin_" + secrets.token_hex(16))
        with self._lock:
            self.keys[key.id] = key
        return key

    def list(self) -> list[ApiKey]:
        with self._lock:
            return sorted(self.keys.values(), key=lambda k: k.inserted_at)

    def delete(self, key_id: str) -> bool:
        with self._lock:
            return self.keys.pop(key_id, None) is not None

    def verify(self, token: str | None) -> bool:
        """Constant-time hash comparison against every stored key
        (ApiTokens.find_by_token parity)."""
        if not token:
            return False
        h = _hash(token)
        with self._lock:
            hashes = [k.hashed_token for k in self.keys.values()]
        return any(hmac.compare_digest(h, other) for other in hashes)
