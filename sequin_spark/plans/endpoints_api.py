"""HTTP endpoint resource API — named webhook destinations.

Reference: router.ex:168 ``resources("/destinations/http_endpoints", ...,
param: "id_or_name")`` over http_endpoint_controller.ex, rendered by
http_endpoint_json.ex / transforms.ex:133-161: an endpoint is either a
full ``url`` (+ plain ``headers``) or ``local: true`` + ``path`` (tunnel
variant), plus ``encrypted_headers`` whose values render as obfuscated
SensitiveValues unless ``show_sensitive``.

Sinks reference endpoints by name: ``sink_config_for`` merges an
endpoint into an http_push sink config (url = endpoint url + sink path,
headers = plain + encrypted), the resolution the reference does in
Consumers.get_http_endpoint_for_account + HttpPushSink.
"""

from __future__ import annotations

import threading
import uuid
from dataclasses import dataclass, field

from sequin_spark.plans.database_api import obfuscate


@dataclass
class HttpEndpointSpec:
    name: str
    url: str | None = None
    local: bool = False
    path: str | None = None
    headers: dict = field(default_factory=dict)
    encrypted_headers: dict = field(default_factory=dict)
    id: str = field(default_factory=lambda: str(uuid.uuid4()))

    ALLOWED = ("name", "url", "local", "path", "headers", "encrypted_headers")

    @classmethod
    def from_external(cls, body: dict) -> "HttpEndpointSpec":
        unknown = set(body) - set(cls.ALLOWED)
        if unknown:
            raise ValueError(f"Unknown field: {sorted(unknown)[0]}")
        spec = cls(**{k: v for k, v in body.items() if k in cls.ALLOWED})
        spec.validate()
        return spec

    def validate(self) -> None:
        if not self.name or not isinstance(self.name, str):
            raise ValueError("name is required")
        if self.local:
            if self.url:
                raise ValueError("local endpoints take path, not url")
        elif not self.url or not self.url.startswith(("http://", "https://")):
            raise ValueError("url must be http(s)://... (or set local: true)")
        for hdrs, label in ((self.headers, "headers"),
                            (self.encrypted_headers, "encrypted_headers")):
            if not isinstance(hdrs, dict) or not all(
                isinstance(k, str) and isinstance(v, str) for k, v in hdrs.items()
            ):
                raise ValueError(f"{label} must be a string→string map")

    def to_external(self, show_sensitive: bool = False) -> dict:
        # transforms.ex:133-161 — local variant renders path, url variant
        # renders the assembled url; encrypted headers are SensitiveValues
        out: dict = {"id": self.id, "name": self.name}
        if self.local:
            out["local"] = True
            out["path"] = self.path
        else:
            out["url"] = self.url
        out["headers"] = dict(self.headers)
        out["encrypted_headers"] = {
            k: (v if show_sensitive else obfuscate(v))
            for k, v in self.encrypted_headers.items()
        }
        return out

    def merge(self, body: dict) -> None:
        unknown = set(body) - set(self.ALLOWED)
        if unknown:
            raise ValueError(f"Unknown field: {sorted(unknown)[0]}")
        for k, v in body.items():
            setattr(self, k, v)
        self.validate()


class HttpEndpointRegistry:
    def __init__(self):
        self.endpoints: dict[str, HttpEndpointSpec] = {}  # by id
        self._lock = threading.Lock()

    def resolve(self, id_or_name: str) -> HttpEndpointSpec | None:
        with self._lock:
            if id_or_name in self.endpoints:
                return self.endpoints[id_or_name]
            for ep in self.endpoints.values():
                if ep.name == id_or_name:
                    return ep
        return None

    def create(self, body: dict) -> HttpEndpointSpec:
        spec = HttpEndpointSpec.from_external(body)
        with self._lock:
            if any(e.name == spec.name for e in self.endpoints.values()):
                raise ValueError(f"endpoint name {spec.name!r} already taken")
            self.endpoints[spec.id] = spec
        return spec

    def update(self, id_or_name: str, body: dict) -> HttpEndpointSpec:
        ep = self.resolve(id_or_name)
        if ep is None:
            raise KeyError(id_or_name)
        with self._lock:
            if "name" in body and any(
                e.name == body["name"] and e.id != ep.id
                for e in self.endpoints.values()
            ):
                raise ValueError(f"endpoint name {body['name']!r} already taken")
            ep.merge(body)
        return ep

    def delete(self, id_or_name: str) -> str:
        ep = self.resolve(id_or_name)
        if ep is None:
            raise KeyError(id_or_name)
        with self._lock:
            self.endpoints.pop(ep.id, None)
        return ep.id

    def list(self) -> list[HttpEndpointSpec]:
        with self._lock:
            return list(self.endpoints.values())

    def sink_config_for(self, id_or_name: str, path: str = "") -> dict:
        """Resolve an endpoint reference into http_push sink config:
        url = endpoint url + sink-level path suffix, headers = plain
        merged with decrypted encrypted headers (HttpPushSink parity)."""
        ep = self.resolve(id_or_name)
        if ep is None:
            raise KeyError(id_or_name)
        if ep.local:
            raise ValueError(f"endpoint {ep.name!r} is a local tunnel; no url")
        return {
            "url": ep.url.rstrip("/") + (path or ""),
            "headers": {**ep.headers, **ep.encrypted_headers},
        }
