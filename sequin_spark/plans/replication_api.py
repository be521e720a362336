"""Postgres replication-slot resources + local-tunnel index.

Reference: ``resources("/postgres_replications", ...)`` and
``resources("/local_tunnels", only: [:index])`` (router.ex:164-165),
postgres_replication_controller.ex (CRUD; update forbids changing
``postgres_database_id``), postgres_replication_json.ex (show renders
the slot, show-with-info wraps it as ``{postgres_replication, info}``
where info = ``{last_committed_at, total_ingested_messages}`` —
postgres_replication_slot.ex:14-23), local_tunnel_controller.ex
(index = tunnel-enabled endpoints + databases rendered as
``{entity_id, bastion_port, entity_name}``).

The spec mirrors PostgresReplicationSlot's fields
(postgres_replication_slot.ex:33-38,59-66): publication_name +
slot_name required, (slot_name, postgres_database_id) unique,
status ∈ {active, disabled}, partition_count ≥ 1.
"""

from __future__ import annotations

import dataclasses
import hashlib
import threading
import uuid
from dataclasses import dataclass, field


@dataclass
class PostgresReplicationSpec:
    publication_name: str | None = None
    slot_name: str | None = None
    postgres_database_id: str | None = None
    status: str = "active"
    annotations: dict = field(default_factory=dict)
    partition_count: int = 1
    id: str = field(default_factory=lambda: str(uuid.uuid4()))

    ALLOWED = ("publication_name", "slot_name", "postgres_database_id",
               "status", "annotations", "partition_count")

    @classmethod
    def from_external(cls, body: dict) -> "PostgresReplicationSpec":
        unknown = set(body) - set(cls.ALLOWED)
        if unknown:
            raise ValueError(f"Unknown field: {sorted(unknown)[0]}")
        spec = cls(**{k: v for k, v in body.items() if k in cls.ALLOWED})
        spec.validate()
        return spec

    def validate(self) -> None:
        # validate_required([:publication_name, :slot_name])
        if not self.publication_name or not isinstance(self.publication_name, str):
            raise ValueError("publication_name is required")
        if not self.slot_name or not isinstance(self.slot_name, str):
            raise ValueError("slot_name is required")
        if self.status not in ("active", "disabled"):
            raise ValueError("status must be active or disabled")
        if not isinstance(self.partition_count, int) or self.partition_count < 1:
            raise ValueError("partition_count must be a positive integer")
        if not isinstance(self.annotations, dict):
            raise ValueError("annotations must be a map")

    def to_external(self) -> dict:
        return {
            "id": self.id,
            "publication_name": self.publication_name,
            "slot_name": self.slot_name,
            "postgres_database_id": self.postgres_database_id,
            "status": self.status,
            "partition_count": self.partition_count,
        }

    def merged(self, body: dict) -> "PostgresReplicationSpec":
        """Return a validated copy with ``body`` applied; ``self`` is
        never mutated, so a rejected PATCH leaves the stored spec
        intact (mirrors ConfigRegistry.update_consumer's re-parse)."""
        unknown = set(body) - set(self.ALLOWED)
        if unknown:
            raise ValueError(f"Unknown field: {sorted(unknown)[0]}")
        # parse_update_params: postgres_database_id is immutable
        if "postgres_database_id" in body:
            raise ValueError("Updating postgres_database_id is not allowed")
        merged = dataclasses.replace(self, **{k: body[k] for k in body})
        merged.validate()
        return merged


class ReplicationRegistry:
    """In-memory replication-slot resources. ``info_provider`` is an
    optional callable spec → ``{last_committed_at,
    total_ingested_messages}`` (wired to a ReplicationIngestWorker's
    clocks in a live deployment; nulls otherwise)."""

    def __init__(self, info_provider=None):
        self._slots: dict[str, PostgresReplicationSpec] = {}
        self._info = info_provider
        self._lock = threading.Lock()

    def resolve(self, slot_id: str) -> PostgresReplicationSpec | None:
        with self._lock:
            return self._slots.get(slot_id)

    def create(self, body: dict) -> PostgresReplicationSpec:
        spec = PostgresReplicationSpec.from_external(body)
        with self._lock:
            self._check_unique(spec)
            self._slots[spec.id] = spec
        return spec

    def update(self, slot_id: str, body: dict) -> PostgresReplicationSpec:
        with self._lock:
            spec = self._slots.get(slot_id)
            if spec is None:
                raise KeyError(slot_id)
            merged = spec.merged(body)
            self._check_unique(merged)
            self._slots[slot_id] = merged
        return merged

    def delete(self, slot_id: str) -> str:
        with self._lock:
            if slot_id not in self._slots:
                raise KeyError(slot_id)
            del self._slots[slot_id]
        return slot_id

    def list(self) -> list[PostgresReplicationSpec]:
        with self._lock:
            return list(self._slots.values())

    def info_for(self, spec: PostgresReplicationSpec) -> dict:
        if self._info is not None:
            return self._info(spec)
        return {"last_committed_at": None, "total_ingested_messages": None}

    def _check_unique(self, spec: PostgresReplicationSpec) -> None:
        # unique_constraint([:slot_name, :postgres_database_id])
        for other in self._slots.values():
            if (other.id != spec.id
                    and other.slot_name == spec.slot_name
                    and other.postgres_database_id == spec.postgres_database_id):
                raise ValueError(
                    f"slot {spec.slot_name!r} already exists for database "
                    f"{spec.postgres_database_id!r}"
                )


def local_tunnels(endpoints=None, databases=None) -> list[dict]:
    """local_tunnel_controller.ex index: tunnel-enabled endpoints and
    databases as ``{entity_id, bastion_port, entity_name}``. Bastion
    ports are deterministic per entity id (the reference allocates from
    an account pool; we derive a stable one in the dynamic range)."""
    entities = []
    for ep in (endpoints.list() if endpoints is not None else []):
        if getattr(ep, "local", False):
            entities.append((ep.id, ep.name))
    for db in (databases.list() if databases is not None else []):
        if getattr(db, "use_local_tunnel", False) or (
            isinstance(getattr(db, "annotations", None), dict)
            and db.annotations.get("use_local_tunnel")
        ):
            entities.append((db.id, db.name))
    out = []
    for entity_id, name in entities:
        # Content hash, not builtin hash(): stable across processes
        # (PYTHONHASHSEED) so the port contract survives restarts.
        key = (uuid.UUID(entity_id).int if _is_uuid(entity_id)
               else int(hashlib.md5(str(entity_id).encode()).hexdigest(), 16))
        port = 49152 + key % 16384
        out.append({"entity_id": entity_id, "bastion_port": port,
                    "entity_name": name})
    return out


def _is_uuid(s: str) -> bool:
    try:
        uuid.UUID(s)
        return True
    except (ValueError, AttributeError, TypeError):
        return False
