"""Relation schema-change tracking — the relation hash cache.

The reference hashes every Relation message it sees and compares against
a cached hash; a mismatch means the table's schema changed mid-stream
(column add/rename/retype), so it refreshes the database's table
metadata (slot_producer/postgres_relation_hash_cache.ex:20-25 hash,
:54-77 store; relation.ex:173-186 compare-and-enqueue).  The cache
lives in Redis there; here it is a JSON file in the state dir (the
engine's driver-side state store), which survives restarts the same
way.

On change the tracker:

- updates the stored hash,
- emits a ``schema_changed`` health event (info status — the stream
  keeps flowing; typed views refresh on the new column set), and
- invokes ``on_change(relation, old_columns, new_columns)`` so callers
  can rebuild per-table typed views (``types.typed_record`` column
  specs) — the DatabaseUpdateWorker.enqueue analog.
"""

from __future__ import annotations

import hashlib
import json
import os

from sequin_spark.sources.pgoutput import Relation

# pgoutput type OIDs → PG type names the ValueCaster understands
# (relation.ex:40-53 @oid_to_type_name)
OID_TO_TYPE = {
    16: "bool",
    17: "bytea",
    20: "int8",
    21: "int2",
    23: "int4",
    25: "text",
    114: "json",
    700: "float4",
    701: "float8",
    1082: "date",
    1083: "time",
    1114: "timestamp",
    1184: "timestamptz",
    1186: "interval",
    1700: "numeric",
    2950: "uuid",
    3802: "jsonb",
}


def compute_schema_hash(rel: Relation) -> str:
    """Deterministic hash of the full relation shape — name, namespace,
    replica identity, and every column's (name, type, modifier, flags).
    The reference uses :erlang.phash2 (postgres_relation_hash_cache.ex:
    22-25); any stable hash of the same fields has the same semantics.
    """
    canon = json.dumps(
        {
            "oid": rel.oid,
            "namespace": rel.namespace,
            "name": rel.name,
            "replica_identity": rel.replica_identity,
            "columns": [
                [c.name, c.type_oid, c.type_modifier, c.flags] for c in rel.columns
            ],
        },
        sort_keys=True,
    )
    return hashlib.sha256(canon.encode()).hexdigest()[:16]


def column_types(rel: Relation) -> dict[str, str]:
    """Column → PG type name map for ``types.typed_record``."""
    return {c.name: OID_TO_TYPE.get(c.type_oid, "text") for c in rel.columns}


class RelationSchemaTracker:
    """Compare-and-store schema hashes per relation oid.

    Plug ``tracker.observe`` into ``EventFolder(on_relation=…)`` (or call
    it directly from any Relation-bearing ingest path).
    """

    def __init__(self, state_path: str | None = None, health=None, on_change=None):
        self.state_path = state_path
        self.health = health
        self.on_change = on_change
        self.relations: dict[int, Relation] = {}
        self.changes: list[dict] = []  # audit log of detected changes
        self._hashes: dict[str, str] = {}
        if state_path and os.path.exists(state_path):
            with open(state_path) as f:
                self._hashes = json.load(f)

    def _persist(self) -> None:
        if not self.state_path:
            return
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._hashes, f)
        os.replace(tmp, self.state_path)

    def observe(self, rel: Relation) -> dict | None:
        """Returns a change record when the relation's schema hash moved
        (None on first sight or no change) — relation.ex:173-186."""
        current = compute_schema_hash(rel)
        stored = self._hashes.get(str(rel.oid))
        old_rel = self.relations.get(rel.oid)
        self.relations[rel.oid] = rel
        if stored == current:
            return None
        self._hashes[str(rel.oid)] = current
        self._persist()
        if stored is None:
            return None  # first sight: store silently, nothing changed yet
        change = {
            "table_oid": rel.oid,
            "table_schema": rel.namespace,
            "table_name": rel.name,
            "old_hash": stored,
            "new_hash": current,
            "old_columns": None if old_rel is None else [c.name for c in old_rel.columns],
            "new_columns": [c.name for c in rel.columns],
        }
        self.changes.append(change)
        if self.health is not None:
            self.health.put_event(
                "schema_changed",
                status="info",
                error=f"{rel.namespace}.{rel.name} schema hash {stored} → {current}",
            )
        if self.on_change is not None:
            old_cols = None if old_rel is None else column_types(old_rel)
            self.on_change(rel, old_cols, column_types(rel))
        return change

    def typed_view(self, df, table_oid: int, record_col: str = "record"):
        """Typed projection of `df`'s record map per the *latest* observed
        schema for `table_oid` — the refreshed per-table typed view."""
        from sequin_spark.types import typed_record

        rel = self.relations[table_oid]
        return typed_record(df, column_types(rel), record_col=record_col)
