"""Postgres database resource API — CRUD + table/schema introspection.

Reference surface:
- router.ex:160 ``resources("/postgres_databases", ..., param: "id_or_name")``
  plus :175-176 ``POST .../test_connection`` and ``POST .../refresh_tables``
  backed by postgres_database_controller.ex;
- render shape postgres_database_json.ex:56-75 (password obfuscated unless
  ``show_sensitive``, embedded ``replication_slots``);
- table schema lib/sequin/databases/postgres_database_table.ex:10-23
  (oid, schema, name, columns[attnum, name, type, is_pk?, pg_typtype]).

Spark mapping: a "database" here is a *source* the engine reads — either a
live Postgres (introspected over the wire via the replication client's
simple-query protocol, sources/replication.py) or a parquet directory (the
local/test source every query in this repo runs against). Parquet
introspection reads footer schemas only — no data scan, so it is O(tables)
regardless of data size.
"""

from __future__ import annotations

import os
import threading
import uuid
import zlib
from dataclasses import dataclass, field

import pyarrow.parquet as pq


def obfuscate(secret: str | None) -> str:
    """string.ex:21-40 — mask middles, keep edges for recognizability."""
    if not secret:
        return ""
    n = len(secret)
    if n <= 5:
        return "*" * n
    if n <= 9:
        return secret[0] + "*" * (n - 2) + secret[-1]
    return secret[:3] + "*" * min(n - 4, 20) + secret[-1]


# Arrow → Postgres type names (pg_type parity for the introspection
# payload; postgres_database_table.ex stores the pg name strings).
_PG_TYPES = {
    "int8": "smallint", "int16": "smallint", "int32": "integer",
    "int64": "bigint", "float": "real", "double": "double precision",
    "string": "text", "large_string": "text", "bool": "boolean",
    "date32[day]": "date", "binary": "bytea", "large_binary": "bytea",
}


def _pg_type(arrow_type) -> str:
    s = str(arrow_type)
    if s in _PG_TYPES:
        return _PG_TYPES[s]
    if s.startswith("timestamp"):
        return "timestamp with time zone" if "tz=" in s else "timestamp without time zone"
    if s.startswith("decimal"):
        return "numeric"
    if s.startswith(("list", "large_list", "fixed_size_list")):
        inner = getattr(arrow_type, "value_type", None)
        return (_pg_type(inner) if inner is not None else "text") + "[]"
    if s.startswith(("map", "struct")):
        return "jsonb"
    return s


def _table_oid(schema: str, name: str) -> int:
    """Stable synthetic oid (parquet sources have none) — crc32 of the
    qualified name, offset past the reserved pg oid range."""
    return 16384 + (zlib.crc32(f"{schema}.{name}".encode()) & 0x7FFFFF)


@dataclass
class PostgresDatabaseSpec:
    """postgres_database resource (transforms.ex parse_db_params fields +
    the engine-native ``path`` parquet-source variant)."""

    name: str
    hostname: str | None = None
    port: int = 5432
    database: str | None = None
    username: str | None = None
    password: str | None = None
    ssl: bool = False
    ipv6: bool = False
    use_local_tunnel: bool = False
    pool_size: int = 3
    path: str | None = None  # parquet-directory source (local analog)
    primary_keys: dict = field(default_factory=dict)  # table → [pk cols]
    replication_slots: list = field(default_factory=list)
    id: str = field(default_factory=lambda: str(uuid.uuid4()))

    ALLOWED = ("name", "hostname", "port", "database", "username", "password",
               "ssl", "ipv6", "use_local_tunnel", "pool_size", "path",
               "primary_keys", "replication_slots")

    @classmethod
    def from_external(cls, body: dict) -> "PostgresDatabaseSpec":
        unknown = set(body) - set(cls.ALLOWED)
        if unknown:
            raise ValueError(f"Unknown field: {sorted(unknown)[0]}")
        spec = cls(**{k: v for k, v in body.items() if k in cls.ALLOWED})
        spec.validate()
        return spec

    def validate(self) -> None:
        if not self.name or not isinstance(self.name, str):
            raise ValueError("name is required")
        if self.path is None and not self.hostname:
            raise ValueError("either hostname or path is required")
        if not isinstance(self.port, int) or not (0 < self.port < 65536):
            raise ValueError("port must be in 1..65535")
        for slot in self.replication_slots:
            if not isinstance(slot, dict) or not slot.get("slot_name"):
                raise ValueError("replication_slots entries need slot_name")

    def to_external(self, show_sensitive: bool = False) -> dict:
        return {
            "id": self.id,
            "name": self.name,
            "hostname": self.hostname,
            "port": self.port,
            "database": self.database,
            "username": self.username,
            "password": (self.password if show_sensitive
                         else obfuscate(self.password)),
            "ssl": self.ssl,
            "ipv6": self.ipv6,
            "use_local_tunnel": self.use_local_tunnel,
            "pool_size": self.pool_size,
            "path": self.path,
            "replication_slots": list(self.replication_slots),
        }

    def merge(self, body: dict) -> None:
        unknown = set(body) - set(self.ALLOWED)
        if unknown:
            raise ValueError(f"Unknown field: {sorted(unknown)[0]}")
        for k, v in body.items():
            setattr(self, k, v)
        self.validate()


# postgres.ex tables-with-columns introspection query, run over the
# simple-query protocol when the database is a live Postgres
_LIVE_TABLES_SQL = """
SELECT n.nspname, c.relname, c.oid, a.attnum, a.attname,
       format_type(a.atttypid, a.atttypmod), t.typtype,
       COALESCE(a.attnum = ANY(ct.conkey), false)
FROM pg_class c
JOIN pg_namespace n ON n.oid = c.relnamespace
JOIN pg_attribute a ON a.attrelid = c.oid AND a.attnum > 0 AND NOT a.attisdropped
JOIN pg_type t ON t.oid = a.atttypid
LEFT JOIN pg_constraint ct ON ct.conrelid = c.oid AND ct.contype = 'p'
WHERE c.relkind IN ('r', 'p') AND n.nspname NOT IN ('pg_catalog', 'information_schema')
ORDER BY n.nspname, c.relname, a.attnum
""".strip()


class DatabaseRegistry:
    """CRUD + cached table introspection (Databases context analog)."""

    def __init__(self):
        self.databases: dict[str, PostgresDatabaseSpec] = {}  # by id
        self.tables: dict[str, list[dict]] = {}  # db id → introspected tables
        self._lock = threading.Lock()

    # --- CRUD -------------------------------------------------------------

    def resolve(self, id_or_name: str) -> PostgresDatabaseSpec | None:
        with self._lock:
            if id_or_name in self.databases:
                return self.databases[id_or_name]
            for db in self.databases.values():
                if db.name == id_or_name:
                    return db
        return None

    def create(self, body: dict) -> PostgresDatabaseSpec:
        spec = PostgresDatabaseSpec.from_external(body)
        with self._lock:
            if any(d.name == spec.name for d in self.databases.values()):
                raise ValueError(f"database name {spec.name!r} already taken")
            self.databases[spec.id] = spec
        return spec

    def update(self, id_or_name: str, body: dict) -> PostgresDatabaseSpec:
        db = self.resolve(id_or_name)
        if db is None:
            raise KeyError(id_or_name)
        with self._lock:
            if "name" in body and any(
                d.name == body["name"] and d.id != db.id
                for d in self.databases.values()
            ):
                raise ValueError(f"database name {body['name']!r} already taken")
            db.merge(body)
        return db

    def delete(self, id_or_name: str) -> str:
        db = self.resolve(id_or_name)
        if db is None:
            raise KeyError(id_or_name)
        with self._lock:
            self.databases.pop(db.id, None)
            self.tables.pop(db.id, None)
        return db.id

    def list(self) -> list[PostgresDatabaseSpec]:
        with self._lock:
            return list(self.databases.values())

    # --- connection + introspection --------------------------------------

    def test_connection(self, db: PostgresDatabaseSpec) -> tuple[bool, str | None]:
        """test_connection action (postgres_database_controller.ex:91-111):
        reachability → connect/auth. Parquet sources test the directory."""
        if db.path is not None:
            if os.path.isdir(db.path):
                return True, None
            return False, f"path {db.path!r} is not a directory"
        import socket

        try:
            with socket.create_connection((db.hostname, db.port), timeout=5):
                pass
        except OSError as e:
            return False, f"tcp unreachable: {e}"
        try:
            client = self._client(db)
            client.connect()
            client.close()
        except Exception as e:  # noqa: BLE001 — auth/protocol failure detail
            return False, str(e)[:300]
        return True, None

    def _client(self, db: PostgresDatabaseSpec):
        from sequin_spark.sources.replication import ReplicationClient

        return ReplicationClient(
            host=db.hostname, port=db.port, database=db.database or "postgres",
            user=db.username or "postgres", password=db.password,
            replication=False,
        )

    def refresh_tables(self, db: PostgresDatabaseSpec) -> list[dict]:
        """refresh_tables action — re-introspect and cache
        (postgres_database_table.ex shape)."""
        tables = (
            self._introspect_parquet(db) if db.path is not None
            else self._introspect_live(db)
        )
        with self._lock:
            self.tables[db.id] = tables
        return tables

    def tables_for(self, db: PostgresDatabaseSpec) -> list[dict]:
        with self._lock:
            cached = self.tables.get(db.id)
        return cached if cached is not None else self.refresh_tables(db)

    def _introspect_parquet(self, db: PostgresDatabaseSpec) -> list[dict]:
        """Footer-schema introspection of a parquet directory: each
        ``<name>.parquet`` (file or dataset dir) is a table in schema
        ``public``. No row reads — O(tables) metadata only."""
        out = []
        for entry in sorted(os.listdir(db.path)):
            if not entry.endswith(".parquet"):
                continue
            full = os.path.join(db.path, entry)
            name = entry[: -len(".parquet")]
            if os.path.isdir(full):
                parts = [f for f in os.listdir(full) if f.endswith(".parquet")]
                if not parts:
                    continue
                schema = pq.read_schema(os.path.join(full, parts[0]))
            else:
                schema = pq.read_schema(full)
            pks = set(db.primary_keys.get(name) or [])
            if not pks and schema.names:
                # heuristic: a key-ish leading column ("id", "<t>_id",
                # TPC-H "x_ykey") — overridable via primary_keys config
                first = schema.names[0]
                if first.endswith(("key", "_id")) or first == "id":
                    pks = {first}
            out.append({
                "oid": _table_oid("public", name),
                "schema": "public",
                "name": name,
                "columns": [
                    {
                        "attnum": i + 1,
                        "name": f.name,
                        "type": _pg_type(f.type),
                        "is_pk?": f.name in pks,
                        "pg_typtype": "b",
                    }
                    for i, f in enumerate(schema)
                ],
            })
        return out

    def _introspect_live(self, db: PostgresDatabaseSpec) -> list[dict]:
        """Live-Postgres introspection over the simple-query protocol
        (postgres.ex list-tables query via sources/replication.py)."""
        client = self._client(db)
        client.connect()
        try:
            rows = client.simple_query(_LIVE_TABLES_SQL)
        finally:
            client.close()
        tables: dict[int, dict] = {}
        for nsp, rel, oid, attnum, att, typ, typtype, is_pk in rows:
            t = tables.setdefault(int(oid), {
                "oid": int(oid), "schema": nsp, "name": rel, "columns": [],
            })
            t["columns"].append({
                "attnum": int(attnum), "name": att, "type": typ,
                "is_pk?": str(is_pk) in ("t", "true", "True"),
                "pg_typtype": typtype,
            })
        return list(tables.values())
