"""Postgres WalPipeline sink — change retention into a user table.

Reference: wal_pipeline_server.ex:393-442 — batched INSERTs of wal_events
``(seq, source_database_id, source_table_schema, source_table_name,
record_pk, record jsonb, changes jsonb, action, committed_at,
transaction_annotations)`` with ``ON CONFLICT DO NOTHING`` dedup on the
``(source_database_id, committed_at, seq, record_pk)`` unique index,
1000-row batches.

The SQL builder is a pure function (tested without a database); the
transport uses psycopg2 when installed, otherwise the sink fails loudly
at open(). At scale, prefer the engine's parquet/Delta event log and
bulk-load into Postgres — per-row INSERT through the driver is the
reference's single-node shape, not the 100 TB path.
"""

from __future__ import annotations

import json

from sequin_spark.sinks.base import Sink, SinkBatch

WAL_EVENT_COLUMNS = (
    "seq", "source_database_id", "source_table_schema", "source_table_name",
    "record_pk", "record", "changes", "action", "committed_at",
    "transaction_annotations",
)

CONFLICT_KEY = ("source_database_id", "committed_at", "seq", "record_pk")


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return str(v)
    if isinstance(v, dict):
        v = json.dumps(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


def build_wal_insert_sql(table: str, rows: list[dict]) -> str:
    """Batched INSERT ... ON CONFLICT DO NOTHING (the reference's
    execute_values shape)."""
    cols = ", ".join(WAL_EVENT_COLUMNS)
    values = ",\n".join(
        "(" + ", ".join(_sql_literal(row.get(c)) for c in WAL_EVENT_COLUMNS) + ")"
        for row in rows
    )
    conflict = ", ".join(CONFLICT_KEY)
    return (
        f"INSERT INTO {table} ({cols})\nVALUES {values}\n"
        f"ON CONFLICT ({conflict}) DO NOTHING"
    )


def wal_event_row(delivery_row: dict, source_database_id: str = "00000000-0000-0000-0000-000000000000") -> dict:
    """Map a pipeline delivery row into the wal_events shape."""
    value = delivery_row.get("value")
    try:
        payload = json.loads(value) if isinstance(value, str) else (value or {})
    except ValueError:
        payload = {"raw": value}
    return {
        "seq": delivery_row.get("commit_lsn"),
        "source_database_id": source_database_id,
        "source_table_schema": payload.get("metadata", {}).get("table_schema", "public")
        if isinstance(payload, dict) else "public",
        "source_table_name": payload.get("metadata", {}).get("table_name", "")
        if isinstance(payload, dict) else "",
        "record_pk": delivery_row.get("group_id") or "",
        "record": payload.get("record", payload) if isinstance(payload, dict) else payload,
        "changes": payload.get("changes") if isinstance(payload, dict) else None,
        "action": payload.get("action", "insert") if isinstance(payload, dict) else "insert",
        "committed_at": delivery_row.get("committed_at"),
        "transaction_annotations": payload.get("metadata", {}).get("transaction_annotations")
        if isinstance(payload, dict) else None,
    }


class PostgresWalSink(Sink):
    sink_type = "postgres"
    default_batch_size = 1000

    def open(self) -> None:
        try:
            import psycopg2  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "postgres WalPipeline sink requires psycopg2, which is not "
                "installed in this environment (SQL construction is tested; "
                "see build_wal_insert_sql)"
            ) from e
        import psycopg2

        self._conn = psycopg2.connect(self.config["dsn"])

    def deliver(self, batch: SinkBatch) -> None:
        rows = [wal_event_row(r, self.config.get("source_database_id", "")) for r in batch.rows]
        sql = build_wal_insert_sql(self.config.get("table", "wal_events"), rows)
        with self._conn.cursor() as cur:
            cur.execute(sql)
        self._conn.commit()
