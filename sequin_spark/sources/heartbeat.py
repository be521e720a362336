"""Replication heartbeats: emit-and-verify slot liveness.

A logical slot with no table traffic looks identical to a dead
connection.  The reference closes that gap by periodically emitting a
logical message on the PRIMARY connection (``SELECT
pg_logical_emit_message(true, 'sequin.heartbeat.1', payload)``) and
verifying it comes back through the SLOT — the round trip proves the
full WAL → decoder path end-to-end (slot_processor_server.ex:262-296
emit, :454-494 verify cond chain, :497-515 send, :626-628 fold).

This port keeps the exact state machine; the emitting connection is the
repo's own PG client in simple-query mode and the receive side is a
hook the ingest worker calls per decoded WAL message.  The timer
cadence (15 s emit, periodic verify) belongs to the caller's loop —
``run_supervised`` wires it when a ``heartbeat`` monitor is passed.
"""

from __future__ import annotations

import json
import time
import uuid

from sequin_spark.sources.pgoutput import LogicalMessage
from sequin_spark.sources.replication import lsn_to_int

HEARTBEAT_PREFIX = "sequin.heartbeat.1"
# Constants.logical_messages_table_name — the <PG14 heartbeat channel
# (pg_logical_emit_message landed in PG 9.6 but the reference routes
# <14 through a published TABLE upsert: postgres.ex:1300-1335,
# slot_processor_server.ex:640-670 logical_message_table_upsert?)
LOGICAL_MESSAGES_TABLE = "sequin_logical_messages"
# slot_processor_server.ex @max_time_between_heartbeat_emissions_min /
# @max_time_between_heartbeat_emit_and_receive_min
MAX_EMISSION_AGE_S = 5 * 60
MAX_EMIT_TO_RECEIVE_S = 10 * 60


class HeartbeatMonitor:
    """Emit heartbeats on a primary connection; fold receipts from the
    slot stream; answer "is this slot alive?".

    ``clock`` is injectable for tests (defaults to time.time).
    ``pg_major_version`` selects the channel: >=14 emits a logical
    message; <14 upserts into the published
    ``public.sequin_logical_messages`` table, and the receive side
    intercepts that table's upserts from the slot stream instead
    (exs:1076 'emits heartbeat messages for older postgres version').
    """

    def __init__(self, clock=time.time, pg_major_version: int = 17):
        self._clock = clock
        self.pg_major_version = pg_major_version
        self.current_heartbeat_id: str | None = None
        self.emitted_at: float | None = None
        self.emitted_lsn: int | None = None
        self.message_received_since_last_heartbeat = False
        self.last_flushed_commit_lsn: int | None = None
        self.received_count = 0

    # --- emit side (primary conn, non-replication session) ---------------

    @property
    def intercepts_table_upserts(self) -> bool:
        """<PG14: heartbeats travel as upserts to the published
        logical-messages table; those rows are HEARTBEATS, not user
        traffic, and must never reach consumers
        (slot_processor_server.ex:640-646)."""
        return self.pg_major_version < 14

    def emit(self, client) -> int:
        """Emit one heartbeat; returns its WAL LSN.  ``client`` is a
        connected ReplicationClient(replication=False)."""
        hb_id = str(uuid.uuid4())
        payload = json.dumps({
            "id": hb_id,
            "emitted_at": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime(self._clock())),
            "version": "1.0",
        })
        quoted = payload.replace("'", "''")
        if self.intercepts_table_upserts:
            # the reference's <14 upsert (unique on (slot_id, subject))
            # + pg_current_wal_lsn() for the emitted cursor
            sql = (
                f"INSERT INTO public.{LOGICAL_MESSAGES_TABLE} "
                "(slot_id, subject, content) VALUES "
                f"('slot', '{HEARTBEAT_PREFIX}', '{quoted}') "
                "ON CONFLICT (slot_id, subject) DO UPDATE SET "
                "content = EXCLUDED.content, updated_at = NOW() "
                "RETURNING pg_current_wal_lsn()")
        else:
            sql = ("SELECT pg_logical_emit_message(true, "
                   f"'{HEARTBEAT_PREFIX}', '{quoted}')")
        rows = client.simple_query(sql)
        lsn = lsn_to_int(rows[0][0]) if rows and rows[0][0] else 0
        self.current_heartbeat_id = hb_id
        self.emitted_at = self._clock()
        self.emitted_lsn = lsn
        self.message_received_since_last_heartbeat = False
        return lsn

    # --- receive side (called by the ingest loop per decoded message) ----

    def on_wal_message(self, msg) -> None:
        """Fold one decoded pgoutput message from the slot stream."""
        if isinstance(msg, LogicalMessage) and msg.prefix.startswith(
                "sequin.heartbeat"):
            try:
                content = json.loads(msg.content.decode())
            except (ValueError, UnicodeDecodeError):
                content = {}
            if content.get("id") == self.current_heartbeat_id:
                self.current_heartbeat_id = None  # round trip complete
                self.received_count += 1
            return
        self.message_received_since_last_heartbeat = True

    def on_table_heartbeat(self, event: dict) -> None:
        """Fold one intercepted logical-messages-table upsert EVENT
        (<PG14 receive side; the ingest worker routes events whose
        table is the logical-messages table here instead of flushing
        them — slot_processor_server.ex:646-670
        handle_logical_message_content applied to the `content`
        column)."""
        try:
            content = json.loads(
                (event.get("record") or {}).get("content") or "{}")
        except ValueError:
            content = {}
        if content.get("id") == self.current_heartbeat_id:
            self.current_heartbeat_id = None
            self.received_count += 1

    def on_flushed(self, commit_lsn: int) -> None:
        self.last_flushed_commit_lsn = commit_lsn

    # --- verification (the :verify_heartbeat cond chain) ------------------

    def verify(self) -> tuple[str, str]:
        """(status, reason) with status ∈ {"ok", "indeterminate",
        "fail"} — port of slot_processor_server.ex:454-494, clause
        order preserved.

        ``too_soon`` is INDETERMINATE, not a failure: the reference's
        caller (slot_processor_server.ex:403-408) logs it at info and
        keeps running — a heartbeat still inside the emit-to-receive
        window on a quiet slot proves nothing either way.  A supervisor
        that restarted on it would tear down a healthy connection after
        every emit (perpetual churn on idle databases); restart only on
        "fail" (see ``is_alive``)."""
        now = self._clock()
        cur, emitted = self.current_heartbeat_id, self.emitted_at
        if cur is None and emitted is not None:
            if now - emitted <= MAX_EMISSION_AGE_S:
                return "ok", "last heartbeat was received"
            return "fail", "no_recent_heartbeat"
        if cur is None and emitted is None:
            return "fail", "no_heartbeat"
        if (self.emitted_lsn is not None
                and self.last_flushed_commit_lsn is not None
                and self.last_flushed_commit_lsn > self.emitted_lsn):
            # the slot advanced PAST our heartbeat without us seeing it
            return "fail", "lsn_advanced"
        if cur is not None and self.message_received_since_last_heartbeat:
            return "ok", "outstanding heartbeat but messages received"
        if cur is not None and emitted is not None and (
                now - emitted <= MAX_EMIT_TO_RECEIVE_S):
            return "indeterminate", "too_soon"
        if cur is not None:
            return "fail", "stale_connection"
        return "fail", "no_last_commit_lsn"  # pragma: no cover

    def is_alive(self) -> bool:
        """Restart predicate: only a definite failure counts as dead —
        ok and indeterminate both keep the connection."""
        return self.verify()[0] != "fail"
