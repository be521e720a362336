"""Replication heartbeat emit + verify (slot_processor_server.ex
:262-296 emit, :454-494 verify chain, :626-628 fold)."""

import json
import struct

from sequin_spark.sources.heartbeat import (
    HEARTBEAT_PREFIX,
    MAX_EMISSION_AGE_S,
    MAX_EMIT_TO_RECEIVE_S,
    HeartbeatMonitor,
)
from sequin_spark.sources.pgoutput import LogicalMessage
from sequin_spark.sources.replication import ReplicationClient

from tests.test_replication import FakeWalSender


class Clock:
    def __init__(self, t=1000.0):
        self.t = t

    def __call__(self):
        return self.t


def _hb_msg(hb_id, prefix=HEARTBEAT_PREFIX):
    content = json.dumps({"id": hb_id, "version": "1.0"}).encode()
    return LogicalMessage(True, 0x9000, prefix, content)


def test_emit_over_wire_and_roundtrip():
    srv = FakeWalSender([])
    client = ReplicationClient(
        "127.0.0.1", srv.port, user="u", database="d", password="s3cret",
        replication=False, receive_timeout=0.05)
    client.connect()
    clock = Clock()
    mon = HeartbeatMonitor(clock=clock)
    try:
        lsn = mon.emit(client)
        assert lsn == 0x9000
        sql = srv.queries[-1]
        assert sql.startswith("SELECT pg_logical_emit_message(true, "
                              f"'{HEARTBEAT_PREFIX}'")
        payload = json.loads(sql.split(", '", 2)[2][:-2])
        assert payload["id"] == mon.current_heartbeat_id
        assert payload["version"] == "1.0"
        # outstanding and too recent to verify
        assert mon.verify() == ("indeterminate", "too_soon")
        assert mon.is_alive()  # indeterminate must NOT trigger a restart
        # the heartbeat comes back through the slot stream
        mon.on_wal_message(_hb_msg(mon.current_heartbeat_id))
        assert mon.current_heartbeat_id is None and mon.received_count == 1
        assert mon.verify() == ("ok", "last heartbeat was received")
    finally:
        client.close()
        srv.close()


def test_verify_chain_clauses():
    clock = Clock()
    mon = HeartbeatMonitor(clock=clock)
    assert mon.verify() == ("fail", "no_heartbeat")

    # received round trip, then time passes beyond the emission window
    mon.emitted_at = clock()
    mon.current_heartbeat_id = None
    clock.t += MAX_EMISSION_AGE_S + 1
    assert mon.verify() == ("fail", "no_recent_heartbeat")

    # outstanding + other traffic flowing = lagging but alive
    mon.current_heartbeat_id = "hb-1"
    mon.emitted_at = clock.t
    mon.emitted_lsn = 100
    mon.on_wal_message(LogicalMessage(True, 5, "other.prefix", b"{}"))
    assert mon.verify()[0] == "ok"

    # outstanding, silent, past the receive window = stale connection
    mon.message_received_since_last_heartbeat = False
    clock.t += MAX_EMIT_TO_RECEIVE_S + 1
    assert mon.verify() == ("fail", "stale_connection")
    assert not mon.is_alive()

    # slot advanced past our heartbeat without us seeing it
    mon.last_flushed_commit_lsn = 200
    assert mon.verify() == ("fail", "lsn_advanced")


def test_heartbeat_of_other_instance_ignored():
    mon = HeartbeatMonitor(clock=Clock())
    mon.current_heartbeat_id = "mine"
    mon.emitted_at = 1000.0
    mon.on_wal_message(_hb_msg("someone-elses"))
    # not our round trip — still outstanding, and heartbeat frames do
    # NOT count as ordinary traffic (reference folds them separately)
    assert mon.current_heartbeat_id == "mine"
    assert not mon.message_received_since_last_heartbeat


def test_worker_feeds_monitor(tmp_path):
    """Ingest worker wiring: decoded heartbeat logical messages reach
    the monitor; the flushed commit cursor lands in on_flushed."""
    from tests.test_replication import (
        LSN1,
        FakeWalSender,
        _connect,
        wal_script,
        xlog,
    )
    # build a script: heartbeat logical message + one committed txn
    mon = HeartbeatMonitor(clock=Clock())
    mon.current_heartbeat_id = "rt-1"
    mon.emitted_at = 999.0

    hb_frame = (
        b"M" + b"\x01" + struct.pack(">Q", 0x9000)
        + HEARTBEAT_PREFIX.encode() + b"\x00"
        + struct.pack(">i", len(b'{"id": "rt-1"}')) + b'{"id": "rt-1"}'
    )
    script = [xlog(90, hb_frame)] + wal_script()
    srv = FakeWalSender(script)
    client = _connect(srv)
    try:
        from sequin_spark.sources.replication import ReplicationIngestWorker

        client.start_replication("sequin_slot", "pub", pg_major_version=16)
        worker = ReplicationIngestWorker(
            client, str(tmp_path / "cdc"), heartbeat=mon,
            flush_seconds=0.1, ack_interval=0.2)
        worker.run(max_seconds=2.0)
        assert mon.current_heartbeat_id is None  # round trip folded
        assert mon.received_count == 1
        assert mon.message_received_since_last_heartbeat  # txn traffic
        assert mon.last_flushed_commit_lsn == worker.flushed_lsn > 0
        assert mon.verify()[0] == "ok"
    finally:
        client.close()
        srv.close()
