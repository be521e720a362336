"""Replication socket client against a fake walsender.

The fake server speaks the public PostgreSQL v3 protocol server-side:
startup + cleartext auth, simple-query cycles (IDENTIFY_SYSTEM, slot
metadata), START_REPLICATION → CopyBothResponse, then streams scripted
XLogData/keepalive copies and records the client's standby-status-update
acks — the same fake-peer pattern as tests/test_kafka.py's broker.

Covers the reference's slot-producer entry point end to end
(slot_producer.ex:245-267 connect/start_replication, :501-514 keepalive,
:733-758 LSN acks): fake server → socket client → pgoutput decoder →
CDC-log parquet → Spark pipeline → sink, with acks asserted.
"""

import json
import socket
import struct
import threading
import time

import pytest

from sequin_spark.plans.spec import ConsumerSpec
from sequin_spark.sources.cdc_log import read_cdc_log
from sequin_spark.sources.replication import (
    ReplicationClient,
    ReplicationError,
    ReplicationIngestWorker,
    int_to_lsn,
    lsn_to_int,
    pg_clock_micros,
)
from sequin_spark.streaming.pipeline import ConsumerPipeline


# --- pgoutput frame builders (public wire format, as in test_pgoutput) ---

def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def _tuple(*vals) -> bytes:
    out = struct.pack(">H", len(vals))
    for v in vals:
        if v is None:
            out += b"n"
        else:
            b = str(v).encode()
            out += b"t" + struct.pack(">i", len(b)) + b
    return out


def relation_frame(oid=101, ns="public", name="characters", cols=None):
    cols = cols or [(1, "id", 20), (0, "name", 25)]
    body = b""
    for flags, cname, toid in cols:
        body += bytes([flags]) + _cstr(cname) + struct.pack(">Ii", toid, -1)
    return (
        b"R" + struct.pack(">I", oid) + _cstr(ns) + _cstr(name) + b"d"
        + struct.pack(">H", len(cols)) + body
    )


def begin_frame(lsn, xid=1):
    return b"B" + struct.pack(">QQI", lsn, 777_000_000, xid)


def commit_frame(lsn):
    return b"C" + struct.pack(">BQQQ", 0, lsn, lsn + 1, 777_000_000)


def insert_frame(oid, *vals):
    return b"I" + struct.pack(">I", oid) + b"N" + _tuple(*vals)


# --- fake walsender -------------------------------------------------------

def msg(mtype: bytes, payload: bytes = b"") -> bytes:
    return mtype + struct.pack(">i", len(payload) + 4) + payload


def xlog(wal_start: int, frame: bytes) -> bytes:
    """CopyData wrapping an XLogData copy."""
    inner = b"w" + struct.pack(">QQQ", wal_start, wal_start, pg_clock_micros()) + frame
    return msg(b"d", inner)


def keepalive(wal_end: int, reply_requested: bool) -> bytes:
    inner = b"k" + struct.pack(">QQB", wal_end, pg_clock_micros(), 1 if reply_requested else 0)
    return msg(b"d", inner)


class FakeWalSender:
    """One-connection fake Postgres in replication mode.

    `script` is a list of raw backend messages (already framed) streamed
    after CopyBothResponse.  Incoming standby-status updates land in
    `self.acks` (list of (written, flushed, applied, reply) tuples).
    """

    def __init__(self, script, password="s3cret", restart_lsn="0/0",
                 missing_slot=False, auth="cleartext", ssl_ctx=None,
                 ssl_refuse=False, fail_query_then_die=None):
        self.script = script
        # disconnect-with-pending-error: a query containing this
        # substring gets an ErrorResponse and then the server hangs up
        # WITHOUT ReadyForQuery (crash-after-error shape)
        self.fail_query_then_die = fail_query_then_die
        self.password = password
        self.restart_lsn = restart_lsn
        self.missing_slot = missing_slot
        self.auth = auth  # "cleartext" | "scram"
        self.ssl_ctx = ssl_ctx  # server-side SSLContext → handle SSLRequest
        self.ssl_refuse = ssl_refuse  # answer 'N' to SSLRequest
        self.acks = []
        self.queries = []
        self.startup_params = {}
        self.streaming_started = threading.Event()
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        s.listen(1)
        self.port = s.getsockname()[1]
        self._srv = s
        threading.Thread(target=self._serve, daemon=True).start()

    def _auth_scram(self, conn) -> bool:
        """Full 4-leg SCRAM-SHA-256 exchange (AuthenticationSASL →
        SASLInitialResponse → SASLContinue → SASLResponse → SASLFinal)
        using the repo's ScramServer verifier."""
        from sequin_spark.sources.scram import ScramError, ScramServer

        srv = ScramServer(self.password)
        conn.sendall(msg(b"R", struct.pack(">i", 10) + b"SCRAM-SHA-256\x00\x00"))
        mtype, payload = self._read_msg(conn)
        assert mtype == b"p"
        mech_end = payload.index(b"\x00")
        self.sasl_mechanism = payload[:mech_end].decode()
        (ilen,) = struct.unpack_from(">i", payload, mech_end + 1)
        client_first = payload[mech_end + 5 : mech_end + 5 + ilen].decode()
        server_first = srv.first(client_first)
        conn.sendall(msg(b"R", struct.pack(">i", 11) + server_first.encode()))
        mtype, payload = self._read_msg(conn)
        assert mtype == b"p"
        try:
            server_final = srv.final(payload.decode())
        except ScramError:
            conn.sendall(msg(
                b"E",
                b"SFATAL\x00C28P01\x00Mpassword authentication failed\x00\x00"))
            return False
        conn.sendall(msg(b"R", struct.pack(">i", 12) + server_final.encode()))
        return True

    # --- protocol plumbing ---
    def _read_exact(self, n):
        buf = self._rd.read(n)
        if buf is None or len(buf) < n:
            raise ConnectionError("client gone")
        return buf

    def _read_msg(self, conn):
        head = self._read_exact(5)
        (ln,) = struct.unpack(">i", head[1:5])
        return head[:1], self._read_exact(ln - 4)

    def _serve(self):
        try:
            self._serve_inner()
        except (ConnectionError, OSError, struct.error):
            pass  # client hung up mid-handshake (expected in refuse tests)

    def _serve_inner(self):
        conn, _ = self._srv.accept()
        conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._rd = conn.makefile("rb")
        # startup message (untyped): int32 len, int32 proto, k\0v\0...\0
        (ln,) = struct.unpack(">i", self._read_exact(4))
        body = self._read_exact(ln - 4)
        (proto,) = struct.unpack_from(">i", body, 0)
        if proto == 80877103:  # SSLRequest before the startup packet
            if self.ssl_refuse or self.ssl_ctx is None:
                conn.sendall(b"N")
            else:
                conn.sendall(b"S")
                conn = self.ssl_ctx.wrap_socket(conn, server_side=True)
                self._rd = conn.makefile("rb")
            (ln,) = struct.unpack(">i", self._read_exact(4))
            body = self._read_exact(ln - 4)
            (proto,) = struct.unpack_from(">i", body, 0)
        assert proto == 196608
        parts = body[4:].split(b"\x00")[:-2]
        self.startup_params = {
            parts[i].decode(): parts[i + 1].decode() for i in range(0, len(parts), 2)
        }
        if self.auth == "scram":
            if not self._auth_scram(conn):
                conn.close()
                return
        elif self.auth == "scram_garbage":
            # a proxy mid-restart: offers SCRAM then answers the
            # client-first with a malformed server-first payload
            conn.sendall(msg(
                b"R", struct.pack(">i", 10) + b"SCRAM-SHA-256\x00\x00"))
            self._read_msg(conn)  # client SASLInitialResponse
            conn.sendall(msg(
                b"R", struct.pack(">i", 11) + b"this-is-not-scram"))
            conn.close()
            return
        else:
            # cleartext password auth
            conn.sendall(msg(b"R", struct.pack(">i", 3)))
            mtype, payload = self._read_msg(conn)
            if mtype != b"p" or payload[:-1].decode() != self.password:
                conn.sendall(
                    msg(b"E", b"SFATAL\x00C28P01\x00Mpassword authentication failed\x00\x00")
                )
                conn.close()
                return
        conn.sendall(msg(b"R", struct.pack(">i", 0)))
        conn.sendall(msg(b"S", _cstr("server_version") + _cstr("16.3")))
        conn.sendall(msg(b"K", struct.pack(">ii", 1234, 5678)))
        conn.sendall(msg(b"Z", b"I"))
        # query loop
        while True:
            try:
                mtype, payload = self._read_msg(conn)
            except ConnectionError:
                return
            if mtype == b"X":
                conn.close()
                return
            if mtype != b"Q":
                continue
            sql = payload[:-1].decode()
            self.queries.append(sql)
            if sql.startswith("START_REPLICATION"):
                if self.missing_slot:
                    # ERROR 42704 undefined_object — what a real walsender
                    # sends for START_REPLICATION on a nonexistent slot
                    conn.sendall(msg(
                        b"E",
                        b"SERROR\x00C42704\x00Mreplication slot "
                        b"\"sequin_slot\" does not exist\x00\x00",
                    ))
                    continue
                conn.sendall(msg(b"W", struct.pack(">BH", 0, 0)))
                self.streaming_started.set()
                self._stream(conn)
                return
            self._answer_query(conn, sql)

    def _answer_query(self, conn, sql):
        if (self.fail_query_then_die
                and self.fail_query_then_die in sql):
            conn.sendall(msg(
                b"E",
                b"SERROR\x00C53100\x00Mcould not extend file "
                b"\"base/16384/wal_events\": No space left on device"
                b"\x00\x00"))
            # an open makefile() handle defers socket.close(); shutdown
            # sends the FIN regardless, so the client sees EOF not a hang
            conn.shutdown(socket.SHUT_RDWR)
            conn.close()
            return
        def row_desc(names):
            body = struct.pack(">h", len(names))
            for n in names:
                body += _cstr(n) + struct.pack(">ihihih", 0, 0, 25, -1, -1, 0)
            return msg(b"T", body)

        def data_row(vals):
            body = struct.pack(">h", len(vals))
            for v in vals:
                if v is None:
                    body += struct.pack(">i", -1)
                else:
                    b = str(v).encode()
                    body += struct.pack(">i", len(b)) + b
            return msg(b"D", body)

        if sql == "IDENTIFY_SYSTEM":
            conn.sendall(row_desc(["systemid", "timeline", "xlogpos", "dbname"]))
            conn.sendall(data_row(["7000", "1", "0/5000", "postgres"]))
        elif "pg_logical_emit_message" in sql:
            conn.sendall(row_desc(["pg_logical_emit_message"]))
            conn.sendall(data_row(["0/9000"]))
        elif "pg_replication_slots" in sql:
            conn.sendall(row_desc(["restart_lsn"]))
            conn.sendall(data_row([self.restart_lsn]))
        else:
            conn.sendall(row_desc(["?"]))
        conn.sendall(msg(b"C", _cstr("SELECT 1")))
        conn.sendall(msg(b"Z", b"I"))

    def _stream(self, conn):
        for m in self.script:
            conn.sendall(m)
        # then sit reading standby-status updates until the client leaves
        while True:
            try:
                mtype, payload = self._read_msg(conn)
            except ConnectionError:
                return
            if mtype == b"X" or mtype == b"c":
                return
            if mtype == b"d" and payload[:1] == b"r":
                written, flushed, applied = struct.unpack_from(">QQQ", payload, 1)
                reply = payload[33]
                self.acks.append((written, flushed, applied, reply))

    def close(self):
        self._srv.close()


# --- tests ----------------------------------------------------------------

LSN1, LSN2 = lsn_to_int("0/1000"), lsn_to_int("0/2000")


def wal_script():
    return [
        xlog(100, relation_frame()),
        xlog(LSN1, begin_frame(LSN1, xid=10)),
        xlog(LSN1 + 1, insert_frame(101, "1", "arya")),
        xlog(LSN1 + 2, insert_frame(101, "2", "sansa")),
        xlog(LSN1 + 3, commit_frame(LSN1)),
        keepalive(LSN1 + 10, reply_requested=True),
        xlog(LSN2, begin_frame(LSN2, xid=11)),
        xlog(LSN2 + 1, insert_frame(101, "3", "bran")),
        xlog(LSN2 + 2, commit_frame(LSN2)),
    ]


def _connect(srv) -> ReplicationClient:
    client = ReplicationClient(
        "127.0.0.1", srv.port, user="replicator", database="postgres",
        password="s3cret", receive_timeout=0.05,
    )
    client.connect()
    return client


def test_lsn_helpers():
    assert lsn_to_int("0/16B3748") == 0x16B3748
    assert lsn_to_int("16/B374D848") == (0x16 << 32) | 0xB374D848
    assert int_to_lsn(lsn_to_int("16/B374D848")) == "16/B374D848"


def test_startup_queries_and_replication_options():
    srv = FakeWalSender(wal_script())
    client = _connect(srv)
    try:
        # startup carried replication=database (slot_producer.ex:191)
        ident = client.identify_system()
        assert ident["timeline"] == 1 and ident["xlogpos"] == "0/5000"
        assert srv.startup_params["replication"] == "database"
        assert srv.startup_params["user"] == "replicator"
        assert client.fetch_restart_lsn("seq") == 0
        client.start_replication("sequin_slot", "sequin_pub", pg_major_version=16)
        assert srv.streaming_started.wait(5)
        q = srv.queries[-1]
        # query shape per slot_producer.ex:763-769
        assert q.startswith("START_REPLICATION SLOT sequin_slot LOGICAL 0/0")
        assert "proto_version '1'" in q
        assert "publication_names 'sequin_pub'" in q
        assert "messages 'true'" in q
    finally:
        client.close()
        srv.close()


def test_replication_e2e_decode_pipeline_sink_and_acks(spark, tmp_path):
    """fake walsender → socket client → pgoutput decode → CDC-log parquet
    → Spark pipeline → file_log sink, LSN acks asserted."""
    from sequin_spark.streaming.metrics import ConsumerMetrics, prometheus_text

    srv = FakeWalSender(wal_script())
    client = _connect(srv)
    out_dir = tmp_path / "wal"
    metrics = ConsumerMetrics()
    worker = ReplicationIngestWorker(
        client, str(out_dir), flush_seconds=0.1, ack_interval=0.2,
        metrics=metrics, slot_name="sequin_slot",
    )
    try:
        client.start_replication("sequin_slot", "sequin_pub")
        worker.run(
            max_seconds=10,
            stop_when=lambda: any(a[1] == LSN2 for a in srv.acks),
        )
    finally:
        client.close()
        srv.close()
    assert worker.files_written >= 1
    # ingestion latency observed from XLogData/keepalive clocks and
    # exposed as a slot-labeled gauge (prometheus.ex:334-338)
    assert worker.ingestion_latency_us is not None
    assert 'sequin_ingestion_latency_us{slot="sequin_slot"}' in prometheus_text(metrics)
    # all three inserts landed, with transactional cursor bookkeeping
    ev = read_cdc_log(spark, str(out_dir))
    rows = {tuple(r) for r in ev.selectExpr(
        "record['id']", "record['name']", "commit_lsn", "commit_idx"
    ).collect()}
    assert rows == {
        ("1", "arya", LSN1, 0),
        ("2", "sansa", LSN1, 1),
        ("3", "bran", LSN2, 0),
    }
    # acks: monotone flushed LSNs, keepalive answered, final ack == last
    # flushed commit (standby-status written==flushed==applied,
    # slot_producer.ex:716-718)
    flushed = [a[1] for a in srv.acks]
    assert flushed == sorted(flushed)
    assert flushed[-1] == LSN2
    assert all(a[0] == a[1] == a[2] for a in srv.acks)
    # the keepalive with reply_requested produced an ack at LSN1 — i.e.
    # an ack arrived before the second transaction was flushed
    assert LSN1 in flushed
    # pipeline → sink over the ingested events
    sink_dir = tmp_path / "sink"
    spec = ConsumerSpec(
        name="repl", sink_type="file_log", sink_config={"path": str(sink_dir)},
        transform="record_only",
    )
    pipe = ConsumerPipeline(spec, state_dir=str(tmp_path / "state"))
    stats = pipe.run_batch(ev)
    assert stats["delivered"] == 3
    vals = []
    for f in sink_dir.iterdir():
        vals += [json.loads(json.loads(line)["value"])["name"] for line in f.read_text().splitlines()]
    assert sorted(vals) == ["arya", "bran", "sansa"]


def test_ack_monotonicity_guard():
    srv = FakeWalSender(wal_script())
    client = _connect(srv)
    try:
        client.start_replication("s", "p")
        client.send_standby_status(500)
        with pytest.raises(ReplicationError, match="backwards"):
            client.send_standby_status(400)
    finally:
        client.close()
        srv.close()


def test_bad_password_raises():
    srv = FakeWalSender([], password="other")
    client = ReplicationClient(
        "127.0.0.1", srv.port, user="u", database="d", password="wrong",
    )
    with pytest.raises((ReplicationError, ConnectionError, OSError)):
        client.connect()
        client.simple_query("IDENTIFY_SYSTEM")
    srv.close()


def test_worker_only_acks_committed_transactions(spark, tmp_path):
    """An open (uncommitted) transaction must never be flushed or acked:
    crash-restart replays whole transactions (checkpoint-is-ack)."""
    script = [
        xlog(100, relation_frame()),
        xlog(LSN1, begin_frame(LSN1)),
        xlog(LSN1 + 1, insert_frame(101, "1", "arya")),
        xlog(LSN1 + 2, commit_frame(LSN1)),
        xlog(LSN2, begin_frame(LSN2)),
        xlog(LSN2 + 1, insert_frame(101, "9", "dangling")),
        # no commit for txn 2
    ]
    srv = FakeWalSender(script)
    client = _connect(srv)
    out_dir = tmp_path / "wal"
    worker = ReplicationIngestWorker(client, str(out_dir), flush_seconds=0.05, ack_interval=0.1)
    try:
        client.start_replication("s", "p")
        worker.run(max_seconds=1.5, stop_when=lambda: any(a[1] == LSN1 for a in srv.acks))
    finally:
        client.close()
        srv.close()
    ev = read_cdc_log(spark, str(out_dir))
    assert [r["id"] for r in ev.selectExpr("record['id'] as id").collect()] == ["1"]
    assert worker.flushed_lsn == LSN1
    assert all(a[1] <= LSN1 for a in srv.acks)


class DroppingWalSender(FakeWalSender):
    """Streams its script, waits for ONE standby-status ack, then drops
    the TCP connection — simulates a walsender crash/primary failover."""

    def _stream(self, conn):
        for m in self.script:
            conn.sendall(m)
        deadline = time.time() + 10
        while time.time() < deadline:
            try:
                mtype, payload = self._read_msg(conn)
            except ConnectionError:
                return
            if mtype == b"d" and payload[:1] == b"r":
                written, flushed, applied = struct.unpack_from(">QQQ", payload, 1)
                self.acks.append((written, flushed, applied, payload[33]))
                break
        # the makefile() reader holds a dup of the fd — close() alone
        # would not send FIN; shutdown() does
        import socket as _socket

        try:
            conn.shutdown(_socket.SHUT_RDWR)
        except OSError:
            pass
        conn.close()


def test_supervised_reconnect_resumes_from_server_cursor(tmp_path):
    """run_supervised (OTP SlotSupervisor restart parity): the first
    walsender dies after txn 1 is acked; the loop backs off, reconnects
    to the standby, resumes from the SERVER-side restart_lsn (the slot's
    cursor = our last flushed ack), and ingests txn 2. Health
    transitions observed, no local cursor state involved."""
    import pyarrow.parquet as pq

    from sequin_spark.sources.replication import run_supervised

    script1 = [
        xlog(100, relation_frame()),
        xlog(LSN1, begin_frame(LSN1, xid=10)),
        xlog(LSN1 + 1, insert_frame(101, "1", "arya")),
        xlog(LSN1 + 2, commit_frame(LSN1)),
    ]
    script2 = [
        xlog(100, relation_frame()),  # new connection re-sends Relation
        xlog(LSN2, begin_frame(LSN2, xid=11)),
        xlog(LSN2 + 1, insert_frame(101, "2", "sansa")),
        xlog(LSN2 + 2, commit_frame(LSN2)),
    ]
    s1 = DroppingWalSender(script1)
    # the slot's restart_lsn reflects the ack the first server received
    s2 = FakeWalSender(script2, restart_lsn="0/1000")
    servers = [s1, s2]

    def factory():
        srv = servers.pop(0) if servers else s2
        return ReplicationClient(
            "127.0.0.1", srv.port, user="replicator", database="postgres",
            password="s3cret", receive_timeout=0.05,
        )

    out_dir = tmp_path / "wal"
    health = []

    def done():
        try:
            files = list(out_dir.glob("*.parquet"))
            return sum(pq.read_table(str(f)).num_rows for f in files) >= 2
        except OSError:
            return False

    worker = run_supervised(
        factory, str(out_dir), slot_name="sequin_slot",
        publication="sequin_pub", max_seconds=15, stop_when=done,
        initial_backoff=0.05, max_backoff=0.2,
        on_health=lambda ev, detail: health.append(ev),
        flush_seconds=0.05, ack_interval=0.05,
    )
    assert worker is not None
    # both transactions landed in the CDC log
    rows = []
    for f in sorted(out_dir.glob("*.parquet")):
        rows.extend(pq.read_table(str(f)).to_pylist())
    lsns = {r["commit_lsn"] for r in rows}
    assert LSN1 in lsns and LSN2 in lsns
    # server 1 got the txn-1 ack before dying; server 2 was asked to
    # resume from the slot cursor, not from 0/0
    assert any(a[1] == LSN1 for a in s1.acks)
    resume = [q for q in s2.queries if q.startswith("START_REPLICATION")]
    assert resume and "LOGICAL 0/1000" in resume[0]
    # health saw connect → disconnect → connect
    assert health[0] == "replication_connected"
    assert "replication_disconnected" in health
    assert health.count("replication_connected") >= 2
    s1.close()
    s2.close()
