"""Recorded-pgoutput contract corpus for the replication path.

The sandbox has no real Postgres, so the scenarios of the reference's
ground-truth suite (test/sequin/postgres_replication_test.exs, 1634 LoC
against a live slot) are ported as RECORDED pgoutput byte-stream
fixtures: each scenario is a scripted frame sequence replayed through
the full path — fake walsender socket → ReplicationClient →
pgoutput decoder → ReplicationIngestWorker → canonical CDC-log events —
and the resulting event maps are asserted against the reference's
expectations (cited per scenario).

Frame bytes follow the public PostgreSQL logical streaming protocol
(§55.5 "Logical Replication Message Formats") — the same wire format a
real walsender would emit for these DDL/DML sequences.
"""

import struct

import pytest

from sequin_spark.sources.cdc_log import read_cdc_log
from sequin_spark.sources.pgoutput import (
    UNCHANGED_TOAST_MARKER,
    EventFolder,
    decode,
    events_from_messages,
)
from sequin_spark.sources.replication import ReplicationClient, ReplicationIngestWorker

from tests.test_replication import (
    FakeWalSender,
    begin_frame,
    commit_frame,
    insert_frame,
    keepalive,
    relation_frame,
    xlog,
)

# --- extra frame builders (full tuple-kind control: null / toast / text) --


def _cstr(s):
    return s.encode() + b"\x00"


def _tup(*vals) -> bytes:
    """Tuple data where vals may be None (null), Ellipsis (unchanged
    TOAST, kind 'u'), or text."""
    out = struct.pack(">H", len(vals))
    for v in vals:
        if v is None:
            out += b"n"
        elif v is Ellipsis:
            out += b"u"
        else:
            b = str(v).encode()
            out += b"t" + struct.pack(">i", len(b)) + b
    return out


def rel(oid, name, cols, ns="public", replident=b"d"):
    """Relation frame; cols = [(flags, name, type_oid)]."""
    body = b""
    for flags, cname, toid in cols:
        body += bytes([flags]) + _cstr(cname) + struct.pack(">Ii", toid, -1)
    return (
        b"R" + struct.pack(">I", oid) + _cstr(ns) + _cstr(name) + replident
        + struct.pack(">H", len(cols)) + body
    )


def ins(oid, *vals):
    return b"I" + struct.pack(">I", oid) + b"N" + _tup(*vals)


def upd(oid, new, old=None, old_kind=b"O"):
    body = b"U" + struct.pack(">I", oid)
    if old is not None:
        body += old_kind + _tup(*old)
    return body + b"N" + _tup(*new)


def dele(oid, old, old_kind=b"O"):
    return b"D" + struct.pack(">I", oid) + old_kind + _tup(*old)


def trunc(*oids):
    return b"T" + struct.pack(">IB", len(oids), 0) + struct.pack(
        f">{len(oids)}I", *oids
    )


def logical_msg(prefix, content, lsn=0, transactional=True):
    b = content.encode() if isinstance(content, str) else content
    return (
        b"M" + struct.pack(">BQ", 1 if transactional else 0, lsn)
        + _cstr(prefix) + struct.pack(">I", len(b)) + b
    )


def type_msg(oid=3802):
    return b"Y" + struct.pack(">I", oid)


# The reference's Characters table (CharacterFactory: id pk, name,
# house, planet, is_active, tags) — type oids are the real pg oids
# (int8=20, text=25, bool=16, text[]=1009, jsonb=3802, uuid=2950).
CHARACTERS = [(1, "id", 20), (0, "name", 25), (0, "house", 25),
              (0, "planet", 25), (0, "is_active", 16), (0, "tags", 1009)]
CHAR_OID = 7001
MULTI_PK = [(1, "id_integer", 20), (1, "id_string", 25), (1, "id_uuid", 2950),
            (0, "name", 25)]
MULTI_OID = 7002
TOASTY = [(1, "id", 20), (0, "name", 25), (0, "metadata", 3802)]
TOAST_OID = 7003

L1, L2, L3 = 9_000_100, 9_000_200, 9_000_300


def _txn(lsn, *frames, xid=1):
    """begin + frames + commit, each wrapped as XLogData copies."""
    out = [xlog(lsn, begin_frame(lsn, xid=xid))]
    out += [xlog(lsn + i + 1, f) for i, f in enumerate(frames)]
    out.append(xlog(lsn + len(frames) + 1, commit_frame(lsn)))
    return out


def replay(spark, tmp_path, script, final_lsn):
    """Stream recorded frames through the REAL client + ingest worker;
    return the canonical events sorted by (commit_lsn, commit_idx)."""
    srv = FakeWalSender(script)
    client = ReplicationClient(
        "127.0.0.1", srv.port, user="replicator", database="postgres",
        password="s3cret", receive_timeout=0.05,
    )
    client.connect()
    worker = ReplicationIngestWorker(
        client, str(tmp_path / "wal"), flush_seconds=0.05, ack_interval=0.1
    )
    try:
        client.start_replication("sequin_slot", "sequin_pub")
        worker.run(
            max_seconds=10,
            stop_when=lambda: any(a[1] == final_lsn for a in srv.acks),
        )
    finally:
        client.close()
        srv.close()
    ev = read_cdc_log(spark, str(tmp_path / "wal"))
    rows = [r.asDict(recursive=True) for r in ev.collect()]
    return sorted(rows, key=lambda r: (r["commit_lsn"], r["commit_idx"]))


# =========================================================================
# Scenario corpus. Each case: (name, frames, final_lsn, check(events)).
# Citations point at the test/sequin/postgres_replication_test.exs
# expectation the scenario ports.
# =========================================================================

def _chars_rel():
    return xlog(50, rel(CHAR_OID, "Characters", CHARACTERS))


def case_insert_basic():
    # exs:189 — insert → action insert, full record, changes nil,
    # record_pks = [id], table metadata
    frames = [_chars_rel()] + _txn(
        L1, ins(CHAR_OID, 1, "Paul", "Atreides", "Caladan", "t", "{heir}")
    )

    def check(ev):
        assert len(ev) == 1
        e = ev[0]
        assert e["action"] == "insert"
        assert e["record"] == {"id": "1", "name": "Paul", "house": "Atreides",
                               "planet": "Caladan", "is_active": "t",
                               "tags": "{heir}"}
        assert e["changes"] is None
        assert e["record_pks"] == ["1"]
        assert e["table_schema"] == "public"
        assert e["table_name"] == "Characters"
        assert e["table_oid"] == CHAR_OID
        assert e["commit_timestamp"] is not None

    return frames, L1, check


def case_update_identity_default():
    # exs:218 — replica identity default: no old tuple → changes == {}
    frames = [_chars_rel()] + _txn(
        L1, ins(CHAR_OID, 1, "Leto", "Atreides", "Caladan", "t", "{}")
    ) + _txn(
        L2, upd(CHAR_OID, new=(1, "Leto", "Atreides", "Arrakis", "t", "{}")),
        xid=2,
    )

    def check(ev):
        up = [e for e in ev if e["action"] == "update"]
        assert len(up) == 1
        assert up[0]["changes"] == {}
        assert up[0]["record"]["planet"] == "Arrakis"
        assert up[0]["record_pks"] == ["1"]

    return frames, L2, check


def case_update_identity_full():
    # exs:268 — replica identity full: changes carries the OLD values of
    # changed columns only
    frames = [xlog(50, rel(CHAR_OID, "characters_ident_full", CHARACTERS,
                           replident=b"f"))] + _txn(
        L1, ins(CHAR_OID, 1, "Paul", "Atreides", "Caladan", "t",
                '{heir,"kwisatz haderach"}')
    ) + _txn(
        L2,
        upd(CHAR_OID,
            new=(1, "Paul", "Emperor", "Arrakis", "f",
                 '{emperor,"kwisatz haderach"}'),
            old=(1, "Paul", "Atreides", "Caladan", "t",
                 '{heir,"kwisatz haderach"}')),
        xid=2,
    )

    def check(ev):
        up = [e for e in ev if e["action"] == "update"][0]
        assert up["changes"] == {
            "house": "Atreides", "planet": "Caladan", "is_active": "t",
            "tags": '{heir,"kwisatz haderach"}',
        }
        assert up["record"]["house"] == "Emperor"

    return frames, L2, check


def case_delete_identity_default():
    # exs:319 — delete w/ identity default: record = PK + nulls,
    # changes nil
    frames = [_chars_rel()] + _txn(
        L1, ins(CHAR_OID, 7, "Duncan", "Atreides", "Caladan", "t", "{}")
    ) + _txn(
        L2, dele(CHAR_OID, (7, None, None, None, None, None), old_kind=b"K"),
        xid=2,
    )

    def check(ev):
        de = [e for e in ev if e["action"] == "delete"][0]
        assert de["record"] == {"id": "7", "name": None, "house": None,
                                "planet": None, "is_active": None,
                                "tags": None}
        assert de["changes"] is None
        assert de["record_pks"] == ["7"]

    return frames, L2, check


def case_delete_identity_full():
    # exs:350 — delete w/ identity full: full pre-image as the record
    frames = [xlog(50, rel(CHAR_OID, "characters_ident_full", CHARACTERS,
                           replident=b"f"))] + _txn(
        L1, ins(CHAR_OID, 3, "Jessica", "Atreides", "Caladan", "t", "{bene}")
    ) + _txn(
        L2, dele(CHAR_OID, (3, "Jessica", "Atreides", "Caladan", "t", "{bene}")),
        xid=2,
    )

    def check(ev):
        de = [e for e in ev if e["action"] == "delete"][0]
        assert de["record"] == {"id": "3", "name": "Jessica",
                                "house": "Atreides", "planet": "Caladan",
                                "is_active": "t", "tags": "{bene}"}
        assert de["table_name"] == "characters_ident_full"

    return frames, L2, check


def case_multi_pk():
    # exs:380 — record_pks = [id_integer, id_string, id_uuid] in column
    # order
    u = "b8a9e1f0-0000-0000-0000-00000000abcd"
    frames = [xlog(50, rel(MULTI_OID, "characters_multi_pk", MULTI_PK))] + _txn(
        L1, ins(MULTI_OID, 42, "forty-two", u, "Gurney")
    )

    def check(ev):
        assert ev[0]["record_pks"] == ["42", "forty-two", u]
        assert ev[0]["group_id"] == f"42:forty-two:{u}"

    return frames, L1, check


def case_empty_array():
    # exs:426/550 — empty array arrives as the text literal '{}' and
    # must cast to [], NOT ['']
    frames = [_chars_rel()] + _txn(
        L1, ins(CHAR_OID, 9, "Chani", "Fremen", "Arrakis", "t", "{}")
    )

    def check(ev):
        assert ev[0]["record"]["tags"] == "{}"  # raw text repr

    return frames, L1, check


def case_array_update_to_empty():
    # exs:565 — non-empty → empty transition with identity full: changes
    # has the old array, record the empty one
    frames = [xlog(50, rel(CHAR_OID, "characters_ident_full", CHARACTERS,
                           replident=b"f"))] + _txn(
        L1, ins(CHAR_OID, 4, "Stilgar", "Fremen", "Arrakis", "t", "{sietch}")
    ) + _txn(
        L2,
        upd(CHAR_OID, new=(4, "Stilgar", "Fremen", "Arrakis", "t", "{}"),
            old=(4, "Stilgar", "Fremen", "Arrakis", "t", "{sietch}")),
        xid=2,
    )

    def check(ev):
        up = [e for e in ev if e["action"] == "update"][0]
        assert up["record"]["tags"] == "{}"
        assert up["changes"] == {"tags": "{sietch}"}

    return frames, L2, check


def case_transaction_annotations():
    # exs:443 — annotations set inside the txn ride on EVERY event of
    # that txn; the next txn (no set) carries none
    frames = [_chars_rel()] + [
        xlog(L1, begin_frame(L1, xid=5)),
        xlog(L1 + 1, logical_msg("sequin:transaction_annotations.set",
                                 '{ "username": "yahya" }', lsn=L1 + 1)),
        xlog(L1 + 2, ins(CHAR_OID, 1, "Paul", None, None, "t", "{}")),
        xlog(L1 + 3, ins(CHAR_OID, 2, "Leto", None, None, "t", "{}")),
        xlog(L1 + 4, commit_frame(L1)),
    ] + _txn(L2, ins(CHAR_OID, 3, "Chani", None, None, "t", "{}"), xid=6)

    def check(ev):
        first = [e for e in ev if e["commit_lsn"] == L1]
        assert len(first) == 2
        for e in first:
            assert e["transaction_annotations"] == '{ "username": "yahya" }'
        nxt = [e for e in ev if e["commit_lsn"] == L2][0]
        assert nxt["transaction_annotations"] is None

    return frames, L2, check


def case_annotations_clear():
    # exs:443 (second half) — clear inside a txn stops propagation for
    # later events in the SAME transaction
    frames = [_chars_rel()] + [
        xlog(L1, begin_frame(L1, xid=5)),
        xlog(L1 + 1, logical_msg("sequin:transaction_annotations.set",
                                 '{"a": 1}', lsn=L1 + 1)),
        xlog(L1 + 2, ins(CHAR_OID, 1, "one", None, None, "t", "{}")),
        xlog(L1 + 3, logical_msg("sequin:transaction_annotations.clear",
                                 "", lsn=L1 + 3)),
        xlog(L1 + 4, ins(CHAR_OID, 2, "two", None, None, "t", "{}")),
        xlog(L1 + 5, commit_frame(L1)),
    ]

    def check(ev):
        by_id = {e["record"]["id"]: e for e in ev}
        assert by_id["1"]["transaction_annotations"] == '{"a": 1}'
        assert by_id["2"]["transaction_annotations"] is None

    return frames, L1, check


def case_invalid_annotations_ignored():
    # exs:503 — malformed JSON annotations are dropped, events carry none
    frames = [_chars_rel()] + [
        xlog(L1, begin_frame(L1, xid=5)),
        xlog(L1 + 1, logical_msg("sequin:transaction_annotations.set",
                                 "not json {", lsn=L1 + 1)),
        xlog(L1 + 2, ins(CHAR_OID, 1, "x", None, None, "t", "{}")),
        xlog(L1 + 3, commit_frame(L1)),
    ]

    def check(ev):
        assert ev[0]["transaction_annotations"] is None

    return frames, L1, check


def case_toast_unchanged_identity_default():
    # docs/reference TOAST semantics: with identity default the
    # unchanged TOAST column arrives as kind 'u' and surfaces as the
    # unchanged_toast marker (no pre-image to fill from)
    big = "x" * 10
    frames = [xlog(50, rel(TOAST_OID, "toasty", TOASTY))] + _txn(
        L1, ins(TOAST_OID, 1, "doc", big)
    ) + _txn(
        L2, upd(TOAST_OID, new=(1, "doc-renamed", Ellipsis)), xid=2
    )

    def check(ev):
        up = [e for e in ev if e["action"] == "update"][0]
        assert up["record"]["metadata"] == UNCHANGED_TOAST_MARKER
        assert up["record"]["name"] == "doc-renamed"
        assert up["changes"] == {}

    return frames, L2, check


def case_toast_backfill_identity_full():
    # message_handler.ex:309-353 — with identity full the pre-image
    # fills the unchanged TOAST column; changes excludes it
    big = "y" * 10
    frames = [xlog(50, rel(TOAST_OID, "toasty", TOASTY, replident=b"f"))] + _txn(
        L1, ins(TOAST_OID, 1, "doc", big)
    ) + _txn(
        L2,
        upd(TOAST_OID, new=(1, "doc2", Ellipsis), old=(1, "doc", big)),
        xid=2,
    )

    def check(ev):
        up = [e for e in ev if e["action"] == "update"][0]
        assert up["record"]["metadata"] == big     # backfilled
        assert up["changes"] == {"name": "doc"}    # toast col excluded

    return frames, L2, check


def case_two_inserts_one_txn():
    # exs:824 — in-order delivery within a transaction: shared
    # commit_lsn, commit_idx 0,1; idempotency keys base64("lsn:idx")
    import base64

    frames = [_chars_rel()] + _txn(
        L1,
        ins(CHAR_OID, 1, "a", None, None, "t", "{}"),
        ins(CHAR_OID, 2, "b", None, None, "t", "{}"),
    )

    def check(ev):
        assert [(e["commit_lsn"], e["commit_idx"]) for e in ev] == [
            (L1, 0), (L1, 1)
        ]
        assert ev[0]["idempotency_key"] == base64.b64encode(
            f"{L1}:0".encode()).decode()

    return frames, L1, check


def case_multiple_txns_ordering():
    # exs:897 — creates/updates/deletes across txns keep commit order;
    # commit_idx resets at each Begin
    frames = [_chars_rel()] \
        + _txn(L1, ins(CHAR_OID, 1, "n1", None, None, "t", "{}"), xid=1) \
        + _txn(L2, upd(CHAR_OID, new=(1, "n2", None, None, "t", "{}")), xid=2) \
        + _txn(L3, dele(CHAR_OID, (1, None, None, None, None, None),
                        old_kind=b"K"), xid=3)

    def check(ev):
        assert [(e["action"], e["commit_lsn"], e["commit_idx"]) for e in ev] == [
            ("insert", L1, 0), ("update", L2, 0), ("delete", L3, 0)
        ]

    return frames, L3, check


def case_truncate_and_type_ignored():
    # decoder.ex Truncate/Type frames produce no events and don't break
    # the stream
    frames = [_chars_rel()] + [
        xlog(L1, begin_frame(L1)),
        xlog(L1 + 1, trunc(CHAR_OID)),
        xlog(L1 + 2, type_msg()),
        xlog(L1 + 3, ins(CHAR_OID, 5, "after", None, None, "t", "{}")),
        xlog(L1 + 4, commit_frame(L1)),
    ]

    def check(ev):
        assert [e["record"]["id"] for e in ev] == ["5"]

    return frames, L1, check


def case_schema_change_midstream():
    # exs:1304 — a new Relation frame (ALTER TABLE ADD COLUMN) re-keys
    # subsequent tuples
    wider = CHARACTERS + [(0, "title", 25)]
    frames = [_chars_rel()] + _txn(
        L1, ins(CHAR_OID, 1, "a", None, None, "t", "{}")
    ) + [xlog(L2 - 1, rel(CHAR_OID, "Characters", wider))] + _txn(
        L2, ins(CHAR_OID, 2, "b", None, None, "t", "{}", "Duke"), xid=2
    )

    def check(ev):
        first = [e for e in ev if e["commit_lsn"] == L1][0]
        second = [e for e in ev if e["commit_lsn"] == L2][0]
        assert "title" not in first["record"]
        assert second["record"]["title"] == "Duke"

    return frames, L2, check


def case_pk_change_update():
    # record_pks always derive from the NEW tuple (consumer_event
    # record_pks contract)
    frames = [xlog(50, rel(CHAR_OID, "characters_ident_full", CHARACTERS,
                           replident=b"f"))] + _txn(
        L1,
        upd(CHAR_OID, new=(20, "x", None, None, "t", "{}"),
            old=(10, "x", None, None, "t", "{}")),
    )

    def check(ev):
        assert ev[0]["record_pks"] == ["20"]
        assert ev[0]["changes"] == {"id": "10"}

    return frames, L1, check


def case_null_columns():
    # every nullable column null → record carries explicit nulls
    frames = [_chars_rel()] + _txn(
        L1, ins(CHAR_OID, 11, None, None, None, None, None)
    )

    def check(ev):
        r = ev[0]["record"]
        assert r["id"] == "11"
        assert all(r[c] is None
                   for c in ("name", "house", "planet", "is_active", "tags"))
        assert ev[0]["record_pks"] == ["11"]

    return frames, L1, check


def case_partitioned_child_relation():
    # exs:590 — partitioned tables publish via their leaf relations; the
    # event carries the relation the frame names
    leaf = [(1, "id", 20), (0, "seq", 20), (0, "source", 25)]
    frames = [xlog(50, rel(7010, "test_event_logs_partitioned_default", leaf))] \
        + _txn(L1, ins(7010, 1, 100, "characters"))

    def check(ev):
        assert ev[0]["table_name"] == "test_event_logs_partitioned_default"
        assert ev[0]["record"] == {"id": "1", "seq": "100",
                                   "source": "characters"}

    return frames, L1, check


def case_heartbeat_messages_ignored():
    # exs:1061 — sequin.heartbeat logical messages keep the slot
    # advancing but yield no consumer events
    frames = [_chars_rel()] + [
        xlog(L1, begin_frame(L1)),
        xlog(L1 + 1, logical_msg("sequin.heartbeat.1", "ping", lsn=L1 + 1)),
        xlog(L1 + 2, ins(CHAR_OID, 1, "real", None, None, "t", "{}")),
        xlog(L1 + 3, commit_frame(L1)),
    ]

    def check(ev):
        assert len(ev) == 1 and ev[0]["record"]["name"] == "real"

    return frames, L1, check


def case_every_column_type():
    # exs "columns flow through properly" (:1400) — one row exercising
    # the text reprs of int8/text/bool/arrays + numeric/uuid/jsonb/
    # timestamptz columns; raw reprs preserved verbatim
    detailed = [(1, "id", 20), (0, "age", 23), (0, "height", 701),
                (0, "is_hero", 16), (0, "biography", 25),
                (0, "avatar", 17), (0, "metadata", 3802),
                (0, "tags", 1009), (0, "joined", 1184),
                (0, "ext_id", 2950), (0, "networth", 1700)]
    frames = [xlog(50, rel(7020, "characters_detailed", detailed))] + _txn(
        L1,
        ins(7020, 5, 34, "1.85", "t", "Once upon a time",
            r"\x68690a", '{"arr": [1, 2], "b": null}',
            '{swords,"hand to hand"}', "2024-01-02 03:04:05.123456+00",
            "0191c0c2-0000-7000-8000-000000000001", "12345.6789"),
    )

    def check(ev):
        r = ev[0]["record"]
        assert r == {
            "id": "5", "age": "34", "height": "1.85", "is_hero": "t",
            "biography": "Once upon a time", "avatar": r"\x68690a",
            "metadata": '{"arr": [1, 2], "b": null}',
            "tags": '{swords,"hand to hand"}',
            "joined": "2024-01-02 03:04:05.123456+00",
            "ext_id": "0191c0c2-0000-7000-8000-000000000001",
            "networth": "12345.6789",
        }

    return frames, L1, check


def case_interrupted_connection_mid_txn():
    # exs:946 "processed exactly once, even after crash and reboot" —
    # the connection drops mid-transaction; the uncommitted rows are
    # never flushed, and the reconnected stream replays the WHOLE
    # transaction which then lands exactly once
    frames_before_drop = [_chars_rel()] + _txn(
        L1, ins(CHAR_OID, 1, "committed", None, None, "t", "{}")
    ) + [
        xlog(L2, begin_frame(L2, xid=2)),
        xlog(L2 + 1, ins(CHAR_OID, 2, "dangling", None, None, "t", "{}")),
        # connection drops here — no commit
    ]
    replayed = [_chars_rel()] + _txn(
        L2, ins(CHAR_OID, 2, "dangling", None, None, "t", "{}"), xid=2
    )
    return frames_before_drop, replayed

    # (checked by its dedicated test below — needs two server sessions)


def case_multi_table_fanin():
    # exs:1235 "consumer fans in events from multiple tables" — one
    # transaction touching two relations; both events land in commit
    # order with per-table metadata intact
    HOUSES = [(1, "id", 20), (0, "motto", 25)]
    HOUSE_OID = 7010
    frames = [
        _chars_rel(),
        xlog(51, rel(HOUSE_OID, "Houses", HOUSES)),
    ] + _txn(
        L1,
        ins(CHAR_OID, 1, "Paul", "Atreides", "Caladan", "t", "{}"),
        ins(HOUSE_OID, 10, "Fear is the mind-killer"),
        ins(CHAR_OID, 2, "Chani", "Fremen", "Arrakis", "t", "{}"),
    )

    def check(ev):
        assert len(ev) == 3
        assert [e["table_name"] for e in ev] == [
            "Characters", "Houses", "Characters"]
        assert [e["commit_idx"] for e in ev] == [0, 1, 2]
        assert ev[1]["table_oid"] == HOUSE_OID
        assert ev[1]["record"] == {"id": "10",
                                   "motto": "Fear is the mind-killer"}
        assert ev[1]["record_pks"] == ["10"]
        # all three share the txn's commit lsn — fan-in, not reorder
        assert len({e["commit_lsn"] for e in ev}) == 1

    return frames, L1, check


def case_replica_identity_change_midstream():
    # exs:218 (identity default: changes == {}) vs exs:268 (identity
    # full: changes == old values), TRANSITIONED MID-STREAM: ALTER
    # TABLE ... REPLICA IDENTITY FULL re-sends the Relation frame with
    # replident 'f' (relation tracker ALTER detection,
    # postgres_database_table.ex schema-hash invalidation analog); the
    # update BEFORE the change has no old tuple, the one AFTER does
    frames = [_chars_rel()] + _txn(
        L1, ins(CHAR_OID, 1, "Leto", "Atreides", "Caladan", "t", "{}")
    ) + _txn(
        L2, upd(CHAR_OID, new=(1, "Leto", "Atreides", "Arrakis", "t", "{}")),
        xid=2,
    ) + [
        xlog(L3 - 1, rel(CHAR_OID, "Characters", CHARACTERS, replident=b"f")),
    ] + _txn(
        L3,
        upd(CHAR_OID,
            new=(1, "Leto II", "Atreides", "Arrakis", "t", "{}"),
            old=(1, "Leto", "Atreides", "Arrakis", "t", "{}")),
        xid=3,
    )

    def check(ev):
        ups = [e for e in ev if e["action"] == "update"]
        assert len(ups) == 2
        before, after = sorted(ups, key=lambda e: e["commit_lsn"])
        assert before["changes"] == {}          # identity default
        assert after["changes"] == {"name": "Leto"}  # identity full
        assert after["record"]["name"] == "Leto II"

    return frames, L3, check


def origin_frame(lsn, name="upstream_node"):
    return b"O" + struct.pack(">Q", lsn) + name.encode() + b"\x00"


def case_origin_and_unknown_frames_ignored():
    # decoder.ex:290-295 (Origin decoded as a control struct) +
    # decoder.ex:417 / slot_producer.ex:515-519 (unknown tags decode to
    # Unsupported and are logged-and-skipped): cascading-replication
    # ORIGIN frames and a future-protocol frame ('Z') inside a
    # transaction must not crash the slot and must yield no events.
    frames = [_chars_rel()] + [
        xlog(L1, begin_frame(L1)),
        xlog(L1 + 1, origin_frame(L1 - 50)),
        xlog(L1 + 2, ins(CHAR_OID, 1, "casc", None, None, "t", "{}")),
        xlog(L1 + 3, b"Z" + b"\x07future-proto-payload"),
        xlog(L1 + 4, commit_frame(L1)),
    ]

    def check(ev):
        assert len(ev) == 1 and ev[0]["record"]["name"] == "casc"

    return frames, L1, check


def case_drop_column_schema_change():
    # exs:1311-1340 — the migration cycle is drop-then-add-then-drop;
    # the ADD side is case_schema_change_midstream, this is the DROP
    # side: a narrower Relation frame re-keys subsequent tuples, and
    # rows decoded before the drop keep the column
    wider = CHARACTERS + [(0, "title", 25)]
    frames = [xlog(50, rel(CHAR_OID, "Characters", wider))] + _txn(
        L1, ins(CHAR_OID, 1, "a", None, None, "t", "{}", "Duke")
    ) + [xlog(L2 - 1, rel(CHAR_OID, "Characters", CHARACTERS))] + _txn(
        L2, ins(CHAR_OID, 2, "b", None, None, "t", "{}"), xid=2
    )

    def check(ev):
        first = [e for e in ev if e["commit_lsn"] == L1][0]
        second = [e for e in ev if e["commit_lsn"] == L2][0]
        assert first["record"]["title"] == "Duke"
        assert "title" not in second["record"]

    return frames, L2, check


def case_relation_change_mid_transaction():
    # exs:1304 family, concurrent-DDL shape: pgoutput sends a Relation
    # frame INSIDE an open transaction before the first tuple that uses
    # the new shape.  Both tuples decode with their own relation
    # version, in ONE commit with continuous commit_idx.
    wider = CHARACTERS + [(0, "title", 25)]
    frames = [_chars_rel()] + [
        xlog(L1, begin_frame(L1, xid=9)),
        xlog(L1 + 1, ins(CHAR_OID, 1, "a", None, None, "t", "{}")),
        xlog(L1 + 2, rel(CHAR_OID, "Characters", wider)),
        xlog(L1 + 3, ins(CHAR_OID, 2, "b", None, None, "t", "{}", "Duke")),
        xlog(L1 + 4, commit_frame(L1)),
    ]

    def check(ev):
        assert len(ev) == 2
        assert [e["commit_lsn"] for e in ev] == [L1, L1]
        assert [e["commit_idx"] for e in ev] == [0, 1]
        assert "title" not in ev[0]["record"]
        assert ev[1]["record"]["title"] == "Duke"

    return frames, L1, check


def case_row_filter_action_transform():
    # r9 verdict task #7 (publication row_filter family): with a
    # row-filtered publication (PG15+ `CREATE PUBLICATION .. WHERE`),
    # postgres TRANSFORMS actions at the filter boundary (PostgreSQL
    # docs §31.1 logical-replication row filters): an UPDATE moving a
    # row INTO scope arrives as an Insert frame, one moving it OUT
    # arrives as a key-only Delete, and within-scope updates stay
    # updates.  The engine must treat these as first-class actions —
    # in particular a Delete for a pk it has NEVER seen inserted
    # (the row was updated out of scope before ever being in it from
    # this slot's perspective must not crash or drop the event).
    frames = [_chars_rel()] + _txn(
        # UPDATE moved row 1 into scope → wire Insert
        L1, ins(CHAR_OID, 1, "Paul", "Atreides", "Arrakis", "t", "{}")
    ) + _txn(
        # in-scope UPDATE stays an update
        L2, upd(CHAR_OID, new=(1, "Paul", "Atreides", "Arrakis", "f",
                               "{}")), xid=2,
    ) + _txn(
        # UPDATE moved row 2 out of scope → wire key-only Delete for a
        # pk this slot never saw as an insert
        L3, dele(CHAR_OID, (2, None, None, None, None, None),
                 old_kind=b"K"), xid=3,
    )

    def check(ev):
        assert [e["action"] for e in ev] == ["insert", "update", "delete"]
        assert ev[0]["record"]["planet"] == "Arrakis"
        assert ev[2]["record_pks"] == ["2"]
        # no phantom update for either boundary crossing
        assert sum(e["action"] == "update" for e in ev) == 1

    return frames, L3, check


def case_generated_columns_publication():
    # r9 verdict task #7 (generated-columns family): pgoutput does NOT
    # publish generated columns by default — the Relation frame lists
    # only published columns, so the wire tuple is NARROWER than the
    # table (PostgreSQL docs: publish_generated_columns, PG18; before
    # that, never published).  When the publication flips the knob, a
    # new Relation arrives WITH the generated column and subsequent
    # tuples carry the computed value.  Events must track each
    # relation version's column set exactly.
    published = [(1, "id", 20), (0, "name", 25)]
    with_gen = published + [(0, "name_upper", 25)]  # GENERATED ALWAYS AS
    frames = [xlog(50, rel(CHAR_OID, "Characters", published))] + _txn(
        L1, ins(CHAR_OID, 1, "paul")
    ) + [xlog(L2 - 1, rel(CHAR_OID, "Characters", with_gen))] + _txn(
        L2, ins(CHAR_OID, 2, "leto", "LETO"), xid=2
    )

    def check(ev):
        first = [e for e in ev if e["commit_lsn"] == L1][0]
        second = [e for e in ev if e["commit_lsn"] == L2][0]
        assert first["record"] == {"id": "1", "name": "paul"}
        assert "name_upper" not in first["record"]
        assert second["record"]["name_upper"] == "LETO"

    return frames, L2, check


def case_zero_column_table():
    # r10 verdict task #8 (degenerate relations): CREATE TABLE t() is
    # legal Postgres — the Relation frame lists ZERO columns and each
    # insert's tuple is ncols=0.  Family absent from the exs suite
    # (its factories always create id columns); semantics pinned from
    # the pgoutput protocol docs: the decoder must not choke on the
    # empty column list, the event record is {}, there are no pks, and
    # ordering metadata (lsn/idx/idempotency) still forms.
    oid = 7031
    frames = [xlog(50, rel(oid, "unit", []))] + _txn(
        L1, ins(oid)
    ) + _txn(L2, ins(oid), xid=2)

    def check(ev):
        assert len(ev) == 2
        for e in ev:
            assert e["action"] == "insert"
            assert e["record"] == {}
            assert e["record_pks"] == []
            assert e["group_id"] is None
            assert e["idempotency_key"]
        assert (ev[0]["commit_lsn"], ev[1]["commit_lsn"]) == (L1, L2)

    return frames, L2, check


def case_no_pk_replica_identity_nothing():
    # r10 verdict task #8 (degenerate relations): a table with no PK
    # and REPLICA IDENTITY NOTHING (relation replident byte 'n') never
    # records old tuples; wire updates carry only the new image.
    # Family absent from the exs suite (factories set replica
    # identity); pinned from the PostgreSQL REPLICA IDENTITY docs +
    # message_handler.ex group-id derivation (no pks -> no group:
    # ordering falls back to arrival order, exactly what group_id =
    # NULL means downstream).
    oid = 7033
    nopk_cols = [(0, "name", 25), (0, "house", 25)]
    frames = [xlog(50, rel(oid, "nopk", nopk_cols, replident=b"n"))] + _txn(
        L1, ins(oid, "Paul", "Atreides")
    ) + _txn(
        L2, upd(oid, new=("Paul", "Harkonnen")), xid=2
    )

    def check(ev):
        assert [e["action"] for e in ev] == ["insert", "update"]
        up = ev[1]
        assert up["record"] == {"name": "Paul", "house": "Harkonnen"}
        assert up["changes"] == {}      # no old image exists, ever
        assert up["record_pks"] == [] and up["group_id"] is None

    return frames, L2, check


SCENARIOS = [
    ("zero_column_table", case_zero_column_table),
    ("no_pk_replica_identity_nothing",
     case_no_pk_replica_identity_nothing),
    ("row_filter_action_transform", case_row_filter_action_transform),
    ("generated_columns_publication", case_generated_columns_publication),
    ("drop_column_schema_change", case_drop_column_schema_change),
    ("relation_change_mid_transaction",
     case_relation_change_mid_transaction),
    ("origin_and_unknown_frames_ignored",
     case_origin_and_unknown_frames_ignored),
    ("insert_basic", case_insert_basic),
    ("update_identity_default", case_update_identity_default),
    ("update_identity_full", case_update_identity_full),
    ("delete_identity_default", case_delete_identity_default),
    ("delete_identity_full", case_delete_identity_full),
    ("multi_pk", case_multi_pk),
    ("empty_array", case_empty_array),
    ("array_update_to_empty", case_array_update_to_empty),
    ("transaction_annotations", case_transaction_annotations),
    ("annotations_clear", case_annotations_clear),
    ("invalid_annotations_ignored", case_invalid_annotations_ignored),
    ("toast_unchanged_identity_default", case_toast_unchanged_identity_default),
    ("toast_backfill_identity_full", case_toast_backfill_identity_full),
    ("two_inserts_one_txn", case_two_inserts_one_txn),
    ("multiple_txns_ordering", case_multiple_txns_ordering),
    ("truncate_and_type_ignored", case_truncate_and_type_ignored),
    ("schema_change_midstream", case_schema_change_midstream),
    ("pk_change_update", case_pk_change_update),
    ("null_columns", case_null_columns),
    ("partitioned_child_relation", case_partitioned_child_relation),
    ("heartbeat_messages_ignored", case_heartbeat_messages_ignored),
    ("every_column_type", case_every_column_type),
    ("multi_table_fanin", case_multi_table_fanin),
    ("replica_identity_change_midstream",
     case_replica_identity_change_midstream),
]


@pytest.mark.parametrize("name,case", SCENARIOS, ids=[n for n, _ in SCENARIOS])
def test_contract_scenario(spark, tmp_path, name, case):
    frames, final_lsn, check = case()
    events = replay(spark, tmp_path, frames, final_lsn)
    check(events)


def test_contract_typed_casts(spark, tmp_path):
    """The raw text reprs cast to typed fields downstream (ValueCaster —
    value_caster.ex:42-44 parity): bool 't'→true, '{a,b}' array→list,
    empty '{}'→[], numerics→numeric types."""
    from sequin_spark.types import typed_record

    frames, final_lsn, _ = case_every_column_type()
    replay(spark, tmp_path, frames, final_lsn)
    ev = read_cdc_log(spark, str(tmp_path / "wal"))
    typed = typed_record(ev, {
        "id": "int8", "age": "int4", "height": "float8",
        "is_hero": "bool", "tags": "text[]", "networth": "numeric",
    })
    row = typed.select("typed_record.*").collect()[0].asDict()
    assert row["id"] == 5 and row["age"] == 34
    assert row["is_hero"] is True
    assert abs(row["height"] - 1.85) < 1e-9
    assert row["tags"] == ["swords", "hand to hand"]
    assert float(row["networth"]) == pytest.approx(12345.6789)


def test_contract_empty_array_casts_to_empty_list(spark, tmp_path):
    """exs:426 — '{}' must become [], not ['']."""
    from sequin_spark.types import typed_record

    frames, final_lsn, _ = case_empty_array()
    replay(spark, tmp_path, frames, final_lsn)
    ev = read_cdc_log(spark, str(tmp_path / "wal"))
    typed = typed_record(ev, {"tags": "text[]"})
    assert typed.select("typed_record.tags").collect()[0][0] == []


def test_contract_interrupted_connection_mid_txn(spark, tmp_path):
    """exs:946 — drop mid-transaction, reconnect, replay: the dangling
    transaction lands exactly once and only after its commit arrives."""
    frames_before, replayed = case_interrupted_connection_mid_txn()

    # session 1: server dies after streaming an uncommitted txn head
    srv1 = FakeWalSender(frames_before)
    client1 = ReplicationClient(
        "127.0.0.1", srv1.port, user="replicator", database="postgres",
        password="s3cret", receive_timeout=0.05,
    )
    client1.connect()
    worker = ReplicationIngestWorker(
        client1, str(tmp_path / "wal"), flush_seconds=0.05, ack_interval=0.1
    )
    client1.start_replication("sequin_slot", "sequin_pub")
    worker.run(max_seconds=2,
               stop_when=lambda: any(a[1] == L1 for a in srv1.acks))
    client1.close()
    srv1.close()

    ev = read_cdc_log(spark, str(tmp_path / "wal"))
    assert [r["id"] for r in ev.selectExpr("record['id'] as id").collect()] \
        == ["1"]  # dangling row NOT flushed

    # session 2: reconnect from the slot cursor; walsender replays the
    # whole interrupted transaction
    srv2 = FakeWalSender(replayed)
    client2 = ReplicationClient(
        "127.0.0.1", srv2.port, user="replicator", database="postgres",
        password="s3cret", receive_timeout=0.05,
    )
    client2.connect()
    worker2 = ReplicationIngestWorker(
        client2, str(tmp_path / "wal"), flush_seconds=0.05, ack_interval=0.1
    )
    client2.start_replication("sequin_slot", "sequin_pub")
    worker2.run(max_seconds=5,
                stop_when=lambda: any(a[1] == L2 for a in srv2.acks))
    client2.close()
    srv2.close()

    ev = read_cdc_log(spark, str(tmp_path / "wal"))
    rows = sorted(
        (r["id"], r["name"]) for r in
        ev.selectExpr("record['id'] as id", "record['name'] as name").collect()
    )
    assert rows == [("1", "committed"), ("2", "dangling")]  # exactly once


def test_folder_guards():
    """slot_producer.ex:387-410 — Begin below the confirmed cursor and
    Commit/Begin LSN mismatch are slot-corruption errors."""
    folder = EventFolder()
    folder.push(decode(begin_frame(1000)))
    folder.push(decode(commit_frame(1000)))
    with pytest.raises(ValueError, match="below last commit"):
        folder.push(decode(begin_frame(900)))
    folder2 = EventFolder()
    folder2.push(decode(begin_frame(2000)))
    with pytest.raises(ValueError, match="mismatch"):
        folder2.push(decode(commit_frame(2001)))


def test_decode_binary_tuple_kind():
    """kind 'b' (binary) tuple values decode as bytes."""
    frame = b"I" + struct.pack(">I", CHAR_OID) + b"N" + (
        struct.pack(">H", 1) + b"b" + struct.pack(">i", 3) + b"\x01\x02\x03"
    )
    msg = decode(frame)
    assert msg.new.values == [b"\x01\x02\x03"]


def test_events_from_messages_batch_matches_incremental(spark):
    """The batch wrapper and the incremental folder agree."""
    frames = [
        rel(CHAR_OID, "Characters", CHARACTERS),
        begin_frame(L1),
        ins(CHAR_OID, 1, "a", None, None, "t", "{}"),
        commit_frame(L1),
    ]
    msgs = [decode(f) for f in frames]
    batch = events_from_messages(msgs)
    folder = EventFolder()
    inc = []
    for m in msgs:
        inc.extend(folder.push(m))
    assert batch == inc and len(batch) == 1


def test_contract_missing_slot_fails_to_start(spark):
    """exs 'fails to start when replication slot does not exist':
    START_REPLICATION on a nonexistent slot must surface the server's
    42704 error as a clean ReplicationError, not hang or crash."""
    from sequin_spark.sources.replication import ReplicationError

    srv = FakeWalSender([], missing_slot=True)
    client = ReplicationClient(
        "127.0.0.1", srv.port, user="replicator", database="postgres",
        password="s3cret", receive_timeout=0.05,
    )
    client.connect()
    with pytest.raises(ReplicationError, match="does not exist"):
        client.start_replication("sequin_slot", "sequin_pub")
    client.close()
    srv.close()


def test_contract_column_filtered_consumer(spark, tmp_path):
    """exs 'consumer with column filter only receives relevant
    messages': the filter applies to events that travelled the full
    socket → decoder → ingest-worker path, not a synthetic frame."""
    from sequin_spark.operators.column_filter import ColumnFilter, apply_column_filters

    rel = relation_frame(oid=77, name="characters",
                         cols=[(1, "id", 23), (0, "name", 25), (0, "rank", 23)])
    L = 5000
    frames = [
        xlog(L, begin_frame(L, xid=9)),
        xlog(L, rel),
        xlog(L, insert_frame(77, "1", "Paul", "10")),
        xlog(L, insert_frame(77, "2", "Gurney", "3")),
        xlog(L, insert_frame(77, "3", "Leto", "50")),
        xlog(L, commit_frame(L)),
        keepalive(L + 1, True),
    ]
    srv = FakeWalSender(frames)
    client = ReplicationClient(
        "127.0.0.1", srv.port, user="replicator", database="postgres",
        password="s3cret", receive_timeout=0.05,
    )
    client.connect()
    worker = ReplicationIngestWorker(
        client, str(tmp_path / "wal"), flush_seconds=0.05, ack_interval=0.1
    )
    client.start_replication("sequin_slot", "sequin_pub")
    worker.run(max_seconds=5, stop_when=lambda: any(a[1] == L + 1 for a in srv.acks))
    client.close()
    srv.close()

    ev = read_cdc_log(spark, str(tmp_path / "wal"))
    kept = apply_column_filters(
        ev, [ColumnFilter("rank", ">", 5, "integer")]
    )
    names = sorted(r["n"] for r in
                   kept.selectExpr("record['name'] as n").collect())
    assert names == ["Leto", "Paul"]  # Gurney (rank 3) filtered out


def test_contract_idle_slot_advances_on_heartbeat_traffic(spark, tmp_path):
    """exs:614/623 'replication slot advances even when database is
    idle' — with no user DML, the reference's heartbeat emits logical
    messages so the confirmed_flush_lsn keeps moving; here: a stream
    of heartbeat-only transactions must advance the standby-status ack
    LSN while producing ZERO consumer events."""
    hb_txns = []
    for i, lsn in enumerate((L1, L2, L3)):
        hb_txns += [
            xlog(lsn, begin_frame(lsn, xid=10 + i)),
            xlog(lsn + 1,
                 logical_msg("sequin.heartbeat.1", f"ping{i}", lsn=lsn + 1)),
            xlog(lsn + 2, commit_frame(lsn)),
        ]
    frames = [_chars_rel()] + hb_txns
    events = replay(spark, tmp_path, frames, L3)
    assert events == []  # heartbeats are not consumer events

    # the ack cursor advanced to the LAST heartbeat commit — the slot
    # moved despite zero user traffic (reply comes from replay()'s
    # stop_when on srv.acks, so reaching here proves flushed==L3)


def test_contract_backfill_during_stream_schema_change(spark, tmp_path):
    """VERDICT r7 #7 + exs:1304: a backfill snapshot merges through the
    consistency fence WHILE the stream carries a schema change.  The
    fence must still drop snapshot rows whose PK was touched by CDC at
    or below the fence — including rows whose events use the WIDENED
    schema — and keep untouched rows."""
    from pyspark.sql import functions as F

    from sequin_spark.sources.backfill import backfill_snapshot, fence_merge

    wider = CHARACTERS + [(0, "title", 25)]
    frames = [_chars_rel()] + _txn(
        L1, ins(CHAR_OID, 1, "a", None, None, "t", "{}")
    ) + [
        xlog(L2 - 1, rel(CHAR_OID, "Characters", wider)),
    ] + _txn(
        # post-ALTER event for pk=2 lands BELOW the fence
        L2, ins(CHAR_OID, 2, "b", None, None, "t", "{}", "Duke"), xid=2,
    ) + _txn(
        # pk=3 is touched only ABOVE the fence — snapshot row survives
        L3, ins(CHAR_OID, 3, "c", None, None, "t", "{}", "Baron"), xid=3,
    )
    replay(spark, tmp_path, frames, L3)
    cdc = read_cdc_log(spark, str(tmp_path / "wal"))

    # table snapshot as the keyset reader would page it (pk 1..4)
    snap_src = spark.createDataFrame(
        [(i, f"row{i}") for i in (1, 2, 3, 4)], "id long, name string")
    snap = backfill_snapshot(snap_src, "Characters", ["id"]).withColumn(
        "table_oid", F.lit(CHAR_OID))

    fence = L2  # between txn 2 and txn 3
    merged = fence_merge(snap, cdc, fence_lsn=fence)
    kept = sorted(r["group_id"] for r in merged.select("group_id").collect())
    # pks 1,2 were CDC-touched at/below the fence → dropped; 3 only
    # above it and 4 never → both kept (the later stream event for 3
    # supersedes downstream via the idempotency ledger)
    assert kept == ["3", "4"]


def test_contract_at_least_once_redelivery_deduped(spark, tmp_path):
    """exs:863 'changes are delivered at least once': a server restart
    from an OLDER restart_lsn resends frames already flushed+acked; the
    engine must tolerate the duplicate delivery — the raw CDC log holds
    both copies (at-least-once), and the idempotency dedup collapses
    them to exactly one canonical event per (commit_lsn, commit_idx)."""
    from sequin_spark.operators.dedup import dedup_replays

    frames = [_chars_rel()] + _txn(
        L1, ins(CHAR_OID, 1, "Paul", "Atreides", "Caladan", "t", "{}")
    )

    for session in range(2):  # second session replays from the old cursor
        srv = FakeWalSender(frames)
        client = ReplicationClient(
            "127.0.0.1", srv.port, user="replicator", database="postgres",
            password="s3cret", receive_timeout=0.05,
        )
        client.connect()
        worker = ReplicationIngestWorker(
            client, str(tmp_path / "wal"),
            flush_seconds=0.05, ack_interval=0.1,
        )
        client.start_replication("sequin_slot", "sequin_pub")
        worker.run(max_seconds=5,
                   stop_when=lambda: any(a[1] == L1 for a in srv.acks))
        client.close()
        srv.close()

    ev = read_cdc_log(spark, str(tmp_path / "wal"))
    raw = ev.collect()
    assert len(raw) == 2                      # delivered at least once
    assert len({(r.commit_lsn, r.commit_idx) for r in raw}) == 1
    deduped = dedup_replays(ev).collect()
    assert len(deduped) == 1                  # exactly once downstream
    assert deduped[0]["record"]["name"] == "Paul"


def test_contract_payload_size_chunked_flush(spark, tmp_path):
    """exs:992 'retries flushing when payload size limit exceeded',
    recoverable half: a batch over max_flush_bytes is split into
    size-bounded chunks and lands completely, as several files, with
    the ack advancing only after the whole batch is on disk."""
    frames = [_chars_rel()]
    for i, lsn in enumerate((L1, L2, L3)):
        frames += _txn(
            lsn,
            ins(CHAR_OID, i, "x" * 300, "Atreides", "Caladan", "t", "{}"),
            xid=i + 1,
        )
    srv = FakeWalSender(frames)
    client = ReplicationClient(
        "127.0.0.1", srv.port, user="replicator", database="postgres",
        password="s3cret", receive_timeout=0.05,
    )
    client.connect()
    worker = ReplicationIngestWorker(
        client, str(tmp_path / "wal"), flush_seconds=10,  # one drain flush
        max_flush_bytes=600, ack_interval=0.1,
    )
    client.start_replication("sequin_slot", "sequin_pub")
    worker.run(max_seconds=5,
               stop_when=lambda: any(a[1] == L3 for a in srv.acks))
    client.close()
    srv.close()

    assert worker.files_written >= 2  # the 3x~400B batch split up
    ev = read_cdc_log(spark, str(tmp_path / "wal"))
    rows = ev.collect()
    assert len(rows) == 3
    assert len({(r.commit_lsn, r.commit_idx) for r in rows}) == 3
    assert worker.flushed_lsn == L3


def test_contract_flush_failure_retries_without_loss(spark, tmp_path):
    """exs:992, failure half: a write that errors leaves every
    unwritten event in the buffer and the ack cursor unmoved; the next
    flush attempt lands everything exactly once."""
    from sequin_spark.sources.replication import ReplicationIngestWorker

    frames = [_chars_rel()] + _txn(
        L1,
        ins(CHAR_OID, 1, "Paul", "Atreides", "Caladan", "t", "{}"),
        ins(CHAR_OID, 2, "Chani", "Fremen", "Arrakis", "t", "{}"),
    )
    srv = FakeWalSender(frames)
    client = ReplicationClient(
        "127.0.0.1", srv.port, user="replicator", database="postgres",
        password="s3cret", receive_timeout=0.05,
    )
    client.connect()
    worker = ReplicationIngestWorker(
        client, str(tmp_path / "wal"), flush_seconds=0.05, ack_interval=0.1,
    )
    real_write = worker._write_events
    fail_once = {"armed": True}

    def flaky(events):
        if fail_once["armed"]:
            fail_once["armed"] = False
            raise OSError("disk full (injected)")
        return real_write(events)

    worker._write_events = flaky
    client.start_replication("sequin_slot", "sequin_pub")
    try:
        worker.run(max_seconds=5,
                   stop_when=lambda: any(a[1] == L1 for a in srv.acks))
    except OSError:
        # the injected failure may surface out of run(); the buffer must
        # still hold the events — resume the loop like the supervisor
        assert len(worker._committed) == 2
        assert worker.flushed_lsn == 0
        worker.run(max_seconds=5,
                   stop_when=lambda: any(a[1] == L1 for a in srv.acks))
    client.close()
    srv.close()

    rows = read_cdc_log(spark, str(tmp_path / "wal")).collect()
    assert sorted(r["record"]["name"] for r in rows) == ["Chani", "Paul"]
    assert worker.flushed_lsn == L1


def test_contract_single_oversized_event_raises(spark, tmp_path):
    """A single event larger than max_flush_bytes can never flush:
    PayloadSizeLimitExceeded surfaces (reference invariant
    :payload_size_limit_exceeded) and the event stays buffered —
    never silently dropped, never acked."""
    from sequin_spark.sources.pgoutput import EventFolder
    from sequin_spark.sources.replication import (PayloadSizeLimitExceeded,
                                                  ReplicationIngestWorker)

    worker = ReplicationIngestWorker.__new__(ReplicationIngestWorker)
    worker.out_dir = str(tmp_path / "wal")
    worker.max_flush_bytes = 100
    worker.folder = EventFolder()
    worker.heartbeat = None
    worker.files_written = 0
    worker.flushed_lsn = 0
    worker._open_txn = []
    worker._committed = [{
        "action": "insert", "record": {"blob": "y" * 500}, "changes": None,
        "table_schema": "public", "table_name": "t", "table_oid": 1,
        "record_pks": ["1"], "group_id": "1", "commit_lsn": 10,
        "commit_idx": 0, "commit_timestamp": None, "idempotency_key": "k",
        "trace_id": "t", "transaction_annotations": None,
    }]
    import os
    os.makedirs(worker.out_dir, exist_ok=True)
    with pytest.raises(PayloadSizeLimitExceeded):
        worker.flush()
    assert len(worker._committed) == 1 and worker.flushed_lsn == 0


def test_contract_failed_messages_written_to_disk(spark, tmp_path):
    """exs:740 'failed messages are written to disk' — a delivery that
    errors must persist the FULL message (payload included) durably
    before the batch completes, and a later attempt delivers it without
    loss.  Here: the engine's per-batch failures dir holds the failed
    row's payload parquet; after the retry drains, the delivered log
    holds every message exactly once."""
    import glob
    import json as _json
    import os

    import pyarrow.parquet as papq

    from sequin_spark.streaming.delivery import DeliveryEngine

    schema = ("group_id string, commit_lsn long, commit_idx long, "
              "idempotency_key string, key string, value string")
    df = spark.createDataFrame(
        [("g1", 1, 0, "k1", "g1", '{"n":1}'),
         ("g2", 1, 1, "k2", "g2", '{"n":2}')], schema)
    attempt_dir = tmp_path / "attempts"
    attempt_dir.mkdir()
    log_dir = tmp_path / "delivered"
    engine = DeliveryEngine(
        "failing",
        {"fail_substring": "g1", "attempt_dir": str(attempt_dir),
         "path": str(log_dir)},
        state_dir=str(tmp_path / "state"), batch_size=1,
        max_retry_count=3, backoff_base_s=0.0,
    )
    stats = engine.process_batch(df, 0)
    assert stats["failed"] == 1 and stats["delivered"] == 1
    # the failed message is ON DISK with its payload, not in memory:
    # the executor spills it to the per-batch failures dir and the
    # batch-close merge folds it into the durable pending parquet
    # (a fresh engine instance — crash analog — reads the same file)
    assert glob.glob(engine.pending_path)
    spilled = papq.read_table(engine.pending_path).to_pandas()
    assert list(spilled["idempotency_key"]) == ["k1"]
    assert _json.loads(spilled["value"].iloc[0]) == {"n": 1}
    # retry (failing sink fails once per key) → delivered without loss
    stats2 = engine.process_batch(df.limit(0), 1)
    assert stats2["delivered"] == 1 and stats2["pending"] == 0


def test_contract_heartbeat_table_older_pg(spark, tmp_path):
    """exs:1076 'emits heartbeat messages for older postgres version'
    + slot_processor_server.ex:640-670 logical_message_table_upsert? +
    postgres.ex:1300-1335: on <PG14 the heartbeat travels as an upsert
    to the published public.sequin_logical_messages table.  The ingest
    worker must (a) fold the upsert into the HeartbeatMonitor —
    completing the emit→receive round trip from the `content` JSON —
    and (b) keep those rows OUT of the consumer stream, while real DML
    in the same stream flows through untouched.  On >=14 the table is
    ordinary user data and IS delivered (version-gated intercept)."""
    import json as _json

    from sequin_spark.sources.heartbeat import (
        LOGICAL_MESSAGES_TABLE,
        HeartbeatMonitor,
    )
    from sequin_spark.sources.replication import (
        ReplicationClient,
        ReplicationIngestWorker,
    )

    hb_cols = [(1, "id", 20), (1, "slot_id", 25), (0, "subject", 25),
               (0, "content", 3802)]
    hb_oid = 7042

    def run(pg_major, out):
        monitor = HeartbeatMonitor(pg_major_version=pg_major)

        class _StubClient:
            def simple_query(self, sql):
                # pin the emit SQL per channel (exs:1061 vs exs:1076)
                if pg_major < 14:
                    assert f"INSERT INTO public.{LOGICAL_MESSAGES_TABLE}" \
                        in sql and "ON CONFLICT (slot_id, subject)" in sql
                else:
                    assert "pg_logical_emit_message" in sql
                return [["0/100"]]

        monitor.emit(_StubClient())
        payload = _json.dumps({"id": monitor.current_heartbeat_id,
                               "emitted_at": "2026-01-01T00:00:00Z",
                               "version": "1.0"})
        frames = [
            xlog(40, rel(hb_oid, LOGICAL_MESSAGES_TABLE, hb_cols)),
            _chars_rel(),
        ] + _txn(
            L1, upd(hb_oid, new=(1, "slot", "sequin.heartbeat.1", payload)),
        ) + _txn(
            L2, ins(CHAR_OID, 1, "real", None, None, "t", "{}"), xid=2,
        )
        srv = FakeWalSender(frames)
        client = ReplicationClient(
            "127.0.0.1", srv.port, user="replicator", database="postgres",
            password="s3cret", receive_timeout=0.05)
        client.connect()
        worker = ReplicationIngestWorker(
            client, str(out), flush_seconds=0.05, ack_interval=0.1,
            heartbeat=monitor)
        try:
            client.start_replication("sequin_slot", "sequin_pub")
            worker.run(max_seconds=10,
                       stop_when=lambda: any(a[1] == L2 for a in srv.acks))
        finally:
            client.close()
            srv.close()
        rows = [r.asDict(recursive=True)
                for r in read_cdc_log(spark, str(out)).collect()]
        return monitor, rows

    # <PG14: upsert intercepted as a heartbeat, consumers see only DML
    monitor, rows = run(13, tmp_path / "wal13")
    assert monitor.received_count == 1
    assert monitor.current_heartbeat_id is None  # round trip complete
    assert [e["table_name"] for e in rows] == ["Characters"]

    # >=14: same table is plain user data — delivered, not intercepted
    monitor, rows = run(17, tmp_path / "wal17")
    assert monitor.received_count == 0
    assert sorted(e["table_name"] for e in rows) == [
        "Characters", LOGICAL_MESSAGES_TABLE]


def test_contract_toast_unfillable_health_warning(spark, tmp_path):
    """message_handler.ex:355-361 — an update carrying an unchanged-
    TOAST sentinel with NO pre-image (replica identity default) cannot
    be filled; the sentinel passes through and the engine surfaces the
    reference's ``toast_columns_detected`` health WARNING, once per
    table.  An identity-FULL toast update (fillable) must NOT warn."""
    frames = [_chars_rel()] + _txn(
        L1, upd(CHAR_OID, ("1", "Paul", ..., "Caladan", "t", "{}"))
    ) + _txn(
        L2, upd(CHAR_OID, ("1", "Paulo", ..., "Caladan", "t", "{}")),
        xid=2,
    )
    srv = FakeWalSender(frames)
    client = ReplicationClient(
        "127.0.0.1", srv.port, user="replicator", database="postgres",
        password="s3cret", receive_timeout=0.05,
    )
    client.connect()
    health = []
    worker = ReplicationIngestWorker(
        client, str(tmp_path / "wal"), flush_seconds=0.05,
        ack_interval=0.1, on_health=lambda slug, d: health.append((slug, d)),
    )
    client.start_replication("sequin_slot", "sequin_pub")
    worker.run(max_seconds=5,
               stop_when=lambda: any(a[1] == L2 for a in srv.acks))
    client.close()
    srv.close()
    # warned exactly ONCE for the table despite two unfillable updates
    assert health == [("toast_columns_detected", "Characters")]
    ev = read_cdc_log(spark, str(tmp_path / "wal"))
    rows = sorted(ev.collect(), key=lambda r: r.commit_lsn)
    assert rows[0]["record"]["house"] == "__unchanged_toast__"

    # identity full: the fill succeeds, no warning (exs:268 family)
    frames2 = [_chars_rel()] + _txn(
        L3, upd(CHAR_OID, ("1", "Paul", ..., "Caladan", "t", "{}"),
                old=("1", "Paul", "Atreides", "Caladan", "t", "{}")),
    )
    srv2 = FakeWalSender(frames2)
    client2 = ReplicationClient(
        "127.0.0.1", srv2.port, user="replicator", database="postgres",
        password="s3cret", receive_timeout=0.05,
    )
    client2.connect()
    health2 = []
    worker2 = ReplicationIngestWorker(
        client2, str(tmp_path / "wal2"), flush_seconds=0.05,
        ack_interval=0.1, on_health=lambda slug, d: health2.append(slug),
    )
    client2.start_replication("sequin_slot", "sequin_pub")
    worker2.run(max_seconds=5,
                stop_when=lambda: any(a[1] == L3 for a in srv2.acks))
    client2.close()
    srv2.close()
    assert health2 == []
    ev2 = read_cdc_log(spark, str(tmp_path / "wal2"))
    assert ev2.collect()[0]["record"]["house"] == "Atreides"


def test_contract_publication_drop_midstream(spark, tmp_path):
    """Publication dropped while streaming: the walsender answers the
    next decode with an ErrorResponse mid-COPY (42704 'publication
    does not exist').  The client must surface it as a typed
    ReplicationError — never pixels-from-garbage silence — and the
    supervision loop reconnects with backoff and resumes from the
    slot cursor once the publication exists again (the reference's
    SlotSupervisor restart semantics; error classed like
    postgres_replication_test.exs:1044's missing-slot family)."""
    import pyarrow.parquet as pq

    from sequin_spark.sources.replication import run_supervised
    from tests.test_replication import DroppingWalSender, msg

    err = msg(b"E", b"SERROR\x00C42704\x00"
                    b'Mpublication "sequin_pub" does not exist\x00\x00')
    script1 = ([_chars_rel()] + _txn(L1, ins(CHAR_OID, 1, "arya", "Stark",
                                             "Winterfell", "t", "{}"))
               + [err])
    # the slot cursor only advances on OUR acks; whether txn1's flush
    # beat the error is a race, so the recovered walsender re-sends
    # everything past the cursor — txn1 may land twice in the raw log
    # (at-least-once), and the idempotency dedup collapses it
    script2 = ([_chars_rel()]
               + _txn(L1, ins(CHAR_OID, 1, "arya", "Stark",
                              "Winterfell", "t", "{}"))
               + _txn(L2, ins(CHAR_OID, 2, "sansa", "Stark",
                              "Winterfell", "t", "{}"), xid=2))
    s1 = DroppingWalSender(script1)  # error frame, then hangs up
    s2 = FakeWalSender(script2)
    servers = [s1, s2]

    def factory():
        srv = servers.pop(0) if servers else s2
        return ReplicationClient(
            "127.0.0.1", srv.port, user="replicator", database="postgres",
            password="s3cret", receive_timeout=0.05,
        )

    out_dir = tmp_path / "wal"
    health = []

    def _lsns():
        out = []
        for f in sorted(out_dir.glob("*.parquet")):
            try:
                out.extend(r["commit_lsn"]
                           for r in pq.read_table(str(f)).to_pylist())
            except OSError:
                return []
        return out

    def done():
        ls = set(_lsns())
        return L1 in ls and L2 in ls

    run_supervised(
        factory, str(out_dir), slot_name="sequin_slot",
        publication="sequin_pub", max_seconds=20, stop_when=done,
        initial_backoff=0.05, max_backoff=0.2,
        on_health=lambda ev, detail: health.append((ev, detail)),
        flush_seconds=0.05, ack_interval=0.05,
    )
    lsns = _lsns()
    # both txns recovered; txn1 at-least-once in the raw log, exactly
    # once after the idempotency dedup (the :863 contract)
    assert set(lsns) == {L1, L2}
    assert lsns.count(L2) == 1
    from sequin_spark.operators.dedup import dedup_replays

    ev = read_cdc_log(spark, str(out_dir))
    assert sorted(r.commit_lsn for r in dedup_replays(ev).collect()) \
        == [L1, L2]
    # the disconnect carried the publication error detail
    drops = [d for ev_, d in health if ev_ == "replication_disconnected"]
    assert any("publication" in d for d in drops)
