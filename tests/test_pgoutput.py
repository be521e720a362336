"""pgoutput binary decoder tests — frames hand-crafted per the public
PostgreSQL logical replication wire format (the reference's decoder
semantics corpus, postgres_replication_test.exs analog)."""

import struct

from sequin_spark.schema import EVENT_SCHEMA
from sequin_spark.sources.pgoutput import (
    UNCHANGED_TOAST_MARKER,
    Begin,
    Commit,
    Delete,
    Insert,
    LogicalMessage,
    Relation,
    Update,
    decode,
    events_from_messages,
)


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def _tuple(*vals) -> bytes:
    out = struct.pack(">H", len(vals))
    for v in vals:
        if v is None:
            out += b"n"
        elif v == "__TOAST__":
            out += b"u"
        else:
            b = str(v).encode()
            out += b"t" + struct.pack(">i", len(b)) + b
    return out


def _relation_frame(oid=101, ns="public", name="characters"):
    cols = b""
    for flags, cname, toid in [(1, "id", 20), (0, "name", 25), (0, "bio", 25)]:
        cols += bytes([flags]) + _cstr(cname) + struct.pack(">Ii", toid, -1)
    return b"R" + struct.pack(">I", oid) + _cstr(ns) + _cstr(name) + b"d" + struct.pack(">H", 3) + cols


def test_decode_frames():
    b = decode(b"B" + struct.pack(">QQI", 1000, 777_000_000, 42))
    assert isinstance(b, Begin) and b.final_lsn == 1000 and b.xid == 42
    assert b.commit_timestamp.year == 2000

    c = decode(b"C" + struct.pack(">BQQQ", 0, 1000, 1001, 777))
    assert isinstance(c, Commit) and c.commit_lsn == 1000

    r = decode(_relation_frame())
    assert isinstance(r, Relation) and r.name == "characters"
    assert [col.name for col in r.columns] == ["id", "name", "bio"]
    assert r.columns[0].is_pk and not r.columns[1].is_pk

    i = decode(b"I" + struct.pack(">I", 101) + b"N" + _tuple("7", "Arya", "text"))
    assert isinstance(i, Insert) and i.new.values == ["7", "Arya", "text"]

    u = decode(
        b"U" + struct.pack(">I", 101)
        + b"O" + _tuple("7", "Arya", "old-bio")
        + b"N" + _tuple("7", "Arya2", "__TOAST__").replace(b"t" + struct.pack(">i", 9) + b"__TOAST__", b"u")
    )
    assert isinstance(u, Update) and u.old is not None

    d = decode(b"D" + struct.pack(">I", 101) + b"K" + _tuple("7", None, None))
    assert isinstance(d, Delete) and d.old.values == ["7", None, None]

    m = decode(
        b"M" + struct.pack(">BQ", 1, 55) + _cstr("sequin.transaction_annotations.set")
        + struct.pack(">I", 2) + b"{}"
    )
    assert isinstance(m, LogicalMessage) and m.transactional and m.content == b"{}"


def test_events_from_messages_full_txn(spark):
    """Begin → annotations set → insert/update(TOAST)/delete → Commit,
    folded into canonical events (commit_idx ordering, diff, TOAST fill,
    annotations propagation)."""
    new_tuple = struct.pack(">H", 3)
    new_tuple += b"t" + struct.pack(">i", 1) + b"7"
    new_tuple += b"t" + struct.pack(">i", 5) + b"Arya2"
    new_tuple += b"u"  # unchanged TOAST bio
    msgs = [
        decode(b"B" + struct.pack(">QQI", 5000, 777_000_000, 1)),
        decode(_relation_frame()),
        decode(
            b"M" + struct.pack(">BQ", 1, 55)
            + _cstr("sequin.transaction_annotations.set")
            + struct.pack(">I", 14) + b'{"user": "jd"}'
        ),
        decode(b"I" + struct.pack(">I", 101) + b"N" + _tuple("7", "Arya", "long-bio")),
        decode(b"U" + struct.pack(">I", 101) + b"O" + _tuple("7", "Arya", "long-bio") + b"N" + new_tuple),
        decode(b"D" + struct.pack(">I", 101) + b"K" + _tuple("7", None, None)),
        decode(b"C" + struct.pack(">BQQQ", 0, 5000, 5001, 777)),
    ]
    events = events_from_messages(msgs)
    assert [e["action"] for e in events] == ["insert", "update", "delete"]
    assert [e["commit_idx"] for e in events] == [0, 1, 2]
    assert all(e["commit_lsn"] == 5000 for e in events)
    assert all(e["transaction_annotations"] == '{"user": "jd"}' for e in events)
    upd = events[1]
    assert upd["changes"] == {"name": "Arya"}          # only genuinely changed
    assert upd["record"]["bio"] == "long-bio"          # TOAST filled from old
    assert upd["group_id"] == "7"
    # rows load into the canonical Spark schema
    df = spark.createDataFrame(events, EVENT_SCHEMA)
    assert df.count() == 3
    assert df.schema == EVENT_SCHEMA


def test_toast_marker_constant():
    from sequin_spark.operators.changes import UNCHANGED_TOAST

    assert UNCHANGED_TOAST == UNCHANGED_TOAST_MARKER


def test_decode_origin_frame():
    """ORIGIN ('O') is a control frame: 8-byte origin commit LSN +
    name (decoder.ex:290-295); the folder yields no events for it."""
    import struct

    from sequin_spark.sources.pgoutput import EventFolder, Origin, decode

    frame = b"O" + struct.pack(">Q", 12345) + b"upstream\x00"
    msg = decode(frame)
    assert isinstance(msg, Origin)
    assert msg.origin_commit_lsn == 12345
    assert msg.name == "upstream"
    assert EventFolder().push(msg) == []


def test_decode_unknown_tag_is_unsupported_not_crash():
    """Unknown tags decode to Unsupported and fold to zero events
    (decoder.ex:417, slot_producer.ex:515-519) — a newer-protocol
    frame must never crash the slot."""
    from sequin_spark.sources.pgoutput import EventFolder, Unsupported, decode

    frame = b"Z" + b"\x01\x02\x03"
    msg = decode(frame)
    assert isinstance(msg, Unsupported)
    assert msg.data == frame
    assert EventFolder().push(msg) == []
