"""pgoutput logical-replication binary frame decoder.

Decodes the Postgres logical streaming protocol's pgoutput messages
(Begin/Commit/Relation/Insert/Update/Delete/Truncate/Type/Logical
Message) from their public wire format — the same frames the reference
parses in lib/sequin/runtime/postgres_adapter/decoder.ex:267+ (struct
definitions :20-230). Format per the public PostgreSQL documentation
(protocol §55.5, "Logical Replication Message Formats").

This is the ingestion edge only: decoded tuples flow into the canonical
event schema via ``events_from_messages`` (the SlotProcessor cast step,
processor.ex:155-285), and everything downstream is ordinary engine
operators. Per-connection decode is inherently serial per slot; the
engine parallelizes downstream by repartitioning the decoded stream
(the reference's partition-parallel Processor + ReorderBuffer become a
plain shuffle + sortWithinPartitions).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

PG_EPOCH = datetime(2000, 1, 1, tzinfo=timezone.utc)

UNCHANGED_TOAST_MARKER = "__unchanged_toast__"


@dataclass
class Begin:
    final_lsn: int
    commit_timestamp: datetime
    xid: int


@dataclass
class Commit:
    flags: int
    commit_lsn: int
    end_lsn: int
    commit_timestamp: datetime


@dataclass
class Column:
    flags: int
    name: str
    type_oid: int
    type_modifier: int

    @property
    def is_pk(self) -> bool:
        return bool(self.flags & 1)


@dataclass
class Relation:
    oid: int
    namespace: str
    name: str
    replica_identity: str
    columns: list[Column]


@dataclass
class TupleData:
    values: list  # str | None | UNCHANGED_TOAST_MARKER


@dataclass
class Insert:
    relation_oid: int
    new: TupleData


@dataclass
class Update:
    relation_oid: int
    old: TupleData | None  # present with replica identity FULL ('O') / key ('K')
    new: TupleData


@dataclass
class Delete:
    relation_oid: int
    old: TupleData


@dataclass
class Truncate:
    relation_oids: list[int]
    options: int


@dataclass
class LogicalMessage:
    transactional: bool
    lsn: int
    prefix: str
    content: bytes


@dataclass
class Origin:
    """ORIGIN frame ('O'): emitted on cascading replication setups for
    changes that originated on another node (decoder.ex:58-71,
    :290-295).  A control frame — carries the origin commit LSN and
    name, yields no events."""

    origin_commit_lsn: int
    name: str


@dataclass
class Unsupported:
    """Unknown-tag fallthrough (decoder.ex:210-222, :417): the
    reference decodes unrecognized frames to a raw-data struct and the
    producer logs-and-skips (slot_producer.ex:515-519) rather than
    crashing the slot — protocol-forward-compatible by design."""

    data: bytes


def _cstr(buf: bytes, off: int) -> tuple[str, int]:
    end = buf.index(b"\x00", off)
    return buf[off:end].decode(), end + 1


def _ts(micros_since_2000: int) -> datetime:
    return PG_EPOCH + timedelta(microseconds=micros_since_2000)


def _tuple_data(buf: bytes, off: int) -> tuple[TupleData, int]:
    (ncols,) = struct.unpack_from(">H", buf, off)
    off += 2
    values: list = []
    for _ in range(ncols):
        kind = buf[off : off + 1]
        off += 1
        if kind == b"n":
            values.append(None)
        elif kind == b"u":
            values.append(UNCHANGED_TOAST_MARKER)
        elif kind in (b"t", b"b"):
            (ln,) = struct.unpack_from(">i", buf, off)
            off += 4
            raw = buf[off : off + ln]
            off += ln
            values.append(raw.decode() if kind == b"t" else raw)
        else:
            raise ValueError(f"unknown tuple column kind {kind!r}")
    return TupleData(values), off


def decode(frame: bytes):
    """Decode one pgoutput frame into its message dataclass."""
    tag = frame[0:1]
    if tag == b"B":
        final_lsn, ts, xid = struct.unpack_from(">QQI", frame, 1)
        return Begin(final_lsn, _ts(ts), xid)
    if tag == b"C":
        flags, clsn, elsn, ts = struct.unpack_from(">BQQQ", frame, 1)
        return Commit(flags, clsn, elsn, _ts(ts))
    if tag == b"R":
        (oid,) = struct.unpack_from(">I", frame, 1)
        off = 5
        ns, off = _cstr(frame, off)
        name, off = _cstr(frame, off)
        replident = frame[off : off + 1].decode()
        off += 1
        (ncols,) = struct.unpack_from(">H", frame, off)
        off += 2
        cols = []
        for _ in range(ncols):
            cflags = frame[off]
            off += 1
            cname, off = _cstr(frame, off)
            toid, tmod = struct.unpack_from(">Ii", frame, off)
            off += 8
            cols.append(Column(cflags, cname, toid, tmod))
        return Relation(oid, ns or "pg_catalog", name, replident, cols)
    if tag == b"I":
        (oid,) = struct.unpack_from(">I", frame, 1)
        assert frame[5:6] == b"N"
        new, _ = _tuple_data(frame, 6)
        return Insert(oid, new)
    if tag == b"U":
        (oid,) = struct.unpack_from(">I", frame, 1)
        off = 5
        old = None
        marker = frame[off : off + 1]
        if marker in (b"K", b"O"):
            off += 1
            old, off = _tuple_data(frame, off)
            marker = frame[off : off + 1]
        assert marker == b"N", f"expected new tuple, got {marker!r}"
        new, _ = _tuple_data(frame, off + 1)
        return Update(oid, old, new)
    if tag == b"D":
        (oid,) = struct.unpack_from(">I", frame, 1)
        marker = frame[5:6]
        assert marker in (b"K", b"O")
        old, _ = _tuple_data(frame, 6)
        return Delete(oid, old)
    if tag == b"T":
        nrels, options = struct.unpack_from(">IB", frame, 1)
        oids = list(struct.unpack_from(f">{nrels}I", frame, 6))
        return Truncate(oids, options)
    if tag == b"M":
        flags, lsn = struct.unpack_from(">BQ", frame, 1)
        off = 10
        prefix, off = _cstr(frame, off)
        (ln,) = struct.unpack_from(">I", frame, off)
        off += 4
        return LogicalMessage(bool(flags & 1), lsn, prefix, frame[off : off + ln])
    if tag == b"Y":  # Type message — carried through, types resolve via catalogs
        (oid,) = struct.unpack_from(">I", frame, 1)
        return ("type", oid)
    if tag == b"O":  # Origin — control frame on cascading replication
        (lsn,) = struct.unpack_from(">Q", frame, 1)
        name, _ = _cstr(frame + b"\x00", 9)  # name = rest of frame
        return Origin(lsn, name)
    # reference parity: unknown tags decode to Unsupported and are
    # logged-and-skipped upstream, never a slot crash
    return Unsupported(frame)


import base64 as _b64


class EventFolder:
    """Incremental fold of decoded pgoutput messages into canonical event
    dicts — the SlotProcessor cast (processor.ex:155-285) plus the
    SlotProducer's Begin/Commit commit_idx bookkeeping and transaction
    annotations (slot_producer.ex:384-420, :438-455).

    ``push(msg)`` returns the events the message yields (one for each
    Insert/Update/Delete, none for control frames).  State — the Relation
    registry, current-transaction cursor, annotations — persists across
    pushes, so a long-lived replication connection folds frames as they
    arrive.  ``events_from_messages`` is the batch wrapper.

    Guards mirror the reference: a Begin whose LSN is below the last
    committed LSN raises (slot_producer.ex:387-391: replay past the
    confirmed cursor means slot corruption), and a Commit whose LSN
    differs from the open transaction's raises (:402-410).
    """

    def __init__(self, on_relation=None):
        self.relations: dict[int, Relation] = {}
        self.commit_lsn = 0
        self.commit_ts = None
        self.commit_idx = 0
        self.last_commit_lsn: int | None = None
        self.in_txn = False
        self.annotations: str | None = None
        self.on_relation = on_relation  # callback(Relation) for schema tracking
        # tables that emitted an unchanged-TOAST sentinel with no
        # pre-image to fill from (replica identity default) — surfaced
        # as the reference's toast_columns_detected health warning
        self.toast_unfillable_tables: set[str] = set()

    @staticmethod
    def _row(rel: Relation, tup: TupleData) -> dict:
        return {c.name: v for c, v in zip(rel.columns, tup.values)}

    def push(self, msg) -> list[dict]:
        if isinstance(msg, Begin):
            if self.last_commit_lsn is not None and msg.final_lsn < self.last_commit_lsn:
                raise ValueError(
                    f"Begin LSN below last commit LSN ({msg.final_lsn} < {self.last_commit_lsn})"
                )
            self.commit_lsn = msg.final_lsn
            self.commit_ts = msg.commit_timestamp
            self.commit_idx = 0  # Begin resets (slot_producer.ex:384-393)
            self.in_txn = True
            return []
        if isinstance(msg, Commit):
            if self.in_txn and msg.commit_lsn != self.commit_lsn:
                raise ValueError(
                    f"Commit LSN mismatch ({msg.commit_lsn} != {self.commit_lsn})"
                )
            self.last_commit_lsn = self.commit_lsn
            self.in_txn = False
            self.annotations = None  # annotations are per-transaction
            return []
        if isinstance(msg, Relation):
            self.relations[msg.oid] = msg
            if self.on_relation is not None:
                self.on_relation(msg)
            return []
        if isinstance(msg, LogicalMessage):
            if msg.prefix.endswith("transaction_annotations.set"):
                # invalid (non-JSON-object) annotations are IGNORED, not
                # propagated (postgres_replication_test.exs:503-548: the
                # reference logs and drops them; events carry none)
                try:
                    import json as _json

                    parsed = _json.loads(msg.content.decode())
                    self.annotations = (
                        msg.content.decode() if isinstance(parsed, dict) else None
                    )
                except (ValueError, UnicodeDecodeError):
                    self.annotations = None
            elif msg.prefix.endswith("transaction_annotations.clear"):
                self.annotations = None
            return []
        if isinstance(msg, (Truncate, Origin, tuple)):
            return []
        if isinstance(msg, Unsupported):
            # log-and-skip, never a slot crash (slot_producer.ex:515-519)
            import logging

            logging.getLogger(__name__).warning(
                "unsupported pgoutput frame tag %r skipped", msg.data[:1])
            return []
        rel = self.relations[msg.relation_oid]
        if isinstance(msg, Insert):
            action, record, changes = "insert", self._row(rel, msg.new), None
        elif isinstance(msg, Update):
            record = self._row(rel, msg.new)
            if msg.old is not None:
                old = self._row(rel, msg.old)
                changes = {
                    k: v
                    for k, v in old.items()
                    if record.get(k) != v and record.get(k) != UNCHANGED_TOAST_MARKER
                }
                # TOAST fill from the pre-image (message_handler.ex:309-353)
                record = {
                    k: (old.get(k) if v == UNCHANGED_TOAST_MARKER and old.get(k) is not None else v)
                    for k, v in record.items()
                }
            else:
                changes = {}
                if any(v == UNCHANGED_TOAST_MARKER for v in record.values()):
                    # identity default: no pre-image to fill from — the
                    # sentinel passes through and the reference flags a
                    # health WARNING per consumer
                    # (message_handler.ex:355-361 toast_columns_detected)
                    self.toast_unfillable_tables.add(rel.name)
            action = "update"
        else:  # Delete — pre-image becomes the record
            action, record, changes = "delete", self._row(rel, msg.old), None
        pks = [str(record[c.name]) for c in rel.columns if c.is_pk and record.get(c.name) is not None]
        event = {
            "action": action,
            "record": {k: (None if v is None else str(v)) for k, v in record.items()},
            "changes": changes,
            "table_schema": rel.namespace,
            "table_name": rel.name,
            "table_oid": rel.oid,
            "record_pks": pks,
            "group_id": ":".join(pks) if pks else None,
            "commit_lsn": self.commit_lsn,
            "commit_idx": self.commit_idx,
            "commit_timestamp": self.commit_ts,
            "idempotency_key": _b64.b64encode(
                f"{self.commit_lsn}:{self.commit_idx}".encode()
            ).decode(),
            "trace_id": None,
            "transaction_annotations": self.annotations,
        }
        self.commit_idx += 1
        return [event]


def events_from_messages(messages: list) -> list[dict]:
    """Batch fold of a decoded frame sequence (see EventFolder).

    Returns rows matching schema.EVENT_SCHEMA keys; feed them to
    spark.createDataFrame(rows, EVENT_SCHEMA).
    """
    folder = EventFolder()
    events: list[dict] = []
    for msg in messages:
        events.extend(folder.push(msg))
    return events
