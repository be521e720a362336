"""Schema-change detection: Relation hash cache parity
(postgres_relation_hash_cache.ex:20-25, relation.ex:173-186) — a
Relation message whose hash moved mid-stream emits a schema_changed
health event and refreshes the typed view with the new column."""

import struct

from sequin_spark.health import Health
from sequin_spark.schema import EVENT_SCHEMA
from sequin_spark.sources.pgoutput import EventFolder, decode
from sequin_spark.sources.relation_tracker import (
    RelationSchemaTracker,
    column_types,
    compute_schema_hash,
)

from tests.test_replication import (
    begin_frame,
    commit_frame,
    insert_frame,
    relation_frame,
)

COLS_V1 = [(1, "id", 20), (0, "name", 25)]
COLS_V2 = [(1, "id", 20), (0, "name", 25), (0, "age", 23)]


def test_schema_hash_stable_and_sensitive():
    r1 = decode(relation_frame(cols=COLS_V1))
    r1b = decode(relation_frame(cols=COLS_V1))
    r2 = decode(relation_frame(cols=COLS_V2))
    assert compute_schema_hash(r1) == compute_schema_hash(r1b)
    assert compute_schema_hash(r1) != compute_schema_hash(r2)
    # rename and retype both move the hash
    renamed = decode(relation_frame(cols=[(1, "id", 20), (0, "fullname", 25)]))
    retyped = decode(relation_frame(cols=[(1, "id", 20), (0, "name", 1700)]))
    assert len({compute_schema_hash(x) for x in (r1, renamed, retyped)}) == 3
    assert column_types(r2) == {"id": "int8", "name": "text", "age": "int4"}


def test_relation_change_mid_stream_emits_event_and_new_column(spark, tmp_path):
    health = Health(entity_id="slot-1")
    refreshed = []
    tracker = RelationSchemaTracker(
        state_path=str(tmp_path / "hashes.json"),
        health=health,
        on_change=lambda rel, old, new: refreshed.append((old, new)),
    )
    folder = EventFolder(on_relation=tracker.observe)
    events = []
    frames = [
        relation_frame(cols=COLS_V1),
        begin_frame(1000),
        insert_frame(101, "1", "arya"),
        commit_frame(1000),
        # ALTER TABLE … ADD COLUMN age → new Relation frame mid-stream
        relation_frame(cols=COLS_V2),
        begin_frame(2000),
        insert_frame(101, "2", "sansa", "14"),
        commit_frame(2000),
    ]
    for f in frames:
        events.extend(folder.push(decode(f)))

    # first sight stored silently; the alter emitted exactly one change
    assert len(tracker.changes) == 1
    change = tracker.changes[0]
    assert change["old_columns"] == ["id", "name"]
    assert change["new_columns"] == ["id", "name", "age"]
    assert health.events["schema_changed"].status == "info"
    assert refreshed == [(
        {"id": "int8", "name": "text"},
        {"id": "int8", "name": "text", "age": "int4"},
    )]

    # events decoded after the alter carry the new column, and the
    # refreshed typed view casts it per its declared PG type
    assert events[1]["record"] == {"id": "2", "name": "sansa", "age": "14"}
    df = spark.createDataFrame(events, EVENT_SCHEMA)
    typed = tracker.typed_view(df, 101).select("typed_record.*")
    row = {r["id"]: r for r in typed.collect()}
    assert row[2]["age"] == 14 and isinstance(row[2]["age"], int)
    assert row[1]["age"] is None  # pre-alter row: column absent → null


def test_hash_cache_persists_across_restarts(tmp_path):
    state = str(tmp_path / "hashes.json")
    t1 = RelationSchemaTracker(state_path=state)
    t1.observe(decode(relation_frame(cols=COLS_V1)))
    assert t1.changes == []

    # restart: same schema → silent; altered schema → change detected
    t2 = RelationSchemaTracker(state_path=state)
    assert t2.observe(decode(relation_frame(cols=COLS_V1))) is None
    assert t2.changes == []
    t3 = RelationSchemaTracker(state_path=state)
    change = t3.observe(decode(relation_frame(cols=COLS_V2)))
    assert change is not None
    # old_columns unknown after restart (registry is in-memory) but the
    # hash moved, which is what triggers the refresh
    assert change["new_columns"] == ["id", "name", "age"]
