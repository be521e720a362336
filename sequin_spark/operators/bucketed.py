"""Bucketed (co-located) fact tables — the 100 TB join recipe when BOTH
sides are too big to broadcast.

``bucketBy(k, key)`` + ``sortBy(key)`` at write time stores each side
pre-partitioned and pre-sorted on the join key, so a later sort-merge
join between two tables bucketed the same way reads both sides already
co-located: the physical plan has **zero Exchange** (no shuffle), which
at 1000 executors turns the dominant network cost of a fact-to-fact
join into pure local merge.  This is the Spark-native analog of the
reference keeping per-table slot streams partitioned by PK so
same-entity work never crosses workers
(lib/sequin/runtime/slot_processor/: one partition owns a key's
ordering end-to-end).

Tables are built once per corpus and persisted as EXTERNAL tables under
the repo ``.cache/`` dir, keyed by a content fingerprint of the source
parquet (the ``_index_cache_path`` scheme shared with the ANN indexes)
— a regenerated corpus never reuses stale buckets.  Because bucketing
metadata lives in the session catalog, not the files, a fresh process
re-declares the table over the existing files with ``CREATE TABLE …
CLUSTERED BY … INTO n BUCKETS LOCATION …`` — truthful, since the files
were written with exactly that spec.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

BUCKET_VERSION = "v1"


def bucketed_table(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key_col: str,
    n_buckets: int = 8,
) -> DataFrame:
    """Return ``table`` from ``sf_dir`` as a catalog table bucketed and
    sorted on ``key_col``, building/persisting it on first use.

    ``n_buckets`` is a layout constant, not a tuning knob per query:
    both sides of a co-located join must use the SAME bucket count or
    Spark re-shuffles one side.  At 100 TB you pick it once per subject
    area (e.g. 4096) and every fact table shares it.
    """
    from sequin_spark.cdc import load_table
    from sequin_spark.queries_datapipe import _index_cache_path

    cache = _index_cache_path(
        sf_dir, "bucketed", f"{BUCKET_VERSION}:{table}:{key_col}:{n_buckets}",
        src_table=table)
    name = f"bkt_{table}_{os.path.basename(cache)}"
    if spark.catalog.tableExists(name):
        return spark.table(name)

    src = load_table(spark, sf_dir, table)
    data_dir = os.path.join(cache, "data")
    meta = os.path.join(cache, "meta.json")
    if not os.path.exists(meta):
        # external table (explicit path): DROP in some later session
        # must never delete the cached files, unlike a managed table
        (src.write.mode("overwrite")
            .bucketBy(n_buckets, key_col).sortBy(key_col)
            .option("path", data_dir).saveAsTable(name))
        # meta.json LAST — the completeness probe; a build killed
        # mid-write leaves no meta and is rebuilt, never half-loaded
        os.makedirs(cache, exist_ok=True)
        with open(meta, "w") as f:
            json.dump({"table": table, "key": key_col,
                       "n_buckets": n_buckets,
                       "version": BUCKET_VERSION}, f)
        return spark.table(name)

    # files already on disk from an earlier process: re-declare the
    # bucketed external table over them (bucket spec lives in the
    # catalog, not the parquet files)
    ddl_cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in src.schema.fields)
    spark.sql(
        f"CREATE TABLE {name} ({ddl_cols}) USING parquet "
        f"CLUSTERED BY ({key_col}) SORTED BY ({key_col}) "
        f"INTO {n_buckets} BUCKETS LOCATION '{data_dir}'")
    return spark.table(name)


def bucketed_stream_writer(
    events: DataFrame,
    table_name: str,
    path: str,
    key_col: str,
    n_buckets: int = 8,
):
    """foreachBatch writer that maintains an incrementally-appended
    BUCKETED fact table from a CDC stream — so the replicated table
    stays co-located on its join key and every downstream fact-to-fact
    join keeps the zero-Exchange SortMergeJoin plan as data streams in.
    This is the CDC→analytics bridge for the bucketing recipe: the
    reference lands WAL events in ordinary tables
    (lib/sequin/runtime/wal_pipeline_server.ex); Spark-side we land
    them pre-partitioned for the joins that follow.

    Exactly-once: Structured Streaming replays the last uncommitted
    micro-batch after a crash, and a blind append would duplicate it.
    Each appended batch writes a ``_batch_<id>`` marker AFTER the
    append; a replayed batchId whose marker exists is skipped.  (The
    append→marker window is the same checkpoint-commit-is-ack
    exposure the delivery engine documents; downstream exact dedup
    absorbs it.)

    Compaction: each micro-batch adds ≤ n_buckets files; long-running
    streams should compact periodically (read table, overwrite with
    the same bucket spec) — same lifecycle as the delivery ledger's
    file compaction.

    Returns a ``DataStreamWriter`` — caller sets checkpointLocation
    and calls ``start()``.
    """
    def _append(batch_df: DataFrame, batch_id: int) -> None:
        append_bucketed_batch(batch_df, table_name, path, key_col,
                              n_buckets, batch_id)

    return events.writeStream.foreachBatch(_append)


def compact_bucketed(
    spark: SparkSession,
    table_name: str,
    path: str,
    key_col: str,
    n_buckets: int = 8,
    rows: DataFrame | None = None,
    clear_markers: bool = True,
) -> int:
    """Rewrite an incrementally-appended bucketed table into one file
    per bucket (same bucket spec, same rows) and reset the batch
    markers.  A long-running bucketed_stream_writer adds ≤ n_buckets
    files per micro-batch; at some point the scan cost is file-count
    bound, the same lifecycle the delivery ledger solves with
    count-threshold compaction.  Returns the number of data files
    after compaction.

    Rewrite-then-swap: the table is staged next to the live directory
    and moved into place.  The catalog registration is NEVER dropped —
    the bucket spec is unchanged, so after the directory swap a
    ``REFRESH TABLE`` is all the catalog needs.  Crash points:
    before the first rename the original table is intact; between the
    two renames the registered path is briefly empty, and the
    self-heal preamble below promotes the surviving directory on the
    next call (re-running compaction IS the recovery); after the
    second rename the compacted table is live.  Markers are only
    cleared after the swap — a replayed batch after compaction is
    re-appended, which downstream exact dedup absorbs; same
    at-least-once posture as the writer.

    ``rows`` (optional) substitutes the rewritten contents — callers
    that compact a LOG into a collapsed form (the replica applier's
    last-wins reduce, streaming/replica.py) pass the collapsed frame;
    default is a same-rows rewrite.  ``clear_markers=False`` keeps the
    ``_batch_<id>`` markers so replays of already-compacted batch ids
    stay skipped — REQUIRED whenever ``rows`` dropped information a
    replayed old batch could resurrect (the replica's delete
    tombstones: an old update replayed after its tombstone was
    compacted away would revive a deleted key)."""
    import shutil

    data_dir = os.path.join(path, "data")
    stage_dir = os.path.join(path, "data_compacting")
    old_dir = os.path.join(path, "data_old")
    stage_name = f"{table_name}__compact"
    # self-heal a previously interrupted swap: if the live directory is
    # missing, promote whichever complete copy survived (the staged
    # compacted data, else the pre-swap original) before proceeding
    if not os.path.isdir(data_dir):
        if os.path.isdir(stage_dir):
            os.rename(stage_dir, data_dir)
        elif os.path.isdir(old_dir):
            os.rename(old_dir, data_dir)
        spark.sql(f"REFRESH TABLE {table_name}")
    if rows is None:
        rows = spark.table(table_name)
    shutil.rmtree(stage_dir, ignore_errors=True)
    (rows.repartition(n_buckets, key_col)
        .write.mode("overwrite")
        .bucketBy(n_buckets, key_col).sortBy(key_col)
        .option("path", stage_dir).saveAsTable(stage_name))
    spark.sql(f"DROP TABLE {stage_name}")   # external: files survive
    shutil.rmtree(old_dir, ignore_errors=True)
    os.rename(data_dir, old_dir)
    os.rename(stage_dir, data_dir)
    spark.sql(f"REFRESH TABLE {table_name}")  # registration kept live
    shutil.rmtree(old_dir, ignore_errors=True)
    if clear_markers:
        shutil.rmtree(os.path.join(path, "_batches"), ignore_errors=True)
    return len([f for f in os.listdir(data_dir)
                if not f.startswith(("_", "."))])


def append_bucketed_batch(
    batch_df: DataFrame,
    table_name: str,
    path: str,
    key_col: str,
    n_buckets: int,
    batch_id: int,
) -> bool:
    """One idempotent bucketed append (the foreachBatch body of
    bucketed_stream_writer, public so crash-replay semantics are
    directly testable).  Returns False when the batch id was already
    committed (replay skip)."""
    import json as _json

    markers = os.path.join(path, "_batches")
    marker = os.path.join(markers, f"_batch_{batch_id}")
    if os.path.exists(marker):
        return False  # replay of a committed batch: idempotent skip
    (batch_df.write.mode("append")
        .bucketBy(n_buckets, key_col).sortBy(key_col)
        .option("path", os.path.join(path, "data"))
        .saveAsTable(table_name))
    os.makedirs(markers, exist_ok=True)
    with open(marker, "w") as f:
        _json.dump({"batch_id": batch_id}, f)
    return True
