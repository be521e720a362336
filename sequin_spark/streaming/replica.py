"""Continuous replica-apply — streaming SCD1 table maintenance.

The reference's headline use case is keeping a destination table
continuously correct: a sink consumer "receives changes and upserts to
your destination table", idempotent via PK ON CONFLICT
(docs/how-to/replicate-tables.mdx:39,92; grouping/ordering per PK from
docs/reference/sinks/overview).  The engine has the batch-relational
form (queries.q_cdc_table_materialize — one ``max_by(value, seq)`` hash
aggregate) and an event-log postgres sink; this module is the STANDING
apply: a foreachBatch maintainer that keeps a queryable last-wins
replica in the engine's own bucketed-parquet layout while the change
stream runs.

Execution shape (designed for the 100 TB CDC firehose, where the
change log is orders of magnitude larger than the key space):

- **Per micro-batch**: ONE map-side-combinable ``max_by(value, seq)``
  hash aggregate reduces the batch to its last-wins delta — one row
  per touched PK, delete tombstones included — then ONE bucketed
  append co-located on the PK (operators/bucketed.append_bucketed_batch).
  No join against the existing replica, no rewrite of resident data:
  per-batch cost is O(batch), independent of replica size.  This is
  the log-structured-merge shape — the same reason the reference's
  destination-table upsert is O(changes), not O(table).
- **Read side** (``current()``): the segment table is bucketed on the
  PK, so the collapsing ``max_by`` group-by runs with ZERO Exchange —
  Spark reads each bucket locally and collapses in place.  Downstream
  fact-to-fact joins on the PK keep the shuffle-free SortMergeJoin.
- **Compaction** (``compact()``): collapses segments to one row per
  live PK (tombstones applied) through the same rewrite-and-swap
  machinery as operators/bucketed.compact_bucketed, amortizing
  read-side work; batch markers are PRESERVED so a replay of an
  already-compacted batch id stays skipped.

Exactly-once across stop/restart/replay:

1. Structured Streaming replays only the LAST uncommitted micro-batch
   after a crash; each append writes a ``_batch_<id>`` marker after
   the data, so a replayed committed batch is skipped (marker hit).
2. The append→marker crash window re-appends one batch's delta —
   harmless: last-wins collapse is idempotent (identical rows tie on
   seq with identical values).
3. Compaction drops tombstones, which is safe ONLY because markers
   survive compaction: the sole batch that can ever replay afterwards
   is the newest (marker-less) one, whose per-PK delta carries the
   max seq for each touched key — an older update can never sneak in
   behind a compacted-away tombstone and revive a deleted row.

The optional Postgres leg of the same use case — ``INSERT … ON
CONFLICT (pk) DO UPDATE`` + tombstone DELETEs into a real destination
table — is sinks/postgres.PostgresReplicaSink, delivered through the
normal DeliveryEngine (executor-side, ordered per PK group).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ReplicaApplier:
    """foreachBatch maintainer of a last-wins (SCD1) replica table.

    ``stream rows → last-wins delta per PK → idempotent bucketed
    append``; ``current()`` is the queryable replica, ``compact()``
    the amortized collapse.  Input rows carry ``pk_col``, a totally-
    ordered ``seq_col`` (any orderable type — a long, or the
    ``(commit_lsn, commit_idx)`` struct the pipeline feeds, compared
    lexicographically by Spark's struct ordering), an
    ``action_col`` whose ``delete_action`` value tombstones the PK,
    plus any value columns (replica identity full: the latest event
    carries the whole record).
    """

    def __init__(
        self,
        table_name: str,
        path: str,
        pk_col: str,
        seq_col: str = "seq",
        action_col: str = "action",
        delete_action: str = "delete",
        n_buckets: int = 8,
        compact_every: int | None = None,
    ):
        self.table_name = table_name
        self.path = path
        self.pk_col = pk_col
        self.seq_col = seq_col
        self.action_col = action_col
        self.delete_action = delete_action
        self.n_buckets = n_buckets
        self.compact_every = compact_every

    # --- write path ------------------------------------------------------

    def last_wins_delta(self, batch_df: DataFrame) -> DataFrame:
        """Reduce a micro-batch to one row per touched PK — the newest
        event's values, tombstones kept.  Map-side-combinable hash
        aggregate: the shuffle carries one row per (partition, key),
        never the batch."""
        pk, seq, act = self.pk_col, self.seq_col, self.action_col
        value_cols = [c for c in batch_df.columns if c not in (pk, seq, act)]
        return batch_df.groupBy(pk).agg(
            F.max(seq).alias(seq),
            F.max_by(act, F.col(seq)).alias(act),
            *[F.max_by(c, F.col(seq)).alias(c) for c in value_cols],
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> bool:
        """The foreachBatch body (public so crash-replay semantics are
        directly testable).  Returns False on a replayed committed
        batch (marker hit → skipped)."""
        from sequin_spark.operators.bucketed import append_bucketed_batch

        batch_df = self._ensure_schema(batch_df)
        delta = self.last_wins_delta(batch_df)
        appended = append_bucketed_batch(
            delta, self.table_name, self.path, self.pk_col,
            self.n_buckets, batch_id)
        if appended:
            self._persist_schema(delta)
        if (appended and self.compact_every
                and batch_id % self.compact_every == self.compact_every - 1):
            self.compact(batch_df.sparkSession)
        return appended

    # --- schema evolution (r12 verdict task #5) ------------------------

    def _schema_path(self) -> str:
        return os.path.join(self.path, "_schema.json")

    def _persist_schema(self, df: DataFrame) -> None:
        """Record the CURRENT replica schema next to the data so a
        fresh process can re-declare the bucketed external table
        without hard-coding columns (the r12 re-declare DDL froze the
        column list — a widened log broke it)."""
        import json

        os.makedirs(self.path, exist_ok=True)
        with open(self._schema_path(), "w") as f:
            json.dump({
                "cols": [[fld.name, fld.dataType.simpleString()]
                         for fld in df.schema.fields],
                "pk": self.pk_col, "n_buckets": self.n_buckets,
            }, f)

    def _ensure_schema(self, batch_df: DataFrame) -> DataFrame:
        """Mid-log schema evolution (the reference's relation tracker
        handles mid-stream ALTER TABLE — slot_producer/relation.ex;
        the replica must follow): widen the catalog table with any NEW
        value columns (``ALTER TABLE … ADD COLUMNS`` is metadata-only;
        parquet segments written before the change read the new column
        as NULL), and NULL-fill the batch for any table column it
        lacks, so every append matches the union schema.  Type changes
        are NOT migrated (same posture as the reference: a retyped
        column is a new column to the destination) — the first schema
        wins per name."""
        from pyspark.sql import functions as F  # noqa: N812

        spark = batch_df.sparkSession
        if not spark.catalog.tableExists(self.table_name):
            return batch_df  # first append creates the table as-is
        tbl = dict((f.name, f.dataType.simpleString())
                   for f in spark.table(self.table_name).schema.fields)
        batch = dict((f.name, f.dataType.simpleString())
                     for f in batch_df.schema.fields)
        new_cols = [(n, t) for n, t in batch.items() if n not in tbl]
        if new_cols:
            cols_sql = ", ".join(f"`{n}` {t}" for n, t in new_cols)
            spark.sql(f"ALTER TABLE {self.table_name} "
                      f"ADD COLUMNS ({cols_sql})")
            tbl.update(dict(new_cols))
        missing = [(n, t) for n, t in tbl.items() if n not in batch]
        for n, t in missing:
            batch_df = batch_df.withColumn(n, F.lit(None).cast(t))
        # column order follows the (widened) table
        return batch_df.select(*[F.col(n) for n in tbl])

    def ensure_declared(self, spark: SparkSession) -> bool:
        """Re-declare the bucketed external table over existing files
        in a fresh session, using the persisted ``_schema.json`` (the
        bucket spec lives in the catalog, not the parquet — same
        pattern as operators/bucketed.bucketed_table, but the column
        list tracks the evolved schema instead of being frozen at
        build time).  Returns True if a declaration happened."""
        import json

        if spark.catalog.tableExists(self.table_name):
            return False
        with open(self._schema_path()) as f:
            meta = json.load(f)
        ddl_cols = ", ".join(f"`{n}` {t}" for n, t in meta["cols"])
        spark.sql(
            f"CREATE TABLE {self.table_name} ({ddl_cols}) USING parquet "
            f"CLUSTERED BY ({meta['pk']}) SORTED BY ({meta['pk']}) "
            f"INTO {meta['n_buckets']} BUCKETS LOCATION "
            f"'{os.path.join(self.path, 'data')}'")
        return True

    def writer(self, events: DataFrame):
        """``events.writeStream`` wired to this applier — caller sets
        checkpointLocation/trigger and calls ``start()``."""
        return events.writeStream.foreachBatch(
            lambda df, bid: self.process_batch(df, bid))

    # --- read path -------------------------------------------------------

    def segments(self, spark: SparkSession) -> DataFrame:
        # foreachBatch appends run in a CLONED session whose writes do
        # not invalidate this session's relation/file-index cache — a
        # reader that skips the refresh can miss every segment appended
        # since its last read (observed: streaming restart test)
        spark.sql(f"REFRESH TABLE {self.table_name}")
        return spark.table(self.table_name)

    def current(self, spark: SparkSession) -> DataFrame:
        """The replica: last-wins row per PK, deleted keys absent.
        Zero-Exchange — the segment table is bucketed on the PK, so
        the collapsing aggregate reads each bucket locally."""
        seg = self.segments(spark)
        g = self.last_wins_delta(seg)  # same collapse, segment-level
        return (g.where(F.col(self.action_col) != F.lit(self.delete_action))
                 .drop(self.action_col))

    # --- maintenance -----------------------------------------------------

    def compact(self, spark: SparkSession) -> int:
        """Collapse the segment log to one row per LIVE PK (tombstones
        applied and dropped), preserving batch markers — see the
        module docstring's invariant #3 for why markers must survive.
        Returns the post-compaction data file count."""
        from sequin_spark.operators.bucketed import compact_bucketed

        collapsed = self.last_wins_delta(self.segments(spark)).where(
            F.col(self.action_col) != F.lit(self.delete_action))
        return compact_bucketed(
            spark, self.table_name, self.path, self.pk_col,
            self.n_buckets, rows=collapsed, clear_markers=False)

    def marker_count(self) -> int:
        markers = os.path.join(self.path, "_batches")
        if not os.path.isdir(markers):
            return 0
        return len([f for f in os.listdir(markers) if f.startswith("_batch_")])
