"""Replay dedup and idempotency-ledger anti-join.

Reference semantics:

- Re-ingest after restart replays WAL from the restart cursor; the store
  dedups by (commit_lsn, commit_idx) (slot_message_store_state.ex:98,
  127-130).
- Before delivery, the idempotency ledger (Redis zset of delivered
  cursors, message_ledgers.ex:65-99 / sink_pipeline.ex:552-591) filters
  already-delivered messages; `read` (backfill) events skip the ledger.

Spark mapping: ``dropDuplicates`` (hash aggregate, map-side partial) and
a ``left_anti`` join against the delivered-log table. The ledger table is
tiny relative to the stream (trimmed by time) → broadcast anti-join, no
shuffle of the event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

CURSOR = ["commit_lsn", "commit_idx"]


def dedup_replays(df: DataFrame) -> DataFrame:
    return df.dropDuplicates(CURSOR)


def ledger_anti_join(df: DataFrame, delivered: DataFrame, broadcast_ledger: bool = True) -> DataFrame:
    """Drop events whose cursor is in the delivered ledger; backfill
    `read` events bypass the check (sink_pipeline.ex:560)."""
    ledger = delivered.select(*CURSOR).dropDuplicates(CURSOR)
    if broadcast_ledger:
        ledger = broadcast(ledger)
    reads = df.filter(F.col("action") == "read")
    rest = df.filter(F.col("action") != "read").join(ledger, CURSOR, "left_anti")
    return rest.unionByName(reads)
