"""Grouping, ordering, and deliverable selection.

The reference's stateful core is the per-group ordered delivery buffer
(lib/sequin/runtime/slot_message_store_state.ex): messages are delivered
in (commit_lsn, commit_idx) order *within* a group_id, groups proceed
independently, and a group with an outstanding (unacked or
backoff-blocked) message blocks its later messages
(slot_message_store_state.ex:432-478).

Spark mapping: a shuffle on group_id co-locates each group, and a window
sort restores the total order inside it — the reference's ReorderBuffer
(slot_producer/reorder_buffer.ex) plus deliverable selection become one
repartition + sortWithinPartitions / row_number. At 100 TB the shuffle is
hash-partitioned on group_id (≈ PK), which is near-uniform; skew only
appears if one key is hot, which AQE skew-join/salting handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CURSOR = ["commit_lsn", "commit_idx"]


def repartition_by_group(df: DataFrame, partition_count: int | None = None) -> DataFrame:
    """partition_count-way shard by group hash (sink_consumer.ex:97,
    slot_message_store.ex:224-300 `:erlang.phash2` sharding)."""
    if partition_count:
        return df.repartition(partition_count, "group_id")
    return df.repartition("group_id")


def order_within_groups(df: DataFrame) -> DataFrame:
    """Assign per-group delivery sequence number (1 = next deliverable).

    Null group_id rows are delivered independently
    (slot_message_store_state.ex:432-478) → they get deliver_seq 1 by
    ordering over a unique synthetic group (the cursor itself).
    """
    grp = F.coalesce(
        F.col("group_id"),
        F.concat(F.lit("\x00"), F.col("commit_lsn"), F.lit(":"), F.col("commit_idx")),
    )
    w = Window.partitionBy(grp).orderBy(F.col("commit_lsn"), F.col("commit_idx"))
    return df.withColumn("deliver_seq", F.row_number().over(w))


def deliverable_messages(df: DataFrame, batch_size: int | None = None) -> DataFrame:
    """First undelivered message per group = deliverable set
    (group-blocking: later messages wait until the head is acked)."""
    out = order_within_groups(df).filter(F.col("deliver_seq") == 1).drop("deliver_seq")
    if batch_size:
        out = out.orderBy(*CURSOR).limit(batch_size)
    return out


def produce_order_with_cdc_priority(
    df: DataFrame,
    backfill_col: str = "is_backfill",
    batch_size: int | None = None,
    partition_count: int = 1,
) -> DataFrame:
    """Deliverable heads in the reference's CDC-over-backfill produce
    order (slot_message_store_state.ex prioritization;
    slot_message_store_state_test.exs:975-1145):

    - live CDC messages are produced BEFORE backfill (table-reader)
      messages when that is safe — a backfill shouldn't add latency to
      the live change feed;
    - the moment ANY group in a store partition holds both a backfill
      and a CDC message, that partition switches to plain cursor order
      entirely (the reference's documented simplification:
      prioritizing around a conflicted group could reorder within it,
      violating the strict per-group cursor contract — the "NOT
      prioritized when group conflicts exist" test);
    - within a group, order is always strictly (commit_lsn,
      commit_idx), whatever the mode.

    ``backfill_col`` is a boolean column marking table-reader rows
    (the reference keys on table_reader_batch_id; the engine's analog
    is ``action == 'read'``).  Adds ``produce_rank`` (1 = first
    produced, per store partition); ``batch_size`` caps the produced
    count PER PARTITION, like the reference's per-partition-store
    produce_messages call.

    100 TB shape: everything is partition-local, mirroring the
    reference's partition_count-sharded stores (pmod(hash(group),
    partition_count), the same scheme the delivery ledger slices use),
    and the store is read ONCE: the per-group mixed flag rides the
    same group-keyed window shuffle that assigns deliver_seq
    (min(bf) != max(bf) over the group ⇔ count_distinct > 1), and the
    partition-level conflict flag rides the store-partition window the
    rank already pays for (every group has exactly one head, so the
    max over heads' flags equals the max over groups).  The previous
    shape evaluated the store twice (a separate group-hash aggregate +
    broadcast join) — two full input passes per call.  The rank window
    is PARTITIONED by the store partition — never a SinglePartition
    funnel."""
    grp = F.coalesce(
        F.col("group_id"),
        F.concat(F.lit("\x00"), F.col("commit_lsn"), F.lit(":"),
                 F.col("commit_idx")),
    )
    store_part = F.pmod(F.hash(grp), F.lit(partition_count))
    w_grp = Window.partitionBy(grp)
    # per-group mixed flag on every row of the group (unbounded frame —
    # shares the deliver_seq window's shuffle).  Null group_ids are
    # independent singleton groups and can never conflict; they are
    # masked out exactly as the old pre-aggregate exclusion did (a
    # synthetic cursor-keyed group could otherwise collide on a
    # duplicated cursor and report a phantom conflict).
    g_mixed = (
        (F.min(F.col(backfill_col)).over(w_grp)
         != F.max(F.col(backfill_col)).over(w_grp))
        & F.col("group_id").isNotNull()
    )
    seq = F.row_number().over(
        w_grp.orderBy(F.col("commit_lsn"), F.col("commit_idx")))
    head = (df.withColumn("_g_mixed", g_mixed)
              .withColumn("deliver_seq", seq)
              .filter(F.col("deliver_seq") == 1).drop("deliver_seq")
              .withColumn("_sp", store_part))
    w_sp = Window.partitionBy("_sp")
    out = head.withColumn("_conflict", F.max("_g_mixed").over(w_sp))
    rank_key = F.when(F.col("_conflict"), F.lit(0)) \
                .otherwise(F.col(backfill_col).cast("int"))
    w = w_sp.orderBy(rank_key, *[F.col(c) for c in CURSOR])
    out = (out.withColumn("produce_rank", F.row_number().over(w))
              .drop("_conflict", "_sp", "_g_mixed"))
    if batch_size:
        out = out.where(F.col("produce_rank") <= batch_size)
    return out


def sort_for_delivery(df: DataFrame,
                      num_partitions: int | None = None) -> DataFrame:
    """Cluster by group, restore cursor order within each partition —
    the physical layout foreachBatch delivery iterates over.

    ``num_partitions`` sizes the group shuffle to the DATA, not the
    session default: at a fixed spark.sql.shuffle.partitions the
    per-partition sort spills once batches outgrow executor memory —
    the r10 sf1→sf10 decade measured the chain at 15.6× for 10× rows
    (32 partitions × ~700 MB each) vs ~linear once partitions are
    sized to ~128 MB.  AQE's REBALANCE is NOT a substitute here: its
    skew-splitting may split one group across partitions, breaking the
    per-group ordering contract this layout exists for."""
    if num_partitions:
        out = df.repartition(num_partitions, "group_id")
    else:
        out = df.repartition("group_id")
    return out.sortWithinPartitions("group_id", *CURSOR)
