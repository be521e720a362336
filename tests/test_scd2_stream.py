"""SCD2 streaming twin (streaming/stateful.scd2_history_stream) —
batch-vs-stream parity against the q_cdc_scd2_history shape across
out-of-order micro-batch arrivals, replays, and a stop/restart
(r11 verdict task #2)."""

import os

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sequin_spark.streaming.stateful import (
    SCD2_FLUSH_ACTION,
    scd2_history_stream,
)

SCHEMA = "pk long, seq long, action string, val long"


def _mk(spark, rows):
    return spark.createDataFrame(
        [Row(pk=p, seq=s, action=a, val=v) for p, s, a, v in rows], SCHEMA)


def _batch_scd2(spark, rows):
    """The batch-relational oracle: q_cdc_scd2_history's lead(seq)
    window over the deduped log."""
    log = _mk(spark, rows).dropDuplicates(["pk", "seq"])
    w = Window.partitionBy("pk").orderBy("seq")
    h = log.withColumn("valid_to_seq", F.lead("seq").over(w))
    out = (h.where(F.col("action") != "delete")
            .select("pk", F.col("seq").alias("valid_from_seq"), "val",
                    "valid_to_seq",
                    F.col("valid_to_seq").isNull().alias("is_current")))
    return {tuple(r) for r in out.collect()}


def test_scd2_stream_parity_across_restart_and_replay(spark, tmp_path):
    """Three micro-batches with shuffled in-batch order, a replayed
    suffix (at-least-once), a restart between batches 2 and 3, then a
    flush snapshot: emitted rows must equal the batch SCD2 history."""
    # per-PK chains: pk1 i→u→u, pk2 i→d→i (revive), pk3 i→d (gone)
    b1 = [(1, 10, "insert", 100), (2, 11, "insert", 200),
          (3, 12, "insert", 300)]
    b2 = [(2, 21, "delete", 200), (1, 20, "update", 110),
          (3, 22, "delete", 300),
          (1, 10, "insert", 100)]          # replayed suffix: must drop
    b3 = [(1, 30, "update", 120), (2, 31, "insert", 260)]
    flush = [(p, 10**9, SCD2_FLUSH_ACTION, 0) for p in (1, 2, 3)]
    real = b1 + [r for r in b2 if r[1] != 10] + b3

    src, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(src)
    got = []

    def run():
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(src + "/f*"))
        hist = scd2_history_stream(stream, pk_col="pk", seq_col="seq",
                                   action_col="action")
        q = (hist.writeStream.foreachBatch(
                lambda df, bid: got.extend(tuple(r) for r in df.collect()))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    _mk(spark, b1).coalesce(1).write.parquet(src + "/f1")
    _mk(spark, b2).coalesce(1).write.parquet(src + "/f2")
    run()                                   # first incarnation: b1, b2
    mid = set(got)
    # closed-so-far rows only; nothing is_current yet, no delete rows
    assert all(r[-1] is False for r in mid)
    assert (1, 10, 100, 20, False) in mid
    assert (2, 11, 200, 21, False) in mid   # closed by the delete
    assert (3, 12, 300, 22, False) in mid

    _mk(spark, b3).coalesce(1).write.parquet(src + "/f3")
    _mk(spark, flush).coalesce(1).write.parquet(src + "/f4")
    run()                                   # restart: state restored
    assert set(got) == _batch_scd2(spark, real)
    # pk3 ends deleted: no current row; pk2 revived: current row present
    cur = {r for r in got if r[-1]}
    assert cur == {(1, 30, 120, None, True), (2, 31, 260, None, True)}


def test_scd2_stream_multi_event_single_batch(spark, tmp_path):
    """A PK's whole chain inside ONE micro-batch, rows shuffled: the
    per-batch seq sort must reconstruct the chain."""
    rows = [(7, 3, "update", 30), (7, 1, "insert", 10),
            (7, 4, "delete", 30), (7, 2, "update", 20),
            (8, 5, "insert", 50)]
    flush = [(7, 10**9, SCD2_FLUSH_ACTION, 0),
             (8, 10**9, SCD2_FLUSH_ACTION, 0)]
    src, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(src)
    _mk(spark, rows).coalesce(1).write.parquet(src + "/f1")
    _mk(spark, flush).coalesce(1).write.parquet(src + "/f2")
    got = []
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src + "/f*"))
    q = (scd2_history_stream(stream).writeStream.foreachBatch(
            lambda df, bid: got.extend(tuple(r) for r in df.collect()))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert set(got) == _batch_scd2(spark, rows)
    assert (7, 3, 30, 4, False) in set(got)  # closed by the delete
