"""Plan-surface SCD2 audit-table consumer (``sink_type: scd2_history``)
— the standing audit-log use case reachable from config
(docs/how-to/create-audit-logs.mdx), the SCD2 twin of the
``parquet_replica`` plan surface.  Also covers the two-column
(commit_lsn, commit_idx) cursor mode of scd2_history_stream — the
pipeline cannot pack the cursor into one int64 (a Postgres LSN is a
cumulative 64-bit byte position; packing wraps at ~8 TB lifetime WAL,
the r13 ADVICE finding on the replica path)."""

import os

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SCHEMA = "pk long, l long, i long, action string, val long"


def _mk(spark, rows):
    return spark.createDataFrame(
        [Row(pk=p, l=ln, i=ix, action=a, val=v)
         for p, ln, ix, a, v in rows], SCHEMA)


def _batch_oracle(spark, rows):
    """lead over the (l, i) cursor — the two-column batch twin."""
    log = _mk(spark, rows).dropDuplicates(["pk", "l", "i"])
    w = Window.partitionBy("pk").orderBy("l", "i")
    h = (log.withColumn("valid_to_l", F.lead("l").over(w))
            .withColumn("valid_to_i", F.lead("i").over(w)))
    out = (h.where(F.col("action") != "delete")
            .select("pk", F.col("l").alias("valid_from_l"),
                    F.col("i").alias("valid_from_i"), "val",
                    "valid_to_l", "valid_to_i",
                    F.col("valid_to_l").isNull().alias("is_current")))
    return {tuple(r) for r in out.collect()}


def test_scd2_two_column_cursor_parity(spark, tmp_path):
    """scd2_history_stream with seq2_col: lexicographic (l, i) cursor —
    replay dedup, in-batch sort, flush snapshot, and collapse parity
    against the two-column lead oracle.  Pins the int64-overflow-proof
    cursor mode the pipeline surface uses (commit_lsn beyond 2^43)."""
    from sequin_spark.streaming.stateful import (
        SCD2_FLUSH_ACTION,
        scd2_collapse,
        scd2_history_stream,
    )

    big = 1 << 50   # far beyond the packed-scalar overflow point
    b1 = [(1, big, 0, "insert", 10), (1, big, 2, "update", 11),
          (2, big, 1, "insert", 20)]
    b2 = [(1, big + 1, 0, "update", 12),
          (1, big, 2, "update", 11),          # replayed: must drop
          (2, big + 1, 1, "delete", 20)]
    flush = [(p, 1 << 60, 0, SCD2_FLUSH_ACTION, 0) for p in (1, 2)]
    src, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(src)
    got = []
    for k, batch in enumerate([b1, b2, flush]):
        _mk(spark, batch).coalesce(1).write.parquet(src + f"/f{k}")
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(src + "/f*"))
        hist = scd2_history_stream(
            stream, pk_col="pk", seq_col="l", seq2_col="i",
            action_col="action")
        q = (hist.writeStream.foreachBatch(
                lambda df, bid: got.extend(df.collect()))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
    cols = got[0].asDict().keys()
    assert {"valid_from_l", "valid_from_i",
            "valid_to_l", "valid_to_i"} <= set(cols)
    df = spark.createDataFrame(got)
    collapsed = {tuple(r) for r in scd2_collapse(df).select(
        "pk", "valid_from_l", "valid_from_i", "val",
        "valid_to_l", "valid_to_i", "is_current").collect()}
    real = b1 + [r for r in b2 if not (r[1] == big and r[2] == 2)]
    assert collapsed == _batch_oracle(spark, real)
    # the in-group (l, i) tie-break: (big,0) closed by (big,2), not
    # by (big+1,0)
    assert (1, big, 0, 10, big, 2, False) in collapsed


def test_scd2_history_consumer_via_pipeline(spark, sf_dir, tmp_path):
    """The plan surface end-to-end: ``sink_type: scd2_history``
    validates, compiles through the normal operator chain, maintains
    the audit parquet across a streaming restart, and the collapsed
    table equals the batch lead oracle over the delivered events."""
    from sequin_spark.cdc import eventize_orders
    from sequin_spark.plans.spec import ConsumerSpec
    from sequin_spark.streaming.pipeline import ConsumerPipeline
    from sequin_spark.streaming.stateful import scd2_collapse

    base = eventize_orders(spark, sf_dir).limit(80).localCheckpoint()
    k = F.col("record")["o_orderkey"].cast("long")
    upd = (base.withColumn("commit_lsn", F.col("commit_lsn") + 10_000)
               .withColumn("action", F.lit("update")))
    dele = (base.filter(k % 5 == 0)
                .withColumn("commit_lsn", F.col("commit_lsn") + 20_000)
                .withColumn("action", F.lit("delete")))
    schema = base.schema

    out = str(tmp_path / "audit")
    spec = ConsumerSpec(
        name="orders-audit", sink_type="scd2_history",
        sink_config={"path": out}, transform="record_only")
    assert spec.validate() == []
    pipe = ConsumerPipeline(spec, state_dir=str(tmp_path / "state"))
    assert pipe.scd2 is not None and pipe.engine is None

    src, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src + "/f*")
        q = pipe.start_stream(stream, checkpoint_dir=ckpt,
                              trigger_seconds=0.1)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    base.coalesce(1).write.parquet(src + "/f1")
    run()
    upd.unionByName(dele).coalesce(1).write.parquet(src + "/f2")
    run()  # restart from the same checkpoint: state restored

    hist = scd2_collapse(spark.read.parquet(out), pk_col="pk")
    # batch oracle over the same events: lead over (lsn, idx) per pk
    ev = base.unionByName(upd).unionByName(dele).select(
        F.array_join("record_pks", ":").alias("pk"),
        "commit_lsn", "commit_idx", "action",
        F.to_json("record").alias("value"))
    w = Window.partitionBy("pk").orderBy("commit_lsn", "commit_idx")
    oracle = (ev.withColumn("t_l", F.lead("commit_lsn").over(w))
                .withColumn("t_i", F.lead("commit_idx").over(w))
                .where(F.col("action") != "delete"))
    # closed intervals must match exactly (valid_from + valid_to + value)
    got_closed = {(r["pk"], r["valid_from_commit_lsn"],
                   r["valid_from_commit_idx"], r["valid_to_commit_lsn"],
                   r["valid_to_commit_idx"], r["value"])
                  for r in hist.where(
                      F.col("valid_to_commit_lsn").isNotNull()).collect()}
    want_closed = {(r["pk"], r["commit_lsn"], r["commit_idx"],
                    r["t_l"], r["t_i"], r["value"])
                   for r in oracle.where(
                       F.col("t_l").isNotNull()).collect()}
    assert got_closed == want_closed and got_closed
    # current rows: every non-deleted pk has exactly one, none deleted
    cur = {r["pk"] for r in hist.where("is_current").collect()}
    pks = {str(r["record"]["o_orderkey"])
           for r in base.select("record").collect()}
    live = {p for p in pks if int(p) % 5 != 0}
    # is_current rows only exist where a flush snapshotted them — the
    # pipeline emits snapshots when sink_config carries flush batches;
    # without one, open intervals are simply absent from the table
    assert cur <= live
