"""applyInPandasWithState: per-group high-water dedup across micro-batches."""

import time

from pyspark.sql import functions as F

from sequin_spark.streaming.stateful import stateful_group_dedup


def test_stateful_dedup_across_microbatches(spark, tmp_path):
    """Two files arrive as separate micro-batches; the second replays the
    first's rows (WAL replay) plus new ones — only the new suffix passes."""
    src = str(tmp_path / "src")
    batch1 = spark.createDataFrame(
        [("g1", 10, 0), ("g1", 10, 1), ("g2", 11, 0)],
        "group_id string, commit_lsn long, commit_idx long",
    )
    batch1.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("group_id string, commit_lsn long, commit_idx long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    deduped = stateful_group_dedup(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.sql("SELECT count(*) AS n FROM dedup_out").collect()[0].n
        assert n1 == 3

        # replay batch1's rows + a new row per group
        batch2 = spark.createDataFrame(
            [("g1", 10, 0), ("g1", 10, 1), ("g1", 12, 0), ("g2", 11, 0), ("g2", 13, 0)],
            "group_id string, commit_lsn long, commit_idx long",
        )
        batch2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT group_id, commit_lsn, commit_idx FROM dedup_out ORDER BY group_id, commit_lsn, commit_idx"
        ).collect()
        got = [(r.group_id, r.commit_lsn, r.commit_idx) for r in rows]
        assert got == [
            ("g1", 10, 0), ("g1", 10, 1), ("g1", 12, 0),
            ("g2", 11, 0), ("g2", 13, 0),
        ]
    finally:
        q.stop()


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Spark-native streaming dedup twin: dropDuplicatesWithinWatermark
    on the idempotency key bounds state by event time (the ledger's
    trim-by-time semantics, message_ledgers.ex:65-99 — state for keys
    older than the watermark is evicted instead of growing forever)."""
    src = str(tmp_path / "src")
    batch1 = spark.createDataFrame(
        [("k1", "2024-01-01 00:00:10"), ("k2", "2024-01-01 00:00:11")],
        "idempotency_key string, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    batch1.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("idempotency_key string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["idempotency_key"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("wm_dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) AS n FROM wm_dedup_out").collect()[0].n == 2
        # replay k1 within the watermark window + a genuinely new key
        batch2 = spark.createDataFrame(
            [("k1", "2024-01-01 00:00:12"), ("k3", "2024-01-01 00:00:13")],
            "idempotency_key string, ts_s string",
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        batch2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        keys = sorted(
            r.idempotency_key
            for r in spark.sql("SELECT idempotency_key FROM wm_dedup_out").collect()
        )
        assert keys == ["k1", "k2", "k3"]  # the k1 replay was dropped
    finally:
        q.stop()


def test_streaming_funnel_matches_batch(spark, tmp_path):
    """Events fed in event-time order over two micro-batches: the last
    emitted row per user equals the batch funnel_times result; a step
    completed across the batch boundary proves the state carry."""
    from sequin_spark.operators.funnel import funnel_times
    from sequin_spark.streaming.stateful import streaming_funnel

    schema = "user_id long, event_type string, ts_us long"
    rows1 = [
        (1, "view", 10), (1, "click", 20),
        (2, "click", 5), (2, "view", 10),        # click-before-view ignored
        (3, "view", 10), (3, "purchase", 15),    # purchase too early
    ]
    rows2 = [
        (1, "purchase", 30),                     # completes u1 across batches
        (2, "click", 40),
        (3, "click", 20), (3, "purchase", 25),   # now in order
        (1, "click", 35),                        # already past click — ignored
    ]
    src = str(tmp_path / "fsrc")
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_funnel(stream, ["view", "click", "purchase"])
    q = (
        out.writeStream.format("memory").queryName("funnel_out")
        .option("checkpointLocation", str(tmp_path / "fckpt"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    import pandas as pd

    emitted = spark.sql("SELECT * FROM funnel_out").toPandas()
    # last emitted row per user = current funnel state
    final = emitted.groupby("user_id").last()
    batch = funnel_times(
        spark.createDataFrame(rows1 + rows2, schema),
        ["view", "click", "purchase"], ts_col="ts_us",
    ).toPandas().set_index("user_id")
    for uid in batch.index:
        for c in ("t_1", "t_2", "t_3"):
            b = batch.loc[uid, c]
            s = final.loc[uid, c] if uid in final.index else None
            assert (pd.isna(b) and pd.isna(s)) or b == s, (uid, c, b, s)
    # u1's completion row was emitted in the SECOND batch (state carried)
    u1_rows = emitted[emitted["user_id"] == 1]
    assert u1_rows["t_3"].notna().sum() >= 1
