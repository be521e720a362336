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


def test_stateful_dedup_under_rocksdb_state_store(spark, tmp_path):
    """The same cross-micro-batch dedup runs (and checkpoints/restores
    state) under the RocksDB state store — the 100 TB setting where
    keyed state lives on executor disk, not heap.  Provider is set
    before the query starts and restored after (other tests rely on
    the default)."""
    from sequin_spark.session import ROCKSDB_PROVIDER, enable_rocksdb_state

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    enable_rocksdb_state(spark)
    try:
        src = str(tmp_path / "src")
        spark.createDataFrame(
            [("g1", 10, 0), ("g2", 11, 0)],
            "group_id string, commit_lsn long, commit_idx long",
        ).coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream
            .schema("group_id string, commit_lsn long, commit_idx long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stateful_group_dedup(stream).writeStream.format("memory")
            .queryName("rocks_dedup_out")
            .option("checkpointLocation", str(tmp_path / "ckpt_rocks"))
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            # replayed + new rows: RocksDB-backed state must dedup the
            # replay exactly like the heap-backed provider
            spark.createDataFrame(
                [("g1", 10, 0), ("g1", 12, 0), ("g2", 11, 0)],
                "group_id string, commit_lsn long, commit_idx long",
            ).coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
            # the running query really planned with RocksDB
            assert spark.conf.get(key) == ROCKSDB_PROVIDER
            rows = spark.sql(
                "SELECT group_id, commit_lsn FROM rocks_dedup_out "
                "ORDER BY group_id, commit_lsn").collect()
            assert [(r.group_id, r.commit_lsn) for r in rows] == [
                ("g1", 10), ("g1", 12), ("g2", 11)]
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


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


def _run_funnel_batches(spark, tmp_path, batches, steps, **kw):
    """Feed each batch as one file through streaming_funnel; return the
    last emitted row per user as a pandas frame."""
    from sequin_spark.streaming.stateful import streaming_funnel

    schema = "user_id long, event_type string, ts_us long"
    src = str(tmp_path / "src")
    spark.createDataFrame(batches[0], schema).coalesce(1).write.mode(
        "append").parquet(src)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    name = f"funnel_ooo_{abs(hash(str(batches))) % 10**8}"
    q = (streaming_funnel(stream, steps, **kw)
         .writeStream.format("memory").queryName(name)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        for b in batches[1:]:
            spark.createDataFrame(b, schema).coalesce(1).write.mode(
                "append").parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()
    emitted = spark.sql(f"SELECT * FROM {name}").toPandas()
    return emitted.groupby("user_id").last()


def test_streaming_funnel_out_of_order_across_batches(spark, tmp_path):
    """Late earlier-step events arriving in LATER micro-batches must
    back-fill the chain: the final per-user state equals batch
    funnel_times on the union, for every shuffling of events across
    micro-batch boundaries."""
    import pandas as pd

    from sequin_spark.operators.funnel import funnel_times

    steps = ["view", "click", "purchase"]
    # u1: purchase and click arrive BEFORE the view that anchors them.
    # u2: a late early view (ts 5) lowers t_1 after click was consumed,
    #     re-deriving t_2 to an earlier click.
    # u3: control — in order.
    batches = [
        [(1, "purchase", 30), (2, "click", 8), (3, "view", 10)],
        [(1, "click", 20), (2, "view", 50), (2, "click", 60), (3, "click", 20)],
        [(1, "view", 10), (2, "view", 5), (3, "purchase", 25)],
    ]
    final = _run_funnel_batches(spark, tmp_path, batches, steps)
    schema = "user_id long, event_type string, ts_us long"
    batch = funnel_times(
        spark.createDataFrame([r for b in batches for r in b], schema),
        steps, ts_col="ts_us",
    ).toPandas().set_index("user_id")
    assert set(batch.index) == set(final.index)
    for uid in batch.index:
        for c in ("t_1", "t_2", "t_3"):
            b, s = batch.loc[uid, c], final.loc[uid, c]
            assert (pd.isna(b) and pd.isna(s)) or b == s, (uid, c, b, s)
    # u2 specifically proves the back-fill: batch t_1=5, t_2=8
    assert batch.loc[2, "t_1"] == 5 and batch.loc[2, "t_2"] == 8


def test_streaming_funnel_candidate_cap(spark, tmp_path):
    """Pin the documented degradation: with max_candidates=2, a user
    with 2 step-2 events earlier than their final t_1 loses the true
    earliest valid click and reports a LATER (still valid) one."""
    steps = ["view", "click"]
    batches = [
        # clicks at 11,12 fill the 2-slot candidate set for step 2
        [(1, "click", 11), (1, "click", 12), (1, "click", 40)],
        [(1, "view", 20)],  # final t_1=20; true t_2=40 was evicted
    ]
    final = _run_funnel_batches(
        spark, tmp_path, batches, steps, max_candidates=2)
    assert final.loc[1, "t_1"] == 20
    # exact answer is 40; capped state kept only {11,12} -> no valid
    # click above 20 -> t_2 unreported (None), never a WRONG value
    import pandas as pd

    assert pd.isna(final.loc[1, "t_2"])
