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
