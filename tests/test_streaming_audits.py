"""Streaming twins of the r9 event-log audits (datapipe/
streaming_audits.py) — parity twin-vs-batch on the same event log,
per the dedup_replays / streaming_sketch pattern:

* gap sessionization twin == the batch per-user LAG differences,
  with state carrying the last timestamp across micro-batches;
* watermark late/dropped counters twin == the batch audit's per-row
  prefix-max recurrence when each micro-batch carries one event (the
  granularity at which engine watermark semantics and the batch
  recurrence coincide exactly);
* the measured engine fact the twin relies on is pinned: late rows
  are NOT pre-filtered before applyInPandasWithState.
"""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from sequin_spark.datapipe.streaming_audits import (
    streaming_late_data_counters,
    streaming_session_gaps,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s).replace(tzinfo=timezone.utc)


def _write(spark, src, rows):
    spark.createDataFrame(rows, "user_id long, ts timestamp") \
        .coalesce(1).write.mode("append").parquet(src)


def test_session_gaps_twin_equals_batch_lag(spark, tmp_path):
    """Three micro-batches per-user-time-ordered across boundaries
    (arbitrary order within a batch): the union of emitted gaps must
    equal the batch LAG differences over the full log."""
    batches = [
        [(1, _ts("2024-01-01T10:00:00")), (2, _ts("2024-01-01T10:00:30")),
         (1, _ts("2024-01-01T10:00:05"))],
        [(1, _ts("2024-01-01T10:02:00")), (2, _ts("2024-01-01T11:00:30")),
         (1, _ts("2024-01-01T10:01:00"))],
        [(2, _ts("2024-01-01T11:00:31")), (1, _ts("2024-01-01T13:00:00")),
         (3, _ts("2024-01-01T00:00:00"))],
    ]
    src = str(tmp_path / "src")
    _write(spark, src, batches[0])
    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (streaming_session_gaps(stream)
         .writeStream.format("memory").queryName("gaps_twin")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        for b in batches[1:]:
            _write(spark, src, b)
            q.processAllAvailable()
        got = sorted((r["user_id"], r["gap_s"])
                     for r in spark.table("gaps_twin").collect())
    finally:
        q.stop()

    allrows = [r for b in batches for r in b]
    batch_df = spark.createDataFrame(allrows, "user_id long, ts timestamp")
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts")
    want = sorted(
        (r["user_id"], r["gap_s"]) for r in
        batch_df.select(
            "user_id",
            ((F.unix_micros("ts")
              - F.lag(F.unix_micros("ts")).over(w)) / 1_000_000)
            .cast("long").alias("gap_s"))
        .filter(F.col("gap_s").isNotNull()).collect())
    assert got == want
    assert len(got) == 6  # 4 gaps for u1, 2 for u2, 0 for u3


def test_late_counters_twin_matches_batch_recurrence(spark, tmp_path):
    """One event per micro-batch in arrival order — engine watermark
    (max prior event time − delay) collapses to the batch audit's
    per-row prefix-max recurrence; the per-hour counters must match a
    plain-Python replay of that recurrence, late rows included."""
    delay_s = 300
    # arrival order with on-time, late (< wm) and dropped (< wm−delay)
    arrivals = [
        (1, _ts("2024-01-01T10:00:00")),   # first: wm undefined
        (1, _ts("2024-01-01T10:10:00")),   # advances max
        (1, _ts("2024-01-01T10:06:00")),   # wm=10:05 → on time
        (1, _ts("2024-01-01T10:04:00")),   # < 10:05 → late
        (1, _ts("2024-01-01T09:59:00")),   # < 10:00 → late + dropped
        (1, _ts("2024-01-01T10:30:00")),   # advances max
        (1, _ts("2024-01-01T10:20:00")),   # wm=10:25 → late
        (1, _ts("2024-01-01T09:00:00")),   # hour bucket 9 late+dropped
        (1, _ts("2024-01-01T10:26:00")),   # on time
    ]
    src = str(tmp_path / "src")
    stream = None
    q = None
    _write(spark, src, [arrivals[0]])
    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (streaming_late_data_counters(stream, "ts", delay_s)
         .writeStream.format("memory").queryName("late_twin")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        for row in arrivals[1:]:
            _write(spark, src, [row])
            q.processAllAvailable()
        rows = spark.table("late_twin").collect()
    finally:
        q.stop()
    latest = {}
    for r in rows:
        k = r["window_start_us"]
        if k not in latest or r["n_updates"] > latest[k]["n_updates"]:
            latest[k] = r
    got = {k: (r["n_total"], r["n_late"], r["n_dropped"])
           for k, r in latest.items()}

    # plain-Python replay of the audit recurrence (the oracle logic of
    # streaming_late_data_audit, one event per "batch")
    delay_us = delay_s * 1_000_000
    want: dict = {}
    prior_max = None
    for _, ts in arrivals:
        t = int(ts.timestamp() * 1_000_000)
        hour = t // 3_600_000_000 * 3_600_000_000
        tot, late, drop = want.get(hour, (0, 0, 0))
        tot += 1
        if prior_max is not None:
            wm = prior_max - delay_us
            if t < wm:
                late += 1
                if t < wm - delay_us:
                    drop += 1
        want[hour] = (tot, late, drop)
        prior_max = t if prior_max is None else max(prior_max, t)
    assert got == want
    # sanity: the log genuinely exercised every class
    totals = [sum(v[i] for v in got.values()) for i in range(3)]
    assert totals == [9, 4, 2]


def test_late_rows_reach_stateful_operator(spark, tmp_path):
    """Pin the engine fact the twin relies on: rows older than the
    watermark are DELIVERED to applyInPandasWithState (not
    pre-filtered as they would be for windowed aggregations).  If a
    Spark upgrade changes this, the twin must switch to self-managed
    max-tracking — this test is the tripwire."""
    src = str(tmp_path / "src")
    _write(spark, src, [(1, _ts("2024-01-01T10:00:00"))])
    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (streaming_late_data_counters(stream, "ts", 300)
         .writeStream.format("memory").queryName("late_tripwire")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        # 9:00 is an hour behind the 9:55 watermark — far late
        _write(spark, src, [(1, _ts("2024-01-01T09:00:00"))])
        q.processAllAvailable()
        rows = spark.table("late_tripwire").collect()
    finally:
        q.stop()
    n_total = sum(r["n_total"] for r in rows
                  if r["n_updates"] == max(
                      x["n_updates"] for x in rows
                      if x["window_start_us"] == r["window_start_us"]))
    assert n_total == 2, rows