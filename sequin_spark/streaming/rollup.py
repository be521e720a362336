"""Watermarked metrics rollups over the event stream.

SURVEY §2.9: the reference has no time-window aggregations in the data
path (WAL is totally ordered, late data doesn't exist) — the only
windowing use-case is observability rollups (per-table/per-action
throughput over time, the Prometheus counters' time-series shape).

Spark-native: event-time tumbling windows with a watermark so state for
closed windows is dropped (bounded memory at any uptime). This is also
the template for any user-defined time-series aggregation over the CDC
stream (e.g. per-table change rates feeding an anomaly detector).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def throughput_rollup(
    events: DataFrame,
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
    ts_col: str = "commit_timestamp",
) -> DataFrame:
    """Per (window, table, action) event counts + payload cursor span.

    Works identically on a streaming DataFrame (append-mode with
    watermark-closed windows) and a batch DataFrame (windows computed
    exhaustively) — same operator code, which keeps it oracle-testable.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark_delay)
    # exact distinct is unsupported on streams → HLL sketch there,
    # exact in batch (where the oracle checks it); for a standalone
    # cross-micro-batch register sketch see datapipe/streaming_sketch.py
    n_groups = (
        F.approx_count_distinct("group_id") if events.isStreaming else F.countDistinct("group_id")
    )
    return (
        src.groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            F.col("table_name"),
            F.col("action"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("commit_lsn").alias("min_lsn"),
            F.max("commit_lsn").alias("max_lsn"),
            n_groups.alias("n_groups"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "table_name",
            "action",
            "n_events",
            "min_lsn",
            "max_lsn",
            "n_groups",
        )
    )


def session_rollup(
    events: DataFrame,
    gap_duration: str = "30 minutes",
    watermark_delay: str = "10 minutes",
    ts_col: str = "commit_timestamp",
    key_col: str = "group_id",
) -> DataFrame:
    """Per-key session aggregation via ``F.session_window`` — the
    STREAMING twin of operators/asof.sessionize (dynamic-gap windows
    merge as events arrive; the watermark closes sessions whose gap has
    definitively elapsed, so state stays bounded). Batch and streaming
    share this code path, like throughput_rollup."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark_delay)
    return (
        src.groupBy(
            F.session_window(F.col(ts_col), gap_duration).alias("s"),
            F.col(key_col),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def ewma_anomaly(
    events: DataFrame,
    series_col: str,
    ts_col: str = "ts",
    bucket: str = "hour",
    horizon: int = 12,
) -> DataFrame:
    """Per-series throughput anomaly detection: a truncated dyadic EWMA
    baseline over hourly event counts, flagging buckets whose count
    spikes above 2× or drops below ½× the trailing average.

    The reference's observability surface exposes raw throughput
    time-series (metrics.ex Prometheus counters; the rollup twin above)
    and leaves alerting to the scraper; this is the alert rule as a
    relational operator, usable batch or streaming-foreachBatch.

    Exactness device: α=1/2 EWMA truncated at ``horizon`` steps —
    ewma = Σ_{k=1..h} n_{t-k} / 2^k.  Every term is an integer divided
    by a power of two, so every partial sum is an EXACT double (no
    rounding at any add, any order) — the oracle reproduces it
    bit-for-bit from the same lags, which a general-α EWMA (recurrence
    over floats) cannot guarantee across engines.  Weights sum to
    1 − 2^−h (documented, not renormalized: renormalizing would leave
    the dyadic lattice).

    Scale shape: one count shuffle on (series, bucket), then a window
    over per-series BUCKET COUNTS (bounded: buckets/day × retention,
    thousands of rows per series, never event-cardinality) — the lag
    window never sees raw events.  Emits only rows with a full
    ``horizon`` of history, so the verdict never reflects zero-padded
    warm-up."""
    from pyspark.sql import Window

    counts = (
        events.groupBy(
            F.col(series_col).alias("series"),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        )
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("series").orderBy("bucket")
    ewma = None
    for k in range(1, horizon + 1):
        term = F.lag("n", k).over(w) / float(1 << k)
        ewma = term if ewma is None else ewma + term
    out = (
        counts.withColumn("rn", F.row_number().over(w))
        .withColumn("ewma_prior", ewma)
        .filter(F.col("rn") > horizon)
        .withColumn(
            "status",
            F.when(F.col("n") > 2 * F.col("ewma_prior"), F.lit("spike"))
            .when(2 * F.col("n") < F.col("ewma_prior"), F.lit("drop"))
            .otherwise(F.lit("normal")),
        )
    )
    return out.select("series", "bucket", "n", "ewma_prior", "status")
