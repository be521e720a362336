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
