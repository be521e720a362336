"""Payload guards, timestamp formatting, metadata construction.

Reference:

- payload size guard: drop events whose serialized payload exceeds
  max_payload_bytes (5 MB default) — message_handler.ex:28-30,161-169.
- timestamp_format ∈ {iso8601, unix_microsecond} per consumer —
  sink_consumer.ex:99, applied in sink_pipeline.ex:194.
- metadata struct per consumer — consumers.ex:678-728.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_PAYLOAD_BYTES = 5 * 1024 * 1024

ISO8601 = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"


def payload_bytes_expr(df: DataFrame) -> Column:
    """Serialized payload size ≈ octet_length(to_json(record/changes)).

    The reference measures the encoded ConsumerEvent JSON
    (consumer_event.ex:49-53 caches encoded_data + payload_size_bytes);
    we measure the dominant variable parts (record + changes), computed
    once per row JVM-side.
    """
    return F.octet_length(
        F.to_json(F.struct(F.col("record"), F.col("changes")))
    )


def payload_size_guard(df: DataFrame, max_bytes: int = MAX_PAYLOAD_BYTES) -> DataFrame:
    return df.filter(payload_bytes_expr(df) <= F.lit(max_bytes))


def format_timestamp(col: Column, fmt: str) -> Column:
    """iso8601 | unix_microsecond (sink_consumer.ex:99)."""
    if fmt == "iso8601":
        return F.date_format(col, ISO8601)
    if fmt == "unix_microsecond":
        return F.unix_micros(col)
    raise ValueError(f"unknown timestamp_format {fmt!r}")


def format_timestamps(df: DataFrame, fmt: str, cols: list[str] | None = None) -> DataFrame:
    out = df
    for c in cols or ["commit_timestamp"]:
        out = out.withColumn(c + "_fmt", format_timestamp(F.col(c), fmt))
    return out


def with_metadata(
    df: DataFrame,
    consumer_id: str,
    consumer_name: str,
    database_name: str = "postgres",
    database_id: str = "00000000-0000-0000-0000-000000000000",
) -> DataFrame:
    """metadata struct (consumer_event_data.ex:19-58 / consumers.ex:678-728).

    Static consumer/database fields are literals — Catalyst constant-folds
    them; per-event fields reference event columns.
    """
    meta = F.struct(
        F.col("table_schema").alias("table_schema"),
        F.col("table_name").alias("table_name"),
        F.col("commit_timestamp").alias("commit_timestamp"),
        F.col("commit_lsn").alias("commit_lsn"),
        F.col("commit_idx").alias("commit_idx"),
        F.lit(database_name).alias("database_name"),
        F.col("transaction_annotations").alias("transaction_annotations"),
        F.col("idempotency_key").alias("idempotency_key"),
        F.col("record_pks").alias("record_pks"),
        F.struct(
            F.lit(consumer_id).alias("id"),
            F.lit(consumer_name).alias("name"),
        ).alias("consumer"),
        F.struct(
            F.lit(database_id).alias("id"),
            F.lit(database_name).alias("name"),
        ).alias("database"),
    )
    return df.withColumn("metadata", meta)
