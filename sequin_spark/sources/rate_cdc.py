"""Synthetic benchmark CDC source.

Reference: lib/sequin/postgres/benchmark_source.ex — a virtual WAL
generator with configurable row sizes, tx sizes, PK-collision and repeat
rates, used by the in-repo throughput harness.

Spark mapping: the native ``rate`` streaming source (monotone value +
timestamp, generated executor-side, zero driver involvement) with
synthetic column expressions layered on. All columns derive
deterministically from ``value`` so runs are reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sequin_spark.schema import group_id_from_pks, idempotency_key


def benchmark_stream(
    spark: SparkSession,
    rows_per_second: int = 50_000,
    num_partitions: int = 8,
    pk_cardinality: int = 100_000,
    row_bytes: int = 200,
    txn_size: int = 8,
) -> DataFrame:
    """Rate source → canonical CDC events.

    pk_cardinality controls PK collisions (update frequency), row_bytes
    pads the record payload — mirroring BenchmarkSource's row-size /
    collision-rate knobs.
    """
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", num_partitions)
        .load()
    )
    v = F.col("value")
    pk = (v % pk_cardinality).cast("string")
    pad = F.repeat(F.lit("x"), row_bytes)
    action = (
        F.when(v % 10 <= 5, F.lit("insert")).when(v % 10 <= 8, F.lit("update")).otherwise(F.lit("delete"))
    )
    df = raw.select(
        action.alias("action"),
        F.create_map(
            F.lit("id"), pk,
            F.lit("payload"), pad,
            F.lit("n"), v.cast("string"),
        ).alias("record"),
        F.when(action == "update", F.create_map(F.lit("n"), (v - 1).cast("string")))
        .alias("changes"),
        F.lit("public").alias("table_schema"),
        F.lit("bench").alias("table_name"),
        F.lit(99999).cast("long").alias("table_oid"),
        F.array(pk).alias("record_pks"),
        (F.lit(5_000_000) + F.floor(v / txn_size)).cast("long").alias("commit_lsn"),
        (v % txn_size).cast("long").alias("commit_idx"),
        F.col("timestamp").alias("commit_timestamp"),
        F.lit(None).cast("string").alias("trace_id"),
        F.lit(None).cast("string").alias("transaction_annotations"),
    )
    return df.withColumn("group_id", group_id_from_pks(F.col("record_pks"))).withColumn(
        "idempotency_key", idempotency_key(F.col("commit_lsn"), F.col("commit_idx"))
    )
