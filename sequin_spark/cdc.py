"""Eventize relational tables into the canonical CDC event stream.

The engine consumes the canonical event schema (schema.EVENT_SCHEMA).  In
production the events come from a replication source (sources/); for
correctness tests and the DuckDB oracle we derive a *deterministic* event
stream from the TESTDATA relational tables, mirroring the reference's
test factories (reference: test/support/factory/replication_factory.ex —
synthetic WAL messages with monotone (commit_lsn, commit_idx)).

Determinism contract (mirrored 1:1 by the oracle SQL in
__spark_entry__.py):

- key ``k``     = the table's ordering key expression (bigint, unique)
- action        = CASE k % 10: 0-5 insert, 6-8 update, 9 delete
- commit_lsn    = lsn_base + floor(k / txn_size)   (a txn = txn_size stmts)
- commit_idx    = k % txn_size
- record        = map(col → cast(col as string)) over all columns
- changes       = update only: {changed_col: 'old:' || value} (the
                  simulated pre-image; insert/delete → null, matching
                  consumers.ex:661-676)
- record_pks    = [cast(pk) for pk in pk_cols] (attnum order)
- group_id      = join(record_pks, ':')
- idempotency_key = base64('{lsn}:{idx}')

All of this is pure Catalyst expression work — no UDFs, stays inside
whole-stage codegen, and partitions embarrassingly at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sequin_spark.schema import group_id_from_pks, idempotency_key

TABLE_OIDS = {
    "region": 16401,
    "nation": 16402,
    "customer": 16403,
    "supplier": 16404,
    "part": 16405,
    "orders": 16406,
    "lineitem": 16407,
    "events": 16408,
    "documents": 16409,
    "embeddings": 16410,
}

LSN_BASE = 1_000_000
TXN_SIZE = 8


def action_expr(k: F.Column) -> F.Column:
    m = k % 10
    return (
        F.when(m <= 5, F.lit("insert"))
        .when(m <= 8, F.lit("update"))
        .otherwise(F.lit("delete"))
    )


def eventize(
    df: DataFrame,
    table_name: str,
    pk_cols: list[str],
    order_expr: str,
    table_schema: str = "public",
    ts_col: str | None = None,
    changed_col: str | None = None,
    group_cols: list[str] | None = None,
    lsn_base: int = LSN_BASE,
    txn_size: int = TXN_SIZE,
    spread: bool = False,
) -> DataFrame:
    """Turn a relational DataFrame into canonical CDC events (batch or stream).

    ``group_cols`` overrides the grouping columns (the reference's
    ``source_tables[].group_column_attnums``, consumers.ex:730-791);
    default grouping is by PK.

    ``spread`` round-robins the input across the cluster's parallelism
    BEFORE the record-map projection — for consumers whose downstream
    is expression-dense with no shuffle of its own (value casting,
    column filters, changes/TOAST diffs), a single-split scan otherwise
    serializes the whole pipeline on one task.  No-op when the scan
    already yields >= cores partitions (the cluster-scale case).
    """
    if spread:
        from sequin_spark.datapipe.dedup import spread_for_compute

        df = spread_for_compute(df)
    k = F.expr(order_expr).cast("long")
    action = action_expr(k)
    record_entries: list[F.Column] = []
    for c in df.columns:
        record_entries.append(F.lit(c))
        record_entries.append(F.col(c).cast("string"))
    record = F.create_map(*record_entries)
    pks = F.array(*[F.col(c).cast("string") for c in pk_cols])
    lsn = (F.lit(lsn_base) + F.floor(k / txn_size)).cast("long")
    idx = (k % txn_size).cast("long")

    if group_cols:
        group_src = F.array(*[F.col(c).cast("string") for c in group_cols])
    else:
        group_src = pks

    if changed_col is not None:
        changes = F.when(
            action == "update",
            F.create_map(F.lit(changed_col), F.concat(F.lit("old:"), F.col(changed_col).cast("string"))),
        )
    else:
        changes = F.when(action == "update", F.create_map().cast("map<string,string>"))

    out = df.select(
        action.alias("action"),
        record.alias("record"),
        changes.alias("changes"),
        F.lit(table_schema).alias("table_schema"),
        F.lit(table_name).alias("table_name"),
        F.lit(TABLE_OIDS.get(table_name, 0)).cast("long").alias("table_oid"),
        pks.alias("record_pks"),
        lsn.alias("commit_lsn"),
        idx.alias("commit_idx"),
        (F.col(ts_col).cast("timestamp") if ts_col else F.lit(None).cast("timestamp")).alias(
            "commit_timestamp"
        ),
        F.lit(None).cast("string").alias("trace_id"),
        F.lit(None).cast("string").alias("transaction_annotations"),
        group_id_from_pks(group_src).alias("group_id"),
    )
    return out.withColumn(
        "idempotency_key", idempotency_key(F.col("commit_lsn"), F.col("commit_idx"))
    )


# Testdata timestamp columns vary by generator vintage: parquet
# TIMESTAMP(NANOS) (Spark's vectorized reader rejects them — read as
# long nanos and truncate to micros, the same ns→us truncation DuckDB
# applies) or TIMESTAMP(MICROS) isAdjustedToUTC=false (Spark 4 infers
# TIMESTAMP_NTZ — normalize to TIMESTAMP; the session runs in UTC so the
# cast is value-preserving and matches DuckDB's naive reading).
TS_COLS = {"orders": ["o_orderdate"], "lineitem": ["l_shipdate"], "events": ["ts"]}


# (applicationId, sf_dir, name) → DataFrame. A DataFrame is just a plan;
# memoizing it skips the per-call file listing + parquet schema
# inference that every one of the 60+ registry queries would otherwise
# repeat. Keyed by session so a restarted SparkSession never serves a
# stale plan.
_TABLE_CACHE: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in TS_COLS.get(name, []):
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
        elif dtypes.get(c) == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    _TABLE_CACHE[key] = df
    return df


def eventize_orders(spark: SparkSession, sf_dir: str, spread: bool = False) -> DataFrame:
    return eventize(
        load_table(spark, sf_dir, "orders"),
        "orders",
        pk_cols=["o_orderkey"],
        order_expr="o_orderkey",
        ts_col="o_orderdate",
        changed_col="o_orderstatus",
        spread=spread,
    )


def eventize_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite PK (l_orderkey, l_linenumber) — FIXTURES.md §3 analog."""
    return eventize(
        load_table(spark, sf_dir, "lineitem"),
        "lineitem",
        pk_cols=["l_orderkey", "l_linenumber"],
        order_expr="l_orderkey * 8 + l_linenumber",
        ts_col="l_shipdate",
        changed_col="l_linestatus",
    )


def eventize_events(spark: SparkSession, sf_dir: str, group_cols: list[str] | None = None,
                    spread: bool = False) -> DataFrame:
    """The `events` stream table shaped as CDC events (FIXTURES.md §6)."""
    return eventize(
        load_table(spark, sf_dir, "events"),
        "events",
        pk_cols=["event_id"],
        order_expr="event_id",
        ts_col="ts",
        changed_col="event_type",
        group_cols=group_cols,
        spread=spread,
    )


def eventize_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return eventize(
        load_table(spark, sf_dir, "customer"),
        "customer",
        pk_cols=["c_custkey"],
        order_expr="c_custkey",
        changed_col="c_mktsegment",
    )


def eventize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return eventize(
        load_table(spark, sf_dir, "documents"),
        "documents",
        pk_cols=["doc_id"],
        order_expr="doc_id",
        changed_col="lang",
    )
