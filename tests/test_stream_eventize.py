"""Eventize + operator chain on a STREAMING DataFrame — the batch/stream
same-code claim, end to end."""

import random

from pyspark.sql import functions as F

from sequin_spark.cdc import eventize, load_table
from sequin_spark.operators.column_filter import ColumnFilter, apply_column_filters
from sequin_spark.functions.routing import route


def test_eventize_chain_on_stream(spark, sf_dir, tmp_path):
    src = str(tmp_path / "orders_raw")
    load_table(spark, sf_dir, "orders").limit(200).write.parquet(src)
    raw_schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(raw_schema).parquet(src)
    assert stream.isStreaming

    ev = eventize(
        stream, "orders", pk_cols=["o_orderkey"], order_expr="o_orderkey",
        ts_col="o_orderdate", changed_col="o_orderstatus",
    )
    ev = route(ev, "kafka")
    q = (
        ev.selectExpr("action", "topic", "group_id", "commit_lsn")
        .writeStream.format("memory").queryName("stream_ev")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM stream_ev").collect()
        assert len(rows) == 200
        assert {r.topic for r in rows} == {"sequin.public.orders"}
        assert {r.action for r in rows} <= {"insert", "update", "delete"}
    finally:
        q.stop()


def _py_filter(record: dict, flt: ColumnFilter) -> bool:
    raw = record.get(flt.column)
    op = flt.operator
    if op == "is_null":
        return raw is None
    if op == "not_null":
        return raw is not None
    if raw is None:
        return False  # NULL fails every comparison incl. not_in (reference)
    if flt.value_type == "integer":
        try:
            lhs = int(raw)
        except ValueError:
            return False
        rhs = flt.value
    elif flt.value_type == "cistring":
        lhs = raw.lower()
        rhs = [v.lower() for v in flt.value] if isinstance(flt.value, list) else str(flt.value).lower()
    else:
        lhs, rhs = raw, flt.value
    if op == "in":
        return lhs in rhs
    if op == "not_in":
        return lhs not in rhs
    return {"==": lhs == rhs, "!=": lhs != rhs, ">": lhs > rhs,
            "<": lhs < rhs, ">=": lhs >= rhs, "<=": lhs <= rhs}[op]


def test_column_filters_match_reference_model(spark):
    rng = random.Random(3)
    rows = [
        (i, {k: v for k, v in {
            "n": rng.choice([None, "1", "5", "10", "42"]),
            "s": rng.choice([None, "Aa", "bB", "cc"]),
        }.items() if v is not None})
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, record map<string,string>")
    cases = [
        ColumnFilter("n", ">", 4, "integer"),
        ColumnFilter("n", "<=", 5, "integer"),
        ColumnFilter("n", "not_in", ["5", "42"], "string"),
        ColumnFilter("s", "==", "BB", "cistring"),
        ColumnFilter("s", "in", ["AA", "cc"], "cistring"),
        ColumnFilter("s", "is_null"),
        ColumnFilter("n", "not_null"),
    ]
    for flt in cases:
        got = {r.id for r in apply_column_filters(df, [flt]).collect()}
        expected = {i for i, rec in rows if _py_filter(rec, flt)}
        assert got == expected, f"filter {flt} mismatch: extra={got-expected} missing={expected-got}"
