"""MiniPy / path / routing semantics corpus (minielixir_test.exs analog)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sequin_spark.functions.minipy import compile_expr, sandbox_pandas_udf, validate
from sequin_spark.functions.path import path_function
from sequin_spark.functions.routing import route


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(
        [
            (
                "insert",
                {"id": "7", "house": "Stark", "name": "arya", "score": "12.5"},
                None,
                "public",
                "characters",
                ["7"],
                "7",
                100,
                2,
            )
        ],
        schema=(
            "action string, record map<string,string>, changes map<string,string>, "
            "table_schema string, table_name string, record_pks array<string>, "
            "group_id string, commit_lsn long, commit_idx long"
        ),
    )


def _one(df, col):
    return df.select(col.alias("x")).collect()[0].x


def test_minipy_filter_and_transform(ev):
    assert _one(ev, compile_expr("record['house'] == 'Stark'")) is True
    assert _one(ev, compile_expr("int(record['id']) % 2")) == 1
    assert _one(ev, compile_expr("upper(record['name']) + '!'")) == "ARYA!"
    assert _one(ev, compile_expr("'shard-' + str(int(record['id']) % 4)")) == "shard-3"
    assert _one(ev, compile_expr("float(record['score']) * 2")) == 25.0
    assert _one(ev, compile_expr("record['house'] in ['Stark', 'Tully']")) is True
    assert _one(ev, compile_expr("'K' if float(record['score']) > 10 else 'D'")) == "K"
    assert _one(ev, compile_expr("action == 'insert' and not is_null(record['id'])")) is True
    assert _one(ev, compile_expr("f\"{record['house']}:{record['id']}\"")) == "Stark:7"


def test_minipy_extended_surface(ev):
    """Kernel/String/Regex/Base/Map allowlist parity (validator.ex:123-319)."""
    assert _one(ev, compile_expr("div(int(record['id']), 2)")) == 3
    assert _one(ev, compile_expr("rem(int(record['id']), 2)")) == 1
    assert _one(ev, compile_expr("min(int(record['id']), 3)")) == 3
    assert _one(ev, compile_expr("byte_size(record['house'])")) == 5
    assert _one(ev, compile_expr("lpad(record['id'], 3, '0')")) == "007"
    assert _one(ev, compile_expr("capitalize(record['name'])")) == "Arya"
    assert _one(ev, compile_expr("regex_match(record['house'], '^St')")) is True
    assert _one(ev, compile_expr("regex_extract(record['house'], '(ark)')")) == "ark"
    assert _one(ev, compile_expr("base64_decode(base64_encode(record['name']))")) == "arya"
    assert _one(ev, compile_expr("has_key(record, 'house')")) is True
    assert _one(ev, compile_expr("join(keys(record), ',')")) == "house,id,name,score"


def test_minipy_validator_rejections():
    for bad in [
        "__import__('os')",
        "record.house",          # dot access rejected (validator.ex:264-271)
        "open('/etc/passwd')",
        "x + 1",                  # unknown name
        "[e for e in record]",    # comprehensions not allowed
        "lambda x: x",
    ]:
        ok, err = validate(bad)
        assert not ok, bad
        assert err


def test_minipy_sandbox_udf(spark, ev):
    udf = sandbox_pandas_udf(
        "def transform(action, record, changes, metadata):\n"
        "    return action + ':' + record['id']\n"
    )
    got = ev.withColumn("metadata", F.lit(None).cast("string")).select(
        udf("action", "record", "changes", "metadata").alias("x")
    ).collect()[0].x
    assert got == "insert:7"
    with pytest.raises(ValueError):
        sandbox_pandas_udf("import os\ndef transform(a, r, c, m):\n    return 1\n")
    with pytest.raises(ValueError):
        sandbox_pandas_udf("def transform(a, r, c, m):\n    return __builtins__\n")


def test_path_function(ev):
    assert _one(ev, path_function("record.house")) == "Stark"
    assert _one(ev, path_function("action")) == "insert"
    assert _one(ev, path_function("record.missing")) is None
    with pytest.raises(ValueError):
        path_function("nope.x")
    with pytest.raises(ValueError):
        path_function("action.x")


def test_routing_defaults_and_overrides(ev):
    out = route(ev, "kafka")
    row = out.select("topic", "message_key").collect()[0]
    assert row.topic == "sequin.public.characters"
    assert row.message_key == "7"

    out = route(ev, "kafka", {"topic": F.lit("custom")})
    assert out.select("topic").collect()[0].topic == "custom"

    with pytest.raises(ValueError):
        route(ev, "kafka", {"not_a_key": F.lit("x")})
    with pytest.raises(ValueError):
        route(ev, "no_such_sink")

    out = route(ev, "redis_string")
    row = out.select("key", "redis_action").collect()[0]
    assert row.key == "sequin:characters:7"
    assert row.redis_action == "set"
