"""ValueCaster semantics corpus (value_caster.ex parity; FIXTURES.md §4
all-types coverage shape)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from sequin_spark.types import cast_array, cast_interval, cast_value, cast_vector, typed_record


def _one(spark, col):
    return spark.range(1).select(col.alias("x")).collect()[0].x


def test_scalar_casts(spark):
    assert _one(spark, cast_value(F.lit("42"), "int8")) == 42
    assert _one(spark, cast_value(F.lit("1.5"), "float8")) == 1.5
    assert _one(spark, cast_value(F.lit("t"), "bool")) is True
    assert _one(spark, cast_value(F.lit("f"), "bool")) is False
    assert _one(spark, cast_value(F.lit("$1,234.50"), "money")) is not None
    assert _one(spark, cast_value(F.lit(r"\x4142"), "bytea")) == bytearray(b"AB")
    # unknown type → string passthrough (value_caster.ex:149-151)
    assert _one(spark, cast_value(F.lit("(1,2)"), "point")) == "(1,2)"
    # failed cast → null (documented deviation: raw stays in record map)
    assert _one(spark, cast_value(F.lit("not-a-number"), "int4")) is None


def test_array_and_vector_casts(spark):
    got = _one(spark, cast_array(F.lit('{a,"b c",NULL}'), "text"))
    assert got == ["a", "b c", None]
    got = _one(spark, cast_array(F.lit("{1,2,3}"), "int4"))
    assert got == [1, 2, 3]
    got = _one(spark, cast_vector(F.lit("[0.5, 1.5]")))
    assert got == [0.5, 1.5]


def test_interval_cast(spark):
    got = _one(spark, cast_interval(F.lit("1 year 2 mons 3 days 04:05:06.5")))
    assert got.months == 14 and got.days == 3
    assert got.microseconds == (4 * 3600 + 5 * 60 + 6.5) * 1_000_000
    got = _one(spark, cast_interval(F.lit("5 days")))
    assert got.months == 0 and got.days == 5 and got.microseconds == 0


def test_interval_cast_rejects_non_interval_text(spark):
    # six '|' chars pass the split-size check alone — the rlike guard must
    # keep unparseable text as null, not a fabricated zero interval
    assert _one(spark, cast_interval(F.lit("a|b|c|d|e|f|g"))) is None
    assert _one(spark, cast_interval(F.lit("not an interval"))) is None
    assert _one(spark, cast_interval(F.lit(""))) is None


def test_typed_record_projection(spark):
    df = spark.createDataFrame(
        [Row(record={"id": "7", "score": "1.25", "active": "t", "tags": "{x,y}"})]
    )
    out = typed_record(
        df, {"id": "int8", "score": "float8", "active": "bool", "tags": "_text"}
    ).select("typed_record.*").collect()[0]
    assert out.id == 7 and out.score == 1.25 and out.active is True
    assert out.tags == ["x", "y"]
