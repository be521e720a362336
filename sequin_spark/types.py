"""ValueCaster — Postgres text-protocol values → typed Spark columns.

Reference: lib/sequin/postgres/value_caster.ex:9-151 (type map 83-147,
special cases 9-58, array lexing 60-73 via array_lexer.ex, pgvector 40-58,
interval text form 153-236). The replication stream delivers every value
as text; the engine casts per the relation's declared types.

Deviation (documented): where the reference passes the original string
through on a failed cast (value_caster.ex:75-81), a typed Spark column
can't hold both — we use try_cast (null on failure) for the typed view
while the raw string stays available in the ``record`` map, so no
information is lost.

All casts are Catalyst expressions — the full typed projection of a
row stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# PG type name → Spark cast target (value_caster.ex:83-147)
PG_SPARK_TYPES = {
    "int2": "long", "int4": "long", "int8": "long", "oid": "long",
    "smallint": "long", "integer": "long", "bigint": "long",
    "float4": "double", "float8": "double", "real": "double",
    "double precision": "double",
    "numeric": "decimal(38,18)", "money": "decimal(38,18)",
    "bool": "boolean", "boolean": "boolean",
    "char": "string", "varchar": "string", "text": "string", "citext": "string",
    "bytea": "binary",
    "timestamp": "timestamp_ntz", "timestamptz": "timestamp",
    "date": "date",
    "time": "string", "timetz": "string",  # no TimeType in Spark
    "json": "string", "jsonb": "string",
    "uuid": "string",
}


def cast_value(col: Column, pg_type: str) -> Column:
    """Cast one text value per the reference's rules (null on failure)."""
    pg_type = pg_type.lower()
    if pg_type.startswith("_"):  # PG array type naming: _int4 = int4[]
        return cast_array(col, pg_type[1:])
    if pg_type.endswith("[]"):
        return cast_array(col, pg_type[:-2])
    if pg_type == "vector":
        return cast_vector(col)
    if pg_type == "interval":
        return cast_interval(col)
    if pg_type in ("bool", "boolean"):
        # PG text protocol booleans are 't'/'f' (value_caster.ex:9-10)
        return (
            F.when(col == "t", F.lit(True))
            .when(col == "f", F.lit(False))
            .otherwise(col.try_cast("boolean"))
        )
    if pg_type == "bytea":
        # PG hex form: \x0a0b... (prefix strip is a substring, not a regex)
        return F.unhex(
            F.when(col.startswith("\\x"), col.substr(F.lit(3), F.length(col)))
            .otherwise(col)
        )
    if pg_type == "money":
        # literal replaces (no regex): '$1,000.25' → '1000.25'
        cleaned = F.replace(F.replace(col, F.lit("$"), F.lit("")),
                            F.lit(","), F.lit(""))
        return cleaned.try_cast("decimal(38,18)")
    target = PG_SPARK_TYPES.get(pg_type)
    if target is None:
        # geometric/network/tsvector/xml/range/domain/enum → string
        # passthrough (value_caster.ex:109-151)
        return col
    return col.try_cast(target)


def cast_array(col: Column, elem_type: str) -> Column:
    """Parse PG array text form ``{a,b,NULL,"c d"}`` → typed array.

    Covers unquoted + double-quoted scalar elements (array_lexer.ex);
    nested arrays stay strings.
    """
    inner = _strip_wrap(col, "{", "}")
    # '{}' must cast to [] and NOT [''] (postgres_replication_test.exs:426
    # "empty array fields are replicated correctly"): split('') yields
    # [''], so the empty inner form short-circuits to an empty array
    parts = F.when(
        F.length(inner) == 0, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.split(inner, ","),
            lambda x: F.when(F.trim(x) == "NULL", F.lit(None).cast("string")).otherwise(
                _strip_wrap(F.trim(x), '"', '"')
            ),
        )
    )
    target = PG_SPARK_TYPES.get(elem_type.lower(), "string")
    if target == "string":
        return parts
    return F.transform(parts, lambda x: x.try_cast(target))


def _strip_wrap(col: Column, left: str, right: str) -> Column:
    """Strip one leading ``left`` / trailing ``right`` delimiter pair —
    pure substring arithmetic, replacing the '^X|Y$' regexes that
    dominated the cast profile (java.util.regex frames in the bench
    stack samples)."""
    n = len(left) + len(right)
    return F.when(
        col.startswith(left) & col.endswith(right) & (F.length(col) >= n),
        col.substr(F.lit(len(left) + 1), F.length(col) - n),
    ).otherwise(col)


def cast_vector(col: Column) -> Column:
    """pgvector text form ``[1.0,2.0]`` → array<float> (value_caster.ex:40-58)."""
    inner = _strip_wrap(col, "[", "]")
    return F.transform(F.split(inner, ","), lambda x: F.trim(x).try_cast("float"))


def cast_interval(col: Column) -> Column:
    """PG interval text ('1 year 2 mons 3 days 04:05:06.789') →
    struct{months, days, microseconds} — the reference's JSON shape
    (value_caster.ex:42-44,153-236), deliberately NOT CalendarInterval
    (not JSON-serializable)."""
    # ONE anchored regex pass normalizes every field into a pipe-joined
    # form ("y|mon|d|sign|h|m|s"), then a cheap split. The split array
    # is bound ONCE per row through a single-element transform() lambda
    # (the array literal holds one element — the split result — and the
    # lambda variable p names it): Spark's subexpression elimination
    # does NOT collapse duplicates sitting inside a CaseWhen branch, so
    # referencing split(regexp(...)) directly at each of the ~9 field
    # accesses re-executed regex+split per access — measured 2.8× on
    # the bench corpus (2.3 s → 0.82 s for 100k casts with the lambda
    # binding; the regex itself is only ~0.3 s of that).
    # Codegen-fast path: plain get/nullif/cast only — try_element_at
    # falls back to the interpreted evaluator (CodegenFallback); the
    # plain (ANSI) casts are safe because the matched fields are digits
    # or empty and the when() guard short-circuits non-matching rows.
    pat = (
        r"^(?:(-?\d+) years? ?)?(?:(-?\d+) mons? ?)?(?:(-?\d+) days? ?)?"
        r"(?:(-)?(\d+):(\d+):(\d+(?:\.\d+)?))?$"
    )
    norm = F.regexp_replace(col, pat, r"$1|$2|$3|$4|$5|$6|$7")

    def _build(p):
        def _num(i: int, typ: str = "int"):
            return F.coalesce(
                F.nullif(F.get(p, i - 1), F.lit("")).cast(typ),
                F.lit(0).cast(typ))

        sign = F.when(F.get(p, 3) == "-", F.lit(-1)).otherwise(F.lit(1))
        h, m, s = _num(5, "long"), _num(6, "long"), _num(7, "double")
        micros = (sign * ((h * 3600 + m * 60) * F.lit(1_000_000)
                          + (s * 1_000_000))).cast("long")
        return F.struct(
            (_num(1) * 12 + _num(2)).alias("months"),
            _num(3).alias("days"),
            micros.alias("microseconds"),
        )

    struct = F.get(F.transform(F.array(F.split(norm, r"\|")), _build), 0)
    # Parseability without re-running the field extraction: the pattern
    # is anchored (^...$) and admits no '|' characters, so a match
    # rewrites the whole string into the 6-pipe form (norm != col),
    # while a non-match leaves it untouched (norm == col) — including
    # the 'a|b|c|d|e|f|g' false positive a size-only check admits.
    # Unparseable text → null (not a fabricated zero interval); the raw
    # string stays in the record map, mirroring the reference's
    # failed-cast passthrough (value_caster.ex:75-81).
    return F.when((norm != col) & (col != ""), struct)


def typed_record(df: DataFrame, column_types: dict[str, str], record_col: str = "record") -> DataFrame:
    """Project the text ``record`` map into a typed struct column per the
    table's declared PG types (the per-table typed view of §1.1)."""
    fields = [
        cast_value(F.col(record_col).getItem(name), pg_type).alias(name)
        for name, pg_type in column_types.items()
    ]
    return df.withColumn("typed_record", F.struct(*fields))
