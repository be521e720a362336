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
        "[e for e in record]",    # maps aren't iterable (use keys()/split())
        "lambda x: x",
        "record = 1",             # can't shadow an argument (validator parity)
        "while True: return 1",   # unbounded loops never allowed
        "import os\nreturn 1",
        "x = 1",                  # program with no return
        "sha256()",               # arity error surfaces as validation failure
    ]:
        ok, err = validate(bad)
        assert not ok, bad
        assert err


PROGRAM_CASES = [
    # (program_source, expected) over the `ev` row:
    # action=insert, record={id:7, house:Stark, name:arya, score:12.5}
    # --- locals + return (MiniElixir assignment/body parity) ---
    ("x = int(record['id'])\nreturn x * 2", 14),
    ("x = record['house']\ny = upper(x)\nreturn y + '!'", "STARK!"),
    ("x = 1\nx = x + 1\nreturn x", 2),  # rebinding
    # --- if/elif/else → when chains (MiniElixir if/cond parity) ---
    ("if action == 'insert':\n    return 'I'\nreturn 'O'", "I"),
    ("if action == 'delete':\n    return 'D'\nelse:\n    return 'N'", "N"),
    (
        "s = float(record['score'])\n"
        "if s > 100:\n    return 'huge'\n"
        "elif s > 10:\n    return 'big'\n"
        "else:\n    return 'small'",
        "big",
    ),
    ("if is_null(record['missing']):\n    return 'absent'\nreturn 'present'", "absent"),
    # --- match → case parity (minielixir_test case expressions) ---
    (
        "match action:\n"
        "    case 'insert':\n        return 1\n"
        "    case 'update':\n        return 2\n"
        "    case _:\n        return 0",
        1,
    ),
    (
        "match record['house']:\n"
        "    case 'Lannister':\n        return 'lion'\n"
        "    case _:\n        return 'other'",
        "other",
    ),
    (
        "match int(record['id']):\n"
        "    case 7 if action == 'insert':\n        return 'seven-insert'\n"
        "    case 7:\n        return 'seven'\n"
        "    case _:\n        return 'no'",
        "seven-insert",
    ),
    # --- dict construction → struct (map-building %{...} parity) ---
    (
        "return {'id': int(record['id']), 'who': upper(record['name'])}",
        {"id": 7, "who": "ARYA"},
    ),
    (
        "tag = 'vip' if float(record['score']) > 10 else 'std'\n"
        "return {'tag': tag, 'n': length(record['name'])}",
        {"tag": "vip", "n": 4},
    ),
    # --- list comprehensions → transform/filter HOFs (Enum parity) ---
    ("return [upper(x) for x in split('a,b,c', ',')]", ["A", "B", "C"]),
    (
        "return [int(x) * 10 for x in split('1,2,3', ',') if int(x) > 1]",
        [20, 30],
    ),
    ("return sum([float(x) for x in split('1.5,2.5', ',')])", 4.0),
    ("return size(split(record['name'], ''))", 4),
    ("return first(sort_list(split('b,a,c', ',')))", "a"),
    ("return join(uniq(split('a,b,a', ',')), '-')", "a-b"),
    # --- null-safe ==/!= (MiniElixir nil semantics; ADVICE item) ---
    ("return record['missing'] != 'x'", True),
    ("return record['missing'] == 'x'", False),
    # --- function wrapper form ---
    (
        "def transform(action, record, changes, metadata):\n"
        "    return action + ':' + record['id']",
        "insert:7",
    ),
    (
        "def route(action, record, changes, metadata):\n"
        "    if record['house'] == 'Stark':\n"
        "        return 'north'\n"
        "    return 'south'",
        "north",
    ),
    # --- kernel fns inside programs (sha256/div fixes; ADVICE items) ---
    ("return length(sha256(record['id']))", 64),
    ("return 'shard-' + str(div(int(record['id']), 4))", "shard-1"),
    ("return div(-7, 2)", -3),  # Elixir div truncates toward zero
    # --- nesting ---
    (
        "if action == 'insert':\n"
        "    if float(record['score']) > 10:\n"
        "        return 'hot'\n"
        "    return 'cold'\n"
        "return 'skip'",
        "hot",
    ),
    (
        "base = {'id': record['id']}\n"
        "if action == 'delete':\n    return 'tomb'\n"
        "return get_json(to_json(base), '$.id')",
        None,  # placeholder — replaced below (to_json not in allowlist)
    ),
    # --- cond-expression parity (minielixir_test.exs:77-96) ---
    (
        "x = int(record['id']) - 7\n"
        "if x < 0:\n    return 'negative'\n"
        "elif x > 0:\n    return 'positive'\n"
        "else:\n    return 'zero'",
        "zero",
    ),
    # --- string/binary construction ('hello' <> ' world', :37-45) ---
    ("return record['house'] + ' ' + record['name']", "Stark arya"),
    ("return substring(record['house'], 1, 2)", "St"),
    ("return trim(replace('  x-y  ', '-', ':'))", "x:y"),
    # --- list concat ([1,2] ++ [3,4], :40) + cons ([h | t], :492) ---
    (
        "return join(concat(split('a,b', ','), split('c', ',')), '-')",
        "a-b-c",
    ),
    ("return [record['id'], record['name']]", ["7", "arya"]),
    # --- nil handling: coalesce = the `||` default idiom ---
    ("return coalesce(record['missing'], 'dflt')", "dflt"),
    (
        "v = coalesce(record['missing'], record['house'])\nreturn lower(v)",
        "stark",
    ),
    # --- numeric kernel fns inside programs (:310-313 kernel allowlist) ---
    ("return abs(0 - int(record['id']))", 7),
    ("return round(float(record['score']))", 13.0),
    ("return floor(float(record['score'])) + ceil(0.1)", 13),
    ("return max(int(record['id']), 3, 11)", 11),
    # --- regex + boolean guards in branches (:354-364 kernel guards) ---
    (
        "if regex_match(record['house'], '^St') and not is_null(record['name']):\n"
        "    return regex_extract(record['name'], '(ar)') + '!'\n"
        "return 'no'",
        "ar!",
    ),
    # --- nested dict (deep %{...} building) + match binding wildcard ---
    (
        "return {'outer': {'id': int(record['id'])}, 'k': 'v'}",
        {"outer": {"id": 7}, "k": "v"},
    ),
    (
        "match record['house']:\n"
        "    case h:\n        return lower(h)",
        "stark",
    ),
    # --- Enum chains: filter → map → aggregate in one expression ---
    (
        "toks = [x for x in split('3,9,4,12', ',') if int(x) > 3]\n"
        "return sum([int(t) * 1.0 for t in toks])",
        25.0,
    ),
    ("return count([x for x in split(record['name'], '') if x in ['a']])", 2),
    ("return member(split('a,b', ','), record['name'])", False),
    ("return last(sort_list(split('b,a,c', ',')))", "c"),
    # --- any/all → exists/forall HOFs (Enum.any?/all? parity) ---
    ("return any(int(x) > 2 for x in split('1,2,3', ','))", True),
    ("return all(int(x) > 0 for x in split('1,2,3', ','))", True),
    ("return all(int(x) > 1 for x in split('1,2,3', ','))", False),
    ("return any(x == 'z' for x in split(record['name'], ''))", False),
    (
        "return any(length(x) > 1 for x in split('a,bb,c', ',') if x != 'bb')",
        False,  # the filter runs before the predicate
    ),
    ("return any([int(x) > 2 for x in split('1,3', ',')])", True),  # list form
]
# drop the placeholder case exercising a non-allowlisted fn
PROGRAM_CASES = [c for c in PROGRAM_CASES if c[1] is not None]


def test_minipy_program_semantics_corpus(ev):
    """Table-driven MiniElixir-parity corpus (minielixir_test.exs analog):
    locals, if/cond, case, map building, Enum-with-lambda shapes."""
    from sequin_spark.functions.minipy import compile_program

    for src, expected in PROGRAM_CASES:
        got = _one(ev, compile_program(src))
        if isinstance(expected, dict):
            got = got.asDict(recursive=True)
        elif isinstance(got, list):
            got = list(got)
        assert got == expected, f"program {src!r}: {got!r} != {expected!r}"


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
