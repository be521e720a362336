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


def test_minipy_validator_sandbox_escape_corpus():
    """Python analogs of the reference's dangerous-construct suite
    (minielixir_test.exs:207-260: System env / File / spawn / eval /
    macros / ports / ets / reflection / network / process dictionary) —
    every escape hatch must fail validation, not compile."""
    for bad in [
        # environment / process access (System.get_env, System.cmd)
        "os.environ['SECRET_KEY']",
        "os.system('ls -la')",
        "subprocess.run('ls')",
        # file system (File.read, File.rm_rf)
        "open('/etc/passwd').read()",
        "pathlib.Path('/').unlink()",
        # eval (Code.eval_string)
        "eval(':erlang.halt()')",
        "exec('x = 1')",
        "compile('x', 'f', 'exec')",
        # reflection (Kernel.apply, function_exported?)
        "getattr(record, 'keys')",
        "setattr(record, 'k', 1)",
        "globals()",
        "locals()",
        "vars()",
        "type(record)",
        # dunder traversal (the classic sandbox escape chain)
        "record.__class__",
        "''.__class__.__mro__",
        "(1).__class__.__bases__[0].__subclasses__()",
        # concurrency (spawn, Task.async)
        "threading.Thread(target=f)",
        "asyncio.run(f())",
        # network (:gen_tcp.connect)
        "socket.socket()",
        "urllib.request.urlopen('http://x')",
        # generators/unbounded iteration
        "iter(record)",
        "next(record)",
        # del / augmented shadowing of roots
        "del record['k']",
        "record += 1",
        "metadata = {}",
        "action = 'update'",
        "changes = None",
    ]:
        ok, err = validate(bad)
        assert not ok, f"validator accepted: {bad}"
        assert err


def test_minipy_validator_allows_benign_constructs(spark):
    """The 'allows common syntax' side (minielixir_test.exs:37-130):
    assignment to fresh vars, if/elif chains, match statements, string
    concat, nested subscripts. (Needs an active session — validation
    builds the actual Catalyst columns.)"""
    for good in [
        "record['name'] + ' world'",                      # "x" <> " world"
        "'id-' + str(record['id'])",                      # interpolation analog
        ("v = record['score']\n"
         "if v == None:\n    return 'none'\n"
         "elif int(v) > 10:\n    return 'big'\n"
         "else:\n    return 'small'"),
        ("x = record['house']\n"
         "match x:\n"
         "    case 'Stark':\n        return 'north'\n"
         "    case _:\n        return 'other'"),
        ("m = {'a': 1, 'b': 2}\nreturn m['a']"),          # map = %{a: 1}
        "record['a']['b']",                               # nested access
        "upper(record['name'])",
    ]:
        ok, err = validate(good)
        assert ok, f"validator rejected benign: {good!r} → {err}"


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


MODULE_CASES = [
    # (expr_source, expected) over the `ev` row — MiniElixir module-call
    # parity (validator.ex:301-319 fnok allowlist; minielixir_test.exs:43
    # String.upcase et al.). Elixir ?/! suffixes dropped, ~r sigils are
    # plain string patterns.
    # --- String ---
    ("String.upcase(record['name'])", "ARYA"),
    ("String.downcase(record['house'])", "stark"),
    ("String.trim('  x  ')", "x"),
    ("String.trim_leading('  x  ') + '!'", "x  !"),
    ("String.trim_trailing('  x') + '!'", "  x!"),
    ("String.length(record['house'])", 5),
    ("String.reverse(record['name'])", "ayra"),
    ("String.replace('a-b-a', '-', ':')", "a:b:a"),  # replaces ALL
    ("Enum.join(String.split('a,b,c', ','), '-')", "a-b-c"),
    ("Enum.join(String.split('a.b.c', '.'), '|')", "a|b|c"),  # literal sep
    ("String.contains(record['house'], 'tar')", True),
    ("String.starts_with(record['house'], 'St')", True),
    ("String.ends_with(record['house'], 'rk')", True),
    ("String.pad_leading(record['id'], 3, '0')", "007"),
    ("String.pad_trailing(record['id'], 3, 'x')", "7xx"),
    ("String.capitalize('aRYA')", "Arya"),  # rest DOWNCASED (not initcap)
    ("String.duplicate('ab', 3)", "ababab"),
    ("String.at(record['name'], 0)", "a"),
    ("String.at(record['name'], -1)", "a"),
    ("String.at(record['name'], 99)", None),  # nil out of range
    ("String.first(record['house'])", "S"),
    ("String.last(record['house'])", "k"),
    ("String.slice(record['house'], 1, 3)", "tar"),
    ("String.to_integer(record['id']) + 1", 8),
    ("String.to_float(record['score']) * 2", 25.0),
    # --- Map (over the record map) ---
    ("Map.get(record, 'house')", "Stark"),
    ("Map.get(record, 'missing')", None),
    ("Map.get(record, 'missing', 'dflt')", "dflt"),
    ("Map.has_key(record, 'id')", True),
    ("Enum.join(Map.keys(record), ',')", "house,id,name,score"),
    ("Map.size(record)", 4),
    ("Map.get(Map.put(record, 'k', 'v'), 'k')", "v"),
    ("Map.get(Map.put(record, 'house', 'Tully'), 'house')", "Tully"),  # overwrite
    ("Map.size(Map.delete(record, 'id'))", 3),
    ("Map.get(Map.merge(record, Map.put(record, 'house', 'Bolton')), 'house')",
     "Bolton"),  # right wins
    ("Enum.join(Map.keys(Map.take(record, ['id', 'house'])), ',')", "house,id"),
    ("Enum.join(Map.keys(Map.drop(record, ['id', 'score'])), ',')", "house,name"),
    ("Enum.join(Map.values(Map.take(record, ['id', 'name'])), ':')", "7:arya"),
    # --- Enum (over arrays) ---
    ("Enum.count(String.split('a,b,c', ','))", 3),
    ("Enum.sum([1, 2, 3.5])", 6.5),
    ("Enum.min([3, 1, 2])", 1),
    ("Enum.max(String.split('b,a,c', ','))", "c"),
    ("Enum.join(Enum.sort(String.split('b,a,c', ',')), '')", "abc"),
    ("Enum.join(Enum.reverse(String.split('a,b', ',')), '')", "ba"),
    ("Enum.join(Enum.uniq(String.split('a,b,a', ',')), '')", "ab"),
    ("Enum.member(String.split('a,b', ','), 'b')", True),
    ("Enum.empty(String.split('a', ','))", False),
    ("Enum.at(String.split('a,b,c', ','), 1)", "b"),
    ("Enum.at(String.split('a,b,c', ','), -1)", "c"),
    ("Enum.at(String.split('a,b,c', ','), 9)", None),
    ("Enum.join(Enum.take(String.split('a,b,c,d', ','), 2), '')", "ab"),
    ("Enum.join(Enum.take(String.split('a,b,c,d', ','), -2), '')", "cd"),
    ("Enum.join(Enum.slice(String.split('a,b,c,d', ','), 1, 2), '')", "bc"),
    ("Enum.join(Enum.concat(String.split('a,b', ','), ['c']), '')", "abc"),
    # --- Date / DateTime (deterministic subset; no now()) ---
    ("Date.to_iso8601(Date.add('2024-03-15', 20))", "2024-04-04"),
    ("Date.diff('2024-03-20', '2024-03-15')", 5),
    ("Date.day_of_week('2024-03-15')", 5),  # Friday; Elixir Mon=1..Sun=7
    ("Date.day_of_week('2024-03-17')", 7),  # Sunday
    ("Date.day_of_year('2024-02-01')", 32),
    ("Date.quarter_of_year('2024-05-01')", 2),
    ("Date.to_iso8601(Date.beginning_of_month('2024-03-15'))", "2024-03-01"),
    ("Date.to_iso8601(Date.end_of_month('2024-02-10'))", "2024-02-29"),
    ("Date.leap_year('2024-01-01')", True),
    ("Date.leap_year('2100-01-01')", False),  # century, not /400
    ("DateTime.to_unix('2024-03-15 10:30:00')", 1710498600),
    ("DateTime.to_iso8601(DateTime.add('2024-03-15 10:30:00', 90))",
     "2024-03-15T10:31:30Z"),
    ("DateTime.diff('2024-03-15 10:31:30', '2024-03-15 10:30:00')", 90),
    ("Date.to_iso8601(DateTime.to_date('2024-03-15 10:30:00'))", "2024-03-15"),
    ("NaiveDateTime.to_unix('1970-01-01 00:01:00')", 60),
    # --- Integer ---
    ("Integer.to_string(255, 16)", "FF"),
    ("Integer.to_string(5, 2)", "101"),
    ("Integer.to_string(String.to_integer(record['id']))", "7"),
    ("Integer.mod(-7, 3)", 2),       # floored (sign of divisor)
    ("Integer.mod(7, -3)", -2),
    ("Integer.floor_div(-7, 2)", -4),  # floored, unlike Kernel.div
    ("Integer.pow(2, 10)", 1024),
    ("Integer.parse('42') + 1", 43),
    # --- Base ---
    ("Base.encode64(record['name'])", "YXJ5YQ=="),
    ("Base.decode64(Base.encode64('hi!'))", "hi!"),
    ("Base.encode16('ab')", "6162"),
    ("Base.decode16(Base.encode16('xyz'))", "xyz"),
    ("Base.url_decode64(Base.url_encode64('a?b>c~'))", "a?b>c~"),
    # --- URI ---
    ("URI.encode_www_form('a b&c')", "a+b%26c"),
    ("URI.decode_www_form(URI.encode_www_form('a b&c=d'))", "a b&c=d"),
    # --- Regex (Elixir arg order: pattern, subject) ---
    ("Regex.match('^St', record['house'])", True),
    ("Regex.match('ark$', record['name'])", False),
    ("Regex.replace('(a)(r)', record['name'], '\\\\2\\\\1')", "raya"),  # \\N backrefs
    ("Regex.run('[0-9]+', 'ab123cd')", "123"),
    ("Regex.run('[0-9]+', 'nope')", None),  # nil on no match
    ("Enum.join(Regex.scan('[0-9]+', 'a1b22c333'), '-')", "1-22-333"),
    ("Enum.join(Regex.split('[,;]', 'a,b;c'), '')", "abc"),
    # --- Decimal (exact decimal(38,12) arithmetic) ---
    ("Decimal.compare('1.50', '1.5')", "eq"),
    ("Decimal.compare('0.1', '0.2')", "lt"),
    ("Decimal.compare(record['score'], 12)", "gt"),
    ("Decimal.to_float(Decimal.add('0.1', '0.2'))", 0.3),  # exact, no fp drift
    ("Decimal.to_float(Decimal.div(1, 8))", 0.125),
    ("Decimal.to_float(Decimal.round('2.675', 2))", 2.68),  # half-up, not banker's
    ("Decimal.to_float(Decimal.abs(Decimal.negate('1.5')))", 1.5),
    ("Decimal.to_float(Decimal.max('1.1', '1.09'))", 1.1),
    # --- List ---
    ("List.first(String.split('x,y', ','))", "x"),
    ("List.last(String.split('x,y', ','))", "y"),
    ("Enum.join(List.flatten([String.split('a,b', ','), ['c']]), '')", "abc"),
    ("Enum.join(List.duplicate('ab', 2), '-')", "ab-ab"),
    # --- JSON ---
    ("JSON.decode('{\"k\": \"v\"}')['k']", "v"),
    ("Map.get(JSON.decode('{\"a\": \"1\"}'), 'a')", "1"),
    ("JSON.encode({'id': 7})", '{"id":7}'),
    # --- Kernel.* call form ---
    ("Kernel.div(-7, 2)", -3),  # truncated (vs Integer.floor_div)
    ("Kernel.rem(-7, 2)", -1),
    ("Kernel.byte_size(record['house'])", 5),
    ("Kernel.to_string(42) + '!'", "42!"),
    # --- UUID (deterministic name-based variant) ---
    ("String.length(UUID.uuid3('ns', 'name'))", 36),
    ("String.at(UUID.uuid3('ns', 'x'), 14)", "3"),  # version nibble
]


def test_minipy_module_corpus(ev):
    """Module-call surface corpus (validator.ex:301-319 fnok parity):
    String/Map/Enum/Date/DateTime/Integer/Base/URI/Regex/Decimal/List/
    JSON/Kernel/UUID — each case compiles to one Catalyst expression."""
    from sequin_spark.functions.minipy import compile_expr as ce

    for src, expected in MODULE_CASES:
        got = _one(ev, ce(src))
        if isinstance(got, list):
            got = list(got)
        if isinstance(expected, float):
            assert got == pytest.approx(expected), f"{src!r}: {got!r}"
        else:
            assert got == expected, f"{src!r}: {got!r} != {expected!r}"


def test_minipy_module_rejections():
    """Unknown module functions and non-module attributes still rejected."""
    for bad in [
        "String.to_atom('x')",            # explicitly denied (validator.ex:306)
        "String.nope('x')",
        "File.read('/etc/passwd')",       # module not in fnok
        "System.cmd('ls')",
        "record.house",                   # data access stays subscript-only
        "Integer.to_string(7, 7)",        # unsupported base
        "Map.take(record, record['id'])",  # keys must be a literal list
    ]:
        ok, err = validate(bad)
        assert not ok, bad
        assert err


def test_minipy_modules_in_programs(ev):
    """Module calls compose with the program surface (locals, branches)."""
    from sequin_spark.functions.minipy import compile_program

    got = _one(
        ev,
        compile_program(
            "key = Base.encode64(record['name'])\n"
            "if Regex.match('^Y', key):\n"
            "    return {'k': key, 'd': Date.to_iso8601(Date.add('2024-01-01', "
            "String.to_integer(record['id'])))}\n"
            "return {'k': 'no', 'd': ''}"
        ),
    )
    assert got.asDict() == {"k": "YXJ5YQ==", "d": "2024-01-08"}


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


PYTHONIC_CASES = [
    # Pythonic surface added for MiniElixir-corpus breadth: chained
    # comparisons, method-call forms (module-twin dispatch), sorted/
    # reversed, f-strings, parallel + augmented assignment.
    ("1 < 2 < 3", True),
    ("1 < 2 < 1", False),
    ("0 <= int(record['id']) <= 10", True),
    ("'a' < record['name'] < 'b'", True),
    ("record['name'].upper()", "ARYA"),
    ("record['house'].lower()", "stark"),
    ("'  x  '.strip() + '!'", "x!"),
    ("'  x'.lstrip() + '!'", "x!"),
    ("'x  '.rstrip() + '!'", "x!"),
    ("'aRYA'.capitalize()", "Arya"),
    ("record['house'].startswith('St')", True),
    ("record['house'].endswith('rk')", True),
    ("'a-b-a'.replace('-', ':')", "a:b:a"),
    ("'a,b,c'.split(',')[1]", "b"),
    ("record.get('house')", "Stark"),
    ("record.get('missing')", None),
    ("record.get('missing', 'dflt')", "dflt"),
    ("','.join(record.keys())", "house,id,name,score"),
    ("':'.join('a,b'.split(','))", "a:b"),
    ("sorted(['b', 'a', 'c'])[0]", "a"),
    ("reversed(['a', 'b'])[0]", "b"),
    ("'-'.join(sorted('b,a'.split(',')))", "a-b"),
    ("f\"user-{record['id']}\"", "user-7"),
    ("f\"{record['name'].upper()}-{int(record['id']) + 1}\"", "ARYA-8"),
    # method chains compile to nested Catalyst calls, one expression
    ("record['name'].replace('a', 'o').upper()", "ORYO"),
]

PYTHONIC_PROGRAMS = [
    ("def transform(action, record, changes, metadata):\n"
     "    a, b = record['id'], record['name']\n"
     "    return b + a", "arya7"),
    ("def transform(action, record, changes, metadata):\n"
     "    x = int(record['id'])\n"
     "    x += 3\n"
     "    x *= 2\n"
     "    x -= 1\n"
     "    return x", 19),
    ("def transform(action, record, changes, metadata):\n"
     "    lo, hi = 0, 10\n"
     "    if lo <= int(record['id']) <= hi:\n"
     "        return 'in-range'\n"
     "    return 'out'", "in-range"),
]

PYTHONIC_REJECTS = [
    # the sandbox must not grow: unknown methods, dunder chains,
    # argument shadowing through the new assignment forms
    "record['name'].evil()",
    "record.__class__",
    "''.join.__globals__",
    "def transform(action, record, changes, metadata):\n"
    "    record, x = 1, 2\n"
    "    return x",
    "def transform(action, record, changes, metadata):\n"
    "    metadata += 1\n"
    "    return metadata",
    "def transform(action, record, changes, metadata):\n"
    "    a, b = 1, 2, 3\n"
    "    return a",
]


def test_minipy_pythonic_corpus(ev):
    from sequin_spark.functions.minipy import compile_expr as ce

    for src, expected in PYTHONIC_CASES:
        assert _one(ev, ce(src)) == expected, src


def test_minipy_pythonic_programs(ev):
    from sequin_spark.functions.minipy import compile_program

    for src, expected in PYTHONIC_PROGRAMS:
        assert _one(ev, compile_program(src)) == expected, src


def test_minipy_pythonic_rejects(ev):
    from sequin_spark.functions.minipy import validate

    for src in PYTHONIC_REJECTS:
        ok, err = validate(src)
        assert not ok and err, src
