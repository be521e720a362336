"""Differential property test: MiniPy programs compiled to Catalyst must
agree with a pure-Python reference interpreter over randomized records
(the hypothesis-powered complement of the table-driven corpus in
test_functions.py — minielixir_test.exs's semantics contract)."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sequin_spark.functions.minipy import compile_program

# Program set chosen so Python semantics == MiniPy semantics on the
# generated inputs (no int(None)-style null coercions).
PROGRAMS = [
    "x = int(record['id'])\nreturn x * 3 + div(x, 2) - rem(x, 5)",
    "return upper(record['name']) + ':' + str(int(record['id']))",
    (
        "s = float(record['score'])\n"
        "if s > 75.0:\n    return 'hot'\n"
        "elif s > 25.0:\n    return 'warm'\n"
        "else:\n    return 'cold'"
    ),
    (
        "match record['house']:\n"
        "    case 'stark':\n        return 1\n"
        "    case 'tully':\n        return 2\n"
        "    case _:\n        return 0"
    ),
    "return record['maybe_missing'] != 'x'",
    "return record['maybe_missing'] == 'x'",
    "return join([upper(t) for t in split(record['csv'], ',') if length(t) > 1], '-')",
    "return min(int(record['id']), 50)",
    # Pythonic surface: chained comparisons, method calls, sorted,
    # f-strings, parallel + augmented assignment
    "return 10 < int(record['id']) < 5000",
    "return record['name'].upper() + '-' + record['house'].capitalize()",
    "return '-'.join(sorted(record['csv'].split(',')))",
    "a, b = int(record['id']), record['name']\nreturn f\"{b}:{a}\"",
    "x = int(record['id'])\nx += 7\nx *= 2\nreturn x",
    "return record['name'].replace('a', 'o').startswith('o')",
]


class _NullMap(dict):
    """MiniPy map semantics: absent key → null (never KeyError)."""

    def __missing__(self, key):
        return None


def _py_eval(src: str, record: dict):
    """Reference interpreter: the same allowlisted functions in plain
    Python (Elixir Kernel.div truncates toward zero)."""
    env = {
        "upper": lambda s: s.upper(),
        "length": len,
        "split": lambda s, sep: s.split(sep),
        "join": lambda xs, sep: sep.join(xs),
        "div": lambda a, b: int(math.trunc(a / b)),
        "rem": lambda a, b: int(math.fmod(a, b)),
        "min": min,
        "int": int,
        "float": float,
        "str": str,
        "sorted": sorted,
    }
    body = "\n".join("    " + ln for ln in src.splitlines())
    scope = {}
    exec(  # noqa: S102 — test-local reference interpreter
        "def transform(action, record, changes, metadata):\n" + body,
        {"__builtins__": {}, **env},
        scope,
    )
    return scope["transform"]("insert", _NullMap(record), None, None)


records_strategy = st.lists(
    st.fixed_dictionaries(
        {
            "id": st.integers(min_value=1, max_value=10_000).map(str),
            "score": st.floats(
                min_value=0.0, max_value=100.0, allow_nan=False
            ).map(lambda f: repr(round(f, 3))),
            "name": st.text(
                alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8
            ),
            "house": st.sampled_from(["stark", "tully", "lannister", "tyrell"]),
            "csv": st.lists(
                st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=1, max_size=5
            ).map(",".join),
        }
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(records=records_strategy)
def test_minipy_program_matches_python_reference(spark, records):
    df = spark.createDataFrame(
        [("insert", r) for r in records], "action string, record map<string,string>"
    )
    cols = [compile_program(src).alias(f"p{i}") for i, src in enumerate(PROGRAMS)]
    rows = df.select(*cols).collect()
    for rec, row in zip(records, rows):
        for i, src in enumerate(PROGRAMS):
            expected = _py_eval(src, dict(rec))
            got = row[f"p{i}"]
            if isinstance(expected, float):
                assert got is not None and abs(got - expected) < 1e-9, (src, rec)
            else:
                assert got == expected, (src, rec, got, expected)
