"""MiniPy — sandboxed expression DSL compiled to Spark SQL Columns.

The reference's UDF surface is "MiniElixir": a single pure function body
over (action, record, changes, metadata), AST-validated against an
allowlist, no atom creation / module definition / IO
(lib/sequin/functions/minielixir.ex, minielixir/validator.ex). Its
allowlist is deliberately ≈ "pure expression over a JSON row".

MiniPy is the Spark-native equivalent: a Python expression — or a
statement PROGRAM (compile_program: local bindings, if/elif/else,
``match``, dict literals, list comprehensions) — over the names
``action, record, changes, metadata``, AST-validated against an
allowlist and compiled to ONE Catalyst Column — so user functions run
JVM-side inside whole-stage codegen, never as row-at-a-time Python.
This is the fast path; genuinely imperative user code (data-dependent
loops, accumulation) escapes to a Pandas UDF (see sandbox_pandas_udf
below), the slow path, mirroring the reference's
compiled-vs-interpreted split (minielixir.ex:54-84).

Allowed surface (validator parity, minielixir/validator.ex:75-236):
  - arithmetic + - * / % **, comparisons, boolean and/or/not, in
  - conditional expressions ``a if cond else b``
  - subscript access record["k"], changes["k"] (dot syntax rejected,
    validator.ex:264-271)
  - string concat via +, f-strings
  - calls to allowlisted functions (str/date/math — mapped to Spark SQL
    built-ins, validator.ex:123-172,301-319)
  - MODULE calls mirroring the fnok allowlist (validator.ex:301-319):
    String. Map. Enum. Date. DateTime. NaiveDateTime. Decimal. URI.
    Base. UUID. JSON. Integer. Regex. List. Kernel. — each compiled to
    built-in Catalyst expressions (see _MODULES). Elixir's trailing ?/!
    are dropped (String.contains? → String.contains); ~r sigils become
    plain string patterns (Regex.match('^a', s)).
"""

from __future__ import annotations

import ast
import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F

_ARG_NAMES = {"action", "record", "changes", "metadata"}

def _w1(fn):
    """Wrap a Spark fn so its FIRST arg is coerced to a Column — string
    literals must become lit(), never column references."""
    return lambda c, *rest: fn(_as_col(c), *rest)


def _wall(fn):
    """Wrap a variadic Spark fn coercing EVERY arg to a Column."""
    return lambda *cs: fn(*[_as_col(c) for c in cs])


# name → (spark function, result kind). Kinds drive `+` dispatch:
# string + string → concat (MiniElixir `<>`), numeric + numeric → plus.
_FUNCTIONS = {
    "upper": (_w1(F.upper), "str"),
    "lower": (_w1(F.lower), "str"),
    "length": (_w1(F.length), "num"),
    "trim": (_w1(F.trim), "str"),
    "abs": (_w1(F.abs), "num"),
    "round": (_w1(F.round), "num"),
    "ceil": (_w1(F.ceil), "num"),
    "floor": (_w1(F.floor), "num"),
    "concat": (_wall(F.concat), "str"),
    "coalesce": (_wall(F.coalesce), "unknown"),
    "substring": (_w1(F.substring), "str"),
    "replace": (lambda c, a, b: F.regexp_replace(_as_col(c), F.lit(a), F.lit(b)), "str"),
    "split": (lambda c, sep: F.split(_as_col(c), sep), "list"),
    "to_date": (_w1(F.to_date), "unknown"),
    "to_timestamp": (_w1(F.to_timestamp), "unknown"),
    "date_format": (_w1(F.date_format), "str"),
    "year": (_w1(F.year), "num"),
    "month": (_w1(F.month), "num"),
    "day": (_w1(F.dayofmonth), "num"),
    "md5": (_w1(F.md5), "str"),
    "sha256": (lambda c: F.sha2(_as_col(c).cast("string"), 256), "str"),
    "greatest": (_wall(F.greatest), "unknown"),
    "least": (_wall(F.least), "unknown"),
    "int": (lambda c: _as_col(c).cast("long"), "num"),
    "float": (lambda c: _as_col(c).cast("double"), "num"),
    "str": (lambda c: _as_col(c).cast("string"), "str"),
    "bool": (lambda c: _as_col(c).cast("boolean"), "bool"),
    "starts_with": (lambda c, p: _as_col(c).startswith(p), "bool"),
    "ends_with": (lambda c, p: _as_col(c).endswith(p), "bool"),
    "contains": (lambda c, p: _as_col(c).contains(p), "bool"),
    "get_json": (lambda c, p: F.get_json_object(_as_col(c), p), "str"),
    "is_null": (lambda c: _as_col(c).isNull(), "bool"),
    "sorted": (lambda c: F.array_sort(_to_col(_T(c, "list"))), "list"),
    "reversed": (lambda c: F.reverse(_to_col(_T(c, "list"))), "list"),
    # Kernel parity (validator.ex @kernel_functions): div/rem/trunc/min/max/byte_size
    # Elixir Kernel.div truncates toward zero and returns an integer — so
    # does Spark's integral `div` (-7 div 2 == -3), and staying in the
    # integer domain keeps |n| > 2^53 exact (a double round-trip would not)
    "div": (
        lambda a, b: F.call_function(
            "div", _as_col(a).cast("long"), _as_col(b).cast("long")
        ),
        "num",
    ),
    "rem": (lambda a, b: _as_col(a) % _as_col(b), "num"),
    "trunc": (lambda c: _as_col(c).cast("long"), "num"),
    "min": (lambda *cs: F.least(*[_as_col(c) for c in cs]), "unknown"),
    "max": (lambda *cs: F.greatest(*[_as_col(c) for c in cs]), "unknown"),
    "byte_size": (lambda c: F.octet_length(_as_col(c)), "num"),
    "len": (_w1(F.length), "num"),
    # String module parity
    "lpad": (lambda c, n, p: F.lpad(_as_col(c), n, p), "str"),
    "rpad": (lambda c, n, p: F.rpad(_as_col(c), n, p), "str"),
    "reverse": (lambda c: F.reverse(_as_col(c)), "str"),
    "capitalize": (lambda c: F.initcap(_as_col(c)), "str"),
    # Regex module parity
    "regex_match": (lambda c, pat: _as_col(c).rlike(pat), "bool"),
    "regex_replace": (lambda c, pat, rep: F.regexp_replace(_as_col(c), pat, rep), "str"),
    "regex_extract": (lambda c, pat: F.regexp_extract(_as_col(c), pat, 1), "str"),
    # Base module parity
    "base64_encode": (lambda c: F.base64(_as_col(c).cast("binary")), "str"),
    "base64_decode": (lambda c: F.unbase64(_as_col(c)).cast("string"), "str"),
    # URI module parity
    "url_encode": (lambda c: F.url_encode(_as_col(c)), "str"),
    "url_decode": (lambda c: F.url_decode(_as_col(c)), "str"),
    # Date/DateTime module parity (deterministic subset — no now())
    "date_add": (lambda c, n: F.date_add(_as_col(c), n), "unknown"),
    "datediff": (lambda a, b: F.datediff(_as_col(a), _as_col(b)), "num"),
    "hour": (_w1(F.hour), "num"),
    "minute": (_w1(F.minute), "num"),
    "second": (_w1(F.second), "num"),
    # Map module parity over the record/changes maps
    "keys": (lambda c: F.array_sort(F.map_keys(_as_col(c))), "list"),
    "has_key": (lambda c, k: F.array_contains(F.map_keys(_as_col(c)), k), "bool"),
    "join": (lambda c, sep: F.array_join(_as_col(c), sep), "str"),
    # Enum module parity over arrays (validator.ex @enum_functions);
    # Enum.map/filter with lambdas come in via list comprehensions →
    # Catalyst transform/filter higher-order functions
    "sum": (
        lambda c: F.aggregate(
            _as_col(c), F.lit(0.0), lambda acc, x: acc + x.cast("double")
        ),
        "num",
    ),
    "size": (lambda c: F.size(_as_col(c)), "num"),
    "count": (lambda c: F.size(_as_col(c)), "num"),
    "first": (lambda c: F.element_at(_as_col(c), 1), "unknown"),
    "last": (lambda c: F.element_at(_as_col(c), -1), "unknown"),
    "sort_list": (lambda c: F.array_sort(_as_col(c)), "list"),
    "uniq": (lambda c: F.array_distinct(_as_col(c)), "list"),
    "member": (lambda c, x: F.array_contains(_as_col(c), x), "bool"),
}

def _lits(x):
    """Unwrap a MiniPy list literal (list of compiled _T) to raw python
    values — for args that must be compile-time constants (Map.take keys,
    `in [..]` membership lists)."""
    if not isinstance(x, (list, tuple)):
        raise ValueError(_BANNED_MSG.format("non-literal list argument"))
    out = []
    for e in x:
        v = e.val if isinstance(e, _T) else e
        if isinstance(v, Column):
            raise ValueError(_BANNED_MSG.format("computed value in literal list"))
        out.append(v)
    return out


def _lit_str(x, what: str) -> str:
    if not isinstance(x, str):
        raise ValueError(f"MiniPy: {what} must be a string literal")
    return x


def _lit_int(x, what: str) -> int:
    if isinstance(x, bool) or not isinstance(x, int):
        raise ValueError(f"MiniPy: {what} must be an integer literal")
    return x


def _split_lit(c, sep):
    # Elixir String.split splits on a LITERAL separator; Spark's split
    # takes a Java regex — \Q...\E quotes the separator verbatim
    return F.split(_as_col(c), "\\Q" + _lit_str(sep, "String.split separator") + "\\E")


def _capitalize(c):
    # Elixir String.capitalize: first grapheme upcased, REST downcased
    # (initcap would capitalize every word — not parity)
    col = _as_col(c)
    return F.concat(
        F.upper(F.substring(col, 1, 1)), F.lower(F.substring(col, 2, 0x7FFFFFFF))
    )


def _string_at(c, i):
    # String.at: 0-based, negative counts from the end, nil out of range
    i = _lit_int(i, "String.at index")
    return F.nullif(F.substring(_as_col(c), i + 1 if i >= 0 else i, 1), F.lit(""))


def _string_slice(c, start, length):
    start = _lit_int(start, "String.slice start")
    return F.substring(_as_col(c), start + 1 if start >= 0 else start, length)


def _map_put(m, k, v):
    # remove-then-concat: independent of spark.sql.mapKeyDedupPolicy
    kc = _as_col(k)
    cleaned = F.map_filter(_as_col(m), lambda mk, mv: ~mk.eqNullSafe(kc))
    return F.map_concat(cleaned, F.create_map(kc, _as_col(v)))


def _map_merge(a, b):
    # Elixir Map.merge: right side wins on key collision
    bc = _as_col(b)
    keep = F.map_filter(_as_col(a), lambda k, v: ~F.array_contains(F.map_keys(bc), k))
    return F.map_concat(keep, bc)


def _map_values(m):
    # values ordered by sorted key — deterministic companion to keys();
    # Elixir map iteration order is unspecified for big maps anyway
    mc = _as_col(m)
    return F.transform(F.array_sort(F.map_keys(mc)), lambda k: F.element_at(mc, k))


def _map_take(m, ks, keep=True):
    keys = [x for x in _lits(ks)]
    pred = (lambda k, v: k.isin(keys)) if keep else (lambda k, v: ~k.isin(keys))
    return F.map_filter(_as_col(m), pred)


def _enum_at(c, i):
    ic = _as_col(i).cast("int")
    # Elixir 0-based with negative-from-end → element_at is 1-based with
    # the same negative convention; try_ because ANSI element_at THROWS
    # out of range where Enum.at returns nil
    return F.try_element_at(_as_col(c), F.when(ic >= 0, ic + 1).otherwise(ic))


def _enum_take(c, n):
    n = _lit_int(n, "Enum.take count")
    if n < 0:
        col = _as_col(c)
        return F.slice(col, F.greatest(F.size(col) + n + 1, F.lit(1)),
                       F.least(F.size(col), F.lit(-n)))
    return F.slice(_as_col(c), 1, n)


def _int_mod(a, b):
    # Integer.mod is FLOORED (sign follows divisor), unlike Kernel.rem
    av, bv = _as_col(a), _as_col(b)
    return ((av % bv) + bv) % bv


def _int_floor_div(a, b):
    # exact integer floor division: (a - Integer.mod(a,b)) / b
    av, bv = _as_col(a), _as_col(b)
    return ((av - (((av % bv) + bv) % bv)) / bv).cast("long")


def _int_to_string(n, base=10):
    base = _lit_int(base, "Integer.to_string base")
    col = _as_col(n)
    if base == 10:
        return col.cast("string")
    if base == 16:
        return F.hex(col)  # uppercase, matching Elixir's default
    if base == 2:
        return F.bin(col)
    raise ValueError("MiniPy: Integer.to_string supports bases 2, 10, 16")


def _regex_replace(pat, s, rep):
    # Elixir arg order (regex, string, replacement); Elixir backrefs are
    # \\1 / \g{1}, Spark's are $1 — translate literal replacements
    if isinstance(rep, str):
        rep = _re.sub(r"\\g\{(\d+)\}", r"$\1", _re.sub(r"\\(\d)", r"$\1", rep))
    return F.regexp_replace(_as_col(s), _as_col(pat), _as_col(rep))


def _uuid3(ns, name):
    """Deterministic name-based UUID (RFC 4122 v3 shape): md5 over
    ns||name with version nibble '3' and RFC variant bits. Simplified from
    UUID.uuid3/2 in that the namespace contributes its string form, not
    its 16 raw bytes (uuid.ex parity is the FORMAT, not the byte layout)."""
    h = F.md5(F.concat(_as_col(ns).cast("string"), _as_col(name).cast("string")))
    variant_nib = F.lower(
        F.conv(((F.conv(F.substring(h, 17, 1), 16, 10).cast("int") % 4) + 8)
               .cast("string"), 10, 16)
    )
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("3"), F.substring(h, 14, 3)),
        F.concat(variant_nib, F.substring(h, 18, 3)),
        F.substring(h, 21, 12),
    )


def _decimal(c):
    return _as_col(c).cast("decimal(38,12)")


def _decimal_compare(a, b):
    av, bv = _decimal(a), _decimal(b)
    return F.when(av < bv, "lt").when(av > bv, "gt").otherwise("eq")


def _dt_ts(c):
    return _as_col(c).cast("timestamp")


# MiniElixir module-call surface (validator.ex:301-319 allowlist: Map,
# String, Enum, Date, DateTime, NaiveDateTime, Decimal, URI, Base, UUID,
# JSON, Integer, Regex, List + Kernel) — each call compiles to built-in
# Catalyst expressions, JVM-side. Elixir's trailing ?/! are dropped
# (not valid Python identifiers): String.contains? → String.contains,
# Base.decode64! → Base.decode64.
_MODULES: dict = {
    "String": {
        "upcase": (_w1(F.upper), "str"),
        "downcase": (_w1(F.lower), "str"),
        "trim": (_w1(F.trim), "str"),
        "trim_leading": (_w1(F.ltrim), "str"),
        "trim_trailing": (_w1(F.rtrim), "str"),
        "length": (_w1(F.length), "num"),
        "reverse": (_w1(F.reverse), "str"),
        # String.replace/3 replaces ALL literal occurrences
        "replace": (lambda c, p, r: F.replace(_as_col(c), _as_col(p), _as_col(r)), "str"),
        "split": (_split_lit, "list"),
        "contains": (lambda c, s: _as_col(c).contains(s), "bool"),
        "starts_with": (lambda c, p: _as_col(c).startswith(p), "bool"),
        "ends_with": (lambda c, p: _as_col(c).endswith(p), "bool"),
        "pad_leading": (lambda c, n, p=" ": F.lpad(_as_col(c), n, p), "str"),
        "pad_trailing": (lambda c, n, p=" ": F.rpad(_as_col(c), n, p), "str"),
        "capitalize": (_capitalize, "str"),
        "duplicate": (lambda c, n: F.repeat(_as_col(c), n), "str"),
        "at": (_string_at, "str"),
        "first": (lambda c: _string_at(c, 0), "str"),
        "last": (lambda c: _string_at(c, -1), "str"),
        "slice": (_string_slice, "str"),
        "to_integer": (lambda c: _as_col(c).cast("long"), "num"),
        "to_float": (lambda c: _as_col(c).cast("double"), "num"),
    },
    "Map": {
        "get": (
            # try_: ANSI element_at throws on a missing map key; Map.get
            # returns the default (nil)
            lambda m, k, d=None: F.try_element_at(_as_col(m), _as_col(k)) if d is None
            else F.coalesce(F.try_element_at(_as_col(m), _as_col(k)), _as_col(d)),
            "str",
        ),
        "has_key": (lambda m, k: F.array_contains(F.map_keys(_as_col(m)), k), "bool"),
        "keys": (lambda m: F.array_sort(F.map_keys(_as_col(m))), "list"),
        "values": (_map_values, "list"),
        "put": (_map_put, "map"),
        "delete": (
            lambda m, k: F.map_filter(
                _as_col(m), lambda mk, mv: ~mk.eqNullSafe(_as_col(k))
            ),
            "map",
        ),
        "merge": (_map_merge, "map"),
        "take": (lambda m, ks: _map_take(m, ks, keep=True), "map"),
        "drop": (lambda m, ks: _map_take(m, ks, keep=False), "map"),
        "size": (lambda m: F.size(_as_col(m)), "num"),
    },
    "Enum": {
        "join": (lambda c, sep="": F.array_join(_as_col(c), sep), "str"),
        "count": (lambda c: F.size(_as_col(c)), "num"),
        "sum": (
            lambda c: F.aggregate(
                _as_col(c), F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            "num",
        ),
        "min": (lambda c: F.array_min(_as_col(c)), "unknown"),
        "max": (lambda c: F.array_max(_as_col(c)), "unknown"),
        "sort": (lambda c: F.array_sort(_as_col(c)), "list"),
        "reverse": (lambda c: F.reverse(_as_col(c)), "list"),
        "uniq": (lambda c: F.array_distinct(_as_col(c)), "list"),
        "member": (lambda c, x: F.array_contains(_as_col(c), x), "bool"),
        "empty": (lambda c: F.size(_as_col(c)) == 0, "bool"),
        "at": (_enum_at, "unknown"),
        "take": (_enum_take, "list"),
        "slice": (
            lambda c, s, n: F.slice(_as_col(c), _lit_int(s, "Enum.slice start") + 1, n),
            "list",
        ),
        "concat": (lambda a, b: F.concat(_to_col(_T(a, "list")) if isinstance(a, list)
                                         else _as_col(a),
                                         _to_col(_T(b, "list")) if isinstance(b, list)
                                         else _as_col(b)), "list"),
    },
    "Date": {
        # date_add requires INT for the day count (to_integer yields bigint)
        "add": (
            lambda c, n: F.date_add(_as_col(c).cast("date"), _as_col(n).cast("int")),
            "unknown",
        ),
        "diff": (
            lambda a, b: F.datediff(_as_col(a).cast("date"), _as_col(b).cast("date")),
            "num",
        ),
        "to_iso8601": (
            lambda c: F.date_format(_as_col(c).cast("date"), "yyyy-MM-dd"), "str"
        ),
        "from_iso8601": (lambda c: _as_col(c).cast("date"), "unknown"),
        # Elixir day_of_week: Monday=1..Sunday=7; Spark dayofweek: Sunday=1
        "day_of_week": (
            lambda c: ((F.dayofweek(_as_col(c).cast("date")) + 5) % 7) + 1, "num"
        ),
        "day_of_year": (lambda c: F.dayofyear(_as_col(c).cast("date")), "num"),
        "quarter_of_year": (lambda c: F.quarter(_as_col(c).cast("date")), "num"),
        "beginning_of_month": (
            lambda c: F.trunc(_as_col(c).cast("date"), "month"), "unknown"
        ),
        "end_of_month": (lambda c: F.last_day(_as_col(c).cast("date")), "unknown"),
        "leap_year": (
            lambda c: ((F.year(_as_col(c).cast("date")) % 4 == 0)
                       & (F.year(_as_col(c).cast("date")) % 100 != 0))
            | (F.year(_as_col(c).cast("date")) % 400 == 0),
            "bool",
        ),
    },
    "DateTime": {
        "to_unix": (lambda c: F.unix_timestamp(_dt_ts(c)), "num"),
        "from_unix": (lambda c: F.timestamp_seconds(_as_col(c)), "unknown"),
        "to_iso8601": (
            lambda c: F.date_format(_dt_ts(c), "yyyy-MM-dd'T'HH:mm:ss'Z'"), "str"
        ),
        "to_date": (lambda c: _dt_ts(c).cast("date"), "unknown"),
        # DateTime.add/2 default unit is :second
        "add": (
            lambda c, n: F.timestamp_seconds(F.unix_timestamp(_dt_ts(c)) + _as_col(n)),
            "unknown",
        ),
        "diff": (
            lambda a, b: F.unix_timestamp(_dt_ts(a)) - F.unix_timestamp(_dt_ts(b)),
            "num",
        ),
    },
    "Integer": {
        "to_string": (_int_to_string, "str"),
        "parse": (lambda c: _as_col(c).cast("long"), "num"),
        "mod": (_int_mod, "num"),
        "floor_div": (_int_floor_div, "num"),
        "pow": (lambda a, b: F.pow(_as_col(a), _as_col(b)).cast("long"), "num"),
    },
    "Base": {
        "encode64": (lambda c: F.base64(_as_col(c).cast("binary")), "str"),
        "decode64": (lambda c: F.unbase64(_as_col(c)).cast("string"), "str"),
        "encode16": (lambda c: F.hex(_as_col(c).cast("binary")), "str"),
        "decode16": (lambda c: F.unhex(_as_col(c)).cast("string"), "str"),
        "url_encode64": (
            lambda c: F.translate(F.base64(_as_col(c).cast("binary")), "+/", "-_"),
            "str",
        ),
        "url_decode64": (
            lambda c: F.unbase64(F.translate(_as_col(c), "-_", "+/")).cast("string"),
            "str",
        ),
    },
    "URI": {
        # URI.encode/1 proper escapes fewer chars than www-form; both map
        # to url_encode here (documented deviation: space → '+')
        "encode": (_w1(F.url_encode), "str"),
        "decode": (_w1(F.url_decode), "str"),
        "encode_www_form": (_w1(F.url_encode), "str"),
        "decode_www_form": (_w1(F.url_decode), "str"),
    },
    "UUID": {
        # nondeterministic — fine for routing/idempotency keys, excluded
        # from oracle-checked queries
        "uuid4": (lambda: F.expr("uuid()"), "str"),
        "uuid3": (_uuid3, "str"),
    },
    "Regex": {
        # Elixir arg order: (pattern, subject); patterns are plain string
        # literals (no ~r sigil in Python syntax)
        "match": (lambda p, s: F.regexp_like(_as_col(s), _as_col(p)), "bool"),
        "replace": (_regex_replace, "str"),
        "run": (
            lambda p, s: F.nullif(F.regexp_extract(_as_col(s), p, 0), F.lit("")),
            "str",
        ),
        "scan": (lambda p, s: F.regexp_extract_all(_as_col(s), F.lit(p), 0), "list"),
        "split": (lambda p, s: F.split(_as_col(s), p), "list"),
    },
    "Decimal": {
        "new": (_decimal, "num"),
        "add": (lambda a, b: _decimal(a) + _decimal(b), "num"),
        "sub": (lambda a, b: _decimal(a) - _decimal(b), "num"),
        "mult": (lambda a, b: _decimal(a) * _decimal(b), "num"),
        "div": (lambda a, b: _decimal(a) / _decimal(b), "num"),
        "round": (lambda c, n=0: F.round(_decimal(c), n), "num"),
        "compare": (_decimal_compare, "str"),
        "to_float": (lambda c: _as_col(c).cast("double"), "num"),
        "to_string": (lambda c: _decimal(c).cast("string"), "str"),
        "negate": (lambda c: -_decimal(c), "num"),
        "abs": (lambda c: F.abs(_decimal(c)), "num"),
        "max": (lambda a, b: F.greatest(_decimal(a), _decimal(b)), "num"),
        "min": (lambda a, b: F.least(_decimal(a), _decimal(b)), "num"),
    },
    "List": {
        "first": (lambda c: F.try_element_at(_as_col(c), F.lit(1)), "unknown"),
        "last": (lambda c: F.try_element_at(_as_col(c), F.lit(-1)), "unknown"),
        "flatten": (lambda c: F.flatten(_as_col(c)), "list"),
        "duplicate": (lambda x, n: F.array_repeat(_as_col(x), n), "list"),
    },
    "JSON": {
        "encode": (lambda c: F.to_json(_as_col(c)), "str"),
        "decode": (
            lambda c: F.from_json(_as_col(c), "map<string,string>"), "map"
        ),
    },
}
# NaiveDateTime shares DateTime's deterministic subset (validator.ex:308-309)
_MODULES["NaiveDateTime"] = _MODULES["DateTime"]
# Kernel.* function-call form aliases the builtin surface
# (validator.ex @kernel_functions)
_MODULES["Kernel"] = {
    k: _FUNCTIONS[k]
    for k in ("div", "rem", "trunc", "abs", "min", "max", "byte_size", "length")
}
_MODULES["Kernel"]["to_string"] = (lambda c: _as_col(c).cast("string"), "str")

# Pythonic method-call forms (s.upper(), record.get('k'), sep.join(xs),
# xs.sort() …): each dispatches to the SAME compile target as its
# module-call twin (String./Map./Enum.), so the sandbox surface does not
# grow — an unknown method name is rejected exactly like an unknown
# module function. `join` flips Python's receiver order (sep.join(xs))
# into Enum.join(xs, sep).
_METHODS: dict = {
    "upper": _MODULES["String"]["upcase"],
    "lower": _MODULES["String"]["downcase"],
    "strip": _MODULES["String"]["trim"],
    "lstrip": _MODULES["String"]["trim_leading"],
    "rstrip": _MODULES["String"]["trim_trailing"],
    "capitalize": _MODULES["String"]["capitalize"],
    "startswith": _MODULES["String"]["starts_with"],
    "endswith": _MODULES["String"]["ends_with"],
    "replace": _MODULES["String"]["replace"],
    "split": _MODULES["String"]["split"],
    "get": _MODULES["Map"]["get"],
    "keys": _MODULES["Map"]["keys"],
    "values": _MODULES["Map"]["values"],
    "join": (
        lambda sep, lst: _MODULES["Enum"]["join"][0](lst, sep),
        _MODULES["Enum"]["join"][1],
    ),
}


_BANNED_MSG = "MiniPy: {} is not allowed (sandbox allowlist, see minielixir/validator.ex parity)"


def _as_col(x) -> Column:
    if isinstance(x, Column):
        return x
    if isinstance(x, (list, tuple)):
        # MiniPy list literal (list of compiled _T) → Catalyst array
        return F.array(
            *[_to_col(e) if isinstance(e, _T) else F.lit(e) for e in x]
        )
    return F.lit(x)


class _T:
    """Compiled value + inferred kind ('str'|'num'|'bool'|'map'|'list'|'unknown')."""

    __slots__ = ("val", "kind")

    def __init__(self, val, kind):
        self.val = val
        self.kind = kind


def _kind_of_literal(v) -> str:
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, (int, float)):
        return "num"
    if isinstance(v, str):
        return "str"
    return "unknown"


def _to_col(t: _T) -> Column:
    """Materialize a compiled value as a Column (python lists of compiled
    elements become Catalyst array literals)."""
    if isinstance(t.val, list):
        return F.array(
            *[_to_col(e) if isinstance(e, _T) else _as_col(e) for e in t.val]
        )
    return _as_col(t.val)


class _Compiler(ast.NodeVisitor):
    def __init__(self):
        self.env: dict = {}  # local bindings: name -> _T

    def compile(self, expr_src: str) -> Column:
        tree = ast.parse(expr_src, mode="eval")
        return _as_col(self.visit(tree.body).val)

    def compile_program(self, src: str) -> Column:
        """Compile a MiniPy PROGRAM: either a bare statement body or a
        single ``def transform|filter|route(action, record, changes,
        metadata)``. Statements allowed: local assignment, if/elif/else
        (each terminal branch must ``return``), ``match`` on constants
        (MiniElixir ``case`` parity, validator.ex:75-236), ``return``.
        Control flow compiles to nested F.when chains — the whole
        program is still one Catalyst expression, never per-row Python.
        """
        try:
            tree = ast.parse(src)
        except SyntaxError:
            # bare statement bodies use `return` at top level (invalid as
            # a Python module) — re-parse wrapped in the canonical def
            indented = "\n".join("    " + ln for ln in src.splitlines())
            tree = ast.parse(
                "def transform(action, record, changes, metadata):\n" + indented
            )
        stmts = tree.body
        if len(stmts) == 1 and isinstance(stmts[0], ast.FunctionDef):
            fd = stmts[0]
            if fd.name not in ("transform", "filter", "route"):
                raise ValueError(_BANNED_MSG.format(f"def {fd.name!r}"))
            argnames = [a.arg for a in fd.args.args]
            if argnames != ["action", "record", "changes", "metadata"]:
                raise ValueError(
                    "MiniPy: signature must be (action, record, changes, metadata)"
                )
            if fd.args.kwonlyargs or fd.args.vararg or fd.args.kwarg or fd.decorator_list:
                raise ValueError(_BANNED_MSG.format("function extras"))
            stmts = fd.body
        out = self._block(stmts)
        if out is None:
            raise ValueError("MiniPy: program must return a value on every path")
        return _to_col(out)

    def _block(self, stmts) -> "_T | None":
        """Compile a statement list; returns the block's value or None
        if the block falls through without returning."""
        for i, st in enumerate(stmts):
            if isinstance(st, ast.Assign):
                if len(st.targets) == 1 and isinstance(st.targets[0], ast.Tuple):
                    # a, b = e1, e2 — parallel (all RHS evaluated first)
                    tgt, val = st.targets[0], st.value
                    if not (
                        isinstance(val, ast.Tuple)
                        and len(val.elts) == len(tgt.elts)
                        and all(isinstance(t, ast.Name) for t in tgt.elts)
                    ):
                        raise ValueError(_BANNED_MSG.format("destructuring assignment"))
                    vals = [self.visit(v) for v in val.elts]
                    for t, v in zip(tgt.elts, vals):
                        if t.id in _ARG_NAMES:
                            raise ValueError(f"MiniPy: can't assign to argument: {t.id}")
                        self.env[t.id] = v
                    continue
                if len(st.targets) != 1 or not isinstance(st.targets[0], ast.Name):
                    raise ValueError(_BANNED_MSG.format("destructuring assignment"))
                name = st.targets[0].id
                if name in _ARG_NAMES:
                    # validator.ex parity: "can't assign to argument"
                    raise ValueError(f"MiniPy: can't assign to argument: {name}")
                self.env[name] = self.visit(st.value)
                continue
            if isinstance(st, ast.AugAssign):
                # x += e desugars to x = x <op> e (same operator table)
                if not isinstance(st.target, ast.Name):
                    raise ValueError(_BANNED_MSG.format("augmented assignment target"))
                name = st.target.id
                if name in _ARG_NAMES:
                    raise ValueError(f"MiniPy: can't assign to argument: {name}")
                binop = ast.copy_location(
                    ast.BinOp(
                        left=ast.copy_location(ast.Name(id=name, ctx=ast.Load()), st),
                        op=st.op,
                        right=st.value,
                    ),
                    st,
                )
                self.env[name] = self.visit(binop)
                continue
            if isinstance(st, ast.Return):
                if st.value is None:
                    raise ValueError("MiniPy: bare return is not allowed")
                return self.visit(st.value)
            if isinstance(st, ast.If):
                cond = _as_col(self.visit(st.test).val)
                saved = dict(self.env)
                body_val = self._block(st.body)
                self.env = dict(saved)
                else_val = self._block(st.orelse) if st.orelse else None
                self.env = dict(saved)
                if body_val is None:
                    raise ValueError(
                        "MiniPy: if-branches must end in return "
                        "(conditional assignment: use `x = a if c else b`)"
                    )
                if else_val is not None:
                    if i + 1 != len(stmts):
                        raise ValueError("MiniPy: unreachable code after if/else")
                    kind = body_val.kind if body_val.kind == else_val.kind else "unknown"
                    return _T(
                        F.when(cond, _to_col(body_val)).otherwise(_to_col(else_val)),
                        kind,
                    )
                rest = self._block(stmts[i + 1:])
                if rest is None:
                    raise ValueError("MiniPy: program must return a value on every path")
                kind = body_val.kind if body_val.kind == rest.kind else "unknown"
                return _T(
                    F.when(cond, _to_col(body_val)).otherwise(_to_col(rest)), kind
                )
            if isinstance(st, ast.Match):
                if i + 1 != len(stmts):
                    raise ValueError("MiniPy: match must be the last statement")
                return self._match(st)
            raise ValueError(_BANNED_MSG.format(f"statement {type(st).__name__}"))
        return None

    def _match(self, st: "ast.Match") -> _T:
        """``match subj: case <const>: ... case _: ...`` → F.when chain
        (MiniElixir `case` parity; guards via `case <const> if cond:`)."""
        subj = self.visit(st.subject)
        sc = _as_col(subj.val)
        chain = None
        default = None
        for case in st.cases:
            pat = case.pattern
            if isinstance(pat, ast.MatchAs) and pat.pattern is None:  # case _ / case x
                if case.guard is not None:
                    raise ValueError(_BANNED_MSG.format("guard on wildcard case"))
                saved = dict(self.env)
                if pat.name:
                    self.env[pat.name] = subj
                default = self._block(case.body)
                self.env = dict(saved)
                if default is None:
                    raise ValueError("MiniPy: case bodies must return")
                break
            if not (
                isinstance(pat, ast.MatchValue) and isinstance(pat.value, ast.Constant)
            ):
                raise ValueError(_BANNED_MSG.format("non-constant match pattern"))
            cond = sc.eqNullSafe(F.lit(pat.value.value))
            if case.guard is not None:
                cond = cond & _as_col(self.visit(case.guard).val)
            val = self._block(case.body)
            if val is None:
                raise ValueError("MiniPy: case bodies must return")
            chain = (
                F.when(cond, _to_col(val))
                if chain is None
                else chain.when(cond, _to_col(val))
            )
        if chain is None:  # only a wildcard arm
            return default if default is not None else _T(None, "unknown")
        if default is not None:
            return _T(chain.otherwise(_to_col(default)), "unknown")
        return _T(chain, "unknown")  # unmatched → NULL (Elixir raises; doc'd deviation)

    # --- literals & names -------------------------------------------------
    def visit_Constant(self, node):
        if node.value is None or isinstance(node.value, (int, float, str, bool)):
            return _T(node.value, _kind_of_literal(node.value))
        raise ValueError(_BANNED_MSG.format(f"literal {type(node.value).__name__}"))

    def visit_Name(self, node):
        if node.id in self.env:
            return self.env[node.id]
        if node.id == "action":
            return _T(F.col("action"), "str")
        if node.id in _ARG_NAMES:
            return _T(F.col(node.id), "map")
        raise ValueError(_BANNED_MSG.format(f"name {node.id!r}"))

    def visit_Dict(self, node):
        # dict literal → struct column (heterogeneous value types stay
        # typed; MiniElixir map-building %{...} parity)
        fields = []
        for k, v in zip(node.keys, node.values):
            if not (isinstance(k, ast.Constant) and isinstance(k.value, str)):
                raise ValueError(_BANNED_MSG.format("non-string dict key"))
            fields.append(_to_col(self.visit(v)).alias(k.value))
        return _T(F.struct(*fields), "struct")

    def _comprehension(self, node):
        """Shared machinery for list comprehensions and generator
        expressions: returns (filtered source Column, with_var binder)."""
        if len(node.generators) != 1:
            raise ValueError(_BANNED_MSG.format("multiple comprehension generators"))
        gen = node.generators[0]
        if gen.is_async or not isinstance(gen.target, ast.Name):
            raise ValueError(_BANNED_MSG.format("comprehension target"))
        var = gen.target.id
        if var in _ARG_NAMES:
            raise ValueError(f"MiniPy: can't assign to argument: {var}")
        it = self.visit(gen.iter)
        if it.kind == "map":
            raise ValueError(
                _BANNED_MSG.format("iterating a map; iterate keys(m) or split(...)")
            )
        src = _as_col(it.val)

        def _with_var(x: Column, compile_fn):
            saved = self.env.get(var)
            self.env[var] = _T(x, "unknown")
            try:
                return compile_fn()
            finally:
                if saved is None:
                    self.env.pop(var, None)
                else:
                    self.env[var] = saved

        def _mk_pred(cond_node):
            # NB: a plain 1-arg lambda — pyspark dispatches 2-arg HOF
            # lambdas as (element, index), so no default-arg binding here
            return lambda x: _with_var(x, lambda: _as_col(self.visit(cond_node).val))

        for cond_node in gen.ifs:
            src = F.filter(src, _mk_pred(cond_node))
        return src, _with_var

    def visit_ListComp(self, node):
        # [f(x) for x in xs if p(x)] → F.filter + F.transform HOFs
        # (Enum.map / Enum.filter parity) — stays inside Catalyst
        src, with_var = self._comprehension(node)
        out = F.transform(
            src, lambda x: with_var(x, lambda: _to_col(self.visit(node.elt)))
        )
        return _T(out, "list")

    def visit_Subscript(self, node):
        base = self.visit(node.value)
        if not isinstance(base.val, Column):
            raise ValueError(_BANNED_MSG.format("subscript of non-column"))
        key = self.visit(node.slice).val
        # record/changes are map<string,string> → lookups yield strings
        return _T(base.val.getItem(key), "str" if base.kind == "map" else "unknown")

    def visit_Attribute(self, node):
        # validator.ex:264-271 — record access must use record["k"], not record.k
        raise ValueError(_BANNED_MSG.format("attribute access; use subscript record['k']"))

    # --- operators --------------------------------------------------------
    def visit_BinOp(self, node):
        left, right = self.visit(node.left), self.visit(node.right)
        op = type(node.op)
        if op is ast.Add:
            # string-ish on either side → concat (MiniElixir `<>`)
            if "str" in (left.kind, right.kind):
                return _T(F.concat(_as_col(left.val), _as_col(right.val)), "str")
            return _T(_as_col(left.val) + _as_col(right.val), "num")
        lv, rv = _as_col(left.val), _as_col(right.val)
        if op is ast.Sub:
            return _T(lv - rv, "num")
        if op is ast.Mult:
            return _T(lv * rv, "num")
        if op is ast.Div:
            return _T(lv / rv, "num")
        if op is ast.Mod:
            return _T(lv % rv, "num")
        if op is ast.Pow:
            return _T(F.pow(lv, rv), "num")
        raise ValueError(_BANNED_MSG.format(f"operator {op.__name__}"))

    def visit_UnaryOp(self, node):
        v = self.visit(node.operand)
        if isinstance(node.op, ast.Not):
            return _T(~_as_col(v.val), "bool")
        if isinstance(node.op, ast.USub):
            # constant-fold -<number> so negative literals stay literals
            # (String.at(s, -1), Enum.take(xs, -2) need compile-time ints)
            if isinstance(v.val, (int, float)) and not isinstance(v.val, bool):
                return _T(-v.val, "num")
            return _T(-_as_col(v.val), "num")
        raise ValueError(_BANNED_MSG.format(f"unary {type(node.op).__name__}"))

    def visit_BoolOp(self, node):
        vals = [_as_col(self.visit(v).val) for v in node.values]
        out = vals[0]
        for v in vals[1:]:
            out = (out & v) if isinstance(node.op, ast.And) else (out | v)
        return _T(out, "bool")

    def visit_Compare(self, node):
        # chained comparisons (a < b < c) desugar to pairwise ANDs —
        # Python semantics; each operand is compiled once
        operands = [self.visit(n) for n in [node.left, *node.comparators]]
        out = None
        for i, op_node in enumerate(node.ops):
            pair = self._one_compare(operands[i], type(op_node), operands[i + 1])
            out = pair if out is None else _T(out.val & pair.val, "bool")
        return out

    def _one_compare(self, left, op, right):
        lc = _as_col(left.val)
        rv = right.val
        # Eq/NotEq are NULL-SAFE (eqNullSafe): MiniElixir's nil == "x" is
        # false and nil != "x" is true — Spark's null-poisoned =/!= would
        # instead drop rows where record['k'] is absent (validator parity,
        # see also operators/changes.py's null-safe diff)
        if op is ast.Eq:
            return _T(lc.eqNullSafe(_as_col(rv)), "bool")
        if op is ast.NotEq:
            return _T(~lc.eqNullSafe(_as_col(rv)), "bool")
        if op is ast.Gt:
            return _T(lc > rv, "bool")
        if op is ast.GtE:
            return _T(lc >= rv, "bool")
        if op is ast.Lt:
            return _T(lc < rv, "bool")
        if op is ast.LtE:
            return _T(lc <= rv, "bool")
        if op is ast.In:
            if isinstance(rv, (list, tuple)):
                return _T(lc.isin([x.val if isinstance(x, _T) else x for x in rv]), "bool")
            return _T(_as_col(rv).contains(lc), "bool")
        if op is ast.NotIn:
            if isinstance(rv, (list, tuple)):
                return _T(~lc.isin([x.val if isinstance(x, _T) else x for x in rv]), "bool")
            return _T(~_as_col(rv).contains(lc), "bool")
        raise ValueError(_BANNED_MSG.format(f"comparison {op.__name__}"))

    def visit_IfExp(self, node):
        cond = _as_col(self.visit(node.test).val)
        body, orelse = self.visit(node.body), self.visit(node.orelse)
        kind = body.kind if body.kind == orelse.kind else "unknown"
        return _T(F.when(cond, _as_col(body.val)).otherwise(_as_col(orelse.val)), kind)

    def visit_List(self, node):
        return _T([self.visit(e) for e in node.elts], "list")

    visit_Tuple = visit_List

    def visit_Call(self, node):
        if isinstance(node.func, ast.Attribute):
            # Module-call surface: String.upcase(x), Map.get(record, 'k'),
            # Base.encode64(s), ... (validator.ex:301-319 fnok allowlist).
            base = node.func.value
            if isinstance(base, ast.Name) and base.id in _MODULES:
                entry = _MODULES[base.id].get(node.func.attr)
                if entry is None:
                    raise ValueError(
                        _BANNED_MSG.format(f"{base.id}.{node.func.attr}")
                    )
                if node.keywords:
                    raise ValueError(_BANNED_MSG.format("keyword arguments"))
                fn, kind = entry
                args = [self.visit(a).val for a in node.args]
                try:
                    return _T(fn(*args), kind)
                except TypeError as e:  # arity mismatch → validation error
                    raise ValueError(
                        f"MiniPy: bad call {base.id}.{node.func.attr}: {e}"
                    ) from e
            # Pythonic method-call form: receiver becomes the first arg
            # of the module-twin target (unknown names still rejected)
            entry = _METHODS.get(node.func.attr)
            if entry is None:
                raise ValueError(
                    _BANNED_MSG.format(f"method .{node.func.attr}()")
                )
            if node.keywords:
                raise ValueError(_BANNED_MSG.format("keyword arguments"))
            fn, kind = entry
            args = [self.visit(base).val] + [self.visit(a).val for a in node.args]
            try:
                return _T(fn(*args), kind)
            except TypeError as e:
                raise ValueError(
                    f"MiniPy: bad call .{node.func.attr}: {e}"
                ) from e
        if not isinstance(node.func, ast.Name):
            raise ValueError(_BANNED_MSG.format("method calls"))
        fname = node.func.id
        if fname in ("any", "all") and not node.keywords and len(node.args) == 1:
            # Enum.any?/all? parity (validator.ex @enum_functions):
            # any(p(x) for x in xs if q(x)) → F.exists / F.forall HOFs;
            # any(<list expr>) tests the booleans themselves
            hof = F.exists if fname == "any" else F.forall
            arg = node.args[0]
            if isinstance(arg, ast.GeneratorExp):
                src, with_var = self._comprehension(arg)
                out = hof(
                    src, lambda x: with_var(x, lambda: _as_col(self.visit(arg.elt).val))
                )
                return _T(out, "bool")
            return _T(hof(_as_col(self.visit(arg).val), lambda x: x), "bool")
        entry = _FUNCTIONS.get(fname)
        if entry is None:
            raise ValueError(_BANNED_MSG.format(f"function {fname!r}"))
        if node.keywords:
            raise ValueError(_BANNED_MSG.format("keyword arguments"))
        fn, kind = entry
        args = [self.visit(a).val for a in node.args]
        return _T(fn(*args), kind)

    def visit_JoinedStr(self, node):
        parts = []
        for v in node.values:
            if isinstance(v, ast.FormattedValue):
                parts.append(_as_col(self.visit(v.value).val).cast("string"))
            else:
                parts.append(F.lit(v.value))
        return _T(F.concat(*parts), "str")

    def generic_visit(self, node):
        raise ValueError(_BANNED_MSG.format(type(node).__name__))


def compile_expr(expr_src: str) -> Column:
    """Compile a MiniPy expression into a Catalyst Column.

    >>> compile_expr("record['house'] == 'Stark'")       # filter function
    >>> compile_expr("upper(record['name']) + '!'")      # transform
    >>> compile_expr("'shard-' + str(int(record['id']) % 4)")  # routing
    """
    return _Compiler().compile(expr_src)


def compile_program(src: str) -> Column:
    """Compile a MiniPy PROGRAM (statement body or a full ``def
    transform/filter/route(action, record, changes, metadata)``) into
    ONE Catalyst Column — local bindings inline, if/elif/else and
    ``match`` become F.when chains, dict literals become structs, list
    comprehensions become transform/filter higher-order functions.

    This is the MiniElixir-depth surface (case/cond, Map/Enum with
    lambdas — validator.ex:75-236) on the compiled fast path; only
    genuinely imperative code (loops with data-dependent trip counts,
    accumulation) needs the sandbox_pandas_udf escape hatch.

    >>> compile_program('''
    ... status = 'vip' if int(record['bal']) > 1000 else 'std'
    ... if action == 'delete':
    ...     return {'id': record['id'], 'tag': 'gone'}
    ... return {'id': record['id'], 'tag': status}
    ... ''')
    """
    return _Compiler().compile_program(src)


def validate(expr_src: str) -> tuple[bool, str | None]:
    """Validate without building a plan — mirrors Consumers.validate_code.
    Accepts both single expressions and statement programs."""
    try:
        try:
            compile_expr(expr_src)
        except SyntaxError:
            compile_program(expr_src)
        return True, None
    except (ValueError, SyntaxError, TypeError) as e:
        return False, str(e)


def sandbox_pandas_udf(fn_src: str, return_type: str = "string"):
    """Escape hatch: run restricted Python per Arrow batch (slow path).

    The function body must define ``def transform(action, record, changes,
    metadata)``. Executed with restricted builtins — no imports, no IO —
    mirroring the reference's sandboxed interpreter (minielixir.ex:19-52).
    Use only when compile_expr can't express the logic; this moves the
    operator out of whole-stage codegen into Arrow-batched Python.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    safe_builtins = {
        "abs": abs, "min": min, "max": max, "len": len, "round": round,
        "str": str, "int": int, "float": float, "bool": bool, "sum": sum,
        "sorted": sorted, "enumerate": enumerate, "zip": zip, "range": range,
        "any": any, "all": all, "isinstance": isinstance, "dict": dict,
        "list": list, "tuple": tuple, "set": set, "ValueError": ValueError,
    }
    ns: dict = {"__builtins__": safe_builtins}
    tree = ast.parse(fn_src)
    for stmt in tree.body:
        if not isinstance(stmt, (ast.FunctionDef,)):
            raise ValueError("sandbox: only function definitions allowed at top level")
        if stmt.name not in ("transform", "filter", "route"):
            raise ValueError("sandbox: function must be transform/filter/route")
    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom, ast.Global, ast.Nonlocal)):
            raise ValueError("sandbox: imports/global not allowed")
        if isinstance(node, ast.Attribute) and node.attr.startswith("__"):
            raise ValueError("sandbox: dunder access not allowed")
        if isinstance(node, ast.Name) and node.id.startswith("__"):
            raise ValueError("sandbox: dunder access not allowed")
    exec(compile(tree, "<minipy-sandbox>", "exec"), ns)  # noqa: S102 — validated AST
    user_fn = ns.get("transform") or ns.get("filter") or ns.get("route")

    def _fn(action, record, changes, metadata):
        out = []
        for a, r, c, m in zip(action, record, changes, metadata):
            out.append(user_fn(a, r, c, m))
        return pd.Series(out)

    # real (non-string) annotations: `from __future__ import annotations`
    # would stringify inline hints and break pandas_udf inference
    _fn.__annotations__ = {
        "action": pd.Series, "record": pd.Series, "changes": pd.Series,
        "metadata": pd.Series, "return": pd.Series,
    }
    return pandas_udf(_fn, return_type)
