"""MiniPy — sandboxed expression DSL compiled to Spark SQL Columns.

The reference's UDF surface is "MiniElixir": a single pure function body
over (action, record, changes, metadata), AST-validated against an
allowlist, no atom creation / module definition / IO
(lib/sequin/functions/minielixir.ex, minielixir/validator.ex). Its
allowlist is deliberately ≈ "pure expression over a JSON row".

MiniPy is the Spark-native equivalent: a *Python expression* (not
statements) over the names ``action, record, changes, metadata``,
AST-validated against an allowlist and compiled to a Catalyst Column —
so user functions run JVM-side inside whole-stage codegen, never as
row-at-a-time Python. This is the fast path; genuinely imperative user
code escapes to a Pandas UDF (see sandbox_pandas_udf below), the slow
path, mirroring the reference's compiled-vs-interpreted split
(minielixir.ex:54-84).

Allowed surface (validator parity, minielixir/validator.ex:75-236):
  - arithmetic + - * / % **, comparisons, boolean and/or/not, in
  - conditional expressions ``a if cond else b``
  - subscript access record["k"], changes["k"] (dot syntax rejected,
    validator.ex:264-271)
  - string concat via +, f-strings
  - calls to allowlisted functions (str/date/math — mapped to Spark SQL
    built-ins, validator.ex:123-172,301-319)
"""

from __future__ import annotations

import ast

from pyspark.sql import Column
from pyspark.sql import functions as F

_ARG_NAMES = {"action", "record", "changes", "metadata"}

# name → (spark function, result kind). Kinds drive `+` dispatch:
# string + string → concat (MiniElixir `<>`), numeric + numeric → plus.
_FUNCTIONS = {
    "upper": (F.upper, "str"),
    "lower": (F.lower, "str"),
    "length": (F.length, "num"),
    "trim": (F.trim, "str"),
    "abs": (F.abs, "num"),
    "round": (F.round, "num"),
    "ceil": (F.ceil, "num"),
    "floor": (F.floor, "num"),
    "concat": (F.concat, "str"),
    "coalesce": (F.coalesce, "unknown"),
    "substring": (F.substring, "str"),
    "replace": (lambda c, a, b: F.regexp_replace(c, F.lit(a), F.lit(b)), "str"),
    "split": (lambda c, sep: F.split(c, sep), "list"),
    "to_date": (F.to_date, "unknown"),
    "to_timestamp": (F.to_timestamp, "unknown"),
    "date_format": (F.date_format, "str"),
    "year": (F.year, "num"),
    "month": (F.month, "num"),
    "day": (F.dayofmonth, "num"),
    "md5": (F.md5, "str"),
    "sha256": (F.sha2, "str"),
    "greatest": (F.greatest, "unknown"),
    "least": (F.least, "unknown"),
    "int": (lambda c: _as_col(c).cast("long"), "num"),
    "float": (lambda c: _as_col(c).cast("double"), "num"),
    "str": (lambda c: _as_col(c).cast("string"), "str"),
    "bool": (lambda c: _as_col(c).cast("boolean"), "bool"),
    "starts_with": (lambda c, p: _as_col(c).startswith(p), "bool"),
    "ends_with": (lambda c, p: _as_col(c).endswith(p), "bool"),
    "contains": (lambda c, p: _as_col(c).contains(p), "bool"),
    "get_json": (lambda c, p: F.get_json_object(_as_col(c), p), "str"),
    "is_null": (lambda c: _as_col(c).isNull(), "bool"),
    # Kernel parity (validator.ex @kernel_functions): div/rem/trunc/min/max/byte_size
    "div": (lambda a, b: (_as_col(a).cast("long") - (_as_col(a).cast("long") % _as_col(b))) / _as_col(b), "num"),
    "rem": (lambda a, b: _as_col(a) % _as_col(b), "num"),
    "trunc": (lambda c: _as_col(c).cast("long"), "num"),
    "min": (lambda *cs: F.least(*[_as_col(c) for c in cs]), "unknown"),
    "max": (lambda *cs: F.greatest(*[_as_col(c) for c in cs]), "unknown"),
    "byte_size": (lambda c: F.octet_length(_as_col(c)), "num"),
    "len": (F.length, "num"),
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
    "hour": (F.hour, "num"),
    "minute": (F.minute, "num"),
    "second": (F.second, "num"),
    # Map module parity over the record/changes maps
    "keys": (lambda c: F.array_sort(F.map_keys(_as_col(c))), "list"),
    "has_key": (lambda c, k: F.array_contains(F.map_keys(_as_col(c)), k), "bool"),
    "join": (lambda c, sep: F.array_join(_as_col(c), sep), "str"),
}

_BANNED_MSG = "MiniPy: {} is not allowed (sandbox allowlist, see minielixir/validator.ex parity)"


def _as_col(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


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


class _Compiler(ast.NodeVisitor):
    def compile(self, expr_src: str) -> Column:
        tree = ast.parse(expr_src, mode="eval")
        return _as_col(self.visit(tree.body).val)

    # --- literals & names -------------------------------------------------
    def visit_Constant(self, node):
        if node.value is None or isinstance(node.value, (int, float, str, bool)):
            return _T(node.value, _kind_of_literal(node.value))
        raise ValueError(_BANNED_MSG.format(f"literal {type(node.value).__name__}"))

    def visit_Name(self, node):
        if node.id == "action":
            return _T(F.col("action"), "str")
        if node.id in _ARG_NAMES:
            return _T(F.col(node.id), "map")
        raise ValueError(_BANNED_MSG.format(f"name {node.id!r}"))

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
            return _T(-_as_col(v.val), "num")
        raise ValueError(_BANNED_MSG.format(f"unary {type(node.op).__name__}"))

    def visit_BoolOp(self, node):
        vals = [_as_col(self.visit(v).val) for v in node.values]
        out = vals[0]
        for v in vals[1:]:
            out = (out & v) if isinstance(node.op, ast.And) else (out | v)
        return _T(out, "bool")

    def visit_Compare(self, node):
        if len(node.ops) != 1:
            raise ValueError(_BANNED_MSG.format("chained comparisons"))
        left = self.visit(node.left)
        right = self.visit(node.comparators[0])
        op = type(node.ops[0])
        lc = _as_col(left.val)
        rv = right.val
        if op is ast.Eq:
            return _T(lc == rv, "bool")
        if op is ast.NotEq:
            return _T(lc != rv, "bool")
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
        if not isinstance(node.func, ast.Name):
            raise ValueError(_BANNED_MSG.format("method calls"))
        fname = node.func.id
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


def validate(expr_src: str) -> tuple[bool, str | None]:
    """Validate without building a plan — mirrors Consumers.validate_code."""
    try:
        compile_expr(expr_src)
        return True, None
    except (ValueError, SyntaxError) as e:
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
