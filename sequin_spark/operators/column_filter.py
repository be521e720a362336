"""Column filters — the reference's per-table predicate language.

Reference: lib/sequin/replication/source_table/column_filter.ex (operator
set ``== != > < >= <= in not_in is_null not_null``) evaluated at
lib/sequin/consumers/consumers.ex:1284-1369 with:

- ``jsonb_path`` dotted traversal into JSON columns (1300-1310)
- ci-string comparisons lowercase both sides (1294-1296)
- delete events evaluate against the pre-image (``old_fields``/changes)
- date→datetime promotion for datetime comparisons

Everything compiles to a single Catalyst predicate over the canonical
event columns: ``record[col]`` map access (or ``get_json_object`` for
jsonb paths) + a typed cast, so the whole filter participates in
whole-stage codegen and (for top-level columns) pushdown.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OPERATORS = {"==", "!=", ">", "<", ">=", "<=", "in", "not_in", "is_null", "not_null"}

# value_type → Spark cast target for typed comparison (ValueCaster parity,
# lib/sequin/postgres/value_caster.ex:83-147)
_CASTS = {
    "string": "string",
    "cistring": "string",
    "number": "double",
    "integer": "long",
    "boolean": "boolean",
    "datetime": "timestamp",
    "null": "string",
}


@dataclass(frozen=True)
class ColumnFilter:
    column: str
    operator: str
    value: object = None
    value_type: str = "string"  # string|cistring|number|integer|boolean|datetime|list|null
    jsonb_path: str | None = None  # dotted path inside a JSON column

    def __post_init__(self):
        if self.operator not in OPERATORS:
            raise ValueError(f"unknown operator {self.operator!r}; allowed: {sorted(OPERATORS)}")

    def _operand(self, record_col: str) -> Column:
        raw = F.col(record_col).getItem(self.column)
        if self.jsonb_path:
            raw = F.get_json_object(raw, "$." + self.jsonb_path)
        if self.value_type == "cistring":
            return F.lower(raw)
        cast_to = _CASTS.get(self.value_type)
        if cast_to and cast_to != "string":
            return raw.cast(cast_to)
        return raw

    def _value_lit(self):
        if self.value_type == "cistring":
            if isinstance(self.value, list):
                return [str(v).lower() for v in self.value]
            return str(self.value).lower()
        return self.value

    def predicate(self, record_col: str = "record") -> Column:
        lhs = self._operand(record_col)
        op = self.operator
        if op == "is_null":
            return lhs.isNull()
        if op == "not_null":
            return lhs.isNotNull()
        val = self._value_lit()
        if op == "in":
            return lhs.isin(list(val))
        if op == "not_in":
            # reference semantics: NULL fails both in and not_in membership
            return lhs.isNotNull() & ~lhs.isin(list(val))
        rhs = F.lit(val)
        if self.value_type == "datetime":
            rhs = rhs.cast("timestamp")
        return {
            "==": lhs == rhs,
            "!=": lhs != rhs,
            ">": lhs > rhs,
            "<": lhs < rhs,
            ">=": lhs >= rhs,
            "<=": lhs <= rhs,
        }[op]


def apply_column_filters(df: DataFrame, filters: list[ColumnFilter]) -> DataFrame:
    """AND of all filters (consumers.ex:1284 — every filter must match).

    Delete events compare against the pre-image: for deletes the
    reference substitutes old_fields; our canonical stream carries the
    full pre-image in ``record`` for deletes already (eventize contract),
    so no branch is needed here.
    """
    pred = F.lit(True)
    for flt in filters:
        pred = pred & flt.predicate()
    return df.filter(pred)
