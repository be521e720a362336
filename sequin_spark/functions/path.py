"""Path functions — dotted-path projection into the event payload.

Reference: lib/sequin/consumers/path_function.ex:25-70. Valid roots are
``record`` / ``changes`` / ``action`` / ``metadata``; traversal into maps
and JSON; lists unsupported (→ null); missing keys → null.

Spark mapping: chained map access / ``get_json_object`` — nulls propagate
identically (map lookup of a missing key is null, and any further step on
null is null).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ROOTS = ("record", "changes", "action", "metadata")

# metadata subfields that hold JSON strings → traverse with get_json_object
_JSON_LEAVES = {"transaction_annotations"}


def path_function(path: str) -> Column:
    """Compile ``"record.id"`` / ``"metadata.transaction_annotations.user_id"``
    into a Column. Raises ValueError on invalid roots (path_function.ex:25-37)."""
    parts = path.split(".")
    root = parts[0]
    if root not in ROOTS:
        raise ValueError(f"path must start with one of {ROOTS}, got {root!r}")
    col: Column = F.col(root)
    if root == "action":
        if len(parts) > 1:
            raise ValueError("action has no subfields")
        return col
    i = 1
    while i < len(parts):
        key = parts[i]
        if root == "metadata":
            col = col.getField(key) if i == 1 else col.getItem(key)
            if key in _JSON_LEAVES and i + 1 < len(parts):
                # remaining path traverses a JSON string
                rest = ".".join(parts[i + 1 :])
                return F.get_json_object(col, "$." + rest)
        else:
            # record/changes are map<string,string>; one map hop, then JSON
            if i == 1:
                col = col.getItem(key)
            else:
                rest = ".".join(parts[i:])
                return F.get_json_object(col, "$." + rest)
        i += 1
    return col
