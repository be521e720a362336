"""Changes (diff) computation and TOAST backfill.

Reference semantics:

- ``changes`` for an update = {col: old_value for old cols whose new value
  differs and isn't an unchanged TOAST marker}; insert/delete → null;
  update without replica-identity-full → {}  (consumers.ex:661-676).
- TOAST fill: replace ``unchanged_toast`` markers in the new row with the
  old row's value (message_handler.ex:309-361).

Both are map higher-order functions — pure Catalyst, no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UNCHANGED_TOAST = "__unchanged_toast__"


def changes_expr(new_map: str = "record", old_map: str = "old_record") -> Column:
    """map_filter over the old row: keep entries whose new value differs.

    consumers.ex:661-676: skips keys whose new value == old value and
    keys whose new value is the unchanged-TOAST marker. Comparisons are
    null-safe — a column UPDATEd to NULL (new value null, old value set)
    IS a change and must appear; plain ``!=`` would null-poison it away.
    """
    return F.map_filter(
        F.col(old_map),
        lambda k, v: ~F.col(new_map).getItem(k).eqNullSafe(v)
        & ~F.col(new_map).getItem(k).eqNullSafe(F.lit(UNCHANGED_TOAST)),
    )


def compute_changes(df: DataFrame, new_map: str = "record", old_map: str = "old_record") -> DataFrame:
    """Attach ``changes`` per the reference action semantics."""
    return df.withColumn(
        "changes",
        F.when(F.col("action") == "update", changes_expr(new_map, old_map)).otherwise(
            F.lit(None).cast("map<string,string>")
        ),
    )


def toast_filled_expr(new_map: str = "record", old_map: str = "old_record") -> Column:
    """Replace unchanged-TOAST markers with the pre-image value
    (message_handler.ex:309-353). Keys missing from the old row keep the
    marker (reference logs a warning; we propagate as-is)."""
    return F.transform_values(
        F.col(new_map),
        lambda k, v: F.when(
            (v == UNCHANGED_TOAST) & F.col(old_map).getItem(k).isNotNull(),
            F.col(old_map).getItem(k),
        ).otherwise(v),
    )


def fill_toast(df: DataFrame, new_map: str = "record", old_map: str = "old_record") -> DataFrame:
    return df.withColumn(new_map, toast_filled_expr(new_map, old_map))
