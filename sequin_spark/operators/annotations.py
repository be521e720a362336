"""Transaction annotations — app-emitted metadata attached to events.

Reference: an application emits ``pg_logical_emit_message`` with prefix
``sequin:transaction_annotations.set|clear`` inside a transaction; the
JSON blob attaches to every *subsequent* event in that transaction
(slot_producer.ex:438-455; decode consumers.ex:805-816).

Spark mapping: annotation markers are rows in the same stream
(action='logical_message'); within a transaction (commit_lsn) the
last set/clear at-or-before each event (by commit_idx) wins — a window
``last(..., ignorenulls)`` over the txn, i.e. one partial shuffle by
commit_lsn which co-locates whole transactions (bounded by txn size,
never by stream size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ANNOTATION_SET = "transaction_annotations.set"
ANNOTATION_CLEAR = "transaction_annotations.clear"


def apply_transaction_annotations(
    df: DataFrame,
    action_col: str = "action",
    prefix_col: str = "message_prefix",
    content_col: str = "message_content",
) -> DataFrame:
    """Propagate set/clear annotation markers to subsequent events in the
    same transaction, then drop the marker rows."""
    is_marker = F.col(action_col) == "logical_message"
    # encode clear as an empty-string sentinel so last(ignorenulls) can
    # distinguish "cleared" from "never set"
    marker_value = F.when(
        is_marker & (F.col(prefix_col) == ANNOTATION_SET), F.col(content_col)
    ).when(is_marker & (F.col(prefix_col) == ANNOTATION_CLEAR), F.lit(""))
    w = (
        Window.partitionBy("commit_lsn")
        .orderBy("commit_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    annotated = df.withColumn("_ann_marker", marker_value).withColumn(
        "_ann_effective", F.last("_ann_marker", ignorenulls=True).over(w)
    )
    out = annotated.filter(~is_marker).withColumn(
        "transaction_annotations",
        F.when(F.col("_ann_effective") == "", F.lit(None).cast("string")).otherwise(
            F.col("_ann_effective")
        ),
    )
    return out.drop("_ann_marker", "_ann_effective")
