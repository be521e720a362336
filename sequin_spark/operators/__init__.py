from sequin_spark.operators.source_filter import Source, apply_source_filter, apply_action_filter
from sequin_spark.operators.column_filter import ColumnFilter, apply_column_filters
from sequin_spark.operators.changes import compute_changes, fill_toast
from sequin_spark.operators.grouping import (
    deliverable_messages,
    order_within_groups,
    repartition_by_group,
)
from sequin_spark.operators.dedup import dedup_replays, ledger_anti_join
from sequin_spark.operators.payload import (
    payload_size_guard,
    format_timestamps,
    with_metadata,
)

__all__ = [
    "Source",
    "apply_source_filter",
    "apply_action_filter",
    "ColumnFilter",
    "apply_column_filters",
    "compute_changes",
    "fill_toast",
    "deliverable_messages",
    "order_within_groups",
    "repartition_by_group",
    "dedup_replays",
    "ledger_anti_join",
    "payload_size_guard",
    "format_timestamps",
    "with_metadata",
]
