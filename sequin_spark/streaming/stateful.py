"""Custom stateful streaming operators (applyInPandasWithState).

The reference's per-consumer store keeps per-group state across the
stream's lifetime: the delivered high-water cursor per group (dedup on
restart/replay) and ordering continuity. Structured Streaming expresses
this with ``applyInPandasWithState`` — state is partitioned by group,
checkpointed with the query, and updated executor-side per micro-batch
(no driver involvement ⇒ scales with the number of groups, not the
stream length).

``stateful_group_dedup`` — emit each group's events at most once in
(commit_lsn, commit_idx) order: events at or below the group's stored
high-water cursor are dropped (WAL replay after restart re-delivers a
suffix; this is slot_message_store_state.ex:98,127-130 as streaming
state). State TTL bounds memory for retired groups.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "max_lsn long, max_idx long"


def _dedup_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        max_lsn, max_idx = state.get
    else:
        max_lsn, max_idx = -1, -1
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["commit_lsn", "commit_idx"])
        fresh = pdf[
            (pdf["commit_lsn"] > max_lsn)
            | ((pdf["commit_lsn"] == max_lsn) & (pdf["commit_idx"] > max_idx))
        ]
        if len(fresh):
            max_lsn = int(fresh["commit_lsn"].iloc[-1])
            max_idx = int(fresh["commit_idx"].iloc[-1])
            out.append(fresh)
    state.update((max_lsn, max_idx))
    if out:
        yield pd.concat(out, ignore_index=True)


def stateful_group_dedup(events: DataFrame, output_cols: list[str] | None = None) -> DataFrame:
    """Streaming per-group high-water-cursor dedup.

    Input must be a streaming DataFrame with group_id/commit_lsn/
    commit_idx; output carries ``output_cols`` (default: those three).
    """
    cols = output_cols or ["group_id", "commit_lsn", "commit_idx"]
    src = events.select(*cols)
    out_schema = ", ".join(
        f"{name} {dtype}" for name, dtype in src.dtypes
    )
    return (
        src.groupBy("group_id")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            # NoTimeout: with ProcessingTimeTimeout Spark runs continuous
            # empty micro-batches to evaluate timeouts, which never lets
            # an on-demand query settle. In production, bound state for
            # retired groups with ProcessingTimeTimeout + an explicit
            # trigger interval (state.setTimeoutDuration + state.remove).
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
