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


def streaming_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming twin of operators/funnel.funnel_times: per-user funnel
    conversion times maintained as keyed state, one row emitted whenever
    a user's funnel advances (the live-dashboard shape of the batch
    operator).

    The incremental rule — fill the first unreached step when a
    matching event arrives strictly after the previous step's time — is
    the batch earliest-match semantics applied greedily, so given
    event-time-ordered arrival (or any single batch, which is sorted
    here) the final row per user equals the batch funnel_times row.
    State is one long per step per active user, partitioned by user:
    scales with users, not stream length.
    """
    k = len(steps)
    if not k:
        raise ValueError("steps must be non-empty")
    state_schema = ", ".join(f"t_{i} long" for i in range(1, k + 1))
    out_schema = f"{user_col} long, " + state_schema

    def _fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        times = list(state.get) if state.exists else [None] * k
        changed = False
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for typ, ts in zip(pdf[type_col], pdf[ts_col]):
                # first unreached step
                i = next((j for j in range(k) if times[j] is None), None)
                if i is None:
                    break
                if typ == steps[i] and (i == 0 or ts > times[i - 1]):
                    times[i] = int(ts)
                    changed = True
        if changed:
            state.update(tuple(times))
            yield pd.DataFrame(
                [[key[0], *times]],
                columns=[user_col] + [f"t_{i}" for i in range(1, k + 1)],
            )

    return (
        events.select(user_col, type_col, ts_col)
        .groupBy(user_col)
        .applyInPandasWithState(
            _fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
