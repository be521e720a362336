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
    max_candidates: int = 32,
) -> DataFrame:
    """Streaming twin of operators/funnel.funnel_times: per-user funnel
    conversion times maintained as keyed state, one row emitted whenever
    a user's funnel result changes (the live-dashboard shape of the
    batch operator).

    State per (user, step) is the sorted set of the ``max_candidates``
    EARLIEST event times seen for that step; the chain t_1..t_k is
    re-derived from those sets on every update (t_i = smallest
    candidate strictly after t_{i-1} — exactly funnel_times).  Because
    chain times are monotone non-increasing as events accumulate, the
    smallest-C candidate sets are a sufficient statistic for exact
    batch equivalence under ANY arrival order — micro-batch shuffling,
    a late step-1 event arriving after step 2 was seen, anything —
    provided no user accumulates more than ``max_candidates`` step-i
    events earlier than their final step-(i-1) time.  Past that cap the
    operator degrades gracefully (it may report a step's conversion
    later than batch; pinned in
    tests/test_stateful.py::test_streaming_funnel_candidate_cap).

    Per-batch work is vectorized: one boolean mask + merge per step
    (numpy), no per-event Python loop.  State is ≤ k·max_candidates
    longs per active user, partitioned by user: scales with users, not
    stream length.
    """
    import numpy as np

    k = len(steps)
    if not k:
        raise ValueError("steps must be non-empty")
    state_schema = ", ".join(f"c_{i} array<bigint>" for i in range(1, k + 1))
    out_schema = f"{user_col} long, " + ", ".join(
        f"t_{i} long" for i in range(1, k + 1))

    def _chain(cands: list) -> list:
        times: list = []
        prev = None
        for i in range(k):
            arr = cands[i]
            if i == 0:
                t = int(arr[0]) if len(arr) else None
            elif prev is None:
                t = None
            else:
                j = int(np.searchsorted(arr, prev, side="right"))
                t = int(arr[j]) if j < len(arr) else None
            times.append(t)
            prev = t
        return times

    def _fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            cands = [np.asarray(a if a is not None else [], dtype="int64")
                     for a in state.get]
        else:
            cands = [np.empty(0, dtype="int64") for _ in range(k)]
        old = _chain(cands)
        touched = False
        for pdf in pdfs:
            types = pdf[type_col].to_numpy()
            ts = pdf[ts_col].to_numpy(dtype="int64")
            for i, s in enumerate(steps):
                new_ts = ts[types == s]
                if len(new_ts):
                    merged = np.unique(np.concatenate([cands[i], new_ts]))
                    cands[i] = merged[:max_candidates]
                    touched = True
        if touched:
            state.update(tuple(c.tolist() for c in cands))
        new = _chain(cands)
        if new != old:
            yield pd.DataFrame(
                [[key[0], *new]],
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


# --- SCD2 audit history as a STANDING query (r11 verdict task #2) --------
#
# The batch-relational form is queries.q_cdc_scd2_history (one PK-hash
# window, lead(seq)).  This is its streaming twin: state = the OPEN
# interval per PK plus the delivered high-water seq; each arriving
# event CLOSES its predecessor (emitting the finished validity-interval
# row — append-mode-safe: a closed row is emitted exactly once, when
# its valid_to becomes known) and becomes the new open interval.  A
# delete closes its predecessor and leaves no open row (hard-delete,
# replica identity full — docs/how-to/create-audit-logs.mdx:10-11).
#
# Arrival-order contract: per-PK order across micro-batches is the
# delivery engine's guarantee (grouping/ordered delivery); WITHIN a
# micro-batch rows arrive unordered and a PK's chain may split across
# batches arbitrarily — both handled here (per-batch sort + state).
# At-least-once replays re-deliver a suffix after restart: events at
# or below the stored high-water seq are dropped, same contract as
# stateful_group_dedup.
#
# ``__flush__`` (r12 verdict task #1 — NON-DESTRUCTIVE): a flush
# action emits the open interval as a SNAPSHOT row (valid_to_seq NULL,
# is_current true) and KEEPS the open-interval state, so the stream
# continues — the streaming analog of periodically reading the audit
# table's current rows (docs/how-to/create-audit-logs.mdx:10-11
# describes a standing table, not a one-shot).  Bookkeeping
# (``flushed_seq`` = the open_seq last snapshotted) suppresses
# duplicate snapshots of an unchanged interval across repeated
# flushes.  CONTRACT: because a snapshotted interval may close later,
# the emitted stream is an upsert log keyed by (pk, valid_from_seq) —
# at most one snapshot and at most one closed row per key, and the
# closed row supersedes the snapshot.  ``scd2_collapse`` is that
# collapse; applying it to the emitted log yields exactly the batch
# lead(seq) history (parity-tested in tests/test_scd2_stream.py).
#
# State lifetime (r12 verdict task #2): a hard-deleted PK keeps only
# ``last_seq`` (replay dedup) — with NoTimeout that tombstone state
# lives forever, unbounded growth under key churn (the growth the
# reference's store caps prevent, slot_message_store_state.ex:18-48).
# ``tombstone_ttl_ms`` bounds it: tombstoned-PK state is dropped once
# idle past the TTL.  Pick the TTL above the at-least-once replay
# horizon (the delivery engine's ledger-trim window): replays can only
# re-deliver a suffix inside that horizon, so state older than it can
# never be needed for dedup.  Requires a real processing-time trigger
# (ProcessingTimeTimeout schedules empty micro-batches to fire
# timeouts — an on-demand availableNow query would never settle, which
# is why the default stays NoTimeout).

SCD2_FLUSH_ACTION = "__flush__"


def scd2_history_stream(
    events: DataFrame,
    pk_col: str = "pk",
    seq_col: str = "seq",
    action_col: str = "action",
    delete_action: str = "delete",
    tombstone_ttl_ms: int | None = None,
    seq2_col: str | None = None,
) -> DataFrame:
    """Streaming SCD2: emits each validity-interval row when it closes,
    plus snapshot rows of still-open intervals on ``__flush__`` (non-
    destructive — the stream continues; collapse the emitted log with
    ``scd2_collapse``).  Value columns = everything that is not
    pk/seq/action.  ``tombstone_ttl_ms`` (optional) evicts state for
    hard-deleted PKs once idle past the at-least-once replay horizon.

    ``seq2_col`` (optional) switches to a TWO-COLUMN lexicographic
    cursor ``(seq_col, seq2_col)`` — the ``(commit_lsn, commit_idx)``
    mode the plan surface uses.  A Postgres LSN is a cumulative 64-bit
    byte position, so packing the pair into one int64 (``lsn*2^20 +
    idx``) would silently wrap negative once commit_lsn ≥ 2^43 (~8 TB
    of lifetime WAL) and corrupt interval ordering — same reasoning as
    the replica's struct seq (pipeline._replica_frame).  In this mode
    the interval bounds are named ``valid_from_<seq_col>`` /
    ``valid_from_<seq2_col>`` etc.; single-cursor mode keeps the
    historical ``valid_from_seq``/``valid_to_seq`` names (and the
    identical v2 state schema, so existing checkpoints/caches stay
    valid)."""
    dtypes = dict(events.dtypes)
    seq_cols = [seq_col] + ([seq2_col] if seq2_col is not None else [])
    n = len(seq_cols)
    if seq2_col is None:
        from_names, to_names = ["valid_from_seq"], ["valid_to_seq"]
        state_seq_names, seq_types = ["seq"], ["long"]
    else:
        from_names = [f"valid_from_{c}" for c in seq_cols]
        to_names = [f"valid_to_{c}" for c in seq_cols]
        state_seq_names = list(seq_cols)
        seq_types = [dtypes[c] for c in seq_cols]
    value_cols = [c for c in events.columns
                  if c not in (pk_col, action_col, *seq_cols)]
    out_schema = ", ".join(
        [f"{pk_col} {dtypes[pk_col]}"]
        + [f"{fn} {t}" for fn, t in zip(from_names, seq_types)]
        + [f"{c} {dtypes[c]}" for c in value_cols]
        + [f"{tn} {t}" for tn, t in zip(to_names, seq_types)]
        + ["is_current boolean"])
    # state: high-water cursor, whether an interval is open, its
    # from-cursor, the last-snapshotted from-cursor, and the open
    # values — O(1) per live PK (STATE SCHEMA v2: flushed_seq added by
    # r12 task #1; checkpoints from v1 are incompatible — cache keys
    # must bump.  The single-cursor field names/order are IDENTICAL to
    # v2; seq2 mode gets its own derived names)
    state_schema = ", ".join(
        [f"last_{s} {t}" for s, t in zip(state_seq_names, seq_types)]
        + ["has_open boolean"]
        + [f"open_{s} {t}" for s, t in zip(state_seq_names, seq_types)]
        + [f"flushed_{s} {t}" for s, t in zip(state_seq_names, seq_types)]
        + [f"open_{c} {dtypes[c]}" for c in value_cols])
    none_cur = (None,) * n

    def _fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if tombstone_ttl_ms is not None and state.hasTimedOut:
            # tombstoned PK idle past the replay horizon: drop the
            # dedup cursor (no rows to emit — the PK is deleted)
            state.remove()
            return
        pk = key[0]
        if state.exists:
            st = state.get
            last = tuple(st[0:n])
            if last[0] is None:
                last = None
            has_open = bool(st[n])
            open_cur = tuple(st[n + 1:2 * n + 1]) if has_open else None
            flushed = tuple(st[2 * n + 1:3 * n + 1])
            if flushed[0] is None:
                flushed = None
            open_vals = list(st[3 * n + 1:])
        else:
            last, has_open, open_cur, open_vals = None, False, None, []
            flushed = None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out_rows = []
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values(seq_cols, kind="mergesort")
            for r in pdf.to_dict("records"):
                act = r[action_col]
                cur = tuple(int(r[c]) for c in seq_cols)
                if act == SCD2_FLUSH_ACTION:
                    # non-destructive snapshot: emit the open interval
                    # as is_current, KEEP it open; flushed-cursor
                    # bookkeeping suppresses a re-snapshot of an
                    # unchanged interval (the open cursor strictly
                    # increases per PK, so a stale flushed cursor
                    # never collides with a later interval)
                    if has_open and open_cur != flushed:
                        out_rows.append(
                            [pk, *open_cur, *open_vals, *none_cur, True])
                        flushed = open_cur
                    continue
                if last is not None and cur <= last:
                    continue  # at-least-once replay: already applied
                if has_open:
                    # the upsert-log contract: this close row
                    # supersedes any earlier snapshot of the same
                    # (pk, open-cursor) — scd2_collapse applies it
                    out_rows.append([pk, *open_cur, *open_vals, *cur, False])
                if act == delete_action:
                    has_open, open_cur, open_vals = False, None, []
                else:
                    has_open, open_cur = True, cur
                    open_vals = [r[c] for c in value_cols]
                last = cur
        state.update((*(last if last is not None else none_cur),
                      has_open,
                      *(open_cur if has_open else none_cur),
                      *(flushed if flushed is not None else none_cur),
                      *(open_vals if has_open else [None] * len(value_cols))))
        if tombstone_ttl_ms is not None and not has_open:
            # only tombstoned PKs age out; an open interval must live
            # until closed (no timeout set → never fires for it)
            state.setTimeoutDuration(tombstone_ttl_ms)
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[pk_col, *from_names, *value_cols,
                         *to_names, "is_current"])

    return (events.groupBy(pk_col).applyInPandasWithState(
        _fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout
                     if tombstone_ttl_ms is not None
                     else GroupStateTimeout.NoTimeout),
    ))


def scd2_collapse(hist: DataFrame, pk_col: str = "pk") -> DataFrame:
    """Collapse an scd2_history_stream emission log into the final
    history: per (pk, valid_from cursor) the CLOSED row (valid_to
    non-null) supersedes the flush snapshot of the same interval —
    the documented upsert-log contract of the non-destructive flush.
    The cursor columns are detected by their ``valid_from_*`` /
    ``valid_to_*`` names, so this handles both the single-cursor and
    the two-column ``(commit_lsn, commit_idx)`` emission shapes.
    One map-side-combinable ``max_by`` hash aggregate (same 100 TB
    shape as the replica collapse: one shuffle carrying one row per
    touched key)."""
    from_cols = [c for c in hist.columns if c.startswith("valid_from_")]
    to_col = next(c for c in hist.columns if c.startswith("valid_to_"))
    others = [c for c in hist.columns
              if c not in (pk_col, *from_cols)]
    import pyspark.sql.functions as F  # noqa: N812

    pick = F.max_by(
        F.struct(*[F.col(c) for c in others]),
        F.col(to_col).isNotNull().cast("int"))
    return (hist.groupBy(pk_col, *from_cols)
                .agg(pick.alias("_r"))
                .select(pk_col, *from_cols,
                        *[F.col("_r")[c].alias(c) for c in others]))
