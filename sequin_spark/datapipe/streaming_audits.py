"""Streaming twins of the r9 event-log audits (r9 verdict task #9) —
the two canonical stateful-streaming operators, built on
``applyInPandasWithState`` like the sketch twins
(datapipe/streaming_sketch.py) and parity-tested twin-vs-batch on the
same event log (tests/test_streaming_audits.py).

* **Gap sessionization twin** (``streaming_session_gaps``): the
  stateful form of ``session_gap_stats``' per-user LAG — state per
  user is ONE long (the last seen event time); each micro-batch sorts
  its own rows per user and emits every inter-event gap exactly once
  (append mode).  Gap values are independent of tie order among equal
  timestamps (the sorted multiset is what defines consecutive
  differences), so the twin is exact under any within-batch arrival
  shuffle as long as batch boundaries respect per-user time order —
  the CDC delivery guarantee the engine's ordered store provides.

* **Watermark late/dropped counters twin**
  (``streaming_late_data_counters``): the stateful form of
  ``streaming_late_data_audit``'s per-hour rollup, using the ENGINE's
  own watermark (``GroupState.getCurrentWatermarkMs`` under
  ``withWatermark(ts, delay)``) rather than re-deriving it — measured
  fact (pinned by test): late rows are NOT pre-filtered before
  applyInPandasWithState, so the operator sees and counts them.
  Engine watermark semantics are batch-boundary (max event time of
  PRIOR micro-batches − delay); with one event per micro-batch that
  collapses to the batch audit's per-row prefix-max recurrence
  exactly, which is what the parity test pins.

Scale shape: state is O(users) × 1 long / O(hours) × 3 longs,
partitioned by group key across executors; per-batch Python work
touches only that batch's rows (Arrow-batched).  No global funnel:
the cross-key watermark maximum is maintained by the engine the same
way at any cluster width.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HOUR_US = 3_600_000_000


def _gaps_fn(key, pdfs: Iterator[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
    last = int(state.get[0]) if state.exists else None
    ts = []
    for pdf in pdfs:
        ts.extend(int(t) for t in pdf["ts_us"])
    ts.sort()
    gaps = []
    for t in ts:
        if last is not None:
            gaps.append((t - last) // 1_000_000)
        last = t
    state.update((last,))
    if gaps:
        yield pd.DataFrame({
            "user_id": [int(key[0])] * len(gaps),
            "gap_s": gaps,
        })


def streaming_session_gaps(events: DataFrame,
                           user_col: str = "user_id",
                           ts_col: str = "ts") -> DataFrame:
    """Per-user inter-event gaps over a stream: state per user is the
    last event time (one long); each gap is emitted exactly once
    (append mode).  Feed the banding/count rollup of
    session_gap_stats downstream — the emitted (user_id, gap_s) rows
    are the exact lag-differences the batch window computes."""
    ev = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"))
    return (
        ev.groupBy("user_id")
        .applyInPandasWithState(
            _gaps_fn,
            outputStructType="user_id long, gap_s long",
            stateStructType="last_ts long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _late_fn(delay_us: int):
    def fn(key, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            n_total, n_late, n_dropped, n_updates = (
                int(v) for v in state.get)
        else:
            n_total = n_late = n_dropped = n_updates = 0
        wm_us = state.getCurrentWatermarkMs() * 1000
        for pdf in pdfs:
            for t in pdf["ts_us"]:
                t = int(t)
                n_total += 1
                # engine watermark 0 = "no prior batches": nothing is
                # late yet (the batch audit's NULL-watermark rows)
                if wm_us > 0 and t < wm_us:
                    n_late += 1
                    if t < wm_us - delay_us:
                        n_dropped += 1
        n_updates += 1
        state.update((n_total, n_late, n_dropped, n_updates))
        yield pd.DataFrame({
            "window_start_us": [int(key[0])],
            "n_total": [n_total],
            "n_late": [n_late],
            "n_dropped": [n_dropped],
            "n_updates": [n_updates],
        })
    return fn


def streaming_late_data_counters(events: DataFrame,
                                 ts_col: str = "ts",
                                 delay_s: int = 300) -> DataFrame:
    """Per-hour late/dropped accounting over a stream using the
    ENGINE watermark: ``withWatermark(ts, delay)`` makes
    ``getCurrentWatermarkMs()`` = max event time of prior
    micro-batches − delay, and each hour-keyed state row accumulates
    (n_total, n_late, n_dropped) with late = behind the watermark,
    dropped = behind the 2× allowed-lateness horizon — the same
    definitions as the batch audit (``streaming_late_data_audit``).
    ``n_updates`` is the per-key invocation counter ("latest row"
    selector, the streaming_kmv_state convention).  Run in update
    mode; state is 4 longs per hour bucket."""
    delay_us = delay_s * 1_000_000
    ev = (events
          .withWatermark(ts_col, f"{delay_s} seconds")
          .select(F.col(ts_col),
                  F.unix_micros(F.col(ts_col)).alias("ts_us"))
          .withColumn(
              "window_start_us",
              (F.floor(F.col("ts_us") / F.lit(HOUR_US))
               * F.lit(HOUR_US)).cast("long")))
    return (
        ev.groupBy("window_start_us")
        .applyInPandasWithState(
            _late_fn(delay_us),
            outputStructType=("window_start_us long, n_total long, "
                              "n_late long, n_dropped long, "
                              "n_updates long"),
            stateStructType=("n_total long, n_late long, "
                             "n_dropped long, n_updates long"),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
