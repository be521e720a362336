"""Ordered-funnel analysis over an event stream.

No reference analog (sequin is a CDC engine, not an analytics store) —
this extends the events-table analytics surface (as-of join,
sessionization) with the standard product funnel: for an ordered list
of steps, a user converts through step i only with an event of that
type strictly AFTER their step-(i-1) conversion time (earliest-match
semantics, the ClickHouse windowFunnel / Amplitude definition).

Scale shape: one user-keyed aggregation per step, each folded over the
same user-hash partitioning (k steps = k map-side-combined aggs + k-1
co-partitioned joins of per-user one-row frames — never a window over
the full event stream, and the events scan itself is read once per
step with the step's type predicate pushed to the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sequin_spark.plan_capture import ckpt as _plan_ckpt


def funnel_times(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user conversion times: (user, t_1, …, t_k), where t_i is the
    earliest ``steps[i]`` event strictly after t_{i-1} (null = user
    never reached the step; later columns are then null too)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step).select(
            user_col, F.col(ts_col).alias("_ts")
        )
        cur = (
            cur.join(nxt, user_col, "left")
            .withColumn(
                "_ok", F.col("_ts") > F.col(f"t_{i - 1}")
            )
            .groupBy(user_col, *[f"t_{j}" for j in range(1, i)])
            .agg(F.min(F.when(F.col("_ok"), F.col("_ts"))).alias(f"t_{i}"))
        )
    return cur


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-step funnel summary: (step, step_name, n_users, pct_of_first,
    pct_of_prev), percentages rounded to 4 decimals. Row order carries
    the funnel position; n_users is monotonically non-increasing."""
    times = funnel_times(events, steps, user_col, ts_col, type_col)
    counts = times.agg(
        *[
            F.count(f"t_{i}").cast("long").alias(f"n_{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    # ONE row; each per-step select below reads it — without the (lazy)
    # checkpoint the union re-ran the whole funnel pipeline per step
    # (len(steps) full event-stream passes instead of one)
    counts = _plan_ckpt(counts)
    rows = None
    for i, step in enumerate(steps, start=1):
        r = counts.select(
            F.lit(i).alias("step"),
            F.lit(step).alias("step_name"),
            F.col(f"n_{i}").alias("n_users"),
            F.round(F.col(f"n_{i}") / F.col("n_1"), 4).alias("pct_of_first"),
            F.round(
                F.col(f"n_{i}") / F.col(f"n_{max(i - 1, 1)}"), 4
            ).alias("pct_of_prev"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows


def cohort_retention(
    events: DataFrame,
    bucket_us: int = 7 * 24 * 3600 * 1_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: users grouped by first-activity bucket (week by
    default), retention = share of the cohort active again N buckets
    later. All bucket math is integer division on unix-µs, so the
    result is exact in any engine.

    Two user-keyed aggregations (first-seen, then distinct activity
    buckets) and one broadcast-scale join of the per-cohort sizes —
    the activity frame is (user, bucket)-distinct, bounded by
    users × active-buckets, never the raw event count.

    Returns (cohort, week_offset, n_active, retention) — offset 0 rows
    carry the cohort size (retention 1.0 by construction).
    """
    first = events.groupBy(user_col).agg(F.min(ts_col).alias("_first"))
    # integer division (div), not floor(double /): µs values near 2^50
    # divided as doubles can land on a .9999… boundary; div is exact
    first = first.select(
        user_col, F.expr(f"_first div {bucket_us}").cast("long").alias("cohort")
    )
    activity = (
        events.select(user_col, F.expr(f"{ts_col} div {bucket_us}")
                      .cast("long").alias("_b"))
        .distinct()
        .join(first, user_col)
        .select("cohort", (F.col("_b") - F.col("cohort")).alias("week_offset"))
    )
    sizes = first.groupBy("cohort").agg(F.count("*").cast("long").alias("_size"))
    return (
        activity.groupBy("cohort", "week_offset")
        .agg(F.count("*").cast("long").alias("n_active"))
        .join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "week_offset",
            "n_active",
            F.round(F.col("n_active") / F.col("_size"), 4).alias("retention"),
        )
    )
