"""As-of (nearest-earlier) join — the classic event-time enrichment
Spark lacks natively.

No reference analog (SURVEY §2.7: sequin has only the enrichment
equi-join) — this is the custom-operator surface the Spark engine adds
for event analytics: "for each left event, the latest right event with
the same key at or before it" (trade×quote, purchase×last-click,
reading×last-calibration).

Scale design — the union + fill-forward window, NOT a range join:
tag both sides, union them, and run ONE window per key ordered by
(ts, side, order_col): ``last(right_payload, ignorenulls=True)`` over
unbounded-preceding..current carries the most recent right row forward
onto every left row. Cost is a single shuffle on the key + a sort
within partitions — while the naive ``l.ts >= r.ts`` range join is a
per-key cross product that explodes quadratically in hot keys (and
falls out of hash join entirely). Right rows sort BEFORE left rows at
equal timestamps, so "at or before" includes ties; among equal-ts
right rows the greatest ``order_col`` wins (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    order_col: str,
    right_payload: list[str],
    suffix: str = "_asof",
    tolerance: int | None = None,
) -> DataFrame:
    """For each ``left`` row, attach the payload of the latest ``right``
    row with equal ``key_cols`` and ``right.ts <= left.ts`` (ties on ts
    broken by the greatest ``order_col``); null payload when no such
    row exists. Returns all left columns + suffixed payload columns.

    ``tolerance`` (same unit as ``ts_col``): when set, a match older
    than ``left.ts - tolerance`` is rejected — the whole payload nulls
    out, exactly pandas ``merge_asof(tolerance=...)`` semantics.  The
    bound is applied AFTER the fill-forward window, so it adds no
    shuffle — still one partition-by-key pass."""
    payload = F.struct(*[F.col(c) for c in [ts_col, order_col, *right_payload]])
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        ).alias("_r"),
    )
    # right rows carry their key/ts/order columns (the window needs
    # them); every other left column rides as a typed null
    r_tag = right.select(
        *[
            F.col(c) if c in {*key_cols, ts_col, order_col} else F.lit(None).cast(
                left.schema[c].dataType
            ).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("_side"),
        payload.alias("_r"),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("_carried", F.last("_r", ignorenulls=True).over(w))
    if tolerance is not None:
        filled = filled.withColumn(
            "_carried",
            F.when(
                F.col(ts_col) - F.col("_carried")[ts_col] <= F.lit(tolerance),
                F.col("_carried"),
            ),
        )
    out = filled.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col("_carried")[c].alias(f"{c}{suffix}") for c in [ts_col, order_col, *right_payload]],
    )
    return out


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap: int,
    order_col: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the key's previous event exceeds ``gap`` (same units as ts_col).
    Adds ``session_seq`` (0-based per key) and ``session_start_ts``.

    Same scale shape as asof_join: one shuffle on the key, two window
    passes (lag → boundary flag → running sum), no state store needed
    in batch; the streaming twin is ``F.session_window`` aggregation.
    """
    order = [F.col(ts_col).asc()] + ([F.col(order_col).asc()] if order_col else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    boundary = (
        F.when(F.lag(ts_col).over(w).isNull(), F.lit(0))
        .when(F.col(ts_col) - F.lag(ts_col).over(w) > gap, F.lit(1))
        .otherwise(F.lit(0))
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df.withColumn("session_seq", F.sum(boundary).over(wrun).cast("long"))
    ws = Window.partitionBy(*key_cols, "session_seq")
    return out.withColumn("session_start_ts", F.min(ts_col).over(ws))
