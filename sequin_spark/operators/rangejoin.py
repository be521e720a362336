"""Range (interval) join — match events to OVERLAPPING value intervals
without a cartesian product.

Spark has no native range-join optimization (Databricks' range-join
hints are proprietary); the open recipe is BINNING: pick a bin width,
explode each interval to the bins it covers, map each event to its one
bin, equi-join on the bin, then apply the exact range predicate.  Join
fan-out is |intervals| × (interval_width / bin_width + 2) build-side
rows and exactly one probe row per event — never |events| × |intervals|.
An event lands in ONE bin and an interval covers that bin at most once,
so each qualifying (event, interval) pair appears exactly once: no
dedup pass needed.

The reference has no range operator at all (SURVEY §2.7 notes the
absence of general joins); this belongs to the beyond-reference
relational breadth next to the as-of join (operators/asof.py), and is
the standard shape for "value in [lo, hi]" matching at 100 TB — risk
bands, price bands, embedding-norm shells, time windows.

Bin-width choice: ~ the median interval width.  Too small → build-side
explode blows up (width/bin bins per interval); too large → many
false-positive candidates filtered by the exact predicate.  Both are
linear factors, not asymptotic cliffs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_bin_join(
    events: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float = 1.0,
    how: str = "inner",
) -> DataFrame:
    """events ⋈ intervals on ``lo <= value <= hi`` via bin equi-join.

    Returns every (event, interval) pair whose value falls inside the
    closed interval; columns = events' ∪ intervals' (callers project).
    ``how='inner'`` only — the bin key is meaningless for outer sides.
    """
    if how != "inner":
        raise ValueError("interval_bin_join supports inner joins only")
    binned_iv = intervals.withColumn(
        "_bin",
        F.explode(F.sequence(
            F.floor(F.col(lo_col) / bin_width).cast("long"),
            F.floor(F.col(hi_col) / bin_width).cast("long"),
        )),
    )
    binned_ev = events.withColumn(
        "_bin", F.floor(F.col(value_col) / bin_width).cast("long"))
    return (
        binned_ev.join(binned_iv, "_bin")
        .filter((F.col(value_col) >= F.col(lo_col))
                & (F.col(value_col) <= F.col(hi_col)))
        .drop("_bin")
    )
