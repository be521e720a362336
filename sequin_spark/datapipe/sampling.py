"""Deterministic sampling & exact quantile profiling for training-data
pipelines.

The curation operators (datapipe/curation.py) sample by RATE — keep
probability per stratum via a hash predicate.  These operators sample
by exact COUNT and profile by exact rank, the other two primitives a
100 TB corpus pipeline needs:

* ``reservoir_sample`` — exactly k rows, uniform over the corpus,
  rerunnable: the k smallest ``h60(key)`` values ARE a uniform
  k-sample (a hash order statistic; same device as KMV,
  datapipe/sketch.py).  No RNG state, no seed plumbing, identical
  output on every rerun/backfill — and the plan is a TakeOrdered
  (per-partition top-k + merge of k·partitions rows), never a global
  sort.  This is the eval-holdout / human-inspection primitive.
* ``stratified_exact_k`` — exactly k rows PER STRATUM ("100 docs per
  language"), via the same hash order statistic ranked within the
  stratum: one shuffle on the stratum key.
* ``exact_quantiles`` — per-group exact order statistics
  (quantile_disc semantics: the element at rank ⌈q·n⌉, no
  interpolation — exact-match comparable across engines, unlike
  interpolated/approximate quantiles).  One shuffle to sort within
  groups; emits |groups| × |quantiles| rows.

Reference parity: the reference has no sampling operators (CDC streams
are complete by definition); these belong to the datapipe extension
surface (SURVEY §6), next to the budget/temperature mixers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sequin_spark.datapipe.sketch import h60


def _row_tiebreak(df: DataFrame):
    """Deterministic secondary sort key: a 64-bit hash of the FULL row.
    When ``key_col`` has duplicate values the duplicates share ``_h``,
    and orderBy/limit (or row_number) would break the tie by partition
    order — different rows could survive across reruns/partitionings.
    Hashing every column pins which duplicate wins.  (Rows identical in
    every column remain interchangeable — any choice is the same row.)
    """
    return F.xxhash64(*[F.col(c) for c in df.columns])


def reservoir_sample(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Exactly min(k, n) rows — those with the k smallest 60-bit hashes
    of ``key_col``.  Deterministic (full-row hash tiebreak for
    duplicate keys); plan = TakeOrderedAndProject."""
    return (
        df.withColumn("_h", h60(F.col(key_col)))
        .withColumn("_h2", _row_tiebreak(df))
        .orderBy("_h", "_h2")
        .limit(k)
        .drop("_h", "_h2")
    )


def stratified_exact_k(df: DataFrame, stratum_col: str, key_col: str,
                       k: int) -> DataFrame:
    """Exactly min(k, n_stratum) rows per stratum — the k smallest
    hashes within each stratum (uniform within stratum, deterministic
    across reruns — duplicate keys tie-broken by a full-row hash)."""
    w = Window.partitionBy(stratum_col).orderBy("_h", "_h2")
    return (
        df.withColumn("_h", h60(F.col(key_col)))
        .withColumn("_h2", _row_tiebreak(df))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_h", "_h2", "_rk")
    )


def exact_quantiles(df: DataFrame, group_col: str, value_col: str,
                    quantiles: list[float]) -> DataFrame:
    """Per-group exact order statistics: for each q, the element of
    rank ⌈q·n⌉ in ascending ``value_col`` order (quantile_disc
    semantics — an actual data value, so results hash-compare exactly
    across engines).  Ties broken by the value itself (rank over equal
    values picks the same element either way)."""
    w = Window.partitionBy(group_col).orderBy(value_col)
    ranked = (
        df.select(group_col, value_col)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(Window.partitionBy(group_col)))
    )
    # one window pass for ALL quantiles: explode the q list onto the
    # ranked rows and keep rank == ⌈q·n⌉ (explode-then-filter is a
    # narrow map; the sort happens once)
    qarr = F.array(*[F.lit(float(q)) for q in quantiles])
    return (
        ranked.withColumn("q", F.explode(qarr))
        .filter(F.col("_rn") == F.ceil(F.col("q") * F.col("_n")))
        .select(F.col(group_col), "q", F.col(value_col).alias("value"))
    )
