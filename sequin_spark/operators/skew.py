"""Skew handling for hot groups.

A single hot group_id (one PK receiving a large share of updates) makes
the delivery shuffle skew: one task gets the whole group. The reference
has the same constraint (a group is pinned to one store partition by
hash). Two mitigations:

1. AQE skew-join splitting — on by default in the session conf; handles
   skewed *joins* automatically.
2. Salting for aggregations/repartitions where per-group ordering is NOT
   required (metrics, dedup counts): spread each hot key over
   ``salt_buckets`` sub-keys, aggregate partially, then merge.

For ordered delivery, salting would break in-order semantics — there the
correct dial is ``partition_count`` plus the reference's own answer:
``message_grouping: false`` for order-insensitive consumers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_key(key_col: str, salt_buckets: int = 16) -> Column:
    """key → 'key#<0..buckets-1>' with a deterministic per-row salt."""
    salt = F.pmod(F.hash(F.col(key_col), F.monotonically_increasing_id()), F.lit(salt_buckets))
    return F.concat(F.col(key_col), F.lit("#"), salt.cast("string"))


def salted_count(df: DataFrame, key_col: str, salt_buckets: int = 16) -> DataFrame:
    """Two-phase count for skewed keys: partial count per salted key,
    then merge — no single reducer sees the whole hot key."""
    partial = (
        df.withColumn("_sk", salted_key(key_col, salt_buckets))
        .groupBy("_sk")
        .agg(F.count("*").alias("_n"), F.first(F.col(key_col)).alias(key_col))
    )
    return partial.groupBy(key_col).agg(F.sum("_n").alias("n"))
