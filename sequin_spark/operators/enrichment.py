"""Enrichment — the reference's only JOIN operator.

Reference: user SQL run against the source Postgres with batched PK
arrays (``WHERE id = ANY($1)``), results merged into
``metadata.enrichment`` by PK equality (consumers.ex:1656-1700+,
sink_pipeline.ex:263-268). Single-table consumers only.

Spark mapping: a stream-static **left** equi-join on the PK columns.
The enrichment relation is a dimension (bounded result of a SQL query)
→ ``broadcast()`` it so the event stream never shuffles. At 100 TB of
events with a multi-GB dimension, switch to a shuffled join bucketed on
the PK — the helper takes ``broadcast_dim`` for that.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

_ANY_RE = re.compile(r"(\w+(?:\.\w+)*)\s*=\s*ANY\s*\(\s*\$1\s*\)", re.I)


def enrich(
    events: DataFrame,
    dim: DataFrame,
    on: dict[str, str],
    broadcast_dim: bool = True,
) -> DataFrame:
    """Left-join ``dim`` onto events and pack its columns into an
    ``enrichment`` struct column (merged into metadata downstream).

    ``on`` maps event-side expressions (usually record PK entries, e.g.
    ``record['o_custkey']``) to dim column names.

    A dim key matching MORE than one row is a hard error, not a silent
    fan-out (consumers.ex enrich_messages!: "Expected enrichment query
    to return at most one row per message", consumers_test.exs:1081) —
    a left join would otherwise DUPLICATE the message, corrupting
    exactly-once delivery counts downstream.  The guard is a per-key
    count window on the DIM side (bounded, pre-broadcast — one small
    exchange of dim-sized rows, nothing on the event stream) feeding a
    conditional ``raise_error`` that fires only when a duplicate key
    actually joins a message; zero matches stay a null-field struct
    (consumers_test.exs:1041)."""
    from pyspark.sql import Window

    d = dim.select([F.col(c).alias(f"__enr_{c}") for c in dim.columns])
    key_cols = [f"__enr_{c}" for c in on.values()]
    d = d.withColumn(
        "__enr_cnt", F.count(F.lit(1)).over(Window.partitionBy(*key_cols)))
    if broadcast_dim:
        d = broadcast(d)
    cond = None
    for ev_expr, dim_col in on.items():
        dcol = F.col(f"__enr_{dim_col}")
        c = F.expr(ev_expr).cast("string") == dcol.cast("string")
        cond = c if cond is None else (cond & c)
    joined = events.join(d, cond, "left")
    enr_cols = [F.col(f"__enr_{c}").alias(c) for c in dim.columns]
    joined = joined.withColumn(
        "enrichment",
        F.when(
            F.col("__enr_cnt") > 1,
            F.raise_error(F.concat(
                F.lit("enrichment query returned "),
                F.col("__enr_cnt").cast("string"),
                F.lit(" rows for one message (expected at most 1)"))),
        ).otherwise(F.struct(*enr_cols)))
    return joined.drop("__enr_cnt",
                       *[f"__enr_{c}" for c in dim.columns])


def enrich_with_query(
    spark,
    events: DataFrame,
    enrichment_sql: str,
    on: dict[str, str],
    broadcast_dim: bool = True,
) -> DataFrame:
    """User-SQL enrichment — the reference's exact surface: a SELECT run
    against the source DB with batched PKs (``WHERE id = ANY($1)``,
    consumers.ex:1656-1700). Spark-first: the user SQL minus the ANY
    clause runs as a query; the ``= ANY(pks)`` membership becomes the
    join itself, so Catalyst can push the PK set down as a semi-join
    instead of shipping arrays. The SQL may reference any registered
    table/view (for JDBC sources, register the pushdown query as a view).
    """
    dim = spark.sql(enrichment_sql)
    return enrich(events, dim, on, broadcast_dim=broadcast_dim)


def enrich_from_spec(
    spark,
    events: DataFrame,
    enrichment_sql: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """The consumer-spec surface: the verbatim reference enrichment SQL
    with its ``<pk> = ANY($1)`` parameterization (yaml_loader.ex:
    1164-1180 requires $1; consumers.ex:1656-1700 batches event PKs
    into it). The ANY clause names the join key — it becomes the join
    condition against ``record[<pk>]`` and is replaced by TRUE in the
    dimension query, so Catalyst sees plain membership it can push as a
    semi-join. The SELECT must include the PK column (the reference has
    the same requirement — results merge by PK equality)."""
    m = _ANY_RE.search(enrichment_sql)
    if not m:
        raise ValueError(
            "enrichment SQL must use parameterization: <pk> = ANY($1)")
    pk = m.group(1).split(".")[-1]
    dim_sql = enrichment_sql[: m.start()] + "TRUE" + enrichment_sql[m.end():]
    return enrich_with_query(
        spark, events, dim_sql, {f"record['{pk}']": pk},
        broadcast_dim=broadcast_dim)
