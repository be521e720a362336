"""Entity-graph centrality operators (PageRank et al.).

The corpus-side use case: rank sources/domains/entities by link mass
(crawl frontier prioritization, per-domain sampling weights, spam-hub
demotion) — the classic companion to the connected-components dedup
grouping already in ``datapipe/dedup.py``.

Determinism contract: ranks are computed in **pure 64-bit integer
arithmetic** on a fixed-point grid (``scale`` units = rank 1.0).  Every
iteration is

    contrib(u -> v) = (r_u * w_uv) div W_u          (integer floor)
    r'_v            = T + (d_num * sum_v contrib) div d_den

with T = ((d_den - d_num) * scale) div (d_den * N).  Integer division
and 64-bit sums are order-insensitive and identical across engines, so
a DuckDB oracle replays the exact trajectory — the same trick the
power-iteration top-component query uses, without needing a quantized
float replay at all.  Dangling mass (nodes with no out-edges) is
dropped, not redistributed; total mass then decays slightly, which is
the documented semantics (matches networkx's dangling=None behavior in
spirit, exactly reproducible here).

Scale shape (100 TB): the EDGE table is the big side and stays
partitioned by ``dst`` for the per-iteration contribution sum (one
shuffle per iteration, map-side combined); the RANK table is one row
per node — for entity graphs (domains, sources, nations) it is orders
of magnitude smaller and broadcast-joins onto the edges.  Overflow
bound: r_u <= scale (1e12) and w_uv/W_u <= 1, so r_u * w_uv <=
scale * W_u; keep max edge weight below 2^63/scale ~ 9.2e6 or pre-scale
weights down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sequin_spark.session import no_aqe as _no_aqe

SCALE = 10**12

# Bounded-graph driver fast path (guide §8: decide with small rows).
# The corpus-scale work of an entity-graph centrality query is the EDGE
# AGGREGATION (the star join that counts lineitems per nation pair) —
# that always runs distributed.  The fixed-point loop itself runs over
# the aggregated edge table, whose cardinality is bounded by the entity
# vocabulary (25 nations → ≤625 edges at ANY corpus size, 100 TB
# included).  Scheduling 2–4 scheduler jobs plus a full Catalyst
# plan compile per round for a ≤50k-row table is pure driver overhead
# (measured: warm pagerank build 1.9 s, of which ~0.9 s was per-round
# localCheckpoint physical planning and 1.7 s py4j socket wait) — so
# when the ALREADY-MEASURED edge/node counts prove the graph small, the
# loop replays on the driver in exact Python integer arithmetic (the
# recurrences are pure 64-bit int — the same replay the kernel tests
# assert against) and only the result table goes back through Spark.
# Above the bound the distributed loop is unchanged.  The analog of the
# broadcast-join threshold: move the loop to the data when the data is
# a few KB, never when it is a corpus.
_DRIVER_FIXPOINT_KEY = "spark.sequin.graph.driverFixpointMaxRows"
_DRIVER_FIXPOINT_DEFAULT = 50_000


def _driver_fixpoint_max(spark) -> int:
    try:
        return int(spark.conf.get(_DRIVER_FIXPOINT_KEY,
                                  str(_DRIVER_FIXPOINT_DEFAULT)))
    except ValueError:
        return _DRIVER_FIXPOINT_DEFAULT




def pagerank_int(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 5,
    d_num: int = 85,
    d_den: int = 100,
    scale: int = SCALE,
) -> DataFrame:
    """Fixed-point PageRank over (``nodes``: `node`; ``edges``: `src`,
    `dst`, `w` bigint).  Returns (node, rank_int, rank_val) where
    ``rank_int`` is the exact fixed-point value (hash-stable across
    engines) and ``rank`` = rank_int / scale rounded to 6.

    ``iters`` is fixed (not convergence-tested) so the trajectory is
    finite and replayable; 5 iterations ranks a link graph to well
    under 1% relative movement on graphs this dense.
    """
    n_nodes = nodes.count()  # bounded: one long, entity-graph cardinality
    teleport = ((d_den - d_num) * scale) // (d_den * n_nodes)
    spark = nodes.sparkSession

    # The edge table is scanned once per iteration: persist it so the
    # (possibly expensive) edge-build plan runs ONCE, and truncate the
    # rank lineage per iteration with localCheckpoint — without it the
    # loop compounds the plan exponentially (each iteration re-plans
    # every prior one; measured 124 Exchanges for 5 iterations vs ~6
    # with truncation).  On a multi-tenant cluster use a reliable
    # checkpoint dir instead of localCheckpoint (executor loss drops
    # local blocks); the arithmetic is integer-exact either way, so a
    # recompute-from-scratch retry yields identical ranks.
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    e = edges.join(out_w, "src").select("src", "dst", "w", "out_w").persist()
    # materialize the (possibly corpus-scale) edge build under AQE —
    # one bounded count — so the AQE-off block below only ever covers
    # the bounded per-round plans, never the edge star join; the count
    # also sizes the loop's reduce width to the data (50k rows/task,
    # session width as the cap — bounded frames never schedule a full
    # session-width task wave per round)
    n_e = e.count()
    # bounded graph (the n_nodes/n_e counts above already measured it):
    # replay the loop on the driver in exact Python ints — the
    # recurrence is (r_u*w) div out_w summed per dst, then
    # teleport + (d_num*s) div d_den, all non-negative 64-bit values,
    # so Python `//` reproduces Spark's integral div bit-for-bit (the
    # same replay tests/test_graph_privacy.py asserts the distributed
    # loop against).  Sum order is irrelevant (integer adds).
    if max(n_e, n_nodes) <= _driver_fixpoint_max(spark):
        node_vals = [row["node"] for row in nodes.select("node").collect()]
        e_rows = [(row["src"], row["dst"], row["w"], row["out_w"])
                  for row in e.collect()]
        e.unpersist()
        r = {v: scale // n_nodes for v in node_vals}
        for _ in range(iters):
            s: dict = {}
            for src, dst, w, out_w_v in e_rows:
                ru = r.get(src)
                if ru is not None:  # srcs outside nodes drop (inner join)
                    s[dst] = s.get(dst, 0) + (ru * w) // out_w_v
            r = {v: teleport + (d_num * s.get(v, 0)) // d_den
                 for v in node_vals}
        from pyspark.sql import types as T

        ranks = spark.createDataFrame(
            [(v, r[v]) for v in node_vals],
            T.StructType([
                T.StructField("node", nodes.schema["node"].dataType),
                T.StructField("r", T.LongType()),
            ]))
        return ranks.select(
            "node",
            F.col("r").alias("rank_int"),
            F.round(F.col("r") / F.lit(float(scale)), 6).alias("rank_val"),
        )
    session_w = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    loop_parts = min(session_w, n_e // 50_000 + 1)
    if loop_parts < session_w:
        _loop_ctx = lambda: _no_aqe(spark,  # noqa: E731
                                    shuffle_partitions=loop_parts)
    else:  # corpus-scale graph: keep AQE (coalescing + skew handling)
        from contextlib import nullcontext as _loop_ctx

    nodes = nodes.persist()
    # r14 (verdict task #1): lazy checkpoints + zero per-round actions —
    # the plan is truncated per round either way, but nothing
    # materializes until the FINAL action walks the chained RDD
    # lineage (one eager-checkpoint job per round before).  The
    # per-round sub-plans are bounded by construction (rank/contrib
    # tables ≤ |nodes| rows — the documented broadcast contract), so
    # they are compiled with AQE OFF: adaptive execution re-plans and
    # schedules one job per exchange per round and buys nothing on
    # bounded inputs; the explicit broadcast hints pin the join
    # strategy AQE used to discover at runtime.  teleport is driver
    # arithmetic off the single up-front count; the rank trajectory is
    # byte-identical (same integer plan per round).
    with _loop_ctx():
        ranks = nodes.select(
            "node", F.lit(scale // n_nodes).cast("long").alias("r")
        ).localCheckpoint(eager=False)
        for _ in range(iters):
            contribs = (
                e.join(F.broadcast(ranks.withColumnRenamed("node", "src")),
                       "src")
                .select(
                    F.col("dst").alias("node"),
                    F.expr("(r * w) div out_w").alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("s"))
            )
            ranks = nodes.join(F.broadcast(contribs), "node", "left").select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({d_num} * coalesce(s, CAST(0 AS BIGINT))) div {d_den}")
                ).cast("long").alias("r"),
            ).localCheckpoint(eager=False)
    e.unpersist()
    nodes.unpersist()
    return ranks.select(
        "node",
        F.col("r").alias("rank_int"),
        F.round(F.col("r") / F.lit(float(scale)), 6).alias("rank_val"),
    )


def hits_int(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 4,
    scale: int = SCALE,
) -> DataFrame:
    """Fixed-point HITS (Kleinberg hubs & authorities) on the same
    integer grid as :func:`pagerank_int`:

        a'_v = sum_{u->v} h_u * w_uv        (authority from in-links)
        h'_u = sum_{u->v} a'_v * w_uv       (hub from out-links)

    each renormalized to <= ``scale`` via ``x div ceil(max(x)/scale)``
    (a divisor form rather than ``x * scale div max`` — the product
    would overflow int64; the divisor keeps every intermediate under
    ~25 * scale * w_max, so w_max must stay below ~3e5 or be
    pre-scaled).  max() is order-insensitive, so the trajectory is
    engine-exact.  Weighted edges use the raw weight — HITS' classic
    form is unweighted; pass w=1 edges for that.  Same scale shape as
    PageRank: two dst/src-keyed shuffles per iteration over the edge
    table, rank tables broadcast, lineage truncated per iteration; the
    per-round max is a 1-row driver collect that also materializes the
    round's lazy checkpoint (one job per half-iteration), the loop runs
    over linked nodes only (zeros attached once at the end), and the
    bounded per-round plans compile with AQE off at a data-sized
    reduce width."""
    spark = nodes.sparkSession
    e = edges.select("src", "dst", "w").persist()
    # materialize a possibly corpus-scale edge build under AQE (one
    # bounded count) so the AQE-off loop below only compiles the
    # bounded per-round plans; the count sizes the loop's reduce width
    # to the data (50k rows/task, session width as the cap)
    n_e = e.count()
    # bounded graph: replay the loop on the driver in exact Python ints
    # (the ±renormalized recurrence is non-negative 64-bit integer
    # arithmetic — `//` ≡ Spark's div; the distributed loop's inner
    # joins never drop rows after init because hub keys = distinct
    # srcs and authority keys = distinct dsts, so the edges-only
    # replay below is the identical trajectory — the same _py_hits
    # replay the kernel tests assert against).
    if n_e <= _driver_fixpoint_max(spark):
        e_rows = [(row["src"], row["dst"], row["w"])
                  for row in e.collect()]
        e.unpersist()
        h = {src: scale for src, _, _ in e_rows}
        a: dict = {}
        for _ in range(iters):
            a = {}
            for src, dst, w in e_rows:
                a[dst] = a.get(dst, 0) + h[src] * w
            a_div = max((max(a.values(), default=0) + scale - 1)
                        // scale, 1)
            a = {v: x // a_div for v, x in a.items()}
            h = {}
            for src, dst, w in e_rows:
                h[src] = h.get(src, 0) + a[dst] * w
            h_div = max((max(h.values(), default=0) + scale - 1)
                        // scale, 1)
            h = {v: x // h_div for v, x in h.items()}
        from pyspark.sql import types as T

        ntype = nodes.schema["node"].dataType

        def _tbl(d: dict, col: str):
            return spark.createDataFrame(
                list(d.items()) or [],
                T.StructType([T.StructField("node", ntype),
                              T.StructField(col, T.LongType())]))

        out = nodes.join(F.broadcast(_tbl(a, "a")), "node", "left") \
            .join(F.broadcast(_tbl(h, "h")), "node", "left").select(
                "node",
                F.coalesce("a", F.lit(0).cast("long"))
                .alias("authority_int"),
                F.coalesce("h", F.lit(0).cast("long")).alias("hub_int"),
            )
        return out.select(
            "node",
            "authority_int",
            "hub_int",
            F.round(F.col("authority_int") / F.lit(float(scale)), 6)
            .alias("authority"),
            F.round(F.col("hub_int") / F.lit(float(scale)), 6)
            .alias("hub"),
        )
    session_w = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    loop_parts = min(session_w, n_e // 50_000 + 1)
    if loop_parts < session_w:
        _loop_ctx = lambda: _no_aqe(spark,  # noqa: E731
                                    shuffle_partitions=loop_parts)
    else:  # corpus-scale graph: keep AQE (coalescing + skew handling)
        from contextlib import nullcontext as _loop_ctx
    nodes = nodes.persist()
    # r14 (verdict task #1 — cut the per-round driver-job floor).  Two
    # structural cuts, trajectory bit-identical:
    #
    # 1. The loop runs over LINKED nodes only.  The old shape
    #    left-joined the FULL node table twice per iteration purely to
    #    materialize zeros; but the recurrence is closed over linked
    #    nodes — every edge dst always finds its authority row and
    #    every edge src its hub row (inner joins on e), a node outside
    #    those sets contributes nothing and scores 0 — and the
    #    normalization max over linked nodes equals the max over all
    #    nodes (missing rows are exactly the zeros; the `or 1` floor
    #    covers the empty case identically).  Zeros are attached ONCE
    #    at the end.  Two full node-table passes per iteration gone.
    #
    # 2. The bounded per-round plans compile with AQE off (see
    #    _no_aqe) with the broadcast hints AQE used to re-discover at
    #    runtime each round; the per-round max stays a 1-row driver
    #    collect, which also materializes the round's lazy checkpoint
    #    (one job, no separate checkpoint job).
    with _loop_ctx():
        hubs = (e.select(F.col("src").alias("node")).distinct()
                .select("node", F.lit(scale).cast("long").alias("h"))
                .localCheckpoint(eager=False))
        auth = None
        for _ in range(iters):
            a_ckpt = (
                e.join(F.broadcast(hubs.withColumnRenamed("node", "src")),
                       "src")
                .select(F.col("dst").alias("node"),
                        F.expr("h * w").alias("c"))
                .groupBy("node")
                .agg(F.sum("c").alias("a_raw"))
            ).localCheckpoint(eager=False)
            a_max = a_ckpt.agg(F.max("a_raw")).collect()[0][0] or 1
            a_div = max((a_max + scale - 1) // scale, 1)
            auth = a_ckpt.select(
                "node", F.expr(f"a_raw div {a_div}").cast("long").alias("a"))
            h_ckpt = (
                e.join(F.broadcast(auth.withColumnRenamed("node", "dst")),
                       "dst")
                .select(F.col("src").alias("node"),
                        F.expr("a * w").alias("c"))
                .groupBy("node")
                .agg(F.sum("c").alias("h_raw"))
            ).localCheckpoint(eager=False)
            h_max = h_ckpt.agg(F.max("h_raw")).collect()[0][0] or 1
            h_div = max((h_max + scale - 1) // scale, 1)
            hubs = h_ckpt.select(
                "node", F.expr(f"h_raw div {h_div}").cast("long").alias("h"))
    e.unpersist()
    out = nodes.join(F.broadcast(auth), "node", "left") \
        .join(F.broadcast(hubs), "node", "left").select(
            "node",
            F.coalesce("a", F.lit(0).cast("long")).alias("authority_int"),
            F.coalesce("h", F.lit(0).cast("long")).alias("hub_int"),
        )
    nodes.unpersist()
    return out.select(
        "node",
        "authority_int",
        "hub_int",
        F.round(F.col("authority_int") / F.lit(float(scale)), 6)
        .alias("authority"),
        F.round(F.col("hub_int") / F.lit(float(scale)), 6).alias("hub"),
    )


def triangle_stats(
    nodes: DataFrame,
    edges: DataFrame,
) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over the
    UNDIRECTED simple graph induced by ``edges`` (direction and weight
    collapse to distinct unordered pairs; self-loops dropped) — the
    mutual-reinforcement / spam-farm signal (a link farm is a dense
    near-clique; an organic hub has low clustering).

    Enumeration is the classic oriented wedge join: every triangle is
    counted ONCE as (a < b < c) via two equi-joins on the
    lexicographically oriented edge list, then exploded to its three
    corners for the per-node rollup.  At scale the orientation should
    be by (degree, node) instead of raw id — that bounds the wedge
    fan-out by the max *oriented* out-degree (arboricity bound) — but
    the id orientation keeps the oracle trivially identical and the
    join shape is the same.

    coeff = round(2*T / (deg*(deg-1)), 4), 0 for deg < 2 — integers in,
    one IEEE division, deterministic.
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    e1 = und.select(F.col("a"), F.col("b"))
    e2 = und.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = und.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tris = (
        e1.join(e2, "b")
        .join(e3, (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")))
        .select("a", "b", "c")
    )
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    return (
        nodes.join(deg, "node", "left")
        .join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce("degree", F.lit(0).cast("long")).alias("degree"),
            F.coalesce("triangles", F.lit(0).cast("long")).alias("triangles"),
            F.when(
                F.coalesce("degree", F.lit(0)) >= 2,
                F.round(
                    2.0 * F.coalesce("triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)), 4),
            ).otherwise(F.lit(0.0)).alias("clustering"),
        )
    )


def sql_triangle_stats(edges_cte: str, nodes_cte: str) -> str:
    """DuckDB oracle for :func:`triangle_stats` (materialized CTEs)."""
    return f"""
WITH edges AS MATERIALIZED ({edges_cte}),
nodes AS MATERIALIZED ({nodes_cte}),
und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src != dst),
deg AS MATERIALIZED (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und)
  GROUP BY node),
tris AS MATERIALIZED (
  SELECT e1.a, e1.b, e2.b AS c
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
per_node AS MATERIALIZED (
  SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
    SELECT a AS node FROM tris UNION ALL
    SELECT b FROM tris UNION ALL SELECT c FROM tris)
  GROUP BY node)
SELECT nodes.node,
       coalesce(deg.degree, 0) AS degree,
       coalesce(per_node.triangles, 0) AS triangles,
       CASE WHEN coalesce(deg.degree, 0) >= 2
            THEN round(2.0 * coalesce(per_node.triangles, 0)
                       / (deg.degree * (deg.degree - 1)), 4)
            ELSE 0.0 END AS clustering
FROM nodes LEFT JOIN deg ON deg.node = nodes.node
LEFT JOIN per_node ON per_node.node = nodes.node
"""


def sql_hits_int(
    edges_cte: str,
    nodes_cte: str,
    iters: int = 4,
    scale: int = SCALE,
) -> str:
    """DuckDB oracle for :func:`hits_int` — unrolled iterations, with
    the per-round max-normalization done via scalar subqueries (the
    same order-insensitive max)."""
    cte = [
        f"edges AS MATERIALIZED ({edges_cte})",
        f"nodes AS MATERIALIZED ({nodes_cte})",
        f"h0 AS MATERIALIZED (SELECT node, CAST({scale} AS BIGINT) AS h FROM nodes)",
    ]
    for i in range(1, iters + 1):
        cte.append(
            f"""ar{i} AS MATERIALIZED (
  SELECT nodes.node, CAST(coalesce(sum(CAST(p.h AS BIGINT) * e.w), 0) AS BIGINT) AS a_raw
  FROM nodes LEFT JOIN edges e ON e.dst = nodes.node
  LEFT JOIN h{i - 1} p ON p.node = e.src
  GROUP BY nodes.node)"""
        )
        cte.append(
            f"a{i} AS MATERIALIZED (SELECT node, CAST(a_raw // greatest("
            f"((SELECT max(a_raw) FROM ar{i}) + {scale} - 1) // {scale}, 1)"
            f" AS BIGINT) AS a FROM ar{i})"
        )
        cte.append(
            f"""hr{i} AS MATERIALIZED (
  SELECT nodes.node, CAST(coalesce(sum(CAST(p.a AS BIGINT) * e.w), 0) AS BIGINT) AS h_raw
  FROM nodes LEFT JOIN edges e ON e.src = nodes.node
  LEFT JOIN a{i} p ON p.node = e.dst
  GROUP BY nodes.node)"""
        )
        cte.append(
            f"h{i} AS MATERIALIZED (SELECT node, CAST(h_raw // greatest("
            f"((SELECT max(h_raw) FROM hr{i}) + {scale} - 1) // {scale}, 1)"
            f" AS BIGINT) AS h FROM hr{i})"
        )
    return (
        "WITH " + ",\n".join(cte)
        + f"""
SELECT a{iters}.node, a AS authority_int, h AS hub_int,
       round(CAST(a AS DOUBLE) / {float(scale)}, 6) AS authority,
       round(CAST(h AS DOUBLE) / {float(scale)}, 6) AS hub
FROM a{iters} JOIN h{iters} ON a{iters}.node = h{iters}.node"""
    )


def sql_pagerank_int(
    edges_cte: str,
    nodes_cte: str,
    iters: int = 5,
    d_num: int = 85,
    d_den: int = 100,
    scale: int = SCALE,
) -> str:
    """DuckDB oracle for :func:`pagerank_int`: the same fixed-point
    trajectory unrolled as one CTE per iteration.  ``edges_cte`` must
    yield (src, dst, w BIGINT); ``nodes_cte`` (node).  DuckDB's
    sum(BIGINT) widens to HUGEINT — every arithmetic result is cast
    back to BIGINT so the div grid matches Spark's 64-bit path (values
    stay far below 2^63 by the kernel's overflow bound)."""
    cte = [
        f"edges AS MATERIALIZED ({edges_cte})",
        f"nodes AS MATERIALIZED ({nodes_cte})",
        "nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes)",
        "outw AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS out_w FROM edges GROUP BY src)",
        "e AS MATERIALIZED (SELECT src, dst, w, out_w FROM edges JOIN outw USING (src))",
        f"r0 AS MATERIALIZED (SELECT node, CAST({scale} // (SELECT n FROM nn) AS BIGINT) AS r FROM nodes)",
    ]
    tele = f"CAST(({d_den} - {d_num}) * {scale} // ({d_den} * (SELECT n FROM nn)) AS BIGINT)"
    for i in range(1, iters + 1):
        cte.append(
            f"""r{i} AS MATERIALIZED (
  SELECT nodes.node,
         CAST({tele} + {d_num} * coalesce(s.s, 0) // {d_den} AS BIGINT) AS r
  FROM nodes LEFT JOIN (
    SELECT e.dst AS node, CAST(sum((p.r * e.w) // e.out_w) AS BIGINT) AS s
    FROM e JOIN r{i - 1} p ON p.node = e.src
    GROUP BY e.dst) s ON s.node = nodes.node)"""
        )
    return (
        "WITH " + ",\n".join(cte)
        + f"""
SELECT node, r AS rank_int,
       round(CAST(r AS DOUBLE) / {float(scale)}, 6) AS rank_val
FROM r{iters}"""
    )


def degree_stats(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Per-node degree/strength table over a weighted digraph: out/in
    edge counts and out/in weight sums, zero-filled for isolated nodes,
    plus the weight balance (out − in) — the first-look structural
    audit of any graph build (hubs, sinks, disconnected nodes).

    Scale shape: two grouped aggregations over the edge table (map-side
    combined) and two broadcast-friendly joins onto the node list —
    no iteration, no all-pairs; at 100 TB the cost is the two edge
    shuffles, both keyed on node id."""
    outs = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("out_deg"),
        F.sum("w").cast("long").alias("out_w"))
    ins = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("in_deg"),
        F.sum("w").cast("long").alias("in_w"))
    z = F.lit(0).cast("long")
    return (
        nodes.join(outs, "node", "left").join(ins, "node", "left")
        .select(
            "node",
            F.coalesce("out_deg", z).alias("out_deg"),
            F.coalesce("in_deg", z).alias("in_deg"),
            F.coalesce("out_w", z).alias("out_w"),
            F.coalesce("in_w", z).alias("in_w"),
            (F.coalesce("out_w", z) - F.coalesce("in_w", z))
            .alias("w_balance"),
        )
    )


def sql_degree_stats(edges_cte: str, nodes_cte: str) -> str:
    """DuckDB twin of :func:`degree_stats`."""
    return f"""
WITH edges AS MATERIALIZED ({edges_cte}),
nodes AS ({nodes_cte}),
outs AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS out_deg,
                CAST(sum(w) AS BIGINT) AS out_w FROM edges GROUP BY src),
ins AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS in_deg,
               CAST(sum(w) AS BIGINT) AS in_w FROM edges GROUP BY dst)
SELECT n.node,
       CAST(coalesce(o.out_deg, 0) AS BIGINT) AS out_deg,
       CAST(coalesce(i.in_deg, 0) AS BIGINT) AS in_deg,
       CAST(coalesce(o.out_w, 0) AS BIGINT) AS out_w,
       CAST(coalesce(i.in_w, 0) AS BIGINT) AS in_w,
       CAST(coalesce(o.out_w, 0) - coalesce(i.in_w, 0) AS BIGINT)
         AS w_balance
FROM nodes n
LEFT JOIN outs o ON o.node = n.node
LEFT JOIN ins i ON i.node = n.node
"""
