"""Differential pins for the r13 optimization-round kernel rewrites
(OPTIMIZATION_r13.md): the hyperplane LSH coefficients moved from
per-row in-expression md5 to Python-precomputed array literals, and the
Lloyd/kcenter/power-iteration literal embedding moved from unrolled
per-element F.lit nodes to single array literals.  Each rewrite must be
BIT-identical to the original arithmetic — these tests pin that against
independent reimplementations of the original forms."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from sequin_spark.session import get_spark

    s = get_spark("test_similarity_kernels", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (i, [((i * 31 + d * 7) % 17 - 8) / 4.0 for d in range(64)])
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_hyperplane_dot_matches_in_expression_md5(spark, emb):
    """The precomputed-coefficient fold must equal the original
    evaluate-md5-per-row SQL form bit-for-bit (same constants, same
    ascending-dim accumulation order)."""
    from sequin_spark.datapipe.similarity import hyperplane_dot

    for plane in (0, 3, 11):
        old = F.expr(
            f"aggregate(sequence(0, 63), cast(0.0 as double), (acc, d) -> "
            f"acc + (instr('0123456789abcdef', substr(md5(concat('{plane}', '_', "
            f"cast(d as string))), 1, 1)) - 1 - 7.5) "
            f"* cast(embedding[d] as double))")
        got = emb.select(
            (hyperplane_dot(plane, "embedding", 64) == old).alias("eq"),
            hyperplane_dot(plane, "embedding", 64).alias("a"),
            old.alias("b"),
        ).collect()
        assert all(r["eq"] for r in got), [
            (r["a"], r["b"]) for r in got if not r["eq"]][:3]


def test_hyperplane_coeff_constants_match_md5(spark):
    """The Python-side constants are exactly the md5-derived values the
    DuckDB oracle recomputes."""
    for plane in (0, 7):
        for d in (0, 1, 63):
            expected = float(int(hashlib.md5(
                f"{plane}_{d}".encode()).hexdigest()[0], 16)) - 7.5
            row = spark.range(1).select(F.expr(
                f"instr('0123456789abcdef', substr(md5('{plane}_{d}'), 1, 1))"
                f" - 1 - 7.5").alias("v")).collect()[0]
            assert row["v"] == expected


def test_kmeans_assign_matches_python_replay(spark, emb):
    """kmeans_clusters (single nested-literal argmin) must replay the
    exact integer trajectory of a pure-Python Lloyd implementation."""
    from sequin_spark.datapipe.similarity import kmeans_clusters

    rows = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    scale, k, iters = 1000, 4, 2
    q = {i: [math.floor(x * scale + 0.5) for x in v] for i, v in rows.items()}
    cents = [q[i] for i in sorted(q)[:k]]

    def assign_py():
        out = {}
        for i, v in q.items():
            dists = [sum((a - b) * (a - b) for a, b in zip(v, c))
                     for c in cents]
            m = min(dists)
            out[i] = (dists.index(m), m)
        return out

    for _ in range(iters):
        a = assign_py()
        sums: dict = {}
        for i, (c, _d) in a.items():
            s, n = sums.setdefault(c, ([0] * 64, 0))
            sums[c] = ([x + y for x, y in zip(s, q[i])], n + 1)
        for j in range(k):
            if j in sums:
                s, n = sums[j]
                cents[j] = [math.floor(x / n) for x in s]
    expected = assign_py()

    got = {r["vec_id"]: (r["cluster"], r["dist2"])
           for r in kmeans_clusters(emb, k=k, iters=iters).collect()}
    assert got == expected
