"""Deterministic sampling + exact quantiles (datapipe/sampling.py)."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from sequin_spark.datapipe.sampling import (
    exact_quantiles,
    reservoir_sample,
    stratified_exact_k,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_reservoir_exact_k_and_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s1 = reservoir_sample(docs, "doc_id", 25)
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(r["doc_id"] for r in
                  reservoir_sample(docs, "doc_id", 25).collect())
    assert len(ids1) == 25
    assert ids1 == ids2  # rerunnable: no RNG state
    # k > n: returns everything
    n = docs.count()
    assert reservoir_sample(docs, "doc_id", n + 10).count() == n


def test_reservoir_plan_is_topk_not_global_sort(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(reservoir_sample(docs, "doc_id", 25))
    # TakeOrderedAndProject = per-partition top-k + k-row merge; a Sort
    # node would mean the 100 TB corpus gets globally sorted for a
    # 25-row sample
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_stratified_exact_k_per_stratum(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = stratified_exact_k(docs, "lang", "doc_id", 7)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    per_lang = {r["lang"]: r["n"] for r in
                docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in per_lang.items():
        assert counts[lang] == min(7, n)
    # the sample is a subset of the stratum
    joined = out.join(docs.select("doc_id", F.col("lang").alias("l2")),
                      "doc_id")
    assert joined.filter(F.col("lang") != F.col("l2")).count() == 0


def test_exact_quantiles_match_python(spark):
    import math

    rows = [("a", v) for v in [5, 1, 9, 3, 7, 11, 2]] + \
           [("b", v) for v in [10, 20, 30, 40]]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {(r["g"], r["q"]): r["value"]
           for r in exact_quantiles(df, "g", "v", [0.25, 0.5, 1.0]).collect()}
    for g, vals in (("a", sorted([5, 1, 9, 3, 7, 11, 2])),
                    ("b", [10, 20, 30, 40])):
        for q in (0.25, 0.5, 1.0):
            want = vals[math.ceil(q * len(vals)) - 1]
            assert got[(g, q)] == want, (g, q)


def test_exact_quantiles_one_sort_pass(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(exact_quantiles(docs, "lang", "n_chars",
                                 [0.25, 0.5, 0.75, 0.9]))
    # all four quantiles from ONE within-group sort (explode after the
    # window), not one scan per quantile: exactly two window specs
    # (row_number + per-group count) over a single parquet scan
    assert plan.count("windowspecdefinition") == 2
    import re
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_exact_quantiles_random_differential(spark):
    """Randomized: per-group quantile_disc values equal the sorted-list
    rank ⌈q·n⌉ for arbitrary duplicates/negative values/group sizes."""
    import math
    import random

    rnd = random.Random(99)
    rows = []
    groups = {}
    for g in ["a", "b", "c", "d"]:
        vals = [rnd.randint(-50, 50) for _ in range(rnd.randint(1, 40))]
        groups[g] = sorted(vals)
        rows += [(g, v) for v in vals]
    df = spark.createDataFrame(rows, "g string, v long")
    qs = [0.01, 0.25, 0.33, 0.5, 0.9, 1.0]
    got = {(r["g"], r["q"]): r["value"]
           for r in exact_quantiles(df, "g", "v", qs).collect()}
    for g, vals in groups.items():
        for q in qs:
            assert got[(g, q)] == vals[math.ceil(q * len(vals)) - 1], (g, q)


def test_duplicate_keys_sample_deterministically(spark):
    """ADVICE r7: duplicate key values share the same h60 hash; the
    survivor at the limit boundary must be pinned (full-row hash
    tiebreak), not partition-order dependent."""
    rows = [(f"k{i % 5}", i) for i in range(200)]  # 5 keys × 40 dups
    a = spark.createDataFrame(rows, "key string, payload long")
    b = a.repartition(17)  # different physical layout, same rows

    sa = sorted(map(tuple, reservoir_sample(a, "key", 7).collect()))
    sb = sorted(map(tuple, reservoir_sample(b, "key", 7).collect()))
    assert sa == sb and len(sa) == 7

    ta = sorted(map(tuple,
                    stratified_exact_k(a, "key", "key", 3).collect()))
    tb = sorted(map(tuple,
                    stratified_exact_k(b, "key", "key", 3).collect()))
    assert ta == tb and len(ta) == 15
