"""Cross-engine parity for the bounded-memory sketches
(datapipe/sketch.py): the 60-bit md5 hash, KMV, HyperLogLog, and
count-min must produce BIT-IDENTICAL values on Spark and DuckDB —
these are the unit-level twins of the registry oracle rows
(sketch_kmv_distinct / sketch_hll_distinct / sketch_cm_heavy_hitters),
pinning h60 digit-for-digit and each estimator end-to-end on data
small enough to hand-audit.
"""

import duckdb
import pytest

from pyspark.sql import functions as F

from sequin_spark.datapipe.sketch import (
    CM_DEPTH,
    CM_WIDTH,
    HLL_M,
    cm_counters,
    cm_point_estimates,
    h60,
    hll_distinct,
    hll_estimate,
    hll_registers,
    kmv_distinct,
)
from sequin_spark.queries_datapipe import _sql_h60_of

VALUES = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
          "eta", "theta", "iota", "kappa", "42", "hello world", ""]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def test_h60_matches_duckdb_digit_for_digit(spark, duck):
    sdf = spark.createDataFrame([(v,) for v in VALUES], "v string")
    got = {r["v"]: r["h"] for r in
           sdf.select("v", h60(F.col("v")).alias("h")).collect()}
    expr = _sql_h60_of("v")
    vals = ", ".join(f"('{v}')" for v in VALUES)
    want = dict(duck.sql(
        f"SELECT v, {expr} AS h FROM (VALUES {vals}) t(v)").fetchall())
    assert got == want
    # 60-bit range: strictly below 2^60, non-negative
    assert all(0 <= h < 2 ** 60 for h in got.values())


def _word_stream(n=400, distinct=57):
    # skewed repeated stream with a known distinct count
    return [(f"tok{i % distinct}",) for i in range(n)]


def test_kmv_matches_duckdb(spark, duck):
    rows = _word_stream()
    sdf = spark.createDataFrame(rows, "w string")
    got = kmv_distinct(sdf, "w", k=16).collect()[0].asDict()
    h = _sql_h60_of("w")
    vals = ", ".join(f"('{w}')" for (w,) in rows)
    want = duck.sql(f"""
WITH src(w) AS (VALUES {vals}),
h AS (SELECT DISTINCT {h} AS h FROM src),
kk AS (SELECT max(h) AS hk, count(*) AS n
       FROM (SELECT h FROM h ORDER BY h LIMIT 16))
SELECT 16 AS k, hk AS kth_min_hash,
       CASE WHEN n < 16 THEN CAST(n AS DOUBLE)
            ELSE round(15.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE), 2)
       END AS est_distinct
FROM kk""").fetchall()[0]
    assert (got["k"], got["kth_min_hash"], got["est_distinct"]) == want


def test_kmv_exact_below_k(spark):
    sdf = spark.createDataFrame([(f"x{i}",) for i in range(9)], "w string")
    row = kmv_distinct(sdf, "w", k=64).collect()[0]
    assert row["est_distinct"] == 9.0  # fewer than k distinct → exact


def test_hll_matches_duckdb(spark, duck):
    rows = _word_stream()
    sdf = spark.createDataFrame(rows, "w string")
    got = hll_distinct(sdf, "w").collect()[0].asDict()
    h = _sql_h60_of("w")
    vals = ", ".join(f"('{w}')" for (w,) in rows)
    want = duck.sql(f"""
WITH src(w) AS (VALUES {vals}),
h AS (SELECT {h} AS h FROM (SELECT DISTINCT w FROM src) t),
reg AS (SELECT h % 256 AS register, h // 256 AS w FROM h),
rho AS (SELECT register,
               CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END AS rho
        FROM reg),
r AS (SELECT register, max(rho) AS max_rho FROM rho GROUP BY register),
s AS (SELECT COALESCE(CAST(sum(CAST(1 AS BIGINT) << (53 - max_rho))
                           AS BIGINT), 0) AS s_p,
             count(*) AS n_present,
             COALESCE(sum(CASE WHEN max_rho = 0 THEN 1 ELSE 0 END), 0) AS z_p
      FROM r)
SELECT CAST(s_p + (256 - n_present) * 9007199254740992 AS BIGINT) AS s_int,
       CAST(256 - n_present + z_p AS BIGINT) AS n_zero_registers,
       round((CAST(0.7182725932495458 AS DOUBLE) * CAST(65536 AS DOUBLE))
             * CAST(9007199254740992 AS DOUBLE)
             / CAST(s_p + (256 - n_present) * 9007199254740992 AS DOUBLE), 1)
         AS est_distinct
FROM s""").fetchall()[0]
    assert (got["s_int"], got["n_zero_registers"], got["est_distinct"]) == want
    assert got["m"] == HLL_M


def test_hll_registers_mergeable_by_max(spark):
    """merge(A, B) register-wise max == registers(A ∪ B) — the property
    that makes HLL a one-pass mergeable fold across partitions/batches."""
    a = spark.createDataFrame([(f"a{i}",) for i in range(80)], "w string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(70)], "w string")
    ra, rb = hll_registers(a, "w"), hll_registers(b, "w")
    merged = (ra.unionByName(rb).groupBy("register")
              .agg(F.max("max_rho").alias("max_rho")))
    direct = hll_registers(a.unionByName(b), "w")
    assert (hll_estimate(merged).collect()[0].asDict()
            == hll_estimate(direct).collect()[0].asDict())


def test_hll_empty_input_returns_defined_estimate(spark):
    """ADVICE r5: an empty corpus must yield the all-absent-registers
    state (S = m·2^53), not NULL."""
    empty = spark.createDataFrame([], "w string")
    row = hll_estimate(hll_registers(empty, "w")).collect()[0]
    assert row["s_int"] == HLL_M * 2 ** 53
    assert row["n_zero_registers"] == HLL_M
    assert row["est_distinct"] is not None and row["est_distinct"] > 0


def test_cm_matches_duckdb_and_never_underestimates(spark, duck):
    rows = _word_stream(n=300, distinct=23)
    sdf = spark.createDataFrame(rows, "w string")
    counters = cm_counters(sdf, "w")
    cands = sdf.distinct()
    got = {r["w"]: r["cm_estimate"] for r in
           cm_point_estimates(counters, cands, "w").collect()}
    from collections import Counter

    true = Counter(w for (w,) in rows)
    # overestimate-only bound
    assert all(got[w] >= c for w, c in true.items())
    # duckdb replica of the counter fold + point query (single-digest
    # slice hashing, mirroring _sql_cm_bucket)
    from sequin_spark.queries_datapipe import _sql_cm_bucket

    case = " ".join(f"WHEN {r} THEN {_sql_cm_bucket('src.w', r)}"
                    for r in range(CM_DEPTH))
    h = f"(CASE r.row {case} END)"
    vals = ", ".join(f"('{w}')" for (w,) in rows)
    want = dict(duck.sql(f"""
WITH src(w) AS (VALUES {vals}),
rows_t AS (SELECT unnest(generate_series(0, {CM_DEPTH - 1})) AS row),
cell AS (
  SELECT r.row AS row, {h} AS bucket, count(*) AS cnt
  FROM src, rows_t r GROUP BY 1, 2
),
probe AS (
  SELECT src.w AS w, r.row AS row, {h} AS bucket
  FROM (SELECT DISTINCT w FROM src) src, rows_t r
)
SELECT p.w, CAST(min(c.cnt) AS BIGINT)
FROM probe p JOIN cell c USING (row, bucket)
GROUP BY p.w""").fetchall())
    assert got == want


def test_kmv_jaccard_estimates_overlap(spark):
    """Set-operation sketch on a synthetic pair with known overlap:
    A = 0..999, B = 500..1499 → true J = 1/3, intersection 500.  The
    k=256 estimate must land near truth (union sample is uniform), and
    a disjoint pair must report exactly zero overlap."""
    from sequin_spark.datapipe.sketch import kmv_jaccard

    a = spark.createDataFrame([(f"w{i}",) for i in range(1000)], "w string")
    b = spark.createDataFrame([(f"w{i}",) for i in range(500, 1500)],
                              "w string")
    r = kmv_jaccard(a, b, "w", k=256).collect()[0]
    assert r["n_union_sample"] == 256  # estimate branch exercised
    assert abs(r["jaccard"] - 1 / 3) < 0.12
    assert abs(r["est_union"] - 1500) / 1500 < 0.25
    assert abs(r["est_intersection"] - 500) / 500 < 0.4
    c = spark.createDataFrame([(f"z{i}",) for i in range(1000)], "w string")
    r2 = kmv_jaccard(a, c, "w", k=256).collect()[0]
    assert r2["jaccard"] == 0.0 and r2["est_intersection"] == 0.0


def test_hll_union_intersection_known_overlap(spark):
    """A = 0..999, B = 500..1499: union ≈ 1500, intersection ≈ 500
    within HLL's ~1/√m error band; disjoint pair clamps at ≥ 0."""
    from sequin_spark.datapipe.sketch import hll_union_intersection

    a = spark.createDataFrame([(f"w{i}",) for i in range(1000)], "w string")
    b = spark.createDataFrame([(f"w{i}",) for i in range(500, 1500)],
                              "w string")
    r = hll_union_intersection(a, b, "w").collect()[0]
    assert abs(r["est_union"] - 1500) / 1500 < 0.25
    assert abs(r["est_intersection"] - 500) / 500 < 0.6  # IE compounds error
    c = spark.createDataFrame([(f"z{i}",) for i in range(1000)], "w string")
    r2 = hll_union_intersection(a, c, "w").collect()[0]
    assert r2["est_intersection"] >= 0.0
    assert abs(r2["est_union"] - 2000) / 2000 < 0.25


def test_sample_quantile_sketch_error_bound(spark, sf_dir):
    """k=256 hash-sample quantiles land within the sampling error band
    of the exact order statistics (±1.3/√k quantile mass ≈ ±0.08 →
    compare by value rank tolerance, loose)."""
    from sequin_spark.cdc import load_table
    from sequin_spark.datapipe.sampling import exact_quantiles
    from sequin_spark.datapipe.sketch import sample_quantile_sketch

    docs = load_table(spark, sf_dir, "documents")
    est = {r["q"]: r["est_value"]
           for r in sample_quantile_sketch(docs, "doc_id", "n_chars",
                                           k=256).collect()}
    import pyspark.sql.functions as F
    exact = {r["q"]: r["value"] for r in exact_quantiles(
        docs.withColumn("g", F.lit(1)), "g", "n_chars",
        [0.5, 0.9, 0.99]).collect()}
    lo, hi = (docs.agg(F.min("n_chars"), F.max("n_chars")).first())
    spread = hi - lo
    for q in est:
        assert abs(est[q] - exact[q]) <= 0.25 * spread, (q, est, exact)
    # determinism: same sample across repartitionings
    est2 = {r["q"]: r["est_value"]
            for r in sample_quantile_sketch(
                docs.repartition(13), "doc_id", "n_chars",
                k=256).collect()}
    assert est == est2


def test_hll_per_key_vs_exact(spark, sf_dir):
    """Per-key HLL estimates stay within the m=256 error band (~6.5%
    standard error → assert 20%) of exact per-group distincts."""
    from sequin_spark.cdc import load_table
    from sequin_spark.datapipe.sketch import hll_per_key

    import pyspark.sql.functions as F
    ev = load_table(spark, sf_dir, "events")
    est = {r["event_type"]: r["est_distinct"]
           for r in hll_per_key(ev, "event_type", "user_id").collect()}
    exact = {r["event_type"]: r["n"]
             for r in ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert set(est) == set(exact)
    for k in est:
        assert abs(est[k] - exact[k]) / exact[k] < 0.20, (k, est[k],
                                                          exact[k])


def test_bloom_no_false_negatives(spark, sf_dir):
    """The Bloom contract: every true member reports maybe_present —
    no exceptions, at any fill rate."""
    from sequin_spark.cdc import load_table
    from sequin_spark.datapipe.sketch import bloom_build, bloom_probe

    import pyspark.sql.functions as F
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("member"))
    bits = bloom_build(docs, "member")
    verdicts = bloom_probe(bits, docs.select(F.col("member").alias("v")),
                           "v").collect()
    assert verdicts and all(r["maybe_present"] for r in verdicts)


def test_quantiles_per_key_error_bound(spark, sf_dir):
    """Each group's 128-sample quantile estimate sits within the
    sampling-error band of the exact per-group order statistic, and
    the estimate IS a member of the group's values (quantile_disc)."""
    from sequin_spark.cdc import load_table
    from sequin_spark.datapipe.sampling import exact_quantiles
    from sequin_spark.datapipe.sketch import sample_quantile_sketch_per_key

    ev = load_table(spark, sf_dir, "events")
    est = {(r.event_type, r.q): r.est_value
           for r in sample_quantile_sketch_per_key(
               ev, "event_type", "event_id", "value", k=128).collect()}
    exact = {(r.event_type, r.q): r.value
             for r in exact_quantiles(
                 ev, "event_type", "value", [0.5, 0.9, 0.99]).collect()}
    vals = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")).collect()
    spread = {r.event_type: r.hi - r.lo for r in vals}
    assert set(est) == set(exact)
    for (g, q), v in est.items():
        # ±1.96·sqrt(q(1-q)/k) rank error mapped to the value spread is
        # loose for skewed data; use a generous 35%-of-spread band
        assert abs(v - exact[(g, q)]) <= 0.35 * spread[g] + 1e-9


def test_quantiles_per_key_partition_invariant(spark, sf_dir):
    """The per-group sample is a deterministic hash order statistic —
    repartitioning must not change a single estimate."""
    from sequin_spark.cdc import load_table
    from sequin_spark.datapipe.sketch import sample_quantile_sketch_per_key

    ev = load_table(spark, sf_dir, "events")
    a = sorted(map(tuple, sample_quantile_sketch_per_key(
        ev, "event_type", "event_id", "value").collect()))
    b = sorted(map(tuple, sample_quantile_sketch_per_key(
        ev.repartition(17), "event_type", "event_id", "value").collect()))
    assert a == b


def test_ams_f2_python_replay_and_error_band(spark):
    """The 55-estimator median-of-means trajectory replays exactly in
    Python (integer arithmetic end to end), and on a Zipf-ish stream
    the estimate lands within 50% of exact F2 (the 5x11 construction's
    loose but honest band)."""
    import hashlib
    from collections import Counter

    from sequin_spark.datapipe.sketch import ams_f2

    vals = [f"tok{i}" for i in range(60) for _ in range(60 // (i + 1))]
    df = spark.createDataFrame([(v,) for v in vals], ["w"])
    got = ams_f2(df, "w", groups=5, per_group=11).collect()[0]

    cnt = Counter(vals)
    ests = []
    for j in range(55):
        s = 0
        for w, f in cnt.items():
            h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
            s += f if (h >> j) & 1 else -f
        ests.append((j, s * s))
    gm = {}
    for j, e in ests:
        gm.setdefault(j % 5, []).append(e)
    gmeans = sorted((sum(v) // 11, g) for g, v in gm.items())
    expected = gmeans[2][0]  # median of 5 (tie -> lower g wins the rank)
    assert got["f2_est"] == expected
    f2 = sum(f * f for f in cnt.values())
    assert abs(got["f2_est"] - f2) <= 0.5 * f2
