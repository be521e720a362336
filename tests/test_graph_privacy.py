"""Kernel tests for datapipe/graph.py (fixed-point PageRank),
datapipe/privacy.py (DP histogram), selection.tfidf_topk, and
similarity.hard_negative_mining — pure-Python replays of the exact
arithmetic the kernels promise, on hand-built inputs."""

import hashlib

import pytest
from pyspark.sql import functions as F

from sequin_spark.datapipe.graph import SCALE, hits_int, pagerank_int
from sequin_spark.datapipe.privacy import (
    dp_count_histogram,
    geometric_cdf_thresholds,
)


def _py_pagerank(nodes, edges, iters=5, d_num=85, d_den=100, scale=SCALE):
    """Reference replay of the kernel's integer trajectory."""
    n = len(nodes)
    teleport = ((d_den - d_num) * scale) // (d_den * n)
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    r = {v: scale // n for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for u, v, w in edges:
            s[v] += (r[u] * w) // out_w[u]
        r = {v: teleport + (d_num * s[v]) // d_den for v in nodes}
    return r


def test_pagerank_matches_python_replay(spark):
    nodes = ["a", "b", "c", "d"]  # d is dangling (no out-edges)
    edges = [("a", "b", 3), ("a", "c", 1), ("b", "c", 2),
             ("c", "a", 1), ("c", "d", 1)]
    ndf = spark.createDataFrame([(v,) for v in nodes], ["node"])
    edf = spark.createDataFrame(edges, ["src", "dst", "w"]).withColumn(
        "w", F.col("w").cast("long"))
    got = {r["node"]: r["rank_int"]
           for r in pagerank_int(ndf, edf, iters=5).collect()}
    assert got == _py_pagerank(nodes, edges)


def test_pagerank_sink_accumulates_more_than_source(spark):
    # b receives everything a has; a only gets teleport back
    ndf = spark.createDataFrame([("a",), ("b",)], ["node"])
    edf = spark.createDataFrame([("a", "b", 1)], ["src", "dst", "w"]).withColumn(
        "w", F.col("w").cast("long"))
    got = {r["node"]: r["rank_int"] for r in pagerank_int(ndf, edf, iters=8).collect()}
    assert got["b"] > got["a"] > 0


def _py_hits(nodes, edges, iters=4, scale=SCALE):
    h = {v: scale for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(iters):
        a = {v: 0 for v in nodes}
        for u, v, w in edges:
            a[v] += h[u] * w
        a_div = max((max(a.values()) + scale - 1) // scale, 1)
        a = {v: x // a_div for v, x in a.items()}
        h = {v: 0 for v in nodes}
        for u, v, w in edges:
            h[u] += a[v] * w
        h_div = max((max(h.values()) + scale - 1) // scale, 1)
        h = {v: x // h_div for v, x in h.items()}
    return a, h


def test_hits_matches_python_replay(spark):
    nodes = ["a", "b", "c", "d"]
    edges = [("a", "b", 2), ("a", "c", 1), ("b", "c", 3),
             ("d", "c", 1), ("c", "a", 1)]
    ndf = spark.createDataFrame([(v,) for v in nodes], ["node"])
    edf = spark.createDataFrame(edges, ["src", "dst", "w"]).withColumn(
        "w", F.col("w").cast("long"))
    got = {r["node"]: (r["authority_int"], r["hub_int"])
           for r in hits_int(ndf, edf, iters=4).collect()}
    ea, eh = _py_hits(nodes, edges)
    assert got == {v: (ea[v], eh[v]) for v in nodes}
    # c collects the most in-link mass -> top authority; the top hub
    # must be a node pointing at c with weight
    assert max(got, key=lambda v: got[v][0]) == "c"


def test_triangle_stats_clique_plus_pendant(spark):
    from sequin_spark.datapipe.graph import triangle_stats

    # 4-clique {a,b,c,d} + pendant e-a: clique nodes have deg 3 (a: 4),
    # 3 triangles each, coefficient 1.0 (a: 3/(4*3/2) = 0.5); e has 0.
    nodes = [(v,) for v in "abcde"]
    edges = []
    for i, u in enumerate("abcd"):
        for v in "abcd"[i + 1:]:
            edges.append((v, u, 1))  # reversed + weighted: must not matter
    edges.append(("a", "e", 7))
    ndf = spark.createDataFrame(nodes, ["node"])
    edf = spark.createDataFrame(edges, ["src", "dst", "w"]).withColumn(
        "w", F.col("w").cast("long"))
    got = {r["node"]: (r["degree"], r["triangles"], r["clustering"])
           for r in triangle_stats(ndf, edf).collect()}
    assert got["a"] == (4, 3, 0.5)
    for v in "bcd":
        assert got[v] == (3, 3, 1.0)
    assert got["e"] == (1, 0, 0.0)


def test_geometric_thresholds_shape():
    cums = geometric_cdf_thresholds(alpha=0.9, trunc_k=40)
    assert len(cums) == 81
    assert cums[-1] == 1.0
    assert all(b > a for a, b in zip(cums, cums[1:]))
    # symmetric mechanism: P(K <= -1) == 1 - P(K <= 0) up to float eps
    assert abs(cums[39] - (1.0 - cums[40])) < 1e-12


def _py_h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_dp_histogram_noise_is_the_keyed_prf_bucket(spark):
    rows = [("s1", "en")] * 7 + [("s1", "de")] * 2 + [("s2", "en")] * 5
    df = spark.createDataFrame(rows, ["source", "lang"])
    out = {(r["source"], r["lang"]): r
           for r in dp_count_histogram(df, ["source", "lang"]).collect()}
    cums = geometric_cdf_thresholds()
    for (src, lang), r in out.items():
        u = _py_h60(f"{src}|{lang}|dp1") / float(1 << 60)
        k = -40 + sum(1 for c in cums if c <= u)
        assert r["k_noise"] == k
        assert r["n_dp"] == max(0, r["n_true"] + k)
    assert out[("s1", "en")]["n_true"] == 7


def test_dp_clamped_sum_bounds_contribution(spark):
    from sequin_spark.datapipe.privacy import dp_clamped_sum

    # one row with an outlier value 10_000: clamp=100 must cap it
    rows = [("s", 50), ("s", 60), ("s", 10_000)]
    df = spark.createDataFrame(rows, ["source", "val"])
    r = dp_clamped_sum(df, ["source"], "val", clamp=100).collect()[0]
    assert r["sum_clamped"] == 50 + 60 + 100
    assert r["sum_dp"] == max(0, r["sum_clamped"] + 100 * r["k_noise"])
    # the keyed-PRF draw replays
    cums = geometric_cdf_thresholds()
    u = _py_h60("s|dpsum1") / float(1 << 60)
    assert r["k_noise"] == -40 + sum(1 for c in cums if c <= u)


def _py_dp_median(values, key, salt="dpq1", decay=(9, 10), scale=10**12):
    from collections import Counter

    cnt = sorted(Counter(values).items())
    n = len(values)
    cum, cands = 0, []
    for v, c in cnt:
        cum += c
        d = abs(2 * cum - n)
        w = scale
        for _ in range(d):
            w = w * decay[0] // decay[1]
        cands.append((v, w))
    tot = sum(w for _, w in cands)
    u = _py_h60(f"{key}|{salt}") / float(1 << 60)
    target = int(u * tot)
    run = 0
    for v, w in cands:
        run += w
        if run > target:
            return v
    return cands[-1][0]


def test_dp_median_matches_python_replay(spark):
    from sequin_spark.datapipe.privacy import dp_quantile_exponential

    vals_a = [10, 20, 20, 30, 40, 50, 60, 70, 80, 90]
    vals_b = [5, 5, 5, 6, 7, 100]
    rows = [("a", v) for v in vals_a] + [("b", v) for v in vals_b]
    df = spark.createDataFrame(rows, ["source", "val"])
    out = {r["source"]: r["dp_q"]
           for r in dp_quantile_exponential(df, ["source"], "val").collect()}
    assert out["a"] == _py_dp_median(vals_a, "a")
    assert out["b"] == _py_dp_median(vals_b, "b")


def test_dp_release_streaming_twin_equals_batch(spark, tmp_path):
    """The DP release atop a streaming aggregation must equal the
    batch histogram over the union of all micro-batches: the counts
    merge across batches (update-mode streaming agg) and the noise is
    a deterministic function of the cell key, so the final releases
    are identical rows."""
    from sequin_spark.datapipe.privacy import (
        attach_dp_noise,
        dp_count_histogram,
    )

    batches = [
        [("s1", "en")] * 5 + [("s2", "de")] * 3,
        [("s1", "en")] * 2 + [("s2", "de")] * 4 + [("s3", "fr")] * 6,
        [("s3", "fr")] * 1 + [("s1", "en")] * 3,
    ]
    src = str(tmp_path / "src")
    schema = "source string, lang string"

    def _write(vals):
        spark.createDataFrame(vals, schema).coalesce(1) \
            .write.mode("append").parquet(src)

    _write(batches[0])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    agg = stream.groupBy("source", "lang").count()
    q = (agg.writeStream.format("memory").queryName("dp_counts")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        for b in batches[1:]:
            _write(b)
            q.processAllAvailable()
        final_counts = spark.table("dp_counts")
        stream_release = attach_dp_noise(
            final_counts, ["source", "lang"], "count").collect()
    finally:
        q.stop()

    union = spark.createDataFrame(
        [r for b in batches for r in b], schema)
    batch_release = dp_count_histogram(union, ["source", "lang"]).collect()
    assert sorted(map(tuple, stream_release)) == sorted(map(tuple, batch_release))
    assert len(batch_release) == 3


def test_tfidf_topk_matches_python_replay(spark):
    from math import log

    from sequin_spark.datapipe.selection import tfidf_topk

    corpus = {1: "alpha beta gamma common common",
              2: "delta beta gamma common common",
              3: "epsilon zeta common common common"}
    docs = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    out = tfidf_topk(docs, k=2).collect()

    # smooth-idf replay: score = (tf/dl) * (ln((1+N)/(1+df)) + 1)
    tf = {(d, t): txt.split().count(t)
          for d, txt in corpus.items() for t in set(txt.split())}
    df_t = {}
    for (_, t) in tf:
        df_t[t] = df_t.get(t, 0) + 1
    n = len(corpus)
    expected = {}
    for d, txt in corpus.items():
        dl = len(txt.split())
        scored = sorted(
            ((round((tf[(d, t)] / dl) * (log((1 + n) / (1 + df_t[t])) + 1), 4), t)
             for t in set(txt.split())),
            key=lambda x: (-x[0], x[1]))
        expected[d] = [(t, s, i + 1) for i, (s, t) in enumerate(scored[:2])]
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append((r["token"], r["tfidf"], r["rk"]))
    got = {d: sorted(v, key=lambda x: x[2]) for d, v in got.items()}
    assert got == expected


def test_kcenter_coreset_covers_clusters_before_density(spark):
    """Three well-separated clusters, one of them 10x denser: greedy
    k-center's first three picks must land in three DIFFERENT clusters
    (a density-proportional sampler would take all three from the
    dense one) — the property that makes it the diversity primitive."""
    from sequin_spark.datapipe.similarity import kcenter_coreset

    rows = []
    # dense cluster along e1 (ids 0..19), sparse ones at e2, e3
    for i in range(20):
        rows.append((i, [1.0, 0.001 * i, 0.0]))
    rows.append((100, [0.0, 1.0, 0.01]))
    rows.append((101, [0.01, 1.0, 0.0]))
    rows.append((200, [0.0, 0.01, 1.0]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    sel = kcenter_coreset(emb, k=3)
    picked = [r["vec_id"] for r in sel.orderBy("sel_round").collect()]
    cluster = lambda i: 0 if i < 100 else (1 if i < 200 else 2)  # noqa: E731
    assert len({cluster(i) for i in picked}) == 3
    assert picked[0] == 0  # deterministic seed = smallest id


def test_hard_negative_margin_sign(spark):
    from sequin_spark.datapipe.similarity import hard_negative_mining

    # two tight same-label clusters far apart: positives are near
    # (cos ~1), negatives are near-orthogonal -> margin strongly > 0
    rows = [
        (0, [1.0, 0.0, 0.01], 0), (1, [1.0, 0.01, 0.0], 0),
        (2, [0.99, 0.0, 0.02], 0),
        (3, [0.0, 1.0, 0.01], 1), (4, [0.01, 1.0, 0.0], 1),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    anchors = emb.filter(F.col("vec_id") == 0)
    out = hard_negative_mining(emb, anchors, k=2).collect()
    assert len(out) == 2
    assert all(r["margin"] > 0.5 for r in out)
    assert {r["n_id"] for r in out} == {3, 4}
    assert [r["rnk"] for r in sorted(out, key=lambda r: r["rnk"])] == [1, 2]


def test_pagerank_random_graphs_match_replay(spark):
    """Seeded random graphs (varying density, dangling nodes, weight
    skew): the Spark trajectory must equal the pure-Python integer
    replay exactly — any float sneaking into the kernel breaks this
    immediately."""
    import random

    rng = random.Random(80831)
    for trial in range(4):
        n = rng.randint(3, 9)
        nodes = [f"n{i}" for i in range(n)]
        edges = []
        for u in nodes:
            if rng.random() < 0.25:
                continue  # dangling node
            for v in rng.sample(nodes, rng.randint(1, n - 1)):
                if u != v:
                    edges.append((u, v, rng.randint(1, 1000)))
        if not edges:
            edges = [(nodes[0], nodes[-1], 1)]
        ndf = spark.createDataFrame([(v,) for v in nodes], ["node"])
        edf = spark.createDataFrame(edges, ["src", "dst", "w"]).withColumn(
            "w", F.col("w").cast("long"))
        got = {r["node"]: r["rank_int"]
               for r in pagerank_int(ndf, edf, iters=4).collect()}
        assert got == _py_pagerank(nodes, edges, iters=4), f"trial {trial}"


def test_hits_random_graphs_match_replay(spark):
    import random

    rng = random.Random(41214)
    for trial in range(3):
        n = rng.randint(3, 8)
        nodes = [f"n{i}" for i in range(n)]
        edges = [(u, v, rng.randint(1, 50))
                 for u in nodes for v in nodes
                 if u != v and rng.random() < 0.5]
        if not edges:
            edges = [(nodes[0], nodes[-1], 2)]
        ndf = spark.createDataFrame([(v,) for v in nodes], ["node"])
        edf = spark.createDataFrame(edges, ["src", "dst", "w"]).withColumn(
            "w", F.col("w").cast("long"))
        got = {r["node"]: (r["authority_int"], r["hub_int"])
               for r in hits_int(ndf, edf, iters=3).collect()}
        ea, eh = _py_hits(nodes, edges, iters=3)
        assert got == {v: (ea[v], eh[v]) for v in nodes}, f"trial {trial}"


def test_dp_median_random_groups_match_replay(spark):
    """Random value multisets (dupes, skew, singleton groups): the
    exponential-mechanism selection replays exactly."""
    import random

    rng = random.Random(90125)
    groups = {}
    for gi in range(6):
        size = rng.choice([1, 3, 20, 80])
        groups[f"g{gi}"] = [rng.randint(0, 50) for _ in range(size)]
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    from sequin_spark.datapipe.privacy import dp_quantile_exponential

    df = spark.createDataFrame(rows, ["source", "val"])
    out = {r["source"]: r["dp_q"]
           for r in dp_quantile_exponential(df, ["source"], "val").collect()}
    for g, vals in groups.items():
        assert out[g] == _py_dp_median(vals, g), g


def test_fold_zero_steps_is_the_exact_zero_floor():
    """The cap is the EXACT step count where the integer decay fold
    reaches 0 — one step earlier it is still positive — so capping
    sequence length at it is behavior-identical to the full fold."""
    from sequin_spark.datapipe.privacy import _fold_zero_steps

    for scale, dn, dd in [(10**12, 9, 10), (10**12, 99, 100),
                          (10**6, 1, 2), (7, 3, 4)]:
        steps = _fold_zero_steps(scale, dn, dd)
        acc = scale
        for _ in range(steps - 1):
            acc = acc * dn // dd
        assert acc > 0
        assert acc * dn // dd == 0


def test_dp_median_large_group_past_fold_cap(spark):
    """A 400-value group drives the rank distance d well past the
    263-step zero floor; the capped kernel must still match the
    UNCAPPED python replay exactly (weights are 0 either way)."""
    import random

    from sequin_spark.datapipe.privacy import dp_quantile_exponential

    rng = random.Random(5150)
    vals = [rng.randint(0, 1000) for _ in range(400)]
    df = spark.createDataFrame([("big", v) for v in vals],
                               ["source", "val"])
    out = dp_quantile_exponential(df, ["source"], "val").collect()
    assert out[0]["dp_q"] == _py_dp_median(vals, "big")


def test_kcenter_coreset_accepts_string_ids(spark):
    """The result id field takes the input id column's type (the
    hardcoded `id long` schema broke string ids at createDataFrame)."""
    from sequin_spark.datapipe.similarity import kcenter_coreset

    rows = [(f"doc{i}", [float(i % 3) + 1.0, float((i * 7) % 5) + 1.0])
            for i in range(12)]
    emb = spark.createDataFrame(rows, "doc string, vec array<float>")
    out = kcenter_coreset(emb, k=3, id_col="doc", vec_col="vec")
    got = out.collect()
    assert len(got) == 3
    assert out.schema["doc"].dataType.simpleString() == "string"
    assert all(isinstance(r["doc"], str) for r in got)


def test_ldp_frequency_python_replay(spark):
    """The k-ary randomized-response branch and the unbiasing replay
    exactly in python: same h60 draw, same sorted-category index map,
    same floor-rescale for the random branch."""
    from sequin_spark.datapipe.privacy import TWO60, ldp_frequency

    rows = [(i, ["red", "green", "blue"][i % 3]) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {r["cat"]: r for r in
           ldp_frequency(df, "source", p_num=3, p_den=4).collect()}

    cats = sorted({c for _, c in rows})
    k, p = len(cats), 0.75
    obs = dict.fromkeys(range(k), 0)
    for i, c in rows:
        u = _py_h60(f"{i}|ldp1") / TWO60
        if u < p:
            obs[cats.index(c)] += 1
        else:
            obs[min(k - 1, int(((u - p) / (1 - p)) * k))] += 1
    n = len(rows)
    for ci, cat in enumerate(cats):
        assert got[cat]["n_obs"] == obs[ci], cat
        want_hat = round((obs[ci] - n * (1 - p) / k) / p, 2)
        assert got[cat]["n_hat"] == want_hat, cat
        assert got[cat]["n_true"] == sum(1 for _, c in rows if c == cat)
    # unbiased-estimator sanity: estimates sum to ~n
    assert abs(sum(g["n_hat"] for g in got.values()) - n) < 1e-6


def test_asof_tolerance_nulls_stale_matches(spark):
    from sequin_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "u1", 1000), (2, "u1", 5000), (3, "u2", 9000)],
        "event_id long, user_id string, ts long")
    right = spark.createDataFrame(
        [(10, "u1", 900), (11, "u1", 4500)],
        "event_id long, user_id string, ts long")
    out = {r["event_id"]: r for r in asof_join(
        left, right, key_cols=["user_id"], ts_col="ts",
        order_col="event_id", right_payload=[], tolerance=600).collect()}
    assert out[1]["event_id_asof"] == 10      # gap 100 <= 600
    assert out[2]["event_id_asof"] == 11      # gap 500 <= 600 (not 10!)
    assert out[3]["event_id_asof"] is None    # no u2 right rows
    # and WITHOUT tolerance the stale match would have been kept
    loose = {r["event_id"]: r for r in asof_join(
        left, right, key_cols=["user_id"], ts_col="ts",
        order_col="event_id", right_payload=[]).collect()}
    assert loose[2]["event_id_asof"] == 11
    tight = {r["event_id"]: r for r in asof_join(
        left, right, key_cols=["user_id"], ts_col="ts",
        order_col="event_id", right_payload=[], tolerance=100).collect()}
    assert tight[2]["event_id_asof"] is None  # gap 500 > 100


def test_fixpoint_driver_and_loop_paths_agree(spark):
    """The bounded-graph driver fast path and the distributed loop are
    the SAME trajectory: force the loop (threshold 0), compare against
    the default fast path (and the Python replay) on random graphs —
    pagerank, HITS, and the min-label connected components."""
    import random

    from sequin_spark.datapipe.dedup import connected_components
    from sequin_spark.datapipe.graph import _DRIVER_FIXPOINT_KEY

    rng = random.Random(14141)
    n = 8
    nodes = [f"n{i}" for i in range(n)]
    edges = [(u, v, rng.randint(1, 900))
             for u in nodes for v in nodes if u != v and rng.random() < 0.4]
    ndf = spark.createDataFrame([(v,) for v in nodes], ["node"])
    edf = spark.createDataFrame(edges, ["src", "dst", "w"]).withColumn(
        "w", F.col("w").cast("long"))
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (5, 6), (6, 1)], ["doc_a", "doc_b"])

    fast = {
        "pr": {r["node"]: r["rank_int"]
               for r in pagerank_int(ndf, edf, iters=4).collect()},
        "hits": {r["node"]: (r["authority_int"], r["hub_int"])
                 for r in hits_int(ndf, edf, iters=3).collect()},
        "cc": {r["doc_id"]: r["cluster_id"]
               for r in connected_components(pairs).collect()},
    }
    spark.conf.set(_DRIVER_FIXPOINT_KEY, "0")
    try:
        loop = {
            "pr": {r["node"]: r["rank_int"]
                   for r in pagerank_int(ndf, edf, iters=4).collect()},
            "hits": {r["node"]: (r["authority_int"], r["hub_int"])
                     for r in hits_int(ndf, edf, iters=3).collect()},
            "cc": {r["doc_id"]: r["cluster_id"]
                   for r in connected_components(pairs).collect()},
        }
    finally:
        spark.conf.unset(_DRIVER_FIXPOINT_KEY)
    assert fast == loop
    assert fast["pr"] == _py_pagerank(nodes, edges, iters=4)
    assert fast["cc"] == {1: 1, 2: 1, 3: 1, 6: 1, 5: 1, 7: 7, 9: 7}
