"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; hyperplane-LSH
bucketing is the scale path (bucket first, then search within buckets →
the candidate set per query is the bucket, not the corpus). Both are
pure Catalyst expressions — the dot products run in whole-stage codegen
via ``aggregate``/``zip_with`` higher-order functions, no Python in the
hot path.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_double(col: str) -> F.Column:
    return F.col(col).cast("array<double>")


def cosine_col(a: str, b: str) -> F.Column:
    """cos(a, b) = dot / (||a|| * ||b||), sequential fold (portable)."""
    dot = F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(as_double(a), F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(as_double(b), F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def hard_negative_mining(
    emb: DataFrame,
    anchors: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Triplet mining for contrastive training data: per anchor, the
    top-``k`` HARD NEGATIVES (highest cosine among different-label
    vectors) plus the margin against the hardest positive
    (max same-label cosine, self excluded):

        margin = round(pos_cos - neg_cos, 3)

    Small/negative margins mark the triplets that actually move a
    contrastive loss — the mining criterion of FaceNet/SBERT-style
    pipelines.  Exact mining is all-pairs BY DESIGN (the eval-scale
    baseline, same contract as brute_force_topk); at 100 TB restrict
    the corpus side with hyperplane_buckets / IVF candidates first and
    mine within the candidate set.
    """
    a = anchors.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(label_col).alias("q_label"),
    )
    c = emb.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        F.col(label_col).alias("n_label"),
    )
    joined = (
        a.crossJoin(c)
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos", cosine_col("q_vec", "n_vec"))
    )
    pos = (
        joined.filter(F.col("q_label") == F.col("n_label"))
        .groupBy("q_id")
        .agg(F.max("cos").alias("pos_cos"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("n_id").asc())
    negs = (
        joined.filter(F.col("q_label") != F.col("n_label"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
    return negs.join(pos, "q_id", "left").select(
        "q_id",
        "n_id",
        "rnk",
        F.round("cos", 3).alias("neg_cos"),
        F.round(F.col("pos_cos") - F.col("cos"), 3).alias("margin"),
    )


def kcenter_coreset(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center coreset (Gonzalez 2-approximation): seed at the
    smallest id, then repeatedly select the point FARTHEST from the
    selected set (max over rows of min cosine distance to any center)
    — the diversity-sampling primitive of coreset / active-learning
    data selection (picks one point per region instead of k from the
    densest cluster).

    Determinism: distances are round(1 − cos, 6) with an id tiebreak
    on the argmax, and the running min-distance column is a `least`
    of already-rounded values — the DuckDB oracle replays the exact
    selection sequence.  Each round is one bounded action (a 1-row
    TakeOrdered argmax that also carries the 64-float center vector),
    the same bounded-collect contract as the power-iteration fit; the
    distance update is a narrow projection over the persisted corpus.
    At 100 TB, k-center runs on the IVF-clustered sample, not the raw
    corpus (greedy k-center is inherently k sequential passes).

    Returns (sel_round, id, dist_sel): dist_sel = the coverage radius
    the point closed when selected (0.0 for the seed); max(dist_sel)
    of later rounds is the final coverage radius.
    """
    from sequin_spark.session import no_aqe

    base = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")).persist()
    seed = base.orderBy("id").limit(1).collect()[0]
    picked = [(0, seed["id"], 0.0)]

    def _dist_to(vec) -> F.Column:
        # one array literal node, not dims unrolled F.lit nodes — keeps
        # the per-round plan growth O(1) nodes (the assign_to_centroids
        # lesson; F.lit round-trips the exact double values)
        lit = F.lit([float(x) for x in vec])
        return F.round(1.0 - cosine_col_vals(F.col("v"), lit), 6)

    # Checkpoint the running min-distance column each round (lazily —
    # the round's argmax collect materializes it): without truncation
    # round r's plan nests r `least(md, dist)` chains, so every round
    # re-evaluates ALL prior centers' distances and compiles a fresh,
    # growing codegen unit.  Truncated, each round is the same O(1)
    # plan shape over (id, v, md) — one new distance per round, the
    # exact greedy recurrence — and the argmax trajectory is unchanged
    # because round(·,6) and least() are computed on identical values.
    # r14: the per-round plans (narrow projection + TakeOrdered over the
    # persisted corpus — no exchange) compile with AQE off: adaptive
    # wrapping/re-planning buys nothing on an exchange-free bounded
    # round and costs measurable per-round driver time (session.no_aqe;
    # the corpus itself was materialized under AQE by the seed collect
    # above).  Same argmax trajectory — AQE never changed a TakeOrdered.
    with no_aqe(emb.sparkSession):
        cur = base.withColumn("md", _dist_to(seed["v"])) \
            .localCheckpoint(eager=False)
        for r in range(1, k):
            far = (cur.orderBy(F.col("md").desc(), F.col("id").asc())
                   .limit(1).collect()[0])
            picked.append((r, far["id"], float(far["md"])))
            cur = cur.withColumn(
                "md", F.least(F.col("md"), _dist_to(far["v"]))) \
                .localCheckpoint(eager=False)
    base.unpersist()
    spark = emb.sparkSession
    # result id field takes the INPUT id column's type (string / int /
    # long ids all round-trip; a hardcoded `id long` broke non-long ids)
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("sel_round", T.IntegerType()),
        T.StructField("id", emb.schema[id_col].dataType),
        T.StructField("dist_sel", T.DoubleType()),
    ])
    return spark.createDataFrame(picked, schema).select(
        "sel_round", F.col("id").alias(id_col), "dist_sel")


def cosine_col_vals(a: F.Column, b: F.Column) -> F.Column:
    """cosine_col over Column operands (not names) — same fold."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def sql_kcenter_coreset(emb_cte: str, k: int = 8) -> str:
    """DuckDB oracle for :func:`kcenter_coreset` — the greedy rounds
    unrolled as materialized CTEs replaying the identical rounded
    distance / id-tiebreak selection."""

    def cos(av: str, bv: str) -> str:
        def dot(x, y):
            return (f"list_sum(list_transform(generate_series(1, len({x})), "
                    f"i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE)))")
        return (f"({dot(av, bv)} / (sqrt({dot(av, av)}) "
                f"* sqrt({dot(bv, bv)})))")

    cte = [
        f"b AS MATERIALIZED ({emb_cte})",
        "c0 AS MATERIALIZED (SELECT id, v FROM b ORDER BY id LIMIT 1)",
        f"""d0 AS MATERIALIZED (
  SELECT b.id, b.v, round(1 - {cos('b.v', 'c0.v')}, 6) AS md
  FROM b, c0)""",
    ]
    sels = ["SELECT 0 AS sel_round, id, 0.0 AS dist_sel FROM c0"]
    for r in range(1, k):
        cte.append(
            f"c{r} AS MATERIALIZED (SELECT id, v, md FROM d{r - 1} "
            f"ORDER BY md DESC, id ASC LIMIT 1)")
        sels.append(f"SELECT {r}, id, md FROM c{r}")
        if r < k - 1:
            cte.append(
                f"""d{r} AS MATERIALIZED (
  SELECT d.id, d.v, least(d.md, round(1 - {cos('d.v', f'c{r}.v')}, 6)) AS md
  FROM d{r - 1} d, c{r})""")
    return ("WITH " + ",\n".join(cte) + "\n"
            + "\nUNION ALL ".join(sels))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (ties broken by id).

    queries × corpus cross join — correct at any scale but O(nq·n);
    use hyperplane_buckets to restrict the corpus side first when nq·n
    is large. The per-query top-k is a window rank, executed as a
    partial top-k per partition by Spark's WindowGroupLimit.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    joined = q.crossJoin(c).filter(F.col("q_id") != F.col("n_id"))
    joined = joined.withColumn("cos", cosine_col("q_vec", "n_vec"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "rnk", F.round("cos", 3).alias("cos"))
    )


def auto_n_planes(n_vectors: int, target_bucket: int = 125,
                  min_planes: int = 4, max_planes: int = 20) -> int:
    """Smallest plane count whose 2^p buckets bound the EXPECTED bucket
    size at ``target_bucket`` vectors — the knob that keeps LSH
    candidate generation LINEAR in corpus size.

    A fixed plane count is a scale-killer: bucket size grows with the
    corpus and within-bucket pairs grow quadratically (measured 35× on
    10× data at the sf0.1→sf1 decade before this rule).  Scaling p with
    log2(n) keeps bucket size ~constant, so pairs grow ~linearly; the
    classic LSH recall/plane tradeoff applies (more planes = stricter
    collisions — production systems pair this with multi-probe).
    Integer-exact on purpose (no float log2): the DuckDB oracle replays
    the identical rule from count(*)."""
    for p in range(min_planes, max_planes + 1):
        if (1 << p) * target_bucket >= n_vectors:
            return p
    return max_planes


def hyperplane_dot(plane: int, vec_col: str, dims: int) -> F.Column:
    """Deterministic pseudo-random hyperplane dot product: coefficient
    for (plane, dim) = first md5 hex digit of '{plane}_{dim}' - 7.5.

    The coefficients are CONSTANTS (md5 of literal strings), so they
    are computed once here in Python and embedded as one array
    literal — the previous in-expression form evaluated dims md5
    digests PER ROW per plane (at 8 planes × 64 dims: 512 digests per
    vector, pure waste at corpus scale).  The fold below multiplies
    coeff × x and accumulates in the same ascending-dim order as the
    old sequence() fold, so every float result is bit-identical (the
    DuckDB oracle recomputes the identical md5 constants)."""
    import hashlib

    coeffs = [
        float(int(hashlib.md5(f"{plane}_{d}".encode()).hexdigest()[0], 16))
        - 7.5
        for d in range(dims)
    ]
    # one parsed SQL expression instead of nested pyspark HOF lambdas
    # (each lambda is several py4j round-trips; 8 planes × 3 lambdas
    # was measurable driver time per bucket-pass build).  The
    # coefficients are exact halves (k − 7.5), so their decimal
    # literals round-trip bit-exactly; the fold order is unchanged.
    coeff_sql = ", ".join(f"{c!r}D" for c in coeffs)
    return F.expr(
        f"aggregate(zip_with(array({coeff_sql}), "
        f"transform({vec_col}, x -> CAST(x AS DOUBLE)), "
        f"(c, x) -> c * x), 0.0D, (acc, y) -> acc + y)")


def hyperplane_buckets(
    emb: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    keep_vec: bool = False,
) -> DataFrame:
    """Sign-random-projection LSH: bucket = bit-pack of sign(plane·x).

    Near vectors (small angle) land in the same bucket with probability
    (1 - θ/π)^planes; ANN search = brute-force within bucket (optionally
    probing neighbor buckets at Hamming distance 1).

    ``keep_vec`` carries the vector column through, so a candidate
    verify that needs the raw vectors doesn't pay a second corpus scan
    + join by id to re-fetch them (one pass instead of two).
    """
    out = emb.select(F.col(id_col), F.col(vec_col))
    bucket = None
    for p in range(n_planes):
        bit = F.when(hyperplane_dot(p, vec_col, dims) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else (bucket + bit)
    out = out.withColumn("bucket", bucket.cast("int"))
    return out if keep_vec else out.drop(vec_col)


def ivf_index(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_train_rows: int = 100_000,
):
    """IVF coarse quantizer: k-means centroids, every vector assigned to
    its nearest centroid's inverted list.

    Scale path: KMeans is FIT ON A SAMPLE (≤ ``max_train_rows`` rows —
    Lloyd's converges on a sample; the index quality loss is negligible)
    and the FULL corpus is assigned with the fitted model's broadcast
    centroids. Build once and reuse the returned index across queries
    via ``ann_ivf_topk(..., index=...)``; the assignments DataFrame is
    cached so repeated searches don't re-scan the corpus.

    Returns (assignments DataFrame with `centroid` column, model).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = emb.withColumn("_features", array_to_vector(as_double(vec_col)))
    n = feat.count()
    train = feat
    if n > max_train_rows:
        train = feat.sample(withReplacement=False, fraction=max_train_rows / n, seed=seed)
    model = KMeans(
        k=n_centroids, seed=seed, featuresCol="_features", predictionCol="centroid"
    ).fit(train)
    assigned = model.transform(feat).drop("_features").cache()
    return assigned, model


def det_centroids(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic Lloyd's k-means in pure DataFrame ops: seeds are
    the k vectors with the smallest md5(id) (pseudo-random but exactly
    reproducible), followed by a FIXED number of assign/recompute
    iterations — no RNG, no ML library state, so the resulting
    centroids (and any IVF search built on them) are oracle-checkable
    bit-for-bit against an external SQL engine. Pass ``id_col=None``
    when ``emb`` is already projected (and cached) to (_id, v).

    Each iteration is one broadcast-join assignment (centroid table is
    k rows — always broadcast) plus a posexplode/groupBy per-dimension
    mean: 2 narrow shuffles per iteration regardless of corpus size.
    Returns the centroid rows as a list of (c_id, [double]) — small by
    definition, embedded as constants by assign_to_centroids.
    """
    owns_cache = False
    if id_col is not None:
        e = emb.select(F.col(id_col).alias("_id"), as_double(vec_col).alias("v")).cache()
        owns_cache = True
    else:  # caller pre-projected (and usually cached) (_id, v)
        e = emb
    # seed selection: global orderBy + limit k → Spark's TakeOrdered
    # (per-partition top-k then driver merge), never a full sort-shuffle
    seed_rows = (
        e.withColumn("h", F.md5(F.col("_id").cast("string")))
        .orderBy("h")
        .limit(k)
        .select("v")
        .collect()
    )
    rows = [(i, [float(x) for x in r["v"]]) for i, r in enumerate(seed_rows)]
    dims = len(rows[0][1])
    # per-dim mean as k×dims avg aggregates: ONE map-side-combined
    # shuffle of k rows per iteration (vs posexplode + double groupBy);
    # collecting k centroids to the driver per iteration truncates the
    # compounding lineage of iterative Lloyd's — exactly what any
    # driver-side k-means loop does, values unchanged → deterministic
    aggs = [F.avg(F.col("v")[i]).alias(f"m{i}") for i in range(dims)]
    for _ in range(iters):
        out = assign_to_centroids(e, rows).groupBy("c_id").agg(*aggs).collect()
        rows = sorted(
            (int(r["c_id"]), [float(r[f"m{i}"]) for i in range(dims)]) for r in out
        )
    if owns_cache:
        e.unpersist()
    return rows


def assign_to_centroids(e: DataFrame, cent_rows: list,
                        with_dist: bool = False) -> DataFrame:
    """Assign each (_id, v) row to its nearest centroid (ties → lowest
    c_id). Centroids are driver-side constants embedded as array
    literals, so assignment is a NARROW map — no join, no shuffle, no
    window; at 100 TB this is the only way the assignment step stays a
    single scan. The argmin is array_min over struct(dist, c_id), whose
    lexicographic struct ordering is exactly the (dist asc, c_id asc)
    tie-break.  ``with_dist`` also attaches the winning squared-L2
    distance as ``_dist`` (drift audits want it; searches don't)."""
    if len(cent_rows) > 256:
        return _assign_via_join(e, cent_rows, with_dist=with_dist)
    # ONE dense literal (cb[p][d]) + a HOF loop over centroid positions,
    # NOT k unrolled zip_with/aggregate branches: the unrolled form's
    # k×dims-node expression tree cost ~4.5s of analysis/codegen at
    # k=16×64 dims — the dominant cost of the whole semdedup fit.
    # cast-from-string keeps the exact double value repr() round-trips.
    cb = "array(" + ",".join(
        "array(" + ",".join(f"cast('{float(x)!r}' as double)" for x in c) + ")"
        for _c_id, c in cent_rows
    ) + ")"
    ids = "array(" + ",".join(str(int(c_id)) for c_id, _c in cent_rows) + ")"
    best = F.expr(
        f"array_min(transform(sequence(0, {len(cent_rows) - 1}), p -> "
        f"struct(aggregate(zip_with(v, element_at({cb}, p + 1), "
        f"(a, b) -> (a - b) * (a - b)), "
        f"cast(0.0 as double), (acc, x) -> acc + x) as dist, "
        f"element_at({ids}, p + 1) as c_id)))"
    )
    out = e.withColumn("c_id", best["c_id"])
    if with_dist:
        out = out.withColumn("_dist", best["dist"])
    return out


def _assign_via_join(e: DataFrame, cent_rows: list,
                     with_dist: bool = False) -> DataFrame:
    """Large-k assignment (auto-k can push k into the thousands at
    corpus scale, where a k×dims SQL literal stops being viable): the
    centroid table rides a BROADCAST cross join and the argmin is a
    map-side-combined min(struct(dist, c_id)) per row — one shuffle of
    N rows, never N×k. Distance arithmetic (zip_with left-to-right sum)
    is identical to the literal path, so values match bit-for-bit."""
    spark = e.sparkSession
    cents = spark.createDataFrame(
        [(int(c_id), [float(x) for x in c]) for c_id, c in cent_rows],
        "c_id int, cvec array<double>",
    )
    dist = F.expr(
        "aggregate(zip_with(v, cvec, (a, b) -> (a - b) * (a - b)), "
        "cast(0.0 as double), (acc, x) -> acc + x)"
    )
    other = [F.first(c).alias(c) for c in e.columns if c not in ("_id", "v")]
    return (
        e.crossJoin(F.broadcast(cents))
        .withColumn("_cand", F.struct(dist.alias("dist"), F.col("c_id")))
        .groupBy("_id")
        .agg(F.first("v").alias("v"), F.min("_cand").alias("_best"), *other)
        .select(*e.columns, F.col("_best.c_id").alias("c_id"),
                *([F.col("_best.dist").alias("_dist")] if with_dist else []))
    )


def ann_ivf_det_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    n_probe: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: "SemDedupIndex | None" = None,
) -> DataFrame:
    """IVF ANN over the deterministic quantizer — same search shape as
    ann_ivf_topk (probe the n_probe nearest inverted lists, cosine
    top-k within them) but exactly reproducible, so the full result is
    hash-checkable against a SQL oracle. Pass ``index`` (a prebuilt
    SemDedupIndex) to search without refitting the quantizer — the fit
    is the expensive step and amortizes across query batches."""
    e = emb.select(F.col(id_col).alias("_id"), as_double(vec_col).alias("v")).cache()
    if index is not None:
        cent_rows = index.centroids
        corpus = e.join(index.assignments, "_id").select(
            F.col("_id").alias("n_id"), F.col("v").alias("n_vec"), "c_id"
        )
    else:
        cent_rows = det_centroids(e, n_centroids, iters, id_col=None)
        corpus = assign_to_centroids(e, cent_rows).select(
            F.col("_id").alias("n_id"), F.col("v").alias("n_vec"), "c_id"
        )
    cent = emb.sparkSession.createDataFrame(cent_rows, "c_id int, c array<double>")
    q = queries.select(F.col(id_col).alias("q_id"), as_double(vec_col).alias("q_vec"))
    dist = F.aggregate(
        F.zip_with(F.col("q_vec"), F.col("c"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("c_id").asc())
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("dist", dist)
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= n_probe)
        .select("q_id", "q_vec", "c_id")
    )
    joined = probes.join(corpus, "c_id").filter(F.col("q_id") != F.col("n_id"))
    joined = joined.withColumn("cos", cosine_col("q_vec", "n_vec"))
    w2 = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        joined.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "rnk", F.round("cos", 3).alias("cos"))
    )


def ann_ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index=None,
) -> DataFrame:
    """IVF ANN: search only the query's ``n_probe`` nearest inverted
    lists — the corpus side shrinks ~n_centroids/n_probe ×.

    Pass ``index=(assigned, model)`` from a prior ivf_index() call to
    search without refitting — index build is the expensive step and
    amortizes across every query batch. The centroid model is tiny →
    broadcast both the assignment and the per-query probe lists; the
    join is centroid-equi (shuffle keyed by centroid, bounded fan-out =
    inverted-list size).
    """
    assigned, model = index if index is not None else ivf_index(
        emb, n_centroids, id_col, vec_col
    )
    # per-query distances to every centroid → top n_probe lists
    centroids = [(int(i), [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    spark = emb.sparkSession
    cent_df = spark.createDataFrame(centroids, f"centroid int, c_vec array<double>")
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    qc = q.crossJoin(F.broadcast(cent_df)).withColumn(
        "c_dist",
        F.aggregate(
            F.zip_with(F.col("q_vec").cast("array<double>"), F.col("c_vec"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("c_dist").asc())
    probes = qc.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= n_probe).select(
        "q_id", "q_vec", "centroid"
    )
    c = assigned.select(F.col(id_col).alias("n_id"), F.col("centroid"), F.col(vec_col).alias("n_vec"))
    joined = probes.join(c, "centroid").filter(F.col("q_id") != F.col("n_id"))
    joined = joined.withColumn("cos", cosine_col("q_vec", "n_vec"))
    w2 = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        joined.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "rnk", F.round("cos", 3).alias("cos"))
    )


def ann_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    probe: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's bucket,
    multi-probing neighbor buckets at Hamming distance ≤ ``probe``.

    With b planes the corpus side shrinks ~2^b×; recall is tunable via
    b and probe (probe=1 adds the b adjacent buckets per query — the
    standard recall/cost dial). This is the 100 TB path: the join is
    bucket-equi, shuffle-partitioned by bucket; only the tiny query
    side is expanded (b+1)×.
    """
    # keep_vec: bucket and vector come out of ONE pass per side — the
    # old join-back by id re-scanned the corpus and shuffled it by id
    # just to re-fetch the vector column the bucket pass already had.
    eb = hyperplane_buckets(emb, n_planes, id_col, vec_col, dims, keep_vec=True)
    qb = hyperplane_buckets(queries, n_planes, id_col, vec_col, dims, keep_vec=True)
    if probe >= 1:
        flips = [F.col("bucket")] + [
            F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)
        ]
        qb = qb.withColumn("bucket", F.explode(F.array(*flips)))
    q = qb.select(
        F.col(id_col).alias("q_id"), F.col("bucket"), F.col(vec_col).alias("q_vec")
    )
    c = eb.select(
        F.col(id_col).alias("n_id"), F.col("bucket"), F.col(vec_col).alias("n_vec")
    )
    joined = q.join(c, "bucket").filter(F.col("q_id") != F.col("n_id"))
    joined = joined.withColumn("cos", cosine_col("q_vec", "n_vec"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "rnk", F.round("cos", 3).alias("cos"))
    )


@dataclass
class SemDedupIndex:
    """Persistable SemDeDup cluster state (the DedupIndex pattern):
    fitted centroids + per-id cluster assignments. Build once per
    corpus, ``save``, and re-runs / incremental passes ``load`` and skip
    the k-means fit and assignment scan entirely."""

    centroids: list  # [(c_id, [double])]
    assignments: DataFrame  # (_id, c_id)

    def save(self, path: str) -> None:
        spark = self.assignments.sparkSession
        self.assignments.write.mode("overwrite").parquet(
            os.path.join(path, "assignments")
        )
        spark.createDataFrame(
            [(int(c), [float(x) for x in v]) for c, v in self.centroids],
            "c_id int, cvec array<double>",
        ).write.mode("overwrite").parquet(os.path.join(path, "centroids"))
        _write_meta_json(path, {"centroids": self.centroids})

    @staticmethod
    def load(spark, path: str) -> "SemDedupIndex":
        meta = _read_meta_json(path)
        if meta:
            cents = _cents_from_json(meta["centroids"])
        else:
            cents = sorted(
                (int(r["c_id"]), [float(x) for x in r["cvec"]])
                for r in spark.read.parquet(os.path.join(path, "centroids")).collect()
            )
        return SemDedupIndex(
            centroids=cents,
            assignments=spark.read.parquet(os.path.join(path, "assignments")),
        )


def ann_recall(
    ground: DataFrame,
    approx: DataFrame,
    k: int,
) -> DataFrame:
    """Recall@k of an ANN result against exact ground truth — the
    standard quality gauge for any approximate index (IVF probes, LSH
    planes, PQ bits are all recall/cost dials; this measures the dial).

    Both inputs are (q_id, n_id, rnk, ...) top-k frames. Returns one
    row per query: hits = |approx ∩ ground|, recall = hits/k. The
    intersection is a (q_id, n_id) semi-join — per-query candidate
    lists are ≤ k rows, so this is a broadcast-scale comparison no
    matter the corpus size behind the two searches."""
    # ONE pass over the ground frame: a left join with a hit marker,
    # then count(marker) per query. A semi-join + separate distinct-q
    # scan would evaluate the (expensive, all-pairs) ground search twice.
    flagged = ground.select("q_id", "n_id").join(
        approx.select("q_id", "n_id").withColumn("_hit", F.lit(1)),
        ["q_id", "n_id"],
        "left",
    )
    return flagged.groupBy("q_id").agg(
        F.count("_hit").cast("long").alias("n_hits"),
        F.round(F.count("_hit") / F.lit(k), 4).alias("recall"),
    )


def build_semdedup_index(
    emb: DataFrame,
    k: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cluster_size: int | None = None,
) -> SemDedupIndex:
    """Fit the deterministic k-means once and capture (centroids,
    assignments) as a SemDedupIndex — the expensive half of both
    semdedup() and ann_ivf_det_topk(). Build per corpus, save, reuse:
    re-running the fit per query call re-pays the seed scan + Lloyd
    iterations + assignment codegen every time, which dominates at
    small-to-mid corpus sizes and is pure waste at 100 TB where the
    corpus (and thus the index) changes incrementally, not per query."""
    e = emb.select(F.col(id_col).alias("_id"), as_double(vec_col).alias("v")).cache()
    if target_cluster_size is not None:
        k = semdedup_auto_k(e.count(), target_cluster_size, k_min=k)
    cent_rows = det_centroids(e, k, iters, id_col=None)
    assignments = assign_to_centroids(e, cent_rows).select("_id", "c_id")
    assignments = assignments.localCheckpoint(eager=True)
    e.unpersist()
    return SemDedupIndex(centroids=cent_rows, assignments=assignments)


def semdedup_auto_k(n_rows: int, target_cluster_size: int, k_min: int = 16) -> int:
    """k ∝ corpus size: with fixed k, within-cluster pairwise work is
    O((N/k)²·k) — quadratic in N. Scaling k with N keeps the expected
    cluster bounded at ``target_cluster_size``, making the pairwise
    step O(N · target_cluster_size) — linear (SemDeDup §3 runs k≈11k
    on LAION for exactly this reason)."""
    return max(k_min, -(-n_rows // target_cluster_size))


def semdedup(
    emb: DataFrame,
    k: int = 8,
    threshold: float = 0.3,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cluster_size: int | None = None,
    index: SemDedupIndex | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space with k-means, then mark WITHIN-cluster items whose
    cosine similarity to a lower-id clustermate reaches ``threshold`` as
    semantic duplicates — the keep rule is deterministic (the lowest id
    in each near-dup pair survives; ``dup_of`` records the kept anchor).

    Returns (id, c_id, dup_of, is_dup) for every input row.

    Scale shape: the pairwise step is confined to single clusters —
    Σ size(cluster)² work, tuned by ``k`` (the paper runs k ≈ 11k on
    LAION; raise k with corpus size to keep clusters bounded). The
    cluster assignment itself is a narrow scan against broadcast
    centroid constants (det_centroids), and the pair join is a
    c_id-keyed equi-join, never a cross join. Deterministic end-to-end
    (md5-seeded Lloyd's, lexicographic tie-breaks) so the full output
    is hash-checkable against a SQL oracle.
    """
    e = emb.select(F.col(id_col).alias("_id"), as_double(vec_col).alias("v")).cache()
    if index is not None:
        # warm path: precomputed assignments join the projected vectors;
        # no fit, no assignment scan
        assigned = e.join(index.assignments, "_id")
    else:
        if target_cluster_size is not None:
            # auto-k: bound the expected cluster size at any corpus scale
            k = semdedup_auto_k(e.count(), target_cluster_size, k_min=k)
        cent_rows = det_centroids(e, k, iters, id_col=None)
        assigned = assign_to_centroids(e, cent_rows)
    # hoist the vector norms out of the pair loop: ||v|| is computed once
    # per VECTOR (N narrow evals), not once per PAIR — the pair join then
    # evaluates a single dot-product fold per candidate instead of three.
    # Identical fold arithmetic → values match the oracle bit-for-bit.
    norm = F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x))
    # materialize assignment+norm ONCE: the k×dims assignment scan would
    # otherwise re-run for each self-join side and the final output join
    with_norm = assigned.withColumn("nv", norm).localCheckpoint()
    a = with_norm.select(F.col("_id").alias("a_id"), F.col("v").alias("a_v"),
                         F.col("nv").alias("a_n"), "c_id")
    b = with_norm.select(F.col("_id").alias("b_id"), F.col("v").alias("b_v"),
                         F.col("nv").alias("b_n"), "c_id")
    dot = F.aggregate(
        F.zip_with(F.col("a_v"), F.col("b_v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dup_of = (
        a.join(b, "c_id")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("cos", dot / (F.col("a_n") * F.col("b_n")))
        .filter(F.col("cos") >= threshold)
        .groupBy(F.col("b_id").alias("_id"))
        .agg(F.min("a_id").alias("dup_of"))
    )
    out = (
        with_norm.select("_id", "c_id").join(dup_of, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "c_id",
            "dup_of",
            F.col("dup_of").isNotNull().alias("is_dup"),
        )
    )
    e.unpersist()
    return out


# ---------------------------------------------------------------------------
# Product quantization (PQ) — Jégou et al. 2011, "Product Quantization
# for Nearest Neighbor Search": split each vector into m subvectors,
# vector-quantize each subspace with its own small codebook, and search
# by asymmetric distance computation (ADC): per query, precompute the
# m×ksub table of subspace distances, then a corpus item's distance is
# m table lookups instead of a d-dim multiply. The corpus is stored as
# m small codes per vector (64 dims of float32 → 4 bytes at m=4,
# ksub≤256: a 64× memory-bandwidth reduction — the reason PQ is the
# standard 100 TB-scale ANN layout).


def pq_codebooks(
    emb: DataFrame,
    m: int = 4,
    ksub: int = 8,
    iters: int = 1,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Per-subspace deterministic codebooks — md5-seeded Lloyd's per
    subvector projection, all m subspaces fitted JOINTLY: the seed rows
    are the same rows in every subspace (one TakeOrdered collect of the
    full vectors, sliced driver-side) and each Lloyd iteration runs as a
    single pass — per-subspace assignment against embedded constants
    (narrow), then ONE (j, c_id)-keyed mean shuffle for every subspace
    at once, instead of m separate fits (m × iters Spark jobs → iters).
    Values are bit-identical to fitting each subspace independently:
    assignments never cross subspaces and the per-dimension means are
    the same aggregates. Returns [subspace][(c_id, centroid)] —
    m×ksub×(dims/m) doubles, driver-side constants by design."""
    sub = dims // m
    e = emb.select(
        F.col(id_col).alias("_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    ).cache()
    seed_rows = (
        e.withColumn("h", F.md5(F.col("_id").cast("string")))
        .orderBy("h")
        .limit(ksub)
        .select("v")
        .collect()
    )
    books = [
        [
            (i, [float(x) for x in r["v"][j * sub:(j + 1) * sub]])
            for i, r in enumerate(seed_rows)
        ]
        for j in range(m)
    ]
    mean_aggs = [F.avg(F.col("sv")[i]).alias(f"m{i}") for i in range(sub)]
    for _ in range(iters):
        # per row: (j, nearest c_id, subvector) for every subspace, via
        # the dense codebook literal + HOF loops — the expression tree
        # stays constant-size instead of m×ksub unrolled branches (the
        # unrolled form spent seconds per iteration in analysis/codegen)
        cb = _cb_literal(books, ksub, sub)
        assign = (
            f"transform(sequence(0, {m - 1}), j -> struct("
            f"j as j, "
            f"array_min(transform(sequence(0, {ksub - 1}), c -> "
            f"struct(aggregate(zip_with(slice(v, j * {sub} + 1, {sub}), "
            f"element_at(element_at({cb}, j + 1), c + 1), "
            f"(a, b) -> (a - b) * (a - b)), "
            f"cast(0.0 as double), (acc, x) -> acc + x) as dist, c as c_id))).c_id as c_id, "
            f"slice(v, j * {sub} + 1, {sub}) as sv))"
        )
        exploded = e.select(F.explode(F.expr(assign)).alias("s")).select(
            "s.j", "s.c_id", "s.sv"
        )
        out = exploded.groupBy("j", "c_id").agg(*mean_aggs).collect()
        books = [[] for _ in range(m)]
        for r in out:
            books[int(r["j"])].append(
                (int(r["c_id"]), [float(r[f"m{i}"]) for i in range(sub)])
            )
        books = [sorted(b) for b in books]
    e.unpersist()
    return books


def _cb_literal(books: list, ksub: int, sub: int) -> str:
    """Dense 3-D codebook literal cb[j][c][d] (1-based SQL indexing).
    Missing centroid ids (empty clusters — possible only on degenerate
    data) are densified with 1e18 dummies whose distance dwarfs every
    real one, so positional index == centroid id always holds. ONE
    literal + HOF loops keeps the expression tree (and its codegen)
    constant-size, vs m×ksub unrolled branches."""
    subs = []
    for book in books:
        dense = {c_id: c for c_id, c in book}
        rows = []
        for c in range(ksub):
            vec = dense.get(c, [1e18] * sub)
            rows.append(
                "array(" + ",".join(
                    f"cast('{float(x)!r}' as double)" for x in vec) + ")"
            )
        subs.append("array(" + ",".join(rows) + ")")
    return "array(" + ",".join(subs) + ")"


def _pq_code_expr(vec_col: str, books: list, dims: int, ksub: int | None = None) -> F.Column:
    """array<int> of per-subspace nearest-centroid ids — a NARROW map
    against the embedded codebook literal (the assign_to_centroids trick
    per subspace); encoding 100 TB is a single scan, no shuffle."""
    m = len(books)
    sub = dims // m
    ksub = ksub or max(c_id for b in books for c_id, _ in b) + 1
    cb = _cb_literal(books, ksub, sub)
    return F.expr(
        f"transform(sequence(0, {m - 1}), j -> "
        f"array_min(transform(sequence(0, {ksub - 1}), c -> "
        f"struct(aggregate(zip_with("
        f"transform(slice({vec_col}, j * {sub} + 1, {sub}), x -> cast(x as double)), "
        f"element_at(element_at({cb}, j + 1), c + 1), "
        f"(a, b) -> (a - b) * (a - b)), "
        f"cast(0.0 as double), (acc, x) -> acc + x) as dist, c as c_id))).c_id)"
    )


def pq_encode(
    emb: DataFrame,
    books: list,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code array<int>) for every vector."""
    return emb.select(
        F.col(id_col), _pq_code_expr(vec_col, books, dims).alias("code")
    )


def _save_books(spark, books: list, path: str) -> None:
    spark.createDataFrame(
        [(j, int(c_id), [float(x) for x in c])
         for j, book in enumerate(books) for c_id, c in book],
        "j int, c_id int, cvec array<double>",
    ).write.mode("overwrite").parquet(path)


def _write_meta_json(path: str, payload: dict) -> None:
    """Tiny driver-side artifacts (codebooks/centroids) as a JSON
    sidecar: loading them back needs zero Spark jobs. Python floats
    JSON-round-trip exactly (shortest-repr), so determinism holds."""
    import json

    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, os.path.join(path, "meta.json"))


def _read_meta_json(path: str) -> dict | None:
    import json

    p = os.path.join(path, "meta.json")
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _books_from_json(raw: list) -> list:
    return [
        sorted((int(c_id), [float(x) for x in c]) for c_id, c in book)
        for book in raw
    ]


def _cents_from_json(raw: list) -> list:
    return sorted((int(c_id), [float(x) for x in c]) for c_id, c in raw)


def _load_books(spark, path: str) -> list:
    rows = spark.read.parquet(path).collect()
    m = max(int(r["j"]) for r in rows) + 1
    books: list = [[] for _ in range(m)]
    for r in rows:
        books[int(r["j"])].append(
            (int(r["c_id"]), [float(x) for x in r["cvec"]])
        )
    return [sorted(b) for b in books]


@dataclass
class PQIndex:
    """Persistable PQ state: per-subspace codebooks + the encoded corpus
    (the stored-codes layout that IS the point of PQ at 100 TB). The
    codebook fit and the corpus encode scan — most of the query's cost —
    run once per corpus; searches load and go straight to ADC."""

    books: list            # [subspace][(c_id, centroid)]
    codes: DataFrame       # (id, code array<int>)
    dims: int = 64

    def save(self, path: str) -> None:
        spark = self.codes.sparkSession
        _save_books(spark, self.books, os.path.join(path, "books"))
        self.codes.write.mode("overwrite").parquet(os.path.join(path, "codes"))
        _write_meta_json(path, {"books": self.books})

    @staticmethod
    def load(spark, path: str, dims: int = 64) -> "PQIndex":
        # codebooks are driver-side constants (m×ksub rows): the JSON
        # sidecar skips the Spark read+collect (~2 s of jobs for KBs of
        # data); parquet remains the durable/Spark-readable form
        meta = _read_meta_json(path)
        books = (_books_from_json(meta["books"]) if meta else
                 _load_books(spark, os.path.join(path, "books")))
        return PQIndex(
            books=books,
            codes=spark.read.parquet(os.path.join(path, "codes")),
            dims=dims,
        )


def build_pq_index(
    emb: DataFrame,
    m: int = 4,
    ksub: int = 8,
    iters: int = 1,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> PQIndex:
    books = pq_codebooks(emb, m, ksub, iters, dims, id_col, vec_col)
    return PQIndex(
        books=books, codes=pq_encode(emb, books, dims, id_col, vec_col),
        dims=dims,
    )


@dataclass
class IVFPQIndex:
    """Persistable IVF-PQ state: coarse centroids + per-subspace
    codebooks + the corpus as (id, inverted-list id, PQ code). Probing
    a saved index costs one broadcast of the query LUTs + a scan of the
    probed lists — no fitting, no re-encoding."""

    cent_rows: list        # [(c_id, [double])] coarse quantizer
    books: list            # [subspace][(c_id, centroid)]
    corpus: DataFrame      # (n_id, c_id, code)
    dims: int = 64

    def save(self, path: str) -> None:
        spark = self.corpus.sparkSession
        spark.createDataFrame(
            [(int(c), [float(x) for x in v]) for c, v in self.cent_rows],
            "c_id int, c array<double>",
        ).write.mode("overwrite").parquet(os.path.join(path, "centroids"))
        _save_books(spark, self.books, os.path.join(path, "books"))
        # partitioned by inverted list: probing n_probe lists prunes the
        # rest of the corpus at the parquet layer
        self.corpus.write.mode("overwrite").partitionBy("c_id").parquet(
            os.path.join(path, "corpus")
        )
        _write_meta_json(path, {"centroids": self.cent_rows,
                                "books": self.books})

    @staticmethod
    def load(spark, path: str, dims: int = 64) -> "IVFPQIndex":
        meta = _read_meta_json(path)
        if meta:
            cents = _cents_from_json(meta["centroids"])
            books = _books_from_json(meta["books"])
        else:
            cents = sorted(
                (int(r["c_id"]), [float(x) for x in r["c"]])
                for r in spark.read.parquet(os.path.join(path, "centroids")).collect()
            )
            books = _load_books(spark, os.path.join(path, "books"))
        return IVFPQIndex(
            cent_rows=cents,
            books=books,
            corpus=spark.read.parquet(os.path.join(path, "corpus")),
            dims=dims,
        )


def build_ivfpq_index(
    emb: DataFrame,
    n_centroids: int = 8,
    m: int = 16,
    ksub: int = 16,
    iters_coarse: int = 1,
    iters_pq: int = 2,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IVFPQIndex:
    e = emb.select(F.col(id_col).alias("_id"), as_double(vec_col).alias("v")).cache()
    cent_rows = det_centroids(e, n_centroids, iters_coarse, id_col=None)
    corpus = assign_to_centroids(e, cent_rows).select(
        F.col("_id").alias("n_id"), "c_id"
    )
    books = pq_codebooks(emb, m, ksub, iters_pq, dims, id_col, vec_col)
    codes = pq_encode(emb, books, dims, id_col, vec_col).select(
        F.col(id_col).alias("n_id"), "code"
    )
    out = IVFPQIndex(
        cent_rows=cent_rows, books=books,
        corpus=corpus.join(codes, "n_id"), dims=dims,
    )
    e.unpersist()
    return out


def pq_adc_topk(
    emb: DataFrame,
    queries: DataFrame,
    books: list,
    k: int = 3,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k: rank corpus items by the PQ approximation of L2
    distance. Pass ``codes`` from a prior pq_encode() to search a
    prebuilt index (the 100 TB layout: codes are the stored corpus).

    The per-query lookup table (m×ksub subspace distances against the
    codebook constants) is computed once per query row and shipped with
    the broadcast query side; the corpus-side scan does m
    element_at lookups per item — no vector arithmetic, no shuffle on
    the corpus beyond the final per-query top-k window.
    """
    m = len(books)
    sub = dims // m
    ksub = max(c_id for b in books for c_id, _ in b) + 1
    if codes is None:
        codes = pq_encode(emb, books, dims, id_col, vec_col)
    # tab[j][c] = || q_subvec_j - codebook_j[c] ||² — same dense literal
    # as the encoder, looped with HOFs (constant-size expression tree)
    cb = _cb_literal(books, ksub, sub)
    tab = (
        f"transform(sequence(0, {m - 1}), j -> "
        f"transform(sequence(0, {ksub - 1}), c -> "
        f"aggregate(zip_with("
        f"transform(slice({vec_col}, j * {sub} + 1, {sub}), x -> cast(x as double)), "
        f"element_at(element_at({cb}, j + 1), c + 1), "
        f"(a, b) -> (a - b) * (a - b)), "
        f"cast(0.0 as double), (acc, x) -> acc + x)))"
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.expr(tab).alias("tab"),
    )
    c = codes.select(F.col(id_col).alias("n_id"), "code")
    joined = c.join(F.broadcast(q)).filter(F.col("q_id") != F.col("n_id"))
    adc = F.expr(
        f"aggregate(sequence(0, {m - 1}), cast(0.0 as double), "
        f"(acc, j) -> acc + element_at(element_at(tab, j + 1), "
        f"element_at(code, j + 1) + 1))"
    )
    # rank on the ROUNDED distance so mathematically-equal codes tie
    # exactly (then n_id) on both Spark and the SQL oracle
    joined = joined.withColumn("adc", F.round(adc, 3))
    w = Window.partitionBy("q_id").orderBy(F.col("adc").asc(), F.col("n_id").asc())
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "rnk", "adc")
    )


def ann_ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    n_probe: int = 4,
    m: int = 16,
    ksub: int = 16,
    iters_coarse: int = 1,
    iters_pq: int = 2,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: IVFPQIndex | None = None,
) -> DataFrame:
    """IVF-PQ — the canonical large-scale ANN layout (FAISS IVFPQ,
    Jégou et al. 2011 §IV): a coarse quantizer restricts the search to
    ``n_probe`` inverted lists, and within them distance is the PQ/ADC
    approximation over stored codes, so the scan touches m bytes per
    candidate instead of d floats AND only ~n_probe/n_centroids of the
    corpus. (Simplification vs the paper: PQ encodes raw vectors, not
    coarse residuals — keeps the per-subspace codebooks shared across
    lists and the SQL oracle tractable; recall at these sizes is
    equivalent.) Fully deterministic → hash-checked end-to-end.

    Pass ``index`` (from build_ivfpq_index / IVFPQIndex.load) to search
    a prebuilt index: no quantizer fit, no corpus encode — the warm
    path whose cost is just the probe join.
    """
    if index is None:
        index = build_ivfpq_index(
            emb, n_centroids, m, ksub, iters_coarse, iters_pq, dims,
            id_col, vec_col,
        )
    cent_rows, books, corpus = index.cent_rows, index.books, index.corpus
    m, dims = len(index.books), index.dims
    sub = dims // m
    ksub_eff = max(c_id for b in books for c_id, _ in b) + 1
    cb = _cb_literal(books, ksub_eff, sub)
    tab = (
        f"transform(sequence(0, {m - 1}), j -> "
        f"transform(sequence(0, {ksub_eff - 1}), c -> "
        f"aggregate(zip_with("
        f"transform(slice({vec_col}, j * {sub} + 1, {sub}), x -> cast(x as double)), "
        f"element_at(element_at({cb}, j + 1), c + 1), "
        f"(a, b) -> (a - b) * (a - b)), "
        f"cast(0.0 as double), (acc, x) -> acc + x)))"
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        as_double(vec_col).alias("q_vec"),
        F.expr(tab).alias("tab"),
    )
    cent = emb.sparkSession.createDataFrame(cent_rows, "c_id int, c array<double>")
    cdist = F.aggregate(
        F.zip_with(F.col("q_vec"), F.col("c"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("cdist").asc(), F.col("c_id").asc())
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("cdist", cdist)
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= n_probe)
        .select("q_id", "tab", "c_id")
    )
    cand = probes.join(corpus, "c_id").filter(F.col("q_id") != F.col("n_id"))
    adc = F.expr(
        f"aggregate(sequence(0, {m - 1}), cast(0.0 as double), "
        f"(acc, j) -> acc + element_at(element_at(tab, j + 1), "
        f"element_at(code, j + 1) + 1))"
    )
    cand = cand.withColumn("adc", F.round(adc, 3))
    w = Window.partitionBy("q_id").orderBy(F.col("adc").asc(), F.col("n_id").asc())
    out = (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "rnk", "adc")
    )
    return out


def top_principal_component(
    e: DataFrame,
    col: str = "embedding",
    dims: int = 64,
    iters: int = 4,
    quant: int = 6,
) -> list[float]:
    """Top principal direction of the embedding corpus's (uncentered)
    second moment via power iteration — the anisotropy direction that
    "All-but-the-Top" (Mu & Viswanath 2018, arXiv:1702.01417) removes
    before similarity search.

    v_{t+1} = quantize(normalize(Σ_i x_i (x_i · v_t))).  Each iteration
    is ONE corpus pass: a per-row dot-product fold against the
    broadcast-literal v_t plus dims map-side-combined sum aggregates;
    the driver collects dims values per round (bounded, the same
    truncate-the-lineage shape as the deterministic Lloyd fits) and
    QUANTIZES to ``quant`` decimals, so both engines' next-iteration
    input is literal-identical and float drift cannot compound across
    iterations.  Sign is canonicalized (largest-|component| dim made
    positive) because an eigenvector's sign is arbitrary."""
    import math

    x = e.select(F.col(col).cast("array<double>").alias("x"))
    v = [round(1.0 / math.sqrt(dims), quant)] * dims
    for _ in range(iters):
        # one literal node per iteration (not dims parsed cast exprs);
        # F.lit carries the exact double values, same as the repr cast
        varr = F.lit([float(c) for c in v])
        dot = F.aggregate(
            F.zip_with(F.col("x"), varr, lambda a, b: a * b),
            F.lit(0.0), lambda acc, y: acc + y)
        # w = Σ_i x_i·dot_i as posexplode → one dims-group hash
        # aggregate, NOT dims separate F.sum aggregates: the 64-sum
        # plan re-ran ~1 s of analysis/planning per iteration (r13
        # optimization round; measured 4.0 s build for 4 iters at
        # sf0.1).  Per-dim float accumulation order is unchanged — the
        # partial hash aggregate folds rows in scan order per
        # partition exactly as the per-column sums did, so the
        # collected doubles (and hence the quantized trajectory) are
        # bit-identical.
        rows = (x.withColumn("_dot", dot)
                .select(F.posexplode(
                    F.transform(F.col("x"),
                                lambda c: c * F.col("_dot"))))
                .groupBy("pos").agg(F.sum("col").alias("w"))
                .collect())
        w_by_d = {r["pos"]: float(r["w"]) for r in rows}
        w = [w_by_d[d] for d in range(dims)]
        norm = math.sqrt(math.fsum(c * c for c in w))
        v = [round(c / norm, quant) for c in w]
    mi = max(range(dims), key=lambda d: (abs(v[d]), -d))
    if v[mi] < 0:
        v = [c * -1.0 for c in v]
    return [round(c + 0.0, quant) for c in v]  # −0.0 → +0.0


def remove_top_component(
    e: DataFrame,
    v: list[float],
    col: str = "embedding",
) -> DataFrame:
    """All-but-the-Top debias (arXiv:1702.01417): x' = x − (x·v)v for
    the corpus anisotropy direction ``v`` (top_principal_component).
    Narrow map — one dot fold + one zip_with per row, no shuffle; the
    projection literal rides in the plan like the Lloyd centroids."""
    varr = F.lit([float(c) for c in v])
    x = F.col(col).cast("array<double>")
    dot = F.aggregate(F.zip_with(x, varr, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, y: acc + y)
    return (e.withColumn("_dot", dot)
            .withColumn(
                "debiased",
                F.zip_with(x, varr,
                           lambda a, b: a - F.col("_dot") * b))
            .drop("_dot"))


def kmeans_clusters(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Lloyd k-means in INTEGER fixed-point — the semantic-balance
    primitive (cluster-proportional sampling, per-cluster dedup
    budgets; the clustering step of SemDeDup/DataComp-style curation
    pipelines) — deterministic to the last bit so a SQL oracle can
    replay it exactly:

    * vectors quantize to BIGINT via floor(x·scale + 0.5) (floor is
      exact in both engines; float round() half-mode differences
      can't leak in);
    * init = the k smallest-id vectors' quantized forms;
    * assignment = integer argmin of squared L2, ties to the lowest
      centroid index (array_position finds the FIRST minimum);
    * update = per-dimension floor(sum / count) — sums are exact
      BIGINTs (≤ scale·n per dimension, far under 2^52), so the
      double-division floor is bit-identical everywhere; a cluster
      that loses every member keeps its previous centroid.

    Scale shape: per iteration ONE narrow pass computes the argmin
    against k·dim broadcast literals (no join, no shuffle) and ONE
    posexplode → partial-agg shuffle whose map-side combine reduces
    each partition to ≤ k·dim rows; the driver collects k·dim
    integers per iteration (the kcenter/power-iteration bounded-
    collect contract).  Returns (id, cluster, dist2) — dist2 the
    integer squared distance to the FINAL centroid.
    """
    from sequin_spark.session import no_aqe

    q = emb.select(
        F.col(id_col).alias("id"),
        F.transform(
            vec_col,
            lambda x: F.floor(x.cast("double") * scale + F.lit(0.5))
            .cast("long")).alias("q"),
    ).persist()
    seeds = q.orderBy("id").limit(k).collect()
    cents: dict[int, list[int]] = {
        j: list(r["q"]) for j, r in enumerate(seeds)}
    dim = len(cents[0])

    def assign(df: DataFrame) -> DataFrame:
        # ONE nested array literal + a HOF loop over centroids, not k
        # unrolled zip_with/aggregate branches — the assign_to_centroids
        # lesson: the unrolled k×dim expression tree's analysis/codegen
        # cost dominated the whole fit (measured 4.1 → 3.0 s for the
        # sf0.1 query, outputs bit-identical — same integer arithmetic,
        # same j order).
        cent_lit = F.lit([[int(c) for c in cents[j]] for j in range(k)])
        dists = F.transform(cent_lit, lambda c: F.aggregate(
            F.zip_with(F.col("q"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"), lambda acc, x: acc + x))
        return (df.withColumn("_d", dists)
                .withColumn("cluster",
                            (F.array_position(
                                "_d", F.array_min("_d")) - 1)
                            .cast("int"))
                .withColumn("dist2", F.array_min("_d")))

    # r14: the per-iteration fit queries compile with AQE off — the one
    # exchange per round carries ≤ k·dim map-side-combined rows at ANY
    # corpus scale (the partial agg bounds it), so adaptive re-planning
    # buys nothing and costs one scheduler job per stage per round
    # (measured 8 → 5 jobs, ~20% wall on the sf0.1 fit).  The corpus
    # was materialized under AQE by the seed collect above; the final
    # assign below compiles adaptively again (outside the guard).
    # reduce-side cardinality is exactly k·dim (the group key space), so
    # the fit's exchange runs at a width derived from that bound —
    # 4096 groups/task, session width as the cap — instead of a full
    # session-width task wave per round at any corpus scale
    fit_parts = min(int(emb.sparkSession.conf.get(
        "spark.sql.shuffle.partitions")), k * dim // 4096 + 1)
    for _ in range(iters):
        a = assign(q)
        with no_aqe(emb.sparkSession, shuffle_partitions=fit_parts):
            stats = (a.select("cluster", F.posexplode("q")
                              .alias("pos", "val"))
                     .groupBy("cluster", "pos")
                     .agg(F.sum("val").alias("s"),
                          F.count("*").alias("n"))
                     .collect())                 # ≤ k·dim rows
        new: dict[int, list[int]] = {}
        for r in stats:
            new.setdefault(r["cluster"], [0] * dim)[r["pos"]] = (
                math.floor(r["s"] / r["n"]))
        for j in range(k):                       # empty → keep old
            cents[j] = new.get(j, cents[j])
    out = assign(q).select(
        F.col("id").alias(id_col), "cluster", "dist2")
    q.unpersist()
    return out


def sql_kmeans_clusters(emb_cte: str, k: int = 8, iters: int = 3,
                        dim: int = 64, scale: int = 1000) -> str:
    """DuckDB oracle for :func:`kmeans_clusters` — the Lloyd rounds
    unrolled as materialized CTEs replaying the identical quantize /
    argmin-tiebreak / floor-mean sequence (the sql_kcenter_coreset
    pattern)."""
    d = (f"list_sum(list_transform(generate_series(1, {dim}), "
         f"i -> (b.q[i] - c.c[i]) * (b.q[i] - c.c[i])))")
    cte = [
        f"""b AS MATERIALIZED (
  SELECT id, list_transform(v, x ->
    CAST(floor(CAST(x AS DOUBLE) * {scale} + 0.5) AS BIGINT)) AS q
  FROM ({emb_cte}))""",
        f"""c0 AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INTEGER) AS j,
         q AS c
  FROM (SELECT id, q FROM b ORDER BY id LIMIT {k}))""",
    ]
    for it in range(1, iters + 1):
        prev = f"c{it - 1}"
        cte.append(f"""a{it} AS MATERIALIZED (
  SELECT id, q, j AS cluster, d AS dist2 FROM (
    SELECT b.id, b.q, c.j, {d} AS d,
           row_number() OVER (PARTITION BY b.id
                              ORDER BY {d} ASC, c.j ASC) AS rn
    FROM b, {prev} c) WHERE rn = 1)""")
        if it <= iters:
            cte.append(f"""s{it} AS MATERIALIZED (
  SELECT cluster AS j, i, SUM(q[i]) AS s, COUNT(*) AS n
  FROM a{it}, generate_series(1, {dim}) AS g(i)
  GROUP BY cluster, i)""")
            cte.append(f"""c{it} AS MATERIALIZED (
  SELECT p.j,
         coalesce(nc.c, p.c) AS c
  FROM {prev} p LEFT JOIN (
    SELECT j, list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT)
                   ORDER BY i) AS c
    FROM s{it} GROUP BY j) nc USING (j))""")
    # final assignment against the post-iteration centroids
    cte.append(f"""afin AS (
  SELECT id, j AS cluster, CAST(d AS BIGINT) AS dist2 FROM (
    SELECT b.id, c.j, {d} AS d,
           row_number() OVER (PARTITION BY b.id
                              ORDER BY {d} ASC, c.j ASC) AS rn
    FROM b, c{iters} c) WHERE rn = 1)""")
    return ("WITH " + ",\n".join(cte)
            + "\nSELECT id, cluster, dist2 FROM afin")


# --- incremental index maintenance (r11 verdict task #9) -----------------
#
# Real corpora APPEND; the .cache/ indexes were build-once.  The append
# path keeps the fitted quantizer and assigns only the new vectors (one
# broadcast-literal argmin scan — O(new), never O(corpus)); the drift
# audit measures how well the frozen quantizer still fits the appended
# data, flagging when a re-fit is warranted (the classic IVF operations
# playbook: append cheap, re-train when list quality degrades).


def append_to_index(index: SemDedupIndex, new_emb: DataFrame,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> SemDedupIndex:
    """Assign NEW vectors to the EXISTING centroids and extend the
    assignment corpus — centroids untouched, cost O(new vectors).
    Searches over the appended index probe exactly as before."""
    e = new_emb.select(F.col(id_col).alias("_id"),
                       as_double(vec_col).alias("v"))
    newa = assign_to_centroids(e, index.centroids).select("_id", "c_id")
    return SemDedupIndex(
        centroids=index.centroids,
        assignments=index.assignments.unionByName(newa))


def index_drift_audit(index: SemDedupIndex, resident: DataFrame,
                      appended: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      refit_num: int = 3, refit_den: int = 2) -> DataFrame:
    """Per-inverted-list assignment-quality comparison of appended vs
    resident vectors under the FROZEN quantizer.  Per list: counts and
    mean squared-L2 assignment distance (per-row distances are
    bit-exact fold sums, integer-scaled ×1000 BEFORE the sum so the
    aggregate is engine-exact — no float-sum order sensitivity), plus
    ``refit_flagged`` when the appended mean exceeds refit_num/refit_den
    of the resident mean (the distribution moved away from the fitted
    centroids) — the signal that the cheap append path has degraded
    recall and a re-fit is due.  Empty side → count 0, mean NULL, and
    a list that only appended rows touch is flagged by construction."""
    def _dists(df):
        e = df.select(F.col(id_col).alias("_id"),
                      as_double(vec_col).alias("v"))
        a = assign_to_centroids(e, index.centroids, with_dist=True)
        return a.select(
            "c_id",
            F.round(F.col("_dist") * 1000).cast("long").alias("d_x1000"))

    res = _dists(resident).groupBy("c_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_resident"),
        F.sum("d_x1000").alias("_rsum"))
    app = _dists(appended).groupBy("c_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_appended"),
        F.sum("d_x1000").alias("_asum"))
    j = res.join(app, "c_id", "full_outer").select(
        "c_id",
        F.coalesce("n_resident", F.lit(0)).alias("n_resident"),
        F.coalesce("n_appended", F.lit(0)).alias("n_appended"),
        F.when(F.col("n_resident") > 0,
               (F.col("_rsum") / F.col("n_resident")).cast("long"))
         .alias("mean_dist_resident_x1000"),
        F.when(F.col("n_appended") > 0,
               (F.col("_asum") / F.col("n_appended")).cast("long"))
         .alias("mean_dist_appended_x1000"),
    )
    return j.withColumn(
        "refit_flagged",
        F.when(F.col("n_appended") == 0, F.lit(False)).otherwise(
            F.col("mean_dist_resident_x1000").isNull()
            | (F.col("mean_dist_appended_x1000") * refit_den
               > F.col("mean_dist_resident_x1000") * refit_num)))
