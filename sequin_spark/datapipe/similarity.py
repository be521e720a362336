"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; hyperplane-LSH
bucketing is the scale path (bucket first, then search within buckets →
the candidate set per query is the bucket, not the corpus). Both are
pure Catalyst expressions — the dot products run in whole-stage codegen
via ``aggregate``/``zip_with`` higher-order functions, no Python in the
hot path.
"""

from __future__ import annotations

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


def hyperplane_dot(plane: int, vec_col: str, dims: int) -> F.Column:
    """Deterministic pseudo-random hyperplane dot product: coefficient
    for (plane, dim) = first md5 hex digit of '{plane}_{dim}' - 7.5."""
    return F.expr(
        f"aggregate(sequence(0, {dims - 1}), cast(0.0 as double), (acc, d) -> "
        f"acc + (instr('0123456789abcdef', substr(md5(concat('{plane}', '_', cast(d as string))), 1, 1)) - 1 - 7.5) "
        f"* cast({vec_col}[d] as double))"
    )


def hyperplane_buckets(
    emb: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> DataFrame:
    """Sign-random-projection LSH: bucket = bit-pack of sign(plane·x).

    Near vectors (small angle) land in the same bucket with probability
    (1 - θ/π)^planes; ANN search = brute-force within bucket (optionally
    probing neighbor buckets at Hamming distance 1).
    """
    out = emb.select(F.col(id_col), F.col(vec_col))
    bucket = None
    for p in range(n_planes):
        bit = F.when(hyperplane_dot(p, vec_col, dims) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else (bucket + bit)
    return out.withColumn("bucket", bucket.cast("int")).drop(vec_col)


def ivf_index(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
):
    """IVF coarse quantizer: k-means centroids over the corpus; every
    vector is assigned to its nearest centroid's inverted list.

    Uses Spark ML KMeans (distributed Lloyd's); at 100 TB train on a
    sample and assign the full corpus with the broadcast centroids.
    Returns (assignments DataFrame with `centroid` column, model).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = emb.withColumn("_features", array_to_vector(as_double(vec_col)))
    model = KMeans(k=n_centroids, seed=seed, featuresCol="_features", predictionCol="centroid").fit(
        feat
    )
    assigned = model.transform(feat).drop("_features")
    return assigned, model


def ann_ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: search only the query's ``n_probe`` nearest inverted
    lists — the corpus side shrinks ~n_centroids/n_probe ×.

    The centroid model is tiny → broadcast both the assignment and the
    per-query probe lists; the join is centroid-equi (shuffle keyed by
    centroid, bounded fan-out = inverted-list size).
    """
    from pyspark.ml.functions import array_to_vector, vector_to_array

    assigned, model = ivf_index(emb, n_centroids, id_col, vec_col)
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
    eb = hyperplane_buckets(emb, n_planes, id_col, vec_col, dims).join(emb, id_col)
    qb = hyperplane_buckets(queries, n_planes, id_col, vec_col, dims).join(queries, id_col)
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
