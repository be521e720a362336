"""Deduplication operators for document corpora.

All hash arithmetic is md5-based (portable, deterministic) and runs as
Catalyst expressions inside whole-stage codegen. The LSH variants bound
pairwise work by bucketing before the self-join, which is what keeps
them tractable at 100 TB: the only shuffle is groupBy(doc) for
signatures plus a join keyed on (band, band_key) whose fan-out is the
bucket size, never O(n²).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NORM = "regexp_replace(lower({col}), '\\\\s+', ' ')"


def normalized(col: str = "text") -> F.Column:
    """Canonical text form for hashing: lowercase, collapsed whitespace."""
    return F.expr(NORM.format(col=col))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: one row per distinct normalized text,
    keeping the smallest id (deterministic winner) + duplicate count.

    Hash-groupBy → map-side partial aggregation; at 100 TB this is one
    shuffle on the 32-hex-char key, uniformly distributed by md5.
    """
    return (
        df.withColumn("content_hash", F.md5(normalized(text_col)))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
    )


def word_shingles(words_col: str = "w", k: int = 3) -> F.Column:
    """Array of k-word shingles from a token array (0-based Spark SQL).

    Docs with fewer than k tokens yield an EMPTY array: without the guard,
    ``sequence(1, size - k + 1)`` with size < k is a *descending* sequence
    ([1, 0]) and the ANSI-mode subscript throws INVALID_ARRAY_INDEX —
    one short doc would kill the whole job.
    """
    idx = ", ".join(f"{words_col}[i - 1 + {j}]" for j in range(k))
    return F.expr(
        f"CASE WHEN size({words_col}) >= {k} THEN "
        f"transform(sequence(1, size({words_col}) - {k - 1}), i -> concat_ws(' ', {idx})) "
        f"ELSE cast(array() as array<string>) END"
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n_hashes: int = 8, shingle_k: int = 3,
) -> DataFrame:
    """MinHash signature per document: sig_j = min over shingles of
    md5('{j}|' + shingle). Lexicographic min over md5 hex approximates a
    random permutation per j.

    Computed as ``array_min(transform(shingles, md5))`` — a NARROW
    projection, not explode + groupBy: the per-doc min needs no shuffle
    at all, so signature generation is a pure scan at any corpus size
    (the only shuffle left in LSH dedup is the band-bucket join).
    Shingle-less docs (< k words) get null signatures → null band keys
    → never candidates, same as the exploded formulation dropping them.
    """
    return _signatures_from_shingles(
        shingle_docs(df, text_col, id_col, shingle_k), id_col, n_hashes
    )


def minhash_candidate_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    bands: int = 4, rows_per_band: int = 2, shingle_k: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """LSH banding: band key = concatenated signature rows; documents
    sharing any band key are candidate near-duplicates.

    Returns distinct (doc_a, doc_b) with doc_a < doc_b. The self-join is
    keyed on (band, key) — fan-out bounded by bucket occupancy.
    ``materialize`` checkpoints the band rows (id + band + key, tiny
    next to the text) so the shingle→minhash computation runs once, not
    once per join side.
    """
    banded = banded_signatures(df, text_col, id_col, bands, rows_per_band, shingle_k)
    if materialize:
        banded = banded.localCheckpoint()
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", hex_digits: int = 4
) -> DataFrame:
    """SimHash over word tokens: bit j of the fingerprint is the sign of
    the sum over tokens of ±1 according to bit j of md5(token).

    ``hex_digits`` hex chars of the token hash → 4*hex_digits bit
    fingerprint (16 bits default — oracle-portable arithmetic; widen to
    16 hex digits / 64 bits in production).
    """
    nbits = 4 * hex_digits
    src = spread_for_compute(df.select(F.col(id_col), F.col(text_col)))
    toks = src.select(F.col(id_col), F.explode(F.split(normalized(text_col), " ")).alias("tok"))
    toks = toks.withColumn("h", F.md5(F.col("tok")))
    # per-bit ±1 array + posexplode → TWO flat integer aggregates, not
    # nbits separate sum(when(...)) aggregate expressions: at
    # hex_digits=15 the 60-aggregate plan cost ~2× the whole query in
    # analysis/codegen (r13 optimization round; interleaved A/B min
    # 8.3 → 3.94 s for dedup_simhash_pairs, fingerprints asserted
    # identical — integer sums are order-free, so the restructure is
    # exact).  Map-side partial aggregation collapses the nbits-wide
    # expansion to ≤ docs·nbits rows per partition before the shuffle.
    signs = F.expr(
        f"transform(sequence(0, {nbits - 1}), j -> "
        f"CASE WHEN (shiftright(instr('0123456789abcdef', "
        f"substr(h, CAST(j DIV 4 AS INT) + 1, 1)) - 1, "
        f"CAST(j % 4 AS INT)) & 1) = 1 THEN 1 ELSE -1 END)")
    per_bit = (
        toks.select(F.col(id_col), F.posexplode(signs).alias("pos", "s"))
        .groupBy(id_col, "pos").agg(F.sum("s").alias("c")))
    return (
        per_bit.groupBy(id_col)
        .agg(F.sum(F.when(F.col("c") > 0,
                          F.expr("shiftleft(CAST(1 AS BIGINT), pos)"))
                   .otherwise(F.lit(0))).cast("long").alias("simhash")))


def simhash_near_pairs(
    sim: DataFrame, id_col: str = "doc_id", max_hamming: int = 3,
    nbits: int = 16, materialize: bool = True,
) -> DataFrame:
    """Near-dup pairs by Hamming distance on simhash fingerprints,
    pigeonhole-bucketed: split the ``nbits`` fingerprint into
    ``max_hamming + 1`` chunks — any pair within Hamming distance d
    differs in at most d chunks, so it agrees on at least one chunk.
    Candidates come from an equi-join on (chunk_idx, chunk_value); the
    exact Hamming verify after the join makes the result identical to
    the all-pairs join, so bucketing is a pure physical optimization.

    At 100 TB use a 60-bit fingerprint (simhash hex_digits=15): 4 chunks
    of 15 bits = 32k distinct chunk values, so bucket occupancy — and
    the join fan-out — stays ~n/32k per chunk instead of O(n²).

    Reference semantics: sequin has no simhash; this is the standard
    Manku/Jain/Sarma near-dup design re-expressed as Catalyst joins.
    """
    # the signature frame is tiny (id + one long) but EXPENSIVE to
    # compute (token explode + nbits per-bit sums); without
    # materialization the self-join below recomputes it once per side
    if materialize:
        sim = sim.select(F.col(id_col), F.col("simhash")).localCheckpoint()
    n_chunks = max_hamming + 1
    chunk_bits = -(-nbits // n_chunks)  # ceil → chunks cover all bits
    mask = (1 << chunk_bits) - 1
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("ci"),
                F.shiftright(F.col("simhash"), i * chunk_bits)
                .bitwiseAND(F.lit(mask))
                .cast("int")
                .alias("cv"),
            )
            for i in range(n_chunks)
        ]
    )
    keyed = sim.select(
        F.col(id_col), F.col("simhash"), F.explode(chunks).alias("ck")
    ).select(id_col, "simhash", F.col("ck.ci").alias("ci"), F.col("ck.cv").alias("cv"))
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()  # a pair can share several chunks
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("int")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def ngram_jaccard_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    threshold: float = 0.15,
    bands: int = 4,
    rows_per_band: int = 2,
    shingle_k: int = 3,
) -> DataFrame:
    """Word n-gram Jaccard over MinHash-LSH candidate pairs — the scale
    path: candidates come from band buckets (fan-out bounded by bucket
    occupancy on an md5-uniform key), then the exact Jaccard is computed
    only for candidates. No low-cardinality metadata bucket anywhere —
    the pair count is O(collisions), not O(n²/|buckets|).
    """
    cand = minhash_candidate_pairs(df, text_col, id_col, bands, rows_per_band, shingle_k)
    grams = (
        spread_for_compute(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), F.split(normalized(text_col), " ").alias("w"))
        .select(id_col, F.array_distinct(word_shingles("w", n)).alias("grams"))
        .withColumn("n_grams", F.size("grams"))
        # read by BOTH candidate-join sides — without the (lazy)
        # checkpoint each side re-runs the normalize+shingle kernel
        .localCheckpoint(eager=False)
    )
    ga = grams.select(
        F.col(id_col).alias("doc_a"), F.col("grams").alias("ga"), F.col("n_grams").alias("na")
    )
    gb = grams.select(
        F.col(id_col).alias("doc_b"), F.col("grams").alias("gb"), F.col("n_grams").alias("nb")
    )
    inter = F.size(F.array_intersect(F.col("ga"), F.col("gb")))
    union = F.col("na") + F.col("nb") - inter
    return (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_containment_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    threshold: float = 0.7,
    bands: int = 4,
    rows_per_band: int = 2,
    shingle_k: int = 3,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT over MinHash-LSH candidates:
    containment(A⊂B) = |grams(A) ∩ grams(B)| / |grams(A)| for the
    SMALLER document A.  The quote/fragment detector Jaccard cannot
    be: a half-document fragment has containment ≈ 1.0 but Jaccard
    ≈ 0.5, below any sane near-dup threshold (Broder 1997 separates
    "resemblance" from "containment" for exactly this case).

    Emits (doc_small, doc_large, containment, jaccard) for candidate
    pairs with containment ≥ threshold — jaccard alongside so the
    "contained but not near-dup" cases are visible.  Scale shape:
    identical to ngram_jaccard_lsh_pairs — band-bucket candidates
    only, one gram build per doc, never all-pairs.  (LSH banding
    recalls containment pairs at the JACCARD collision rate — a
    fragment at c=1.0, j=0.5 collides at 1−(1−j^r)^b; production
    containment search over very small fragments uses the repeated-
    spans operator instead, which indexes windows, not whole docs.)"""
    cand = minhash_candidate_pairs(df, text_col, id_col, bands,
                                   rows_per_band, shingle_k)
    grams = (
        # spread parity with ngram_jaccard_lsh_pairs: the gram build is
        # the same CPU-dense normalize+shingle kernel and otherwise runs
        # on the scan's single split (r13 optimization round, A/B min
        # 1.44 → 1.36 s, rows identical; no-op on wide scans)
        spread_for_compute(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), F.split(normalized(text_col), " ").alias("w"))
        .select(id_col, F.array_distinct(word_shingles("w", n)).alias("grams"))
        .withColumn("n_grams", F.size("grams"))
        # read by BOTH candidate-join sides — without the (lazy)
        # checkpoint each side re-runs the normalize+shingle kernel
        .localCheckpoint(eager=False)
    )
    ga = grams.select(F.col(id_col).alias("doc_a"),
                      F.col("grams").alias("ga"), F.col("n_grams").alias("na"))
    gb = grams.select(F.col(id_col).alias("doc_b"),
                      F.col("grams").alias("gb"), F.col("n_grams").alias("nb"))
    inter = F.size(F.array_intersect(F.col("ga"), F.col("gb")))
    small_first = F.col("na") <= F.col("nb")
    joined = (
        cand.join(ga, "doc_a").join(gb, "doc_b")
        .withColumn("containment",
                    F.round(inter / F.least("na", "nb"), 4))
        .withColumn("jaccard",
                    F.round(inter / (F.col("na") + F.col("nb") - inter), 4))
        .filter(F.col("containment") >= threshold)
    )
    return joined.select(
        F.when(small_first, F.col("doc_a")).otherwise(F.col("doc_b"))
        .alias("doc_small"),
        F.when(small_first, F.col("doc_b")).otherwise(F.col("doc_a"))
        .alias("doc_large"),
        "containment", "jaccard",
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    bucket_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    threshold: float = 0.15,
) -> DataFrame:
    """Word n-gram Jaccard similarity between documents sharing a bucket.

    Jaccard = |A∩B| / (|A|+|B|-|A∩B|) over distinct n-gram sets. The
    bucket join (metadata bucket here; LSH band in production) bounds
    the pair count.
    """
    grams = df.select(
        F.col(id_col),
        F.col(bucket_col).alias("bucket"),
        F.split(normalized(text_col), " ").alias("w"),
    ).select(
        id_col,
        "bucket",
        F.array_distinct(word_shingles("w", n)).alias("grams"),
    ).withColumn("n_grams", F.size("grams"))
    a, b = grams.alias("a"), grams.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.col("a.n_grams") + F.col("b.n_grams") - inter
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            "jaccard",
        )
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Cluster near-duplicate candidate pairs into components:
    (doc_id, cluster_id) with cluster_id = min doc id in the component.

    The missing step between pair generation (MinHash/SimHash/LSH) and
    corpus curation: "keep one representative per duplicate CLUSTER",
    not per pair — A~B, B~C must collapse to one cluster even when A~C
    was never a candidate pair.

    Scale design (the MapReduce-CC family, Kiveris et al.): iterative
    min-label propagation — each round is ONE shuffle
    (union → groupBy(id) → min), edges are computed once and cached,
    and labels are localCheckpoint-ed per round so the plan doesn't
    deepen with iterations. Rounds = component diameter; near-dup
    graphs are overwhelmingly small cliques (diameter ≤ 2-3). The
    O(log n) upgrade path for adversarial chain graphs is large-star/
    small-star contraction — same per-round shuffle shape.
    Driver traffic is one convergence counter per round, never rows.
    """
    sym = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    # r14: hash-partition the edge table by dst ONCE at build.  The
    # per-round join keys edges.dst == labels.id, so a dst-partitioned
    # cache satisfies the join's ClusteredDistribution and the (big at
    # corpus scale) edge table is never re-shuffled inside the loop —
    # only the label table moves per round (guide §2.4).  dropDuplicates
    # on (src, dst) is satisfied by the same partitioning (hash(dst)
    # clusters every (src, dst) duplicate), so this stays ONE exchange,
    # same as the old dropDuplicates-only shape.
    edges = sym.unionByName(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).repartition("dst").dropDuplicates().cache()
    # materialize the (possibly corpus-scale) pair build under AQE; the
    # measured edge count then sizes the label loop (r14): when it
    # PROVES the graph small (< 50k rows/task at session width), the
    # per-round plans compile with AQE off at a data-derived width —
    # adaptive re-planning schedules one job per exchange per round and
    # buys nothing on a provably small loop.  At corpus scale the count
    # hits the session-width cap and the loop keeps AQE (coalescing +
    # skew handling on the label shuffles).
    n_edges = edges.count()
    spark = edges.sparkSession
    # bounded pair set (the count above measured it): replay the exact
    # min-label propagation on the driver — every step is integer /
    # order-free min arithmetic, identical trajectory including the
    # max_iterations cap and the label-sum convergence test, so the
    # output is bit-identical to the distributed loop (guide §8: the
    # corpus-scale work is the candidate-pair GENERATION upstream; the
    # near-dup graph itself is the tiny decision table).  Above the
    # bound the distributed loop below is unchanged — near-dup graphs
    # of a 100 TB corpus keep the per-round shuffle shape.
    from sequin_spark.datapipe.graph import _driver_fixpoint_max
    if n_edges <= _driver_fixpoint_max(spark):
        e_rows = [(r["src"], r["dst"]) for r in edges.collect()]
        edges.unpersist()
        nbr_min: dict = {}
        for s, d in e_rows:
            m = nbr_min.get(s)
            nbr_min[s] = d if m is None or d < m else m
        labels = {s: (s if s < m else m) for s, m in nbr_min.items()}
        prev_sum = sum(labels.values()) if labels else None
        for _ in range(max_iterations):
            nxt = dict(labels)
            for s, d in e_rows:
                ld = labels[d]
                if ld < nxt[s]:
                    nxt[s] = ld
            labels = nxt
            new_sum = sum(labels.values()) if labels else None
            if new_sum == prev_sum:
                break
            prev_sum = new_sum
        from pyspark.sql import types as T

        id_type = pairs.schema[id_a].dataType
        return spark.createDataFrame(
            list(labels.items()),
            T.StructType([T.StructField("doc_id", id_type),
                          T.StructField("cluster_id", id_type)]))
    session_w = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    loop_w = min(session_w, n_edges // 50_000 + 1)
    if loop_w < session_w:
        from sequin_spark.session import no_aqe
        _loop_ctx = lambda: no_aqe(edges.sparkSession,  # noqa: E731
                                   shuffle_partitions=loop_w)
    else:
        from contextlib import nullcontext as _loop_ctx

    with _loop_ctx():
        # label(id) starts at min(id, min neighbor)
        # lazy checkpoints: plan truncation is immediate either way; the
        # materialization rides the convergence-sum collect each round
        # (one driver job per round instead of two, identical label
        # trajectory)
        labels = (
            edges.groupBy("src")
            .agg(F.min("dst").alias("nbr_min"))
            .select(F.col("src").alias("id"),
                    F.least("src", "nbr_min").alias("label"))
            .localCheckpoint(eager=False)
        )
        # labels only ever DECREASE (min-propagation is monotone), so an
        # unchanged label sum ⇒ fixed point — convergence costs one tiny
        # agg per round instead of a self-join + count
        prev_sum = labels.agg(F.sum("label")).collect()[0][0]
        for _ in range(max_iterations):
            nbr = (
                edges.join(labels, edges["dst"] == labels["id"])
                .select(edges["src"].alias("id"), F.col("label"))
            )
            labels = (
                labels.unionByName(nbr).groupBy("id")
                .agg(F.min("label").alias("label"))
            ).localCheckpoint(eager=False)
            new_sum = labels.agg(F.sum("label")).collect()[0][0]
            if new_sum == prev_sum:
                break
            prev_sum = new_sum
    edges.unpersist()
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def cluster_representatives(
    components: DataFrame, singletons: DataFrame | None = None, id_col: str = "doc_id"
) -> DataFrame:
    """Curation decision per doc: keep cluster representatives (the min
    id) and every unpaired doc. Output: (doc_id, keep, cluster_id)."""
    decided = components.select(
        id_col,
        (F.col(id_col) == F.col("cluster_id")).alias("keep"),
        "cluster_id",
    )
    if singletons is None:
        return decided
    alone = singletons.select(F.col(id_col)).join(
        components.select(id_col), id_col, "left_anti"
    ).select(
        id_col, F.lit(True).alias("keep"), F.col(id_col).alias("cluster_id")
    )
    return decided.unionByName(alone)


def shingle_docs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", shingle_k: int = 3
) -> DataFrame:
    """(id, sh) — the ONE shingle pass everything else derives from:
    MinHash signatures, LSH band keys, AND exact-verify gram sets all
    come off this array, so a doc's text is normalized+split exactly
    once per build (the r2 bench's slowest entry was paying this twice).
    """
    src = spread_for_compute(df.select(F.col(id_col), F.col(text_col)))
    return src.select(
        F.col(id_col), F.split(normalized(text_col), " ").alias("w")
    ).select(F.col(id_col), word_shingles("w", shingle_k).alias("sh"))


"""MinHash permutation family: one 32-bit base hash per shingle (first 8
hex chars of md5), then per-permutation universal hashing
``sig_j = (a_j * x + b_j) mod P`` with P = 4294967311 (the first prime
above 2^32 — the standard datasketch/Spark-ML MinHashLSH construction).
a_j < 2^31 and x < 2^32 keep the product under 2^63, so the arithmetic
is overflow-free in both Spark longs and DuckDB BIGINTs. vs hashing
every shingle n_hashes times with md5, this is ~n_hashes× less digest
CPU — at corpus scale the signature pass is md5-bound, and the mul/add/
mod permutations are whole-stage-codegen JVM arithmetic."""
MINHASH_PRIME = 4294967311


def spread_for_compute(df: DataFrame, min_parts: int | None = None
                       ) -> DataFrame:
    """Repartition a CPU-dense projection up to the cluster's
    parallelism when the SCAN gave fewer partitions.

    Spark sizes scan splits by BYTES (spark.sql.files.maxPartitionBytes,
    128 MB default) — right for I/O-bound scans, wrong for kernels that
    do heavy per-row expression work on small-but-dense inputs: at
    sf0.1 the documents/events/embeddings tables are each ONE ~4 MB
    parquet split, so every md5-per-shingle / per-token kernel ran as a
    single task on a 32-core box (measured: text_fingerprint 13× on
    10× data as the second core kicked in; see docs/SCALE.md).  One
    round-robin shuffle of the narrow projection buys full-width
    parallelism; cost is proportional to the projected bytes.  On a
    real cluster where the scan already yields ≥ cores partitions this
    is a no-op — getNumPartitions() triggers planning but no job.

    Width is SIZE-AWARE above one-task-per-core (r11 third-decade
    find): at sf100 the fingerprint kernel on 32 core-sized tasks
    (~69M chars each) measured 44× wall for 11× chars — long
    allocation-heavy tasks stall on GC (GCLocker retry warnings);
    the same job in ~2MB-of-parquet tasks (256 partitions) is linear
    (12.1×).  Target = input bytes / 2MB, clamped to [cores, 8×cores];
    small inputs keep exactly cluster width."""
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    try:
        size = int(df._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — stats unavailable: width only
        size = 0
    if min_parts is None:
        target = max(cores, min(cores * 8, size // (2 << 20) + 1))
    else:
        target = min_parts
    # Two-tier width check (r13 optimization round).  The old gate read
    # df.rdd.getNumPartitions() unconditionally; the PySpark .rdd
    # property additionally builds the javaToPython pickle-conversion
    # pipeline, measured 0.2-2.5 s of driver time per FRESH frame — a
    # systematic tax on every spread consumer at query-build.
    # Tier 1: plan-stat bytes (~30 ms).  A scan yields about one split
    # per maxPartitionBytes, so bytes >= target*maxPartitionBytes means
    # the scan is already cluster-wide (the 100 TB case) — skip without
    # even physical planning.  Overestimated stats only take the skip
    # branch into tier 2, never add an exchange.
    # Tier 2 (small/unknown inputs only): the EXACT partition count via
    # the JVM-side toRdd() (60-140 ms — physical planning without the
    # Python conversion pipeline), preserving the guarantee that an
    # already-wide input (e.g. explicitly repartitioned upstream) never
    # pays a second exchange.
    est_scan_parts = size // _max_partition_bytes(spark) + 1
    if size and est_scan_parts >= target:
        return df
    # Second tier-1 skip (r14, verdict #8): plan-stat bytes are
    # *compressed* parquet bytes at real cluster scale, so
    # est_scan_parts under-counts the actual splits by the compression
    # ratio (~2-4×) and wide frames could fall through to tier 2's
    # 60-140 ms planning tax.  When the target is plain cluster width
    # (small-input case — the spread is purely about width, not the
    # size-aware GC splitting) and the estimated split count is already
    # within 2× of that width, the frame is in fact likely already
    # cluster-wide — skip without physical planning.  Guarded to
    # target == cores so the sf100 GC-bound re-split (target up to
    # 8×cores, r11 third-decade find) keeps its exact check.  At bench
    # scale (single-split tables, est_scan_parts == 1, cores == 32)
    # this never fires, so local plans are byte-identical.
    if size and target <= cores and cores <= est_scan_parts * 2:
        return df
    if df._jdf.queryExecution().toRdd().getNumPartitions() < target:
        return df.repartition(target)
    return df


def _max_partition_bytes(spark) -> int:
    raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes",
                             "134217728")).strip().lower()
    mult = 1
    for suf, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                   ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                   ("b", 1)):
        if raw.endswith(suf):
            raw = raw[: -len(suf)]
            mult = m
            break
    try:
        return max(int(raw) * mult, 1)
    except ValueError:
        return 128 << 20



def minhash_coeffs(j: int) -> tuple[int, int]:
    """Deterministic (a_j, b_j), identical constants in Spark and the
    DuckDB oracle (embedded as literals on both sides)."""
    da = hashlib.md5(f"minhash-a-{j}".encode()).hexdigest()
    db = hashlib.md5(f"minhash-b-{j}".encode()).hexdigest()
    # a is 31-bit odd, x 32-bit, b 32-bit: a*x + b < 2^63 — overflow-free
    return (int(da[:8], 16) & 0x7FFFFFFF) | 1, int(db[:8], 16)


def _signatures_from_shingles(shingled: DataFrame, id_col: str, n_hashes: int) -> DataFrame:
    # expressions built as single SQL strings, not nested pyspark HOF
    # lambdas: each python-side lambda costs a py4j round-trip per node
    # and the signature tree has ~10 of them per hash — measured ~0.5 s
    # of driver chatter per pairs build at n_hashes=8 (r14; plans and
    # results identical, it is the same Catalyst tree after parsing)
    base = F.expr(
        "transform(sh, s -> "
        "CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT))")
    sigs = []
    for j in range(1, n_hashes + 1):
        a, b = minhash_coeffs(j)
        sigs.append(F.expr(
            f"array_min(transform(bh, x -> "
            f"(CAST({a} AS BIGINT) * x + CAST({b} AS BIGINT)) % "
            f"CAST({MINHASH_PRIME} AS BIGINT)))").alias(f"sig{j}"))
    return shingled.select(F.col(id_col), base.alias("bh")).select(F.col(id_col), *sigs)


def _bands_from_signatures(
    sig: DataFrame, id_col: str, bands: int, rows_per_band: int
) -> DataFrame:
    band_structs = []
    for b in range(1, bands + 1):
        parts = [F.col(f"sig{(b - 1) * rows_per_band + r}") for r in range(1, rows_per_band + 1)]
        # '|' separator: sigs are integers now — unseparated concat would
        # alias e.g. (12,3) with (1,23). concat_ws skips nulls, so gate
        # explicitly: shingle-less docs must keep a NULL key (not ""),
        # else they'd all share one giant candidate bucket.
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.when(
                    parts[0].isNotNull(), F.concat_ws("|", *parts)
                ).alias("key"),
            )
        )
    return (
        sig.select(F.col(id_col), F.explode(F.array(*band_structs)).alias("bk"))
        .select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
        .filter(F.col("key").isNotNull())  # shingle-less docs index nothing
    )


def banded_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    bands: int = 4, rows_per_band: int = 2, shingle_k: int = 3,
) -> DataFrame:
    """(id, band, key) LSH band rows — the persistable dedup INDEX.
    At scale this is the table you keep partitioned by (band, key) so
    incoming batches join against it without recomputing the corpus."""
    sh = shingle_docs(df, text_col, id_col, shingle_k)
    sig = _signatures_from_shingles(sh, id_col, bands * rows_per_band)
    return _bands_from_signatures(sig, id_col, bands, rows_per_band)


@dataclass
class DedupIndex:
    """The persistable corpus dedup index: LSH band rows for candidate
    generation + per-doc gram sets for exact Jaccard verification.
    Build once per corpus, save, and every future ingest batch joins the
    LOADED index — the corpus text is never re-shingled.

    On disk: ``<path>/bands`` parquet partitioned by band (an ingest
    probing one band prunes the rest) and ``<path>/grams`` parquet.
    """

    bands: DataFrame  # (id, band, key)
    grams: DataFrame  # (id, grams)
    id_col: str = "doc_id"

    def save(self, path: str) -> None:
        self.bands.write.mode("overwrite").partitionBy("band").parquet(
            os.path.join(path, "bands")
        )
        self.grams.write.mode("overwrite").parquet(os.path.join(path, "grams"))

    @staticmethod
    def load(spark, path: str, id_col: str = "doc_id") -> "DedupIndex":
        return DedupIndex(
            bands=spark.read.parquet(os.path.join(path, "bands")),
            grams=spark.read.parquet(os.path.join(path, "grams")),
            id_col=id_col,
        )


def build_dedup_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    bands: int = 4, rows_per_band: int = 2, shingle_k: int = 3,
    persist: bool = True,
) -> DedupIndex:
    """One shingle pass → both index tables.  `persist` caches the
    shingled frame so bands and grams don't each rescan the corpus;
    callers that immediately `save()` can drop it after."""
    sh = shingle_docs(df, text_col, id_col, shingle_k)
    if persist:
        sh = sh.persist()
    sig = _signatures_from_shingles(sh, id_col, bands * rows_per_band)
    return DedupIndex(
        bands=_bands_from_signatures(sig, id_col, bands, rows_per_band),
        grams=sh.select(F.col(id_col), F.array_distinct("sh").alias("grams")),
        id_col=id_col,
    )


def incremental_dedup(
    new_docs: DataFrame,
    corpus: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 2,
    shingle_k: int = 3,
    threshold: float = 0.5,
    index: DedupIndex | None = None,
) -> DataFrame:
    """Dedup an INCOMING batch against an EXISTING corpus — the
    streaming-ingest shape: new docs only ever join the corpus index on
    (band, key), never each other, so ingest cost is O(|batch| ×
    bucket occupancy) regardless of corpus size. Candidates are
    verified with exact n-gram Jaccard; each new doc reports
    ``duplicate_of`` = the smallest matching corpus id (null = novel).

    Pass ``index`` (built by ``build_dedup_index``, possibly
    ``DedupIndex.load``-ed from disk) to skip re-deriving the corpus
    side entirely; otherwise it is built from ``corpus`` in-query with
    a single shingle pass.

    Returns one row per new doc: (doc_id, duplicate_of, jaccard).
    """
    if index is None:
        if corpus is None:
            raise ValueError("need either corpus or index")
        index = build_dedup_index(
            corpus, text_col, id_col, bands, rows_per_band, shingle_k
        )
    new_index = build_dedup_index(
        new_docs, text_col, id_col, bands, rows_per_band, shingle_k
    )
    cand = (
        new_index.bands.alias("n")
        .join(index.bands.alias("c"), ["band", "key"])
        .select(
            F.col(f"n.{id_col}").alias("new_id"),
            F.col(f"c.{id_col}").alias("corpus_id"),
        )
        .distinct()
    )
    new_grams = new_index.grams.select(
        F.col(id_col).alias("new_id"), F.col("grams").alias("new_grams")
    )
    corpus_grams = index.grams.select(
        F.col(index.id_col).alias("corpus_id"), F.col("grams").alias("corpus_grams")
    )
    verified = (
        cand.join(new_grams, "new_id")
        .join(corpus_grams, "corpus_id")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("new_grams", "corpus_grams"))
                / (
                    F.size("new_grams") + F.size("corpus_grams")
                    - F.size(F.array_intersect("new_grams", "corpus_grams"))
                ),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    best = verified.groupBy("new_id").agg(
        F.min(F.struct(F.col("corpus_id"), F.col("jaccard"))).alias("m")
    )
    return (
        new_docs.select(F.col(id_col))
        .join(best, new_docs[id_col] == best["new_id"], "left")
        .select(
            id_col,
            F.col("m.corpus_id").alias("duplicate_of"),
            F.col("m.jaccard").alias("jaccard"),
        )
    )


# NOTE: a former word_shingles_from_text(text_col, k) helper inlined
# split(normalize(text)) into every element access of the shingle
# transform — O(words²) re-tokenization per row. Always materialize the
# token array as a projection column first and use word_shingles("w", k).


# ---------------------------------------------------------------------------
# line-level (chunk) dedup — C4/RefinedWeb-style repeated-passage removal


def doc_chunks(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               chunk_words: int = 8) -> DataFrame:
    """Split each document into consecutive ``chunk_words``-word chunks
    (the 'line'/passage unit of C4-style dedup; our synthetic corpus has
    no newlines, so the unit is a fixed word window). Narrow projection:
    (id, pos, chunk) exploded from an in-row array — no shuffle. The
    token array is a materialized projection step (see doc_bigrams):
    inlining the split into the slice lambda re-tokenizes per chunk."""
    words = F.col("_w")
    src = spread_for_compute(df.select(F.col(id_col), F.col(text_col)))
    d = src.select(F.col(id_col), F.split(normalized(text_col), " ").alias("_w"))
    n = F.ceil(F.size(words) / F.lit(chunk_words)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(
            F.slice(words, i * chunk_words + 1, chunk_words), " "
        ),
    )
    return d.select(
        F.col(id_col),
        F.posexplode(F.when(F.size(words) > 0, chunks)
                     .otherwise(F.array().cast("array<string>")))
        .alias("pos", "chunk"),
    )


def line_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               chunk_words: int = 8, max_docs: int = 1) -> DataFrame:
    """Remove every chunk that appears in more than ``max_docs`` distinct
    documents (RefinedWeb's repeated-line rule: boilerplate passages
    recurring across the corpus are dropped from *all* docs).

    Returns (id, clean_text, n_chunks, n_removed).

    Scale shape: one chunk-keyed agg for the distinct-doc counts (the dup
    set is the heavy-hitter tail — orders of magnitude smaller than the
    corpus), one join of the exploded chunks against it (Spark broadcasts
    it when small; AQE picks the strategy at runtime), one doc-keyed agg
    that computes totals, kept count and the rebuilt text in a SINGLE
    pass. No driver-side state.

    (The previous shape evaluated ``chunks`` three times — dup counts,
    anti-join, and a separate totals agg joined back at the end: three
    full scan+explode passes and a doc-keyed text shuffle more than
    needed.  ``collect_list`` skips nulls, so a conditional struct folds
    kept/total/rebuilt into one aggregate — identical output rows.)
    """
    chunks = doc_chunks(df, text_col, id_col, chunk_words)
    dup_set = (
        chunks.groupBy("chunk")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .filter(F.col("n_docs") > max_docs)
        .select("chunk", F.lit(1).alias("_dup"))
    )
    marked = chunks.join(dup_set, "chunk", "left")
    kept_struct = F.when(F.col("_dup").isNull(), F.struct("pos", "chunk"))
    return (
        marked.groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s.getField("chunk"),
                ),
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_chunks"),
            (F.count(F.lit(1)) - F.count(kept_struct)).alias("n_removed"),
        )
        .select(id_col, "clean_text", "n_chunks", "n_removed")
    )
