"""Training-data pipeline queries + DuckDB oracles.

Each entry exercises a datapipe operator over documents/embeddings.
Hash arithmetic is md5-based so the oracle can replicate it exactly;
floating-point similarity values are rounded on both sides.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sequin_spark.cdc import load_table
from sequin_spark.plan_capture import ckpt as _plan_ckpt
from sequin_spark.datapipe.dedup import (
    exact_dedup,
    minhash_candidate_pairs,
    ngram_jaccard_lsh_pairs,
    simhash,
    simhash_near_pairs,
    spread_for_compute,
)
from sequin_spark.datapipe.multimodal import attach_media, decode_media
from sequin_spark.datapipe.similarity import (
    ann_lsh_topk,
    brute_force_topk,
    cosine_col,
    hyperplane_buckets,
)
from sequin_spark.datapipe.text import fingerprint, langid, quality_score, token_counts

# DuckDB-side normalized text (Spark's regexp_replace is global by default;
# DuckDB needs the 'g' flag)
D_NORM = "regexp_replace(lower(text), '\\s+', ' ', 'g')"


def _prep(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def _spread_python_kernel(df: DataFrame, cap: int = 8) -> DataFrame:
    """spread_for_compute capped at ``cap`` partitions — for mapInPandas
    kernels whose serial cost is a few seconds at bench scale: each
    python stage costs ~2 worker processes PER TASK, and measured A/B
    (gif+progressive synth decode, widths 8/16/32 warm) shows full
    cluster width loses to width 8 once the kernel is cheaper than the
    per-task worker overhead.  No-op whenever the scan already yields
    more partitions (the cluster-scale case keeps its natural width)."""
    cores = df.sparkSession.sparkContext.defaultParallelism
    return spread_for_compute(df, min_parts=min(cores, cap))


def _index_cache_path(sf_dir: str, kind: str, version: str,
                      src_table: str = "embeddings") -> str:
    """Per-corpus maintained-index cache dir, keyed by sf dir + scheme
    version + a CONTENT fingerprint of the source parquet (size + head
    and tail bytes — the tail holds the parquet footer/statistics, so
    any regeneration changes it): an index built under an older scheme
    OR against since-regenerated data is never reused (a stale
    assignments join would silently drop rows whose ids changed,
    corrupting results without an error). Content bytes, not mtime:
    this filesystem's attribute cache reports flapping mtime_ns values
    across processes, which caused a spurious rebuild per process."""
    import hashlib

    def _fp_file(p: str) -> str:
        size = os.path.getsize(p)
        h = hashlib.sha256()
        with open(p, "rb") as f:
            h.update(f.read(4096))
            if size > 8192:
                f.seek(-4096, os.SEEK_END)
            h.update(f.read(4096))
        return f"{size}:{h.hexdigest()[:16]}"

    src = os.path.join(os.path.realpath(sf_dir), f"{src_table}.parquet")
    try:
        if os.path.isdir(src):
            # directory-style parquet dataset: fingerprint the sorted
            # per-file (name, size, head+tail CONTENT hash) — name+size
            # alone would reuse a stale index when a dataset is
            # regenerated with identical layout (same part names, same
            # sizes, different values), the exact hazard this key
            # exists to prevent; the tail bytes hold each part's
            # parquet footer/statistics, so any regeneration changes
            # them
            ent = sorted(
                (n, _fp_file(os.path.join(src, n)))
                for n in os.listdir(src)
                if not n.startswith((".", "_"))
            )
            fp = "dir:" + hashlib.sha256(
                repr(ent).encode()).hexdigest()[:16]
        else:
            fp = _fp_file(src)
    except OSError:
        import logging

        logging.getLogger(__name__).warning(
            "index cache: cannot fingerprint %s; falling back to "
            "'nosrc' (stale-index reuse possible if data regenerated)",
            src)
        fp = "nosrc"
    key = hashlib.sha256(
        (os.path.realpath(sf_dir) + "|" + version + "|" + fp).encode()
    ).hexdigest()[:12]
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".cache", kind, key,
    )


def _maintained_index(spark, sf_dir: str, kind: str, version: str,
                      build, load, src_table: str = "embeddings"):
    """Build-once/load-after lifecycle for a persisted index. The
    completeness probe is meta.json — the LAST artifact every index
    save() writes — so a save killed mid-way (benchmark timeouts) leaves
    an incomplete dir that is rebuilt, never half-loaded."""
    path = _index_cache_path(sf_dir, kind, version, src_table)
    if not os.path.exists(os.path.join(path, "meta.json")):
        build(path)
    return load(spark, path)


def _docs_with_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ shifted near-copies (every 25th doc) — deterministic
    duplicate injection so dedup operators have positives to find."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    copies = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.expr("replace(text, ' the ', ' thy ')").alias("text"),
        "lang",
        "source",
    )
    return docs.unionByName(copies)


SQL_DOCS_WITH_DUPES = """
SELECT doc_id, text, lang, source FROM documents
UNION ALL
SELECT doc_id + 10000, replace(text, ' the ', ' thy '), lang, source
FROM documents WHERE doc_id % 25 = 0
"""


def _docs_with_fragments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ half-length fragments (every 31st doc: its first
    ⌈n/2⌉ words as a new doc) — deterministic SUBSET injection: a
    fragment has n-gram containment ≈ 1.0 in its parent but Jaccard
    ≈ 0.5, the case the containment operator exists for."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source")
    w = F.split(F.col("text"), " ")
    frags = docs.filter(F.col("doc_id") % 31 == 0).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.array_join(
            F.slice(w, 1, F.ceil(F.size(w) / 2).cast("int")), " ")
        .alias("text"),
        "lang", "source",
    )
    return docs.unionByName(frags)


SQL_DOCS_WITH_FRAGMENTS = """
SELECT doc_id, text, lang, source FROM documents
UNION ALL
SELECT doc_id + 20000,
       array_to_string(
         (string_split(text, ' '))[1:CAST(ceil(
            len(string_split(text, ' ')) / 2.0) AS INTEGER)], ' '),
       lang, source
FROM documents WHERE doc_id % 31 = 0
"""


# ---------------------------------------------------------------------------
# Dedup family

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    return exact_dedup(_docs_with_dupes(spark, sf_dir))


SQL_DEDUP_EXACT = f"""
WITH all_docs AS ({SQL_DOCS_WITH_DUPES})
SELECT md5({D_NORM}) AS content_hash, min(doc_id) AS keep_id, count(*) AS dup_count
FROM all_docs GROUP BY 1
"""


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    return minhash_candidate_pairs(
        _docs_with_dupes(spark, sf_dir), bands=4, rows_per_band=2, shingle_k=3
    )


def _sql_sig_col(j: int) -> str:
    """DuckDB mirror of the universal-hash MinHash permutation
    (datapipe/dedup.py minhash_coeffs / _signatures_from_shingles):
    32-bit base from md5's first 8 hex chars, then (a*x+b) mod P."""
    from sequin_spark.datapipe.dedup import MINHASH_PRIME, minhash_coeffs

    a, b = minhash_coeffs(j)
    return (
        f"min(({a} * ('0x' || substr(md5(sh), 1, 8))::BIGINT + {b}) "
        f"% {MINHASH_PRIME}) AS sig{j}"
    )


def _sql_minhash_cte(docs_sql: str | None = None) -> str:
    """Shared CTE chain ending in `cand(doc_a, doc_b)` — the MinHash-LSH
    candidate pairs over ``docs_sql`` (default: _docs_with_dupes;
    bands=4, rows_per_band=2, shingle_k=3), mirroring
    minhash_candidate_pairs exactly."""
    sig_cols = ", ".join(_sql_sig_col(j) for j in range(1, 9))
    band_selects = "\nUNION ALL ".join(
        f"SELECT doc_id, {b} AS band, sig{2 * b - 1} || '|' || sig{2 * b} AS key FROM sig"
        for b in range(1, 5)
    )
    return f"""
WITH all_docs AS ({docs_sql or SQL_DOCS_WITH_DUPES}),
w AS (SELECT doc_id, string_split({D_NORM}, ' ') AS w FROM all_docs),
sh AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
       FROM w, unnest(generate_series(1, len(w) - 2)) AS t(i)),
sig AS (SELECT doc_id, {sig_cols} FROM sh GROUP BY doc_id),
bands AS ({band_selects}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
"""


def _sql_minhash() -> str:
    return _sql_minhash_cte() + "SELECT doc_a, doc_b FROM cand"


def q_dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: MinHash-LSH candidate pairs → connected
    components → (doc_id, cluster_id, keep). A~B, B~C collapse into one
    cluster even when A~C never surfaced as a pair — the per-cluster
    representative (min doc_id) is the curation keep decision."""
    from sequin_spark.datapipe.dedup import (
        cluster_representatives,
        connected_components,
    )

    _prep(spark)
    pairs = minhash_candidate_pairs(
        _docs_with_dupes(spark, sf_dir), bands=4, rows_per_band=2, shingle_k=3
    )
    comps = connected_components(pairs)
    return cluster_representatives(comps).orderBy("doc_id")


def _sql_cluster_components() -> str:
    """Transitive closure by recursive CTE (small graph at oracle scale;
    Spark side uses the O(rounds)=diameter min-label propagation)."""
    cte = _sql_minhash_cte().replace("WITH ", "WITH RECURSIVE ", 1)
    return cte + """,
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM cand
  UNION SELECT doc_b, doc_a FROM cand
),
nodes AS (SELECT DISTINCT a AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id
)
SELECT id AS doc_id,
       (id = min(r)) AS keep,
       min(r) AS cluster_id
FROM reach GROUP BY id
"""


def q_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC eval-set decontamination — the embedding-space
    complement of the n-gram pass (corpus_decontaminate): corpus
    vectors whose cosine to any eval vector is ≥ 0.9 are leakage
    suspects even when no 8-gram matches (paraphrases, translations,
    near-rewrites).  Scale path: sign-random-projection LSH buckets on
    BOTH sides, candidates only from bucket collisions (positive
    scaling preserves signs, so the planted leaks — eval vectors ×1.5
    injected into the corpus — collide with certainty and score cosine
    exactly 1.0), then one exact cosine verify per candidate.  Never
    all-pairs; the eval side is tiny and broadcasts."""
    from sequin_spark.datapipe.similarity import (cosine_col,
                                                  hyperplane_buckets)

    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding")
    eval_set = emb.filter(F.col("vec_id") < 20)
    leaks = eval_set.select(
        (F.col("vec_id") + 50000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.5))
        .alias("embedding"))
    corpus = emb.filter(F.col("vec_id") >= 20).unionByName(leaks)
    # keep_vec=True carries the raw vectors through the bucket pass, so
    # candidate verify happens in the SAME corpus scan: one pass and one
    # broadcast join instead of bucketing the corpus, then re-scanning +
    # shuffling it by corp_id to re-fetch embeddings for the verify (the
    # old shape's corp_id join was a full corpus shuffle at scale).
    b_eval = hyperplane_buckets(eval_set, 8, keep_vec=True).select(
        F.col("vec_id").alias("eval_id"), "bucket",
        F.col("embedding").alias("ev"))
    b_corp = hyperplane_buckets(corpus, 8, keep_vec=True).select(
        F.col("vec_id").alias("corp_id"), "bucket",
        F.col("embedding").alias("cv"))
    return (b_corp.join(F.broadcast(b_eval), "bucket")
            .withColumn("cos", F.round(cosine_col("cv", "ev"), 3))
            .filter(F.col("cos") >= 0.9)
            .select("corp_id", "eval_id", "cos"))


def _sql_decontaminate_semantic() -> str:
    def bucket_bits(vec: str) -> str:
        bits = []
        for p in range(8):
            dot = (
                f"list_sum(list_transform(generate_series(0, 63), d -> "
                f"(strpos('0123456789abcdef', "
                f"substr(md5('{p}_' || CAST(d AS VARCHAR)), 1, 1)) - 1 - 7.5)"
                f" * CAST({vec}[d + 1] AS DOUBLE)))"
            )
            bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(bits)

    cos = ("list_sum(list_transform(generate_series(1, 64), "
           "i -> CAST(c.embedding[i] AS DOUBLE)"
           " * CAST(e.embedding[i] AS DOUBLE)))"
           " / (sqrt(list_sum(list_transform(generate_series(1, 64), "
           "i -> CAST(c.embedding[i] AS DOUBLE)"
           " * CAST(c.embedding[i] AS DOUBLE))))"
           " * sqrt(list_sum(list_transform(generate_series(1, 64), "
           "i -> CAST(e.embedding[i] AS DOUBLE)"
           " * CAST(e.embedding[i] AS DOUBLE)))))")
    return f"""
WITH eval_set AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20
),
corpus AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 20
  UNION ALL
  SELECT vec_id + 50000,
         list_transform(embedding, x -> x * CAST(1.5 AS FLOAT))
  FROM embeddings WHERE vec_id < 20
),
be AS (SELECT vec_id AS eval_id, CAST({bucket_bits('embedding')} AS INTEGER)
         AS bucket, embedding FROM eval_set),
bc AS (SELECT vec_id AS corp_id, CAST({bucket_bits('embedding')} AS INTEGER)
         AS bucket, embedding FROM corpus),
cand AS (
  SELECT c.corp_id, e.eval_id, round({cos}, 3) AS cos
  FROM bc c JOIN be e ON c.bucket = e.bucket
)
SELECT corp_id, eval_id, cos FROM cand WHERE cos >= 0.9
"""


def q_dedup_quality_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: within each near-dup cluster
    (MinHash-LSH pairs → connected components) keep the HIGHEST-quality
    member (quality_score; tie → min doc_id) instead of the min-id
    policy — the curation rule that keeps the clean original over its
    degraded re-crawl (the dupes fixture's ' the '→' thy ' edit lowers
    the copy's stopword ratio, so the original must win).  Plan: the
    components' label propagation + one quality pass + a per-cluster
    top-1 window (WindowGroupLimit partial top-k)."""
    from pyspark.sql import Window

    from sequin_spark.datapipe.dedup import connected_components
    from sequin_spark.datapipe.text import quality_score

    _prep(spark)
    corpus = _docs_with_dupes(spark, sf_dir)
    pairs = minhash_candidate_pairs(corpus, bands=4, rows_per_band=2,
                                    shingle_k=3)
    comps = connected_components(pairs)
    q = quality_score(corpus).select("doc_id", "quality")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc())
    ranked = (comps.join(q, "doc_id")
              .withColumn("rn", F.row_number().over(w))
              .withColumn("n", F.count("*").over(
                  Window.partitionBy("cluster_id"))))
    return (ranked.filter(F.col("rn") == 1)
            .select("cluster_id",
                    F.col("doc_id").alias("keeper_doc_id"),
                    F.col("n").cast("long").alias("n_members"),
                    F.col("quality").alias("best_quality")))


def _sql_quality_keeper() -> str:
    base = _sql_cluster_components()
    head = base[:base.index("SELECT id AS doc_id")]
    head = head.rstrip().rstrip(")").rstrip()  # re-open the CTE list
    return head + f"""),
comp AS (
  SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
),
qt AS (
  SELECT doc_id, length(nt) AS n_chars,
         len(string_split(nt, ' ')) AS n_tokens,
         len(regexp_extract_all(nt, '[0-9]')) AS n_digits,
         len(regexp_extract_all(nt, '\\b(the|a|of|and|in|to)\\b'))
           AS stop_hits
  FROM (SELECT doc_id, {D_NORM} AS nt FROM all_docs) t
),
q AS (
  SELECT doc_id,
         round(least(1.0, n_tokens / 100.0)
               * (0.5 + 0.5 * stop_hits * 1.0 / n_tokens)
               - n_digits * 1.0 / n_chars, 4) AS quality
  FROM qt
),
ranked AS (
  SELECT c.cluster_id, c.doc_id, q.quality,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.quality DESC, c.doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY c.cluster_id) AS n
  FROM comp c JOIN q ON c.doc_id = q.doc_id
)
SELECT cluster_id, doc_id AS keeper_doc_id,
       CAST(n AS BIGINT) AS n_members, quality AS best_quality
FROM ranked WHERE rn = 1
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    return simhash(_docs_with_dupes(spark, sf_dir))


def _sql_simhash_cte(hex_digits: int = 4) -> str:
    """CTE chain ending in `s(doc_id, simhash)` — the 4*hex_digits-bit
    SimHash over _docs_with_dupes, mirroring datapipe.dedup.simhash."""
    nbits = 4 * hex_digits
    d_cols = ", ".join(
        f"strpos('0123456789abcdef', substr(h, {p}, 1)) - 1 AS d{p}"
        for p in range(1, hex_digits + 1)
    )
    c_cols = ", ".join(
        f"sum(CASE WHEN (d{j // 4 + 1} >> {j % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS c{j}"
        for j in range(nbits)
    )
    fp = " + ".join(f"(CASE WHEN c{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(nbits))
    return f"""
WITH all_docs AS ({SQL_DOCS_WITH_DUPES}),
toks AS (SELECT doc_id, unnest(string_split({D_NORM}, ' ')) AS tok FROM all_docs),
h AS (SELECT doc_id, md5(tok) AS h FROM toks),
d AS (SELECT doc_id, {d_cols} FROM h),
c AS (SELECT doc_id, {c_cols} FROM d GROUP BY doc_id),
s AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM c)
"""


def _sql_simhash() -> str:
    return _sql_simhash_cte(4) + "SELECT doc_id, simhash FROM s"


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash near-dup pairs via pigeonhole chunk bucketing —
    the scale path (4 chunks × 15 bits → 32k-value equi-join key), with
    exact Hamming verify so the result equals the all-pairs join."""
    _prep(spark)
    sim = simhash(_docs_with_dupes(spark, sf_dir), hex_digits=15)
    return simhash_near_pairs(sim, max_hamming=3, nbits=60)


def _sql_simhash_pairs() -> str:
    return _sql_simhash_cte(15) + """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard over MinHash-LSH candidates (scale path:
    band-bucket join generates candidates; no metadata bucket)."""
    _prep(spark)
    return ngram_jaccard_lsh_pairs(
        _docs_with_dupes(spark, sf_dir), n=2, threshold=0.15,
        bands=4, rows_per_band=2, shingle_k=3,
    )


def _sql_ngram_jaccard() -> str:
    return _sql_minhash_cte() + f"""
, g AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1])) AS grams
  FROM (SELECT doc_id, string_split({D_NORM}, ' ') AS w FROM all_docs) t
),
p AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(a.grams, b.grams)) AS inter,
         len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS un
  FROM cand c JOIN g a ON c.doc_a = a.doc_id JOIN g b ON c.doc_b = b.doc_id
)
SELECT doc_a, doc_b, round(CAST(inter AS DOUBLE) / un, 4) AS jaccard
FROM p WHERE round(CAST(inter AS DOUBLE) / un, 4) >= 0.15
"""


def q_dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment over MinHash-LSH candidates
    (datapipe/dedup.ngram_containment_lsh_pairs): fragment/quote
    detection — containment(A⊂B) = |∩|/|grams(A)| ≈ 1.0 where Jaccard
    ≈ 0.5 (Broder's resemblance-vs-containment split).  Runs over the
    fragment-injected corpus so the operator has true subsets to
    find."""
    from sequin_spark.datapipe.dedup import ngram_containment_lsh_pairs

    _prep(spark)
    return ngram_containment_lsh_pairs(
        _docs_with_fragments(spark, sf_dir), n=2, threshold=0.7,
        bands=4, rows_per_band=2, shingle_k=3,
    )


def _sql_ngram_containment() -> str:
    return _sql_minhash_cte(SQL_DOCS_WITH_FRAGMENTS) + f"""
, g AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1])) AS grams
  FROM (SELECT doc_id, string_split({D_NORM}, ' ') AS w FROM all_docs) t
),
p AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(a.grams, b.grams)) AS inter,
         len(a.grams) AS na, len(b.grams) AS nb
  FROM cand c JOIN g a ON c.doc_a = a.doc_id JOIN g b ON c.doc_b = b.doc_id
)
SELECT CASE WHEN na <= nb THEN doc_a ELSE doc_b END AS doc_small,
       CASE WHEN na <= nb THEN doc_b ELSE doc_a END AS doc_large,
       round(CAST(inter AS DOUBLE) / least(na, nb), 4) AS containment,
       round(CAST(inter AS DOUBLE) / (na + nb - inter), 4) AS jaccard
FROM p
WHERE round(CAST(inter AS DOUBLE) / least(na, nb), 4) >= 0.7
"""


def q_embed_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs within an LSH (sign-random-projection)
    bucket — the scale path: candidates are bucket-equi-join collisions
    (2^n_planes uniform buckets), never a low-cardinality metadata key.

    The plane count ADAPTS to corpus size (auto_n_planes: smallest p
    with 2^p·125 ≥ n, floor 4) so expected bucket size stays bounded
    and candidate pairs grow linearly, not quadratically — the fix for
    the measured 35× wall-clock on 10× data at fixed planes (SCALE.md
    sf1 decade).  Cost of the rule is one bounded 1-row count action;
    the DuckDB oracle derives the identical p from count(*) with the
    same integer rule, so results match at every sf."""
    from sequin_spark.datapipe.similarity import as_double, auto_n_planes

    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    n_planes = auto_n_planes(emb.count())
    # materialize (vec_id, bucket, double-cast vector, norm) ONCE — the
    # self-join below would otherwise evaluate the 4 hyperplane dot
    # products, the float→double cast AND the vector norm per PAIR
    # (norms are per-vector quantities; the pair loop then runs a single
    # dot-product fold per candidate — the semdedup hoist, identical
    # fold arithmetic so values still match the oracle bit-for-bit)
    norm = F.sqrt(F.aggregate(F.col("ed"), F.lit(0.0),
                              lambda acc, x: acc + x * x))
    # keep_vec: bucket + vector in ONE corpus pass (the old join-back by
    # vec_id re-scanned the corpus and shuffled it by id — see ann_lsh_topk)
    bk = (hyperplane_buckets(emb, n_planes=n_planes, keep_vec=True)
          .withColumn("ed", as_double("embedding"))
          .withColumn("nv", norm)
          .select("vec_id", "bucket", "ed", "nv")
          .localCheckpoint())
    a = bk.select(
        F.col("vec_id").alias("vec_a"), F.col("bucket"),
        F.col("ed").alias("ea"), F.col("nv").alias("na"),
    )
    b = bk.select(
        F.col("vec_id").alias("vec_b"), F.col("bucket"),
        F.col("ed").alias("eb"), F.col("nv").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("ea"), F.col("eb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    pairs = pairs.withColumn("cos", dot / (F.col("na") * F.col("nb")))
    return pairs.filter(F.col("cos") > 0.3).select(
        "vec_a", "vec_b", "bucket", F.round("cos", 3).alias("cos")
    )


def _sql_bucket_expr(n_planes: int) -> str:
    """DuckDB expression for the hyperplane LSH bucket of `embedding`
    (64 dims), mirroring datapipe.similarity.hyperplane_buckets."""
    bits = []
    for p in range(n_planes):
        dot = (
            f"list_sum(list_transform(generate_series(0, 63), d -> "
            f"(strpos('0123456789abcdef', substr(md5('{p}_' || CAST(d AS VARCHAR)), 1, 1)) - 1 - 7.5)"
            f" * CAST(embedding[d + 1] AS DOUBLE)))"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(bits)


def _sql_embed_neardup_cosine() -> str:
    """STATIC string, DYNAMIC plane count: the SQL derives the same
    auto_n_planes(count(*)) integer rule the Spark query applies (the
    smallest p ≥ 4 with 2^p·125 ≥ n), then folds the p sign-projection
    bits inside a generate_series lambda — identical md5 hyperplane
    coefficients, identical buckets at every sf."""
    return """
WITH nv AS (SELECT count(*) AS n FROM embeddings),
pl AS (
  -- coalesce mirrors auto_n_planes' max_planes=20 fallback: for
  -- n > 2^20*125 (~131M vectors) no p in 4..20 satisfies the bound
  -- and a bare min(p) would NULL out every bucket silently
  SELECT coalesce(min(p), 20) AS np
  FROM (SELECT unnest(generate_series(4, 20)) AS p), nv
  WHERE (CAST(1 AS BIGINT) << p) * 125 >= nv.n
),
bk AS (
  SELECT vec_id,
         CAST(list_sum(list_transform(
           generate_series(0, (SELECT np FROM pl) - 1),
           p -> CASE WHEN list_sum(list_transform(generate_series(0, 63),
                  d -> (strpos('0123456789abcdef',
                          substr(md5(CAST(p AS VARCHAR) || '_'
                                     || CAST(d AS VARCHAR)), 1, 1))
                        - 1 - 7.5)
                       * CAST(embedding[d + 1] AS DOUBLE))) > 0
                THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)) AS INTEGER)
           AS bucket,
         embedding
  FROM embeddings
),
p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket,
         list_sum(list_transform(generate_series(1, len(a.embedding)),
                  i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(generate_series(1, len(a.embedding)),
                  i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
          * sqrt(list_sum(list_transform(generate_series(1, len(b.embedding)),
                  i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))) AS cos
  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, bucket, round(cos, 3) AS cos FROM p WHERE cos > 0.3
"""


def q_ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, queries, k=3)


SQL_ANN_TOPK_BRUTEFORCE = """
WITH c AS (
  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         list_sum(list_transform(generate_series(1, len(q.embedding)),
                  i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(generate_series(1, len(q.embedding)),
                  i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
          * sqrt(list_sum(list_transform(generate_series(1, len(n.embedding)),
                  i -> CAST(n.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE))))) AS cos
  FROM embeddings q, embeddings n
  WHERE q.vec_id < 10 AND q.vec_id != n.vec_id
),
r AS (SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rnk
      FROM c)
SELECT q_id, n_id, rnk, round(cos, 3) AS cos FROM r WHERE rnk <= 3
"""


def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection LSH bucket assignment (the ANN scale path)."""
    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return hyperplane_buckets(emb, n_planes=8)


def _sql_ann_lsh_buckets() -> str:
    bits = []
    for p in range(8):
        dot = (
            f"list_sum(list_transform(generate_series(0, 63), d -> "
            f"(strpos('0123456789abcdef', substr(md5('{p}_' || CAST(d AS VARCHAR)), 1, 1)) - 1 - 7.5)"
            f" * CAST(embedding[d + 1] AS DOUBLE)))"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return f"SELECT vec_id, CAST({' + '.join(bits)} AS INTEGER) AS bucket FROM embeddings"


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over the deterministic Lloyd quantizer (md5-seeded init,
    fixed iteration count) — exactly reproducible, so the full inverted-
    list search result is hash-checked against the SQL oracle. The
    ML-KMeans production path (ivf_index/ann_ivf_topk with prebuilt
    index reuse) is recall-tested in tests/test_datapipe.py."""
    from sequin_spark.datapipe.similarity import (
        SemDedupIndex,
        ann_ivf_det_topk,
        build_semdedup_index,
    )

    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    # the coarse quantizer + inverted-list assignments persist per
    # corpus (DedupIndex pattern) — searches skip the k-means fit
    idx = _maintained_index(
        spark, sf_dir, "ivfdet_index", "c8i1-v1",
        lambda path: build_semdedup_index(emb, k=8, iters=1).save(path),
        SemDedupIndex.load,
    )
    return ann_ivf_det_topk(emb, queries, k=3, n_probe=4, index=idx)


def _sql_cos(a: str, b: str) -> str:
    """DuckDB cosine over two float-array columns (cast per element)."""
    return (
        f"list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
        f" / (sqrt(list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
        f" * sqrt(list_sum(list_transform(generate_series(1, len({b})), "
        f"i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))))"
    )


def _sql_l2(va: str, vb: str, dims: int = 64) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {dims}), "
        f"i -> ({va}[i] - {vb}[i]) * ({va}[i] - {vb}[i])))"
    )


def _sql_cosd(va: str, vb: str, dims: int = 64) -> str:  # already-double lists
    return (
        f"list_sum(list_transform(generate_series(1, {dims}), i -> {va}[i] * {vb}[i]))"
        f" / (sqrt(list_sum(list_transform(generate_series(1, {dims}), i -> {va}[i] * {va}[i])))"
        f" * sqrt(list_sum(list_transform(generate_series(1, {dims}), i -> {vb}[i] * {vb}[i]))))"
    )


def _sql_det_assign(k_cent: int = 8, iters: int = 1, dims: int = 64) -> str:
    """Shared CTE chain replicating the deterministic quantizer
    (similarity.py det_centroids + assign_to_centroids): md5-seeded
    centroids, `iters` Lloyd iterations, final assignment as ``af``
    (vec_id, v, c_id). Callers append their own CTEs/SELECT."""
    sql = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
c0 AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS c_id, v AS c
  FROM e QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) <= {k_cent}
)"""
    prev = "c0"
    for it in range(1, iters + 1):
        sql += f""",
a{it} AS (
  SELECT vec_id, v, c_id FROM (
    SELECT e.vec_id, e.v, {prev}.c_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_sql_l2('e.v', prev + '.c', dims)} ASC, {prev}.c_id ASC) AS rn
    FROM e CROSS JOIN {prev}) t
  WHERE rn = 1
),
c{it} AS (
  SELECT c_id, list(m ORDER BY d) AS c FROM (
    SELECT c_id, d, avg(v[d]) AS m
    FROM a{it}, unnest(generate_series(1, {dims})) AS t(d)
    GROUP BY c_id, d) s
  GROUP BY c_id
)"""
        prev = f"c{it}"
    sql += f""",
af AS (
  SELECT vec_id, v, c_id FROM (
    SELECT e.vec_id, e.v, {prev}.c_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_sql_l2('e.v', prev + '.c', dims)} ASC, {prev}.c_id ASC) AS rn
    FROM e CROSS JOIN {prev}) t
  WHERE rn = 1
)"""
    return sql


def _sql_ann_ivf_det(k_cent: int = 8, iters: int = 1, n_probe: int = 4,
                     topk: int = 3, dims: int = 64,
                     final_select: bool = True) -> str:
    """Full SQL replica of ann_ivf_det_topk: md5-seeded centroids,
    `iters` Lloyd iterations, final assignment, probe-n_probe search."""
    def dist(va: str, vb: str) -> str:
        return _sql_l2(va, vb, dims)

    def cosd(va: str, vb: str) -> str:
        return _sql_cosd(va, vb, dims)

    prev = f"c{iters}" if iters else "c0"
    sql = _sql_det_assign(k_cent, iters, dims)
    sql += f""",
q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < 10),
pr AS (
  SELECT q_id, q_vec, c_id FROM (
    SELECT q.q_id, q.q_vec, c.c_id,
           row_number() OVER (PARTITION BY q.q_id
                              ORDER BY {dist('q.q_vec', 'c.c')} ASC, c.c_id ASC) AS rk
    FROM q CROSS JOIN {prev} c) t
  WHERE rk <= {n_probe}
),
cand AS (
  SELECT pr.q_id, af.vec_id AS n_id, {cosd('pr.q_vec', 'af.v')} AS cos
  FROM pr JOIN af ON pr.c_id = af.c_id AND pr.q_id != af.vec_id
),
r AS (SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rnk
      FROM cand)"""
    if not final_select:
        return sql
    return sql + f"""
SELECT q_id, n_id, rnk, round(cos, 3) AS cos FROM r WHERE rnk <= {topk}
"""


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (SemDeDup): deterministic k-means over the
    embedding space, within-cluster cosine ≥ threshold ⇒ duplicate of
    the lowest-id clustermate. Pairwise work is bounded per cluster —
    the knob that scales is k, not the corpus."""
    from sequin_spark.datapipe.similarity import (
        SemDedupIndex,
        build_semdedup_index,
        semdedup,
    )

    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    # auto-k: k = max(16, ceil(N/125)) — 16 at the oracle scales
    # (N=500 @sf0.01, N=2000 @sf0.1), growing with N beyond so
    # within-cluster pairwise work stays O(N·125) at any corpus size.
    # The fitted quantizer is MAINTAINED per corpus (DedupIndex
    # pattern): built+saved on first use, loaded afterwards — repeat
    # dedup passes skip the k-means fit and assignment scan.
    idx = _maintained_index(
        spark, sf_dir, "semdedup_index", "k16t125i1-v1",
        lambda path: build_semdedup_index(
            emb, k=16, iters=1, target_cluster_size=125).save(path),
        SemDedupIndex.load,
    )
    return semdedup(emb, threshold=0.3, index=idx)


def _sql_semdedup(k_cent: int = 8, iters: int = 1, threshold: float = 0.3,
                  dims: int = 64) -> str:
    return _sql_det_assign(k_cent, iters, dims) + f""",
p AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         {_sql_cosd('a.v', 'b.v', dims)} AS cos
  FROM af a JOIN af b ON a.c_id = b.c_id AND a.vec_id < b.vec_id
),
d AS (
  SELECT b_id AS vec_id, min(a_id) AS dup_of
  FROM p WHERE cos >= {threshold} GROUP BY b_id
)
SELECT af.vec_id, af.c_id, d.dup_of, d.dup_of IS NOT NULL AS is_dup
FROM af LEFT JOIN d ON af.vec_id = d.vec_id
"""


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN search — approximate vs brute force but fully
    deterministic (md5 hyperplanes), so the result is hash-checked
    against a SQL oracle replicating bucket + multi-probe search."""
    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ann_lsh_topk(emb, queries, k=3, n_planes=4)


def _sql_ann_lsh_topk() -> str:
    probe_union = "".join(
        f"\n  UNION ALL SELECT vec_id, xor(bucket, {1 << p}) AS bucket, embedding FROM q0"
        for p in range(4)
    )
    return f"""
WITH bk AS (
  SELECT vec_id, CAST({_sql_bucket_expr(4)} AS INTEGER) AS bucket, embedding
  FROM embeddings
),
q0 AS (SELECT vec_id, bucket, embedding FROM bk WHERE vec_id < 10),
qb AS (
  SELECT vec_id, bucket, embedding FROM q0{probe_union}
),
cand AS (
  SELECT qb.vec_id AS q_id, n.vec_id AS n_id, {_sql_cos('qb.embedding', 'n.embedding')} AS cos
  FROM qb JOIN bk n ON qb.bucket = n.bucket AND qb.vec_id != n.vec_id
),
r AS (SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rnk
      FROM cand)
SELECT q_id, n_id, rnk, round(cos, 3) AS cos FROM r WHERE rnk <= 3
"""


# ---------------------------------------------------------------------------
# Text analysis

def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    return langid(load_table(spark, sf_dir, "documents"))


def _sql_langid() -> str:
    from sequin_spark.datapipe.text import STOPWORDS

    hits = ", ".join(
        f"len(regexp_extract_all({D_NORM}, '\\b({'|'.join(ws)})\\b')) AS hits_{lang}"
        for lang, ws in STOPWORDS.items()
    )
    return f"""
WITH h AS (SELECT doc_id, {hits} FROM documents)
SELECT doc_id, hits_en, hits_de, hits_es, hits_fr,
  CASE WHEN greatest(hits_de, hits_en, hits_es, hits_fr) = 0 THEN 'und'
       WHEN hits_de >= hits_en AND hits_de >= hits_es AND hits_de >= hits_fr THEN 'de'
       WHEN hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
       WHEN hits_es >= hits_fr THEN 'es'
       ELSE 'fr' END AS predicted_lang
FROM h
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    return quality_score(load_table(spark, sf_dir, "documents"))


SQL_TEXT_QUALITY = f"""
WITH t AS (
  SELECT doc_id, length({D_NORM}) AS n_chars,
         len(string_split({D_NORM}, ' ')) AS n_tokens,
         len(regexp_extract_all({D_NORM}, '[0-9]')) AS n_digits,
         len(regexp_extract_all({D_NORM}, '\\b(the|a|of|and|in|to)\\b')) AS stop_hits
  FROM documents
),
s AS (
  SELECT doc_id, n_chars, n_tokens,
         round((n_chars - (n_tokens - 1)) * 1.0 / n_tokens, 4) AS avg_token_len,
         round(stop_hits * 1.0 / n_tokens, 4) AS stop_ratio,
         round(least(1.0, n_tokens / 100.0) * (0.5 + 0.5 * stop_hits * 1.0 / n_tokens)
               - n_digits * 1.0 / n_chars, 4) AS quality
  FROM t
)
SELECT doc_id, n_chars AS n_chars_norm, n_tokens, avg_token_len, stop_ratio, quality,
       (n_chars >= 50 AND n_tokens >= 10 AND quality > 0.1) AS keep
FROM s
"""


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    return token_counts(load_table(spark, sf_dir, "documents"))


SQL_TEXT_TOKENS = f"""
SELECT doc_id,
       length({D_NORM}) AS n_chars_norm,
       len(string_split({D_NORM}, ' ')) AS n_ws_tokens,
       len(regexp_extract_all({D_NORM}, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_re_tokens,
       CAST(ceil(length({D_NORM}) / 4.0) AS BIGINT) AS n_bpe_est
FROM documents
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    return fingerprint(load_table(spark, sf_dir, "documents"))


SQL_TEXT_FINGERPRINT = f"""
WITH t AS (SELECT doc_id, {D_NORM} AS t FROM documents)
SELECT doc_id, md5(t) AS content_md5,
       list_aggregate(list_transform(generate_series(1, greatest(1, length(t) - 7)),
                                     i -> md5(substr(t, i, 8))), 'min') AS min_gram_hash
FROM t
"""


# ---------------------------------------------------------------------------
# Multimodal

def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column → Arrow-batched stub decode via mapInPandas
    (real Spark plumbing; decode kernel stubbed, see datapipe.multimodal)."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media(docs, "text", media_type="image")
    return decode_media(media)


SQL_MULTIMODAL_DECODE = """
SELECT doc_id, 'image' AS media_type, CAST(length(text) AS BIGINT) AS n_bytes,
       CAST(length(text) % 640 + 1 AS INTEGER) AS width,
       CAST(length(text) % 480 + 1 AS INTEGER) AS height,
       CAST(length(text) % 24 + 1 AS INTEGER) AS n_frames,
       CAST(16000 AS INTEGER) AS sample_rate,
       'stub_decoded' AS status
FROM documents
"""


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling plan: every-4th-frame explode over the stub
    decode's frame counts — the mapInPandas → explode shape a real
    ffmpeg keyframe extractor plugs into."""
    from sequin_spark.datapipe.multimodal import frame_sample

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media(docs, "text", media_type="video")
    return frame_sample(media, every_n=4)


SQL_MULTIMODAL_FRAME_SAMPLE = """
SELECT doc_id, unnest(generate_series(0, length(text) % 24, 4)) AS frame_idx
FROM documents
"""


def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for hot keys (operators/skew.py) —
    result must equal the plain group-by count."""
    from sequin_spark.operators.skew import salted_count

    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return salted_count(li, "l_returnflag", salt_buckets=16).withColumnRenamed(
        "l_returnflag", "returnflag"
    )


SQL_SKEW_SALTED_AGG = """
SELECT l_returnflag AS returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag
"""


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed training-data pipeline: quality filter → exact dedup →
    language ID → per-language corpus stats (the end-to-end curation
    shape every LLM data pipeline runs)."""
    from sequin_spark.datapipe.text import langid, normalized, quality_score

    _prep(spark)
    docs = _docs_with_dupes(spark, sf_dir)
    # One corpus pass end to end.  quality_score(carry=text) keeps the
    # text column, so the keep-filter needs no semi-join back to docs;
    # exact dedup's winner rule (min doc_id per content hash) is a keyed
    # window over the SAME rows instead of a hash-agg + second semi-join.
    # The old shape re-derived `kept` three times and shuffled full text
    # by doc_id twice; this shuffles it once, by content hash — identical
    # surviving set (min is exact), identical rollup.
    # NOTE (r14): a spread_for_compute before the quality pass was
    # A/B-tested and LOST (0.88× — the md5-window shuffle right after
    # already redistributes, so the extra exchange only added cost);
    # reverted, kept serial-to-first-shuffle deliberately.
    kept = (quality_score(docs, carry=("text",))
            .filter(F.col("keep")).select("doc_id", "text"))
    w_fp = Window.partitionBy(F.md5(normalized("text")))
    surviving = (
        kept.withColumn("_keep_id", F.min("doc_id").over(w_fp))
        .filter(F.col("doc_id") == F.col("_keep_id"))
        .select("doc_id", "text")
    )
    lang = langid(surviving)
    return lang.groupBy("predicted_lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("hits_en").alias("total_en_hits"),
    )


SQL_CORPUS_CURATION = f"""
WITH all_docs AS ({SQL_DOCS_WITH_DUPES}),
q AS (
  SELECT doc_id, text,
         length({D_NORM}) AS n_chars,
         len(string_split({D_NORM}, ' ')) AS n_tokens,
         len(regexp_extract_all({D_NORM}, '[0-9]')) AS n_digits,
         len(regexp_extract_all({D_NORM}, '\\b(the|a|of|and|in|to)\\b')) AS stop_hits
  FROM all_docs
),
kept AS (
  SELECT doc_id, text FROM q
  WHERE n_chars >= 50 AND n_tokens >= 10
    AND round(least(1.0, n_tokens / 100.0) * (0.5 + 0.5 * stop_hits * 1.0 / n_tokens)
              - n_digits * 1.0 / n_chars, 4) > 0.1
),
dedup AS (
  SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5({D_NORM})
),
surviving AS (SELECT k.doc_id, k.text FROM kept k JOIN dedup d ON k.doc_id = d.doc_id),
h AS (
  SELECT doc_id,
         len(regexp_extract_all({D_NORM}, '\\b(the|a|of|and|in|to)\\b')) AS hits_en,
         len(regexp_extract_all({D_NORM}, '\\b(der|die|das|und|ist)\\b')) AS hits_de,
         len(regexp_extract_all({D_NORM}, '\\b(el|la|los|de|y|es)\\b')) AS hits_es,
         len(regexp_extract_all({D_NORM}, '\\b(le|la|les|et|est)\\b')) AS hits_fr
  FROM surviving
),
lang AS (
  SELECT doc_id, hits_en,
    CASE WHEN greatest(hits_de, hits_en, hits_es, hits_fr) = 0 THEN 'und'
         WHEN hits_de >= hits_en AND hits_de >= hits_es AND hits_de >= hits_fr THEN 'de'
         WHEN hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
         WHEN hits_es >= hits_fr THEN 'es'
         ELSE 'fr' END AS predicted_lang
  FROM h
)
SELECT predicted_lang, count(*) AS n_docs, CAST(sum(hits_en) AS BIGINT) AS total_en_hits
FROM lang GROUP BY predicted_lang
"""


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-ingest dedup: the shifted copies arrive as a NEW batch
    and join the existing corpus's LSH band index — new docs never join
    each other, so ingest cost is independent of corpus size.

    The corpus index is MAINTAINED, not rebuilt: built and saved to a
    cache dir keyed by the sf dir on first use (one shingle pass feeds
    both band keys and verify grams), then every subsequent ingest
    ``DedupIndex.load``s it — the corpus text is never re-read."""
    from sequin_spark.datapipe.dedup import (
        DedupIndex,
        build_dedup_index,
        incremental_dedup,
    )

    _prep(spark)
    corpus = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    new_docs = corpus.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.expr("replace(text, ' the ', ' thy ')").alias("text"),
    )
    # v2: universal-hash signature scheme — versioned (and keyed on the
    # documents fingerprint) so a cached index built under an older
    # scheme or against regenerated data is never joined against.
    # grams/_SUCCESS is DedupIndex.save's LAST artifact, so the probe is
    # crash-safe.
    idx_path = _index_cache_path(sf_dir, "dedup_index", "sig-v2",
                                 src_table="documents")
    if not os.path.exists(os.path.join(idx_path, "grams", "_SUCCESS")):
        build_dedup_index(corpus).save(idx_path)
    return incremental_dedup(
        new_docs, index=DedupIndex.load(spark, idx_path), threshold=0.5
    )


def _sql_dedup_incremental() -> str:
    sig_cols = ", ".join(_sql_sig_col(j) for j in range(1, 9))
    band_selects = "\nUNION ALL ".join(
        f"SELECT doc_id, {b} AS band, sig{2 * b - 1} || '|' || sig{2 * b} AS key "
        f"FROM {{src}}_sig"
        for b in range(1, 5)
    )

    def chain(src: str) -> str:
        return f"""
{src}_w AS (SELECT doc_id, string_split({D_NORM}, ' ') AS w FROM {src}),
{src}_sh AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
             FROM {src}_w, unnest(generate_series(1, len(w) - 2)) AS t(i)),
{src}_sig AS (SELECT doc_id, {sig_cols} FROM {src}_sh GROUP BY doc_id),
{src}_bands AS ({band_selects.replace('{src}', src)}),
{src}_g AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(w) - 2),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS grams
  FROM {src}_w
)"""

    return f"""
WITH corp AS (SELECT doc_id, text FROM documents),
newd AS (SELECT doc_id + 10000 AS doc_id, replace(text, ' the ', ' thy ') AS text
         FROM documents WHERE doc_id % 25 = 0),
{chain('corp')},
{chain('newd')},
cand AS (
  SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
  FROM newd_bands n JOIN corp_bands c ON n.band = c.band AND n.key = c.key
),
v AS (
  SELECT cand.new_id, cand.corpus_id,
         round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))),
               4) AS jaccard
  FROM cand JOIN newd_g a ON cand.new_id = a.doc_id
            JOIN corp_g b ON cand.corpus_id = b.doc_id
),
best AS (
  SELECT new_id, corpus_id, jaccard,
         row_number() OVER (PARTITION BY new_id ORDER BY corpus_id) AS rk
  FROM v WHERE jaccard >= 0.5
)
SELECT n.doc_id, b.corpus_id AS duplicate_of, b.jaccard
FROM newd n LEFT JOIN best b ON n.doc_id = b.new_id AND b.rk = 1
"""


def q_corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed multinomial mixing (mT5/XLM-R α-sampling,
    α=0.5): per-lang target share ∝ sqrt(n_i/N), deterministic
    hash-predicate selection toward a document budget."""
    from sequin_spark.datapipe.curation import temperature_mix

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return temperature_mix(docs, budget_docs=2000)


def _sql_corpus_temperature_mix(budget_docs: int = 2000) -> str:
    h16 = _sql_h16_of("CAST(doc_id AS VARCHAR)")
    return f"""
WITH counts AS (
  SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang
),
tot AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS n_total FROM counts),
sh AS (
  SELECT stratum, n_docs, sqrt(n_docs / n_total) AS share
  FROM counts CROSS JOIN tot
),
-- sorted left-fold with 0.0 init: bit-identical to Spark's
-- aggregate(sort_array(collect_list(share)), 0.0, +) — an unordered
-- SUM() could differ in the last ulp and flip a keep boundary
ssum AS (
  SELECT list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
                        list_sort(list(CAST(share AS DOUBLE)))),
           (a, b) -> a + b) AS share_total
  FROM sh
),
rated AS (
  SELECT stratum, n_docs,
         share / share_total AS target_share,
         least(CAST(1.0 AS DOUBLE),
               share / share_total * {budget_docs} / n_docs) AS keep_p
  FROM sh CROSS JOIN ssum
),
r2 AS (
  SELECT stratum, n_docs, target_share, keep_p,
         CAST(floor(keep_p * 65536) AS BIGINT) AS rate_scaled
  FROM rated
),
samp AS (
  SELECT d.lang AS stratum, CAST(count(*) AS BIGINT) AS n_sampled
  FROM documents d JOIN r2 ON d.lang = r2.stratum
  WHERE ({h16}) < r2.rate_scaled
  GROUP BY d.lang
)
SELECT r2.stratum, r2.n_docs,
       round(r2.target_share, 4) AS target_share,
       round(r2.keep_p, 4) AS keep_p,
       CAST(coalesce(samp.n_sampled, 0) AS BIGINT) AS n_sampled
FROM r2 LEFT JOIN samp USING (stratum)
"""


def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the deterministic-IVF index (n_probe=2 of 8 lists)
    against exact brute force — the quality gauge every approximate
    index ships with. Both searches and the recall join are
    deterministic, so per-query recall is hash-checked end-to-end."""
    from sequin_spark.datapipe.similarity import (
        SemDedupIndex,
        ann_ivf_det_topk,
        ann_recall,
        brute_force_topk,
        build_semdedup_index,
    )

    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    idx = _maintained_index(
        spark, sf_dir, "ivfdet_index", "c8i1-v1",
        lambda path: build_semdedup_index(emb, k=8, iters=1).save(path),
        SemDedupIndex.load,
    )
    approx = ann_ivf_det_topk(emb, queries, k=10, n_probe=2, index=idx)
    ground = brute_force_topk(emb, queries, k=10)
    return ann_recall(ground, approx, k=10)


def _sql_ann_recall_eval(topk: int = 10, n_probe: int = 2) -> str:
    # det-IVF chain (shared with the ann_ivf_topk oracle) ends at CTE
    # `r`; append the exact ground truth + (q_id, n_id) intersection
    ivf = _sql_ann_ivf_det(k_cent=8, iters=1, n_probe=n_probe,
                           topk=topk, final_select=False)
    return ivf + f""",
ivf AS (SELECT q_id, n_id FROM r WHERE rnk <= {topk}),
gcand AS (
  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         {_sql_cos('q.embedding', 'n.embedding')} AS cos
  FROM embeddings q JOIN embeddings n ON q.vec_id != n.vec_id
  WHERE q.vec_id < 10
),
ground AS (
  SELECT q_id, n_id FROM (
    SELECT q_id, n_id,
           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rnk
    FROM gcand) t
  WHERE rnk <= {topk}
),
hits AS (
  SELECT g.q_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM ground g JOIN ivf USING (q_id, n_id)
  GROUP BY g.q_id
)
SELECT q.q_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / {topk}, 4) AS recall
FROM (SELECT DISTINCT q_id FROM ground) q
LEFT JOIN hits h USING (q_id)
"""


def q_corpus_unimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax budget allocation (curation.py:unimax_allocation):
    closed-form waterfilling with a 4-epoch cap per language."""
    from sequin_spark.datapipe.curation import unimax_allocation

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return unimax_allocation(docs, budget_docs=1300, max_epochs=4)


def _sql_corpus_unimax(budget: int = 1300, epochs: int = 4) -> str:
    return f"""
WITH counts AS (
  SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang
),
caps AS (
  SELECT stratum, n_docs, n_docs * {epochs} AS capacity,
         row_number() OVER (ORDER BY n_docs * {epochs}, stratum) AS j,
         count(*) OVER () AS k,
         coalesce(sum(n_docs * {epochs}) OVER (
           ORDER BY n_docs * {epochs}, stratum
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
  FROM counts
),
-- integer capping test; the capped set is the ascending prefix before
-- the FIRST failure (later rows can pass it spuriously because their
-- prefix includes uncapped capacities — minimality makes that moot)
flags AS (
  SELECT *, capacity * (k - j + 1) <= {budget} - prefix AS self_ok FROM caps
),
m AS (SELECT min(j) AS m FROM flags WHERE NOT self_ok),
fs AS (
  SELECT (CAST({budget} AS DOUBLE) - prefix) / (k - j + 1) AS frozen_share
  FROM flags, m WHERE flags.j = m.m
)
SELECT stratum, n_docs, capacity,
       round(CASE WHEN f.j < coalesce(m.m, f.k + 1)
                  THEN CAST(capacity AS DOUBLE)
                  ELSE (SELECT frozen_share FROM fs) END, 4) AS alloc,
       round(CASE WHEN f.j < coalesce(m.m, f.k + 1)
                  THEN CAST(capacity AS DOUBLE)
                  ELSE (SELECT frozen_share FROM fs) END / n_docs, 4) AS epochs,
       f.j < coalesce(m.m, f.k + 1) AS capped
FROM flags f, m
"""


def q_corpus_sample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted stratified sampling: 12k-token budget at weights
    en=.5, others=.125 — deterministic hash selection, oracle-exact."""
    from sequin_spark.datapipe.curation import sample_to_budget

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    weights = {"en": 0.5, "de": 0.125, "es": 0.125, "fr": 0.125, "zh": 0.125}
    s = sample_to_budget(docs, weights, budget_tokens=12_000)
    return s.groupBy("stratum").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sampled_tokens"),
        F.min("rate_scaled").alias("rate_scaled"),
    )


def _sql_corpus_sample_mix() -> str:
    # h16 = int(md5(doc_id)[0:4], 16) via per-hex-digit expansion
    h16 = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {i}, 1)) - 1)"
        f" * {16 ** (4 - i)}"
        for i in range(1, 5)
    )
    weights = (
        "CASE stratum WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.125 WHEN 'es' THEN 0.125 "
        "WHEN 'fr' THEN 0.125 WHEN 'zh' THEN 0.125 END"
    )
    return f"""
WITH base AS (
  SELECT doc_id, lang AS stratum,
         len(string_split({D_NORM}, ' ')) AS n_tokens
  FROM documents
),
totals AS (
  SELECT stratum, CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM base GROUP BY stratum
),
rated AS (
  SELECT stratum, total_tokens,
         CAST(floor(least(1.0, ({weights}) * 12000 / total_tokens) * 65536) AS BIGINT)
           AS rate_scaled
  FROM totals
)
SELECT b.stratum,
       count(*) AS n_docs,
       CAST(sum(b.n_tokens) AS BIGINT) AS sampled_tokens,
       min(r.rate_scaled) AS rate_scaled
FROM base b JOIN rated r ON b.stratum = r.stratum
WHERE ({h16}) < r.rate_scaled
GROUP BY b.stratum
"""


def q_corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing within hash buckets (seq_len
    512, 8 buckets) — per-doc (bucket, offset, seq_id) layout."""
    from sequin_spark.datapipe.curation import pack_sequences

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, seq_len=512, n_buckets=8)


SQL_CORPUS_PACK_SEQUENCES = f"""
WITH base AS (
  SELECT doc_id, doc_id % 8 AS bucket,
         len(string_split({D_NORM}, ' ')) AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, bucket, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT)
           AS "offset"
  FROM base
)
SELECT doc_id, bucket, n_tokens, "offset",
       CAST(floor("offset" / 512.0) AS BIGINT) AS seq_id
FROM packed
"""


# ---------------------------------------------------------------------------
# corpus filtering: decontamination / PII scrubbing / repetition gating


def q_corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: a deterministic eval holdout
    (doc_id % 97 == 3) is checked against the training corpus — the rest
    of `documents` plus the→thy mutated copies of the eval docs (the
    classic leak shape: near-verbatim benchmark text inside a training
    page). 8-gram collisions, eval side broadcast."""
    from sequin_spark.datapipe.filtering import decontaminate

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    eval_set = docs.filter(F.col("doc_id") % 97 == 3)
    corpus = docs.filter(F.col("doc_id") % 97 != 3).unionByName(
        eval_set.select(
            (F.col("doc_id") + 20000).alias("doc_id"),
            F.expr("replace(text, ' the ', ' thy ')").alias("text"),
        )
    )
    # round-robin the (narrow) corpus projection before the 8-gram
    # kernel: the two-split union otherwise runs the whole shingle +
    # array_distinct pass on ≤2 tasks (r14 A/B on an idle host: spread
    # won every paired rep, ~1.8 → ~1.5 s; the r13 sweep's tie was
    # measured under suite contention).  No-op when the scan is already
    # cluster-wide.
    return decontaminate(spread_for_compute(corpus), eval_set,
                         gram=8, threshold=0.01)


def _sql_corpus_decontaminate() -> str:
    g8 = " || ' ' || ".join(f"w[i+{k}]" for k in range(8))
    return f"""
WITH eval_docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 3),
corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 3
  UNION ALL
  SELECT doc_id + 20000, replace(text, ' the ', ' thy ') FROM eval_docs
),
cw AS (SELECT doc_id, list_filter(string_split({D_NORM}, ' '), x -> x <> '') AS w
       FROM corpus),
cg AS (
  SELECT DISTINCT doc_id, {g8} AS gram
  FROM cw, unnest(generate_series(1, len(w) - 7)) AS t(i)
),
ew AS (SELECT list_filter(string_split({D_NORM}, ' '), x -> x <> '') AS w
       FROM eval_docs),
eg AS (
  SELECT DISTINCT {g8} AS gram
  FROM ew, unnest(generate_series(1, len(w) - 7)) AS t(i)
),
hits AS (
  SELECT cg.doc_id,
         count(*) AS n_grams,
         count(eg.gram) AS n_contaminated
  FROM cg LEFT JOIN eg ON cg.gram = eg.gram
  GROUP BY cg.doc_id
)
SELECT c.doc_id,
       COALESCE(h.n_grams, 0) AS n_grams,
       COALESCE(h.n_contaminated, 0) AS n_contaminated,
       round(COALESCE(h.n_contaminated / h.n_grams, 0), 6) AS contamination_rate,
       COALESCE(h.n_contaminated, 0) > 0
         AND COALESCE(h.n_contaminated / h.n_grams, 0) >= 0.01 AS contaminated
FROM corpus c LEFT JOIN hits h ON c.doc_id = h.doc_id
"""


def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over documents with deterministically planted PII
    (emails/SSNs/IPs/phones appended by doc_id residue — the corpus
    itself is synthetic and clean, so the queries plant what they
    scrub). Counts per kind + md5 of the scrubbed text."""
    from sequin_spark.datapipe.filtering import pii_scrub

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.select(
        "doc_id",
        F.expr(
            "concat(text,"
            " CASE WHEN doc_id % 7 = 0 THEN concat(' contact user', doc_id,"
            "   '@mail.example.com') ELSE '' END,"
            " CASE WHEN doc_id % 11 = 0 THEN ' call 555-867-5309' ELSE '' END,"
            " CASE WHEN doc_id % 13 = 0 THEN ' ssn 123-45-6789' ELSE '' END,"
            " CASE WHEN doc_id % 17 = 0 THEN concat(' from 10.0.',"
            "   doc_id % 200, '.25') ELSE '' END)"
        ).alias("text"),
    )
    out = pii_scrub(planted)
    return out.select(
        "doc_id", "n_email", "n_ssn", "n_ip", "n_phone",
        F.md5("scrubbed").alias("scrub_hash"),
    )


def _sql_text_pii_scrub() -> str:
    from sequin_spark.datapipe.filtering import PII_PATTERNS

    pats = {kind: pat for kind, pat, _ in PII_PATTERNS}
    # chained global replaces in the module's declared order
    scrub = "text"
    for kind, pat, repl in PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '{repl}', 'g')"
    counts = ", ".join(
        f"len(regexp_extract_all(text, '{pats[k]}')) AS n_{k}"
        for k in ("email", "ssn", "ip", "phone")
    )
    return f"""
WITH planted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || doc_id || '@mail.example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' call 555-867-5309' ELSE '' END
         || CASE WHEN doc_id % 13 = 0 THEN ' ssn 123-45-6789' ELSE '' END
         || CASE WHEN doc_id % 17 = 0
                 THEN ' from 10.0.' || (doc_id % 200) || '.25' ELSE '' END
           AS text
  FROM documents
)
SELECT doc_id, {counts}, md5({scrub}) AS scrub_hash
FROM planted
"""


def q_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gating over documents plus planted
    degenerate docs (a 50× repeated phrase — the pathological page the
    thresholds exist to reject)."""
    from sequin_spark.datapipe.filtering import repetition_metrics

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    spam = docs.filter(F.col("doc_id") % 41 == 0).select(
        (F.col("doc_id") + 30000).alias("doc_id"),
        F.expr("concat(repeat('spam ham eggs ', 50), text)").alias("text"),
    )
    return repetition_metrics(docs.unionByName(spam))


def _sql_quality_repetition() -> str:
    def grams(k: int) -> str:
        parts = " || ' ' || ".join(f"w[i+{j}]" for j in range(k))
        return (
            f"list_transform(generate_series(1, greatest(len(w) - {k - 1}, 0)),"
            f" i -> {parts})"
        )

    thr = "dup_word_frac <= 0.60 AND dup_2gram_frac <= 0.40 " \
          "AND dup_3gram_frac <= 0.30 AND top_word_char_frac <= 0.20"
    return f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 30000, repeat('spam ham eggs ', 50) || text
  FROM documents WHERE doc_id % 41 = 0
),
words AS (
  SELECT doc_id, list_filter(string_split({D_NORM}, ' '), x -> x <> '') AS w
  FROM all_docs
),
narrow AS (
  SELECT doc_id,
         len(w) AS n_words,
         CASE WHEN len(w) > 0
              THEN round(1.0 - len(list_distinct(w)) / len(w), 6)
              ELSE 0.0 END AS dup_word_frac,
         CASE WHEN len({grams(2)}) > 0
              THEN round(1.0 - len(list_distinct({grams(2)})) / len({grams(2)}), 6)
              ELSE 0.0 END AS dup_2gram_frac,
         CASE WHEN len({grams(3)}) > 0
              THEN round(1.0 - len(list_distinct({grams(3)})) / len({grams(3)}), 6)
              ELSE 0.0 END AS dup_3gram_frac,
         len(replace(array_to_string(w, ''), ' ', '')) AS n_word_chars
  FROM words
),
wc AS (
  SELECT doc_id, w_i AS word, count(*) AS n
  FROM words, unnest(w) AS t(w_i)
  GROUP BY doc_id, w_i
),
top AS (
  SELECT doc_id, word AS top_word, n AS top_n
  FROM wc
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, word) = 1
)
SELECT narrow.doc_id, n_words, dup_word_frac, dup_2gram_frac, dup_3gram_frac,
       top_word,
       CASE WHEN n_word_chars > 0
            THEN round(COALESCE(top_n, 0) * len(COALESCE(top_word, ''))
                       / n_word_chars, 6)
            ELSE 0.0 END AS top_word_char_frac,
       CASE WHEN n_word_chars > 0
            THEN round(COALESCE(top_n, 0) * len(COALESCE(top_word, ''))
                       / n_word_chars, 6)
            ELSE 0.0 END <= 0.20
         AND {thr.replace('AND top_word_char_frac <= 0.20', '')} AS keep
FROM narrow LEFT JOIN top ON narrow.doc_id = top.doc_id
"""




# ---------------------------------------------------------------------------
# web-corpus URL dedup / line-level dedup / bigram-LM quality


def _url_expr_spark():
    """Deterministic synthetic URL per document — scheme / www / trailing
    slash / tracking-param / param-order / fragment noise planted by
    doc_id residues so canonicalization has real work to do."""
    page = (F.col("doc_id") % 200).cast("string")
    qid = (F.col("doc_id") % 7).cast("string")
    m4 = F.col("doc_id") % 4
    return F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("https://")).otherwise(F.lit("http://")),
        F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"), F.lit(".example.com/"),
        F.col("lang"), F.lit("/page-"), page,
        F.when(F.col("doc_id") % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(m4 == 0, F.concat(F.lit("?utm_source=feed&id="), qid))
        .when(m4 == 1, F.concat(F.lit("?id="), qid, F.lit("&utm_campaign=x")))
        .when(m4 == 2, F.lit("?b=2&a=1"))
        .otherwise(F.lit("?a=1&b=2")),
        F.when(F.col("doc_id") % 6 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup (datapipe/web.py): general Catalyst
    canonicalization vs an oracle that derives the canonical form
    independently from the synthesis residues — the two agree only if
    scheme/www/fragment/tracking/param-order/trailing-slash handling is
    exactly right."""
    from sequin_spark.datapipe.web import url_dedup

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return url_dedup(docs.withColumn("url", _url_expr_spark()))


def _sql_url_dedup() -> str:
    url = """
      (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END)
      || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
      || source || '.example.com/' || lang || '/page-' || (doc_id % 200)
      || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
      || (CASE doc_id % 4
            WHEN 0 THEN '?utm_source=feed&id=' || (doc_id % 7)
            WHEN 1 THEN '?id=' || (doc_id % 7) || '&utm_campaign=x'
            WHEN 2 THEN '?b=2&a=1'
            ELSE '?a=1&b=2' END)
      || (CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END)
    """
    canon = """
      source || '.example.com/' || lang || '/page-' || (doc_id % 200)
      || (CASE WHEN doc_id % 4 IN (0, 1) THEN '?id=' || (doc_id % 7)
               ELSE '?a=1&b=2' END)
    """
    return f"""
WITH u AS (
  SELECT doc_id, {url} AS url, {canon} AS canonical_url FROM documents
)
SELECT doc_id, url, canonical_url,
       min(doc_id) OVER (PARTITION BY canonical_url) AS keep_id,
       doc_id <> min(doc_id) OVER (PARTITION BY canonical_url) AS is_dup
FROM u
"""


def q_corpus_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-passage removal (datapipe/dedup.py:line_dedup): chunks
    appearing in >1 distinct doc are dropped from all docs. Positives
    planted as exact copies of every 25th doc (copy alignment preserves
    chunk identity)."""
    from sequin_spark.datapipe.dedup import line_dedup

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 20000).alias("doc_id"), "text"
    )
    return line_dedup(docs.unionByName(copies), chunk_words=8, max_docs=1)


def _sql_corpus_line_dedup() -> str:
    return f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 20000, text FROM documents WHERE doc_id % 25 = 0
),
w AS (SELECT doc_id, string_split({D_NORM}, ' ') AS words FROM all_docs),
chunks AS (
  SELECT doc_id, i AS pos,
         array_to_string(words[(i*8+1):(i*8+8)], ' ') AS chunk
  FROM w, LATERAL (SELECT unnest(range(0,
       CAST(ceil(len(words) / 8.0) AS BIGINT)))) AS t(i)
  WHERE len(words) > 0
),
dup AS (
  SELECT chunk FROM chunks GROUP BY chunk HAVING count(DISTINCT doc_id) > 1
),
kept AS (SELECT * FROM chunks WHERE chunk NOT IN (SELECT chunk FROM dup)),
rebuilt AS (
  SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
),
totals AS (SELECT doc_id, count(*) AS n_chunks FROM chunks GROUP BY doc_id)
SELECT t.doc_id, coalesce(r.clean_text, '') AS clean_text, t.n_chunks,
       t.n_chunks - coalesce(r.n_kept, 0) AS n_removed
FROM totals t LEFT JOIN rebuilt r USING (doc_id)
"""


def q_quality_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative bigram-LM scoring (datapipe/text.py:
    bigram_lm_scores) — the CCNet/RedPajama perplexity gate without an
    external model file."""
    from sequin_spark.datapipe.text import bigram_lm_scores

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return bigram_lm_scores(docs)


def _sql_quality_ngram_lm() -> str:
    return f"""
WITH w AS (SELECT doc_id, string_split({D_NORM}, ' ') AS words FROM documents),
bg AS (
  SELECT doc_id, words[i] AS w1, words[i + 1] AS w2
  FROM w, LATERAL (SELECT unnest(range(1, len(words)))) AS t(i)
  WHERE len(words) >= 2
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1)
SELECT bg.doc_id, count(*) AS n_bigrams,
       round(avg(-ln(c2.c2 / c1.c1)), 4) AS nll
FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
GROUP BY bg.doc_id
"""



def q_quality_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail bucketing by corpus-LM nll terciles
    (datapipe/text.py:perplexity_buckets)."""
    from sequin_spark.datapipe.text import perplexity_buckets

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return perplexity_buckets(docs)


def _sql_quality_perplexity_buckets() -> str:
    return f"""
WITH w AS (SELECT doc_id, string_split({D_NORM}, ' ') AS words FROM documents),
bg AS (
  SELECT doc_id, words[i] AS w1, words[i + 1] AS w2
  FROM w, LATERAL (SELECT unnest(range(1, len(words)))) AS t(i)
  WHERE len(words) >= 2
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
scores AS (
  SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         round(avg(-ln(c2.c2 / c1.c1)), 4) AS nll
  FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
  GROUP BY bg.doc_id
),
th AS (
  SELECT quantile_cont(nll, 1.0/3) AS t1, quantile_cont(nll, 2.0/3) AS t2
  FROM scores
)
SELECT s.doc_id, s.n_bigrams, s.nll,
       CASE WHEN s.nll <= th.t1 THEN 'head'
            WHEN s.nll <= th.t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scores s CROSS JOIN th
"""


def q_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (similarity.py:pq_adc_topk): per-subspace
    deterministic codebooks, corpus stored as m-code arrays, queries
    ranked by asymmetric-distance lookups. Fully deterministic →
    hash-checked against the per-subspace SQL replica."""
    from sequin_spark.datapipe.similarity import (
        PQIndex,
        build_pq_index,
        pq_adc_topk,
    )

    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    # codebooks + corpus codes are MAINTAINED per corpus (the DedupIndex
    # pattern): fitted and saved on first use, loaded afterwards — the
    # index lifecycle PQ exists for (codes ARE the stored corpus)
    idx = _maintained_index(
        spark, sf_dir, "pq_index", "m16k16i2-v1",
        lambda path: build_pq_index(emb, m=16, ksub=16, iters=2,
                                    dims=64).save(path),
        PQIndex.load,
    )
    queries = emb.filter(F.col("vec_id") < 10)
    return pq_adc_topk(emb, queries, idx.books, k=3, dims=64, codes=idx.codes)


def _sql_pq_chains(m: int = 16, ksub: int = 16, iters: int = 2,
                   dims: int = 64):
    """Per-subspace det-quantizer CTE chains (md5-seeded Lloyd's per
    subvector slice). Returns (chains_without_WITH, cb_select,
    asg_select, qd_select) for composition by the PQ and IVF-PQ
    oracles."""
    sub = dims // m
    parts = []
    for j in range(m):
        lo, hi = j * sub + 1, j * sub + sub
        parts.append(f"""
e{j} AS (
  SELECT vec_id,
         list_transform(embedding[{lo}:{hi}], x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
c0_{j} AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS c_id,
         v AS c
  FROM e{j}
  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) <= {ksub}
)""")
        prev = f"c0_{j}"
        for it in range(1, iters + 1):
            parts.append(f""",
a{it}_{j} AS (
  SELECT vec_id, v, c_id FROM (
    SELECT e{j}.vec_id, e{j}.v, {prev}.c_id,
           row_number() OVER (PARTITION BY e{j}.vec_id
                              ORDER BY {_sql_l2(f'e{j}.v', prev + '.c', sub)} ASC,
                                       {prev}.c_id ASC) AS rn
    FROM e{j} CROSS JOIN {prev}) t
  WHERE rn = 1
),
c{it}_{j} AS (
  SELECT c_id, list(m ORDER BY d) AS c FROM (
    SELECT c_id, d, avg(v[d]) AS m
    FROM a{it}_{j}, unnest(generate_series(1, {sub})) AS t(d)
    GROUP BY c_id, d) s
  GROUP BY c_id
)""")
            prev = f"c{it}_{j}"
        parts.append(f""",
af_{j} AS (
  SELECT vec_id, {j} AS j, c_id FROM (
    SELECT e{j}.vec_id, {prev}.c_id,
           row_number() OVER (PARTITION BY e{j}.vec_id
                              ORDER BY {_sql_l2(f'e{j}.v', prev + '.c', sub)} ASC,
                                       {prev}.c_id ASC) AS rn
    FROM e{j} CROSS JOIN {prev}) t
  WHERE rn = 1
)""")
        if j < m - 1:
            parts.append(",")
    finals = " UNION ALL ".join(
        f"SELECT c_id, {j} AS j, c FROM c{iters}_{j}" for j in range(m)
    )
    asgs = " UNION ALL ".join(f"SELECT * FROM af_{j}" for j in range(m))
    qds = " UNION ALL ".join(
        f"SELECT vec_id AS q_id, {j} AS j, v AS qv FROM e{j} WHERE vec_id < 10"
        for j in range(m)
    )
    return "".join(parts), finals, asgs, qds


def _sql_pq_adc(m: int = 16, ksub: int = 16, iters: int = 2,
                dims: int = 64, topk: int = 3) -> str:
    """Per-subspace replica of the det-quantizer chains, PQ encode,
    full-corpus ADC scan."""
    sub = dims // m
    chains, finals, asgs, qds = _sql_pq_chains(m, ksub, iters, dims)
    return "WITH " + chains + f""",
cb AS ({finals}),
asg AS ({asgs}),
qd AS ({qds}),
subdist AS (
  SELECT qd.q_id, asg.vec_id AS n_id,
         {_sql_l2('qd.qv', 'cb.c', sub)} AS d
  FROM qd
  JOIN asg ON qd.j = asg.j
  JOIN cb ON cb.j = asg.j AND cb.c_id = asg.c_id
  WHERE qd.q_id <> asg.vec_id
),
adc AS (
  SELECT q_id, n_id, round(sum(d), 3) AS adc
  FROM subdist GROUP BY q_id, n_id
),
r AS (
  SELECT q_id, n_id, adc,
         row_number() OVER (PARTITION BY q_id ORDER BY adc ASC, n_id ASC) AS rnk
  FROM adc
)
SELECT q_id, n_id, rnk, adc FROM r WHERE rnk <= {topk}
"""



def q_url_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style per-domain document cap (datapipe/web.py:domain_caps):
    host extracted by string ops from the noisy synthetic URL; oracle
    derives the domain independently from the synthesis residues."""
    from sequin_spark.datapipe.web import domain_caps

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return domain_caps(docs.withColumn("url", _url_expr_spark()),
                       max_per_domain=15)


def _sql_url_domain_caps(cap: int = 15) -> str:
    return f"""
WITH d AS (
  SELECT doc_id, source || '.example.com' AS domain,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS domain_rank
  FROM documents
)
SELECT doc_id, domain, CAST(domain_rank AS BIGINT) AS domain_rank,
       domain_rank <= {cap} AS keep
FROM d
"""


def q_corpus_shard_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-shard contamination matrix: content fingerprints appearing
    in more than one shard of the deterministic Knuth-hash sharding —
    per shard pair, the count of shared fingerprints. The audit a
    pipeline runs after sharding to prove shard-level independence
    (train/eval shard contamination).

    Scale shape: distinct (fp, shard) pairs, then an fp-keyed self-join
    that only fans out on actually-duplicated fingerprints — never an
    all-pairs of shards × docs. The synthetic corpus has no exact
    duplicates, so every 25th doc is unioned back under a shifted id
    (same text, different shard; the shift is ≢ 0 mod n_shards — an
    offset divisible by 8 would hash every copy back into its original
    shard under the multiplicative-mod-2^32 scheme) — deterministic
    planted contamination the audit must find."""
    _prep(spark)
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = base.unionByName(
        base.filter(F.col("doc_id") % 25 == 0)
        .select((F.col("doc_id") + 1_000_003).alias("doc_id"), "text")
    )
    h = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296)).cast("long")
    # (fp, shard) rows only — checkpointed so the fp self-join below
    # doesn't re-run the scan + md5 + distinct on both sides (the
    # decide-on-fingerprints table of guide §8; 36 bytes/row)
    fps = docs.select(
        F.pmod(h, F.lit(8)).cast("int").alias("shard"),
        F.md5(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("fp"),
    ).distinct().localCheckpoint(eager=False)
    a = fps.select(F.col("fp"), F.col("shard").alias("shard_a"))
    b = fps.select(F.col("fp"), F.col("shard").alias("shard_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("shard_a") < F.col("shard_b"))
        .groupBy("shard_a", "shard_b")
        .agg(F.count("*").cast("long").alias("n_shared_fps"))
    )


def _sql_corpus_shard_overlap() -> str:
    return f"""
WITH docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000003 AS doc_id, text FROM documents WHERE doc_id % 25 = 0
),
fps AS (
  SELECT DISTINCT
         CAST((doc_id * 2654435761) % 4294967296 % 8 AS INTEGER) AS shard,
         md5({D_NORM}) AS fp
  FROM docs
)
SELECT a.shard AS shard_a, b.shard AS shard_b,
       CAST(count(*) AS BIGINT) AS n_shared_fps
FROM fps a JOIN fps b ON a.fp = b.fp AND a.shard < b.shard
GROUP BY 1, 2
"""


def q_corpus_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the last step
    of a training-data pipeline (write N balanced shards in a
    reproducible pseudo-random order). Knuth multiplicative hash over
    the doc id (portable integer arithmetic, no engine-specific hash):
    shard = h mod N, within-shard order = (h, doc_id). One shuffle on
    shard for the offset window; shard keys are uniform by
    construction, so the write fan-out is balanced at any scale."""
    _prep(spark)
    n_shards = 8
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    h = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296)).cast("long")
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        docs.withColumn("h", h)
        .withColumn("shard", F.pmod(F.col("h"), F.lit(n_shards)).cast("int"))
        .withColumn("shard_offset", F.row_number().over(w))
        .select("doc_id", "shard", "shard_offset", "n_chars")
    )


def q_corpus_diff_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-over-crawl corpus diff — the incremental-ingest primitive:
    version 2 is the corpus with every 25th doc re-crawled with changed
    text (the dupes fixture's edit), every 41st doc dropped, and the
    +10000 near-copies newly added; the diff classifies every doc_id
    as added / removed / modified / unchanged by content-hash compare
    on a full outer join, then rolls up per source.  At 100 TB this is
    THE cheap path to incremental processing: only added+modified flow
    into the (expensive) dedup/quality stages downstream, and the
    content hash — not mtime — is the change signal.  One join keyed
    on doc_id (both sides pre-hashed, narrow)."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source")
    v1 = docs.filter(F.col("doc_id") % 41 != 0).select(
        "doc_id", F.md5(F.col("text")).alias("h1"),
        F.col("source").alias("src1"))
    v2_changed = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 25 == 0,
               F.expr("replace(text, ' the ', ' thy ')"))
        .otherwise(F.col("text")))
    v2 = v2_changed.select(
        "doc_id", F.md5(F.col("text")).alias("h2"),
        F.col("source").alias("src2"),
    ).unionByName(v2_changed.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.md5(F.col("text")).alias("h2"),
        F.col("source").alias("src2")))
    joined = v1.join(v2, "doc_id", "full_outer")
    status = (
        F.when(F.col("h1").isNull(), F.lit("added"))
        .when(F.col("h2").isNull(), F.lit("removed"))
        .when(F.col("h1") != F.col("h2"), F.lit("modified"))
        .otherwise(F.lit("unchanged")))
    return (joined
            .withColumn("status", status)
            .withColumn("source", F.coalesce("src2", "src1"))
            .groupBy("source").agg(
                F.count("*").alias("n_docs"),
                F.sum(F.when(F.col("status") == "added", 1).otherwise(0))
                .cast("long").alias("n_added"),
                F.sum(F.when(F.col("status") == "removed", 1)
                      .otherwise(0)).cast("long").alias("n_removed"),
                F.sum(F.when(F.col("status") == "modified", 1)
                      .otherwise(0)).cast("long").alias("n_modified"),
                F.sum(F.when(F.col("status") == "unchanged", 1)
                      .otherwise(0)).cast("long").alias("n_unchanged")))


SQL_CORPUS_DIFF_VERSIONS = """
WITH v1 AS (
  SELECT doc_id, md5(text) AS h1, source AS src1 FROM documents
  WHERE doc_id % 41 <> 0
),
v2base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 25 = 0
              THEN replace(text, ' the ', ' thy ') ELSE text END AS text,
         source
  FROM documents
),
v2 AS (
  SELECT doc_id, md5(text) AS h2, source AS src2 FROM v2base
  UNION ALL
  SELECT doc_id + 10000, md5(text), source FROM v2base
  WHERE doc_id % 25 = 0
),
j AS (
  SELECT coalesce(v2.src2, v1.src1) AS source,
         CASE WHEN v1.h1 IS NULL THEN 'added'
              WHEN v2.h2 IS NULL THEN 'removed'
              WHEN v1.h1 <> v2.h2 THEN 'modified'
              ELSE 'unchanged' END AS status
  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_added,
       CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_removed,
       CAST(sum(CASE WHEN status = 'modified' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_modified,
       CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_unchanged
FROM j GROUP BY source
"""


def q_corpus_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EPOCH deterministic reshuffle — reproducible dataloader
    order across training epochs: shard placement is fixed (same Knuth
    hash as corpus_shard_assign, so files never move between epochs)
    but the WITHIN-shard read order re-permutes per epoch via an
    epoch-salted hash.  Rerunning epoch e reproduces its exact order
    (no RNG state, the reservoir-sampling property applied to
    ordering); different epochs are distinct permutations.  Plan: the
    ×E epoch explode is a narrow map; one shuffle on (epoch, shard)
    for the position window — bounded by shard size, balanced by
    construction."""
    _prep(spark)
    n_shards, n_epochs = 8, 3
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    h_place = F.pmod(F.col("doc_id") * F.lit(2654435761),
                     F.lit(4294967296)).cast("long")
    epoch = F.explode(F.array(*[F.lit(e) for e in range(n_epochs)]))
    h_order = F.pmod(
        (F.col("doc_id") + F.col("epoch") * F.lit(1_000_003))
        * F.lit(2654435761), F.lit(4294967296)).cast("long")
    w = Window.partitionBy("epoch", "shard").orderBy("h_order", "doc_id")
    return (
        docs.withColumn("shard",
                        F.pmod(h_place, F.lit(n_shards)).cast("int"))
        .withColumn("epoch", epoch)
        .withColumn("h_order", h_order)
        .withColumn("position", F.row_number().over(w))
        .select("epoch", "shard", "position", "doc_id")
    )


SQL_CORPUS_EPOCH_SHUFFLE = """
WITH e AS (
  SELECT doc_id, epoch,
         CAST((doc_id * 2654435761) % 4294967296 % 8 AS INTEGER) AS shard,
         ((doc_id + epoch * 1000003) * 2654435761) % 4294967296 AS h_order
  FROM documents CROSS JOIN (VALUES (0), (1), (2)) AS t(epoch)
)
SELECT CAST(epoch AS INTEGER) AS epoch, shard,
       CAST(row_number() OVER (PARTITION BY epoch, shard
                               ORDER BY h_order, doc_id) AS BIGINT)
         AS position,
       doc_id
FROM e
"""


def q_corpus_takedown_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Takedown/right-to-erasure propagation — the compliance sweep
    every long-lived corpus needs: a tombstone set (here every 97th
    doc) is removed from the corpus AND the removal is accounted
    per-shard so the re-write job knows exactly which shards to
    rebuild.  The tombstone set is small by nature → broadcast
    semi/anti-joins, the corpus side never shuffles for the removal
    itself; the per-shard accounting reuses the shard hash (no second
    scan)."""
    _prep(spark)
    n_shards = 8
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars")
    tomb = (docs.filter(F.col("doc_id") % 97 == 0)
            .select(F.col("doc_id").alias("_tomb_id")))
    shard = F.pmod(
        F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296)),
        F.lit(n_shards)).cast("int")
    # broadcast left join against the (small) tombstone set — the
    # corpus side never shuffles for the removal mark
    marked = (
        docs.withColumn("shard", shard)
        .join(F.broadcast(tomb),
              F.col("doc_id") == F.col("_tomb_id"), "left")
        .withColumn("tombstoned",
                    F.col("_tomb_id").isNotNull().cast("int"))
        .drop("_tomb_id"))
    # per-shard accounting: which shard files must be rewritten
    return (
        marked.groupBy("shard").agg(
            F.count("*").alias("n_docs"),
            F.sum("tombstoned").cast("long").alias("n_tombstoned"),
            (F.count("*") - F.sum("tombstoned")).cast("long")
            .alias("n_kept"),
            F.sum(F.when(F.col("tombstoned") == 1, F.col("n_chars"))
                  .otherwise(0)).cast("long").alias("chars_removed"),
            F.max("tombstoned").cast("int").alias("needs_rewrite"),
        )
    )


SQL_CORPUS_TAKEDOWN_SWEEP = """
WITH m AS (
  SELECT doc_id, n_chars,
         CAST((doc_id * 2654435761) % 4294967296 % 8 AS INTEGER) AS shard,
         CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END AS tombstoned
  FROM documents
)
SELECT shard, count(*) AS n_docs,
       CAST(sum(tombstoned) AS BIGINT) AS n_tombstoned,
       CAST(count(*) - sum(tombstoned) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN tombstoned = 1 THEN n_chars ELSE 0 END)
            AS BIGINT) AS chars_removed,
       CAST(max(tombstoned) AS INTEGER) AS needs_rewrite
FROM m GROUP BY shard
"""


SQL_CORPUS_SHARD_ASSIGN = """
WITH h AS (
  SELECT doc_id, n_chars,
         (doc_id * 2654435761) % 4294967296 AS h
  FROM documents
)
SELECT doc_id, CAST(h % 8 AS INTEGER) AS shard,
       CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id)
            AS BIGINT) AS shard_offset,
       n_chars
FROM h
"""


def q_embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier detection (the embedding-quality filter
    of a multimodal pipeline): per-label centroid, each vector's L2
    distance to its own centroid, flagged by z-score (dist > mean +
    2σ within the label — high-dim distances concentrate, so a fixed
    multiple of the mean never fires). Centroids are one 64-avg label
    agg (labels are few → the join back is a broadcast); everything
    else is a narrow zip_with scan."""
    from sequin_spark.datapipe.similarity import as_double

    _prep(spark)
    dims = 64
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("v")
    )
    # label-count rows; read by BOTH distance passes below (stats, then
    # flagging) — checkpointed so the centroid aggregation scan runs
    # once, not once per pass.  The two distance passes themselves are
    # the standard z-score shape (skew-safe: a label-partitioned window
    # would funnel whole labels through single tasks at scale).
    cent = emb.groupBy("label").agg(
        *[F.avg(F.col("v")[i]).alias(f"m{i}") for i in range(dims)]
    ).select("label", F.array(*[F.col(f"m{i}") for i in range(dims)]).alias("c")) \
        .localCheckpoint(eager=False)
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("v", "c", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    d = emb.join(F.broadcast(cent), "label").withColumn("dist", dist)
    stats = d.groupBy("label").agg(
        F.avg("dist").alias("mean_dist"),
        F.stddev_samp("dist").alias("sd_dist"),
    )
    return (
        d.join(F.broadcast(stats), "label")
        .select(
            "vec_id", "label",
            F.round("dist", 4).alias("dist"),
            (F.col("dist") > F.col("mean_dist") + 2 * F.col("sd_dist")).alias("is_outlier"),
        )
    )


def _sql_embed_outliers(dims: int = 64) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cent AS (
  SELECT label, list(m ORDER BY d) AS c FROM (
    SELECT label, d, avg(v[d]) AS m
    FROM e, unnest(generate_series(1, {dims})) AS t(d)
    GROUP BY label, d) s
  GROUP BY label
),
dd AS (
  SELECT e.vec_id, e.label,
         sqrt({_sql_l2('e.v', 'cent.c', dims)}) AS dist
  FROM e JOIN cent USING (label)
),
st AS (SELECT label, avg(dist) AS mean_dist,
              stddev_samp(dist) AS sd_dist
       FROM dd GROUP BY label)
SELECT dd.vec_id, dd.label, round(dd.dist, 4) AS dist,
       dd.dist > st.mean_dist + 2 * st.sd_dist AS is_outlier
FROM dd JOIN st USING (label)
"""



def q_corpus_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling — the monitoring query every ingestion pipeline
    runs per batch: per (source, lang) doc counts, char volume, mean and
    interpolated type-7 length percentiles (p50/p90/p99).

    Hash-determinism (r4 driver flake): `n_chars` is integral, and for
    p in {.50,.90,.99} the type-7 rank h=(n-1)*p has an EXACT
    hundredths part, so the interpolated percentile ×100 is the exact
    integer a*(100-f) + b*f with f = ((n-1)*P) mod 100.  We emit the
    ×100 longs (and half-up-rounded mean ×100 via pure integer
    arithmetic) — no float fold touches the output, so Spark and DuckDB
    agree bit-for-bit on every environment."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    agg = docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sort_array(F.collect_list("n_chars")).alias("_a"),
    )

    def pct_x100(p100: int) -> str:
        # all-long `div`/`%` arithmetic — no double ever enters
        h = f"((n_docs - 1L) * {p100}L)"
        lo, f = f"({h} div 100L)", f"({h} % 100L)"
        va = f"cast(element_at(_a, cast({lo} + 1 as int)) as long)"
        vb = (f"if({f} = 0L, {va}, "
              f"cast(element_at(_a, cast({lo} + 2 as int)) as long))")
        return f"{va} * (100L - {f}) + {vb} * {f}"

    return agg.select(
        "source", "lang", "n_docs", "total_chars",
        F.expr("(200L * total_chars + n_docs) div (2L * n_docs)")
        .alias("mean_chars_x100"),
        F.expr(pct_x100(50)).alias("p50_chars_x100"),
        F.expr(pct_x100(90)).alias("p90_chars_x100"),
        F.expr(pct_x100(99)).alias("p99_chars_x100"),
    )


SQL_CORPUS_STATS_PROFILE = """
WITH g AS (
  -- CAST: DuckDB types sum(INTEGER) as HUGEINT (int128); Spark emits
  -- BIGINT.  A typed value-hash differs on type alone (r4/r5 driver
  -- flake), so every integer sum/product chain is pinned to BIGINT.
  SELECT source, lang, count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         list(n_chars ORDER BY n_chars) AS a
  FROM documents GROUP BY source, lang
)
SELECT source, lang, n_docs, total_chars,
       CAST((200 * total_chars + n_docs) // (2 * n_docs) AS BIGINT)
         AS mean_chars_x100,
       CAST(a[((n_docs-1)*50)//100 + 1] * (100 - ((n_docs-1)*50)%100)
         + CASE WHEN ((n_docs-1)*50)%100 = 0 THEN 0
                ELSE a[((n_docs-1)*50)//100 + 2] * (((n_docs-1)*50)%100) END
         AS BIGINT) AS p50_chars_x100,
       CAST(a[((n_docs-1)*90)//100 + 1] * (100 - ((n_docs-1)*90)%100)
         + CASE WHEN ((n_docs-1)*90)%100 = 0 THEN 0
                ELSE a[((n_docs-1)*90)//100 + 2] * (((n_docs-1)*90)%100) END
         AS BIGINT) AS p90_chars_x100,
       CAST(a[((n_docs-1)*99)//100 + 1] * (100 - ((n_docs-1)*99)%100)
         + CASE WHEN ((n_docs-1)*99)%100 = 0 THEN 0
                ELSE a[((n_docs-1)*99)//100 + 2] * (((n_docs-1)*99)%100) END
         AS BIGINT) AS p99_chars_x100
FROM g
"""



def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite (similarity.py:ann_ivfpq_topk): coarse-quantizer
    probes restrict the candidate lists, PQ/ADC codes rank within them —
    the canonical sub-linear + bandwidth-reduced ANN layout, fully
    deterministic and hash-checked against the combined SQL replica."""
    from sequin_spark.datapipe.similarity import (
        IVFPQIndex,
        ann_ivfpq_topk,
        build_ivfpq_index,
    )

    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    # quantizers + encoded inverted lists persist per corpus; searches
    # load the index (corpus parquet is c_id-partitioned, so probing 4
    # of 8 lists prunes half the scan at the file layer)
    idx = _maintained_index(
        spark, sf_dir, "ivfpq_index", "c8m16k16-v1",
        lambda path: build_ivfpq_index(
            emb, n_centroids=8, m=16, ksub=16,
            iters_coarse=1, iters_pq=2, dims=64,
        ).save(path),
        IVFPQIndex.load,
    )
    return ann_ivfpq_topk(emb, queries, k=3, n_probe=4, index=idx)


def _sql_ivfpq(k_cent: int = 8, iters_coarse: int = 1, n_probe: int = 4,
               m: int = 16, ksub: int = 16, iters_pq: int = 2,
               dims: int = 64, topk: int = 3) -> str:
    """Coarse det-quantizer chain (shared with the IVF oracle) composed
    with the per-subspace PQ chains; ADC restricted to probed lists."""
    sub = dims // m
    coarse = _sql_det_assign(k_cent, iters_coarse, dims)
    assert coarse.startswith("\nWITH ")
    coarse_body = coarse[len("\nWITH "):]
    chains, finals, asgs, _qds = _sql_pq_chains(m, ksub, iters_pq, dims)
    prev = f"c{iters_coarse}" if iters_coarse else "c0"
    qd = " UNION ALL ".join(
        f"SELECT vec_id AS q_id, {j} AS j, v AS qv FROM e{j} WHERE vec_id < 10"
        for j in range(m)
    )
    return "WITH " + coarse_body + "," + chains + f""",
cb AS ({finals}),
asg AS ({asgs}),
q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < 10),
pr AS (
  SELECT q_id, c_id FROM (
    SELECT q.q_id, c.c_id,
           row_number() OVER (PARTITION BY q.q_id
                              ORDER BY {_sql_l2('q.q_vec', 'c.c', dims)} ASC,
                                       c.c_id ASC) AS rk
    FROM q CROSS JOIN {prev} c) t
  WHERE rk <= {n_probe}
),
probed AS (
  SELECT pr.q_id, af.vec_id AS n_id
  FROM pr JOIN af ON pr.c_id = af.c_id AND pr.q_id <> af.vec_id
),
qd AS ({qd}),
subdist AS (
  SELECT p.q_id, p.n_id, {_sql_l2('qd.qv', 'cb.c', sub)} AS d
  FROM probed p
  JOIN asg ON asg.vec_id = p.n_id
  JOIN cb ON cb.j = asg.j AND cb.c_id = asg.c_id
  JOIN qd ON qd.q_id = p.q_id AND qd.j = asg.j
),
adc AS (
  SELECT q_id, n_id, round(sum(d), 3) AS adc
  FROM subdist GROUP BY q_id, n_id
),
r AS (
  SELECT q_id, n_id, adc,
         row_number() OVER (PARTITION BY q_id ORDER BY adc ASC, n_id ASC) AS rnk
  FROM adc
)
SELECT q_id, n_id, rnk, adc FROM r WHERE rnk <= {topk}
"""


# ---------------------------------------------------------------------------
# Data selection: BM25 ranking, DSIR importance weights, cross-doc
# repeated spans (ExactSubstr analog), leakage-checked splits
# (datapipe/selection.py)


def _sql_h60_of(expr: str) -> str:
    """int(md5(expr)[0:15], 16) — the portable 60-bit sketch hash
    (datapipe/sketch.h60) as a DuckDB expression (per-hex-digit
    polynomial; engine parity pinned in tests/test_sketch.py)."""
    return "(" + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({expr}), {i}, 1)) - 1)"
        f" * {16 ** (15 - i)}"
        for i in range(1, 16)
    ) + ")"


def q_sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-cardinality sketch over the corpus vocabulary
    (datapipe/sketch.py, Bar-Yossef et al. 2002): the 256 smallest
    60-bit word hashes estimate |vocab| in one prunable pass — the
    bounded-memory alternative to a full countDistinct shuffle at
    100 TB.  Exact distinct included for the error to be visible."""
    from sequin_spark.datapipe.sketch import kmv_distinct

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.expr(
            "regexp_replace(lower(text), '\\\\s+', ' ')"), " ")).alias("w")
    ).filter(F.col("w") != "")
    est = kmv_distinct(words, "w", k=256)
    exact = words.agg(F.countDistinct("w").alias("exact_distinct"))
    # 1-row × 1-row combine of two global aggregates; Catalyst folds any
    # literal equi-key to `true`, so this is unavoidably a nested-loop
    # join — benign by construction and allow-listed in the plan gate.
    return est.crossJoin(exact)


def _sql_sketch_kmv() -> str:
    h = _sql_h60_of("w")
    return f"""
WITH words AS (
  SELECT unnest(string_split({D_NORM}, ' ')) AS w FROM documents
), wnz AS (SELECT w FROM words WHERE w <> ''),
h AS (SELECT DISTINCT {h} AS h FROM wnz),
kk AS (SELECT max(h) AS hk, count(*) AS n
       FROM (SELECT h FROM h ORDER BY h LIMIT 256))
SELECT 256 AS k, hk AS kth_min_hash,
       CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
            ELSE round(255.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE), 2)
       END AS est_distinct,
       (SELECT CAST(count(DISTINCT w) AS BIGINT) FROM wnz) AS exact_distinct
FROM kk
"""


def q_sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog cardinality sketch (Flajolet et al. 2007) over the
    corpus vocabulary: 256 integer registers folded in one pass
    (map-side partial max), estimate from the EXACT integer
    S = Σ 2^(53−ρ) — no float fold, so the DuckDB oracle matches
    bit-for-bit (sketch.py docstring documents the omitted ln
    small-range correction)."""
    from sequin_spark.datapipe.sketch import hll_distinct

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.expr(
            "regexp_replace(lower(text), '\\\\s+', ' ')"), " ")).alias("w")
    ).filter(F.col("w") != "")
    est = hll_distinct(words, "w")
    exact = words.agg(F.countDistinct("w").alias("exact_distinct"))
    # 1-row × 1-row combine of two global aggregates; Catalyst folds any
    # literal equi-key to `true`, so this is unavoidably a nested-loop
    # join — benign by construction and allow-listed in the plan gate.
    return est.crossJoin(exact)


def _sql_sketch_hll() -> str:
    h = _sql_h60_of("w")
    return f"""
WITH words AS (
  SELECT unnest(string_split({D_NORM}, ' ')) AS w FROM documents
), wnz AS (SELECT w FROM words WHERE w <> ''),
h AS (SELECT {h} AS h FROM wnz),
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
SELECT 256 AS m,
       CAST(s_p + (256 - n_present) * 9007199254740992 AS BIGINT) AS s_int,
       CAST(256 - n_present + z_p AS BIGINT) AS n_zero_registers,
       round((CAST(0.7182725932495458 AS DOUBLE) * CAST(65536 AS DOUBLE))
             * CAST(9007199254740992 AS DOUBLE)
             / CAST(s_p + (256 - n_present) * 9007199254740992 AS DOUBLE), 1)
         AS est_distinct,
       (SELECT CAST(count(DISTINCT w) AS BIGINT) FROM wnz) AS exact_distinct
FROM s
"""


def q_sketch_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile estimation (datapipe/sketch.
    sample_quantile_sketch): empirical quantiles of a hash-order-
    statistic uniform 256-sample vs the exact order statistics —
    the quantile member of the sketch family (KMV=distinct, HLL=
    cardinality, CM=frequency, this=distribution).  The estimate
    plan is a TakeOrdered + ≤k-row rank, no global sort of the
    value column at any scale; the EXACT baseline's global order
    statistic goes through curation.global_row_number (range
    partition + bounded count collect + within-partition rank), so
    even the baseline never funnels the corpus through one task."""
    from sequin_spark.datapipe.curation import global_row_number
    from sequin_spark.datapipe.sketch import sample_quantile_sketch

    _prep(spark)
    qs = (0.5, 0.9, 0.99)
    docs = load_table(spark, sf_dir, "documents")
    est = sample_quantile_sketch(docs, "doc_id", "n_chars", k=256,
                                 quantiles=qs)
    # exact rank-⌈q·n⌉ order statistic, two-pass: tie-break by doc_id
    # is rank-order-only — the VALUE at a given rank is identical
    # under any tie order, so the oracle is unchanged
    ranked = global_row_number(
        docs.select("n_chars", "doc_id"), ["n_chars", "doc_id"], "_rn")
    n = docs.count()
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    exact = (
        ranked.withColumn("q", F.explode(qarr))
        .filter(F.col("_rn") == F.ceil(F.col("q") * F.lit(n)))
        .select("q", F.col("n_chars").alias("exact_value")))
    return (est.join(exact, "q")
            .select("q", "k_sample", "est_value", "exact_value",
                    (F.col("est_value") - F.col("exact_value"))
                    .cast("long").alias("err")))


def _sql_sample_quantiles() -> str:
    h = "('0x' || substr(md5(cast(doc_id AS varchar)), 1, 15))::BIGINT"
    return f"""
WITH s AS (
  SELECT n_chars AS v FROM documents ORDER BY {h} LIMIT 256
),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn,
             count(*) OVER () AS n FROM s),
qs(q) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
                 (CAST(0.99 AS DOUBLE))),
est AS (
  SELECT q, CAST(n AS BIGINT) AS k_sample, v AS est_value
  FROM r CROSS JOIN qs WHERE rn = ceil(q * n)
),
x AS (SELECT n_chars AS v, row_number() OVER (ORDER BY n_chars) AS rn,
             count(*) OVER () AS n FROM documents),
ex AS (SELECT q, v AS exact_value FROM x CROSS JOIN qs
       WHERE rn = ceil(q * n))
SELECT est.q, k_sample, est_value, exact_value,
       CAST(est_value - exact_value AS BIGINT) AS err
FROM est JOIN ex ON est.q = ex.q
"""


def q_sketch_quantiles_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantile sketch (datapipe/sketch.
    sample_quantile_sketch_per_key): p50/p90/p99 of the event value per
    event_type from a deterministic 128-sample per group — the
    group-wise member of the sketch family, one group-keyed shuffle
    with partial top-k, never a per-group sort of the full value
    column.  Paired with the exact per-group order statistics and the
    signed error."""
    from sequin_spark.datapipe.sampling import exact_quantiles
    from sequin_spark.datapipe.sketch import sample_quantile_sketch_per_key

    _prep(spark)
    qs = (0.5, 0.9, 0.99)
    ev = load_table(spark, sf_dir, "events")
    est = sample_quantile_sketch_per_key(
        ev, "event_type", "event_id", "value", k=128, quantiles=qs)
    exact = exact_quantiles(ev, "event_type", "value", list(qs)).select(
        F.col("event_type"), "q", F.col("value").alias("exact_value"))
    return (est.join(exact, ["event_type", "q"])
            .select("event_type", "q", "k_sample",
                    F.round("est_value", 4).alias("est_value"),
                    F.round("exact_value", 4).alias("exact_value"),
                    F.round(F.col("est_value") - F.col("exact_value"), 4)
                    .alias("err")))


def _sql_quantiles_per_key(k: int = 128) -> str:
    h = "('0x' || substr(md5(cast(event_id AS varchar)), 1, 15))::BIGINT"
    return f"""
WITH s AS (
  SELECT event_type AS g, value AS v,
         row_number() OVER (PARTITION BY event_type ORDER BY {h}) AS sn
  FROM events
),
samp AS (SELECT g, v FROM s WHERE sn <= {k}),
r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY g) AS n FROM samp),
qs(q) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
                 (CAST(0.99 AS DOUBLE))),
est AS (
  SELECT g, q, CAST(n AS BIGINT) AS k_sample, v AS est_value
  FROM r CROSS JOIN qs WHERE rn = ceil(q * n)
),
x AS (SELECT event_type AS g, value AS v,
             row_number() OVER (PARTITION BY event_type ORDER BY value)
               AS rn,
             count(*) OVER (PARTITION BY event_type) AS n FROM events),
ex AS (SELECT g, q, v AS exact_value FROM x CROSS JOIN qs
       WHERE rn = ceil(q * n))
SELECT est.g AS event_type, est.q, k_sample,
       round(est_value, 4) AS est_value,
       round(exact_value, 4) AS exact_value,
       round(est_value - exact_value, 4) AS err
FROM est JOIN ex ON est.g = ex.g AND est.q = ex.q
"""


def q_sketch_hll_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key cardinality sketch (datapipe/sketch.hll_per_key): one
    m=256 HLL per event_type estimating distinct users — GROUP-wise
    distinct counting with |groups|×256 ints of mergeable state
    instead of a full per-group distinct shuffle.  Paired with the
    exact per-group countDistinct baseline."""
    from sequin_spark.datapipe.sketch import hll_per_key

    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    est = hll_per_key(ev, "event_type", "user_id")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct"))
    return (est.join(exact, "event_type")
            .select("event_type", "s_int", "est_distinct",
                    "exact_distinct",
                    F.round(F.col("est_distinct")
                            - F.col("exact_distinct"), 1).alias("err")))


def _sql_hll_per_key() -> str:
    h = "('0x' || substr(md5(cast(user_id AS varchar)), 1, 15))::BIGINT"
    return f"""
WITH h AS (SELECT event_type AS g, {h} AS h FROM events),
reg AS (SELECT g, h % 256 AS register, h // 256 AS w FROM h),
rho AS (SELECT g, register,
               CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END AS rho
        FROM reg),
r AS (SELECT g, register, max(rho) AS max_rho FROM rho
      GROUP BY g, register),
s AS (SELECT g,
             CAST(sum(CAST(1 AS BIGINT) << (53 - max_rho)) AS BIGINT)
               AS s_p,
             count(*) AS n_present
      FROM r GROUP BY g),
raw AS (
  SELECT g AS event_type,
         CAST(s_p + (256 - n_present) * 9007199254740992 AS BIGINT)
           AS s_int,
         CAST(256 - n_present AS BIGINT) AS v,
         (CAST(0.7182725932495458 AS DOUBLE)
          * CAST(65536 AS DOUBLE)) * CAST(9007199254740992 AS DOUBLE)
           / CAST(s_p + (256 - n_present) * 9007199254740992
                  AS DOUBLE) AS raw_est
  FROM s
),
est AS (
  -- Flajolet small-range correction: linear counting m*ln(m/V)
  -- when raw <= 2.5m and zero registers remain
  SELECT event_type, s_int,
         round(CASE WHEN raw_est <= 640.0 AND v > 0
                    THEN CAST(256 AS DOUBLE)
                         * ln(CAST(256 AS DOUBLE) / v)
                    ELSE raw_est END, 1) AS est_distinct
  FROM raw
),
ex AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)
              AS exact_distinct
       FROM events GROUP BY event_type)
SELECT est.event_type, s_int, est_distinct, exact_distinct,
       round(est_distinct - exact_distinct, 1) AS err
FROM est JOIN ex ON est.event_type = ex.event_type
"""


def q_sketch_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership (datapipe/sketch.bloom_build/probe):
    set-bit table over the corpus doc-id set (d=4 disjoint md5 slices
    mod 2^16 — the count-min hash-derivation device), probed with an
    equal mix of present and absent ids.  One summary row pins the
    contract: zero false negatives ALWAYS; false positives only, at
    the fill-rate-determined rate.  The bit table broadcasts, so
    membership probes never re-shuffle the corpus."""
    from sequin_spark.datapipe.sketch import (
        BLOOM_BITS,
        BLOOM_DEPTH,
        bloom_build,
        bloom_probe,
    )

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("member"))
    # bits is read twice (probe join + the n_set_bits rollup) and the
    # probe stream pairs each member with its shifted absent twin —
    # materialize the ≤m-row bit table once and derive both probe
    # values from ONE scan via an explode instead of a two-scan union
    # (identical value multiset; r13 optimization round)
    bits = bloom_build(docs, "member").localCheckpoint(eager=False)
    probes = docs.select(F.explode(F.array(
        F.col("member"),
        (F.col("member").cast("long") + 1000000).cast("string"),
    )).alias("v"))
    verdicts = bloom_probe(bits, probes, "v")
    truth = verdicts.withColumn(
        "present", (F.col("v").cast("long") < 1000000).cast("int"))
    return truth.agg(
        F.lit(BLOOM_BITS).alias("m_bits"),
        F.lit(BLOOM_DEPTH).alias("d"),
        F.count("*").alias("n_probes"),
        F.sum("present").cast("long").alias("n_present_exact"),
        F.sum(F.col("maybe_present").cast("int")).cast("long")
        .alias("n_maybe"),
        F.sum(F.when(F.col("maybe_present") & (F.col("present") == 0), 1)
              .otherwise(0)).cast("long").alias("n_false_positive"),
        F.sum(F.when(~F.col("maybe_present") & (F.col("present") == 1), 1)
              .otherwise(0)).cast("long").alias("n_false_negative"),
    ).crossJoin(
        bits.agg(F.count("*").cast("long").alias("n_set_bits")))


def _sql_bloom_probe() -> str:
    def pos(r, v="v"):
        return (f"('0x' || substr(md5({v}), {1 + 5 * r}, 5))::BIGINT "
                f"% 65536")
    member_pos = ",\n    ".join(pos(r, "cast(doc_id AS varchar)")
                                for r in range(4))
    probe_pos = " AND ".join(
        f"{pos(r)} IN (SELECT bit_pos FROM bits)" for r in range(4))
    return f"""
WITH bits AS (
  SELECT DISTINCT unnest([{member_pos}]) AS bit_pos FROM documents
),
probes AS (
  SELECT cast(doc_id AS varchar) AS v, 1 AS present FROM documents
  UNION ALL
  SELECT cast(doc_id + 1000000 AS varchar), 0 FROM documents
),
verdict AS (
  SELECT v, present,
         CASE WHEN {probe_pos} THEN 1 ELSE 0 END AS maybe
  FROM probes
)
SELECT 65536 AS m_bits, 4 AS d,
       count(*) AS n_probes,
       CAST(sum(present) AS BIGINT) AS n_present_exact,
       CAST(sum(maybe) AS BIGINT) AS n_maybe,
       CAST(sum(CASE WHEN maybe = 1 AND present = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_positive,
       CAST(sum(CASE WHEN maybe = 0 AND present = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_negative,
       (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_set_bits
FROM verdict
"""


def q_sketch_cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min heavy hitters (Cormode & Muthukrishnan 2005): a 4×1024
    integer counter matrix over the token stream, point-queried for the
    exact top-20 tokens — demonstrating the overestimate-only bound on
    real data.  All-integer state; merge = element-wise add."""
    from sequin_spark.datapipe.sketch import cm_counters, cm_point_estimates

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    # spread before the normalize+explode kernel: it feeds THREE
    # aggregation passes (exact counts + 4 CM counter rows) and
    # otherwise runs serially on the scan's single split (r13
    # optimization round, A/B min 0.97 → 0.84 s, rows identical)
    words = spread_for_compute(docs.select("text")).select(
        F.explode(F.split(F.expr(
            "regexp_replace(lower(text), '\\\\s+', ' ')"), " ")).alias("w")
    ).filter(F.col("w") != "")
    exact = (words.groupBy("w").agg(F.count("*").cast("long").alias("exact_cnt"))
             .orderBy(F.desc("exact_cnt"), F.asc("w")).limit(20))
    counters = cm_counters(words, "w")
    est = cm_point_estimates(counters, exact.select("w"), "w")
    return exact.join(est, "w").select(
        F.col("w").alias("token"), "exact_cnt", "cm_estimate")


def _sql_cm_bucket(expr: str, r: int) -> str:
    """Row r's count-min bucket: the r-th disjoint 5-hex-digit (20-bit)
    slice of md5(expr), mod 1024 — the single-digest hash derivation of
    datapipe/sketch._cm_row_buckets, digit-for-digit."""
    poly = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({expr}), {1 + 5 * r + i}, 1)) - 1)"
        f" * {16 ** (4 - i)}"
        for i in range(5)
    )
    return f"(({poly}) % 1024)"


def _sql_sketch_cm() -> str:
    buckets = " ".join(
        f"WHEN {r} THEN {_sql_cm_bucket('w', r)}" for r in range(4))
    h = f"(CASE r {buckets} END)"
    return f"""
WITH words AS (
  SELECT unnest(string_split({D_NORM}, ' ')) AS w FROM documents
), wnz AS (SELECT w FROM words WHERE w <> ''),
exact AS (
  SELECT w, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM wnz GROUP BY w ORDER BY exact_cnt DESC, w ASC LIMIT 20
),
rows_ AS (SELECT unnest(generate_series(0, 3)) AS r),
counters AS (
  SELECT r, {h} AS bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM wnz CROSS JOIN rows_
  GROUP BY r, {h}
),
probes AS (
  SELECT exact.w, r, {h} AS bucket FROM exact CROSS JOIN rows_
)
SELECT probes.w AS token, exact.exact_cnt,
       CAST(min(counters.cnt) AS BIGINT) AS cm_estimate
FROM probes
JOIN counters USING (r, bucket)
JOIN exact ON exact.w = probes.w
GROUP BY probes.w, exact.exact_cnt
"""


def _sql_h16_of(expr: str) -> str:
    """int(md5(expr)[0:4], 16) — the portable h16 used by curation's
    deterministic sampling, as a DuckDB expression."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({expr}), {i}, 1)) - 1)"
        f" * {16 ** (4 - i)}"
        for i in range(1, 5)
    )


BM25_TERMS = ["spark", "query", "join", "stream"]


def q_select_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 relevance of every doc to a fixed query-term set —
    one vocabulary-filtered explode, broadcast df/N/avgdl stats."""
    from sequin_spark.datapipe.selection import bm25_topk

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_TERMS)


def _sql_select_bm25(k1: float = 1.2, b: float = 0.75) -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
WITH base AS (SELECT doc_id, string_split({D_NORM}, ' ') AS toks FROM documents),
tok AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS token FROM base),
q AS (SELECT doc_id, token, dl, CAST(count(*) AS DOUBLE) AS tf
      FROM tok WHERE token IN ({terms}) GROUP BY doc_id, token, dl),
dfreq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df_t FROM q GROUP BY token),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(len(toks)) AS avgdl FROM base)
SELECT q.doc_id,
       round(sum(ln(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
                 * tf * ({k1} + 1)
                 / (tf + {k1} * (1 - {b} + {b} * dl / avgdl))), 4) AS bm25,
       CAST(count(*) AS BIGINT) AS n_matched_terms
FROM q JOIN dfreq USING (token) CROSS JOIN stats
GROUP BY q.doc_id
"""


def q_select_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (hashed-unigram bucket distributions,
    target = lang 'en'): two 256-row rollups broadcast back over the
    token stream."""
    from sequin_spark.datapipe.selection import dsir_importance

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return dsir_importance(docs, n_buckets=256)


def _sql_select_dsir(n_buckets: int = 256) -> str:
    h16 = _sql_h16_of("token")
    return f"""
WITH tok AS (
  SELECT doc_id, (lang = 'en') AS is_target,
         unnest(string_split({D_NORM}, ' ')) AS token
  FROM documents
),
b AS (SELECT doc_id, is_target, ({h16}) % {n_buckets} AS bucket FROM tok),
counts AS (
  SELECT bucket, CAST(count(*) AS DOUBLE) AS n_all,
         CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS DOUBLE) AS n_target
  FROM b GROUP BY bucket
),
totals AS (SELECT sum(n_all) AS t_all, sum(n_target) AS t_target FROM counts),
rates AS (
  SELECT bucket,
         ln((n_target + 1) / (t_target + {n_buckets})) AS log_p,
         ln((n_all + 1) / (t_all + {n_buckets})) AS log_q
  FROM counts CROSS JOIN totals
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(log_p - log_q), 4) + 0.0 AS dsir_weight
FROM b JOIN rates USING (bucket)
GROUP BY doc_id
"""


def q_dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style cross-doc duplicated spans: 15-token window
    hashes, doc-frequency join, per-doc duplicate ratio."""
    from sequin_spark.datapipe.selection import repeated_span_metrics

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return repeated_span_metrics(docs, window=15)


def _sql_dedup_repeated_spans(window: int = 15) -> str:
    return f"""
WITH t AS (SELECT doc_id, string_split({D_NORM}, ' ') AS toks FROM documents),
w AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= {window} THEN
           list_transform(generate_series(1, len(toks) - {window - 1}),
                          i -> md5(array_to_string(toks[i:i+{window - 1}], ' ')))
         ELSE [] END AS hs
  FROM t
),
e AS (SELECT doc_id, unnest(hs) AS h FROM w),
freq AS (SELECT h, count(DISTINCT doc_id) AS n_docs FROM e GROUP BY h)
SELECT w.doc_id,
       CAST(count(e2.h) AS BIGINT) AS n_windows,
       CAST(coalesce(sum(CASE WHEN freq.n_docs >= 2 THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_shared_windows,
       round(coalesce(sum(CASE WHEN freq.n_docs >= 2 THEN 1 ELSE 0 END), 0)
             / greatest(count(e2.h), 1), 4) AS shared_ratio
FROM w
LEFT JOIN e AS e2 USING (doc_id)
LEFT JOIN freq ON e2.h = freq.h
GROUP BY w.doc_id
"""


def q_corpus_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 hash split + fingerprint leakage audit
    (content fingerprints spanning >1 split = train/eval leakage)."""
    from sequin_spark.datapipe.selection import split_leakage

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return split_leakage(docs)


def _sql_corpus_split_leakage(train_pct: int = 80, val_pct: int = 10) -> str:
    h16 = _sql_h16_of("CAST(doc_id AS VARCHAR)")
    return f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN ({h16}) % 100 < {train_pct} THEN 'train'
              WHEN ({h16}) % 100 < {train_pct + val_pct} THEN 'val'
              ELSE 'test' END AS split,
         md5({D_NORM}) AS fp
  FROM documents
),
span AS (SELECT fp, count(DISTINCT split) AS n_splits FROM base GROUP BY fp)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT fp) AS BIGINT) AS n_unique_fp,
       CAST(sum(CASE WHEN n_splits >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_leaked_docs
FROM base JOIN span USING (fp)
GROUP BY split
"""


def q_corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-proof split assignment (selection.split_assign_content):
    buckets derive from the content fingerprint, so the injected exact
    copies always share a split — n_cross_split_docs is computed 0 by
    both engines, proving the property rather than asserting it."""
    from sequin_spark.datapipe.selection import split_assign_content

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 20000).alias("doc_id"), "text")
    return split_assign_content(docs.unionByName(copies))


def _sql_corpus_split_assign(train_pct: int = 80, val_pct: int = 10) -> str:
    h16 = _sql_h16_of(f"md5({D_NORM})")
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 20000, text FROM documents WHERE doc_id % 25 = 0
),
base AS (
  SELECT doc_id,
         CASE WHEN ({h16}) % 100 < {train_pct} THEN 'train'
              WHEN ({h16}) % 100 < {train_pct + val_pct} THEN 'val'
              ELSE 'test' END AS split,
         md5({D_NORM}) AS fp
  FROM corpus
),
span AS (SELECT fp, count(DISTINCT split) AS n_splits FROM base GROUP BY fp)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT fp) AS BIGINT) AS n_unique_fp,
       CAST(sum(CASE WHEN n_splits >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cross_split_docs
FROM base JOIN span USING (fp)
GROUP BY split
"""


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE tokens per word under the
    corpus-learned 8-merge table (tokenizer.bpe_learn_merges +
    bpe_encode) — the standard multilingual-tokenizer health metric
    (high fertility = the vocabulary underserves that language).  The
    merge table is a bounded 8-row collect; encode is one pass over the
    exploded word stream; the rollup is a k-row lang aggregation."""
    from sequin_spark.datapipe.tokenizer import bpe_encode

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    merges = _bpe_merges_cached(spark, sf_dir, n_merges=8)
    enc = bpe_encode(docs, merges)
    langs = docs.select("doc_id", "lang")
    return (
        enc.join(langs, "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("n_words").alias("n_words"),
            F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
        )
        .select(
            "lang", "n_words", "n_bpe_tokens",
            F.round(F.col("n_bpe_tokens") / F.col("n_words"), 4)
            .alias("fertility"),
        )
    )


def _sql_tokenizer_fertility(n_merges: int = 8) -> str:
    """Reuses the sequential merge-replay CTE chain (w0..wN) of
    _sql_bpe_merges, then encodes every document word through the final
    word→syms table."""
    chain = _sql_bpe_merges(n_merges)
    # keep the WITH ... w{n} chain, drop the UNION ALL merge listing
    body = chain[: chain.rindex("\nSELECT CAST(1 AS INTEGER) AS rank")]
    return body + f""",
tok AS (
  SELECT doc_id, lang, unnest(string_split({D_NORM}, ' ')) AS word
  FROM documents
),
enc AS (
  SELECT t.doc_id, t.lang,
         len(string_split(w.syms, '|')) AS n_syms
  FROM tok t JOIN w{n_merges} w USING (word)
  WHERE t.word <> ''
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_syms) AS BIGINT) AS n_bpe_tokens,
       round(CAST(sum(n_syms) AS DOUBLE) / count(*), 4) AS fertility
FROM enc
GROUP BY lang
"""


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive-Bayes quality classifier on hashed-unigram buckets
    (closed-form counts — the deterministic analog of LR-on-hashed-
    features quality filters); labels = the curated source list."""
    from sequin_spark.datapipe.selection import nb_quality_classifier

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return nb_quality_classifier(docs, n_buckets=256)


def _sql_quality_classifier(n_buckets: int = 256) -> str:
    h16 = _sql_h16_of("token")
    hq = "source IN ('src0','src1','src2','src3','src4')"
    return f"""
WITH tok AS (
  SELECT doc_id, ({hq}) AS is_hq,
         unnest(string_split({D_NORM}, ' ')) AS token
  FROM documents
),
b AS (SELECT doc_id, is_hq, ({h16}) % {n_buckets} AS bucket FROM tok),
counts AS (
  SELECT bucket,
         CAST(sum(CASE WHEN is_hq THEN 1 ELSE 0 END) AS DOUBLE) AS n_pos,
         CAST(sum(CASE WHEN is_hq THEN 0 ELSE 1 END) AS DOUBLE) AS n_neg
  FROM b GROUP BY bucket
),
totals AS (SELECT sum(n_pos) AS t_pos, sum(n_neg) AS t_neg FROM counts),
rates AS (
  SELECT bucket,
         ln((n_pos + 1) / (t_pos + {n_buckets}))
           - ln((n_neg + 1) / (t_neg + {n_buckets})) AS llr
  FROM counts CROSS JOIN totals
),
dc AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum(CASE WHEN {hq} THEN 1 ELSE 0 END) AS DOUBLE) AS n_hq
  FROM documents
),
pb AS (
  SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM b GROUP BY doc_id, bucket
),
-- bucket-sorted left-fold with 0.0 init: bit-identical to Spark's
-- aggregate(sort_array(collect_list(struct(bucket, cnt*llr))), 0.0, +)
scored AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
                        list(CAST(cnt * llr AS DOUBLE) ORDER BY bucket)),
           (a, x) -> a + x) AS sum_llr
  FROM pb JOIN rates USING (bucket)
  GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       round(sum_llr + ln((n_hq + 1) / (n_docs - n_hq + 1)), 4) AS nb_score,
       (sum_llr + ln((n_hq + 1) / (n_docs - n_hq + 1))) > 0 AS predicted_hq
FROM scored CROSS JOIN dc
"""


# ---------------------------------------------------------------------------
# Tokenizer training: BPE merge learning (datapipe/tokenizer.py)


def _cached_json_artifact(sf_dir: str, kind: str, version: str, build):
    """Maintained trained-artifact lifecycle for small JSON-serializable
    results (trained tokenizers) — the scalar sibling of
    _maintained_index: content-fingerprinted cache key, build once per
    corpus, atomic meta.json write (the ONLY artifact, so a killed
    build can never be half-loaded), load after.  ``version`` MUST
    encode every hyperparameter that shapes the artifact — a changed
    hyperparameter under an unchanged version silently reuses the
    stale result."""
    import json as _json

    path = _index_cache_path(sf_dir, kind, version, src_table="documents")
    mf = os.path.join(path, "meta.json")
    if not os.path.exists(mf):
        result = build()
        os.makedirs(path, exist_ok=True)
        tmp = mf + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(result, f)
        os.replace(tmp, mf)
    with open(mf) as f:
        return _json.load(f)


def _bpe_merges_cached(spark: SparkSession, sf_dir: str,
                       n_merges: int = 8) -> list[tuple]:
    """Maintained trained-tokenizer artifact: the merge table is learned
    once per corpus and persisted (content-fingerprinted cache key, the
    ANN-codebook pattern) — a tokenizer is trained once and reused by
    every downstream job, so steady-state queries load, not re-fit."""
    from sequin_spark.datapipe.tokenizer import bpe_learn_merges

    def build():
        docs = load_table(spark, sf_dir, "documents")
        return [list(r) for r in
                bpe_learn_merges(docs, spark, n_merges=n_merges).collect()]

    return [tuple(m) for m in _cached_json_artifact(
        sf_dir, "bpe_merges", f"m{n_merges}-v1", build)]


# training and encode MUST share the Viterbi/EM edge window — pieces
# longer than the encode-side limit would silently never be considered
_UNIGRAM_MAX_PIECE_LEN = 4
_UNIGRAM_VOCAB_SIZE = 96
_UNIGRAM_SEED_SIZE = 160
_UNIGRAM_N_ITERS = 2


_UNIGRAM_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "datapipe", "fixtures", "unigram_vocab_v1.json")


def _unigram_vocab_fixture() -> list[tuple[str, float]]:
    """The pipeline's versioned PRETRAINED unigram-LM vocabulary —
    committed to the repo like any production tokenizer artifact
    (pipelines encode with a fixed tokenizer; they do not retrain per
    batch).  Trained once by datapipe/unigram.train_unigram (provenance
    in the fixture header); training math itself stays pinned by the
    pure-Python differential test in tests/test_tokenizer.py.  Freezing
    the vocab is what makes the encode side fully oracle-checkable:
    the DuckDB replica embeds the same (piece, logprob) table."""
    import json as _json

    with open(_UNIGRAM_FIXTURE) as f:
        return [(p, lp) for p, lp in _json.load(f)["vocab"]]


def q_tokenizer_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer fertility per language (SentencePiece,
    Kudo 2018 — datapipe/unigram.py): Viterbi-encode every document
    with the committed 96-piece pretrained vocabulary
    (_unigram_vocab_fixture), roll up tokens/word by lang.  The EM
    counterpart to tokenizer_fertility's BPE — together they cover
    both tokenizer families.

    Fully oracle-checked: with the vocab frozen, Viterbi is a bounded
    DP the DuckDB replica replays position-by-position as a generated
    CTE chain (_sql_unigram_fertility) — same double additions in the
    same order, same (score, piece-length) tie-break, bit-identical.
    EM *training* (float log-sum-exp whose cross-partition merge order
    Spark does not fix) stays out of the checked surface by design and
    is pinned by tests/test_tokenizer.py's pure-Python differential."""
    from sequin_spark.datapipe.unigram import unigram_encode

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    vocab = _unigram_vocab_fixture()
    enc = unigram_encode(docs, vocab, max_piece_len=_UNIGRAM_MAX_PIECE_LEN)
    langs = docs.select("doc_id", "lang")
    return (
        enc.join(langs, "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("n_words").alias("n_words"),
            F.sum("n_unigram_tokens").alias("n_unigram_tokens"),
            F.sum("n_oov_words").alias("n_oov_words"),
        )
        .select(
            "lang", "n_words", "n_unigram_tokens", "n_oov_words",
            F.round(F.col("n_unigram_tokens") / F.col("n_words"), 4)
            .alias("fertility"),
        )
    )


def _sql_unigram_fertility(max_word_len: int = 12) -> str:
    """DuckDB replica of q_tokenizer_unigram: embeds the committed
    pretrained vocab as a VALUES table and replays Viterbi as a
    generated position-by-position CTE chain (the _sql_bpe_merges
    pattern applied to a DP).

    Exactness argument: dp[i] = best over j∈[i-L, i-1] of dp[j]+lp,
    ties broken by longer piece (distinct j ⇒ distinct piece length,
    so the order is strict; the Spark side's lexicographic third key
    is unreachable).  Every candidate score is ONE double addition on
    operands both engines hold bit-identically (the fixture's logprob
    literals round-trip through repr/strtod), and argmax is
    order-independent — so the replay is bit-exact, not approximate.
    Words longer than ``max_word_len`` would fall off the chain (the
    corpus word pool caps at 8 chars; 12 is slack), and unreachable
    final positions replicate the char-count OOV fallback."""
    vocab = _unigram_vocab_fixture()
    ll = _UNIGRAM_MAX_PIECE_LEN
    vals = ",\n    ".join(
        f"('{p}', CAST({lp!r} AS DOUBLE))" for p, lp in vocab)
    parts = [f"""
WITH vocab(piece, lp) AS (VALUES
    {vals}),
words AS (
  SELECT DISTINCT word FROM (
    SELECT unnest(string_split({D_NORM}, ' ')) AS word FROM documents)
  WHERE word <> ''
),
-- loud guard: the CTE chain only reaches position {max_word_len};
-- a longer word would silently score OOV here while Spark segments
-- it normally, turning a corpus/normalization change into a
-- confusing value diff.  Fail with a clear message instead.
len_guard AS (
  SELECT CASE WHEN max(length(word)) > {max_word_len}
              THEN error('unigram oracle: word exceeds max_word_len='
                         || '{max_word_len} — regenerate the oracle '
                         || 'CTE chain with a larger bound')
              ELSE 0 END AS ok
  FROM words
),
edges AS (
  SELECT w.word, g.lo, g.lo + length(v.piece) AS hi,
         length(v.piece) AS plen, v.lp
  FROM words w
  CROSS JOIN (SELECT unnest(generate_series(0, {max_word_len - 1}))
              AS lo) g
  JOIN vocab v
    ON g.lo + length(v.piece) <= length(w.word)
   AND substr(w.word, g.lo + 1, length(v.piece)) = v.piece
),
d0 AS (SELECT word, CAST(0.0 AS DOUBLE) AS s0, 0 AS t0 FROM words)"""]
    for i in range(1, max_word_len + 1):
        lo_min = max(0, i - ll)
        prev_s = " ".join(f"WHEN {j} THEN d.s{j}" for j in range(lo_min, i))
        prev_t = " ".join(f"WHEN {j} THEN d.t{j}" for j in range(lo_min, i))
        keep_d = ", ".join(f"d.s{j}, d.t{j}" for j in range(0, i))
        keep = ", ".join(f"s{j}, t{j}" for j in range(0, i))
        parts.append(f""",
c{i} AS (
  SELECT d.word, {keep_d},
         (CASE e.lo {prev_s} END) + e.lp AS cs,
         (CASE e.lo {prev_t} END) + 1 AS ct,
         row_number() OVER (
           PARTITION BY d.word
           ORDER BY ((CASE e.lo {prev_s} END) + e.lp) DESC NULLS LAST,
                    e.plen DESC
         ) AS rn
  FROM d{i - 1} d LEFT JOIN edges e ON e.word = d.word AND e.hi = {i}
),
d{i} AS (SELECT word, {keep}, cs AS s{i}, ct AS t{i}
         FROM c{i} WHERE rn = 1)""")
    fin_s = " ".join(f"WHEN {i} THEN s{i}"
                     for i in range(1, max_word_len + 1))
    fin_t = " ".join(f"WHEN {i} THEN t{i}"
                     for i in range(1, max_word_len + 1))
    parts.append(f""",
fin AS (
  SELECT word, CASE length(word) {fin_s} END AS s_fin,
               CASE length(word) {fin_t} END AS t_fin
  FROM d{max_word_len}
),
wtok AS (
  SELECT word,
         CASE WHEN s_fin IS NULL THEN length(word) ELSE t_fin END
           AS n_tokens,
         (s_fin IS NULL) AS is_oov
  FROM fin
),
tok AS (
  SELECT lang, unnest(string_split({D_NORM}, ' ')) AS word
  FROM documents
),
enc AS (
  SELECT t.lang, w.n_tokens, w.is_oov
  FROM tok t JOIN wtok w USING (word) WHERE t.word <> ''
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_tokens) AS BIGINT) AS n_unigram_tokens,
       CAST(sum(CASE WHEN is_oov THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov_words,
       round(CAST(sum(n_tokens) AS DOUBLE) / count(*), 4) AS fertility
FROM enc, len_guard GROUP BY lang
""")
    return "".join(parts)


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn 8 BPE merges from the corpus word-frequency table —
    iterative pair-count argmax + fold-merge, O(vocab) per iteration;
    the oracle replays the same iterations as a generated CTE chain.
    The learned table persists per corpus (_bpe_merges_cached)."""
    _prep(spark)
    merges = _bpe_merges_cached(spark, sf_dir, n_merges=8)
    return spark.createDataFrame(
        merges, "rank int, x string, y string, merged string, cnt long")


def _sql_bpe_merges(n_merges: int = 8) -> str:
    parts = [f"""
w0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS n,
         array_to_string(list_transform(generate_series(1, length(word)),
                                        i -> substr(word, i, 1)), '|') AS syms
  FROM (SELECT unnest(string_split({D_NORM}, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word
)"""]
    for k in range(1, n_merges + 1):
        prev = f"w{k - 1}"
        parts.append(f""",
p{k} AS (
  SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
    SELECT n, unnest(CASE WHEN len(string_split(syms, '|')) >= 2 THEN
      list_transform(generate_series(1, len(string_split(syms, '|')) - 1),
        i -> string_split(syms, '|')[i] || '|' || string_split(syms, '|')[i + 1])
      ELSE [] END) AS pair FROM {prev}) GROUP BY pair
),
b{k} AS (
  SELECT pair, cnt, split_part(pair, '|', 1) AS x, split_part(pair, '|', 2) AS y
  FROM p{k} ORDER BY cnt DESC, pair ASC LIMIT 1
),
w{k} AS (
  SELECT word, n, CASE WHEN len(string_split(syms, '|')) < 2 THEN syms ELSE
    list_reduce(string_split(syms, '|'),
      (acc, s) -> CASE WHEN (acc = b{k}.x OR acc LIKE '%|' || b{k}.x)
                       AND s = b{k}.y
                  THEN acc || b{k}.y ELSE acc || '|' || s END) END AS syms
  FROM {prev} CROSS JOIN b{k}
)""")
    finals = " UNION ALL ".join(
        f"SELECT CAST({k} AS INTEGER) AS rank, x, y, x || y AS merged, cnt "
        f"FROM b{k}"
        for k in range(1, n_merges + 1)
    )
    return "WITH " + "".join(parts) + "\n" + finals


def q_sketch_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-operation sketch (Beyer et al. 2007): estimated Jaccard
    similarity and intersection size between the ENGLISH and
    NON-ENGLISH vocabularies from the k smallest union hashes — the
    corpus-overlap probe that needs no full distinct-join at 100 TB
    (datapipe/sketch.kmv_jaccard; exact-distinct baselines included so
    the error is visible)."""
    from sequin_spark.datapipe.sketch import kmv_jaccard

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "lang",
        F.explode(F.split(F.expr(
            "regexp_replace(lower(text), '\\\\s+', ' ')"), " ")).alias("w")
    ).filter(F.col("w") != "")
    # ONE tokenize pass: a vocabulary-sized side-tagged word table feeds
    # BOTH the KMV estimate and the exact-intersect baseline (the old
    # shape evaluated the corpus explode four times — a and b under the
    # sketch plus both sides of the intersect).  Equivalence is exact:
    # kmv_jaccard's tagged table is groupBy(h60(w)) of max-flags, and
    # max is associative, so pre-deduping words per side changes
    # nothing; INTERSECT is set-semantics, so the flag conjunction
    # count is the same distinct-word count.
    wt = (words.groupBy("w").agg(
        F.max(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("_a"),
        F.max(F.when(F.col("lang") != "en", 1).otherwise(0)).alias("_b"))
        .localCheckpoint(eager=False))
    a = wt.filter(F.col("_a") == 1).select("w")
    b = wt.filter(F.col("_b") == 1).select("w")
    est = kmv_jaccard(a, b, "w", k=256)
    exact = wt.filter((F.col("_a") == 1) & (F.col("_b") == 1)).agg(
        F.count("*").cast("long").alias("exact_intersection"))
    return est.join(exact)


def _sql_sketch_vocab_overlap(k: int = 256) -> str:
    h = _sql_h60_of("w")
    return f"""
WITH words AS (
  SELECT lang, unnest(string_split({D_NORM}, ' ')) AS w FROM documents
), wnz AS (SELECT lang, w FROM words WHERE w <> ''),
tagged AS (
  SELECT {h} AS h,
         max(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS a,
         max(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS b
  FROM wnz GROUP BY {h}
),
samp AS (SELECT * FROM tagged ORDER BY h LIMIT {k}),
agg AS (
  SELECT count(*) AS n, max(h) AS hk,
         sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS n_both
  FROM samp
),
est AS (
  SELECT {k} AS k, CAST(n AS BIGINT) AS n_union_sample,
         round(CAST(n_both AS DOUBLE) / n, 4) AS jaccard,
         CASE WHEN n < {k} THEN CAST(n AS DOUBLE)
              ELSE round({float(k - 1)!r} * 1152921504606846976.0
                         / CAST(hk AS DOUBLE), 2) END AS est_union,
         n_both
  FROM agg
)
SELECT k, n_union_sample, jaccard,
       est_union,
       round(est_union * n_both / n_union_sample, 2)
         AS est_intersection,
       (SELECT CAST(count(*) AS BIGINT) FROM (
          SELECT DISTINCT w FROM wnz WHERE lang = 'en'
          INTERSECT
          SELECT DISTINCT w FROM wnz WHERE lang <> 'en'))
         AS exact_intersection
FROM est
"""


def q_embed_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension int8 scalar quantization of the embedding corpus
    (the storage layout vector stores ship by default — 4× smaller
    than float32): code = clip(round((x − min_d)/scale_d), 0, 255)
    with scale_d = (max_d − min_d)/255, reporting per dim the range
    and the mean absolute reconstruction error.  min/max are exact
    data values, the code rounding is identical half-up on both
    engines for non-negative operands, and the error mean is rounded —
    fully hash-checkable.  One posexplode pass + a 64-row broadcast
    back."""
    _prep(spark)
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(F.posexplode(F.col("embedding").cast("array<double>"))
                 .alias("dim", "val"))
    stats = x.groupBy("dim").agg(F.min("val").alias("mn"),
                                 F.max("val").alias("mx"))
    j = x.join(F.broadcast(stats), "dim")
    scale = (F.col("mx") - F.col("mn")) / F.lit(255.0)
    code = F.when(
        scale == 0, F.lit(0.0)
    ).otherwise(
        F.least(F.greatest(F.round((F.col("val") - F.col("mn")) / scale, 0),
                           F.lit(0.0)), F.lit(255.0)))
    recon = F.col("mn") + code * scale
    return (j.select("dim", "mn", "mx",
                     F.abs(F.col("val") - recon).alias("_err"))
            .groupBy("dim")
            .agg(F.round(F.min("mn"), 6).alias("dim_min"),
                 F.round(F.min("mx"), 6).alias("dim_max"),
                 F.round(F.avg("_err"), 6).alias("mean_abs_err"))
            .select(F.col("dim").cast("int").alias("dim"),
                    "dim_min", "dim_max", "mean_abs_err"))


SQL_EMBED_INT8_QUANTIZE = """
WITH x AS (
  SELECT d - 1 AS dim, embedding[d]::DOUBLE AS val
  FROM embeddings
  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS d)
),
stats AS (
  SELECT dim, min(val) AS mn, max(val) AS mx FROM x GROUP BY dim
),
q AS (
  SELECT x.dim, val, mn, mx,
         CASE WHEN mx = mn THEN 0.0
              ELSE least(greatest(
                     round((val - mn) / ((mx - mn) / 255.0), 0),
                     0.0), 255.0) END AS code
  FROM x JOIN stats ON x.dim = stats.dim
)
SELECT CAST(dim AS INTEGER) AS dim,
       round(min(mn), 6) AS dim_min,
       round(min(mx), 6) AS dim_max,
       round(avg(abs(val - (mn + code * ((mx - mn) / 255.0)))), 6)
         AS mean_abs_err
FROM q GROUP BY dim
"""


def q_sketch_hll_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL set operations between the English and non-English
    vocabularies: union = element-wise register max (the same lossless
    merge the streaming twin performs across micro-batches),
    intersection = inclusion–exclusion, clamped at 0
    (datapipe/sketch.hll_union_intersection).  The KMV twin
    (sketch_vocab_overlap) gives the guarded estimate; this is the
    merge-native one."""
    from sequin_spark.datapipe.sketch import hll_union_intersection

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "lang",
        F.explode(F.split(F.expr(
            "regexp_replace(lower(text), '\\\\s+', ' ')"), " ")).alias("w")
    ).filter(F.col("w") != "")
    return hll_union_intersection(
        words.filter(F.col("lang") == "en").select("w"),
        words.filter(F.col("lang") != "en").select("w"), "w")


def _sql_sketch_hll_setops() -> str:
    h = _sql_h60_of("w")
    # literal DECIMAL multiplication overflows DuckDB's DECIMAL(18);
    # force DOUBLE like the existing _sql_sketch_hll oracle does
    alpha_m2_p53 = ("CAST(0.7182725932495458 AS DOUBLE) "
                    "* CAST(65536 AS DOUBLE) "
                    "* CAST(9007199254740992 AS DOUBLE)")

    def reg(alias: str, pred: str) -> str:
        return (f"{alias} AS (SELECT h % 256 AS register, "
                f"max(CASE WHEN h // 256 = 0 THEN 53 "
                f"ELSE 53 - length(bin(h // 256)) END) AS max_rho "
                f"FROM (SELECT {h} AS h FROM wnz WHERE {pred}) "
                f"GROUP BY h % 256)")

    def est(regcte: str) -> str:
        s = (f"(SELECT COALESCE(sum(CAST(1 AS BIGINT) << (53 - max_rho)), 0)"
             f" + (256 - count(*)) * 9007199254740992 FROM {regcte})")
        return f"round({alpha_m2_p53} / CAST({s} AS DOUBLE), 1)"

    return f"""
WITH words AS (
  SELECT lang, unnest(string_split({D_NORM}, ' ')) AS w FROM documents
), wnz AS (SELECT lang, w FROM words WHERE w <> ''),
{reg('ra', "lang = 'en'")},
{reg('rb', "lang <> 'en'")},
rm AS (
  SELECT register, max(max_rho) AS max_rho FROM (
    SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY register
),
e AS (SELECT {est('ra')} AS est_a, {est('rb')} AS est_b,
             {est('rm')} AS est_union)
SELECT est_a, est_b, est_union,
       greatest(round(est_a + est_b - est_union, 1), 0.0)
         AS est_intersection
FROM e
"""


def q_corpus_zipf_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity profile per source: token count, type count
    (distinct vocab), type-token ratio, and the top token's share —
    the Zipf-head / diversity statistics quality pipelines threshold
    on (low TTR or a dominant head token = boilerplate/spam source).
    One token pass; per-source counts are map-side combined; the
    top-token share is a window rank over the bounded (source, token)
    count table."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.split(F.expr(
            "regexp_replace(lower(text), '\\\\s+', ' ')"), " ")).alias("w")
    ).filter(F.col("w") != "")
    per_tok = toks.groupBy("source", "w").agg(F.count("*").alias("c"))
    top = (per_tok
           .withColumn("rk", F.row_number().over(
               Window.partitionBy("source")
               .orderBy(F.col("c").desc(), F.col("w").asc())))
           .filter(F.col("rk") == 1)
           .select("source", F.col("c").alias("top_c")))
    agg = per_tok.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_types"))
    return (agg.join(top, "source")
            .select(
                "source",
                F.col("n_tokens").cast("long").alias("n_tokens"),
                F.col("n_types").cast("long").alias("n_types"),
                F.round(F.col("n_types") / F.col("n_tokens"), 4)
                .alias("ttr"),
                F.round(F.col("top_c") / F.col("n_tokens"), 4)
                .alias("top_token_share")))


SQL_CORPUS_ZIPF_TTR = f"""
WITH toks AS (
  SELECT source, unnest(string_split({D_NORM}, ' ')) AS w
  FROM documents
), wnz AS (SELECT source, w FROM toks WHERE w <> ''),
per_tok AS (
  SELECT source, w, count(*) AS c FROM wnz GROUP BY source, w
),
top AS (
  SELECT source, c AS top_c FROM (
    SELECT source, c,
           row_number() OVER (PARTITION BY source
                              ORDER BY c DESC, w ASC) AS rk
    FROM per_tok) WHERE rk = 1
),
agg AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types
  FROM per_tok GROUP BY source
)
SELECT agg.source, n_tokens, n_types,
       round(CAST(n_types AS DOUBLE) / n_tokens, 4) AS ttr,
       round(CAST(top_c AS DOUBLE) / n_tokens, 4) AS top_token_share
FROM agg JOIN top ON agg.source = top.source
"""


def q_sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact-k uniform corpus sample: the 100 smallest
    60-bit doc_id hashes (hash order statistic — no RNG/seed state,
    identical on every rerun; datapipe/sampling.reservoir_sample).
    Plan = per-partition top-k + k-row merge (TakeOrdered), never a
    global sort — the eval-holdout primitive at 100 TB."""
    from sequin_spark.datapipe.sampling import reservoir_sample

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return reservoir_sample(docs, "doc_id", 100).select(
        "doc_id", "lang", "source")


def _sql_sample_reservoir() -> str:
    h = _sql_h60_of("CAST(doc_id AS VARCHAR)")
    return f"""
SELECT doc_id, lang, source
FROM documents ORDER BY {h} LIMIT 100
"""


def q_sample_stratified_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 50 docs per language — hash order statistic ranked
    WITHIN the stratum (datapipe/sampling.stratified_exact_k): one
    shuffle on the stratum key, deterministic across reruns.  The
    "n per class" counterpart of curation's rate-based mixers."""
    from sequin_spark.datapipe.sampling import stratified_exact_k

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return stratified_exact_k(docs, "lang", "doc_id", 50).select(
        "lang", "doc_id")


def _sql_sample_stratified_k() -> str:
    h = _sql_h60_of("CAST(doc_id AS VARCHAR)")
    return f"""
WITH r AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY {h}) AS rk
  FROM documents)
SELECT lang, doc_id FROM r WHERE rk <= 50
"""


def q_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language exact length quantiles (q in {.25,.5,.75,.9}),
    quantile_disc semantics: the element at rank ⌈q·n⌉ — an actual
    data value, so it hash-compares exactly across engines
    (datapipe/sampling.exact_quantiles; one within-group sort pass for
    ALL quantiles).  The corpus-profiling op behind length filters."""
    from sequin_spark.datapipe.sampling import exact_quantiles

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return exact_quantiles(docs, "lang", "n_chars",
                           [0.25, 0.5, 0.75, 0.9])


SQL_LENGTH_QUANTILES = """
WITH r AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents),
qs AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
                      CAST(0.75 AS DOUBLE), CAST(0.9 AS DOUBLE)]) AS q)
SELECT lang, q, n_chars AS value
FROM r CROSS JOIN qs
WHERE rn = CAST(ceil(q * n) AS BIGINT)
"""


# (applicationId, sf_dir) → the 64-float anisotropy direction: the
# power iteration is a FIT (4 corpus passes) shared by the
# top-component and debias queries — fit once per corpus per session,
# like _TABLE_CACHE / the maintained indexes
_TOP_COMPONENT_CACHE: dict = {}


def _top_component_cached(spark: SparkSession, sf_dir: str) -> list[float]:
    from sequin_spark.datapipe.similarity import top_principal_component

    key = (spark.sparkContext.applicationId, os.path.realpath(sf_dir))
    v = _TOP_COMPONENT_CACHE.get(key)
    if v is None:
        e = load_table(spark, sf_dir, "embeddings")
        v = top_principal_component(e, "embedding", dims=64, iters=4)
        _TOP_COMPONENT_CACHE[key] = v
    return v


def q_embed_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus (power
    iteration; the anisotropy direction "All-but-the-Top" removes,
    arXiv:1702.01417 — datapipe/similarity.top_principal_component).
    Per-iteration quantization to 6 decimals makes the trajectory
    engine-exact: the DuckDB oracle replays the same four iterations
    as chained CTEs and must land on the identical vector."""
    _prep(spark)
    v = _top_component_cached(spark, sf_dir)
    return spark.createDataFrame(
        [(d, v[d]) for d in range(64)], "dim int, component double")


def _sql_embed_top_component(dims: int = 64, iters: int = 4) -> str:
    """Replay the quantized power iteration as chained CTEs: per
    iteration one dot-product pass, dims weighted sums, an in-SQL
    normalize + round(…, 6) — the quantization that pins the
    trajectory across engines."""
    v0 = round(1.0 / dims ** 0.5, 6)
    parts = [f"""
WITH dims_t AS (SELECT unnest(generate_series(0, {dims - 1})) AS d),
x AS (SELECT vec_id, embedding::DOUBLE[] AS xv FROM embeddings),
v0 AS (SELECT d, CAST({v0!r} AS DOUBLE) AS c FROM dims_t)"""]
    for t in range(1, iters + 1):
        parts.append(f""",
d{t} AS (
  SELECT vec_id, xv,
         list_dot_product(xv,
           (SELECT list(c ORDER BY d) FROM v{t - 1})) AS dot
  FROM x),
w{t} AS (
  SELECT dm.d, sum(xv[dm.d + 1] * dot) AS w
  FROM d{t} CROSS JOIN dims_t dm GROUP BY dm.d),
v{t} AS (
  SELECT d, round(w / sqrt((SELECT sum(w * w) FROM w{t})), 6) AS c
  FROM w{t})""")
    parts.append(f""",
sign_t AS (
  SELECT CASE WHEN c < 0 THEN -1.0 ELSE 1.0 END AS s
  FROM v{iters} ORDER BY abs(c) DESC, d ASC LIMIT 1)
SELECT CAST(d AS INTEGER) AS dim, round(c * s, 6) + 0.0 AS component
FROM v{iters} CROSS JOIN sign_t
""")
    return "".join(parts)


def q_embed_debias_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-but-the-Top debias effect, measured: per label, the mean
    |cosine| of raw vs debiased vectors against the corpus anisotropy
    direction (similarity.remove_top_component).  After removal the
    alignment collapses to ~0 (bounded by the 1e-6 quantization of v),
    the isotropy gain the technique exists for.  One narrow projection
    pass + a label rollup; v comes from the quantized power iteration
    so the oracle can replay it exactly."""
    from sequin_spark.datapipe.similarity import remove_top_component

    _prep(spark)
    e = load_table(spark, sf_dir, "embeddings")
    v = _top_component_cached(spark, sf_dir)
    deb = remove_top_component(e, v, "embedding")
    varr = F.array(*[
        F.expr(f"cast('{float(c)!r}' as double)") for c in v])

    def _align(col):
        x = F.col(col) if col == "debiased" else F.col(col).cast("array<double>")
        dot = F.aggregate(F.zip_with(x, varr, lambda a, b: a * b),
                          F.lit(0.0), lambda acc, y: acc + y)
        nrm = F.sqrt(F.aggregate(
            F.zip_with(x, x, lambda a, b: a * b),
            F.lit(0.0), lambda acc, y: acc + y))
        return F.abs(dot) / nrm

    return (deb.select("label",
                       _align("embedding").alias("_b"),
                       _align("debiased").alias("_a"))
            .groupBy("label")
            .agg(F.count("*").alias("n"),
                 F.round(F.avg("_b"), 4).alias("mean_align_before"),
                 F.round(F.avg("_a"), 4).alias("mean_align_after")))


def _sql_embed_debias(dims: int = 64, iters: int = 4) -> str:
    base = _sql_embed_top_component(dims, iters)
    # reuse the iteration chain up to the final SELECT, then project
    head = base[:base.index("SELECT CAST(d AS INTEGER)")]
    return head + f"""
, vfin AS (SELECT list(round(c * s, 6) + 0.0 ORDER BY d) AS v
           FROM v{iters} CROSS JOIN sign_t),
scored AS (
  SELECT label,
         abs(list_dot_product(xv, v)) / sqrt(list_dot_product(xv, xv))
           AS b,
         abs(list_dot_product(
               list_transform(range(1, {dims + 1}),
                 i -> xv[i] - list_dot_product(xv, v) * v[i]), v))
           / sqrt(list_dot_product(
               list_transform(range(1, {dims + 1}),
                 i -> xv[i] - list_dot_product(xv, v) * v[i]),
               list_transform(range(1, {dims + 1}),
                 i -> xv[i] - list_dot_product(xv, v) * v[i]))) AS a
  FROM (SELECT e.label, x.xv FROM embeddings e
        JOIN x ON x.vec_id = e.vec_id) CROSS JOIN vfin
)
SELECT label, count(*) AS n,
       round(avg(b), 4) AS mean_align_before,
       round(avg(a), 4) AS mean_align_after
FROM scored GROUP BY label
"""


def q_corpus_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking into overlapping token windows — the
    RAG/context-window prep step (window=32 tokens, stride=24 → 25%
    overlap; the inverse of corpus_pack_sequences).  Chunk identity is
    (doc_id, start_tok) and a content hash, so re-chunking after an
    upstream edit changes only the touched windows (content-addressed
    incremental embedding refresh).  Plan: pure narrow explode over the
    scan — token split, sequence() of starts, slice per start; ZERO
    shuffles, embarrassingly parallel at any scale."""
    _prep(spark)
    window, stride = 32, 24
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        docs.select(
            "doc_id",
            F.split(F.expr(
                "regexp_replace(lower(text), '\\\\s+', ' ')"), " ")
            .alias("_w"))
        .select(
            "doc_id", "_w",
            F.explode(F.expr(f"sequence(0, size(_w) - 1, {stride})"))
            .alias("start_tok"))
        .select(
            "doc_id", "start_tok",
            F.expr(f"slice(_w, start_tok + 1, {window})").alias("_chunk"))
        .select(
            "doc_id",
            (F.col("start_tok") / stride).cast("int").alias("chunk_idx"),
            "start_tok",
            F.size("_chunk").cast("int").alias("n_tok"),
            F.md5(F.concat_ws(" ", "_chunk")).alias("chunk_hash"))
    )


SQL_CORPUS_CHUNK_WINDOWS = f"""
WITH w AS (
  SELECT doc_id, string_split({D_NORM}, ' ') AS w FROM documents
),
s AS (
  SELECT doc_id, w, unnest(generate_series(0, len(w) - 1, 24)) AS start_tok
  FROM w
)
SELECT doc_id,
       CAST(start_tok // 24 AS INTEGER) AS chunk_idx,
       start_tok,
       CAST(len(list_slice(w, start_tok + 1, start_tok + 32)) AS INTEGER)
         AS n_tok,
       md5(array_to_string(list_slice(w, start_tok + 1, start_tok + 32), ' '))
         AS chunk_hash
FROM s
"""


def q_embed_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation eval (Kusupati et al. 2022): retrieval
    recall@10 using only the first d' ∈ {8, 16, 32} dimensions against
    the full-64-dim exact ground truth — the measurement that decides
    how small stored vectors can be before retrieval quality collapses
    (storage/56 GB-per-billion-vector question at corpus scale).
    Truncation is F.slice on the stored array — no re-embedding; all
    four searches (exact + 3 truncations) share ONE corpus pass: the
    cross join computes the four cosines side by side (identical per-d
    fold arithmetic to slicing first), stack() makes them rows, and one
    (dim, q_id)-keyed window takes every top-k at once.  The previous
    per-d brute-force calls re-ran the corpus scan + cross join six
    times (3 truncations + the ground truth re-derived under each of
    the 3 recall joins — 24 scan nodes in the physical plan, now 2).
    The 4·k·n_q top rows are lazily localCheckpointed so the ground /
    approx recall joins read them without re-running the search.
    Output: one (dim, recall_at_10) row per d'."""
    from sequin_spark.datapipe.text import spread_for_compute

    _prep(spark)
    k = 10
    dims = (8, 16, 32)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    q = queries.select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec"))
    c = spread_for_compute(
        emb.select(F.col("vec_id").alias("n_id"),
                   F.col("embedding").alias("n_vec")))
    joined = q.crossJoin(c).filter(F.col("q_id") != F.col("n_id"))
    # r14: the four cosines share ONE element-product pass and one
    # square pass per side; each truncation then folds a prefix slice
    # of the shared arrays.  Same ascending-dim fold over the same
    # element values as the per-slice cosine_col_vals chains — float
    # results bit-identical — but the pair expression tree drops from
    # ~24 HOF nodes to ~15 (measured: the plan-compile-heavy lazy
    # checkpoint below was the query's single biggest build cost) and
    # the per-pair multiplies run once, not once per truncation.
    def _cut(d):
        sl = (lambda col: f"slice({col}, 1, {d})") if d else (lambda c_: c_)
        return (f"aggregate({sl('_p')}, 0.0D, (acc, y) -> acc + y)"
                f" / (sqrt(aggregate({sl('_qq')}, 0.0D,"
                f" (acc, y) -> acc + y))"
                f" * sqrt(aggregate({sl('_nn')}, 0.0D,"
                f" (acc, y) -> acc + y)))")

    pairs = joined.select(
        "q_id", "n_id",
        F.expr("zip_with(transform(q_vec, x -> CAST(x AS DOUBLE)), "
               "transform(n_vec, x -> CAST(x AS DOUBLE)), "
               "(x, y) -> x * y)").alias("_p"),
        F.expr("transform(q_vec, x -> CAST(x AS DOUBLE) "
               "* CAST(x AS DOUBLE))").alias("_qq"),
        F.expr("transform(n_vec, x -> CAST(x AS DOUBLE) "
               "* CAST(x AS DOUBLE))").alias("_nn"),
    ).select(
        "q_id", "n_id",
        F.expr(_cut(None)).alias("cos_0"),
        *[F.expr(_cut(d)).alias(f"cos_{d}") for d in dims])
    stack_args = ", ".join(f"{d}, cos_{d}" for d in (0, *dims))
    tall = pairs.select(
        "q_id", "n_id",
        F.expr(f"stack({1 + len(dims)}, {stack_args})").alias("dim", "cos"))
    w = Window.partitionBy("dim", "q_id").orderBy(
        F.col("cos").desc(), F.col("n_id").asc())
    top = (tall.withColumn("rnk", F.row_number().over(w))
           .filter(F.col("rnk") <= k).select("dim", "q_id", "n_id"))
    top = _plan_ckpt(top)
    ground = top.filter(F.col("dim") == 0).select("q_id", "n_id")
    outs = []
    for d in dims:
        approx = (top.filter(F.col("dim") == d)
                  .select("q_id", "n_id", F.lit(1).alias("_hit")))
        outs.append(
            ground.join(approx, ["q_id", "n_id"], "left")
            .agg(F.round(F.sum(F.coalesce("_hit", F.lit(0)))
                         / F.count("*"), 4).alias("recall_at_10"))
            .select(F.lit(d).alias("dim"), "recall_at_10"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _sql_matryoshka(k: int = 10, dims=(8, 16, 32)) -> str:
    def bf(d, name):
        vec = (f"list_slice(embedding, 1, {d})" if d else "embedding")
        return f"""
{name}_c AS (
  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         list_sum(list_transform(generate_series(1, len(q.v)),
                  i -> CAST(q.v[i] AS DOUBLE) * CAST(n.v[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(generate_series(1, len(q.v)),
                  i -> CAST(q.v[i] AS DOUBLE) * CAST(q.v[i] AS DOUBLE))))
          * sqrt(list_sum(list_transform(generate_series(1, len(n.v)),
                  i -> CAST(n.v[i] AS DOUBLE) * CAST(n.v[i] AS DOUBLE)))))
           AS cos
  FROM (SELECT vec_id, {vec} AS v FROM embeddings WHERE vec_id < 10) q,
       (SELECT vec_id, {vec} AS v FROM embeddings) n
  WHERE q.vec_id != n.vec_id
),
{name} AS (
  SELECT q_id, n_id FROM (
    SELECT q_id, n_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos DESC, n_id ASC) AS rnk
    FROM {name}_c) t
  WHERE rnk <= {k}
)"""

    ctes = [bf(None, "exact")] + [bf(d, f"d{d}") for d in dims]
    selects = " UNION ALL ".join(f"""
SELECT {d} AS dim,
       round(sum(CASE WHEN a.n_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / count(*), 4) AS recall_at_10
FROM exact g LEFT JOIN d{d} a ON g.q_id = a.q_id AND g.n_id = a.n_id"""
                                for d in dims)
    return "WITH " + ",".join(ctes) + selects


def q_corpus_chunk_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental re-chunking — the composition the two operators
    above exist for: the crawl-over-crawl diff (corpus_diff_versions'
    construction) selects only ADDED + MODIFIED docs, and only those
    flow into the chunker (corpus_chunk_windows' 32/24 windows); the
    rest of the corpus — and its embeddings — is untouched.  Emits the
    per-source refresh bill: docs re-chunked and chunks to re-embed.
    At 100 TB this is the difference between re-embedding a corpus and
    re-embedding a delta.  Plan: one doc_id full-outer join (both sides
    pre-hashed narrow projections), one zero-shuffle chunk explode,
    one per-source fold.

    Cross-check device: the oracle derives the chunk count per doc in
    CLOSED FORM ((n_tokens-1)//24 + 1) while Spark counts the actual
    exploded windows — they agree only if the chunker emits exactly
    the stride-lattice windows it promises."""
    _prep(spark)
    window, stride = 32, 24
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source")
    v1 = docs.filter(F.col("doc_id") % 41 != 0).select(
        "doc_id", F.md5(F.col("text")).alias("h1"))
    v2_changed = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 25 == 0,
               F.expr("replace(text, ' the ', ' thy ')"))
        .otherwise(F.col("text")))
    # ONE corpus pass: changed rows fan out to (doc_id, doc_id+10000)
    # via explode instead of a union of two selects of v2_changed —
    # the union's second branch re-ran the scan + replace + md5 over
    # the whole corpus (r13 optimization round, A/B min 0.51 → 0.41 s,
    # rows identical)
    v2 = v2_changed.select(
        F.explode(
            F.when(F.col("doc_id") % 25 == 0,
                   F.array(F.col("doc_id"), F.col("doc_id") + 10000))
            .otherwise(F.array(F.col("doc_id")))).alias("doc_id"),
        "text", "source", F.md5(F.col("text")).alias("h2"),
    )
    changed = (
        v2.join(v1, "doc_id", "left")
        .filter(F.col("h1").isNull() | (F.col("h1") != F.col("h2")))
        .select("doc_id", "text", "source"))
    return (
        changed.select(
            "doc_id", "source",
            F.split(F.expr(
                "regexp_replace(lower(text), '\\\\s+', ' ')"), " ")
            .alias("_w"))
        .select(
            "doc_id", "source",
            F.explode(F.expr(f"sequence(0, size(_w) - 1, {stride})"))
            .alias("start_tok"))
        .groupBy("source")
        .agg(F.countDistinct("doc_id").cast("long")
             .alias("n_docs_refreshed"),
             F.count("*").cast("long").alias("n_chunks_refreshed"))
    )


SQL_CORPUS_CHUNK_REFRESH = f"""
WITH v1 AS (
  SELECT doc_id, md5(text) AS h1 FROM documents WHERE doc_id % 41 <> 0
),
v2base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 25 = 0
              THEN replace(text, ' the ', ' thy ') ELSE text END AS text,
         source
  FROM documents
),
v2 AS (
  SELECT doc_id, text, source, md5(text) AS h2 FROM v2base
  UNION ALL
  SELECT doc_id + 10000, text, source, md5(text) FROM v2base
  WHERE doc_id % 25 = 0
),
changed AS (
  SELECT v2.doc_id, v2.text, v2.source
  FROM v2 LEFT JOIN v1 ON v2.doc_id = v1.doc_id
  WHERE v1.h1 IS NULL OR v1.h1 <> v2.h2
),
counted AS (
  SELECT source, doc_id,
         (len(string_split({D_NORM}, ' ')) - 1) // 24 + 1 AS n_chunks
  FROM changed
)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_refreshed,
       CAST(sum(n_chunks) AS BIGINT) AS n_chunks_refreshed
FROM counted GROUP BY source
"""


def q_text_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-rule cascade with per-rule funnel accounting
    (datapipe/filtering.filter_funnel + standard_quality_rules): the
    per-rule drop/survive table a C4/Gopher-style curation pipeline
    publishes next to its corpus.  Cascade semantics: each doc is
    charged to the FIRST rule it violates.  Plan: one narrow pass over
    the scan computes every metric (token-array ops, no explode, no
    join), one ≤10-key groupBy, one ≤10-row window."""
    from sequin_spark.datapipe.filtering import (filter_funnel,
                                                 standard_quality_rules)

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    annotated, rules = standard_quality_rules(docs)
    return filter_funnel(annotated, rules)


def _sql_quality_ff_ctes(extra_cols: str = "") -> str:
    """The shared t/m/m2/ff CTE chain: normalized text → metric columns
    → first-violation index, with the SAME thresholds as
    standard_quality_rules — one builder feeds both the funnel oracle
    and the report-card oracle, so the rule constants cannot drift
    between them.  ``extra_cols`` (e.g. ", source") rides through every
    stage."""
    return f"""
t AS (
  SELECT doc_id{extra_cols}, {D_NORM} AS nt FROM documents
),
m AS (
  SELECT doc_id{extra_cols}, nt, string_split(nt, ' ') AS w,
         length(nt) AS n_chars
  FROM t
),
m2 AS (
  SELECT doc_id{extra_cols}, nt, w, n_chars, len(w) AS n_tokens,
         len(regexp_extract_all(nt, '[0-9]')) AS n_digits,
         len(regexp_extract_all(nt, '\\b(the|a|of|and|in|to)\\b'))
           AS stop_hits,
         CASE WHEN len(w) > 0
              THEN round(1.0 - len(list_distinct(w)) * 1.0 / len(w), 6)
              ELSE 0.0 END AS dup_word_frac,
         CASE WHEN len(w) >= 2
              THEN round(1.0 - len(list_distinct(list_transform(
                       generate_series(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i + 1]))) * 1.0
                       / (len(w) - 1), 6)
              ELSE 0.0 END AS dup_2gram_frac,
         (n_chars - (len(w) - 1)) * 1.0 / len(w) AS avg_token_len
  FROM m
),
ff AS (
  SELECT doc_id{extra_cols}, nt, w, CASE
    WHEN n_tokens < 16 THEN 0
    WHEN n_tokens > 2000 THEN 1
    WHEN avg_token_len < 3 OR avg_token_len > 10 THEN 2
    WHEN n_digits * 1.0 / n_chars > 0.15 THEN 3
    WHEN stop_hits < 2 THEN 4
    WHEN dup_word_frac > 0.6 THEN 5
    WHEN dup_2gram_frac > 0.35 THEN 6
    WHEN contains(nt, '{{') THEN 7
    WHEN contains(nt, 'lorem ipsum') THEN 8
    ELSE 9 END AS ffi
  FROM m2
)"""


SQL_TEXT_FILTER_FUNNEL = f"""
WITH {_sql_quality_ff_ctes()},
rules(rule_idx, rule) AS (VALUES
  (0, 'too_short'), (1, 'too_long'), (2, 'avg_token_len_oob'),
  (3, 'digit_heavy'), (4, 'low_stopword'), (5, 'dup_words'),
  (6, 'dup_2grams'), (7, 'curly_brace'), (8, 'lorem_ipsum'),
  (9, '(kept)')),
drops AS (SELECT ffi, count(*) AS n FROM ff GROUP BY ffi),
j AS (
  SELECT r.rule_idx, r.rule, coalesce(d.n, 0) AS hit
  FROM rules r LEFT JOIN drops d ON r.rule_idx = d.ffi
),
f AS (
  SELECT rule_idx, rule,
         CAST(sum(hit) OVER ()
              - coalesce(sum(hit) OVER (ORDER BY rule_idx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_reached,
         CAST(CASE WHEN rule = '(kept)' THEN 0 ELSE hit END AS BIGINT)
           AS n_dropped
  FROM j
)
SELECT rule_idx, rule, n_reached, n_dropped,
       CAST(n_reached - n_dropped AS BIGINT) AS n_survived
FROM f
"""


def q_corpus_report_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source curation REPORT CARD — the end-of-run summary a
    training-data pipeline publishes: quality funnel → exact dedup
    (among survivors, min-id keeper) → content-hash split assignment,
    composed in ONE relational plan.  Per source: docs in, quality
    drops (first-violation semantics via filtering.first_violation —
    the same column the funnel charges), duplicate drops, train/val/
    test sizes of the final corpus, and final token count.  Plan: one
    narrow metric pass, one fingerprint-window shuffle (dedup keeper +
    leakage-proof split both derive from the SAME content hash), one
    per-source fold — 2 shuffles end to end at any scale."""
    from pyspark.sql import Window

    from sequin_spark.datapipe.filtering import (first_violation,
                                                 standard_quality_rules)

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source")
    annotated, rules = standard_quality_rules(docs, keep_cols=("source",))
    kept_idx = len(rules)
    staged = annotated.select(
        "doc_id", "source",
        (first_violation(rules) == kept_idx).alias("quality_pass"),
        F.md5("_nt").alias("fp"),
        F.size("_w").alias("n_toks"))
    w = Window.partitionBy("fp")
    keeper = F.min(F.when(F.col("quality_pass"), F.col("doc_id"))).over(w)
    bucket = (F.conv(F.substring(F.md5("fp"), 1, 4), 16, 10)
              .cast("long") % 100)
    split = (F.when(bucket < 80, "train")
             .when(bucket < 90, "val").otherwise("test"))
    s = (staged
         .withColumn("dedup_keep",
                     F.col("quality_pass") & (F.col("doc_id") == keeper))
         .withColumn("split", F.when(F.col("dedup_keep"), split)))
    return (s.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(~F.col("quality_pass"), 1).otherwise(0))
        .cast("long").alias("n_quality_dropped"),
        F.sum(F.when(F.col("quality_pass") & ~F.col("dedup_keep"), 1)
              .otherwise(0)).cast("long").alias("n_dup_dropped"),
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("long").alias("n_train"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0))
        .cast("long").alias("n_val"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
        .cast("long").alias("n_test"),
        F.sum(F.when(F.col("dedup_keep"), F.col("n_toks")).otherwise(0))
        .cast("long").alias("n_tokens_final")))


def _sql_report_card() -> str:
    h16_fp = _sql_h16_of("fp")
    return f"""
WITH {_sql_quality_ff_ctes(", source")},
staged AS (
  SELECT doc_id, source, (ffi = 9) AS quality_pass, md5(nt) AS fp,
         len(w) AS n_toks
  FROM ff
),
k AS (
  SELECT *, min(CASE WHEN quality_pass THEN doc_id END)
              OVER (PARTITION BY fp) AS keeper
  FROM staged
),
s AS (
  SELECT *, quality_pass AND doc_id = keeper AS dedup_keep,
         CASE WHEN quality_pass AND doc_id = keeper THEN
           CASE WHEN ({h16_fp}) % 100 < 80 THEN 'train'
                WHEN ({h16_fp}) % 100 < 90 THEN 'val'
                ELSE 'test' END
         END AS split
  FROM k
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN NOT quality_pass THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quality_dropped,
       CAST(sum(CASE WHEN quality_pass AND NOT dedup_keep THEN 1 ELSE 0
                END) AS BIGINT) AS n_dup_dropped,
       CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_train,
       CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_val,
       CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_test,
       CAST(sum(CASE WHEN dedup_keep THEN n_toks ELSE 0 END) AS BIGINT)
         AS n_tokens_final
FROM s GROUP BY source
"""


def q_multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup (datapipe/multimodal.dhash_media +
    phash_near_dup_pairs): 63-bit dHash per blob via Arrow-batched
    mapInPandas (pixel decoder gated — the grid is a deterministic
    strided byte sample standing in for the 9×8 grayscale downsample),
    then pigeonhole-banded Hamming ≤ 6 pairs (7 bands ⇒ exact recall,
    candidates from band-bucket collisions only, never all-pairs).
    Near-dups planted: every 25th doc re-encoded with one byte changed
    (same length ⇒ same stride ⇒ at most a few difference bits flip)."""
    from sequin_spark.datapipe.multimodal import (attach_media, dhash_media,
                                                  phash_near_dup_pairs)

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    perturbed = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 30000).alias("doc_id"),
        F.concat(F.substring("text", 1, 10), F.lit("#"),
                 F.expr("substring(text, 12)")).alias("text"))
    media = attach_media(docs.unionByName(perturbed), "text",
                         media_type="image")
    return phash_near_dup_pairs(dhash_media(media), max_hamming=6)


SQL_MULTIMODAL_PHASH_DEDUP = """
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 30000,
         substr(text, 1, 10) || '#' || substr(text, 12)
  FROM documents WHERE doc_id % 25 = 0
),
g AS (
  SELECT doc_id,
         list_transform(generate_series(0, 71),
           k -> ascii(substr(text,
                CAST((k * greatest(1, length(text) // 72)) % length(text)
                     AS INTEGER) + 1, 1)))
           AS cells
  FROM docs2 WHERE length(text) > 0
),
h AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(generate_series(0, 62),
           i -> CASE WHEN cells[(i // 8) * 9 + (i % 8) + 2]
                          > cells[(i // 8) * 9 + (i % 8) + 1]
                     THEN CAST(1 AS BIGINT) << i ELSE 0 END))
              AS BIGINT) AS dhash
  FROM g
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
"""


def q_text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF keywords (smooth-idf; the keyword /
    topic-tagging primitive; datapipe/selection.tfidf_topk).  Ranking
    uses the rounded score + lexicographic tiebreak so the top-k cut
    is engine-exact."""
    from sequin_spark.datapipe.selection import tfidf_topk

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_topk(docs, k=3, min_len=3)


def _sql_tfidf_keywords(k: int = 3, min_len: int = 3) -> str:
    return f"""
WITH pairs AS (
  SELECT doc_id, w AS token, CAST(count(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, unnest(string_split({D_NORM}, ' ')) AS w
        FROM documents)
  WHERE length(w) >= {min_len}
  GROUP BY doc_id, w
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
dfreq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df_t
          FROM pairs GROUP BY token),
scored AS (
  SELECT p.doc_id, p.token,
         round((p.tf / sum(p.tf) OVER (PARTITION BY p.doc_id))
               * (ln((1 + (SELECT n_docs FROM n)) / (1 + d.df_t)) + 1),
               4) AS tfidf
  FROM pairs p JOIN dfreq d USING (token)
)
SELECT doc_id, token, tfidf, CAST(rk AS INTEGER) AS rk FROM (
  SELECT scored.*,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, token ASC) AS rk
  FROM scored) WHERE rk <= {k}
"""


def q_select_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training triplet mining (datapipe/similarity.
    hard_negative_mining): per anchor, top-3 hardest cross-label
    negatives by cosine + margin vs the hardest same-label positive.
    Exact mining is the all-pairs eval baseline (allow-listed like
    ann_topk_bruteforce); the scale path mines within IVF/LSH
    candidate sets."""
    from sequin_spark.datapipe.similarity import hard_negative_mining

    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 10)
    return hard_negative_mining(emb, anchors, k=3)


_SQL_COS_QN = """list_sum(list_transform(generate_series(1, len(q.embedding)),
                  i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(generate_series(1, len(q.embedding)),
                  i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
          * sqrt(list_sum(list_transform(generate_series(1, len(n.embedding)),
                  i -> CAST(n.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)))))"""

SQL_SELECT_HARD_NEGATIVES = f"""
WITH c AS (
  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         q.label AS q_label, n.label AS n_label,
         {_SQL_COS_QN} AS cos
  FROM embeddings q, embeddings n
  WHERE q.vec_id < 10 AND q.vec_id != n.vec_id
),
pos AS (SELECT q_id, max(cos) AS pos_cos FROM c
        WHERE q_label = n_label GROUP BY q_id),
negs AS (SELECT q_id, n_id, cos,
                row_number() OVER (PARTITION BY q_id
                                   ORDER BY cos DESC, n_id ASC) AS rnk
         FROM c WHERE q_label != n_label)
SELECT negs.q_id, n_id, rnk, round(cos, 3) AS neg_cos,
       round(pos_cos - cos, 3) AS margin
FROM negs LEFT JOIN pos USING (q_id)
WHERE rnk <= 3
"""


def q_privacy_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP-mechanism (source, lang) doc-count histogram via the
    truncated discrete-Laplace mechanism with a keyed-PRF draw per
    cell (datapipe/privacy.py).  **Replayable pseudo-DP**: with the
    checked-in default salt the noise is reconstructible from source,
    so this output is for pipeline testing/shape validation — a real
    release needs a caller-supplied secret salt, and is then
    (eps, delta)-DP with delta ≈ the truncated tail mass (see the
    privacy.py module docstring).  One group-keyed shuffle; noise is
    a narrow array-lambda scan over 81 literal CDF thresholds —
    engine-exact, no RNG state."""
    from sequin_spark.datapipe.privacy import dp_count_histogram

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return dp_count_histogram(docs, ["source", "lang"])


def _sql_privacy_dp_histogram() -> str:
    from sequin_spark.datapipe.privacy import sql_dp_count_histogram

    return sql_dp_count_histogram("documents", ["source", "lang"], _sql_h60_of)


def q_privacy_kanon_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity re-identification risk audit over the
    quasi-identifier (source, lang): equivalence-class size per cell,
    the class-size band it falls in, and the share of ALL docs exposed
    in classes below k=5 — the release-gating audit that pairs with
    the DP suppression threshold.  One QI-keyed count shuffle + a
    bounded per-band rollup."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    classes = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("class_size"))
    band = (F.when(F.col("class_size") < 2, "unique")
            .when(F.col("class_size") < 5, "small_2_4")
            .when(F.col("class_size") < 20, "mid_5_19")
            .otherwise("large_20_plus"))
    from pyspark.sql import Window

    total = F.sum("n_docs").over(
        Window.partitionBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing))
    return (
        classes.withColumn("band", band)
        .groupBy("band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_classes"),
             F.sum("class_size").cast("long").alias("n_docs"))
        .withColumn("share_of_docs",
                    F.round(F.col("n_docs") / total, 4))
        .select("band", "n_classes", "n_docs", "share_of_docs")
    )


def _sql_privacy_kanon_risk() -> str:
    return """
WITH classes AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS class_size
  FROM documents GROUP BY source, lang),
banded AS (
  SELECT CASE WHEN class_size < 2 THEN 'unique'
              WHEN class_size < 5 THEN 'small_2_4'
              WHEN class_size < 20 THEN 'mid_5_19'
              ELSE 'large_20_plus' END AS band,
         class_size
  FROM classes),
agg AS (
  SELECT band, CAST(count(*) AS BIGINT) AS n_classes,
         CAST(sum(class_size) AS BIGINT) AS n_docs
  FROM banded GROUP BY band)
SELECT band, n_classes, n_docs,
       round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (), 4)
         AS share_of_docs
FROM agg
"""


def q_corpus_shard_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard load-balance audit over the deterministic shard
    assignment (q_corpus_shard_assign's Knuth hash): per-shard doc and
    byte totals plus each shard's deviation from the mean byte load —
    the check a dataloader team runs before shipping shards (one
    hot shard = one slow epoch).  Deviation is integer-exact:
    dev_pct_x100 = (bytes*10000) div total - 10000/N-style integer
    arithmetic avoided by publishing byte share in basis points."""
    _prep(spark)
    n_shards = 8
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    h = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296)).cast("long")
    per = (
        docs.withColumn("shard", F.pmod(h, F.lit(n_shards)).cast("int"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.sum("n_chars").cast("long").alias("n_bytes"))
    )
    from pyspark.sql import Window

    tot = F.sum("n_bytes").over(
        Window.partitionBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing))
    return per.select(
        "shard", "n_docs", "n_bytes",
        F.expr(f"(n_bytes * 10000) div (sum(n_bytes) OVER ())")
        .cast("long").alias("share_bp"),
    ).orderBy("shard")


def _sql_corpus_shard_skew(n_shards: int = 8) -> str:
    return f"""
WITH per AS (
  SELECT CAST((doc_id * 2654435761) % 4294967296 % {n_shards} AS INTEGER)
           AS shard,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS n_bytes
  FROM documents
  GROUP BY 1)
SELECT shard, n_docs, n_bytes,
       CAST(n_bytes * 10000 // (SELECT sum(n_bytes) FROM per) AS BIGINT)
         AS share_bp
FROM per ORDER BY shard
"""


def q_eval_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labeler-QA confusion matrix: the n-gram langid classifier's
    predictions against the gold `lang` column — per (gold, predicted)
    cell count and per-gold-language accuracy (the drift monitor a
    production labeling pipeline runs on every classifier release).
    One narrow classify scan + a bounded (|langs|²) group-by."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    pred = langid(docs).select("doc_id", "predicted_lang")
    joined = docs.select("doc_id", F.col("lang").alias("gold")).join(
        pred, "doc_id")
    cells = joined.groupBy("gold", "predicted_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    from pyspark.sql import Window

    tot = F.sum("n").over(Window.partitionBy("gold"))
    return cells.select(
        "gold", "predicted_lang", "n",
        F.round(F.col("n") / tot, 4).alias("share_of_gold"),
        (F.col("gold") == F.col("predicted_lang")).alias("is_correct"),
    )


def _sql_eval_langid_confusion() -> str:
    return f"""
WITH pred AS ({_sql_langid()}),
joined AS (
  SELECT d.doc_id, d.lang AS gold, p.predicted_lang
  FROM documents d JOIN pred p ON p.doc_id = d.doc_id),
cells AS (
  SELECT gold, predicted_lang, CAST(count(*) AS BIGINT) AS n
  FROM joined GROUP BY gold, predicted_lang)
SELECT gold, predicted_lang, n,
       round(CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY gold), 4) AS share_of_gold,
       gold = predicted_lang AS is_correct
FROM cells
"""


def q_corpus_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption masks (datapipe/curation.
    span_corruption): ~15% of token positions hash-selected,
    consecutive picks coalesced to spans, sentinel ids in document
    order — reproducible denoising-objective data prep, no RNG
    state."""
    from sequin_spark.datapipe.curation import span_corruption

    _prep(spark)
    return span_corruption(load_table(spark, sf_dir, "documents"))


def _sql_span_corruption(rate_pct: int = 15) -> str:
    h = _sql_h60_of("concat_ws('|', doc_id, pos, 'sc1')")
    return f"""
WITH t AS (SELECT doc_id, string_split({D_NORM}, ' ') AS toks FROM documents),
p AS (
  SELECT doc_id, j - 1 AS pos, toks[j] AS tok
  FROM t, unnest(generate_series(1, len(toks))) AS u(j)),
nz AS (SELECT doc_id, pos FROM p WHERE tok <> ''),
flagged AS (
  SELECT doc_id, pos FROM nz WHERE ({h}) % 100 < {rate_pct}),
grp AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS g
  FROM flagged),
spans AS (
  SELECT doc_id, g, CAST(min(pos) AS BIGINT) AS span_start,
         CAST(count(*) AS BIGINT) AS span_len
  FROM grp GROUP BY doc_id, g)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY span_start) - 1
            AS INTEGER) AS mask_id,
       span_start, span_len
FROM spans
"""


def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per doc (datapipe/text.readability):
    sentence/word/vowel-group-syllable counts in one narrow scan, the
    published banding thresholds."""
    from sequin_spark.datapipe.text import readability

    _prep(spark)
    return readability(load_table(spark, sf_dir, "documents"))


SQL_TEXT_READABILITY = f"""
WITH cnt AS (
  SELECT doc_id,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
           AS n_sentences,
         CAST(greatest(len(string_split({D_NORM}, ' ')), 1) AS BIGINT)
           AS n_words,
         CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
              AS BIGINT) AS n_syllables
  FROM documents),
r AS (
  SELECT *,
         greatest(CAST(0 AS BIGINT),
                  CAST(206835 * n_sentences * n_words
                       - 1015 * n_words * n_words
                       - 84600 * n_syllables * n_sentences AS BIGINT)) AS num,
         CAST(1000 * n_sentences * n_words AS BIGINT) AS den
  FROM cnt),
h AS (SELECT *, CAST((200 * num + den) // (2 * den) AS BIGINT) AS hh FROM r)
SELECT doc_id, n_sentences, n_words, n_syllables,
       hh / 100.0 AS flesch,
       CASE WHEN hh >= 6000 THEN 'easy'
            WHEN hh >= 3000 THEN 'medium' ELSE 'hard' END AS band
FROM h
"""


def q_text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc character-distribution Shannon entropy (nats) — the
    gibberish/noise curation signal (datapipe/text.char_entropy)."""
    from sequin_spark.datapipe.text import char_entropy

    _prep(spark)
    return char_entropy(load_table(spark, sf_dir, "documents"))


SQL_TEXT_CHAR_ENTROPY = f"""
WITH chars AS (
  SELECT doc_id, unnest(regexp_extract_all({D_NORM}, '.')) AS ch
  FROM documents),
nosp AS (SELECT doc_id, ch FROM chars WHERE ch <> ' '),
per AS (
  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c FROM nosp
  GROUP BY doc_id, ch),
withn AS (
  SELECT doc_id, ch, c,
         CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n FROM per)
SELECT doc_id, CAST(max(n) AS BIGINT) AS n_chars,
       CAST(count(*) AS BIGINT) AS n_distinct_chars,
       round(-list_reduce(
           list_sort(list((CAST(c AS DOUBLE) / n)
                          * ln(CAST(c AS DOUBLE) / n))),
           (acc, x) -> acc + x), 4)
         AS entropy
FROM withn GROUP BY doc_id
"""


def q_select_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center diversity coreset over the embedding corpus
    (datapipe/similarity.kcenter_coreset, Gonzalez 2-approx): 8
    centers, each round selecting the point farthest from the selected
    set — the active-learning / coreset data-selection primitive.
    Selection sequence is engine-exact (rounded distances + id
    tiebreaks); each round is one bounded 1-row argmax action."""
    from sequin_spark.datapipe.similarity import kcenter_coreset

    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return kcenter_coreset(emb, k=8)


def _sql_select_kcenter() -> str:
    from sequin_spark.datapipe.similarity import sql_kcenter_coreset

    inner = sql_kcenter_coreset(
        "SELECT vec_id AS id, embedding AS v FROM embeddings", k=8)
    return f"""
WITH sel AS ({inner})
SELECT sel_round, id AS vec_id, dist_sel FROM sel
"""


def q_sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS F2 (self-join size / skew moment) sketch over the corpus
    token frequencies (datapipe/sketch.ams_f2): 55 sign estimators
    from one digest, integer median-of-means — the statistic a salting
    heuristic needs before it can size a skew-join.  Exact F2 baseline
    included; the 1-row × 1-row combine is the usual allow-listed
    estimate-vs-baseline NLJ."""
    from sequin_spark.datapipe.sketch import ams_f2

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.expr(
            "regexp_replace(lower(text), '\\\\s+', ' ')"), " ")).alias("w")
    ).filter(F.col("w") != "")
    est = ams_f2(words, "w", groups=5, per_group=11)
    exact = (
        words.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("f"))
        .agg(F.sum(F.col("f") * F.col("f")).cast("long").alias("f2_exact"))
    )
    return est.crossJoin(exact).select(
        "k", "f2_est", "f2_exact",
        F.round((F.col("f2_est") - F.col("f2_exact"))
                / F.col("f2_exact"), 4).alias("rel_err"),
    )


def _sql_sketch_ams_f2() -> str:
    from sequin_spark.datapipe.sketch import sql_ams_f2

    vals = (f"SELECT w FROM (SELECT unnest(string_split({D_NORM}, ' ')) AS w"
            " FROM documents) WHERE w <> ''")
    inner = sql_ams_f2(vals, _sql_h60_of, groups=5, per_group=11)
    return f"""
WITH est AS ({inner}),
exact AS (
  SELECT CAST(sum(f * f) AS BIGINT) AS f2_exact FROM (
    SELECT w, CAST(count(*) AS BIGINT) AS f
    FROM (SELECT unnest(string_split({D_NORM}, ' ')) AS w FROM documents)
    WHERE w <> '' GROUP BY w))
SELECT k, f2_est, f2_exact,
       round(CAST(f2_est - f2_exact AS DOUBLE) / f2_exact, 4) AS rel_err
FROM est, exact
"""


def q_privacy_dp_clamped_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP total-characters release per source with contribution
    bounding (datapipe/privacy.dp_clamped_sum): per-doc n_chars
    clamped to 2000 before the sum (one row moves the release by at
    most the clamp), noise = clamp * discrete-Laplace draw from the
    per-cell keyed PRF.  Replayable pseudo-DP under the default salt —
    see the privacy.py module docstring for the real-release contract."""
    from sequin_spark.datapipe.privacy import dp_clamped_sum

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return dp_clamped_sum(docs, ["source"], "n_chars", clamp=2000)


def _sql_privacy_dp_clamped_sum() -> str:
    from sequin_spark.datapipe.privacy import sql_dp_clamped_sum

    return sql_dp_clamped_sum(
        "documents", ["source"], "n_chars", 2000, _sql_h60_of)


def q_privacy_dp_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP median doc length per source via the exponential mechanism
    (datapipe/privacy.dp_quantile_exponential): candidate = distinct
    n_chars value, utility = -|rank distance to the median|, weight =
    an integer decay fold replacing exp(-eps*d/2) — the whole
    selection trajectory is 64-bit-integer engine-exact, with only the
    keyed-PRF uniform and one IEEE multiply+floor at the end.
    Replayable pseudo-DP under the default salt — see the privacy.py
    module docstring for the real-release contract."""
    from sequin_spark.datapipe.privacy import dp_quantile_exponential

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return dp_quantile_exponential(docs, ["source"], "n_chars")


def _sql_privacy_dp_median() -> str:
    from sequin_spark.datapipe.privacy import sql_dp_quantile_exponential

    return sql_dp_quantile_exponential(
        "documents", ["source"], "n_chars", _sql_h60_of)


# --- Graph centrality (datapipe/graph.py) ---------------------------------


_TRADE_EDGES_CACHE: dict = {}


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation trade graph (supplier nation -> customer nation, weight
    = lineitem count), memoized per (session, sf_dir) and materialized
    with localCheckpoint so PageRank and HITS share ONE star-join
    build — the graph analog of the memoized anisotropy fit."""
    key = (id(spark), os.path.realpath(sf_dir))
    if key in _TRADE_EDGES_CACHE:
        return _TRADE_EDGES_CACHE[key]
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(F.count("*").cast("long").alias("w"))
    ).localCheckpoint()
    _TRADE_EDGES_CACHE[key] = edges
    return edges


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the nation trade graph (supplier
    nation -> customer nation, weight = lineitem count): the
    crawl-frontier / domain-authority centrality primitive, computed
    in pure 64-bit integer arithmetic so the trajectory is engine-exact
    (datapipe/graph.py).  Edge build = one shuffle-heavy star join
    (supplier broadcast), memoized and shared with graph_hits; each of
    the 5 iterations shuffles only the 25-row contribution table — at
    100 TB the edge table is the big side, partitioned by dst, and
    ranks broadcast."""
    from sequin_spark.datapipe.graph import pagerank_int

    _prep(spark)
    edges = _trade_edges(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    pr = pagerank_int(nodes, edges, iters=5)
    return pr.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("node"), "n_name")),
        "node",
    ).select(
        F.col("node").alias("nationkey"), "n_name", "rank_int", "rank_val"
    )


_SQL_TRADE_EDGES = (
    "SELECT s.s_nationkey AS src, c.c_nationkey AS dst, "
    "CAST(count(*) AS BIGINT) AS w "
    "FROM lineitem l "
    "JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "JOIN customer c ON o.o_custkey = c.c_custkey "
    "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
    "GROUP BY 1, 2"
)


def q_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point HITS hubs & authorities over the nation trade graph
    (datapipe/graph.py:hits_int): exporter-side hub mass vs
    importer-side authority mass — the link-spam / mutual-reinforcement
    companion to PageRank, on the same shared memoized edge table and
    the same engine-exact integer grid (divisor-form max
    normalization)."""
    from sequin_spark.datapipe.graph import hits_int

    _prep(spark)
    edges = _trade_edges(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    ht = hits_int(nodes, edges, iters=4)
    return ht.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("node"), "n_name")),
        "node",
    ).select(
        F.col("node").alias("nationkey"), "n_name",
        "authority_int", "hub_int", "authority", "hub",
    )


def q_privacy_dp_topk_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded DP-mechanism top-k release: noisy per-source doc
    counts, cells below the suppression threshold dropped (the
    k-anonymity-style suppression that real DP releases pair with
    noise), top-10 of the survivors by noisy count.  Rank ties break
    on source so the released ordering is engine-exact.  Unlike the
    audit histogram, the release omits the true counts.  Replayable
    pseudo-DP under the default salt — see privacy.py."""
    from pyspark.sql import Window

    from sequin_spark.datapipe.privacy import dp_count_histogram

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    noisy = dp_count_histogram(docs, ["source"], salt="dptk1")
    w = Window.orderBy(F.col("n_dp").desc(), F.col("source").asc())
    return (
        noisy.filter(F.col("n_dp") >= 15)
        .withColumn("released_rank", F.row_number().over(w))
        .filter(F.col("released_rank") <= 10)
        .select("source", "n_dp", F.col("released_rank").cast("int")
                .alias("released_rank"))
    )


def _sql_privacy_dp_topk_release() -> str:
    from sequin_spark.datapipe.privacy import sql_dp_count_histogram

    inner = sql_dp_count_histogram(
        "documents", ["source"], _sql_h60_of, salt="dptk1")
    return f"""
WITH noisy AS ({inner}),
kept AS (
  SELECT source, n_dp,
         row_number() OVER (ORDER BY n_dp DESC, source ASC)
           AS released_rank
  FROM noisy WHERE n_dp >= 15)
SELECT source, n_dp, CAST(released_rank AS INTEGER) AS released_rank
FROM kept WHERE released_rank <= 10
"""


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation triangle count + local clustering coefficient over
    the SPARSIFIED trade graph — edges kept when w >= 5/4 of the mean
    weight (integer comparison w*4*n_edges >= 5*total_w, engine-exact;
    keeps ~30% of edges so the clique structure is non-trivial), the
    spam-farm / link-clique signal (datapipe/graph.py:triangle_stats).
    Oriented wedge join counts each triangle once; the threshold
    scalars are a 1-row collect off the memoized edge table."""
    from sequin_spark.datapipe.graph import triangle_stats

    _prep(spark)
    edges = _trade_edges(spark, sf_dir)
    tot, n_e = edges.agg(
        F.sum("w").cast("long"), F.count(F.lit(1)).cast("long")).collect()[0]
    strong = edges.filter(
        F.col("w") * F.lit(4 * int(n_e)) >= F.lit(5 * int(tot)))
    nation = load_table(spark, sf_dir, "nation")
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    ts = triangle_stats(nodes, strong)
    return ts.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("node"), "n_name")),
        "node",
    ).select(
        F.col("node").alias("nationkey"), "n_name",
        "degree", "triangles", "clustering",
    )


def _sql_graph_triangles() -> str:
    from sequin_spark.datapipe.graph import sql_triangle_stats

    strong = (
        f"WITH te AS ({_SQL_TRADE_EDGES}) "
        "SELECT src, dst, w FROM te "
        "WHERE w * 4 * (SELECT count(*) FROM te) "
        ">= 5 * (SELECT CAST(sum(w) AS BIGINT) FROM te)"
    )
    inner = sql_triangle_stats(
        edges_cte=strong,
        nodes_cte="SELECT n_nationkey AS node FROM nation",
    )
    return f"""
WITH ts AS ({inner})
SELECT ts.node AS nationkey, n.n_name, ts.degree, ts.triangles,
       ts.clustering
FROM ts JOIN nation n ON n.n_nationkey = ts.node
"""


def _sql_graph_hits() -> str:
    from sequin_spark.datapipe.graph import sql_hits_int

    inner = sql_hits_int(
        edges_cte=_SQL_TRADE_EDGES,
        nodes_cte="SELECT n_nationkey AS node FROM nation",
        iters=4,
    )
    return f"""
WITH ht AS ({inner})
SELECT ht.node AS nationkey, n.n_name, ht.authority_int, ht.hub_int,
       ht.authority, ht.hub
FROM ht JOIN nation n ON n.n_nationkey = ht.node
"""


def _sql_graph_pagerank() -> str:
    from sequin_spark.datapipe.graph import sql_pagerank_int

    inner = sql_pagerank_int(
        edges_cte=_SQL_TRADE_EDGES,
        nodes_cte="SELECT n_nationkey AS node FROM nation",
        iters=5,
    )
    return f"""
WITH pr AS ({inner})
SELECT pr.node AS nationkey, n.n_name, pr.rank_int, pr.rank_val
FROM pr JOIN nation n ON n.n_nationkey = pr.node
"""


DATAPIPE_QUERIES = {
    "embed_top_component": q_embed_top_component,
    "embed_debias_isotropy": q_embed_debias_isotropy,
    "corpus_zipf_ttr": q_corpus_zipf_ttr,
    "sketch_vocab_overlap": q_sketch_vocab_overlap,
    "sketch_hll_setops": q_sketch_hll_setops,
    "embed_int8_quantize": q_embed_int8_quantize,
    "sample_reservoir": q_sample_reservoir,
    "sample_stratified_k": q_sample_stratified_k,
    "length_quantiles": q_length_quantiles,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_cluster_components": q_dedup_cluster_components,
    "dedup_quality_keeper": q_dedup_quality_keeper,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_ngram_containment": q_dedup_ngram_containment,
    "dedup_incremental": q_dedup_incremental,
    "embed_neardup_cosine": q_embed_neardup_cosine,
    "semdedup": q_semdedup,
    "ann_topk_bruteforce": q_ann_topk_bruteforce,
    "ann_lsh_buckets": q_ann_lsh_buckets,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "text_langid": q_text_langid,
    "text_quality": q_text_quality,
    "text_tokens": q_text_tokens,
    "text_fingerprint": q_text_fingerprint,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_phash_dedup": q_multimodal_phash_dedup,
    "skew_salted_agg": q_skew_salted_agg,
    "corpus_curation": q_corpus_curation,
    "corpus_sample_mix": q_corpus_sample_mix,
    "corpus_temperature_mix": q_corpus_temperature_mix,
    "corpus_unimax": q_corpus_unimax,
    "ann_recall_eval": q_ann_recall_eval,
    "embed_matryoshka_recall": q_embed_matryoshka_recall,
    "quality_perplexity_buckets": q_quality_perplexity_buckets,
    "url_domain_caps": q_url_domain_caps,
    "corpus_shard_overlap": q_corpus_shard_overlap,
    "corpus_pack_sequences": q_corpus_pack_sequences,
    "corpus_chunk_windows": q_corpus_chunk_windows,
    "corpus_chunk_refresh": q_corpus_chunk_refresh,
    "corpus_decontaminate": q_corpus_decontaminate,
    "decontaminate_semantic": q_decontaminate_semantic,
    "text_pii_scrub": q_text_pii_scrub,
    "text_filter_funnel": q_text_filter_funnel,
    "corpus_report_card": q_corpus_report_card,
    "quality_repetition": q_quality_repetition,
    "url_dedup": q_url_dedup,
    "corpus_line_dedup": q_corpus_line_dedup,
    "quality_ngram_lm": q_quality_ngram_lm,
    "ann_pq_adc": q_ann_pq_adc,
    "corpus_shard_assign": q_corpus_shard_assign,
    "corpus_epoch_shuffle": q_corpus_epoch_shuffle,
    "corpus_takedown_sweep": q_corpus_takedown_sweep,
    "corpus_diff_versions": q_corpus_diff_versions,
    "embed_outliers": q_embed_outliers,
    "corpus_stats_profile": q_corpus_stats_profile,
    "ann_ivfpq_topk": q_ann_ivfpq_topk,
    "select_bm25": q_select_bm25,
    "select_dsir": q_select_dsir,
    "dedup_repeated_spans": q_dedup_repeated_spans,
    "corpus_split_leakage": q_corpus_split_leakage,
    "corpus_split_assign": q_corpus_split_assign,
    "tokenizer_fertility": q_tokenizer_fertility,
    "tokenizer_unigram": q_tokenizer_unigram,
    "tokenizer_bpe_merges": q_bpe_merges,
    "sketch_kmv_distinct": q_sketch_kmv_distinct,
    "sketch_hll_distinct": q_sketch_hll_distinct,
    "sketch_sample_quantiles": q_sketch_sample_quantiles,
    "sketch_hll_per_key": q_sketch_hll_per_key,
    "sketch_quantiles_per_key": q_sketch_quantiles_per_key,
    "sketch_bloom_probe": q_sketch_bloom_probe,
    "sketch_cm_heavy_hitters": q_sketch_cm_heavy_hitters,
    "quality_classifier": q_quality_classifier,
    "graph_pagerank": q_graph_pagerank,
    "text_tfidf_keywords": q_text_tfidf_keywords,
    "privacy_dp_histogram": q_privacy_dp_histogram,
    "select_hard_negatives": q_select_hard_negatives,
    "graph_hits": q_graph_hits,
    "privacy_dp_clamped_sum": q_privacy_dp_clamped_sum,
    "privacy_dp_median": q_privacy_dp_median,
    "graph_triangles": q_graph_triangles,
    "sketch_ams_f2": q_sketch_ams_f2,
    "select_kcenter_coreset": q_select_kcenter_coreset,
    "privacy_dp_topk_release": q_privacy_dp_topk_release,
    "text_readability": q_text_readability,
    "text_char_entropy": q_text_char_entropy,
    "corpus_span_corruption": q_corpus_span_corruption,
    "eval_langid_confusion": q_eval_langid_confusion,
    "privacy_kanon_risk": q_privacy_kanon_risk,
    "corpus_shard_skew_audit": q_corpus_shard_skew_audit,
}

DATAPIPE_ORACLES = {
    "embed_top_component": _sql_embed_top_component(),
    "embed_debias_isotropy": _sql_embed_debias(),
    "corpus_zipf_ttr": SQL_CORPUS_ZIPF_TTR,
    "sketch_vocab_overlap": _sql_sketch_vocab_overlap(),
    "sketch_hll_setops": _sql_sketch_hll_setops(),
    "embed_int8_quantize": SQL_EMBED_INT8_QUANTIZE,
    "sample_reservoir": _sql_sample_reservoir(),
    "sample_stratified_k": _sql_sample_stratified_k(),
    "length_quantiles": SQL_LENGTH_QUANTILES,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_minhash_lsh": _sql_minhash(),
    "dedup_cluster_components": _sql_cluster_components(),
    "dedup_quality_keeper": _sql_quality_keeper(),
    "dedup_simhash": _sql_simhash(),
    "dedup_simhash_pairs": _sql_simhash_pairs(),
    "dedup_ngram_jaccard": _sql_ngram_jaccard(),
    "dedup_ngram_containment": _sql_ngram_containment(),
    "dedup_incremental": _sql_dedup_incremental(),
    "embed_neardup_cosine": _sql_embed_neardup_cosine(),
    "semdedup": _sql_semdedup(k_cent=16),
    "ann_topk_bruteforce": SQL_ANN_TOPK_BRUTEFORCE,
    "ann_lsh_buckets": _sql_ann_lsh_buckets(),
    "ann_lsh_topk": _sql_ann_lsh_topk(),
    "ann_ivf_topk": _sql_ann_ivf_det(),
    "text_langid": _sql_langid(),
    "text_quality": SQL_TEXT_QUALITY,
    "text_tokens": SQL_TEXT_TOKENS,
    "text_fingerprint": SQL_TEXT_FINGERPRINT,
    "multimodal_decode": SQL_MULTIMODAL_DECODE,
    "multimodal_frame_sample": SQL_MULTIMODAL_FRAME_SAMPLE,
    "multimodal_phash_dedup": SQL_MULTIMODAL_PHASH_DEDUP,
    "skew_salted_agg": SQL_SKEW_SALTED_AGG,
    "corpus_curation": SQL_CORPUS_CURATION,
    "corpus_sample_mix": _sql_corpus_sample_mix(),
    "corpus_temperature_mix": _sql_corpus_temperature_mix(),
    "corpus_unimax": _sql_corpus_unimax(),
    "ann_recall_eval": _sql_ann_recall_eval(),
    "embed_matryoshka_recall": _sql_matryoshka(),
    "quality_perplexity_buckets": _sql_quality_perplexity_buckets(),
    "url_domain_caps": _sql_url_domain_caps(),
    "corpus_shard_overlap": _sql_corpus_shard_overlap(),
    "corpus_pack_sequences": SQL_CORPUS_PACK_SEQUENCES,
    "corpus_chunk_windows": SQL_CORPUS_CHUNK_WINDOWS,
    "corpus_chunk_refresh": SQL_CORPUS_CHUNK_REFRESH,
    "corpus_decontaminate": _sql_corpus_decontaminate(),
    "decontaminate_semantic": _sql_decontaminate_semantic(),
    "text_pii_scrub": _sql_text_pii_scrub(),
    "text_filter_funnel": SQL_TEXT_FILTER_FUNNEL,
    "corpus_report_card": _sql_report_card(),
    "quality_repetition": _sql_quality_repetition(),
    "url_dedup": _sql_url_dedup(),
    "corpus_line_dedup": _sql_corpus_line_dedup(),
    "quality_ngram_lm": _sql_quality_ngram_lm(),
    "ann_pq_adc": _sql_pq_adc(),
    "corpus_shard_assign": SQL_CORPUS_SHARD_ASSIGN,
    "corpus_epoch_shuffle": SQL_CORPUS_EPOCH_SHUFFLE,
    "corpus_takedown_sweep": SQL_CORPUS_TAKEDOWN_SWEEP,
    "corpus_diff_versions": SQL_CORPUS_DIFF_VERSIONS,
    "embed_outliers": _sql_embed_outliers(),
    "corpus_stats_profile": SQL_CORPUS_STATS_PROFILE,
    "ann_ivfpq_topk": _sql_ivfpq(),
    "select_bm25": _sql_select_bm25(),
    "select_dsir": _sql_select_dsir(),
    "dedup_repeated_spans": _sql_dedup_repeated_spans(),
    "corpus_split_leakage": _sql_corpus_split_leakage(),
    "corpus_split_assign": _sql_corpus_split_assign(),
    "tokenizer_fertility": _sql_tokenizer_fertility(),
    "tokenizer_unigram": _sql_unigram_fertility(),
    "tokenizer_bpe_merges": _sql_bpe_merges(),
    "sketch_kmv_distinct": _sql_sketch_kmv(),
    "sketch_hll_distinct": _sql_sketch_hll(),
    "sketch_sample_quantiles": _sql_sample_quantiles(),
    "sketch_hll_per_key": _sql_hll_per_key(),
    "sketch_quantiles_per_key": _sql_quantiles_per_key(),
    "sketch_bloom_probe": _sql_bloom_probe(),
    "sketch_cm_heavy_hitters": _sql_sketch_cm(),
    "quality_classifier": _sql_quality_classifier(),
    "graph_pagerank": _sql_graph_pagerank(),
    "text_tfidf_keywords": _sql_tfidf_keywords(),
    "privacy_dp_histogram": _sql_privacy_dp_histogram(),
    "select_hard_negatives": SQL_SELECT_HARD_NEGATIVES,
    "graph_hits": _sql_graph_hits(),
    "privacy_dp_clamped_sum": _sql_privacy_dp_clamped_sum(),
    "privacy_dp_median": _sql_privacy_dp_median(),
    "graph_triangles": _sql_graph_triangles(),
    "sketch_ams_f2": _sql_sketch_ams_f2(),
    "select_kcenter_coreset": _sql_select_kcenter(),
    "privacy_dp_topk_release": _sql_privacy_dp_topk_release(),
    "text_readability": SQL_TEXT_READABILITY,
    "text_char_entropy": SQL_TEXT_CHAR_ENTROPY,
    "corpus_span_corruption": _sql_span_corruption(),
    "eval_langid_confusion": _sql_eval_langid_confusion(),
    "privacy_kanon_risk": _sql_privacy_kanon_risk(),
    "corpus_shard_skew_audit": _sql_corpus_shard_skew(),
}


# --- Round-9 additions: degree audit, local-DP, RHO-loss selection, ---
# --- curriculum ordering, watermark late-data accounting -------------


def q_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation degree/strength audit of the trade graph
    (datapipe/graph.degree_stats): out/in edge counts, out/in lineitem
    weight, and the weight balance — the structural first look that
    precedes any centrality run (hubs, sinks, isolated nodes), on the
    same memoized edge table PageRank/HITS share."""
    from sequin_spark.datapipe.graph import degree_stats

    _prep(spark)
    edges = _trade_edges(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    return degree_stats(nodes, edges).join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("node"),
                                  "n_name")), "node",
    ).select(F.col("node").alias("nationkey"), "n_name",
             "out_deg", "in_deg", "out_w", "in_w", "w_balance")


def _sql_graph_degree_stats() -> str:
    from sequin_spark.datapipe.graph import sql_degree_stats

    inner = sql_degree_stats(
        edges_cte=_SQL_TRADE_EDGES,
        nodes_cte="SELECT n_nationkey AS node FROM nation")
    return f"""
WITH ds AS ({inner})
SELECT ds.node AS nationkey, n.n_name,
       ds.out_deg, ds.in_deg, ds.out_w, ds.in_w, ds.w_balance
FROM ds JOIN nation n ON n.n_nationkey = ds.node
"""


def q_privacy_ldp_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL-DP source-frequency estimation via k-ary randomized
    response (datapipe/privacy.ldp_frequency) — the no-trusted-curator
    model (RAPPOR-style): each doc perturbs its own source label with
    p=3/4 keep probability before aggregation; the collector unbiases
    the observed histogram.  Replayable pseudo-DP under the default
    salt (privacy.py module docstring).  One k-row broadcast category
    map + a narrow per-row keyed-PRF branch + one count shuffle."""
    from sequin_spark.datapipe.privacy import ldp_frequency

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return ldp_frequency(docs, "source")


def _sql_privacy_ldp_frequency() -> str:
    from sequin_spark.datapipe.privacy import sql_ldp_frequency

    return sql_ldp_frequency("documents", "source", _sql_h60_of)


def q_select_rho_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RHO-loss-style learnability selection: per-doc EXCESS bigram
    NLL = mean over shared bigrams of (corpus-LM term − curated-LM
    term), where the curated LM is trained only on the src0-src4
    reference slice (the same curated set the NB quality classifier
    uses).  Positive excess = the reference model explains the text
    better than the base corpus statistics — the
    'learnable-and-worth-learning' signal of RHO-1 / DoReMi-style
    data selection, here in closed count form.

    Plan: ONE exploded bigram stream (persisted), one rollup per LM
    (both vocab-bounded, AQE-broadcast), one join back per doc.  Only
    bigrams present in BOTH LMs score (the shared-support contract
    that keeps the difference finite); round-4 on the single
    difference mean (the nll float contract)."""
    from sequin_spark.datapipe import text as _text_mod
    from sequin_spark.datapipe.text import doc_bigrams

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    curated = F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    bg = doc_bigrams(docs.select("doc_id", "text")).persist()
    flags = docs.select("doc_id", curated.alias("is_ref"))
    bgf = bg.join(F.broadcast(flags), "doc_id")
    # r14 (verdict task #5): ONE corpus-scale aggregate on (w1, w2) —
    # the old rollup expanded every bigram row into two grouping sets
    # before the partial agg; the unigram tables derive exactly from
    # the bigram table by a second, vocab-bounded aggregate
    # (c1 = Σ_w2 c2, r1 = Σ_w2 r2 — identical integer counts).
    c2 = bgf.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c2"),
        F.sum(F.col("is_ref").cast("long")).alias("r2"),
    )
    c1 = c2.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.sum("r2").alias("r1"))
    terms = (
        c2.join(c1, "w1")
        .filter((F.col("r2") > 0) & (F.col("r1") > 0))
        .select(
            "w1", "w2",
            (-F.log(F.col("c2") / F.col("c1"))
             + F.log(F.col("r2") / F.col("r1"))).alias("excess_term"),
        )
    )
    # narrow 64-bit hash join key with the in-plan collision guard
    # (text.hash_keyed_terms) instead of the two word strings
    terms_h = _text_mod.hash_keyed_terms(terms, "excess_term")
    # Order-stabilized mean (the char_entropy contract): a plain
    # float AVG accumulates in partition order and can flip a row at
    # a round-4 boundary cross-engine — collect, sort, fold
    # left-to-right so both engines sum the identical float sequence.
    out = (
        bg.select("doc_id",
                  _text_mod._bigram_hash("w1", "w2").alias("_h2"))
        .join(terms_h, "_h2")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_terms"),
             F.array_sort(F.collect_list("excess_term")).alias("_t"))
        .withColumn(
            "excess_nll",
            # + 0.0 normalizes IEEE -0.0 to +0.0 on BOTH engines (the
            # DSIR/PCA sign-of-zero contract; the 3rd instance of this
            # class, caught by the r11 sf0.1 full-audit sweep — a doc
            # whose excess terms sum to a negative-signed zero)
            F.round(F.aggregate("_t", F.lit(0.0), lambda a, x: a + x)
                    / F.col("n_terms"), 4) + 0.0)
        .select("doc_id", "n_terms", "excess_nll",
                (F.col("excess_nll") > 0).alias("learnable"))
    )
    return out


def _sql_select_rho_loss() -> str:
    return f"""
WITH w AS (SELECT doc_id, string_split({D_NORM}, ' ') AS words
           FROM documents),
bg AS MATERIALIZED (
  SELECT doc_id, words[i] AS w1, words[i + 1] AS w2
  FROM w, LATERAL (SELECT unnest(range(1, len(words)))) AS t(i)
  WHERE len(words) >= 2
),
flags AS (SELECT doc_id,
                 source IN ('src0','src1','src2','src3','src4') AS is_ref
          FROM documents),
bgf AS (SELECT bg.*, f.is_ref FROM bg JOIN flags f USING (doc_id)),
c2 AS (SELECT w1, w2, count(*) AS c2,
              sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS r2
       FROM bgf GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1,
              sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS r1
       FROM bgf GROUP BY 1),
terms AS (
  SELECT c2.w1, c2.w2,
         -ln(CAST(c2.c2 AS DOUBLE) / c1.c1)
         + ln(CAST(c2.r2 AS DOUBLE) / c1.r1) AS excess_term
  FROM c2 JOIN c1 USING (w1)
  WHERE c2.r2 > 0 AND c1.r1 > 0
)
SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       round(list_reduce(list_sort(list(excess_term)),
                         (acc, x) -> acc + x) / count(*), 4) + 0.0
         AS excess_nll,
       round(list_reduce(list_sort(list(excess_term)),
                         (acc, x) -> acc + x) / count(*), 4) > 0
         AS learnable
FROM bg JOIN terms USING (w1, w2)
GROUP BY bg.doc_id
"""


def q_corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curriculum schedule: docs are staged
    easy→medium→hard by length tertile (ntile over (n_chars, doc_id) —
    the standard length-as-difficulty proxy for a first curriculum),
    then hash-shuffled WITHIN each stage (epoch-shuffle's keyed
    permutation, so the order is reproducible with no RNG state).
    Output position is the global dataloader order.  Plan (the
    range-partitioned two-pass the r9 verdict demanded): BOTH global
    orders go through curation.global_row_number — range shuffle +
    bounded per-partition-count collect + within-partition
    row_number — and ntile(3) is derived arithmetically from that
    rank and ONE total count, so no unpartitioned window ever touches
    the corpus-sized table (the old form funneled all of documents
    through a single task)."""
    from sequin_spark.datapipe.curation import global_row_number

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars")
    # pass 1: global length rank; ntile(3) from the rank + total n
    # (ntile semantics: first n%3 buckets take ceil(n/3) rows)
    ranked = global_row_number(docs, ["n_chars", "doc_id"], "_rk")
    n = docs.count()
    q3, r3 = divmod(n, 3)
    ends, acc = [], 0
    for k in range(1, 4):
        acc += q3 + (1 if k <= r3 else 0)
        ends.append(acc)
    stage = (F.when(F.col("_rk") <= ends[0], 0)
             .when(F.col("_rk") <= ends[1], 1).otherwise(2))
    h_order = F.pmod(F.col("doc_id") * F.lit(2654435761),
                     F.lit(4294967296)).cast("long")
    staged = (ranked.withColumn("stage", stage.cast("int"))
              .withColumn("h_order", h_order).drop("_rk"))
    # pass 2: global dataloader position over (stage, hash, id)
    out = global_row_number(
        staged, ["stage", "h_order", "doc_id"], "position")
    return out.select("position", "stage", "doc_id", "n_chars")


SQL_CORPUS_CURRICULUM_ORDER = """
WITH staged AS (
  SELECT doc_id, n_chars,
         CAST(ntile(3) OVER (ORDER BY n_chars, doc_id) - 1 AS INTEGER)
           AS stage,
         (doc_id * 2654435761) % 4294967296 AS h_order
  FROM documents
)
SELECT CAST(row_number() OVER (ORDER BY stage, h_order, doc_id)
            AS BIGINT) AS position,
       stage, doc_id, n_chars
FROM staged
"""


def q_streaming_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data accounting — the batch-relational form of
    Structured Streaming's watermark semantics, runnable as an audit
    over any event log: arrival order = event_id, watermark at each
    arrival = (running max event time over PRIOR arrivals) − 5 min;
    a row is LATE if its event time is behind the watermark and
    DROPPED if behind a 2× allowed-lateness horizon.  The per-hour
    rollup is the number every watermark tuning decision needs (how
    much data a given delay would admit vs drop).  Plan (the
    range-partitioned two-pass the r9 verdict demanded): the running
    prefix-max goes through curation.prefix_max_exclusive —
    range-partition by arrival order, per-partition maxes (bounded
    <=P-row collect), broadcast exclusive boundary running max,
    combine within partitions — so no unpartitioned unbounded window
    touches the event log (the old form was a single-task funnel);
    then one hour-keyed count shuffle.  Integer micros everywhere, so
    comparisons stay engine-exact."""
    from sequin_spark.datapipe.curation import prefix_max_exclusive

    _prep(spark)
    delay_us = 300 * 1_000_000
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros(F.col("ts")).alias("ts_us"))
    ann = (
        prefix_max_exclusive(ev, "event_id", "ts_us", "_pmax")
        .withColumn("wm_us", F.col("_pmax") - F.lit(delay_us))
        .withColumn("is_late", F.coalesce(
            F.col("ts_us") < F.col("wm_us"), F.lit(False)))
        .withColumn("is_dropped", F.coalesce(
            F.col("ts_us") < (F.col("wm_us") - F.lit(delay_us)),
            F.lit(False)))
    )
    hour = (F.floor(F.col("ts_us") / F.lit(3_600_000_000))
            * F.lit(3_600_000_000)).cast("long")
    return (
        ann.groupBy(hour.alias("window_start_us"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_total"),
             F.sum(F.col("is_late").cast("long")).alias("n_late"),
             F.sum(F.col("is_dropped").cast("long")).alias("n_dropped"))
        .select("window_start_us", "n_total", "n_late", "n_dropped")
    )


SQL_STREAMING_LATE_DATA_AUDIT = """
WITH ev AS (
  SELECT event_id, epoch_us(ts) AS ts_us FROM events
),
ann AS (
  SELECT ts_us,
         max(ts_us) OVER (ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) - 300000000 AS wm_us
  FROM ev
)
SELECT CAST(floor(ts_us / 3600000000) * 3600000000 AS BIGINT)
         AS window_start_us,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN wm_us IS NOT NULL AND ts_us < wm_us
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(sum(CASE WHEN wm_us IS NOT NULL
                     AND ts_us < wm_us - 300000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM ann
GROUP BY 1
"""


DATAPIPE_QUERIES.update({
    "graph_degree_stats": q_graph_degree_stats,
    "privacy_ldp_frequency": q_privacy_ldp_frequency,
    "select_rho_loss": q_select_rho_loss,
    "corpus_curriculum_order": q_corpus_curriculum_order,
    "streaming_late_data_audit": q_streaming_late_data_audit,
})

DATAPIPE_ORACLES.update({
    "graph_degree_stats": _sql_graph_degree_stats(),
    "privacy_ldp_frequency": _sql_privacy_ldp_frequency(),
    "select_rho_loss": _sql_select_rho_loss(),
    "corpus_curriculum_order": SQL_CORPUS_CURRICULUM_ORDER,
    "streaming_late_data_audit": SQL_STREAMING_LATE_DATA_AUDIT,
})


def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRENGTH assortativity of the trade graph: Pearson correlation
    of (out-strength of src, in-strength of dst) across edges — do
    heavy exporters ship to heavy importers?  (Newman 2002's r on the
    weighted degree; negative = hub-to-leaf disassortativity.  Raw
    DEGREE assortativity is degenerate here: the nation graph is
    complete at every SF, so unweighted degrees have zero variance —
    strength is the signal.)  Engine-exact by construction: every
    moment (n, Σx, Σy, Σx², Σy², Σxy) is an INTEGER sum over integer
    strengths, and only the final correlation is one float expression
    over those integers, rounded 4 — no float accumulation order
    anywhere.  Plan: the shared degree/strength table joined onto the
    bounded edge list, one 1-row aggregate."""
    from sequin_spark.datapipe.graph import degree_stats

    _prep(spark)
    edges = _trade_edges(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    deg = degree_stats(
        nation.select(F.col("n_nationkey").alias("node")), edges)
    e2 = (
        edges.join(deg.select(F.col("node").alias("src"),
                              F.col("out_w").alias("x")), "src")
        .join(deg.select(F.col("node").alias("dst"),
                         F.col("in_w").alias("y")), "dst")
    )
    m = e2.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    # Moments are integer-exact sums; the COMBINE is in doubles —
    # n_edges*sxx wraps BIGINT silently at sf100 (~2e20) under
    # Spark's non-ANSI long multiply while DuckDB errors, so cast
    # each moment to DOUBLE first (identical IEEE rounding on both
    # engines keeps the cross-engine hash exact).
    ne = m["n_edges"].cast("double")
    sx, sy = m["sx"].cast("double"), m["sy"].cast("double")
    sxx, syy = m["sxx"].cast("double"), m["syy"].cast("double")
    sxy = m["sxy"].cast("double")
    num = ne * sxy - sx * sy
    den = F.sqrt(ne * sxx - sx * sx) * F.sqrt(ne * syy - sy * sy)
    return m.select(
        "n_edges",
        F.round(num / den, 4).alias("r_assortativity"),
    )


SQL_GRAPH_ASSORTATIVITY = None  # filled below (needs _SQL_TRADE_EDGES)


def _sql_graph_assortativity() -> str:
    from sequin_spark.datapipe.graph import sql_degree_stats

    deg = sql_degree_stats(
        edges_cte=_SQL_TRADE_EDGES,
        nodes_cte="SELECT n_nationkey AS node FROM nation")
    return f"""
WITH deg AS MATERIALIZED ({deg}),
edges AS MATERIALIZED ({_SQL_TRADE_EDGES}),
e2 AS (
  SELECT dx.out_w AS x, dy.in_w AS y
  FROM edges e
  JOIN deg dx ON dx.node = e.src
  JOIN deg dy ON dy.node = e.dst
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_edges,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM e2
)
SELECT n_edges,
       round((CAST(n_edges AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n_edges AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n_edges AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
         AS r_assortativity
FROM m
"""


def q_asof_tolerance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH a staleness bound (operators/asof.py
    ``tolerance``, pandas merge_asof semantics): each purchase picks up
    the user's latest click AT MOST 10 minutes old — older matches
    null out (attributing a purchase to an hour-old click is exactly
    the bug tolerance exists to prevent).  Same single
    user-partitioned fill-forward pass as the unbounded as-of; the
    bound is a post-window predicate, no extra shuffle."""
    from sequin_spark.operators.asof import asof_join

    _prep(spark)
    tol_us = 600 * 1_000_000
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"))
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .drop("event_type")
    clicks = ev.filter(F.col("event_type") == "click").drop("event_type")
    out = asof_join(
        purchases, clicks, key_cols=["user_id"], ts_col="ts_us",
        order_col="event_id", right_payload=[], tolerance=tol_us)
    return out.select(
        "event_id", "user_id", "ts_us",
        F.col("event_id_asof").alias("click_id"),
        (F.col("ts_us") - F.col("ts_us_asof")).alias("gap_us"),
        F.col("event_id_asof").isNotNull().alias("matched"),
    )


SQL_ASOF_TOLERANCE_JOIN = """
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
p AS (SELECT event_id, user_id, ts_us FROM ev
      WHERE event_type = 'purchase'),
c AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'click')
SELECT p.event_id, p.user_id, p.ts_us,
       m.click_id, m.gap_us, m.click_id IS NOT NULL AS matched
FROM p LEFT JOIN LATERAL (
  SELECT c.event_id AS click_id, p.ts_us - c.ts_us AS gap_us
  FROM c
  WHERE c.user_id = p.user_id AND c.ts_us <= p.ts_us
    AND p.ts_us - c.ts_us <= 600000000
  ORDER BY c.ts_us DESC, c.event_id DESC LIMIT 1
) m ON TRUE
"""


def q_session_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap distribution per user — the histogram that
    justifies a sessionize gap parameter (the knee between
    within-session and between-session gaps IS the session timeout).
    Integer band edges (10 s / 60 s / 5 min / 30 min / 2 h), integer
    microsecond lag arithmetic — engine-exact.  One user-keyed lag
    window + one bounded band rollup."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros(F.col("ts")).alias("ts_us"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    # integer `div`, NOT float-divide-then-cast: Spark's double->long
    # cast truncates while DuckDB's rounds — the off-by-one that
    # flipped band counts on first run
    gap_us = F.col("ts_us") - F.lag("ts_us").over(w)
    g = (ev.withColumn("gap_us", gap_us)
         .withColumn("gap_s", F.expr("gap_us div 1000000"))
         .filter(F.col("gap_s").isNotNull()))
    gc = F.col("gap_s")
    band = (F.when(gc < 10, "a_lt_10s")
            .when(gc < 60, "b_10s_1m")
            .when(gc < 300, "c_1m_5m")
            .when(gc < 1800, "d_5m_30m")
            .when(gc < 7200, "e_30m_2h")
            .otherwise("f_ge_2h"))
    return (
        g.groupBy(band.alias("band"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_gaps"),
             F.min("gap_s").alias("min_gap_s"),
             F.max("gap_s").alias("max_gap_s"))
    )


SQL_SESSION_GAP_STATS = """
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
),
g AS (
  SELECT CAST((ts_us - lag(ts_us) OVER (PARTITION BY user_id
               ORDER BY ts_us, event_id)) // 1000000 AS BIGINT) AS gap_s
  FROM ev
)
SELECT CASE WHEN gap_s < 10 THEN 'a_lt_10s'
            WHEN gap_s < 60 THEN 'b_10s_1m'
            WHEN gap_s < 300 THEN 'c_1m_5m'
            WHEN gap_s < 1800 THEN 'd_5m_30m'
            WHEN gap_s < 7200 THEN 'e_30m_2h'
            ELSE 'f_ge_2h' END AS band,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(min(gap_s) AS BIGINT) AS min_gap_s,
       CAST(max(gap_s) AS BIGINT) AS max_gap_s
FROM g WHERE gap_s IS NOT NULL
GROUP BY 1
"""


def q_tokenizer_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language compression rate of the frozen corpus BPE: chars
    per BPE token — the multilingual fairness metric that pairs with
    fertility (a language the vocabulary underserves pays more tokens
    per char of content, i.e. more compute per document).  Reuses the
    memoized 8-merge table and the one-pass encode; adds only a k-row
    per-lang char rollup."""
    from sequin_spark.datapipe.tokenizer import bpe_encode

    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    merges = _bpe_merges_cached(spark, sf_dir, n_merges=8)
    enc = bpe_encode(docs, merges)
    toks = (enc.join(docs.select("doc_id", "lang"), "doc_id")
            .groupBy("lang")
            .agg(F.sum("n_bpe_tokens").cast("long").alias("n_bpe_tokens")))
    chars = docs.groupBy("lang").agg(
        F.sum("n_chars").cast("long").alias("n_chars"))
    return toks.join(chars, "lang").select(
        "lang", "n_chars", "n_bpe_tokens",
        F.round(F.col("n_chars") / F.col("n_bpe_tokens"), 4)
        .alias("chars_per_token"),
    )


def _sql_tokenizer_compression(n_merges: int = 8) -> str:
    chain = _sql_bpe_merges(n_merges)
    body = chain[: chain.rindex("\nSELECT CAST(1 AS INTEGER) AS rank")]
    return body + f""",
tok AS (
  SELECT doc_id, lang, unnest(string_split({D_NORM}, ' ')) AS word
  FROM documents
),
enc AS (
  SELECT t.lang, len(string_split(w.syms, '|')) AS n_syms
  FROM tok t JOIN w{n_merges} w USING (word)
  WHERE t.word <> ''
),
tk AS (SELECT lang, CAST(sum(n_syms) AS BIGINT) AS n_bpe_tokens
       FROM enc GROUP BY lang),
ch AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS n_chars
       FROM documents GROUP BY lang)
SELECT tk.lang, ch.n_chars, tk.n_bpe_tokens,
       round(CAST(ch.n_chars AS DOUBLE) / tk.n_bpe_tokens, 4)
         AS chars_per_token
FROM tk JOIN ch USING (lang)
"""


DATAPIPE_QUERIES.update({
    "graph_assortativity": q_graph_assortativity,
    "asof_tolerance_join": q_asof_tolerance_join,
    "session_gap_stats": q_session_gap_stats,
    "tokenizer_compression": q_tokenizer_compression,
})

DATAPIPE_ORACLES.update({
    "graph_assortativity": _sql_graph_assortativity(),
    "asof_tolerance_join": SQL_ASOF_TOLERANCE_JOIN,
    "session_gap_stats": SQL_SESSION_GAP_STATS,
    "tokenizer_compression": _sql_tokenizer_compression(),
})


def q_multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode, oracle-checked: per doc a deterministic
    16×8 grayscale PNG (pixel(i,j) = (doc_id·31+i·7+j) mod 256,
    datapipe/multimodal.synth_gray_png) is ENCODED to actual bytes,
    shipped through Arrow, and decoded by the pure-stdlib PNG decoder
    (zlib inflate + scanline de-filtering) — while the DuckDB oracle
    computes the identical mean-luminance statistic ANALYTICALLY from
    the pixel rule.  A wrong filter, a chunk-walk bug, or an Arrow
    binary mangling all surface as a value mismatch.  Plan: two
    embarrassingly-parallel mapInPandas passes (encode, decode), no
    shuffle — the exact shape of a production decode stage."""
    import pandas as _pd

    from sequin_spark.datapipe.multimodal import (
        decode_pixels,
        synth_gray_png,
    )

    _prep(spark)
    # spread the CPU-dense encode+decode kernels across cores (the
    # palette-decode helper's rationale; no-op at cluster scale)
    docs = _spread_python_kernel(
        load_table(spark, sf_dir, "documents").select("doc_id"))

    def encode(batches):
        for b in batches:
            yield _pd.DataFrame({
                "doc_id": b["doc_id"],
                "media_type": "image",
                "blob": [synth_gray_png(int(d)) for d in b["doc_id"]],
                "meta_format": "png",
                "n_bytes": [0] * len(b),
            })

    media = docs.mapInPandas(
        encode,
        schema=("doc_id long, media_type string, blob binary, "
                "meta_format string, n_bytes long"))
    out = decode_pixels(media)
    return out.select(
        "doc_id", "width", "height", "n_channels", "n_pixels",
        "mean_luma_x1000", "status")


SQL_MULTIMODAL_PNG_DECODE = """
SELECT doc_id,
       CAST(16 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
       CAST(1 AS INTEGER) AS n_channels,
       CAST(128 AS BIGINT) AS n_pixels,
       CAST((1000 * list_sum(list_transform(generate_series(0, 127),
             k -> (doc_id * 31 + (k // 16) * 7 + (k % 16)) % 256)))
            // 128 AS BIGINT) AS mean_luma_x1000,
       'decoded' AS status
FROM documents
"""


def q_multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG pixel decode, oracle-checked (r9 verdict
    task #3, the PNG pattern applied to the entropy-coded format): per
    doc a deterministic 16×16 grayscale JPEG whose four 8×8 blocks are
    CONSTANT values (doc_id·37 + bi·11 + bj·5) mod 256
    (multimodal.synth_gray_jpeg — all-ones quant table, Annex K
    Huffman tables) is encoded to real entropy-coded bytes and decoded
    by the pure stdlib+numpy T.81 decoder (canonical Huffman + dequant
    + IDCT).  DC-only constant blocks round-trip EXACTLY (FDCT DC =
    8·(v−128); IDCT of a DC-only block is flat), so the DuckDB oracle
    computes the identical mean-luminance statistic analytically from
    the block rule.  A Huffman table bug, a zigzag/dequant slip, or a
    bit-reader misalignment all surface as a value mismatch.  Plan:
    two embarrassingly-parallel mapInPandas passes, no shuffle."""
    import pandas as _pd

    from sequin_spark.datapipe.multimodal import (
        decode_pixels,
        synth_gray_jpeg,
    )

    _prep(spark)
    # spread the CPU-dense encode+decode kernels across cores (the
    # palette-decode helper's rationale; no-op at cluster scale)
    docs = _spread_python_kernel(
        load_table(spark, sf_dir, "documents").select("doc_id"))

    def encode(batches):
        for b in batches:
            yield _pd.DataFrame({
                "doc_id": b["doc_id"],
                "media_type": "image",
                "blob": [synth_gray_jpeg(int(d)) for d in b["doc_id"]],
                "meta_format": "jpeg",
                "n_bytes": [0] * len(b),
            })

    media = docs.mapInPandas(
        encode,
        schema=("doc_id long, media_type string, blob binary, "
                "meta_format string, n_bytes long"))
    out = decode_pixels(media)
    return out.select(
        "doc_id", "width", "height", "n_channels", "n_pixels",
        "mean_luma_x1000", "status")


SQL_MULTIMODAL_JPEG_DECODE = """
SELECT doc_id,
       CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
       CAST(1 AS INTEGER) AS n_channels,
       CAST(256 AS BIGINT) AS n_pixels,
       CAST((1000 * 64 * list_sum(list_transform(generate_series(0, 3),
             k -> (doc_id * 37 + (k // 2) * 11 + (k % 2) * 5) % 256)))
            // 256 AS BIGINT) AS mean_luma_x1000,
       'decoded' AS status
FROM documents
"""


def q_ann_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN index maintenance + recall-drift audit (r11
    verdict task #9).  The persisted IVF index (same ``.cache/`` build
    as ann_ivf_topk) is APPENDED to — new vectors (reversed copies of
    the corpus, deterministic and SQL-replicable) are assigned to the
    FROZEN coarse quantizer in one broadcast-literal argmin scan,
    O(new) not O(corpus) — then the drift audit compares per-list
    assignment quality of appended vs resident vectors and flags lists
    whose appended mean squared-L2 exceeds 1.5× the resident mean: the
    signal that the cheap append path has degraded recall and a re-fit
    is warranted.  ``n_total`` cross-checks the appended index's
    actual list sizes (cached assignments ∪ new) against the audit's
    independent recomputation.  Per-row distances are integer-scaled
    ×1000 before aggregation so every statistic is engine-exact.

    Plan: one narrow argmin scan per side (no join, no shuffle — the
    centroids ride as literals), one c_id hash agg each, a tiny
    full-outer join on ≤k rows.  At 100 TB: append cost scales with
    the appended batch; the audit scans each side once."""
    from sequin_spark.datapipe.similarity import (
        SemDedupIndex,
        append_to_index,
        build_semdedup_index,
        index_drift_audit,
    )

    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _maintained_index(
        spark, sf_dir, "ivfdet_index", "c8i1-v1",
        lambda path: build_semdedup_index(emb, k=8, iters=1).save(path),
        SemDedupIndex.load,
    )
    new = emb.select((F.col("vec_id") + 100000).alias("vec_id"),
                     F.reverse("embedding").alias("embedding"))
    appended = append_to_index(idx, new)
    sizes = appended.assignments.groupBy("c_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"))
    audit = index_drift_audit(idx, emb, new)
    return audit.join(sizes, "c_id").select(
        F.col("c_id").cast("int").alias("c_id"),
        "n_resident", "n_appended", "n_total",
        "mean_dist_resident_x1000", "mean_dist_appended_x1000",
        "refit_flagged")


SQL_ANN_INDEX_APPEND = _sql_det_assign(8, 1, 64) + f""",
cents AS (SELECT c_id, c FROM c1),
resd AS (
  SELECT af.c_id,
         CAST(round(1000 * {_sql_l2('af.v', 'cents.c')}) AS BIGINT) AS d
  FROM af JOIN cents ON af.c_id = cents.c_id),
nv AS (
  SELECT vec_id + 100000 AS vec_id,
         list_transform(generate_series(1, 64),
                        i -> CAST(embedding[65 - i] AS DOUBLE)) AS v
  FROM embeddings),
na AS (
  SELECT vec_id, v, c_id FROM (
    SELECT nv.vec_id, nv.v, cents.c_id,
           row_number() OVER (PARTITION BY nv.vec_id
                              ORDER BY {_sql_l2('nv.v', 'cents.c')} ASC,
                                       cents.c_id ASC) AS rn
    FROM nv CROSS JOIN cents) t
  WHERE rn = 1),
napp AS (
  SELECT na.c_id,
         CAST(round(1000 * {_sql_l2('na.v', 'cents.c')}) AS BIGINT) AS d
  FROM na JOIN cents ON na.c_id = cents.c_id),
r AS (SELECT c_id, count(*) AS n_res, sum(d) AS rsum FROM resd GROUP BY c_id),
a AS (SELECT c_id, count(*) AS n_app, sum(d) AS asum FROM napp GROUP BY c_id)
SELECT CAST(COALESCE(r.c_id, a.c_id) AS INTEGER) AS c_id,
       CAST(COALESCE(n_res, 0) AS BIGINT) AS n_resident,
       CAST(COALESCE(n_app, 0) AS BIGINT) AS n_appended,
       CAST(COALESCE(n_res, 0) + COALESCE(n_app, 0) AS BIGINT) AS n_total,
       CAST(CASE WHEN n_res > 0 THEN floor(rsum * 1.0 / n_res) END
            AS BIGINT) AS mean_dist_resident_x1000,
       CAST(CASE WHEN n_app > 0 THEN floor(asum * 1.0 / n_app) END
            AS BIGINT) AS mean_dist_appended_x1000,
       CASE WHEN COALESCE(n_app, 0) = 0 THEN FALSE
            ELSE r.c_id IS NULL
                 OR CAST(floor(asum * 1.0 / n_app) AS BIGINT) * 2
                    > CAST(floor(rsum * 1.0 / n_res) AS BIGINT) * 3
       END AS refit_flagged
FROM r FULL OUTER JOIN a ON r.c_id = a.c_id
"""


def q_multimodal_jpeg_progressive(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """PROGRESSIVE JPEG pixel decode, oracle-checked (r11 verdict task
    #7 — the one feasible remainder behind the decode gate; video
    pixels stay honestly out of scope).  Per doc the SAME constant-
    block content as multimodal_jpeg_decode is re-encoded as a 4-scan
    SOF2 stream (multimodal.synth_gray_progressive_jpeg: DC first at
    Al=1 → all-EOB AC band with a cross-block EOBRUN → DC refinement
    to Al=0) and decoded by the T.81 §G scan loop — successive-
    approximation DC, EOBRUN bookkeeping, per-scan table updates —
    landing in the same dequant+IDCT tail as baseline.  The DuckDB
    oracle is the identical analytic block rule, so a progressive-
    specific slip (Al scaling, EOBRUN off-by-one, refinement-bit
    polarity) surfaces as a value mismatch.  Plan: two mapInPandas
    passes, no shuffle (the multimodal decode shape)."""
    import pandas as _pd

    from sequin_spark.datapipe.multimodal import (
        decode_pixels,
        synth_gray_progressive_jpeg,
    )

    _prep(spark)
    # spread the CPU-dense encode+decode kernels across cores (the
    # palette-decode helper's rationale; no-op at cluster scale)
    docs = _spread_python_kernel(
        load_table(spark, sf_dir, "documents").select("doc_id"))

    def encode(batches):
        for b in batches:
            yield _pd.DataFrame({
                "doc_id": b["doc_id"],
                "media_type": "image",
                "blob": [synth_gray_progressive_jpeg(int(d))
                         for d in b["doc_id"]],
                "meta_format": "jpeg",
                "n_bytes": [0] * len(b),
            })

    media = docs.mapInPandas(
        encode,
        schema=("doc_id long, media_type string, blob binary, "
                "meta_format string, n_bytes long"))
    out = decode_pixels(media)
    return out.select(
        "doc_id", "width", "height", "n_channels", "n_pixels",
        "mean_luma_x1000", "status")


SQL_MULTIMODAL_JPEG_PROGRESSIVE = SQL_MULTIMODAL_JPEG_DECODE


DATAPIPE_QUERIES.update({
    "multimodal_png_decode": q_multimodal_png_decode,
    "multimodal_jpeg_decode": q_multimodal_jpeg_decode,
    "multimodal_jpeg_progressive": q_multimodal_jpeg_progressive,
    "ann_index_append": q_ann_index_append,
})
DATAPIPE_ORACLES.update({
    "multimodal_png_decode": SQL_MULTIMODAL_PNG_DECODE,
    "multimodal_jpeg_decode": SQL_MULTIMODAL_JPEG_DECODE,
    "multimodal_jpeg_progressive": SQL_MULTIMODAL_JPEG_PROGRESSIVE,
    "ann_index_append": SQL_ANN_INDEX_APPEND,
})


def q_multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PCM decode, oracle-checked (the audio twin of
    multimodal_png_decode): per doc a deterministic 64-sample 16-bit
    WAV (sample k = (doc_id·7+k) mod 201 − 100,
    datapipe/multimodal.synth_pcm_wav) is written as actual RIFF
    bytes and decoded by the stdlib wave reader; RMS×1000 is the
    integer isqrt of the exact mean square, which the DuckDB oracle
    computes ANALYTICALLY from the sample rule (integer fold +
    integer sqrt — no float anywhere).  Same no-shuffle two-pass
    mapInPandas shape as the PNG query."""
    import pandas as _pd

    from sequin_spark.datapipe.multimodal import (
        decode_pixels,
        synth_pcm_wav,
    )

    _prep(spark)
    # NOT spread: PCM synth+header decode is too cheap (idle A/B min
    # 0.45 plain vs 0.56 spread, r14 session 2)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for b in batches:
            yield _pd.DataFrame({
                "doc_id": b["doc_id"],
                "media_type": "audio",
                "blob": [synth_pcm_wav(int(d)) for d in b["doc_id"]],
                "meta_format": "wav",
                "n_bytes": [0] * len(b),
            })

    media = docs.mapInPandas(
        encode,
        schema=("doc_id long, media_type string, blob binary, "
                "meta_format string, n_bytes long"))
    return decode_pixels(media).select(
        "doc_id", "format", "n_channels", "duration_ms",
        "rms_x1000", "status")


SQL_MULTIMODAL_WAV_DECODE = """
WITH s AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(generate_series(0, 63),
              k -> ((doc_id * 7 + k) % 201 - 100)
                   * ((doc_id * 7 + k) % 201 - 100))) AS BIGINT)
           AS sum_sq
  FROM documents
)
SELECT doc_id, 'wav' AS format, CAST(1 AS INTEGER) AS n_channels,
       CAST(8 AS BIGINT) AS duration_ms,
       CAST(floor(sqrt(CAST((sum_sq // 64) * 1000000 AS DOUBLE)))
            AS BIGINT) AS rms_x1000,
       'decoded' AS status
FROM s
"""


DATAPIPE_QUERIES.update({
    "multimodal_wav_decode": q_multimodal_wav_decode,
})
DATAPIPE_ORACLES.update({
    "multimodal_wav_decode": SQL_MULTIMODAL_WAV_DECODE,
})


def q_select_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023, simplified to
    the Hedge/multiplicative-weights core): starting from uniform
    domain weights, each of 5 rounds multiplies every domain's weight
    by (1 + η·excess_d) and renormalizes, so domains with higher
    excess loss earn a larger share of the training mixture — the
    standard domain-mixture optimization step of an LLM data pipeline.

    The excess-loss proxy is the domain's short-doc share in basis
    points (short docs = the reference model's easy wins; any
    per-domain integer loss plugs in).  Engine-exact by construction:
    the loss table is one integer count shuffle, and the 5 update
    rounds run over the bounded (~|sources|-row) collected table in
    pure-integer arithmetic — multiply, integer div (positive
    operands, so Spark `div` == DuckDB `//`), renormalize to ppm —
    mirrored by 5 unrolled MATERIALIZED CTEs in the oracle.  At
    100 TB: the only distributed work is the one count shuffle; the
    iteration state is |domains| rows (the kcenter bounded-action
    pattern)."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    eta_bp = 2000  # η = 0.2 in basis points
    loss = (
        docs.groupBy("source")
        .agg(F.sum((F.col("n_chars") < 200).cast("long")).alias("_s"),
             F.count(F.lit(1)).alias("_n"))
        # integer div on BOTH sides (Spark `div` == DuckDB `//` for
        # positive operands) — a double `/` + cast truncates x.999…
        # quotients one short of the oracle's floor
        .select("source", F.expr("(10000 * _s) div _n").alias("loss_bp"))
        .collect()
    )
    rows = sorted((r["source"], int(r["loss_bp"])) for r in loss)
    n = len(rows)
    w = {s: 1_000_000 // n for s, _ in rows}
    for _ in range(5):
        raw = {s: (w[s] * (10000 + (eta_bp * lb) // 10000)) // 10000
               for s, lb in rows}
        tot = sum(raw.values())
        w = {s: (raw[s] * 1_000_000) // tot for s in raw}
    out = [(s, lb, w[s]) for s, lb in rows]
    return spark.createDataFrame(
        out, "source string, loss_bp long, weight_ppm long")


def _sql_select_doremi_weights() -> str:
    steps = []
    prev = "w0"
    for k in range(1, 6):
        steps.append(f"""
r{k} AS MATERIALIZED (
  SELECT source, loss_bp,
         (weight_ppm * (10000 + (2000 * loss_bp) // 10000)) // 10000
           AS raw
  FROM {prev}),
w{k} AS MATERIALIZED (
  SELECT source, loss_bp,
         (raw * 1000000) // (SELECT sum(raw) FROM r{k}) AS weight_ppm
  FROM r{k})""")
        prev = f"w{k}"
    chain = ",".join(steps)
    return f"""
WITH loss AS MATERIALIZED (
  SELECT source,
         (10000 * sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END))
           // count(*) AS loss_bp
  FROM documents GROUP BY source),
w0 AS MATERIALIZED (
  SELECT source, loss_bp,
         1000000 // (SELECT count(*) FROM loss) AS weight_ppm
  FROM loss),{chain}
SELECT source, CAST(loss_bp AS BIGINT) AS loss_bp,
       CAST(weight_ppm AS BIGINT) AS weight_ppm
FROM {prev}
"""


DATAPIPE_QUERIES.update({
    "select_doremi_weights": q_select_doremi_weights,
})
DATAPIPE_ORACLES.update({
    "select_doremi_weights": _sql_select_doremi_weights(),
})


def _q_multimodal_palette_decode(spark: SparkSession, sf_dir: str,
                                 synth_name: str, fmt: str) -> DataFrame:
    import pandas as _pd

    from sequin_spark.datapipe import multimodal as _mm

    _prep(spark)
    synth = getattr(_mm, synth_name)
    # documents is ONE parquet split at bench scales, so the per-doc
    # encode+decode Python kernels otherwise run as a single task on a
    # 32-core box (measured: the clear-per-pixel GIF arm at 29.5 s
    # wall ≈ its 42 s single-core cost; guide §2 — the scan sizes
    # splits by bytes, wrong for CPU-dense kernels).  One round-robin
    # shuffle of the 8-byte doc_id rows buys full-width parallelism;
    # no-op on a real cluster where the scan yields ≥ cores splits.
    docs = _spread_python_kernel(
        load_table(spark, sf_dir, "documents").select("doc_id"))

    def encode(batches):
        for b in batches:
            yield _pd.DataFrame({
                "doc_id": b["doc_id"],
                "media_type": "image",
                "blob": [synth(int(d)) for d in b["doc_id"]],
                "meta_format": fmt,
                "n_bytes": [0] * len(b),
            })

    media = docs.mapInPandas(
        encode,
        schema=("doc_id long, media_type string, blob binary, "
                "meta_format string, n_bytes long"))
    return _mm.decode_pixels(media).select(
        "doc_id", "width", "height", "n_channels", "n_pixels",
        "mean_luma_x1000", "status")


def q_multimodal_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF pixel decode, oracle-checked: per doc a deterministic
    16×8 gray-palette GIF89a (multimodal.synth_gray_gif — pixel rule
    (doc_id·31+i·7+j) mod 256, clear-per-pixel LZW so every pixel
    crosses the decoder's reset path) decoded by the pure-stdlib
    variable-width LZW decoder; the DuckDB oracle computes the mean
    luminance analytically from the pixel rule (gray palette → luma =
    index).  Standard-LZW dictionary growth, width escalation, and
    de-interlacing are differentially tested in tests/test_gif_bmp.py.
    Plan: two mapInPandas passes, no shuffle."""
    return _q_multimodal_palette_decode(
        spark, sf_dir, "synth_gray_gif", "gif")


def q_multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BMP pixel decode, oracle-checked: per doc a deterministic
    16×8 8-bit-palette bottom-up BI_RGB BMP (multimodal.synth_gray_bmp,
    same pixel rule) decoded by the pure-stdlib BMP reader (palette +
    stride + row-order handling); analytic DuckDB oracle.  With this
    and GIF, every image container the probe recognizes decodes for
    real — SEQUIN_FAKE_DECODE now gates video only."""
    return _q_multimodal_palette_decode(
        spark, sf_dir, "synth_gray_bmp", "bmp")


_SQL_PALETTE_DECODE = """
SELECT doc_id,
       CAST(16 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS n_channels,
       CAST(128 AS BIGINT) AS n_pixels,
       CAST((1000 * list_sum(list_transform(generate_series(0, 127),
             k -> (doc_id * 31 + (k // 16) * 7 + (k % 16)) % 256)))
            // 128 AS BIGINT) AS mean_luma_x1000,
       'decoded' AS status
FROM documents
"""


DATAPIPE_QUERIES.update({
    "multimodal_gif_decode": q_multimodal_gif_decode,
    "multimodal_bmp_decode": q_multimodal_bmp_decode,
})
DATAPIPE_ORACLES.update({
    "multimodal_gif_decode": _SQL_PALETTE_DECODE,
    "multimodal_bmp_decode": _SQL_PALETTE_DECODE,
})


def q_multimodal_mp4_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP4 container probe, oracle-checked (r10 verdict task #4;
    the synth_gray_png pattern applied to ISO BMFF): per doc a
    deterministic minimal MP4 — duration/dims/frame-count closed-form
    in doc_id (multimodal.synth_mp4) — is built as ACTUAL box bytes
    and walked by the pure-stdlib box parser (ftyp/moov/mvhd/trak/
    tkhd/mdia/mdhd/hdlr/stbl/stsd/stsz, 32/64-bit sizes), while the
    DuckDB oracle computes the same metadata analytically.  A box-walk
    bug, a fixed-point slip (tkhd 16.16), or a version-1 header
    mis-stride all surface as a value mismatch.  This narrows the
    video honesty gate to pixel decode only.  Plan: two
    embarrassingly-parallel mapInPandas passes, no shuffle."""
    import pandas as _pd

    from sequin_spark.datapipe.multimodal import (
        probe_video_containers,
        synth_mp4,
    )

    _prep(spark)
    # width-capped spread before the two python stages (guide §2/§4;
    # re-measured idle r14 session 2: mp3 probe min 1.05 -> 0.58 s —
    # the r13 rejection was suite-contention noise); no-op when the
    # scan already yields >= cap partitions
    docs = _spread_python_kernel(
        load_table(spark, sf_dir, "documents").select("doc_id"))

    def encode(batches):
        for b in batches:
            yield _pd.DataFrame({
                "doc_id": b["doc_id"],
                "media_type": "video",
                "blob": [synth_mp4(int(d)) for d in b["doc_id"]],
                "meta_format": "mp4",
                "n_bytes": [0] * len(b),
            })

    media = docs.mapInPandas(
        encode,
        schema=("doc_id long, media_type string, blob binary, "
                "meta_format string, n_bytes long"))
    out = probe_video_containers(media)
    return out.select(
        "doc_id", "container", "codec", "width", "height",
        "duration_ms", "n_frames", "n_tracks", "status")


SQL_MULTIMODAL_MP4_PROBE = """
SELECT doc_id,
       'mp4' AS container, 'avc1' AS codec,
       CAST(16 * (1 + doc_id % 9) AS INTEGER) AS width,
       CAST(16 * (1 + doc_id % 5) AS INTEGER) AS height,
       CAST(1000 + (doc_id % 97) * 40 AS BIGINT) AS duration_ms,
       CAST(1 + doc_id % 250 AS BIGINT) AS n_frames,
       CAST(1 AS INTEGER) AS n_tracks,
       'probed' AS status
FROM documents
"""


def q_multimodal_mkv_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Matroska container probe, oracle-checked (the EBML half of
    r10 verdict task #4): per doc a deterministic minimal MKV —
    duration/dims/SimpleBlock-count closed-form in doc_id
    (multimodal.synth_mkv) — is built as actual EBML elements and
    walked by the pure-stdlib vint/element parser (Segment→Info
    TimestampScale+Duration, Tracks→TrackEntry→Video PixelWidth/
    Height, Cluster SimpleBlock count).  Same plan shape as the MP4
    probe."""
    import pandas as _pd

    from sequin_spark.datapipe.multimodal import (
        probe_video_containers,
        synth_mkv,
    )

    _prep(spark)
    # width-capped spread before the two python stages (guide §2/§4;
    # re-measured idle r14 session 2: mp3 probe min 1.05 -> 0.58 s —
    # the r13 rejection was suite-contention noise); no-op when the
    # scan already yields >= cap partitions
    docs = _spread_python_kernel(
        load_table(spark, sf_dir, "documents").select("doc_id"))

    def encode(batches):
        for b in batches:
            yield _pd.DataFrame({
                "doc_id": b["doc_id"],
                "media_type": "video",
                "blob": [synth_mkv(int(d)) for d in b["doc_id"]],
                "meta_format": "mkv",
                "n_bytes": [0] * len(b),
            })

    media = docs.mapInPandas(
        encode,
        schema=("doc_id long, media_type string, blob binary, "
                "meta_format string, n_bytes long"))
    out = probe_video_containers(media)
    return out.select(
        "doc_id", "container", "codec", "width", "height",
        "duration_ms", "n_frames", "n_tracks", "status")


SQL_MULTIMODAL_MKV_PROBE = """
SELECT doc_id,
       'mkv' AS container, 'V_SYNTH' AS codec,
       CAST(32 * (1 + doc_id % 7) AS INTEGER) AS width,
       CAST(32 * (1 + doc_id % 3) AS INTEGER) AS height,
       CAST(500 + (doc_id % 89) * 20 AS BIGINT) AS duration_ms,
       CAST(1 + doc_id % 50 AS BIGINT) AS n_frames,
       CAST(1 AS INTEGER) AS n_tracks,
       'probed' AS status
FROM documents
"""


DATAPIPE_QUERIES.update({
    "multimodal_mp4_probe": q_multimodal_mp4_probe,
    "multimodal_mkv_probe": q_multimodal_mkv_probe,
})
DATAPIPE_ORACLES.update({
    "multimodal_mp4_probe": SQL_MULTIMODAL_MP4_PROBE,
    "multimodal_mkv_probe": SQL_MULTIMODAL_MKV_PROBE,
})


def q_multimodal_mp3_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP3 container probe, oracle-checked: per doc a
    deterministic MPEG-1 Layer III frame run — bitrate/samplerate/
    channel-mode/frame-count closed-form in doc_id
    (multimodal.synth_mp3), with ID3v2 prefixes (every 5th doc) and
    ID3v1 trailers (every 7th) the walker must skip — is built as
    ACTUAL frame headers and walked by the pure-stdlib parser, while
    the DuckDB oracle computes the same metadata analytically.  A
    sync-walk bug, a bitrate/samplerate table slip, a padding-length
    error, or an ID3 mis-skip all surface as a value mismatch.
    Completes the audio side of the container matrix next to the
    MP4/MKV probes.  Plan: two embarrassingly-parallel mapInPandas
    passes, no shuffle."""
    import pandas as _pd

    from sequin_spark.datapipe.multimodal import (
        probe_audio_containers,
        synth_mp3,
    )

    _prep(spark)
    # width-capped spread before the two python stages (guide §2/§4;
    # re-measured idle r14 session 2: mp3 probe min 1.05 -> 0.58 s —
    # the r13 rejection was suite-contention noise); no-op when the
    # scan already yields >= cap partitions
    docs = _spread_python_kernel(
        load_table(spark, sf_dir, "documents").select("doc_id"))

    def encode(batches):
        for b in batches:
            yield _pd.DataFrame({
                "doc_id": b["doc_id"],
                "media_type": "audio",
                "blob": [synth_mp3(int(d)) for d in b["doc_id"]],
                "meta_format": "mp3",
                "n_bytes": [0] * len(b),
            })

    media = docs.mapInPandas(
        encode,
        schema=("doc_id long, media_type string, blob binary, "
                "meta_format string, n_bytes long"))
    out = probe_audio_containers(media)
    return out.select(
        "doc_id", "container", "codec", "sample_rate", "channels",
        "bits_per_sample", "bitrate_kbps", "n_frames", "n_samples",
        "n_blocks", "duration_ms", "status")


SQL_MULTIMODAL_MP3_PROBE = """
SELECT doc_id,
       'mp3' AS container, 'mp3' AS codec,
       CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
            ELSE 32000 END AS INTEGER) AS sample_rate,
       CAST(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 2 END
            AS INTEGER) AS channels,
       CAST(NULL AS INTEGER) AS bits_per_sample,
       CAST(list_extract([32,40,48,56,64,80,96,112,128,160,192,224,
                          256,320], CAST(1 + doc_id % 14 AS INTEGER))
            AS INTEGER) AS bitrate_kbps,
       CAST(1 + doc_id % 60 AS BIGINT) AS n_frames,
       CAST((1 + doc_id % 60) * 1152 AS BIGINT) AS n_samples,
       CAST(NULL AS INTEGER) AS n_blocks,
       CAST((1 + doc_id % 60) * 1152 * 1000
            // (CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                ELSE 32000 END) AS BIGINT) AS duration_ms,
       'probed' AS status
FROM documents
"""


def q_multimodal_flac_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL FLAC metadata probe, oracle-checked: per doc a
    deterministic STREAMINFO + PADDING metadata stream — sample rate/
    channels/bit depth/total samples/block count closed-form in
    doc_id (multimodal.synth_flac) — is built as actual metadata
    blocks and walked by the pure-stdlib block parser (last-flag +
    type + 24-bit length headers; the packed 64-bit
    rate/channels/bits/samples field).  A bit-offset slip in the
    STREAMINFO unpack or a block-walk stride error surfaces as a
    value mismatch.  Same plan shape as the MP3 probe."""
    import pandas as _pd

    from sequin_spark.datapipe.multimodal import (
        probe_audio_containers,
        synth_flac,
    )

    _prep(spark)
    # NOT spread: the STREAMINFO walk is the cheapest probe kernel and
    # the spread measured a LOSS idle (min 0.30 plain vs 0.44 spread,
    # r14 session 2) — exchange overhead exceeds the kernel
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for b in batches:
            yield _pd.DataFrame({
                "doc_id": b["doc_id"],
                "media_type": "audio",
                "blob": [synth_flac(int(d)) for d in b["doc_id"]],
                "meta_format": "flac",
                "n_bytes": [0] * len(b),
            })

    media = docs.mapInPandas(
        encode,
        schema=("doc_id long, media_type string, blob binary, "
                "meta_format string, n_bytes long"))
    out = probe_audio_containers(media)
    return out.select(
        "doc_id", "container", "codec", "sample_rate", "channels",
        "bits_per_sample", "bitrate_kbps", "n_frames", "n_samples",
        "n_blocks", "duration_ms", "status")


SQL_MULTIMODAL_FLAC_PROBE = """
SELECT doc_id,
       'flac' AS container, 'flac' AS codec,
       CAST(CASE doc_id % 4 WHEN 0 THEN 44100 WHEN 1 THEN 48000
            WHEN 2 THEN 96000 ELSE 22050 END AS INTEGER)
           AS sample_rate,
       CAST(1 + doc_id % 2 AS INTEGER) AS channels,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 24 ELSE 16 END
            AS INTEGER) AS bits_per_sample,
       CAST(NULL AS INTEGER) AS bitrate_kbps,
       CAST(NULL AS BIGINT) AS n_frames,
       CAST(1000 + (doc_id % 101) * 441 AS BIGINT) AS n_samples,
       CAST(1 + doc_id % 4 AS INTEGER) AS n_blocks,
       CAST((1000 + (doc_id % 101) * 441) * 1000
            // (CASE doc_id % 4 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                WHEN 2 THEN 96000 ELSE 22050 END) AS BIGINT)
           AS duration_ms,
       'probed' AS status
FROM documents
"""


DATAPIPE_QUERIES.update({
    "multimodal_mp3_probe": q_multimodal_mp3_probe,
    "multimodal_flac_probe": q_multimodal_flac_probe,
})
DATAPIPE_ORACLES.update({
    "multimodal_mp3_probe": SQL_MULTIMODAL_MP3_PROBE,
    "multimodal_flac_probe": SQL_MULTIMODAL_FLAC_PROBE,
})


def q_embed_kmeans_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer fixed-point Lloyd k-means over the embedding corpus
    (k=8, 3 iterations, smallest-id seeding) — the semantic-balance
    primitive behind cluster-proportional sampling and per-cluster
    dedup budgets in SemDeDup/DataComp-style curation.  Exact-integer
    construction (quantize → BIGINT argmin → floor-mean update) makes
    the DuckDB oracle a bit-identical replay (sql_kmeans_clusters
    unrolls the same rounds as materialized CTEs).  Plan: per
    iteration one narrow broadcast-literal argmin pass + one
    posexplode partial-agg shuffle (map-side combine → ≤ k·dim rows),
    driver collects k·dim integers per round — the kcenter bounded-
    collect contract."""
    from sequin_spark.datapipe.similarity import kmeans_clusters

    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_clusters(emb, k=8, iters=3)


def _sql_embed_kmeans_balance() -> str:
    from sequin_spark.datapipe.similarity import sql_kmeans_clusters

    return sql_kmeans_clusters(
        "SELECT vec_id AS id, embedding AS v FROM embeddings",
        k=8, iters=3).replace(
        "SELECT id, cluster, dist2 FROM afin",
        "SELECT id AS vec_id, cluster, dist2 FROM afin")


DATAPIPE_QUERIES.update({
    "embed_kmeans_balance": q_embed_kmeans_balance,
})
DATAPIPE_ORACLES.update({
    "embed_kmeans_balance": _sql_embed_kmeans_balance(),
})


def q_multimodal_tiff_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL TIFF pixel decode, oracle-checked (extends the r10 image
    matrix — PNG/JPEG/GIF/BMP — with the fifth major container): per
    doc a deterministic 16×8 8-bit grayscale TIFF (the shared palette
    pixel rule) whose DECODE PATH varies while the pixel stats stay
    invariant — compression cycles none/PackBits/LZW (TIFF 6.0 §9/§13,
    MSB-first early-change LZW) by doc_id mod 3 and odd docs split
    into 4-row strips (multi-strip assembly) — walked by the
    pure-stdlib IFD/tag parser (multimodal.decode_tiff).  A stride
    slip, a PackBits sign error, an early-change off-by-one, or a
    strip-order bug each surfaces as a value mismatch on a third of
    the corpus.  Encoder/decoder roundtrips are differentially tested
    in tests/test_tiff.py.  Plan: two embarrassingly-parallel
    mapInPandas passes, no shuffle."""
    return _q_multimodal_palette_decode(
        spark, sf_dir, "synth_gray_tiff", "tiff")


SQL_MULTIMODAL_TIFF_DECODE = """
SELECT doc_id,
       CAST(16 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
       CAST(1 AS INTEGER) AS n_channels,
       CAST(128 AS BIGINT) AS n_pixels,
       CAST((1000 * list_sum(list_transform(generate_series(0, 127),
             k -> (doc_id * 31 + (k // 16) * 7 + (k % 16)) % 256)))
            // 128 AS BIGINT) AS mean_luma_x1000,
       'decoded' AS status
FROM documents
"""


DATAPIPE_QUERIES.update({
    "multimodal_tiff_decode": q_multimodal_tiff_decode,
})
DATAPIPE_ORACLES.update({
    "multimodal_tiff_decode": SQL_MULTIMODAL_TIFF_DECODE,
})


def q_multimodal_ogg_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Ogg container probe, oracle-checked (completes the audio
    container matrix: MP3 + FLAC + WAV + OGG): per doc a deterministic
    minimal Ogg stream — Opus or Vorbis identification header, 2–6
    pages, per-page RFC 3533 CRC (computed by the synth, VERIFIED by
    the probe with the non-reflected 0x04C11DB7 CRC-32) — walked by
    the pure-stdlib page parser (multimodal.probe_ogg: capture
    pattern, lacing tables, packet counting, granule→duration with
    the Opus pre-skip subtraction, RFC 7845 §5.1).  A lacing-walk
    stride bug, a CRC table error, or a pre-skip slip surfaces as a
    value mismatch.  Plan: two embarrassingly-parallel mapInPandas
    passes, no shuffle."""
    import pandas as _pd

    from sequin_spark.datapipe.multimodal import (
        probe_audio_containers,
        synth_ogg,
    )

    _prep(spark)
    # width-capped spread before the two python stages (guide §2/§4;
    # re-measured idle r14 session 2: mp3 probe min 1.05 -> 0.58 s —
    # the r13 rejection was suite-contention noise); no-op when the
    # scan already yields >= cap partitions
    docs = _spread_python_kernel(
        load_table(spark, sf_dir, "documents").select("doc_id"))

    def encode(batches):
        for b in batches:
            yield _pd.DataFrame({
                "doc_id": b["doc_id"],
                "media_type": "audio",
                "blob": [synth_ogg(int(d)) for d in b["doc_id"]],
                "meta_format": "ogg",
                "n_bytes": [0] * len(b),
            })

    media = docs.mapInPandas(
        encode,
        schema=("doc_id long, media_type string, blob binary, "
                "meta_format string, n_bytes long"))
    out = probe_audio_containers(media)
    return out.select(
        "doc_id", "container", "codec", "sample_rate", "channels",
        "bits_per_sample", "bitrate_kbps", "n_frames", "n_samples",
        "n_blocks", "duration_ms", "status")


SQL_MULTIMODAL_OGG_PROBE = """
SELECT doc_id,
       'ogg' AS container,
       CASE WHEN doc_id % 2 = 0 THEN 'opus' ELSE 'vorbis' END AS codec,
       CAST(CASE WHEN doc_id % 2 = 0
                 THEN (CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 12000
                       WHEN 2 THEN 16000 WHEN 3 THEN 24000 ELSE 48000 END)
                 ELSE (CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                       ELSE 32000 END) END AS INTEGER) AS sample_rate,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS INTEGER)
           AS channels,
       CAST(NULL AS INTEGER) AS bits_per_sample,
       CAST(NULL AS INTEGER) AS bitrate_kbps,
       CAST(1 + (1 + doc_id % 5) * (1 + doc_id % 3) AS BIGINT)
           AS n_frames,
       CAST((CASE WHEN doc_id % 2 = 0 THEN 960 ELSE 1024 END)
            * (10 + doc_id % 50) AS BIGINT) AS n_samples,
       CAST(2 + doc_id % 5 AS INTEGER) AS n_blocks,
       CAST(((CASE WHEN doc_id % 2 = 0 THEN 960 ELSE 1024 END)
             * (10 + doc_id % 50)) * 1000
            // (CASE WHEN doc_id % 2 = 0 THEN 48000
                ELSE (CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                      ELSE 32000 END) END) AS BIGINT) AS duration_ms,
       'probed' AS status
FROM documents
"""


DATAPIPE_QUERIES.update({
    "multimodal_ogg_probe": q_multimodal_ogg_probe,
})
DATAPIPE_ORACLES.update({
    "multimodal_ogg_probe": SQL_MULTIMODAL_OGG_PROBE,
})
