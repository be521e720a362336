"""Deduplication operators for document corpora.

All hash arithmetic is md5-based (portable, deterministic) and runs as
Catalyst expressions inside whole-stage codegen. The LSH variants bound
pairwise work by bucketing before the self-join, which is what keeps
them tractable at 100 TB: the only shuffle is groupBy(doc) for
signatures plus a join keyed on (band, band_key) whose fan-out is the
bucket size, never O(n²).
"""

from __future__ import annotations

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
    """Array of k-word shingles from a token array (0-based Spark SQL)."""
    idx = ", ".join(f"{words_col}[i - 1 + {j}]" for j in range(k))
    return F.expr(
        f"transform(sequence(1, size({words_col}) - {k - 1}), i -> concat_ws(' ', {idx}))"
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n_hashes: int = 8, shingle_k: int = 3,
) -> DataFrame:
    """MinHash signature per document: sig_j = min over shingles of
    md5('{j}|' + shingle). Lexicographic min over md5 hex approximates a
    random permutation per j."""
    toks = df.select(
        F.col(id_col),
        F.split(normalized(text_col), " ").alias("w"),
    ).withColumn("sh", F.explode(word_shingles("w", shingle_k)))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("sh")))).alias(f"sig{j}")
        for j in range(1, n_hashes + 1)
    ]
    return toks.groupBy(id_col).agg(*aggs)


def minhash_candidate_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    bands: int = 4, rows_per_band: int = 2, shingle_k: int = 3,
) -> DataFrame:
    """LSH banding: band key = concatenated signature rows; documents
    sharing any band key are candidate near-duplicates.

    Returns distinct (doc_a, doc_b) with doc_a < doc_b. The self-join is
    keyed on (band, key) — fan-out bounded by bucket occupancy.
    """
    n_hashes = bands * rows_per_band
    sig = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k)
    band_structs = []
    for b in range(1, bands + 1):
        parts = [F.col(f"sig{(b - 1) * rows_per_band + r}") for r in range(1, rows_per_band + 1)]
        band_structs.append(F.struct(F.lit(b).alias("band"), F.concat(*parts).alias("key")))
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
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
    toks = df.select(F.col(id_col), F.explode(F.split(normalized(text_col), " ")).alias("tok"))
    toks = toks.withColumn("h", F.md5(F.col("tok")))
    for p in range(1, hex_digits + 1):
        toks = toks.withColumn(
            f"d{p}", F.expr(f"instr('0123456789abcdef', substr(h, {p}, 1)) - 1")
        )
    aggs = []
    nbits = 4 * hex_digits
    for j in range(nbits):
        p, k = j // 4 + 1, j % 4
        aggs.append(
            F.sum(
                F.when(F.expr(f"(shiftright(d{p}, {k}) & 1) = 1"), F.lit(1)).otherwise(F.lit(-1))
            ).alias(f"c{j}")
        )
    sums = toks.groupBy(id_col).agg(*aggs)
    fp = None
    for j in range(nbits):
        bit = F.when(F.col(f"c{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = bit if fp is None else (fp + bit)
    return sums.select(F.col(id_col), fp.cast("long").alias("simhash"))


def simhash_near_pairs(sim: DataFrame, id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by Hamming distance on simhash fingerprints.

    Demo path is a self-join; the scale path buckets on fingerprint
    chunks first (any pair within distance d shares at least one of d+1
    chunks — pigeonhole), keeping the join bounded.
    """
    a, b = sim.alias("a"), sim.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            "hamming",
        )
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
