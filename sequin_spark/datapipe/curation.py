"""Corpus curation at scale: budgeted sampling and sequence packing.

The two operations every LLM pretraining pipeline runs after
filter/dedup (no reference analog — beyond-reference training-data
surface, like datapipe/dedup.py):

- ``sample_to_budget``: draw a deterministic per-stratum sample hitting
  a token budget with mixing weights ("50% en, 12.5% each of de/es/fr/
  zh of a 2B-token budget"). Selection is a pure hash predicate —
  ``h(doc) < rate`` — so it's a single scan with a broadcast of
  per-stratum rates: reproducible, rerunnable, no RNG state, no sort.
- ``pack_sequences``: concat-and-chunk packing (GPT-style) — documents
  are laid out into a token stream and sliced into fixed-length
  training sequences. Global packing is a serial scan; the scale form
  packs WITHIN hash buckets (bucket = doc_id % n), which is how real
  pipelines shard packing across workers: one shuffle on the bucket
  key, a running-sum window per bucket, never a global sort.

All arithmetic is md5/integer-based so a SQL oracle reproduces results
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sequin_spark.datapipe.dedup import normalized

# 16-bit hash from the first 4 md5 hex chars — uniform on [0, 65536)
_HASH_SPAN = 65536


def _h16(col):
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("long")


def sample_to_budget(
    df: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic stratified sample targeting ``budget_tokens``
    split by ``weights`` across strata. Keep rule:
    ``h16(id) < floor(min(1, target/total) * 65536)`` — the per-stratum
    totals are one aggregation (tiny result, broadcast back), then
    selection is a narrow scan. Docs in strata without a weight drop.
    Returns the sampled rows + their token counts and the stratum rate.
    """
    toks = F.size(F.split(normalized(text_col), " "))
    base = df.select(F.col(id_col), F.col(stratum_col).alias("stratum"), toks.alias("n_tokens"))
    totals = base.groupBy("stratum").agg(F.sum("n_tokens").cast("long").alias("total_tokens"))
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    frac = wmap[F.col("stratum")] * budget_tokens / F.col("total_tokens")
    # NB: least() SKIPS nulls — guard explicitly so an unweighted
    # stratum stays null (and drops) instead of sampling at rate 1.0
    rated = totals.withColumn(
        "rate_scaled",
        F.floor(
            F.when(frac.isNotNull(), F.least(F.lit(1.0), frac)) * _HASH_SPAN
        ).cast("long"),
    ).filter(F.col("rate_scaled").isNotNull())
    return (
        base.join(F.broadcast(rated), "stratum")
        .filter(_h16(F.col(id_col)) < F.col("rate_scaled"))
        .select(id_col, "stratum", "n_tokens", "rate_scaled")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int = 512,
    n_buckets: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk packing within hash buckets: each doc gets its
    byte... token offset in its bucket's stream; training sequence id =
    offset div seq_len (a doc may straddle two sequences — standard
    GPT-style packing; document-boundary-respecting packing is the
    ``offset`` output consumed with an attention mask).

    One shuffle (by bucket), one running-sum window per bucket ordered
    by doc id. At 100 TB: buckets ≫ executors give even packing
    parallelism; no global ordering exists or is needed.
    """
    toks = F.size(F.split(normalized(text_col), " "))
    base = df.select(
        F.col(id_col),
        (F.col(id_col) % n_buckets).alias("bucket"),
        toks.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.select(
        id_col,
        "bucket",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long").alias("offset"),
    ).withColumn("seq_id", (F.col("offset") / seq_len).cast("long"))
