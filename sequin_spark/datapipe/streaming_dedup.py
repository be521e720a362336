"""Streaming corpus ingestion with incremental dedup — the continuous
version of ``incremental_dedup``: documents arrive as a stream, each
micro-batch is deduplicated against the persisted corpus index, and
novel documents extend the index for the NEXT batch.

The shape a 100 TB crawl-ingest pipeline needs:

* per batch, new docs probe the band-partitioned index on (band, key)
  — cost O(|batch| × bucket occupancy), independent of corpus size;
* the index grows by APPEND (parquet append into the band partitions,
  never a rewrite of the accumulated corpus);
* within-batch duplicates resolve inside the batch (exact-hash keep-
  smallest, then the batch's own band self-join), so two copies
  arriving together don't both register as novel;
* crash-safety comes from Structured Streaming checkpointing: a
  replayed batch re-probes the index and finds its own docs already
  registered — reported as duplicates of themselves, filtered by id
  equality — so the outcome is idempotent.

Composition of existing pieces: datapipe.dedup's DedupIndex /
build_dedup_index / incremental_dedup + foreachBatch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sequin_spark.datapipe.dedup import (
    DedupIndex,
    build_dedup_index,
    incremental_dedup,
    normalized,
)


def _index_exists(path: str) -> bool:
    return os.path.isdir(os.path.join(path, "bands"))


def _append_index(index: DedupIndex, path: str) -> None:
    """Append novel docs' rows into the persisted index (parquet append
    into the band partitions — no rewrite of the accumulated corpus)."""
    index.bands.write.mode("append").partitionBy("band").parquet(
        os.path.join(path, "bands"))
    index.grams.write.mode("append").parquet(os.path.join(path, "grams"))


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Dedup one batch against the persisted index, register novel docs.

    Returns one row per input doc:
    (doc_id, duplicate_of nullable, jaccard nullable, is_novel).
    ``duplicate_of`` prefers a corpus match; failing that, the smallest
    exact-duplicate id within the batch.
    """
    # 1. within-batch exact dedup: keep the smallest id per content hash
    hashed = batch.withColumn("_h", F.md5(normalized(text_col)))
    keeper = hashed.groupBy("_h").agg(F.min(id_col).alias("_keep"))
    batch_flagged = hashed.join(F.broadcast(keeper), "_h").withColumn(
        "_batch_dup_of",
        F.when(F.col(id_col) != F.col("_keep"), F.col("_keep")),
    )
    uniques = batch_flagged.filter(F.col("_batch_dup_of").isNull()).select(
        id_col, text_col)
    # 2. within-batch near-dups among the uniques: dedup the batch
    # against ITSELF (verified Jaccard path); every doc matches itself,
    # so duplicate_of != id marks a near-dup of a smaller batch id
    self_dup = incremental_dedup(
        uniques, corpus=uniques, text_col=text_col, id_col=id_col,
        threshold=threshold,
    ).select(
        F.col(id_col),
        F.when(F.col("duplicate_of") != F.col(id_col),
               F.col("duplicate_of")).alias("_near_dup_of"),
    )
    # 3. probe the persisted corpus index
    if _index_exists(index_path):
        idx = DedupIndex.load(spark, index_path, id_col)
        vs_corpus = incremental_dedup(
            uniques, index=idx, text_col=text_col, id_col=id_col,
            threshold=threshold)
        # idempotent replay: a doc already registered matches itself
        vs_corpus = vs_corpus.withColumn(
            "duplicate_of",
            F.when(F.col("duplicate_of") == F.col(id_col), None)
            .otherwise(F.col("duplicate_of")))
    else:
        vs_corpus = uniques.select(
            F.col(id_col),
            F.lit(None).cast("long").alias("duplicate_of"),
            F.lit(None).cast("double").alias("jaccard"),
        )
    resolved = (
        vs_corpus.join(self_dup, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("duplicate_of"), F.col("_near_dup_of"))
            .alias("duplicate_of"),
            F.col("jaccard"),
        )
        .withColumn("is_novel", F.col("duplicate_of").isNull())
    ).localCheckpoint()  # settle novelty BEFORE the index mutates
    # 4. register novel docs for the next batch
    novel = uniques.join(
        resolved.filter(F.col("is_novel")).select(id_col), id_col)
    novel_index = build_dedup_index(novel, text_col, id_col)
    _append_index(novel_index, index_path)
    # 5. full per-doc report (batch dups fold back in)
    report = (
        batch_flagged.select(id_col, "_batch_dup_of")
        .join(resolved, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("duplicate_of"), F.col("_batch_dup_of"))
            .alias("duplicate_of"),
            F.col("jaccard"),
            F.coalesce(F.col("is_novel"), F.lit(False)).alias("is_novel"),
        )
    )
    return report


def start_dedup_stream(
    stream: DataFrame,
    index_path: str,
    output_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    trigger_seconds: float | None = None,
):
    """readStream of documents → per-batch incremental dedup → parquet
    report; the index advances batch-over-batch."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        report = ingest_batch(
            spark, batch_df, index_path, text_col, id_col, threshold)
        (report.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(output_path))

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir)
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
