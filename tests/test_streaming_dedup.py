"""Streaming corpus ingestion with incremental dedup
(datapipe/streaming_dedup.py): batch-over-batch index growth, within-
batch exact + near dedup, corpus probing, idempotent replay, and a
live Structured Streaming e2e over a file source."""

import os

from sequin_spark.datapipe.streaming_dedup import (
    ingest_batch,
    start_dedup_stream,
)

BASE = "the quick brown fox jumps over the lazy dog again and again"
NEAR = "the quick brown fox jumps over the lazy dog again and once more"
OTHER = "completely different content about spark query engines at scale"
THIRD = "yet another unique document mentioning streams and windows"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ingest_first_batch_all_novel_plus_batch_dups(spark, tmp_path):
    idx = str(tmp_path / "idx")
    batch = _df(spark, [(1, BASE), (2, OTHER), (3, BASE), (4, NEAR)])
    out = {r["doc_id"]: r for r in
           ingest_batch(spark, batch, idx).collect()}
    assert out[1]["is_novel"] and out[2]["is_novel"]
    # 3 is an exact copy of 1 (within batch)
    assert out[3]["duplicate_of"] == 1 and not out[3]["is_novel"]
    # 4 is a near-dup of 1 (within batch, verified jaccard)
    assert out[4]["duplicate_of"] == 1 and not out[4]["is_novel"]
    # only the two novel docs registered
    bands = spark.read.parquet(os.path.join(idx, "bands"))
    assert set(r["doc_id"] for r in
               bands.select("doc_id").distinct().collect()) == {1, 2}


def test_ingest_second_batch_probes_corpus(spark, tmp_path):
    idx = str(tmp_path / "idx")
    ingest_batch(spark, _df(spark, [(1, BASE), (2, OTHER)]), idx)
    out = {r["doc_id"]: r for r in ingest_batch(
        spark, _df(spark, [(10, NEAR), (11, THIRD)]), idx).collect()}
    # 10 near-dups the batch-1 corpus doc; 11 is novel
    assert out[10]["duplicate_of"] == 1 and not out[10]["is_novel"]
    assert out[10]["jaccard"] is not None and out[10]["jaccard"] >= 0.5
    assert out[11]["is_novel"]
    # a third batch now dups against batch 2's registration
    out3 = {r["doc_id"]: r for r in ingest_batch(
        spark, _df(spark, [(20, THIRD)]), idx).collect()}
    assert out3[20]["duplicate_of"] == 11


def test_ingest_replay_is_idempotent(spark, tmp_path):
    """A crashed-and-replayed batch must not flag its own docs as
    duplicates of themselves."""
    idx = str(tmp_path / "idx")
    batch = _df(spark, [(1, BASE), (2, OTHER)])
    first = {r["doc_id"]: r["is_novel"]
             for r in ingest_batch(spark, batch, idx).collect()}
    assert first == {1: True, 2: True}
    replay = {r["doc_id"]: r for r in
              ingest_batch(spark, batch, idx).collect()}
    # self-matches are filtered; the docs aren't novel the second time
    # (already registered) but aren't duplicates of other docs either
    assert replay[1]["duplicate_of"] is None
    assert replay[2]["duplicate_of"] is None


def test_streaming_e2e_two_microbatches(spark, tmp_path):
    """File-source stream: two parquet drops become two micro-batches;
    the second batch dedups against the first's index state."""
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    outp = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    _df(spark, [(1, BASE), (2, OTHER)]).coalesce(1).write.mode(
        "append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = start_dedup_stream(stream, idx, outp, ckpt)
    try:
        q.processAllAvailable()
        _df(spark, [(10, NEAR), (11, THIRD)]).coalesce(1).write.mode(
            "append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    report = {r["doc_id"]: r for r in spark.read.parquet(outp).collect()}
    assert len(report) == 4
    assert report[1]["is_novel"] and report[2]["is_novel"]
    assert report[10]["duplicate_of"] == 1
    assert report[11]["is_novel"]
    # batch ids recorded per micro-batch
    assert report[1]["batch_id"] != report[10]["batch_id"]
