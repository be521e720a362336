"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode/feature-extract kernels (PIL/librosa/ffmpeg) are NOT in this
container, so the decode step is a clearly-marked stub behind
``SEQUIN_FAKE_DECODE``: with the flag (default here) it produces
deterministic fake features so the Spark-side plumbing — binary schema,
Arrow batch transfer through mapInPandas, partitioning, output schema —
is real and tested end-to-end; without it, it raises NotImplementedError
at the exact point a real decoder plugs in.

At 100 TB: binary payloads make rows wide → keep
spark.sql.files.maxPartitionBytes moderate, select() metadata columns
without the blob wherever possible (column pruning drops the bytes at
the scan), and let mapInPandas stream Arrow batches (never collect).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, blob binary, meta_format string, n_bytes long"
)

DECODED_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width int, height int, "
    "n_frames int, sample_rate int, status string"
)

FAKE_DECODE = os.environ.get("SEQUIN_FAKE_DECODE", "1") == "1"


def attach_media(df: DataFrame, payload_col: str, media_type: str = "image") -> DataFrame:
    """Shape a table as a media table: payload → opaque binary blob +
    typed metadata columns (the engine never interprets the bytes)."""
    blob = F.col(payload_col).cast("binary")
    return df.select(
        F.col("doc_id"),
        F.lit(media_type).alias("media_type"),
        blob.alias("blob"),
        F.lit("raw").alias("meta_format"),
        F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
    )


def _decode_batch(batch: pd.DataFrame, fake: bool) -> pd.DataFrame:
    if not fake:
        raise NotImplementedError(
            "real media decode requires PIL/librosa/ffmpeg — not available in "
            "this container; set SEQUIN_FAKE_DECODE=1 for the deterministic stub"
        )
    n = batch["n_bytes"]
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "media_type": batch["media_type"],
            "n_bytes": n,
            # deterministic fake dimensions derived from payload size —
            # stands in for image decode (width/height), video (frames),
            # audio (sample rate)
            "width": (n % 640 + 1).astype("int32"),
            "height": (n % 480 + 1).astype("int32"),
            "n_frames": (n % 24 + 1).astype("int32"),
            "sample_rate": pd.Series([16000] * len(batch), index=batch.index, dtype="int32"),
            "status": "stub_decoded",
        }
    )


def decode_media(media: DataFrame, fake: bool | None = None) -> DataFrame:
    """Decode/feature-extract via Arrow-batched mapInPandas.

    The blob column rides through Arrow untouched; at scale each task
    decodes its partition's batches independently (embarrassingly
    parallel, no shuffle). ``fake`` is captured in the task closure so
    the flag travels to executors (a module global would be re-read
    from the env on each worker).
    """
    import sequin_spark.datapipe.multimodal as _mm

    fake_flag = _mm.FAKE_DECODE if fake is None else fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _decode_batch(batch, fake_flag)

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling plan for video blobs: explode per-frame rows from
    the fake frame count (real impl: ffmpeg keyframe extraction in the
    same mapInPandas shape)."""
    decoded = decode_media(media)
    return decoded.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
    )
