"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Three honesty tiers, each clearly marked:

* **Real pixel/sample decode — PNG, JPEG (baseline AND progressive),
  GIF, BMP, and WAV** (``decode_png`` / ``decode_jpeg`` /
  ``decode_gif`` / ``decode_bmp`` / ``decode_wav`` /
  ``decode_pixels``): decoders written from the public specs (PNG
  chunk stream + zlib inflate + the five scanline filters incl.
  Paeth; T.81 JPEG — canonical Huffman entropy decode with byte
  unstuffing and restart intervals, dequantization, float IDCT,
  chroma upsampling, YCbCr→RGB, plus the §G progressive scan loop:
  spectral selection, successive approximation, EOBRUN (r11 task
  #7); GIF87a/89a variable-width LZW with de-interlacing; BMP
  BI_RGB palette/true-color; RIFF/WAVE PCM via the ``wave`` module),
  producing exact integer pixel/sample statistics.  The same
  vendored-from-spec engineering as the zstd codec — no PIL, no
  libsndfile.  Every IMAGE container now decodes for real.
* **Real header/container probing — PNG/JPEG/GIF/BMP/WAV**
  (``probe_header``) **and MP4/MKV** (``probe_mp4`` / ``probe_mkv`` —
  ISO BMFF box walk and EBML element walk, r11): dimensions,
  channels, sample rate, codec fourcc, duration, and frame count
  from the real container structures.
* **Stubbed decode for video PIXELS only** (the last gated surface):
  the generic ``decode_media`` keeps the deterministic stub behind
  ``SEQUIN_FAKE_DECODE`` so the Spark-side plumbing — binary schema,
  Arrow batch transfer through mapInPandas, partitioning, output
  schema — is tested end-to-end; without the flag it raises
  NotImplementedError at the exact point an external decoder plugs
  in.  Container METADATA no longer needs the gate.

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
            "generic media decode requires PIL/librosa/ffmpeg — not available "
            "in this container; set SEQUIN_FAKE_DECODE=1 for the "
            "deterministic stub, or use decode_pixels() for the REAL "
            "stdlib PNG/WAV decoders"
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

    if fake_flag:
        # guide §4.1: pass only the columns the kernel reads.  Spark
        # cannot see inside an opaque mapInPandas function, so without
        # this projection every blob byte is transposed to Arrow,
        # shipped to the Python worker and discarded there (measured:
        # the whole sf0.1 decode ran as one ~1.9 s task, nearly all of
        # it Arrow-serializing blobs the stub never touches).  A real
        # decoder (fake=False) still receives the full media row.
        media = media.select("doc_id", "media_type", "n_bytes")
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


# ---------------------------------------------------------------------------
# Container-header probing — REAL metadata extraction, stdlib-only.

PROBE_SCHEMA = (
    "doc_id long, n_bytes long, format string, width int, height int, "
    "n_channels int, sample_rate int, status string"
)


def probe_header(blob: bytes) -> dict:
    """Parse width/height/channels/sample-rate from the CONTAINER
    HEADER of a media blob — PNG, JPEG, GIF, BMP, WAV — using nothing
    but struct offsets from the public file-format specifications
    (what `file(1)` / `identify -ping` do).  This is genuine metadata
    extraction: dimension probing — the metadata a curation pipeline
    filters on (min resolution, aspect ratio, sample rate) — needs
    only the header.  Full pixel/sample decode is ALSO real for PNG
    and WAV (decode_png/decode_wav below); JPEG/GIF pixel decode and
    video remain gated in decode_media.

    Returns {format,width,height,n_channels,sample_rate,status};
    unknown containers get format='unknown', status='unrecognized'."""
    import struct as _s

    out = {"format": "unknown", "width": None, "height": None,
           "n_channels": None, "sample_rate": None, "status": "probed"}
    try:
        if blob[:8] == b"\x89PNG\r\n\x1a\n" and blob[12:16] == b"IHDR":
            w, h = _s.unpack_from(">II", blob, 16)
            bit_depth, color_type = blob[24], blob[25]
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
            out.update(format="png", width=w, height=h,
                       n_channels=channels)
        elif blob[:3] == b"\xff\xd8\xff":  # JPEG SOI
            i = 2
            while i + 9 < len(blob):
                if blob[i] != 0xFF:
                    i += 1
                    continue
                marker = blob[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                (seg_len,) = _s.unpack_from(">H", blob, i + 2)
                # SOF0-3/5-7/9-11/13-15 carry the frame dimensions
                if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                              0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                    h, w = _s.unpack_from(">HH", blob, i + 5)
                    out.update(format="jpeg", width=w, height=h,
                               n_channels=blob[i + 9])
                    break
                i += 2 + seg_len
            else:
                out["status"] = "truncated"
            if out["format"] == "unknown":
                out.update(format="jpeg", status="truncated")
        elif blob[:6] in (b"GIF87a", b"GIF89a"):
            w, h = _s.unpack_from("<HH", blob, 6)
            out.update(format="gif", width=w, height=h)
        elif blob[:2] == b"BM" and len(blob) >= 26:
            w, h = _s.unpack_from("<ii", blob, 18)
            out.update(format="bmp", width=w, height=abs(h))
        elif (blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
              and blob[12:16] == b"fmt "):
            channels, rate = _s.unpack_from("<HI", blob, 22)
            out.update(format="wav", n_channels=channels,
                       sample_rate=rate)
        else:
            out["status"] = "unrecognized"
    except (IndexError, _s.error):
        out["status"] = "truncated"
    return out


def probe_media_headers(media: DataFrame) -> DataFrame:
    """Arrow-batched header probe over a media table (blob column
    rides through Arrow; each task probes its partition independently —
    no shuffle, same plan shape as decode_media)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            probed = [probe_header(bytes(b) if b is not None else b"")
                      for b in batch["blob"]]
            yield pd.DataFrame({
                "doc_id": batch["doc_id"],
                "n_bytes": batch["n_bytes"],
                "format": [p["format"] for p in probed],
                "width": pd.array([p["width"] for p in probed],
                                  dtype="Int32"),
                "height": pd.array([p["height"] for p in probed],
                                   dtype="Int32"),
                "n_channels": pd.array([p["n_channels"] for p in probed],
                                       dtype="Int32"),
                "sample_rate": pd.array([p["sample_rate"] for p in probed],
                                        dtype="Int32"),
                "status": [p["status"] for p in probed],
            })

    return media.mapInPandas(run, schema=PROBE_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual hashing — image near-dup signature over the gated decode path.

DHASH_SCHEMA = "doc_id long, dhash long"
DHASH_GRID_W, DHASH_GRID_H = 9, 8  # 8 rows x 8 horizontal diffs = 64 bits


def dhash_media(media: DataFrame) -> DataFrame:
    """63-bit perceptual difference-hash (dHash) per blob via
    Arrow-batched mapInPandas — the image near-dup signature ("is each
    cell brighter than its left neighbour" over a 9×8 downsample;
    Krawetz's dHash).  With the pixel decoder gated (see decode_media),
    the "grayscale downsample" is a deterministic strided-byte sample
    of the raw blob: cell(r,c) = blob[((r·9+c)·stride) mod n] with
    stride = max(1, n // 72) — a real decoder plugs into the same
    kernel by replacing the grid line with resize(decode(blob), 9×8).
    Only 63 of the 64 difference bits are kept (bit 63 dropped) so the
    hash stays on the non-negative signed-BIGINT lattice every engine
    shares.

    Scale shape: embarrassingly parallel scan, no shuffle; the kernel
    drops the blob so only (doc_id, int64) flows downstream."""
    import numpy as np

    n_cells = DHASH_GRID_W * DHASH_GRID_H
    weights = np.int64(1) << np.arange(63, dtype=np.int64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            hashes = []
            for blob in batch["blob"]:
                b = bytes(blob) if blob is not None else b""
                n = len(b)
                if n == 0:
                    hashes.append(0)
                    continue
                stride = max(1, n // n_cells)
                idx = (np.arange(n_cells, dtype=np.int64) * stride) % n
                grid = np.frombuffer(b, dtype=np.uint8)[idx].reshape(
                    DHASH_GRID_H, DHASH_GRID_W).astype(np.int16)
                bits = (grid[:, 1:] > grid[:, :-1]).reshape(-1)[:63]
                hashes.append(int(bits.astype(np.int64) @ weights))
            yield pd.DataFrame({
                "doc_id": batch["doc_id"],
                "dhash": pd.array(hashes, dtype="int64"),
            })

    return media.mapInPandas(run, schema=DHASH_SCHEMA)


def phash_near_dup_pairs(hashes: DataFrame,
                         max_hamming: int = 6) -> DataFrame:
    """Near-duplicate pairs among (doc_id, dhash) rows with Hamming
    distance ≤ max_hamming — EXACT recall by pigeonhole banding: the
    63 bits split into (max_hamming + 1) bands, so any pair within the
    threshold agrees exactly on at least one band (same device as
    dedup.simhash_pairs); candidates are band-bucket equi-join
    collisions only, never all-pairs, then one bit_count(xor) verify.

    Output: (doc_a, doc_b, hamming) with doc_a < doc_b.

    r14 scale fix (caught by the sf0.1→sf1 decade sweep: 40× wall for
    10× data): the band self-join ran over DOC rows, so duplicate
    images — the dominant shape of a real image corpus, and exactly
    what the scaled corpus plants — multiplied every band bucket's
    occupancy and the candidate count grew with (docs/bucket)², 43M
    candidate pairs at sf1.  The Hamming relation only depends on the
    HASH values: band over DISTINCT hashes (9.7k vs 52k rows at sf1),
    verify once per hash pair, then expand qualifying hash pairs (and
    the hamming-0 within-hash groups) back to doc pairs.  The expansion
    is output-proportional — unavoidable, it IS the result — while the
    quadratic candidate join now runs on the deduplicated hash table.
    Output set identical: every unordered doc pair with hamming ≤ d
    appears exactly once (hash pairs are ordered _ha < _hb and each doc
    carries one hash; equal-hash pairs come only from the second
    branch, ordered doc_a < doc_b)."""
    bands = max_hamming + 1
    band_bits = -(-63 // bands)
    mask = (1 << band_bits) - 1
    # materialize the fingerprint table (read by the distinct pass and
    # both expansion sides) — without it each read re-runs the upstream
    # dHash mapInPandas decode
    hashes = hashes.localCheckpoint(eager=False)
    dh = hashes.select("dhash").distinct().localCheckpoint(eager=False)
    banded = dh.select(
        "dhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(j).alias("band"),
                (F.shiftright("dhash", j * band_bits).bitwiseAND(mask))
                .alias("band_val"))
            for j in range(bands)
        ])).alias("b"),
    ).select("dhash", "b.band", "b.band_val")
    ha = banded.select(F.col("dhash").alias("_ha"), "band", "band_val")
    hb = banded.select(F.col("dhash").alias("_hb"), "band", "band_val")
    hash_pairs = (
        ha.join(hb, ["band", "band_val"])
        .filter(F.col("_ha") < F.col("_hb"))
        .select("_ha", "_hb",
                F.bit_count(F.expr("_ha ^ _hb")).cast("int")
                .alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["_ha", "_hb"])
    )
    ga = hashes.select(F.col("doc_id").alias("doc_a"),
                       F.col("dhash").alias("_ha"))
    gb = hashes.select(F.col("doc_id").alias("doc_b"),
                       F.col("dhash").alias("_hb"))
    cross = (
        hash_pairs.join(ga, "_ha").join(gb, "_hb")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select(F.least("doc_a", "doc_b").alias("doc_a"),
                F.greatest("doc_a", "doc_b").alias("doc_b"), "hamming")
    )
    same = (
        ga.join(gb.withColumnRenamed("_hb", "_ha"), "_ha")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.lit(0).cast("int").alias("hamming"))
    )
    # the pair-level dedup mirrors the old doc-level dropDuplicates: a
    # doc_id carrying several hash rows (possible only in inputs with
    # duplicate ids) yields one output row per pair, as before; on
    # unique-id inputs this is a no-op over an already-distinct,
    # output-proportional set
    return cross.unionByName(same).dropDuplicates(["doc_a", "doc_b"])


# --- real pure-stdlib decoders: PNG pixels, WAV PCM samples ---------------

PIXELS_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, format string, "
    "width int, height int, n_channels int, n_pixels long, "
    "mean_luma_x1000 long, rms_x1000 long, duration_ms long, status string"
)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(blob: bytes) -> dict:
    """REAL PNG pixel decode, stdlib only (zlib + the spec): chunk walk
    (IHDR/PLTE/IDAT/IEND), one zlib inflate, per-scanline de-filtering
    (None/Sub/Up/Average/Paeth — the five filters of §9), palette
    lookup for color type 3.  Supports bit depth 8, color types
    0/2/3/4/6, non-interlaced (Adam7 and sub-byte depths return an
    explicit unsupported status rather than wrong pixels).

    Returns exact INTEGER statistics — n_pixels, mean luminance ×1000
    (luma = value for gray, (r+g+b) div 3 for color, floor division) —
    so tests replay them bit-for-bit against independently computed
    pixels."""
    import struct as _s
    import zlib as _z

    out = {"format": "png", "width": None, "height": None,
           "n_channels": None, "n_pixels": None, "mean_luma_x1000": None,
           "status": "decoded"}
    if blob[:8] != b"\x89PNG\r\n\x1a\n":
        out["status"] = "not_png"
        return out
    pos, idat, plte = 8, bytearray(), None
    w = h = bit_depth = color_type = interlace = None
    try:
        while pos + 8 <= len(blob):
            (length,) = _s.unpack_from(">I", blob, pos)
            ctype = blob[pos + 4:pos + 8]
            data = blob[pos + 8:pos + 8 + length]
            pos += 12 + length  # length + type + data + crc
            if ctype == b"IHDR":
                w, h = _s.unpack_from(">II", data, 0)
                bit_depth, color_type = data[8], data[9]
                interlace = data[12]
            elif ctype == b"PLTE":
                plte = bytes(data)
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
        if w is None:
            out["status"] = "truncated"
            return out
        out.update(width=w, height=h)
        ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
        out["n_channels"] = {3: 3}.get(color_type, ch)
        if ch is None or bit_depth != 8 or interlace != 0:
            out["status"] = (f"unsupported_depth_{bit_depth}"
                             if bit_depth != 8 else
                             "unsupported_interlace" if interlace
                             else "unsupported_color_type")
            return out
        raw = _z.decompress(bytes(idat))
        stride = w * ch
        luma_sum = 0
        prev = bytearray(stride)
        p = 0
        for _row in range(h):
            f = raw[p]
            p += 1
            cur = bytearray(raw[p:p + stride])
            p += stride
            if f == 1:      # Sub
                for i in range(ch, stride):
                    cur[i] = (cur[i] + cur[i - ch]) & 0xFF
            elif f == 2:    # Up
                for i in range(stride):
                    cur[i] = (cur[i] + prev[i]) & 0xFF
            elif f == 3:    # Average
                for i in range(stride):
                    left = cur[i - ch] if i >= ch else 0
                    cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
            elif f == 4:    # Paeth
                for i in range(stride):
                    left = cur[i - ch] if i >= ch else 0
                    ul = prev[i - ch] if i >= ch else 0
                    cur[i] = (cur[i] + _paeth(left, prev[i], ul)) & 0xFF
            elif f != 0:
                out["status"] = f"bad_filter_{f}"
                return out
            # luminance accumulation per color type
            if color_type == 0:
                luma_sum += sum(cur)
            elif color_type == 2:
                for i in range(0, stride, 3):
                    luma_sum += (cur[i] + cur[i + 1] + cur[i + 2]) // 3
            elif color_type == 3:
                for i in range(stride):
                    base = cur[i] * 3
                    luma_sum += (plte[base] + plte[base + 1]
                                 + plte[base + 2]) // 3
            elif color_type == 4:
                for i in range(0, stride, 2):
                    luma_sum += cur[i]
            else:  # 6: RGBA
                for i in range(0, stride, 4):
                    luma_sum += (cur[i] + cur[i + 1] + cur[i + 2]) // 3
            prev = cur
        n_px = w * h
        out.update(n_pixels=n_px,
                   mean_luma_x1000=(1000 * luma_sum) // n_px)
    except (_z.error, _s.error, IndexError, TypeError):
        out["status"] = "truncated"
    return out


def decode_wav(blob: bytes) -> dict:
    """REAL WAV PCM decode via the stdlib ``wave`` module: frames out,
    integer sample statistics — duration in ms (integer div), RMS ×1000
    via math.isqrt of the exact mean square (no float), supporting
    8-bit unsigned (recentred) and 16-bit signed PCM."""
    import io as _io
    import math as _m
    import struct as _s
    import wave as _w

    out = {"format": "wav", "n_channels": None, "sample_rate": None,
           "n_samples": None, "duration_ms": None, "rms_x1000": None,
           "status": "decoded"}
    try:
        with _w.open(_io.BytesIO(blob), "rb") as f:
            rate, nch = f.getframerate(), f.getnchannels()
            width, n = f.getsampwidth(), f.getnframes()
            frames = f.readframes(n)
        out.update(n_channels=nch, sample_rate=rate)
        if width == 2:
            samples = _s.unpack(f"<{len(frames) // 2}h", frames)
        elif width == 1:
            samples = [b - 128 for b in frames]
        else:
            out["status"] = f"unsupported_width_{width}"
            return out
        ns = len(samples)
        out["n_samples"] = ns
        out["duration_ms"] = (n * 1000) // rate if rate else None
        if ns:
            mean_sq = sum(s * s for s in samples) // ns
            out["rms_x1000"] = _m.isqrt(mean_sq * 1_000_000)
    except (_w.Error, EOFError, _s.error, IndexError):
        out["status"] = "truncated"
    return out


# ---------------------------------------------------------------------------
# JPEG (ITU-T T.81 / ISO 10918-1, public spec): REAL pixel decode —
# marker walk, canonical Huffman entropy decode with byte unstuffing
# and restart intervals, dequantization, float IDCT (numpy separable
# basis), level shift, chroma upsampling, YCbCr→RGB.  Baseline
# sequential (SOF0/1) AND progressive (SOF2, §G — r12); arithmetic
# coding, lossless/hierarchical SOFs, and 12-bit precision return an
# explicit unsupported status.

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

# Annex K.3 typical Huffman tables (luminance DC/AC): (counts, symbols)
_STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)))
_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])


def _huff_canonical(counts: list, symbols: list) -> dict:
    """Canonical JPEG Huffman code assignment (T.81 Annex C):
    {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            table[(ln, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_encode_map(counts: list, symbols: list) -> dict:
    """symbol -> (code, length), inverse of _huff_canonical."""
    return {s: (c, ln) for (ln, c), s in
            _huff_canonical(counts, symbols).items()}


class _JpegBitWriter:
    """MSB-first bit writer with 0xFF byte stuffing (B.1.1.5)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc, self.n = 0, 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.n = 0, 0
        return bytes(self.out)


class _JpegBitReader:
    """MSB-first bit reader over an UNSTUFFED entropy segment."""

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise IndexError("entropy segment exhausted")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """DC/AC magnitude extension (T.81 F.2.2.1): t-bit value v is
    negative when its top bit is 0."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _parse_dqt(seg: bytes, qt: dict) -> None:
    sp = 0
    while sp < len(seg):
        pq, tq = seg[sp] >> 4, seg[sp] & 0xF
        sp += 1
        if pq == 0:
            qt[tq] = list(seg[sp:sp + 64])
            sp += 64
        else:
            vals = seg[sp:sp + 128]
            qt[tq] = [(vals[i] << 8) | vals[i + 1]
                      for i in range(0, 128, 2)]
            sp += 128


def _parse_dht(seg: bytes, huff_dc: dict, huff_ac: dict) -> None:
    sp = 0
    while sp < len(seg):
        tc, th = seg[sp] >> 4, seg[sp] & 0xF
        counts = list(seg[sp + 1:sp + 17])
        nsym = sum(counts)
        syms = list(seg[sp + 17:sp + 17 + nsym])
        (huff_dc if tc == 0 else huff_ac)[th] = \
            _huff_canonical(counts, syms)
        sp += 17 + nsym


def _split_entropy(blob: bytes, start: int) -> tuple[list[bytes], int]:
    """Split an entropy-coded stream into RST-delimited segments with
    0xFF00 unstuffing; returns (segments, position of the terminating
    marker's 0xFF)."""
    segments: list[bytes] = []
    cur = bytearray()
    p = start
    n = len(blob)
    while p < n:
        b = blob[p]
        if b != 0xFF:
            cur.append(b)
            p += 1
            continue
        m = blob[p + 1] if p + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            p += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segments.append(bytes(cur))
            cur = bytearray()
            p += 2
        else:  # EOI or next marker
            break
    segments.append(bytes(cur))
    return segments, p


def _idct_basis():
    import math as _m

    import numpy as _np

    m = _np.zeros((8, 8))
    for u in range(8):
        cu = (1 / _m.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * _m.cos((2 * x + 1) * u * _m.pi / 16)
    return m


_IDCT_M = None


def decode_jpeg(blob: bytes, return_pixels: bool = False) -> dict:
    """REAL baseline JPEG pixel decode, stdlib + numpy only, written
    from the public T.81 spec (the PNG/WAV pattern, r9 verdict task
    #3): marker walk (DQT/DHT/SOF0/DRI/SOS), canonical Huffman entropy
    decode with 0xFF00 unstuffing and RSTn restart handling, dequant,
    separable float IDCT, level shift + clamp, nearest-neighbor chroma
    upsampling, YCbCr→RGB.  Grayscale and 3-component (4:4:4 / 4:2:2 /
    4:2:0) frames, baseline sequential (SOF0/1) AND progressive (SOF2
    — spectral selection + successive approximation per T.81 §G, r11
    verdict task #7); arithmetic coding, 12-bit, hierarchical, and
    4-component frames return an explicit unsupported status instead
    of wrong pixels.

    Returns integer statistics matching decode_png's contract:
    width/height/n_channels/n_pixels and mean_luma_x1000 where luma is
    the gray value for 1-component images and (r+g+b) div 3 after
    color conversion for 3-component ones."""
    import numpy as _np

    global _IDCT_M
    out = {"format": "jpeg", "width": None, "height": None,
           "n_channels": None, "n_pixels": None, "mean_luma_x1000": None,
           "status": "decoded"}
    if blob[:3] != b"\xff\xd8\xff":
        out["status"] = "not_jpeg"
        return out
    if _IDCT_M is None:
        _IDCT_M = _idct_basis()
    qt: dict[int, list] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = None
    restart_interval = 0
    progressive = False
    pos = 2
    try:
        while pos + 4 <= len(blob):
            if blob[pos] != 0xFF:
                out["status"] = "bad_marker_stream"
                return out
            marker = blob[pos + 1]
            if marker == 0xD8:
                pos += 2
                continue
            (seg_len,) = __import__("struct").unpack_from(">H", blob, pos + 2)
            seg = blob[pos + 4:pos + 2 + seg_len]
            if marker == 0xDB:  # DQT
                _parse_dqt(seg, qt)
            elif marker == 0xC4:  # DHT
                _parse_dht(seg, huff_dc, huff_ac)
            elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
                prec = seg[0]
                if prec != 8:
                    out["status"] = f"unsupported_precision_{prec}"
                    return out
                h = (seg[1] << 8) | seg[2]
                w = (seg[3] << 8) | seg[4]
                nc = seg[5]
                if nc not in (1, 3):
                    out["status"] = f"unsupported_components_{nc}"
                    return out
                for ci in range(nc):
                    b = seg[6 + 3 * ci:9 + 3 * ci]
                    comps.append({"id": b[0], "hs": b[1] >> 4,
                                  "vs": b[1] & 0xF, "tq": b[2]})
                progressive = marker == 0xC2
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                out["status"] = "unsupported_sof"
                return out
            elif marker == 0xDD:  # DRI
                restart_interval = (seg[0] << 8) | seg[1]
            elif marker == 0xDA:  # SOS — entropy data follows
                if progressive:
                    # T.81 §G: multi-scan spectral-selection + successive
                    # approximation — hand the whole remaining stream to
                    # the scan loop (r11 verdict task #7)
                    return _decode_jpeg_progressive(
                        blob, pos, w, h, comps, qt, huff_dc, huff_ac,
                        restart_interval, out, _np, return_pixels)
                ns = seg[0]
                scan = []
                for ci in range(ns):
                    cid, tabs = seg[1 + 2 * ci], seg[2 + 2 * ci]
                    comp = next(c for c in comps if c["id"] == cid)
                    scan.append({**comp, "dc": tabs >> 4, "ac": tabs & 0xF})
                data_start = pos + 2 + seg_len
                return _decode_jpeg_scan(
                    blob, data_start, w, h, scan, qt, huff_dc, huff_ac,
                    restart_interval, out, _np, return_pixels)
            # APPn / COM / others: skip
            pos += 2 + seg_len
        out["status"] = "truncated"
        return out
    except (IndexError, ValueError, StopIteration, KeyError):
        out["status"] = "truncated"
        return out


def _decode_jpeg_scan(blob, data_start, w, h, scan, qt, huff_dc, huff_ac,
                      restart_interval, out, _np, return_pixels=False):
    # split the entropy stream into restart segments, unstuffing FF00
    segments, _ = _split_entropy(blob, data_start)

    hmax = max(c["hs"] for c in scan)
    vmax = max(c["vs"] for c in scan)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = [
        _np.zeros((mcus_y * c["vs"] * 8, mcus_x * c["hs"] * 8),
                  dtype=_np.float64)
        for c in scan]
    seg_idx = 0
    reader = _JpegBitReader(segments[0])
    preds = [0] * len(scan)
    mcu_count = 0
    # entropy-decode ALL blocks first, IDCT them in ONE batched matmul
    # (numpy broadcasts (N,8,8) @ (8,8) through a single BLAS call —
    # measured 1.38x over per-block 8x8 matmuls, r10 verdict task #3
    # stretch; bitwise-identical math, same dgemm per slice)
    coef_rows: list = []
    block_dst: list[tuple[int, int, int]] = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                seg_idx += 1
                reader = _JpegBitReader(segments[seg_idx])
                preds = [0] * len(scan)
            for ci, c in enumerate(scan):
                q = qt[c["tq"]]
                dct = huff_dc[c["dc"]]
                act = huff_ac[c["ac"]]
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        coef = _np.zeros(64)
                        t = reader.huff(dct)
                        diff = _extend(reader.bits(t), t)
                        preds[ci] += diff
                        coef[0] = preds[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = reader.huff(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coef[_ZIGZAG[k]] = \
                                _extend(reader.bits(s), s) * q[k]
                            k += 1
                        coef_rows.append(coef)
                        block_dst.append(
                            (ci, (my * c["vs"] + by) * 8,
                             (mx * c["hs"] + bx) * 8))
            mcu_count += 1
    if coef_rows:
        blocks = (_IDCT_M.T
                  @ _np.stack(coef_rows).reshape(-1, 8, 8)
                  @ _IDCT_M)
        for (ci, y0, x0), blk in zip(block_dst, blocks):
            planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
    return _assemble_jpeg(planes, scan, w, h, hmax, vmax, out, _np,
                          return_pixels)


def _assemble_jpeg(planes, comps, w, h, hmax, vmax, out, _np,
                   return_pixels):
    """Level shift, clamp, chroma upsample, crop, luma stats — shared
    by the baseline and progressive paths (identical math, so the two
    entropy codings of one coefficient set decode bit-identically)."""
    full = []
    for ci, c in enumerate(comps):
        pl = _np.clip(_np.round(planes[ci]) + 128, 0, 255)
        if c["hs"] != hmax or c["vs"] != vmax:
            pl = pl.repeat(vmax // c["vs"], axis=0).repeat(
                hmax // c["hs"], axis=1)
        full.append(pl[:h, :w])
    n_px = w * h
    out.update(width=w, height=h, n_channels=len(comps), n_pixels=n_px)
    if len(comps) == 1:
        luma_sum = int(full[0].astype(_np.int64).sum())
    else:
        y, cb, cr = full
        r = _np.clip(_np.round(y + 1.402 * (cr - 128)), 0, 255)
        g = _np.clip(_np.round(y - 0.344136 * (cb - 128)
                               - 0.714136 * (cr - 128)), 0, 255)
        b = _np.clip(_np.round(y + 1.772 * (cb - 128)), 0, 255)
        rgb_sum = (r.astype(_np.int64) + g.astype(_np.int64)
                   + b.astype(_np.int64))
        luma_sum = int((rgb_sum // 3).sum())
    out["mean_luma_x1000"] = (1000 * luma_sum) // n_px
    if return_pixels:
        out["pixels"] = [p.astype(_np.int64) for p in full]
    return out


def _decode_jpeg_progressive(blob, pos, w, h, comps, qt, huff_dc,
                             huff_ac, restart_interval, out, _np,
                             return_pixels):
    """T.81 §G progressive decode: accumulate per-component coefficient
    arrays across scans (DC/AC × first/refinement, interleaved DC and
    single-component AC, EOBRUN, restart intervals), then dequantize +
    IDCT once at EOI.  ``pos`` points at the first SOS marker; DHT/DQT/
    DRI segments between scans update tables as they arrive."""
    import struct as _s

    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bx_pad"] = mcus_x * c["hs"]
        c["by_pad"] = mcus_y * c["vs"]
        # non-interleaved scans cover the component's OWN block grid
        # (ceil of its scaled dims — §A.2.2), not the MCU-padded one
        comp_w = (w * c["hs"] + hmax - 1) // hmax
        comp_h = (h * c["vs"] + vmax - 1) // vmax
        c["bx"] = (comp_w + 7) // 8
        c["by"] = (comp_h + 7) // 8
    coefs = [_np.zeros((c["by_pad"], c["bx_pad"], 64), dtype=_np.int32)
             for c in comps]
    comp_index = {c["id"]: i for i, c in enumerate(comps)}

    n = len(blob)
    while pos + 4 <= n:
        if blob[pos] != 0xFF:
            out["status"] = "bad_marker_stream"
            return out
        marker = blob[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = _s.unpack_from(">H", blob, pos + 2)
        seg = blob[pos + 4:pos + 2 + seg_len]
        if marker == 0xC4:
            _parse_dht(seg, huff_dc, huff_ac)
        elif marker == 0xDB:
            _parse_dqt(seg, qt)
        elif marker == 0xDD:
            restart_interval = (seg[0] << 8) | seg[1]
        elif marker == 0xDA:
            ns = seg[0]
            scomps = []
            for ci in range(ns):
                cid, tabs = seg[1 + 2 * ci], seg[2 + 2 * ci]
                scomps.append((comp_index[cid], tabs >> 4, tabs & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0xF
            segments, end = _split_entropy(blob, pos + 2 + seg_len)
            _progressive_scan(
                blob, segments, comps, coefs, scomps, ss, se, ah, al,
                huff_dc, huff_ac, restart_interval, mcus_x, mcus_y, _np)
            pos = end
            continue
        pos += 2 + seg_len

    # dequantize (qt tables are stored in zigzag order; coefficients
    # landed in natural order) and one batched IDCT per component
    global _IDCT_M
    planes = []
    for i, c in enumerate(comps):
        q = qt[c["tq"]]
        qnat = _np.zeros(64)
        for k in range(64):
            qnat[_ZIGZAG[k]] = q[k]
        deq = coefs[i].astype(_np.float64) * qnat
        by, bx = c["by_pad"], c["bx_pad"]
        blocks = _IDCT_M.T @ deq.reshape(-1, 8, 8) @ _IDCT_M
        plane = (blocks.reshape(by, bx, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(by * 8, bx * 8))
        planes.append(plane)
    return _assemble_jpeg(planes, comps, w, h, hmax, vmax, out, _np,
                          return_pixels)


def _progressive_scan(blob, segments, comps, coefs, scomps, ss, se, ah,
                      al, huff_dc, huff_ac, restart_interval, mcus_x,
                      mcus_y, _np):
    """One progressive scan over the coefficient arrays (§G.1.2)."""
    seg_idx = 0
    reader = _JpegBitReader(segments[0])
    state = {"eobrun": 0, "preds": [0] * len(scomps)}

    def _restart():
        nonlocal seg_idx, reader
        seg_idx += 1
        reader = _JpegBitReader(segments[seg_idx])
        state["eobrun"] = 0
        state["preds"] = [0] * len(scomps)

    if ss == 0:
        # DC scan — interleaved over MCUs when ns>1, else the single
        # component's padded grid (DC fills the padded blocks so edge
        # MCUs IDCT with the right level)
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        unit = 0
        if len(scomps) > 1:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if (restart_interval and unit
                            and unit % restart_interval == 0):
                        _restart()
                    for si, (ci, dct, _act) in enumerate(scomps):
                        c = comps[ci]
                        for by in range(c["vs"]):
                            for bx in range(c["hs"]):
                                blk = coefs[ci][my * c["vs"] + by,
                                                mx * c["hs"] + bx]
                                _dc_one(reader, blk, state, si,
                                        huff_dc[dct] if ah == 0 else None,
                                        ah, al)
                    unit += 1
        else:
            # non-interleaved: the scan contains exactly the
            # component's OWN block grid (bx·by data units, T.81
            # A.2.2) — the MCU-padded grid would over-read the
            # entropy stream for a subsampled component whose dims
            # aren't a multiple of the MCU, desyncing the decode
            ci, dct, _act = scomps[0]
            c = comps[ci]
            for by in range(c["by"]):
                for bx in range(c["bx"]):
                    if (restart_interval and unit
                            and unit % restart_interval == 0):
                        _restart()
                    _dc_one(reader, coefs[ci][by, bx], state, 0,
                            huff_dc[dct] if ah == 0 else None, ah, al)
                    unit += 1
            # edge-replicate DC into the padding blocks (after first
            # scan AND each refinement) so edge MCUs IDCT with the
            # neighboring level (cropped away for in-bounds pixels
            # either way)
            arr = coefs[ci]
            for by in range(c["by"]):
                for bx in range(c["bx"], c["bx_pad"]):
                    arr[by, bx][0] = arr[by, c["bx"] - 1][0]
            for by in range(c["by"], c["by_pad"]):
                for bx in range(c["bx_pad"]):
                    arr[by, bx][0] = arr[c["by"] - 1, bx][0]
        return

    # AC scan: always single-component (§G.1.1.1.1), raster over the
    # component's own (non-padded) block grid
    if len(scomps) != 1:
        raise ValueError("interleaved AC progressive scan")
    ci, _dct, act = scomps[0]
    c = comps[ci]
    table = huff_ac[act]
    unit = 0
    for by in range(c["by"]):
        for bx in range(c["bx"]):
            if (restart_interval and unit
                    and unit % restart_interval == 0):
                _restart()
            blk = coefs[ci][by, bx]
            if ah == 0:
                _ac_first(reader, blk, state, table, ss, se, al)
            else:
                _ac_refine(reader, blk, state, table, ss, se, al)
            unit += 1


def _dc_one(reader, blk, state, si, dc_table, ah, al):
    if ah == 0:  # first DC scan: baseline diff coding, scaled by 2^Al
        t = reader.huff(dc_table)
        state["preds"][si] += _extend(reader.bits(t), t)
        blk[0] = state["preds"][si] << al
    else:  # refinement: one appended magnitude bit per block
        if reader.bit():
            blk[0] |= 1 << al


def _ac_first(reader, blk, state, table, ss, se, al):
    """§G.1.2.2: first AC scan of a band — baseline RLE plus EOBn
    codes carrying an end-of-band run across blocks."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.huff(table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += reader.bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC band overflow")
        blk[_ZIGZAG[k]] = _extend(reader.bits(s), s) << al
        k += 1


def _ac_refine(reader, blk, state, table, ss, se, al):
    """§G.1.2.3: AC refinement — new coefficients appear at ±2^Al and
    every already-nonzero coefficient in the band consumes one
    correction bit as the scan passes it."""
    p1, m1 = 1 << al, -1 << al

    def _correct(z):
        if reader.bit() and (blk[z] & p1) == 0:
            blk[z] += p1 if blk[z] >= 0 else m1

    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = reader.huff(table)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r < 15:  # EOBn: band done after pending corrections
                    state["eobrun"] = (1 << r)
                    if r:
                        state["eobrun"] += reader.bits(r)
                    break
                # r == 15: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("bad refinement magnitude")
                val = p1 if reader.bit() else m1
            while k <= se:
                z = _ZIGZAG[k]
                if blk[z] != 0:
                    _correct(z)
                else:
                    if r == 0:
                        if val:
                            blk[z] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if state["eobrun"] > 0:
        while k <= se:
            z = _ZIGZAG[k]
            if blk[z] != 0:
                _correct(z)
            k += 1
        state["eobrun"] -= 1


def synth_gray_jpeg(doc_id: int, blocks_w: int = 2,
                    blocks_h: int = 2) -> bytes:
    """Deterministic VALID baseline grayscale JPEG whose 8×8 block
    (bi, bj) is the CONSTANT value (doc_id·37 + bi·11 + bj·5) mod 256.
    With an all-ones quantization table a constant block is DC-only
    and survives the encode→decode round trip EXACTLY (FDCT DC =
    8·(v−128), IDCT of a DC-only block is flat), so a SQL oracle can
    compute the decoded mean luminance analytically while the engine
    round-trips real entropy-coded bytes through the full Huffman +
    IDCT path.  Uses the Annex K typical luminance tables."""
    import struct as _s

    w, h = blocks_w * 8, blocks_h * 8
    dc_map = _huff_encode_map(*_STD_DC_LUMA)
    ac_map = _huff_encode_map(*_STD_AC_LUMA)
    bw = _JpegBitWriter()
    pred = 0
    for bi in range(blocks_h):
        for bj in range(blocks_w):
            v = (doc_id * 37 + bi * 11 + bj * 5) % 256
            dc = 8 * (v - 128)
            diff = dc - pred
            pred = dc
            t = abs(diff).bit_length()
            code, ln = dc_map[t]
            bw.write(code, ln)
            if t:
                bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            code, ln = ac_map[0x00]  # EOB: all AC zero
            bw.write(code, ln)
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + _s.pack(">H", len(payload) + 2) \
            + payload

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(0xC0, bytes([8]) + _s.pack(">HH", h, w)
              + bytes([1, 0x01, 0x11, 0x00]))
    dht = (seg(0xC4, bytes([0x00]) + bytes(_STD_DC_LUMA[0])
               + bytes(_STD_DC_LUMA[1]))
           + seg(0xC4, bytes([0x10]) + bytes(_STD_AC_LUMA[0])
                 + bytes(_STD_AC_LUMA[1])))
    sos = seg(0xDA, bytes([1, 0x01, 0x00, 0x00, 0x3F, 0x00]))
    return (b"\xff\xd8" + dqt + sof + dht + sos + entropy
            + b"\xff\xd9")


def _jpeg_seg(marker: int, payload: bytes) -> bytes:
    import struct as _s

    return bytes([0xFF, marker]) + _s.pack(">H", len(payload) + 2) + payload


def _enc_extend(bw, v: int) -> None:
    """Emit the magnitude bits of v in extend-complement form (the
    encoding both DC diffs and AC values use after their size class)."""
    t = abs(v).bit_length()
    bw.write(v if v >= 0 else v + (1 << t) - 1, t)


def _enc_eobn(bw, ac_map, run: int) -> None:
    """EOBn: end-of-band run over ``run`` blocks (T.81 G.1.2.2)."""
    r = run.bit_length() - 1
    code, ln = ac_map[r << 4]
    bw.write(code, ln)
    if r:
        bw.write(run - (1 << r), r)


# AC Huffman table for the progressive encoder: the Annex K sequential
# table has no EOBn symbols (r<<4 for r>0) — progressive streams define
# their own.  Flat 6-bit canonical table over every symbol the encoder
# can emit: EOB0..EOB7 (runs < 256), ZRL, and (run,size) pairs for
# sizes 1..3; 57 codes at length 6 leaves the all-ones code unused as
# T.81 requires.
_PROG_AC_SYMS = ([r << 4 for r in range(8)] + [0xF0]
                 + [(r << 4) | s for r in range(16) for s in (1, 2, 3)])
_PROG_AC_TABLE = ([0, 0, 0, 0, 0, len(_PROG_AC_SYMS), 0, 0,
                   0, 0, 0, 0, 0, 0, 0, 0], _PROG_AC_SYMS)


def encode_gray_progressive(coefs, w: int, h: int, scans=None) -> bytes:
    """Tiny grayscale PROGRESSIVE encoder (T.81 §G, successive
    approximation with the magnitude point transform: a first scan
    sends sign·(|a|>>Al), refinements append magnitude bit Al) — the
    test/oracle twin of the progressive decoder, same role
    synth_gray_jpeg plays for baseline.  ``coefs`` is a list of 64-int
    natural-order blocks in raster order; all-ones quant table, Annex
    K luminance Huffman tables for every scan.  Default scan script:
    DC first (Al=1) → AC 1..63 first (Al=1) → DC refine (Al=0) → AC
    1..63 refine (Al=0).  Encoder limit (asserted, never silently
    wrong): one refinement level."""
    import struct as _s

    if scans is None:
        scans = [("dc", 0, 0, 0, 1), ("ac", 1, 63, 0, 1),
                 ("dc", 0, 0, 1, 0), ("ac", 1, 63, 1, 0)]
    dc_map = _huff_encode_map(*_STD_DC_LUMA)
    ac_map = _huff_encode_map(*_PROG_AC_TABLE)
    out = bytearray(b"\xff\xd8")
    out += _jpeg_seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += _jpeg_seg(0xC2, bytes([8]) + _s.pack(">HH", h, w)
                     + bytes([1, 0x01, 0x11, 0x00]))
    out += _jpeg_seg(0xC4, bytes([0x00]) + bytes(_STD_DC_LUMA[0])
                     + bytes(_STD_DC_LUMA[1]))
    out += _jpeg_seg(0xC4, bytes([0x10]) + bytes(_PROG_AC_TABLE[0])
                     + bytes(_PROG_AC_TABLE[1]))
    for kind, ss, se, ah, al in scans:
        bw = _JpegBitWriter()
        if kind == "dc":
            if ah == 0:
                pred = 0
                for blk in coefs:
                    # T.81 point transform for DC is an ARITHMETIC
                    # right shift (floors for negatives) — NOT
                    # sign-magnitude like AC: the decoder refines with
                    # |= 2^Al on the two's-complement value, so e.g.
                    # DC=-5 must send a_t = -5>>1 = -3 (recon -6, then
                    # -6|1 = -5), not -(5>>1) = -2 (recon -4 → -3).
                    a_t = blk[0] >> al
                    diff = a_t - pred
                    pred = a_t
                    t = abs(diff).bit_length()
                    code, ln = dc_map[t]
                    bw.write(code, ln)
                    if t:
                        _enc_extend(bw, diff)
            else:
                for blk in coefs:
                    # refinement bit Al of the two's-complement value
                    bw.write((blk[0] >> al) & 1, 1)
        elif ah == 0:  # AC first scan of the band
            eobrun = 0
            for blk in coefs:
                nz = [(k, (abs(blk[_ZIGZAG[k]]) >> al)
                       * (1 if blk[_ZIGZAG[k]] >= 0 else -1))
                      for k in range(ss, se + 1)
                      if abs(blk[_ZIGZAG[k]]) >> al]
                if not nz:
                    eobrun += 1
                    continue
                if eobrun:
                    _enc_eobn(bw, ac_map, eobrun)
                    eobrun = 0
                prev = ss - 1
                for k, a_t in nz:
                    run = k - prev - 1
                    while run > 15:
                        code, ln = ac_map[0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    s = abs(a_t).bit_length()
                    code, ln = ac_map[(run << 4) | s]
                    bw.write(code, ln)
                    _enc_extend(bw, a_t)
                    prev = k
                if prev < se:
                    eobrun += 1  # rest of this band is zero
            if eobrun:
                _enc_eobn(bw, ac_map, eobrun)
        else:  # AC refinement scan (decoder grammar of §G.1.2.3)
            p_al = al + 1  # the previous scan's point transform
            eobrun = 0
            eob_corr: list[int] = []

            def _flush_eob(bw=bw):
                nonlocal eobrun, eob_corr
                if eobrun:
                    _enc_eobn(bw, ac_map, eobrun)
                    for bit in eob_corr:
                        bw.write(bit, 1)
                    eobrun, eob_corr = 0, []

            for blk in coefs:
                hist = {k: (abs(blk[_ZIGZAG[k]]) >> al) & 1
                        for k in range(ss, se + 1)
                        if abs(blk[_ZIGZAG[k]]) >> p_al}
                newly = [(k, blk[_ZIGZAG[k]])
                         for k in range(ss, se + 1)
                         if not abs(blk[_ZIGZAG[k]]) >> p_al
                         and abs(blk[_ZIGZAG[k]]) >> al]
                if not newly:
                    eobrun += 1
                    eob_corr.extend(hist[k] for k in sorted(hist))
                    continue
                _flush_eob()
                k_pos = ss
                for k, v in newly:
                    assert abs(v) >> al == 1, \
                        "refinement value must be ±2^Al"
                    # walk zero-history positions toward k, breaking a
                    # run ≥16 with ZRL; correction bits for crossed
                    # nonzero-history coefficients interleave in
                    # position order exactly as the decoder consumes
                    # them (§G.1.2.3)
                    run, corr = 0, []
                    for j in range(k_pos, k):
                        if j in hist:
                            corr.append(hist[j])
                        else:
                            run += 1
                            if run == 16:
                                code, ln = ac_map[0xF0]
                                bw.write(code, ln)
                                for bit in corr:
                                    bw.write(bit, 1)
                                run, corr = 0, []
                    code, ln = ac_map[(run << 4) | 1]
                    bw.write(code, ln)
                    bw.write(1 if v > 0 else 0, 1)
                    for bit in corr:
                        bw.write(bit, 1)
                    k_pos = k + 1
                if k_pos <= se:
                    eobrun += 1
                    eob_corr.extend(hist[j] for j in range(k_pos, se + 1)
                                    if j in hist)
            _flush_eob()
        out += _jpeg_seg(0xDA, bytes([1, 0x01, 0x00, ss, se,
                                      (ah << 4) | al]))
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_gray_baseline(coefs, w: int, h: int) -> bytes:
    """Baseline (SOF0) encoder over the same coefficient-block input as
    encode_gray_progressive — the differential twin: both encodings of
    one coefficient set must decode bit-identically (same dequant,
    same IDCT, same assembly), isolating the entropy layers under
    test.  All-ones quant table, Annex K luminance tables."""
    import struct as _s

    dc_map = _huff_encode_map(*_STD_DC_LUMA)
    ac_map = _huff_encode_map(*_STD_AC_LUMA)
    bw = _JpegBitWriter()
    pred = 0
    for blk in coefs:
        diff = blk[0] - pred
        pred = blk[0]
        t = abs(diff).bit_length()
        code, ln = dc_map[t]
        bw.write(code, ln)
        if t:
            _enc_extend(bw, diff)
        nz = [(k, blk[_ZIGZAG[k]]) for k in range(1, 64)
              if blk[_ZIGZAG[k]]]
        prev = 0
        for k, v in nz:
            run = k - prev - 1
            while run > 15:
                code, ln = ac_map[0xF0]
                bw.write(code, ln)
                run -= 16
            s = abs(v).bit_length()
            code, ln = ac_map[(run << 4) | s]
            bw.write(code, ln)
            _enc_extend(bw, v)
            prev = k
        if not nz or nz[-1][0] < 63:
            code, ln = ac_map[0x00]  # EOB
            bw.write(code, ln)
    out = bytearray(b"\xff\xd8")
    out += _jpeg_seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += _jpeg_seg(0xC0, bytes([8]) + _s.pack(">HH", h, w)
                     + bytes([1, 0x01, 0x11, 0x00]))
    out += _jpeg_seg(0xC4, bytes([0x00]) + bytes(_STD_DC_LUMA[0])
                     + bytes(_STD_DC_LUMA[1]))
    out += _jpeg_seg(0xC4, bytes([0x10]) + bytes(_STD_AC_LUMA[0])
                     + bytes(_STD_AC_LUMA[1]))
    out += _jpeg_seg(0xDA, bytes([1, 0x01, 0x00, 0x00, 0x3F, 0x00]))
    out += bw.flush() + b"\xff\xd9"
    return bytes(out)


def synth_gray_progressive_jpeg(doc_id: int, blocks_w: int = 2,
                                blocks_h: int = 2) -> bytes:
    """The progressive twin of synth_gray_jpeg: IDENTICAL pixel
    content (constant 8×8 blocks, (doc_id·37 + bi·11 + bj·5) mod 256,
    all-ones quant table) re-encoded as a 4-scan SOF2 stream, so the
    SAME analytic SQL oracle verifies the progressive entropy path —
    DC successive approximation (first + refinement) and the all-EOB
    AC band with a cross-block EOBRUN — end-to-end."""
    coefs = []
    for bi in range(blocks_h):
        for bj in range(blocks_w):
            v = (doc_id * 37 + bi * 11 + bj * 5) % 256
            blk = [0] * 64
            blk[0] = 8 * (v - 128)
            coefs.append(blk)
    return encode_gray_progressive(coefs, blocks_w * 8, blocks_h * 8)


def _lzw_decode_gif(data: bytes, min_code_size: int) -> bytes:
    """GIF variable-width LZW (89a spec appendix F): LSB-first bit
    packing, clear/EOI codes, width grows after the dictionary fills,
    capped at 12 bits."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    nxt = eoi + 1
    prev: bytes | None = None
    acc = bit_n = pos = 0
    n = len(data)
    while True:
        while bit_n < width:
            if pos >= n:
                return bytes(out)  # missing EOI: tolerate, return pixels
            acc |= data[pos] << bit_n
            bit_n += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        bit_n -= width
        if code == clear:
            # O(1) reset: entries >= nxt are unreadable (the `code < nxt`
            # guard below) and get overwritten in place before nxt passes
            # them again, so the 258-entry table rebuild is unnecessary —
            # it made the clear-per-pixel "uncompressed LZW" worst case
            # ~50x slower than the dictionary-growth common case.
            width = min_code_size + 1
            nxt = eoi + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table) and code < nxt:
            entry = table[code]
        elif code == nxt and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None and nxt < 4096:
            if nxt == len(table):
                table.append(prev + entry[:1])
            else:
                table[nxt] = prev + entry[:1]
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        prev = entry


def decode_gif(blob: bytes) -> dict:
    """REAL GIF pixel decode, pure stdlib (GIF87a/89a public spec):
    logical screen descriptor, global/local color tables, extension
    skip, variable-width LZW over concatenated data sub-blocks,
    4-pass de-interlace.  First image frame only (n_frames reports the
    descriptor count).  Luma = (r+g+b) div 3 from the palette, the
    PNG color-type-3 contract."""
    import struct as _s

    out = {"format": "gif", "width": None, "height": None,
           "n_channels": None, "n_pixels": None, "mean_luma_x1000": None,
           "status": "decoded"}
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        out["status"] = "not_gif"
        return out
    try:
        sw, sh, flags, _bg, _ar = _s.unpack_from("<HHBBB", blob, 6)
        pos = 13
        gct = None
        if flags & 0x80:
            n = 2 << (flags & 7)
            gct = blob[pos:pos + 3 * n]
            pos += 3 * n
        n_frames = 0
        first = None
        while pos < len(blob):
            b0 = blob[pos]
            pos += 1
            if b0 == 0x3B:  # trailer
                break
            if b0 == 0x21:  # extension: label + sub-blocks
                pos += 1
                while blob[pos]:
                    pos += 1 + blob[pos]
                pos += 1
                continue
            if b0 != 0x2C:
                out["status"] = f"bad_block_0x{b0:02x}"
                return out
            # image descriptor
            _ix, _iy, iw, ih, iflags = _s.unpack_from("<HHHHB", blob, pos)
            pos += 9
            lct = None
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                lct = blob[pos:pos + 3 * n]
                pos += 3 * n
            mcs = blob[pos]
            pos += 1
            data = bytearray()
            while blob[pos]:
                ln = blob[pos]
                data += blob[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            n_frames += 1
            if first is None:
                first = (iw, ih, bool(iflags & 0x40),
                         lct if lct is not None else gct,
                         _lzw_decode_gif(bytes(data), mcs))
        if first is None:
            out["status"] = "truncated"
            return out
        iw, ih, interlaced, pal, px = first
        if pal is None:
            out["status"] = "no_color_table"
            return out
        if iw * ih == 0:
            # zero-dimension image: report instead of dividing by it
            # (ZeroDivisionError would kill the whole mapInPandas task,
            # breaking the per-row honesty contract; ADVICE r11)
            out["status"] = "empty_image"
            return out
        if len(px) < iw * ih:
            out["status"] = "truncated"
            return out
        px = px[:iw * ih]
        if interlaced:
            rows = [px[r * iw:(r + 1) * iw] for r in range(ih)]
            order = ([r for r in range(0, ih, 8)]
                     + [r for r in range(4, ih, 8)]
                     + [r for r in range(2, ih, 4)]
                     + [r for r in range(1, ih, 2)])
            de = [None] * ih
            for src, dst in enumerate(order):
                de[dst] = rows[src]
            px = b"".join(de)
        luma_sum = 0
        for i in px:
            base = 3 * i
            luma_sum += (pal[base] + pal[base + 1] + pal[base + 2]) // 3
        out.update(width=iw or sw, height=ih or sh, n_channels=3,
                   n_pixels=iw * ih,
                   mean_luma_x1000=(1000 * luma_sum) // (iw * ih))
        out["n_frames"] = n_frames
        return out
    except (IndexError, ValueError, __import__("struct").error):
        out["status"] = "truncated"
        return out


def decode_bmp(blob: bytes) -> dict:
    """REAL BMP pixel decode, pure stdlib (BITMAPINFOHEADER,
    uncompressed BI_RGB): 8-bit palette and 24/32-bit true color,
    bottom-up and top-down rows, 4-byte row padding.  Luma contract
    matches PNG: (r+g+b) div 3."""
    import struct as _s

    out = {"format": "bmp", "width": None, "height": None,
           "n_channels": None, "n_pixels": None, "mean_luma_x1000": None,
           "status": "decoded"}
    if blob[:2] != b"BM":
        out["status"] = "not_bmp"
        return out
    try:
        (data_off,) = _s.unpack_from("<I", blob, 10)
        (hdr_size, w, h, _planes, bpp, comp) = _s.unpack_from(
            "<IiihHI", blob, 14)
        if comp != 0:
            out["status"] = f"unsupported_compression_{comp}"
            return out
        if bpp not in (8, 24, 32):
            out["status"] = f"unsupported_bpp_{bpp}"
            return out
        top_down = h < 0
        h = abs(h)
        if w <= 0 or h == 0:
            out["status"] = "empty_image"  # zero/negative dims: per-row
            return out                     # status, never a task crash
        pal = None
        if bpp == 8:
            (colors_used,) = _s.unpack_from("<I", blob, 46)
            n = colors_used or 256
            pal = blob[14 + hdr_size:14 + hdr_size + 4 * n]
        stride = ((w * bpp // 8) + 3) & ~3
        luma_sum = 0
        for row in range(h):
            src = row if top_down else h - 1 - row
            base = data_off + src * stride
            line = blob[base:base + stride]
            if bpp == 8:
                for x in range(w):
                    p = 4 * line[x]
                    luma_sum += (pal[p] + pal[p + 1] + pal[p + 2]) // 3
            else:
                step = bpp // 8
                for x in range(w):
                    o = x * step
                    luma_sum += (line[o] + line[o + 1] + line[o + 2]) // 3
        n_px = w * h
        out.update(width=w, height=h, n_channels=3 if bpp != 32 else 4,
                   n_pixels=n_px, mean_luma_x1000=(1000 * luma_sum) // n_px)
        return out
    except (IndexError, _s.error):
        out["status"] = "truncated"
        return out


def _lzw_decode_tiff(data: bytes) -> bytes:
    """TIFF 6.0 LZW (spec §13): MSB-first bit packing, 256=Clear,
    257=EOI, 9→12-bit codes with the EARLY-CHANGE width bump (the
    width grows when the next free code reaches (1<<width)−1, one
    entry sooner than GIF's LSB-first variant above)."""
    CLEAR, EOI = 256, 257
    nbits = len(data) * 8
    bitpos = 0
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def read(w: int) -> int:
        nonlocal bitpos
        if bitpos + w > nbits:
            return EOI
        v = 0
        for _ in range(w):
            v = (v << 1) | ((data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
        return v

    while True:
        code = read(width)
        if code == EOI:
            return bytes(out)
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            if code > 255:
                raise ValueError(f"bad first LZW code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4094:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry


def lzw_encode_tiff(pixels: bytes) -> bytes:
    """Real dictionary TIFF-LZW encoder — the decoder's exact inverse
    (MSB-first, early change): used by synth_gray_tiff so the decode
    query exercises genuine compressed strips, not clear-per-symbol
    degenerate streams."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nacc = 0

    def push(code: int, width: int) -> None:
        nonlocal acc, nacc
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    push(CLEAR, width)
    run = b""
    for b in pixels:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        push(table[run], width)
        if nxt < 4094:
            table[cand] = nxt
            nxt += 1
            # the decoder is one table-add behind (same offset as the
            # GIF pair above), so the encoder's early-change fires one
            # add after the decoder's (1<<width)−1 threshold
            if nxt == (1 << width) and width < 12:
                width += 1
        run = bytes([b])
    if run:
        push(table[run], width)
    push(EOI, width)
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    """TIFF PackBits (spec §9, the Apple RLE): n ≥ 0 → copy n+1
    literals; n ≤ −1 (except −128 no-op) → repeat next byte 1−n
    times."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i] - 256 if data[i] > 127 else data[i]
        i += 1
        if n >= 0:
            out += data[i:i + n + 1]
            i += n + 1
        elif n != -128:
            out += data[i:i + 1] * (1 - n)
            i += 1
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """PackBits encoder (runs ≥ 3 become repeat packets, the rest ride
    in ≤128-byte literal packets) — synth-side inverse of
    _packbits_decode."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i = j + 1
            continue
        # literal run: until a ≥3 repeat starts or 128 bytes
        lit_start = i
        while i < n and i - lit_start < 128:
            if (i + 2 < n and data[i] == data[i + 1] == data[i + 2]):
                break
            i += 1
        out.append(i - lit_start - 1)
        out += data[lit_start:i]
    return bytes(out)


def decode_tiff(blob: bytes) -> dict:
    """REAL baseline TIFF pixel decode, pure stdlib (TIFF 6.0 public
    spec): II/MM byte order, IFD0 tag walk (width/length/bits/
    compression/photometric/strip offsets+counts/samples-per-pixel/
    rows-per-strip), multi-strip assembly, and three compressions —
    none (1), LZW (5, MSB-first early-change variant), PackBits
    (32773).  Grayscale (photometric 0/1, WhiteIsZero inverted) and
    RGB (photometric 2); luma contract matches PNG: (r+g+b) div 3."""
    import struct as _s

    out = {"format": "tiff", "width": None, "height": None,
           "n_channels": None, "n_pixels": None, "mean_luma_x1000": None,
           "status": "decoded"}
    if blob[:4] not in (b"II*\x00", b"MM\x00*"):
        out["status"] = "not_tiff"
        return out
    end = "<" if blob[:2] == b"II" else ">"
    try:
        (ifd_off,) = _s.unpack_from(end + "I", blob, 4)
        (n_tags,) = _s.unpack_from(end + "H", blob, ifd_off)
        _TYPE_SIZE = {1: 1, 3: 2, 4: 4}
        tags: dict[int, list[int]] = {}
        for t in range(n_tags):
            base = ifd_off + 2 + 12 * t
            tag, typ, cnt = _s.unpack_from(end + "HHI", blob, base)
            if typ not in _TYPE_SIZE:
                continue
            size = _TYPE_SIZE[typ] * cnt
            if size <= 4:
                voff = base + 8
            else:
                (voff,) = _s.unpack_from(end + "I", blob, base + 8)
            fmt = {1: "B", 3: "H", 4: "I"}[typ]
            tags[tag] = list(
                _s.unpack_from(end + str(cnt) + fmt, blob, voff))
        w = tags.get(256, [0])[0]
        h = tags.get(257, [0])[0]
        comp = tags.get(259, [1])[0]
        photo = tags.get(262, [1])[0]
        spp = tags.get(277, [1])[0]
        bits = tags.get(258, [8])
        offsets = tags.get(273, [])
        counts = tags.get(279, [])
        if w <= 0 or h <= 0:
            out["status"] = "empty_image"
            return out
        if any(b != 8 for b in bits):
            out["status"] = f"unsupported_bits_{bits[0]}"
            return out
        if photo not in (0, 1, 2) or spp not in (1, 3):
            out["status"] = f"unsupported_photometric_{photo}"
            return out
        if comp not in (1, 5, 32773):
            out["status"] = f"unsupported_compression_{comp}"
            return out
        if not offsets or len(offsets) != len(counts):
            out["status"] = "bad_strips"
            return out
        px = bytearray()
        for off, cnt in zip(offsets, counts):
            strip = blob[off:off + cnt]
            if len(strip) < cnt:
                out["status"] = "truncated"
                return out
            if comp == 5:
                px += _lzw_decode_tiff(strip)
            elif comp == 32773:
                px += _packbits_decode(strip)
            else:
                px += strip
        need = w * h * spp
        if len(px) < need:
            out["status"] = "truncated"
            return out
        px = px[:need]
        luma_sum = 0
        if spp == 1:
            if photo == 0:  # WhiteIsZero
                luma_sum = sum(255 - v for v in px)
            else:
                luma_sum = sum(px)
        else:
            for i in range(0, need, 3):
                luma_sum += (px[i] + px[i + 1] + px[i + 2]) // 3
        out.update(width=w, height=h, n_channels=spp,
                   n_pixels=w * h,
                   mean_luma_x1000=(1000 * luma_sum) // (w * h))
        return out
    except (IndexError, ValueError, _s.error):
        out["status"] = "truncated"
        return out


def synth_gray_tiff(doc_id: int, w: int = 16, h: int = 8) -> bytes:
    """Deterministic VALID little-endian TIFF whose pixel(i,j) =
    (doc_id·31 + i·7 + j) mod 256 — the shared palette-synth pixel
    rule, so the analytic oracle is identical across formats.  The
    DECODE PATH varies per doc while the pixel stats stay invariant
    (that is the point of the query): compression cycles none /
    PackBits / LZW by doc_id mod 3, and odd docs split the image into
    4-row strips (multi-strip assembly) while even docs use one
    strip."""
    import struct as _s

    pixels = bytes(
        (doc_id * 31 + i * 7 + j) % 256
        for i in range(h) for j in range(w))
    comp_kind = doc_id % 3
    comp = (1, 32773, 5)[comp_kind]
    rows_per_strip = 4 if doc_id % 2 else h
    strips = []
    for r0 in range(0, h, rows_per_strip):
        raw = pixels[r0 * w:(r0 + rows_per_strip) * w]
        if comp_kind == 1:
            strips.append(packbits_encode(raw))
        elif comp_kind == 2:
            strips.append(lzw_encode_tiff(raw))
        else:
            strips.append(raw)
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8),
        (259, 3, 1, comp), (262, 3, 1, 1),
        (273, 4, len(strips), None),  # offsets, patched below
        (277, 3, 1, 1), (278, 3, 1, rows_per_strip),
        (279, 4, len(strips), None),  # counts, patched below
    ]
    n = len(entries)
    ifd_off = 8
    after_ifd = ifd_off + 2 + 12 * n + 4
    # out-of-line arrays (strip offsets/counts) when >1 strip
    extra = bytearray()
    extra_base = after_ifd
    strip_data_off = extra_base + (
        2 * 4 * len(strips) if len(strips) > 1 else 0)
    offs = []
    pos = strip_data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)
    cnts = [len(s) for s in strips]
    out = bytearray(b"II*\x00")
    out += _s.pack("<I", ifd_off)
    out += _s.pack("<H", n)
    for tag, typ, cnt, val in entries:
        out += _s.pack("<HHI", tag, typ, cnt)
        if tag == 273:
            if len(strips) == 1:
                out += _s.pack("<I", offs[0])
            else:
                out += _s.pack("<I", extra_base + len(extra))
                for o in offs:
                    extra += _s.pack("<I", o)
        elif tag == 279:
            if len(strips) == 1:
                out += _s.pack("<I", cnts[0])
            else:
                out += _s.pack("<I", extra_base + len(extra))
                for c in cnts:
                    extra += _s.pack("<I", c)
        elif typ == 3:
            out += _s.pack("<HH", val, 0)
        else:
            out += _s.pack("<I", val)
    out += _s.pack("<I", 0)  # no next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)


def synth_gray_gif(doc_id: int, w: int = 16, h: int = 8) -> bytes:
    """Deterministic VALID GIF89a whose pixel(i,j) =
    (doc_id·31 + i·7 + j) mod 256 over a 256-gray global palette —
    the PNG synthesizer's pixel rule carried to the LZW container, so
    the same analytic SQL oracle applies.  Encoded with the classic
    clear-code-per-pixel 'uncompressed LZW' (constant 9-bit width) —
    bloated but spec-valid, and it exercises the decoder's clear-code
    reset path on every pixel."""
    import struct as _s

    pal = bytes(v for i in range(256) for v in (i, i, i))
    header = (b"GIF89a" + _s.pack("<HHBBB", w, h, 0xF7, 0, 0) + pal)
    desc = b"\x2C" + _s.pack("<HHHHB", 0, 0, w, h, 0)
    # LZW stream: CLEAR before every pixel code, EOI last; 9-bit codes
    acc = 0
    nbits = 0
    data = bytearray()

    def push(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += 9
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    for i in range(h):
        for j in range(w):
            push(256)  # CLEAR
            push((doc_id * 31 + i * 7 + j) % 256)
    push(257)  # EOI
    if nbits:
        data.append(acc & 0xFF)
    blocks = bytearray([8])  # min code size
    for off in range(0, len(data), 255):
        chunk = data[off:off + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return header + desc + bytes(blocks) + b"\x3B"


def synth_gray_bmp(doc_id: int, w: int = 16, h: int = 8) -> bytes:
    """Deterministic VALID 8-bit palette BMP (bottom-up, BI_RGB) with
    the same pixel rule and a 256-gray palette."""
    import struct as _s

    stride = (w + 3) & ~3
    pal = bytes(v for i in range(256) for v in (i, i, i, 0))  # BGRA
    rows = bytearray()
    for i in range(h - 1, -1, -1):  # bottom-up
        line = bytes((doc_id * 31 + i * 7 + j) % 256 for j in range(w))
        rows += line + b"\x00" * (stride - w)
    data_off = 14 + 40 + len(pal)
    return (b"BM" + _s.pack("<IHHI", data_off + len(rows), 0, 0, data_off)
            + _s.pack("<IiihHIIiiII", 40, w, h, 1, 8, 0, len(rows),
                      2835, 2835, 256, 0)
            + pal + bytes(rows))


def decode_pixels(media: DataFrame) -> DataFrame:
    """REAL decode over the media table (Arrow mapInPandas, same
    plumbing as decode_media): PNG / baseline JPEG / GIF / BMP →
    REAL pixel stats, WAV → sample stats; formats whose decode needs
    an external library (video) get status='decoder_unavailable' —
    per-ROW honesty instead of a module-wide gate."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, mtype, blob in zip(
                    batch["doc_id"], batch["media_type"], batch["blob"]):
                b = bytes(blob) if blob is not None else b""
                base = {"doc_id": doc_id, "media_type": mtype,
                        "n_bytes": len(b), "format": "unknown",
                        "width": None, "height": None, "n_channels": None,
                        "n_pixels": None, "mean_luma_x1000": None,
                        "rms_x1000": None, "duration_ms": None,
                        "status": "unrecognized"}
                if b[:8] == b"\x89PNG\r\n\x1a\n":
                    d = decode_png(b)
                    base.update({k: d.get(k) for k in (
                        "format", "width", "height", "n_channels",
                        "n_pixels", "mean_luma_x1000", "status")})
                elif b[:3] == b"\xff\xd8\xff":
                    d = decode_jpeg(b)
                    base.update({k: d.get(k) for k in (
                        "format", "width", "height", "n_channels",
                        "n_pixels", "mean_luma_x1000", "status")})
                elif b[:6] in (b"GIF87a", b"GIF89a"):
                    d = decode_gif(b)
                    base.update({k: d.get(k) for k in (
                        "format", "width", "height", "n_channels",
                        "n_pixels", "mean_luma_x1000", "status")})
                elif b[:2] == b"BM":
                    d = decode_bmp(b)
                    base.update({k: d.get(k) for k in (
                        "format", "width", "height", "n_channels",
                        "n_pixels", "mean_luma_x1000", "status")})
                elif b[:4] in (b"II*\x00", b"MM\x00*"):
                    d = decode_tiff(b)
                    base.update({k: d.get(k) for k in (
                        "format", "width", "height", "n_channels",
                        "n_pixels", "mean_luma_x1000", "status")})
                elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    d = decode_wav(b)
                    base.update({k: d.get(k) for k in (
                        "format", "n_channels", "rms_x1000",
                        "duration_ms", "status")})
                else:
                    probe = probe_header(b)
                    if probe["format"] != "unknown":
                        base.update(format=probe["format"],
                                    width=probe["width"],
                                    height=probe["height"],
                                    n_channels=probe["n_channels"],
                                    status="decoder_unavailable")
                rows.append(base)
            out = pd.DataFrame(rows)
            for c in ("width", "height", "n_channels"):
                out[c] = out[c].astype("Int32")
            for c in ("n_pixels", "mean_luma_x1000", "rms_x1000",
                      "duration_ms"):
                out[c] = out[c].astype("Int64")
            yield out

    return media.mapInPandas(run, schema=PIXELS_SCHEMA)


def synth_gray_png(doc_id: int, w: int = 16, h: int = 8) -> bytes:
    """Deterministic VALID grayscale PNG whose pixel(i,j) =
    (doc_id·31 + i·7 + j) mod 256 — the closed-form pixel rule that
    lets a SQL oracle compute the decoded statistics analytically
    while the engine round-trips ACTUAL bytes through zlib and the
    real decoder (tests/correctness; production media arrives as
    blobs, this is the synthesizer for the decode gate)."""
    import struct as _s
    import zlib as _z

    raw = bytearray()
    for i in range(h):
        raw.append(0)  # filter: None
        raw += bytes((doc_id * 31 + i * 7 + j) % 256 for j in range(w))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (_s.pack(">I", len(data)) + ctype + data
                + _s.pack(">I", _z.crc32(ctype + data)))

    ihdr = _s.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _z.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def synth_pcm_wav(doc_id: int, n: int = 64, rate: int = 8000) -> bytes:
    """Deterministic VALID 16-bit mono WAV whose sample k =
    ((doc_id·7 + k) mod 201) − 100 — the closed-form sample rule that
    lets a SQL oracle compute the decoded RMS analytically while the
    engine round-trips actual RIFF bytes through the wave module."""
    import io as _io
    import struct as _s
    import wave as _w

    buf = _io.BytesIO()
    with _w.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(_s.pack(
            f"<{n}h", *[((doc_id * 7 + k) % 201) - 100 for k in range(n)]))
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Video CONTAINER probing — MP4 (ISO BMFF box walk) and MKV (EBML walk),
# pure stdlib (r10 verdict task #4).  This narrows the video honesty
# gate to PIXEL decode only: duration, dimensions, codec fourcc, and
# frame count come from the real container structures; per-row
# ``decoder_unavailable`` remains for pixel data (full video decode is
# out of stdlib scope — the honest gate, see module docstring).
# Reference parity n/a: the reference (a CDC engine) has no media ops;
# this is the LLM-data-pipeline brief.

VIDEO_PROBE_SCHEMA = (
    "doc_id long, container string, codec string, width int, height int, "
    "duration_ms long, n_frames long, n_tracks int, status string"
)


def probe_mp4(blob: bytes) -> dict:
    """ISO BMFF (MP4/MOV) container probe: walks the box tree
    (ftyp/moov/mvhd/trak/tkhd/mdia/mdhd/hdlr/minf/stbl/stsd/stsz)
    with 32-bit and 64-bit (size==1 → largesize) box headers.
    Returns the movie duration in ms (mvhd, version 0 and 1), the
    first VIDEO track's dimensions (tkhd 16.16 fixed point), sample-
    entry fourcc (stsd), and frame count (stsz sample_count), plus
    the total track count.  Pixel data stays gated."""
    import struct as _s

    out = {"container": "mp4", "codec": None, "width": None,
           "height": None, "duration_ms": None, "n_frames": None,
           "n_tracks": 0, "status": "probed"}

    def boxes(lo: int, hi: int):
        """Yield (type, body_lo, body_hi) for the boxes in [lo, hi)."""
        p = lo
        while p + 8 <= hi:
            (size,) = _s.unpack_from(">I", blob, p)
            btype = blob[p + 4:p + 8]
            body = p + 8
            if size == 1:
                (size,) = _s.unpack_from(">Q", blob, p + 8)
                body = p + 16
            elif size == 0:
                size = hi - p
            if size < body - p or p + size > hi:
                raise ValueError("bad box size")
            yield btype, body, p + size
            p += size

    try:
        if blob[4:8] != b"ftyp":
            out["status"] = "not_mp4"
            return out
        moov = None
        for btype, lo, hi in boxes(0, len(blob)):
            if btype == b"moov":
                moov = (lo, hi)
        if moov is None:
            out["status"] = "no_moov"
            return out
        video_seen = False
        for btype, lo, hi in boxes(*moov):
            if btype == b"mvhd":
                ver = blob[lo]
                if ver == 1:
                    ts, dur = _s.unpack_from(">IQ", blob, lo + 20)
                else:
                    ts, dur = _s.unpack_from(">II", blob, lo + 12)
                if ts:
                    out["duration_ms"] = (dur * 1000) // ts
            elif btype == b"trak":
                out["n_tracks"] += 1
                tw = th = None
                handler = None
                codec = None
                nframes = None
                for t2, l2, h2 in boxes(lo, hi):
                    if t2 == b"tkhd":
                        ver = blob[l2]
                        off = l2 + (32 if ver == 0 else 44)
                        # layer(2) alt(2) vol(2) rsvd(2) matrix(36)
                        wfix, hfix = _s.unpack_from(
                            ">II", blob, off + 44)
                        tw, th = wfix >> 16, hfix >> 16
                    elif t2 == b"mdia":
                        for t3, l3, h3 in boxes(l2, h2):
                            if t3 == b"hdlr":
                                handler = blob[l3 + 8:l3 + 12]
                            elif t3 == b"minf":
                                for t4, l4, h4 in boxes(l3, h3):
                                    if t4 != b"stbl":
                                        continue
                                    for t5, l5, h5 in boxes(l4, h4):
                                        if t5 == b"stsd":
                                            (cnt,) = _s.unpack_from(
                                                ">I", blob, l5 + 4)
                                            if cnt:
                                                codec = blob[
                                                    l5 + 12:l5 + 16
                                                ].decode("ascii",
                                                         "replace")
                                        elif t5 == b"stsz":
                                            (n,) = _s.unpack_from(
                                                ">I", blob, l5 + 8)
                                            nframes = n
                if handler == b"vide" and not video_seen:
                    video_seen = True
                    out.update(width=tw, height=th, codec=codec,
                               n_frames=nframes)
        if not video_seen:
            out["status"] = "no_video_track"
        return out
    except (IndexError, ValueError, _s.error):
        out["status"] = "truncated"
        return out


def _ebml_vint(blob: bytes, p: int, keep_marker: bool) -> tuple[int, int]:
    """Parse one EBML variable-size integer at p → (value, next_pos).
    IDs keep the length-marker bit, sizes strip it."""
    first = blob[p]
    if first == 0:
        raise ValueError("invalid EBML vint")
    ln = 8 - first.bit_length() + 1
    v = first if keep_marker else first & ((1 << (8 - ln)) - 1)
    for i in range(1, ln):
        v = (v << 8) | blob[p + i]
    return v, p + ln


def probe_mkv(blob: bytes) -> dict:
    """Matroska/WebM container probe: EBML element walk —
    Segment→Info (TimestampScale 0x2AD7B1, Duration 0x4489) and
    Segment→Tracks→TrackEntry (TrackType 0x83, CodecID 0x86,
    Video→PixelWidth 0xB0 / PixelHeight 0xBA); frame count = number
    of SimpleBlocks (0xA3) across Clusters (0x1F43B675).  Duration is
    a float in TimestampScale units (ns per tick, default 10^6 → the
    stored value is milliseconds)."""
    import struct as _s

    out = {"container": "mkv", "codec": None, "width": None,
           "height": None, "duration_ms": None, "n_frames": None,
           "n_tracks": 0, "status": "probed"}

    def elements(lo: int, hi: int):
        p = lo
        while p < hi:
            eid, q = _ebml_vint(blob, p, keep_marker=True)
            size, body = _ebml_vint(blob, q, keep_marker=False)
            if body + size > hi:
                raise ValueError("EBML element overruns parent")
            yield eid, body, body + size
            p = body + size

    def uint(lo: int, hi: int) -> int:
        v = 0
        for i in range(lo, hi):
            v = (v << 8) | blob[i]
        return v

    try:
        if blob[:4] != b"\x1aE\xdf\xa3":
            out["status"] = "not_mkv"
            return out
        segment = None
        for eid, lo, hi in elements(0, len(blob)):
            if eid == 0x18538067:
                segment = (lo, hi)
        if segment is None:
            out["status"] = "no_segment"
            return out
        tscale = 1_000_000
        dur_ticks = None
        n_blocks = 0
        video_seen = False
        for eid, lo, hi in elements(*segment):
            if eid == 0x1549A966:  # Info
                for e2, l2, h2 in elements(lo, hi):
                    if e2 == 0x2AD7B1:
                        tscale = uint(l2, h2)
                    elif e2 == 0x4489:
                        raw = blob[l2:h2]
                        dur_ticks = _s.unpack(
                            ">f" if len(raw) == 4 else ">d", raw)[0]
            elif eid == 0x1654AE6B:  # Tracks
                for e2, l2, h2 in elements(lo, hi):
                    if e2 != 0xAE:  # TrackEntry
                        continue
                    out["n_tracks"] += 1
                    ttype = None
                    codec = None
                    w = h = None
                    for e3, l3, h3 in elements(l2, h2):
                        if e3 == 0x83:
                            ttype = uint(l3, h3)
                        elif e3 == 0x86:
                            codec = blob[l3:h3].decode("ascii",
                                                       "replace")
                        elif e3 == 0xE0:  # Video
                            for e4, l4, h4 in elements(l3, h3):
                                if e4 == 0xB0:
                                    w = uint(l4, h4)
                                elif e4 == 0xBA:
                                    h = uint(l4, h4)
                    if ttype == 1 and not video_seen:
                        video_seen = True
                        out.update(width=w, height=h, codec=codec)
            elif eid == 0x1F43B675:  # Cluster
                for e2, l2, h2 in elements(lo, hi):
                    if e2 == 0xA3:  # SimpleBlock
                        n_blocks += 1
        if dur_ticks is not None:
            out["duration_ms"] = int(dur_ticks * tscale / 1_000_000)
        out["n_frames"] = n_blocks
        if not video_seen:
            out["status"] = "no_video_track"
        return out
    except (IndexError, ValueError, _s.error):
        out["status"] = "truncated"
        return out


def probe_video_containers(media: DataFrame) -> DataFrame:
    """Arrow-batched MP4/MKV container probe (dispatch on magic).
    Same 100 TB shape as every decode stage here: mapInPandas over the
    partition's batches, no shuffle, blob column pruned upstream when
    only metadata is needed."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, b in zip(batch["doc_id"], batch["blob"]):
                blob = bytes(b) if b is not None else b""
                if blob[:4] == b"\x1aE\xdf\xa3":
                    p = probe_mkv(blob)
                elif len(blob) >= 8 and blob[4:8] == b"ftyp":
                    p = probe_mp4(blob)
                else:
                    p = {"container": "unknown", "codec": None,
                         "width": None, "height": None,
                         "duration_ms": None, "n_frames": None,
                         "n_tracks": 0, "status": "unrecognized"}
                p["doc_id"] = doc_id
                rows.append(p)
            out = pd.DataFrame(rows)
            for c in ("width", "height"):
                out[c] = out[c].astype("Int32")
            out["n_tracks"] = out["n_tracks"].astype("Int32")
            for c in ("duration_ms", "n_frames"):
                out[c] = out[c].astype("Int64")
            yield out[["doc_id", "container", "codec", "width",
                       "height", "duration_ms", "n_frames",
                       "n_tracks", "status"]]

    return media.mapInPandas(run, schema=VIDEO_PROBE_SCHEMA)


def synth_mp4(doc_id: int) -> bytes:
    """Deterministic VALID minimal MP4 whose movie parameters are
    closed-form in doc_id — duration_ms = 1000 + (doc_id mod 97)·40,
    width = 16·(1 + doc_id mod 9), height = 16·(1 + doc_id mod 5),
    n_frames = 1 + doc_id mod 250, codec 'avc1' — so a SQL oracle
    computes the probed metadata analytically while the engine walks
    ACTUAL box bytes (the synth_gray_png pattern applied to ISO
    BMFF).  One video trak: ftyp + moov(mvhd + trak(tkhd +
    mdia(mdhd + hdlr + minf(stbl(stsd + stsz))))) + mdat."""
    import struct as _s

    dur_ms = 1000 + (doc_id % 97) * 40
    w = 16 * (1 + doc_id % 9)
    h = 16 * (1 + doc_id % 5)
    nframes = 1 + doc_id % 250
    timescale = 1000  # 1 tick = 1 ms

    def box(btype: bytes, payload: bytes) -> bytes:
        return _s.pack(">I", 8 + len(payload)) + btype + payload

    ftyp = box(b"ftyp", b"isom" + _s.pack(">I", 512) + b"isomavc1")
    mvhd = box(b"mvhd", bytes(4) + _s.pack(
        ">IIII", 0, 0, timescale, dur_ms)
        + _s.pack(">IH", 0x00010000, 0x0100) + bytes(10)
        + _s.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                  0x40000000)
        + bytes(24) + _s.pack(">I", 2))
    tkhd = box(b"tkhd", _s.pack(">I", 7) + _s.pack(
        ">IIIII", 0, 0, 1, 0, dur_ms) + bytes(16)
        + _s.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                  0x40000000)
        + _s.pack(">II", w << 16, h << 16))
    mdhd = box(b"mdhd", bytes(4) + _s.pack(
        ">IIII", 0, 0, timescale, dur_ms) + _s.pack(">HH", 0x55C4, 0))
    hdlr = box(b"hdlr", bytes(4) + _s.pack(">I", 0) + b"vide"
               + bytes(12) + b"synth\x00")
    # minimal avc1 sample entry (no avcC needed for a probe target)
    entry = box(b"avc1", bytes(6) + _s.pack(">H", 1) + bytes(16)
                + _s.pack(">HH", w, h) + _s.pack(">II", 0x480000,
                                                 0x480000)
                + _s.pack(">I", 0) + _s.pack(">H", 1) + bytes(32)
                + _s.pack(">Hh", 0x18, -1))
    stsd = box(b"stsd", bytes(4) + _s.pack(">I", 1) + entry)
    stts = box(b"stts", bytes(4) + _s.pack(">III", 1, nframes,
                                           dur_ms // max(nframes, 1)))
    stsc = box(b"stsc", bytes(4) + _s.pack(">IIII", 1, 1, nframes, 1))
    stsz = box(b"stsz", bytes(4) + _s.pack(">II", 0, nframes)
               + b"".join(_s.pack(">I", 16) for _ in range(nframes)))
    stco = box(b"stco", bytes(4) + _s.pack(">II", 1, 0))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = box(b"vmhd", _s.pack(">I", 1) + bytes(8))
    dinf = box(b"dinf", box(b"dref", bytes(4) + _s.pack(">I", 1)
                            + box(b"url ", _s.pack(">I", 1))))
    minf = box(b"minf", vmhd + dinf + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    mdat = box(b"mdat", bytes(16))
    return ftyp + moov + mdat


def synth_mkv(doc_id: int) -> bytes:
    """Deterministic VALID minimal Matroska file, closed-form in
    doc_id — duration_ms = 500 + (doc_id mod 89)·20, width =
    32·(1 + doc_id mod 7), height = 32·(1 + doc_id mod 3), n_frames
    (SimpleBlocks) = 1 + doc_id mod 50, codec 'V_SYNTH' — the
    analytic-oracle pattern applied to EBML."""
    import struct as _s

    dur_ms = 500 + (doc_id % 89) * 20
    w = 32 * (1 + doc_id % 7)
    h = 32 * (1 + doc_id % 3)
    nframes = 1 + doc_id % 50

    def vint_size(v: int) -> bytes:
        """Size field, 2-byte form (marker 0x40): values < 2^14."""
        return _s.pack(">H", 0x4000 | v)

    def elem(eid: bytes, payload: bytes) -> bytes:
        return eid + vint_size(len(payload)) + payload

    def uint_bytes(v: int) -> bytes:
        n = max(1, (v.bit_length() + 7) // 8)
        return v.to_bytes(n, "big")

    ebml = elem(b"\x1aE\xdf\xa3",
                elem(b"\x42\x86", b"\x01")      # EBMLVersion
                + elem(b"\x42\xf7", b"\x01")    # EBMLReadVersion
                + elem(b"\x42\x82", b"matroska"))
    info = elem(b"\x15\x49\xa9\x66",
                elem(b"\x2a\xd7\xb1", uint_bytes(1_000_000))
                + elem(b"\x44\x89", _s.pack(">d", float(dur_ms))))
    video = elem(b"\xe0", elem(b"\xb0", uint_bytes(w))
                 + elem(b"\xba", uint_bytes(h)))
    track = elem(b"\xae",
                 elem(b"\xd7", b"\x01")          # TrackNumber
                 + elem(b"\x83", b"\x01")        # TrackType video
                 + elem(b"\x86", b"V_SYNTH")     # CodecID
                 + video)
    tracks = elem(b"\x16\x54\xae\x6b", track)
    blocks = b"".join(
        elem(b"\xa3", b"\x81" + _s.pack(">h", k) + b"\x80"
             + bytes([(doc_id + k) % 256] * 4))
        for k in range(nframes))
    cluster = elem(b"\x1f\x43\xb6\x75",
                   elem(b"\xe7", uint_bytes(0)) + blocks)
    segment = elem(b"\x18\x53\x80\x67", info + tracks + cluster)
    return ebml + segment


# ---------------------------------------------------------------------------
# Realistic-encoding synthesizers (r10 verdict task #3): the analytic-
# oracle synths above deliberately use degenerate encodings (clear-per-
# pixel LZW, DC-only JPEG blocks) so SQL oracles can verify the decoded
# values exactly — right for correctness, but as BENCHMARK inputs they
# measure worst-case (GIF) or best-case (JPEG) decode cost.  These
# synths produce typical encodings — standard dictionary-growth LZW and
# entropy-dense multi-AC JPEG blocks — for the decode-throughput bench
# arms (bench.py decode_realistic_mb_s_*).


def _mix32(x: int) -> int:
    """Deterministic 32-bit mixer (keyed-PRF style, no random module
    so both engines and every re-run agree)."""
    x = (x ^ (x >> 16)) * 0x45D9F3B & 0xFFFFFFFF
    x = (x ^ (x >> 16)) * 0x45D9F3B & 0xFFFFFFFF
    return x ^ (x >> 16)


def lzw_encode_gif(pixels: bytes, min_code_size: int = 8) -> bytes:
    """STANDARD GIF LZW compression (spec appendix F): real dictionary
    growth, width escalation 9→12 bits, deferred clear at 4096 — the
    exact inverse of _lzw_decode_gif's common path (the synth_gray_gif
    stream only ever exercises its clear-reset path)."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    acc = nbits = 0
    out = bytearray()

    def push(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    nxt = eoi + 1
    push(clear, width)
    cur = b""
    for p in pixels:
        cand = cur + bytes([p])
        if cand in table:
            cur = cand
            continue
        push(table[cur], width)
        if nxt < 4096:
            table[cand] = nxt
            nxt += 1
            # LATE width change (GIF convention): the decoder is one
            # table-add behind, so the width grows only after code 2^W
            # itself is defined
            if nxt - 1 == (1 << width) and width < 12:
                width += 1
        else:  # deferred clear
            push(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            nxt = eoi + 1
            width = min_code_size + 1
        cur = bytes([p])
    if cur:
        push(table[cur], width)
    push(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(pixels: bytes, w: int, h: int,
               interlaced: bool = False) -> bytes:
    """Wrap standard-LZW pixel data in a valid GIF89a container
    (256-gray global palette, optional interlacing)."""
    import struct as _s

    pal = bytes(v for i in range(256) for v in (i, i, i))
    if interlaced:
        order = ([r for r in range(0, h, 8)]
                 + [r for r in range(4, h, 8)]
                 + [r for r in range(2, h, 4)]
                 + [r for r in range(1, h, 2)])
        pixels = b"".join(pixels[r * w:(r + 1) * w] for r in order)
    data = lzw_encode_gif(pixels)
    blocks = bytearray([8])
    for off in range(0, len(data), 255):
        chunk = data[off:off + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return (b"GIF89a" + _s.pack("<HHBBB", w, h, 0xF7, 0, 0) + pal
            + b"\x2C" + _s.pack("<HHHHB", 0, 0, w, h,
                                0x40 if interlaced else 0)
            + bytes(blocks) + b"\x3B")


def synth_textured_gif(doc_id: int, w: int = 128, h: int = 96) -> bytes:
    """Typical-encoding GIF: patterned + ~50% PRF noise pixels through
    the STANDARD LZW compressor — long matches AND fresh dictionary
    entries, so the decoder walks the common 9→12-bit growth path
    instead of the worst-case clear-per-pixel stream."""
    px = bytearray(w * h)
    for y in range(h):
        base = _mix32(doc_id * 1_000_003 + y)
        for x in range(w):
            if (base >> (x & 15)) & 1:
                px[y * w + x] = (x * 3 + y) % 256
            else:
                px[y * w + x] = _mix32(base + x) % 256
    return encode_gif(bytes(px), w, h)


def synth_textured_jpeg(doc_id: int, blocks_w: int = 8,
                        blocks_h: int = 8, ac_per_block: int = 6) -> bytes:
    """Typical-entropy baseline JPEG: each 8×8 block carries a varying
    DC plus ``ac_per_block`` PRF-placed nonzero AC coefficients —
    roughly the entropy density of a quality-50 photographic image —
    so the decode bench pays realistic Huffman AND non-trivial IDCT
    work per block (synth_gray_jpeg's DC-only blocks measure the
    floor).  Coefficient-level synthesis: the stream is built with the
    same Annex K tables the decoder reads, so it is valid baseline
    JPEG by construction."""
    import struct as _s

    w, h = blocks_w * 8, blocks_h * 8
    dc_map = _huff_encode_map(*_STD_DC_LUMA)
    ac_map = _huff_encode_map(*_STD_AC_LUMA)
    bw = _JpegBitWriter()
    pred = 0

    def put(val: int, code_map: dict, rs_high: int = 0) -> None:
        t = abs(val).bit_length()
        code, ln = code_map[(rs_high << 4) | t]
        bw.write(code, ln)
        if t:
            bw.write(val if val >= 0 else val + (1 << t) - 1, t)

    for bi in range(blocks_h):
        for bj in range(blocks_w):
            seed = _mix32(doc_id * 7_368_787 + bi * 131 + bj)
            dc = (seed % 1024) - 512
            put(dc - pred, dc_map)
            pred = dc
            # nonzero ACs at ascending PRF positions in zigzag order
            ks = sorted({1 + _mix32(seed + 17 * j) % 20
                         for j in range(ac_per_block)})
            prev_k = 0
            for k in ks:
                run = k - prev_k - 1
                while run > 15:
                    code, ln = ac_map[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                v = (_mix32(seed ^ k) % 31) - 15
                if v == 0:
                    v = 1
                put(v, ac_map, run)
                prev_k = k
            if ks[-1] < 63:
                code, ln = ac_map[0x00]  # EOB
                bw.write(code, ln)
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + _s.pack(">H", len(payload) + 2) \
            + payload

    # Annex K luminance quant table (quality-50 reference table)
    qtab = bytes([
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99])
    dqt = seg(0xDB, bytes([0x00]) + qtab)
    sof = seg(0xC0, bytes([8]) + _s.pack(">HH", h, w)
              + bytes([1, 0x01, 0x11, 0x00]))
    dht = (seg(0xC4, bytes([0x00]) + bytes(_STD_DC_LUMA[0])
               + bytes(_STD_DC_LUMA[1]))
           + seg(0xC4, bytes([0x10]) + bytes(_STD_AC_LUMA[0])
                 + bytes(_STD_AC_LUMA[1])))
    sos = seg(0xDA, bytes([1, 0x01, 0x00, 0x00, 0x3F, 0x00]))
    return (b"\xff\xd8" + dqt + sof + dht + sos + entropy
            + b"\xff\xd9")


# ---------------------------------------------------------------------------
# Audio CONTAINER probing — MP3 (MPEG-1 Layer III frame-header walk,
# ISO/IEC 11172-3) and FLAC (STREAMINFO metadata-block walk, the
# xiph.org spec) — pure stdlib, completing the container matrix:
# image PNG/JPEG/GIF/BMP decode for real, audio WAV decodes + MP3/FLAC
# probe, video MP4/MKV probe.  Same analytic-oracle pattern as the
# video probes (synth parameters closed-form in doc_id); same 100 TB
# plan shape (mapInPandas, no shuffle).  Reference parity n/a — the
# reference has no media operators; this is the LLM-data-pipeline
# brief.

AUDIO_PROBE_SCHEMA = (
    "doc_id long, container string, codec string, sample_rate int, "
    "channels int, bits_per_sample int, bitrate_kbps int, "
    "n_frames long, n_samples long, n_blocks int, duration_ms long, "
    "status string"
)

# MPEG-1 Layer III bitrate table (kbps), index 1..14; 0 = free, 15 = bad.
_MP3_BITRATE_V1L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
                     192, 224, 256, 320, 0)
_MP3_SAMPLERATE_V1 = (44100, 48000, 32000, 0)
_SAMPLES_PER_FRAME_V1L3 = 1152


def _audio_none() -> dict:
    return {"container": None, "codec": None, "sample_rate": None,
            "channels": None, "bits_per_sample": None,
            "bitrate_kbps": None, "n_frames": None, "n_samples": None,
            "n_blocks": None, "duration_ms": None}


def probe_mp3(blob: bytes) -> dict:
    """MPEG audio probe: optional ID3v2 skip (syncsafe size), then a
    frame-header walk — sync 0xFFE, MPEG-1 Layer III only (per-row
    honest status for other versions/layers), frame length
    144·bitrate/samplerate + padding.  Counts frames to total samples
    (1152/frame) and integer-ms duration; an ID3v1 'TAG' trailer or
    trailing junk ends the walk without failing a file that already
    yielded frames.  Every malformed shape is a per-row status, never
    an exception (the module's honesty contract)."""
    out = _audio_none()
    out["container"] = "mp3"
    p = 0
    # ID3v2 header: "ID3" ver(2) flags(1) syncsafe-size(4)
    if blob[:3] == b"ID3":
        if len(blob) < 10:
            out["status"] = "truncated"
            return out
        if any(b & 0x80 for b in blob[6:10]):
            out["status"] = "bad_id3_size"
            return out
        tag = ((blob[6] << 21) | (blob[7] << 14)
               | (blob[8] << 7) | blob[9])
        p = 10 + tag
    n_frames = 0
    sr = br = ch = None
    while p + 4 <= len(blob):
        b0, b1, b2, b3 = blob[p:p + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            break  # trailing junk / ID3v1 trailer — end of frame run
        version = (b1 >> 3) & 3
        layer = (b1 >> 1) & 3
        if version != 3 or layer != 1:  # MPEG-1, Layer III
            out["status"] = "unsupported_mpeg_variant"
            return out
        bi = b2 >> 4
        sri = (b2 >> 2) & 3
        pad = (b2 >> 1) & 1
        f_br = _MP3_BITRATE_V1L3[bi]
        f_sr = _MP3_SAMPLERATE_V1[sri]
        if f_br == 0 or f_sr == 0:
            out["status"] = "bad_frame_header"
            return out
        flen = 144 * f_br * 1000 // f_sr + pad
        if flen <= 4:
            out["status"] = "bad_frame_header"
            return out
        if p + flen > len(blob):
            out["status"] = "truncated"
            return out
        if n_frames == 0:
            sr, br = f_sr, f_br
            ch = 1 if (b3 >> 6) == 3 else 2
        n_frames += 1
        p += flen
    if n_frames == 0:
        out["status"] = "no_sync"
        return out
    n_samples = n_frames * _SAMPLES_PER_FRAME_V1L3
    out.update({
        "codec": "mp3", "sample_rate": sr, "channels": ch,
        "bitrate_kbps": br, "n_frames": n_frames,
        "n_samples": n_samples,
        "duration_ms": n_samples * 1000 // sr,
        "status": "probed",
    })
    return out


def probe_flac(blob: bytes) -> dict:
    """FLAC probe: 'fLaC' magic, then the metadata-block walk
    (1-byte header: last-flag + type, 24-bit big-endian length).
    STREAMINFO (type 0, 34 bytes) carries sample rate (20 bits),
    channels−1 (3), bits-per-sample−1 (5), total samples (36) packed
    into one 64-bit field after the block/frame size bounds.  Audio
    FRAMES are not walked (frame count needs full frame-header
    parsing — out of probe scope); n_blocks counts metadata blocks."""
    out = _audio_none()
    if blob[:4] != b"fLaC":
        out["status"] = "not_flac"
        return out
    out["container"] = "flac"
    p, n_blocks, seen_si = 4, 0, False
    while True:
        if p + 4 > len(blob):
            out["status"] = "truncated"
            return out
        hdr = blob[p]
        last, btype = hdr >> 7, hdr & 0x7F
        blen = int.from_bytes(blob[p + 1:p + 4], "big")
        if p + 4 + blen > len(blob):
            out["status"] = "truncated"
            return out
        if btype == 0:
            if blen < 34:
                out["status"] = "bad_streaminfo"
                return out
            data = blob[p + 4:p + 4 + 34]
            field = int.from_bytes(data[10:18], "big")
            sr = field >> 44
            if sr == 0:
                out["status"] = "bad_streaminfo"
                return out
            total = field & ((1 << 36) - 1)
            out.update({
                "codec": "flac", "sample_rate": sr,
                "channels": ((field >> 41) & 7) + 1,
                "bits_per_sample": ((field >> 36) & 0x1F) + 1,
                "n_samples": total,
                "duration_ms": total * 1000 // sr,
            })
            seen_si = True
        n_blocks += 1
        p += 4 + blen
        if last:
            break
    if not seen_si:
        out["status"] = "no_streaminfo"
        return out
    out["n_blocks"] = n_blocks
    out["status"] = "probed"
    return out


_OGG_CRC_TABLE: list[int] | None = None


def _ogg_crc(data: bytes) -> int:
    """Ogg page CRC (RFC 3533 §6): CRC-32, polynomial 0x04C11DB7,
    NON-reflected, init 0, no final xor — deliberately not zlib's."""
    global _OGG_CRC_TABLE
    if _OGG_CRC_TABLE is None:
        tbl = []
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
            tbl.append(r & 0xFFFFFFFF)
        _OGG_CRC_TABLE = tbl
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[
            ((crc >> 24) & 0xFF) ^ b]
    return crc


def probe_ogg(blob: bytes) -> dict:
    """Ogg container probe (RFC 3533): page walk — 'OggS' capture
    pattern, version 0, header-type, 64-bit granule, serial, sequence,
    CRC (VERIFIED per page with the non-reflected 0x04C11DB7 CRC-32,
    crc field zeroed), segment lacing table.  Packets = lacing values
    < 255 (a 255 continues into the next value/page).  The first
    packet identifies the codec: Vorbis identification header
    ('\\x01vorbis': version, channels, sample rate — Vorbis I spec
    §4.2.2) or OpusHead (RFC 7845 §5.1: version, channels, pre-skip,
    input sample rate).  Duration from the last page's granule
    position: Vorbis granule = PCM samples at the stream rate; Opus
    granule = 48 kHz samples including pre-skip.  Schema mapping:
    n_blocks = pages, n_frames = packets."""
    import struct as _s

    out = _audio_none()
    if blob[:4] != b"OggS":
        out["status"] = "not_ogg"
        return out
    out["container"] = "ogg"
    p = 0
    n_pages = 0
    n_packets = 0
    last_granule = None
    first_packet = None
    preskip = 0
    while p < len(blob):
        if blob[p:p + 4] != b"OggS":
            out["status"] = "bad_capture_pattern"
            return out
        if p + 27 > len(blob):
            out["status"] = "truncated"
            return out
        (ver, _htype, granule, _serial, _seq, crc, nsegs) = _s.unpack_from(
            "<BBqIIIB", blob, p + 4)
        if ver != 0:
            out["status"] = f"bad_version_{ver}"
            return out
        seg_tab = blob[p + 27:p + 27 + nsegs]
        if len(seg_tab) < nsegs:
            out["status"] = "truncated"
            return out
        body_len = sum(seg_tab)
        page_end = p + 27 + nsegs + body_len
        if page_end > len(blob):
            out["status"] = "truncated"
            return out
        page = bytearray(blob[p:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            out["status"] = "crc_mismatch"
            return out
        n_packets += sum(1 for v in seg_tab if v < 255)
        if granule != -1:
            last_granule = granule
        if first_packet is None and nsegs:
            first_packet = blob[p + 27 + nsegs:
                                p + 27 + nsegs + seg_tab[0]]
        n_pages += 1
        p = page_end
    if first_packet is None:
        out["status"] = "no_packets"
        return out
    if first_packet[:7] == b"\x01vorbis":
        if len(first_packet) < 16:
            out["status"] = "bad_id_header"
            return out
        ch = first_packet[11]
        (rate,) = _s.unpack_from("<I", first_packet, 12)
        if rate == 0:
            out["status"] = "bad_id_header"
            return out
        out.update({"codec": "vorbis", "sample_rate": rate,
                    "channels": ch})
        granule_rate = rate
    elif first_packet[:8] == b"OpusHead":
        if len(first_packet) < 19:
            out["status"] = "bad_id_header"
            return out
        ch = first_packet[9]
        (preskip,) = _s.unpack_from("<H", first_packet, 10)
        (rate,) = _s.unpack_from("<I", first_packet, 12)
        out.update({"codec": "opus", "sample_rate": rate,
                    "channels": ch})
        granule_rate = 48_000
    else:
        out["status"] = "unknown_codec"
        return out
    out["n_blocks"] = n_pages
    out["n_frames"] = n_packets
    if last_granule is not None:
        samples = max(last_granule - preskip, 0)
        out["n_samples"] = samples
        out["duration_ms"] = samples * 1000 // granule_rate
    out["status"] = "probed"
    return out


def synth_ogg(doc_id: int) -> bytes:
    """Deterministic VALID minimal Ogg stream, closed-form in doc_id:
    codec = opus when doc_id even else vorbis; channels = 2 when
    doc_id ≡ 0 (mod 3) else 1; vorbis rate = (44100, 48000, 32000)
    [doc_id mod 3], opus input rate = (8000, 12000, 16000, 24000,
    48000)[doc_id mod 5] with pre-skip 312; pages = 1 BOS id-header
    page + (1 + doc_id mod 5) audio pages of (1 + doc_id mod 3)
    one-lacing packets each; total samples = spf·(10 + doc_id mod 50)
    with spf = 960 (opus, granule offset +pre-skip) / 1024 (vorbis).
    Every page carries a REAL RFC 3533 CRC — the probe verifies it."""
    import struct as _s

    opus = doc_id % 2 == 0
    ch = 2 if doc_id % 3 == 0 else 1
    serial = (doc_id * 2654435761) & 0xFFFFFFFF
    spf = 960 if opus else 1024
    total = spf * (10 + doc_id % 50)
    preskip = 312
    if opus:
        rate = (8000, 12000, 16000, 24000, 48000)[doc_id % 5]
        id_pkt = (b"OpusHead" + bytes([1, ch])
                  + _s.pack("<H", preskip) + _s.pack("<I", rate)
                  + _s.pack("<h", 0) + b"\x00")
        final_granule = preskip + total
    else:
        rate = (44100, 48000, 32000)[doc_id % 3]
        id_pkt = (b"\x01vorbis" + _s.pack("<I", 0) + bytes([ch])
                  + _s.pack("<I", rate) + bytes(12)
                  + b"\xb8" + b"\x01")
        final_granule = total

    def page(htype: int, granule: int, seq: int,
             packets: list[bytes]) -> bytes:
        seg_tab = bytearray()
        body = bytearray()
        for pk in packets:
            # packets stay < 255 bytes in this synth → one lacing each
            seg_tab.append(len(pk))
            body += pk
        hdr = bytearray(b"OggS")
        hdr += _s.pack("<BBqIIIB", 0, htype, granule, serial, seq, 0,
                       len(seg_tab))
        hdr += seg_tab
        full = bytes(hdr) + bytes(body)
        crc = _ogg_crc(full)
        return full[:22] + _s.pack("<I", crc) + full[26:]

    n_audio_pages = 1 + doc_id % 5
    ppp = 1 + doc_id % 3
    out = [page(0x02, 0 if not opus else 0, 0, [id_pkt])]
    for k in range(n_audio_pages):
        granule = (final_granule if k == n_audio_pages - 1
                   else (preskip if opus else 0)
                   + spf * (k + 1) * (10 + doc_id % 50)
                   // n_audio_pages)
        pkts = [bytes([17 + (doc_id + k + i) % 40])
                * (20 + (doc_id + k * 3 + i) % 60)
                for i in range(ppp)]
        htype = 0x04 if k == n_audio_pages - 1 else 0x00  # EOS on last
        out.append(page(htype, granule, k + 1, pkts))
    return b"".join(out)


def probe_audio_containers(media: DataFrame) -> DataFrame:
    """Arrow-batched MP3/FLAC container probe (dispatch on magic) —
    mapInPandas over the partition's batches, no shuffle."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, b in zip(batch["doc_id"], batch["blob"]):
                blob = bytes(b) if b is not None else b""
                if blob[:4] == b"fLaC":
                    p = probe_flac(blob)
                elif blob[:4] == b"OggS":
                    p = probe_ogg(blob)
                elif (blob[:3] == b"ID3"
                      or (len(blob) >= 2 and blob[0] == 0xFF
                          and (blob[1] & 0xE0) == 0xE0)):
                    p = probe_mp3(blob)
                else:
                    p = _audio_none()
                    p["status"] = "unrecognized"
                p["doc_id"] = doc_id
                rows.append(p)
            out = pd.DataFrame(rows)
            for c in ("sample_rate", "channels", "bits_per_sample",
                      "bitrate_kbps", "n_blocks"):
                out[c] = out[c].astype("Int32")
            for c in ("n_frames", "n_samples", "duration_ms"):
                out[c] = out[c].astype("Int64")
            yield out[["doc_id", "container", "codec", "sample_rate",
                       "channels", "bits_per_sample", "bitrate_kbps",
                       "n_frames", "n_samples", "n_blocks",
                       "duration_ms", "status"]]

    return media.mapInPandas(run, schema=AUDIO_PROBE_SCHEMA)


def synth_mp3(doc_id: int) -> bytes:
    """Deterministic VALID MPEG-1 Layer III frame run, closed-form in
    doc_id: sample_rate = (44100, 48000, 32000)[doc_id mod 3],
    bitrate = V1L3 table[1 + doc_id mod 14], channels = 1 if doc_id
    odd else 2, n_frames = 1 + doc_id mod 60; every 5th doc gets an
    ID3v2 prefix and every 7th an ID3v1 'TAG' trailer (the probe must
    skip both).  Frame payloads are zeros — the probe reads only
    headers."""
    sri = doc_id % 3
    bi = 1 + doc_id % 14
    nframes = 1 + doc_id % 60
    mode = 3 if doc_id % 2 == 1 else 0  # mono : stereo
    sr = _MP3_SAMPLERATE_V1[sri]
    br = _MP3_BITRATE_V1L3[bi]
    flen = 144 * br * 1000 // sr
    hdr = bytes([0xFF, 0xFB, (bi << 4) | (sri << 2), mode << 6])
    frame = hdr + bytes(flen - 4)
    pre = b""
    if doc_id % 5 == 0:
        tag = 17 + doc_id % 23
        pre = (b"ID3\x03\x00\x00"
               + bytes([(tag >> 21) & 0x7F, (tag >> 14) & 0x7F,
                        (tag >> 7) & 0x7F, tag & 0x7F])
               + bytes(tag))
    post = (b"TAG" + bytes(125)) if doc_id % 7 == 0 else b""
    return pre + frame * nframes + post


def synth_flac(doc_id: int) -> bytes:
    """Deterministic VALID FLAC metadata stream, closed-form in
    doc_id: sample_rate = (44100, 48000, 96000, 22050)[doc_id mod 4],
    channels = 1 + doc_id mod 2, bits = 24 if doc_id mod 3 == 0 else
    16, total_samples = 1000 + (doc_id mod 101)·441, plus doc_id mod 4
    PADDING blocks (n_blocks = 1 + doc_id mod 4)."""
    sr = (44100, 48000, 96000, 22050)[doc_id % 4]
    ch = 1 + doc_id % 2
    bps = 24 if doc_id % 3 == 0 else 16
    total = 1000 + (doc_id % 101) * 441
    field = ((sr << 44) | ((ch - 1) << 41) | ((bps - 1) << 36)
             | total)
    si_data = ((4096).to_bytes(2, "big") * 2 + bytes(6)
               + field.to_bytes(8, "big") + bytes(16))
    npad = doc_id % 4
    out = [b"fLaC"]
    si_hdr = (0x00 if npad else 0x80)
    out.append(bytes([si_hdr]) + len(si_data).to_bytes(3, "big")
               + si_data)
    for k in range(npad):
        last = 0x80 if k == npad - 1 else 0x00
        plen = 8 + k
        out.append(bytes([last | 0x01]) + plen.to_bytes(3, "big")
                   + bytes(plen))
    return b"".join(out)
