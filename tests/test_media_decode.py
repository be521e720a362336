"""REAL stdlib media decode (datapipe/multimodal.py decode_png /
decode_wav / decode_pixels): a test-local PNG ENCODER writes valid
files exercising every scanline filter (None/Sub/Up/Average/Paeth) and
every 8-bit color type (gray / RGB / palette / gray+alpha / RGBA); the
decoder must reproduce the exact integer pixel statistics computed
independently from the source pixel matrix.  WAV: stdlib-written PCM
with exact isqrt RMS.  The mapInPandas plumbing routes mixed blobs to
the right decoder with per-row status."""

import io
import math
import random
import struct
import wave
import zlib

from sequin_spark.datapipe.multimodal import (
    attach_media,
    decode_pixels,
    decode_png,
    decode_wav,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(pixels, color_type, filters, plte=None):
    """Minimal valid PNG encoder (the test-side inverse of decode_png):
    ``pixels`` = rows of per-pixel channel tuples; ``filters`` = the
    filter byte to APPLY per row (cycled)."""
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    h = len(pixels)
    w = len(pixels[0])
    raw = bytearray()
    prev = bytes(w * ch)
    for r in range(h):
        cur = bytes(v for px in pixels[r] for v in px)
        f = filters[r % len(filters)]
        raw.append(f)
        if f == 0:
            enc = cur
        elif f == 1:
            enc = bytes((cur[i] - (cur[i - ch] if i >= ch else 0)) & 0xFF
                        for i in range(len(cur)))
        elif f == 2:
            enc = bytes((cur[i] - prev[i]) & 0xFF
                        for i in range(len(cur)))
        elif f == 3:
            enc = bytes((cur[i] - (((cur[i - ch] if i >= ch else 0)
                                    + prev[i]) >> 1)) & 0xFF
                        for i in range(len(cur)))
        else:
            enc = bytes((cur[i] - _paeth(cur[i - ch] if i >= ch else 0,
                                         prev[i],
                                         prev[i - ch] if i >= ch else 0))
                        & 0xFF for i in range(len(cur)))
        raw += enc
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", bytes(plte))
    out += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += _chunk(b"IEND", b"")
    return out


def _expected_luma(pixels, color_type, plte=None):
    total = n = 0
    for row in pixels:
        for px in row:
            if color_type == 0:
                total += px[0]
            elif color_type == 2:
                total += (px[0] + px[1] + px[2]) // 3
            elif color_type == 3:
                b = px[0] * 3
                total += (plte[b] + plte[b + 1] + plte[b + 2]) // 3
            elif color_type == 4:
                total += px[0]
            else:
                total += (px[0] + px[1] + px[2]) // 3
            n += 1
    return (1000 * total) // n


def _rand_pixels(rng, w, h, ch, maxv=255):
    return [[tuple(rng.randrange(maxv + 1) for _ in range(ch))
             for _ in range(w)] for _ in range(h)]


def test_png_all_filters_all_color_types_exact():
    rng = random.Random(20260815)
    plte = [rng.randrange(256) for _ in range(3 * 16)]
    cases = [
        (0, None), (2, None), (4, None), (6, None), (3, plte),
    ]
    filters = [0, 1, 2, 3, 4]
    for color_type, pal in cases:
        ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
        maxv = 15 if color_type == 3 else 255
        px = _rand_pixels(rng, w=9, h=10, ch=ch, maxv=maxv)
        blob = encode_png(px, color_type, filters, plte=pal)
        got = decode_png(blob)
        assert got["status"] == "decoded", (color_type, got)
        assert (got["width"], got["height"]) == (9, 10)
        assert got["n_pixels"] == 90
        assert got["mean_luma_x1000"] == \
            _expected_luma(px, color_type, pal), color_type


def test_png_unsupported_and_garbage():
    # 16-bit depth → explicit unsupported, not wrong pixels
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    blob = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IEND", b""))
    assert decode_png(blob)["status"] == "unsupported_depth_16"
    assert decode_png(b"not a png at all")["status"] == "not_png"
    # valid signature, truncated chunks
    assert decode_png(b"\x89PNG\r\n\x1a\n\x00\x00")["status"] \
        == "truncated"


def _make_wav(samples, rate=8000, width=2, nch=1):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(nch)
        f.setsampwidth(width)
        f.setframerate(rate)
        if width == 2:
            f.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        else:
            f.writeframes(bytes((s + 128) & 0xFF for s in samples))
    return buf.getvalue()


def test_wav_pcm16_exact_stats():
    rng = random.Random(7)
    samples = [rng.randrange(-3000, 3000) for _ in range(800)]
    got = decode_wav(_make_wav(samples, rate=8000))
    assert got["status"] == "decoded"
    assert got["sample_rate"] == 8000 and got["n_channels"] == 1
    assert got["n_samples"] == 800
    assert got["duration_ms"] == 100  # 800 / 8000 s
    mean_sq = sum(s * s for s in samples) // 800
    assert got["rms_x1000"] == math.isqrt(mean_sq * 1_000_000)


def test_wav_pcm8_and_garbage():
    got = decode_wav(_make_wav([0, 10, -10, 127, -128], width=1))
    assert got["status"] == "decoded" and got["n_samples"] == 5
    assert decode_wav(b"RIFFxxxxWAVEjunk")["status"] == "truncated"


def test_decode_pixels_spark_plumbing(spark):
    """Mixed blobs through the Arrow mapInPandas path: PNG/JPEG/GIF
    rows decode for real, WAV rows decode for real, a truncated GIF
    body gets an honest error status, garbage gets unrecognized."""
    from sequin_spark.datapipe.multimodal import (
        synth_gray_gif,
        synth_gray_jpeg,
    )

    rng = random.Random(99)
    px = _rand_pixels(rng, 4, 3, 3)
    png = encode_png(px, 2, [0, 1, 4])
    wav = _make_wav([100, -100, 2000, -2000], rate=16000)
    gif = synth_gray_gif(23)
    jpg = synth_gray_jpeg(17)
    rows = [(1, png), (2, wav), (3, gif), (4, b"garbage"), (5, jpg)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    media = attach_media(df, "payload", media_type="image")
    got = {r["doc_id"]: r for r in decode_pixels(media).collect()}
    assert got[5]["status"] == "decoded"
    vals = [(17 * 37 + bi * 11 + bj * 5) % 256
            for bi in range(2) for bj in range(2)]
    assert got[5]["mean_luma_x1000"] == (1000 * 64 * sum(vals)) // 256
    assert (got[5]["width"], got[5]["height"]) == (16, 16)
    assert got[1]["status"] == "decoded"
    assert got[1]["mean_luma_x1000"] == _expected_luma(px, 2)
    assert (got[1]["width"], got[1]["height"]) == (4, 3)
    assert got[2]["status"] == "decoded"
    assert got[2]["duration_ms"] == 0  # 4 samples @16k < 1 ms
    assert got[2]["rms_x1000"] > 0
    assert got[3]["status"] == "decoded"  # GIF decodes for REAL now
    assert (got[3]["format"], got[3]["width"]) == ("gif", 16)
    vals = [(23 * 31 + i * 7 + j) % 256
            for i in range(8) for j in range(16)]
    assert got[3]["mean_luma_x1000"] == (1000 * sum(vals)) // 128
    assert got[4]["status"] == "unrecognized"
