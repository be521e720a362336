"""GIF (LZW) and BMP pixel decoders (datapipe/multimodal) — the
synth path (clear-per-pixel LZW) exercises the reset path only, so
the differential here drives the decoder with the package's STANDARD
GIF LZW compressor (multimodal.encode_gif — real dictionary growth,
width escalation 9→12 bits, deferred clear at 4096; promoted from this
file in r11 to feed the realistic decode bench arms) and an interlaced
writer; BMP gets 24-bit true-color and top-down variants.  No
PIL/ImageMagick exists in this container, so the differential is
self-contained like the JPEG one (tests/test_jpeg.py).
"""

import random
import struct

from sequin_spark.datapipe.multimodal import (
    decode_bmp,
    decode_gif,
    encode_gif,
    synth_gray_bmp,
    synth_gray_gif,
)


def _expected_luma(pixels: bytes) -> int:
    return (1000 * sum(pixels)) // len(pixels)  # gray palette: luma=i


def test_gif_standard_lzw_with_dictionary_growth():
    """A 64×64 random-ish image compresses through full dictionary
    growth (9→12-bit widths + a deferred clear) — the decoder must
    invert it exactly."""
    rng = random.Random(11)
    w, h = 128, 96
    # patterned + noisy: long matches AND fresh entries; 12288 pixels
    # with ~50% noise guarantees >4096 dictionary adds, so the stream
    # walks 9→10→11→12-bit widths AND takes the deferred-clear reset
    px = bytes(((x * 3 + y) % 256 if rng.random() < 0.5
                else rng.randrange(256))
               for y in range(h) for x in range(w))
    d = decode_gif(encode_gif(px, w, h))
    assert d["status"] == "decoded"
    assert (d["width"], d["height"], d["n_pixels"]) == (w, h, w * h)
    assert d["mean_luma_x1000"] == _expected_luma(px)


def test_gif_interlaced_deinterlaces():
    """The mean is row-order invariant, so pin de-interlacing with a
    row-DEPENDENT statistic: a gradient image whose interlaced decode
    equals the straight decode of the same logical image."""
    w, h = 16, 16
    px = bytes((y * 16 + x) % 256 for y in range(h) for x in range(w))
    plain = decode_gif(encode_gif(px, w, h, interlaced=False))
    inter = decode_gif(encode_gif(px, w, h, interlaced=True))
    assert plain["status"] == inter["status"] == "decoded"
    assert plain["mean_luma_x1000"] == inter["mean_luma_x1000"] \
        == _expected_luma(px)


def test_gif_synth_analytic_rule():
    for doc_id in (0, 5, 999):
        d = decode_gif(synth_gray_gif(doc_id))
        want = (1000 * sum((doc_id * 31 + i * 7 + j) % 256
                           for i in range(8) for j in range(16))) // 128
        assert d["status"] == "decoded" and d["mean_luma_x1000"] == want
        assert d["n_channels"] == 3 and d["n_frames"] == 1


def test_gif_honest_errors():
    assert decode_gif(b"GIF89a" + b"\x00" * 20)["status"] != "decoded"
    trunc = synth_gray_gif(1)[:30]
    assert decode_gif(trunc)["status"] in ("truncated", "bad_block_0x00")
    assert decode_gif(b"notagif")["status"] == "not_gif"


def test_bmp_palette_and_truecolor():
    for doc_id in (0, 7, 4095):
        d = decode_bmp(synth_gray_bmp(doc_id))
        want = (1000 * sum((doc_id * 31 + i * 7 + j) % 256
                           for i in range(8) for j in range(16))) // 128
        assert d["status"] == "decoded" and d["mean_luma_x1000"] == want

    # hand-built 24-bit 2×2 top-down BMP: pixels BGR
    pixels = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (200, 210, 220)]
    rows = bytearray()
    for y in range(2):
        for x in range(2):
            b, g, r = pixels[y * 2 + x]
            rows += bytes([b, g, r])
        rows += b"\x00" * 2  # stride pad to 8
    hdr = (b"BM" + struct.pack("<IHHI", 14 + 40 + len(rows), 0, 0, 54)
           + struct.pack("<IiihHIIiiII", 40, 2, -2, 1, 24, 0, len(rows),
                         0, 0, 0, 0))
    d = decode_bmp(hdr + bytes(rows))
    assert d["status"] == "decoded" and (d["width"], d["height"]) == (2, 2)
    want = (1000 * sum((b + g + r) // 3 for b, g, r in pixels)) // 4
    assert d["mean_luma_x1000"] == want


def test_bmp_honest_errors():
    assert decode_bmp(b"XX")["status"] == "not_bmp"
    blob = bytearray(synth_gray_bmp(1))
    struct.pack_into("<I", blob, 30, 1)  # BI_RLE8 compression
    assert decode_bmp(bytes(blob))["status"] == "unsupported_compression_1"


def test_zero_dimension_images_report_empty_not_crash():
    """ADVICE r11 (low): a zero-dimension GIF/BMP previously hit
    ZeroDivisionError (absent from the except tuples), killing the
    whole mapInPandas task instead of yielding a per-row status."""
    # GIF with a 0x0 image descriptor but a valid palette + a
    # minimal LZW stream (clear + EOI)
    pal = bytes(v for i in range(256) for v in (i, i, i))
    gif = (b"GIF89a" + struct.pack("<HHBBB", 0, 0, 0xF7, 0, 0) + pal
           + b"\x2C" + struct.pack("<HHHHB", 0, 0, 0, 0, 0)
           + b"\x08"                 # LZW min code size
           + b"\x03\x00\x01\x05"     # one sub-block: CLEAR, EOI-ish
           + b"\x00" + b"\x3B")
    d = decode_gif(gif)
    assert d["status"] != "decoded"  # empty_image or truncated — not a crash

    # BMP with width 0
    blob = bytearray(synth_gray_bmp(1))
    struct.pack_into("<i", blob, 18, 0)  # biWidth = 0
    d = decode_bmp(bytes(blob))
    assert d["status"] == "empty_image"
    # BMP with height 0
    blob = bytearray(synth_gray_bmp(1))
    struct.pack_into("<i", blob, 22, 0)  # biHeight = 0
    d = decode_bmp(bytes(blob))
    assert d["status"] == "empty_image"
