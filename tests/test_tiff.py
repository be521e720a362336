"""TIFF decoder (datapipe/multimodal.decode_tiff) — IFD walk,
multi-strip assembly, and the three baseline compressions (none /
PackBits / MSB-first early-change LZW, TIFF 6.0 §9/§13).  The
differentials drive the decoder with the package's own encoders
(lzw_encode_tiff / packbits_encode), the same self-contained pattern
as tests/test_jpeg.py and test_gif_bmp.py (no PIL in the container).
"""

import random
import struct

from sequin_spark.datapipe.multimodal import (
    _lzw_decode_tiff,
    _packbits_decode,
    decode_tiff,
    lzw_encode_tiff,
    packbits_encode,
    synth_gray_tiff,
)


def _expected_luma(pixels: bytes) -> int:
    return (1000 * sum(pixels)) // len(pixels)


def test_lzw_roundtrip_through_width_escalation():
    """>4094 dictionary adds: the stream walks 9→10→11→12-bit widths
    and the table-growth freeze at 4094 — decode must invert exactly
    (an early-change off-by-one shifts every code after entry 510)."""
    rng = random.Random(7)
    data = bytes((i * 3) % 256 if rng.random() < 0.5
                 else rng.randrange(256) for i in range(30_000))
    assert _lzw_decode_tiff(lzw_encode_tiff(data)) == data


def test_lzw_kwkwk_case():
    """aaa... emits the code-equals-next-free (KwKwK) case."""
    data = b"a" * 500
    assert _lzw_decode_tiff(lzw_encode_tiff(data)) == data


def test_packbits_roundtrip_runs_and_literals():
    rng = random.Random(3)
    for n in (0, 1, 2, 3, 128, 129, 400):
        data = bytes(rng.choice([5, 5, 5, rng.randrange(256)])
                     for _ in range(n))
        assert _packbits_decode(packbits_encode(data)) == data
    # a >128 run must split into multiple repeat packets
    assert _packbits_decode(packbits_encode(b"z" * 300)) == b"z" * 300


def test_synth_decode_all_compression_and_strip_variants():
    """doc_id mod 6 covers {none, packbits, lzw} × {1 strip, 4-row
    strips}; stats must be identical across all decode paths."""
    for d in range(12):
        out = decode_tiff(synth_gray_tiff(d))
        exp = bytes((d * 31 + i * 7 + j) % 256
                    for i in range(8) for j in range(16))
        assert out["status"] == "decoded"
        assert (out["width"], out["height"], out["n_channels"]) == (16, 8, 1)
        assert out["mean_luma_x1000"] == _expected_luma(exp)


def _tiff_manual(endian: str, w: int, h: int, photometric: int,
                 spp: int, pixels: bytes) -> bytes:
    """Hand-rolled single-strip uncompressed TIFF in either byte
    order (the synth writes II only — this covers MM and photometric
    variants)."""
    e = "<" if endian == "II" else ">"
    magic = b"II*\x00" if endian == "II" else b"MM\x00*"
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8),
        (259, 3, 1, 1), (262, 3, 1, photometric),
        (273, 4, 1, None), (277, 3, 1, spp),
        (278, 3, 1, h), (279, 4, 1, len(pixels)),
    ]
    data_off = 8 + 2 + 12 * len(entries) + 4
    out = bytearray(magic) + struct.pack(e + "I", 8)
    out += struct.pack(e + "H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack(e + "HHI", tag, typ, cnt)
        if tag == 273:
            out += struct.pack(e + "I", data_off)
        elif typ == 3:
            out += struct.pack(e + "HH", val, 0)
        else:
            out += struct.pack(e + "I", val)
    out += struct.pack(e + "I", 0)
    out += pixels
    return bytes(out)


def test_big_endian_and_whitiszero():
    px = bytes([0, 64, 128, 255])
    for endian in ("II", "MM"):
        d = decode_tiff(_tiff_manual(endian, 2, 2, 1, 1, px))
        assert d["status"] == "decoded"
        assert d["mean_luma_x1000"] == _expected_luma(px)
        # WhiteIsZero (photometric 0) inverts
        d0 = decode_tiff(_tiff_manual(endian, 2, 2, 0, 1, px))
        assert d0["mean_luma_x1000"] == _expected_luma(
            bytes(255 - v for v in px))


def test_rgb_luma():
    rgb = bytes([10, 20, 30, 200, 100, 0])  # 2 pixels
    d = decode_tiff(_tiff_manual("II", 2, 1, 2, 3, rgb))
    assert d["status"] == "decoded"
    assert d["n_channels"] == 3
    assert d["mean_luma_x1000"] == (1000 * ((10 + 20 + 30) // 3
                                            + (200 + 100 + 0) // 3)) // 2


def test_per_row_honesty_statuses():
    assert decode_tiff(b"nottiff!")["status"] == "not_tiff"
    assert decode_tiff(_tiff_manual("II", 0, 2, 1, 1, b""))[
        "status"] == "empty_image"
    trunc = synth_gray_tiff(4)[:40]
    assert decode_tiff(trunc)["status"] == "truncated"
    # unsupported compression reports, never raises
    blob = bytearray(_tiff_manual("II", 2, 2, 1, 1, bytes(4)))
    # compression entry is the 4th (tag 259): value at its offset
    off = 8 + 2 + 12 * 3 + 8
    struct.pack_into("<H", blob, off, 6)  # old-JPEG
    assert decode_tiff(bytes(blob))["status"].startswith(
        "unsupported_compression")
