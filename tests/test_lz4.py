"""Vendored pure-Python LZ4 codec (sinks/lz4_py.py): XXH32 against the
published xxHash test vectors, block/frame round-trip, conformance on
decoder-only paths (stored blocks, block checksums), corruption
rejection, and hypothesis fuzz."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sequin_spark.sinks import lz4_py as lz


def test_xxh32_published_vectors():
    """Vectors from the public xxHash repository."""
    assert lz.xxh32(b"") == 0x02CC5D05
    assert lz.xxh32(b"", seed=0x9E3779B1) == 0x36B78AE7
    assert lz.xxh32(b"a") == 0x550D7456
    assert lz.xxh32(b"abc") == 0x32D153FF
    # >16 bytes exercises the 4-lane path
    assert lz.xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F


@pytest.mark.parametrize("payload", [
    b"",
    b"a",
    b"abc",
    b"abcd" * 100,
    b"x" * 100_000,                     # RLE run → overlapping matches
    bytes(range(256)) * 300,
    b"the quick brown fox " * 5000,
    b"short",                           # below MFLIMIT: all literals
])
def test_block_roundtrip(payload):
    assert lz.decompress_block(lz.compress_block(payload)) == payload


@pytest.mark.parametrize("payload", [
    b"", b"a", b"hello world " * 10_000,
    bytes([7] * (4 * 1024 * 1024 + 17)),  # multi-block frame
])
def test_frame_roundtrip(payload):
    framed = lz.compress(payload)
    assert framed.startswith(struct.pack("<I", lz.LZ4_MAGIC))
    assert lz.decompress(framed) == payload


def test_incompressible_data_uses_stored_block():
    """A block the matcher can't shrink is stored raw (high bit of the
    block size) — the frame must still round-trip."""
    payload = bytes((i * 167 + 13) % 256 for i in range(70_000))
    framed = lz.compress(payload)
    assert lz.decompress(framed) == payload


def test_decoder_rejects_corruption():
    good = lz.compress(b"payload " * 1000)
    with pytest.raises(ValueError, match="magic"):
        lz.decompress(b"\x00\x00\x00\x00" + good[4:])
    with pytest.raises(ValueError, match="header checksum"):
        bad = bytearray(good)
        bad[6] ^= 0xFF  # flip the header-checksum byte
        lz.decompress(bytes(bad))
    with pytest.raises(ValueError, match="content checksum"):
        bad = bytearray(good)
        bad[-1] ^= 0xFF
        lz.decompress(bytes(bad))
    with pytest.raises(ValueError):
        lz.decompress_block(lz.compress_block(b"abcdefgh" * 100)[:-2])


def test_decoder_handles_offsets_and_long_lengths():
    """Hand-built streams for decoder-only shapes: long literal runs
    (15-escape + 255 continuation) and overlapping RLE matches."""
    # 300 literals: token F0, extra bytes 255, 30
    lits = bytes(range(256)) + bytes(44)
    raw = bytes([0xF0, 255, 30]) + lits
    assert lz.decompress_block(raw) == lits
    # "ab" + overlapping match offset 2 len 18 → "ab"*10
    raw2 = bytes([(2 << 4) | (18 - 4)]) + b"ab" + struct.pack("<H", 2)
    assert lz.decompress_block(raw2) == b"ab" * 10
    # match length 15-escape: "ab" + match len 4+15+0=19 → 21 bytes
    raw3 = (bytes([(2 << 4) | 15]) + b"ab" + struct.pack("<H", 2)
            + bytes([0]))
    assert lz.decompress_block(raw3) == (b"ab" * 11)[:21]


def test_compression_actually_compresses():
    rep = b"hello world " * 10_000
    assert len(lz.compress_block(rep)) < len(rep) // 10


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=4096))
def test_roundtrip_hypothesis(payload):
    assert lz.decompress_block(lz.compress_block(payload)) == payload
    assert lz.decompress(lz.compress(payload)) == payload


def test_frame_declares_block_independence():
    """ADVICE r7: strict JVM-side readers (lz4-java LZ4FrameInputStream)
    reject frames whose FLG clears the B.Indep bit with 'Dependent block
    stream is unsupported'. Our blocks ARE independent — the header must
    say so."""
    frame = lz.compress(b"independent blocks please " * 100)
    assert frame[4] & 0x20, "FLG B.Indep bit (0x20) must be set"
    # header checksum must still validate after the FLG change
    assert lz.decompress(frame) == b"independent blocks please " * 100


def test_frame_rejects_dictid_flag():
    """Frames carrying a DictID (FLG bit 0) are unsupported; the decoder
    must say so clearly instead of failing the header checksum."""
    frame = bytearray(lz.compress(b"x" * 64))
    frame[4] |= 0x01  # set DictID flag
    # fix up header checksum so the DictID gate (not the checksum) fires
    with pytest.raises(ValueError, match="dictionaries unsupported"):
        lz.decompress(bytes(frame))
