"""Vendored pure-Python snappy codec (sinks/snappy_py.py): block
round-trip, xerial framing, decoder conformance on copy forms the
compressor itself never emits, and hypothesis fuzz."""

import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sequin_spark.sinks import snappy_py as sp


@pytest.mark.parametrize("payload", [
    b"",
    b"a",
    b"abc",
    b"abcd" * 100,
    b"x" * 100_000,                      # long RLE run (overlap copies)
    bytes(range(256)) * 300,             # incompressible-ish
    b"the quick brown fox " * 5000,
])
def test_block_roundtrip(payload):
    assert sp.decompress_block(sp.compress_block(payload)) == payload


@pytest.mark.parametrize("payload", [
    b"", b"a", b"hello world " * 10_000,
    bytes([7] * (sp.XERIAL_BLOCK * 3 + 17)),   # multi-block framing
])
def test_xerial_roundtrip(payload):
    framed = sp.compress(payload)
    assert framed.startswith(sp.XERIAL_MAGIC)
    assert sp.decompress(framed) == payload


def test_xerial_block_boundaries_are_independent():
    """Each 32 KiB block compresses independently (a JVM
    SnappyInputStream decodes block-at-a-time): content spanning the
    boundary must still round-trip."""
    payload = (b"abcdefgh" * 8192)[: sp.XERIAL_BLOCK + 100]
    assert sp.decompress(sp.compress(payload)) == payload


def test_decompress_accepts_bare_block():
    """Non-JVM producers send raw snappy without xerial framing."""
    payload = b"bare block payload " * 50
    assert sp.decompress(sp.compress_block(payload)) == payload


def test_decoder_handles_one_and_four_byte_offset_copies():
    """The compressor only emits 2-byte-offset copies, but a
    conformant peer may emit the 1-byte and 4-byte forms — hand-built
    streams exercise them."""
    # preamble varint(8); literal len 4 (tag (4-1)<<2); then copy
    # len=4 offset=4 in the 1-byte-offset form: kind 1, len-4 in bits
    # 2-4, offset high bits in 5-7, low byte follows
    lit = bytes([(4 - 1) << 2]) + b"abcd"
    raw = bytes([8]) + lit + bytes([(0 << 5) | (0 << 2) | 1, 4])
    assert sp.decompress_block(raw) == b"abcdabcd"
    # same copy in the 4-byte-offset form (kind 3, len-1 in tag>>2)
    raw4 = bytes([8]) + lit + bytes([((4 - 1) << 2) | 3]) + \
        struct.pack("<I", 4)
    assert sp.decompress_block(raw4) == b"abcdabcd"


def test_decoder_rejects_corruption():
    good = sp.compress_block(b"payload " * 100)
    with pytest.raises(ValueError):
        sp.decompress_block(good[:-3])          # truncated
    with pytest.raises(ValueError):             # wrong preamble length
        sp.decompress_block(b"\x7f" + good[1:])
    with pytest.raises(ValueError):             # copy before any output
        sp.decompress_block(bytes([4]) + bytes([(3 << 2) | 2, 1, 0]))


def test_compression_actually_compresses():
    rep = b"hello world " * 10_000
    assert len(sp.compress_block(rep)) < len(rep) // 10


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=4096))
def test_roundtrip_hypothesis(payload):
    assert sp.decompress_block(sp.compress_block(payload)) == payload
    assert sp.decompress(sp.compress(payload)) == payload


def test_roundtrip_small_alphabet_fuzz():
    """Small alphabets maximize match density (the hard path)."""
    rnd = random.Random(7)
    for _ in range(100):
        n = rnd.randint(0, 3000)
        payload = bytes(rnd.randrange(4) for _ in range(n))
        assert sp.decompress_block(sp.compress_block(payload)) == payload
