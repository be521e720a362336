"""Pure-Python Snappy block codec + xerial stream framing for the
Kafka sink — removes the import-gate on the snappy codec (reference
parity: lib/sequin/consumers/kafka_sink.ex:28 lists none/gzip/snappy/
lz4/zstd).

Implemented from the PUBLIC format descriptions only:

* Snappy block format: google/snappy ``format_description.txt`` —
  a little-endian varint preamble (uncompressed length) followed by
  literal and copy elements tagged in the low 2 bits.
* Xerial framing: xerial/snappy-java ``SnappyOutputStream`` stream
  layout (the framing the Kafka JVM client wraps snappy batches in,
  for BOTH message format v1 and v2): 8-byte magic
  ``\\x82SNAPPY\\x00`` + two big-endian int32s (version=1,
  min-compat=1), then per block a big-endian int32 compressed length
  + one raw snappy block (32 KiB uncompressed per block, the
  snappy-java default).

The compressor is a greedy 4-byte-hash matcher (the classic snappy
strategy): deterministic output, correctness over ratio — Kafka peers
only require VALID snappy, not byte-identical output to any other
implementation.  Throughput is secondary here (it runs executor-side
over bounded record batches), and the decompressor accepts anything a
conformant compressor produces, including overlapping copies.
"""

from __future__ import annotations

import struct

XERIAL_MAGIC = b"\x82SNAPPY\x00"
XERIAL_BLOCK = 32 * 1024


# --------------------------------------------------------------------------
# raw snappy block


def _emit_literal(out: bytearray, data: bytes) -> None:
    n = len(data)
    if n == 0:
        return
    if n <= 60:
        out.append((n - 1) << 2)
    else:
        lenbytes = []
        m = n - 1
        while m > 0:
            lenbytes.append(m & 0xFF)
            m >>= 8
        out.append((59 + len(lenbytes)) << 2)
        out.extend(lenbytes)
    out.extend(data)


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    """Copies with 2-byte offsets (tag 2): length 1..64, offset ≤ 65535
    — the only copy form this compressor produces (1-byte-offset and
    4-byte-offset forms are decoder-side only)."""
    # callers pass lengths whose 64-chunking leaves no 1..3 tail (the
    # compressor rounds the match length down to guarantee it), so this
    # loop always terminates with length == 0
    while length >= 4:
        chunk = min(length, 64)
        out.append(((chunk - 1) << 2) | 2)
        out += struct.pack("<H", offset)
        length -= chunk


def compress_block(src: bytes) -> bytes:
    """One raw snappy block: varint(len) + greedy literal/copy stream."""
    out = bytearray()
    n = len(src)
    m = n
    while True:  # little-endian varint preamble
        b = m & 0x7F
        m >>= 7
        out.append(b | (0x80 if m else 0))
        if not m:
            break
    if n == 0:
        return bytes(out)
    table: dict[bytes, int] = {}
    i = 0
    anchor = 0
    while i + 4 <= n:
        key = src[i:i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 0xFFFF:
            # extend the match forward
            length = 4
            while (i + length < n and length < 0xFFFF
                   and src[j + length] == src[i + length]):
                length += 1
            usable = (length // 64) * 64 + (length % 64 if length % 64 >= 4
                                            else 0)
            if usable >= 4:
                _emit_literal(out, src[anchor:i])
                _emit_copy(out, i - j, usable)
                i += usable
                anchor = i
                continue
        i += 1
    _emit_literal(out, src[anchor:])
    return bytes(out)


def decompress_block(data: bytes) -> bytes:
    """Decode one raw snappy block (all three copy tag forms)."""
    pos = 0
    expected = 0
    shift = 0
    while True:  # varint preamble
        if pos >= len(data):
            raise ValueError("snappy: truncated length preamble")
        b = data[pos]
        pos += 1
        expected |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            lenm1 = tag >> 2
            if lenm1 < 60:
                length = lenm1 + 1
            else:  # 60..63 → 1..4 little-endian extra length bytes
                extra = lenm1 - 59
                if pos + extra > n:
                    raise ValueError("snappy: truncated literal length")
                length = int.from_bytes(data[pos:pos + extra], "little") + 1
                pos += extra
            if pos + length > n:
                raise ValueError("snappy: truncated literal body")
            out += data[pos:pos + length]
            pos += length
            continue
        if kind == 1:  # copy, 1-byte offset
            if pos >= n:
                raise ValueError("snappy: truncated copy-1")
            length = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy-2")
            length = (tag >> 2) + 1
            offset = struct.unpack_from("<H", data, pos)[0]
            pos += 2
        else:  # copy, 4-byte offset
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy-4")
            length = (tag >> 2) + 1
            offset = struct.unpack_from("<I", data, pos)[0]
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: copy offset out of range")
        if offset >= length:
            start = len(out) - offset
            out += out[start:start + length]
        else:  # overlapping copy: byte-by-byte semantics (RLE-style)
            start = len(out) - offset
            for k in range(length):
                out.append(out[start + k])
    if len(out) != expected:
        raise ValueError(
            f"snappy: decoded {len(out)} bytes, preamble said {expected}")
    return bytes(out)


# --------------------------------------------------------------------------
# xerial stream framing (snappy-java SnappyOutputStream)


def compress(data: bytes) -> bytes:
    """Xerial-framed snappy: what a Kafka JVM peer produces/expects."""
    out = bytearray()
    out += XERIAL_MAGIC
    out += struct.pack(">ii", 1, 1)  # version, min-compatible-version
    offsets = range(0, len(data), XERIAL_BLOCK) if data else [0]
    for i in offsets:  # empty payload still carries one empty block
        block = compress_block(data[i:i + XERIAL_BLOCK])
        out += struct.pack(">i", len(block)) + block
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Decode xerial-framed snappy; falls back to a raw block when the
    magic is absent (some non-JVM producers send bare snappy)."""
    if not data.startswith(XERIAL_MAGIC):
        return decompress_block(data)
    pos = len(XERIAL_MAGIC) + 8  # skip the two version ints
    out = bytearray()
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("xerial-snappy: truncated block length")
        (blen,) = struct.unpack_from(">i", data, pos)
        pos += 4
        if blen < 0 or pos + blen > n:
            raise ValueError("xerial-snappy: truncated block")
        out += decompress_block(data[pos:pos + blen])
        pos += blen
    return bytes(out)
