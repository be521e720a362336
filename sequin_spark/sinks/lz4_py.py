"""Pure-Python LZ4 frame codec for the Kafka sink — removes the
import-gate on the lz4 codec (reference parity:
lib/sequin/consumers/kafka_sink.ex:28 lists none/gzip/snappy/lz4/zstd).

Implemented from the PUBLIC specifications only:

* LZ4 block format (lz4.github.io/lz4/lz4_Block_format.html):
  sequences of [token][literals][offset][matchlen-extra], token packs
  literal length (high nibble) and match length − 4 (low nibble), 15
  escapes to 255-run length bytes; the final sequence is literals-only.
* LZ4 frame format v1.6.3 (lz4_Frame_format.html): magic 0x184D2204,
  frame descriptor (FLG/BD + header checksum byte = (XXH32(desc)>>8)
  & 0xFF), data blocks as little-endian uint32 size + payload (high
  bit set = stored uncompressed), EndMark 0x00000000, optional content
  checksum (we SET the flag and emit XXH32 of the uncompressed
  content, matching what the Kafka JVM client's net.jpountz writer
  produces).
* XXH32 (github.com/Cyan4973/xxHash spec) for the two checksums.

The compressor is a greedy 4-byte-hash matcher (same strategy as the
vendored snappy); peers only require VALID LZ4, not byte-identical
output.  The decompressor accepts anything conformant, including
stored blocks and overlapping matches.
"""

from __future__ import annotations

import struct

LZ4_MAGIC = 0x184D2204
_MIN_MATCH = 4
# spec: matches must not start within the last 12 bytes of input, and
# the last 5 bytes are always literals
_MFLIMIT = 12
_LASTLITERALS = 5

_P1, _P2, _P3, _P4, _P5 = (2654435761, 2246822519, 3266489917,
                           668265263, 374761393)
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 (public xxHash spec) — used for the frame header and
    content checksums."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while i <= n - 16:
            for vi, off in ((0, 0), (1, 4), (2, 8), (3, 12)):
                (lane,) = struct.unpack_from("<I", data, i + off)
                if vi == 0:
                    v1 = (_rotl((v1 + lane * _P2) & _M32, 13) * _P1) & _M32
                elif vi == 1:
                    v2 = (_rotl((v2 + lane * _P2) & _M32, 13) * _P1) & _M32
                elif vi == 2:
                    v3 = (_rotl((v3 + lane * _P2) & _M32, 13) * _P1) & _M32
                else:
                    v4 = (_rotl((v4 + lane * _P2) & _M32, 13) * _P1) & _M32
            i += 16
        acc = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
               + _rotl(v4, 18)) & _M32
    else:
        acc = (seed + _P5) & _M32
    acc = (acc + n) & _M32
    while i <= n - 4:
        (lane,) = struct.unpack_from("<I", data, i)
        acc = (_rotl((acc + lane * _P3) & _M32, 17) * _P4) & _M32
        i += 4
    while i < n:
        acc = (_rotl((acc + data[i] * _P5) & _M32, 11) * _P1) & _M32
        i += 1
    acc ^= acc >> 15
    acc = (acc * _P2) & _M32
    acc ^= acc >> 13
    acc = (acc * _P3) & _M32
    acc ^= acc >> 16
    return acc


# --------------------------------------------------------------------------
# block format


def _write_len(out: bytearray, val: int) -> None:
    """15-escape + 255-run length continuation bytes."""
    while val >= 255:
        out.append(255)
        val -= 255
    out.append(val)


def _emit_sequence(out: bytearray, literals: bytes, offset: int,
                   matchlen: int) -> None:
    lit_n = len(literals)
    ml = matchlen - _MIN_MATCH
    token = (min(lit_n, 15) << 4) | min(ml, 15)
    out.append(token)
    if lit_n >= 15:
        _write_len(out, lit_n - 15)
    out += literals
    out += struct.pack("<H", offset)
    if ml >= 15:
        _write_len(out, ml - 15)


def compress_block(src: bytes) -> bytes:
    """Greedy LZ4 block: 4-byte-hash match finder, 64 KiB offsets."""
    n = len(src)
    out = bytearray()
    if n == 0:
        return b"\x00"  # single empty-literal token (valid empty block)
    table: dict[bytes, int] = {}
    i = 0
    anchor = 0
    limit = n - _MFLIMIT
    while i < limit:
        key = src[i:i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 0xFFFF:
            length = 4
            # spec: the match must leave the last 5 bytes as literals
            maxlen = n - _LASTLITERALS - i
            while (length < maxlen
                   and src[j + length] == src[i + length]):
                length += 1
            if length >= _MIN_MATCH:
                _emit_sequence(out, src[anchor:i], i - j, length)
                i += length
                anchor = i
                continue
        i += 1
    # final literals-only sequence (token low nibble 0, no offset)
    tail = src[anchor:]
    lit_n = len(tail)
    out.append(min(lit_n, 15) << 4)
    if lit_n >= 15:
        _write_len(out, lit_n - 15)
    out += tail
    return bytes(out)


def decompress_block(data: bytes, max_size: int | None = None) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        lit_n = token >> 4
        if lit_n == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated literal length")
                b = data[pos]
                pos += 1
                lit_n += b
                if b != 255:
                    break
        if pos + lit_n > n:
            raise ValueError("lz4: truncated literals")
        out += data[pos:pos + lit_n]
        pos += lit_n
        if pos >= n:
            break  # final literals-only sequence
        if pos + 2 > n:
            raise ValueError("lz4: truncated offset")
        (offset,) = struct.unpack_from("<H", data, pos)
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError("lz4: offset out of range")
        ml = token & 0xF
        if ml == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated match length")
                b = data[pos]
                pos += 1
                ml += b
                if b != 255:
                    break
        ml += _MIN_MATCH
        start = len(out) - offset
        if offset >= ml:
            out += out[start:start + ml]
        else:  # overlapping match: byte-wise (RLE semantics)
            for k in range(ml):
                out.append(out[start + k])
        if max_size is not None and len(out) > max_size:
            raise ValueError("lz4: output exceeds declared size")
    return bytes(out)


# --------------------------------------------------------------------------
# frame format

_BLOCK_MAX = 4 * 1024 * 1024  # BD block-max-size code 7
_FLG = 0b01100100  # version 01, block-independence (bit 5) 1, content-checksum (bit 2) 1
_BD = 7 << 4


def compress(data: bytes) -> bytes:
    """LZ4 frame with independent blocks + content checksum — what the
    Kafka JVM client (net.jpountz LZ4BlockOutputStream successor /
    KafkaLZ4BlockOutputStream) reads."""
    desc = bytes([_FLG, _BD])
    out = bytearray()
    out += struct.pack("<I", LZ4_MAGIC)
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)  # header checksum byte
    for i in range(0, len(data), _BLOCK_MAX) if data else []:
        chunk = data[i:i + _BLOCK_MAX]
        comp = compress_block(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp)) + comp
        else:  # incompressible: stored block (high bit set)
            out += struct.pack("<I", len(chunk) | 0x80000000) + chunk
    out += struct.pack("<I", 0)  # EndMark
    out += struct.pack("<I", xxh32(data))  # content checksum (FLG bit set)
    return bytes(out)


def decompress(data: bytes) -> bytes:
    if len(data) < 7 or struct.unpack_from("<I", data, 0)[0] != LZ4_MAGIC:
        raise ValueError("lz4: bad frame magic")
    flg = data[4]
    if (flg >> 6) != 0b01:
        raise ValueError("lz4: unsupported frame version")
    has_content_size = bool(flg & 0x08)
    has_content_checksum = bool(flg & 0x04)
    has_block_checksum = bool(flg & 0x10)
    if flg & 0x01:
        raise ValueError("lz4: dictionaries unsupported")
    pos = 6  # magic + FLG + BD
    if has_content_size:
        pos += 8
    want_hc = (xxh32(data[4:pos]) >> 8) & 0xFF
    if data[pos] != want_hc:
        raise ValueError("lz4: frame header checksum mismatch")
    pos += 1
    out = bytearray()
    while True:
        if pos + 4 > len(data):
            raise ValueError("lz4: truncated block size")
        (bsize,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if bsize == 0:
            break  # EndMark
        stored = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        if pos + bsize > len(data):
            raise ValueError("lz4: truncated block")
        block = data[pos:pos + bsize]
        pos += bsize
        if has_block_checksum:
            if pos + 4 > len(data):
                raise ValueError("lz4: truncated block checksum")
            (bc,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if bc != xxh32(block):
                raise ValueError("lz4: block checksum mismatch")
        out += block if stored else decompress_block(block)
    if has_content_checksum:
        if pos + 4 > len(data):
            raise ValueError("lz4: truncated content checksum")
        (cc,) = struct.unpack_from("<I", data, pos)
        if cc != xxh32(bytes(out)):
            raise ValueError("lz4: content checksum mismatch")
    return bytes(out)
