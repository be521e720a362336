"""Zstandard codec for the Kafka sink — the last compression-parity gap
with the reference (kafka_sink.ex:28 supports none/gzip/snappy/lz4/zstd).

Two halves, gated honestly:

* ``decompress`` — a self-contained pure-Python RFC 8878 decoder
  (frame header, raw/RLE/compressed blocks, FSE table reads, Huffman
  literals incl. FSE-compressed weights and 4-stream mode, sequence
  execution with repeated-offset history, XXH64 content checksum).
  Always available: a consumer of JVM-producer zstd batches needs no
  native library.  Decode speed is Python-speed — fine for the sink
  path's bounded batches, not a bulk-scan codec.
* ``compress`` — one-shot via ``libzstd`` through ctypes when the
  shared library is present (it is on any host with the zstd CLI or a
  JVM Kafka client); otherwise it routes to ``compress_py``, a REAL
  pure-Python compressing encoder: hash-chain LZ77 with repeated-
  offset candidates and 1-step lazy matching, Huffman-compressed
  literals (fresh direct-weights tables or Treeless reuse, whichever
  is smaller), and sequence streams FSE-coded with per-block-built /
  predefined / Repeat tables, cheapest measured bitstream winning.
  Measured ~99.9% of ``zstd -3``'s ratio on the CDC JSON corpus and
  ~97% on Python source (docs/perf_notes_r11.md).  Any block the
  pipeline fails to shrink degrades to a Raw block, so ``compress``
  never raises and never exceeds store-mode size: worst case the
  payload ships framed-but-raw, still valid zstd on the wire.

Conformance: tests/data/zstd/ holds frames produced by the real zstd
CLI over deterministic payloads (levels 1/3/19, checksummed and not);
tests/test_zstd.py replays them through this decoder byte-for-byte and
fuzzes live against libzstd when present.
"""

from __future__ import annotations

import struct

ZSTD_MAGIC = 0xFD2FB528
_SKIPPABLE_LO = 0x184D2A50
_SKIPPABLE_HI = 0x184D2A5F


class ZstdError(ValueError):
    pass


# ---------------------------------------------------------------------------
# XXH64 (content checksum; RFC 8878 uses the low 32 bits of XXH64 seed 0)

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round64(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl64(acc, 31) * _P1) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        lim = n - 32
        while i <= lim:
            a, b, c, d = struct.unpack_from("<QQQQ", data, i)
            v1, v2, v3, v4 = (_round64(v1, a), _round64(v2, b),
                              _round64(v3, c), _round64(v4, d))
            i += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7)
             + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round64(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h = ((_rotl64(h ^ _round64(0, k), 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = ((_rotl64(h ^ (k * _P1) & _M64, 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h = ((_rotl64(h ^ (data[i] * _P5) & _M64, 11)) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# Backward bitstream (zstd bitstreams are written forward, read backward
# from a 1-bit sentinel in the last byte)


class _BackBits:
    __slots__ = ("val", "off")

    def __init__(self, data: bytes):
        if not data:
            raise ZstdError("empty bitstream")
        last = data[-1]
        if last == 0:
            raise ZstdError("bitstream has no sentinel bit")
        self.val = int.from_bytes(data, "little")
        # drop leading zero bits of the last byte + the sentinel 1
        self.off = len(data) * 8 - (8 - last.bit_length()) - 1

    def read(self, n: int) -> int:
        """Read n bits below the cursor.  Reading past the start pads
        with zeros on the LOW side and leaves ``off`` negative — the
        FSE interleaved-weights loop uses that as its end signal."""
        if n == 0:
            return 0
        self.off -= n
        if self.off >= 0:
            return (self.val >> self.off) & ((1 << n) - 1)
        avail = n + self.off  # bits actually available
        if avail <= 0:
            return 0
        return (self.val & ((1 << avail) - 1)) << (n - avail)


# ---------------------------------------------------------------------------
# FSE


class _FSETable:
    __slots__ = ("acc", "sym", "nbits", "base")

    def __init__(self, acc: int, freqs: list[int]):
        self.acc = acc
        size = 1 << acc
        sym = [0] * size
        high = size - 1
        state_desc = [0] * len(freqs)
        for s, p in enumerate(freqs):
            if p == -1:
                sym[high] = s
                high -= 1
                state_desc[s] = 1
            else:
                state_desc[s] = p
        step = (size >> 1) + (size >> 3) + 3
        mask = size - 1
        pos = 0
        for s, p in enumerate(freqs):
            for _ in range(max(p, 0)):
                sym[pos] = s
                pos = (pos + step) & mask
                while pos > high:
                    pos = (pos + step) & mask
        if pos != 0:
            raise ZstdError("corrupt FSE distribution")
        nbits = [0] * size
        base = [0] * size
        for i in range(size):
            s = sym[i]
            nxt = state_desc[s]
            state_desc[s] += 1
            nb = acc - (nxt.bit_length() - 1)
            nbits[i] = nb
            base[i] = (nxt << nb) - size
        self.sym, self.nbits, self.base = sym, nbits, base

    @classmethod
    def rle(cls, symbol: int) -> "_FSETable":
        t = cls.__new__(cls)
        t.acc = 0
        t.sym = [symbol]
        t.nbits = [0]
        t.base = [0]
        return t


def _read_fse_freqs(data: bytes, pos: int, max_acc: int
                    ) -> tuple[list[int], int, int]:
    """Parse an FSE table description (RFC 8878 §4.1.1) from a FORWARD
    bitstream at byte ``pos``; returns (freqs, accuracy_log, next_pos)."""
    bitpos = 0

    def read(n: int) -> int:
        nonlocal bitpos
        byte = pos + (bitpos >> 3)
        chunk = int.from_bytes(data[byte:byte + 4].ljust(4, b"\0"),
                               "little")
        v = (chunk >> (bitpos & 7)) & ((1 << n) - 1)
        bitpos += n
        return v

    acc = read(4) + 5
    if acc > max_acc:
        raise ZstdError(f"FSE accuracy {acc} > max {max_acc}")
    remaining = (1 << acc) + 1
    freqs: list[int] = []
    while remaining > 1 and len(freqs) < 256:
        bits = remaining.bit_length()
        v = read(bits)
        low_mask = (1 << (bits - 1)) - 1
        threshold = (1 << bits) - 1 - remaining
        if (v & low_mask) < threshold:
            bitpos -= 1  # value fit in bits-1; give the top bit back
            v &= low_mask
        elif v > low_mask:
            v -= threshold
        proba = v - 1
        remaining -= -proba if proba < 0 else proba
        freqs.append(proba)
        if proba == 0:
            while True:
                rep = read(2)
                freqs.extend([0] * rep)
                if rep != 3:
                    break
    if remaining != 1:
        raise ZstdError("FSE distribution does not sum to table size")
    return freqs, acc, pos + ((bitpos + 7) >> 3)


def _fse_decode_interleaved(table: _FSETable, data: bytes,
                            max_out: int = 256) -> list[int]:
    """Two interleaved FSE states over one backward stream — the
    Huffman-weights encoding (RFC 8878 §4.2.1.2)."""
    bs = _BackBits(data)
    s1 = bs.read(table.acc)
    s2 = bs.read(table.acc)
    if bs.off < 0:
        raise ZstdError("FSE weight stream too short")
    out: list[int] = []
    while len(out) < max_out:
        out.append(table.sym[s1])
        s1 = table.base[s1] + bs.read(table.nbits[s1])
        if bs.off < 0:
            out.append(table.sym[s2])
            break
        out.append(table.sym[s2])
        s2 = table.base[s2] + bs.read(table.nbits[s2])
        if bs.off < 0:
            out.append(table.sym[s1])
            break
    return out


# ---------------------------------------------------------------------------
# Huffman


class _HufTable:
    __slots__ = ("max_bits", "sym", "nbits")

    def __init__(self, weights: list[int]):
        # weights exclude the last symbol; deduce it so the weight sum
        # reaches the NEXT power of two (RFC §4.2.1: the last weight is
        # always >= 1, so "next" is strict)
        total = sum((1 << (w - 1)) for w in weights if w > 0)
        if total == 0:
            raise ZstdError("huffman weights sum to zero")
        next_p2 = 1 << total.bit_length()
        rem = next_p2 - total
        if rem & (rem - 1):
            raise ZstdError("corrupt huffman weights (non-pow2 remainder)")
        weights = weights + [rem.bit_length()]
        max_bits = next_p2.bit_length() - 1
        bits = [max_bits + 1 - w if w > 0 else 0 for w in weights]
        size = 1 << max_bits
        sym = [0] * size
        nbits = [0] * size
        rank_count = [0] * (max_bits + 2)
        for b in bits:
            if b:
                rank_count[b] += 1
        rank_idx = [0] * (max_bits + 2)
        for b in range(max_bits, 0, -1):
            rank_idx[b - 1] = rank_idx[b] + rank_count[b] * (
                1 << (max_bits - b))
        for s, b in enumerate(bits):
            if b == 0:
                continue
            code = rank_idx[b]
            ln = 1 << (max_bits - b)
            for j in range(code, code + ln):
                sym[j] = s
                nbits[j] = b
            rank_idx[b] += ln
        self.max_bits, self.sym, self.nbits = max_bits, sym, nbits

    def decode_stream(self, data: bytes, n_out: int) -> bytearray:
        bs = _BackBits(data)
        out = bytearray()
        mb = self.max_bits
        sym, nbits = self.sym, self.nbits
        while len(out) < n_out:
            idx = bs.read(mb)
            bs.off += mb  # peek
            out.append(sym[idx])
            bs.off -= nbits[idx]
            if bs.off < -mb:
                raise ZstdError("huffman stream underrun")
        return out


def _read_huf_table(data: bytes, pos: int) -> tuple[_HufTable, int]:
    hdr = data[pos]
    pos += 1
    if hdr >= 128:
        n = hdr - 127
        nb = (n + 1) // 2
        raw = data[pos:pos + nb]
        pos += nb
        weights = []
        for i in range(n):
            b = raw[i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
    else:
        comp = data[pos:pos + hdr]
        pos += hdr
        freqs, acc, after = _read_fse_freqs(comp, 0, 6)
        table = _FSETable(acc, freqs)
        weights = _fse_decode_interleaved(table, comp[after:], 255)
    return _HufTable(weights), pos


# ---------------------------------------------------------------------------
# Sequences (literal-length / match-length / offset codes, RFC §3.1.1.3.2)

_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10,
                       11, 12, 13, 14, 15, 16]
_ML_BASE = list(range(3, 35)) + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10,
                       11, 12, 13, 14, 15, 16]

_LL_DEFAULT = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
               2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
               -1, -1, -1, -1]
_ML_DEFAULT = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
               -1, -1, -1, -1, -1]
_OF_DEFAULT = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1]

_LL_DEFAULT_ACC, _ML_DEFAULT_ACC, _OF_DEFAULT_ACC = 6, 6, 5
_LL_MAX_ACC, _ML_MAX_ACC, _OF_MAX_ACC = 9, 9, 8


def _seq_table(data: bytes, pos: int, mode: int, kind: str,
               prev: _FSETable | None) -> tuple[_FSETable, int]:
    defaults = {
        "ll": (_LL_DEFAULT, _LL_DEFAULT_ACC, _LL_MAX_ACC),
        "ml": (_ML_DEFAULT, _ML_DEFAULT_ACC, _ML_MAX_ACC),
        "of": (_OF_DEFAULT, _OF_DEFAULT_ACC, _OF_MAX_ACC),
    }[kind]
    if mode == 0:  # predefined
        return _FSETable(defaults[1], defaults[0]), pos
    if mode == 1:  # RLE: one byte symbol
        return _FSETable.rle(data[pos]), pos + 1
    if mode == 2:  # FSE-described
        freqs, acc, pos = _read_fse_freqs(data, pos, defaults[2])
        return _FSETable(acc, freqs), pos
    if prev is None:  # mode 3: repeat
        raise ZstdError(f"repeat {kind} table with no previous table")
    return prev, pos


# ---------------------------------------------------------------------------
# Frame decoding


class _FrameState:
    """Tables that persist across blocks within one frame (treeless
    literals, repeat FSE modes, repeated offsets)."""

    def __init__(self) -> None:
        self.huf: _HufTable | None = None
        self.ll: _FSETable | None = None
        self.ml: _FSETable | None = None
        self.of: _FSETable | None = None
        self.reps = [1, 4, 8]


def _decode_literals(data: bytes, pos: int, st: _FrameState
                     ) -> tuple[bytes, int]:
    b0 = data[pos]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # raw / RLE
        if sf in (0, 2):
            regen = b0 >> 3
            pos += 1
        elif sf == 1:
            regen = (b0 >> 4) | (data[pos + 1] << 4)
            pos += 2
        else:
            regen = (b0 >> 4) | (data[pos + 1] << 4) | (
                data[pos + 2] << 12)
            pos += 3
        if ltype == 0:
            return bytes(data[pos:pos + regen]), pos + regen
        return bytes([data[pos]]) * regen, pos + 1
    # compressed (2) / treeless (3)
    if sf == 0:
        n_streams = 1
        regen = (b0 >> 4) | ((data[pos + 1] & 0x3F) << 4)
        csize = (data[pos + 1] >> 6) | (data[pos + 2] << 2)
        pos += 3
    elif sf == 1:
        n_streams = 4
        regen = (b0 >> 4) | ((data[pos + 1] & 0x3F) << 4)
        csize = (data[pos + 1] >> 6) | (data[pos + 2] << 2)
        pos += 3
    elif sf == 2:
        n_streams = 4
        regen = (b0 >> 4) | (data[pos + 1] << 4) | (
            (data[pos + 2] & 0x3) << 12)
        csize = (data[pos + 2] >> 2) | (data[pos + 3] << 6)
        pos += 4
    else:
        n_streams = 4
        regen = (b0 >> 4) | (data[pos + 1] << 4) | (
            (data[pos + 2] & 0x3F) << 12)
        csize = (data[pos + 2] >> 6) | (data[pos + 3] << 2) | (
            data[pos + 4] << 10)
        pos += 5
    end = pos + csize
    if ltype == 2:
        st.huf, pos = _read_huf_table(data, pos)
    elif st.huf is None:
        raise ZstdError("treeless literals with no previous huffman table")
    huf = st.huf
    streams = data[pos:end]
    if n_streams == 1:
        lits = huf.decode_stream(streams, regen)
    else:
        s1, s2, s3 = struct.unpack_from("<HHH", streams, 0)
        body = streams[6:]
        if s1 + s2 + s3 > len(body):
            raise ZstdError("literal jump table overruns section")
        per = (regen + 3) // 4
        parts = [body[:s1], body[s1:s1 + s2],
                 body[s1 + s2:s1 + s2 + s3], body[s1 + s2 + s3:]]
        sizes = [per, per, per, regen - 3 * per]
        lits = bytearray()
        for part, sz in zip(parts, sizes):
            lits += huf.decode_stream(part, sz)
    if len(lits) != regen:
        raise ZstdError("literal regeneration size mismatch")
    return bytes(lits), end


def _decode_block(data: bytes, pos: int, size: int, out: bytearray,
                  st: _FrameState) -> None:
    block = data[pos:pos + size]
    lits, p = _decode_literals(block, 0, st)
    # sequence count
    b0 = block[p]
    if b0 < 128:
        nseq = b0
        p += 1
    elif b0 < 255:
        nseq = ((b0 - 128) << 8) + block[p + 1]
        p += 2
    else:
        nseq = block[p + 1] + (block[p + 2] << 8) + 0x7F00
        p += 3
    if nseq == 0:
        out += lits
        return
    modes = block[p]
    p += 1
    ll_t, p = _seq_table(block, p, modes >> 6, "ll", st.ll)
    of_t, p = _seq_table(block, p, (modes >> 4) & 3, "of", st.of)
    ml_t, p = _seq_table(block, p, (modes >> 2) & 3, "ml", st.ml)
    st.ll, st.of, st.ml = ll_t, of_t, ml_t
    bs = _BackBits(block[p:])
    ll_s = bs.read(ll_t.acc)
    of_s = bs.read(of_t.acc)
    ml_s = bs.read(ml_t.acc)
    if bs.off < 0:
        raise ZstdError("sequence stream too short for state init")
    lit_pos = 0
    reps = st.reps
    for i in range(nseq):
        of_code = of_t.sym[of_s]
        offset_value = (1 << of_code) + bs.read(of_code)
        ml_code = ml_t.sym[ml_s]
        ml = _ML_BASE[ml_code] + bs.read(_ML_BITS[ml_code])
        ll_code = ll_t.sym[ll_s]
        ll = _LL_BASE[ll_code] + bs.read(_LL_BITS[ll_code])
        if bs.off < 0:
            raise ZstdError("sequence stream underrun")
        # resolve offset against the repeated-offset history
        if offset_value > 3:
            offset = offset_value - 3
            reps = [offset, reps[0], reps[1]]
        else:
            idx = offset_value - 1 if ll != 0 else offset_value
            # ll==0 shifts the repcode index by one; idx==3 → rep1 - 1
            if idx == 0:
                offset = reps[0]
            elif idx == 1:
                offset = reps[1]
                reps = [offset, reps[0], reps[2]]
            elif idx == 2:
                offset = reps[2]
                reps = [offset, reps[0], reps[1]]
            else:
                offset = reps[0] - 1
                if offset == 0:
                    raise ZstdError("repcode underflow (offset 0)")
                reps = [offset, reps[0], reps[1]]
        out += lits[lit_pos:lit_pos + ll]
        lit_pos += ll
        if offset > len(out):
            raise ZstdError("match offset beyond window")
        if offset >= ml:
            start = len(out) - offset
            out += out[start:start + ml]
        else:
            for _ in range(ml):
                out.append(out[-offset])
        if i != nseq - 1:
            ll_s = ll_t.base[ll_s] + bs.read(ll_t.nbits[ll_s])
            ml_s = ml_t.base[ml_s] + bs.read(ml_t.nbits[ml_s])
            of_s = of_t.base[of_s] + bs.read(of_t.nbits[of_s])
            if bs.off < 0:
                raise ZstdError("sequence state update underrun")
    out += lits[lit_pos:]
    st.reps = reps


def decompress(data: bytes) -> bytes:
    """Decode a zstd frame (or a concatenation of frames / skippable
    frames) — pure Python, RFC 8878."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if n - pos < 4:
            raise ZstdError("truncated frame magic")
        (magic,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if _SKIPPABLE_LO <= magic <= _SKIPPABLE_HI:
            (sz,) = struct.unpack_from("<I", data, pos)
            pos += 4 + sz
            continue
        if magic != ZSTD_MAGIC:
            raise ZstdError(f"bad zstd magic 0x{magic:08x}")
        fhd = data[pos]
        pos += 1
        fcs_flag = fhd >> 6
        single_segment = bool(fhd & 0x20)
        has_checksum = bool(fhd & 0x04)
        did_flag = fhd & 0x03
        if fhd & 0x18:
            raise ZstdError("reserved frame-header bits set")
        if not single_segment:
            pos += 1  # window descriptor (we keep the whole output)
        pos += (0, 1, 2, 4)[did_flag]
        fcs_len = (0, 2, 4, 8)[fcs_flag]
        if fcs_flag == 0 and single_segment:
            fcs_len = 1
        content_size = None
        if fcs_len:
            content_size = int.from_bytes(data[pos:pos + fcs_len],
                                          "little")
            if fcs_len == 2:
                content_size += 256
            pos += fcs_len
        frame_start = len(out)
        st = _FrameState()
        while True:
            if pos + 3 > n:
                raise ZstdError("truncated block header")
            bh = int.from_bytes(data[pos:pos + 3], "little")
            pos += 3
            last = bh & 1
            btype = (bh >> 1) & 3
            bsize = bh >> 3
            if btype == 0:  # raw
                out += data[pos:pos + bsize]
                pos += bsize
            elif btype == 1:  # RLE: bsize is the REGENERATED size
                out += bytes([data[pos]]) * bsize
                pos += 1
            elif btype == 2:
                _decode_block(data, pos, bsize, out, st)
                pos += bsize
            else:
                raise ZstdError("reserved block type")
            if last:
                break
        if content_size is not None and \
                len(out) - frame_start != content_size:
            raise ZstdError(
                f"content size mismatch: header {content_size}, "
                f"decoded {len(out) - frame_start}")
        if has_checksum:
            (want,) = struct.unpack_from("<I", data, pos)
            pos += 4
            got = xxh64(bytes(out[frame_start:])) & 0xFFFFFFFF
            if got != want:
                raise ZstdError(
                    f"content checksum mismatch: 0x{got:08x} != "
                    f"0x{want:08x}")
    return bytes(out)


# ---------------------------------------------------------------------------
# Compression — libzstd via ctypes (gated)

_LIB = None
_LIB_ERR: str | None = None


def _libzstd():
    global _LIB, _LIB_ERR
    if _LIB is not None or _LIB_ERR is not None:
        return _LIB
    import ctypes
    import ctypes.util

    name = ctypes.util.find_library("zstd") or "libzstd.so.1"
    try:
        lib = ctypes.CDLL(name)
        lib.ZSTD_compressBound.restype = ctypes.c_size_t
        lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
        lib.ZSTD_compress.restype = ctypes.c_size_t
        lib.ZSTD_compress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int]
        lib.ZSTD_isError.restype = ctypes.c_uint
        lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
        _LIB = lib
    except OSError as e:
        _LIB_ERR = str(e)
    return _LIB


_RAW_BLOCK_MAX = 128 * 1024  # Block_Maximum_Size cap (RFC 8878 §3.1.1.2.4)


def compress_store(data: bytes) -> bytes:
    """Pure-Python STORE-mode zstd frame: single-segment header with
    the exact content size, the payload as raw (uncompressed) blocks
    of ≤128 KiB, and the XXH64 content checksum.  Zero compression —
    but a fully conformant RFC 8878 frame that any zstd decoder
    (incl. JVM Kafka consumers) accepts; this is the no-libzstd
    fallback that keeps the kafka codec matrix ungated."""
    n = len(data)
    if n < 256:
        fcs_code, fcs_len = 0, 1       # single-segment: code 0 = 1 byte
    elif n < 65536 + 256:
        fcs_code, fcs_len = 1, 2       # stored as size - 256
    elif n < 1 << 32:
        fcs_code, fcs_len = 2, 4
    else:
        fcs_code, fcs_len = 3, 8
    # descriptor: FCS code | single-segment (0x20) | checksum (0x04)
    out = bytearray(struct.pack("<I", ZSTD_MAGIC))
    out.append((fcs_code << 6) | 0x20 | 0x04)
    out += (n - 256 if fcs_code == 1 else n).to_bytes(fcs_len, "little")
    if n == 0:
        out += (1).to_bytes(3, "little")  # last=1, type=raw, size=0
    else:
        for off in range(0, n, _RAW_BLOCK_MAX):
            chunk = data[off:off + _RAW_BLOCK_MAX]
            last = 1 if off + _RAW_BLOCK_MAX >= n else 0
            out += (last | (len(chunk) << 3)).to_bytes(3, "little")
            out += chunk
    out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Pure-Python COMPRESSING encoder
#
# Strategy: LZ77 over persistent hash chains (depth 8, newest-first)
# with repeated-offset candidates and a 1-step lazy heuristic priced
# like zstd's own (3-4 points per matched byte minus the fresh
# offset's extra bits) produces (literal_len, offset, match_len)
# sequences per <=128 KiB block; literals are Huffman-coded (fresh
# direct-weights table or Treeless reuse, smaller wins) and the
# LL/OF/ML code streams are FSE-coded choosing per stream among RLE /
# table-built-from-the-block's-histogram / predefined / Repeat by
# measured cost.  Offsets resolve against the frame's repeated-offset
# history exactly as the decoder replays it (_rep_resolve).  Blocks
# that don't shrink are emitted Raw, so output never exceeds
# compress_store's.  Reference behavior: kafka_sink.ex:28 (the
# reference publishes with compression_type: zstd).


class _FSEEncTable:
    """Encode-side view of an _FSETable: for each symbol, its decoder
    state indices ordered by state_desc value, so the classic
    backward FSE encoding walk can pick the predecessor state that
    reaches a given successor index."""

    def __init__(self, table: _FSETable, freqs: list[int]):
        self.table = table
        self.size = 1 << table.acc
        states: dict[int, list[int]] = {}
        for i, s in enumerate(table.sym):
            states.setdefault(s, []).append(i)
        # k-th lowest index of symbol s has state_desc value cnt+k,
        # where cnt = freq (or 1 for "less-than-one" -1 entries)
        self.states = states
        self.cnt = [1 if p == -1 else p for p in freqs]

    def first_state(self, sym: int) -> int:
        return self.states[sym][0]

    def step(self, sym: int, nxt_index: int) -> tuple[int, int, int]:
        """The predecessor state for ``sym`` from which the decoder
        transitions to ``nxt_index``: returns (prev_index, bits, nb)
        with nxt_index == base[prev] + bits, 0 <= bits < 2^nb."""
        cnt = self.cnt[sym]
        if cnt <= 0:
            raise KeyError(sym)  # absent symbol: the while below
            # would otherwise never terminate
        v = nxt_index + self.size
        nb = 0
        while (v >> nb) >= 2 * cnt:
            nb += 1
        return self.states[sym][(v >> nb) - cnt], v & ((1 << nb) - 1), nb


_ENC_LL = _ENC_ML = _ENC_OF = None


def _enc_tables():
    global _ENC_LL, _ENC_ML, _ENC_OF
    if _ENC_LL is None:
        _ENC_LL = _FSEEncTable(_FSETable(_LL_DEFAULT_ACC, _LL_DEFAULT),
                               _LL_DEFAULT)
        _ENC_ML = _FSEEncTable(_FSETable(_ML_DEFAULT_ACC, _ML_DEFAULT),
                               _ML_DEFAULT)
        _ENC_OF = _FSEEncTable(_FSETable(_OF_DEFAULT_ACC, _OF_DEFAULT),
                               _OF_DEFAULT)
    return _ENC_LL, _ENC_ML, _ENC_OF


def _code_of(value: int, base: list[int]) -> int:
    """Highest code whose base <= value (the base tables are
    contiguous: base[c+1] == base[c] + 2^bits[c])."""
    import bisect

    return bisect.bisect_right(base, value) - 1


def _fse_normalize(counts: dict, acc: int) -> list[int] | None:
    """Normalize symbol counts to frequencies summing to 2^acc, every
    present symbol >= 1 (no less-than-one entries — simpler and always
    decodable).  None when 2^acc can't hold one slot per symbol."""
    n_present = len(counts)
    scale = 1 << acc
    if n_present < 2 or n_present > scale:
        return None
    total = sum(counts.values())
    s_last = max(counts)
    freqs = [0] * (s_last + 1)
    rema = []
    assigned = 0
    for s, c in counts.items():
        f = max(1, (c * scale) // total)
        freqs[s] = f
        assigned += f
        rema.append(((c * scale) % total, c, s))
    # fix the sum exactly: give remainder slots to the largest
    # fractional parts, take back from the largest frequencies
    rema.sort(reverse=True)
    i = 0
    while assigned < scale:
        s = rema[i % len(rema)][2]
        freqs[s] += 1
        assigned += 1
        i += 1
    while assigned > scale:
        s = max(counts, key=lambda x: freqs[x])
        if freqs[s] <= 1:
            return None  # degenerate: can't shrink further
        freqs[s] -= 1
        assigned -= 1
    return freqs


def _write_fse_freqs(freqs: list[int], acc: int) -> bytes:
    """FSE table description writer (RFC 8878 §4.1.1) — the exact
    inverse of _read_fse_freqs: forward LSB-first bitstream, variable
    field widths driven by the remaining probability mass, 2-bit
    repeat flags after zero probabilities."""
    bitpos = 0
    out = bytearray()
    acc_bits = 0
    acc_val = 0

    def write(v: int, n: int) -> None:
        nonlocal acc_bits, acc_val
        acc_val |= v << acc_bits
        acc_bits += n
        while acc_bits >= 8:
            out.append(acc_val & 0xFF)
            acc_val >>= 8
            acc_bits -= 8

    write(acc - 5, 4)
    remaining = (1 << acc) + 1
    i = 0
    while i < len(freqs) and remaining > 1:
        proba = freqs[i]
        value = proba + 1
        bits = remaining.bit_length()
        low_mask = (1 << (bits - 1)) - 1
        threshold = (1 << bits) - 1 - remaining
        if value < threshold:
            write(value, bits - 1)
        elif value <= low_mask:
            write(value, bits)
        else:
            write(value + threshold, bits)
        remaining -= proba
        i += 1
        if proba == 0:
            # run-length for FURTHER consecutive zeros (the reader
            # always consumes 2-bit repeat fields after a zero)
            z = 0
            while i + z < len(freqs) and freqs[i + z] == 0:
                z += 1
            i += z
            while z >= 3:
                write(3, 2)
                z -= 3
            write(z, 2)
    if acc_bits:
        out.append(acc_val & 0xFF)
    return bytes(out)


def _fse_stream(codes: list[int], enc: _FSEEncTable
                ) -> tuple[int, list[tuple[int, int]]]:
    """Backward FSE walk over one code stream: returns (init_state,
    transitions) where transitions[t] = (bits, nb) moves the decoder
    from its state at sequence t to t+1 (t = 0..n-2)."""
    n = len(codes)
    state = enc.first_state(codes[n - 1])
    trans: list[tuple[int, int]] = [(0, 0)] * (n - 1)
    for t in range(n - 2, -1, -1):
        state, bits, nb = enc.step(codes[t], state)
        trans[t] = (bits, nb)
    return state, trans


def _choose_seq_table(codes: list[int], kind: str,
                      prev: "_FSEEncTable | None" = None
                      ) -> tuple[int, bytes, _FSEEncTable]:
    """Pick the cheapest sequence-table mode for one code stream:
    RLE (one distinct code), an FSE_Compressed table BUILT from the
    block's own code histogram, the predefined distribution, or
    Repeat (mode 3: the previous block's table, zero header bytes —
    the decoder keeps st.ll/of/ml across blocks) — whichever
    minimizes header bytes + measured bitstream bits (running the
    backward walk per candidate is cheap relative to the LZ pass).
    Returns (mode, header_bytes, encode_table)."""
    pre_ll, pre_ml, pre_of = _enc_tables()
    pre = {"ll": pre_ll, "ml": pre_ml, "of": pre_of}[kind]
    max_acc = {"ll": _LL_MAX_ACC, "ml": _ML_MAX_ACC,
               "of": _OF_MAX_ACC}[kind]
    counts: dict = {}
    for c in codes:
        counts[c] = counts.get(c, 0) + 1
    if len(counts) == 1:
        sym = codes[0]
        freqs = [0] * sym + [1]
        return 1, bytes([sym]), _FSEEncTable(_FSETable.rle(sym), freqs)

    def cost(enc: _FSEEncTable, hdr_len: int) -> int:
        _, trans = _fse_stream(codes, enc)
        return 8 * hdr_len + enc.table.acc + sum(nb for _, nb in trans)

    best = None
    try:
        best = (cost(pre, 0), 0, b"", pre)
    except (KeyError, IndexError):
        # a code outside the predefined distribution's range (offset
        # beyond ~512 MiB in the single-segment window): skip the
        # candidate instead of leaking KeyError out of compress()
        pass
    if prev is not None and all(c in prev.states for c in counts):
        # support check FIRST: step() on a zero-frequency symbol
        # would spin, not raise
        try:
            c = cost(prev, 0)  # Repeat: zero header bytes
            if best is None or c < best[0]:
                best = (c, 3, b"", prev)
        except (KeyError, IndexError):
            pass  # a code the previous table can't express
    nseq = len(codes)
    acc = max(5, min(max_acc, max((nseq - 1).bit_length() - 2,
                                  (len(counts) - 1).bit_length() + 1)))
    freqs = _fse_normalize(counts, acc)
    if freqs is not None:
        try:
            hdr = _write_fse_freqs(freqs, acc)
            enc = _FSEEncTable(_FSETable(acc, freqs), freqs)
            c = cost(enc, len(hdr))
            if best is None or c < best[0]:
                best = (c, 2, hdr, enc)
        except ZstdError:
            pass
    if best is None:
        # neither candidate viable for this stream; the caller's
        # ZstdError handler degrades the whole block to Raw
        raise ZstdError(f"no encodable {kind} sequence table")
    return best[1], best[2], best[3]


def _rep_resolve(reps: list, ll: int, offset: int
                 ) -> tuple[int, list]:
    """Encoder-side mirror of the decoder's repeated-offset rules
    (_decode_block, offset_value resolution): given the history
    entering a sequence and the sequence's ACTUAL offset, return
    (offset_value, history_after).  Repcodes (offset_value 1-3) cost
    0-1 extra bits vs bit_length(offset) for a fresh offset."""
    r0, r1, r2 = reps
    if ll != 0:
        if offset == r0:
            return 1, reps
        if offset == r1:
            return 2, [offset, r0, r2]
        if offset == r2:
            return 3, [offset, r0, r1]
    else:
        # ll==0 shifts the repcode index; rep1 itself is inexpressible
        if offset == r1:
            return 1, [offset, r0, r2]
        if offset == r2:
            return 2, [offset, r0, r1]
        if offset == r0 - 1 and offset > 0:
            return 3, [offset, r0, r1]
    return offset + 3, [offset, r0, r1]


def _encode_sequences(seqs: list[tuple[int, int, int]], reps: list,
                      prev: dict | None = None
                      ) -> tuple[bytes, list, dict]:
    """Sequences section: count + per-stream table modes (RLE /
    FSE-built-from-histogram / predefined / Repeat, cheapest wins) +
    the backward-read interleaved bitstream (RFC 8878
    §3.1.1.3.2.1.1 field order).  ``reps`` is the repeated-offset
    history entering the block and ``prev`` the {ll,of,ml} encode
    tables the previous compressed block used (both persist across
    blocks in a frame — decoder keeps st.reps/st.ll/of/ml); returns
    (bytes, history_after, tables_used) and the caller commits the
    new state ONLY if the compressed block is actually emitted (a
    Raw fallback leaves the decoder's state untouched)."""
    nseq = len(seqs)
    out = bytearray()
    if nseq < 128:
        out.append(nseq)
    elif nseq < 0x7F00:
        out += bytes([(nseq >> 8) + 0x80, nseq & 0xFF])
    else:
        out += bytes([0xFF]) + (nseq - 0x7F00).to_bytes(2, "little")
    ll_codes, of_codes, ml_codes = [], [], []
    extras: list[tuple[int, int, int, int, int, int]] = []
    reps = list(reps)
    for ll, offset, ml in seqs:
        lc = ll if ll < 16 else _code_of(ll, _LL_BASE)
        mc = _code_of(ml, _ML_BASE)
        ov, reps = _rep_resolve(reps, ll, offset)
        oc = ov.bit_length() - 1
        ll_codes.append(lc)
        ml_codes.append(mc)
        of_codes.append(oc)
        extras.append((oc, ov - (1 << oc),
                       _ML_BITS[mc], ml - _ML_BASE[mc],
                       _LL_BITS[lc], ll - _LL_BASE[lc]))
    prev = prev or {}
    ll_mode, ll_hdr, ll_t = _choose_seq_table(ll_codes, "ll",
                                              prev.get("ll"))
    of_mode, of_hdr, of_t = _choose_seq_table(of_codes, "of",
                                              prev.get("of"))
    ml_mode, ml_hdr, ml_t = _choose_seq_table(ml_codes, "ml",
                                              prev.get("ml"))
    out.append((ll_mode << 6) | (of_mode << 4) | (ml_mode << 2))
    out += ll_hdr + of_hdr + ml_hdr  # decoder reads ll, of, ml
    ll_init, ll_trans = _fse_stream(ll_codes, ll_t)
    ml_init, ml_trans = _fse_stream(ml_codes, ml_t)
    of_init, of_trans = _fse_stream(of_codes, of_t)
    # assemble in DECODE order: each later-read field goes to lower
    # significance; the sentinel 1 sits above the first-read field
    acc = 1
    nbits = 0

    def push(v: int, n: int) -> None:
        nonlocal acc, nbits
        acc = (acc << n) | v
        nbits += n

    push(ll_init, ll_t.table.acc)
    push(of_init, of_t.table.acc)
    push(ml_init, ml_t.table.acc)
    for t in range(nseq):
        onb, ov, mnb, mv, lnb, lv = extras[t]
        push(ov, onb)
        push(mv, mnb)
        push(lv, lnb)
        if t != nseq - 1:
            push(*ll_trans[t])
            push(*ml_trans[t])
            push(*of_trans[t])
    out += acc.to_bytes((nbits + 1 + 7) >> 3, "little")
    return bytes(out), reps, {"ll": ll_t, "of": of_t, "ml": ml_t}


def _encode_literals_raw(lits: bytes) -> bytes:
    n = len(lits)
    if n < 32:
        hdr = bytes([n << 3])                      # size_format 0
    elif n < 4096:
        hdr = bytes([0x04 | ((n & 0xF) << 4), n >> 4])   # sf 1
    else:
        hdr = bytes([0x0C | ((n & 0xF) << 4),
                     (n >> 4) & 0xFF, n >> 12])          # sf 3, 20 bits
    return hdr + lits


def _encode_literals_rle(lits: bytes) -> bytes:
    """RLE_Literals_Block (type 1): one byte × regenerated size."""
    n = len(lits)
    if n < 32:
        hdr = bytes([0x01 | (n << 3)])
    elif n < 4096:
        hdr = bytes([0x05 | ((n & 0xF) << 4), n >> 4])
    else:
        hdr = bytes([0x0D | ((n & 0xF) << 4),
                     (n >> 4) & 0xFF, n >> 12])
    return hdr + lits[:1]


def _package_merge(freqs: dict, max_len: int) -> dict | None:
    """Optimal length-limited code lengths via package-merge (Larmore
    & Hirschberg 1990): every symbol owns one coin per level 1..L;
    selecting coins of total face value n-1 at minimum frequency cost
    yields Kraft-EXACT lengths <= L, a symbol's length being how many
    of its coins were picked.  Exact by construction — no iterative
    repair that can oscillate (the r10 clamp-and-fix loop exited
    oversubscribed on steep-skew histograms, emitting undecodable
    Huffman tables; ADVICE r11 high).  None when n symbols can't fit
    in max_len bits at all."""
    n = len(freqs)
    if n > (1 << max_len):
        return None
    base = sorted(((f, (s,)) for s, f in freqs.items()))
    pkgs: list = []
    for _ in range(max_len - 1):
        merged = sorted(base + pkgs, key=lambda it: it[0])
        pkgs = [(merged[i][0] + merged[i + 1][0],
                 merged[i][1] + merged[i + 1][1])
                for i in range(0, len(merged) - 1, 2)]
    merged = sorted(base + pkgs, key=lambda it: it[0])
    lengths = dict.fromkeys(freqs, 0)
    for _, syms in merged[:2 * (n - 1)]:
        for s in syms:
            lengths[s] += 1
    return lengths


def _huffman_lengths(freqs: dict, max_len: int = 11) -> dict | None:
    """Kraft-exact, length-limited Huffman code lengths per byte
    (RFC 8878 caps literal codes at 11 bits).  Plain heap Huffman
    when the unconstrained depth already fits; exact package-merge
    when it doesn't.  None when Huffman can't apply (fewer than 2
    distinct symbols) or the result fails the final Kraft check —
    the caller then falls back to raw literals, so a bad table can
    never reach the wire."""
    import heapq

    if len(freqs) < 2:
        return None
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    lengths = dict.fromkeys(freqs, 0)
    tie = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            lengths[s] += 1
        heapq.heappush(heap, (f1 + f2, tie, s1 + s2))
        tie += 1
    if max(lengths.values()) > max_len:
        lengths = _package_merge(freqs, max_len)
        if lengths is None:
            return None
    # defense in depth: never hand an over/under-subscribed length
    # set to the table writer (an invalid frame is worse than a raw
    # literals block)
    scale = 1 << max_len
    if sum(scale >> ln for ln in lengths.values()) != scale:
        return None
    return lengths


def _huf_encode_table(lengths: dict) -> tuple[dict, list, int] | None:
    """(codes {sym: (code, len)}, weights list to serialize, max_bits)
    — replicating _HufTable's rank assignment exactly so encoder and
    decoder agree on code values.  None when the weight list can't be
    written in the DIRECT 4-bit representation (last nonzero symbol
    >= 128; FSE-compressed weights not implemented — caller falls
    back to raw literals)."""
    max_bits = max(lengths.values())
    s_last = max(lengths)
    if s_last >= 128:
        return None
    bits = [lengths.get(s, 0) for s in range(s_last + 1)]
    weights = [max_bits + 1 - b if b else 0 for b in bits]
    size = 1 << max_bits
    rank_count = [0] * (max_bits + 2)
    for b in bits:
        if b:
            rank_count[b] += 1
    rank_idx = [0] * (max_bits + 2)
    for b in range(max_bits, 0, -1):
        rank_idx[b - 1] = rank_idx[b] + rank_count[b] * (1 << (max_bits - b))
    codes = {}
    for s, b in enumerate(bits):
        if b == 0:
            continue
        codes[s] = (rank_idx[b] >> (max_bits - b), b)
        rank_idx[b] += 1 << (max_bits - b)
    del size
    return codes, weights[:-1], max_bits  # last weight is deduced


def _huf_stream(lits: bytes, codes: dict) -> bytes:
    """One backward Huffman bitstream (first literal in the top bits,
    sentinel 1 above it — the _BackBits layout).  Built LINEARLY by
    writing the REVERSED literals into a little-endian bit cursor
    from the low end (a single growing bigint would be quadratic in
    stream length)."""
    out = bytearray()
    acc = 0
    nbits = 0
    for b in reversed(lits):
        code, ln = codes[b]
        acc |= code << nbits
        nbits += ln
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    acc |= 1 << nbits  # sentinel above the first-read code
    nbits += 1
    while nbits > 0:
        out.append(acc & 0xFF)
        acc >>= 8
        nbits -= 8
    return bytes(out)


def _huf_literals_block(lits: bytes, codes: dict, wbytes: bytes,
                        ltype: int) -> bytes | None:
    """Serialize one Huffman literals section for a given code table:
    1-stream (size_format 0) below 1 KiB, 4-stream (size_format 3,
    jump table) above.  ``ltype`` 2 carries the weights header, 3 is
    Treeless (reuses the previous table; the decoder keeps st.huf
    across blocks).  None when the encoding doesn't pay or doesn't
    fit the header fields."""
    n = len(lits)
    if n < 1024:
        streams = _huf_stream(lits, codes)
        csize = len(wbytes) + len(streams)
        if csize >= 1024 or csize + 3 >= n:
            return None
        hdr = bytes([ltype | ((n & 0xF) << 4),
                     ((n >> 4) & 0x3F) | ((csize & 0x3) << 6),
                     csize >> 2])
        return hdr + bytes(wbytes) + streams
    per = (n + 3) // 4
    parts = [lits[0:per], lits[per:2 * per], lits[2 * per:3 * per],
             lits[3 * per:]]
    encoded = [_huf_stream(p, codes) for p in parts]
    if max(len(e) for e in encoded[:3]) > 0xFFFF:
        return None  # jump-table overflow: check BEFORE packing <HHH
    jump = struct.pack("<HHH", len(encoded[0]), len(encoded[1]),
                       len(encoded[2]))
    body = jump + b"".join(encoded)
    csize = len(wbytes) + len(body)
    if csize >= (1 << 18) or n >= (1 << 18) or csize + 5 >= n:
        return None
    hdr = bytes([(0x0C | ltype) | ((n & 0xF) << 4),
                 (n >> 4) & 0xFF,
                 ((n >> 12) & 0x3F) | ((csize & 0x3) << 6),
                 (csize >> 2) & 0xFF,
                 csize >> 10])
    return hdr + bytes(wbytes) + body


def _encode_literals_huffman(lits: bytes, prev_codes: dict | None = None
                             ) -> tuple[bytes, dict] | None:
    """Huffman literals section: a fresh direct-weights table (type 2)
    vs Treeless reuse of the previous block's table (type 3, zero
    header bytes) — smaller wins.  Returns (bytes, codes_in_effect)
    so the caller can thread the table to the next block; None when
    Huffman doesn't apply or doesn't pay."""
    n = len(lits)
    if n < 64:
        return None
    freqs: dict = {}
    for b in lits:
        freqs[b] = freqs.get(b, 0) + 1
    fresh = None
    lengths = _huffman_lengths(freqs)
    if lengths is not None:
        enc = _huf_encode_table(lengths)
        if enc is not None:
            codes, weights, _mb = enc
            wn = len(weights)
            wbytes = bytearray([127 + wn])
            for i in range(0, wn, 2):
                hi = weights[i] << 4
                lo = weights[i + 1] if i + 1 < wn else 0
                wbytes.append(hi | lo)
            blk = _huf_literals_block(lits, codes, bytes(wbytes), 2)
            if blk is not None:
                fresh = (blk, codes)
    treeless = None
    if prev_codes is not None and all(b in prev_codes for b in freqs):
        blk = _huf_literals_block(lits, prev_codes, b"", 3)
        if blk is not None:
            treeless = (blk, prev_codes)
    if fresh and treeless:
        return treeless if len(treeless[0]) < len(fresh[0]) else fresh
    return fresh or treeless


def _encode_literals(lits: bytes, prev_codes: dict | None = None
                     ) -> tuple[bytes, dict | None]:
    """Literals section: Huffman-compressed when it pays (fresh or
    Treeless), RLE for a single repeated byte, raw otherwise.
    Returns (bytes, huffman_codes_in_effect) — raw/RLE leave the
    decoder's st.huf untouched, so the incoming table stays live."""
    if len(lits) > 1 and len(set(lits)) == 1:
        return _encode_literals_rle(lits), prev_codes
    huff = _encode_literals_huffman(lits, prev_codes)
    if huff is not None:
        return huff
    return _encode_literals_raw(lits), prev_codes


_MAX_LL = _LL_BASE[-1] + (1 << _LL_BITS[-1]) - 1   # 131071
_MAX_ML = _ML_BASE[-1] + (1 << _ML_BITS[-1]) - 1   # 131074


_CHAIN_DEPTH = 8    # candidates probed per position (newest first)
_CHAIN_KEEP = 16    # positions retained per 4-byte key


def _lz_block(data: bytes, start: int, end: int, table: dict,
              reps: list
              ) -> tuple[list[tuple[int, int, int]], bytes, list]:
    """LZ77 with HASH CHAINS + repeated-offset candidates + 1-step
    LAZY matching over data[start:end].  ``table`` maps a 4-byte key
    to its recent positions (persists across blocks — single-segment
    window); the newest _CHAIN_DEPTH candidates are probed and the
    longest wins, but a repeated-offset match (tested against the
    predicted rep1/rep2 history) is preferred on near-ties because it
    encodes in 0-1 offset bits instead of bit_length(offset).  A match
    is deferred one byte when the next position matches strictly
    longer (classic lazy heuristic — zstd's own greedy→lazy1 step).
    ``reps`` is the PREDICTED history for match choice only; the
    authoritative replay lives in _encode_sequences, so a Raw-block
    fallback can cost ratio but never correctness.  Measured on the
    CDC JSON corpus (r10): chain depth 8 is the sweet spot; r11
    repcodes+lazy take the corpus 21.9×→23.2× (98.7% of zstd -3).
    Returns (sequences, literals, predicted_history_after)."""
    seqs: list[tuple[int, int, int]] = []
    lits = bytearray()
    pos = start
    lit_anchor = start
    limit = end - 4
    reps = list(reps)

    def probe(p: int) -> tuple[int, int]:
        """Longest chain match at p → (ml, offset); inserts p."""
        key = data[p:p + 4]
        chain = table.get(key)
        best_ml = 0
        best_cand = 0
        if chain is not None:
            max_ml = min(end - p, _MAX_ML)
            for cand in chain[-_CHAIN_DEPTH:][::-1]:
                ml = 4
                while ml < max_ml and data[cand + ml] == data[p + ml]:
                    ml += 1
                if ml > best_ml:
                    best_ml, best_cand = ml, cand
                    if ml >= max_ml:
                        break
            chain.append(p)
            if len(chain) > _CHAIN_KEEP:
                del chain[:-_CHAIN_KEEP]
        else:
            table[key] = [p]
        return best_ml, p - best_cand if best_ml else 0

    def probe_rep(p: int) -> tuple[int, int]:
        """Longest match at p against predicted rep1/rep2 →
        (ml, offset); 0 when neither reaches 3 bytes (ML codes start
        at base 3, and a repcode costs 0-1 offset bits, so even a
        3-byte rep match can undercut 3 Huffman literals)."""
        best_ml = 0
        best_off = 0
        max_ml = min(end - p, _MAX_ML)
        for r in (reps[0], reps[1]):
            cand = p - r
            if cand < 0 or r <= 0:
                continue
            if data[cand:cand + 3] != data[p:p + 3]:
                continue
            ml = 3
            while ml < max_ml and data[cand + ml] == data[p + ml]:
                ml += 1
            if ml > best_ml:
                best_ml, best_off = ml, r
        return best_ml, best_off

    def pick(p: int) -> tuple[int, int, bool]:
        """Combined candidate at p: chain vs rep, priced like zstd's
        own lazy heuristic — a rep match scores 3 points per byte
        with no offset penalty, a fresh match loses highbit(offset)
        (its extra offset bits), so a rep up to ~off_bits/3 bytes
        SHORTER still wins.  This is what takes the encoder from
        3.5% to ~25% repcode usage on CDC JSON (zstd -3 measures
        27%).  Returns (ml, offset, is_rep)."""
        ml, off = probe(p)
        rml, roff = probe_rep(p)
        if rml == 3 and (ml >= 4 or roff != reps[0]):
            rml = 0  # 3-byte reps only pay at 0 offset bits (rep1)
        if rml >= 3 and 3 * rml > 3 * ml - off.bit_length() + 1:
            return rml, roff, True
        return ml, off, False

    def price4(ml: int, off: int, is_rep: bool) -> int:
        """Lazy-comparison price (zstd's gain formula: 4 points per
        matched byte minus the offset's extra bits)."""
        return 4 * ml - (2 if is_rep else off.bit_length() + 1)

    pending: tuple[int, int, bool] | None = None
    while pos <= limit:
        if pending is not None:
            best_ml, offset, is_rep = pending
            pending = None
        else:
            best_ml, offset, is_rep = pick(pos)
        if best_ml < 3:
            pos += 1
            continue
        # lazy 1-step: emit this byte as a literal when pos+1 prices
        # clearly better (the +4 bonus biases toward taking the match
        # now — zstd's own stay-bonus; skip for already-long matches)
        if best_ml < 128 and pos + 1 <= limit:
            nml, noff, nrep = pick(pos + 1)
            if nml >= 3 and (price4(nml, noff, nrep)
                             > price4(best_ml, offset, is_rep) + 4):
                pending = (nml, noff, nrep)
                pos += 1
                continue
        ll = pos - lit_anchor
        if ll > _MAX_LL:
            # flush an oversized literal run with a zero-literal split:
            # impossible for <=128 KiB blocks, kept as a guard
            raise ZstdError("literal run exceeds LL code range")
        lits += data[lit_anchor:pos]
        seqs.append((ll, offset, best_ml))
        _, reps = _rep_resolve(reps, ll, offset)
        # index interior positions sparsely for more back-references
        # without the full per-byte chain cost
        nxt = pos + best_ml
        for p in range(pos + 1, min(nxt, limit), 3):
            table.setdefault(data[p:p + 4], []).append(p)
        pos = nxt
        lit_anchor = nxt
    lits += data[lit_anchor:end]
    return seqs, bytes(lits), reps


def compress_py(data: bytes) -> bytes:
    """Pure-Python COMPRESSING zstd frame (no native library):
    single-segment frame; hash-chain LZ77 with repeated-offset
    candidates + lazy matching; Huffman literals (fresh or Treeless);
    sequences FSE-coded with built/predefined/Repeat tables and full
    repcode resolution; XXH64 checksum.  Any block the pipeline fails
    to shrink is emitted as a Raw block, so the result is never
    materially larger than store mode and always a conformant frame
    (round-tripped against the vendored decoder, libzstd, and the
    zstd CLI in tests)."""
    data = bytes(data)
    n = len(data)
    out = bytearray(struct.pack("<I", ZSTD_MAGIC))
    if n < 256:
        fcs_code, fcs_len = 0, 1
    elif n < 65536 + 256:
        fcs_code, fcs_len = 1, 2
    elif n < 1 << 32:
        fcs_code, fcs_len = 2, 4
    else:
        fcs_code, fcs_len = 3, 8
    out.append((fcs_code << 6) | 0x20 | 0x04)  # single-segment+checksum
    out += (n - 256 if fcs_code == 1 else n).to_bytes(fcs_len, "little")
    if n == 0:
        out += (1).to_bytes(3, "little")
        out += struct.pack("<I", xxh64(b"") & 0xFFFFFFFF)
        return bytes(out)
    table: dict = {}
    # decoder-side state that persists across blocks in the frame
    # (st.reps / st.huf / st.ll,of,ml) — committed only when the
    # compressed block is actually emitted
    reps = [1, 4, 8]
    huf_codes: dict | None = None
    seq_tables: dict | None = None
    mreps = [1, 4, 8]   # matcher's prediction (match CHOICE only)
    for off in range(0, n, _RAW_BLOCK_MAX):
        seg_end = min(off + _RAW_BLOCK_MAX, n)
        seg_len = seg_end - off
        last = 1 if seg_end == n else 0
        seqs, lits, mreps = _lz_block(data, off, seg_end, table, mreps)
        body = None
        new_reps, new_huf, new_tabs = reps, huf_codes, seq_tables
        try:
            if seqs:
                sec, new_reps, new_tabs = _encode_sequences(
                    seqs, reps, seq_tables)
                lit_sec, new_huf = _encode_literals(lits, huf_codes)
                body = lit_sec + sec
            elif len(lits) >= 128:
                # no matches but maybe entropy: literals-only compressed
                # block (0 sequences) still pays on skewed histograms
                enc = _encode_literals_huffman(lits, huf_codes)
                if enc is not None:
                    body = enc[0] + b"\x00"  # Number_of_Sequences = 0
                    new_huf = enc[1]
        except ZstdError:
            body = None  # any encode failure degrades to a Raw block
        if body is None or len(body) >= seg_len:
            out += (last | (seg_len << 3)).to_bytes(3, "little")
            out += data[off:seg_end]
        else:
            out += (last | (2 << 1) | (len(body) << 3)).to_bytes(
                3, "little")
            out += body
            # decoder state advanced: commit
            reps, huf_codes, seq_tables = new_reps, new_huf, new_tabs
    out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)


def compress(data: bytes, level: int = 3) -> bytes:
    """One-shot zstd compression: libzstd (ctypes) when loadable,
    otherwise the pure-Python compressing encoder above (~99.9% of
    ``zstd -3``'s ratio on the sink's JSON corpus; ``level`` is then
    ignored).  Never raises for lack of a native library; consuming
    (decompress above) never needs one either."""
    import ctypes

    lib = _libzstd()
    if lib is None:
        return compress_py(data)
    bound = lib.ZSTD_compressBound(len(data))
    buf = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress(buf, bound, data, len(data), level)
    if lib.ZSTD_isError(n):
        raise ZstdError(f"libzstd compress error code {n}")
    return buf.raw[:n]
