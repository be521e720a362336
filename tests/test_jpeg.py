"""Baseline JPEG decoder (datapipe/multimodal.decode_jpeg) — r9
verdict task #3.  No JPEG reference implementation exists in this
container (no PIL/djpeg/ffmpeg), so the differential harness is
self-contained: a TEST-ONLY general encoder (full FDCT + quantization
+ run-length AC Huffman + restart markers + subsampled color) produces
real entropy-coded streams, and the expected pixels are computed from
the SAME quantized coefficients through an INDEPENDENT direct-sum IDCT
(four explicit loops over math.cos — not the decoder's numpy matrix
basis).  A Huffman/unstuffing/restart/dequant/zigzag bug shows up as a
pixel mismatch; an IDCT bug shows up as matrix-vs-direct divergence.
"""

import math
import random
import struct

import numpy as np
import pytest

from sequin_spark.datapipe.multimodal import (
    _STD_AC_LUMA,
    _STD_DC_LUMA,
    _JpegBitWriter,
    _ZIGZAG,
    _huff_encode_map,
    decode_jpeg,
    synth_gray_jpeg,
)

# ---------------------------------------------------------------------------
# test-only encoder


def _fdct(block):
    """Direct-sum forward DCT (T.81 A.3.3), float64."""
    out = np.zeros((8, 8))
    for u in range(8):
        cu = 1 / math.sqrt(2) if u == 0 else 1.0
        for v in range(8):
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += block[x, y] * math.cos((2 * x + 1) * u * math.pi / 16) \
                        * math.cos((2 * y + 1) * v * math.pi / 16)
            out[u, v] = 0.25 * cu * cv * s
    return out


def _idct_direct(coef):
    """Direct-sum inverse DCT — independent of the decoder's
    matrix-product basis."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                cu = 1 / math.sqrt(2) if u == 0 else 1.0
                for v in range(8):
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += cu * cv * coef[u, v] \
                        * math.cos((2 * x + 1) * u * math.pi / 16) \
                        * math.cos((2 * y + 1) * v * math.pi / 16)
            out[x, y] = 0.25 * s
    return out


def _quantize_plane(plane, quant):
    """Per-8×8-block FDCT + quantization: returns array of
    (blocks_y, blocks_x, 8, 8) int coefficients (natural order)."""
    h, w = plane.shape
    q = np.array([[quant[_ZIGZAG.index(u * 8 + v)] for v in range(8)]
                  for u in range(8)], dtype=float)
    by, bx = h // 8, w // 8
    out = np.zeros((by, bx, 8, 8), dtype=np.int64)
    for i in range(by):
        for j in range(bx):
            block = plane[i * 8:(i + 1) * 8, j * 8:(j + 1) * 8] - 128.0
            out[i, j] = np.round(_fdct(block) / q).astype(np.int64)
    return out


def _entropy_encode_blocks(blocks_in_order, quantized, restart_interval=0):
    """blocks_in_order: list of (comp_idx, by, bx); quantized: per-comp
    coefficient arrays.  Returns the entropy-coded byte stream with
    RSTn markers every restart_interval MCUs (caller aligns MCU
    boundaries with the block order)."""
    dc_map = _huff_encode_map(*_STD_DC_LUMA)
    ac_map = _huff_encode_map(*_STD_AC_LUMA)
    ncomp = len(quantized)
    segments = []
    bw = _JpegBitWriter()
    preds = [0] * ncomp
    mcu_idx = 0

    def encode_block(ci, coefs):
        dc = int(coefs[0, 0])
        diff = dc - preds[ci]
        preds[ci] = dc
        t = abs(diff).bit_length()
        code, ln = dc_map[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        zz = [int(coefs[p // 8, p % 8]) for p in _ZIGZAG]
        k = 1
        run = 0
        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
        while k <= last_nz:
            if zz[k] == 0:
                run += 1
                k += 1
                continue
            while run >= 16:
                code, ln = ac_map[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            s = abs(zz[k]).bit_length()
            code, ln = ac_map[(run << 4) | s]
            bw.write(code, ln)
            v = zz[k]
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
            k += 1
        if last_nz < 63:
            code, ln = ac_map[0x00]  # EOB
            bw.write(code, ln)

    # caller marks MCU boundaries with sentinel None entries
    for item in blocks_in_order:
        if item is None:  # MCU boundary
            mcu_idx += 1
            if restart_interval and mcu_idx % restart_interval == 0:
                segments.append(bw.flush())
                bw = _JpegBitWriter()
                preds = [0] * ncomp
            continue
        ci, by, bx = item
        encode_block(ci, quantized[ci][by, bx])
    segments.append(bw.flush())
    out = bytearray(segments[0])
    for i, s in enumerate(segments[1:]):
        out += bytes([0xFF, 0xD0 + (i % 8)]) + s
    return bytes(out)


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
        + payload


def encode_jpeg_gray(plane, quant, restart_interval=0):
    h, w = plane.shape
    q = _quantize_plane(plane, quant)
    order = []
    for i in range(h // 8):
        for j in range(w // 8):
            order.append((0, i, j))
            order.append(None)
    entropy = _entropy_encode_blocks(order, [q], restart_interval)
    parts = [b"\xff\xd8", _seg(0xDB, bytes([0x00]) + bytes(quant))]
    if restart_interval:
        parts.append(_seg(0xDD, struct.pack(">H", restart_interval)))
    parts += [
        _seg(0xC0, bytes([8]) + struct.pack(">HH", h, w)
             + bytes([1, 0x01, 0x11, 0x00])),
        _seg(0xC4, bytes([0x00]) + bytes(_STD_DC_LUMA[0])
             + bytes(_STD_DC_LUMA[1])),
        _seg(0xC4, bytes([0x10]) + bytes(_STD_AC_LUMA[0])
             + bytes(_STD_AC_LUMA[1])),
        _seg(0xDA, bytes([1, 0x01, 0x00, 0x00, 0x3F, 0x00])),
        entropy, b"\xff\xd9"]
    return b"".join(parts), q


def expected_pixels(quantized, quant):
    """Independent reconstruction: dequant + direct-sum IDCT + level
    shift + clamp, per block."""
    qn = np.array([[quant[_ZIGZAG.index(u * 8 + v)] for v in range(8)]
                   for u in range(8)], dtype=float)
    by, bx = quantized.shape[:2]
    out = np.zeros((by * 8, bx * 8), dtype=np.int64)
    for i in range(by):
        for j in range(bx):
            coef = quantized[i, j].astype(float) * qn
            px = np.clip(np.round(_idct_direct(coef)) + 128, 0, 255)
            out[i * 8:(i + 1) * 8, j * 8:(j + 1) * 8] = px.astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# tests


def test_dc_only_roundtrip_exact():
    """Constant blocks survive encode→decode EXACTLY (the analytic
    property the multimodal_jpeg_decode oracle relies on)."""
    for doc_id in (0, 1, 7, 255, 31337):
        d = decode_jpeg(synth_gray_jpeg(doc_id), return_pixels=True)
        assert d["status"] == "decoded"
        for bi in range(2):
            for bj in range(2):
                v = (doc_id * 37 + bi * 11 + bj * 5) % 256
                blk = d["pixels"][0][bi * 8:(bi + 1) * 8,
                                     bj * 8:(bj + 1) * 8]
                assert (blk == v).all(), (doc_id, bi, bj)


def test_gray_ac_differential():
    """Random gray images through the full AC path: decoder pixels ==
    the independent direct-sum reconstruction of the same quantized
    coefficients (validates Huffman run-length decode, zigzag,
    dequant, and the matrix IDCT against the direct sum)."""
    rng = random.Random(42)
    quant = [1 + (i % 7) for i in range(64)]  # non-trivial table
    for trial in range(4):
        h, w = 16, 24
        plane = np.array([[rng.randrange(256) for _ in range(w)]
                          for _ in range(h)], dtype=float)
        blob, q = encode_jpeg_gray(plane, quant)
        d = decode_jpeg(blob, return_pixels=True)
        assert d["status"] == "decoded", d
        assert (d["width"], d["height"]) == (w, h)
        want = expected_pixels(q, quant)
        got = d["pixels"][0]
        assert (got == want).all(), (
            trial, int(np.abs(got - want).max()))


def test_restart_markers_and_byte_stuffing():
    """Restart intervals reset the DC predictor and re-align the
    stream; smooth gradients produce 0xFF bytes that exercise the
    unstuffing path."""
    rng = random.Random(7)
    quant = [1] * 64
    h, w = 24, 32
    plane = np.array([[(x * 16 + y + rng.randrange(3)) % 256
                       for y in range(w)] for x in range(h)], dtype=float)
    for ri in (1, 2, 5):
        blob, q = encode_jpeg_gray(plane, quant, restart_interval=ri)
        assert any(0xD0 <= blob[i + 1] <= 0xD7
                   for i in range(len(blob) - 1) if blob[i] == 0xFF)
        d = decode_jpeg(blob, return_pixels=True)
        assert d["status"] == "decoded", (ri, d)
        want = expected_pixels(q, quant)
        assert (d["pixels"][0] == want).all(), ri


def test_unsupported_sof_rejected_honestly():
    """SOF2 decodes for real since r12 (see the progressive tests
    below); the still-unsupported frame types — lossless (SOF3),
    arithmetic (SOF9+) — must keep returning an explicit status, and a
    baseline stream relabeled SOF2 is a MALFORMED progressive stream
    (baseline entropy data under a progressive header), not wrong
    pixels."""
    blob = bytearray(synth_gray_jpeg(5))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC3  # lossless sequential
    assert decode_jpeg(bytes(blob))["status"] == "unsupported_sof"
    blob[i + 1] = 0xC9  # arithmetic extended sequential
    assert decode_jpeg(bytes(blob))["status"] == "unsupported_sof"
    blob[i + 1] = 0xC2  # baseline scan bytes under a progressive header
    d = decode_jpeg(bytes(blob))
    # baseline SOS (Ss=0,Se=63) is invalid for a progressive DC scan:
    # the decoder must flag it, never emit pixels from garbage
    assert d["status"] in ("truncated", "bad_marker_stream")
    assert d["mean_luma_x1000"] is None


def test_truncated_stream_is_flagged():
    blob = synth_gray_jpeg(5)
    d = decode_jpeg(blob[:40])
    assert d["status"] in ("truncated", "bad_marker_stream")


def test_color_420_constant_chroma():
    """3-component 4:2:0: constant-DC color planes decode to the exact
    YCbCr→RGB conversion (validates multi-component MCU interleave +
    chroma upsampling)."""
    # Y plane: 4 constant 8px blocks per MCU; Cb/Cr: one block each
    yv, cbv, crv = 120, 90, 170
    dc_map = _huff_encode_map(*_STD_DC_LUMA)
    ac_map = _huff_encode_map(*_STD_AC_LUMA)
    bw = _JpegBitWriter()
    preds = [0, 0, 0]

    def dc_block(ci, v):
        dc = 8 * (v - 128)
        diff = dc - preds[ci]
        preds[ci] = dc
        t = abs(diff).bit_length()
        code, ln = dc_map[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        code, ln = ac_map[0x00]
        bw.write(code, ln)

    # one MCU: 4 Y blocks (2x2), 1 Cb, 1 Cr → image 16x16
    for _ in range(4):
        dc_block(0, yv)
    dc_block(1, cbv)
    dc_block(2, crv)
    entropy = bw.flush()
    quant = bytes([1] * 64)
    blob = b"".join([
        b"\xff\xd8",
        _seg(0xDB, bytes([0x00]) + quant),
        _seg(0xC0, bytes([8]) + struct.pack(">HH", 16, 16)
             + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])),
        _seg(0xC4, bytes([0x00]) + bytes(_STD_DC_LUMA[0])
             + bytes(_STD_DC_LUMA[1])),
        _seg(0xC4, bytes([0x10]) + bytes(_STD_AC_LUMA[0])
             + bytes(_STD_AC_LUMA[1])),
        _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0x3F, 0])),
        entropy, b"\xff\xd9"])
    d = decode_jpeg(blob, return_pixels=True)
    assert d["status"] == "decoded", d
    assert d["n_channels"] == 3 and (d["width"], d["height"]) == (16, 16)
    y, cb, cr = (p[0, 0] for p in d["pixels"])
    assert (y, cb, cr) == (yv, cbv, crv)
    r = min(255, max(0, round(yv + 1.402 * (crv - 128))))
    g = min(255, max(0, round(yv - 0.344136 * (cbv - 128)
                              - 0.714136 * (crv - 128))))
    b = min(255, max(0, round(yv + 1.772 * (cbv - 128))))
    assert d["mean_luma_x1000"] == 1000 * ((r + g + b) // 3)


def test_non_multiple_of_8_dims_cropped():
    """Widths/heights that aren't MCU multiples decode with the spec's
    right/bottom padding cropped away."""
    rng = random.Random(3)
    quant = [2] * 64
    full = np.array([[rng.randrange(256) for _ in range(24)]
                     for _ in range(16)], dtype=float)
    blob, q = encode_jpeg_gray(full, quant)
    # claim a 20x13 image inside the 24x16 coded area
    i = blob.find(b"\xff\xc0")
    mut = bytearray(blob)
    mut[i + 5:i + 9] = struct.pack(">HH", 13, 20)
    d = decode_jpeg(bytes(mut), return_pixels=True)
    assert d["status"] == "decoded"
    assert (d["width"], d["height"]) == (20, 13)
    assert d["pixels"][0].shape == (13, 20)
    want = expected_pixels(q, quant)[:13, :20]
    assert (d["pixels"][0] == want).all()
    assert d["n_pixels"] == 260


# --- progressive (SOF2) — r11 verdict task #7 ------------------------------


def test_progressive_constant_blocks_match_baseline():
    """The progressive synth re-encodes synth_gray_jpeg's exact pixel
    content; every stat must match the baseline decode (and the
    analytic block rule the SQL oracle uses)."""
    from sequin_spark.datapipe.multimodal import (
        decode_jpeg,
        synth_gray_jpeg,
        synth_gray_progressive_jpeg,
    )

    for d in (0, 1, 7, 123, 9999, 54321):
        base = decode_jpeg(synth_gray_jpeg(d))
        prog = decode_jpeg(synth_gray_progressive_jpeg(d))
        assert prog["status"] == "decoded"
        assert prog == base


def test_progressive_differential_vs_baseline_pixels():
    """Baseline and progressive encodings of ONE coefficient set must
    decode to bit-identical pixels — isolates the §G entropy layers
    (AC first scan with ZRL + EOBRUN, refinement with newly-nonzero
    coefficients, correction bits, ZRL-in-refinement) against the
    shared dequant/IDCT tail."""
    import random

    import numpy as np

    from sequin_spark.datapipe.multimodal import (
        _ZIGZAG,
        decode_jpeg,
        encode_gray_baseline,
        encode_gray_progressive,
    )

    def blocks(spec):
        out = []
        for d in spec:
            blk = [0] * 64
            for k, v in d.items():
                blk[_ZIGZAG[k]] = v
            out.append(blk)
        return out

    # hand-picked: all-EOB, pos/neg AC refine, deep coefficient (ZRL in
    # the first scan), newly-nonzero-in-refinement-only, and ODD
    # NEGATIVE DC values — the point transform for DC is an arithmetic
    # shift (floors negatives), so sign-magnitude encoding is off by
    # one exactly there (DC=-5: arith sends -3 → recon -6 |1 = -5;
    # sign-mag sends -2 → recon -4 |1 = -3) and values that are
    # multiples of 2^Al can never catch it
    spec = [{0: 8 * (40 - 128)},
            {0: 8 * (200 - 128), 1: 3, 20: 2},
            {0: 8 * (77 - 128), 1: -3},
            {0: -5, 1: 1},
            {0: -1},
            {0: -257, 3: 2},
            {0: 7},
            {0: 8 * (130 - 128), 1: 1}]
    co = blocks(spec)
    b = decode_jpeg(encode_gray_baseline(co, 32, 16), return_pixels=True)
    p = decode_jpeg(encode_gray_progressive(co, 32, 16),
                    return_pixels=True)
    assert b["status"] == p["status"] == "decoded"
    for x, y in zip(b.pop("pixels"), p.pop("pixels")):
        assert np.array_equal(x, y)
    assert b == p

    rng = random.Random(7)
    deep_ones = 0
    for trial in range(40):
        spec = []
        for _ in range(6):
            # arbitrary-parity DC, negatives included (odd negatives
            # are the arithmetic-vs-sign-magnitude shift sentinels)
            d = {0: rng.randrange(-1024, 1024)}
            for k in rng.sample(range(1, 64), rng.randrange(0, 5)):
                d[k] = rng.choice([-3, -2, -1, 1, 2, 3])
            spec.append(d)
        deep_ones += sum(1 for d in spec for k, v in d.items()
                         if k and abs(v) == 1 and k >= 17)
        co = blocks(spec)
        b = decode_jpeg(encode_gray_baseline(co, 24, 16),
                        return_pixels=True)
        p = decode_jpeg(encode_gray_progressive(co, 24, 16),
                        return_pixels=True)
        assert b["status"] == p["status"] == "decoded", trial
        for x, y in zip(b.pop("pixels"), p.pop("pixels")):
            assert np.array_equal(x, y), trial
        assert b == p, trial
    # the sweep must actually exercise ZRL-in-refinement territory
    assert deep_ones > 20


def test_progressive_spectral_band_split():
    """Coefficients split across two AC bands (1..5, 6..63) in
    separate scans reassemble into the same block."""
    from sequin_spark.datapipe.multimodal import (
        _ZIGZAG,
        decode_jpeg,
        encode_gray_baseline,
        encode_gray_progressive,
    )

    blk = [0] * 64
    blk[0] = 8 * (90 - 128)
    blk[_ZIGZAG[2]] = 3
    blk[_ZIGZAG[9]] = -2
    scans = [("dc", 0, 0, 0, 0),
             ("ac", 1, 5, 0, 0), ("ac", 6, 63, 0, 0)]
    b = decode_jpeg(encode_gray_baseline([blk], 8, 8))
    p = decode_jpeg(encode_gray_progressive([blk], 8, 8, scans=scans))
    assert p["status"] == "decoded"
    assert p == b


def test_progressive_noninterleaved_dc_subsampled_grid():
    """A non-interleaved DC scan contains the component's OWN block
    grid (bx·by data units, T.81 A.2.2), not the MCU-padded grid: for
    a 4:2:0 luma component in a 24×24 frame that's 3×3 = 9 units,
    while the padded grid is 4×4 = 16 — a loop over the padded grid
    over-reads the entropy stream and desyncs (regression: the DC
    path used by_pad/bx_pad while the AC path correctly used by/bx)."""
    yv, cbv, crv = 120, 90, 170
    dc_map = _huff_encode_map(*_STD_DC_LUMA)

    def dc_scan(comp_id, units, value):
        """One non-interleaved first DC scan: SOS + entropy."""
        bw = _JpegBitWriter()
        pred = 0
        for _ in range(units):
            dc = 8 * (value - 128)
            diff = dc - pred
            pred = dc
            t = abs(diff).bit_length()
            code, ln = dc_map[t]
            bw.write(code, ln)
            if t:
                bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        return (_seg(0xDA, bytes([1, comp_id, 0x00, 0, 0, 0x00]))
                + bw.flush())

    quant = bytes([1] * 64)
    blob = b"".join([
        b"\xff\xd8",
        _seg(0xDB, bytes([0x00]) + quant),
        # SOF2 (progressive), 24×24, Y 2x2-sampled + Cb/Cr 1x1
        _seg(0xC2, bytes([8]) + struct.pack(">HH", 24, 24)
             + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])),
        _seg(0xC4, bytes([0x00]) + bytes(_STD_DC_LUMA[0])
             + bytes(_STD_DC_LUMA[1])),
        # Y: bx=by=ceil(24/8)=3 → 9 units (padded grid would be 16);
        # Cb/Cr: 12×12 → bx=by=2 → 4 units
        dc_scan(1, 9, yv),
        dc_scan(2, 4, cbv),
        dc_scan(3, 4, crv),
        b"\xff\xd9"])
    d = decode_jpeg(blob, return_pixels=True)
    assert d["status"] == "decoded", d
    assert d["n_channels"] == 3 and (d["width"], d["height"]) == (24, 24)
    y, cb, cr = d["pixels"]
    assert (y == yv).all() and (cb == cbv).all() and (cr == crv).all()
