"""MP4 (ISO BMFF) and MKV (EBML) container probes — r10 verdict
task #4: pure-stdlib box/element walks that narrow the video honesty
gate to pixel decode only.  Differential against the synthesizers
(exact inverses by construction) plus honest-error and format-edge
cases.  Reference parity n/a: the reference has no media operators;
this is the LLM-data-pipeline brief."""

import struct

from sequin_spark.datapipe.multimodal import (
    probe_mkv,
    probe_mp4,
    synth_mkv,
    synth_mp4,
)


def test_mp4_synth_probe_differential():
    for d in (0, 1, 5, 96, 97, 123, 4095, 99999):
        m = probe_mp4(synth_mp4(d))
        assert m["status"] == "probed", (d, m)
        assert m["codec"] == "avc1" and m["n_tracks"] == 1
        assert m["duration_ms"] == 1000 + (d % 97) * 40
        assert m["width"] == 16 * (1 + d % 9)
        assert m["height"] == 16 * (1 + d % 5)
        assert m["n_frames"] == 1 + d % 250


def test_mkv_synth_probe_differential():
    for d in (0, 1, 5, 88, 89, 123, 4095, 99999):
        m = probe_mkv(synth_mkv(d))
        assert m["status"] == "probed", (d, m)
        assert m["codec"] == "V_SYNTH" and m["n_tracks"] == 1
        assert m["duration_ms"] == 500 + (d % 89) * 20
        assert m["width"] == 32 * (1 + d % 7)
        assert m["height"] == 32 * (1 + d % 3)
        assert m["n_frames"] == 1 + d % 50


def test_mp4_64bit_box_and_v1_mvhd():
    """size==1 → 8-byte largesize; mvhd/tkhd version 1 use 64-bit
    times — both strides must parse."""
    base = synth_mp4(7)
    # rewrap the whole file's moov in a 64-bit box: find it
    i = base.index(b"moov") - 4
    (size,) = struct.unpack_from(">I", base, i)
    moov = base[i:i + size]
    big = struct.pack(">I", 1) + b"moov" + struct.pack(
        ">Q", 16 + size - 8) + moov[8:]
    blob = base[:i] + big + base[i + size:]
    m = probe_mp4(blob)
    assert m["status"] == "probed" and m["duration_ms"] == 1000 + 7 * 40

    # version-1 mvhd: 8-byte ctime/mtime, 4-byte timescale, 8-byte dur
    mvhd_v1 = (struct.pack(">I", 8 + 4 + 28 + 80) + b"mvhd"
               + bytes([1]) + bytes(3)
               + struct.pack(">QQIQ", 0, 0, 1000, 2500)
               + bytes(80))
    j = base.index(b"mvhd") - 4
    (msize,) = struct.unpack_from(">I", base, j)
    blob2 = base[:j] + mvhd_v1 + base[j + msize:]
    # moov size changed: rebuild moov header
    delta = len(mvhd_v1) - msize
    (osz,) = struct.unpack_from(">I", blob2, i)
    blob2 = (blob2[:i] + struct.pack(">I", osz + delta)
             + blob2[i + 4:])
    m2 = probe_mp4(blob2)
    assert m2["status"] == "probed" and m2["duration_ms"] == 2500


def test_probe_honest_errors():
    assert probe_mp4(b"\x00" * 3)["status"] == "not_mp4"
    assert probe_mp4(struct.pack(">I", 16) + b"ftyp" + b"isom"
                     + bytes(4))["status"] == "no_moov"
    assert probe_mp4(synth_mp4(3)[:40])["status"] in (
        "truncated", "no_moov")
    assert probe_mkv(b"nope")["status"] == "not_mkv"
    assert probe_mkv(synth_mkv(3)[:10])["status"] in (
        "truncated", "no_segment")
    # zero-size box loop guard: a box claiming size < header
    bad = struct.pack(">I", 3) + b"ftyp" + bytes(8)
    assert probe_mp4(bad)["status"] in ("truncated", "not_mp4")


def test_mkv_audio_only_reports_no_video():
    d = 11
    blob = synth_mkv(d)
    # flip TrackType video(1) -> audio(2): element id 0x83, size 0x4001
    k = blob.index(b"\x83\x40\x01\x01")
    blob = blob[:k + 3] + b"\x02" + blob[k + 4:]
    m = probe_mkv(blob)
    assert m["status"] == "no_video_track"
    assert m["n_tracks"] == 1
