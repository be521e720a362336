"""MP3 (MPEG-1 Layer III frame walk) and FLAC (STREAMINFO metadata
walk) container probes — the audio half of the container matrix next
to the MP4/MKV probes (tests/test_video_probe.py).  Differential
against the synthesizers (exact inverses by construction) plus
honest-error and format-edge cases.  Reference parity n/a: the
reference has no media operators; this is the LLM-data-pipeline
brief."""

from sequin_spark.datapipe.multimodal import (
    _MP3_BITRATE_V1L3,
    probe_flac,
    probe_mp3,
    synth_flac,
    synth_mp3,
)


def test_mp3_synth_probe_differential():
    for d in (0, 1, 2, 3, 4, 5, 6, 7, 13, 14, 35, 59, 60, 61, 70,
              4095, 99999):
        m = probe_mp3(synth_mp3(d))
        assert m["status"] == "probed", (d, m)
        assert m["container"] == "mp3" and m["codec"] == "mp3"
        assert m["sample_rate"] == (44100, 48000, 32000)[d % 3]
        assert m["bitrate_kbps"] == _MP3_BITRATE_V1L3[1 + d % 14]
        assert m["channels"] == (1 if d % 2 == 1 else 2)
        assert m["n_frames"] == 1 + d % 60
        assert m["n_samples"] == (1 + d % 60) * 1152
        assert m["duration_ms"] == (
            (1 + d % 60) * 1152 * 1000 // m["sample_rate"])


def test_flac_synth_probe_differential():
    for d in (0, 1, 2, 3, 4, 5, 6, 7, 100, 101, 102, 4095, 99999):
        m = probe_flac(synth_flac(d))
        assert m["status"] == "probed", (d, m)
        assert m["container"] == "flac" and m["codec"] == "flac"
        assert m["sample_rate"] == (44100, 48000, 96000, 22050)[d % 4]
        assert m["channels"] == 1 + d % 2
        assert m["bits_per_sample"] == (24 if d % 3 == 0 else 16)
        assert m["n_samples"] == 1000 + (d % 101) * 441
        assert m["n_blocks"] == 1 + d % 4
        assert m["duration_ms"] == (
            m["n_samples"] * 1000 // m["sample_rate"])


def test_mp3_id3_skip_and_trailer():
    # doc 0: ID3v2 prefix (0 % 5 == 0) AND ID3v1 trailer (0 % 7 == 0)
    blob = synth_mp3(0)
    assert blob[:3] == b"ID3" and blob[-128:-125] == b"TAG"
    m = probe_mp3(blob)
    assert m["status"] == "probed" and m["n_frames"] == 1
    # a syncsafe-violating ID3 size byte is a per-row status
    bad = b"ID3\x03\x00\x00" + bytes([0x80, 0, 0, 0]) + synth_mp3(1)
    assert probe_mp3(bad)["status"] == "bad_id3_size"


def test_mp3_honest_errors():
    assert probe_mp3(b"")["status"] == "no_sync"
    assert probe_mp3(b"\x00" * 64)["status"] == "no_sync"
    # truncated MID-frame: header promises more than the blob holds
    # (a frame-boundary cut is a valid shorter file, so cut inside
    # frame 3: doc 3 has 4 × 182-byte frames)
    good = synth_mp3(3)
    assert probe_mp3(good[: len(good) // 2 + 10])["status"] == "truncated"
    # MPEG-2 (version bits 10) is honestly unsupported, not wrong
    v2 = bytes([0xFF, 0xF3, 0x90, 0x00]) + bytes(300)
    assert probe_mp3(v2)["status"] == "unsupported_mpeg_variant"
    # bitrate index 15 / samplerate index 3 are reserved
    bad_bi = bytes([0xFF, 0xFB, 0xF0, 0x00]) + bytes(300)
    assert probe_mp3(bad_bi)["status"] == "bad_frame_header"
    bad_sr = bytes([0xFF, 0xFB, 0x9C, 0x00]) + bytes(300)
    assert probe_mp3(bad_sr)["status"] == "bad_frame_header"


def test_mp3_padding_bit_stride():
    """A padded frame is one byte longer; the walk must land exactly
    on the next sync or the frame count drifts."""
    d = 9
    base = synth_mp3(d)
    b2 = base[2] | 0x02  # set padding on the FIRST frame only
    padded = bytes([base[0], base[1], b2, base[3]])
    flen = 144 * _MP3_BITRATE_V1L3[1 + d % 14] * 1000 // 44100
    blob = padded + base[4:flen] + b"\x00" + base[flen:]
    m = probe_mp3(blob)
    assert m["status"] == "probed" and m["n_frames"] == 1 + d % 60


def test_flac_honest_errors():
    assert probe_flac(b"fLaX")["status"] == "not_flac"
    good = synth_flac(5)
    assert probe_flac(good[:7])["status"] == "truncated"
    assert probe_flac(good[: len(good) - 1])["status"] == "truncated"
    # a stream whose only block is PADDING has no STREAMINFO
    no_si = b"fLaC" + bytes([0x81]) + (4).to_bytes(3, "big") + bytes(4)
    assert probe_flac(no_si)["status"] == "no_streaminfo"
    # zero sample rate in STREAMINFO is a per-row status
    si = bytearray(synth_flac(4))  # npad=0 → STREAMINFO is last
    si[4 + 4 + 10: 4 + 4 + 13] = bytes(3)  # clear the 20 sr bits (+4)
    assert probe_flac(bytes(si))["status"] == "bad_streaminfo"


def test_flac_streaminfo_bit_packing():
    """Synthetic field with every subfield at a distinct non-round
    value — catches bit-offset slips the mod-pattern synth can miss."""
    sr, ch, bps, total = 191_999, 5, 20, (1 << 35) + 12345
    field = ((sr << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total)
    si = ((4096).to_bytes(2, "big") * 2 + bytes(6)
          + field.to_bytes(8, "big") + bytes(16))
    blob = (b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si)
    m = probe_flac(blob)
    assert (m["sample_rate"], m["channels"], m["bits_per_sample"],
            m["n_samples"]) == (sr, ch, bps, total)
    assert m["duration_ms"] == total * 1000 // sr


def test_ogg_synth_probe_differential():
    from sequin_spark.datapipe.multimodal import probe_ogg, synth_ogg

    for d in range(30):
        m = probe_ogg(synth_ogg(d))
        opus = d % 2 == 0
        spf = 960 if opus else 1024
        total = spf * (10 + d % 50)
        grate = 48000 if opus else (44100, 48000, 32000)[d % 3]
        assert m["status"] == "probed"
        assert m["codec"] == ("opus" if opus else "vorbis")
        assert m["channels"] == (2 if d % 3 == 0 else 1)
        assert m["n_blocks"] == 2 + d % 5          # pages
        assert m["n_frames"] == 1 + (1 + d % 5) * (1 + d % 3)  # packets
        assert m["n_samples"] == total
        assert m["duration_ms"] == total * 1000 // grate


def test_ogg_crc_is_verified():
    """The probe recomputes every page's RFC 3533 CRC (non-reflected
    0x04C11DB7, init 0) — a single flipped body byte must be caught."""
    from sequin_spark.datapipe.multimodal import probe_ogg, synth_ogg

    blob = bytearray(synth_ogg(5))
    blob[-1] ^= 0x01  # last audio byte
    assert probe_ogg(bytes(blob))["status"] == "crc_mismatch"
    blob = bytearray(synth_ogg(5))
    blob[23] ^= 0x40  # the stored CRC itself
    assert probe_ogg(bytes(blob))["status"] == "crc_mismatch"


def test_ogg_honest_errors():
    from sequin_spark.datapipe.multimodal import probe_ogg, synth_ogg

    assert probe_ogg(b"RIFFxxxx")["status"] == "not_ogg"
    assert probe_ogg(synth_ogg(2)[:20])["status"] == "truncated"
    # first packet neither OpusHead nor \x01vorbis
    import struct

    from sequin_spark.datapipe.multimodal import _ogg_crc

    pkt = b"theora!!"
    seg = bytes([len(pkt)])
    hdr = (b"OggS" + struct.pack("<BBqIIIB", 0, 2, 0, 1, 0, 0, 1)
           + seg + pkt)
    crc = _ogg_crc(hdr)
    page = hdr[:22] + struct.pack("<I", crc) + hdr[26:]
    assert probe_ogg(page)["status"] == "unknown_codec"


def test_ogg_opus_preskip_subtracted():
    """RFC 7845 §5.2: granule includes pre-skip; duration must not."""
    from sequin_spark.datapipe.multimodal import probe_ogg, synth_ogg

    d = 0  # opus
    m = probe_ogg(synth_ogg(d))
    # synth writes final granule = 312 + n_samples; probe must report
    # n_samples without the pre-skip
    assert m["n_samples"] == 960 * 10
