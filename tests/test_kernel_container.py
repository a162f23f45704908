"""Compressed-media container metadata (kernel/mediacontainer.py).

Round-trips through the in-repo writers across shapes, plus
independent byte-level constructions in this file (different box
order, largesize boxes, 8-byte EBML sizes, hand-computed MPEG frame
headers) so a same-author encoder/decoder bug pair cannot
mirror-hide — the same strategy as the WAV/AVI kernel tests.
"""

from __future__ import annotations

import struct

import pytest

from ocr_agent_spark.kernel.mediacontainer import (
    MediaContainerError,
    UnsupportedContainerError,
    build_mkv,
    build_mp3,
    build_mp4,
    parse_ebml,
    parse_media_container,
    parse_mp3,
    parse_mp4,
)


# ------------------------------------------------------------------ MP3

@pytest.mark.parametrize("sr", [44100, 48000, 32000])
@pytest.mark.parametrize("ch", [1, 2])
def test_mp3_roundtrip_shapes(sr, ch):
    m = parse_mp3(build_mp3(duration_ms=5000, sample_rate=sr, channels=ch,
                            bitrate=128_000))
    assert m["format"] == "mp3" and m["codec"] == "mpeg1-layer3"
    assert m["sample_rate"] == sr and m["channels"] == ch
    assert m["bitrate"] == 128_000
    # frame quantization: within one frame (~26 ms) of the request
    assert abs(m["duration_ms"] - 5000) < 1152 * 1000 / sr + 1


def test_mp3_xing_vs_cbr_duration():
    x = parse_mp3(build_mp3(duration_ms=8000, with_xing=True))
    c = parse_mp3(build_mp3(duration_ms=8000, with_xing=False))
    assert abs(x["duration_ms"] - c["duration_ms"]) < 60


def test_mp3_id3_skip_and_bare_stream():
    tagged = parse_mp3(build_mp3(with_id3=True))
    bare = parse_mp3(build_mp3(with_id3=False))
    assert tagged["duration_ms"] == bare["duration_ms"]


def test_mp3_hand_rolled_frame_header():
    # independent construction: MPEG-2, Layer III, 24 kHz, 64 kbit,
    # mono — header bytes computed from the spec tables by hand:
    # FF F3: sync + version 2 (10), layer III (01), no CRC (1)
    # 84: bitrate idx 8 (=64k in the V2 L3 table), rate idx 1 (24000)
    # C0: channel mode 11 (mono)
    frame_len = 576 // 8 * 64000 // 24000  # 192 bytes
    data = bytes([0xFF, 0xF3, 0x84, 0xC0]) + b"\x00" * (frame_len - 4)
    m = parse_mp3(data * 20)
    assert m["codec"] == "mpeg2-layer3"
    assert m["sample_rate"] == 24000 and m["channels"] == 1
    assert m["bitrate"] == 64000
    # 20 frames × 576 samples @ 24 kHz = 480 ms
    assert m["duration_ms"] == 480


def test_mp3_corrupt_id3_raises():
    with pytest.raises(MediaContainerError):
        parse_mp3(b"ID3\x04\x00\x00\x00\x00\x01\x00" + b"\xde\xad" * 600)


# ------------------------------------------------------------------ MP4

def test_mp4_roundtrip():
    m = parse_mp4(build_mp4(duration_ms=12345, width=1280, height=720,
                            audio=(48000, 2)))
    assert m["format"] == "mp4"
    assert m["duration_ms"] == 12345
    assert (m["width"], m["height"]) == (1280, 720)
    assert m["sample_rate"] == 48000 and m["channels"] == 2
    assert "avc1" in m["codec"] and "mp4a" in m["codec"]


def test_mp4_video_only_and_codec_fourcc():
    m = parse_mp4(build_mp4(video_codec=b"hvc1", audio=None))
    assert m["codec"] == "hvc1"
    assert m["sample_rate"] is None and m["channels"] is None


def test_mp4_hand_rolled_with_largesize_and_reordered_boxes():
    """Independent construction: mdat-first layout, 64-bit largesize
    box, version-1 mvhd — none produced by build_mp4."""
    def box(t, p):
        return (8 + len(p)).to_bytes(4, "big") + t + p

    ftyp = box(b"ftyp", b"mp42" + bytes(4) + b"mp42isom")
    # largesize mdat (size==1 → 8-byte size follows the type)
    payload = b"\x00" * 32
    mdat = (1).to_bytes(4, "big") + b"mdat" + (16 + len(payload)).to_bytes(
        8, "big") + payload
    # version-1 mvhd: 8-byte times/duration, timescale 90000
    mvhd = box(b"mvhd", b"\x01\x00\x00\x00"
               + (0).to_bytes(8, "big") * 2
               + (90000).to_bytes(4, "big")
               + (90000 * 7).to_bytes(8, "big") + bytes(80))
    moov = box(b"moov", mvhd)
    m = parse_mp4(ftyp + mdat + moov)
    assert m["duration_ms"] == 7000


def test_mp4_truncated_box_raises():
    good = build_mp4()
    with pytest.raises(MediaContainerError):
        parse_mp4(good[:40])


# ----------------------------------------------------------- EBML / MKV

@pytest.mark.parametrize("doctype,fmt", [("webm", "webm"),
                                         ("matroska", "mkv")])
def test_mkv_roundtrip(doctype, fmt):
    m = parse_ebml(build_mkv(duration_ms=6500, width=1920, height=1080,
                             video_codec="V_AV1",
                             audio=(48000, 6, "A_VORBIS"),
                             doctype=doctype))
    assert m["format"] == fmt
    assert m["duration_ms"] == 6500
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["sample_rate"] == 48000 and m["channels"] == 6
    assert m["codec"] == "V_AV1,A_VORBIS"


def test_ebml_hand_rolled_wide_sizes():
    """Independent construction: 8-byte EBML size fields and a 4-byte
    float duration — build_mkv emits minimal-width sizes and doubles."""
    def elem(eid, payload, width=8):
        eb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
        size = len(payload) | (1 << (7 * width))
        return eb + size.to_bytes(width, "big") + payload

    header = elem(0x1A45DFA3, elem(0x4282, b"matroska", 2), 3)
    info = elem(0x1549A966,
                elem(0x2AD7B1, (1_000_000).to_bytes(3, "big"), 2)
                + elem(0x4489, struct.pack(">f", 2500.0), 2), 8)
    seg = elem(0x18538067, info, 8)
    m = parse_ebml(header + seg)
    assert m["format"] == "mkv" and m["duration_ms"] == 2500


def test_sniffer_dispatch_and_unknown():
    assert parse_media_container(build_mp3())["format"] == "mp3"
    assert parse_media_container(build_mp4())["format"] == "mp4"
    assert parse_media_container(build_mkv())["format"] == "webm"
    # OggS is now a RECOGNIZED container (r7), so a broken Ogg stream
    # is a structural error, not an unsupported one
    with pytest.raises(MediaContainerError):
        parse_media_container(b"OggS\x00 this is not supported")
    with pytest.raises(UnsupportedContainerError):
        parse_media_container(b"\x89FOO unrecognized payload bytes")


# -- Ogg ---------------------------------------------------------------------


from ocr_agent_spark.kernel.mediacontainer import (  # noqa: E402
    build_flac,
    build_ogg,
    parse_flac,
    parse_ogg,
)


@pytest.mark.parametrize("sr,ch", [(44100, 2), (48000, 1)])
def test_ogg_vorbis_roundtrip(sr, ch):
    m = parse_ogg(build_ogg(duration_ms=2500, sample_rate=sr, channels=ch,
                            codec="vorbis", bitrate=96_000))
    assert m["format"] == "ogg" and m["codec"] == "vorbis"
    assert m["sample_rate"] == sr and m["channels"] == ch
    assert m["bitrate"] == 96_000
    assert abs(m["duration_ms"] - 2500) <= 1


def test_ogg_opus_roundtrip_subtracts_preskip():
    m = parse_ogg(build_ogg(duration_ms=4000, sample_rate=48000,
                            channels=2, codec="opus"))
    assert m["codec"] == "opus" and m["sample_rate"] == 48000
    # granule runs at 48 kHz and the 312-sample pre-skip is excluded
    assert abs(m["duration_ms"] - 4000) <= 1


def test_ogg_hand_rolled_page_independent_of_builder():
    # bytes laid out by hand from RFC 3533 — NOT via build_ogg, so a
    # mirrored encoder/decoder bug pair cannot hide
    ident = (b"\x01vorbis" + (0).to_bytes(4, "little") + bytes([2])
             + (22050).to_bytes(4, "little")
             + (0).to_bytes(4, "little") + (64000).to_bytes(4, "little")
             + (0).to_bytes(4, "little") + bytes([0xB8]) + b"\x01")
    page0 = (b"OggS\x00\x02" + (-1).to_bytes(8, "little", signed=True)
             + (7).to_bytes(4, "little") + (0).to_bytes(4, "little")
             + b"\x00\x00\x00\x00" + bytes([1, len(ident)]) + ident)
    page1 = (b"OggS\x00\x04" + (22050).to_bytes(8, "little", signed=True)
             + (7).to_bytes(4, "little") + (1).to_bytes(4, "little")
             + b"\x00\x00\x00\x00" + bytes([1, 10]) + b"\x00" * 10)
    m = parse_ogg(page0 + page1)
    assert m == {"format": "ogg", "codec": "vorbis", "duration_ms": 1000,
                 "sample_rate": 22050, "channels": 2, "bitrate": 64000,
                 "width": None, "height": None}


def test_ogg_page_crc_matches_reference_algorithm():
    # independent bit-by-bit CRC implementation (poly 0x04C11DB7,
    # init 0, no reflection) over the builder's first page
    data = build_ogg(duration_ms=1000, codec="vorbis")
    nseg = data[26]
    page_end = 27 + nseg + sum(data[27:27 + nseg])
    page = bytearray(data[:page_end])
    stored = int.from_bytes(page[22:26], "little")
    page[22:26] = b"\x00\x00\x00\x00"
    reg = 0
    for byte in page:
        for bit in range(7, -1, -1):
            msb = (reg >> 31) & 1
            reg = ((reg << 1) & 0xFFFFFFFF) | ((byte >> bit) & 1)
            if msb:
                reg ^= 0x04C11DB7
    # flush 32 zero bits (standard non-augmented form equivalence)
    for _ in range(32):
        msb = (reg >> 31) & 1
        reg = (reg << 1) & 0xFFFFFFFF
        if msb:
            reg ^= 0x04C11DB7
    assert stored == reg


def test_ogg_corrupt_and_unsupported():
    good = build_ogg()
    with pytest.raises(MediaContainerError):
        parse_ogg(good[:40])  # truncated mid-page
    with pytest.raises(MediaContainerError):
        parse_ogg(b"OggS\x01" + good[5:])  # bad stream version
    # recognizable Ogg framing but an unknown codec ident header
    unknown = (b"OggS\x00\x02" + (0).to_bytes(8, "little")
               + (9).to_bytes(4, "little") + (0).to_bytes(4, "little")
               + b"\x00" * 4 + bytes([1, 8]) + b"XCodec\x00\x00")
    with pytest.raises(UnsupportedContainerError):
        parse_ogg(unknown)


# -- FLAC --------------------------------------------------------------------


@pytest.mark.parametrize("sr,ch,bits", [(44100, 2, 16), (96000, 1, 24)])
def test_flac_roundtrip(sr, ch, bits):
    m = parse_flac(build_flac(duration_ms=1750, sample_rate=sr,
                              channels=ch, bits_per_sample=bits))
    assert m["format"] == "flac" and m["codec"] == "flac"
    assert m["sample_rate"] == sr and m["channels"] == ch
    assert abs(m["duration_ms"] - 1750) <= 1


def test_flac_hand_rolled_streaminfo():
    # STREAMINFO packed by hand: 32000 Hz, 1 channel, 8-bit, 64000
    # samples → exactly 2000 ms
    packed = (32000 << 44) | (0 << 41) | (7 << 36) | 64000
    body = (b"\x10\x00\x10\x00" + b"\x00" * 6
            + packed.to_bytes(8, "big") + b"\x00" * 16)
    data = b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body
    m = parse_flac(data)
    assert m["sample_rate"] == 32000 and m["channels"] == 1
    assert m["duration_ms"] == 2000


def test_flac_corrupt_raises():
    good = build_flac()
    with pytest.raises(MediaContainerError):
        parse_flac(good[:10])  # truncated STREAMINFO
    # metadata blocks but no STREAMINFO at all
    data = b"fLaC" + bytes([0x80 | 0x01]) + (4).to_bytes(3, "big") + b"\x00" * 4
    with pytest.raises(MediaContainerError):
        parse_flac(data)


def test_sniffer_dispatch_ogg_flac():
    assert parse_media_container(build_ogg())["format"] == "ogg"
    assert parse_media_container(build_flac())["format"] == "flac"
