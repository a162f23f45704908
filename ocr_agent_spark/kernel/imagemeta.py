"""Stdlib-only image metadata decoding (no PIL in this environment).

The real half of the multimodal decode stage: container sniffing and
width/height extraction for PNG / JPEG / GIF / BMP directly from the
header bytes. Pixel decoding (the reference's model-runner payload,
deepseek_ocr2_runner.py:122-177) still needs an image library and stays
behind the backend interface in functions/multimodal.py — but
dimensions, format, and the reject-malformed-payload contract are real.

Pure functions over ``bytes`` — unit-testable without Spark, used
inside Arrow-batched ``mapInPandas`` like the other kernels.
"""

from __future__ import annotations

import struct

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# JPEG start-of-frame markers that carry dimensions (all SOF variants
# except DHT/DAC/RST which share the 0xC0 block).
_JPEG_SOF_MARKERS = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


class ImageFormatError(ValueError):
    """Payload is not a parseable image of a supported container."""


def sniff_image_format(data: bytes) -> str | None:
    """Container from magic bytes: png/jpeg/gif/bmp, None if unknown."""
    if data.startswith(PNG_MAGIC):
        return "png"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:2] == b"BM":
        return "bmp"
    return None


def parse_image_dimensions(data: bytes) -> tuple[str, int, int]:
    """(format, width, height) from header bytes; raises ImageFormatError.

    PNG: IHDR must be the first chunk (spec) → width/height at fixed
    offsets 16/20, big-endian. JPEG: walk the marker segments to the
    first SOF. GIF: logical screen descriptor, little-endian. BMP:
    BITMAPINFOHEADER, little-endian (height may be negative = top-down).
    """
    fmt = sniff_image_format(data)
    if fmt is None:
        raise ImageFormatError("unknown image container (bad magic)")
    try:
        if fmt == "png":
            if data[12:16] != b"IHDR":
                raise ImageFormatError("PNG without leading IHDR chunk")
            w, h = struct.unpack(">II", data[16:24])
        elif fmt == "jpeg":
            w, h = _jpeg_dimensions(data)
        elif fmt == "gif":
            w, h = struct.unpack("<HH", data[6:10])
        else:  # bmp
            w, h_signed = struct.unpack("<ii", data[18:26])
            h = abs(h_signed)
    except struct.error as exc:
        raise ImageFormatError(f"truncated {fmt} header") from exc
    if w <= 0 or h <= 0:
        raise ImageFormatError(f"non-positive {fmt} dimensions {w}x{h}")
    return fmt, int(w), int(h)


def _jpeg_dimensions(data: bytes) -> tuple[int, int]:
    """Walk JPEG segments to the first start-of-frame marker."""
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            raise ImageFormatError("JPEG marker desync")
        marker = data[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2  # standalone markers carry no length
            continue
        if marker == 0xD9:  # EOI before any SOF
            break
        seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
        if marker in _JPEG_SOF_MARKERS:
            if i + 9 > n:
                raise ImageFormatError("truncated JPEG SOF")
            h, w = struct.unpack(">HH", data[i + 5:i + 9])
            return w, h
        i += 2 + seg_len
    raise ImageFormatError("JPEG without SOF marker")


def build_png(width: int, height: int, seed: int = 0) -> bytes:
    """A real, spec-valid PNG (8-bit grayscale) built with stdlib only.

    Deterministic pixels keyed on (width, height, seed) — the fixture
    generator for multimodal tests, same spirit as minipdf's built
    fixtures.
    """
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((seed + x + y * width) % 256 for x in range(width))
        for y in range(height)
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def build_jpeg_header(width: int, height: int) -> bytes:
    """A minimal JPEG byte stream with a valid SOF0 (header-parse only)."""
    sof = struct.pack(">HBHHB", 8 + 3, 8, height, width, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + b"\xff\xc0" + sof + b"\xff\xd9"


def build_gif_header(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00\x3b"


def build_bmp_header(width: int, height: int) -> bytes:
    info = struct.pack("<IiiHH", 40, width, height, 1, 8) + b"\x00" * 24
    return b"BM" + struct.pack("<IHHI", 54 + len(info), 0, 0, 54) + info
