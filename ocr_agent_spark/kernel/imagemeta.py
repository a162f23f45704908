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


class UnsupportedImageError(ImageFormatError):
    """Spec-VALID image outside this decoder's documented scope
    (e.g. a JPEG body, an RLE-compressed BMP) — callers may fall back
    to a weaker feature path; only genuinely malformed payloads should
    become failure rows."""


def sniff_image_format(data: bytes) -> str | None:
    """Container from magic bytes: png/jpeg/gif/bmp/tiff, None if unknown."""
    if data.startswith(PNG_MAGIC):
        return "png"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
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
        elif fmt == "tiff":
            from ocr_agent_spark.kernel.tiffimage import parse_tiff_dimensions

            w, h = parse_tiff_dimensions(data)
        elif fmt == "webp":
            w, h = _webp_dimensions(data)
        else:  # bmp
            w, h_signed = struct.unpack("<ii", data[18:26])
            h = abs(h_signed)
    except struct.error as exc:
        raise ImageFormatError(f"truncated {fmt} header") from exc
    if w <= 0 or h <= 0:
        raise ImageFormatError(f"non-positive {fmt} dimensions {w}x{h}")
    return fmt, int(w), int(h)


def _webp_dimensions(data: bytes) -> tuple[int, int]:
    """WEBP canvas dims from the first VP8X/VP8 /VP8L chunk.

    The reference's extension list includes .webp; header dims are real
    here, pixel decode (VP8 boolean-coder / VP8L) is not carried — the
    histogram path raises UnsupportedImageError so callers fall back to
    fake features with REAL dimensions, never a failure row.
    """
    chunk = data[12:16]
    body = data[20:]
    if chunk == b"VP8X":
        if len(body) < 10:
            raise ImageFormatError("truncated VP8X header")
        w = 1 + int.from_bytes(body[4:7], "little")
        h = 1 + int.from_bytes(body[7:10], "little")
    elif chunk == b"VP8 ":
        if len(body) < 10 or body[3:6] != b"\x9d\x01\x2a":
            raise ImageFormatError("VP8 frame without start code")
        w = int.from_bytes(body[6:8], "little") & 0x3FFF
        h = int.from_bytes(body[8:10], "little") & 0x3FFF
    elif chunk == b"VP8L":
        if len(body) < 5 or body[0] != 0x2F:
            raise ImageFormatError("VP8L without signature byte")
        bits = int.from_bytes(body[1:5], "little")
        w = 1 + (bits & 0x3FFF)
        h = 1 + ((bits >> 14) & 0x3FFF)
    else:
        raise ImageFormatError(f"unknown WEBP chunk {chunk!r}")
    return w, h


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


def build_png(width: int, height: int, seed: int = 0,
              filter_type: int = 0, color_type: int = 0) -> bytes:
    """A real, spec-valid PNG (8-bit) built with stdlib only.

    Deterministic pixels keyed on (width, height, seed) — the fixture
    generator for multimodal tests, same spirit as minipdf's built
    fixtures. ``filter_type`` (0-4) applies that PNG row filter when
    encoding, and ``color_type`` picks gray/rgb/gray+a/rgba (0/2/4/6) —
    the same (seed + i) byte ramp across all channels, so the decoder's
    filter inversion and luminance projection can be round-trip-tested
    against every encoding.
    """
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    rows = [
        bytes((seed + (y * width + x)) % 256 for x in range(width) for _ in range(ch))
        for y in range(height)
    ]
    raw = bytearray()
    prev = bytes(stride)
    for cur in rows:
        raw.append(filter_type)
        if filter_type == 0:
            raw += cur
        else:
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if filter_type == 1:
                    pred = a
                elif filter_type == 2:
                    pred = b
                elif filter_type == 3:
                    pred = (a + b) // 2
                else:  # 4, Paeth
                    pred = _paeth(a, b, c)
                raw.append((cur[x] - pred) & 0xFF)
        prev = cur
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
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


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, rgb, gray+a, rgba


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass.
_ADAM7_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytearray:
    """Invert the five PNG row filters over ``height`` rows of
    ``stride`` bytes each (input rows carry a leading filter byte)."""
    recon = bytearray(height * stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        row = raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)]
        base = y * stride
        prev_base = base - stride
        if f == 0:  # None
            recon[base:base + stride] = row
        elif f == 1:  # Sub
            for x in range(stride):
                a = recon[base + x - bpp] if x >= bpp else 0
                recon[base + x] = (row[x] + a) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                b = recon[prev_base + x] if y > 0 else 0
                recon[base + x] = (row[x] + b) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = recon[base + x - bpp] if x >= bpp else 0
                b = recon[prev_base + x] if y > 0 else 0
                recon[base + x] = (row[x] + (a + b) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = recon[base + x - bpp] if x >= bpp else 0
                b = recon[prev_base + x] if y > 0 else 0
                c = recon[prev_base + x - bpp] if (y > 0 and x >= bpp) else 0
                recon[base + x] = (row[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise ImageFormatError(f"unknown PNG filter {f} on row {y}")
    return recon


def decode_png_luminance(data: bytes) -> tuple[int, int, bytearray]:
    """REAL pixel decode for every legal PNG shape, stdlib only.

    Inflates the IDAT stream with zlib and inverts all five PNG row
    filters (None/Sub/Up/Average/Paeth), then projects to one luminance
    byte per pixel (BT.601 integer luma for color; first channel for
    gray). Returns (width, height, luminance_bytes).

    Full-scope PNG: every legal bit depth (1/2/4/8/16 — sub-byte
    planes unpack MSB-first and scale, 16-bit planes reduce to their
    high bytes), every color type (0/2/3/4/6; palette PNGs decode
    through their PLTE lookup), both progressive layouts
    (non-interlaced and Adam7). Illegal depth/type combinations and
    corrupt bodies raise ImageFormatError.
    The reference's payload decode is a GPU model runner
    (deepseek_ocr2_runner.py:122-177); PIL/ffmpeg-backed formats stay
    behind the backend interface in functions/multimodal.py.
    """
    import zlib

    if not data.startswith(PNG_MAGIC):
        raise ImageFormatError("not a PNG")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    plte: bytes | None = None
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ImageFormatError("truncated PNG chunk")
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif tag == b"PLTE":
            plte = bytes(body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length  # len + tag + crc
    if width is None or not idat:
        raise ImageFormatError("PNG missing IHDR or IDAT")
    if bit_depth not in (1, 2, 4, 8, 16) or (
        bit_depth == 16 and color_type == 3
    ) or (bit_depth < 8 and color_type not in (0, 3)):
        # depths 1/2/4 are only legal for gray and palette (PNG spec)
        raise ImageFormatError(
            f"invalid PNG bit depth {bit_depth} for color type {color_type}"
        )
    if color_type not in _PNG_CHANNELS and color_type != 3:
        raise UnsupportedImageError(f"unsupported PNG color type {color_type}")
    if interlace not in (0, 1):
        raise ImageFormatError(f"invalid PNG interlace method {interlace}")
    if width <= 0 or height <= 0:
        raise ImageFormatError(f"non-positive PNG dimensions {width}x{height}")
    if color_type == 3:
        if plte is None or len(plte) % 3 != 0 or not plte:
            raise ImageFormatError("palette PNG without a valid PLTE chunk")
        # pre-project the palette to luminance: index byte → luma byte
        pal_lum = bytes(
            (299 * plte[i] + 587 * plte[i + 1] + 114 * plte[i + 2]) // 1000
            for i in range(0, len(plte), 3)
        )
        ch = 1  # one index byte per pixel; filters run on index bytes
    else:
        pal_lum = None
        ch = _PNG_CHANNELS[color_type]
    # Filter offsets are in BYTES PER PIXEL rounded UP to one byte
    # (spec: "bpp"): 2x the channel count for 16-bit samples, 1 for
    # packed sub-byte depths. 16-bit planes reduce to their big-endian
    # high bytes after unfiltering; sub-byte planes unpack MSB-first
    # and scale to 8 bits. Row strides (full image AND each Adam7
    # pass) are in PACKED bits rounded up to a byte boundary.
    bpp = max(1, ch * (bit_depth // 8))
    stride = (width * ch * bit_depth + 7) // 8
    spp = 8 // bit_depth if bit_depth < 8 else 1   # samples per byte
    mask = (1 << bit_depth) - 1

    # Expected inflated size, computed BEFORE inflating: bounds the
    # decompression (zip-bomb guard — a tiny IDAT declaring a huge
    # image rejects instead of allocating gigabytes) and validates the
    # stream length exactly.
    if interlace == 0:
        passes = [(0, 0, 1, 1, width, height, stride)]
    else:
        passes = []
        for x0, y0, xs, ys in _ADAM7_PASSES:
            wp = (width - x0 + xs - 1) // xs if width > x0 else 0
            hp = (height - y0 + ys - 1) // ys if height > y0 else 0
            if wp and hp:
                passes.append(
                    (x0, y0, xs, ys, wp, hp, (wp * ch * bit_depth + 7) // 8)
                )
    expected = sum(hp * (pstride + 1) for *_, hp, pstride in passes)
    if expected > len(idat) * 1032 + 64:  # deflate max expansion ≈ 1032:1
        raise ImageFormatError(
            f"declared PNG size ({expected} B raw) exceeds what "
            f"{len(idat)} B of IDAT can inflate to"
        )
    try:
        raw = zlib.decompressobj().decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise ImageFormatError(f"bad IDAT stream: {exc}") from exc
    if len(raw) != expected:
        raise ImageFormatError(
            f"IDAT size {len(raw)}+ != expected {expected}"
        )

    if interlace == 0:
        packed = _unfilter(raw, height, stride, bpp)
        if bit_depth < 8:
            # unpack MSB-first packed samples row by row (rows are
            # padded to a byte boundary); palette indices unscaled.
            recon = bytearray(width * height)
            for y in range(height):
                row = packed[y * stride:(y + 1) * stride]
                for x in range(width):
                    shift = 8 - bit_depth * (x % spp + 1)
                    recon[y * width + x] = (row[x // spp] >> shift) & mask
        else:
            recon = packed
    else:
        # Adam7: seven sequential sub-images, each filtered like a
        # standalone image of its own (packed) width, scattered back
        # onto the full-resolution grid — sample-wise for sub-byte
        # depths, byte-group-wise otherwise.
        recon = bytearray(
            width * height if bit_depth < 8 else height * stride
        )
        off = 0
        for x0, y0, xs, ys, wp, hp, pstride in passes:
            need = hp * (pstride + 1)
            sub = raw[off:off + need]
            off += need
            prec = _unfilter(sub, hp, pstride, bpp)
            if bit_depth < 8:
                for j in range(hp):
                    dy = (y0 + j * ys) * width
                    prow = prec[j * pstride:(j + 1) * pstride]
                    for i in range(wp):
                        shift = 8 - bit_depth * (i % spp + 1)
                        recon[dy + x0 + i * xs] = (prow[i // spp] >> shift) & mask
            else:
                for j in range(hp):
                    dy = (y0 + j * ys) * stride
                    for i in range(wp):
                        src = j * pstride + i * bpp
                        dst = dy + (x0 + i * xs) * bpp
                        recon[dst:dst + bpp] = prec[src:src + bpp]

    if bit_depth == 16:
        recon = recon[0::2]  # big-endian high bytes ≈ 8-bit samples
    elif bit_depth < 8 and color_type == 0:
        scale = 255 // mask  # gray samples scale to 8-bit
        recon = bytearray(v * scale for v in recon)

    if color_type == 3:
        try:
            return width, height, bytearray(pal_lum[i] for i in recon)
        except IndexError:
            raise ImageFormatError(
                "palette index out of range for PLTE size"
            ) from None
    if ch == 1:
        return width, height, recon
    lum = bytearray(width * height)
    if color_type == 4:  # gray + alpha: first channel
        lum[:] = recon[0::2]
    else:  # rgb / rgba: BT.601 integer luma
        for i in range(width * height):
            r, g, b = recon[i * ch], recon[i * ch + 1], recon[i * ch + 2]
            lum[i] = (299 * r + 587 * g + 114 * b) // 1000
    return width, height, lum


def _luminance_histogram(width: int, height: int, lum: bytearray,
                         bins: int) -> list[float]:
    """Shared binning: sums to 1.0, bucket i covers
    [i*256/bins, (i+1)*256/bins)."""
    total = width * height
    if total == 0 or bins <= 0:
        raise ImageFormatError(
            f"cannot histogram {width}x{height} image into {bins} bins"
        )
    counts = [0] * bins
    for v in lum:
        counts[v * bins // 256] += 1
    return [c / total for c in counts]


def png_luminance_histogram(data: bytes, bins: int = 16) -> list[float]:
    """Normalized ``bins``-bucket luminance histogram of a PNG's pixels."""
    return _luminance_histogram(*decode_png_luminance(data), bins)


def decode_bmp_luminance(data: bytes) -> tuple[int, int, bytearray]:
    """REAL pixel decode for uncompressed BMPs, stdlib only.

    Supports BI_RGB in the common shapes — 8-bit palette, 24-bit BGR,
    32-bit BGRA, 1/4-bit palette (MSB-first packed) — plus
    BI_BITFIELDS 16/32-bit (channel masks read from the V4/V5 header or
    the post-BITMAPINFOHEADER mask block; each channel extracted by its
    mask and scaled to 8 bits). Rows are 4-byte aligned and stored
    bottom-up unless the header height is negative (top-down). RLE
    compression raises UnsupportedImageError; malformed payloads
    ImageFormatError.
    """
    if data[:2] != b"BM":
        raise ImageFormatError("not a BMP")
    try:
        pixel_off = struct.unpack("<I", data[10:14])[0]
        hdr_size = struct.unpack("<I", data[14:18])[0]
    except struct.error as exc:
        raise ImageFormatError("truncated BMP header") from exc
    # Gate the header variant BEFORE interpreting BITMAPINFOHEADER
    # field offsets: an OS/2 BITMAPCOREHEADER (hdr_size 12) stores
    # 16-bit dims at 18 and has no compression field at 30 — parsing
    # those offsets first reads garbage and can misclassify a
    # valid-but-unsupported file as malformed (failure row instead of
    # the documented fake-feature fallback).
    if hdr_size < 40:
        raise UnsupportedImageError(
            f"BMP header variant (size {hdr_size}) unsupported"
        )
    try:
        width, h_signed = struct.unpack("<ii", data[18:26])
        bit_count = struct.unpack("<H", data[28:30])[0]
        compression = struct.unpack("<I", data[30:34])[0]
    except struct.error as exc:
        raise ImageFormatError("truncated BMP header") from exc
    height = abs(h_signed)
    top_down = h_signed < 0
    if width <= 0 or height == 0:
        raise ImageFormatError(f"non-positive BMP dimensions {width}x{h_signed}")
    masks: tuple[int, int, int] | None = None
    if compression == 3:  # BI_BITFIELDS
        if bit_count not in (16, 32):
            raise ImageFormatError(
                f"BI_BITFIELDS with bit count {bit_count} is invalid"
            )
        mask_off = 54 if hdr_size >= 52 else 14 + hdr_size
        try:
            masks = struct.unpack("<III", data[mask_off:mask_off + 12])
        except struct.error as exc:
            raise ImageFormatError("truncated BMP bitfield masks") from exc
        if not all(masks):
            # a zeroed channel mask is unusual but PIL-decodable — out
            # of scope here, not malformed: fall back, don't fail rows
            raise UnsupportedImageError(
                f"BMP channel masks {tuple(hex(m) for m in masks)} "
                f"unsupported"
            )
    elif compression in (1, 2):  # RLE8 / RLE4 — handled after palette load
        if (compression == 1 and bit_count != 8) or (
            compression == 2 and bit_count != 4
        ):
            raise ImageFormatError(
                f"RLE{8 if compression == 1 else 4} with bit count "
                f"{bit_count} is invalid"
            )
    elif compression != 0:
        raise UnsupportedImageError(f"compressed BMP (method {compression})")
    if bit_count not in (1, 4, 8, 16, 24, 32):
        raise UnsupportedImageError(f"unsupported BMP bit count {bit_count}")
    if bit_count == 16 and masks is None:
        masks = (0x7C00, 0x03E0, 0x001F)  # BI_RGB 16-bit default: 5-5-5

    pal_lum: bytes | None = None
    if bit_count <= 8:
        if len(data) < 50:
            raise ImageFormatError("truncated BMP info header")
        n_colors = struct.unpack("<I", data[46:50])[0] or (1 << bit_count)
        pal = data[14 + hdr_size:14 + hdr_size + 4 * n_colors]
        if len(pal) < 4 * n_colors:
            raise ImageFormatError("truncated BMP palette")
        # BGRA quads
        pal_lum = bytes(
            (299 * pal[i + 2] + 587 * pal[i + 1] + 114 * pal[i]) // 1000
            for i in range(0, 4 * n_colors, 4)
        )

    if compression in (1, 2):
        # RLE decode straight to the luminance plane: runs of palette
        # indices, escapes 0=end-of-line 1=end-of-bitmap 2=delta(dx,dy),
        # absolute mode for literal spans (word-aligned). RLE BMPs are
        # bottom-up by spec.
        if top_down:
            raise ImageFormatError("top-down RLE BMP is invalid")
        # Allocation-bomb guard (mirror of the raw path's `need` check):
        # a 2-byte RLE pair paints at most 255 pixels, so the stream
        # bounds what the declared plane can plausibly be — a 1 KB file
        # declaring 40000x40000 rejects before the 1.6 GB bytearray.
        if width * height > max((len(data) - pixel_off), 0) * 130 + 4096:
            raise ImageFormatError(
                f"declared RLE BMP size {width}x{height} exceeds what "
                f"{len(data) - pixel_off} B of RLE data can paint"
            )
        lum = bytearray(width * height)

        def put(row: int, col: int, idx: int) -> None:
            if idx >= len(pal_lum):
                raise ImageFormatError("BMP palette index out of range")
            if col < width and row < height:
                lum[(height - 1 - row) * width + col] = pal_lum[idx]

        pos, x, y = pixel_off, 0, 0
        try:
            while True:
                count, val = data[pos], data[pos + 1]
                pos += 2
                if count > 0:  # encoded run
                    for i in range(count):
                        if compression == 1:
                            put(y, x, val)
                        else:
                            put(y, x, (val >> 4) if i % 2 == 0 else (val & 0xF))
                        x += 1
                elif val == 0:  # end of line
                    x, y = 0, y + 1
                elif val == 1:  # end of bitmap
                    break
                elif val == 2:  # delta
                    x += data[pos]
                    y += data[pos + 1]
                    pos += 2
                else:  # absolute mode: val literal indices
                    if compression == 1:
                        for i in range(val):
                            put(y, x, data[pos + i])
                            x += 1
                        pos += val + (val & 1)  # word-aligned
                    else:
                        for i in range(val):
                            b = data[pos + i // 2]
                            put(y, x, (b >> 4) if i % 2 == 0 else (b & 0xF))
                            x += 1
                        nbytes = (val + 1) // 2
                        pos += nbytes + (nbytes & 1)
        except IndexError:
            raise ImageFormatError("truncated BMP RLE stream") from None
        return width, height, lum

    row_bytes = (width * bit_count + 31) // 32 * 4
    need = pixel_off + row_bytes * height
    if len(data) < need:
        raise ImageFormatError(f"BMP pixel data truncated ({len(data)} < {need})")

    if masks is not None:
        # Per-channel extraction plans, unrolled: (mask, shift, max).
        (rm, rs, rx), (gm, gs, gx), (bm, bs, bx) = (
            (m, (m & -m).bit_length() - 1, m >> ((m & -m).bit_length() - 1))
            for m in masks
        )

    lum = bytearray(width * height)
    for j in range(height):
        src_row = j if top_down else height - 1 - j
        base = pixel_off + src_row * row_bytes
        out = j * width
        if masks is not None:  # 16/32-bit bitfields (incl. 5-5-5 BI_RGB)
            step = bit_count // 8
            for x in range(width):
                pix = int.from_bytes(
                    data[base + x * step:base + (x + 1) * step], "little"
                )
                r = ((pix & rm) >> rs) * 255 // rx
                g = ((pix & gm) >> gs) * 255 // gx
                b_ = ((pix & bm) >> bs) * 255 // bx
                lum[out + x] = (299 * r + 587 * g + 114 * b_) // 1000
        elif bit_count == 24 or bit_count == 32:
            step = bit_count // 8
            for x in range(width):
                b_, g, r = data[base + x * step:base + x * step + 3]
                lum[out + x] = (299 * r + 587 * g + 114 * b_) // 1000
        elif bit_count == 8:
            for x in range(width):
                idx = data[base + x]
                if idx >= len(pal_lum):
                    raise ImageFormatError("BMP palette index out of range")
                lum[out + x] = pal_lum[idx]
        else:  # 1 / 4 bit packed, MSB first
            spp = 8 // bit_count
            mask = (1 << bit_count) - 1
            for x in range(width):
                byte = data[base + x // spp]
                shift = 8 - bit_count * (x % spp + 1)
                idx = (byte >> shift) & mask
                if idx >= len(pal_lum):
                    raise ImageFormatError("BMP palette index out of range")
                lum[out + x] = pal_lum[idx]
    return width, height, lum


def image_luminance(data: bytes) -> tuple[int, int, bytes]:
    """Container-dispatched full pixel decode → (width, height, lum
    bytes) — the shared decode beneath the histogram and resize ops."""
    fmt = sniff_image_format(data)
    if fmt == "png":
        return decode_png_luminance(data)
    if fmt == "bmp":
        return decode_bmp_luminance(data)
    if fmt == "gif":
        return decode_gif_luminance(data)
    if fmt == "jpeg":
        from ocr_agent_spark.kernel.jpegdecode import decode_jpeg_luminance

        return decode_jpeg_luminance(data)
    if fmt == "tiff":
        import numpy as _np

        from ocr_agent_spark.kernel.tiffimage import decode_tiff_luminance

        w, h, lum = decode_tiff_luminance(data)
        return w, h, bytes(_np.clip(_np.rint(lum), 0, 255).astype(_np.uint8))
    raise UnsupportedImageError(f"no pixel decoder for {fmt}")


def resize_luminance(width: int, height: int, lum: bytes,
                     target_w: int, target_h: int) -> bytes:
    """Nearest-neighbor resample, PIL NEAREST semantics: source index
    floor((i + 0.5) * src / dst) — Pillow's affine path samples at
    destination pixel CENTERS, not corners; a plain floor(i*src/dst)
    mapping picks different pixels on any downscale (code-review r4e),
    which would silently change every feature vector if a real PIL
    backend were swapped in behind the same interface."""
    import numpy as _np

    if target_w <= 0 or target_h <= 0:
        raise ValueError(f"bad resize target {target_w}x{target_h}")
    arr = _np.frombuffer(lum, dtype=_np.uint8, count=width * height).reshape(
        height, width
    )
    yi = ((_np.arange(target_h) * 2 + 1) * height) // (2 * target_h)
    xi = ((_np.arange(target_w) * 2 + 1) * width) // (2 * target_w)
    return bytes(arr[_np.ix_(yi, xi)].reshape(-1))


def luminance_histogram(width: int, height: int, lum: bytes,
                        bins: int = 16) -> list[float]:
    """Public binning API over a decoded luminance buffer (the
    module-boundary form of the internal helper)."""
    return _luminance_histogram(width, height, lum, bins)


def image_luminance_histogram(data: bytes, bins: int = 16) -> list[float]:
    """Container-dispatched REAL luminance histogram (PNG, BMP, GIF, JPEG).

    The shared entry point for the multimodal ``headers`` backend:
    PNG → ``decode_png_luminance``, BMP → ``decode_bmp_luminance``,
    GIF → ``decode_gif_luminance`` (first frame), JPEG →
    ``jpegdecode.decode_jpeg_luminance`` (baseline sequential AND
    progressive DCT; arithmetic-coded variants raise
    UnsupportedImageError so callers fall back to fake features).
    """
    return _luminance_histogram(*image_luminance(data), bins)


def build_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """A complete, spec-valid 8-bit grayscale BMP (palette + pixels).

    Deterministic (seed + i) ramp, bottom-up rows, 4-byte row padding —
    the pixel-bearing fixture counterpart of ``build_bmp_header``
    (which remains header-only for header-parse tests)."""
    row_bytes = (width + 3) // 4 * 4
    pal = b"".join(bytes([v, v, v, 0]) for v in range(256))
    body = bytearray()
    for j in range(height - 1, -1, -1):
        row = bytes((seed + j * width + x) % 256 for x in range(width))
        body += row + b"\x00" * (row_bytes - width)
    off = 14 + 40 + len(pal)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8, 0,
                       len(body), 0, 0, 256, 0)
    return (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
            + info + pal + bytes(body))


def _gif_lzw_decode(data: bytes, min_code_size: int,
                    max_pixels: int) -> bytearray:
    """GIF-variant LZW: variable-width codes LSB-first, clear/end codes,
    dictionary growth to 12 bits. Stops at ``max_pixels`` outputs."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()

    def reset():
        return (
            {i: bytes([i]) for i in range(clear)},
            min_code_size + 1,
            end + 1,
        )

    table, width, next_code = reset()
    prev: bytes | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table, width, next_code = reset()
                prev = None
                continue
            if code == end:
                return out
            if code in table:
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ImageFormatError(f"bad LZW code {code}")
            out += entry
            if len(out) >= max_pixels:
                return out[:max_pixels]
            if prev is not None and next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                # Width-growth sync with real encoders (giflib/Pillow/
                # browsers): the ENCODER tests next_code >= 2^width
                # BEFORE its table add, the decoder tests AFTER its own
                # add — the decoder's one-entry lag cancels exactly, so
                # the post-add condition is next_code == 2^width.
                # Verified two ways: differential vs a giflib-ordered
                # compressor AND by decoding real-world GIFs (idlelib
                # icons) in tests/test_functions.py.
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    raise ImageFormatError("LZW stream ended without end code")


def decode_gif_luminance(data: bytes) -> tuple[int, int, bytearray]:
    """REAL pixel decode for the FIRST frame of a GIF (stdlib only).

    Full GIF87a/89a coverage: global/local color tables, pure-Python
    LZW, 4-pass row interlace. Returns the first frame's dimensions and
    its luminance plane (later animation frames are ignored — the
    feature path wants one representative image)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ImageFormatError("not a GIF")
    try:
        flags = data[10]
        pos = 13
        gct = None
        if flags & 0x80:
            n = 2 ** ((flags & 0x07) + 1)
            gct = data[pos:pos + 3 * n]
            if len(gct) < 3 * n:
                raise ImageFormatError("truncated GIF global color table")
            pos += 3 * n
        while pos < len(data):
            block = data[pos]
            if block == 0x21:  # extension: label + sub-blocks
                pos += 2
                while data[pos] != 0:
                    pos += 1 + data[pos]
                pos += 1
            elif block == 0x2C:  # image descriptor
                _, _, fw, fh, iflags = struct.unpack(
                    "<HHHHB", data[pos + 1:pos + 10])
                pos += 10
                ct = gct
                if iflags & 0x80:
                    n = 2 ** ((iflags & 0x07) + 1)
                    ct = data[pos:pos + 3 * n]
                    if len(ct) < 3 * n:
                        raise ImageFormatError("truncated GIF local color table")
                    pos += 3 * n
                if ct is None:
                    raise ImageFormatError("GIF frame without a color table")
                mcs = data[pos]
                pos += 1
                lzw = bytearray()
                while data[pos] != 0:
                    size = data[pos]
                    lzw += data[pos + 1:pos + 1 + size]
                    pos += 1 + size
                if fw <= 0 or fh <= 0:
                    raise ImageFormatError("non-positive GIF frame size")
                # Decompression-bomb guard: a 12-bit-capped GIF LZW
                # table caps entry length at 4096 px, and with deferred
                # clear codes a fully-built table sustains one 12-bit
                # code (≤4096 px) per 1.5 bytes ⇒ ceil(4096*8/12) =
                # 2731 px/byte; +4096 slack covers the first code of a
                # pathological stream. A descriptor declaring more
                # pixels than that rejects before any allocation —
                # anything under the bound decodes-or-truncates safely
                # because _gif_lzw_decode caps output at fw*fh.
                if fw * fh > len(lzw) * 2731 + 4096:
                    raise ImageFormatError(
                        f"declared GIF frame ({fw}x{fh}) exceeds what "
                        f"{len(lzw)} B of LZW data can decode to"
                    )
                idx = _gif_lzw_decode(bytes(lzw), mcs, fw * fh)
                if len(idx) < fw * fh:
                    raise ImageFormatError("GIF frame pixel data truncated")
                pal_lum = bytes(
                    (299 * ct[i] + 587 * ct[i + 1] + 114 * ct[i + 2]) // 1000
                    for i in range(0, len(ct), 3)
                )
                lum = bytearray(fw * fh)
                if iflags & 0x40:  # 4-pass interlace
                    src = 0
                    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                        for y in range(start, fh, step):
                            for x in range(fw):
                                i = idx[src * fw + x]
                                if i >= len(pal_lum):
                                    raise ImageFormatError(
                                        "GIF index out of color table")
                                lum[y * fw + x] = pal_lum[i]
                            src += 1
                else:
                    for p in range(fw * fh):
                        i = idx[p]
                        if i >= len(pal_lum):
                            raise ImageFormatError("GIF index out of color table")
                        lum[p] = pal_lum[i]
                return fw, fh, lum
            elif block == 0x3B:  # trailer
                break
            else:
                raise ImageFormatError(f"unknown GIF block 0x{block:02x}")
    except IndexError:
        raise ImageFormatError("truncated GIF stream") from None
    raise ImageFormatError("GIF without an image frame")


def build_gif(width: int, height: int, seed: int = 0,
              interlace: bool = False) -> bytes:
    """A complete, spec-valid single-frame grayscale GIF89a.

    Pixels are the deterministic (seed + i) ramp. The LZW stream uses
    the classic "uncompressed GIF" encoding: every pixel emitted as a
    literal 9-bit code with a clear code every 250 symbols so the code
    width never grows — trivially valid input for any decoder."""
    lsd_flags = 0x80 | 0x07  # GCT present, 256 entries
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, lsd_flags, 0, 0)
    for v in range(256):
        out += bytes([v, v, v])
    iflags = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, iflags)
    out += b"\x08"  # min code size 8 → 9-bit codes

    if interlace:
        order = [y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                 for y in range(start, height, step)]
    else:
        order = list(range(height))
    pixels = [
        (seed + y * width + x) % 256 for y in order for x in range(width)
    ]

    bitbuf = bits = 0
    codes = bytearray()

    def emit(code: int, width_bits: int = 9) -> None:
        nonlocal bitbuf, bits
        bitbuf |= code << bits
        bits += width_bits
        while bits >= 8:
            codes.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bits -= 8

    emit(256)  # initial clear
    for n, v in enumerate(pixels):
        if n and n % 250 == 0:
            emit(256)
        emit(v)
    emit(257)  # end
    if bits:
        codes.append(bitbuf & 0xFF)
    for i in range(0, len(codes), 255):
        chunk_ = codes[i:i + 255]
        out += bytes([len(chunk_)]) + chunk_
    out += b"\x00\x3b"
    return bytes(out)
