"""Real TIFF decode (baseline TIFF 6.0) — stdlib struct + numpy.

The reference's supported input list includes ``.tif/.tiff``
(src/ocr_agent/input_discovery.py extension sets); this kernel gives
that format the same REAL treatment as PNG/BMP/GIF/JPEG: container
parse + full pixel decode feeding the shared luminance histogram.

Decoded shapes (baseline TIFF, chunky planar, strip-organized):

- byte orders ``II`` (little) and ``MM`` (big)
- bilevel 1-bit (photometric 0/1), grayscale 8/16-bit, RGB(A) 8-bit
  (extra samples ignored for luminance), palette-color 8-bit
- compression 1 (none), 32773 (PackBits), 5 (LZW — MSB-first packing
  with the spec's early code-width change; horizontal-differencing
  predictor 2 supported)

Anything else (tiles, planar=2, JPEG-in-TIFF, CCITT fax, 32-bit float
samples) raises ``UnsupportedImageError`` → multimodal falls back to
fake features; a structurally corrupt file raises ``ImageFormatError``
→ failure row. Same contract as every other image class.
"""

from __future__ import annotations

import struct

import numpy as np

from ocr_agent_spark.kernel.imagemeta import (
    ImageFormatError,
    UnsupportedImageError,
)

_MAX_DIM = 1 << 15

# tag ids (TIFF 6.0 baseline)
_T_WIDTH = 256
_T_LENGTH = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317
_T_COLORMAP = 320
_T_TILE_WIDTH = 322

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def is_tiff_payload(data: bytes) -> bool:
    return data[:4] in (b"II*\x00", b"MM\x00*")


def _read_ifd(data: bytes) -> tuple[str, dict[int, list[int]]]:
    """First IFD → (byte-order char, {tag: values}). Values resolved
    whether inline or offset-stored; SHORT/LONG/BYTE only (RATIONAL and
    ASCII tags are skipped — nothing we decode needs them)."""
    if not is_tiff_payload(data):
        raise ImageFormatError("not a TIFF container (bad magic)")
    bo = "<" if data[:2] == b"II" else ">"
    try:
        (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
        (n,) = struct.unpack_from(bo + "H", data, ifd_off)
    except struct.error as exc:
        raise ImageFormatError("truncated TIFF header") from exc
    tags: dict[int, list[int]] = {}
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        try:
            tag, typ, cnt = struct.unpack_from(bo + "HHI", data, base)
        except struct.error as exc:
            raise ImageFormatError("truncated TIFF IFD") from exc
        size = _TYPE_SIZES.get(typ)
        if size is None or typ in (2, 5, 10):
            continue
        if cnt == 0:
            # a zero-count tag would store an empty value list, turning
            # the [0] accesses downstream into bare IndexError instead
            # of this module's typed ImageFormatError (ADVICE r4)
            continue
        total = size * cnt
        if total <= 4:
            src = base + 8
        else:
            (src,) = struct.unpack_from(bo + "I", data, base + 8)
        if src + total > len(data):
            raise ImageFormatError(f"TIFF tag {tag} data overruns file")
        fmt = {1: "B", 3: "H", 4: "I", 6: "b", 7: "B", 8: "h", 9: "i"}[typ]
        tags[tag] = list(struct.unpack_from(f"{bo}{cnt}{fmt}", data, src))
    return bo, tags


def parse_tiff_dimensions(data: bytes) -> tuple[int, int]:
    _, tags = _read_ifd(data)
    if _T_WIDTH not in tags or _T_LENGTH not in tags:
        raise ImageFormatError("TIFF without ImageWidth/ImageLength")
    w, h = tags[_T_WIDTH][0], tags[_T_LENGTH][0]
    if not (0 < w <= _MAX_DIM and 0 < h <= _MAX_DIM):
        raise ImageFormatError(f"implausible TIFF dimensions {w}x{h}")
    return w, h


def _packbits_decode(src: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(src)
    while i < n and len(out) < expected:
        b = src[i]
        i += 1
        if b < 128:  # literal run of b+1 bytes
            out += src[i:i + b + 1]
            i += b + 1
        elif b > 128:  # repeat next byte 257-b times
            if i < n:
                out += bytes([src[i]]) * (257 - b)
                i += 1
        # 128 = no-op
    return bytes(out)


def _tiff_lzw_decode(src: bytes, expected: int) -> bytes:
    """TIFF LZW: MSB-first bit packing, 9→12-bit codes, EARLY change
    (width grows when the next free slot is (1<<width)-1 — one code
    earlier than GIF's LSB-first variant)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitbuf = bitcnt = 0
    pos, n = 0, len(src)
    width = 9
    table: list[bytes] = []
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while len(out) < expected:
        while bitcnt < width:
            if pos >= n:
                return bytes(out)  # truncated stream: keep what decoded
            bitbuf = (bitbuf << 8) | src[pos]
            pos += 1
            bitcnt += 8
        code = (bitbuf >> (bitcnt - width)) & ((1 << width) - 1)
        bitcnt -= width
        if code == EOI:
            break
        if code == CLEAR:
            reset()
            continue
        if prev is None:
            if code >= len(table):
                raise ImageFormatError("TIFF LZW first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ImageFormatError("TIFF LZW code out of range")
        out += entry
        prev = entry
        # EARLY CHANGE: the decoder's table lags the encoder's by one
        # entry (it learns each string one code later), so it must
        # widen one code EARLIER than the naive table-size rule —
        # when the table is two short of the width's ceiling. This is
        # precisely the "early change" TIFF 6.0 specifies (and the GIF
        # LSB variant does not).
        if len(table) + 2 >= (1 << width) and width < 12:
            width += 1
    return bytes(out)


def _tiff_lzw_encode(raw: bytes) -> bytes:
    """Matching encoder (fixtures) — same early-change discipline."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitbuf = bitcnt = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    run = b""
    for byte in raw:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code + 1 >= (1 << width):
            if width < 12:
                width += 1
            else:
                emit(CLEAR, width)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
        run = bytes([byte])
    if run:
        emit(table[run], width)
    emit(EOI, width)
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def decode_tiff_luminance(data: bytes) -> tuple[int, int, np.ndarray]:
    """(width, height, float64 luminance array len w*h)."""
    bo, tags = _read_ifd(data)
    w, h = parse_tiff_dimensions(data)
    if _T_TILE_WIDTH in tags:
        raise UnsupportedImageError("tiled TIFF not decoded (strips only)")
    comp = tags.get(_T_COMPRESSION, [1])[0]
    photo = tags.get(_T_PHOTOMETRIC, [1])[0]
    spp = tags.get(_T_SAMPLES, [1])[0]
    bits_list = tags.get(_T_BITS, [1])
    planar = tags.get(_T_PLANAR, [1])[0]
    predictor = tags.get(_T_PREDICTOR, [1])[0]
    if planar != 1:
        raise UnsupportedImageError("planar TIFF (PlanarConfiguration=2)")
    if comp not in (1, 5, 32773):
        raise UnsupportedImageError(f"TIFF compression {comp} needs a codec")
    if photo not in (0, 1, 2, 3):
        raise UnsupportedImageError(f"TIFF photometric {photo} not decoded")
    bits = bits_list[0]
    if any(b != bits for b in bits_list[:spp]):
        raise UnsupportedImageError("mixed per-sample bit depths")
    if bits not in (1, 8, 16) or (bits == 16 and spp != 1) or (bits == 1 and spp != 1):
        raise UnsupportedImageError(f"TIFF {bits}-bit x{spp} not decoded")
    if predictor not in (1, 2):
        raise UnsupportedImageError(f"TIFF predictor {predictor}")
    if predictor == 2 and bits != 8:
        # horizontal differencing is only undone for 8-bit samples here;
        # silently skipping it would yield wrong pixels marked 'real'
        raise UnsupportedImageError(
            f"TIFF predictor 2 with {bits}-bit samples not decoded"
        )

    offsets = tags.get(_T_STRIP_OFFSETS)
    counts = tags.get(_T_STRIP_COUNTS)
    if not offsets:
        raise ImageFormatError("TIFF without strip offsets")
    if not counts or len(counts) != len(offsets):
        # tolerate a missing/odd StripByteCounts for the single-strip
        # uncompressed case (some ancient writers) — read to EOF
        if len(offsets) == 1 and comp == 1:
            counts = [len(data) - offsets[0]]
        else:
            raise ImageFormatError("TIFF strip byte counts missing/mismatched")
    rows_per_strip = tags.get(_T_ROWS_PER_STRIP, [h])[0] or h

    if bits == 1:
        row_bytes = (w + 7) // 8
    else:
        row_bytes = w * spp * (bits // 8)

    rows = []
    for s, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise ImageFormatError(f"TIFF strip {s} overruns file")
        raw = data[off:off + cnt]
        n_rows = min(rows_per_strip, h - s * rows_per_strip)
        expected = row_bytes * n_rows
        if comp == 5:
            raw = _tiff_lzw_decode(raw, expected)
        elif comp == 32773:
            raw = _packbits_decode(raw, expected)
        if len(raw) < expected:
            raise ImageFormatError(
                f"TIFF strip {s}: {len(raw)} bytes < {expected} expected"
            )
        strip = np.frombuffer(raw, dtype=np.uint8, count=expected).reshape(
            n_rows, row_bytes
        ).copy()
        if predictor == 2 and bits == 8:
            # horizontal differencing: each sample is stored as a delta
            # from the previous pixel's same sample → per-row cumsum
            strip = (
                np.cumsum(
                    strip.reshape(n_rows, w, spp).astype(np.int64), axis=1
                ) % 256
            ).astype(np.uint8).reshape(n_rows, row_bytes)
        rows.append(strip)
    px = np.concatenate(rows, axis=0)
    if px.shape[0] != h:
        raise ImageFormatError(f"TIFF strips give {px.shape[0]} rows, want {h}")

    if bits == 1:
        unpacked = np.unpackbits(px, axis=1)[:, :w]
        lum = unpacked.astype(np.float64) * 255.0
        if photo == 0:  # WhiteIsZero: 0 bit = white
            lum = 255.0 - lum
        return w, h, lum.reshape(-1)
    if bits == 16:
        dt = "<u2" if bo == "<" else ">u2"
        vals = np.frombuffer(px.tobytes(), dtype=dt).astype(np.float64) / 257.0
        if photo == 0:
            vals = 255.0 - vals
        return w, h, vals
    samples = px.reshape(h, w, spp) if spp > 1 else px.reshape(h, w, 1)
    if photo == 2:  # RGB(A) — Rec.601, extra samples ignored
        if spp < 3:
            raise ImageFormatError("RGB TIFF with <3 samples per pixel")
        r = samples[:, :, 0].astype(np.float64)
        g = samples[:, :, 1].astype(np.float64)
        b = samples[:, :, 2].astype(np.float64)
        lum = 0.299 * r + 0.587 * g + 0.114 * b
    elif photo == 3:  # palette
        cmap = tags.get(_T_COLORMAP)
        if not cmap or len(cmap) < 3 * (1 << bits):
            raise ImageFormatError("palette TIFF without full ColorMap")
        n_col = 1 << bits
        cm = np.array(cmap[: 3 * n_col], dtype=np.float64).reshape(3, n_col) / 257.0
        idx = samples[:, :, 0]
        lum = (0.299 * cm[0] + 0.587 * cm[1] + 0.114 * cm[2])[idx]
    else:  # grayscale
        lum = samples[:, :, 0].astype(np.float64)
        if photo == 0:
            lum = 255.0 - lum
    return w, h, lum.reshape(-1)


# --------------------------------------------------------------------------
# Deterministic fixture builder


def build_tiff(width: int = 32, height: int = 24, seed: int = 0,
               compression: str = "none", photometric: str = "rgb",
               byte_order: str = "II", rows_per_strip: int = 8) -> bytes:
    """A spec-valid baseline TIFF: gradient pixels, multiple strips."""
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    bo = "<" if byte_order == "II" else ">"
    yy, xx = np.mgrid[0:height, 0:width]
    base = ((xx * 7 + yy * 3 + int(rng.randint(0, 256))) % 256).astype(np.uint8)

    if photometric == "rgb":
        photo, spp, bits = 2, 3, [8, 8, 8]
        px = np.stack([base, (base * 2) % 256, (255 - base)], axis=2).astype(np.uint8)
        row_bytes = width * 3
        raw_rows = px.reshape(height, row_bytes)
    elif photometric == "gray":
        photo, spp, bits = 1, 1, [8]
        raw_rows = base
        row_bytes = width
    elif photometric == "gray16":
        photo, spp, bits = 1, 1, [16]
        v16 = (base.astype(np.uint16) * 257)
        raw_rows = np.frombuffer(
            v16.astype(bo + "u2").tobytes(), dtype=np.uint8
        ).reshape(height, width * 2)
        row_bytes = width * 2
    elif photometric == "bilevel":
        photo, spp, bits = 1, 1, [1]
        raw_rows = np.packbits(base > 127, axis=1)
        row_bytes = raw_rows.shape[1]
    else:
        raise ValueError(f"unknown fixture photometric {photometric}")

    comp_id = {"none": 1, "packbits": 32773, "lzw": 5}[compression]
    strips, offs, cnts = [], [], []
    for y0 in range(0, height, rows_per_strip):
        chunk = raw_rows[y0:y0 + rows_per_strip].tobytes()
        if compression == "lzw":
            chunk = _tiff_lzw_encode(chunk)
        elif compression == "packbits":
            # simplest spec-valid PackBits: literal runs of <=128 bytes
            pb = bytearray()
            for i in range(0, len(chunk), 128):
                seg = chunk[i:i + 128]
                pb.append(len(seg) - 1)
                pb += seg
            chunk = bytes(pb)
        strips.append(chunk)

    header = 8
    # layout: header | IFD | tag-overflow values | strip data
    n_tags_entries = []

    def entry(tag: int, typ: int, values: list[int]) -> tuple[int, int, list[int]]:
        return (tag, typ, values)

    tag_values = [
        entry(_T_WIDTH, 3, [width]),
        entry(_T_LENGTH, 3, [height]),
        entry(_T_BITS, 3, bits),
        entry(_T_COMPRESSION, 3, [comp_id]),
        entry(_T_PHOTOMETRIC, 3, [photo]),
        entry(_T_SAMPLES, 3, [spp]),
        entry(_T_ROWS_PER_STRIP, 3, [rows_per_strip]),
    ]
    n_tags = len(tag_values) + 2  # + offsets + counts
    ifd_size = 2 + 12 * n_tags + 4
    overflow_at = header + ifd_size
    overflow = bytearray()

    def encode_values(typ: int, values: list[int]) -> bytes:
        fmt = {3: "H", 4: "I"}[typ]
        return struct.pack(f"{bo}{len(values)}{fmt}", *values)

    # place strip data after overflow area (two passes: sizes first)
    for tag, typ, values in tag_values:
        if len(encode_values(typ, values)) > 4:
            overflow += encode_values(typ, values)
    # strip offset/count arrays may overflow too
    n_strips = len(strips)
    arr_bytes = 4 * n_strips
    if n_strips > 1:
        overflow_len = len(overflow) + 2 * arr_bytes
    else:
        overflow_len = len(overflow)
    data_at = overflow_at + overflow_len
    cur = data_at
    for sdata in strips:
        offs.append(cur)
        cnts.append(len(sdata))
        cur += len(sdata)

    full_tags = tag_values + [
        entry(_T_STRIP_OFFSETS, 4, offs),
        entry(_T_STRIP_COUNTS, 4, cnts),
    ]
    full_tags.sort(key=lambda t: t[0])

    overflow = bytearray()
    ifd = bytearray(struct.pack(bo + "H", n_tags))
    for tag, typ, values in full_tags:
        enc = encode_values(typ, values)
        if len(enc) <= 4:
            ifd += struct.pack(bo + "HHI", tag, typ, len(values)) + enc.ljust(4, b"\x00")
        else:
            ifd += struct.pack(
                bo + "HHII", tag, typ, len(values), overflow_at + len(overflow)
            )
            overflow += enc
    ifd += struct.pack(bo + "I", 0)  # no next IFD
    assert len(ifd) == ifd_size
    assert overflow_at + len(overflow) <= data_at

    out = bytearray()
    out += (b"II*\x00" if bo == "<" else b"MM\x00*") + struct.pack(bo + "I", header)
    out += ifd
    out += overflow
    out += b"\x00" * (data_at - len(out))
    for sdata in strips:
        out += sdata
    return bytes(out)
