"""TIFF kernel tests — baseline TIFF 6.0 decode (no Spark).

Round-trips the in-repo builder across photometrics × compressions ×
byte orders, pins the TIFF-LZW early-change discipline at every code
width boundary, and ground-truths against a REAL-encoder TIFF shipped
with this host's CPython test suite."""

from __future__ import annotations

import glob
import random

import numpy as np
import pytest

from ocr_agent_spark.kernel.imagemeta import (
    ImageFormatError,
    UnsupportedImageError,
    image_luminance_histogram,
    parse_image_dimensions,
)
from ocr_agent_spark.kernel.tiffimage import (
    _tiff_lzw_decode,
    _tiff_lzw_encode,
    build_tiff,
    decode_tiff_luminance,
    parse_tiff_dimensions,
)


@pytest.mark.parametrize("photometric", ["rgb", "gray", "gray16", "bilevel"])
@pytest.mark.parametrize("compression", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("byte_order", ["II", "MM"])
def test_tiff_roundtrip_matrix(photometric, compression, byte_order):
    t = build_tiff(33, 17, seed=3, compression=compression,
                   photometric=photometric, byte_order=byte_order)
    assert parse_tiff_dimensions(t) == (33, 17)
    w, h, lum = decode_tiff_luminance(t)
    assert (w, h) == (33, 17)
    assert lum.size == 33 * 17
    assert 0 <= lum.min() and lum.max() <= 255


def test_tiff_compression_invariant_pixels():
    """The same image through none/packbits/lzw must decode to
    IDENTICAL pixels — compression is lossless."""
    ref = None
    for comp in ("none", "packbits", "lzw"):
        lum = decode_tiff_luminance(
            build_tiff(32, 24, seed=5, compression=comp, photometric="gray")
        )[2]
        if ref is None:
            ref = lum
        else:
            np.testing.assert_array_equal(ref, lum)


def test_tiff_lzw_roundtrip_and_width_boundaries():
    """TIFF LZW uses MSB-first packing with EARLY code-width change;
    the decoder's table lags the encoder's by one entry, so it must
    widen one code earlier — random data (no repeats → table grows one
    entry per code) crosses 9→10→11→12 exactly and catches any
    off-by-one; the compressible case crosses the 12-bit table reset."""
    rng = random.Random(7)
    for size in (10, 300, 600, 5000, 60000):
        raw = bytes(rng.randrange(256) for _ in range(size))
        assert _tiff_lzw_decode(_tiff_lzw_encode(raw), size) == raw, size
    raw = bytes([i % 7 for i in range(120000)])
    assert _tiff_lzw_decode(_tiff_lzw_encode(raw), len(raw)) == raw


def test_tiff_integrates_with_imagemeta():
    t = build_tiff(40, 20, seed=2, compression="lzw")
    assert parse_image_dimensions(t) == ("tiff", 40, 20)
    hist = image_luminance_histogram(t)
    assert len(hist) == 16
    assert sum(hist) == pytest.approx(1.0, abs=1e-9)


def test_tiff_real_world_file():
    """Ground truth: the RGBA uncompressed TIFF shipped with CPython's
    test suite (a real-encoder file) must decode."""
    paths = sorted(glob.glob(
        "/root/.pyenv/versions/*/lib/python3.1*/test/**/python.tiff",
        recursive=True,
    ))
    if not paths:
        pytest.skip("no real-world TIFF on this host")
    with open(paths[0], "rb") as fh:
        data = fh.read()
    assert parse_image_dimensions(data) == ("tiff", 16, 16)
    w, h, lum = decode_tiff_luminance(data)
    assert (w, h) == (16, 16)
    assert 0 <= lum.min() and lum.max() <= 255
    assert sum(image_luminance_histogram(data)) == pytest.approx(1.0, abs=1e-9)


def test_tiff_unsupported_vs_corrupt():
    import struct

    t = bytearray(build_tiff(16, 16, seed=1))
    # compression → JPEG-in-TIFF (tag 259 value): valid TIFF, no codec
    # find tag 259 in the IFD and rewrite its value
    (ifd,) = struct.unpack_from("<I", t, 4)
    (n,) = struct.unpack_from("<H", t, ifd)
    for i in range(n):
        base = ifd + 2 + 12 * i
        tag, = struct.unpack_from("<H", t, base)
        if tag == 259:
            struct.pack_into("<I", t, base + 8, 7)  # JPEG
    with pytest.raises(UnsupportedImageError):
        decode_tiff_luminance(bytes(t))
    # truncated strip → corrupt
    good = build_tiff(16, 16, seed=1)
    with pytest.raises(ImageFormatError):
        decode_tiff_luminance(good[: len(good) - 40])
    with pytest.raises(ImageFormatError):
        parse_tiff_dimensions(b"II*\x00\xff\xff\xff\xff")


def test_tiff_zero_count_tag_keeps_typed_error():
    """A crafted count=0 ImageWidth tag must surface as the module's
    typed ImageFormatError (missing tag), not a bare IndexError from an
    empty value list (ADVICE r4)."""
    import struct

    t = bytearray(build_tiff(8, 8, seed=2))
    (ifd,) = struct.unpack_from("<I", t, 4)
    (n,) = struct.unpack_from("<H", t, ifd)
    for i in range(n):
        base = ifd + 2 + 12 * i
        tag, = struct.unpack_from("<H", t, base)
        if tag == 256:  # ImageWidth → count 0
            struct.pack_into("<I", t, base + 4, 0)
    with pytest.raises(ImageFormatError):
        parse_tiff_dimensions(bytes(t))
    with pytest.raises((ImageFormatError, UnsupportedImageError)):
        decode_tiff_luminance(bytes(t))


def test_tiff_predictor2_non8bit_unsupported():
    """Predictor 2 is only undone for 8-bit samples; a 16-bit
    predictor-2 TIFF must fall back (unsupported), never decode
    delta-coded samples as absolute values marked 'real'."""
    import struct

    t = bytearray(build_tiff(16, 16, seed=1, photometric="gray16"))
    (ifd,) = struct.unpack_from("<I", t, 4)
    (n,) = struct.unpack_from("<H", t, ifd)
    # append is hard; instead rewrite the RowsPerStrip tag (278) into a
    # Predictor tag (317) value 2 — count/type stay SHORT/1
    for i in range(n):
        base = ifd + 2 + 12 * i
        (tag,) = struct.unpack_from("<H", t, base)
        if tag == 278:
            struct.pack_into("<H", t, base, 317)
            struct.pack_into("<I", t, base + 8, 2)
    with pytest.raises(UnsupportedImageError):
        decode_tiff_luminance(bytes(t))
