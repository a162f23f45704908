"""Baseline JPEG decoder: encoder round-trips + real libjpeg files.

Ground-truth strategy (no PIL / system decoder in this container):

1. Encoder differential round-trips — the in-repo encoder writes real
   baseline streams (standard Annex K tables, byte stuffing, restart
   markers); decoding must reproduce the source luma plane within the
   quantization error bound. The decoder reads Huffman/quant tables
   FROM THE FILE, so encoder/decoder cannot silently share a wrong
   table constant — a mismatch desyncs the stream loudly.
2. Real files on this host (CPython + rustup doc assets, encoded by
   libjpeg lineage encoders years before this repo): exact dimensions,
   non-degenerate statistics, and pixel-identity between two
   independently-wrapped encodings of the same image (python.jpg vs
   python-raw.jpg). A Huffman/bit-order bug cannot decode a real 100 KB
   photo to a sane luminance distribution by accident (r3 lesson:
   real-world files are the trustworthy ground truth, not hand-written
   differential encoders alone).
"""

import glob
import os

import numpy as np
import pytest

from ocr_agent_spark.kernel.imagemeta import (
    ImageFormatError,
    UnsupportedImageError,
    image_luminance_histogram,
    parse_image_dimensions,
)
from ocr_agent_spark.kernel.jpegdecode import (
    build_jpeg,
    decode_jpeg_luminance,
    encode_jpeg_baseline,
    encode_jpeg_progressive,
)

_HOST_JPEGS = {
    os.path.basename(p): p
    for pat in (
        "/root/.pyenv/versions/3.11.7/lib/python3.11/test/imghdrdata/python*.jpg",
        "/root/.pyenv/versions/3.11.7/lib/python3.11/site-packages/IPython/core/tests/2x2.jpg",
        "/root/.rustup/toolchains/stable-*/share/doc/rust/html/embedded-book/assets/*.jp*g",
    )
    for p in glob.glob(pat)
}


def _plane(data: bytes) -> np.ndarray:
    w, h, lum = decode_jpeg_luminance(data)
    return np.frombuffer(bytes(lum), dtype=np.uint8).reshape(h, w)


def _ramp(h: int, w: int, mult: int = 5, off: int = 17) -> np.ndarray:
    return ((np.arange(h * w).reshape(h, w) * mult + off) % 256).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(8, 8), (13, 21), (16, 16), (31, 47)])
def test_roundtrip_grayscale(h, w):
    y = _ramp(h, w)
    got = _plane(encode_jpeg_baseline(y, quant=1))
    assert got.shape == (h, w)
    assert np.abs(got.astype(int) - y.astype(int)).max() <= 2


@pytest.mark.parametrize(
    "sampling,restart", [((1, 1), 0), ((2, 2), 0), ((2, 2), 3), ((2, 1), 5),
                         ((1, 2), 2)]
)
def test_roundtrip_color_subsampling_and_restarts(sampling, restart):
    rng = np.random.default_rng(11)
    h, w = 19, 35
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    hs, vs = sampling
    cb = np.full(((h + vs - 1) // vs, (w + hs - 1) // hs), 128, np.uint8)
    cr = np.full_like(cb, 77)
    got = _plane(encode_jpeg_baseline(y, cb, cr, sampling=sampling, quant=1,
                                      restart_interval=restart))
    assert got.shape == (h, w)
    # random noise is the worst case for DCT round-off; quant=1 keeps it
    # within a few grey levels
    diff = np.abs(got.astype(int) - y.astype(int))
    assert diff.max() <= 3, diff.max()


def test_roundtrip_higher_quant_still_close_on_smooth_image():
    y = _ramp(24, 40, mult=1, off=0)  # smooth gradient
    got = _plane(encode_jpeg_baseline(y, quant=4))
    assert np.abs(got.astype(int) - y.astype(int)).mean() < 4.0


def test_build_jpeg_fixture_is_deterministic_and_decodes():
    a, b = build_jpeg(32, 16, seed=5), build_jpeg(32, 16, seed=5)
    assert a == b
    assert parse_image_dimensions(a) == ("jpeg", 32, 16)
    exp = ((np.arange(32 * 16) * 7 + 5 * 13) % 256).astype(np.uint8).reshape(16, 32)
    assert np.abs(_plane(a).astype(int) - exp.astype(int)).max() <= 2
    hist = image_luminance_histogram(a)
    assert len(hist) == 16 and abs(sum(hist) - 1.0) < 1e-9


@pytest.mark.skipif("python.jpg" not in _HOST_JPEGS
                    or "python-raw.jpg" not in _HOST_JPEGS,
                    reason="host CPython test JPEGs absent")
def test_real_420_files_decode_and_agree():
    """python.jpg / python-raw.jpg: same libjpeg-encoded 16x16 4:2:0
    image with different metadata wrapping — decoded luma must be
    pixel-identical and non-degenerate."""
    a = _plane(open(_HOST_JPEGS["python.jpg"], "rb").read())
    b = _plane(open(_HOST_JPEGS["python-raw.jpg"], "rb").read())
    assert a.shape == (16, 16)
    assert np.array_equal(a, b)
    assert a.std() > 20  # a logo, not a flat plane


@pytest.mark.skipif("verify.jpeg" not in _HOST_JPEGS,
                    reason="rustup doc asset absent")
def test_real_photo_444_decodes_sane():
    data = open(_HOST_JPEGS["verify.jpeg"], "rb").read()
    plane = _plane(data)
    assert plane.shape == (477, 720)
    # a real photo: mid-range mean, non-trivial spread, most bins busy
    assert 20 < plane.mean() < 235
    assert plane.std() > 10
    hist = image_luminance_histogram(data)
    assert sum(1 for v in hist if v > 0) >= 6


@pytest.mark.skipif("2x2.jpg" not in _HOST_JPEGS, reason="IPython asset absent")
def test_real_tiny_grayscale_decodes():
    plane = _plane(open(_HOST_JPEGS["2x2.jpg"], "rb").read())
    assert plane.shape == (2, 2)


@pytest.mark.skipif("f3.jpg" not in _HOST_JPEGS, reason="rustup asset absent")
def test_real_progressive_photo_decodes_sane():
    """f3.jpg: a real libjpeg PROGRESSIVE photo (SOF2, 4:2:2, spectral
    selection + successive approximation) — dims exact, distribution
    non-degenerate."""
    data = open(_HOST_JPEGS["f3.jpg"], "rb").read()
    plane = _plane(data)
    assert plane.shape == (477, 720)
    assert 20 < plane.mean() < 235
    assert plane.std() > 10
    hist = image_luminance_histogram(data)
    assert abs(sum(hist) - 1.0) < 1e-9
    assert sum(1 for v in hist if v > 0) >= 6


@pytest.mark.parametrize("dc_split", [False, True])
@pytest.mark.parametrize("ac_split", [False, True])
@pytest.mark.parametrize(
    "shape,sampling", [((13, 21), None), ((19, 35), (1, 1)),
                       ((19, 35), (2, 2)), ((24, 48), (2, 1))]
)
def test_progressive_decode_equals_baseline_decode(dc_split, ac_split,
                                                   shape, sampling):
    """The progressive encoder emits the SAME quantized coefficients as
    the baseline encoder, so the two decodes must be pixel-identical —
    this pins spectral-selection bands, successive approximation (DC
    bit refinement + AC newly-significant/correction-bit passes), EOB
    runs and chroma-scan skipping against the sequential path."""
    rng = np.random.default_rng(11)
    h, w = shape
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    if sampling is None:
        cb = cr = None
        sampling = (1, 1)
    else:
        hs, vs = sampling
        cb = rng.integers(0, 256,
                          ((h + vs - 1) // vs, (w + hs - 1) // hs)).astype(np.uint8)
        cr = np.full_like(cb, 77)
    base = encode_jpeg_baseline(y, cb, cr, sampling=sampling, quant=1)
    prog = encode_jpeg_progressive(y, cb, cr, sampling=sampling, quant=1,
                                   dc_split=dc_split, ac_split=ac_split)
    assert np.array_equal(_plane(base), _plane(prog))


def test_progressive_eob_runs_across_blocks():
    """Sparse and flat images produce multi-block EOB runs (EOBn codes
    with extra bits) — both the n-1 inclusive counting of first passes
    and the extra-count semantics of refinement passes."""
    for y in (
        np.zeros((48, 48), np.uint8),
        np.full((64, 64), 128, np.uint8),
    ):
        y = y.copy()
        y[5, 7], y[40, 41] = 255, 200
        base = encode_jpeg_baseline(y, quant=1)
        prog = encode_jpeg_progressive(y, quant=1, dc_split=True,
                                       ac_split=True)
        assert np.array_equal(_plane(base), _plane(prog))


def test_fill_bytes_before_marker_are_skipped():
    """T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
    bytes — the walk must not read a fill byte as a segment length."""
    y = _ramp(8, 8, mult=3, off=0)
    data = encode_jpeg_baseline(y, quant=1)
    sof = data.index(b"\xff\xc0")
    padded = data[:sof] + b"\xff\xff\xff" + data[sof:]
    assert np.array_equal(_plane(padded), _plane(data))


def test_truncated_entropy_raises_format_error():
    data = encode_jpeg_baseline(_ramp(16, 16), quant=1)
    # cut the stream mid-entropy (well after SOS, before EOI)
    cut = data[: len(data) - (len(data) - data.index(b"\xff\xda")) // 2]
    with pytest.raises(ImageFormatError):
        decode_jpeg_luminance(cut)


def test_declared_size_bomb_rejects_before_allocation():
    import struct as _struct
    import time

    data = bytearray(encode_jpeg_baseline(_ramp(8, 8), quant=1))
    sof = data.index(b"\xff\xc0")
    # SOF payload: len(2) prec(1) h(2) w(2) — declare 60000x60000
    data[sof + 5:sof + 9] = _struct.pack(">HH", 60000, 60000)
    t0 = time.monotonic()
    with pytest.raises(ImageFormatError, match="exceeds"):
        decode_jpeg_luminance(bytes(data))
    assert time.monotonic() - t0 < 1.0


def test_malformed_segments_raise_format_error_not_struct_error():
    """Error contract: short/garbled segment payloads must surface as
    ImageFormatError, never raw struct.error/IndexError (review r4)."""
    # SOF claiming seg_len=4 but needing 6+ payload bytes
    with pytest.raises(ImageFormatError):
        decode_jpeg_luminance(b"\xff\xd8\xff\xc0\x00\x04\x08\x00")
    # truncated DRI payload
    with pytest.raises(ImageFormatError):
        decode_jpeg_luminance(b"\xff\xd8\xff\xdd\x00\x03\x01")
    # SOS whose component list is cut short
    data = bytearray(encode_jpeg_baseline(_ramp(8, 8), quant=1))
    sos = data.index(b"\xff\xda")
    broken = bytes(data[:sos]) + b"\xff\xda\x00\x03\x03"
    with pytest.raises(ImageFormatError):
        decode_jpeg_luminance(broken)


def test_non_integer_luma_upsample_ratio_unsupported():
    """Y=3x3 with chroma 4x4 is legal but integer replication cannot
    reach image resolution — must fall back (Unsupported), not return a
    short luminance buffer."""
    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    cb = np.full((16, 16), 128, np.uint8)
    data = bytearray(encode_jpeg_baseline(y, cb, cb, sampling=(1, 1), quant=1))
    sof = data.index(b"\xff\xc0")
    # component spec triplets start at SOF payload offset 6 (+4 marker/len)
    data[sof + 11] = 0x33  # Y h,v = 3,3
    data[sof + 14] = 0x44  # Cb h,v = 4,4
    data[sof + 17] = 0x44  # Cr h,v = 4,4
    with pytest.raises(UnsupportedImageError, match="non-integer"):
        decode_jpeg_luminance(bytes(data))


def test_garbage_and_header_only_are_format_errors():
    from ocr_agent_spark.kernel.imagemeta import build_jpeg_header

    with pytest.raises(ImageFormatError):
        decode_jpeg_luminance(b"\xff\xd8not a real stream")
    # header-only fixture (no DHT/DQT/SOS) is malformed for pixel decode
    with pytest.raises(ImageFormatError):
        decode_jpeg_luminance(build_jpeg_header(10, 10))
