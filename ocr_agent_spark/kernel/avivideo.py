"""Real AVI (RIFF) video frame sampling — stdlib + numpy, no ffmpeg.

Closes the video half of the multimodal fake-feature gap: a pure-Python
RIFF/AVI container parse (LIST hdrl → avih/strh/strf, LIST movi →
``00db``/``00dc`` frame chunks) plus numpy decode of uncompressed
BI_RGB DIB frames (24/32-bit bottom-up BGR, stride padded to 4 — the
format ``ffmpeg -c:v rawvideo -pix_fmt bgr24`` writes). Frames are
sampled on the real timeline (``us_per_frame`` from avih) every
``every_ms`` milliseconds — the same contract the fake stood in for —
and feed a REAL 16-bin luminance histogram aggregated over the sampled
frames.

Error contract mirrors kernel/imagemeta.py and kernel/wavaudio.py:

- ``VideoFormatError``      — corrupt/truncated container → failure row
- ``UnsupportedVideoError`` — valid AVI but a compressed codec
  (cinepak/mjpeg/h264/...) we don't ship → caller falls back to fake
  features with ``feature_source='fake'``
"""

from __future__ import annotations

import struct

import numpy as np

_BI_RGB = 0

# Refuse absurd allocations from corrupt headers before touching numpy.
_MAX_DIM = 1 << 15
_MAX_SAMPLED_FRAMES = 4096


class VideoFormatError(ValueError):
    """Payload is not a decodable AVI container (corrupt/truncated)."""


class UnsupportedVideoError(VideoFormatError):
    """Valid AVI container, but a codec this environment cannot decode."""


def _chunks(data: bytes, start: int, end: int):
    """RIFF chunk walk (shared framing: kernel/riff.py)."""
    from ocr_agent_spark.kernel.riff import iter_riff_chunks

    return iter_riff_chunks(data, start, end, VideoFormatError)


def parse_avi_header(data: bytes) -> dict:
    """Parse avih/strh/strf for the first video stream; index frame chunks.

    Returns dict(width, height, us_per_frame, total_frames, bit_count,
    compression, frame_offsets=[(offset, size), ...]).
    """
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise VideoFormatError("not a RIFF/AVI container")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)

    avih = None
    vids = None  # (bit_count, compression, strf_w, strf_h)
    frames: list[tuple[int, int]] = []
    cur_stream = None  # fccType of the most recent strh in this strl

    def walk(start: int, stop: int, in_movi: bool) -> None:
        nonlocal avih, vids, cur_stream
        for fourcc, body, size in _chunks(data, start, stop):
            if fourcc == b"LIST":
                list_type = data[body:body + 4]
                if list_type == b"strl":
                    cur_stream = None  # each stream list re-binds strh→strf
                walk(body + 4, body + size, in_movi or list_type == b"movi")
            elif fourcc == b"avih" and avih is None:
                if size < 40:
                    raise VideoFormatError("avih chunk truncated")
                us_per_frame, _, _, _, total_frames = struct.unpack_from(
                    "<IIIII", data, body
                )
                w, h = struct.unpack_from("<II", data, body + 32)
                avih = {
                    "us_per_frame": us_per_frame,
                    "total_frames": total_frames,
                    "width": w,
                    "height": h,
                }
            elif fourcc == b"strh":
                cur_stream = data[body:body + 4]  # fccType: vids/auds/txts
            elif fourcc == b"strf" and vids is None:
                # only the strf of a VIDEO stream is a BITMAPINFOHEADER —
                # an audio strl listed first carries a WAVEFORMATEX here,
                # which must not be misread as the video format.
                if cur_stream == b"vids" and size >= 20:
                    _, w, h, _, bit_count, compression = struct.unpack_from(
                        "<IiihHI", data, body
                    )
                    vids = (bit_count, compression, w, abs(h))
            elif in_movi and len(fourcc) == 4 and fourcc[2:4] in (b"db", b"dc"):
                frames.append((body, size))

    walk(12, end, False)

    if avih is None:
        raise VideoFormatError("missing avih main header")
    if vids is None:
        raise VideoFormatError("missing video stream format (strf)")
    if not frames:
        raise VideoFormatError("no frame chunks in movi list")
    bit_count, compression, strf_w, strf_h = vids
    width = avih["width"] or strf_w
    height = avih["height"] or strf_h
    if not (0 < width <= _MAX_DIM and 0 < height <= _MAX_DIM):
        raise VideoFormatError(f"implausible frame size {width}x{height}")
    if avih["us_per_frame"] == 0:
        raise VideoFormatError("zero frame duration")
    if compression != _BI_RGB:
        fourcc = struct.pack("<I", compression)
        raise UnsupportedVideoError(
            f"AVI codec {fourcc!r} needs a decoder we don't ship"
        )
    if bit_count not in (24, 32):
        raise UnsupportedVideoError(f"raw DIB bit depth {bit_count} not decoded")
    return {
        "width": width,
        "height": height,
        "us_per_frame": avih["us_per_frame"],
        "total_frames": len(frames),
        "bit_count": bit_count,
        "compression": compression,
        "frame_offsets": frames,
    }


def _decode_dib_luminance(data: bytes, off: int, size: int,
                          width: int, height: int, bit_count: int) -> np.ndarray:
    """One raw bottom-up BGR frame → float64 luminance array (H*W).

    Same Rec.601 weights as imagemeta's image histograms so image and
    video features live in one space.
    """
    bytes_px = bit_count // 8
    stride = (width * bytes_px + 3) & ~3
    need = stride * height
    if size < need:
        raise VideoFormatError(
            f"frame chunk {size} bytes < {need} for {width}x{height}@{bit_count}"
        )
    buf = np.frombuffer(data, dtype=np.uint8, count=need, offset=off)
    rows = buf.reshape(height, stride)[:, : width * bytes_px]
    px = rows.reshape(height, width, bytes_px)[::-1]  # bottom-up → top-down
    b = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    r = px[:, :, 2].astype(np.float64)
    return (0.299 * r + 0.587 * g + 0.114 * b).reshape(-1)


def sample_avi_luminance(data: bytes, every_ms: int) -> tuple[list[np.ndarray], dict]:
    """Decode the frames nearest t = 0, every_ms, 2*every_ms, ...

    Returns (list of per-frame luminance arrays, header meta). Frame
    index for time t is floor(t / frame_duration) — the frame on screen
    at t, matching ``ffmpeg fps=1000/every_ms`` sampling.
    """
    meta = parse_avi_header(data)
    n = meta["total_frames"]
    frame_ms = meta["us_per_frame"] / 1000.0
    duration_ms = n * frame_ms
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")
    times = np.arange(0, max(duration_ms, frame_ms), every_ms)
    idx = np.minimum((times / frame_ms).astype(np.int64), n - 1)
    idx = np.unique(idx)[:_MAX_SAMPLED_FRAMES]
    offsets = meta["frame_offsets"]

    # VfW dropped frames are zero-length 00dc chunks: the PREVIOUS
    # frame stays on screen at that time (fall forward only when the
    # clip has no earlier content at all). One O(n) pass precomputes
    # the on-screen index — a per-sample backward scan is quadratic on
    # dropped-frame-heavy captures (r4b review).
    last_nonempty = [-1] * n
    j = -1
    first_nonempty = -1
    for k, (_off, sz) in enumerate(offsets):
        if sz > 0:
            j = k
            if first_nonempty < 0:
                first_nonempty = k
        last_nonempty[k] = j

    def on_screen(i: int) -> int | None:
        k = last_nonempty[i]
        if k >= 0:
            return k
        return first_nonempty if first_nonempty >= 0 else None

    lums = []
    decoded: set[int] = set()
    for i in idx:
        j = on_screen(int(i))
        if j is None:
            raise VideoFormatError("every frame chunk is empty")
        if j in decoded:
            continue
        decoded.add(j)
        off, size = offsets[j]
        lums.append(
            _decode_dib_luminance(
                data, off, size, meta["width"], meta["height"], meta["bit_count"]
            )
        )
    meta["sampled_frames"] = len(lums)
    meta["duration_ms"] = int(round(duration_ms))
    return lums, meta


def video_feature_vector(data: bytes, every_ms: int = 1000,
                         bins: int = 16) -> tuple[list[float], dict]:
    """REAL video features: luminance histogram over sampled frames.

    One L1-normalized ``bins``-bin histogram of Rec.601 luminance pooled
    across all sampled frames — directly comparable to the image
    histograms (same bin edges, same normalization).
    """
    lums, meta = sample_avi_luminance(data, every_ms)
    pooled = np.concatenate(lums)
    hist, _ = np.histogram(pooled, bins=bins, range=(0.0, 256.0))
    total = float(hist.sum()) or 1.0
    return [float(c) / total for c in hist], meta


# --------------------------------------------------------------------------
# Deterministic fixture builder (same role as imagemeta.build_bmp etc.)


def build_avi(width: int = 32, height: int = 24, n_frames: int = 12,
              fps: int = 10, seed: int = 0, bit_count: int = 24) -> bytes:
    """Build a real uncompressed AVI: moving gradient + per-frame tint.

    Deterministic in ``seed``. Frames are bottom-up BGR DIBs with
    4-byte row stride, exactly what the decode path consumes and what
    VfW-era writers produced.
    """
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    us_per_frame = int(round(1_000_000 / fps))
    bytes_px = bit_count // 8
    stride = (width * bytes_px + 3) & ~3

    yy, xx = np.mgrid[0:height, 0:width]
    base = ((xx * 255) // max(1, width - 1)).astype(np.int64)
    tilt = ((yy * 255) // max(1, height - 1)).astype(np.int64)

    frame_chunks = []
    phase = int(rng.randint(0, 256))
    for f in range(n_frames):
        r = (base + phase + 11 * f) % 256
        g = (tilt + 7 * f) % 256
        b = (base + tilt + 3 * f) % 256
        px = np.zeros((height, stride), dtype=np.uint8)
        interleaved = np.stack(
            [b, g, r] + ([np.zeros_like(b)] if bytes_px == 4 else []), axis=2
        ).astype(np.uint8)
        px[:, : width * bytes_px] = interleaved.reshape(height, width * bytes_px)
        body = px[::-1].tobytes()  # store bottom-up
        chunk = b"00db" + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            chunk += b"\x00"
        frame_chunks.append(chunk)
    movi_body = b"movi" + b"".join(frame_chunks)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, 0, 0, 0x10, n_frames, 0, 1, 0, width, height, 0, 0, 0, 0
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII",
                                        0, 0, 0, 0, 1, fps, 0, n_frames,
                                        0, 0xFFFFFFFF, 0, 0)
        + struct.pack("<hhhh", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiihHIIiiII",
        40, width, height, 1, bit_count, _BI_RGB, stride * height, 0, 0, 0, 0
    )

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        out = fourcc + struct.pack("<I", len(body)) + body
        return out + (b"\x00" if len(body) & 1 else b"")

    def list_chunk(list_type: bytes, body: bytes) -> bytes:
        inner = list_type + body
        return b"LIST" + struct.pack("<I", len(inner)) + inner

    strl = list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih) + strl)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
