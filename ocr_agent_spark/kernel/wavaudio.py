"""Real WAV (RIFF/WAVE) audio decode — stdlib + numpy, no ffmpeg.

Closes the audio half of the multimodal fake-feature gap the same way
kernel/imagemeta.py closed images: a pure-Python container parse plus a
numpy sample decode, feeding a REAL 16-float feature vector (8 temporal
RMS segments + 8 log-spaced spectral band energies) instead of the
seeded-hash stand-in.

Decodes every integer-PCM and IEEE-float WAV shape that `ffmpeg -f wav`
or the stdlib `wave` writer can produce:

- format tag 1 (PCM): 8-bit unsigned, 16/24/32-bit signed little-endian
- format tag 3 (IEEE_FLOAT): float32 / float64
- format tag 0xFFFE (WAVE_FORMAT_EXTENSIBLE) wrapping either of the
  above (subformat GUID first two bytes 0x0001 / 0x0003)
- any channel count (mixed down to mono by mean, like librosa's
  ``to_mono``) and any sample rate

Error contract mirrors imagemeta's (reference parity: a payload the
backend cannot handle becomes a *failure row* or a documented fallback,
never a job abort — ocr-agent D2 semantics, reference
src/ocr_agent/extraction_runner.py error rows):

- ``AudioFormatError``   — corrupt/truncated container → failure row
- ``UnsupportedAudioError`` — spec-valid but needs a codec we don't
  ship (ADPCM, MP3-in-WAV, a-law/mu-law, ...) → caller falls back to
  fake features with ``feature_source='fake'``
"""

from __future__ import annotations

import math
import struct

import numpy as np

_WAVE_FORMAT_PCM = 0x0001
_WAVE_FORMAT_IEEE_FLOAT = 0x0003
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE

# Sanity bound: refuse to allocate sample buffers for a data chunk that
# claims more bytes than the payload actually carries (truncated file)
# or an absurd channel count (corrupt fmt chunk).
_MAX_CHANNELS = 64


class AudioFormatError(ValueError):
    """Payload is not a decodable WAV container (corrupt/truncated)."""


class UnsupportedAudioError(AudioFormatError):
    """Valid WAV container, but a codec this environment cannot decode."""


def _iter_riff_chunks(data: bytes, start: int, end: int):
    """Top-level RIFF chunks; 'data' overruns are clipped (streamed
    writers patch sizes late), everything else is corruption."""
    from ocr_agent_spark.kernel.riff import iter_riff_chunks

    return iter_riff_chunks(
        data, start, end, AudioFormatError, tolerate_overrun_fourcc=b"data"
    )


def parse_wav_header(data: bytes) -> dict:
    """Parse fmt/data chunk metadata without decoding samples.

    Returns dict(format_tag, channels, sample_rate, bits_per_sample,
    n_samples, duration_ms, data_offset, data_size).
    """
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioFormatError("not a RIFF/WAVE container")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)
    if end < 12:
        raise AudioFormatError("RIFF size field truncates the WAVE id")

    fmt = None
    data_off = data_size = None
    for fourcc, body, size in _iter_riff_chunks(data, 12, end):
        if fourcc == b"fmt " and fmt is None:
            if size < 16:
                raise AudioFormatError(f"fmt chunk too small ({size} bytes)")
            tag, channels, rate, _byte_rate, _align, bits = struct.unpack_from(
                "<HHIIHH", data, body
            )
            if tag == _WAVE_FORMAT_EXTENSIBLE:
                # cbSize(2) + validBits(2) + channelMask(4) + GUID(16)
                if size < 40:
                    raise AudioFormatError("extensible fmt chunk truncated")
                (sub_tag,) = struct.unpack_from("<H", data, body + 24)
                tag = sub_tag
            fmt = (tag, channels, rate, bits)
        elif fourcc == b"data" and data_off is None:
            data_off, data_size = body, size

    if fmt is None:
        raise AudioFormatError("missing fmt chunk")
    if data_off is None:
        raise AudioFormatError("missing data chunk")
    tag, channels, rate, bits = fmt
    if channels == 0 or channels > _MAX_CHANNELS:
        raise AudioFormatError(f"implausible channel count {channels}")
    if rate == 0:
        raise AudioFormatError("zero sample rate")
    if tag == _WAVE_FORMAT_PCM:
        if bits not in (8, 16, 24, 32):
            raise UnsupportedAudioError(f"PCM bit depth {bits} not decoded here")
    elif tag == _WAVE_FORMAT_IEEE_FLOAT:
        if bits not in (32, 64):
            raise AudioFormatError(f"IEEE float WAV with {bits}-bit samples")
    else:
        # ADPCM (2), a-law (6), mu-law (7), MP3 (0x55), ... — valid WAV,
        # needs a codec: fall back, don't fail the row.
        raise UnsupportedAudioError(f"WAV format tag 0x{tag:04x} needs a codec")
    bytes_per_sample = bits // 8
    frame_size = bytes_per_sample * channels
    n_samples = data_size // frame_size
    if n_samples == 0:
        raise AudioFormatError("empty data chunk")
    return {
        "format_tag": tag,
        "channels": channels,
        "sample_rate": rate,
        "bits_per_sample": bits,
        "n_samples": n_samples,
        "duration_ms": int(round(n_samples * 1000 / rate)),
        "data_offset": data_off,
        "data_size": n_samples * frame_size,
    }


def decode_wav_mono(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode samples to a mono float64 array in [-1, 1] + header meta.

    Multi-channel audio is mixed down by per-frame mean (librosa
    ``to_mono`` semantics). All decode work is vectorized numpy over the
    raw buffer — no per-sample Python.
    """
    meta = parse_wav_header(data)
    off, size = meta["data_offset"], meta["data_size"]
    raw = data[off:off + size]
    bits = meta["bits_per_sample"]
    if meta["format_tag"] == _WAVE_FORMAT_IEEE_FLOAT:
        dtype = "<f4" if bits == 32 else "<f8"
        samples = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    elif bits == 8:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 16:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.uint32)
        u = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        signed = u.astype(np.int32)
        signed[signed >= 1 << 23] -= 1 << 24
        samples = signed.astype(np.float64) / float(1 << 23)
    else:  # 32-bit PCM
        samples = np.frombuffer(raw, dtype="<i4").astype(np.float64) / float(1 << 31)
    ch = meta["channels"]
    if ch > 1:
        samples = samples.reshape(-1, ch).mean(axis=1)
    return samples, meta


def audio_feature_vector(data: bytes, bins: int = 16) -> tuple[list[float], dict]:
    """REAL audio features: temporal RMS + spectral band energies.

    First ``bins//2`` values: RMS of equal-length time segments (the
    envelope). Last ``bins//2``: total power in log-spaced frequency
    bands of the full-signal rfft periodogram (a mel-like summary
    without the mel filterbank — deterministic, library-free). The
    vector is L1-normalized like the image luminance histograms so
    downstream cosine/threshold logic treats all media uniformly.
    """
    samples, meta = decode_wav_mono(data)
    half = bins // 2
    n = samples.size

    seg_edges = np.linspace(0, n, half + 1).astype(np.int64)
    rms = np.empty(half)
    for i in range(half):
        seg = samples[seg_edges[i]:seg_edges[i + 1]]
        rms[i] = math.sqrt(float(np.mean(seg * seg))) if seg.size else 0.0

    spectrum = np.abs(np.fft.rfft(samples)) ** 2
    # log-spaced band edges from bin 1 (skip DC) to Nyquist; bands are
    # half-open [e_i, e_{i+1}) with the last band closed at Nyquist, so
    # every bin is counted exactly once and the band fractions sum to
    # the in-range energy share (an overlapping +1 end here would
    # double-count edge bins — code-review r4 finding)
    n_freq = spectrum.size
    if n_freq > 1:
        edges = np.unique(
            np.round(np.geomspace(1, n_freq - 1, half + 1)).astype(np.int64)
        )
        band = np.zeros(half)
        total = float(spectrum[1:].sum()) or 1.0
        n_bands = min(half, edges.size - 1)
        for i in range(n_bands):
            hi = edges[i + 1] if i < n_bands - 1 else n_freq
            band[i] = float(spectrum[edges[i]:hi].sum()) / total
    else:
        band = np.zeros(half)

    feats = np.concatenate([rms, band])
    s = float(feats.sum())
    if s > 0:
        feats = feats / s
    return [float(x) for x in feats], meta


# --------------------------------------------------------------------------
# Deterministic fixture builder (same role as imagemeta.build_png etc.)


def build_wav(duration_ms: int = 250, sample_rate: int = 8000,
              channels: int = 1, bits: int = 16, seed: int = 0,
              format_tag: int | None = None) -> bytes:
    """Build a real PCM/float WAV: summed sine partials + a click train.

    Deterministic in ``seed``; the spectral content varies with seed so
    feature vectors differ across fixture rows.
    """
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    n = max(1, int(sample_rate * duration_ms / 1000))
    t = np.arange(n, dtype=np.float64) / sample_rate
    signal = np.zeros(n)
    for _ in range(3):
        freq = float(rng.uniform(80, sample_rate / 2.5))
        amp = float(rng.uniform(0.1, 0.3))
        signal += amp * np.sin(2 * math.pi * freq * t + float(rng.uniform(0, 6.28)))
    # envelope so temporal RMS segments differ
    signal *= np.linspace(1.0, float(rng.uniform(0.2, 0.8)), n)
    signal = np.clip(signal, -0.999, 0.999)
    if channels > 1:
        chans = [signal * float(rng.uniform(0.5, 1.0)) for _ in range(channels)]
        signal = np.stack(chans, axis=1).reshape(-1)

    tag = format_tag
    if tag is None:
        if bits == 64 or (bits == 32 and seed % 2):
            tag = _WAVE_FORMAT_IEEE_FLOAT
        else:
            tag = _WAVE_FORMAT_PCM
    if tag == _WAVE_FORMAT_IEEE_FLOAT:
        raw = signal.astype("<f4" if bits == 32 else "<f8").tobytes()
    elif bits == 8:
        raw = (np.round(signal * 127) + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        raw = np.round(signal * 32767).astype("<i2").tobytes()
    elif bits == 24:
        ints = np.round(signal * ((1 << 23) - 1)).astype(np.int32)
        u = ints.astype(np.uint32) & 0xFFFFFF
        b = np.empty((u.size, 3), dtype=np.uint8)
        b[:, 0] = u & 0xFF
        b[:, 1] = (u >> 8) & 0xFF
        b[:, 2] = (u >> 16) & 0xFF
        raw = b.tobytes()
    elif bits == 32:
        raw = np.round(signal * ((1 << 31) - 1)).astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported fixture bit depth {bits}")

    frame = channels * (bits // 8)
    fmt_chunk = struct.pack(
        "<HHIIHH", tag, channels, sample_rate, sample_rate * frame, frame, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", len(raw)) + raw
        + (b"\x00" if len(raw) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
