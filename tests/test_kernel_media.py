"""WAV / AVI kernel tests — real audio+video decode (no Spark needed).

Mirrors the imagemeta test strategy: round-trips through the in-repo
builders across every supported shape, plus *independent-writer*
differentials (stdlib ``wave`` module for audio; a hand-rolled
byte-level writer in this file for video) so a same-author
encoder/decoder bug pair cannot mirror-hide.
"""

from __future__ import annotations

import io
import math
import struct
import wave

import numpy as np
import pytest

from ocr_agent_spark.kernel.avivideo import (
    UnsupportedVideoError,
    VideoFormatError,
    build_avi,
    parse_avi_header,
    sample_avi_luminance,
    video_feature_vector,
)
from ocr_agent_spark.kernel.wavaudio import (
    AudioFormatError,
    UnsupportedAudioError,
    audio_feature_vector,
    build_wav,
    decode_wav_mono,
    parse_wav_header,
)

# -- WAV -------------------------------------------------------------------


@pytest.mark.parametrize(
    ("bits", "channels", "tag"),
    [(8, 1, None), (16, 1, None), (16, 2, None), (24, 1, None),
     (24, 3, None), (32, 1, 0x0001), (32, 2, 0x0003), (64, 1, 0x0003)],
)
def test_wav_roundtrip_every_shape(bits, channels, tag):
    data = build_wav(duration_ms=200, sample_rate=8000, channels=channels,
                     bits=bits, seed=bits * 10 + channels, format_tag=tag)
    meta = parse_wav_header(data)
    assert meta["channels"] == channels
    assert meta["bits_per_sample"] == bits
    assert meta["duration_ms"] == 200
    feats, _ = audio_feature_vector(data)
    assert len(feats) == 16
    assert sum(feats) == pytest.approx(1.0, abs=1e-9)
    assert all(f >= 0 for f in feats)


def test_wav_differential_vs_stdlib_writer():
    """A WAV written by the stdlib wave module (independent writer)
    must decode to the exact samples that went in."""
    rate = 4000
    samples = np.round(
        np.sin(np.arange(rate) * 0.25) * 20000
    ).astype("<i2")
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(rate)
    w.writeframes(samples.tobytes())
    w.close()
    mono, meta = decode_wav_mono(buf.getvalue())
    assert meta["sample_rate"] == rate
    assert meta["duration_ms"] == 1000
    np.testing.assert_allclose(mono, samples.astype(np.float64) / 32768.0)


def test_wav_pcm32_equals_float32_features():
    """The same signal through int32 PCM and IEEE float32 containers
    yields (near-)identical features — the decode normalizes both to
    the same [-1,1] space."""
    a = build_wav(duration_ms=250, bits=32, seed=7, format_tag=0x0001)
    b = build_wav(duration_ms=250, bits=32, seed=7, format_tag=0x0003)
    fa, _ = audio_feature_vector(a)
    fb, _ = audio_feature_vector(b)
    np.testing.assert_allclose(fa, fb, atol=1e-6)


def test_wav_stereo_mixdown_matches_mono():
    """Stereo with two identical channels must decode to the mono
    signal (per-frame mean mixdown)."""
    rate, n = 8000, 1600
    sig = np.round(np.sin(np.arange(n) * 0.1) * 30000).astype("<i2")
    stereo = np.stack([sig, sig], axis=1).reshape(-1)

    def wav_bytes(raw: bytes, ch: int) -> bytes:
        fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * 2 * ch, 2 * ch, 16)
        body = (b"WAVEfmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", len(raw)) + raw)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    m, _ = decode_wav_mono(wav_bytes(sig.tobytes(), 1))
    s, _ = decode_wav_mono(wav_bytes(stereo.tobytes(), 2))
    np.testing.assert_allclose(m, s)


def test_wav_sine_concentrates_in_expected_band():
    """A pure tone's spectral half must put its energy in one band."""
    rate, secs, freq = 8000, 1, 440.0
    t = np.arange(rate * secs) / rate
    sig = np.round(np.sin(2 * math.pi * freq * t) * 30000).astype("<i2")
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    raw = sig.tobytes()
    body = (b"WAVEfmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    feats, _ = audio_feature_vector(b"RIFF" + struct.pack("<I", len(body)) + body)
    spectral = feats[8:]
    assert max(spectral) > 0.9 * sum(spectral)


def test_wav_extensible_format_decodes():
    """WAVE_FORMAT_EXTENSIBLE wrapping PCM must decode like plain PCM."""
    plain = build_wav(duration_ms=150, bits=16, seed=3)
    meta = parse_wav_header(plain)
    # rebuild the fmt chunk as extensible (tag 0xFFFE + 24-byte ext)
    off, size = meta["data_offset"], meta["data_size"]
    raw = plain[off:off + size]
    ext = struct.pack("<HHI", 16, 0, 0x4) + struct.pack("<H", 1) + b"\x00" * 14
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16) + ext
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    wrapped = b"RIFF" + struct.pack("<I", len(body)) + body
    np.testing.assert_allclose(decode_wav_mono(plain)[0], decode_wav_mono(wrapped)[0])


def test_wav_unsupported_codec_vs_corrupt():
    adpcm = bytearray(build_wav(seed=1))
    struct.pack_into("<H", adpcm, 20, 0x0002)  # fmt tag → ADPCM
    with pytest.raises(UnsupportedAudioError):
        parse_wav_header(bytes(adpcm))
    with pytest.raises(AudioFormatError):
        parse_wav_header(b"RIFF" + struct.pack("<I", 4) + b"WAVE")  # no fmt
    truncated = build_wav(seed=2)[:30]
    with pytest.raises(AudioFormatError):
        parse_wav_header(truncated)


# -- AVI -------------------------------------------------------------------


@pytest.mark.parametrize("bit_count", [24, 32])
def test_avi_roundtrip(bit_count):
    avi = build_avi(width=33, height=17, n_frames=20, fps=10, seed=5,
                    bit_count=bit_count)
    meta = parse_avi_header(avi)
    assert (meta["width"], meta["height"]) == (33, 17)
    assert meta["total_frames"] == 20
    feats, smeta = video_feature_vector(avi, every_ms=500)
    assert len(feats) == 16
    assert sum(feats) == pytest.approx(1.0, abs=1e-9)
    # 2000 ms of video sampled every 500 ms → frames at 0/500/1000/1500
    assert smeta["sampled_frames"] == 4
    assert smeta["duration_ms"] == 2000


def test_avi_24_and_32_bit_same_pixels_same_features():
    f24, _ = video_feature_vector(build_avi(seed=9, bit_count=24), every_ms=300)
    f32, _ = video_feature_vector(build_avi(seed=9, bit_count=32), every_ms=300)
    np.testing.assert_allclose(f24, f32)


def _handwritten_avi(frames_bgr: list[np.ndarray], fps: int = 10) -> bytes:
    """Independent byte-level AVI writer (NOT build_avi) for
    differential testing — minimal hdrl + movi, 24-bit bottom-up DIB."""
    h, w, _ = frames_bgr[0].shape
    stride = (w * 3 + 3) & ~3

    def ck(cc: bytes, body: bytes) -> bytes:
        return cc + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    avih = struct.pack("<14I", 1_000_000 // fps, 0, 0, 0x10, len(frames_bgr),
                       0, 1, 0, w, h, 0, 0, 0, 0)
    strh = b"vidsDIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                                     len(frames_bgr), 0, 0, 0, 0) \
        + struct.pack("<4h", 0, 0, w, h)
    strf = struct.pack("<IiihHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0)
    strl = b"LIST" + struct.pack("<I", 4 + len(ck(b"strh", strh)) + len(ck(b"strf", strf))) \
        + b"strl" + ck(b"strh", strh) + ck(b"strf", strf)
    hdrl_body = b"hdrl" + ck(b"avih", avih) + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = b"movi"
    for fr in frames_bgr:
        padded = np.zeros((h, stride), dtype=np.uint8)
        padded[:, : w * 3] = fr.reshape(h, w * 3)
        movi_body += ck(b"00db", padded[::-1].tobytes())
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    riff = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def test_avi_differential_known_solid_frames():
    """Hand-written AVI of solid-gray frames: the pooled luminance
    histogram must put ALL mass in exactly the bins the Rec.601
    luminance of each frame's color falls in."""
    w, h = 16, 8
    grays = [40, 200]  # lum = gray for r=g=b → bins 2 and 12 of 16
    frames = [np.full((h, w, 3), g, dtype=np.uint8) for g in grays]
    avi = _handwritten_avi(frames, fps=1)
    feats, meta = video_feature_vector(avi, every_ms=1000)
    assert meta["sampled_frames"] == 2
    expected = np.zeros(16)
    expected[40 // 16] = 0.5
    expected[200 // 16] = 0.5
    np.testing.assert_allclose(feats, expected)


def test_avi_sampling_picks_frame_on_screen():
    """every_ms longer than the whole clip → only frame 0 decodes; the
    luminance must match that first frame exactly."""
    w, h = 8, 4
    frames = [np.full((h, w, 3), v, dtype=np.uint8) for v in (10, 250)]
    avi = _handwritten_avi(frames, fps=10)
    lums, meta = sample_avi_luminance(avi, every_ms=60000)
    assert meta["sampled_frames"] == 1
    np.testing.assert_allclose(lums[0], np.full(w * h, 10.0))


def test_avi_unsupported_codec_vs_corrupt():
    mjpg = bytearray(build_avi(seed=4))
    strf_at = bytes(mjpg).index(struct.pack("<Iiih", 40, 32, 24, 1))
    struct.pack_into("<4s", mjpg, strf_at + 16, b"MJPG")
    with pytest.raises(UnsupportedVideoError):
        parse_avi_header(bytes(mjpg))
    with pytest.raises(VideoFormatError):
        parse_avi_header(b"RIFF" + struct.pack("<I", 4) + b"AVI ")
    # truncated frame chunk body → format error, not a numpy crash
    good = build_avi(width=16, height=16, n_frames=2, seed=6)
    meta = parse_avi_header(good)
    off, _size = meta["frame_offsets"][0]
    clipped = bytearray(good)
    struct.pack_into("<I", clipped, off - 4, 8)  # lie: frame is 8 bytes
    with pytest.raises(VideoFormatError):
        sample_avi_luminance(bytes(clipped), every_ms=50)


def test_avi_audio_stream_listed_first_still_finds_video_format():
    """An auds strl BEFORE the vids strl (common mux order) must not be
    misread as the video BITMAPINFOHEADER (code-review r4, verified
    failure)."""
    base = build_avi(width=16, height=8, n_frames=4, seed=11)
    # splice an audio strl (strh fccType 'auds' + 30-byte WAVEFORMATEX
    # strf) in front of the existing video strl inside hdrl
    def ck(cc, body):
        return cc + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    a_strh = b"auds" + b"\x00" * 52
    a_strf = struct.pack("<HHIIHH", 0x55, 2, 44100, 176400, 4, 16) + b"\x00" * 14
    a_strl_body = b"strl" + ck(b"strh", a_strh) + ck(b"strf", a_strf)
    a_strl = b"LIST" + struct.pack("<I", len(a_strl_body)) + a_strl_body

    vid_strl_at = base.index(b"LIST", base.index(b"hdrl"))
    # find the video strl (first LIST after hdrl's avih)
    vid_strl_at = base.index(b"strl") - 8
    patched = bytearray(base)
    patched[vid_strl_at:vid_strl_at] = a_strl
    # grow the enclosing hdrl LIST and RIFF sizes
    hdrl_at = patched.index(b"hdrl") - 8
    (hdrl_size,) = struct.unpack_from("<I", patched, hdrl_at + 4)
    struct.pack_into("<I", patched, hdrl_at + 4, hdrl_size + len(a_strl))
    (riff_size,) = struct.unpack_from("<I", patched, 4)
    struct.pack_into("<I", patched, 4, riff_size + len(a_strl))

    meta = parse_avi_header(bytes(patched))
    assert meta["bit_count"] == 24 and meta["compression"] == 0
    feats, _ = video_feature_vector(bytes(patched), every_ms=200)
    ref, _ = video_feature_vector(base, every_ms=200)
    np.testing.assert_allclose(feats, ref)


def test_avi_zero_length_dropped_frames_use_on_screen_frame():
    """VfW dropped frames (size-0 00dc chunks) must not become failure
    rows: the previous frame is on screen at that time."""
    w, h = 8, 4
    frames = [np.full((h, w, 3), v, dtype=np.uint8) for v in (10, 250)]
    avi = bytearray(_handwritten_avi(frames, fps=10))
    # append two zero-length 00dc chunks inside movi and fix sizes
    movi_at = bytes(avi).index(b"LIST" + struct.pack("<I", 0)[:0] + b"", 0)  # noqa
    movi_at = bytes(avi).rindex(b"movi") - 8
    empty = b"00dc" + struct.pack("<I", 0)
    avi.extend(empty * 2)
    (movi_size,) = struct.unpack_from("<I", avi, movi_at + 4)
    struct.pack_into("<I", avi, movi_at + 4, movi_size + 2 * len(empty))
    (riff_size,) = struct.unpack_from("<I", avi, 4)
    struct.pack_into("<I", avi, 4, riff_size + 2 * len(empty))

    lums, meta = sample_avi_luminance(bytes(avi), every_ms=100)
    assert meta["total_frames"] == 4  # 2 real + 2 dropped
    # times 0/100/200/300ms → frames 0,1,2,3; 2 and 3 are dropped →
    # frame 1 stays on screen; dedupe → 2 decoded frames
    assert meta["sampled_frames"] == 2
    np.testing.assert_allclose(lums[0], np.full(w * h, 10.0))
    np.testing.assert_allclose(lums[1], np.full(w * h, 250.0))
