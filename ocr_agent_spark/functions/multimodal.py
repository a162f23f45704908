"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns + a typed metadata struct —
the same pattern as the ``html:binary`` payload column: bytes never
leave the JVM except through Arrow batches into pandas UDFs. The
container ships no media libraries, so *pixel* decoding is stubbed,
but image **metadata** decoding is real (stdlib header parsing):

- ``decode_backend="headers"`` (default) → REAL container sniff +
  width/height from PNG/JPEG/GIF/BMP/TIFF headers (kernel/imagemeta.py
  + kernel/tiffimage.py);
  malformed image payloads become failure rows. For PNGs (every legal
  shape: all depths, palette, Adam7), BMPs (raw, bitfields, RLE8/4),
  GIFs (pure-Python LZW, first frame, interlace) and JPEGs — baseline
  AND progressive (kernel/jpegdecode.py: full Huffman + T.81 Annex G
  scan accumulation + batched-numpy IDCT of the luma plane) — the
  feature vector is also REAL: a 16-bin luminance histogram from a
  full pixel decode (``imagemeta.image_luminance_histogram``) —
  validated against real-encoder files on this host for all four
  formats in both JPEG coding modes, plus baseline TIFF (strips,
  none/PackBits/LZW compression, bilevel/gray/gray16/RGB/palette,
  both byte orders). Arithmetic-coded JPEGs fall back
  to fake features (``feature_source='fake'``). Audio and video are
  REAL too for the codecs this environment can decode: RIFF/WAVE
  integer-PCM + IEEE-float audio (kernel/wavaudio.py — temporal RMS +
  spectral band energies) and RIFF/AVI uncompressed BI_RGB video
  (kernel/avivideo.py — timeline frame sampling + pooled luminance
  histogram). Compressed codecs (MP3/OGG audio, MJPG/H.264 video —
  need ffmpeg) fall back to fake SAMPLE features, but their container
  headers parse for real (kernel/mediacontainer.py: ID3v2/MPEG frame
  headers, MP4 boxes, Matroska EBML) → typed duration_ms /
  sample_rate / channels / codec / dims columns with
  ``feature_source='header'``.
- ``decode_backend="fake"``  → everything faked, keyed on payload
  bytes (stable hashes → stable "pixels") — plumbing-only mode.
- ``decode_backend="none"``  → NotImplementedError per row, surfaced as
  failure rows (status/error), never a job abort — D2 semantics.

Full pixel backends (PIL/ffmpeg) slot in behind the same interface:
each ``_fake_*`` function documents the real call it stands in for.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURES_SCHEMA = (
    "media_id long, kind string, status string, error string, "
    "feature array<float>, feature_source string, format string, "
    "src_width int, src_height int, "
    "out_width int, out_height int, n_frames int, "
    "duration_ms int, sample_rate int, channels int, codec string"
)


def _stable_floats(data: bytes, n: int, salt: str) -> list[float]:
    """Deterministic pseudo-features from payload bytes (the fake)."""
    out: list[float] = []
    counter = 0
    while len(out) < n:
        h = hashlib.sha256(salt.encode() + data[:4096] + counter.to_bytes(4, "big")).digest()
        out.extend(b / 255.0 for b in h)
        counter += 1
    return out[:n]


def _fake_image_decode(data: bytes, target: tuple[int, int]) -> dict:
    """Stands in for: PIL.Image.open(io.BytesIO(data)).resize(target)."""
    feats = _stable_floats(data, 16, f"img:{target[0]}x{target[1]}")
    return {"feature": feats, "out_width": target[0], "out_height": target[1], "n_frames": 1}


def _fake_audio_features(data: bytes) -> dict:
    """Stands in for: torchaudio/librosa mel-spectrogram summary."""
    return {"feature": _stable_floats(data, 16, "audio"), "out_width": None,
            "out_height": None, "n_frames": 1}


def _fake_video_frame_sample(data: bytes, every_ms: int) -> dict:
    """Stands in for: ffmpeg -i ... fps sampling → per-frame features."""
    n_frames = 1 + (len(data) % 8)
    return {"feature": _stable_floats(data, 16, f"vid:{every_ms}"),
            "out_width": None, "out_height": None, "n_frames": n_frames}


def extract_media_features(media: DataFrame, decode_backend: str = "headers",
                           resize_to: tuple[int, int] = (64, 64),
                           frame_every_ms: int = 1000,
                           num_partitions: int | None = None) -> DataFrame:
    """media table → per-item feature rows via mapInPandas.

    Partitioning: hash of media_id (payloads are size-skewed, ids are
    not). The binary column is column-pruned away after this stage —
    downstream consumers only see the 16-float feature + metadata.

    ``headers`` backend: image format/src_width/src_height come from a
    REAL stdlib header parse (kernel/imagemeta.py); a payload that is
    not a parseable image becomes a failure row (D2), like a malformed
    PDF in the extraction stage.

    ``feature_source`` says per row whether ``feature`` came from a
    real pixel decode (``"real"``: PNG/BMP/GIF/TIFF/JPEG-baseline/
    JPEG-progressive luminance histogram, WAV audio, AVI video) or a
    deterministic stand-in
    (``"fake"``: arithmetic-coded JPEG, audio, video — no PIL/ffmpeg in
    this environment). Downstream consumers at corpus scale should
    filter ``feature_source = 'real'`` rather than reverse-engineering
    which formats decode.
    """
    spark = media.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_agent_spark.kernel.avivideo import (
            UnsupportedVideoError,
            video_feature_vector,
        )
        from ocr_agent_spark.kernel.imagemeta import (
            UnsupportedImageError,
            image_luminance,
            luminance_histogram,
            parse_image_dimensions,
            resize_luminance,
        )
        from ocr_agent_spark.kernel.mediacontainer import (
            MediaContainerError,
            UnsupportedContainerError,
            parse_media_container,
        )
        from ocr_agent_spark.kernel.wavaudio import (
            UnsupportedAudioError,
            audio_feature_vector,
        )

        def try_container(data: bytes) -> dict | None:
            """Compressed-container header parse (mp3/mp4/mkv/ogg/flac).

            A payload that POSITIVELY identifies as one of these
            containers (ID3 tag, ftyp box, EBML magic) but is broken
            raises → failure row, same D2 contract as a corrupt WAV;
            anything merely unrecognized returns None (fake fallback —
            it may be a codec we can't even sniff).
            """
            definite = (
                data[:3] == b"ID3"
                or data[4:8] == b"ftyp"
                or data[:4] == b"\x1a\x45\xdf\xa3"
                or data[:4] == b"OggS"
                or data[:4] == b"fLaC"
            )
            try:
                return parse_media_container(data)
            except UnsupportedContainerError:
                return None
            except MediaContainerError:
                if definite:
                    raise
                return None

        cols = ["media_id", "kind", "status", "error", "feature",
                "feature_source", "format",
                "src_width", "src_height", "out_width", "out_height",
                "n_frames", "duration_ms", "sample_rate", "channels",
                "codec"]
        for batch in batches:
            rows: dict[str, list] = {c: [] for c in cols}
            for media_id, kind, payload in zip(
                batch["media_id"], batch["kind"], batch["payload"]
            ):
                rows["media_id"].append(media_id)
                rows["kind"].append(kind)
                try:
                    if decode_backend == "none":
                        raise NotImplementedError(
                            f"no {kind} decode backend in this environment"
                        )
                    data = bytes(payload)
                    fmt = src_w = src_h = None
                    dur = sr = ch = codec = None
                    source = "fake"
                    if kind == "image":
                        if decode_backend == "headers":
                            fmt, src_w, src_h = parse_image_dimensions(data)
                            res = None
                            # REAL pixel decode: PNG (every legal
                            # shape), BMP (raw/bitfields/RLE), GIF
                            # (LZW, first frame), JPEG baseline +
                            # progressive (jpegdecode.py) — the
                            # actual 16-bin luminance histogram.
                            # Shapes needing PIL (arithmetic JPEG,
                            # exotic BMP headers) raise
                            # UnsupportedImageError and fall back
                            # to fake features; a CORRUPT body
                            # raises ImageFormatError → failure
                            # row, same D2 contract as a malformed
                            # PDF.
                            try:
                                # decode → REAL nearest-neighbor resize
                                # to the target → features over the
                                # RESIZED pixels (the PIL semantics the
                                # fake stood in for), so out_width/
                                # out_height report what was computed
                                w0, h0, lum = image_luminance(data)
                                rw, rh = resize_to
                                rl = resize_luminance(w0, h0, lum, rw, rh)
                                res = {
                                    "feature": luminance_histogram(rw, rh, rl, 16),
                                    "out_width": rw,
                                    "out_height": rh,
                                    "n_frames": 1,
                                }
                                source = "real"
                            except UnsupportedImageError:
                                res = None
                            if res is None:
                                res = _fake_image_decode(data, resize_to)
                        else:
                            res = _fake_image_decode(data, resize_to)
                    elif kind == "audio":
                        res = None
                        if (decode_backend == "headers"
                                and data[:4] == b"RIFF" and data[8:12] == b"WAVE"):
                            # REAL WAV decode (PCM 8/16/24/32, float
                            # 32/64, any channel count). A WAV that
                            # needs a codec (ADPCM/MP3-in-WAV) falls
                            # back to fake; a CORRUPT WAV raises
                            # AudioFormatError → failure row. Non-RIFF
                            # audio (mp3/ogg/flac bytes) is valid media
                            # we can't decode → fake, never a failure.
                            try:
                                feats, ameta = audio_feature_vector(data)
                                fmt = "wav"
                                codec = "pcm"
                                sr = ameta["sample_rate"]
                                ch = ameta["channels"]
                                dur = ameta["duration_ms"]
                                res = {"feature": feats, "out_width": None,
                                       "out_height": None, "n_frames": 1}
                                source = "real"
                            except UnsupportedAudioError:
                                res = None
                        if res is None and decode_backend == "headers":
                            # compressed container (mp3 etc.): REAL
                            # typed header metadata, honestly-fake
                            # sample features (no codec in this env)
                            cmeta = try_container(data)
                            if cmeta is not None:
                                fmt = cmeta["format"]
                                codec = cmeta["codec"]
                                dur = cmeta["duration_ms"]
                                sr = cmeta["sample_rate"]
                                ch = cmeta["channels"]
                                source = "header"
                                res = _fake_audio_features(data)
                        if res is None:
                            res = _fake_audio_features(data)
                    elif kind == "video":
                        res = None
                        if (decode_backend == "headers"
                                and data[:4] == b"RIFF" and data[8:12] == b"AVI "):
                            # REAL AVI frame sampling (uncompressed
                            # BI_RGB DIB frames on the avih timeline).
                            # Compressed codecs → fake fallback;
                            # corrupt AVI → failure row.
                            try:
                                feats, vmeta = video_feature_vector(
                                    data, every_ms=frame_every_ms
                                )
                                fmt = "avi"
                                codec = "rawvideo"
                                dur = vmeta["duration_ms"]
                                src_w = vmeta["width"]
                                src_h = vmeta["height"]
                                res = {"feature": feats,
                                       "out_width": vmeta["width"],
                                       "out_height": vmeta["height"],
                                       "n_frames": vmeta["sampled_frames"]}
                                source = "real"
                            except UnsupportedVideoError:
                                res = None
                        if res is None and decode_backend == "headers":
                            # mp4 / mkv / webm container metadata
                            cmeta = try_container(data)
                            if cmeta is not None:
                                fmt = cmeta["format"]
                                codec = cmeta["codec"]
                                dur = cmeta["duration_ms"]
                                sr = cmeta["sample_rate"]
                                ch = cmeta["channels"]
                                src_w = cmeta["width"]
                                src_h = cmeta["height"]
                                source = "header"
                                res = _fake_video_frame_sample(
                                    data, frame_every_ms
                                )
                        if res is None:
                            res = _fake_video_frame_sample(data, frame_every_ms)
                    else:
                        raise ValueError(f"unknown media kind: {kind!r}")
                    rows["status"].append("completed")
                    rows["error"].append(None)
                    rows["feature"].append(res["feature"])
                    rows["feature_source"].append(source)
                    rows["format"].append(fmt)
                    rows["src_width"].append(src_w)
                    rows["src_height"].append(src_h)
                    rows["out_width"].append(res["out_width"])
                    rows["out_height"].append(res["out_height"])
                    rows["n_frames"].append(res["n_frames"])
                    rows["duration_ms"].append(dur)
                    rows["sample_rate"].append(sr)
                    rows["channels"].append(ch)
                    rows["codec"].append(codec)
                except Exception as exc:
                    rows["status"].append("failed")
                    rows["error"].append(repr(exc))
                    for c in ("feature", "feature_source", "format",
                              "src_width", "src_height",
                              "out_width", "out_height", "n_frames",
                              "duration_ms", "sample_rate", "channels",
                              "codec"):
                        rows[c].append(None)
            yield pd.DataFrame(rows)

    partitioned = media.repartition(num_partitions, F.col("media_id"))
    return partitioned.mapInPandas(run, schema=FEATURES_SCHEMA)


def fake_media_table(spark, n: int = 30, seed: int = 42) -> DataFrame:
    """Deterministic media fixture rows.

    ALL payloads are REAL container bytes: images round-robin PNG/JPEG/
    GIF/BMP (kernel/imagemeta.py + jpegdecode.py), audio rows are real
    PCM/float WAVs (kernel/wavaudio.py, varying bit depth / channels /
    rate), video rows are real uncompressed AVIs (kernel/avivideo.py,
    varying geometry / frame count / fps) — so the ``headers`` backend
    produces genuine dimensions AND genuine features for every row.
    """
    import random

    from ocr_agent_spark.kernel.avivideo import build_avi
    from ocr_agent_spark.kernel.imagemeta import (
        build_bmp,
        build_gif,
        build_png,
    )
    from ocr_agent_spark.kernel.jpegdecode import build_jpeg
    from ocr_agent_spark.kernel.tiffimage import build_tiff
    from ocr_agent_spark.kernel.wavaudio import build_wav

    def _tiff(w, h, seed=0):
        comp = ["none", "packbits", "lzw"][seed % 3]
        return build_tiff(w, h, seed=seed, compression=comp)

    builders = [build_png, build_jpeg, build_gif, build_bmp, _tiff]
    wav_shapes = [(8, 1), (16, 1), (16, 2), (24, 1), (32, 2), (64, 1)]
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        rng = random.Random(f"{seed}:media:{i}")
        kind = kinds[i % 3]
        if kind == "image":
            w = h = 64  # pixel builders are pure Python — fixed small size
            payload = builders[(i // 3) % len(builders)](w, h, seed=i)
            rows.append((i, kind, payload, "image/fixture", w, h, None))
        elif kind == "audio":
            bits, ch = wav_shapes[(i // 3) % len(wav_shapes)]
            dur = rng.randint(100, 400)
            payload = build_wav(duration_ms=dur, sample_rate=8000,
                                channels=ch, bits=bits, seed=i)
            rows.append((i, kind, payload, "audio/wav", None, None, dur))
        else:
            nf = rng.randint(4, 16)
            fps = rng.choice([5, 10, 25])
            w, h = rng.choice([(32, 24), (24, 32), (40, 16)])
            payload = build_avi(width=w, height=h, n_frames=nf,
                                fps=fps, seed=i)
            rows.append((i, kind, payload, "video/x-msvideo", w, h,
                         int(round(nf * 1000 / fps))))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def fake_compressed_media_table(spark, n: int = 18, seed: int = 42) -> DataFrame:
    """Deterministic COMPRESSED-container media rows
    (mp3/mp4/mkv/ogg/flac).

    Payloads are real spec-conformant container bytes from the
    hand-rolled writers (kernel/mediacontainer.py) — the ``headers``
    backend extracts genuine duration/codec/dims/sample-rate from them
    (``feature_source='header'``); sample data is absent by
    construction, exactly like a real crawl payload whose codec this
    environment can't decode.
    """
    import random

    from ocr_agent_spark.kernel.mediacontainer import (
        build_flac,
        build_mkv,
        build_mp3,
        build_mp4,
        build_ogg,
    )

    rows = []
    for i in range(n):
        rng = random.Random(f"{seed}:cmedia:{i}")
        which = i % 5
        if which == 3:
            sr = rng.choice([44100, 48000])
            ch = rng.choice([1, 2])
            dur = rng.randint(1000, 30000)
            codec = rng.choice(["vorbis", "opus"])
            payload = build_ogg(duration_ms=dur, sample_rate=sr,
                                channels=ch, codec=codec)
            rows.append((1000 + i, "audio", payload, "audio/ogg",
                         None, None, dur))
            continue
        if which == 4:
            sr = rng.choice([44100, 48000, 96000])
            ch = rng.choice([1, 2])
            dur = rng.randint(1000, 30000)
            payload = build_flac(duration_ms=dur, sample_rate=sr,
                                 channels=ch)
            rows.append((1000 + i, "audio", payload, "audio/flac",
                         None, None, dur))
            continue
        if which == 0:
            sr = rng.choice([44100, 48000, 32000])
            ch = rng.choice([1, 2])
            dur = rng.randint(1000, 30000)
            payload = build_mp3(duration_ms=dur, sample_rate=sr,
                                channels=ch,
                                with_id3=bool(i % 2),
                                with_xing=bool((i // 2) % 2))
            rows.append((1000 + i, "audio", payload, "audio/mpeg",
                         None, None, dur))
        elif which == 1:
            w, h = rng.choice([(320, 240), (1280, 720), (640, 360)])
            dur = rng.randint(1000, 60000)
            payload = build_mp4(duration_ms=dur, width=w, height=h,
                                audio=(rng.choice([44100, 48000]),
                                       rng.choice([1, 2])))
            rows.append((1000 + i, "video", payload, "video/mp4",
                         w, h, dur))
        else:
            w, h = rng.choice([(640, 360), (1920, 1080)])
            dur = rng.randint(1000, 60000)
            payload = build_mkv(duration_ms=dur, width=w, height=h,
                                doctype=rng.choice(["webm", "matroska"]))
            rows.append((1000 + i, "video", payload, "video/webm",
                         w, h, dur))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
