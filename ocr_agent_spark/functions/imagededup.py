"""Perceptual image deduplication — aHash over REAL pixel decodes.

The multimodal tier of the dedup family: re-encoded, resized, or
metadata-stripped copies of an image hash to byte-different blobs, so
content fingerprints miss them. Average-hash (aHash) — downscale the
decoded luminance to 8×8, threshold each cell against the mean —
collapses such copies to the same (or Hamming-near) 64-bit
signature; near-duplicate collapse then reuses the SimHash banding +
popcount machinery from functions/dedup.py.

The decode is the repo's own stdlib kernel (PNG/BMP/GIF/TIFF/JPEG —
`kernel.imagemeta.image_luminance`); formats without a pixel decoder
produce an honest `status='undecodable'` row, never a fake hash.

Determinism: the mean threshold uses exact integer arithmetic
(pixel·64 > Σpixels — no float mean), the resize is the kernel's
integer nearest-neighbor, and the bit order is fixed (row-major,
MSB first), so a hash is a pure function of the decoded pixels on any
platform.

Scale notes (100 TB of crawl images):
- Hashing is one `mapInPandas` pass over the binary column — Arrow
  batches, image bytes never shuffle; only (id, 64-bit hash) rows
  move after this projection.
- Candidate generation is 4-band banding of the hash (pigeonhole:
  Hamming ≤ 3 ⇒ one 16-bit band equal) with the same broadcast
  anti-join bucket cap as text SimHash — a solid-color mega-cluster
  (millions of identical white JPEGs) collapses exactly BEFORE
  banding via groupBy(ahash), so it cannot flood a band bucket.
- Verification is a popcount inside the bucket join; the collapse is
  the pointer-jumping connected-components loop (O(log diameter)).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AHASH_DDL = (
    "media_id long, ahash long, width int, height int, status string"
)

_SIDE = 8  # 8×8 grid → 64-bit hash


def ahash64(data: bytes) -> tuple[int, int, int]:
    """(ahash, width, height) of one image — raises on undecodable
    input (the DataFrame wrapper converts that to a status row)."""
    from ocr_agent_spark.kernel.imagemeta import (
        image_luminance, resize_luminance,
    )

    w, h, lum = image_luminance(data)
    cells = resize_luminance(w, h, lum, _SIDE, _SIDE)
    total = sum(cells)
    bits = 0
    n = _SIDE * _SIDE
    for i, px in enumerate(cells):
        if px * n > total:  # exact integer mean comparison
            bits |= 1 << (n - 1 - i)
    if bits >= 1 << 63:  # two's-complement into a Spark LongType
        bits -= 1 << 64
    return bits, w, h


def image_ahash(media: DataFrame, id_col: str = "media_id",
                data_col: str = "data") -> DataFrame:
    """(media_id, ahash, width, height, status) — status is 'ok' or
    'undecodable' (ahash/dims null); corrupt bytes never kill the job."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows: dict[str, list] = {
                "media_id": [], "ahash": [], "width": [], "height": [],
                "status": [],
            }
            for mid, data in zip(batch[id_col], batch[data_col]):
                rows["media_id"].append(mid)
                try:
                    bits, w, h = ahash64(bytes(data))
                    rows["ahash"].append(bits)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["status"].append("ok")
                except Exception:
                    rows["ahash"].append(None)
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["status"].append("undecodable")
            # Nullable Int64, NOT plain lists: a batch mixing a None
            # (undecodable) with valid rows would otherwise upcast to
            # float64 and silently round hashes above 2^53 — observed
            # as batch-dependent phantom hash mismatches.
            yield pd.DataFrame(
                {
                    "media_id": pd.array(rows["media_id"], dtype="Int64"),
                    "ahash": pd.array(rows["ahash"], dtype="Int64"),
                    "width": pd.array(rows["width"], dtype="Int32"),
                    "height": pd.array(rows["height"], dtype="Int32"),
                    "status": rows["status"],
                }
            )

    return media.select(
        F.col(id_col).alias(id_col), F.col(data_col)
    ).mapInPandas(run, AHASH_DDL)


def image_hamming_pairs(hashes: DataFrame, max_hamming: int = 3,
                        max_bucket_size: int = 10_000) -> DataFrame:
    """(id_a, id_b, hamming) over decoded rows — 4-band banding +
    popcount verify, same plan shape (and the same skew cap) as
    dedup.simhash_near_duplicates."""
    from ocr_agent_spark.functions.dedup import _hot_band_buckets

    sig = hashes.filter(F.col("status") == "ok").select(
        "media_id", "ahash"
    )
    banded = sig.select(
        "media_id", "ahash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright(F.col("ahash"), i * 16)
                    .bitwiseAND(F.lit(0xFFFF)).alias("bucket"),
                )
                for i in range(4)
            ])
        ).alias("bb"),
    ).select("media_id", "ahash", "bb.band", "bb.bucket")
    banded = banded.join(
        F.broadcast(_hot_band_buckets(banded, max_bucket_size)
                    .select("band", "bucket")),
        ["band", "bucket"],
        "left_anti",
    )
    # Grouped in-row pair expansion (r8b, mirrors dedup's banded
    # paths): one exchange of the banded table instead of a self-join
    # reading it twice; state bounded by the upstream bucket cap.
    ok = (
        banded.groupBy("band", "bucket")
        .agg(F.array_sort(
            F.collect_list(F.struct("media_id", "ahash"))
        ).alias("_m"))
        .filter(F.size("_m") >= 2)
    )
    pairs = (
        ok.select(F.posexplode("_m").alias("_i", "_a"), "_m")
        .select(
            "_a",
            F.explode(
                F.slice(F.col("_m"), F.col("_i") + 2, F.size("_m"))
            ).alias("_b"),
        )
    )
    return (
        pairs.select(
            F.col("_a.media_id").alias("id_a"),
            F.col("_b.media_id").alias("id_b"),
            F.bit_count(
                F.col("_a.ahash").bitwiseXOR(F.col("_b.ahash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def image_dedup_keep(hashes: DataFrame, max_hamming: int = 3,
                     max_bucket_size: int = 10_000) -> DataFrame:
    """Surviving rows of `hashes`: one representative (min media_id)
    per perceptual cluster; undecodable rows always survive (no pixel
    evidence to drop them on — the honest default)."""
    pairs = image_hamming_pairs(hashes, max_hamming, max_bucket_size)
    from ocr_agent_spark.functions.dedup import connected_components

    comp = connected_components(
        pairs.select(F.col("id_a"), F.col("id_b"))
    )
    losers = comp.filter(F.col("doc_id") != F.col("component")).select(
        F.col("doc_id").alias("media_id")
    )
    return hashes.join(losers, "media_id", "left_anti")
