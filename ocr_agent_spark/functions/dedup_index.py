"""Incremental dedup: a persisted corpus index for delta-vs-history.

A production crawl pipeline does not re-shuffle its 100 TB historical
corpus every time a daily delta arrives; it dedups the NEW rows against
a persisted fingerprint/signature index and appends the survivors.
This module is that arc (the dedup-side twin of the IVF index's
build-once / query-many shape, `similarity.build_ivf_index`):

- :func:`build_dedup_index` — one pass over the corpus writes
  (doc_id, fp) exact md5 fingerprints and (doc_id, minhash) signatures
  under a versioned directory.
- :func:`dedup_against_index` — new docs lose to (a) exact-fp matches
  against history, (b) near-matches against history by MinHash
  signature agreement, (c) their own internal duplicates via the
  normal in-batch `dedup.dedup_near` path. Only the delta is
  fingerprinted/shuffled; the history side is two slim column scans.
- :func:`append_dedup_index` — surviving delta rows join the index as
  a marker-committed append delta (crash-atomic: an append is visible
  only after its ``_COMMITTED`` marker lands, mirroring
  `append_ivf_index`).

Near-match semantics against history use the ESTIMATED jaccard — the
fraction of agreeing minhash components (the textbook unbiased MinHash
estimator) — because the index stores signatures, not shingle sets:
storing shingles would make the index a multiple of the corpus itself.
The estimator's resolution is 1/num_hashes; `est_jaccard` is exposed
so callers see exactly what was compared. In-batch (new-vs-new) dedup
keeps the exact-verify path.

The banding join against history is capped the same way as the
in-batch path (`max_bucket_size` broadcast anti-join on the UNION of
both sides' buckets) — a boilerplate bucket hot in history stays
bounded no matter how many deltas arrive.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_agent_spark.functions import dedup as _dedup
from ocr_agent_spark.functions.text import doc_fingerprint

_VERSION_PREFIX = "v_"


def _index_dir(path: str) -> str:
    versions = sorted(
        d for d in (os.listdir(path) if os.path.isdir(path) else [])
        if d.startswith(_VERSION_PREFIX)
        and os.path.exists(os.path.join(path, d, "_COMMITTED"))
    )
    if not versions:
        raise FileNotFoundError(f"no committed dedup index under {path}")
    return os.path.join(path, versions[-1])


def build_dedup_index(docs: DataFrame, path: str, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      num_hashes: int = 32) -> str:
    """Write fingerprints + signatures for ``docs``; returns the
    committed version directory. Pointer-flip commit: the version dir
    is listed by readers only once ``_COMMITTED`` exists."""
    vdir = os.path.join(path, f"{_VERSION_PREFIX}{uuid.uuid4().hex[:12]}")
    fps = docs.select(
        F.col(id_col).alias("doc_id"),
        doc_fingerprint(text_col).alias("fp"),
    )
    fps.write.mode("errorifexists").parquet(os.path.join(vdir, "fingerprints"))
    sig = _dedup.minhash_signatures(docs, id_col, text_col, n, num_hashes)
    sig.write.mode("errorifexists").parquet(os.path.join(vdir, "signatures"))
    tmp = os.path.join(path, f".commit-{os.path.basename(vdir)}")
    with open(tmp, "w") as fh:
        fh.write(f"n={n} num_hashes={num_hashes}")
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(vdir, "_COMMITTED"))
    return vdir


def _read_frames(spark: SparkSession, vdir: str, sub: str) -> DataFrame:
    frames = [spark.read.parquet(os.path.join(vdir, sub))]
    adir = os.path.join(vdir, "appends")
    if os.path.isdir(adir):
        for name in sorted(os.listdir(adir)):
            d = os.path.join(adir, name)
            if os.path.isdir(d) and os.path.exists(
                    os.path.join(d, "_COMMITTED")):
                frames.append(spark.read.parquet(os.path.join(d, sub)))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def append_dedup_index(docs: DataFrame, path: str, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 3,
                       num_hashes: int = 32) -> None:
    """Marker-committed append of ``docs``'s fingerprints + signatures
    into the current index version (call with the SURVIVORS of
    :func:`dedup_against_index`)."""
    vdir = _index_dir(path)
    adir = os.path.join(vdir, "appends", uuid.uuid4().hex[:12])
    docs.select(
        F.col(id_col).alias("doc_id"), doc_fingerprint(text_col).alias("fp")
    ).write.mode("errorifexists").parquet(os.path.join(adir, "fingerprints"))
    _dedup.minhash_signatures(docs, id_col, text_col, n, num_hashes) \
        .write.mode("errorifexists").parquet(os.path.join(adir, "signatures"))
    tmp = os.path.join(vdir, "appends", f".commit-{os.path.basename(adir)}")
    with open(tmp, "w") as fh:
        fh.write("committed")
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(adir, "_COMMITTED"))


def history_near_losers(new_docs: DataFrame, spark: SparkSession,
                        path: str, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        num_hashes: int = 32, bands: int = 8,
                        threshold: float = 0.8,
                        max_bucket_size: int = 10_000) -> DataFrame:
    """(doc_id, est_jaccard) new-side ids whose estimated jaccard
    against SOME history doc reaches ``threshold``.

    Candidates come from the same banding as the in-batch path — a new
    doc pairs with a history doc iff they share a full band — then the
    signature-agreement estimator verifies. Only (band, bucket) id rows
    and the candidate signatures shuffle; history text never moves.
    """
    hist_sig = _read_frames(spark, _index_dir(path), "signatures")
    new_sig = _dedup.minhash_signatures(new_docs, id_col, text_col,
                                        n, num_hashes)
    hb = _dedup._minhash_banded_table(hist_sig, num_hashes, bands)
    nb = _dedup._minhash_banded_table(new_sig, num_hashes, bands)
    # joint cap: a bucket's TOTAL population (history + delta) bounds
    # the join, same no-silent-cap class as the in-batch path
    hot = _dedup._hot_band_buckets(
        hb.unionByName(nb), max_bucket_size
    ).select("band", "bucket")
    hb = hb.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
    nb = nb.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
    cand = (
        nb.alias("n").join(hb.alias("h"), ["band", "bucket"])
        .select(F.col("n.doc_id").alias("new_id"),
                F.col("h.doc_id").alias("hist_id"))
        .distinct()
    )
    est = (
        cand.join(new_sig.select(F.col("doc_id").alias("new_id"),
                                 F.col("minhash").alias("sig_n")), "new_id")
        .join(hist_sig.select(F.col("doc_id").alias("hist_id"),
                              F.col("minhash").alias("sig_h")), "hist_id")
        .withColumn(
            "est_jaccard",
            F.aggregate(
                F.zip_with("sig_n", "sig_h",
                           lambda a, b: (a == b).cast("int")),
                F.lit(0), lambda acc, x: acc + x,
            ) / F.lit(float(num_hashes)),
        )
    )
    return (
        est.filter(F.col("est_jaccard") >= threshold)
        .groupBy(F.col("new_id").alias("doc_id"))
        .agg(F.max("est_jaccard").alias("est_jaccard"))
    )


def dedup_against_index(new_docs: DataFrame, spark: SparkSession,
                        path: str, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        num_hashes: int = 32, bands: int = 8,
                        threshold: float = 0.8,
                        max_bucket_size: int = 10_000,
                        in_batch: bool = True) -> DataFrame:
    """Delta-vs-history dedup: drop new docs that exactly or nearly
    match the indexed corpus, then (``in_batch``) collapse the
    remainder's internal duplicates with the exact-verify
    ``dedup.dedup_near`` path. Returns surviving rows of ``new_docs``.
    """
    vdir = _index_dir(path)
    hist_fp = _read_frames(spark, vdir, "fingerprints").select("fp")
    new_fp = new_docs.select(F.col(id_col).alias("doc_id"),
                             doc_fingerprint(text_col).alias("fp"))
    exact_losers = new_fp.join(hist_fp, "fp", "semi").select("doc_id")
    near_losers = history_near_losers(
        new_docs, spark, path, id_col, text_col, n, num_hashes, bands,
        threshold, max_bucket_size,
    ).select("doc_id")
    losers = exact_losers.union(near_losers).distinct()
    kept = new_docs.join(
        losers, new_docs[id_col] == losers["doc_id"], "left_anti"
    )
    if in_batch:
        # Lineage CUT before the in-batch pass: dedup_near references
        # its input several times (both pair sides + the exact-verify
        # join), and each reference would clone the whole
        # history-vs-delta plan above — measured as an analyzer/plan-
        # string OOM at a few hundred docs. The cut materializes only
        # the surviving DELTA rows (the new batch — small relative to
        # history by construction; history never re-materializes).
        kept = kept.localCheckpoint(eager=True)
        kept = _dedup.dedup_near(
            kept, id_col, text_col, n, num_hashes, bands, threshold,
            max_bucket_size=max_bucket_size,
        )
    return kept
