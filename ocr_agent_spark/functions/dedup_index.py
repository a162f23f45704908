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

The SEMANTIC twin (``build_semantic_index`` / ``append_semantic_index``
/ ``semantic_dedup_against_index``) does the same for embedding-space
dedup: the index persists each vector's banded random-hyperplane
signature rows (plus the vectors themselves for the exact-cosine
verify), so a daily delta joins its banded signatures against history's
PRECOMPUTED banding — no re-clustering of the historical corpus, no
history-side plane evaluation, ever. Banding parameters (bands,
rows_per_band, seed, dim) are frozen in the commit marker and ENFORCED
on read: a delta banded with different planes would silently miss every
history candidate, so a mismatch raises instead.
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


_SEM_PREFIX = "s_"


def _sem_index_dir(path: str) -> str:
    versions = sorted(
        d for d in (os.listdir(path) if os.path.isdir(path) else [])
        if d.startswith(_SEM_PREFIX)
        and os.path.exists(os.path.join(path, d, "_COMMITTED"))
    )
    if not versions:
        raise FileNotFoundError(f"no committed semantic index under {path}")
    return os.path.join(path, versions[-1])


def _sem_params(vdir: str) -> dict:
    import json

    with open(os.path.join(vdir, "_COMMITTED")) as fh:
        return json.loads(fh.read())


def _sem_check_params(vdir: str, bands: int, rows_per_band: int,
                      seed: int) -> dict:
    p = _sem_params(vdir)
    got = {"bands": bands, "rows_per_band": rows_per_band, "seed": seed}
    frozen = {k: p[k] for k in got}
    if frozen != got:
        raise ValueError(
            f"semantic index at {vdir!r} was built with {frozen}, "
            f"query passed {got} — differently-banded signatures would "
            "silently miss every history candidate"
        )
    return p


def _sem_banded(embeddings: DataFrame, id_col: str, vec_col: str,
                bands: int, rows_per_band: int, seed: int) -> DataFrame:
    from ocr_agent_spark.functions.similarity import _banded_signature_table

    return _banded_signature_table(
        embeddings, id_col, vec_col, bands, rows_per_band, seed
    )


def build_semantic_index(embeddings: DataFrame, path: str,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding", bands: int = 12,
                         rows_per_band: int = 12, seed: int = 42) -> str:
    """Write vectors + banded hyperplane signatures for ``embeddings``;
    returns the committed version directory. Pointer-flip commit like
    :func:`build_dedup_index`; the commit marker freezes the banding
    parameters (and the vector dim) and readers enforce them."""
    import json

    # Aggregate-validated dim FIRST (ADVICE r7): a single sampled row
    # lets a mixed-dimension input pass the frozen-dim enforcement
    # silently, and first() on an empty input is a bare TypeError deep
    # inside the banding helper. Checked before any file is written so
    # a bad input can never leave a half-built version directory.
    dims = embeddings.agg(
        F.count_distinct(F.size(F.col(vec_col))).alias("n"),
        F.max(F.size(F.col(vec_col))).alias("d"),
    ).first()
    if dims["d"] is None:
        raise ValueError("build_semantic_index: empty embeddings input")
    if dims["n"] != 1:
        raise ValueError(
            f"build_semantic_index: mixed embedding dims "
            f"({dims['n']} distinct sizes) — the index freezes ONE dim"
        )
    dim = dims["d"]

    vdir = os.path.join(path, f"{_SEM_PREFIX}{uuid.uuid4().hex[:12]}")
    vecs = embeddings.select(
        F.col(id_col).alias("doc_id"), F.col(vec_col).alias("embedding")
    )
    vecs.write.mode("errorifexists").parquet(os.path.join(vdir, "vectors"))
    banded = _sem_banded(embeddings, id_col, vec_col, bands,
                         rows_per_band, seed)
    banded.write.mode("errorifexists").parquet(os.path.join(vdir, "banded"))
    tmp = os.path.join(path, f".commit-{os.path.basename(vdir)}")
    with open(tmp, "w") as fh:
        fh.write(json.dumps({"bands": bands, "rows_per_band": rows_per_band,
                             "seed": seed, "dim": dim}))
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(vdir, "_COMMITTED"))
    return vdir


def append_semantic_index(embeddings: DataFrame, path: str,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> None:
    """Marker-committed append of ``embeddings``'s vectors + banded
    signatures into the current semantic index version (call with the
    SURVIVORS of :func:`semantic_dedup_against_index`). Banding
    parameters come from the index's frozen commit marker — an append
    can never diverge from the build."""
    vdir = _sem_index_dir(path)
    p = _sem_params(vdir)
    adir = os.path.join(vdir, "appends", uuid.uuid4().hex[:12])
    embeddings.select(
        F.col(id_col).alias("doc_id"), F.col(vec_col).alias("embedding")
    ).write.mode("errorifexists").parquet(os.path.join(adir, "vectors"))
    _sem_banded(
        embeddings, id_col, vec_col, p["bands"], p["rows_per_band"],
        p["seed"],
    ).write.mode("errorifexists").parquet(os.path.join(adir, "banded"))
    tmp = os.path.join(vdir, "appends", f".commit-{os.path.basename(adir)}")
    with open(tmp, "w") as fh:
        fh.write("committed")
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(adir, "_COMMITTED"))


def semantic_history_losers(new_embs: DataFrame, spark: SparkSession,
                            path: str, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.95, bands: int = 12,
                            rows_per_band: int = 12, seed: int = 42,
                            max_bucket_size: int = 10_000) -> DataFrame:
    """(vec_id, cosine) new-side ids whose exact cosine against SOME
    indexed history vector reaches ``threshold``.

    Candidates: delta banded signatures (one plane-evaluation pass over
    the DELTA only) joined to history's PERSISTED banding on
    (band, bucket) — ids only, vectors never enter the shuffle. The
    joint hot-bucket cap is the same broadcast anti-join as the MinHash
    arc. Verify: exact cosine, fetching the two vectors by id (history
    side reads only the candidate ids' rows)."""
    from ocr_agent_spark.functions.similarity import cosine_similarity

    vdir = _sem_index_dir(path)
    p = _sem_check_params(vdir, bands, rows_per_band, seed)
    hist_banded = _read_frames(spark, vdir, "banded")
    hist_vecs = _read_frames(spark, vdir, "vectors")
    # Aggregate-validated dim (ADVICE r7) — one sampled row would let a
    # mixed-dim delta slip past the frozen-dim enforcement.
    dims = new_embs.agg(
        F.count_distinct(F.size(F.col(vec_col))).alias("n"),
        F.max(F.size(F.col(vec_col))).alias("d"),
    ).first()
    if dims["d"] is not None:
        if dims["n"] != 1:
            raise ValueError(
                f"delta has mixed embedding dims ({dims['n']} distinct "
                f"sizes); index dim is {p['dim']}"
            )
        if dims["d"] != p["dim"]:
            raise ValueError(
                f"delta embedding dim {dims['d']} != index dim {p['dim']}"
            )
    nb = _sem_banded(new_embs, id_col, vec_col, p["bands"],
                     p["rows_per_band"], p["seed"])
    hot = (
        hist_banded.unionByName(nb)
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("sz"))
        .filter(F.col("sz") > max_bucket_size)
        .select("band", "bucket")
    )
    hb = hist_banded.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
    nb = nb.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
    cand = (
        nb.alias("n").join(hb.alias("h"), ["band", "bucket"])
        .select(F.col("n.doc_id").alias("new_id"),
                F.col("h.doc_id").alias("hist_id"))
        .distinct()
    )
    raw = cosine_similarity(F.col("_vn"), F.col("_vh"))
    verified = (
        cand.join(new_embs.select(F.col(id_col).alias("new_id"),
                                  F.col(vec_col).alias("_vn")), "new_id")
        .join(hist_vecs.select(F.col("doc_id").alias("hist_id"),
                               F.col("embedding").alias("_vh")), "hist_id")
        .select("new_id", raw.alias("_cos"))
        .filter((~F.isnan(F.col("_cos"))) & (F.col("_cos") >= threshold))
    )
    return verified.groupBy(F.col("new_id").alias(id_col)).agg(
        F.round(F.max("_cos"), 6).alias("cosine")
    )


def semantic_dedup_against_index(new_embs: DataFrame, spark: SparkSession,
                                 path: str, id_col: str = "vec_id",
                                 vec_col: str = "embedding",
                                 threshold: float = 0.95, bands: int = 12,
                                 rows_per_band: int = 12, seed: int = 42,
                                 max_bucket_size: int = 10_000,
                                 in_batch: bool = True,
                                 max_iterations: int = 20,
                                 checkpoint_dir: str | None = None
                                 ) -> DataFrame:
    """Delta-vs-history SEMANTIC dedup: drop new embeddings whose
    cosine against the indexed corpus reaches ``threshold``, then
    (``in_batch``) collapse the remainder's internal semantic clusters
    with ``similarity.semantic_dedup_keep``. Returns surviving rows of
    ``new_embs`` — the set to :func:`append_semantic_index` and to
    admit into the corpus."""
    from ocr_agent_spark.functions.similarity import semantic_dedup_keep

    losers = semantic_history_losers(
        new_embs, spark, path, id_col, vec_col, threshold, bands,
        rows_per_band, seed, max_bucket_size,
    ).select(id_col)
    kept = new_embs.join(losers, id_col, "left_anti")
    if in_batch:
        # lineage cut before the component loop (same contract as the
        # MinHash twin below): semantic_dedup_keep references its input
        # repeatedly and would clone the history-join plan per round.
        kept = kept.localCheckpoint(eager=True)
        keep_ids = semantic_dedup_keep(
            kept, threshold, id_col, vec_col, bands, rows_per_band,
            seed, max_bucket_size, max_iterations, checkpoint_dir,
        )
        kept = kept.join(keep_ids, id_col, "left_semi")
    return kept


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
