"""DSIR-style data selection: importance resampling on hashed n-grams.

Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) — the published method for pulling target-like
documents out of a raw crawl: fit bucketed hashed-n-gram unigram
distributions over a small TARGET corpus and the RAW corpus, weight
every raw document by the log-likelihood ratio of its n-grams, then
resample with Gumbel top-k so selection probability tracks the
importance weight.

Spark-first shape, engine-replayable end to end:

- Hashed features reuse the ``functions/embed.py`` conventions
  (lowercased whitespace uni+bigrams; bucket = first 8 md5 hex chars
  mod B) so DuckDB replays tokenize→hash verbatim.
- The two bucket distributions are B-row aggregates (B ≤ a few
  thousand) — broadcast joins, never a shuffle of the corpus.
- The per-bucket log-ratio quantizes to integer micro-units ONCE
  (``round((ln p_t − ln p_r)·1e6)`` → BIGINT), so every document's
  log-weight is an exact integer dot product Σ count·micro —
  order-independent, partition-independent, bit-stable.
- Gumbel noise derives from the md5 uniform
  (``functions/sampling.deterministic_uniform``), quantized to
  micro-units the same way: the sampling key is exact integer
  arithmetic too.

Scale shape: one token explode over the raw corpus (linear, map-side
combined into (doc, bucket) counts with at most B rows per doc), one
over the (small) target corpus; everything else is B-row or per-doc
projections. Top-k is ``TakeOrderedAndProject``.

Reference parity: beyond-reference training-data surface (the OCR
queue has no corpus-selection notion), like functions/sampling.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_agent_spark.functions.embed import _tokens
from ocr_agent_spark.functions.sampling import deterministic_uniform

DEFAULT_BUCKETS = 256
DEFAULT_SEED = "dsir"
DEFAULT_SMOOTHING = 0.5


def _bucket(tok: Column, n_buckets: int, seed: str) -> Column:
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed + ":"), tok)), 1, 8),
            16, 10,
        ).cast("long")
        % n_buckets
    )


def hashed_ngram_bucket_counts(
    docs: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    seed: str = DEFAULT_SEED,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, bucket, c): hashed uni+bigram occurrence counts per doc."""
    from ocr_agent_spark.partitioning import widen_if_narrow

    # widen-if-narrow (r8, guide §2.5): a single-row-group input would
    # serialize this CPU-heavy pass into one scan task; placement-only.
    docs = widen_if_narrow(docs)
    return (
        docs.select(id_col, F.explode(_tokens(F.col(text_col))).alias("_tok"))
        .select(id_col, _bucket(F.col("_tok"), n_buckets, seed).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _bucket_log_ratio_micros(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int,
    seed: str,
    smoothing: float,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """(bucket, micro): round((ln p_target − ln p_raw)·1e6) per bucket.

    Laplace-smoothed over ALL B buckets so absent buckets carry
    ``α/(C + αB)`` mass. Built over the full 0..B−1 grid (a range
    literal), so documents hitting a bucket unseen in either corpus
    still score.
    """
    def dist(d: DataFrame, alias: str) -> DataFrame:
        counts = (
            hashed_ngram_bucket_counts(d, n_buckets, seed, text_col, id_col)
            .groupBy("bucket")
            .agg(F.sum("c").alias("cb"))
        )
        return counts.select("bucket", F.col("cb").alias(f"cb_{alias}"))

    grid = (
        raw.sparkSession.range(n_buckets)
        .select(F.col("id").cast("long").alias("bucket"))
    )
    joined = (
        grid.join(F.broadcast(dist(target, "t")), "bucket", "left")
        .join(F.broadcast(dist(raw, "r")), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("cb_t", F.lit(0)).alias("ct"),
            F.coalesce("cb_r", F.lit(0)).alias("cr"),
        )
    )
    tot = joined.agg(
        F.sum("ct").alias("tot_t"), F.sum("cr").alias("tot_r")
    )
    a = float(smoothing)
    ab = a * n_buckets
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                (
                    F.log((F.col("ct") + a) / (F.col("tot_t") + ab))
                    - F.log((F.col("cr") + a) / (F.col("tot_r") + ab))
                )
                * 1e6
            )
            .cast("long")
            .alias("micro"),
        )
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    seed: str = DEFAULT_SEED,
    smoothing: float = DEFAULT_SMOOTHING,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, log_weight): exact Σ count·micro / 1e6 per raw document.

    Token-less documents get weight 0.0 (kept in the output — dropping
    them silently would bias any downstream keep-rate accounting).
    """
    ratios = _bucket_log_ratio_micros(
        raw, target, n_buckets, seed, smoothing, text_col, id_col
    )
    doc_counts = hashed_ngram_bucket_counts(
        raw, n_buckets, seed, text_col, id_col
    )
    weights = (
        doc_counts.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("c") * F.col("micro")).alias("_micros"))
    )
    return (
        raw.select(id_col)
        .join(weights, id_col, "left")
        .select(
            id_col,
            (F.coalesce("_micros", F.lit(0)) / 1e6).alias("log_weight"),
        )
    )


def dsir_sample_keys(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    seed: str = DEFAULT_SEED,
    smoothing: float = DEFAULT_SMOOTHING,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, log_weight, sample_key): Gumbel-perturbed resampling keys.

    ``sample_key = log_weight + Gumbel(md5-uniform)`` in exact
    micro-units; taking the top-k by ``sample_key`` samples documents
    with probability proportional to their importance weight
    (Gumbel-max trick) — deterministically, because the noise is keyed
    on the document id.
    """
    w = dsir_log_weights(
        raw, target, n_buckets, seed, smoothing, text_col, id_col
    )
    u = deterministic_uniform(id_col, seed=seed + "-gumbel")
    gumbel_micros = F.round(-F.log(-F.log(u)) * 1e6).cast("long")
    return w.select(
        id_col,
        "log_weight",
        (
            (F.round(F.col("log_weight") * 1e6).cast("long") + gumbel_micros)
            / 1e6
        ).alias("sample_key"),
    )


def dsir_topk(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = DEFAULT_BUCKETS,
    seed: str = DEFAULT_SEED,
    smoothing: float = DEFAULT_SMOOTHING,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The selection: top-k raw documents by Gumbel-perturbed weight."""
    keys = dsir_sample_keys(
        raw, target, n_buckets, seed, smoothing, text_col, id_col
    )
    return keys.orderBy(
        F.col("sample_key").desc(), F.col(id_col).asc()
    ).limit(k)
