"""Model-based quality classification — the hashed linear scorer.

The GPT-3 / CCNet pipelines gate documents with a lightweight linear
classifier (fastText-style): bag of words → hashing trick into D
buckets → sparse dot product with a weight vector → sigmoid. This
module implements that scoring path as pure relational algebra:
explode tokens, md5-bucket them, join a weight table, aggregate, one
sigmoid — no Python in the hot path, every step SQL-replayable.

The WEIGHTS here are a deterministic stand-in (a fixed md5-keyed
pseudo-random projection, documented below), not a trained model —
this container has no training corpus or fastText. The plumbing is
the deliverable: swap `hash_weights` for a real trained weight table
(a (bucket, weight) DataFrame) and nothing else changes.

Scale notes (100 TB):
- The token explode is the same linear pass tf-idf uses; only
  (doc_id, bucket) rows shuffle, and the weight join key is a bounded
  int domain (D buckets) — broadcast when D is small (the hint is on:
  D defaults to 4096, a few KB).
- Per-doc aggregation is a partial-agg sum; no windows.
- md5 (not xxhash64) as the bucket hash so any engine reproduces the
  identical buckets — same engine-portability rule as doc_fingerprint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_agent_spark.functions.tfidf import TOKEN_PATTERN


def _bucket(col: F.Column, dim: int) -> F.Column:
    """Token → [0, dim) bucket via the first 8 md5 hex digits —
    engine-portable (DuckDB: CAST(('0x' || substr(md5(t),1,8)) AS
    BIGINT) % dim gives the same value)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % dim
    )


def hash_weights(spark, dim: int = 4096, seed: str = "qclf-v1") -> DataFrame:
    """Deterministic stand-in weight table (bucket, weight_micro):
    weight_micro = floor(md5(seed:bucket) first-8-hex · 10⁶ / 2³²) −
    500000, i.e. uniform micro-units of [-0.5, 0.5). FIXED-POINT
    integers, not doubles: the classifier's distributed dot product is
    then exact BIGINT arithmetic, so aggregation order can never land
    a float sum on a different side of the final round-to-6 boundary
    than a single-node replay (observed: 3/400 docs flipped the 6th
    decimal with float weights). Replace with a trained table
    (same column contract) in production."""
    b = F.col("id").cast("long").alias("bucket")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + ":"),
                                   F.col("id").cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    # h·10⁶ < 2⁵², and /2³² is a power-of-two scale — floor over
    # doubles is still exact integer division here.
    micro = F.floor(h * 1000000 / F.lit(4294967296)).cast("long") - 500000
    return spark.range(dim).select(b, micro.alias("weight_micro"))


def train_quality_weights(
    labeled: DataFrame,
    dim: int = 4096,
    text_col: str = "text",
    label_col: str = "label",
    alpha: float = 1.0,
) -> DataFrame:
    """LEARN a (bucket, weight_micro) table from labeled documents —
    per-bucket multinomial Naive-Bayes log-odds, trained entirely with
    relational algebra (token explode → bucket → two aggregations →
    one log), so DuckDB can replay the training pass for the oracle.

    For bucket b with token counts c1(b) in label=1 (clean) docs and
    c0(b) in label=0 (spam) docs, add-alpha smoothed:

        w(b) = ln((c1(b)+α) / (N1+α·D)) − ln((c0(b)+α) / (N0+α·D))

    with N1/N0 the total token mass per class and D = dim. Every one
    of the D buckets gets a row (zero-count buckets carry the
    smoothing prior), quantized to micro-units so ``classify_quality``
    keeps its exact-BIGINT dot product — the weight table honors the
    same column contract as ``hash_weights``, and NOTHING else in the
    scoring path changes: the production swap the module docstring
    claims, demonstrated.

    Scale: training shuffles only (bucket, label) pairs — a ≤ 2·D-row
    aggregate after map-side partial aggregation, however large the
    labeled corpus; the totals are a 2-row aggregate broadcast back.
    """
    spark = labeled.sparkSession
    terms = labeled.select(
        F.col(label_col).cast("int").alias("_y"),
        F.explode(
            F.expr(
                f"regexp_extract_all(lower({text_col}), "
                f"'{TOKEN_PATTERN}', 0)"
            )
        ).alias("term"),
    )
    per_bucket = (
        terms.select("_y", _bucket(F.col("term"), dim).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.col("_y")).alias("c1"),
            F.sum(1 - F.col("_y")).alias("c0"),
        )
    )
    totals = per_bucket.agg(
        F.coalesce(F.sum("c1"), F.lit(0)).alias("n1"),
        F.coalesce(F.sum("c0"), F.lit(0)).alias("n0"),
    )
    all_buckets = spark.range(dim).select(F.col("id").cast("long").alias("bucket"))
    w = (
        F.log((F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha))
              / (F.col("n1") + F.lit(alpha * dim)))
        - F.log((F.coalesce(F.col("c0"), F.lit(0)) + F.lit(alpha))
                / (F.col("n0") + F.lit(alpha * dim)))
    )
    return (
        all_buckets.join(per_bucket, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(w * 1000000).cast("long").alias("weight_micro"),
        )
    )


def classify_quality(
    docs: DataFrame,
    weights: DataFrame,
    dim: int = 4096,
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_terms, logit, prob) — sparse dot product of the hashed
    bag-of-words with the weight table, then a sigmoid. Counts repeat
    tokens (bag, not set). Docs with zero tokens are excluded (no
    features — the caller's gate policy decides their fate)."""
    terms = docs.select(
        id_col,
        F.explode(
            F.expr(
                f"regexp_extract_all(lower({text_col}), "
                f"'{TOKEN_PATTERN}', 0)"
            )
        ).alias("term"),
    )
    bucketed = terms.select(id_col, _bucket(F.col("term"), dim).alias("bucket"))
    scored = (
        bucketed.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("weight_micro").alias("_dot_micro"),  # exact BIGINT
        )
    )
    # mean-pool (fastText averages the bag) so length doesn't dominate;
    # the only float op is this one division of two exact integers.
    logit = F.round(
        F.col("_dot_micro") / (F.col("n_terms") * 1000000.0) + F.lit(bias), 6
    )
    return scored.select(
        id_col,
        "n_terms",
        logit.alias("logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("prob"),
    )


def quality_gate(
    scored: DataFrame, threshold: float = 0.5, prob_col: str = "prob"
) -> DataFrame:
    """Keep rows whose classifier probability clears the threshold."""
    return scored.filter(F.col(prob_col) >= threshold)
