"""CCNet-style language-model quality scoring.

CCNet (Wenzek et al., 2020) buckets Common-Crawl documents into
head/middle/tail quality tiers by the perplexity of a small LM trained
on a clean corpus. This module reproduces that shape with an add-one
smoothed word-bigram model — deliberately simple so the ENTIRE
pipeline (training included) is relational algebra: token explode,
two aggregations, two joins, one log. No Python touches a row, and a
SQL engine can replay every step for the correctness oracle.

Scoring: for document tokens w1..wn (n ≥ 2),

    P(w_i | w_{i-1}) = (c(w_{i-1}, w_i) + 1) / (c(w_{i-1}) + V)
    log_ppl = -(1/(n-1)) * Σ ln P(w_i | w_{i-1})

with c(...) counted on the training split and V = training vocabulary
size. Unseen history words get c = 0 (the smoothing keeps the
probability finite). Documents with fewer than 2 tokens are excluded
(no bigram evidence).

Scale notes (100 TB):
- Training aggregates shuffle on (w1, w2) / w1; the hot keys are
  stopword pairs, collapsed map-side by partial aggregation.
- Scoring joins doc bigrams to the count tables on their keys. The
  bigram-count table of a real clean corpus is ~10⁸ rows — too big to
  blindly broadcast, so no hint is given; AQE broadcasts when it fits.
- V is a 1-row aggregate, cross-joined broadcast.
- Bucket assignment is a pure projection against fixed thresholds
  (CCNet uses per-language percentile cutoffs computed offline; fixed
  constants model that — a global ntile would serialize the corpus
  through one window task).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_agent_spark.functions.tfidf import TOKEN_PATTERN


@dataclass
class BigramLM:
    bigram_counts: DataFrame  # (w1, w2, c12)
    unigram_counts: DataFrame  # (w1, c1)
    vocab: DataFrame  # single row: (v,)


def _doc_bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) rows — one per adjacent token pair."""
    from ocr_agent_spark.partitioning import widen_if_narrow

    # widen-if-narrow (r8, guide §2.5): a single-row-group input would
    # serialize this CPU-heavy pass into one scan task; placement-only.
    docs = widen_if_narrow(docs)
    toks = docs.select(
        id_col,
        F.expr(
            f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"
        ).alias("_toks"),
    ).filter(F.size("_toks") >= 2)
    return toks.select(
        id_col,
        F.explode(
            F.expr(
                "transform(sequence(1, size(_toks) - 1), "
                "i -> struct(_toks[i-1] AS w1, _toks[i] AS w2))"
            )
        ).alias("_bg"),
    ).select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))


def train_bigram_lm(
    train_docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> BigramLM:
    from ocr_agent_spark.cache import persist_tracked

    # the training explode feeds two aggregates (and vocab derives
    # from the second) — persist so the pass over the training split
    # runs once, not three times (Spark shares no subtrees otherwise).
    bigrams = persist_tracked(_doc_bigrams(train_docs, text_col, id_col))
    bigram_counts = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    )
    unigram_counts = persist_tracked(
        bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    )
    # vocab = distinct tokens observed as a bigram HISTORY (w1) — the
    # denominator's event space; a 1-row aggregate.
    vocab = unigram_counts.agg(F.count(F.lit(1)).alias("v"))
    return BigramLM(bigram_counts, unigram_counts, vocab)


def score_log_perplexity(
    docs: DataFrame,
    lm: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_bigrams, log_ppl) — average negative log-likelihood per
    bigram, rounded to 6 decimals for cross-engine determinism."""
    bigrams = _doc_bigrams(docs, text_col, id_col)
    joined = (
        bigrams.join(lm.bigram_counts, ["w1", "w2"], "left")
        .join(lm.unigram_counts, ["w1"], "left")
        .crossJoin(F.broadcast(lm.vocab))
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + 1)
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
            ).alias("_lp"),
        )
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(-F.avg("_lp"), 6).alias("log_ppl"),
    )


def quality_bucket(
    scored: DataFrame,
    head_max: float,
    middle_max: float,
    ppl_col: str = "log_ppl",
) -> DataFrame:
    """CCNet tiers from fixed cutoffs: log_ppl < head_max → head,
    < middle_max → middle, else tail."""
    return scored.withColumn(
        "bucket",
        F.when(F.col(ppl_col) < head_max, F.lit("head"))
        .when(F.col(ppl_col) < middle_max, F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
