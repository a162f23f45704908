"""TF-IDF keyword extraction over the document corpus.

The classic corpus-statistics operator a training-data pipeline uses
for topic tagging, stopword discovery, and per-domain vocabulary
audits. Everything is pure JVM: tokenize with a regexp, explode,
aggregate, window — no Python touches a row.

Scale notes (100 TB):
- The explode is linear in token count and stays inside whole-stage
  codegen; the payload column is dropped before the explode so only
  (doc_id, term) rows ever shuffle.
- Document frequency aggregates on `term` — the skewed keys are
  stopwords ("the" appears in every doc), but `count(distinct)` is
  rewritten to a two-level aggregate with map-side partials, so the
  hot term collapses per-partition before the exchange.
- The per-document top-k window partitions on doc_id (millions of
  small groups — the safe direction; no single task sees more than
  one document's vocabulary).
- N (corpus size) is a 1-row aggregate broadcast into the join.

IDF convention: smoothed sklearn form idf = ln((N + 1)/(df + 1)) + 1,
so terms present in every document still carry weight 1 and a term
never divides by zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_PATTERN = "[a-z0-9]+"


def _terms(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, term) pairs: lowercase, alnum runs, one row per occurrence."""
    from ocr_agent_spark.partitioning import widen_if_narrow

    # widen-if-narrow (r8, guide §2.5): a single-row-group input would
    # serialize this CPU-heavy pass into one scan task; placement-only.
    df = widen_if_narrow(df)
    return (
        df.select(id_col, F.lower(F.col(text_col)).alias("_t"))
        .select(
            id_col,
            F.explode(F.regexp_extract_all("_t", F.lit(TOKEN_PATTERN), 0))
            .alias("term"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_term_len: int = 2,
) -> DataFrame:
    """Top-k terms per document by tf-idf.

    Returns (doc_id, term, tf, score) with score rounded to 6 decimals
    and ties broken lexicographically on term — fully deterministic, so
    a SQL engine can replay it byte-for-byte.
    """
    from ocr_agent_spark.cache import persist_tracked

    terms = _terms(docs, text_col, id_col).filter(
        F.length("term") >= min_term_len
    )
    # tf feeds BOTH the scoring join and the df aggregate; without a
    # persist Spark rebuilds the token explode + aggregate for each
    # reference (verified: 0 ReusedExchange in the unpersisted plan) —
    # a 2× waste of the dominant pass at corpus scale.
    tf = persist_tracked(
        terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    df_counts = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )  # tf already has one row per (doc, term): plain count == distinct docs
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    # no broadcast hint on df_counts: the vocabulary of a 100 TB crawl
    # (every typo is a term) can exceed driver memory — let AQE pick
    # broadcast when the vocab is actually small.
    scored = (
        tf.join(df_counts, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score")
    )


def corpus_document_frequency(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
) -> DataFrame:
    """(term, df) table for stopword discovery / vocabulary audits."""
    terms = _terms(docs, text_col, id_col).distinct()
    return (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
