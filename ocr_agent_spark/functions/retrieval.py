"""BM25 ranked retrieval over the document corpus.

The data-selection primitive a training-data pipeline uses to pull
topic-relevant documents out of a crawl (query-anchored corpus
filtering, seed-document expansion, eval-set mining). Okapi BM25
(Robertson & Zaragoza 2009) with the Lucene non-negative idf form
``ln(1 + (N - df + 0.5)/(df + 0.5))``.

Spark-first shape — for a bounded query-term list the whole scorer is
a PROJECTION, not a join pipeline:

- Per-document token array comes from one ``regexp_extract_all``;
  ``dl`` (document length) is its ``size`` and each query term's
  ``tf`` is ``size(filter(toks, = term))`` — all inside whole-stage
  codegen, zero explode, zero shuffle, the payload column never moves.
- Corpus statistics (N, total token count, per-term document
  frequency) are ONE single-row aggregate over that projection,
  broadcast back with a ``crossJoin``.
- Per-term contributions go through integer micro-units
  (``round(x·1e6)`` → BIGINT) before summing so the cross-term sum is
  exact integer arithmetic — engine-replayable to the last bit apart
  from sub-ulp ``ln`` differences that the 1e-6 quantum absorbs.
- Top-k is ``orderBy(...).limit(k)`` — Spark plans
  ``TakeOrderedAndProject`` (per-partition heap + driver merge of k
  rows), not a global sort, so the ranking costs one scan at any
  corpus size.

Reference parity: the OCR queue has no retrieval surface (its queries
are status filters — /root/reference/src/ocr_agent/task_repository.py);
this is beyond-reference training-data surface like functions/tfidf.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_agent_spark.functions.tfidf import TOKEN_PATTERN

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document against ``query_terms``.

    Returns ``(id_col, n_matched, score)`` for documents matching at
    least one term. ``score`` is the BM25 sum with per-term
    contributions quantized to micro-units before the cross-term sum,
    so results are deterministic across engines and partitionings.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct")
    from ocr_agent_spark.cache import persist_tracked

    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0
    )
    def _tf(term: str):
        # nested fn (not a default-arg lambda): F.filter dispatches on
        # the lambda's arity, and a second `qt=qt` parameter would make
        # it receive (element, index) instead.
        return F.size(F.filter(F.col("_toks"), lambda x: x == F.lit(term)))

    tf_cols = [
        _tf(qt).alias(f"_tf{i}") for i, qt in enumerate(query_terms)
    ]
    # One regexp pass feeds both the stats aggregate and the scoring
    # projection; persist so the token extraction doesn't run twice.
    from ocr_agent_spark.partitioning import widen_if_narrow

    # widen-if-narrow (r8, guide §2.5): a single-row-group input would
    # serialize this CPU-heavy pass into one scan task; placement-only.
    docs = widen_if_narrow(docs)
    base = persist_tracked(
        docs.select(id_col, toks.alias("_toks"))
        .select(id_col, F.size("_toks").alias("_dl"), *tf_cols)
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_dl").alias("_total_dl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(query_terms))
        ],
    )
    avgdl = F.col("_total_dl") / F.col("_n")
    micros = []
    matched = []
    for i in range(len(query_terms)):
        tf = F.col(f"_tf{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df{i}") + 0.5)
            / (F.col(f"_df{i}") + 0.5)
        )
        contrib = (
            idf
            * tf
            * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * F.col("_dl") / avgdl))
        )
        micros.append(F.round(contrib * 1e6).cast("long"))
        matched.append((tf > 0).cast("int"))
    score_micros = micros[0]
    n_matched = matched[0]
    for m in micros[1:]:
        score_micros = score_micros + m
    for m in matched[1:]:
        n_matched = n_matched + m
    return (
        base.crossJoin(F.broadcast(stats))
        .select(
            id_col,
            n_matched.alias("n_matched"),
            (score_micros / 1e6).alias("score"),
        )
        .filter(F.col("n_matched") > 0)
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25; ties break on ``id_col`` ascending."""
    return (
        bm25_scores(docs, query_terms, k1, b, text_col, id_col)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bm25_oracle_sql(
    query_terms: list[str],
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB replay of ``bm25_topk`` — same micro-unit quantization."""
    toks = f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}')"
    tf_exprs = ", ".join(
        f"len(list_filter({toks}, x -> x = '{qt}')) AS tf{i}"
        for i, qt in enumerate(query_terms)
    )
    df_exprs = ", ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(query_terms))
    )
    micro_terms = " + ".join(
        f"CAST(round(ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5)) * tf{i}"
        f" * ({k1!r} + 1.0) / (tf{i} + {k1!r} * (1.0 - {b!r} + {b!r}"
        f" * dl / (total_dl * 1.0 / n))) * 1e6) AS BIGINT)"
        for i in range(len(query_terms))
    )
    matched = " + ".join(
        f"CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END"
        for i in range(len(query_terms))
    )
    return f"""
        WITH base AS (
            SELECT {id_col}, len({toks}) AS dl, {tf_exprs}
            FROM {table}
        ), stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(dl) AS BIGINT) AS total_dl, {df_exprs}
            FROM base
        )
        SELECT {id_col}, CAST(n_matched AS INT) AS n_matched,
               score_micros / 1e6 AS score
        FROM (
            SELECT {id_col}, ({matched}) AS n_matched,
                   ({micro_terms}) AS score_micros
            FROM base, stats
        )
        WHERE n_matched > 0
        ORDER BY score DESC, {id_col} ASC
        LIMIT {k}
    """
