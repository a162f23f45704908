"""Corpus drift: compare token distributions between two snapshots.

A continuously-crawled corpus changes under you — a recrawl shifts
language mix, a new source floods boilerplate, a dedup-threshold
change silently reshapes the token distribution the tokenizer and
mixing ratios were tuned on. The standard monitoring signal is a
divergence between the unigram distributions of two snapshots:
Jensen-Shannon divergence (symmetric, bounded [0, ln 2], defined even
when one side has tokens the other lacks) plus the per-token
contributions that tell you WHAT drifted.

Scale shape: each side is one tokenize-explode with map-side combine
(the same shape as the proven token_histogram), the two histograms
meet in one full-outer join on token (both sides already partitioned
by the groupBy key — no extra exchange), and the divergence is one
slim aggregate. Nothing is driver-side; the top-contributor report is
a bounded top-k.

Everything replays in DuckDB (ln on both engines; contributions
rounded at 9 dp BEFORE the final sum so the engines add identical
addends — float-sum order inside one engine's aggregate is already
its own concern, which the small-count fixture keeps exact), so the
registry query carries a full value-hash oracle.

Reference parity: none (the OCR queue has no corpus-monitoring
notion); beyond-reference training-data surface, sibling of
functions/tfidf.py and corpus_overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_histogram_df(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, n) unigram counts — tokenize, explode, map-side combine."""
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"[ \t\r\n]+"),
        lambda t: t != F.lit(""),
    )
    return (
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def token_drift(old: DataFrame, new: DataFrame,
                text_col: str = "text") -> DataFrame:
    """Per-token drift table between two snapshots.

    Columns: token, n_old, n_new, p_old, p_new (6 dp), js_contrib
    (9 dp) — the token's addend in the Jensen-Shannon divergence
    JS(P,Q) = 0.5·KL(P‖M) + 0.5·KL(Q‖M), M = (P+Q)/2. Absent tokens
    contribute through the side that has them (JS needs no smoothing).
    Sum js_contrib for the scalar divergence
    (:func:`token_drift_summary`); sort by it for the what-changed
    report.
    """
    h_old = token_histogram_df(old, text_col).withColumnRenamed("n", "n_old")
    h_new = token_histogram_df(new, text_col).withColumnRenamed("n", "n_new")
    j = h_old.join(h_new, "token", "full_outer").fillna(
        0, subset=["n_old", "n_new"]
    )
    totals = j.agg(F.sum("n_old"), F.sum("n_new")).collect()[0]
    tot_old = totals[0] or 1
    tot_new = totals[1] or 1
    p = F.col("n_old") / F.lit(float(tot_old))
    q = F.col("n_new") / F.lit(float(tot_new))
    m = (p + q) / 2
    term_p = F.when(F.col("n_old") > 0, 0.5 * p * F.log(p / m)) \
        .otherwise(F.lit(0.0))
    term_q = F.when(F.col("n_new") > 0, 0.5 * q * F.log(q / m)) \
        .otherwise(F.lit(0.0))
    return j.select(
        "token",
        "n_old", "n_new",
        F.round(p, 6).alias("p_old"),
        F.round(q, 6).alias("p_new"),
        F.round(term_p + term_q, 9).alias("js_contrib"),
    )


def token_drift_summary(drift: DataFrame, top_k: int = 20) -> dict:
    """Scalar JS divergence + the top-k drifting tokens (bounded
    driver result — a report, not a dataset)."""
    js = drift.agg(F.sum("js_contrib")).collect()[0][0] or 0.0
    top = (
        drift.orderBy(F.col("js_contrib").desc(), "token")
        .limit(top_k).collect()
    )
    return {
        "js_divergence": round(float(js), 9),
        "top_tokens": [
            (r["token"], r["n_old"], r["n_new"], r["js_contrib"])
            for r in top
        ],
    }


def token_drift_sql(old_expr: str, new_expr: str) -> str:
    """DuckDB replay over two subqueries each yielding (text)."""
    def hist(expr: str) -> str:
        return f"""
            SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS n
            FROM ({expr}) s,
                 unnest(list_filter(regexp_split_to_array(
                     trim(lower(text)), '[ \\t\\r\\n]+'),
                     x -> x != '')) AS u(t)
            GROUP BY 1
        """

    return f"""
        WITH ho AS ({hist(old_expr)}), hn AS ({hist(new_expr)}),
        j AS (
            SELECT COALESCE(ho.token, hn.token) AS token,
                   COALESCE(ho.n, 0) AS n_old,
                   COALESCE(hn.n, 0) AS n_new
            FROM ho FULL OUTER JOIN hn ON ho.token = hn.token
        ),
        tot AS (
            SELECT GREATEST(SUM(n_old), 1) AS t_old,
                   GREATEST(SUM(n_new), 1) AS t_new FROM j
        )
        SELECT token, n_old, n_new,
               ROUND(n_old * 1.0 / t_old, 6) AS p_old,
               ROUND(n_new * 1.0 / t_new, 6) AS p_new,
               ROUND(
                 CASE WHEN n_old > 0 THEN 0.5 * (n_old * 1.0 / t_old)
                      * ln((n_old * 1.0 / t_old)
                           / ((n_old * 1.0 / t_old + n_new * 1.0 / t_new) / 2))
                      ELSE 0.0 END
                 + CASE WHEN n_new > 0 THEN 0.5 * (n_new * 1.0 / t_new)
                      * ln((n_new * 1.0 / t_new)
                           / ((n_old * 1.0 / t_old + n_new * 1.0 / t_new) / 2))
                      ELSE 0.0 END, 9) AS js_contrib
        FROM j, tot
    """
