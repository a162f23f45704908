"""Extraction QA: score extracted text against a golden reference.

The north rule's correctness bar is byte-identical extraction per url
— but a pipeline also needs to QUANTIFY how a candidate extractor
diverges when it does (regression triage across extractor versions,
coverage audits against a labeled subset, judging a third-party
extraction). The standard boilerplate-removal metrics (Cleaneval /
boilerpipe evaluations) are token-level precision/recall/F1 per
document; this module computes them as one pure-JVM projection:

- exact: byte equality (the north-rule invariant, surfaced per row)
- token precision  |E ∩ G| / |E|  (how much of the extraction is real)
- token recall     |E ∩ G| / |G|  (how much of the gold survived)
- F1, and the token counts that feed corpus-level aggregates

Token sets are whitespace-split, lowercased, DISTINCT (set semantics —
the established Cleaneval simplification; duplicated-token weighting
belongs to the golden tests, which already pin byte equality).

Zero shuffle, zero Python; every expression replays in DuckDB
(list_distinct/list_intersect), so the registry query carries a full
value-hash oracle. Corpus rollup is one slim aggregate.

Reference parity: the reference verifies extraction with golden-file
equality in its test suite (/root/reference/tests/, markdown bytes);
this generalizes that check into a scalable scoring operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _token_set(c: Column) -> Column:
    return F.array_distinct(
        F.filter(F.split(F.trim(F.lower(c)), r"[ \t\r\n]+"),
                 lambda t: t != F.lit(""))
    )


def extraction_eval(pairs: DataFrame, extracted_col: str = "extracted",
                    golden_col: str = "golden",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document extraction scores — one shuffle-free projection.

    Output: (id, exact, n_extracted, n_golden, n_common, precision,
    recall, f1), floats rounded to 6dp for engine-portable hashing.
    Empty-vs-empty scores as perfect (both sides agree there is no
    content); empty-vs-nonempty as zero.
    """
    e = _token_set(F.col(extracted_col))
    g = _token_set(F.col(golden_col))
    common = F.size(F.array_intersect(e, g))
    ne, ng = F.size(e), F.size(g)
    prec = F.when(ne > 0, common / ne).otherwise(
        F.when(ng == 0, F.lit(1.0)).otherwise(F.lit(0.0)))
    rec = F.when(ng > 0, common / ng).otherwise(
        F.when(ne == 0, F.lit(1.0)).otherwise(F.lit(0.0)))
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)) \
        .otherwise(F.lit(0.0))
    return pairs.select(
        F.col(id_col),
        (F.coalesce(F.col(extracted_col), F.lit(""))
         == F.coalesce(F.col(golden_col), F.lit(""))).alias("exact"),
        ne.cast("int").alias("n_extracted"),
        ng.cast("int").alias("n_golden"),
        common.cast("int").alias("n_common"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def extraction_eval_summary(scores: DataFrame) -> DataFrame:
    """Corpus rollup (one slim aggregate): doc counts, exact-match
    rate, micro- and macro-averaged precision/recall."""
    return scores.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg(F.col("exact").cast("double")), 6)
        .alias("exact_rate"),
        F.round(F.sum("n_common") / F.sum("n_extracted"), 6)
        .alias("micro_precision"),
        F.round(F.sum("n_common") / F.sum("n_golden"), 6)
        .alias("micro_recall"),
        F.round(F.avg("precision"), 6).alias("macro_precision"),
        F.round(F.avg("recall"), 6).alias("macro_recall"),
    )


def extraction_eval_sql(pairs_expr: str, id_col: str = "doc_id") -> str:
    """DuckDB replay over ``pairs_expr`` yielding
    (id, extracted, golden)."""
    def ts(col: str) -> str:
        return (f"list_distinct(list_filter(regexp_split_to_array("
                f"trim(lower({col})), '[ \\t\\r\\n]+'), t -> t != ''))")

    return f"""
        WITH t AS (
            SELECT {id_col},
                   COALESCE(extracted, '') AS e_raw,
                   COALESCE(golden, '') AS g_raw,
                   {ts('extracted')} AS e, {ts('golden')} AS g
            FROM ({pairs_expr}) p
        ),
        s AS (
            SELECT {id_col}, e_raw = g_raw AS exact,
                   len(e) AS ne, len(g) AS ng,
                   len(list_intersect(e, g)) AS nc
            FROM t
        ),
        pr AS (
            SELECT *,
                   CASE WHEN ne > 0 THEN nc * 1.0 / ne
                        WHEN ng = 0 THEN 1.0 ELSE 0.0 END AS prec,
                   CASE WHEN ng > 0 THEN nc * 1.0 / ng
                        WHEN ne = 0 THEN 1.0 ELSE 0.0 END AS rec
            FROM s
        )
        SELECT {id_col}, exact,
               CAST(ne AS INT) AS n_extracted,
               CAST(ng AS INT) AS n_golden,
               CAST(nc AS INT) AS n_common,
               ROUND(prec, 6) AS precision,
               ROUND(rec, 6) AS recall,
               ROUND(CASE WHEN prec + rec > 0
                     THEN 2 * prec * rec / (prec + rec)
                     ELSE 0.0 END, 6) AS f1
        FROM pr
    """


def synthetic_eval_pairs_expr(dialect: str) -> tuple[str, str]:
    """(extracted_expr, golden_expr) fragments planting controlled
    divergence per documents row: exact copies, truncations (recall
    loss), boilerplate injection (precision loss), empty extractions,
    and an empty-golden row."""
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect: {dialect!r}")
    golden = ("CASE WHEN doc_id % 11 = 7 THEN '' "
              "ELSE substr(text, 1, 200) END")
    extracted = (
        "CASE "
        "WHEN doc_id % 11 = 7 THEN '' "
        "WHEN doc_id % 5 = 1 THEN substr(text, 1, 100) "
        "WHEN doc_id % 5 = 2 THEN substr(text, 1, 200) || "
        "' cookie policy navbar footer qqq' "
        "WHEN doc_id % 5 = 3 THEN '' "
        f"ELSE {golden} END"
    )
    return extracted, golden
