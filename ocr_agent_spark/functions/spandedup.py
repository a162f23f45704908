"""Cross-document duplicate-SPAN removal (ExactSubstr-style).

The third dedup granularity between whole-document near-dup
(``dedup.dedup_near``) and paragraph dedup (``dedup.dedup_paragraphs``):
any run of ``span_tokens`` consecutive word tokens that occurs more
than once in the corpus survives only at its FIRST occurrence
(min (doc_id, position)); every other occurrence — quoted license
blocks, syndicated article bodies, templated SEO spans that cross
paragraph boundaries — is cut out of its document, overlapping cut
windows merging into maximal removed intervals. This is the
memorization-targeting dedup of Lee et al. 2021 ("Deduplicating
Training Data Makes Language Models Better", ExactSubstr), re-expressed
over token n-gram fingerprints instead of a distributed suffix array:
a duplicated substring of length ≥ span_tokens tokens is exactly a run
of ≥ 1 duplicated n-grams, so the removed-interval union converges to
the suffix-array answer at token granularity.

Scale shape (the 100 TB argument):
- Fingerprinting is pure JVM: tokens array → ``transform(sequence(...))``
  slice+hash per position — no UDF, no Python, no shuffle.
- The duplicate-span table comes from ``groupBy(fp)`` with partial
  aggregation: a boilerplate span shared by 10⁹ documents collapses
  map-side to one row per mapper BEFORE the shuffle (same argument as
  ``dedup_paragraphs`` — deliberately NOT a window over fp).
- The join back keys on fp with a ONE-row keeper side per fp — the
  AQE skew-join shape (enabled in session.py).
- Interval merging windows partition by doc_id — bounded by a single
  document's token count, never by corpus-wide key frequency.

Fingerprint is md5 over the space-joined span (engine-portable): the
``span_dedup_keep`` registry query replays the whole pipeline —
tokenize, slide, hash, keeper, interval-merge, reassemble — in DuckDB.

Whitespace is normalized to single spaces by tokenization; the
reassembled text is the surviving tokens joined by one space (documented
lossy-whitespace semantics, same as the reference dedup literature).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text_col: str) -> Column:
    return F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )


def span_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      span_tokens: int = 20) -> DataFrame:
    """(doc_id, pos, fp) — md5 of each ``span_tokens``-token window.

    Pure JVM: one projection builds every window hash per row via
    ``transform(sequence(0, n_spans-1))``; ``posexplode`` yields the
    position column. Docs shorter than ``span_tokens`` emit nothing.
    """
    toks = F.col("_toks")
    n_spans = F.size(toks) - F.lit(span_tokens - 1)
    fps = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(toks, i + 1, span_tokens))
        ),
    )
    from ocr_agent_spark.partitioning import widen_if_narrow

    # widen-if-narrow (r8, guide §2.5): a single-row-group input would
    # serialize this CPU-heavy pass into one scan task; placement-only.
    docs = widen_if_narrow(docs)
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    _tokens(text_col).alias("_toks"))
        .filter(F.size(toks) >= span_tokens)
        .select("doc_id", F.posexplode(fps).alias("pos", "fp"))
    )


def duplicate_span_stats(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         span_tokens: int = 20) -> DataFrame:
    """One-row corpus report: how much duplicated span mass exists.

    ``n_spans_total``, ``n_fps_distinct``, ``n_fps_duplicated``
    (fingerprints occurring >1 time), ``n_occurrences_removable``
    (non-keeper occurrences of duplicated fingerprints).
    """
    per = span_fingerprints(docs, id_col, text_col, span_tokens) \
        .groupBy("fp").agg(F.count(F.lit(1)).alias("cnt"))
    return per.agg(
        F.sum("cnt").cast("long").alias("n_spans_total"),
        F.count(F.lit(1)).cast("long").alias("n_fps_distinct"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).cast("long")
        .alias("n_fps_duplicated"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt") - 1).otherwise(0))
        .cast("long").alias("n_occurrences_removable"),
    )


def remove_duplicate_spans(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           span_tokens: int = 20) -> DataFrame:
    """Cut every non-first occurrence of a corpus-duplicated token span.

    Pipeline: span fingerprints → keeper per fp =
    ``min(struct(doc_id, pos))`` (map-side combine) → non-keeper
    occurrences become removal intervals [pos, pos+span_tokens) →
    per-document gaps-and-islands merge (running max of interval end)
    → surviving tokens rejoined with single spaces. A document whose
    every token is covered is dropped. Output: (id_col, text) with
    ``text`` replaced by the cleaned form; token-normalized whitespace
    (see module docstring).
    """
    sp = span_fingerprints(docs, id_col, text_col, span_tokens)
    keeper = sp.groupBy("fp").agg(
        F.min(F.struct("doc_id", "pos")).alias("k"),
        F.count(F.lit(1)).alias("cnt"),
    ).filter(F.col("cnt") > 1).select(
        "fp", F.col("k.doc_id").alias("k_doc"), F.col("k.pos").alias("k_pos")
    )
    cuts = (
        sp.join(keeper, "fp")
        .filter(~((F.col("doc_id") == F.col("k_doc"))
                  & (F.col("pos") == F.col("k_pos"))))
        .select("doc_id", F.col("pos").alias("start"),
                (F.col("pos") + F.lit(span_tokens)).alias("end"))
    )
    # gaps-and-islands: an interval starts a new island when its start
    # is past the running max end of everything before it. Window is
    # per-document — bounded by doc length, not corpus key frequency.
    w_prev = (
        Window.partitionBy("doc_id").orderBy("start", "end")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id").orderBy("start", "end")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = (
        cuts.withColumn(
            "new_island",
            F.when(
                F.col("start") > F.coalesce(F.max("end").over(w_prev),
                                            F.lit(-1)),
                1,
            ).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(w_run))
        .groupBy("doc_id", "island")
        .agg(F.min("start").alias("start"), F.max("end").alias("end"))
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("start", "end")).alias("cut_ivs"))
    )
    toks = F.col("_toks")
    base = docs.select(F.col(id_col).alias("doc_id"),
                       _tokens(text_col).alias("_toks"))
    joined = base.join(islands, "doc_id", "left")
    kept_toks = F.filter(
        F.transform(toks, lambda t, i: F.struct(t.alias("t"),
                                                i.alias("i"))),
        lambda s: ~F.exists(
            F.coalesce(F.col("cut_ivs"),
                       F.array().cast("array<struct<start:int,end:int>>")),
            lambda iv: (s["i"] >= iv["start"]) & (s["i"] < iv["end"]),
        ),
    )
    out = joined.select(
        F.col("doc_id").alias(id_col),
        F.concat_ws(" ", F.transform(kept_toks, lambda s: s["t"]))
        .alias(text_col),
    )
    return out.filter(F.col(text_col) != "")
