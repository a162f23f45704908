"""Gopher/C4-style document quality gates for web-scale corpora.

The published heuristics every LLM training-data pipeline applies right
after extraction/dedup (Rae et al. 2021 "Scaling Language Models" §A1.1
— the Gopher rules; Raffel et al. 2020 — the C4 line rules). Reference
parity: the OCR-queue reference has no corpus-quality notion at all —
this is part of the beyond-reference training-data surface the brief
asks for.

Everything here is pure JVM column expressions (split / explode /
aggregate / window — no Python in the hot path) and SQL-replayable, so
each gate carries a full DuckDB oracle.

Three layers:

- :func:`gopher_quality_signals` / :func:`gopher_quality_keep` —
  document-level word statistics (word count, mean word length,
  symbol-to-word ratio, bullet/ellipsis line fractions, alpha-word
  fraction, stopword count) and the canonical keep predicate.
- :func:`repetition_stats` / :func:`repetition_keep` — duplicate-line
  / duplicate-paragraph fractions (count- and character-weighted) and
  top-2-gram character coverage; the Gopher repetition gate.
- :func:`c4_clean_lines` — the C4 line-level cleanup: keep lines that
  end in terminal punctuation, have ≥ ``min_words`` words, and carry
  neither "lorem ipsum", curly braces, nor "javascript" markers;
  reassemble surviving lines.

Scale shape: the signal layers are single-pass projections (no
shuffle); ``repetition_stats`` is one explode + one groupBy on doc_id
(map-side combine; line/paragraph rows are slim). Nothing is
quadratic, nothing collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the Gopher paper's "must contain ≥2 of these" stopword set
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# canonical Gopher thresholds (Rae et al. 2021, table A1)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_WORD_RATIO = 0.1
GOPHER_MAX_BULLET_LINE_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_LINE_FRAC = 0.3
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_STOPWORD_HITS = 2

# Gopher repetition thresholds
GOPHER_MAX_DUP_LINE_FRAC = 0.30
GOPHER_MAX_DUP_PARA_FRAC = 0.30
GOPHER_MAX_DUP_LINE_CHAR_FRAC = 0.20
GOPHER_MAX_DUP_PARA_CHAR_FRAC = 0.20
GOPHER_MAX_TOP_2GRAM_CHAR_FRAC = 0.20


def _words(text: Column) -> Column:
    return F.filter(
        F.split(F.trim(text), r"\s+"), lambda w: w != F.lit("")
    )


def _lines(text: Column) -> Column:
    # split on \r?\n so CRLF text never leaves a trailing \r inside the
    # line content — Java's '$' matches before a final \r while RE2's
    # does not, so a stray \r would silently diverge the line-anchor
    # rules from their DuckDB oracles (code-review r5)
    return F.filter(
        F.transform(F.split(text, r"\r?\n"), lambda ln: F.trim(ln)),
        lambda ln: ln != F.lit(""),
    )


def gopher_quality_signals(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Per-document Gopher word/line statistics — one projection pass,
    no shuffle, no UDFs.

    Columns: n_words, mean_word_len, symbol_word_ratio (# and … per
    word), bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
    stopword_hits.
    """
    from ocr_agent_spark.partitioning import widen_if_narrow

    # widen-if-narrow (r8, guide §2.5): a single-row-group input would
    # serialize this CPU-heavy pass into one scan task; placement-only.
    docs = widen_if_narrow(docs)
    t = F.col(text_col)
    words = _words(t)
    lines = _lines(t)
    n_words = F.size(words)
    n_lines = F.size(lines)
    total_word_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    # "…" (U+2026) counts as one ellipsis alongside ASCII "..." —
    # scraped HTML overwhelmingly uses the typographic form (advice r5)
    n_symbols = (
        F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
        + (F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", ""))) / 3
        + (F.length(t) - F.length(F.regexp_replace(t, "…", "")))
    )
    n_bullet = F.size(F.filter(lines, lambda ln: ln.rlike(r"^[-*•]")))
    n_ellipsis = F.size(
        F.filter(lines, lambda ln: ln.rlike("(\\.\\.\\.|…)$"))
    )
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    lowered = F.transform(words, lambda w: F.lower(w))
    stop_hits = F.size(
        F.filter(lowered, lambda w: w.isin(*GOPHER_STOPWORDS))
    )
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(
            F.when(n_words > 0, total_word_chars / n_words).otherwise(F.lit(0.0)), 6
        ).alias("mean_word_len"),
        F.round(
            F.when(n_words > 0, n_symbols / n_words).otherwise(F.lit(0.0)), 6
        ).alias("symbol_word_ratio"),
        F.round(
            F.when(n_lines > 0, n_bullet / n_lines).otherwise(F.lit(0.0)), 6
        ).alias("bullet_line_frac"),
        F.round(
            F.when(n_lines > 0, n_ellipsis / n_lines).otherwise(F.lit(0.0)), 6
        ).alias("ellipsis_line_frac"),
        F.round(
            F.when(n_words > 0, n_alpha_words / n_words).otherwise(F.lit(0.0)), 6
        ).alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
    )


def gopher_keep_predicate(min_words: int = GOPHER_MIN_WORDS,
                          max_words: int = GOPHER_MAX_WORDS) -> Column:
    """ALL Gopher rules as one boolean over the signal columns."""
    return (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(
            GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN
        )
        & (F.col("symbol_word_ratio") <= GOPHER_MAX_SYMBOL_WORD_RATIO)
        & (F.col("bullet_line_frac") <= GOPHER_MAX_BULLET_LINE_FRAC)
        & (F.col("ellipsis_line_frac") <= GOPHER_MAX_ELLIPSIS_LINE_FRAC)
        & (F.col("alpha_word_frac") >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (F.col("stopword_hits") >= GOPHER_MIN_STOPWORD_HITS)
    )


def gopher_quality_keep(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        min_words: int = GOPHER_MIN_WORDS,
                        max_words: int = GOPHER_MAX_WORDS) -> DataFrame:
    """Documents passing ALL Gopher quality rules (canonical
    thresholds; word-count band parameterized for small test corpora).
    Returns the surviving rows of ``docs`` unchanged."""
    sig = gopher_quality_signals(docs, id_col, text_col)
    keep = sig.filter(
        gopher_keep_predicate(min_words, max_words)
    ).select(id_col)
    return docs.join(keep, id_col, "left_semi")


def host_quality_priors(docs: DataFrame, host_col: str = "host",
                        id_col: str = "doc_id", text_col: str = "text",
                        min_words: int = GOPHER_MIN_WORDS,
                        max_words: int = GOPHER_MAX_WORDS) -> DataFrame:
    """Per-host quality aggregates — the FineWeb-style host prior.

    Training pipelines score HOSTS, not just documents: a host whose
    pages overwhelmingly fail the quality gates gets demoted (or
    dropped) wholesale, which is both cheaper than per-page judging on
    the next crawl and robust to single-page flukes. One row per host:
    ``n_docs``, ``n_keep`` (pass ALL Gopher rules), ``keep_rate``,
    ``total_words``, ``mean_words``, ``mean_stopword_hits``.

    Exactness: counts/sums are integers; the three ratios are single
    IEEE divisions of exact integers — deterministic across engines
    and partitionings. One projection + one groupBy(host) with
    map-side combine; host skew only concentrates ADDITION, which the
    partial aggregation absorbs (a mega-host collapses to one row per
    map task before the exchange).
    """
    sig = gopher_quality_signals(docs, id_col, text_col)
    hosted = sig.join(docs.select(id_col, host_col), id_col)
    keep = gopher_keep_predicate(min_words, max_words).cast("long")
    return (
        hosted.groupBy(host_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(keep).alias("n_keep"),
            F.sum("n_words").alias("total_words"),
            F.sum("stopword_hits").alias("total_stopword_hits"),
        )
        .select(
            host_col,
            "n_docs",
            "n_keep",
            (F.col("n_keep") / F.col("n_docs")).alias("keep_rate"),
            "total_words",
            (F.col("total_words") / F.col("n_docs")).alias("mean_words"),
            (F.col("total_stopword_hits") / F.col("n_docs"))
            .alias("mean_stopword_hits"),
        )
    )


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher repetition signals per document.

    - ``dup_line_frac`` / ``dup_para_frac``: 1 − distinct/total over
      trimmed non-empty lines (split ``\\n``) and paragraphs (split on
      blank lines, ``(?:\\r?\\n){2,}``).
    - ``dup_line_char_frac`` / ``dup_para_char_frac``: fraction of
      line/paragraph characters living in units that occur more than
      once (count × length weighted).
    - ``top_2gram_char_frac``: characters covered by the most common
      word 2-gram (count × gram length / total text length); ties
      break toward the larger coverage.

    Plan: one explode per unit kind → count per (doc, unit) → one
    groupBy(doc) aggregation each (map-side combine; shuffled rows are
    (doc_id, unit-stats) only) → join the three slim signal tables on
    doc_id. Documents with no units keep 0.0 everywhere.
    """
    from ocr_agent_spark.partitioning import widen_if_narrow

    # widen-if-narrow (r8, guide §2.5): a single-row-group input would
    # serialize this CPU-heavy pass into one scan task; placement-only.
    docs = widen_if_narrow(docs)
    t = F.col(text_col)

    def unit_stats(units: Column, out_prefix: str) -> DataFrame:
        u = docs.select(
            F.col(id_col), F.explode(units).alias("_u")
        )
        per = u.groupBy(id_col, "_u").agg(F.count(F.lit(1)).alias("_c"))
        return per.groupBy(id_col).agg(
            F.round(
                (F.lit(1.0) - F.count(F.lit(1)) / F.sum("_c")), 6
            ).alias(f"dup_{out_prefix}_frac"),
            F.round(
                F.sum(F.when(F.col("_c") > 1, F.col("_c") * F.length("_u"))
                      .otherwise(F.lit(0)))
                / F.sum(F.col("_c") * F.length("_u")), 6
            ).alias(f"dup_{out_prefix}_char_frac"),
        )

    lines = _lines(t)
    paras = F.filter(
        F.transform(F.split(t, r"(?:\r?\n){2,}"), lambda p: F.trim(p)),
        lambda p: p != F.lit(""),
    )
    line_stats = unit_stats(lines, "line")
    para_stats = unit_stats(paras, "para")

    words = _words(F.lower(t))
    grams = F.when(F.size(words) >= 2, F.transform(
        F.sequence(F.lit(0), F.size(words) - 2),
        lambda i: F.concat(
            F.element_at(words, i + 1), F.lit(" "), F.element_at(words, i + 2)
        ),
    )).otherwise(F.array().cast("array<string>"))
    g = docs.select(F.col(id_col), F.length(t).alias("_len"),
                    F.explode(grams).alias("_g"))
    per_g = g.groupBy(id_col, "_len", "_g").agg(F.count(F.lit(1)).alias("_c"))
    gram_stats = per_g.groupBy(id_col).agg(
        F.round(
            F.max(F.col("_c") * F.length("_g")) / F.max("_len"), 6
        ).alias("top_2gram_char_frac"),
    )

    ids = docs.select(id_col)
    out = (
        ids.join(line_stats, id_col, "left")
        .join(para_stats, id_col, "left")
        .join(gram_stats, id_col, "left")
    )
    return out.select(
        id_col,
        *[
            F.coalesce(F.col(c), F.lit(0.0)).alias(c)
            for c in ("dup_line_frac", "dup_line_char_frac",
                      "dup_para_frac", "dup_para_char_frac",
                      "top_2gram_char_frac")
        ],
    )


def repetition_keep(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Documents passing the Gopher repetition gate (canonical
    thresholds). Returns surviving ``docs`` rows unchanged."""
    sig = repetition_stats(docs, id_col, text_col)
    keep = sig.filter(
        (F.col("dup_line_frac") <= GOPHER_MAX_DUP_LINE_FRAC)
        & (F.col("dup_para_frac") <= GOPHER_MAX_DUP_PARA_FRAC)
        & (F.col("dup_line_char_frac") <= GOPHER_MAX_DUP_LINE_CHAR_FRAC)
        & (F.col("dup_para_char_frac") <= GOPHER_MAX_DUP_PARA_CHAR_FRAC)
        & (F.col("top_2gram_char_frac") <= GOPHER_MAX_TOP_2GRAM_CHAR_FRAC)
    ).select(id_col)
    return docs.join(keep, id_col, "left_semi")


def c4_clean_lines(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   min_words: int = 3) -> DataFrame:
    """The C4 line-level cleanup (Raffel et al. 2020 §2.2), vectorized
    as array expressions — keep a line iff it

    - ends in terminal punctuation (. ! ? or closing quote),
    - has at least ``min_words`` words,
    - contains no curly brace, no "lorem ipsum", no "javascript"
      (case-insensitive);

    then drop documents whose surviving text is empty. Output:
    (id, text) with ``text`` = surviving lines re-joined by ``\\n``.
    One projection pass, no shuffle, no Python.
    """
    from ocr_agent_spark.partitioning import widen_if_narrow

    # widen-if-narrow (r8, guide §2.5): a single-row-group input would
    # serialize this CPU-heavy pass into one scan task; placement-only.
    docs = widen_if_narrow(docs)
    t = F.col(text_col)
    lines = F.transform(F.split(t, r"\r?\n"), lambda ln: F.trim(ln))
    kept = F.filter(
        lines,
        lambda ln: ln.rlike(r'[.!?]["”’]?$')
        & (F.size(_words(ln)) >= min_words)
        & ~F.lower(ln).contains("lorem ipsum")
        & ~ln.contains("{")
        & ~ln.contains("}")
        & ~F.lower(ln).contains("javascript"),
    )
    out = docs.select(
        F.col(id_col), F.array_join(kept, "\n").alias(text_col)
    )
    return out.filter(F.length(text_col) > 0)
