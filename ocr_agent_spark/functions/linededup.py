"""Within-document repeated-line removal (RefinedWeb-style cleaning).

Scraped pages repeat navigation/boilerplate lines INSIDE one document
(cookie banners re-injected per section, repeated headings, pagination
stubs). The published web pipelines (RefinedWeb §3.2 line-wise
corrections, C4's line filters) drop repeated lines within a document
before any cross-document dedup. Distinct from
``functions/dedup.dedup_paragraphs`` (cross-corpus paragraph dedup):
this one never leaves the row.

Spark-first shape: a pure per-row projection — ``split`` →
order-preserving first-occurrence filter via higher-order functions →
``array_join``. Zero shuffle, zero Python, linear in text size;
Catalyst keeps the whole thing in one codegen stage, so 100 TB cleans
at scan speed.

Order-preserving first-occurrence semantics: a line survives iff no
EARLIER line has the same normalized key (trimmed, lowercased);
surviving lines keep their original text and order. Blank lines are
structure, not content — they always survive (dropping a paragraph
separator because an earlier one existed would merge paragraphs).

Reference parity: beyond-reference training-data surface; the
reference's text handling starts at extracted markdown
(/root/reference/src/ocr_agent/markdown_merge.py) with no intra-page
cleaning pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _line_key(line: Column) -> Column:
    return F.lower(F.trim(line))


def dedup_lines_column(text: Column) -> Column:
    """``text`` with repeated (normalized-equal) non-blank lines removed.

    First occurrence wins; blank/whitespace-only lines always survive.
    Pure JVM expression — usable inside any select.
    """
    lines = F.split(text, "\n", -1)
    # For position i, keep iff key is blank OR no j<i with the same key.
    idx = F.sequence(F.lit(0), F.size(lines) - 1)
    kept = F.filter(
        idx,
        lambda i: (_line_key(F.element_at(lines, i + 1)) == F.lit(""))
        | (
            F.size(
                F.filter(
                    F.slice(lines, 1, i),
                    lambda prev: _line_key(prev)
                    == _line_key(F.element_at(lines, i + 1)),
                )
            )
            == 0
        ),
    )
    return F.when(F.size(lines) <= 1, text).otherwise(
        F.array_join(
            F.transform(kept, lambda i: F.element_at(lines, i + 1)), "\n"
        )
    )


def dedup_lines_exploded(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "text_deduped",
    id_col: str = "doc_id",
) -> DataFrame:
    """Same semantics as :func:`dedup_lines_column`, via explode +
    window — for corpora with GIANT documents.

    The projection form scans each line's predecessors (O(L²) per row:
    perfect for web pages, wrong for a 100k-line concatenated dump).
    This form is linear: posexplode → first-occurrence row_number over
    ``(doc, key)`` → ordered re-assembly. Costs one shuffle of the
    line table; the window partitions on (doc, key) so no task sees
    more than one document's copies of one line.
    """
    from pyspark.sql import Window

    lines = (
        docs.select(
            id_col,
            F.posexplode(F.split(F.col(text_col), "\n", -1))
            .alias("_pos", "_line"),
        )
        .withColumn("_key", _line_key(F.col("_line")))
    )
    w = Window.partitionBy(id_col, "_key").orderBy("_pos")
    kept = lines.withColumn("_rn", F.row_number().over(w)).filter(
        (F.col("_key") == "") | (F.col("_rn") == 1)
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("_pos", "_line"))
                ),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias(out_col)
    )
    return docs.join(rebuilt, id_col, "left").withColumn(
        out_col,
        # docs whose text exploded to nothing (empty string still
        # yields one row, so this is belt-and-braces for null text)
        F.coalesce(F.col(out_col), F.col(text_col)),
    )


def dedup_lines(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "text_deduped",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document line dedup plus accounting columns.

    Returns the input columns plus ``out_col``, ``n_lines`` and
    ``n_lines_kept`` so keep-rate accounting needs no second pass.
    """
    lines = F.split(F.col(text_col), "\n", -1)
    out = docs.withColumn(out_col, dedup_lines_column(F.col(text_col)))
    return out.select(
        "*",
        F.size(lines).alias("n_lines"),
        F.size(F.split(F.col(out_col), "\n", -1)).alias("n_lines_kept"),
    )
