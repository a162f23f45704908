"""Boundary-aware document chunking: long docs → context-window pieces.

The complement of functions/packing.py: packing COMBINES short
documents into a token budget, chunking SPLITS long ones. Training
pipelines need both before tokenization — a 200k-token page must
become budget-sized pieces, and cutting mid-sentence loses more
signal than cutting at the paragraph boundaries the page already has.

The rule (greedy boundary fill): walk paragraphs in order, keep a
running token total, and a paragraph belongs to chunk
``floor(tokens_before_it / target)`` — a chunk closes only after it
crosses the budget, so chunks may exceed ``target`` by at most one
paragraph (documented; a paragraph longer than the budget becomes its
own over-size chunk rather than being torn).

Scale shape — the point: the whole operator is ONE projection + one
generate. The running sum lives in an ``F.aggregate`` struct
accumulator (array of before-counts built in a single O(n) pass per
row), chunk texts assemble inside array lambdas, and only the final
(doc, chunk) rows posexplode. No explode-then-window, no shuffle, no
Python — 100 TB chunks at scan speed, and a mega-document costs its
own row only (no skewed window partition). The DuckDB oracle replays
the same rule the relational way (window cumsum + group) — the
hash-match proves the zero-shuffle formulation is a pure optimization.

Reference parity: the reference's unit of work is a whole converted
document (/root/reference/src/ocr_agent/markitdown_worker.py);
beyond-reference training-data surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SEP = "\n"


def _ntok(p: Column) -> Column:
    return F.size(F.filter(
        F.split(F.trim(p), r"[ \t\r\n]+"), lambda t: t != F.lit("")
    ))


def chunk_documents(docs: DataFrame, target_tokens: int,
                    id_col: str = "doc_id", text_col: str = "text",
                    sep: str = DEFAULT_SEP,
                    giant_paras: int = 2000) -> DataFrame:
    """(id, chunk_id, n_paras, n_tokens, chunk_text) per budget chunk.

    Paragraph order is preserved within and across chunks; every
    paragraph lands in exactly one chunk (re-joining chunk_text over
    chunk_id with ``sep`` reproduces the document — tested). Chunk ids
    are monotone but may skip (an over-budget paragraph jumps the
    counter; no empty filler chunks are emitted).

    Routing (the merge/sessionize twin pattern): documents at or under
    ``giant_paras`` paragraphs chunk IN-ROW (the zero-shuffle path —
    the accumulator's immutable-array append is O(P²) in paragraph
    count, trivial at P≤2000, pathological at P=100k), documents over
    it route to the exploded window+group formulation (one shuffle
    keyed by doc id; a mega-document is one task, never one quadratic
    expression). Both paths compute the identical rule — pinned by a
    differential test and the oracle hash.
    """
    if target_tokens <= 0:
        raise ValueError(f"target_tokens must be > 0, got {target_tokens}")
    from ocr_agent_spark.partitioning import widen_if_narrow

    # widen-if-narrow (r8, guide §2.5): a single-row-group input would
    # serialize this CPU-heavy pass into one scan task; placement-only.
    docs = widen_if_narrow(docs)
    paras_of = F.split(F.col(text_col), sep)
    small = _chunk_in_row(
        docs.filter(F.size(paras_of) <= giant_paras),
        target_tokens, id_col, text_col, sep,
    )
    giant = _chunk_windowed(
        docs.filter(F.size(paras_of) > giant_paras),
        target_tokens, id_col, text_col, sep,
    )
    return small.unionByName(giant)


def _chunk_in_row(docs: DataFrame, target_tokens: int, id_col: str,
                  text_col: str, sep: str) -> DataFrame:
    """Zero-shuffle path: running sums in an F.aggregate accumulator,
    chunk texts assembled inside array lambdas."""
    paras = F.split(F.col(text_col), sep)
    ntoks = F.transform(paras, _ntok)
    acc0 = F.struct(
        F.array().cast("array<int>").alias("cums"),
        F.lit(0).alias("total"),
    )
    agg = F.aggregate(
        ntoks, acc0,
        lambda acc, n: F.struct(
            F.concat(acc["cums"], F.array(acc["total"])).alias("cums"),
            (acc["total"] + n).alias("total"),
        ),
    )
    chunk_ids = F.transform(
        agg["cums"], lambda c: F.floor(c / target_tokens).cast("int")
    )
    z = F.arrays_zip(
        paras.alias("para"), ntoks.alias("n"), chunk_ids.alias("ck")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), F.element_at(chunk_ids, -1)),
        lambda k: F.struct(
            k.alias("chunk_id"),
            F.size(F.filter(z, lambda e: e["ck"] == k))
            .alias("n_paras"),
            F.aggregate(
                F.filter(z, lambda e: e["ck"] == k),
                F.lit(0), lambda a, e: a + e["n"],
            ).alias("n_tokens"),
            F.array_join(
                F.transform(F.filter(z, lambda e: e["ck"] == k),
                            lambda e: e["para"]), sep,
            ).alias("chunk_text"),
        ),
    )
    # an over-budget paragraph jumps the chunk counter (floor(31/5)=6),
    # leaving empty ids in between — they hold no paragraphs and the
    # relational formulation never produces them, so drop them here
    # (chunk ids stay monotone but may be non-contiguous; documented)
    chunks = F.filter(chunks, lambda c: c["n_paras"] > 0)
    return docs.select(
        F.col(id_col), F.explode(chunks).alias("_c")
    ).select(
        id_col,
        F.col("_c.chunk_id").alias("chunk_id"),
        F.col("_c.n_paras").cast("int").alias("n_paras"),
        F.col("_c.n_tokens").cast("int").alias("n_tokens"),
        F.col("_c.chunk_text").alias("chunk_text"),
    )


def _chunk_windowed(docs: DataFrame, target_tokens: int, id_col: str,
                    text_col: str, sep: str) -> DataFrame:
    """Mega-document path: explode → per-doc window cumsum → group.
    One shuffle keyed by doc id; within a doc the window sorts by
    paragraph index — a mega-document is one task's sort, bounded by
    its own size (same shape as the DuckDB oracle)."""
    from pyspark.sql import Window

    ex = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("_i", "_p"),
    ).withColumn("_n", _ntok(F.col("_p")))
    w = (Window.partitionBy(id_col).orderBy("_i")
         .rowsBetween(Window.unboundedPreceding, -1))
    ck = F.floor(F.coalesce(F.sum("_n").over(w), F.lit(0))
                 / target_tokens).cast("int")
    grouped = ex.withColumn("_ck", ck).groupBy(id_col, "_ck").agg(
        F.count(F.lit(1)).cast("int").alias("n_paras"),
        F.sum("_n").cast("int").alias("n_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_i", "_p"))),
                lambda s: s["_p"],
            ), sep,
        ).alias("chunk_text"),
    )
    return grouped.select(
        id_col, F.col("_ck").alias("chunk_id"),
        "n_paras", "n_tokens", "chunk_text",
    )


def chunk_documents_sql(docs_expr: str, target_tokens: int,
                        id_col: str = "doc_id") -> str:
    """DuckDB replay of the same rule, relational formulation (window
    cumsum + group) — hash-equality with :func:`chunk_documents` is
    the proof that the zero-shuffle form computes the same chunks."""
    ntok = ("len(list_filter(regexp_split_to_array(trim(para), "
            "'[ \\t\\r\\n]+'), x -> x != ''))")
    return f"""
        WITH d AS ({docs_expr}),
        sp AS (
            SELECT {id_col}, string_split(text, chr(10)) AS paras
            FROM d
        ),
        p AS (
            SELECT {id_col}, i, paras[i] AS para
            FROM sp, unnest(generate_series(1, len(paras))) AS g(i)
        ),
        t AS (SELECT {id_col}, i, para, {ntok} AS n FROM p),
        c AS (
            SELECT {id_col}, i, para, n,
                   CAST(floor(COALESCE(SUM(n) OVER (
                       PARTITION BY {id_col} ORDER BY i
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) / {target_tokens}) AS INT) AS chunk_id
            FROM t
        )
        SELECT {id_col}, chunk_id,
               CAST(COUNT(*) AS INT) AS n_paras,
               CAST(SUM(n) AS INT) AS n_tokens,
               string_agg(para, chr(10) ORDER BY i) AS chunk_text
        FROM c
        GROUP BY {id_col}, chunk_id
    """
