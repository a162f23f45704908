"""CCNet-style paragraph-level segmentation and language filtering.

CCNet (Wenzek et al. 2020, arXiv:1911.00359) splits every crawled
document into paragraphs and scores each one independently — a page
is routinely multilingual (an English article wrapped in a French
nav/footer shell) and boilerplate concentrates in short off-language
paragraphs, so document-level filters either over-drop (whole doc
gone for one bad footer) or under-drop (footer shipped to training).
The keep rule here is the lang-filter arc of that recipe: keep a
paragraph iff its predicted language matches the document's dominant
language and it clears a minimum token count.

Scale shape — the part worth copying: the whole operator is ONE
projection. Paragraphs live as an array column (``split`` on the
separator) and the keep rule runs inside ``F.filter`` array lambdas —
per-paragraph language votes and all — so there is no explode, no
re-group shuffle, and no Python. A 100 TB corpus paragraph-filters at
scan speed; document order and paragraph order are trivially
preserved because rows never split.

Every expression is replayable in DuckDB (list_filter + the same
frozen stopword inventories), so the registry query carries a full
value-hash oracle.

Reference parity: the OCR queue has no paragraph notion (its text
unit is the whole converted document — /root/reference/src/ocr_agent/
markitdown_worker.py); beyond-reference training-data surface, same
tier as functions/webquality.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_agent_spark.functions.text import STOPWORDS

DEFAULT_SEP = "\n"


def _para_tokens(p: Column) -> Column:
    """Whitespace tokens of one paragraph (lambda-var safe)."""
    return F.filter(
        F.split(F.trim(F.lower(p)), r"\s+"), lambda t: t != F.lit("")
    )


def _para_token_count(p: Column) -> Column:
    return F.size(_para_tokens(p))


def para_lang(p: Column) -> Column:
    """Stopword-vote language of one paragraph — same inventories and
    the same alphabetical tie-break as document-level ``lang_id``
    (functions/text.py), usable on array-lambda variables."""
    toks = _para_tokens(p)
    votes = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words)))
        for lang, words in STOPWORDS.items()
    }
    best = F.greatest(*votes.values())
    result = F.lit("und")
    for lang in sorted(votes, reverse=True):
        result = F.when(votes[lang] == best, F.lit(lang)).otherwise(result)
    return F.when(best == 0, F.lit("und")).otherwise(result)


def split_paragraphs(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     sep: str = DEFAULT_SEP) -> DataFrame:
    """Exploded (id, para_index, para, para_tokens, para_lang) view —
    the inspection/debug surface. The filter itself never explodes."""
    from ocr_agent_spark.partitioning import widen_if_narrow

    # widen-if-narrow (r8, guide §2.5): a single-row-group input would
    # serialize this CPU-heavy pass into one scan task; placement-only.
    docs = widen_if_narrow(docs)
    paras = F.split(F.col(text_col), sep)
    return (
        docs.select(F.col(id_col), F.posexplode(paras)
                    .alias("para_index", "para"))
        .withColumn("para_tokens", _para_token_count(F.col("para")))
        .withColumn("para_lang", para_lang(F.col("para")))
    )


def ccnet_paragraph_filter(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           sep: str = DEFAULT_SEP,
                           min_tokens: int = 3,
                           keep_und: bool = False) -> DataFrame:
    """Per-document paragraph keep pass — one shuffle-free projection.

    Keep a paragraph iff ``para_lang == doc_lang`` (optionally also
    'und' paragraphs with ``keep_und`` — numbers/code blocks vote for
    no language) and it has at least ``min_tokens`` tokens. The
    document language is the stopword vote over the WHOLE text (the
    separator is whitespace to the tokenizer, so doc votes equal the
    sum of paragraph votes).

    Output: (id, doc_lang, n_paras, n_kept, kept_text) with kept
    paragraphs re-joined by ``sep`` in original order. Documents whose
    every paragraph drops keep the row with ``kept_text = ''`` —
    dropping them is the caller's explicit filter, not a silent side
    effect.
    """
    from ocr_agent_spark.functions.text import lang_id
    from ocr_agent_spark.partitioning import widen_if_narrow

    # widen-if-narrow (r8, guide §2.5): a single-row-group input would
    # serialize this CPU-heavy pass into one scan task; placement-only.
    docs = widen_if_narrow(docs)
    paras = F.split(F.col(text_col), sep)
    doc_lang = lang_id(text_col)

    def keeps(p: Column, dl: Column) -> Column:
        ok_lang = para_lang(p) == dl
        if keep_und:
            ok_lang = ok_lang | (para_lang(p) == F.lit("und"))
        return ok_lang & (_para_token_count(p) >= min_tokens)

    with_lang = docs.select(
        F.col(id_col), paras.alias("_paras"), doc_lang.alias("doc_lang")
    )
    kept = F.filter(
        F.col("_paras"), lambda p: keeps(p, F.col("doc_lang"))
    )
    return with_lang.select(
        id_col,
        "doc_lang",
        F.size("_paras").alias("n_paras"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, sep).alias("kept_text"),
    )


# ----------------------------------------------------------------- oracle

def _sql_votes(expr: str) -> dict[str, str]:
    out = {}
    for lang, words in STOPWORDS.items():
        inv = ", ".join(f"'{w}'" for w in words)
        out[lang] = (
            f"len(list_filter(regexp_split_to_array(trim(lower({expr})),"
            f" '\\s+'), x -> list_contains([{inv}], x)))"
        )
    return out


def _sql_lang(expr: str) -> str:
    """DuckDB replay of the stopword vote + alphabetical tie-break."""
    v = _sql_votes(expr)
    langs = sorted(STOPWORDS)
    best = f"greatest({', '.join(v[lang] for lang in langs)})"
    branches = " ".join(
        f"WHEN {v[lang]} = {best} THEN '{lang}'" for lang in langs
    )
    return f"CASE WHEN {best} = 0 THEN 'und' {branches} ELSE 'und' END"


def ccnet_filter_oracle_sql(doc_expr: str, min_tokens: int = 3) -> str:
    """DuckDB SELECT-list fragments replaying the whole filter over a
    CTE named ``d(doc_id, text)``; paragraphs split on chr(10)."""
    ntok = ("len(list_filter(regexp_split_to_array(trim(lower(p)), "
            "'\\s+'), x -> x != ''))")
    keep = f"({_sql_lang('p')}) = doc_lang AND {ntok} >= {min_tokens}"
    return f"""
        WITH langd AS (
            SELECT doc_id, text, ({_sql_lang('text')}) AS doc_lang,
                   string_split(text, chr(10)) AS paras
            FROM ({doc_expr}) d
        )
        SELECT doc_id, doc_lang,
               CAST(len(paras) AS INT) AS n_paras,
               CAST(len(list_filter(paras, p -> {keep})) AS INT) AS n_kept,
               array_to_string(list_filter(paras, p -> {keep}), chr(10))
                   AS kept_text
        FROM langd
    """


def synthetic_multiparagraph_expr(dialect: str) -> str:
    """Dialect-neutral SQL building a multi-paragraph doc per documents
    row (the sf corpora are single-paragraph, so the registry query
    plants its own paragraph structure — derived from existing rows,
    like every other planted oracle input). Paragraph axes:

    - p0: first 150 chars of the real text (dominant-language body)
    - p1: an off-language paragraph for doc_id%3==0 (German) and
      doc_id%7==0 (Japanese), else an extra in-language one
    - p2: 'zz' — two chars, votes for no language, always drops
    - p3: tail slice; empty paragraph for doc_id%5==0 (drops on
      min_tokens, exercises the empty-string edge)
    """
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect: {dialect!r}")
    de = "'der die das und ist nicht ein mit sich auf'"
    ja = "'no wa ni wo ga de to mo desu masu'"
    en = "'the and of to a in is that it for'"
    p1 = (f"CASE WHEN doc_id % 3 = 0 THEN {de} "
          f"WHEN doc_id % 7 = 0 THEN {ja} ELSE {en} END")
    p3 = ("CASE WHEN doc_id % 5 = 0 THEN '' "
          "ELSE substr(text, 151, 150) END")
    return (f"substr(text, 1, 150) || chr(10) || {p1} || chr(10) || "
            f"'zz' || chr(10) || {p3}")
