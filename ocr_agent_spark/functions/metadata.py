"""WAT-style HTML head metadata extraction (title/meta/canonical).

Common Crawl ships WAT records next to every WARC: per-page structured
metadata (title, meta description, canonical link, OpenGraph fields,
declared language) that downstream pipelines use for URL
canonicalization, title-based dedup, and snippet generation without
re-parsing the payload. The reference's extraction surface is
body-text only (/root/reference/src/ocr_agent/markitdown_worker.py
keeps just the converted markdown), so this is beyond-reference
training-data surface, same tier as functions/links.py (WAT's other
half, the outlink list).

One set of regex patterns drives three consumers that must agree:

- :func:`parse_head_metadata` — Python ``re`` kernel for the real
  binary-payload path (:func:`extract_head_metadata`, mapInPandas —
  Arrow batches, no per-row Python from Spark's point of view);
- :func:`head_metadata_cols` — the same patterns as JVM
  ``regexp_extract`` columns (whole-stage codegen, zero Python) for
  pages whose html is already a string column;
- :func:`head_metadata_sql` — the same patterns as DuckDB SQL
  fragments, so the registry query carries a full value-hash oracle.

The patterns deliberately use ASCII whitespace classes (``[ \\t\\r\\n]``)
and quote-insensitive attribute values (``["']([^"']*)["']``) because
the three regex engines involved (java.util.regex, RE2, Python re)
agree on those but diverge on ``\\s`` Unicode semantics and none of
RE2's dialect supports backreferences. Attribute values containing a
literal ``>`` or mixed quotes are out of contract (documented
limitation — real-world head metadata essentially never has them, and
the differential tests pin the agreement surface).

Scale shape: a pure projection — one scan, zero shuffle; the JVM
variant never leaves codegen, the kernel variant is one Arrow batch
pass. 100 TB of pages metadata-extract at scan speed.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: output field order (stable across kernel / JVM / oracle consumers)
METADATA_FIELDS = ("title", "description", "canonical", "og_title",
                   "html_lang", "robots", "charset")

#: everything before the first ``</head>``; no match → whole document
HEAD_PATTERN = r"(?is)^(.*?)</head[ \t\r\n]*>"

#: per-field alternatives, coalesced first-non-empty in listed order
#: (attribute order varies in the wild: name-before-content AND
#: content-before-name forms are both required)
FIELD_PATTERNS: dict[str, tuple[str, ...]] = {
    "title": (
        r"(?is)<title[^>]*>(.*?)</title",
    ),
    "description": (
        r"(?is)<meta[^>]*?name=[\"']description[\"'][^>]*?content=[\"']([^\"']*)[\"']",
        r"(?is)<meta[^>]*?content=[\"']([^\"']*)[\"'][^>]*?name=[\"']description[\"']",
    ),
    "canonical": (
        r"(?is)<link[^>]*?rel=[\"']canonical[\"'][^>]*?href=[\"']([^\"']*)[\"']",
        r"(?is)<link[^>]*?href=[\"']([^\"']*)[\"'][^>]*?rel=[\"']canonical[\"']",
    ),
    "og_title": (
        r"(?is)<meta[^>]*?property=[\"']og:title[\"'][^>]*?content=[\"']([^\"']*)[\"']",
        r"(?is)<meta[^>]*?content=[\"']([^\"']*)[\"'][^>]*?property=[\"']og:title[\"']",
    ),
    "html_lang": (
        r"(?is)<html[^>]*?[ \t\r\n]lang=[\"']([^\"']*)[\"']",
    ),
    "robots": (
        r"(?is)<meta[^>]*?name=[\"']robots[\"'][^>]*?content=[\"']([^\"']*)[\"']",
        r"(?is)<meta[^>]*?content=[\"']([^\"']*)[\"'][^>]*?name=[\"']robots[\"']",
    ),
    # one pattern covers <meta charset="utf-8"> AND the http-equiv
    # content-type form (its content attr contains charset=utf-8);
    # the value may be unquoted, hence the bare-token class
    "charset": (
        r"(?is)<meta[^>]*?charset[ \t\r\n]*=[ \t\r\n]*[\"']?([a-zA-Z0-9_.:-]+)",
    ),
}

#: fields whose values normalize to lowercase (directives/encodings
#: are case-insensitive by spec)
_LOWERCASE_FIELDS = ("robots", "charset")

#: ASCII whitespace run — title text is browser-style collapsed
_WS_RUN = r"[ \t\r\n]+"


# ---------------------------------------------------------------- kernel

def parse_head_metadata(html: bytes | str | None) -> dict[str, str | None]:
    """Python-kernel extraction: html → {field: value-or-None}.

    Bytes decode as UTF-8 with replacement (crawl payloads are not
    trusted to declare their charset honestly). The scan is limited to
    the head section when ``</head>`` exists, else the whole document
    — the same fallback the JVM and oracle variants apply.
    """
    out: dict[str, str | None] = {f: None for f in METADATA_FIELDS}
    if html is None:
        return out
    if isinstance(html, bytes):
        html = html.decode("utf-8", "replace")
    m = re.search(HEAD_PATTERN, html)
    head = m.group(1) if m else html
    for field, patterns in FIELD_PATTERNS.items():
        val: str | None = None
        for pat in patterns:
            fm = re.search(pat, head)
            if fm and fm.group(1):
                val = fm.group(1)
                break
        if val is not None and field == "title":
            val = re.sub(_WS_RUN, " ", val).strip()
        if val is not None and field in _LOWERCASE_FIELDS:
            val = val.lower()
        if not val:
            val = None
        out[field] = val
    return out


# ------------------------------------------------------------- JVM column

def _first_nonempty(*cols: Column) -> Column:
    """Coalesce on non-empty-ness: '' (regexp no-match) → try next."""
    expr = F.lit(None).cast("string")
    for c in reversed(cols):
        expr = F.when(F.length(c) > 0, c).otherwise(expr)
    return expr


def head_metadata_cols(html: Column) -> dict[str, Column]:
    """The same extraction as pure JVM expressions over a string column.

    Returns ``{field: Column}`` in :data:`METADATA_FIELDS` order; every
    field is NULL when absent (empty regexp matches normalize to NULL
    so the kernel, JVM, and oracle surfaces agree byte-for-byte).
    """
    head_hit = F.regexp_extract(html, HEAD_PATTERN, 1)
    head = F.when(F.length(head_hit) > 0, head_hit).otherwise(html)
    out: dict[str, Column] = {}
    for field, patterns in FIELD_PATTERNS.items():
        val = _first_nonempty(
            *[F.regexp_extract(head, p, 1) for p in patterns]
        )
        if field == "title":
            val = F.trim(F.regexp_replace(val, _WS_RUN, " "))
            val = F.when(F.length(val) > 0, val)
        if field in _LOWERCASE_FIELDS:
            val = F.lower(val)
        out[field] = val
    return out


def attach_head_metadata(pages: DataFrame, html_col: str = "html_str",
                         prefix: str = "") -> DataFrame:
    """Attach all metadata fields as columns (JVM path, zero shuffle)."""
    cols = head_metadata_cols(F.col(html_col))
    out = pages
    for field in METADATA_FIELDS:
        out = out.withColumn(prefix + field, cols[field])
    return out


# ------------------------------------------------------------ binary path

def extract_head_metadata(pages: DataFrame, html_col: str = "html",
                          id_cols: tuple[str, ...] = ("url",)) -> DataFrame:
    """Binary-payload path: mapInPandas over Arrow batches.

    For Common-Crawl-shaped tables (url, warc_ts, html:binary, ...) —
    the kernel decodes and parses thousands of pages per batch; Spark
    sees one Python stage, no per-row overhead. Output: id columns +
    the five metadata fields (all nullable strings).
    """
    import pandas as pd  # noqa: F401 — Arrow batch dependency

    from ocr_agent_spark.partitioning import widen_if_narrow

    # widen-if-narrow (r8, guide §2.5): a single-row-group input would
    # serialize this CPU-heavy pass into one scan task; placement-only.
    pages = widen_if_narrow(pages)
    keep = list(id_cols)
    fields = list(METADATA_FIELDS)
    schema = ", ".join(
        [f"{c} {t}" for c, t in zip(
            keep, [dict(pages.dtypes)[c] for c in keep])]
        + [f"{f} string" for f in fields]
    )

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for b in batches:
            parsed = [parse_head_metadata(h) for h in b[html_col]]
            out = b[keep].copy()
            for f in fields:
                out[f] = [p[f] for p in parsed]
            yield out

    return pages.select(*keep, html_col).mapInPandas(run, schema)


def noindex_filter(pages: DataFrame, html_col: str = "html_str",
                   keep_blocked: bool = False) -> DataFrame:
    """Drop pages whose robots meta carries a ``noindex`` directive.

    Publishers opt pages out of indexing with
    ``<meta name="robots" content="noindex...">`` — a training-data
    pipeline that honors robots.txt (functions/robots.py) should honor
    the per-page form too. Pure-JVM predicate over the robots field
    (already lowercased): one scan, zero shuffle. ``keep_blocked``
    returns only the opted-out pages for auditing.
    """
    robots = head_metadata_cols(F.col(html_col))["robots"]
    blocked = F.coalesce(robots, F.lit("")).contains("noindex")
    return pages.filter(blocked if keep_blocked else ~blocked)


# ----------------------------------------------------------------- oracle

def _sql_quote_pattern(pat: str) -> str:
    """Regex pattern → single-quoted SQL string literal body."""
    return pat.replace("'", "''")


def head_metadata_sql(html_expr: str) -> dict[str, str]:
    """DuckDB fragments replaying the extraction verbatim.

    ``html_expr`` is the SQL expression holding the page string. The
    caller should bind it to a named CTE column (it is repeated per
    pattern). DuckDB's regexp_extract also returns '' on no-match, so
    the NULL normalization mirrors :func:`head_metadata_cols` exactly.
    """
    hp = _sql_quote_pattern(HEAD_PATTERN)
    head = (f"COALESCE(NULLIF(regexp_extract({html_expr}, '{hp}', 1), "
            f"''), {html_expr})")
    out: dict[str, str] = {}
    for field, patterns in FIELD_PATTERNS.items():
        alts = ", ".join(
            f"NULLIF(regexp_extract({head}, "
            f"'{_sql_quote_pattern(p)}', 1), '')"
            for p in patterns
        )
        val = f"COALESCE({alts})" if len(patterns) > 1 else alts
        if field == "title":
            val = (f"NULLIF(trim(regexp_replace({val}, "
                   f"'{_WS_RUN}', ' ', 'g')), '')")
        if field in _LOWERCASE_FIELDS:
            val = f"lower({val})"
        out[field] = val
    return out


# ------------------------------------------------- synthetic page builder

def synthetic_page_expr(dialect: str) -> str:
    """One SQL fragment building a deterministic page per documents row.

    Written once, run on both engines (Spark SQL and DuckDB agree on
    ``||``, CASE, substr, md5; only regexp_replace needs the 'g' flag
    spelled differently) so the registry query and its oracle parse
    identical strings. Variation axes, all keyed on doc_id so every
    differential case appears in any 20-row slice:

    - doc_id%2 — attribute quote style (double / single)
    - doc_id%3==0 — og:title absent
    - (doc_id/2)%2 — meta/link attribute order flipped
    - doc_id%5==0 — meta description absent
    - doc_id%7==0 — canonical link absent
    - doc_id%11==0 — tags uppercased (extraction is case-insensitive)
    - doc_id%13==0 — no </head>: the whole-document fallback path
    - doc_id%4==0 — title padded with internal whitespace runs
      (exercises browser-style collapse)
    - doc_id%9∈{1,4} — robots meta (noindex,nofollow / uppercase
      INDEX, FOLLOW in flipped attribute order → lowercased)
    - doc_id%6∈{1,3,5} — charset as quoted <meta charset>, as the
      http-equiv content-type form, and unquoted → all lowercased
    """
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect: {dialect!r}")
    g = ", 'g'" if dialect == "duckdb" else ""
    # title payload: first 40 chars of text, angle brackets stripped so
    # a pathological doc can't close the tag early (quotes are fine —
    # the title never lands inside an attribute). chr()-built quote
    # chars and floor()-division below keep the fragment dialect-neutral:
    # '' escapes and int-cast rounding are where Spark and DuckDB differ.
    clean = f"regexp_replace(substr(text, 1, 40), '[<>]', ''{g})"
    title_txt = (
        "CASE WHEN doc_id % 4 = 0 "
        f"THEN ' Doc  ' || CAST(doc_id AS STRING) || '  :  ' || {clean} "
        f"ELSE 'Doc ' || CAST(doc_id AS STRING) || ': ' || {clean} END"
    )
    q = "CASE WHEN doc_id % 2 = 0 THEN chr(34) ELSE chr(39) END"
    desc_txt = "'Summary ' || CAST(doc_id AS STRING) || ' ' || lang"
    canon_txt = ("'https://example.org/' || lang || '/' || "
                 "CAST(doc_id AS STRING)")
    og_txt = "'OG ' || CAST(doc_id AS STRING)"
    meta_desc = (
        f"CASE WHEN doc_id % 5 = 0 THEN '' "
        f"WHEN CAST(floor(doc_id / 2) AS BIGINT) % 2 = 0 "
        f"THEN '<meta name=' || {q} || 'description' || {q} || "
        f"' content=' || {q} || {desc_txt} || {q} || '/>' "
        f"ELSE '<meta content=' || {q} || {desc_txt} || {q} || "
        f"' name=' || {q} || 'description' || {q} || '/>' END"
    )
    link_canon = (
        f"CASE WHEN doc_id % 7 = 0 THEN '' "
        f"WHEN CAST(floor(doc_id / 2) AS BIGINT) % 2 = 0 "
        f"THEN '<link rel=' || {q} || 'canonical' || {q} || "
        f"' href=' || {q} || {canon_txt} || {q} || '/>' "
        f"ELSE '<link href=' || {q} || {canon_txt} || {q} || "
        f"' rel=' || {q} || 'canonical' || {q} || '/>' END"
    )
    meta_og = (
        f"CASE WHEN doc_id % 3 = 0 THEN '' "
        f"ELSE '<meta property=' || {q} || 'og:title' || {q} || "
        f"' content=' || {q} || {og_txt} || {q} || '/>' END"
    )
    meta_robots = (
        f"CASE WHEN doc_id % 9 = 1 "
        f"THEN '<meta name=' || {q} || 'robots' || {q} || "
        f"' content=' || {q} || 'noindex,nofollow' || {q} || '/>' "
        f"WHEN doc_id % 9 = 4 "
        f"THEN '<meta content=' || {q} || 'INDEX, FOLLOW' || {q} || "
        f"' name=' || {q} || 'robots' || {q} || '/>' "
        f"ELSE '' END"
    )
    meta_charset = (
        f"CASE WHEN doc_id % 6 = 1 "
        f"THEN '<meta charset=' || {q} || 'UTF-8' || {q} || '>' "
        f"WHEN doc_id % 6 = 3 "
        f"THEN '<meta http-equiv=' || {q} || 'Content-Type' || {q} || "
        f"' content=' || {q} || 'text/html; charset=ISO-8859-1' || {q} "
        f"|| '/>' "
        f"WHEN doc_id % 6 = 5 THEN '<meta charset=Shift_JIS>' "
        f"ELSE '' END"
    )
    open_html = (
        f"'<html lang=' || {q} || lang || {q} || '><head>'"
    )
    title_tag = f"'<title>' || {title_txt} || '</title>'"
    head_close = "CASE WHEN doc_id % 13 = 0 THEN '' ELSE '</head>' END"
    body = "'<body><p>' || substr(text, 1, 60) || '</p></body></html>'"
    page = (
        f"{open_html} || {title_tag} || {meta_desc} || {link_canon} "
        f"|| {meta_og} || {meta_robots} || {meta_charset} "
        f"|| {head_close} || {body}"
    )
    upper = f"CASE WHEN doc_id % 11 = 0 THEN upper({page}) ELSE {page} END"
    return upper


# ------------------------------------------------- heading outline (WAT+)

#: h1-h6 element matcher (RE2-safe: no backref on the closing level —
#: a malformed <h2>..</h3> pair still yields one heading)
HEADING_PATTERN = r"(?is)<h([1-6])[^>]*>(.*?)</h[1-6][ \t\r\n]*>"
_LEVEL_PATTERN = r"(?i)^<h([1-6])"
_TAG_RUN = r"(?s)<[^>]*>"


def heading_outline(pages: DataFrame, html_col: str = "html_str",
                    id_col: str = "doc_id") -> DataFrame:
    """Document structure: (id, pos, level, text) per h1-h6 element.

    The outline is what section-aware chunkers, title-based dedup, and
    quality heuristics (heading/body ratios) consume. Pure JVM:
    ``regexp_extract_all`` collects the heading elements, one
    posexplode fans them out, per-heading level/text are scalar
    regexes; inner markup strips to spaces and whitespace collapses,
    so ``<h2>Section <b>one</b></h2>`` yields ``Section one``. Empty
    headings keep their row with NULL text (position numbering stays
    dense for the chunker). One narrow shuffle-free projection +
    generate, no Python.
    """
    from ocr_agent_spark.partitioning import widen_if_narrow

    # widen-if-narrow (r8, guide §2.5): a single-row-group input would
    # serialize this CPU-heavy pass into one scan task; placement-only.
    pages = widen_if_narrow(pages)
    matches = F.regexp_extract_all(
        F.col(html_col), F.lit(HEADING_PATTERN), 0
    )
    ex = pages.select(
        F.col(id_col),
        F.posexplode_outer(matches).alias("pos", "_m"),
    ).filter(F.col("_m").isNotNull())
    text = F.trim(F.regexp_replace(
        F.regexp_replace(F.col("_m"), _TAG_RUN, " "),
        "[ \t\r\n]+", " ",
    ))
    return ex.select(
        id_col,
        F.col("pos").cast("int").alias("pos"),
        F.regexp_extract(F.col("_m"), _LEVEL_PATTERN, 1)
        .cast("int").alias("level"),
        F.when(F.length(text) > 0, text).alias("text"),
    )


def heading_outline_sql(pages_expr: str, id_col: str = "doc_id") -> str:
    """DuckDB replay over ``pages_expr`` (a subquery yielding
    (id, html_str))."""
    hp = _sql_quote_pattern(HEADING_PATTERN)
    lp = _sql_quote_pattern(_LEVEL_PATTERN)
    return f"""
        WITH m AS (
            SELECT {id_col},
                   regexp_extract_all(html_str, '{hp}', 0) AS hs
            FROM ({pages_expr}) p
        ),
        e AS (
            SELECT {id_col}, i, hs[i] AS h
            FROM m, unnest(generate_series(1, len(hs))) AS g(i)
        )
        SELECT {id_col},
               CAST(i - 1 AS INT) AS pos,
               CAST(regexp_extract(h, '{lp}', 1) AS INT) AS level,
               NULLIF(trim(regexp_replace(regexp_replace(h,
                   '(?s)<[^>]*>', ' ', 'g'), '[ \t\r\n]+', ' ', 'g')),
                   '') AS text
        FROM e
    """


def synthetic_outline_page_expr(dialect: str) -> str:
    """Dialect-neutral page-with-headings builder for the registry
    oracle (axes: nested inline markup, uppercase tags, whitespace
    runs, empty headings, attributes, deep levels, heading-free docs)."""
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect: {dialect!r}")
    did = "CAST(doc_id AS STRING)"
    q = "chr(34)"
    h2 = (f"CASE WHEN doc_id % 3 = 0 THEN '<h2 class=' || {q} || 's' || "
          f"{q} || '>Section <b>one</b> of ' || {did} || '</h2>' "
          f"ELSE '' END")
    h3 = ("CASE WHEN doc_id % 4 = 1 "
          "THEN '<H3>  spaced   heading </H3>' ELSE '' END")
    hempty = "CASE WHEN doc_id % 5 = 2 THEN '<h2></h2>' ELSE '' END"
    h6 = "CASE WHEN doc_id % 7 = 3 THEN '<h6>deep</h6>' ELSE '' END"
    h1 = (f"CASE WHEN doc_id % 11 = 0 THEN '' "
          f"ELSE '<h1>Doc ' || {did} || '</h1>' END")
    return (
        f"'<html><body>' || {h1} || {h2} || {h3} || {hempty} || "
        f"'<p>' || substr(text, 1, 40) || '</p>' || {h6} || "
        f"'</body></html>'"
    )
