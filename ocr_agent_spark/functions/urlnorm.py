"""URL canonicalization: normalize before any URL-keyed operation.

Crawls see the same page under many spellings — scheme/host case,
explicit default ports, fragments, tracking parameters, unordered
query strings. Canonicalizing BEFORE url-keyed dedup, frontier
scheduling, and re-crawl diffing collapses those spellings so the
expensive content-level dedup never sees them (the cheapest duplicate
is the one you never fetch or shuffle).

Normalization steps (RFC 3986 §6 syntax-based, plus the tracking-param
scrub every production crawler applies):

1. scheme and host lowercased; trailing dot stripped from the host
2. default ports stripped (``:80`` for http, ``:443`` for https)
3. empty path → ``/``
4. fragment dropped
5. tracking params dropped (frozen prefix list: ``utm_*``, ``gclid``,
   ``fbclid``, ``msclkid``, ``mc_eid``, ``igshid``, ``ref_src``)
6. remaining query params sorted codepoint-wise (both engines sort
   binary); empty query → no ``?``

Deliberately NOT done: percent-encoding case folding and dot-segment
resolution (rare in crawl URLs, and the cross-engine replay would need
per-byte loops). Documented contract, pinned by tests.

Everything is one pure-JVM projection (regexp parts + array ops inside
whole-stage codegen — zero shuffle, zero Python), replayed verbatim in
DuckDB by :func:`canonical_url_sql`, so the registry query carries a
full value-hash oracle.

Reference parity: none (the OCR queue keys on filesystem paths);
beyond-reference webtext surface feeding operators/skew.surt_key,
functions/delta.py and functions/frontier.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: frozen tracking-parameter scrub list (regex alternation over the
#: param NAME; applied identically in Spark and DuckDB)
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|igshid|ref_src)(=|$)"

_URL_PARTS = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"


def canonical_url(col: str | Column) -> Column:
    """Canonical form as a pure-JVM expression (NULL for non-URLs —
    anything not matching scheme://authority...)."""
    c = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(c, _URL_PARTS, 1))
    host_raw = F.lower(F.regexp_extract(c, _URL_PARTS, 2))
    # trailing dot strips whether or not a port follows (no lookahead:
    # RE2-safe — the port group is captured and re-emitted)
    host_nodot = F.regexp_replace(host_raw, r"\.((:[0-9]+)?)$", "$1")
    host = F.when(
        ((scheme == "http") & host_nodot.endswith(":80"))
        | ((scheme == "https") & host_nodot.endswith(":443")),
        F.regexp_replace(host_nodot, r":[0-9]+$", ""),
    ).otherwise(host_nodot)
    path_raw = F.regexp_extract(c, _URL_PARTS, 3)
    path = F.when(F.length(path_raw) == 0, F.lit("/")).otherwise(path_raw)
    query_raw = F.regexp_extract(c, _URL_PARTS, 4)  # includes leading ?
    params = F.filter(
        F.split(F.regexp_replace(query_raw, r"^\?", ""), "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(TRACKING_PARAM_RE),
    )
    query = F.array_join(F.array_sort(params), "&")
    out = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(F.length(query) > 0, F.concat(F.lit("?"), query))
        .otherwise(F.lit("")),
    )
    return F.when(F.length(scheme) > 0, out)


def canonicalize_urls(df: DataFrame, url_col: str = "url",
                      out_col: str = "canonical_url") -> DataFrame:
    """Attach the canonical form (one projection, zero shuffle)."""
    return df.withColumn(out_col, canonical_url(url_col))


def canonical_url_sql(expr: str) -> str:
    """The identical normalization as a DuckDB fragment."""
    parts = _URL_PARTS.replace("'", "''")
    scheme = f"lower(regexp_extract({expr}, '{parts}', 1))"
    host_raw = f"lower(regexp_extract({expr}, '{parts}', 2))"
    host_nodot = f"regexp_replace({host_raw}, '\\.((:[0-9]+)?)$', '\\1')"
    host = (
        f"CASE WHEN ({scheme} = 'http' AND {host_nodot} LIKE '%:80') "
        f"OR ({scheme} = 'https' AND {host_nodot} LIKE '%:443') "
        f"THEN regexp_replace({host_nodot}, ':[0-9]+$', '') "
        f"ELSE {host_nodot} END"
    )
    path_raw = f"regexp_extract({expr}, '{parts}', 3)"
    path = f"CASE WHEN length({path_raw}) = 0 THEN '/' ELSE {path_raw} END"
    query_raw = f"regexp_extract({expr}, '{parts}', 4)"
    tre = TRACKING_PARAM_RE.replace("'", "''")
    params = (
        f"list_filter(string_split(regexp_replace({query_raw}, '^\\?', ''),"
        f" '&'), p -> length(p) > 0 AND NOT regexp_matches(p, '{tre}'))"
    )
    query = f"array_to_string(list_sort({params}), '&')"
    return (
        f"CASE WHEN length({scheme}) > 0 THEN {scheme} || '://' || {host} "
        f"|| {path} || CASE WHEN length({query}) > 0 "
        f"THEN '?' || {query} ELSE '' END END"
    )


def synthetic_messy_url_expr(dialect: str) -> str:
    """Dialect-neutral fragment building a messy URL per documents row
    (doc_id-keyed variants: scheme/host case, default and explicit
    ports, trailing host dot, tracking params, unsorted query,
    fragment, empty path, non-URL garbage → NULL)."""
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect: {dialect!r}")
    did = "CAST(doc_id AS STRING)"
    return (
        "CASE doc_id % 8 "
        f"WHEN 0 THEN 'HTTP://Example.COM:80/a/' || {did} "
        f"|| '?utm_source=tw&b=2&a=1#frag' "
        f"WHEN 1 THEN 'https://sub.example.org.:443/p/' || {did} "
        f"WHEN 2 THEN 'https://example.net:8443/x?z=9&y=8&utm_campaign=q' "
        f"WHEN 3 THEN 'http://EXAMPLE.com' "
        f"WHEN 4 THEN 'not a url at all ' || {did} "
        f"WHEN 5 THEN 'http://ports.example:8080/k/' || {did} || '?gclid=g' "
        f"WHEN 6 THEN 'https://example.com/q?only=utm&utm_x=1&fbclid=f' "
        f"ELSE 'https://Example.com/mixed/' || {did} || '?B=1&a=2' END"
    )


# -------------------------------------------- registered domain (PSL-lite)

#: frozen subset of the Public Suffix List: the multi-label suffixes
#: that actually dominate crawl traffic (ccTLD second-level registries
#: + the big hosting platforms). A production deploy swaps in the full
#: PSL (~9k entries) — the matching mechanism below is identical, and
#: the list is data, not code. Single-label TLDs need no entry (the
#: default last-two-labels rule covers them).
PUBLIC_SUFFIXES = (
    # ccTLD second-level registries
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.tw", "com.sg", "com.hk",
    "co.in", "co.kr", "co.za", "co.nz", "co.il", "co.th", "co.id",
    # hosting / platform suffixes (PSL private section)
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
    "herokuapp.com", "appspot.com", "netlify.app", "vercel.app",
    "web.app", "firebaseapp.com", "azurewebsites.net",
    "cloudfront.net", "s3.amazonaws.com", "pages.dev",
)


def _host_of(col: Column) -> Column:
    """Lowercased host with port and trailing dot stripped (accepts a
    bare host or a full URL)."""
    c = F.lower(col)
    host = F.when(
        c.contains("://"), F.regexp_extract(c, _URL_PARTS, 2)
    ).otherwise(c)
    return F.regexp_replace(host, r"(:[0-9]+)?\.?(:[0-9]+)?$", "")


def registered_domain(col: str | Column) -> Column:
    """eTLD+1: the unit hosts aggregate under (mirror detection, host
    priors, crawl budgets). ``sub.a.example.co.uk`` → ``example.co.uk``,
    ``a.b.github.io`` → ``b.github.io``. Longest-suffix match against
    the frozen list; default is the last two labels; dotless hosts
    (localhost) and IPv4 literals pass through unchanged. Pure JVM —
    the suffix list folds into the plan as a when-chain ordered by
    label count, so longer suffixes win."""
    c = F.col(col) if isinstance(col, str) else col
    host = _host_of(c)
    is_ip = host.rlike(r"^[0-9]+(\.[0-9]+){3}$")
    default = F.when(
        host.contains("."),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1),
    ).otherwise(host)
    out = default
    for s in sorted(PUBLIC_SUFFIXES, key=lambda x: x.count("."),
                    reverse=False):
        # build the chain so LONGER suffixes end up outermost (win)
        pat = "([^.]+\\." + s.replace(".", "\\.") + ")$"
        out = F.when(host.endswith("." + s),
                     F.regexp_extract(host, pat, 1)).otherwise(out)
    return F.when(is_ip | (F.length(host) == 0), host).otherwise(out)


def registered_domain_sql(expr: str) -> str:
    """The identical eTLD+1 extraction as a DuckDB fragment."""
    parts = _URL_PARTS.replace("'", "''")
    c = f"lower({expr})"
    host_raw = (f"CASE WHEN contains({c}, '://') "
                f"THEN regexp_extract({c}, '{parts}', 2) ELSE {c} END")
    host = f"regexp_replace({host_raw}, '(:[0-9]+)?\\.?(:[0-9]+)?$', '')"
    default = (
        f"CASE WHEN contains({host}, '.') "
        f"THEN regexp_extract({host}, '([^.]+\\.[^.]+)$', 1) "
        f"ELSE {host} END"
    )
    out = default
    for s in sorted(PUBLIC_SUFFIXES, key=lambda x: x.count("."),
                    reverse=False):
        pat = "([^.]+\\." + s.replace(".", "\\.") + ")$"
        out = (f"CASE WHEN {host} LIKE '%.{s}' "
               f"THEN regexp_extract({host}, '{pat}', 1) ELSE {out} END")
    return (
        f"CASE WHEN regexp_matches({host}, '^[0-9]+(\\.[0-9]+){{3}}$') "
        f"OR length({host}) = 0 THEN {host} ELSE {out} END"
    )


def synthetic_host_expr(dialect: str) -> str:
    """Dialect-neutral messy-host builder for the registry oracle."""
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect: {dialect!r}")
    did = "CAST(doc_id AS STRING)"
    return (
        "CASE doc_id % 9 "
        f"WHEN 0 THEN 'sub' || {did} || '.Example.CO.UK' "
        f"WHEN 1 THEN 'a.b' || {did} || '.github.io' "
        f"WHEN 2 THEN 'www.example' || {did} || '.com' "
        f"WHEN 3 THEN 'https://Deep.Sub.Example' || {did} || '.com.au:8443/p' "
        f"WHEN 4 THEN 'localhost' "
        f"WHEN 5 THEN '10.0.0.1' "
        f"WHEN 6 THEN 'example' || {did} || '.org.' "
        f"WHEN 7 THEN 'example' || {did} || '.org:8080' "
        f"ELSE 'x.y.z.example' || {did} || '.net' END"
    )
