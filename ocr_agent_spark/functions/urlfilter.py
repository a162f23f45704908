"""URL/domain blocklist filtering — the C4-style pre-fetch gate.

Every published web corpus applies a domain blocklist (C4 used the
"badwords"/UT1-style lists) before anything else touches the page.
Two matching modes, both scale-shaped:

- **domain blocking** keys on the SURT form (``operators.skew.
  surt_key``): blocking ``example.com`` must also block
  ``sub.example.com`` and every path under both — in SURT space that
  is exactly the prefix ``com,example`` followed by ``)``, ``,``
  (subdomain label) — one ``startswith``-style prefix test, no regex,
  no per-label explode.
- **pattern blocking** is a plain substring test on the raw url for
  path-keyed entries (``/ads/``, ``?sessionid=``).

The blocklist broadcasts (real lists are ~10⁵ entries — MBs); the url
table never shuffles: the plan is one scan + a broadcast semi/anti
join, so the gate costs a projection at any corpus size. Entries are
normalized once on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_agent_spark.operators.skew import surt_key


def _surt_domain_prefix(domain: str) -> str:
    """``Sub.Example.COM`` → ``com,example,sub`` (no path part).

    A leading ``www.`` label is stripped to mirror ``surt_key``'s URL
    canonicalization — UT1-style lists routinely write
    ``www.example.com``, and without the strip that entry's prefix
    (``com,example,www``) could never match any canonicalized key.
    """
    d = domain.strip().lower().rstrip(".")
    if d.startswith("www."):
        d = d[4:]
    labels = [p for p in d.split(".") if p]
    return ",".join(reversed(labels))


def blocked_url_expr(blocked_domains: list[str],
                     blocked_patterns: list[str] | None = None,
                     url_col: str | Column = "url") -> Column:
    """Boolean column: does the url hit the blocklist?

    Domain entries match the exact domain AND every subdomain/path via
    SURT prefixes (``com,example)`` or ``com,example,``); pattern
    entries are raw substring hits. All literals fold into the plan
    (broadcast by value) — use :func:`filter_blocked_urls` for list
    sizes beyond what belongs in a plan (~thousands).
    """
    s = surt_key(url_col)
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    hit = F.lit(False)
    for d in blocked_domains:
        p = _surt_domain_prefix(d)
        # ")" exact domain/path, "," subdomain label, ":" explicit
        # non-default port (SURT keeps it: com,bad:8080)/...)
        hit = hit | s.startswith(p + ")") | s.startswith(p + ",") | s.startswith(p + ":")
    for pat in blocked_patterns or []:
        hit = hit | c.contains(pat)
    return hit


def filter_blocked_urls(urls: DataFrame, blocked_domains: list[str],
                        blocked_patterns: list[str] | None = None,
                        url_col: str = "url",
                        keep_blocked: bool = False) -> DataFrame:
    """Drop (or keep, for auditing) blocklisted rows.

    For big lists: the domain entries become a broadcast table joined
    on a SURT-prefix condition — the url side stays un-shuffled, the
    list side broadcasts. Returns the surviving rows of ``urls``
    unchanged (or only the blocked ones with ``keep_blocked=True``).
    """
    spark = urls.sparkSession
    doms = [_surt_domain_prefix(d) for d in blocked_domains]
    if doms:
        dom_df = F.broadcast(
            spark.createDataFrame([(d,) for d in doms], "prefix string")
        )
        cond = (
            surt_key(F.col(url_col)).startswith(F.concat(F.col("prefix"), F.lit(")")))
            | surt_key(F.col(url_col)).startswith(F.concat(F.col("prefix"), F.lit(",")))
            | surt_key(F.col(url_col)).startswith(F.concat(F.col("prefix"), F.lit(":")))
        )
        dom_hit = urls.join(dom_df, cond, "left_semi")
    else:
        dom_hit = None
    pat_hit = None
    if blocked_patterns:
        pat_cond = F.lit(False)
        for pat in blocked_patterns:
            pat_cond = pat_cond | F.col(url_col).contains(pat)
        pat_hit = urls.filter(pat_cond)
    blocked = dom_hit
    if pat_hit is not None:
        blocked = pat_hit if blocked is None else blocked.unionByName(pat_hit)
    if blocked is None:
        return urls.limit(0) if keep_blocked else urls
    blocked_keys = blocked.select(url_col).distinct()
    how = "left_semi" if keep_blocked else "left_anti"
    return urls.join(blocked_keys, url_col, how)
