"""Outlink extraction — the web-graph side of the extraction kernel.

Common Crawl's third flagship dataset (after WARC and the text corpus)
is the web graph: (src, dst) edges from anchor hrefs. This kernel
extracts them with the same stdlib discipline as the main-content
scanner: a tolerant regex over the raw HTML for ``<a href>`` values
(attribute parsing here needs VALUES, which the content scanner
deliberately skips), resolved against the page url with
``urllib.parse.urljoin`` (handles relative paths, ``..``, ``//host``
protocol-relative forms), with ``<base href>`` honored when present.

Scope: anchors only (the graph edge source); fragments are dropped
(same-page links are not edges); javascript:/mailto:/data: schemes are
skipped; duplicate targets per page are deduped preserving first-seen
order (deterministic output).
"""

from __future__ import annotations

import re
from html import unescape as _unescape
from urllib.parse import urljoin, urlsplit, urlunsplit

# (?:[^>]*?\s)? — the attribute run before href must END WITH
# whitespace, so attributes merely ending in "href" (data-href,
# ng-href) cannot match and shadow the real one (code-review r4d,
# reproduced: a data-href tracker url displaced the genuine edge)
_HREF_RE = re.compile(
    rb"""<a\s(?:[^>]*?\s)?href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)
_BASE_RE = re.compile(
    rb"""<base\s(?:[^>]*?\s)?href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)
_SKIP_SCHEMES = ("javascript:", "mailto:", "tel:", "data:", "about:")


def _attr_value(m: re.Match) -> str:
    raw = m.group(2) if m.group(2) is not None else (
        m.group(3) if m.group(3) is not None else m.group(4)
    )
    return _unescape(raw.decode("utf-8", "replace")).strip()


def _strip_fragment(url: str) -> str:
    parts = urlsplit(url)
    return urlunsplit((parts.scheme, parts.netloc, parts.path,
                       parts.query, ""))


def extract_links(html_bytes: bytes, page_url: str) -> list[str]:
    """Anchor hrefs of a page, absolutized and deduped in order."""
    base = page_url
    bm = _BASE_RE.search(html_bytes)
    if bm:
        declared = _attr_value(bm)
        if declared:
            try:
                base = urljoin(page_url, declared)
            except ValueError:
                pass  # hostile <base href> (bad IPv6 etc): keep page_url
    out: list[str] = []
    seen: set[str] = set()
    for m in _HREF_RE.finditer(html_bytes):
        href = _attr_value(m)
        if not href or href.startswith("#"):
            continue
        low = href.lower()
        if any(low.startswith(s) for s in _SKIP_SCHEMES):
            continue
        try:
            absolute = _strip_fragment(urljoin(base, href))
        except ValueError:
            continue  # malformed IPv6 host etc: not an edge
        if not absolute.startswith(("http://", "https://")):
            continue
        if absolute not in seen:
            seen.add(absolute)
            out.append(absolute)
    return out
