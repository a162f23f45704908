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


_CLOSE_A_RE = re.compile(rb"</a\s*>", re.IGNORECASE)
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(r"\s+")

# Anchor-body scan bound: an unclosed <a href> on a pathological page
# must not scan to end-of-document (the old lazy `(.*?)</a>` regex was
# quadratic there — one EOF scan PER unclosed anchor). 64 KiB covers
# any real anchor text; longer bodies are treated as unclosed.
_ANCHOR_BODY_CAP = 1 << 16


def _resolve(href: str, base: str) -> str | None:
    """Shared href → absolute-url policy (schemes, fragments, errors)."""
    if not href or href.startswith("#"):
        return None
    low = href.lower()
    if any(low.startswith(s) for s in _SKIP_SCHEMES):
        return None
    try:
        absolute = _strip_fragment(urljoin(base, href))
    except ValueError:
        return None  # malformed IPv6 host etc: not an edge
    if not absolute.startswith(("http://", "https://")):
        return None
    return absolute


def _page_base(html_bytes: bytes, page_url: str) -> str:
    base = page_url
    bm = _BASE_RE.search(html_bytes)
    if bm:
        declared = _attr_value(bm)
        if declared:
            try:
                base = urljoin(page_url, declared)
            except ValueError:
                pass  # hostile <base href> (bad IPv6 etc): keep page_url
    return base


def extract_anchors(html_bytes: bytes, page_url: str) -> list[tuple[str, str]]:
    """(absolute_href, anchor_text) pairs, first-seen-deduped on href.

    Anchor text is the tag-stripped, entity-unescaped, whitespace-
    collapsed inner content of the <a> element — the string the link
    graph's anchor-text aggregation consumes (Common Crawl's wat/
    anchor datasets carry exactly this). Anchors whose close tag never
    appears within ``_ANCHOR_BODY_CAP`` bytes (truncated page, or a
    pathological unclosed tag) are skipped — no text evidence.

    Tag detection is the SAME ``_HREF_RE`` as ``extract_links``, so the
    two edge tables can never diverge on which ``<a href>`` openings
    they see; the only intentional difference is that anchors without a
    close tag appear in the link table (an edge exists) but not here
    (no text). The body is located with a bounded linear ``find``, not
    a lazy regex — O(page + anchors·cap) worst case instead of the old
    quadratic unclosed-anchor scan.
    """
    base = _page_base(html_bytes, page_url)
    out: list[tuple[str, str]] = []
    seen: set[str] = set()
    for m in _HREF_RE.finditer(html_bytes):
        absolute = _resolve(_attr_value(m), base)
        if absolute is None or absolute in seen:
            continue
        tag_end = html_bytes.find(b">", m.end())
        if tag_end < 0:
            continue  # open tag never closes: truncated page
        window = html_bytes[tag_end + 1:tag_end + 1 + _ANCHOR_BODY_CAP]
        cm = _CLOSE_A_RE.search(window)
        if cm is None:
            continue  # unclosed anchor: no text evidence
        inner = _TAG_RE.sub(b" ", window[:cm.start()])
        text = _WS_RE.sub(
            " ", _unescape(inner.decode("utf-8", "replace"))
        ).strip()
        seen.add(absolute)
        out.append((absolute, text))
    return out


def extract_links(html_bytes: bytes, page_url: str) -> list[str]:
    """Anchor hrefs of a page, absolutized and deduped in order."""
    base = _page_base(html_bytes, page_url)
    out: list[str] = []
    seen: set[str] = set()
    for m in _HREF_RE.finditer(html_bytes):
        absolute = _resolve(_attr_value(m), base)
        if absolute is not None and absolute not in seen:
            seen.add(absolute)
            out.append(absolute)
    return out
