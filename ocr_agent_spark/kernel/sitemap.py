"""Sitemap parsing (sitemaps.org XML) — stdlib ElementTree, namespace-
tolerant.

The discovery-side companion of the robots gate: crawlers seed their
frontier from ``<urlset>`` sitemaps and ``<sitemapindex>`` index files
(robots.txt's ``Sitemap:`` lines point at them). This kernel turns
sitemap bytes into (url, lastmod, changefreq, priority) rows plus the
child-sitemap list, handling:

- both document kinds (``urlset`` / ``sitemapindex``), any namespace
  prefix or none at all (real-world sitemaps are sloppy about the
  xmlns)
- gzip-compressed payloads (``sitemap.xml.gz``)
- W3C datetime lastmod (date-only or full timestamp, Z or offset)
- malformed XML → ``SitemapFormatError`` (triage row, not a task
  failure — same contract as every other ingest kernel)
"""

from __future__ import annotations

import datetime as _dt
import gzip
import xml.etree.ElementTree as ET
import zlib


class SitemapFormatError(ValueError):
    """Payload is not a parseable sitemap document."""


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _parse_lastmod(value: str | None) -> _dt.datetime | None:
    if not value:
        return None
    v = value.strip().replace("Z", "+00:00")
    try:
        ts = _dt.datetime.fromisoformat(v)
    except ValueError:
        return None
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=_dt.timezone.utc)
    return ts


def parse_sitemap(data: bytes) -> dict:
    """Sitemap bytes (plain or gzip) → dict(kind, entries, children).

    ``kind`` is ``"urlset"`` or ``"index"``; ``entries`` is a list of
    dicts (url, lastmod, changefreq, priority) for urlsets; ``children``
    lists child sitemap urls for index files.
    """
    if data[:2] == b"\x1f\x8b":
        # gzip raises THREE types for damage: OSError (bad header),
        # EOFError (truncated member), zlib.error (corrupt deflate) —
        # all must become the typed triage error (code-review r4c)
        try:
            data = gzip.decompress(data)
        except (OSError, EOFError, zlib.error) as exc:
            raise SitemapFormatError(f"corrupt gzip sitemap: {exc}") from exc
    try:
        root = ET.fromstring(data)
    except ET.ParseError as exc:
        raise SitemapFormatError(f"malformed sitemap XML: {exc}") from exc

    kind = _localname(root.tag)
    if kind == "urlset":
        entries = []
        for node in root:
            if _localname(node.tag) != "url":
                continue
            fields: dict[str, str | None] = {}
            for child in node:
                fields[_localname(child.tag)] = (child.text or "").strip()
            loc = fields.get("loc")
            if not loc:
                continue
            prio = fields.get("priority")
            try:
                priority = float(prio) if prio else None
            except ValueError:
                priority = None
            entries.append({
                "url": loc,
                "lastmod": _parse_lastmod(fields.get("lastmod")),
                "changefreq": fields.get("changefreq") or None,
                "priority": priority,
            })
        return {"kind": "urlset", "entries": entries, "children": []}
    if kind == "sitemapindex":
        children = []
        for node in root:
            if _localname(node.tag) != "sitemap":
                continue
            for child in node:
                if _localname(child.tag) == "loc" and child.text:
                    children.append(child.text.strip())
        return {"kind": "index", "entries": [], "children": children}
    raise SitemapFormatError(f"unknown sitemap root element <{root.tag}>")


def build_sitemap(entries, index_of: list[str] | None = None,
                  compress: bool = False) -> bytes:
    """Fixture writer: urlset from (url, lastmod, changefreq, priority)
    tuples, or a sitemapindex when ``index_of`` is given."""
    from xml.sax.saxutils import escape

    ns = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
    if index_of is not None:
        body = "".join(
            f"<sitemap><loc>{escape(u)}</loc></sitemap>" for u in index_of
        )
        xml = f'<?xml version="1.0" encoding="UTF-8"?><sitemapindex {ns}>{body}</sitemapindex>'
    else:
        parts = []
        for url, lastmod, changefreq, priority in entries:
            p = f"<url><loc>{escape(url)}</loc>"
            if lastmod is not None:
                p += f"<lastmod>{lastmod.strftime('%Y-%m-%dT%H:%M:%S+00:00')}</lastmod>"
            if changefreq:
                p += f"<changefreq>{escape(changefreq)}</changefreq>"
            if priority is not None:
                p += f"<priority>{priority:.1f}</priority>"
            parts.append(p + "</url>")
        xml = f'<?xml version="1.0" encoding="UTF-8"?><urlset {ns}>{"".join(parts)}</urlset>'
    out = xml.encode("utf-8")
    return gzip.compress(out, mtime=0) if compress else out
