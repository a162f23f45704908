"""Main-content extraction from raw HTML bytes.

Boilerpipe/trafilatura-style block scoring implemented on the stdlib
``html.parser`` (the container carries no lxml): the page is segmented
into text blocks at block-level tag boundaries, each block gets a word
count and a link density (chars inside <a> / total chars), and blocks
are classified content vs boilerplate with a densitometric rule plus a
one-step context smoothing pass (short blocks adjacent to content are
rescued). Headings survive only when they introduce kept content;
obvious chrome containers (<nav>, <footer>, <aside>, <header>, <form>)
are dropped wholesale.

This is the rebuild's analogue of the reference's per-image OCR payload
(/root/reference/src/ocr_agent/deepseek_ocr2_runner.py:122-177): the
per-row black box that turns one raw document into markdown-ish text.
Unlike the reference it is fully deterministic, so tests assert
byte-identical output (BASELINE.json invariant).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

# Tags whose entire subtree is never content.
_IGNORED_SUBTREES = frozenset(
    {
        "script",
        "style",
        "noscript",
        "template",
        "svg",
        "iframe",
        "head",
        "form",
        "button",
        "select",
        "option",
        "nav",
        "footer",
        "aside",
        "header",
    }
)

# Tags that open/close a text block.
_BLOCK_TAGS = frozenset(
    {
        "p",
        "div",
        "section",
        "article",
        "main",
        "body",
        "li",
        "td",
        "th",
        "tr",
        "table",
        "ul",
        "ol",
        "blockquote",
        "pre",
        "figure",
        "figcaption",
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
        "h6",
        "br",
        "hr",
    }
)

_HEADING_LEVEL = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}

_VOID_TAGS = frozenset({"br", "hr", "img", "meta", "link", "input"})

# Densitometric thresholds (Boilerpipe NumWordsRules-style).
_MIN_CONTENT_WORDS = 10
_MAX_CONTENT_LINK_DENSITY = 0.33
_MIN_NEIGHBOR_WORDS = 4


@dataclass
class _Block:
    tag: str
    parts: list[str] = field(default_factory=list)
    total_chars: int = 0
    link_chars: int = 0
    # Memoized on first access — blocks are only read after their last
    # append (_flush and later), and the profiler showed text/word_count
    # recomputed 3-4x per block across flush/classify/render.
    _text: str | None = None
    _wc: int | None = None

    @property
    def text(self) -> str:
        t = self._text
        if t is None:
            t = self._text = " ".join("".join(self.parts).split())
        return t

    @property
    def word_count(self) -> int:
        w = self._wc
        if w is None:
            w = self._wc = len(self.text.split())
        return w

    @property
    def link_density(self) -> float:
        if self.total_chars <= 0:
            return 0.0
        return self.link_chars / self.total_chars

    @property
    def heading_level(self) -> int:
        return _HEADING_LEVEL.get(self.tag, 0)


class _BlockConsumer:
    """Tag/data event consumer segmenting a document into scored blocks.

    Parser-agnostic: fed either by the fast scanner below (the hot
    path) or by stdlib ``html.parser`` (the behavioral reference the
    scanner is differential-tested against). Attributes are never
    consulted — only tag names and text matter to the segmentation.
    """

    def __init__(self) -> None:
        self.blocks: list[_Block] = []
        self.title_parts: list[str] = []
        self._ignore_depth = 0
        self._anchor_depth = 0
        self._in_title = False
        self._current: _Block | None = None

    # -- tag events ------------------------------------------------------

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag == "title":
            self._in_title = True
            return
        if tag in _IGNORED_SUBTREES:
            self._ignore_depth += 1
            return
        if self._ignore_depth:
            return
        if tag == "a":
            self._anchor_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag not in _VOID_TAGS:
                self._current = _Block(tag=tag)

    def handle_endtag(self, tag: str) -> None:
        if tag == "title":
            self._in_title = False
            return
        if tag in _IGNORED_SUBTREES:
            if self._ignore_depth:
                self._ignore_depth -= 1
            return
        if self._ignore_depth:
            return
        if tag == "a":
            if self._anchor_depth:
                self._anchor_depth -= 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _BLOCK_TAGS and tag in _VOID_TAGS:
            # <br/> splits the current block.
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self.title_parts.append(data)
            return
        if self._ignore_depth or not data:
            return
        if self._current is None:
            self._current = _Block(tag="_text")
        self._current.parts.append(data)
        n = len(data)
        self._current.total_chars += n
        if self._anchor_depth:
            self._current.link_chars += n

    # -- helpers ---------------------------------------------------------

    def _flush(self) -> None:
        block = self._current
        self._current = None
        if block is not None and block.text:
            self.blocks.append(block)

    def finish(self) -> None:
        self._flush()


class _StdlibSegmenter(HTMLParser):
    """stdlib adapter: html.parser events → _BlockConsumer (reference
    implementation for the fast scanner's differential tests)."""

    def __init__(self, consumer: _BlockConsumer) -> None:
        super().__init__(convert_charrefs=True)
        self._c = consumer

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        self._c.handle_starttag(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        self._c.handle_endtag(tag)

    def handle_startendtag(self, tag: str, attrs) -> None:  # noqa: ANN001
        self._c.handle_startendtag(tag, attrs)

    def handle_data(self, data: str) -> None:
        self._c.handle_data(data)


# ---------------------------------------------------------------------------
# Fast tokenizer (the hot path)
# ---------------------------------------------------------------------------
#
# The profiler shows 91% of kernel time inside stdlib html.parser's
# generic machinery (attribute parsing, position tracking) — none of
# which the segmenter consumes: only tag NAMES and text matter. This
# scanner reproduces html.parser's observable behavior for exactly the
# events _BlockConsumer uses, and is differential-tested against the
# stdlib parser (same consumer, same output) over the full fixture
# corpus, a hand-built edge-case set, and randomized fuzz
# (tests/test_kernel_html.py). Behaviors replicated:
#   - tag names lowercased; '>' inside quoted attribute values
#   - <br/> → startendtag; stray '<' → literal data
#   - script/style content is CDATA (embedded tags are data; unclosed
#     CDATA at EOF is dropped); charrefs are NOT converted inside it
#   - comments / <!...> / <![...]]> / <?...> consumed without events
#     (PI consumed through the FIRST '>', like parse_pi)
#   - charrefs converted in data (same table as html.unescape)

import re
from html import unescape as _unescape

_STARTTAG_RE = re.compile(
    r"<([a-zA-Z][^\t\n\r\f />\x00]*)"          # tag name
    r"((?:[^>'\"]+|\"[^\"]*\"|'[^']*')*?)"      # attrs (quotes may hold '>')
    r"(/?)>"
)
_ENDTAG_RE = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_CDATA_CLOSE = {
    t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE) for t in ("script", "style")
}
_MARKED_CLOSE = re.compile(r"\]\s*\]\s*>")


# Tags whose events change the consumer's state; everything else
# (span/em/strong/img/...) is a consumer no-op and skipping the
# dispatch saves two calls per tag occurrence (~770k calls per 20k-doc
# batch). The stdlib reference path dispatches everything — outputs
# stay identical because those handlers ignore unlisted tags.
_INTERESTING_TAGS = frozenset(
    _BLOCK_TAGS | _IGNORED_SUBTREES | {"a", "title"}
)


def _fast_feed(text: str, c: _BlockConsumer,
               interesting: frozenset[str] = _INTERESTING_TAGS) -> None:
    """Emit start/end/startend/data events from ``text`` into ``c``."""
    i, n = 0, len(text)
    find = text.find
    data = c.handle_data
    while i < n:
        lt = find("<", i)
        if lt < 0:
            seg = text[i:]
            data(_unescape(seg) if "&" in seg else seg)
            return
        if lt > i:
            seg = text[i:lt]
            data(_unescape(seg) if "&" in seg else seg)
        nxt = text[lt + 1:lt + 2]
        if "a" <= nxt <= "z" or "A" <= nxt <= "Z":
            m = _STARTTAG_RE.match(text, lt)
            if m is None:
                return  # incomplete tag at EOF: stdlib buffers then drops
            tag = m.group(1).lower()
            i = m.end()
            if m.group(3):
                if tag in interesting:
                    c.handle_startendtag(tag, [])
                continue
            if tag in interesting:
                c.handle_starttag(tag, [])
            if tag in _CDATA_CLOSE:
                mm = _CDATA_CLOSE[tag].search(text, i)
                if mm is None:
                    return  # unclosed CDATA: content dropped (stdlib)
                if mm.start() > i:
                    data(text[i:mm.start()])  # raw: no charref conversion
                c.handle_endtag(tag)
                i = mm.end()
        elif nxt == "/":
            m = _ENDTAG_RE.match(text, lt)
            if m is not None:
                tag = m.group(1).lower()
                if tag in interesting:
                    c.handle_endtag(tag)
                i = m.end()
            else:
                gt = find(">", lt)  # '</>' / bogus endtag: silent consume
                if gt < 0:
                    return
                i = gt + 1
        elif nxt == "!":
            if text.startswith("<!--", lt):
                e = find("-->", lt + 4)
                if e < 0:
                    return
                i = e + 3
            elif text.startswith("<![", lt):
                mm = _MARKED_CLOSE.search(text, lt + 3)
                if mm is None:
                    return
                i = mm.end()
            else:
                gt = find(">", lt)
                if gt < 0:
                    return
                i = gt + 1
        elif nxt == "?":
            gt = find(">", lt)
            if gt < 0:
                return
            i = gt + 1
        else:  # stray '<' (incl. '< /p>', '<3'): literal data, step over
            data("<")
            i = lt + 1


def _classify(blocks: list[_Block]) -> list[bool]:
    """Content/boilerplate decision per block, with context smoothing."""
    base = [
        b.word_count >= _MIN_CONTENT_WORDS
        and b.link_density <= _MAX_CONTENT_LINK_DENSITY
        and not b.heading_level
        for b in blocks
    ]
    kept = list(base)
    # Smoothing: a short low-link block sandwiched next to content is
    # content too (Boilerpipe's neighbor rule).
    for i, b in enumerate(blocks):
        if kept[i] or b.heading_level:
            continue
        if b.word_count >= _MIN_NEIGHBOR_WORDS and b.link_density <= _MAX_CONTENT_LINK_DENSITY:
            prev_kept = i > 0 and base[i - 1]
            next_kept = i + 1 < len(blocks) and base[i + 1]
            if prev_kept or next_kept:
                kept[i] = True
    # Headings survive iff they introduce kept content before the next
    # heading (readability-style).
    for i, b in enumerate(blocks):
        if not b.heading_level:
            continue
        if b.link_density > _MAX_CONTENT_LINK_DENSITY:
            continue
        for j in range(i + 1, len(blocks)):
            if blocks[j].heading_level:
                break
            if kept[j]:
                kept[i] = True
                break
    return kept


def extract_html_text(html_bytes: bytes, _stdlib_parser: bool = False) -> str:
    """bytes of an HTML document → extracted main-content markdown.

    Output contract (normalization per the reference's merge rule,
    /root/reference/src/ocr_agent/markdown_merge.py:47): UTF-8 text,
    ``\\n`` line endings, blocks joined by blank lines, exactly one
    trailing newline. Empty page → ``""``.

    ``_stdlib_parser`` switches to the html.parser-driven reference
    path (≈3× slower) — used by the differential tests that prove the
    fast scanner's output identical.
    """
    text = html_bytes.decode("utf-8", errors="replace")
    consumer = _BlockConsumer()
    if _stdlib_parser:
        p = _StdlibSegmenter(consumer)
        p.feed(text)
        p.close()
    else:
        _fast_feed(text, consumer)
    consumer.finish()

    blocks = consumer.blocks
    kept = _classify(blocks)

    out_lines: list[str] = []
    title = " ".join("".join(consumer.title_parts).split())
    if title and any(kept):
        out_lines.append(f"# {title}")
    for block, keep in zip(blocks, kept):
        if not keep:
            continue
        if block.heading_level:
            out_lines.append(f"{'#' * (block.heading_level + 1)} {block.text}")
        else:
            out_lines.append(block.text)
    if not out_lines:
        return ""
    return "\n\n".join(out_lines).rstrip() + "\n"
