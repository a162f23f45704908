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
#   - tag names lowercased; '>' inside quoted attribute values;
#     stdlib's exact tolerant patterns are REUSED (imported), and the
#     attr walk advances through them without building attr tuples —
#     that construction (plus position tracking) is where the 91% went
#   - <br/> → startendtag (via the same end-text check as
#     parse_starttag, so '<br / >' stays a plain starttag); stray '<'
#     and malformed tag tails become literal data
#   - bogus end tags ('</a junk>') emit the endtag like stdlib's
#     tagfind_tolerant fallback; '</>' and '</123>' consume silently
#   - script/style content is CDATA (embedded tags are data; unclosed
#     CDATA at EOF is dropped); charrefs are NOT converted inside it
#   - comments / <!...> / <?...> consumed without events (PI consumed
#     through the FIRST '>', like parse_pi); marked sections use the
#     stdlib keyword rule (']>' close for if/else/endif, ']]>' for
#     cdata/ignore/...). ONE deliberate divergence: stdlib RAISES
#     AssertionError on unknown marked-section keywords ('<![foo[');
#     the scanner consumes them tolerantly instead of crashing the job
#     (asserted in tests).
#   - charrefs converted in data (same table as html.unescape)

import re
from html import unescape as _unescape
from html.parser import (
    attrfind_tolerant as _ATTRFIND,
    endtagfind as _ENDTAGFIND,
    locatestarttagend_tolerant as _LOCATE_START,
    tagfind_tolerant as _TAGFIND,
)

_CDATA_CLOSE = {
    t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE) for t in ("script", "style")
}
_MARKED_CLOSE = re.compile(r"\]\s*\]\s*>")     # _markupbase._markedsectionclose
_MS_MARKED_CLOSE = re.compile(r"\]\s*>")       # _markupbase._msmarkedsectionclose
_DECLNAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")  # _markupbase._declname_match
_MS_KEYWORDS = frozenset({"if", "else", "endif"})
_STD_KEYWORDS = frozenset({"temp", "cdata", "ignore", "include", "rcdata"})
# check_for_whole_start_tag's "end of input in or before attribute
# value" character set (a next-char in this set means stdlib waits for
# more data, then drops the tail at EOF):
_TAG_LIMBO = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ=/")

# Well-formed tag fast path, one anchored alternation consuming the
# preceding data run plus EITHER a simple start tag or a plain end tag.
# A start-tag match here is PROVABLY equivalent to the full tolerant
# machinery: alnum tag name followed by a delimiter; attrs are
# space-separated names with optionally '='-joined values whose quoted
# forms contain no '>' / stray quote and whose bare forms draw from a
# safe class; the tag closes at a real '>' or '/>'. Anything else
# (stray quotes, '=' junk, missing spaces, exotic names) falls back to
# the stdlib-faithful slow branch below. On real crawl HTML ~all tags
# take this path.
_SIMPLE_TAG = re.compile(
    r"([^<]*)"
    r"<(?:([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*"
    r"(?:=\"[^\"'<>]*\"|='[^\"'<>]*'|=[-a-zA-Z0-9_./:;+#%?&~,]*)?)*)"
    r"\s*(/?)>"
    r"|/([a-zA-Z][a-zA-Z0-9]*)\s*>)"
)


# Tags whose events change the consumer's state; everything else
# (span/em/strong/img/...) is a consumer no-op and skipping the
# dispatch saves two calls per tag occurrence (~770k calls per 20k-doc
# batch). The stdlib reference path dispatches everything — outputs
# stay identical because those handlers ignore unlisted tags.
_INTERESTING_TAGS = frozenset(
    _BLOCK_TAGS | _IGNORED_SUBTREES | {"a", "title"}
)

# (lowered, is_interesting, is_cdata) per RAW tag spelling — real HTML
# repeats a tiny tag vocabulary with few case variants, so this global
# memo turns per-tag .lower() + two set probes into one dict hit. Only
# consulted for the default interesting-set (custom sets skip it).
_TAG_INFO: dict[str, tuple[str, bool, bool]] = {}


def _tag_info(raw: str) -> tuple[str, bool, bool]:
    info = _TAG_INFO.get(raw)
    if info is None:
        low = raw.lower()
        info = (low, low in _INTERESTING_TAGS, low in _CDATA_CLOSE)
        if len(_TAG_INFO) < 4096:  # adversarial unique-tag bomb guard
            _TAG_INFO[raw] = info
    return info


def _fast_feed(text: str, c: _BlockConsumer,
               interesting: frozenset[str] = _INTERESTING_TAGS) -> None:
    """Emit start/end/startend/data events from ``text`` into ``c``."""
    i, n = 0, len(text)
    find = text.find
    data = c.handle_data
    default_set = interesting is _INTERESTING_TAGS

    def recover(lt: int) -> int:
        # goahead's end-of-feed recovery for incomplete constructs
        # (parse_* returned -1 with end=1): emit through the next '>'
        # as data, else up to the next '<', else just the '<'.
        gt = find(">", lt + 1)
        if gt >= 0:
            end_at = gt + 1
        else:
            lt2 = find("<", lt + 1)
            end_at = lt2 if lt2 >= 0 else lt + 1
        seg = text[lt:end_at]
        data(_unescape(seg) if "&" in seg else seg)
        return end_at

    while i < n:
        # fast path: one anchored match consumes the data run AND the
        # following plain start/end tag
        sm = _SIMPLE_TAG.match(text, i)
        if sm is not None:
            seg = sm.group(1)
            if seg:
                data(_unescape(seg) if "&" in seg else seg)
            raw = sm.group(2)
            if raw is None:  # </name> form
                if default_set:
                    tag, is_int, _ = _tag_info(sm.group(5))
                else:
                    tag = sm.group(5).lower()
                    is_int = tag in interesting
                if is_int:
                    c.handle_endtag(tag)
                i = sm.end()
                continue
            if default_set:
                tag, is_int, is_cdata = _tag_info(raw)
            else:
                tag = raw.lower()
                is_int = tag in interesting
                is_cdata = tag in _CDATA_CLOSE
            i = sm.end()
            if sm.group(4):
                if is_int:
                    c.handle_startendtag(tag, [])
                continue
            if is_int:
                c.handle_starttag(tag, [])
            if is_cdata:
                mm = _CDATA_CLOSE[tag].search(text, i)
                if mm is None:
                    return  # unclosed CDATA: content dropped (stdlib)
                if mm.start() > i:
                    data(text[i:mm.start()])  # raw: no charref conversion
                c.handle_endtag(tag)
                i = mm.end()
            continue
        # slow path: emit the data run, then the tolerant branches
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
            # parse_starttag, faithfully: locate the tolerant tag end,
            # classify the char after it (check_for_whole_start_tag),
            # walk the attrs without materializing them, then apply the
            # same end-text check that decides start/startend/data.
            j = _LOCATE_START.match(text, lt).end()
            nxt2 = text[j:j + 1]
            if nxt2 == ">":
                endpos = j + 1
            elif nxt2 == "/":
                if text.startswith("/>", j):
                    endpos = j + 2
                else:  # '/' not closing: incomplete → data recovery
                    i = recover(lt)
                    continue
            elif nxt2 == "" or nxt2 in _TAG_LIMBO:
                i = recover(lt)  # incomplete tag at end of feed
                continue
            else:
                endpos = j  # malformed junk → data path below
            tm = _TAGFIND.match(text, lt + 1)
            k = tm.end()
            while k < endpos:
                am = _ATTRFIND.match(text, k)
                if am is None or am.end() <= k:
                    break
                k = am.end()
            end = text[k:endpos].strip()
            if end != ">" and end != "/>":
                data(text[lt:endpos])  # raw: stdlib bypasses charrefs here
                i = endpos if endpos > lt else lt + 1
                continue
            tag = tm.group(1).lower()
            i = endpos
            if end == "/>":
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
            m = _ENDTAGFIND.match(text, lt)
            if m is not None:
                tag = m.group(1).lower()
                if tag in interesting:
                    c.handle_endtag(tag)
                i = m.end()
            elif text.startswith("</>", lt):
                i = lt + 3
            else:
                nm = _TAGFIND.match(text, lt + 2)
                if nm is None:
                    gt = find(">", lt)  # bogus comment: silent consume
                    if gt < 0:
                        i = recover(lt)
                    else:
                        i = gt + 1
                else:
                    # stdlib's tolerant fallback: emit the endtag, then
                    # skip to the '>' after the name ('</a junk>' → e:a)
                    gt = find(">", nm.end())
                    if gt < 0:
                        i = recover(lt)
                    else:
                        tag = nm.group(1).lower()
                        if tag in interesting:
                            c.handle_endtag(tag)
                        i = gt + 1
        elif nxt == "!":
            if text.startswith("<!--", lt):
                e = find("-->", lt + 4)
                i = e + 3 if e >= 0 else recover(lt)
            elif text.startswith("<![", lt):
                nm = _DECLNAME.match(text, lt + 3)
                name = nm.group(0).strip().lower() if nm else None
                if name in _MS_KEYWORDS:       # <![if !IE]> closes at ']>'
                    mm = _MS_MARKED_CLOSE.search(text, lt + 3)
                elif name in _STD_KEYWORDS:    # <![CDATA[...]]>
                    mm = _MARKED_CLOSE.search(text, lt + 3)
                else:
                    # stdlib raises AssertionError here; stay tolerant:
                    # ']]>' close, else the same data recovery.
                    mm = _MARKED_CLOSE.search(text, lt + 3)
                i = mm.end() if mm is not None else recover(lt)
            else:
                gt = find(">", lt + 2)  # doctype / bogus declaration
                i = gt + 1 if gt >= 0 else recover(lt)
        elif nxt == "?":
            gt = find(">", lt + 2)
            i = gt + 1 if gt >= 0 else recover(lt)
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
