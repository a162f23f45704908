r"""Fence-aware LaTeX-math delimiter normalization.

Behavioral contract (reference: markdown_merge.py:50-136, exactly):

- ``\( x \)``  → ``$x$``      (content ``.strip()``-ed, DOTALL so it may span lines)
- ``\[ x \]``  → ``$$\nx\n$$`` (content ``.strip("\n")``-ed; block rule runs first)
- Text inside fenced code blocks (``` or ~~~, 3+ marker chars after
  optional leading whitespace) is never rewritten. (The reference's
  "indented fences are plain text" branch at markdown_merge.py:96-102
  is unreachable — its regex captures only whitespace as the indent, so
  ``indent.strip() != ""`` never fires; verified by differential fuzz.
  We reproduce the actual behavior: whitespace-indented fences ARE
  fences.)
- A fence closes only on a marker line whose first char matches the
  opener's char (so ```` closes ```, but ~~~ does not).
- An unclosed fence runs to EOF (remainder untouched).
- The rewrite applies only under the "dollar" style; "latex" means
  no-op; an unrecognized style falls back to the default ("dollar",
  reference config.py:116-122).

This is a stateful per-line scan — not expressible as a native SQL
regexp — so in the Spark layer it runs as a Series→Series pandas UDF
(one Python call per Arrow batch, ``Series.map`` across documents).
"""

from __future__ import annotations

import re

MATH_STYLE_DOLLAR = "dollar"
MATH_STYLE_LATEX = "latex"
DEFAULT_MATH_STYLE = MATH_STYLE_DOLLAR
_VALID_STYLES = frozenset({MATH_STYLE_DOLLAR, MATH_STYLE_LATEX})

_RE_INLINE = re.compile(r"\\\((.+?)\\\)", re.DOTALL)
_RE_BLOCK = re.compile(r"\\\[(.+?)\\\]", re.DOTALL)
_RE_FENCE = re.compile(r"^(\s*)(`{3,}|~{3,})")


def normalize_math_style(style: str | None) -> str:
    """Unknown/None style → default (reference config.py:116-122)."""
    if style in _VALID_STYLES:
        return style
    return DEFAULT_MATH_STYLE


def _rewrite_plain_segment(segment: str) -> str:
    segment = _RE_BLOCK.sub(
        lambda m: "$$\n" + m.group(1).strip("\n") + "\n$$", segment
    )
    return _RE_INLINE.sub(lambda m: "$" + m.group(1).strip() + "$", segment)


def convert_math_delimiters(text: str, style: str | None = MATH_STYLE_DOLLAR) -> str:
    """Apply the delimiter rewrite outside fenced code blocks."""
    if normalize_math_style(style) != MATH_STYLE_DOLLAR:
        return text

    # Fast paths (byte-identical, differential-fuzz-pinned): without a
    # fence marker substring no line can open a fence, so the whole
    # text is one plain segment — and without a math opener the regex
    # subs are identity. Most corpus documents take one of these
    # branches, skipping the per-line Python scan entirely.
    if "```" not in text and "~~~" not in text:
        if "\\(" not in text and "\\[" not in text:
            return text
        return _rewrite_plain_segment(text)

    out: list[str] = []
    plain_buf: list[str] = []
    fence_char: str | None = None  # non-None ⇔ inside a fence

    def drain_plain() -> None:
        if plain_buf:
            out.append(_rewrite_plain_segment("".join(plain_buf)))
            plain_buf.clear()

    for line in text.splitlines(keepends=True):
        m = _RE_FENCE.match(line)
        is_fence_line = m is not None and m.group(1).strip() == ""
        if not is_fence_line:
            # Regular text (or an indented pseudo-fence, which is text).
            (out if fence_char else plain_buf).append(line)
            continue
        marker = m.group(2)
        if fence_char is None:
            drain_plain()
            fence_char = marker[0]
            out.append(line)
        elif marker[0] == fence_char:
            fence_char = None
            out.append(line)
        else:
            out.append(line)  # a different fence char inside a fence: code
    drain_plain()
    return "".join(out)
