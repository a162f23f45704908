"""Pure merge renderer: block shape, skip rules, trailing-newline norm.

Mirrors /root/reference/src/ocr_agent/markdown_merge.py:18-47 semantics.
"""

from ocr_agent_spark.kernel.merge import (
    MergeRow,
    render_merged_markdown,
    render_section_header,
)


def _row(url="https://a/x", kind="html", page_index=0, total_pages=None, text="body text"):
    return MergeRow(url=url, kind=kind, page_index=page_index,
                    total_pages=total_pages, text=text)


def test_document_shape():
    out = render_merged_markdown([_row(text="hello world")])
    assert out == (
        "# Extracted Output\n"
        "\n"
        "## https://a/x\n"
        "\n"
        "\n"
        "hello world\n"
        "\n"
        "---\n"
    )


def test_trailing_normalization():
    out = render_merged_markdown([_row(text="x\n\n\n")])
    assert out.endswith("---\n")
    assert not out.endswith("\n\n")


def test_pdf_page_header_one_based():
    h = render_section_header("u", "pdf_page", 2, 9)
    assert h == "## u (page 3/9)"
    # missing page metadata → plain header (markdown_merge.py:146-147)
    assert render_section_header("u", "pdf_page", None, None) == "## u"


def test_skip_null_and_blank_rows():
    rows = [
        _row(url="https://a/1", text="kept one"),
        _row(url="https://a/2", text=None),          # failed row (D2)
        _row(url="https://a/3", text="   \n  "),     # whitespace-only
        _row(url="https://a/4", text="kept two"),
    ]
    out = render_merged_markdown(rows)
    assert "https://a/1" in out and "https://a/4" in out
    assert "https://a/2" not in out and "https://a/3" not in out


def test_math_rewrite_applied_per_style():
    row = _row(text=r"math \( x \) here")
    assert "$x$" in render_merged_markdown([row], style="dollar")
    assert r"\( x \)" in render_merged_markdown([row], style="latex")


def test_empty_input_is_title_only():
    assert render_merged_markdown([]) == "# Extracted Output\n"
