"""Pure-Python extraction kernels — no Spark imports allowed here.

These are the vectorization payloads: each function is called per
document *inside* an Arrow batch (``pd.Series.map`` over thousands of
rows per Python invocation), so they must be deterministic, exception-
safe at the call site, and free of global mutable state.
"""

from ocr_agent_spark.kernel.html_extract import extract_html_text
from ocr_agent_spark.kernel.mathdown import (
    MATH_STYLE_DOLLAR,
    MATH_STYLE_LATEX,
    convert_math_delimiters,
)
from ocr_agent_spark.kernel.minipdf import (
    build_pdf,
    build_pdf_positioned,
    extract_pdf_page_text,
    extract_pdf_page_text_columns,
    is_pdf_payload,
    pdf_page_count,
)
from ocr_agent_spark.kernel.merge import MergeRow, render_merged_markdown

__all__ = [
    "extract_html_text",
    "convert_math_delimiters",
    "MATH_STYLE_DOLLAR",
    "MATH_STYLE_LATEX",
    "build_pdf",
    "build_pdf_positioned",
    "pdf_page_count",
    "extract_pdf_page_text",
    "extract_pdf_page_text_columns",
    "is_pdf_payload",
    "MergeRow",
    "render_merged_markdown",
]
