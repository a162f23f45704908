"""Property-based kernel tests (hypothesis) — robustness + invariants.

The kernels run inside executor batches over arbitrary web bytes; a
crash there fails a whole Spark task (breaking D2), so 'never raises'
is itself a correctness property.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_agent_spark.kernel import extract_html_text
from ocr_agent_spark.kernel.mathdown import convert_math_delimiters

_text_with_math = st.lists(
    st.sampled_from(
        list("abc \n`~$") + ["\\(", "\\)", "\\[", "\\]", "```", "~~~"]
    ),
    max_size=60,
).map("".join)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=2048))
def test_html_extractor_total_on_arbitrary_bytes(data):
    out = extract_html_text(data)
    assert isinstance(out, str)
    assert out == "" or out.endswith("\n")


@settings(max_examples=300, deadline=None)
@given(_text_with_math)
def test_mathdown_idempotent_when_delimiters_consumed(text):
    # NOT idempotent in general: nested delimiters like \(\(\)\) leave
    # a residual \( \) pair after one pass (reference-parity behavior,
    # established by differential fuzz). Idempotence holds exactly when
    # the first pass consumed every delimiter outside fences.
    once = convert_math_delimiters(text)
    if "\\(" not in once and "\\[" not in once:
        assert convert_math_delimiters(once) == once


@settings(max_examples=300, deadline=None)
@given(_text_with_math)
def test_mathdown_latex_style_is_identity(text):
    assert convert_math_delimiters(text, "latex") == text


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=500))
def test_mathdown_preserves_line_count_outside_blocks(text):
    # The rewrite only ever touches delimiter substrings; a text with
    # no LaTeX delimiters must round-trip byte-identically.
    if "\\(" not in text and "\\[" not in text:
        assert convert_math_delimiters(text) == text
