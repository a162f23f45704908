"""Golden tests for the HTML main-content extraction kernel.

Strategy per SURVEY §5: the rebuild is deterministic, so golden
byte-equality replaces the reference's fuzzy contains-check
(tests/test_synthetic_ocr.py:34-36); marker-presence property tests
mirror its HELLO_DEEPSEEK_OCR2_12345 fixture marker (:21).
"""

from ocr_agent_spark.fixtures import generate_page, generate_pages
from ocr_agent_spark.kernel import extract_html_text


def test_golden_simple_article():
    html = (
        b"<html><head><title>My Title</title></head><body>"
        b"<nav><a href='/a'>home</a><a href='/b'>about</a><a href='/c'>contact us</a></nav>"
        b"<h1>The Heading</h1>"
        b"<p>This is the first real paragraph of the page body with plenty of words inside it.</p>"
        b"<p>Second paragraph also has enough words to count as main page content here.</p>"
        b"<footer><a href='/x'>terms</a> <a href='/y'>privacy</a></footer>"
        b"</body></html>"
    )
    expected = (
        "# My Title\n"
        "\n"
        "## The Heading\n"
        "\n"
        "This is the first real paragraph of the page body with plenty of words inside it.\n"
        "\n"
        "Second paragraph also has enough words to count as main page content here.\n"
    )
    assert extract_html_text(html) == expected


def test_boilerplate_stripped():
    rec = generate_page(7)
    text = extract_html_text(rec.html) if rec.html[:4] != b"%PDF" else ""
    for i in range(200):
        rec = generate_page(i)
        if rec.html[:4] == b"%PDF":
            continue
        text = extract_html_text(rec.html)
        assert "Navigation link" not in text
        assert "footer item" not in text
        assert "related story" not in text
        assert "boilerplate" not in text  # script content
        assert "subscribe now" not in text  # header chrome
        assert f"DOC_{i}_PARA_0" in text  # main content survives
        assert text.endswith("\n") and not text.endswith("\n\n")


def test_link_density_gate():
    # A 12-word block that is mostly anchor text is boilerplate.
    html = (
        b"<html><body>"
        b"<p><a href='/1'>one two three four five six seven eight nine ten</a> tail word</p>"
        b"<p>plain paragraph with more than ten words of actual readable content in it</p>"
        b"</body></html>"
    )
    text = extract_html_text(html)
    assert "one two three" not in text
    assert "plain paragraph" in text


def test_neighbor_rescue():
    # A short block between/next to content blocks is rescued.
    html = (
        b"<html><body>"
        b"<p>first long paragraph with definitely more than ten words of real content here ok</p>"
        b"<p>short but relevant line</p>"
        b"<p>another long paragraph with definitely more than ten words of real content here</p>"
        b"</body></html>"
    )
    text = extract_html_text(html)
    assert "short but relevant line" in text


def test_heading_without_content_dropped():
    html = (
        b"<html><body>"
        b"<h2>Orphan heading</h2>"
        b"<p><a href='/x'>just a link</a></p>"
        b"<h2>Real heading</h2>"
        b"<p>a paragraph with definitely more than ten words of genuine body content here</p>"
        b"</body></html>"
    )
    text = extract_html_text(html)
    assert "Orphan heading" not in text
    assert "## Real heading" in text


def test_empty_page():
    assert extract_html_text(b"<html><body></body></html>") == ""
    assert extract_html_text(b"") == ""


def test_malformed_html_no_crash():
    text = extract_html_text(b"<p>unclosed paragraph with enough words to be kept as page content here")
    assert "unclosed paragraph" in text


def test_non_utf8_bytes_replaced():
    html = b"<html><body><p>caf\xff and more words to pass the content threshold easily now</p></body></html>"
    text = extract_html_text(html)
    assert "and more words" in text


def test_determinism_per_row_seed():
    # Row i is byte-identical regardless of corpus size (distributed gen).
    a = generate_pages(10)
    b = generate_pages(50)
    for i in range(10):
        assert a[i] == b[i]
