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


# -- fast scanner vs stdlib reference (differential) -------------------------

_EDGE_DOCS = [
    b"a < b and a <3 you",
    b"<DIV CLASS='x'><p>T T T T T T T T T T T</p></DIV>",
    b"x<br/>y<br />z",
    b"<script>if(a<b){document.write('</div>');}</script><p>" + b"w " * 12 + b"</p>",
    b"<p a=\"q>uote\">" + b"v " * 12 + b"</p>",
    b"<!-- <div>c</div> --><p>" + b"d " * 12 + b"</p>",
    b"<?php x > y ?><p>" + b"f " * 12 + b"</p>",
    b"&amp; &lt;tag&gt; &#65; &#x42; &notasemi x",
    b"<style>p>q{}</style><p>" + b"g " * 12 + b"</p>",
    b"<p>unclosed " + b"u " * 12,
    b"</>h",
    b"< /p>i",
    b"<p foo='bar' baz>" + b"j " * 12,
    b"text &amp more",
    b"<title>T &amp; U</title><p>" + b"k " * 12 + b"</p>",
    b"<br>",
    b"<script>never closed",
    b"<p",
    b"<p attr='x",
    b"a<!-- x",
    b"a<?x",
    b"a<![CDATA[ x > y ]]><p>" + b"m " * 12 + b"</p>",
    b"<!-->trailing",
    b"</123><p>" + b"n " * 12 + b"</p>",
    b"<p>n\x00o</p>",
    b"<SCRIPT>x</SCRIPT><p>" + b"s " * 12 + b"</p>",
    b"<script >x</script ><p>" + b"t " * 12 + b"</p>",
    b"\xff\xfe garbage bytes<p>" + b"r " * 12 + b"</p>",
    # code-review r02 repros: each of these lost content on the first
    # fast-scanner cut
    b"<![if !IE]><p>hello world one two three four five six seven ten</p>"
    b"<![endif]><p>" + b"after " * 12 + b"</p>",
    b"<a href=x>link</a junk> lambda mu nu xi omicron pi rho sigma tau "
    b"upsilon phi chi",
    b"<p align=center'>one two three four five six seven eight nine ten "
    b"eleven twelve</p><p>it's a fine day isn't it friends of the corpus</p>",
    # stdlib tag-edge catalog
    b"</div foo><p>" + b"dd " * 12 + b"</p>",
    b"<br / ><p>" + b"ee " * 12 + b"</p>",
    b'<p a="1"b>' + b"ff " * 12 + b"</p>",
    b"<p/ x>" + b"gg " * 12 + b"</p>",
    b"</a,b><p>" + b"hh " * 12 + b"</p>",
    b"<![CDATA[a>b]]><p>" + b"ii " * 12 + b"</p>",
    b"<![endif]><p>" + b"jj " * 12 + b"</p>",
    b"<p =x>" + b"kk " * 12 + b"</p>",
    b"<p a='x'b c>" + b"ll " * 12 + b"</p>",
    b"<div data-x='a>b'><p>" + b"mm " * 12 + b"</p></div>",
]


def test_fast_scanner_equals_stdlib_on_fixtures():
    """The hot-path tokenizer must be output-identical to the stdlib
    html.parser reference on the full fixture corpus."""
    pages = [r for r in generate_pages(800) if r.html[:4] != b"%PDF"]
    for r in pages:
        assert extract_html_text(r.html) == extract_html_text(
            r.html, _stdlib_parser=True
        ), r.url


def test_fast_scanner_equals_stdlib_on_edge_cases():
    for doc in _EDGE_DOCS:
        assert extract_html_text(doc) == extract_html_text(
            doc, _stdlib_parser=True
        ), doc


def test_fast_scanner_tolerates_unknown_marked_sections():
    """Documented divergence: stdlib html.parser raises AssertionError
    on unknown marked-section keywords; the production scanner must
    keep extracting instead of crashing the job."""
    import pytest as _pytest

    doc = b"<![foo[x]]><p>alpha beta gamma delta epsilon zeta eta theta " \
          b"iota kappa</p>"
    out = extract_html_text(doc)
    assert "alpha beta" in out
    with _pytest.raises(AssertionError):
        extract_html_text(doc, _stdlib_parser=True)


def test_fast_scanner_equals_stdlib_fuzz():
    import random

    frags = [
        "<p>", "</p>", "<div>", "</div>", "<br/>", "<br>", "word ", "&amp; ",
        "&#65;", "&bogus ", "<a href='x'>", "</a>", "<script>", "</script>",
        "<style>", "</style>", "< ", "<", ">", "<!-- c -->", "<!doctype html>",
        "<?pi?>", "<h2>", "</h2>", "lots of words here ", '"q"', "'q'",
        '<td x="a>b">', "</td>", "<nav>", "</nav>", "<title>", "</title>",
        "\n", "\t",
        # tolerant-machinery stressors (code-review r02)
        "</p junk>", "</a junk>", "<p align=center'>", "<br / >",
        "<p a='1'b>", "<p/ x>", "</a,b>", "<![if !IE]>", "<![endif]>",
        "<![CDATA[ x > y ]]>", "<p =x>", "'", '"', "=", "/",
        "<p a = 'v'>", "<p a==b>", "<img src=x.png/>", "<A HREF=X>",
        "</A >", "<p\tx='1'>", "&", "&#", ";&x",
        # unterminated constructs (goahead end-of-feed recovery)
        "<p a='", '<p a="', "<!-- x", "<?x", "</p", "<![if ", "<p/", "<p /",
    ]
    for seed in range(800):
        rng = random.Random(seed)
        doc = "".join(
            rng.choice(frags) for _ in range(rng.randint(1, 60))
        ).encode()
        assert extract_html_text(doc) == extract_html_text(
            doc, _stdlib_parser=True
        ), (seed, doc)
