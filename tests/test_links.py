"""Link extraction + web-graph tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_agent_spark.kernel.links import extract_links


def test_kernel_resolution_and_filters():
    html = b"""<html><head><base href="/sub/"></head><body>
    <a href="page1.html">one</a>
    <a href='../up.html'>two</a>
    <a href=bare.html>three</a>
    <a href="https://other.com/abs?q=1#frag">four</a>
    <a href="//cdn.example.com/x">five</a>
    <a href="#local">skip</a>
    <a href="javascript:void(0)">skip</a>
    <a href="mailto:x@y.z">skip</a>
    <a href="page1.html">dup</a>
    <A HREF="UPPER.html">six</A>
    </body></html>"""
    assert extract_links(html, "https://example.com/dir/index.html") == [
        "https://example.com/sub/page1.html",
        "https://example.com/up.html",
        "https://example.com/sub/bare.html",
        "https://other.com/abs?q=1",
        "https://cdn.example.com/x",
        "https://example.com/sub/UPPER.html",
    ]
    # no base tag: resolve against the page url's directory
    assert extract_links(b'<a href="x.html">', "https://e.com/a/b.html") == [
        "https://e.com/a/x.html"
    ]
    assert extract_links(b"no anchors here", "https://e.com/") == []


def test_kernel_total_on_hostile_input():
    # attribute soup, broken quoting, truncation: never raises
    for blob in (b"<a href=", b"<a href='unterminated", b"<a href=\"\">",
                 b"<a href=http://[::bad/", b"<base href='##'><a href='x'>"):
        assert isinstance(extract_links(blob, "https://e.com/"), list)


def test_spark_edges_and_host_graph(spark):
    from ocr_agent_spark.functions.links import extract_link_edges, host_graph

    pages = spark.createDataFrame(
        [
            ("https://a.com/1",
             b'<a href="https://b.com/x">1</a><a href="/local">2</a>'),
            ("https://a.com/2", b'<a href="https://b.com/x">1</a>'),
            ("https://b.com/1", b'<a href="https://a.com/">back</a>'),
            ("https://c.com/none", b"plain text"),
            ("https://d.com/null", None),
        ],
        "url string, html binary",
    )
    edges = extract_link_edges(pages)
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == {
        ("https://a.com/1", "https://b.com/x"),
        ("https://a.com/1", "https://a.com/local"),
        ("https://a.com/2", "https://b.com/x"),
        ("https://b.com/1", "https://a.com/"),
    }
    hg = {(r["src_host"], r["dst_host"]): r["n_links"]
          for r in host_graph(edges).collect()}
    # the a.com self-link is filtered; the two a->b edges aggregate
    assert hg == {("a.com", "b.com"): 2, ("b.com", "a.com"): 1}
    # graph aggregation is JVM-only after the edge pass
    plan = host_graph(edges.cache())._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_data_href_does_not_shadow_real_href():
    """(code-review r4d, reproduced) attributes ENDING in 'href'
    (data-href trackers) must not displace the genuine edge."""
    html = b'<a class="c" data-href="https://tracker.com/x" href="/real">y</a>'
    assert extract_links(html, "https://e.com/") == ["https://e.com/real"]
    # and a hostile base href keeps the page url as base, not a crash
    bad_base = b'<base data-href="https://t.com/" href="http://[::bad/"><a href="/x">y</a>'
    assert extract_links(bad_base, "https://e.com/") == ["https://e.com/x"]
