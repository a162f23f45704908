"""URL/domain blocklist gate (functions/urlfilter.py)."""

import pyspark.sql.functions as F
import pytest

from ocr_agent_spark.functions import urlfilter

URLS = [
    "https://example.com/page",
    "https://sub.example.com/deep/path",
    "http://EXAMPLE.com:80/upper",
    "https://notexample.com/clean",        # must NOT match example.com
    "https://example.community/clean",     # nor a longer first label
    "https://fine.org/ads/banner.gif",     # pattern hit
    "https://fine.org/article?sessionid=7",
    "https://fine.org/article",
]


@pytest.fixture(scope="module")
def urls(spark):
    return spark.createDataFrame([(u,) for u in URLS], "url string").persist()


BLOCK_DOMS = ["example.com"]
BLOCK_PATS = ["/ads/", "?sessionid="]
EXPECT_KEPT = {
    "https://notexample.com/clean",
    "https://example.community/clean",
    "https://fine.org/article",
}


def test_expression_form(spark, urls):
    got = {r["url"] for r in urls.filter(
        ~urlfilter.blocked_url_expr(BLOCK_DOMS, BLOCK_PATS)
    ).collect()}
    assert got == EXPECT_KEPT


def test_broadcast_join_form_matches_expression(spark, urls):
    kept = {r["url"] for r in urlfilter.filter_blocked_urls(
        urls, BLOCK_DOMS, BLOCK_PATS).collect()}
    assert kept == EXPECT_KEPT
    blocked = {r["url"] for r in urlfilter.filter_blocked_urls(
        urls, BLOCK_DOMS, BLOCK_PATS, keep_blocked=True).collect()}
    assert blocked == set(URLS) - EXPECT_KEPT


def test_subdomain_and_case_semantics(spark):
    df = spark.createDataFrame(
        [("https://a.B.Example.COM/x",), ("https://bexample.com/x",)],
        "url string",
    )
    kept = {r["url"] for r in urlfilter.filter_blocked_urls(
        df, ["example.com"]).collect()}
    assert kept == {"https://bexample.com/x"}
    # blocking a subdomain does not block the parent
    kept2 = {r["url"] for r in urlfilter.filter_blocked_urls(
        spark.createDataFrame([("https://example.com/x",),
                               ("https://sub.example.com/x",)], "url string"),
        ["sub.example.com"]).collect()}
    assert kept2 == {"https://example.com/x"}


def test_nondefault_port_still_blocked(spark):
    """SURT keeps an explicit non-default port (com,bad:8080)/...) —
    the ':' prefix test must not let it fail open (advice r5)."""
    df = spark.createDataFrame(
        [("http://bad.com:8080/x",), ("https://bad.com:8443/y",),
         ("https://sub.bad.com:8080/z",), ("https://bad.common:8080/w",)],
        "url string",
    )
    for fn in (
        lambda d: d.filter(~urlfilter.blocked_url_expr(["bad.com"])),
        lambda d: urlfilter.filter_blocked_urls(d, ["bad.com"]),
    ):
        kept = {r["url"] for r in fn(df).collect()}
        assert kept == {"https://bad.common:8080/w"}


def test_www_prefixed_entry_matches(spark):
    """A blocklist entry written 'www.example.com' (UT1 style) must
    block example.com and subdomains — surt_key strips 'www.' so the
    entry must be normalized the same way (advice r5)."""
    df = spark.createDataFrame(
        [("https://example.com/x",), ("https://www.example.com/y",),
         ("https://sub.example.com/z",), ("https://other.org/w",)],
        "url string",
    )
    kept = {r["url"] for r in urlfilter.filter_blocked_urls(
        df, ["www.example.com"]).collect()}
    assert kept == {"https://other.org/w"}
    kept2 = {r["url"] for r in df.filter(
        ~urlfilter.blocked_url_expr(["www.example.com"])).collect()}
    assert kept2 == {"https://other.org/w"}


def test_empty_blocklist_and_plan(spark, urls):
    assert urlfilter.filter_blocked_urls(urls, []).count() == len(URLS)
    assert urlfilter.filter_blocked_urls(urls, [], keep_blocked=True).count() == 0
    df = urlfilter.filter_blocked_urls(urls, BLOCK_DOMS, BLOCK_PATS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
