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


def test_empty_blocklist_and_plan(spark, urls):
    assert urlfilter.filter_blocked_urls(urls, []).count() == len(URLS)
    assert urlfilter.filter_blocked_urls(urls, [], keep_blocked=True).count() == 0
    df = urlfilter.filter_blocked_urls(urls, BLOCK_DOMS, BLOCK_PATS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
