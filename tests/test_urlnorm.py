"""URL canonicalization (functions/urlnorm.py)."""

import pytest
from pyspark.sql import functions as F

from ocr_agent_spark.functions.urlnorm import (
    canonical_url,
    canonicalize_urls,
)

CASES = [
    # scheme/host case + default port + tracking + sort + fragment
    ("HTTP://Example.COM:80/a?utm_source=t&b=2&a=1#f",
     "http://example.com/a?a=1&b=2"),
    ("https://Sub.Example.ORG.:443/p", "https://sub.example.org/p"),
    # explicit non-default port survives
    ("http://h.example:8080/k?gclid=g&z=1", "http://h.example:8080/k?z=1"),
    # empty path -> /
    ("https://example.com", "https://example.com/"),
    ("https://example.com?b=2&a=1", "https://example.com/?a=1&b=2"),
    # all params tracking -> no query at all
    ("https://e.com/x?utm_a=1&fbclid=f&msclkid=m", "https://e.com/x"),
    # param named 'utm' (no underscore) is NOT scrubbed; values with
    # 'utm_' inside are NOT scrubbed (the scrub keys on the name)
    ("https://e.com/x?utm=keep&q=utm_source", "https://e.com/x?q=utm_source&utm=keep"),
    # valueless params sort too
    ("https://e.com/x?b&a", "https://e.com/x?a&b"),
    # :80 on https is NOT a default port
    ("https://e.com:80/x", "https://e.com:80/x"),
    # non-URL -> NULL
    ("not a url", None),
    ("", None),
    (None, None),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_cases(spark, raw, want):
    df = spark.createDataFrame([(raw,)], "url string")
    got = df.select(canonical_url("url").alias("c")).collect()[0]["c"]
    assert got == want, raw


def test_idempotent(spark):
    raws = [r for r, w in CASES if w is not None]
    df = spark.createDataFrame([(r,) for r in raws], "url string")
    once = canonicalize_urls(df).select(
        F.col("canonical_url").alias("url"))
    twice = canonicalize_urls(once).collect()
    for r in twice:
        assert r["canonical_url"] == r["url"]


def test_plan_pure_jvm_no_shuffle(spark):
    df = spark.createDataFrame([("https://e.com/x",)], "url string")
    out = canonicalize_urls(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


RD_CASES = [
    ("sub.a.example.co.uk", "example.co.uk"),
    ("a.b.github.io", "b.github.io"),
    ("www.example.com", "example.com"),
    ("https://Deep.Sub.Example.COM.AU:8443/p", "example.com.au"),
    ("example.org.", "example.org"),
    ("example.org:8080", "example.org"),
    ("localhost", "localhost"),
    ("10.0.0.1", "10.0.0.1"),
    ("x.y.z.example.net", "example.net"),
    # a host that IS a public suffix passes through via the default
    # last-two-labels rule (documented PSL-lite simplification)
    ("github.io", "github.io"),
    # blogspot.com is a platform suffix: one more label is the site
    ("myblog.blogspot.com", "myblog.blogspot.com"),
    ("deep.myblog.blogspot.com", "myblog.blogspot.com"),
]


@pytest.mark.parametrize("raw,want", RD_CASES)
def test_registered_domain_cases(spark, raw, want):
    from ocr_agent_spark.functions.urlnorm import registered_domain

    df = spark.createDataFrame([(raw,)], "host string")
    got = df.select(registered_domain("host").alias("d")).collect()[0]["d"]
    assert got == want, raw


def test_registered_domain_plan_pure_jvm(spark):
    from ocr_agent_spark.functions.urlnorm import registered_domain

    df = spark.createDataFrame([("a.example.co.uk",)], "host string")
    plan = (df.select(registered_domain("host"))._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan and "Python" not in plan


def test_collapses_spellings_for_dedup(spark):
    spellings = [
        "HTTPS://News.Example.com:443/story/42?utm_source=a#top",
        "https://news.example.com/story/42",
        "https://news.example.com./story/42?fbclid=x",
    ]
    df = spark.createDataFrame([(s,) for s in spellings], "url string")
    n = (canonicalize_urls(df).select("canonical_url")
         .distinct().count())
    assert n == 1
