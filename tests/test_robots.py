"""robots.txt kernel + distributed evaluation tests (RFC 9309)."""

from __future__ import annotations

from ocr_agent_spark.kernel.robots import (
    is_allowed,
    parse_robots,
    pattern_to_java_regex,
    rule_matches,
)

ROBOTS = """\
# crawl policy
User-agent: googlebot
Disallow: /private/
Allow: /private/ok

User-agent: *
Disallow: /tmp/
Disallow: /*.pdf$
Allow: /tmp/public*
Crawl-delay: 10

User-agent: badbot
Disallow: /
"""


def test_kernel_group_selection_and_precedence():
    r = parse_robots(ROBOTS, "*")
    assert is_allowed(r, "/index.html")
    assert not is_allowed(r, "/tmp/x")
    assert is_allowed(r, "/tmp/public/doc")    # longer allow wins
    assert not is_allowed(r, "/docs/a.pdf")    # wildcard + $ anchor
    assert is_allowed(r, "/docs/a.pdfx")       # $ respected
    g = parse_robots(ROBOTS, "Googlebot/2.1")
    assert not is_allowed(g, "/private/secret")
    assert is_allowed(g, "/private/ok/page")
    assert is_allowed(g, "/tmp/x")             # specific group overrides *
    assert not is_allowed(parse_robots(ROBOTS, "badbot"), "/anything")


def test_kernel_edge_cases():
    assert parse_robots("", "*") == []
    assert is_allowed([], "/x")                        # no rules = allow
    # empty Disallow = allow-all, stacked agent lines share a group
    r = parse_robots("User-agent: a\nUser-agent: *\nDisallow:\n", "*")
    assert is_allowed(r, "/anything")
    # equal-length allow/disallow tie → allow
    tie = parse_robots("User-agent: *\nAllow: /dir\nDisallow: /dir\n", "*")
    assert is_allowed(tie, "/dir/x")
    # rules before any User-agent line are ignored
    assert parse_robots("Disallow: /\n", "*") == []


def test_java_regex_matches_python_semantics():
    import re

    for pattern in ("/a/*/b", "/x$", "/p*q$", "/plain/", "/[br]acket*"):
        jr = re.compile(pattern_to_java_regex(pattern))
        for path in ("/a/c/b", "/a/x", "/x", "/xy", "/pzzzq", "/plain/x",
                     "/[br]acket5", "/bracket5"):
            assert bool(jr.match(path)) == rule_matches(pattern, path), (
                pattern, path
            )


def test_distributed_matches_kernel(spark):
    """The broadcast-join + max_by pipeline must agree with the pure
    kernel on every url, including wildcard rules, tie-breaks,
    rule-less hosts, and fragment stripping."""
    import urllib.parse

    from ocr_agent_spark.functions.robots import (
        evaluate_allowed,
        robots_rules_table,
    )

    robots_rows = [
        ("a.example.com",
         "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"
         "Disallow: /*.pdf$\nAllow: /dir\nDisallow: /dir\n"),
        ("b.example.com", "User-agent: *\nDisallow: /\n"),
    ]
    urls = [
        "https://a.example.com/",
        "https://a.example.com/private/x",
        "https://a.example.com/private/ok/page",
        "https://a.example.com/doc/f.pdf",
        "https://a.example.com/doc/f.pdfx",
        "https://a.example.com/dir/tie",
        "https://a.example.com/page#frag",
        "https://b.example.com/anything",
        "https://c.example.com/no-robots-host",
    ]
    robots = spark.createDataFrame(robots_rows, "host string, robots_txt string")
    urls_df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["url"]: r["allowed"] for r in
           evaluate_allowed(urls_df, robots_rules_table(robots)).collect()}
    assert len(got) == len(urls)
    rb = dict(robots_rows)
    for u in urls:
        p = urllib.parse.urlparse(u)
        expected = is_allowed(parse_robots(rb.get(p.hostname, ""), "*"),
                              p.path or "/")
        assert got[u] == expected, u


def test_agent_group_longest_token_wins():
    """RFC 9309 §2.2.1 (code-review r4c, reproduced): 'googlebot-news'
    is governed ONLY by its own group, not merged with 'googlebot'."""
    txt = ("User-agent: googlebot\nDisallow: /a\n\n"
           "User-agent: googlebot-news\nAllow: /b\n")
    news = parse_robots(txt, "googlebot-news")
    assert [(r.pattern, r.allow) for r in news] == [("/b", True)]
    assert is_allowed(news, "/a/x")  # the googlebot group does not apply
    plain = parse_robots(txt, "googlebot")
    assert not is_allowed(plain, "/a/x")


def test_mixed_case_robots_host_still_matches(spark):
    """A mixed-case host in the robots table must not silently fail
    OPEN (code-review r4c): the join lowers both sides."""
    from ocr_agent_spark.functions.robots import (
        evaluate_allowed,
        robots_rules_table,
    )

    robots = spark.createDataFrame(
        [("A.Example.COM", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [("https://a.example.com/x",)], "url string"
    )
    rows = evaluate_allowed(urls, robots_rules_table(robots)).collect()
    assert rows[0]["allowed"] is False


def test_sitemap_directives(spark):
    """Sitemap: lines are non-group directives valid anywhere; the
    Spark form feeds frontier discovery."""
    from ocr_agent_spark.functions.robots import robots_sitemaps
    from ocr_agent_spark.kernel.robots import sitemap_urls

    txt = ("Sitemap: https://e.com/sm1.xml\n"
           "User-agent: *\nDisallow: /x\n"
           "Sitemap: https://e.com/sm2.xml.gz\n"
           "sitemap: https://e.com/sm1.xml\n"  # dup + case-insensitive field
           "# Sitemap: https://e.com/commented.xml\n")
    assert sitemap_urls(txt) == [
        "https://e.com/sm1.xml", "https://e.com/sm2.xml.gz"
    ]
    df = spark.createDataFrame([("E.com", txt), ("b.com", "User-agent: *\n")],
                               "host string, robots_txt string")
    rows = robots_sitemaps(df).collect()
    assert sorted((r["host"], r["sitemap_url"]) for r in rows) == [
        ("e.com", "https://e.com/sm1.xml"),
        ("e.com", "https://e.com/sm2.xml.gz"),
    ]


def test_kernel_crawl_delay_group_selection():
    from ocr_agent_spark.kernel.robots import crawl_delay

    txt = ("User-agent: *\nCrawl-delay: 2\nDisallow: /x\n\n"
           "User-agent: mybot\nCrawl-delay: 7.5\nDisallow: /y\n")
    assert crawl_delay(txt, "*") == 2.0
    assert crawl_delay(txt, "mybot") == 7.5       # specific group wins
    assert crawl_delay(txt, "otherbot") == 2.0    # falls back to *
    # equal-specificity groups merge politeness-conservatively (max)
    two = "User-agent: *\nCrawl-delay: 1\n\nUser-agent: *\nCrawl-delay: 4\n"
    assert crawl_delay(two) == 4.0
    # absent / invalid / negative → None
    assert crawl_delay("User-agent: *\nDisallow: /x\n") is None
    assert crawl_delay("User-agent: *\nCrawl-delay: soon\n") is None
    assert crawl_delay("User-agent: *\nCrawl-delay: -3\n") is None
    assert crawl_delay("") is None
    # delay before any User-agent line is ignored
    assert crawl_delay("Crawl-delay: 9\nUser-agent: *\nDisallow: /x\n") is None


def test_frontier_honors_per_host_crawl_delay(spark):
    import datetime

    from ocr_agent_spark.functions.frontier import politeness_frontier
    from ocr_agent_spark.functions.robots import robots_crawl_delays

    robots = spark.createDataFrame(
        [("Slow.example", "User-agent: *\nCrawl-delay: 10\n"),
         ("fast.example", "User-agent: *\nDisallow:\n")],  # no delay
        "host string, robots_txt string",
    )
    delays = robots_crawl_delays(robots)
    assert {(r["host"], r["crawl_delay"]) for r in delays.collect()} == {
        ("slow.example", 10.0)
    }
    delta = spark.createDataFrame(
        [(f"http://slow.example/p{i}", "new") for i in range(3)]
        + [(f"http://fast.example/p{i}", "new") for i in range(3)],
        "url string, status string",
    )
    start = datetime.datetime(2026, 7, 1)
    sched = politeness_frontier(delta, start, per_host_delay_sec=2,
                                host_delays=delays)
    rows = {(r["host"], r["fetch_rank"]): r["next_fetch_ts"]
            for r in sched.collect()}
    assert rows[("slow.example", 3)] == start + datetime.timedelta(seconds=20)
    assert rows[("fast.example", 3)] == start + datetime.timedelta(seconds=4)
