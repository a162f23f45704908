"""Per-host politeness scheduling (functions/frontier.py)."""

import datetime

import pyspark.sql.functions as F
import pytest

from ocr_agent_spark.functions import frontier
from ocr_agent_spark.functions.delta import (
    STATUS_CHANGED,
    STATUS_GONE,
    STATUS_NEW,
    STATUS_UNCHANGED,
)

START = datetime.datetime(2026, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def delta(spark):
    rows = [
        ("http://a.example/new1", STATUS_NEW),
        ("http://a.example/new2", STATUS_NEW),
        ("http://a.example/chg1", STATUS_CHANGED),
        ("http://a.example/same1", STATUS_UNCHANGED),
        ("http://a.example/gone1", STATUS_GONE),
        ("http://b.example/only", STATUS_CHANGED),
    ]
    return spark.createDataFrame(rows, "url string, status string").persist()


def test_schedule_rate_and_order(spark, delta):
    sched = frontier.politeness_frontier(delta, START, per_host_delay_sec=5)
    rows = {r["url"]: r for r in sched.collect()}
    # gone never re-fetches
    assert "http://a.example/gone1" not in rows
    # priority order within a.example: new1, new2 (url tiebreak), chg1, same1
    a = sorted(
        (r for u, r in rows.items() if u.startswith("http://a.example")),
        key=lambda r: r["fetch_rank"],
    )
    assert [r["url"].rsplit("/", 1)[1] for r in a] == ["new1", "new2", "chg1", "same1"]
    # rate bound: rank k fetches at start + (k-1)*delay, per host
    for r in a:
        assert r["next_fetch_ts"] == START + datetime.timedelta(
            seconds=5 * (r["fetch_rank"] - 1)
        )
    # b.example schedules independently from rank 1
    assert rows["http://b.example/only"]["fetch_rank"] == 1
    assert rows["http://b.example/only"]["next_fetch_ts"] == START


def test_host_budget_caps_mega_host(spark):
    """A mega-host's tail dies inside the window pass; small hosts are
    untouched — the per-cycle crawl-budget contract."""
    rows = [(f"http://mega.example/p{i:05d}", STATUS_NEW) for i in range(500)]
    rows += [("http://tiny.example/one", STATUS_UNCHANGED)]
    delta = spark.createDataFrame(rows, "url string, status string")
    sched = frontier.politeness_frontier(delta, START, host_budget=10)
    counts = {r["host"]: r["n"] for r in
              sched.groupBy("host").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"mega.example": 10, "tiny.example": 1}
    # the kept 10 are the highest-priority (lowest url) ones, ranks 1..10
    kept = sched.filter(F.col("host") == "mega.example")
    assert {r["fetch_rank"] for r in kept.collect()} == set(range(1, 11))


def test_precap_bounds_megahost_and_schedule_byte_identical(spark):
    """VERDICT r5 #1: the salted partial top-k pre-cap keeps any single
    task's window sort ≤ salts × budget rows per host, and the schedule
    it produces is identical to the direct (uncapped-plan) window."""
    n, budget, salts = 500_000, 100, 16
    mega = spark.range(n).select(
        F.concat(F.lit("http://mega.example/p"),
                 F.lpad(F.col("id").cast("string"), 7, "0")).alias("url"),
        F.lit("mega.example").alias("host"),
        (F.col("id") % 3).cast("double").alias("priority"),
    )
    small = spark.createDataFrame(
        [("http://tiny.example/a", "tiny.example", 1.0),
         ("http://tiny.example/b", "tiny.example", 2.0)],
        "url string, host string, priority double",
    )
    df = mega.unionByName(small)
    capped = frontier.fetch_schedule(df, START, host_budget=budget,
                                     pre_cap_salts=salts)
    direct = frontier.fetch_schedule(df, START, host_budget=budget,
                                     pre_cap_salts=None)
    assert capped.exceptAll(direct).count() == 0
    assert direct.exceptAll(capped).count() == 0
    assert capped.count() == budget + 2
    # the bound the pre-cap guarantees for the exact window's input
    pre = frontier._precap_over_budget_hosts(
        df, budget, "host", "url", "priority", salts)
    mx = pre.groupBy("host").count().agg(F.max("count")).collect()[0][0]
    assert mx <= salts * budget
    # under-threshold hosts pass through the pre-cap untouched
    tiny = pre.filter(F.col("host") == "tiny.example").count()
    assert tiny == 2


def test_robots_filter_and_sitemap_recency(spark, delta):
    from ocr_agent_spark.functions.robots import robots_rules_table

    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /chg1\n")],
        "host string, robots_txt string",
    )
    rules = robots_rules_table(robots)
    lastmod = spark.createDataFrame(
        [
            ("http://a.example/new2", datetime.datetime(2026, 1, 15)),
            ("http://a.example/new1", datetime.datetime(2020, 1, 1)),
        ],
        "url string, lastmod timestamp",
    )
    sched = frontier.politeness_frontier(
        delta, START, robots_rules=rules, sitemap_lastmod=lastmod
    )
    rows = {r["url"]: r for r in sched.collect()}
    assert "http://a.example/chg1" not in rows  # robots-disallowed
    # recency bonus: new2 (2026 lastmod) now outranks new1 (2020)
    assert rows["http://a.example/new2"]["fetch_rank"] < rows["http://a.example/new1"]["fetch_rank"]
    # but recency never crosses a status band: both new pages still
    # precede the unchanged one
    assert rows["http://a.example/same1"]["fetch_rank"] == 3


def test_hostile_lastmod_never_crosses_priority_bands(spark):
    """Sitemap lastmod is attacker-controlled: a year-9999 (or
    pre-1970) date must stay a sub-band tiebreak, never outrank a
    higher delta status (code-review r5)."""
    delta = spark.createDataFrame(
        [("http://h.example/new", STATUS_NEW),
         ("http://h.example/spam", STATUS_UNCHANGED),
         ("http://h.example/old", STATUS_CHANGED)],
        "url string, status string",
    )
    lastmod = spark.createDataFrame(
        [("http://h.example/spam", datetime.datetime(9999, 12, 31)),
         ("http://h.example/old", datetime.datetime(1, 1, 2))],
        "url string, lastmod timestamp",
    )
    sched = frontier.politeness_frontier(delta, START, sitemap_lastmod=lastmod)
    rows = {r["url"].rsplit("/", 1)[1]: r for r in sched.collect()}
    assert rows["new"]["fetch_rank"] == 1      # 9999 bonus didn't outrank it
    assert rows["old"]["fetch_rank"] == 2      # negative epoch didn't demote below band
    assert rows["spam"]["fetch_rank"] == 3
    assert 1.0 <= rows["spam"]["priority"] <= 1.5
    assert 2.0 <= rows["old"]["priority"] <= 2.5


def test_schedule_plan_is_single_host_shuffle(spark, delta):
    """One hash exchange on host, no UDFs (BatchEvalPython) anywhere."""
    sched = frontier.politeness_frontier(delta, START)
    plan = sched._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_delta_priority_mapping(spark):
    df = spark.createDataFrame(
        [(STATUS_NEW,), (STATUS_CHANGED,), (STATUS_UNCHANGED,), (STATUS_GONE,)],
        "status string",
    ).select("status", frontier.delta_priority("status").alias("p"))
    got = {r["status"]: r["p"] for r in df.collect()}
    assert got == {STATUS_NEW: 3, STATUS_CHANGED: 2, STATUS_UNCHANGED: 1,
                   STATUS_GONE: None}
