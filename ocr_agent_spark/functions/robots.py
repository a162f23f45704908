"""Distributed robots.txt evaluation — the crawl politeness gate.

Shape at 100 TB: the urls table is huge, the rules side is tiny (one
robots.txt per host, a few rules each) — so rules PARSE ONCE per host
(Python, kernel/robots.py), land in a slim rules DataFrame, and the
per-url evaluation is a **broadcast join + JVM aggregation**: literal
prefixes match via ``startswith`` and wildcard rules via a
pre-compiled RE2-portable regex column, then one ``max_by`` picks the
RFC 9309 winner (longest pattern, allow wins ties). No Python touches
the url table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RULES_DDL = (
    "host string, pattern string, allow boolean, "
    "pattern_len int, regex string"
)


def robots_rules_table(robots: DataFrame, user_agent: str = "*",
                       host_col: str = "host",
                       content_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) rows → exploded per-rule table.

    Parsing is Python (tiny input: one body per host); the output
    carries ``regex`` ONLY for wildcard patterns so the join-side
    match can stay on ``startswith`` for the common literal case.
    """
    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_agent_spark.kernel.robots import (
            parse_robots,
            pattern_to_java_regex,
        )

        for batch in batches:
            rows: dict[str, list] = {
                "host": [], "pattern": [], "allow": [],
                "pattern_len": [], "regex": [],
            }
            for host, content in zip(batch[host_col], batch[content_col]):
                for rule in parse_robots(content or "", user_agent):
                    # hosts compare case-insensitively (DNS): lower here
                    # so the join against url_host (already lowered)
                    # cannot silently fail OPEN for a mixed-case host
                    rows["host"].append((host or "").lower())
                    rows["pattern"].append(rule.pattern)
                    rows["allow"].append(rule.allow)
                    rows["pattern_len"].append(len(rule.pattern))
                    rows["regex"].append(
                        pattern_to_java_regex(rule.pattern)
                        if ("*" in rule.pattern or rule.pattern.endswith("$"))
                        else None
                    )
            if rows["host"]:
                yield pd.DataFrame(rows)

    return robots.select(host_col, content_col).mapInPandas(parse, RULES_DDL)


def robots_crawl_delays(robots: DataFrame, user_agent: str = "*",
                        host_col: str = "host",
                        content_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) → (host, crawl_delay) for hosts that declare
    one — feed to ``frontier.politeness_frontier(host_delays=...)`` so
    each host's schedule honors its own declared pace. Hosts without a
    (valid) Crawl-delay emit no row; the frontier falls back to its
    default delay."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_agent_spark.kernel.robots import crawl_delay

        for batch in batches:
            rows: dict[str, list] = {"host": [], "crawl_delay": []}
            for host, content in zip(batch[host_col], batch[content_col]):
                d = crawl_delay(content or "", user_agent)
                if d is not None:
                    rows["host"].append((host or "").lower())
                    rows["crawl_delay"].append(float(d))
            if rows["host"]:
                yield pd.DataFrame(rows)

    return robots.select(host_col, content_col).mapInPandas(
        run, "host string, crawl_delay double"
    )


def robots_sitemaps(robots: DataFrame, host_col: str = "host",
                    content_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) → (host, sitemap_url) rows from ``Sitemap:``
    directives — feed these to ``sources.warc.read_sitemaps`` after
    fetching to seed the crawl frontier."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_agent_spark.kernel.robots import sitemap_urls

        for batch in batches:
            rows: dict[str, list] = {"host": [], "sitemap_url": []}
            for host, content in zip(batch[host_col], batch[content_col]):
                for u in sitemap_urls(content or ""):
                    rows["host"].append((host or "").lower())
                    rows["sitemap_url"].append(u)
            if rows["host"]:
                yield pd.DataFrame(rows)

    return robots.select(host_col, content_col).mapInPandas(
        run, "host string, sitemap_url string"
    )


def evaluate_allowed(urls: DataFrame, rules: DataFrame,
                     url_col: str = "url") -> DataFrame:
    """urls × rules → urls + ``allowed`` boolean (RFC 9309 winner).

    Plan: host/path extracted JVM-side → BROADCAST join on host (rules
    are per-host tiny at any corpus scale) → per-rule match expression
    (startswith for literals, rlike for wildcards — both codegen) →
    ``max_by`` over (pattern_len, allow) picks longest-match with
    allow-wins-ties → left join back (urls with no matching rule, or
    no robots at all, default to allowed). Two shuffles total, both on
    the slim (url-key, verdict) projection, never on payloads.
    """
    from ocr_agent_spark.operators.skew import url_host

    u = urls.withColumn("_host", url_host(F.col(url_col))).withColumn(
        "_path",
        F.coalesce(
            F.nullif(
                F.regexp_replace(
                    F.regexp_replace(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", ""),
                    r"#.*$", "",
                ),
                F.lit(""),
            ),
            F.lit("/"),
        ),
    )
    matched = (
        u.select(url_col, "_host", "_path")
        .join(F.broadcast(rules), u["_host"] == rules["host"], "inner")
        .filter(
            F.when(
                F.col("regex").isNotNull(),
                F.regexp_like(F.col("_path"), F.col("regex")),
            ).otherwise(F.col("_path").startswith(F.col("pattern")))
        )
        .groupBy(url_col)
        .agg(
            F.max_by(
                F.col("allow"),
                F.struct(F.col("pattern_len"), F.col("allow").cast("int")),
            ).alias("_verdict")
        )
    )
    return (
        u.join(matched, url_col, "left")
        .withColumn("allowed", F.coalesce(F.col("_verdict"), F.lit(True)))
        .drop("_host", "_path", "_verdict")
    )
