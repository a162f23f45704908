"""Host-skew toolkit: url parsing, detection, salted placement balance."""

from pyspark.sql import functions as F

from ocr_agent_spark.operators.skew import (
    detect_skewed_keys,
    salted_repartition,
    url_host,
)


def _skewed_pages(spark, n=2000, big_share=0.8):
    """n rows; big_share of them on one mega-host."""
    cut = int(n * big_share)
    host = F.when(F.col("id") < cut, F.lit("big.example.com")).otherwise(
        F.concat(F.lit("h"), (F.col("id") % 97).cast("string"), F.lit(".example.org"))
    )
    return spark.range(n).select(
        F.concat(F.lit("https://"), host, F.lit("/p/"), F.col("id").cast("string"))
        .alias("url"),
        F.col("id").alias("page_index"),
    )


def test_url_host_edge_cases(spark):
    df = spark.createDataFrame(
        [
            ("https://Example.COM/path?q=1",),
            ("http://user:pw@host.net:8080/x",),
            ("ftp://files.org",),
            ("no-scheme/path",),
        ],
        "url string",
    )
    got = [r["h"] for r in df.select(url_host("url").alias("h")).collect()]
    assert got == ["example.com", "host.net", "files.org", ""]


def test_detect_skewed_keys(spark):
    pages = _skewed_pages(spark)
    skewed = detect_skewed_keys(pages, url_host("url"), max_rows_per_key=200)
    assert skewed == ["big.example.com"]


def test_salted_repartition_balances_mega_host(spark):
    pages = _skewed_pages(spark, n=2000, big_share=0.8)
    parts = 16

    def max_partition_share(df):
        sizes = [
            r["n"]
            for r in df.select(F.spark_partition_id().alias("p"))
            .groupBy("p").agg(F.count(F.lit(1)).alias("n")).collect()
        ]
        return max(sizes) / sum(sizes)

    unsalted = pages.repartition(parts, url_host("url"))
    salted = salted_repartition(
        pages, url_host("url"), unique_cols=["url", "page_index"],
        num_partitions=parts, salt_buckets=16, max_rows_per_key=200,
    )
    # keyed-by-host placement pins >=80% of rows on one task ...
    assert max_partition_share(unsalted) >= 0.8
    # ... salting spreads the mega-host: no task holds more than ~3x fair share
    assert max_partition_share(salted) <= 3.0 / parts

    # determinism: same call -> identical partition contents (D1)
    def contents(df):
        return sorted(
            (r["p"], r["url"])
            for r in df.select(F.spark_partition_id().alias("p"), "url").collect()
        )

    again = salted_repartition(
        pages, url_host("url"), unique_cols=["url", "page_index"],
        num_partitions=parts, salt_buckets=16, max_rows_per_key=200,
    )
    assert contents(salted) == contents(again)


def test_salted_host_counts_on_mega_host_corpus(spark):
    # The aggregation-side counterpart lives in operators/metrics.py;
    # confirm it agrees with a plain count on the skewed corpus too.
    from ocr_agent_spark.operators.metrics import salted_host_counts

    pages = _skewed_pages(spark, n=1500)
    plain = {
        r["host"]: r["n"]
        for r in pages.select(
            F.regexp_extract("url", r"^https?://([^/]+)/", 1).alias("host")
        ).groupBy("host").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        r["host"]: r["doc_count"] for r in salted_host_counts(pages).collect()
    }
    assert salted == plain


def test_surt_key_canonicalization(spark):
    """SURT canonical keys: real-world-shaped urls → com,example)/path
    form; one domain becomes one contiguous key range."""
    from ocr_agent_spark.operators.skew import surt_key

    cases = [
        ("https://www.Example.COM/Path/X#frag", "com,example)/path/x"),
        ("http://example.com:80/a?q=1", "com,example)/a?q=1"),
        ("https://sub.host.example.com:443/", "com,example,host,sub)/"),
        ("http://user:pw@example.com/secret", "com,example)/secret"),
        ("https://example.com", "com,example)/"),
        ("http://example.com:8080/x", "com,example:8080)/x"),  # non-default port kept
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["surt"] for r in
           df.select(surt_key("url").alias("surt")).collect()]
    assert got == [e for _, e in cases]
    # the range property: all of one domain's keys share a prefix that
    # no other domain's keys share
    assert all(g.startswith("com,example") for g in got)
