"""Crawl-delta classification tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_agent_spark.functions.delta import crawl_delta, delta_counts


def test_all_four_statuses(spark):
    old = spark.createDataFrame(
        [("u1", "a"), ("u2", "b"), ("u3", "c")], "url string, fingerprint string"
    )
    new = spark.createDataFrame(
        [("u2", "b"), ("u3", "C2"), ("u4", "d")], "url string, fingerprint string"
    )
    rows = {r["url"]: r for r in crawl_delta(old, new).collect()}
    assert rows["u1"]["status"] == "gone"
    assert rows["u2"]["status"] == "unchanged"
    assert rows["u3"]["status"] == "changed"
    assert rows["u3"]["old_fingerprint"] == "c"
    assert rows["u3"]["new_fingerprint"] == "C2"
    assert rows["u4"]["status"] == "new"
    counts = {r["status"]: r["n"] for r in
              delta_counts(crawl_delta(old, new)).collect()}
    assert counts == {"gone": 1, "unchanged": 1, "changed": 1, "new": 1}


def test_delta_plan_is_jvm_only(spark):
    """The delta is expression-only: no Python evaluation anywhere."""
    old = spark.range(2000).select(
        F.col("id").cast("string").alias("url"),
        F.md5(F.col("id").cast("string")).alias("fingerprint"),
    )
    new = spark.range(1000, 3000).select(
        F.col("id").cast("string").alias("url"),
        F.md5((F.col("id") * 2).cast("string")).alias("fingerprint"),
    )
    plan = crawl_delta(old, new)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_null_fingerprints_use_join_membership(spark):
    """(code-review r4d) a failed-extraction NULL fingerprint must not
    flip presence: both-sides rows stay changed/unchanged."""
    old = spark.createDataFrame(
        [("u1", None), ("u2", "b"), ("u3", None)],
        "url string, fingerprint string",
    )
    new = spark.createDataFrame(
        [("u1", "a"), ("u2", None), ("u3", None)],
        "url string, fingerprint string",
    )
    rows = {r["url"]: r["status"] for r in crawl_delta(old, new).collect()}
    assert rows == {"u1": "changed", "u2": "changed", "u3": "unchanged"}
