"""Persist-lifecycle: operator caches are tracked and releasable.

VERDICT r01 "what's wrong" #4: build_task_table / assign_order_key /
minhash_near_duplicates persisted intermediates with no unpersist,
accumulating cached blocks across calls in a long-lived driver. Every
persist now goes through cache.persist_tracked and release_caches()
drops them all.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_agent_spark.cache import release_caches
from ocr_agent_spark.fixtures import pages_dataframe
from ocr_agent_spark.operators.ingest import assign_order_key, build_task_table


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_build_task_table_caches_released(spark):
    release_caches()  # start clean regardless of earlier tests
    baseline = _n_cached(spark)

    pages = pages_dataframe(spark, 30)
    for _ in range(3):
        build_task_table(pages, order_partitions=4).count()
    assert _n_cached(spark) > baseline  # caches exist while in use

    release_caches()
    assert _n_cached(spark) == baseline  # ...and all go away


def test_assign_order_key_caches_released(spark):
    release_caches()
    baseline = _n_cached(spark)
    df = spark.range(100).select(
        F.col("id").alias("url"), F.lit(0).alias("page_index")
    )
    assign_order_key(df, order_partitions=4).count()
    release_caches()
    assert _n_cached(spark) == baseline


def test_minhash_caches_released(spark):
    from ocr_agent_spark.functions.dedup import minhash_near_duplicates

    release_caches()
    baseline = _n_cached(spark)
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta {i}") for i in range(20)],
        "doc_id long, text string",
    )
    minhash_near_duplicates(docs, threshold=0.3).count()
    release_caches()
    assert _n_cached(spark) == baseline
