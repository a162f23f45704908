"""Url-hash bucketed tables: shuffle-free joins for the 100 TB paths.

The north star pins the physical layout: "documents are bucketed by
url-hash with explicit salting of skewed hosts". Salting lives in
``operators/skew.py``; this module is the bucketing half — Spark
bucketed tables (``write.bucketBy(n, url)``), where every writer task
routes rows by ``hash(url) % n`` into fixed bucket files and the
catalog records the layout.

Why it matters at scale: the extraction pipeline's recurring joins are
all url-keyed — resume anti-join (committed snapshot × pending pages),
task↔result attach, dedup keeper re-attach. Against unbucketed parquet
each run pays a full shuffle of both sides; between CO-BUCKETED tables
(same column, same bucket count) Catalyst plans the join with ZERO
Exchange on either side (plan-asserted in tests/test_bucketed.py) —
the join runs bucket-by-bucket on the scan partitions. Write once,
join shuffle-free forever; at 10^12 documents the write-side routing
cost is paid one time while the resume/attach joins run per job.

Bucket-count rule: pick so one bucket ≈ one healthy task (128–512 MB);
both join sides MUST use the same count (Spark does not coalesce
mismatched classic buckets). The in-memory catalog scopes table
metadata to a session; production would use a persistent metastore /
Iceberg bucket transform (``bucket(n, url)``) — same layout contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameWriter


def write_bucketed_by_url(df: DataFrame, table: str, buckets: int,
                          path: str | None = None,
                          url_col: str = "url",
                          mode: str = "overwrite") -> None:
    """Persist ``df`` as a parquet table bucketed (and sorted) by url.

    ``sortBy(url)`` inside each bucket lets the bucket join skip its
    sort stage too (sort-merge join over pre-sorted buckets), and keeps
    one document's rows adjacent for the page-ordered readers.
    """
    writer: DataFrameWriter = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, url_col)
        .sortBy(url_col)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark, table: str) -> DataFrame:
    """Catalog read — REQUIRED for bucketed joins (a raw
    ``spark.read.parquet(path)`` of the same files loses the bucket
    metadata and re-shuffles)."""
    return spark.table(table)
