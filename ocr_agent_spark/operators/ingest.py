"""Ingestion: pages table → ordered task table (the queue analogue).

Reference lifecycle being re-expressed (SURVEY §3.1): discover →
classify → split image/pdf → per-pdf page probe → page fan-out → ordered
enqueue. Here it is one declarative plan:

- classify by payload magic (``%PDF``) — the extension predicate S3
  generalized to content sniffing;
- PDF page counts via a Series→Series pandas UDF (S6) touching only the
  pdf slice (predicate keeps the HTML majority off the Python path);
- fan-out via ``explode(sequence(0, total_pages-1))`` (S8/U3) — a pure
  JVM generator, no Python in the 1→N row expansion;
- deterministic ``order_key`` replacing the AUTOINCREMENT task_id (W1):
  assigned from content order (url, page_index), never from arrival or
  partition order, so output is byte-identical under any parallelism
  (design rule D1).

Scale note on ``assign_order_key``: a naive
``row_number().over(Window.orderBy(...))`` collapses the whole table
into ONE partition. We instead range-partition by the sort key, take
per-partition ``row_number()``, and add per-partition offsets computed
from a tiny count-per-partition aggregate (two-phase global sequence —
the standard scalable pattern). The only driver-side data is one count
per partition.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType

KIND_HTML = "html"
KIND_PDF = "pdf"
KIND_PDF_PAGE = "pdf_page"


@pandas_udf(IntegerType())
def _pdf_page_count_udf(payload: pd.Series) -> pd.Series:
    from ocr_agent_spark.kernel.minipdf import pdf_page_count

    def probe(data) -> int:
        try:
            return pdf_page_count(bytes(data))
        except Exception:
            return -1  # malformed payload → failure row downstream (D2)

    return payload.map(probe)


def classify_pages(pages: DataFrame) -> DataFrame:
    """Add ``kind`` from payload magic bytes (content-based S3/P1)."""
    return pages.withColumn(
        "kind",
        F.when(
            F.substring(F.col("html"), 1, 4).cast("string") == "%PDF", F.lit(KIND_PDF)
        ).otherwise(F.lit(KIND_HTML)),
    )


def build_task_table(pages: DataFrame, order_partitions: int | None = None) -> DataFrame:
    """pages → tasks: one row per HTML doc, one row per PDF page.

    Output schema: ``order_key bigint, kind string, url string,
    page_index int, total_pages int, created_ts timestamp, html binary``.
    HTML rows get page_index=0 / total_pages NULL; malformed PDFs get
    page_index=0 / total_pages=-1 and flow through as failure rows (D2),
    mirroring the reference's keep-failed-rows contract (cli.py:239-243).
    """
    classified = classify_pages(pages)

    html_tasks = (
        classified.filter(F.col("kind") == KIND_HTML)
        .select(
            F.lit(KIND_HTML).alias("kind"),
            "url",
            F.lit(0).alias("page_index"),
            F.lit(None).cast("int").alias("total_pages"),
            F.col("warc_ts").alias("created_ts"),
            "html",
        )
    )

    pdf_probed = (
        classified.filter(F.col("kind") == KIND_PDF)
        .withColumn("total_pages", _pdf_page_count_udf(F.col("html")))
    )
    pdf_page_tasks = (
        pdf_probed.filter(F.col("total_pages") > 0)
        .select(
            F.lit(KIND_PDF_PAGE).alias("kind"),
            "url",
            F.explode(
                F.sequence(F.lit(0), F.col("total_pages") - F.lit(1))
            ).alias("page_index"),
            "total_pages",
            F.col("warc_ts").alias("created_ts"),
            "html",
        )
    )
    pdf_bad_tasks = (
        pdf_probed.filter(F.col("total_pages") <= 0)
        .select(
            F.lit(KIND_PDF_PAGE).alias("kind"),
            "url",
            F.lit(0).alias("page_index"),
            "total_pages",
            F.col("warc_ts").alias("created_ts"),
            "html",
        )
    )

    tasks = html_tasks.unionByName(pdf_page_tasks).unionByName(pdf_bad_tasks)
    return assign_order_key(tasks, order_partitions=order_partitions)


def assign_order_key(
    tasks: DataFrame,
    sort_cols: tuple[str, ...] = ("url", "page_index"),
    order_partitions: int | None = None,
) -> DataFrame:
    """Two-phase scalable global sequence over ``sort_cols``.

    Phase 1: range-partition on the sort key; per-partition row_number
    (window partitioned by ``spark_partition_id`` — no global collapse).
    Phase 2: per-partition counts (tiny) → cumulative offsets joined
    back via broadcast. order_key = offset + local row_number.
    """
    spark = tasks.sparkSession
    if order_partitions is None:
        order_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    ranged = (
        tasks.repartitionByRange(order_partitions, *[F.col(c) for c in sort_cols])
        .withColumn("_pid", F.spark_partition_id())
    )
    local_win = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in sort_cols])
    numbered = ranged.withColumn("_local_rn", F.row_number().over(local_win))

    # Tiny aggregate: one row per partition → cumulative offsets.
    offsets_win = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = (
        numbered.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn("_offset", F.coalesce(F.sum("_cnt").over(offsets_win), F.lit(0)))
        .select("_pid", "_offset")
    )

    return (
        numbered.join(F.broadcast(offsets), "_pid")
        .withColumn("order_key", (F.col("_offset") + F.col("_local_rn")).cast("long"))
        .drop("_pid", "_local_rn", "_offset")
    )
