"""The extraction stage: vectorized kernel over Arrow batches.

Spark translation of the reference's scheduler loop + per-task OCR
(cli.py:222-244 → deepseek_ocr2_runner.py:122-177): instead of one row
at a time in one thread, tasks are hash-partitioned by
``xxhash64(url, page_index)`` (including page_index spreads a giant
PDF's pages across partitions — key-level skew handling; host-level
skew never arises because we partition on full url hash, not host) and
each partition flows through ``mapInPandas`` — one Python invocation
per Arrow batch, thousands of docs per call, no per-row Python.

Failure contract (design rule D2, cli.py:239-243): a document that
fails to parse becomes a row with ``status='failed'`` and
``error=repr(e)``; the batch never throws, so Spark task retries are
reserved for infrastructure faults, not data faults.

Lineage (north rule): each output row carries its physical
``partition_id`` plus the partition's running wall-clock; a cheap
post-aggregation distills one lineage row per partition
(partition id, doc count, byte count, wall time).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUS_COMPLETED = "completed"
STATUS_FAILED = "failed"

EXTRACTED_SCHEMA = (
    "order_key long, kind string, url string, page_index int, total_pages int, "
    "created_ts timestamp, text string, status string, error string, "
    "doc_bytes long, partition_id int, part_wall_ms long"
)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Partition iterator → extracted rows (runs on executors)."""
    # Lazy heavyweight-init idiom (runner.py:78-94 analogue): kernels are
    # module-level imports cached per Python worker, loaded once — not
    # per batch — thanks to spark.python.worker.reuse.
    from pyspark import TaskContext

    from ocr_agent_spark.kernel.html_extract import extract_html_text
    from ocr_agent_spark.kernel.minipdf import extract_pdf_page_text

    ctx = TaskContext.get()
    partition_id = ctx.partitionId() if ctx is not None else -1
    t0 = time.monotonic()

    for batch in batches:
        texts: list[str | None] = []
        statuses: list[str] = []
        errors: list[str | None] = []
        for kind, payload, page_index in zip(
            batch["kind"], batch["html"], batch["page_index"]
        ):
            try:
                data = bytes(payload)
                if kind == "pdf_page":
                    text = extract_pdf_page_text(data, int(page_index))
                    text = text.rstrip() + "\n" if text.strip() else ""
                else:
                    text = extract_html_text(data)
                texts.append(text)
                statuses.append(STATUS_COMPLETED)
                errors.append(None)
            except Exception as exc:  # data fault → failure row (D2)
                texts.append(None)
                statuses.append(STATUS_FAILED)
                errors.append(repr(exc))
        wall_ms = int((time.monotonic() - t0) * 1000)
        yield pd.DataFrame(
            {
                "order_key": batch["order_key"],
                "kind": batch["kind"],
                "url": batch["url"],
                "page_index": batch["page_index"],
                "total_pages": batch["total_pages"],
                "created_ts": batch["created_ts"],
                "text": texts,
                "status": statuses,
                "error": errors,
                "doc_bytes": batch["html"].map(len),
                "partition_id": partition_id,
                "part_wall_ms": wall_ms,
            }
        )


def extract_tasks(tasks: DataFrame, num_partitions: int | None = None,
                  repartition: bool = True) -> DataFrame:
    """tasks → extracted (one completed-or-failed row per task).

    Pass ``repartition=False`` when the input is already hash-
    partitioned by (url, page_index) — e.g. straight out of
    ``build_task_table``'s key-attach join or the resume anti-join —
    to avoid re-shuffling the fat payload column.
    """
    if repartition:
        spark = tasks.sparkSession
        if num_partitions is None:
            num_partitions = int(
                spark.conf.get("spark.sql.shuffle.partitions", "32")
            )
        tasks = tasks.repartition(
            num_partitions, F.xxhash64(F.col("url"), F.col("page_index"))
        )
    return tasks.mapInPandas(_extract_batches, schema=EXTRACTED_SCHEMA)


def lineage_from_extracted(extracted: DataFrame, run_id: str) -> DataFrame:
    """Per-partition lineage rows (north rule A7).

    ``part_wall_ms`` is a running clock within each partition, so
    ``max()`` per partition = that partition's total extraction wall
    time. One output row per physical partition — trivially small.
    """
    return (
        extracted.groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum("doc_bytes").alias("byte_count"),
            F.max("part_wall_ms").alias("wall_time_ms"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            "partition_id",
            "doc_count",
            "byte_count",
            "wall_time_ms",
            F.current_timestamp().alias("committed_ts"),
        )
    )
