"""End-to-end extraction job: pages → tasks → extract → commit → merge.

The Spark translation of ``cli.py enqueue`` + ``cli.py run`` (SURVEY
§3.1–3.2) as one resumable batch job:

    pages parquet ─ classify/fan-out/order_key ─ anti-join committed
        ─ mapInPandas extraction ─ commit snapshot (+ lineage) ─ merge

Resume contract: re-running with the same ``output_root`` processes
only tasks whose (url, page_index) is absent from the last committed
snapshot — the reference's pending-queue semantics (queue_store.py:
125-138) without mutable status rows. Zero-pending is a no-op commit.
Empty input raises (exit-code-2 guard, cli.py:187-192 / A3).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ocr_agent_spark.operators.extract import extract_tasks, lineage_from_extracted
from ocr_agent_spark.operators.ingest import build_task_table
from ocr_agent_spark.operators.merge import merge_extracted_to_markdown
from ocr_agent_spark.sources.snapshot import SnapshotStore

RESUME_KEYS = ["url", "page_index"]


class EmptyInputError(ValueError):
    """No supported input rows (reference exit code 2, cli.py:32,187-192)."""


@dataclass
class RunResult:
    run_id: str
    tasks_total: int
    tasks_processed: int
    tasks_skipped_committed: int


def extraction_store(output_root: str) -> SnapshotStore:
    return SnapshotStore(os.path.join(output_root, "extracted"))


def lineage_store(output_root: str) -> SnapshotStore:
    return SnapshotStore(os.path.join(output_root, "lineage"))


def run_extraction_job(
    spark: SparkSession,
    pages: DataFrame,
    output_root: str,
    run_id: str | None = None,
    num_partitions: int | None = None,
) -> RunResult:
    run_id = run_id or uuid.uuid4().hex[:12]
    store = extraction_store(output_root)

    tasks = build_task_table(pages, order_partitions=num_partitions)
    # The task table is consumed twice (count + extraction) and its
    # lineage includes a pandas UDF + two shuffles — cache it.
    tasks = tasks.persist()
    try:
        total = tasks.count()
        if total == 0:
            raise EmptyInputError("no supported input rows to enqueue")

        pending = store.anti_join_committed(tasks, RESUME_KEYS, spark)
        n_pending = pending.count()
        if n_pending == 0:
            return RunResult(run_id, total, 0, total)

        # pending comes out of the anti-join hash-partitioned by the
        # resume keys — exactly the extraction partitioning; skip the
        # redundant payload re-shuffle.
        extracted = extract_tasks(pending, num_partitions=num_partitions,
                                  repartition=False)
        # One pass: snapshot-commit the extraction output, then derive
        # lineage from the committed files (re-read, not recompute — the
        # expensive kernel runs exactly once).
        store.commit(extracted, run_id=run_id)
        committed = spark.read.parquet(os.path.join(store.data_dir, run_id))
        lineage_store(output_root).commit(
            lineage_from_extracted(committed, run_id), run_id=run_id
        )
        return RunResult(run_id, total, n_pending, total - n_pending)
    finally:
        tasks.unpersist()


def read_extracted(spark: SparkSession, output_root: str) -> DataFrame | None:
    return extraction_store(output_root).read(spark)


def read_lineage(spark: SparkSession, output_root: str) -> DataFrame | None:
    return lineage_store(output_root).read(spark)


def merge_job(
    spark: SparkSession,
    output_root: str,
    style: str = "dollar",
    merged_path: str | None = None,
) -> str:
    extracted = read_extracted(spark, output_root)
    if extracted is None:
        raise EmptyInputError("nothing committed yet")
    text = merge_extracted_to_markdown(extracted, style=style)
    if merged_path is not None:
        os.makedirs(os.path.dirname(merged_path), exist_ok=True)
        with open(merged_path, "w", encoding="utf-8") as fh:
            fh.write(text)
    return text
