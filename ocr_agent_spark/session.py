"""SparkSession construction with scale-oriented defaults.

Single place where execution knobs live so tests, bench and jobs agree:
AQE on (runtime re-plan + skew-join splitting), Arrow on with batches
sized to "thousands of documents per invocation" (BASELINE north_star),
Python worker reuse so kernel module state loads once per worker, UTC
session timezone for deterministic timestamp round-trips.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_ARROW_BATCH_ROWS = 2048


def build_spark(
    app_name: str = "ocr-agent-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores_env = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(cores_env) if cores_env else (os.cpu_count() or 8)
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 32)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(DEFAULT_ARROW_BATCH_ROWS),
        )
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Transient-failure retry: the reference retries SQLite connects
        # with backoff (queue_store.py:205-227 in the reference repo);
        # Spark's analogue is per-task retry — a task that dies on a
        # transient I/O error (object-store hiccup, executor loss) is
        # rescheduled up to maxFailures-1 times before failing the job.
        # Extraction tasks are idempotent (commit is all-or-nothing per
        # run), so retries are always safe. local[] mode defaults this
        # to 1 (fail fast); set the cluster default explicitly so tests
        # exercise the same retry semantics a real cluster has.
        .config("spark.task.maxFailures", "4")
        # Scan-split sizing: small enough that this sandbox's ~4-20 MB
        # fixture files split into 2+ ranges each, so a 40-file corpus
        # does not schedule exactly 40 tasks on 32 cores (a 2-wave tail
        # that idles a quarter of the machine — guide §2.6). At 100 TB
        # with ~1 GB files raise toward the 128 MB default via the env
        # knob — the invariant is tasks-per-core, not the byte value.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
