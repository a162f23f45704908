"""Scan-parallelism guard for CPU-heavy operators (guide §2.5).

A parquet scan's parallelism is bounded by file count and row-group
layout: a table written as one file with one row group — typical for
small/medium reference extracts — scans as ONE task no matter how many
cores the session has. Catalyst then fuses any expensive per-row work
(shingle explode + hashing, embedding arithmetic, regex profiling) into
that single-task scan stage, serializing the whole pipeline head.

``widen_if_narrow`` repartitions such inputs up to the session's
shuffle parallelism before the heavy work. It is deliberately
scale-ADAPTIVE, not a constant: when the scan already carries at least
half the target partitions (the 100 TB case — thousands of splits) it
is a no-op, so production plans never pay an extra exchange. The
repartition is round-robin; Spark's sort-before-repartition (on by
default, SPARK-23207) keeps the row→partition assignment deterministic
under task retry.

Only row counts/placement change — never row values — so every
downstream aggregate of exact types (counts, min-hash longs, integer
sizes) is bit-identical. Callers whose results depend on float
accumulation ORDER should not use this (none in this package do on
oracle-checked paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def scan_partitions(df: DataFrame) -> int:
    """Physical partition count of the plan feeding ``df`` (no job)."""
    try:
        return df.rdd.getNumPartitions()
    except Exception:
        return -1


def widen_if_narrow(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to ``target`` partitions iff its
    current parallelism is below half the target.

    ``target`` defaults to the session's ``spark.sql.shuffle.partitions``
    (itself derived from the core count in ``session.build_spark``), so
    the knob scales with the session rather than hard-coding local-mode
    numbers. Inputs already ≥ target/2 partitions pass through
    untouched — the production no-op path.
    """
    if target is None:
        try:
            target = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
            )
        except Exception:
            return df
    n = scan_partitions(df)
    if n < 0 or 2 * n >= target:
        return df
    return df.repartition(target)
