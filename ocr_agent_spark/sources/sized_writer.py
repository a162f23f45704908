"""Target-file-size parquet writer — output hygiene for 100 TB jobs.

A naive ``df.write.parquet`` inherits whatever partitioning the last
stage had: a 2000-partition shuffle writing a 10 GB result makes 2000
5 MB files (metadata pressure, tiny-scan overhead for every later
reader); a coalesced giant makes single multi-GB files that cap
downstream parallelism. Production pipelines size output files
explicitly (Iceberg's ``write.target-file-size-bytes``, Delta's
``optimize``); this module is that knob for plain parquet:

1. Estimate bytes/row by writing a SMALL deterministic head sample
   (``sample_rows``, default 10k) through the same codec and measuring
   the produced files — compression-aware, unlike ``sizeInBytes`` plan
   stats which reflect the in-memory representation.
2. Count rows (cheap aggregate over the source).
3. ``n_files = clamp(ceil(total_est / target_bytes), 1, max_files)``.
4. Repartition and write. Two layout modes:
   - ``mode="roundrobin"`` (default): ``repartition(n)`` — balanced
     files regardless of input skew.
   - ``mode="range"``: ``repartitionByRange(n, order_col)`` — files
     carry disjoint sorted key ranges (pair with
     ``sampling.shuffle_key`` for deterministic training shards, or a
     time/id column for range-prunable output).

The sample write, the count, and the final write are three jobs; at
100 TB the first two are noise next to the third, and the final write
is the SAME single shuffle a hand-tuned repartition would pay. Spark's
per-file row cap (``maxRecordsPerFile``) is set as a belt-and-braces
bound derived from the same estimate, so even a wildly skewed
partition cannot emit a multiple of the target.
"""

from __future__ import annotations

import math
import os
import uuid

from pyspark.sql import DataFrame


def estimate_bytes_per_row(df: DataFrame, scratch_dir: str,
                           sample_rows: int = 10_000,
                           compression: str = "snappy") -> float:
    """Measured on-disk bytes/row for ``df``'s schema+content under the
    target codec: write a deterministic head sample, stat the files.

    Deliberately a head ``limit()`` — one task, no full scan. Rows are
    assumed homogeneous enough that the head predicts the corpus; for
    wildly heterogeneous corpora pass a larger ``sample_rows``.
    """
    path = os.path.join(scratch_dir, f"_sizer_{uuid.uuid4().hex}")
    sample = df.limit(sample_rows)
    sample.write.mode("overwrite").option("compression", compression) \
        .parquet(path)
    n = sample.count()
    size = 0
    for root, _dirs, files in os.walk(path):
        size += sum(os.path.getsize(os.path.join(root, f))
                    for f in files if f.endswith(".parquet"))
    # best-effort scratch cleanup (local/posix path; on object stores
    # leave it to the caller's lifecycle rules)
    try:
        import shutil

        shutil.rmtree(path)
    except OSError:
        pass
    if n == 0:
        raise ValueError("estimate_bytes_per_row: input is empty")
    return size / n


def write_sized_parquet(df: DataFrame, path: str, scratch_dir: str,
                        target_bytes: int = 512 * 1024 * 1024,
                        sample_rows: int = 10_000,
                        compression: str = "snappy",
                        mode: str = "roundrobin",
                        order_col: str | None = None,
                        max_files: int = 100_000) -> dict:
    """Write ``df`` as parquet files of ~``target_bytes`` each.

    Returns a report dict: ``{"n_rows", "bytes_per_row", "n_files",
    "rows_per_file_cap"}``. See module docstring for the mechanism.
    """
    if mode not in ("roundrobin", "range"):
        raise ValueError(f"write_sized_parquet: unknown mode {mode!r}")
    if mode == "range" and not order_col:
        raise ValueError("write_sized_parquet: mode='range' needs order_col")
    bpr = estimate_bytes_per_row(df, scratch_dir, sample_rows, compression)
    n_rows = df.count()
    n_files = min(max(1, math.ceil(n_rows * bpr / target_bytes)), max_files)
    # cap with 20% slack so the cap only bites on real skew, not on
    # round-robin imbalance of a few rows
    rows_cap = max(1, math.ceil(target_bytes / bpr * 1.2))
    if mode == "range":
        out = df.repartitionByRange(n_files, order_col)
        if order_col:
            out = out.sortWithinPartitions(order_col)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite") \
        .option("compression", compression) \
        .option("maxRecordsPerFile", rows_cap) \
        .parquet(path)
    return {"n_rows": n_rows, "bytes_per_row": round(bpr, 2),
            "n_files": n_files, "rows_per_file_cap": rows_cap}
