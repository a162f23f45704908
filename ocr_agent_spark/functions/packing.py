"""Sequence packing: assign documents to fixed-token-budget packs.

The last step before a training run tokenizes the corpus: documents
are laid out in a deterministic order and grouped into packs of ~budget
tokens each (one pack ≈ one training sequence / one shard of them).

Semantics (documented, SQL-replayable): documents are ordered by
`id_col`; a document belongs to the pack its FIRST token falls into,
i.e. pack_id = floor(prefix_sum_exclusive / budget). This is the
budget-binned formulation — a document may straddle a boundary (the
consumer truncates or spills), which keeps assignment a pure function
of the prefix sum. True greedy packing ("start a new pack when the doc
doesn't fit") is inherently a sequential scan and cannot be expressed
as a per-row function of any prefix aggregate; the binned form is the
standard distributed compromise and over-fills a pack by at most one
document.

Scale notes (100 TB): the naive formulation — a global window
`sum() over (order by id)` — puts the ENTIRE corpus in one task
(Spark's empty-partitionBy window). This module implements the
textbook two-phase distributed scan instead:

  1. bucket rows by id range (pure projection, no shuffle),
  2. aggregate per-bucket token totals (tiny: n_buckets rows),
  3. prefix-sum the bucket totals on the driver and broadcast-join
     the offsets back,
  4. cumulative-sum WITHIN each bucket (window partitioned by bucket
     — bounded task size), add the bucket offset.

No task ever holds more than one bucket, and the only driver-side
data is n_buckets rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exclusive_prefix_sum(
    df: DataFrame,
    value_col: str,
    id_col: str = "doc_id",
    bucket_width: int = 4096,
) -> DataFrame:
    """Adds `prefix_sum` = sum of value_col over all rows with smaller
    id (exclusive scan), via the two-phase bucket algorithm above.

    `id_col` must be unique; ordering is by its value. `bucket_width`
    is the id-range width per bucket (ids need not be dense — a sparse
    bucket just sums fewer rows).
    """
    # BIGINT `div`, not float `/`: a double quotient truncates past
    # 2^53 and would misassign boundary rows to the adjacent bucket.
    bucketed = df.withColumn(
        "_bucket",
        F.expr(f"cast({id_col} as bigint) div {int(bucket_width)}L"),
    )
    totals = (
        bucketed.groupBy("_bucket")
        .agg(F.sum(value_col).alias("_bucket_total"))
        .orderBy("_bucket")
    )
    # n_buckets rows on the driver — the one intentional collect.
    rows = totals.collect()
    offsets = []
    running = 0
    for r in rows:
        offsets.append((r["_bucket"], running))
        running += r["_bucket_total"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, ["_bucket", "_bucket_offset"])
    w = (
        Window.partitionBy("_bucket")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bucketed.join(F.broadcast(off_df), "_bucket")
        .withColumn("_incl", F.sum(value_col).over(w))
        .withColumn(
            "prefix_sum",
            (F.col("_bucket_offset") + F.col("_incl") - F.col(value_col))
            .cast("long"),
        )
        .drop("_bucket", "_bucket_offset", "_incl")
    )


def assign_packs(
    docs: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    bucket_width: int = 4096,
) -> DataFrame:
    """(input columns…, prefix_sum, pack_id): budget-binned packing."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    scanned = exclusive_prefix_sum(
        docs, tokens_col, id_col=id_col, bucket_width=bucket_width
    )
    # prefix_sum div budget is exact on BIGINT; float `/` drifts at
    # corpus-scale prefix sums (> 2^53 tokens).
    return scanned.withColumn(
        "pack_id", F.expr(f"prefix_sum div {int(budget)}L")
    )


def pack_stats(packed: DataFrame, tokens_col: str = "n_tokens") -> DataFrame:
    """Per-pack fill report: (pack_id, n_docs, n_tokens)."""
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tokens_col).alias("pack_tokens"),
        )
    )
