"""Crawl-budget apportionment: exact largest-remainder allocation.

Given per-host weights (e.g. ``host_quality_priors`` keep rates ×
volume), split a global crawl budget of N fetch slots across hosts so
that (a) allocations are integers, (b) they sum to EXACTLY N, and
(c) every host gets within 1 of its ideal proportional share — the
largest-remainder method (Hamilton apportionment), the standard
answer to "distribute N things proportionally without fractional
drift".

Everything is integer arithmetic on micro-quantized weights, so the
allocation is deterministic and engine-replayable bit-for-bit.

Scale shape — the subtle part is selecting WHICH hosts get the
``leftover = N − Σ floor(ideal)`` extra slots (the leftover-th largest
remainders) without a global sort:

1. base allocations + remainders: pure projection over the host table.
2. remainders histogram into B buckets (one B-row groupBy).
3. the boundary bucket containing the leftover-th largest remainder is
   found with a window over the B-row histogram (never the hosts).
4. hosts in buckets strictly above the boundary take an extra slot
   directly (projection); ONLY the boundary bucket's rows — expected
   ~|hosts|/B — are ranked exactly, tie-broken by host id.

So no task ever sorts more than ~|hosts|/B rows: the same
pre-cap-then-exact-rank pattern as the frontier mega-host fix
(functions/frontier.py) and the bucketed sessionizer.

Reference parity: beyond-reference surface (the OCR queue has no
multi-host budgeting); composes with functions/webquality.py
host_quality_priors and functions/frontier.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 8192


def allocate_budget(
    hosts: DataFrame,
    total_budget: int,
    weight_col: str = "weight",
    host_col: str = "host",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(host, weight, base, extra, allocation) with Σ allocation ==
    ``total_budget`` whenever Σ positive weight > 0.

    Weights quantize to micro-units once; ``ideal = N·w_micro /
    Σw_micro`` splits into integer ``base`` (floor) and ``remainder``;
    the ``leftover`` extra slots go to the largest remainders, ties
    broken by ``host_col`` ascending. Non-positive weights get 0.
    """
    if total_budget < 0:
        raise ValueError("total_budget must be >= 0")
    from ocr_agent_spark.cache import persist_tracked

    tb = int(total_budget)
    n = F.lit(tb)
    w_micro = (
        F.when(F.col(weight_col) > 0, F.round(F.col(weight_col) * 1e6))
        .otherwise(F.lit(0))
        .cast("long")
    )
    # N·w_micro must stay inside int64 or the long product silently
    # wraps; enforce in-plan (raise_error) rather than only documenting
    # the bound.
    if tb > 0:
        w_limit = (2**63 - 1) // tb
        w_micro = F.when(
            w_micro > F.lit(w_limit),
            F.raise_error(
                F.concat(
                    F.lit(
                        "allocate_budget: total_budget * micro-weight "
                        "overflows int64 (pre-normalize weights) for host "
                    ),
                    F.col(host_col).cast("string"),
                )
            ).cast("long"),
        ).otherwise(w_micro)
    base_tbl = hosts.select(
        host_col, F.col(weight_col).alias("weight"), w_micro.alias("_w")
    )
    tot = base_tbl.agg(F.sum("_w").alias("_tot_w"))
    # base = (N·w) div tot and rem = (N·w) mod tot — BIGINT `div`,
    # exact on longs (a double quotient truncates past 2^53; the
    # product itself is overflow-guarded above).
    scored = persist_tracked(
        base_tbl.crossJoin(F.broadcast(tot)).select(
            host_col,
            "weight",
            "_w",
            "_tot_w",
            F.when(F.col("_tot_w") > 0, (n * F.col("_w")) % F.col("_tot_w"))
            .otherwise(F.lit(0))
            .alias("_rem"),
        ).withColumn(
            "base",
            F.when(
                F.col("_tot_w") > 0,
                F.expr(f"({tb}L * _w) div _tot_w"),
            ).otherwise(F.lit(0)),
        ).withColumn(
            # histogram bucket only (boundary rows get an exact rank
            # later) — double keeps _rem·B from wrapping int64
            "_bkt",
            F.when(
                (F.col("_tot_w") > 0) & (F.col("_rem") > 0),
                (F.col("_rem").cast("double") * n_buckets / F.col("_tot_w"))
                .cast("long"),
            ).otherwise(F.lit(-1)),
        )
    )
    leftover_tbl = scored.agg((n - F.sum("base")).alias("_leftover"))
    hist = (
        scored.filter(F.col("_bkt") >= 0)
        .groupBy("_bkt")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    w_desc = Window.orderBy(F.col("_bkt").desc())
    boundary = (
        hist.select(
            "_bkt", "_n",
            (F.sum("_n").over(
                w_desc.rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ) - F.col("_n")).alias("_above"),
        )
        .crossJoin(F.broadcast(leftover_tbl))
        .filter(
            (F.col("_leftover") > 0)
            & (F.col("_above") < F.col("_leftover"))
            & (F.col("_above") + F.col("_n") >= F.col("_leftover"))
        )
        .select(
            F.col("_bkt").alias("_boundary_bkt"),
            (F.col("_leftover") - F.col("_above")).alias("_take"),
        )
    )
    # singleton even when leftover == 0: sentinel above every bucket
    bref = (
        boundary.unionByName(
            hosts.sparkSession.range(1).select(
                F.lit(n_buckets + 1).cast("long").alias("_boundary_bkt"),
                F.lit(0).cast("long").alias("_take"),
            )
        )
        .orderBy(F.col("_boundary_bkt").asc())
        .limit(1)
    )
    # exact rank ONLY inside the boundary bucket (~|hosts|/B rows)
    wb = Window.partitionBy("_bkt").orderBy(
        F.col("_rem").desc(), F.col(host_col).asc()
    )
    boundary_extras = (
        scored.join(
            F.broadcast(boundary),
            F.col("_bkt") == F.col("_boundary_bkt"),
        )
        .withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") <= F.col("_take"))
        .select(F.col(host_col).alias("_xh"), F.lit(1).alias("_x"))
    )
    return (
        scored.crossJoin(F.broadcast(bref))
        .join(
            F.broadcast(boundary_extras),
            F.col(host_col) == F.col("_xh"),
            "left",
        )
        .select(
            host_col,
            "weight",
            "base",
            F.when(F.col("_bkt") > F.col("_boundary_bkt"), F.lit(1))
            .when(F.col("_x") == 1, F.lit(1))
            .otherwise(F.lit(0))
            .alias("extra"),
        )
        .withColumn("allocation", F.col("base") + F.col("extra"))
    )
