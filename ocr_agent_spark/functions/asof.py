"""As-of join: for each left row, the most recent right row at-or-before it.

Spark has no native ASOF JOIN (DuckDB/Pandas do). The naive encodings
are a theta-join (``l.key = r.key AND r.ts <= l.ts`` + max) — a range
join that explodes quadratically per key — or a per-key collect. The
scalable encoding used here is union + window:

1. tag both sides and union them into one stream;
2. sort within key by (ts, side-tag) — right rows before left rows at
   equal ts, so an exact-ts match is visible to its left row;
3. ``last(right_value, ignoreNulls=True)`` over the window
   ``rowsBetween(unboundedPreceding, current)`` carries the latest
   right value forward;
4. keep the left rows.

One shuffle on the key (same as any keyed join), no row explosion,
window state is O(1) per row. Skewed keys follow the same salting
playbook as any keyed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """left + columns of the latest right row with ``r.ts <= l.ts``.

    ``value_cols``: right columns to carry (default: all non-key,
    non-ts). Left rows with no prior right row get NULLs (left-outer
    as-of semantics).
    """
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in set(key_cols) | {ts_col}
        ]

    l_tagged = left.select(
        *key_cols,
        F.col(ts_col),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in value_cols],
        F.struct(*[F.col(c) for c in left.columns]).alias("_l_row"),
    )
    r_tagged = right.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.lit(None)
        .cast(l_tagged.schema["_l_row"].dataType)
        .alias("_l_row"),
    )

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_is_left",
        "_l_row",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("_is_left") == 1).select(
        *[F.col(f"_l_row.{c}").alias(c) for c in left.columns],
        *[F.col(f"_c_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out
