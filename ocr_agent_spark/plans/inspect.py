"""Physical-plan inspection helpers.

The engine's scale guarantees are plan properties — filters reaching
the parquet scan, projections pruning the fat binary column, payload
stages staying shuffle-free, Python confined to Arrow-vectorized
operators. These helpers turn those properties into assertions so they
are *tested*, not just intended (see tests/test_plans.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def executed_plan_str(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


_PUSHED_RE = re.compile(r"PushedFilters: \[([^\]]*)\]")
_READSCHEMA_RE = re.compile(r"ReadSchema: struct<([^>]*)>")


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters the scan actually received (predicate pushdown proof)."""
    out: list[str] = []
    for m in _PUSHED_RE.finditer(explain_str(df)):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists each scan reads (column-pruning proof) — one list
    per scan in the plan."""
    return [
        [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        for m in _READSCHEMA_RE.finditer(explain_str(df))
    ]


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the executed plan."""
    return executed_plan_str(df).count("Exchange")


def python_eval_operators(df: DataFrame) -> list[str]:
    """Python-evaluation operators in the plan — must all be Arrow
    vectorized (MapInPandas / ArrowEvalPython); BatchEvalPython is the
    row-at-a-time slow path and is forbidden in this engine."""
    plan = executed_plan_str(df)
    return re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas)", plan)
