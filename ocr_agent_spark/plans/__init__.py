from ocr_agent_spark.plans.inspect import (
    count_exchanges,
    explain_str,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "count_exchanges",
]
