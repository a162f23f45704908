from ocr_agent_spark.operators.ingest import (
    assign_order_key,
    build_task_table,
    classify_pages,
)
from ocr_agent_spark.operators.extract import extract_tasks, lineage_from_extracted
from ocr_agent_spark.operators.merge import merge_extracted_to_markdown

__all__ = [
    "classify_pages",
    "build_task_table",
    "assign_order_key",
    "extract_tasks",
    "lineage_from_extracted",
    "merge_extracted_to_markdown",
]
