"""spark-submit smoke job (run with --py-files ocr_agent_spark.zip).

    python tools/package.py
    spark-submit --master 'local[4]' \
        --py-files _build/ocr_agent_spark.zip tools/submit_job.py

Imports the engine ONLY from the shipped zip (no repo sys.path), runs
the fused extraction end-to-end on a deterministic in-memory corpus,
and prints one JSON status line.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession


def main() -> None:
    spark = SparkSession.builder.appName("ocr-agent-spark-submit-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # Imports resolve from the --py-files zip on driver and executors.
    from ocr_agent_spark.fixtures import pages_dataframe
    from ocr_agent_spark.operators.extract import extract_pages_fused

    pages = pages_dataframe(spark, 80)
    extracted = extract_pages_fused(pages)
    counts = {r["status"]: r["count"] for r in extracted.groupBy("status").count().collect()}
    print(json.dumps({"ok": counts.get("completed", 0) > 0, "status_counts": counts}))
    spark.stop()


if __name__ == "__main__":
    main()
