"""ocr_agent_spark — a PySpark-native main-content extraction engine.

A brand-new engine with the query/data-processing capabilities of the
reference ``takuto-NA/ocr-agent`` (a single-process OCR queue app),
re-expressed Spark-first: an ordered document queue becomes a parquet
table with a persisted ``order_key``; the per-row OCR black box becomes
an Arrow-vectorized extraction kernel (HTML boilerplate removal +
mini-PDF layout reconstruction) running inside ``mapInPandas``; the
SQLite status machine becomes snapshot-manifest commits with anti-join
resume; the ordered markdown merge becomes a range-partitioned sort +
two-phase concat.

Layout:
- ``kernel/``     pure-Python, Spark-free extraction kernels (unit-testable)
- ``operators/``  Spark DataFrame operators (ingest, extract, merge, resume)
- ``sources/``    readers/writers incl. the snapshot store
- ``functions/``  column-level helpers (scalar function library)
- ``streaming/``  Structured Streaming ingestion (inbox-watcher analogue)
"""

from ocr_agent_spark.cache import (  # noqa: F401
    cache_scope,
    persist_tracked,
    release_all_caches,
    release_caches,
)

__version__ = "0.2.0"
