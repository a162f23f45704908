"""Spark source: ``*.warc(.gz)`` archives → the input-hint pages table.

Common Crawl delivers ~1 GB ``.warc.gz`` files; this source turns a
set of them into the engine's canonical pages DataFrame
(``url, warc_ts, html, text, lang`` — fixtures.PAGES_ARROW_SCHEMA_DDL)
so the whole pipeline (extraction, dedup, merge, snapshots) runs
unchanged on real crawl deliveries.

Scale design — the parts that matter at 100 TB:

- **One task per archive, paths shuffled not payloads.** Gzip WARC is
  not splittable without an external index, so the natural Spark unit
  is one archive per task (exactly how cc-pyspark-style jobs run). We
  parallelize a DataFrame OF PATHS and open each file inside
  ``mapInPandas`` — the 1 GB payload never rides a shuffle and never
  materializes as one row (``binaryFile`` would hold whole archives in
  executor memory as single column values).
- **Bounded memory.** kernel/warcfile.py streams gzip members
  incrementally; peak memory per task ≈ one record, not one archive.
  Output flushes every ``out_batch_rows`` pages so a million-record
  archive cannot balloon a single Arrow batch (same policy as the
  fused extraction kernel).
- **Edge normalization.** Payload charsets (BOM / HTTP header / HTML5
  meta prescan) are transcoded to UTF-8 HERE, once, so every
  downstream stage keeps the exact utf-8 contract.
- **Skew.** Archives are near-uniform (~1 GB each) so path-level
  round-robin (``repartition(n)``) balances; a task reads only its own
  archives. ``lang``/``text`` are null at ingest (extraction fills
  them), matching the hint schema.

Malformed-archive contract: a structurally corrupt archive yields its
pages up to the corruption point plus one ``error`` row in the
companion errors frame (``read_warc_errors``); per-record oddities are
skipped inside the kernel. A bad file must not kill the 10k-file job.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"
_ERRORS_DDL = "path string, pages_emitted long, error string"

_OUT_BATCH_ROWS = 2048


def _read_archives(batches: Iterator[pd.DataFrame],
                   with_errors: bool) -> Iterator[pd.DataFrame]:
    from ocr_agent_spark.kernel.warcfile import iter_warc_pages

    if with_errors:
        for batch in batches:
            rows = {"path": [], "pages_emitted": [], "error": []}
            for path in batch["path"]:
                count, err = 0, None
                try:
                    with open(path, "rb") as fh:
                        for _ in iter_warc_pages(fh):
                            count += 1
                except Exception as exc:
                    err = repr(exc)
                rows["path"].append(path)
                rows["pages_emitted"].append(count)
                rows["error"].append(err)
            yield pd.DataFrame(rows)
        return

    cols = ("url", "warc_ts", "html", "text", "lang")
    for batch in batches:
        rows: dict[str, list] = {c: [] for c in cols}
        for path in batch["path"]:
            try:
                with open(path, "rb") as fh:
                    for url, ts, html in iter_warc_pages(fh):
                        rows["url"].append(url)
                        rows["warc_ts"].append(ts)
                        rows["html"].append(html)
                        rows["text"].append(None)
                        rows["lang"].append(None)
                        if len(rows["url"]) >= _OUT_BATCH_ROWS:
                            yield pd.DataFrame(rows)
                            rows = {c: [] for c in cols}
            except Exception:
                # corrupt tail: keep the pages already buffered; the
                # errors pass (read_warc_errors) reports the file.
                continue
        if rows["url"]:
            yield pd.DataFrame(rows)


def _paths_df(spark: SparkSession, paths: list[str],
              num_partitions: int | None) -> DataFrame:
    if not paths:
        raise ValueError("no WARC paths given")
    n = num_partitions or min(len(paths), int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    ))
    df = spark.createDataFrame([(p,) for p in sorted(paths)], "path string")
    return df.repartition(n)


def read_warc(spark: SparkSession, paths: list[str],
              num_partitions: int | None = None) -> DataFrame:
    """WARC archive paths → pages DataFrame (input-hint schema).

    ``paths`` are worker-readable file paths (shared FS / fuse mount /
    pre-localized). One archive is parsed by exactly one task.
    """
    return _paths_df(spark, paths, num_partitions).mapInPandas(
        lambda b: _read_archives(b, with_errors=False), schema=PAGES_DDL
    )


def read_warc_errors(spark: SparkSession, paths: list[str],
                     num_partitions: int | None = None) -> DataFrame:
    """Per-archive triage: pages emitted + first structural error (null
    for clean files). The D2-style companion to ``read_warc`` — corrupt
    deliveries surface as rows, not task failures."""
    return _paths_df(spark, paths, num_partitions).mapInPandas(
        lambda b: _read_archives(b, with_errors=True), schema=_ERRORS_DDL
    )


def write_pages_warc(pages_rows, out_path: str, compress: bool = True) -> int:
    """Export (url, warc_ts, html) rows to one WARC archive (driver-side
    helper for fixtures/tests and small exports). Returns page count."""
    from ocr_agent_spark.kernel.warcfile import write_warc_record

    n = 0
    with open(out_path, "wb") as fh:
        for url, ts, html in pages_rows:
            write_warc_record(fh, url, ts, bytes(html), compress=compress)
            n += 1
    return n
