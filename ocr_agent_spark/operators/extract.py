"""The extraction stage: vectorized kernel over Arrow batches.

Spark translation of the reference's scheduler loop + per-task OCR
(cli.py:222-244 → deepseek_ocr2_runner.py:122-177): instead of one row
at a time in one thread, tasks are hash-partitioned by
``xxhash64(url, page_index)`` (including page_index spreads a giant
PDF's pages across partitions — key-level skew handling; host-level
skew never arises because we partition on full url hash, not host) and
each partition flows through ``mapInPandas`` — one Python invocation
per Arrow batch, thousands of docs per call, no per-row Python.

Failure contract (design rule D2, cli.py:239-243): a document that
fails to parse becomes a row with ``status='failed'`` and
``error=repr(e)``; the batch never throws, so Spark task retries are
reserved for infrastructure faults, not data faults.

Lineage (north rule): each output row carries its physical
``partition_id`` plus the partition's running wall-clock; a cheap
post-aggregation distills one lineage row per partition
(partition id, doc count, byte count, wall time).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUS_COMPLETED = "completed"
STATUS_FAILED = "failed"

EXTRACTED_SCHEMA = (
    "order_key long, kind string, url string, page_index int, total_pages int, "
    "created_ts timestamp, text string, status string, error string, "
    "doc_bytes long, partition_id int, part_wall_ms long"
)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Partition iterator → extracted rows (runs on executors)."""
    # Lazy heavyweight-init idiom (runner.py:78-94 analogue): kernels are
    # module-level imports cached per Python worker, loaded once — not
    # per batch — thanks to spark.python.worker.reuse.
    from pyspark import TaskContext

    from ocr_agent_spark.kernel.html_extract import extract_html_text
    from ocr_agent_spark.kernel.minipdf import extract_pdf_page_text

    ctx = TaskContext.get()
    partition_id = ctx.partitionId() if ctx is not None else -1
    t0 = time.monotonic()

    for batch in batches:
        texts: list[str | None] = []
        statuses: list[str] = []
        errors: list[str | None] = []
        for kind, payload, page_index in zip(
            batch["kind"], batch["html"], batch["page_index"]
        ):
            try:
                data = bytes(payload)
                if kind == "pdf_page":
                    text = extract_pdf_page_text(data, int(page_index))
                    text = text.rstrip() + "\n" if text.strip() else ""
                else:
                    text = extract_html_text(data)
                texts.append(text)
                statuses.append(STATUS_COMPLETED)
                errors.append(None)
            except Exception as exc:  # data fault → failure row (D2)
                texts.append(None)
                statuses.append(STATUS_FAILED)
                errors.append(repr(exc))
        wall_ms = int((time.monotonic() - t0) * 1000)
        yield pd.DataFrame(
            {
                "order_key": batch["order_key"],
                "kind": batch["kind"],
                "url": batch["url"],
                "page_index": batch["page_index"],
                "total_pages": batch["total_pages"],
                "created_ts": batch["created_ts"],
                "text": texts,
                "status": statuses,
                "error": errors,
                "doc_bytes": batch["html"].map(len),
                "partition_id": partition_id,
                "part_wall_ms": wall_ms,
            }
        )


# Max rows buffered before a fused output batch is flushed. Bounds the
# per-task Python-side memory independently of the INPUT batch shape:
# without it, a single low-byte/high-page PDF (bytes are the routing
# heuristic, pages are the memory cost) balloons one output batch to
# its full fan-out. 4096 rows ≈ a few MB of text per flush.
FUSED_OUT_BATCH_ROWS = 4096


def _extract_pages_fused_batches(batches: Iterator[pd.DataFrame],
                                 pdf_columns: bool = False) -> Iterator[pd.DataFrame]:
    """Fused probe+fan-out+extract over raw pages (runs on executors).

    One Arrow trip: the raw payload enters Python exactly once; page
    counting, pdf page fan-out (1→N row emission) and extraction all
    happen inside the same batch. Emits the same row shape as the
    staged path minus order_key (attached afterward on slim columns).

    Output batches are flushed every ``FUSED_OUT_BATCH_ROWS`` emitted
    rows — including mid-document, so one degenerate PDF's fan-out
    never accumulates unbounded rows in memory. ``part_wall_ms`` is a
    running clock per task, so ``max()`` per partition is still that
    partition's total wall time.
    """
    from pyspark import TaskContext

    from ocr_agent_spark.kernel.html_extract import extract_html_text
    from ocr_agent_spark.kernel.minipdf import PdfDocument, is_pdf_payload

    ctx = TaskContext.get()
    partition_id = ctx.partitionId() if ctx is not None else -1
    t0 = time.monotonic()

    def new_out():
        return {
            "kind": [], "url": [], "page_index": [], "total_pages": [],
            "created_ts": [], "text": [], "status": [], "error": [],
            "doc_bytes": [],
        }

    out = new_out()

    def emit(kind, url, page_index, total_pages, created_ts, text,
             status, error, nbytes):
        out["kind"].append(kind)
        out["url"].append(url)
        out["page_index"].append(page_index)
        out["total_pages"].append(total_pages)
        out["created_ts"].append(created_ts)
        out["text"].append(text)
        out["status"].append(status)
        out["error"].append(error)
        out["doc_bytes"].append(nbytes)

    def drain() -> pd.DataFrame:
        nonlocal out
        df = pd.DataFrame(out)
        df["partition_id"] = partition_id
        df["part_wall_ms"] = int((time.monotonic() - t0) * 1000)
        out = new_out()
        return df

    for batch in batches:
        for url, created_ts, payload in zip(
            batch["url"], batch["warc_ts"], batch["html"]
        ):
            if payload is None:  # data fault → failure row, never a crash (D2)
                emit("html", url, 0, None, created_ts, None, STATUS_FAILED,
                     "TypeError('null html payload')", 0)
                continue
            data = bytes(payload)
            n = len(data)
            if not is_pdf_payload(data):
                try:
                    emit("html", url, 0, None, created_ts,
                         extract_html_text(data), STATUS_COMPLETED, None, n)
                except Exception as exc:
                    emit("html", url, 0, None, created_ts,
                         None, STATUS_FAILED, repr(exc), n)
            else:
                try:
                    # One object-table parse per document, shared by the
                    # count and every page render (the per-page function
                    # would re-parse per page — measured on multi-page docs).
                    doc = PdfDocument(data)
                    total = doc.page_count
                except Exception as exc:
                    emit("pdf_page", url, 0, -1, created_ts,
                         None, STATUS_FAILED, repr(exc), n)
                    continue
                if total <= 0:
                    emit("pdf_page", url, 0, total, created_ts, None,
                         STATUS_FAILED, "IndexError('page_index 0 out of range "
                         f"for {total}-page PDF')", n)
                    continue
                for p in range(total):
                    try:
                        text = doc.page_text(p, columns=pdf_columns)
                        text = text.rstrip() + "\n" if text.strip() else ""
                        emit("pdf_page", url, p, total, created_ts, text,
                             STATUS_COMPLETED, None, n)
                    except Exception as exc:
                        emit("pdf_page", url, p, total, created_ts, None,
                             STATUS_FAILED, repr(exc), n)
                    if len(out["url"]) >= FUSED_OUT_BATCH_ROWS:
                        yield drain()  # mid-document flush: bounded fan-out
            if len(out["url"]) >= FUSED_OUT_BATCH_ROWS:
                yield drain()
        if out["url"]:
            yield drain()


FUSED_SCHEMA = (
    "kind string, url string, page_index int, total_pages int, "
    "created_ts timestamp, text string, status string, error string, "
    "doc_bytes long, partition_id int, part_wall_ms long"
)


def extract_pages_fused(pages: DataFrame,
                        pdf_columns: bool = False) -> DataFrame:
    """Raw pages → extracted rows in ONE payload pass (the hot path).

    ``pdf_columns=True`` switches PDF page rendering to the
    column-aware layout mode (``minipdf.extract_pdf_page_text_columns``
    — multi-column pages read column-by-column). Default OFF: the
    golden byte-equality contract against the reference fixtures pins
    the plain line-order render.

    The staged path (build_task_table → extract_tasks) mirrors the
    reference's enqueue/run phases and materializes the queue table
    with its dense ``order_key``; this fused path is what a 100 TB
    production run uses: the binary column is scanned once, crosses
    into Python once, and is never shuffled or joined. No order_key
    column — enqueue order IS the natural key (url, page_index)
    (design rule D1: order is data); the dense sequence is derivable
    any time via ``assign_order_key`` on the committed (payload-free)
    output.

    Skew note: a PDF's pages are all emitted by the scan partition that
    holds the PDF (fan-out happens in-batch). Typical web corpora
    (pages ≤ tens) are fine; a corpus of 10k-page PDFs should instead
    take the staged path, whose explode + shuffle spreads pages across
    the cluster before the per-page extraction.
    """
    if pdf_columns:
        def fn(batches):
            return _extract_pages_fused_batches(batches, pdf_columns=True)
    else:
        fn = _extract_pages_fused_batches
    return pages.select("url", "warc_ts", "html").mapInPandas(
        fn, schema=FUSED_SCHEMA
    )


GIANT_PDF_BYTES = 8_000_000


def giant_pdf_predicate(giant_bytes: int = GIANT_PDF_BYTES,
                        use_meta: bool = False) -> F.Column:
    """True iff the row's payload is a PDF of at least ``giant_bytes``.

    With ``use_meta=True`` the predicate reads the ingest-time slim
    metadata columns (``is_pdf``, ``doc_bytes`` — see
    ``ingest.with_doc_meta``) instead of the payload: the routing
    decision then prunes to two fixed-width columns AND pushes down to
    parquet row-group stats, instead of materializing the fattest
    column in the table a second time.

    NULL-safe either way: a NULL payload is NOT giant (it must flow to
    the fused branch, whose kernel turns it into a failure row) —
    without the coalesce, NULL would fail BOTH branch filters and the
    row would silently vanish from the output.
    """
    if use_meta:
        raw = F.col("is_pdf") & (F.col("doc_bytes") >= giant_bytes)
    else:
        raw = (
            (F.substring(F.col("html"), 1, 4).cast("string") == "%PDF")
            & (F.length(F.col("html")) >= giant_bytes)
        )
    return F.coalesce(raw, F.lit(False))


def extract_pages_auto(pages: DataFrame,
                       giant_bytes: int = GIANT_PDF_BYTES,
                       has_giant: bool | None = None) -> DataFrame:
    """Fused extraction with automatic giant-PDF diversion.

    The fused path's one skew hazard: a PDF's pages are all emitted by
    the scan partition holding the payload, so a 10k-page PDF pins one
    task while its siblings finish. Instead of a docstring warning
    (round 1), the corpus is SPLIT by a pure-JVM predicate — PDF magic
    AND payload ≥ ``giant_bytes`` — and only the giant slice takes the
    staged explode+shuffle path, whose hash(url, page_index)
    repartition spreads the pages across the cluster before per-page
    extraction. Everything else keeps the zero-shuffle fused plan.

    The byte threshold is deliberately a scan-time expression (no probe
    UDF pass over the whole corpus): page count correlates with payload
    size, and a false positive merely routes one modest PDF through the
    staged path — same rows either way (tested).

    Output schema = FUSED_SCHEMA for both branches (the staged branch
    drops its dense order_key; order is data — (url, page_index)).
    """
    from ocr_agent_spark.operators.ingest import has_doc_meta

    # When ingest persisted slim routing metadata, both the probe and
    # the branch split read (is_pdf, doc_bytes) instead of the payload
    # — the giant-only staged branch's filter then pushes down to
    # parquet row-group stats and never decodes non-giant payloads.
    is_giant = giant_pdf_predicate(giant_bytes, use_meta=has_doc_meta(pages))
    # Existence check first: the common no-giants corpus keeps the pure
    # fused plan — no split, no staged machinery. Callers that already
    # aggregate over the input (run_extraction_job's pending count)
    # pass ``has_giant`` from that same pass so no extra scan happens;
    # standalone callers fall back to a slim (or JVM-only) limit(1) probe.
    if has_giant is None:
        has_giant = pages.filter(is_giant).limit(1).count() > 0
    if not has_giant:
        return extract_pages_fused(pages)

    fused_out = extract_pages_fused(pages.filter(~is_giant))
    from ocr_agent_spark.operators.ingest import build_task_table

    staged_out = extract_tasks(
        build_task_table(pages.filter(is_giant))
    ).select(*[f.split(" ")[0] for f in FUSED_SCHEMA.split(", ")])
    return fused_out.unionByName(staged_out)


def extract_tasks(tasks: DataFrame, num_partitions: int | None = None,
                  repartition: bool = True) -> DataFrame:
    """tasks → extracted (one completed-or-failed row per task).

    Pass ``repartition=False`` when the input is already hash-
    partitioned by (url, page_index) — e.g. straight out of
    ``build_task_table``'s key-attach join or the resume anti-join —
    to avoid re-shuffling the fat payload column.
    """
    if repartition:
        spark = tasks.sparkSession
        if num_partitions is None:
            num_partitions = int(
                spark.conf.get("spark.sql.shuffle.partitions", "32")
            )
        tasks = tasks.repartition(
            num_partitions, F.xxhash64(F.col("url"), F.col("page_index"))
        )
    return tasks.mapInPandas(_extract_batches, schema=EXTRACTED_SCHEMA)


def lineage_from_extracted(extracted: DataFrame, run_id: str) -> DataFrame:
    """Per-partition lineage rows (north rule A7).

    ``part_wall_ms`` is a running clock within each partition, so
    ``max()`` per partition = that partition's total extraction wall
    time. One output row per physical partition — trivially small.
    """
    return (
        extracted.groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum("doc_bytes").alias("byte_count"),
            F.max("part_wall_ms").alias("wall_time_ms"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            "partition_id",
            "doc_count",
            "byte_count",
            "wall_time_ms",
            F.current_timestamp().alias("committed_ts"),
        )
    )
