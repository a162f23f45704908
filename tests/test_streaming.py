"""Streaming ingestion: exactly-once drain + checkpoint resume (ST1-ST4)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_agent_spark.fixtures import generate_pages
from ocr_agent_spark.streaming import run_streaming_extraction


def _write_batch(path: str, records) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us", tz="UTC")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    table = pa.Table.from_pydict(
        {
            "url": [r.url for r in records],
            "warc_ts": [r.warc_ts for r in records],
            "html": [r.html for r in records],
            "text": [r.text for r in records],
            "lang": [r.lang for r in records],
        },
        schema=schema,
    )
    pq.write_table(table, path)


def test_streaming_drain_and_resume(spark, tmp_path):
    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    records = [r for r in generate_pages(40) if r.html[:4] != b"%PDF"]

    _write_batch(f"{inbox}/batch-0.parquet", records[:25])
    n1 = run_streaming_extraction(spark, inbox, out, ckpt)
    assert n1 == 25

    # second drain with no new files: nothing reprocessed (per-drain delta)
    n2 = run_streaming_extraction(spark, inbox, out, ckpt)
    assert n2 == 0

    # new file arrives → only it is processed (checkpoint resume, ST3)
    _write_batch(f"{inbox}/batch-1.parquet", records[25:])
    n3 = run_streaming_extraction(spark, inbox, out, ckpt)
    assert n3 == len(records) - 25

    ext = spark.read.parquet(out)
    assert ext.count() == ext.select("url").distinct().count()  # exactly-once
    assert ext.filter("status = 'completed'").count() == len(records)

    # streamed extraction text == batch kernel text (one code path)
    from ocr_agent_spark.kernel import extract_html_text

    got = {r["url"]: r["text"] for r in ext.collect()}
    for rec in records:
        assert got[rec.url] == extract_html_text(rec.html)


def test_streaming_multipage_pdf_fans_out_all_pages(spark, tmp_path):
    """ADVICE r01 (medium): a multi-page PDF arriving on the stream must
    yield one row per page — identical to the batch path — not a single
    page-0 row with the rest silently dropped."""
    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pdf_records = [r for r in generate_pages(60) if r.html[:4] == b"%PDF"]
    assert pdf_records
    _write_batch(f"{inbox}/pdfs.parquet", pdf_records)
    n = run_streaming_extraction(spark, inbox, out, ckpt)

    from ocr_agent_spark.kernel.minipdf import pdf_page_count

    expected_pages = sum(pdf_page_count(r.html) for r in pdf_records)
    assert n == expected_pages
    ext = spark.read.parquet(out)
    assert ext.count() == expected_pages
    multi = [r for r in pdf_records if pdf_page_count(r.html) > 1]
    assert multi, "fixture must contain at least one multi-page PDF"
    for rec in multi:
        pages = ext.filter(ext.url == rec.url).select("page_index").collect()
        assert sorted(p["page_index"] for p in pages) == list(
            range(pdf_page_count(rec.html))
        )

    # batch-path equality on the same payloads (one code path, two drivers)
    from ocr_agent_spark.operators.extract import extract_pages_fused

    batch_rows = {
        (r["url"], r["page_index"]): r["text"]
        for r in extract_pages_fused(
            spark.read.parquet(f"{inbox}/pdfs.parquet")
        ).collect()
    }
    stream_rows = {
        (r["url"], r["page_index"]): r["text"] for r in ext.collect()
    }
    assert stream_rows == batch_rows


def test_streaming_snapshot_committed_sink(spark, tmp_path):
    """foreachBatch → SnapshotStore: streamed and batch extraction share
    one table, one resume contract, one merge surface; drains are
    idempotent (re-drain commits nothing) and lineage rows land per run."""
    from ocr_agent_spark.pipeline import (
        merge_job,
        read_extracted,
        read_lineage,
        run_extraction_job,
    )
    from ocr_agent_spark.streaming.ingest import (
        run_streaming_extraction_committed,
    )

    inbox = str(tmp_path / "inbox")
    root = str(tmp_path / "job")
    ckpt = str(tmp_path / "ckpt")
    records = generate_pages(30)

    _write_batch(f"{inbox}/b0.parquet", records[:18])
    runs1 = run_streaming_extraction_committed(spark, inbox, root, ckpt)
    assert runs1, "first drain must commit at least one run"

    # idempotence: nothing new → no commits
    assert run_streaming_extraction_committed(spark, inbox, root, ckpt) == []

    # new arrivals → exactly the new rows, in the SAME snapshot table
    _write_batch(f"{inbox}/b1.parquet", records[18:])
    runs2 = run_streaming_extraction_committed(spark, inbox, root, ckpt)
    assert runs2 and set(runs2).isdisjoint(runs1)

    ext = read_extracted(spark, root)
    assert ext.select("url").distinct().count() == 30
    assert ext.count() == ext.select("url", "page_index").distinct().count()

    # lineage rows exist for every streamed run
    lineage = read_lineage(spark, root)
    run_ids = {r["run_id"] for r in lineage.select("run_id").distinct().collect()}
    assert set(runs1 + runs2) <= run_ids

    # the BATCH job resumes against the streamed commits: nothing pending
    pages_df = spark.createDataFrame(
        [(r.url, r.warc_ts, r.html, r.text, r.lang) for r in records],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    result = run_extraction_job(spark, pages_df, root)
    assert result.pages_processed == 0
    assert result.pages_skipped_committed == 30

    # and the ordered merge works over the streamed table
    merged = merge_job(spark, root)
    assert merged.startswith("# Extracted Output")


def test_committed_streaming_repairs_missing_lineage(spark, tmp_path):
    """ADVICE r2 (medium): a crash landing between the extraction-manifest
    publish and the lineage publish must not leave that batch's lineage
    missing forever — the next drain repairs it from the committed run
    dir, even though the extraction manifest already lists the run."""
    import shutil

    from ocr_agent_spark.fixtures import generate_pages
    from ocr_agent_spark.pipeline import lineage_store, read_lineage
    from ocr_agent_spark.streaming.ingest import (
        run_streaming_extraction_committed,
    )

    inbox = str(tmp_path / "inbox")
    root = str(tmp_path / "job")
    ckpt = str(tmp_path / "ckpt")
    records = generate_pages(12)
    _write_batch(f"{inbox}/b0.parquet", records)

    runs = run_streaming_extraction_committed(spark, inbox, root, ckpt)
    assert len(runs) >= 1

    # Simulate the crash window: extraction manifest committed, lineage
    # manifest missing for the last run (wipe lineage store entirely —
    # strictly worse than the real window).
    lstore = lineage_store(root)
    shutil.rmtree(lstore.root)

    # Replay the drain with a FRESH checkpoint so foreachBatch redelivers
    # batch 0; the extraction manifest already lists the run_id, so the
    # early return path must now repair lineage before returning.
    ckpt2 = str(tmp_path / "ckpt2")
    replay_runs = run_streaming_extraction_committed(spark, inbox, root, ckpt2)
    assert replay_runs == []  # no new extraction commits (exactly-once)

    lineage = read_lineage(spark, root)
    assert lineage is not None
    run_ids = {r["run_id"] for r in lineage.select("run_id").distinct().collect()}
    assert set(runs) <= run_ids
    # extraction table unchanged (no dup rows from the replay)
    from ocr_agent_spark.pipeline import read_extracted
    ext = read_extracted(spark, root)
    assert ext.count() == ext.select("url", "page_index").distinct().count()
