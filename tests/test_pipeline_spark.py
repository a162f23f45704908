"""Spark integration: end-to-end extraction job semantics (SURVEY §5).

Covers: golden byte-equality per (url, page_index), queue semantics
(status histogram A1, failed-row retention D2, empty-input guard A3,
resume anti-join J2), ordered merge determinism under parallelism (D1),
lineage (A7), and the ordering contract W1.
"""

import os

import pyspark.sql.functions as F
import pytest

from ocr_agent_spark.fixtures import generate_pages, pages_dataframe
from ocr_agent_spark.kernel import (
    extract_html_text,
    extract_pdf_page_text,
    pdf_page_count,
)
from ocr_agent_spark.operators.merge import merge_extracted_to_markdown
from ocr_agent_spark.operators.metrics import (
    heavy_hitter_hosts,
    latest_failed_error,
    status_histogram,
)
from ocr_agent_spark.pipeline import (
    EmptyInputError,
    merge_job,
    read_extracted,
    read_lineage,
    run_extraction_job,
)

N_DOCS = 80


@pytest.fixture(scope="module")
def corpus(spark):
    return pages_dataframe(spark, N_DOCS).persist()


@pytest.fixture(scope="module")
def completed_root(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("job"))
    run_extraction_job(spark, corpus, root, run_id="r1")
    return root


def _expected_rows():
    expected = {}
    for i, rec in enumerate(generate_pages(N_DOCS)):
        if rec.html[:4] == b"%PDF":
            for p in range(pdf_page_count(rec.html)):
                t = extract_pdf_page_text(rec.html, p)
                expected[(rec.url, p)] = t.rstrip() + "\n" if t.strip() else ""
        else:
            expected[(rec.url, 0)] = extract_html_text(rec.html)
    return expected


def test_golden_byte_equality(spark, completed_root):
    got = {
        (r["url"], r["page_index"]): r["text"]
        for r in read_extracted(spark, completed_root).collect()
    }
    expected = _expected_rows()
    assert set(got) == set(expected)
    mismatches = [k for k in expected if got[k] != expected[k]]
    assert mismatches == []


def _assert_dense_order(rows):
    by_key = sorted(rows, key=lambda r: r["order_key"])
    assert [r["order_key"] for r in by_key] == list(range(1, len(rows) + 1))
    assert [(r["url"], r["page_index"]) for r in by_key] == sorted(
        (r["url"], r["page_index"]) for r in rows
    )


def test_order_key_contract_staged(spark, corpus):
    # Staged queue path: order_key is a dense 1..N sequence following
    # (url, page_index) — the AUTOINCREMENT task_id analogue (W1/D1).
    from ocr_agent_spark.operators.ingest import build_task_table

    rows = build_task_table(corpus).select("order_key", "url", "page_index").collect()
    _assert_dense_order(rows)


def test_order_key_derivable_from_committed(spark, completed_root):
    from ocr_agent_spark.pipeline import attach_order_key

    rows = (
        attach_order_key(read_extracted(spark, completed_root))
        .select("order_key", "url", "page_index")
        .collect()
    )
    _assert_dense_order(rows)


def test_status_histogram_all_completed(spark, completed_root):
    hist = {
        r["status"]: r["task_count"]
        for r in status_histogram(read_extracted(spark, completed_root)).collect()
    }
    assert set(hist) == {"completed"}


def test_lineage_rows(spark, completed_root):
    lineage = read_lineage(spark, completed_root)
    rows = lineage.collect()
    assert len(rows) >= 1
    total_docs = sum(r["doc_count"] for r in rows)
    assert total_docs == read_extracted(spark, completed_root).count()
    assert all(r["byte_count"] > 0 for r in rows)
    assert all(r["wall_time_ms"] >= 0 for r in rows)
    assert all(r["run_id"] == "r1" for r in rows)


def test_merge_parallelism_invariance(spark, completed_root):
    ext = read_extracted(spark, completed_root)
    outs = {
        p: merge_extracted_to_markdown(ext, num_partitions=p) for p in (1, 3, 16)
    }
    assert outs[1] == outs[3] == outs[16]
    assert outs[1].startswith("# Extracted Output\n")
    assert outs[1].endswith("\n") and not outs[1].endswith("\n\n")


def test_merge_to_file_byte_identical(spark, completed_root, tmp_path):
    """The bounded-memory streaming merge == the in-memory merge."""
    from ocr_agent_spark.operators.merge import merge_extracted_to_file

    ext = read_extracted(spark, completed_root)
    in_memory = merge_extracted_to_markdown(ext)
    path = str(tmp_path / "merged.md")
    n = merge_extracted_to_file(ext, path)
    with open(path, encoding="utf-8", newline="") as fh:
        streamed = fh.read()
    assert streamed == in_memory
    assert n == len(in_memory.encode("utf-8"))


def test_merge_sharded_concat_byte_identical(spark, completed_root, tmp_path):
    """The no-driver-funnel shape: per-range-partition shard files +
    ordered manifest; concatenation in manifest order is byte-equal to
    the single-file merge for ANY partition count, and total_bytes is
    honest."""
    import json

    from ocr_agent_spark.operators.merge import merge_extracted_to_sharded_files

    ext = read_extracted(spark, completed_root)
    in_memory = merge_extracted_to_markdown(ext)
    for p in (1, 3, 16):
        d = str(tmp_path / f"shards_{p}")
        manifest = merge_extracted_to_sharded_files(ext, d, num_partitions=p)
        parts = []
        for f in manifest["files"]:
            with open(f, "rb") as fh:
                parts.append(fh.read())
        concat = b"".join(parts)
        assert concat == in_memory.encode("utf-8"), f"p={p}"
        assert manifest["total_bytes"] == len(concat)
        on_disk = json.load(open(f"{d}/manifest.json"))
        assert on_disk["files"] == manifest["files"]
        # multiple shards actually exist at p=16 (not one giant file)
        if p == 16:
            assert len(manifest["files"]) > 2
        # atomic-write discipline (advice r5): no torn temp files left,
        # and if the driver trimmed the tail it wrote a NEW file rather
        # than rewriting the task-owned shard (zombie-attempt safety)
        leftovers = [f for f in os.listdir(d) if ".tmp-" in f]
        assert leftovers == []
        last = manifest["files"][-1]
        if last.endswith("-tail.md"):
            orig = last.replace("-tail.md", ".md")
            assert os.path.exists(orig)  # task-owned file untouched


def test_merge_equals_sequential_reference_shape(spark, completed_root):
    """Distributed merge == pure sequential merge over the same rows."""
    from ocr_agent_spark.kernel.merge import MergeRow, render_merged_markdown

    rows = (
        read_extracted(spark, completed_root)
        .orderBy("url", "page_index")
        .select("url", "kind", "page_index", "total_pages", "text")
        .collect()
    )
    sequential = render_merged_markdown(
        [MergeRow(r["url"], r["kind"], r["page_index"], r["total_pages"], r["text"]) for r in rows]
    )
    distributed = merge_job(spark, completed_root)
    assert distributed == sequential


def test_merge_job_streams_to_file_byte_identical(spark, completed_root, tmp_path):
    """merge_job(merged_path=...) must take the bounded-memory streaming
    path (merge_extracted_to_file) and produce bytes identical to the
    collecting variant (VERDICT r2 'what's wrong' #2: the CLI run path
    previously collected the whole artifact into the driver)."""
    collected = merge_job(spark, completed_root)
    path = str(tmp_path / "artifact.md")
    returned = merge_job(spark, completed_root, merged_path=path)
    with open(path, encoding="utf-8", newline="") as fh:
        on_disk = fh.read()
    assert on_disk == collected
    assert returned == collected


def test_resume_processes_only_remainder(spark, corpus, tmp_path):
    root = str(tmp_path / "resume")
    first = run_extraction_job(spark, corpus.limit(30), root, run_id="first")
    second = run_extraction_job(spark, corpus, root, run_id="second")
    assert second.pages_skipped_committed == first.pages_processed
    assert second.pages_processed == second.pages_total - first.pages_processed
    ext = read_extracted(spark, root)
    assert ext.count() == ext.select("url", "page_index").distinct().count()
    # third run: nothing pending, no new snapshot data
    third = run_extraction_job(spark, corpus, root, run_id="third")
    assert third.pages_processed == 0


def test_failed_rows_retained_and_skipped_in_merge(spark, tmp_path):
    bad = spark.createDataFrame(
        [
            ("https://bad.example/x", None, b"%PDF-truncated-garbage", None, "en"),
            (
                "https://ok.example/y",
                None,
                b"<html><body><p>"
                + b"good words fill this paragraph up to the content threshold now "
                + b"</p></body></html>",
                None,
                "en",
            ),
        ],
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    root = str(tmp_path / "bad")
    run_extraction_job(spark, bad, root, run_id="rbad")
    ext = read_extracted(spark, root)
    failed = ext.filter(F.col("status") == "failed").collect()
    assert len(failed) == 1
    assert failed[0]["error"] is not None and "IndexError" in failed[0]["error"]
    # W3: latest failed error surfaces
    lf = latest_failed_error(ext).collect()[0]
    assert "IndexError" in lf["error"]
    # failed row excluded from the artifact, retained in the table
    merged = merge_job(spark, root)
    assert "bad.example" not in merged
    assert "ok.example" in merged


def test_empty_input_guard(spark, corpus, tmp_path):
    with pytest.raises(EmptyInputError):
        run_extraction_job(spark, corpus.limit(0), str(tmp_path / "empty"))


def test_partition_balance_under_host_skew(spark, corpus, tmp_path):
    """The corpus plants ~35% of docs on one host; extraction partitions
    must stay balanced anyway (nothing keys by host). Evidence straight
    from the lineage table: no partition holds more than 3x the mean."""
    from ocr_agent_spark.operators.extract import extract_pages_fused

    ext = extract_pages_fused(corpus.repartition(8))
    counts = [
        r["doc_count"]
        for r in ext.groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .collect()
    ]
    assert len(counts) >= 4
    assert max(counts) <= 3 * (sum(counts) / len(counts))


def test_heavy_hitter_detection(spark, corpus):
    hosts = [r["host"] for r in heavy_hitter_hosts(corpus).collect()]
    assert "host0.example" in hosts  # the planted skew


def test_salted_host_counts_equals_direct(spark, corpus):
    from ocr_agent_spark.operators.metrics import salted_host_counts

    salted = {r["host"]: r["doc_count"] for r in salted_host_counts(corpus).collect()}
    direct = {
        r["host"]: r["cnt"]
        for r in corpus.groupBy(
            F.regexp_extract("url", r"^https?://([^/]+)/", 1).alias("host")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert salted == direct


def test_extraction_plan_is_vectorized(spark, corpus):
    """BASELINE 'no per-row Python': plan shows only Arrow-vectorized
    Python operators (MapInPandas / ArrowEvalPython), never BatchEvalPython."""
    from ocr_agent_spark.operators.extract import extract_tasks
    from ocr_agent_spark.operators.ingest import build_task_table

    plan = extract_tasks(build_task_table(corpus))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan


def test_fused_plan_single_pass_no_shuffle(spark, corpus):
    """The fused hot path: one MapInPandas, no exchange of the payload
    (no Exchange at all below the extractor), no row-wise Python."""
    from ocr_agent_spark.operators.extract import extract_pages_fused

    plan = extract_pages_fused(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan  # payload never shuffles


def test_fused_equals_staged(spark, corpus):
    """Fused single-pass output == staged queue-path output, row for row."""
    from ocr_agent_spark.operators.extract import extract_pages_fused, extract_tasks
    from ocr_agent_spark.operators.ingest import build_task_table

    fused = {
        (r["url"], r["page_index"]): (r["kind"], r["total_pages"], r["text"], r["status"])
        for r in extract_pages_fused(corpus).collect()
    }
    staged = {
        (r["url"], r["page_index"]): (r["kind"], r["total_pages"], r["text"], r["status"])
        for r in extract_tasks(build_task_table(corpus), repartition=False).collect()
    }
    # staged html rows carry total_pages NULL; fused ditto — comparable.
    assert fused == staged
