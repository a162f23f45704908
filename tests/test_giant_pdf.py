"""Giant-PDF fan-out: both paths handle a 300-page payload correctly."""

from ocr_agent_spark.kernel.minipdf import build_pdf


def test_300_page_pdf_both_paths(spark):
    pages = [[f"PAGE_{p}_MARK", f"line two of page {p}"] for p in range(300)]
    payload = build_pdf(pages)
    df = spark.createDataFrame(
        [("https://big.example/doc", None, payload, None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )

    from ocr_agent_spark.operators.extract import extract_pages_fused, extract_tasks
    from ocr_agent_spark.operators.ingest import build_task_table

    fused = extract_pages_fused(df).collect()
    assert len(fused) == 300
    assert all(r["status"] == "completed" for r in fused)
    assert sorted(r["page_index"] for r in fused) == list(range(300))
    by_page = {r["page_index"]: r["text"] for r in fused}
    assert "PAGE_0_MARK" in by_page[0] and "PAGE_299_MARK" in by_page[299]

    staged = extract_tasks(build_task_table(df), repartition=False).collect()
    assert {(r["page_index"], r["text"]) for r in staged} == {
        (r["page_index"], r["text"]) for r in fused
    }
