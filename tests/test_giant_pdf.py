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


def test_auto_routing_diverts_giant_pdf(spark):
    """extract_pages_auto routes a giant PDF to the staged explode path
    (its pages spread across many tasks — skew balance, not just
    equality) while small payloads keep the fused plan."""
    from ocr_agent_spark.operators.extract import (
        extract_pages_auto,
        extract_pages_fused,
    )

    giant_pages = [[f"PAGE_{p}_MARK"] for p in range(300)]
    giant = build_pdf(giant_pages)
    small_pdf = build_pdf([["small page one"], ["small page two"]])
    html = b"<html><body><main><p>hello world</p></main></body></html>"
    df = spark.createDataFrame(
        [
            ("https://big.example/doc", None, giant, None, "en"),
            ("https://small.example/pdf", None, small_pdf, None, "en"),
            ("https://small.example/html", None, html, None, "en"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )

    routed = extract_pages_auto(df, giant_bytes=len(giant) // 2)
    rows = routed.collect()
    fused_rows = extract_pages_fused(df).collect()
    key = lambda rs: {(r["url"], r["page_index"], r["text"], r["status"]) for r in rs}
    assert key(rows) == key(fused_rows)  # identical output either way
    assert routed.columns == extract_pages_fused(df).columns  # same schema

    # skew balance: the giant PDF's 300 pages must NOT sit in one task
    giant_parts = {
        r["partition_id"] for r in rows if r["url"] == "https://big.example/doc"
    }
    assert len(giant_parts) > 1, giant_parts
    # the small payloads kept the fused plan's partitioning (one scan
    # partition here), i.e. they were not dragged through the staged path
    small_rows = [r for r in rows if r["url"] != "https://big.example/doc"]
    assert len(small_rows) == 3

    # no giants -> plan IS the fused plan (zero shuffles)
    from ocr_agent_spark.plans.inspect import count_exchanges

    small_only = df.filter(~df.url.contains("big"))
    auto_plan = extract_pages_auto(small_only, giant_bytes=10**9)
    assert count_exchanges(auto_plan) == 0


def test_null_payload_becomes_failure_row_on_both_routes(spark):
    """code-review r02: a NULL html payload must surface as a
    status='failed' row (D2), not vanish when a giant PDF makes the
    router split the corpus, and not crash the fused kernel."""
    from ocr_agent_spark.operators.extract import extract_pages_auto

    giant = build_pdf([[f"P{p}"] for p in range(50)])
    rows = [
        ("https://x/null", None, None, None, "en"),
        ("https://x/ok", None,
         b"<p>healthy words one two three four five six seven eight nine ten</p>",
         None, "en"),
        ("https://x/giant", None, giant, None, "en"),
    ]
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    df = spark.createDataFrame(rows, schema)

    # with a giant present (split plan) and without (pure fused plan)
    for giant_bytes in (len(giant) // 2, 10**9):
        out = extract_pages_auto(df, giant_bytes=giant_bytes).collect()
        by_url = {}
        for r in out:
            by_url.setdefault(r["url"], []).append(r)
        assert len(by_url["https://x/null"]) == 1
        nr = by_url["https://x/null"][0]
        assert nr["status"] == "failed" and "null html payload" in nr["error"]
        assert by_url["https://x/ok"][0]["status"] == "completed"
        assert len(by_url["https://x/giant"]) == 50
