"""Column-aware PDF layout mode through the Spark extraction path."""

import datetime

def test_fused_extraction_pdf_columns_mode(spark):
    from ocr_agent_spark.kernel import build_pdf_positioned
    from ocr_agent_spark.operators.extract import extract_pages_fused

    chunks = [(72, 720, "left a"), (72, 706, "left b"),
              (350, 720, "right a"), (350, 706, "right b")]
    data = build_pdf_positioned([chunks])
    ts = datetime.datetime(2026, 1, 1)
    pages = spark.createDataFrame(
        [("https://x.example/two-col.pdf", ts, bytearray(data))],
        "url string, warc_ts timestamp, html binary",
    )
    plain = extract_pages_fused(pages).collect()[0]["text"]
    cols = extract_pages_fused(pages, pdf_columns=True).collect()[0]["text"]
    assert plain == "left a right a\nleft b right b\n"
    assert cols == "left a\nleft b\n\nright a\nright b\n"
    # default path untouched: explicit False == no-arg
    again = extract_pages_fused(pages, pdf_columns=False).collect()[0]["text"]
    assert again == plain


def test_fused_columns_mode_identical_on_single_column_corpus(spark):
    """On a single-column corpus (the golden fixtures' shape) the
    layout mode changes NOTHING — safe to enable globally for corpora
    known to carry multi-column PDFs."""
    from ocr_agent_spark.fixtures import pages_dataframe
    from ocr_agent_spark.operators.extract import extract_pages_fused

    pages = pages_dataframe(spark, 30)
    a = {(r["url"], r["page_index"]): r["text"]
         for r in extract_pages_fused(pages).collect()}
    b = {(r["url"], r["page_index"]): r["text"]
         for r in extract_pages_fused(pages, pdf_columns=True).collect()}
    assert a == b
    statuses = {r["status"] for r in extract_pages_fused(pages).collect()}
    assert statuses == {"completed"}
    assert pages.count() <= len(a)  # pdf fan-out only adds rows
