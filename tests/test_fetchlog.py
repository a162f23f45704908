"""Fetch-log source (kernel iter_fetch_log + sources read_fetch_log)."""

import datetime
import io

from ocr_agent_spark.functions.redirects import resolve_redirects
from ocr_agent_spark.kernel.warcfile import (
    iter_fetch_log,
    iter_warc_pages,
    write_warc_record,
)
from ocr_agent_spark.sources.warc import read_fetch_log, redirect_edges

UTC = datetime.timezone.utc
TS = datetime.datetime(2026, 4, 1, tzinfo=UTC)


def test_kernel_statuses_and_location():
    buf = io.BytesIO()
    write_warc_record(buf, "http://a", TS, b"<html>ok</html>")
    write_warc_record(buf, "http://b", TS, b"", status=301,
                      location="http://a")
    write_warc_record(buf, "http://c", TS, b"gone", status=404)
    write_warc_record(buf, "http://d", TS, b"chunky body", chunked=True)
    buf.seek(0)
    got = {u: (s, loc, n) for u, _, s, _, loc, n in iter_fetch_log(buf)}
    assert got["http://a"] == (200, None, 15)
    assert got["http://b"] == (301, "http://a", 0)
    assert got["http://c"] == (404, None, 4)
    assert got["http://d"] == (200, None, len(b"chunky body"))


def test_default_writer_bytes_unchanged_for_page_readers():
    # status/location params must not disturb the historical default
    # record form the golden roundtrips pin
    buf = io.BytesIO()
    write_warc_record(buf, "http://a", TS, b"<html>x</html>")
    buf.seek(0)
    pages = list(iter_warc_pages(buf))
    assert pages == [("http://a", TS, b"<html>x</html>")]


def test_redirect_statuses_not_pages():
    # a 301 with an empty body is a fetch-log row, not a page
    buf = io.BytesIO()
    write_warc_record(buf, "http://b", TS, b"", status=301,
                      location="http://a")
    buf.seek(0)
    assert list(iter_warc_pages(buf)) == []
    buf.seek(0)
    assert len(list(iter_fetch_log(buf))) == 1


def test_warc_to_resolved_redirects_end_to_end(spark, tmp_path):
    # the full arc: archives -> fetch log -> edges -> final targets
    p = str(tmp_path / "crawl.warc.gz")
    with open(p, "wb") as fh:
        write_warc_record(fh, "http://old", TS, b"", status=301,
                          location="http://mid")
        write_warc_record(fh, "http://mid", TS, b"", status=302,
                          location="http://final")
        write_warc_record(fh, "http://final", TS, b"<html>home</html>")
        write_warc_record(fh, "http://loop1", TS, b"", status=308,
                          location="http://loop2")
        write_warc_record(fh, "http://loop2", TS, b"", status=308,
                          location="http://loop1")
    log = read_fetch_log(spark, [p])
    assert log.count() == 5
    edges = redirect_edges(log)
    out = {r["src"]: r for r in resolve_redirects(edges).collect()}
    assert out["http://old"]["final_url"] == "http://final"
    assert out["http://old"]["hops"] == 2
    assert out["http://loop1"]["status"] == "unresolved"


def test_redirect_edges_latest_fetch_wins(spark, tmp_path):
    p = str(tmp_path / "refetch.warc.gz")
    t2 = TS + datetime.timedelta(days=1)
    with open(p, "wb") as fh:
        write_warc_record(fh, "http://u", TS, b"", status=301,
                          location="http://first")
        write_warc_record(fh, "http://u", t2, b"", status=301,
                          location="http://second")
    edges = redirect_edges(read_fetch_log(spark, [p])).collect()
    assert [(e["src"], e["dst"]) for e in edges] == [
        ("http://u", "http://second")
    ]
