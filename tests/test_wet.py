"""WET sidecar export/ingest (kernel + sources/warc.py)."""

import datetime
import gzip
import io
import os

from pyspark.sql import functions as F

from ocr_agent_spark.kernel.warcfile import (
    iter_warc_records,
    iter_wet_texts,
    write_warc_record,
    write_wet_record,
)
from ocr_agent_spark.sources.warc import read_wet, write_wet_shards

UTC = datetime.timezone.utc
TS = datetime.datetime(2026, 3, 1, 12, 0, 0, tzinfo=UTC)


def test_kernel_roundtrip_unicode_and_empty():
    buf = io.BytesIO()
    texts = ["héllo — wörld", "", "line1\nline2\n", "日本語 text"]
    for i, t in enumerate(texts):
        write_wet_record(buf, f"wet://u/{i}", TS, t)
    buf.seek(0)
    got = list(iter_wet_texts(buf))
    assert [g[2] for g in got] == texts
    assert all(g[1] == TS for g in got)
    assert [g[0] for g in got] == [f"wet://u/{i}" for i in range(4)]


def test_records_are_independent_gzip_members():
    buf = io.BytesIO()
    write_wet_record(buf, "wet://a", TS, "first")
    first_len = buf.tell()
    write_wet_record(buf, "wet://b", TS, "second")
    raw = buf.getvalue()
    # decompressing ONLY the first member yields only the first record
    rec = gzip.decompress(raw[:first_len])
    got = list(iter_wet_texts(io.BytesIO(rec)))
    assert [(g[0], g[2]) for g in got] == [("wet://a", "first")]


def test_mixed_archive_skips_non_conversion():
    buf = io.BytesIO()
    write_warc_record(buf, "http://resp", TS, b"<html>x</html>")
    write_wet_record(buf, "wet://conv", TS, "converted text")
    buf.seek(0)
    got = list(iter_wet_texts(buf))
    assert [(g[0], g[2]) for g in got] == [("wet://conv", "converted text")]
    buf.seek(0)
    assert len(list(iter_warc_records(buf))) == 2


def test_sharded_export_roundtrip(spark, tmp_path):
    rows = [(f"wet://doc/{i}", TS, f"text {i} — ünïcode") for i in range(57)]
    docs = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string"
    )
    out = str(tmp_path / "wet")
    manifest = write_wet_shards(docs, out, num_partitions=4).collect()
    assert sum(m["n_records"] for m in manifest) == 57
    for m in manifest:
        assert os.path.getsize(m["path"]) == m["n_bytes"] > 0
        assert not m["path"].endswith(".tmp")
    paths = [m["path"] for m in manifest]
    back = read_wet(spark, paths)
    got = {r["url"]: r["text"] for r in back.collect()}
    assert got == {u: t for u, _, t in rows}
    ts = back.select(F.min("warc_ts"), F.max("warc_ts")).collect()[0]
    assert ts[0] == ts[1] == TS.replace(tzinfo=None)


def test_shard_writer_no_torn_files(spark, tmp_path):
    docs = spark.createDataFrame(
        [(f"u{i}", TS, "t") for i in range(8)],
        "url string, warc_ts timestamp, text string",
    )
    out = str(tmp_path / "wet2")
    write_wet_shards(docs, out, num_partitions=2).collect()
    leftovers = [f for f in os.listdir(out) if ".tmp" in f]
    assert leftovers == []


def test_empty_partitions_yield_no_shards(spark, tmp_path):
    docs = spark.createDataFrame(
        [("u1", TS, "only row")], "url string, warc_ts timestamp, text string"
    )
    out = str(tmp_path / "wet3")
    manifest = write_wet_shards(docs, out, num_partitions=8).collect()
    assert len(manifest) == 1  # 7 empty partitions wrote nothing
    assert sorted(os.listdir(out)) == [
        os.path.basename(manifest[0]["path"])
    ]
