"""Streaming exact dedup: within-watermark suppression + bounded state."""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_agent_spark.streaming.dedup import dedup_stream_exact

BASE = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
SCHEMA_DDL = "url string, warc_ts timestamp, text string"


def _write(path: str, rows: list[tuple[str, dt.datetime, str]]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("text", pa.string()),
    ])
    pq.write_table(
        pa.Table.from_pydict(
            {"url": [r[0] for r in rows], "warc_ts": [r[1] for r in rows],
             "text": [r[2] for r in rows]},
            schema=schema,
        ),
        path,
    )


def _drain(spark, inbox, out, ckpt):
    stream = spark.readStream.schema(SCHEMA_DDL).format("parquet").load(inbox)
    q = (
        dedup_stream_exact(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.exists(out):
        return []
    return spark.read.parquet(out).collect()


def test_streaming_dedup_suppresses_within_horizon(spark, tmp_path):
    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    m = lambda minutes: BASE + dt.timedelta(minutes=minutes)

    # batch 1: two distinct pages + an immediate duplicate of page A
    # (normalized: case/whitespace differences still count as dup)
    _write(f"{inbox}/b0.parquet", [
        ("https://a.example/1", m(0), "shared page body one"),
        ("https://mirror.example/1", m(5), "  SHARED   page body one "),
        ("https://b.example/2", m(1), "distinct page body two"),
    ])
    rows = _drain(spark, inbox, out, ckpt)
    assert len(rows) == 2
    assert {r["text"].strip().lower().split()[0] for r in rows} == {
        "shared", "distinct"
    }
    assert all(r["fingerprint"] for r in rows)

    # batch 2: another copy of page A inside the 1h horizon → suppressed;
    # a fresh page passes
    _write(f"{inbox}/b1.parquet", [
        ("https://c.example/1", m(30), "shared page body one"),
        ("https://d.example/3", m(31), "third page body"),
    ])
    rows = _drain(spark, inbox, out, ckpt)
    texts = sorted(r["text"] for r in rows)
    assert "third page body" in texts
    assert sum(1 for t in texts if "shared" in t.lower()) == 1  # still just one

    # batch 3: a copy far past the horizon is STILL suppressed, because
    # state eviction is batch-granular — the watermark that expires the
    # m(0) fingerprint is only established by the END of this batch
    # (31min−1h at its start)...
    _write(f"{inbox}/b2.parquet", [
        ("https://e.example/1", m(600), "shared page body one"),
    ])
    rows = _drain(spark, inbox, out, ckpt)
    assert sum(1 for r in rows if "shared" in r["text"].lower()) == 1

    # ...so the NEXT batch sees the state GC'd (watermark 600−60=540min
    # > the m(0) expiry) and re-admits the content: bounded state, not
    # dedup-forever. All-time uniqueness belongs to the batch tier over
    # commits.
    _write(f"{inbox}/b3.parquet", [
        ("https://f.example/1", m(700), "shared page body one"),
    ])
    rows = _drain(spark, inbox, out, ckpt)
    assert sum(1 for r in rows if "shared" in r["text"].lower()) == 2

    # batch-tier parity: streamed fingerprints equal the batch column
    from ocr_agent_spark.functions.text import doc_fingerprint
    import pyspark.sql.functions as F

    batch = spark.read.parquet(out).withColumn(
        "_fp2", doc_fingerprint("text")
    )
    assert batch.filter(F.col("fingerprint") != F.col("_fp2")).count() == 0
