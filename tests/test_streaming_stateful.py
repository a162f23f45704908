"""Stateful streaming: per-host running totals survive across drains."""

from ocr_agent_spark.fixtures import generate_pages
from ocr_agent_spark.fixtures import PAGES_ARROW_SCHEMA_DDL
from ocr_agent_spark.streaming.stateful import running_host_totals
from tests.test_streaming import _write_batch


def _drain(spark, inbox, out, ckpt):
    stream = (
        spark.readStream.schema(PAGES_ARROW_SCHEMA_DDL).format("parquet").load(inbox)
    )
    # Update output mode requires a sink that accepts upserts; for the
    # test we append each update batch to parquet via foreachBatch (the
    # standard pattern for update-mode → file sink).
    def sink(batch_df, _batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        running_host_totals(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def test_running_totals_accumulate_across_drains(spark, tmp_path):
    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    records = generate_pages(60)

    _write_batch(f"{inbox}/b0.parquet", records[:30])
    _drain(spark, inbox, out, ckpt)

    _write_batch(f"{inbox}/b1.parquet", records[30:])
    totals = _drain(spark, inbox, out, ckpt)

    # Latest emitted row per host == totals over the FULL corpus —
    # proof that GroupState persisted across the two drains.
    import collections

    expected = collections.Counter()
    expected_bytes = collections.Counter()
    for r in records:
        host = r.url.split("//")[1].split("/")[0]
        expected[host] += 1
        expected_bytes[host] += len(r.html)

    latest = {}
    for row in totals.collect():
        prev = latest.get(row["host"])
        if prev is None or row["total_docs"] > prev[0]:
            latest[row["host"]] = (row["total_docs"], row["total_bytes"])
    assert {h: v[0] for h, v in latest.items()} == dict(expected)
    assert {h: v[1] for h, v in latest.items()} == dict(expected_bytes)
