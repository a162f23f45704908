"""Watermarked windowed aggregation: append-mode close + late-drop."""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_agent_spark.streaming.windows import tumbling_window_counts

BASE = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

EVENT_SCHEMA_DDL = "ts timestamp, event_type string"


def _write_events(path: str, rows: list[tuple[dt.datetime, str]]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    schema = pa.schema(
        [("ts", pa.timestamp("us", tz="UTC")), ("event_type", pa.string())]
    )
    pq.write_table(
        pa.Table.from_pydict(
            {"ts": [r[0] for r in rows], "event_type": [r[1] for r in rows]},
            schema=schema,
        ),
        path,
    )


def _drain(spark, inbox, out, ckpt):
    stream = spark.readStream.schema(EVENT_SCHEMA_DDL).format("parquet").load(inbox)
    q = (
        tumbling_window_counts(stream)
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


def test_append_mode_emits_closed_windows_and_drops_late(spark, tmp_path):
    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    h = lambda hours, minutes=0: BASE + dt.timedelta(hours=hours, minutes=minutes)

    # Batch 1: two events in hour 0, one in hour 1.
    _write_events(f"{inbox}/b0.parquet", [(h(0, 5), "click"), (h(0, 40), "click"),
                                          (h(1, 10), "view")])
    rows = _drain(spark, inbox, out, ckpt)
    # Nothing can be emitted yet: watermark hasn't passed any window end.
    assert rows == []

    # Batch 2: an event far in the future (hour 5) advances the
    # watermark past windows 0 and 1 — they close and are emitted.
    # (The watermark used by a batch comes from the PREVIOUS batch's
    # max event time, so the advance takes effect at batch end.)
    _write_events(f"{inbox}/b1.parquet", [(h(5), "click")])
    rows = _drain(spark, inbox, out, ckpt)
    emitted = {(r["window_start"].hour, r["key"]): r["n"] for r in rows}
    assert emitted[(0, "click")] == 2
    assert emitted[(1, "view")] == 1
    assert (5, "click") not in emitted  # hour-5 window still open

    # Batch 3: a LATE click back in hour 0 — now below the watermark
    # (04:30) — must be dropped; the closed window is never re-emitted.
    _write_events(f"{inbox}/b2.parquet", [(h(0, 50), "click")])
    rows = _drain(spark, inbox, out, ckpt)
    emitted = {(r["window_start"].hour, r["key"]): r["n"] for r in rows}
    assert emitted[(0, "click")] == 2  # unchanged — late row dropped
