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


def _drain_sessions(spark, inbox, out, ckpt):
    from ocr_agent_spark.streaming.windows import session_window_counts

    stream = (
        spark.readStream.schema("ts timestamp, user_id long")
        .format("parquet").load(inbox)
    )
    q = (
        session_window_counts(stream, gap="10 minutes",
                              watermark="30 minutes")
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


def _write_user_events(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    schema = pa.schema(
        [("ts", pa.timestamp("us", tz="UTC")), ("user_id", pa.int64())]
    )
    pq.write_table(
        pa.Table.from_pydict(
            {"ts": [r[0] for r in rows], "user_id": [r[1] for r in rows]},
            schema=schema,
        ),
        path,
    )


def test_session_windows_merge_and_close_on_watermark(spark, tmp_path):
    inbox = str(tmp_path / "s_inbox")
    out = str(tmp_path / "s_out")
    ckpt = str(tmp_path / "s_ckpt")
    m = lambda minutes: BASE + dt.timedelta(minutes=minutes)

    # user 1: 0, 5, 8 min (one session, within 10-min gaps); user 2: 30.
    _write_user_events(f"{inbox}/b0.parquet",
                       [(m(0), 1), (m(5), 1), (m(8), 1), (m(30), 2)])
    assert _drain_sessions(spark, inbox, out, ckpt) == []

    # far-future event advances the watermark; both sessions close.
    _write_user_events(f"{inbox}/b1.parquet", [(m(300), 1)])
    rows = _drain_sessions(spark, inbox, out, ckpt)
    got = {(r["key"], r["n"]) for r in rows}
    assert got == {(1, 3), (2, 1)}
    sess1 = next(r for r in rows if r["key"] == 1)
    # session end = last event + gap
    assert sess1["session_start"] == m(0).replace(tzinfo=None) or \
        sess1["session_start"].replace(tzinfo=dt.timezone.utc) == m(0)
    assert (sess1["session_end"] - sess1["session_start"]) == \
        dt.timedelta(minutes=18)


def test_session_window_gap_boundary_agrees_with_batch(spark):
    """F.session_window merges an event exactly `gap` after the
    previous one (measured: touching windows DO merge), matching the
    batch sessionizer's strict-`>` split (functions/sessions.py); one
    microsecond past the gap splits in both. Pinned so the shared
    boundary contract is explicit."""
    from pyspark.sql import functions as F

    from ocr_agent_spark.functions.sessions import sessionize

    def native_sessions(df):
        return sorted(
            r["n"]
            for r in df.groupBy(
                F.session_window("ts", "10 minutes"), "user_id"
            ).agg(F.count(F.lit(1)).alias("n")).collect()
        )

    at_gap = spark.createDataFrame(
        [
            (0, dt.datetime(2024, 1, 1, 0, 0), 1, 1.0),
            (1, dt.datetime(2024, 1, 1, 0, 10), 1, 1.0),  # exactly gap
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    assert native_sessions(at_gap) == [2]  # one merged session
    assert {
        r["session_seq"] for r in sessionize(at_gap, gap_seconds=600)
        .collect()
    } == {1}

    past_gap = spark.createDataFrame(
        [
            (0, dt.datetime(2024, 1, 1, 0, 0), 1, 1.0),
            (1, dt.datetime(2024, 1, 1, 0, 10, 0, 1), 1, 1.0),  # gap + 1µs
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    assert native_sessions(past_gap) == [1, 1]  # split
    assert {
        r["session_seq"] for r in sessionize(past_gap, gap_seconds=600)
        .collect()
    } == {1, 2}
