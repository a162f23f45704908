"""Event-time windowed aggregations with watermarks (ST6 gap-fill).

The reference has no event-time semantics (SURVEY §2.9: ST6 absent);
these are the Spark built-ins a web-scale ingest pipeline needs for
late data: tumbling windows + watermark (append mode emits a window
only once it can no longer receive late rows) and session windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling event-time counts; rows later than ``watermark`` behind
    the max seen event time are dropped, and in append mode a window is
    emitted exactly once, after it closes."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "key",
            "n",
        )
    )


def session_window_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Session windows: a session extends while events arrive within
    ``gap`` of each other; closes after the gap + watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "key",
            "n",
        )
    )
