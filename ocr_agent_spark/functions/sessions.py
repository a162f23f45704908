"""Gap-based batch sessionization over an event log.

The classic clickstream operator (reference analogue: the reference's
job/run grouping of task events — ``/root/reference/src/ocr_agent/
state_db.py`` groups rows into runs; here generalized to the standard
web-analytics form): order each user's events by time, start a new
session whenever the gap to the previous event exceeds ``gap``;
sessions then aggregate to one row each.

Spark-first shape:

- ONE window pass ``partitionBy(user).orderBy(ts, id)`` computes the
  lag-gap flag and the running session sequence (``sum`` of flags over
  the same window spec reuses the same sort — Catalyst plans a single
  Exchange + Sort for both).
- Session aggregation is a plain ``groupBy(user, session_seq)`` —
  partial aggregation applies, and AQE coalesces the post-shuffle
  partitions.
- Event values aggregate in FIXED-POINT cents (``round(value·100)`` →
  BIGINT sum) so the distributed sum is exact integer arithmetic and
  replay order can never flip a rounded float (same rule as
  ``qualityclf.hash_weights``).

Scale notes (100 TB): the default path's per-user window is bounded by
the busiest user's event count — real clickstreams have bot/mega
users. :func:`sessionize_bucketed` closes that hazard (same pattern as
the frontier mega-host pre-cap, ``functions/frontier.py``): windows on
``(user, time-bucket)`` plus an exact boundary-merge pass whose per-
user row count is bounded by wall-clock, not event volume. The default
path stays single-window because one Exchange + one Sort is the
minimum any order-dependent sessionizer can pay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Tag every event with its 1-based per-user ``session_seq``.

    A new session starts when the event is the user's first or arrives
    more than ``gap_seconds`` after the previous event. Ties on the
    timestamp break on ``id_col`` so the assignment is deterministic.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    # Parquet event logs read as TIMESTAMP_NTZ, which has no direct
    # numeric cast in Spark 4; hop through TIMESTAMP (exact micros with
    # the UTC session default — and the gap is a difference, so any
    # fixed offset cancels).
    secs = F.col(ts_col).cast("timestamp").cast("double")
    prev_ts = F.lag(ts_col).over(w)
    prev_secs = prev_ts.cast("timestamp").cast("double")
    # Window functions can't nest, so the flag materializes in its own
    # projection; both windows share the spec, so Catalyst plans ONE
    # Exchange + Sort for the pair (asserted in tests/test_sessions.py).
    flagged = events.withColumn(
        "_new_session",
        F.when(
            prev_ts.isNull()
            | (secs - prev_secs > F.lit(float(gap_seconds))),
            1,
        ).otherwise(0),
    )
    return flagged.withColumn(
        "session_seq",
        F.sum("_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("_new_session")


def sessionize_bucketed(
    events: DataFrame,
    gap_seconds: int = 1800,
    bucket_seconds: int = 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Mega-user-safe sessionization: same output as :func:`sessionize`
    (identical session GROUPING; the per-user ``session_seq`` numbers
    sessions in time order exactly like the single-window path), but no
    task ever sorts one user's full history.

    Phase 1 windows partition on ``(user, time-bucket)`` — a bot user
    emitting continuously contributes at most one bucket of rows per
    task. Phase 2 repairs bucket-boundary splits: with
    ``bucket_seconds >= gap_seconds``, a cross-bucket merge can only
    join the LAST local session of one bucket to the FIRST of the next
    non-empty bucket (an intervening empty bucket implies a gap >
    bucket_seconds >= gap). Local sessions aggregate to one row each
    (min/max ts), so the phase-2 per-user window is bounded by the
    user's LOCAL SESSION count — bounded by wall-clock, not event
    volume: every local session except a bucket's last is followed by
    more than ``gap`` seconds of silence, so phase-2 rows per user <=
    timespan/gap + bucket count (gap 1800 + day buckets: ~17.6k narrow
    rows per user-YEAR at ANY event rate). The same hazard/mitigation
    pattern as the frontier mega-host pre-cap (functions/frontier.py).
    """
    if bucket_seconds < gap_seconds:
        raise ValueError(
            "bucket_seconds must be >= gap_seconds: an empty bucket "
            "must imply a session break"
        )
    secs = F.col(ts_col).cast("timestamp").cast("double")
    bucketed = events.withColumn(
        "_bucket", F.floor(secs / F.lit(float(bucket_seconds)))
    )
    # phase 1: local sessionize, window bounded by one (user, bucket)
    w1 = Window.partitionBy(user_col, "_bucket").orderBy(ts_col, id_col)
    prev = F.lag(ts_col).over(w1)
    flagged = bucketed.withColumn(
        "_new_local",
        F.when(
            prev.isNull()
            | (secs - prev.cast("timestamp").cast("double")
               > F.lit(float(gap_seconds))),
            1,
        ).otherwise(0),
    )
    local = flagged.withColumn(
        "_local_seq",
        F.sum("_new_local").over(
            w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("_new_local")
    # phase 2: one row per local session; merge across bucket seams.
    reps = local.groupBy(user_col, "_bucket", "_local_seq").agg(
        F.min(ts_col).alias("_start"), F.max(ts_col).alias("_end")
    )
    w2 = Window.partitionBy(user_col).orderBy("_start", "_bucket",
                                              "_local_seq")
    prev_end = F.lag("_end").over(w2)
    merged = reps.withColumn(
        "_new_global",
        F.when(
            prev_end.isNull()
            | (F.col("_start").cast("timestamp").cast("double")
               - prev_end.cast("timestamp").cast("double")
               > F.lit(float(gap_seconds))),
            1,
        ).otherwise(0),
    ).withColumn(
        "session_seq",
        F.sum("_new_global").over(
            w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).select(user_col, "_bucket", "_local_seq", "session_seq")
    return (
        local.join(merged, [user_col, "_bucket", "_local_seq"])
        .drop("_bucket", "_local_seq")
    )


def session_stats(
    sessionized: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One row per (user, session): counts, bounds, duration, exact sum.

    ``value_sum`` goes through integer cents (``round(value·100)`` per
    event, BIGINT sum, one final division) — commutative-exact, so the
    shuffle's aggregation order is irrelevant.
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (
        sessionized.groupBy(user_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.sum(cents).alias("_cents"),
        )
        .select(
            user_col,
            "session_seq",
            "n_events",
            "session_start",
            "session_end",
            F.round(
                F.col("session_end").cast("timestamp").cast("double")
                - F.col("session_start").cast("timestamp").cast("double"),
                3,
            ).alias("duration_sec"),
            (F.col("_cents") / 100.0).alias("value_sum"),
        )
    )


def sessionize_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """``sessionize`` → ``session_stats`` in one call (the query shape)."""
    return session_stats(
        sessionize(events, gap_seconds, user_col, ts_col, id_col),
        user_col,
        ts_col,
        value_col,
    )
