"""Gap-based batch sessionization (functions/sessions.py)."""

import datetime as dt

import pytest

from ocr_agent_spark.functions.sessions import (
    session_stats, sessionize, sessionize_stats,
)


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def events(spark):
    # user 1: three events 10s apart (one session), then a 40-min gap,
    # then two more (second session). user 2: single event.
    rows = [
        (0, _ts(0, 0), 1, 1.25),
        (1, _ts(0, 10), 1, 2.50),
        (2, _ts(0, 20), 1, 0.25),
        (3, _ts(40, 20), 1, 10.00),
        (4, _ts(40, 30), 1, 0.50),
        (5, _ts(5, 0), 2, 3.75),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_session_boundaries(spark, events):
    tagged = sessionize(events, gap_seconds=1800)
    got = {r["event_id"]: r["session_seq"] for r in tagged.collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_gap_exactly_at_threshold_stays_in_session(spark, events):
    # event 3 is 2400s after event 2: with gap=2400 it does NOT split
    # (strict '>' contract).
    tagged = sessionize(events, gap_seconds=2400)
    got = {r["event_id"]: r["session_seq"] for r in tagged.collect()}
    assert got[3] == 1 and got[4] == 1


def test_session_stats_exact_sums(spark, events):
    stats = session_stats(sessionize(events, gap_seconds=1800))
    rows = {(r["user_id"], r["session_seq"]): r for r in stats.collect()}
    s1 = rows[(1, 1)]
    assert s1["n_events"] == 3
    assert s1["value_sum"] == pytest.approx(4.00)
    assert s1["duration_sec"] == pytest.approx(20.0)
    s2 = rows[(1, 2)]
    assert s2["n_events"] == 2 and s2["value_sum"] == pytest.approx(10.50)
    assert rows[(2, 1)]["n_events"] == 1
    assert rows[(2, 1)]["duration_sec"] == 0.0


def test_timestamp_ties_break_on_event_id(spark):
    rows = [(10, _ts(0), 7, 1.0), (11, _ts(0), 7, 1.0),
            (12, _ts(59), 7, 1.0)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    tagged = sessionize(df, gap_seconds=30)
    got = {r["event_id"]: r["session_seq"] for r in tagged.collect()}
    # ties share a session; the 59s event opens a new one
    assert got == {10: 1, 11: 1, 12: 2}


def test_one_shot_wrapper_matches_composition(spark, events):
    a = sessionize_stats(events, gap_seconds=1800).collect()
    b = session_stats(sessionize(events, gap_seconds=1800)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_single_window_plan(spark, events):
    # both the lag flag and the running sum must share one Exchange +
    # one Sort (same window spec) — the minimum for an order-dependent
    # operator.
    plan = sessionize(events, gap_seconds=60)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") <= 2  # 1 window shuffle (+AQE read)
    assert "Python" not in plan


def _grouping(rows):
    """session_seq-invariant grouping: frozenset of event-id frozensets."""
    by_session = {}
    for r in rows:
        by_session.setdefault((r["user_id"], r["session_seq"]), set()).add(
            r["event_id"]
        )
    return frozenset(frozenset(v) for v in by_session.values())


def test_bucketed_matches_plain_randomized(spark):
    # 400 events across 3 users with gaps straddling bucket seams —
    # fixed-seed randomized differential against the single-window path.
    import random

    rng = random.Random(20260817)
    rows = []
    eid = 0
    for user in (1, 2, 3):
        t = 0.0
        for _ in range(130):
            t += rng.choice([5, 30, 299, 301, 3600, 90000])
            rows.append(
                (eid, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t),
                 user, 1.0)
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    from ocr_agent_spark.functions.sessions import sessionize_bucketed

    plain = sessionize(df, gap_seconds=300).collect()
    buck = sessionize_bucketed(
        df, gap_seconds=300, bucket_seconds=3600
    ).collect()
    assert _grouping(plain) == _grouping(buck)
    # and the seq NUMBERING matches too, not just the grouping
    assert {r["event_id"]: r["session_seq"] for r in plain} == {
        r["event_id"]: r["session_seq"] for r in buck
    }


def test_bucketed_merges_chain_across_buckets(spark):
    # one session spanning 4 hourly buckets: events every 30 min
    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=30 * i),
         1, 1.0)
        for i in range(8)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    from ocr_agent_spark.functions.sessions import sessionize_bucketed

    got = sessionize_bucketed(
        df, gap_seconds=1800, bucket_seconds=3600
    ).collect()
    assert {r["session_seq"] for r in got} == {1}


def test_bucketed_rejects_bucket_smaller_than_gap(spark):
    df = spark.createDataFrame(
        [(0, _ts(0), 1, 1.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    from ocr_agent_spark.functions.sessions import sessionize_bucketed

    with pytest.raises(ValueError):
        sessionize_bucketed(df, gap_seconds=3600, bucket_seconds=60)


def test_bucketed_phase1_partitions_on_bucket(spark):
    # the scale property: the event-level window must partition on
    # (user, bucket), never on user alone.
    df = spark.createDataFrame(
        [(0, _ts(0), 1, 1.0), (1, _ts(1), 1, 1.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    from ocr_agent_spark.functions.sessions import sessionize_bucketed

    plan = sessionize_bucketed(df)._jdf.queryExecution() \
        .executedPlan().toString()
    import re

    event_windows = [
        ln for ln in plan.splitlines()
        if "Window" in ln and "_local_seq" in ln
    ]
    assert event_windows, plan
    assert all(
        re.search(r"partitionbyspec.*_bucket|_bucket.*user_id", ln)
        or "_bucket" in ln
        for ln in event_windows
    )
