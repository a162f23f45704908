"""As-of join: semantics + edge cases of the union+window encoding."""

import datetime as dt

from ocr_agent_spark.functions.asof import asof_join

BASE = dt.datetime(2026, 1, 1)


def _ts(minutes):
    return BASE + dt.timedelta(minutes=minutes)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts(5)),    # before any right row → NULL
            (2, 10, _ts(15)),   # after r@10 → 100.0
            (3, 10, _ts(30)),   # exact-ts match with r@30 → 300.0
            (4, 10, _ts(99)),   # latest prior is r@30 → 300.0
            (5, 20, _ts(50)),   # other key → 555.0
            (6, 30, _ts(50)),   # key with no right rows at all → NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts(10), 100.0),
            (10, _ts(30), 300.0),
            (20, _ts(1), 555.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r["value_asof"]
        for r in asof_join(left, right, ["user_id"], "ts", ["value"]).collect()
    }
    assert out == {1: None, 2: 100.0, 3: 300.0, 4: 300.0, 5: 555.0, 6: None}


def test_asof_join_matches_bruteforce_on_random_data(spark):
    """Randomized cross-check vs a per-row python brute force."""
    import random

    rng = random.Random("asof:1")
    left_rows = [
        (i, rng.randrange(5), _ts(rng.randrange(0, 500)))
        for i in range(120)
    ]
    right_rows = [
        (rng.randrange(5), _ts(rng.randrange(0, 500)), float(i))
        for i in range(80)
    ]
    # de-dup right (key, ts) so the expected value is unique
    seen = {}
    for k, t, v in right_rows:
        seen[(k, t)] = v
    right_rows = [(k, t, v) for (k, t), v in seen.items()]

    left = spark.createDataFrame(left_rows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(right_rows, "user_id long, ts timestamp, value double")

    got = {
        r["event_id"]: r["value_asof"]
        for r in asof_join(left, right, ["user_id"], "ts", ["value"]).collect()
    }

    for event_id, key, lts in left_rows:
        prior = [(t, v) for (k, t, v) in right_rows if k == key and t <= lts]
        expected = max(prior)[1] if prior else None
        assert got[event_id] == expected, (event_id, key, lts)


def test_asof_join_keeps_all_left_rows_and_columns(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5), "extra")],
        "event_id long, user_id long, ts timestamp, note string",
    )
    right = spark.createDataFrame([], "user_id long, ts timestamp, value double")
    rows = asof_join(left, right, ["user_id"], "ts", ["value"]).collect()
    assert len(rows) == 1
    assert rows[0]["note"] == "extra"
    assert rows[0]["value_asof"] is None
