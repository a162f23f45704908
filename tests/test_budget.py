"""Largest-remainder crawl-budget apportionment (functions/budget.py)."""

import random

import pytest

from ocr_agent_spark.functions.budget import allocate_budget


def _hosts(spark, pairs):
    return spark.createDataFrame(pairs, "host string, weight double")


def _reference(pairs, budget):
    """Driver-side Hamilton apportionment with the same quantization."""
    w = {h: (round(x * 1e6) if x > 0 else 0) for h, x in pairs}
    tot = sum(w.values())
    if tot == 0:
        return {h: 0 for h, _ in pairs}
    base = {h: (budget * wm) // tot for h, wm in w.items()}
    rem = {h: (budget * wm) % tot for h, wm in w.items()}
    leftover = budget - sum(base.values())
    order = sorted(w, key=lambda h: (-rem[h], h))
    extras = set(order[:leftover])
    return {h: base[h] + (1 if h in extras else 0) for h in w}


def test_hand_case(spark):
    pairs = [("a", 0.5), ("b", 0.3), ("c", 0.2)]
    got = {
        r["host"]: r["allocation"]
        for r in allocate_budget(_hosts(spark, pairs), 10).collect()
    }
    assert got == {"a": 5, "b": 3, "c": 2}
    assert sum(got.values()) == 10


def test_leftover_goes_to_largest_remainders(spark):
    # ideal shares: 3.33.. each → bases 3,3,3, leftover 1 goes to the
    # largest remainder; all equal → tie-break host asc
    pairs = [("x", 1.0), ("y", 1.0), ("z", 1.0)]
    got = {
        r["host"]: r["allocation"]
        for r in allocate_budget(_hosts(spark, pairs), 10).collect()
    }
    assert sum(got.values()) == 10
    assert got == {"x": 4, "y": 3, "z": 3}


def test_zero_and_negative_weights_get_nothing(spark):
    pairs = [("a", 2.0), ("b", 0.0), ("c", -1.0)]
    got = {
        r["host"]: r["allocation"]
        for r in allocate_budget(_hosts(spark, pairs), 7).collect()
    }
    assert got == {"a": 7, "b": 0, "c": 0}


def test_leftover_zero_exact_division(spark):
    pairs = [("a", 1.0), ("b", 1.0)]
    got = {
        r["host"]: (r["base"], r["extra"], r["allocation"])
        for r in allocate_budget(_hosts(spark, pairs), 8).collect()
    }
    assert got == {"a": (4, 0, 4), "b": (4, 0, 4)}


def test_matches_reference_randomized(spark):
    rng = random.Random(20260817)
    pairs = [
        (f"h{i:03d}", round(rng.uniform(0.0, 5.0), 3)) for i in range(120)
    ]
    budget = 1000
    expected = _reference(pairs, budget)
    got = {
        r["host"]: r["allocation"]
        for r in allocate_budget(
            _hosts(spark, pairs), budget, n_buckets=16
        ).collect()
    }
    assert got == expected
    assert sum(got.values()) == budget
    # within-1 of ideal share for every host
    tot = sum(round(x * 1e6) for _, x in pairs if x > 0)
    for h, x in pairs:
        ideal = budget * (round(x * 1e6) if x > 0 else 0) / tot
        assert abs(got[h] - ideal) < 1.0 + 1e-9


def test_small_bucket_count_still_exact(spark):
    # n_buckets=1 forces EVERYTHING through the boundary-bucket exact
    # rank — the histogram shortcut must be a pure optimization
    pairs = [("a", 0.7), ("b", 0.7), ("c", 0.31), ("d", 0.29)]
    budget = 7
    expected = _reference(pairs, budget)
    got = {
        r["host"]: r["allocation"]
        for r in allocate_budget(
            _hosts(spark, pairs), budget, n_buckets=1
        ).collect()
    }
    assert got == expected


def test_rank_window_partitions_on_bucket(spark):
    plan = allocate_budget(
        _hosts(spark, [("a", 1.0), ("b", 2.0)]), 5
    )._jdf.queryExecution().executedPlan().toString()
    # the per-host exact rank must partition on the bucket id — a
    # global (unpartitioned) host sort would be the mega-scale hazard
    assert "_bkt" in plan
    for ln in plan.splitlines():
        if "row_number" in ln and "_rn" in ln:
            assert "_bkt" in ln, ln


def test_validation(spark):
    with pytest.raises(ValueError):
        allocate_budget(_hosts(spark, [("a", 1.0)]), -1)


def test_composes_with_host_quality_priors(spark):
    """The intended pipeline: per-host quality priors → budget."""
    from ocr_agent_spark.functions.webquality import host_quality_priors

    good = ("the data and that rows be to of scans with tables " * 3).strip()
    docs = spark.createDataFrame(
        [(0, good, "a.com"), (1, good, "a.com"), (2, good, "b.com"),
         (3, "### ###", "c.com")],
        "doc_id long, text string, host string",
    )
    priors = host_quality_priors(docs, min_words=10)
    from pyspark.sql import functions as F

    weighted = priors.select(
        "host", (F.col("keep_rate") * F.col("n_docs")).alias("weight")
    )
    got = {
        r["host"]: r["allocation"]
        for r in allocate_budget(weighted, 9).collect()
    }
    assert sum(got.values()) == 9
    assert got["c.com"] == 0          # all-fail host starved
    assert got["a.com"] == 2 * got["b.com"]  # proportional to kept docs
