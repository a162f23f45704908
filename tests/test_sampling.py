"""Deterministic sampling / mixing / splitting (functions/sampling.py)."""

import pyspark.sql.functions as F
import pytest

from ocr_agent_spark.functions import sampling


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, ["cc", "books", "code"][i % 3]) for i in range(3000)]
    return spark.createDataFrame(rows, "doc_id long, source string").persist()


def test_uniform_matches_python_md5(spark, corpus):
    import hashlib

    rows = corpus.select(
        "doc_id", sampling.deterministic_uniform("doc_id", "s1").alias("u")
    ).collect()
    for r in rows[:50]:
        h = hashlib.md5(f"s1:{r['doc_id']}".encode()).hexdigest()[:8]
        assert r["u"] == pytest.approx(int(h, 16) / 2**32, abs=1e-12)
    assert all(0.0 <= r["u"] < 1.0 for r in rows)


def test_sample_fraction_deterministic_and_calibrated(spark, corpus):
    a = {r["doc_id"] for r in sampling.sample_fraction(corpus, 0.3).collect()}
    b = {r["doc_id"] for r in sampling.sample_fraction(corpus, 0.3).collect()}
    assert a == b                                  # rerun-stable
    assert 0.25 < len(a) / 3000 < 0.35             # ±5pp at n=3000
    # nesting: a 0.1 sample is a SUBSET of the 0.3 sample (same seed)
    c = {r["doc_id"] for r in sampling.sample_fraction(corpus, 0.1).collect()}
    assert c <= a
    # different seed decorrelates
    d = {r["doc_id"] for r in
         sampling.sample_fraction(corpus, 0.3, seed="other").collect()}
    assert d != a


def test_stratified_mixing(spark, corpus):
    mixed = sampling.stratified_sample(
        corpus, {"books": 1.0, "cc": 0.2}, strata_col="source"
    )
    counts = {r["source"]: r["n"] for r in
              mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["books"] == 1000                 # keep all
    assert 140 < counts["cc"] < 260                # ~20%
    assert "code" not in counts                    # unlisted → dropped


def test_split_disjoint_exhaustive_stable(spark, corpus):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = sampling.split_dataset(corpus, w)
    s2 = sampling.split_dataset(corpus, w)
    a = {(r["doc_id"], r["split"]) for r in s1.collect()}
    assert a == {(r["doc_id"], r["split"]) for r in s2.collect()}
    counts = {r["split"]: r["n"] for r in
              s1.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 3000            # exhaustive
    assert set(counts) == {"train", "val", "test"} # all splits hit
    assert counts["train"] > 2200
    assert 200 < counts["val"] + counts["test"] < 800


def test_sampling_plans_stay_jvm(spark, corpus):
    for df in (
        sampling.sample_fraction(corpus, 0.5),
        sampling.stratified_sample(corpus, {"cc": 0.5}, strata_col="source"),
        sampling.split_dataset(corpus, {"a": 0.5, "b": 0.5}),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Exchange" not in plan              # pure projection/filter

def test_split_weight_validation(spark, corpus):
    """Bad weights fail loudly instead of breaking the disjoint /
    exhaustive contract (advice r5)."""
    for bad in ({}, {"a": 0.0, "b": 0.0}, {"a": -0.5, "b": 1.5}):
        with pytest.raises(ValueError):
            sampling.split_column("doc_id", bad)
    # valid weights still fine
    sampling.split_column("doc_id", {"train": 1.0})


def test_corpus_shuffle_deterministic_and_layout_independent(spark, corpus):
    a = [r["doc_id"] for r in sampling.corpus_shuffle(corpus).collect()]
    b = [r["doc_id"] for r in
         sampling.corpus_shuffle(corpus.repartition(7)).collect()]
    assert a == b                      # permutation follows rows, not layout
    assert a != sorted(a)              # actually decorrelated from id order
    assert sorted(a) == sorted(set(a))  # a total permutation


def test_shard_assign_balanced_and_validated(spark, corpus):
    out = sampling.shard_assign(corpus, n_shards=8)
    counts = {r["shard"]: r["cnt"] for r in
              out.groupBy("shard").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) == set(range(8))
    mean = sum(counts.values()) / 8
    assert all(0.5 * mean < c < 1.5 * mean for c in counts.values())
    with pytest.raises(ValueError):
        sampling.shard_assign(corpus, n_shards=0)


def test_shard_matches_shuffle_key_prefix(spark, corpus):
    row = sampling.shard_assign(corpus, n_shards=8).limit(20).collect()
    for r in row:
        assert r["shard"] == int(r["shuffle_key"][:8], 16) % 8
