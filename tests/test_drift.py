"""Corpus token drift (functions/drift.py)."""

import math

from pyspark.sql import functions as F

from ocr_agent_spark.functions.drift import (
    token_drift,
    token_drift_summary,
)


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_identical_corpora_zero_divergence(spark):
    docs = _docs(spark, ["a b c", "c d"])
    s = token_drift_summary(token_drift(docs, docs))
    assert s["js_divergence"] == 0.0


def test_disjoint_corpora_max_divergence(spark):
    old = _docs(spark, ["a a b"])
    new = _docs(spark, ["x y z"])
    s = token_drift_summary(token_drift(old, new))
    assert abs(s["js_divergence"] - math.log(2)) < 1e-6


def test_known_divergence_value(spark):
    # old: a only; new: a,b equally. P=(1,0) Q=(.5,.5) M=(.75,.25)
    old = _docs(spark, ["a a"])
    new = _docs(spark, ["a b"])
    want = 0.5 * (1.0 * math.log(1 / 0.75)) + 0.5 * (
        0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
    )
    s = token_drift_summary(token_drift(old, new))
    assert abs(s["js_divergence"] - want) < 1e-6


def test_symmetry(spark):
    a = _docs(spark, ["a a b c", "d"])
    b = _docs(spark, ["a b b", "e e"])
    ab = token_drift_summary(token_drift(a, b))["js_divergence"]
    ba = token_drift_summary(token_drift(b, a))["js_divergence"]
    assert abs(ab - ba) < 1e-9


def test_drift_table_flags_the_right_tokens(spark):
    old = _docs(spark, ["the cat sat", "the dog sat"])
    new = _docs(spark, ["the cat sat", "the spam spam spam"])
    rows = {r["token"]: r for r in token_drift(old, new).collect()}
    assert rows["spam"]["n_old"] == 0 and rows["spam"]["n_new"] == 3
    top = token_drift_summary(token_drift(old, new), top_k=1)
    assert top["top_tokens"][0][0] == "spam"


def test_case_and_whitespace_normalization(spark):
    old = _docs(spark, ["The  CAT"])
    new = _docs(spark, ["the cat"])
    s = token_drift_summary(token_drift(old, new))
    assert s["js_divergence"] == 0.0
