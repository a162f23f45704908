"""Extraction QA scoring (functions/extracteval.py)."""

from pyspark.sql import functions as F

from ocr_agent_spark.functions.extracteval import (
    extraction_eval,
    extraction_eval_summary,
)


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, extracted string, golden string"
    )


def test_exact_match_scores_perfect(spark):
    out = extraction_eval(
        _pairs(spark, [(1, "the main content", "the main content")])
    ).collect()[0]
    assert out["exact"] and out["precision"] == out["recall"] == 1.0
    assert out["f1"] == 1.0 and out["n_common"] == 3


def test_truncation_hits_recall_not_precision(spark):
    out = extraction_eval(
        _pairs(spark, [(1, "alpha beta", "alpha beta gamma delta")])
    ).collect()[0]
    assert not out["exact"]
    assert out["precision"] == 1.0 and out["recall"] == 0.5


def test_boilerplate_hits_precision_not_recall(spark):
    out = extraction_eval(
        _pairs(spark, [(1, "alpha beta cookie nav", "alpha beta")])
    ).collect()[0]
    assert out["precision"] == 0.5 and out["recall"] == 1.0
    assert round(out["f1"], 6) == round(2 * 0.5 / 1.5, 6)


def test_empty_cases(spark):
    rows = [
        (1, "", ""),          # both empty: perfect
        (2, "", "gold text"),  # lost everything
        (3, "junk stuff", ""),  # hallucinated extraction
    ]
    got = {r["doc_id"]: r for r in extraction_eval(_pairs(spark, rows)).collect()}
    assert got[1]["exact"] and got[1]["precision"] == got[1]["recall"] == 1.0
    assert got[2]["precision"] == 0.0 and got[2]["recall"] == 0.0
    assert got[3]["precision"] == 0.0 and got[3]["recall"] == 0.0


def test_case_and_whitespace_insensitive_tokens(spark):
    out = extraction_eval(
        _pairs(spark, [(1, "The  Quick\nFox", "the quick fox")])
    ).collect()[0]
    assert out["precision"] == out["recall"] == 1.0
    assert not out["exact"]  # byte equality is still strict


def test_summary_rollup(spark):
    rows = [
        (1, "a b", "a b"),
        (2, "a", "a b"),  # recall 0.5
    ]
    s = extraction_eval_summary(
        extraction_eval(_pairs(spark, rows))
    ).collect()[0]
    assert s["n_docs"] == 2 and s["exact_rate"] == 0.5
    assert s["micro_precision"] == 1.0
    assert s["micro_recall"] == 0.75  # 3 common / 4 golden
    assert s["macro_recall"] == 0.75


def test_plan_pure_jvm_no_shuffle(spark):
    df = _pairs(spark, [(1, "a", "a")])
    plan = (extraction_eval(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan and "Python" not in plan
