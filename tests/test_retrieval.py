"""BM25 ranked retrieval (functions/retrieval.py)."""

import math

import duckdb
import pytest

from ocr_agent_spark.functions.retrieval import (
    bm25_oracle_sql, bm25_scores, bm25_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "spark shuffle join spark spark"),
        (1, "join join join join join join join join"),
        (2, "vector search index"),
        (3, "the quick brown fox"),
        (4, "spark"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _expected_bm25(corpus, terms, k1=1.2, b=0.75):
    toked = {i: t.lower().split() for i, t in corpus}
    n = len(corpus)
    total = sum(len(v) for v in toked.values())
    avgdl = total / n
    dfs = {t: sum(1 for v in toked.values() if t in v) for t in terms}
    out = {}
    for i, words in toked.items():
        micros = 0
        matched = 0
        for t in terms:
            tf = words.count(t)
            if tf:
                matched += 1
            idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            contrib = idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(words) / avgdl)
            )
            micros += round(contrib * 1e6)
        if matched:
            out[i] = (matched, micros / 1e6)
    return out


def test_scores_match_reference_formula(spark, docs):
    corpus = [(r["doc_id"], r["text"]) for r in docs.collect()]
    terms = ["spark", "join"]
    expected = _expected_bm25(corpus, terms)
    got = {
        r["doc_id"]: (r["n_matched"], r["score"])
        for r in bm25_scores(docs, terms).collect()
    }
    assert set(got) == set(expected)
    for i in expected:
        assert got[i][0] == expected[i][0]
        assert got[i][1] == pytest.approx(expected[i][1], abs=2e-6)


def test_rare_term_outranks_common_at_equal_tf(spark, docs):
    # 'vector' (df=1) in doc 2 must outscore 'join' (df=2) in doc 0 —
    # both single occurrences, comparable lengths: idf dominates.
    scores = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, ["vector", "join"]).collect()
    }
    assert scores[2] > scores[0]


def test_tf_saturation(spark, docs):
    # BM25's k1 saturation: doc 1's eight 'join's must score less than
    # 8x a single occurrence.
    scores = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, ["join"]).collect()
    }
    assert scores[1] < 8 * scores[0]


def test_absent_term_and_empty_doc(spark, docs):
    rows = bm25_scores(docs, ["zeppelin"]).collect()
    assert rows == []  # df=0 term matches nothing; empty doc never appears


def test_topk_ties_break_on_doc_id(spark):
    df = spark.createDataFrame(
        [(7, "alpha beta"), (3, "alpha beta"), (5, "alpha beta")],
        "doc_id long, text string",
    )
    got = [r["doc_id"] for r in bm25_topk(df, ["alpha"], k=2).collect()]
    assert got == [3, 5]


def test_oracle_sql_matches_spark(spark, docs):
    terms = ["spark", "vector", "zeppelin"]
    sdf = bm25_topk(docs, terms, k=10).toPandas()
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    odf = con.execute(bm25_oracle_sql(terms, k=10)).df()
    assert list(sdf["doc_id"]) == list(odf["doc_id"])
    assert list(sdf["n_matched"]) == list(odf["n_matched"])
    for a, b in zip(sdf["score"], odf["score"]):
        assert a == pytest.approx(b, abs=2e-6)


def test_validation(spark, docs):
    with pytest.raises(ValueError):
        bm25_scores(docs, [])
    with pytest.raises(ValueError):
        bm25_scores(docs, ["a", "a"])


def test_projection_plan_no_explode_no_python(spark, docs):
    plan = bm25_scores(docs, ["spark"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Generate" not in plan  # no explode: tf via array filter
    assert "Python" not in plan
