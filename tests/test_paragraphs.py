"""CCNet-style paragraph filter (functions/paragraphs.py)."""

from pyspark.sql import functions as F

from ocr_agent_spark.functions.paragraphs import (
    ccnet_paragraph_filter,
    split_paragraphs,
)

EN = "the and of to a in is that it for"
DE = "der die das und ist nicht ein mit sich auf"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_keeps_dominant_language_paragraphs(spark):
    doc = "\n".join([EN, DE, EN + " " + EN, "zz"])
    out = ccnet_paragraph_filter(_docs(spark, [(1, doc)])).collect()[0]
    assert out["doc_lang"] == "en"
    assert out["n_paras"] == 4
    assert out["n_kept"] == 2
    assert out["kept_text"] == EN + "\n" + EN + " " + EN


def test_german_document_keeps_german(spark):
    doc = "\n".join([DE, EN[:7], DE + " " + DE])
    out = ccnet_paragraph_filter(_docs(spark, [(1, doc)])).collect()[0]
    assert out["doc_lang"] == "de"
    assert out["n_kept"] == 2
    assert EN[:7] not in out["kept_text"]


def test_min_tokens_drops_short_paragraphs(spark):
    doc = "\n".join([EN, "the and"])  # 2 tokens < default 3
    out = ccnet_paragraph_filter(_docs(spark, [(1, doc)])).collect()[0]
    assert out["n_kept"] == 1


def test_keep_und_retains_no_vote_paragraphs(spark):
    doc = "\n".join([EN, "12345 67890 54321"])
    strict = ccnet_paragraph_filter(_docs(spark, [(1, doc)])).collect()[0]
    loose = ccnet_paragraph_filter(
        _docs(spark, [(1, doc)]), keep_und=True
    ).collect()[0]
    assert strict["n_kept"] == 1
    assert loose["n_kept"] == 2


def test_all_dropped_keeps_row_with_empty_text(spark):
    out = ccnet_paragraph_filter(_docs(spark, [(1, "zz\nqq")])).collect()
    assert len(out) == 1
    assert out[0]["n_kept"] == 0 and out[0]["kept_text"] == ""


def test_order_preserved_and_empty_paragraph(spark):
    doc = "\n".join([EN + " one", "", EN + " two"])
    out = ccnet_paragraph_filter(_docs(spark, [(1, doc)])).collect()[0]
    assert out["n_paras"] == 3
    assert out["kept_text"] == EN + " one\n" + EN + " two"


def test_split_paragraphs_exploded_view(spark):
    doc = "\n".join([EN, DE])
    rows = (
        split_paragraphs(_docs(spark, [(7, doc)]))
        .orderBy("para_index").collect()
    )
    assert [(r["para_index"], r["para_lang"]) for r in rows] == [
        (0, "en"), (1, "de")
    ]
    assert rows[0]["para_tokens"] == 10


def test_filter_plan_is_shuffle_free_pure_jvm(spark):
    docs = _docs(spark, [(1, EN + "\n" + DE)])
    out = ccnet_paragraph_filter(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # r8: allow only the adaptive scan-widening round-robin exchange
    exchanges = [ln for ln in plan.splitlines()
                 if "Exchange" in ln and "Reused" not in ln]
    assert len(exchanges) <= 1 and all(
        "roundrobin" in ln.lower() for ln in exchanges), plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
