"""Gopher/C4 web-quality gates (functions/webquality.py)."""

import pyspark.sql.functions as F
import pytest

from ocr_agent_spark.functions import webquality as wq


def _one(df, doc_id=0):
    return [r for r in df.collect() if r[0] == doc_id or r["doc_id"] == doc_id][0]


def test_gopher_signals_hand_computed(spark):
    # 12 words over 3 lines; one bullet line; one ellipsis line ending;
    # one '#'; '-' is a word without alpha chars; 3 stopword hits
    # (the, the, and — 'The' lowercases in)
    text = "The cat runs fast.\n- bullet item here\nAnd the end comes now..."
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = _one(wq.gopher_quality_signals(df))
    assert r["n_words"] == 13
    words = [w for w in text.split() if w]
    assert r["mean_word_len"] == pytest.approx(
        sum(len(w) for w in words) / len(words), abs=1e-6
    )
    assert r["bullet_line_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert r["ellipsis_line_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert r["alpha_word_frac"] == pytest.approx(12 / 13, abs=1e-6)
    assert r["stopword_hits"] == 3  # 'The', 'the', 'and'
    assert r["symbol_word_ratio"] == pytest.approx(1 / 13, abs=1e-6)  # one '...'


def test_gopher_keep_rules(spark):
    good = ("the quick brown fox jumps over and over the lazy dog to be "
            "sure that every word here is a normal one with fine length " * 2)
    rows = [
        (0, good),
        (1, "a " * 60),                                   # mean word len 1
        (2, "\n".join("- bullet %d text the and of" % i for i in range(20))),
        (3, ("### " * 30) + "the and that to of be have with " * 4),  # symbols
        (4, "zzz qqq vvv " * 30),                          # no stopwords
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r["doc_id"] for r in
            wq.gopher_quality_keep(docs, min_words=20).collect()}
    assert kept == {0}


def test_repetition_stats_hand_computed(spark):
    # lines: 'a b' ×2 + 'c d e' → dup_line_frac = 1 - 2/3;
    # char-weighted = 2·3 / (2·3 + 5); paragraphs: 'a b\na b' + 'c d e'
    # → no dup paragraphs
    text = "a b\na b\n\nc d e"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = _one(wq.repetition_stats(df))
    assert r["dup_line_frac"] == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert r["dup_line_char_frac"] == pytest.approx(6 / 11, abs=1e-6)
    assert r["dup_para_frac"] == 0.0
    assert r["dup_para_char_frac"] == 0.0

    # top 2-gram: 'foo bar' ×2, text length 19 → 2·7/19
    t2 = "foo bar foo bar foo"
    df2 = spark.createDataFrame([(0, t2)], "doc_id long, text string")
    r2 = _one(wq.repetition_stats(df2))
    assert r2["top_2gram_char_frac"] == pytest.approx(2 * 7 / 19, abs=1e-6)

    # duplicated paragraphs
    t3 = "para one here\n\npara one here\n\nother"
    r3 = _one(wq.repetition_stats(
        spark.createDataFrame([(0, t3)], "doc_id long, text string")))
    assert r3["dup_para_frac"] == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert r3["dup_para_char_frac"] == pytest.approx(26 / 31, abs=1e-6)

    # single-word / empty docs: all zeros, no crash
    r4 = wq.repetition_stats(
        spark.createDataFrame([(0, "word"), (1, "")],
                              "doc_id long, text string")).collect()
    assert all(v == 0.0 for row in r4 for v in row[1:])


def test_repetition_keep_gate(spark):
    boiler = "\n".join(["click here to subscribe now."] * 10)
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa quebec romeo "
             "sierra tango uniform victor whiskey xray yankee zulu").split()
    normal = "\n".join(
        " ".join(words[i:i + 5]) + "." for i in range(0, 25, 5)
    )
    docs = spark.createDataFrame(
        [(0, normal), (1, boiler)], "doc_id long, text string"
    )
    kept = {r["doc_id"] for r in wq.repetition_keep(docs).collect()}
    assert kept == {0}


def test_c4_clean_lines(spark):
    text = "\n".join([
        "This sentence survives the filter.",     # keep
        "No terminal punctuation here",           # drop: punctuation
        "Too short.",                             # drop: <3 words
        "Enable javascript to continue reading.", # drop: javascript
        "Lorem ipsum dolor sit amet.",            # drop: lorem ipsum
        "function() { return 1; }",               # drop: braces
        'He said "stop right there!"',            # keep: quote after !
    ])
    docs = spark.createDataFrame([(0, text), (1, "all dropped")],
                                 "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in wq.c4_clean_lines(docs).collect()}
    assert out[0].split("\n") == [
        "This sentence survives the filter.",
        'He said "stop right there!"',
    ]
    assert 1 not in out  # document with no surviving lines is dropped


def test_webquality_plans_stay_jvm(spark):
    docs = spark.createDataFrame([(0, "the and a b.\nc d e f.")],
                                 "doc_id long, text string")
    for df in (wq.gopher_quality_signals(docs), wq.repetition_stats(docs),
               wq.c4_clean_lines(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_typographic_ellipsis_counted(spark):
    """U+2026 counts as an ellipsis alongside ASCII '...' in both the
    line fraction and the symbol ratio (advice r5)."""
    text = "one two three…\nfour five six...\nseven eight nine"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = _one(wq.gopher_quality_signals(df))
    assert r["ellipsis_line_frac"] == pytest.approx(2 / 3, abs=1e-6)
    # one '…' (weight 1) + one '...' (3 chars / 3) over 9 words
    assert r["symbol_word_ratio"] == pytest.approx(2 / 9, abs=1e-6)


def test_host_quality_priors(spark):
    good = ("the data and that rows be to of scans with tables " * 3).strip()
    bad = "### ### ### ###"  # fails symbol ratio + stopwords + min words
    docs = spark.createDataFrame(
        [
            (0, good, "a.com"),
            (1, good, "a.com"),
            (2, bad, "a.com"),
            (3, bad, "b.com"),
        ],
        "doc_id long, text string, host string",
    )
    rows = {
        r["host"]: r
        for r in wq.host_quality_priors(docs, min_words=10).collect()
    }
    a, b = rows["a.com"], rows["b.com"]
    assert a["n_docs"] == 3 and a["n_keep"] == 2
    assert a["keep_rate"] == pytest.approx(2 / 3, abs=1e-9)
    assert b["n_docs"] == 1 and b["n_keep"] == 0 and b["keep_rate"] == 0.0
    assert a["total_words"] == 2 * 33 + 4
    assert a["mean_stopword_hits"] > b["mean_stopword_hits"]
