"""Real merges-table BPE (functions/bpe.py) — trainer, encoder, Spark
column, and the planted proof that it diverges from the regex proxy."""

import pyspark.sql.functions as F
import pytest

from ocr_agent_spark.functions import bpe

SF_DIR = "/root/testdata/sf0.001"


def test_trainer_hand_worked():
    # corpus: "aa ab aa" → pre-tokens {"aa", " ab", " aa"} (leading
    # space attaches). (' ','a') and ('a','a') tie at count 2; the
    # deterministic tie-break picks the lexicographically smaller
    # (' ','a'), then (' a','a') merges " aa" fully.
    merges = bpe.learn_bpe_merges(["aa ab aa"], n_merges=2)
    assert merges == [(" ", "a"), (" a", "a")]


def test_trainer_deterministic():
    corpus = ["the cat sat on the mat", "the dog ate the log"]
    a = bpe.learn_bpe_merges(corpus, 50)
    b = bpe.learn_bpe_merges(corpus, 50)
    assert a == b and len(a) > 0


def test_encode_merge_order():
    # ranks: ('l','o') first, then ('lo','w') — "low" must become one
    # token via the rank order, not the scan order
    ranks = bpe._ranks([("l", "o"), ("lo", "w")])
    assert bpe.bpe_encode("low", ranks) == ["low"]
    assert bpe.bpe_encode("lol", ranks) == ["lo", "l"]
    # unknown chars stay single symbols
    assert bpe.bpe_encode("xyz", ranks) == ["x", "y", "z"]


def test_count_memo_and_empty():
    ranks = bpe.default_ranks()
    memo = {}
    n1 = bpe.bpe_token_count("hello world hello world", ranks, memo)
    n2 = bpe.bpe_token_count("hello world hello world", ranks, memo)
    assert n1 == n2 > 0
    assert bpe.bpe_token_count("", ranks) == 0
    assert len(memo) == 3  # 'hello', ' world', ' hello'


def test_diverges_from_regex_proxy(spark):
    """Planted sub-word cases where the regex proxy (fixed ≤4-char
    slices) and real BPE disagree — the proof the operator is not the
    proxy renamed (VERDICT r5 item 4)."""
    from ocr_agent_spark.functions.text import bpe_ish_token_count

    cases = [
        "internationalization",     # proxy: 5 fixed slices
        "the parser parses",        # BPE merges learned whole words
        "zzzzzzzzzzzz",             # no learned merges → 12 BPE tokens, proxy 3
    ]
    df = spark.createDataFrame([(t,) for t in cases], "text string")
    rows = df.select(
        "text",
        bpe.bpe_token_count_col("text").alias("real"),
        bpe_ish_token_count("text").alias("proxy"),
    ).collect()
    diverged = [r for r in rows if r["real"] != r["proxy"]]
    assert len(diverged) >= 2, [(r["text"], r["real"], r["proxy"]) for r in rows]
    # and the planted no-merge case is exactly char count
    z = next(r for r in rows if r["text"].startswith("z"))
    assert z["real"] == 12 and z["proxy"] == 3


def test_spark_column_matches_python(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", bpe.bpe_token_count_col("text").alias("n")
        ).collect()
    }
    ranks = bpe.default_ranks()
    memo = {}
    for r in docs.select("doc_id", "text").collect():
        assert got[r["doc_id"]] == bpe.bpe_token_count(
            r["text"] or "", ranks, memo
        ), f"doc {r['doc_id']}"


def test_plan_is_arrow_batched_no_shuffle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = docs.select(bpe.bpe_token_count_col("text").alias("n"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan       # vectorized, not row-at-a-time
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


# -- distributed trainer (r7) --------------------------------------------------


def test_distributed_word_freq_matches_pretokenize(spark):
    from collections import Counter

    from ocr_agent_spark.functions.bpe import (
        distributed_word_freq, pre_tokenize,
    )

    texts = [
        "It's a test-case: numbers 123 and 456!",
        "  leading space\tand\ttabs\nnewlines  ",
        "don't re-tokenize CamelCase or snake_case oddly",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {r["word"]: r["freq"] for r in distributed_word_freq(docs).collect()}
    want = Counter()
    for t in texts:
        want.update(pre_tokenize(t))
    assert got == dict(want)


def test_spark_trainer_matches_serial(spark):
    from ocr_agent_spark.functions.bpe import (
        distributed_word_freq,
        learn_bpe_merges,
        train_bpe_merges_spark,
    )

    texts = [
        f"the quick brown fox number {i} jumps over the lazy dog "
        f"near sample text {i % 5}" for i in range(40)
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = train_bpe_merges_spark(distributed_word_freq(docs), n_merges=25)
    want = learn_bpe_merges(texts, n_merges=25)
    assert got == want


def test_spark_trained_table_drops_into_token_count(spark):
    # the swap contract: merges learned distributed feed the SAME
    # bpe_token_count_col path as the vendored frozen table
    from pyspark.sql import functions as F

    from ocr_agent_spark.functions.bpe import (
        bpe_token_count,
        _ranks,
        distributed_word_freq,
        train_bpe_merges_spark,
        bpe_token_count_col,
    )

    texts = ["aa ab aa ab aa", "ab aa ab", "zz yy xx"]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    merges = train_bpe_merges_spark(distributed_word_freq(docs), n_merges=6)
    got = {
        r["text"]: r["n"]
        for r in docs.select(
            "text", bpe_token_count_col("text", merges=merges).alias("n")
        ).collect()
    }
    ranks = _ranks(merges)
    for t in texts:
        assert got[t] == bpe_token_count(t, ranks)


def test_spark_trainer_stops_when_no_pairs(spark):
    from ocr_agent_spark.functions.bpe import train_bpe_merges_spark

    wf = spark.createDataFrame([("a", 3), ("b", 2)], "word string, freq long")
    assert train_bpe_merges_spark(wf, n_merges=10) == []
