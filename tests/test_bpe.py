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
