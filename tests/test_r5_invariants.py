"""Seeded bulk invariants for the round-5 operators.

One DataFrame of messy generated docs per suite (not per-example
hypothesis — Spark jobs are too slow for that); every invariant is
asserted over all rows at once.
"""

import datetime
import random

import pyspark.sql.functions as F
import pytest

from ocr_agent_spark.functions import webquality as wq
from ocr_agent_spark.functions.dedup import dedup_paragraphs
from ocr_agent_spark.functions.frontier import politeness_frontier

WORDS = ("the and a to of in is it you that he was for on are with as his "
         "they at be this have from or one had by word but not what all were "
         "# ... --- • * - lorem ipsum javascript { } café 東京 मुंबई").split()


def _random_text(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(0, 6)):
        line = " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, 12)))
        parts.append(line)
        if rng.random() < 0.3:
            parts.append("")          # blank line → paragraph break
        if rng.random() < 0.1:
            parts.append(parts[-2] if len(parts) >= 2 and parts[-2] else line)
    sep = "\r\n" if rng.random() < 0.3 else "\n"
    return sep.join(parts)


@pytest.fixture(scope="module")
def messy_docs(spark):
    rng = random.Random("r5-invariants")
    rows = [(i, _random_text(rng)) for i in range(300)]
    rows += [(300, ""), (301, " \n \n "), (302, "\r\n\r\n"), (303, "one")]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def test_gopher_signal_ranges(spark, messy_docs):
    rows = wq.gopher_quality_signals(messy_docs).collect()
    assert len(rows) == 304
    for r in rows:
        assert r["n_words"] >= 0
        assert r["mean_word_len"] >= 0.0
        assert 0.0 <= r["bullet_line_frac"] <= 1.0
        assert 0.0 <= r["ellipsis_line_frac"] <= 1.0
        assert 0.0 <= r["alpha_word_frac"] <= 1.0
        assert r["symbol_word_ratio"] >= 0.0
        assert 0 <= r["stopword_hits"] <= r["n_words"]


def test_repetition_fracs_bounded(spark, messy_docs):
    rows = wq.repetition_stats(messy_docs).collect()
    assert len(rows) == 304
    for r in rows:
        for c in ("dup_line_frac", "dup_line_char_frac", "dup_para_frac",
                  "dup_para_char_frac"):
            assert 0.0 <= r[c] <= 1.0, (r["doc_id"], c, r[c])
        assert 0.0 <= r["top_2gram_char_frac"] <= 1.0


def test_c4_output_lines_all_satisfy_rules(spark, messy_docs):
    out = wq.c4_clean_lines(messy_docs, min_words=3).collect()
    for r in out:
        assert r["text"]  # empty docs are dropped, never emitted empty
        for ln in r["text"].split("\n"):
            assert ln.rstrip()[-1:] in '.!?"”’'
            assert len(ln.split()) >= 3
            low = ln.lower()
            assert "lorem ipsum" not in low and "javascript" not in low
            assert "{" not in ln and "}" not in ln


def test_dedup_paragraphs_idempotent_and_loss_free(spark, messy_docs):
    once = dedup_paragraphs(messy_docs)
    twice = dedup_paragraphs(once)
    a = {(r["doc_id"], r["text"]) for r in once.collect()}
    b = {(r["doc_id"], r["text"]) for r in twice.collect()}
    assert a == b
    # global paragraph multiset after dedup has no repeated paragraph
    paras = (
        once.select(F.explode(F.split("text", r"(?:\r?\n){2,}")).alias("p"))
        .select(F.trim("p").alias("p")).filter(F.col("p") != "")
        .groupBy("p").count().filter(F.col("count") > 1).count()
    )
    assert paras == 0


def test_frontier_schedule_deterministic_and_rate_bounded(spark, messy_docs):
    rng = random.Random("frontier-inv")
    statuses = ["new", "changed", "unchanged", "gone"]
    delta = spark.createDataFrame(
        [(f"http://h{rng.randint(0, 9)}.example/p{i}", rng.choice(statuses))
         for i in range(400)],
        "url string, status string",
    )
    start = datetime.datetime(2026, 3, 1)
    s1 = politeness_frontier(delta, start, per_host_delay_sec=7, host_budget=20)
    s2 = politeness_frontier(delta, start, per_host_delay_sec=7, host_budget=20)
    r1 = sorted(map(tuple, s1.collect()))
    r2 = sorted(map(tuple, s2.collect()))
    assert r1 == r2  # D1: identical input ⇒ identical schedule
    per_host = {}
    for host, url, status, prio, rank, ts in r1:
        assert status != "gone"
        assert 1 <= rank <= 20
        assert ts == start + datetime.timedelta(seconds=7 * (rank - 1))
        per_host.setdefault(host, set()).add(rank)
    for host, ranks in per_host.items():
        assert ranks == set(range(1, len(ranks) + 1)), host  # dense ranks