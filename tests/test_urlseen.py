"""Bloom-filter URL seen-set (functions/urlseen.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from ocr_agent_spark.functions.urlseen import (
    bloom_stats,
    build_url_bloom,
    filter_unseen_urls,
)

M = 1 << 12  # small filter so fill is visible; fp still ~0 at n=40
K = 5


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def _reference_words(urls, n_bits=M, k=K):
    """Hand-rolled md5 double-hashing reference — independent of the
    Spark expressions, so an encoder/decoder bug pair cannot hide."""
    words: dict[int, int] = {}
    for u in urls:
        d = hashlib.md5(u.encode()).hexdigest()
        h1, h2 = int(d[:8], 16), int(d[8:16], 16)
        for i in range(k):
            pos = (h1 + i * h2) % n_bits
            words[pos // 64] = words.get(pos // 64, 0) | (1 << (pos % 64))
    return words


HIST = [f"https://h{i % 7}.example/p/{i}" for i in range(40)]
NEW = [f"https://new{i}.example/q/{i}" for i in range(25)]


def test_word_table_matches_reference(spark):
    got = {
        r["word_idx"]: r["bits"]
        for r in build_url_bloom(_urls(spark, HIST), n_bits=M, k=K).collect()
    }
    want = _reference_words(HIST)
    # python ints are unbounded; fold to signed 64-bit like Spark longs
    want = {w: b - (1 << 64) if b >= (1 << 63) else b
            for w, b in want.items()}
    assert got == want


def test_no_false_negatives_and_unseen_pass(spark):
    bloom = build_url_bloom(_urls(spark, HIST), n_bits=M, k=K)
    cand = _urls(spark, HIST + NEW)
    unseen = {
        r["url"] for r in filter_unseen_urls(cand, bloom, n_bits=M, k=K)
        .collect()
    }
    # every history url is caught (no false negatives, guaranteed)
    assert unseen.isdisjoint(HIST)
    # at this fill (≤200/4096 bits) the planted new urls all pass
    assert unseen == set(NEW)
    seen = {
        r["url"] for r in filter_unseen_urls(
            cand, bloom, n_bits=M, k=K, keep_seen=True).collect()
    }
    assert seen == set(HIST)
    assert seen | unseen == set(HIST + NEW)


def test_bloom_stats_fill_and_fp(spark):
    bloom = build_url_bloom(_urls(spark, HIST), n_bits=M, k=K)
    [s] = bloom_stats(bloom, n_bits=M, k=K).collect()
    assert 0 < s["set_bits"] <= len(HIST) * K
    assert s["fill_ratio"] == pytest.approx(s["set_bits"] / M, abs=1e-6)
    assert 0 < s["est_fp_rate"] < 0.001
    assert s["words"] == bloom.count()


def test_duplicate_candidates_keep_all_rows(spark):
    bloom = build_url_bloom(_urls(spark, HIST), n_bits=M, k=K)
    cand = spark.createDataFrame(
        [(NEW[0], 1), (NEW[0], 2), (HIST[0], 3)], "url string, tag int"
    )
    kept = filter_unseen_urls(cand, bloom, n_bits=M, k=K).collect()
    assert sorted(r["tag"] for r in kept) == [1, 2]


def test_validation_errors(spark):
    with pytest.raises(ValueError, match="multiple of 64"):
        build_url_bloom(_urls(spark, HIST), n_bits=100)
    with pytest.raises(ValueError, match="k must be"):
        build_url_bloom(_urls(spark, HIST), k=0)
