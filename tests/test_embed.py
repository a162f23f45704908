"""Hashed-ngram document embeddings (functions/embed.py) — the
text→ANN loop closer (VERDICT r5 item 2)."""

import hashlib
import math

import pyspark.sql.functions as F
import pytest

from ocr_agent_spark.functions import embed

SF_DIR = "/root/testdata/sf0.001"


def _py_embedding(text, dim=64, seed="emb", bigrams=True, normalize=True):
    words = [w for w in text.strip().lower().split() if w]
    toks = list(words)
    if bigrams and len(words) >= 2:
        toks += [f"{a} {b}" for a, b in zip(words, words[1:])]
    vec = [0.0] * dim
    for t in toks:
        h = hashlib.md5(f"{seed}:{t}".encode()).hexdigest()
        vec[int(h[:8], 16) % dim] += 1.0 if int(h[8], 16) % 2 == 0 else -1.0
    if normalize:
        n = math.sqrt(sum(x * x for x in vec))
        if n > 0:
            vec = [round(x / n, 6) for x in vec]
    return vec


def test_matches_python_replay(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "one",
        "",
        "repeated repeated repeated words words",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["embedding"]
           for r in embed.embed_documents(df).collect()}
    for i, t in enumerate(texts):
        expect = _py_embedding(t)
        assert got[i] == pytest.approx(expect, abs=1e-9), f"doc {i}"
        assert len(got[i]) == 64


def test_deterministic_and_seed_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma delta")], "doc_id long, text string"
    )
    a = embed.embed_documents(df).collect()[0]["embedding"]
    b = embed.embed_documents(df).collect()[0]["embedding"]
    assert a == b
    c = embed.embed_documents(df, seed="other").collect()[0]["embedding"]
    assert a != c
    raw = embed.embed_documents(df, normalize=False).collect()[0]["embedding"]
    assert all(x == int(x) for x in raw)  # raw counts are exact integers


def test_plan_zero_shuffle_zero_python(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    e = embed.embed_documents(docs)
    plan = e._jdf.queryExecution().executedPlan().toString()
    # r8 contract: the projection itself adds no exchange; the only one
    # permitted is the adaptive scan-widening round-robin (a no-op on
    # already-parallel inputs, asserted below).
    exchanges = [ln for ln in plan.splitlines()
                 if "Exchange" in ln and "Reused" not in ln]
    assert len(exchanges) <= 1 and all(
        "roundrobin" in ln.lower() for ln in exchanges), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    wide = embed.embed_documents(docs.repartition(8))
    wplan = wide._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobin" not in wplan.replace(
        "RoundRobinPartitioning(8", "")  # only the test's own repartition


def test_end_to_end_documents_to_ivf_topk(spark, tmp_path):
    """documents → embeddings → persisted IVF index; with full probing
    the IVF answer equals brute-force cosine top-k over the same
    generated embeddings."""
    from ocr_agent_spark.functions.similarity import (
        build_ivf_index,
        cosine_topk,
        ivf_index_topk,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    emb = embed.embed_documents(docs).withColumnRenamed(
        "doc_id", "vec_id"
    ).persist()
    query = emb.orderBy("vec_id").first()["embedding"]

    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_clusters=4, sample_size=256)
    got = ivf_index_topk(spark, path, query, k=10, n_probe=4).collect()
    want = cosine_topk(emb, query, k=10).collect()
    assert [(r["neighbor_id"], r["cosine"]) for r in got] == [
        (r["neighbor_id"], r["cosine"]) for r in want
    ]
    # the query doc itself is rank 1 with cosine 1.0
    assert got[0]["cosine"] == pytest.approx(1.0, abs=1e-6)
    emb.unpersist()
