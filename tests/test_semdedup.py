"""SemDeDup-style semantic keep-set (functions/similarity.py).

Pins the keep policy (one min-id survivor per cosine component), the
LSH-path/exact-path agreement, and the transitive-closure semantics
the paper's within-cluster pruning implies (a chain a~b~c collapses
even when cosine(a, c) is below threshold).
"""

import math

import pytest
from pyspark.sql import functions as F

from ocr_agent_spark.functions.similarity import (
    embedding_near_duplicates_exact,
    semantic_dedup_keep,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_keeps_min_id_per_cluster(spark):
    # two clusters of identical direction (scaled copies) + a loner
    rows = [
        (1, [1.0, 0.0, 0.0]), (2, [2.0, 0.0, 0.0]), (3, [0.5, 0.0, 0.0]),
        (10, [0.0, 1.0, 0.0]), (11, [0.0, 3.0, 0.0]),
        (20, [0.0, 0.0, 1.0]),
    ]
    kept = sorted(
        r["vec_id"]
        for r in semantic_dedup_keep(_emb(spark, rows), 0.95).collect()
    )
    assert kept == [1, 10, 20]


def test_no_pairs_keeps_everything(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])]
    kept = sorted(
        r["vec_id"]
        for r in semantic_dedup_keep(_emb(spark, rows), 0.95).collect()
    )
    assert kept == [1, 2, 3]


def test_transitive_chain_collapses(spark):
    # a~b and b~c above threshold, a~c below: closure must still
    # collapse all three (cos 20deg ~ .94 >= .9, cos 40deg ~ .766 < .9)
    th = math.radians(20)
    rows = [
        (1, [1.0, 0.0]),
        (2, [math.cos(th), math.sin(th)]),
        (3, [math.cos(2 * th), math.sin(2 * th)]),
    ]
    emb = _emb(spark, rows)
    pairs = embedding_near_duplicates_exact(emb, 0.9)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(1, 2), (2, 3)}  # (1,3) genuinely below threshold
    kept = sorted(
        r["vec_id"]
        for r in semantic_dedup_keep(emb, 0.9, exact=True).collect()
    )
    assert kept == [1]


@pytest.mark.parametrize("exact", [False, True])
def test_lsh_and_exact_paths_agree_on_planted(spark, exact):
    # identical-direction plants guarantee LSH recall 1.0, so both
    # paths must produce the same keep-set
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(2.0)).cast("float")
        ).alias("embedding"),
    )
    both = emb.unionByName(planted)
    kept = sorted(
        r["vec_id"]
        for r in semantic_dedup_keep(both, 0.9, exact=exact).collect()
    )
    n = emb.count()
    assert len(kept) == n  # every planted copy collapsed onto its twin
    assert all(k < 100000 for k in kept)  # min-id keep rule
