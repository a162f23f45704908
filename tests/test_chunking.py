"""Boundary-aware chunking (functions/chunking.py)."""

import pytest
from pyspark.sql import functions as F

from ocr_agent_spark.functions.chunking import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_greedy_boundary_fill(spark):
    doc = "a b c\nd e\nf g h i\nj"  # para tokens: 3, 2, 4, 1
    rows = chunk_documents(_docs(spark, [(1, doc)]), target_tokens=4) \
        .orderBy("chunk_id").collect()
    assert [(r["chunk_id"], r["n_paras"], r["n_tokens"], r["chunk_text"])
            for r in rows] == [
        (0, 2, 5, "a b c\nd e"),   # closes after crossing the budget
        (1, 1, 4, "f g h i"),
        (2, 1, 1, "j"),
    ]


def test_lossless_rejoin(spark):
    doc = "\n".join(f"tok{i} tok{i} tok{i}" for i in range(17))
    out = chunk_documents(_docs(spark, [(1, doc)]), target_tokens=7) \
        .orderBy("chunk_id").collect()
    assert "\n".join(r["chunk_text"] for r in out) == doc
    assert sum(r["n_paras"] for r in out) == 17
    assert sum(r["n_tokens"] for r in out) == 51


def test_oversize_paragraph_is_its_own_chunk(spark):
    doc = "a\n" + " ".join(f"w{i}" for i in range(30)) + "\nb"
    rows = chunk_documents(_docs(spark, [(1, doc)]), target_tokens=5) \
        .orderBy("chunk_id").collect()
    # para 2 (30 tokens) joins chunk 0 ('a' had not filled it) and is
    # never torn; the next paragraph's chunk id jumps (non-contiguous
    # ids are the documented contract — no empty filler chunks)
    assert [r["n_tokens"] for r in rows] == [31, 1]
    assert rows[0]["n_paras"] == 2
    assert [r["chunk_id"] for r in rows] == [0, 6]


def test_short_doc_single_chunk(spark):
    rows = chunk_documents(
        _docs(spark, [(1, "just a few tokens")]), target_tokens=100
    ).collect()
    assert len(rows) == 1 and rows[0]["chunk_id"] == 0
    assert rows[0]["n_tokens"] == 4


def test_empty_paragraphs_carry_zero_tokens(spark):
    rows = chunk_documents(
        _docs(spark, [(1, "a b\n\n\nc d")]), target_tokens=2
    ).orderBy("chunk_id").collect()
    assert sum(r["n_paras"] for r in rows) == 4
    assert sum(r["n_tokens"] for r in rows) == 4


def test_invalid_target_raises(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "x")]), target_tokens=0)


def test_in_row_plan_zero_shuffle_pure_jvm(spark):
    from ocr_agent_spark.functions.chunking import _chunk_in_row

    df = _docs(spark, [(1, "a\nb")])
    plan = (_chunk_in_row(df, 5, "doc_id", "text", "\n")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Python" not in plan


def test_both_paths_compute_identical_chunks(spark):
    from ocr_agent_spark.functions.chunking import (
        _chunk_in_row, _chunk_windowed)

    rows = [
        (1, "a b c\nd e\nf g h i\nj"),
        (2, "a\n" + " ".join(f"w{i}" for i in range(30)) + "\nb"),
        (3, "solo"),
        (4, "a b\n\n\nc d"),
    ]
    df = _docs(spark, rows)
    a = sorted(map(tuple, _chunk_in_row(df, 4, "doc_id", "text", "\n")
                   .collect()))
    b = sorted(map(tuple, _chunk_windowed(df, 4, "doc_id", "text", "\n")
                   .collect()))
    assert a == b


def test_mega_document_routes_to_windowed_path(spark):
    # 20k paragraphs: far over giant_paras — must route to the window
    # formulation (the in-row accumulator is O(P^2) there) and still
    # produce exact budget chunks
    doc = "\n".join("w1 w2 w3" for _ in range(20000))
    rows = chunk_documents(_docs(spark, [(1, doc)]), target_tokens=300) \
        .collect()
    assert len(rows) == 200  # 60k tokens / 300
    assert all(r["n_tokens"] == 300 for r in rows)
