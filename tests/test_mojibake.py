"""Mojibake repair (functions/mojibake.py): kernel, JVM chain, score."""

import pytest
from pyspark.sql import functions as F

from ocr_agent_spark.functions.mojibake import (
    _sequence_for,
    build_repair_table,
    fix_mojibake_text,
    mojibake_score,
    planted_mojibake_expr,
    repair_expr,
    repair_mojibake,
)

TABLE = build_repair_table()


def test_table_is_collision_free():
    seqs = [s for s, _ in TABLE]
    assert len(seqs) == len(set(seqs))
    for a in seqs:
        for b in seqs:
            assert a == b or a not in b


def test_kernel_basic_cases():
    assert fix_mojibake_text("caf" + _sequence_for("é")) == "café"
    assert fix_mojibake_text("a " + _sequence_for("—") + " b") == "a — b"
    assert fix_mojibake_text("plain ascii") == "plain ascii"
    assert fix_mojibake_text(None) is None
    assert fix_mojibake_text("") == ""


def test_kernel_double_encoding_unwinds():
    double = "".join(_sequence_for(c) or c for c in _sequence_for("é"))
    assert fix_mojibake_text("caf" + double) == "café"


def test_kernel_genuine_cp1252_lookalike_survives():
    # 'Ã' followed by a char that is NOT a valid UTF-8 continuation
    # image: the round trip fails and the text must come back intact
    s = "Ã then plain"
    assert fix_mojibake_text(s) == s


@pytest.mark.parametrize("seq,ch", TABLE)
def test_chain_repairs_every_inventory_char(seq, ch):
    # pure-python replay of the frozen chain order
    s = "x" + seq + "y"
    for q, c in TABLE:
        s = s.replace(q, c)
    assert s == "x" + ch + "y"
    assert fix_mojibake_text("x" + seq + "y") == "x" + ch + "y"


def test_jvm_chain_matches_kernel_on_planted_corpus(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corr = d.selectExpr(
        "doc_id", f"({planted_mojibake_expr('spark')}) AS corrupted"
    )
    rows = corr.select(
        "doc_id", "corrupted",
        repair_expr("corrupted").alias("jvm"),
        mojibake_score("corrupted").alias("score"),
    ).collect()
    assert len(rows) > 0
    n_dirty = 0
    for r in rows:
        assert r["jvm"] == fix_mojibake_text(r["corrupted"]), r["doc_id"]
        if r["score"] > 0:
            n_dirty += 1
        else:
            assert r["jvm"] == r["corrupted"]
    assert n_dirty > 0  # the plant is non-vacuous


def test_jvm_plan_is_pure_codegen(spark):
    df = spark.createDataFrame([("x",)], "text string")
    out = df.select(repair_expr("text").alias("r"),
                    mojibake_score("text").alias("s"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_mapinpandas_kernel_path(spark):
    rows = [(1, "caf" + _sequence_for("é")), (2, "clean"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"]
           for r in repair_mojibake(df).collect()}
    assert got == {1: "café", 2: "clean", 3: None}
