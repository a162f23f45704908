"""Incremental dedup index (functions/dedup_index.py)."""

import os

import pytest
from pyspark.sql import functions as F

from ocr_agent_spark.functions import dedup_index as di

BASE = ("the quick brown fox jumps over the lazy dog while seventeen "
        "other animals watch from the fence near the old farmhouse")


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def history_index(spark, tmp_path):
    hist = _df(spark, [
        (0, BASE),
        (1, "completely different historical document about shipping"),
        (2, "third archived page with its own unique words entirely"),
    ])
    path = str(tmp_path / "dedup_index")
    di.build_dedup_index(hist, path)
    return path


def test_exact_and_near_history_losers(spark, history_index):
    new = _df(spark, [
        (10, BASE),                               # exact copy of history
        (11, BASE + " extra"),                    # near-dup of history
        (12, "a wholly novel delta document with fresh content words"),
    ])
    kept = {r["doc_id"] for r in di.dedup_against_index(
        new, spark, history_index, threshold=0.7).collect()}
    assert kept == {12}


def test_in_batch_dedup_of_delta(spark, history_index):
    new = _df(spark, [
        (10, "novel delta text one with plenty of distinct tokens"),
        (11, "novel delta text one with plenty of distinct tokens"),
        (12, "and a second novel document that stands alone here"),
    ])
    kept = {r["doc_id"] for r in di.dedup_against_index(
        new, spark, history_index).collect()}
    assert kept == {10, 12}
    nofold = {r["doc_id"] for r in di.dedup_against_index(
        new, spark, history_index, in_batch=False).collect()}
    assert nofold == {10, 11, 12}


def test_append_extends_history(spark, history_index):
    d1 = _df(spark, [(10, "first delta survivor with its own words here")])
    kept1 = di.dedup_against_index(d1, spark, history_index)
    assert kept1.count() == 1
    di.append_dedup_index(kept1, history_index)

    d2 = _df(spark, [
        (20, "first delta survivor with its own words here"),  # dup of d1
        (21, "second delta bringing genuinely new material along"),
    ])
    kept2 = {r["doc_id"] for r in di.dedup_against_index(
        d2, spark, history_index).collect()}
    assert kept2 == {21}


def test_uncommitted_append_invisible(spark, history_index):
    vdir = di._index_dir(history_index)
    ghost = os.path.join(vdir, "appends", "deadbeef")
    os.makedirs(os.path.join(ghost, "fingerprints"))
    os.makedirs(os.path.join(ghost, "signatures"))
    # no _COMMITTED marker → reader must skip it entirely
    new = _df(spark, [(30, "some new delta text that matches nothing")])
    assert di.dedup_against_index(new, spark, history_index).count() == 1


def test_missing_index_raises(spark, tmp_path):
    new = _df(spark, [(0, "anything")])
    with pytest.raises(FileNotFoundError):
        di.dedup_against_index(new, spark, str(tmp_path / "nope"))


def test_est_jaccard_identical_is_one(spark, history_index):
    new = _df(spark, [(40, BASE)])
    row = di.history_near_losers(new, spark, history_index,
                                 threshold=0.5).collect()
    assert len(row) == 1 and row[0]["est_jaccard"] == 1.0
