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


# -- semantic (embedding) incremental index -----------------------------------


def _edf(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _vec(direction, scale=1.0):
    base = {
        "x": [1.0, 0.0, 0.0, 0.0],
        "y": [0.0, 1.0, 0.0, 0.0],
        "z": [0.0, 0.0, 1.0, 0.0],
        "w": [0.0, 0.0, 0.0, 1.0],
        "xy": [0.7071, 0.7071, 0.0, 0.0],
    }[direction]
    return [v * scale for v in base]


@pytest.fixture()
def semantic_index(spark, tmp_path):
    hist = _edf(spark, [
        (0, _vec("x")),
        (1, _vec("y")),
        (2, _vec("z")),
    ])
    path = str(tmp_path / "sem_index")
    di.build_semantic_index(hist, path, bands=4, rows_per_band=8)
    return path


def test_semantic_history_and_in_batch(spark, semantic_index):
    new = _edf(spark, [
        (10, _vec("x", 2.0)),    # same direction as history 0 → loses
        (11, _vec("w")),         # novel direction → survives
        (12, _vec("w", 3.0)),    # in-batch dup of 11 → min id wins
        (13, _vec("xy")),        # cos 0.7071 vs x/y: below 0.95 → survives
    ])
    kept = {r["vec_id"] for r in di.semantic_dedup_against_index(
        new, spark, semantic_index, threshold=0.95,
        bands=4, rows_per_band=8).collect()}
    assert kept == {11, 13}
    nofold = {r["vec_id"] for r in di.semantic_dedup_against_index(
        new, spark, semantic_index, threshold=0.95,
        bands=4, rows_per_band=8, in_batch=False).collect()}
    assert nofold == {11, 12, 13}


def test_semantic_append_extends_history(spark, semantic_index):
    d1 = _edf(spark, [(10, _vec("w"))])
    kept1 = di.semantic_dedup_against_index(
        d1, spark, semantic_index, threshold=0.95, bands=4, rows_per_band=8)
    assert kept1.count() == 1
    di.append_semantic_index(kept1, semantic_index)
    # the appended direction now blocks later deltas
    d2 = _edf(spark, [(20, _vec("w", 5.0)), (21, _vec("xy"))])
    kept2 = {r["vec_id"] for r in di.semantic_dedup_against_index(
        d2, spark, semantic_index, threshold=0.95,
        bands=4, rows_per_band=8).collect()}
    assert kept2 == {21}


def test_semantic_uncommitted_append_invisible(spark, semantic_index):
    # simulate a crash mid-append: files written, no _COMMITTED marker
    vdir = di._sem_index_dir(semantic_index)
    adir = os.path.join(vdir, "appends", "deadbeef0000")
    _edf(spark, [(99, _vec("w"))]).select(
        F.col("vec_id").alias("doc_id"), F.col("embedding")
    ).write.parquet(os.path.join(adir, "vectors"))
    # an uncommitted append must be invisible: w-direction still novel
    kept = {r["vec_id"] for r in di.semantic_dedup_against_index(
        _edf(spark, [(30, _vec("w"))]), spark, semantic_index,
        threshold=0.95, bands=4, rows_per_band=8).collect()}
    assert kept == {30}


def test_semantic_params_mismatch_raises(spark, semantic_index):
    with pytest.raises(ValueError, match="differently-banded"):
        di.semantic_dedup_against_index(
            _edf(spark, [(30, _vec("w"))]), spark, semantic_index,
            threshold=0.95, bands=8, rows_per_band=4,
        ).collect()


def test_semantic_missing_index_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        di.semantic_dedup_against_index(
            _edf(spark, [(1, _vec("x"))]), spark, str(tmp_path / "nope"))
