"""Destructive reset (S12): truncation + path-safety guard."""

import os

import pytest

from ocr_agent_spark.sources.snapshot import SnapshotStore


def test_reset_clears_store(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "store"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    store.commit(df, run_id="r1")
    assert store.read(spark).count() == 2

    store.reset()
    assert store.read(spark) is None
    assert store.committed_run_dirs() == []
    # store is reusable after reset
    store.commit(df, run_id="r2")
    assert store.read(spark).count() == 2


def test_reset_guard_refuses_foreign_files(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "store"))
    with open(os.path.join(store.root, "precious.txt"), "w") as fh:
        fh.write("do not delete")
    with pytest.raises(ValueError, match="refusing reset"):
        store.reset()
    assert os.path.exists(os.path.join(store.root, "precious.txt"))
