"""Iceberg-style time travel over the snapshot store."""

import pytest

from ocr_agent_spark.sources.snapshot import SnapshotStore


def test_time_travel(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "tt"))
    df1 = spark.createDataFrame([(1,), (2,)], "id long")
    df2 = spark.createDataFrame([(3,)], "id long")
    store.commit(df1, run_id="r1")
    store.commit(df2, run_id="r2")

    assert store.read(spark).count() == 3
    assert store.read(spark, as_of_seq=0).count() == 2
    assert store.read(spark, as_of_seq=1).count() == 3
    with pytest.raises(ValueError, match="no snapshot"):
        store.read(spark, as_of_seq=9)

    history = store.snapshots()
    assert [s["seq"] for s in history] == [0, 1]
    assert history[0]["runs"] == ["r1"]
    assert history[1]["runs"] == ["r1", "r2"]
