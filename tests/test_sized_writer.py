"""Target-file-size parquet writer (sources/sized_writer.py)."""

import os

import pytest
from pyspark.sql import functions as F

from ocr_agent_spark.sources.sized_writer import (
    estimate_bytes_per_row,
    write_sized_parquet,
)


@pytest.fixture(scope="module")
def wide_df(spark):
    # ~1 KB of text per row so file sizes are predictable
    return spark.range(2000).select(
        F.col("id"),
        F.concat(F.lit("x" * 500),
                 F.md5(F.col("id").cast("string"))).alias("payload"),
    )


def _parquet_files(path):
    out = []
    for root, _dirs, files in os.walk(path):
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return out


def test_estimate_bytes_per_row_positive(spark, wide_df, tmp_path):
    bpr = estimate_bytes_per_row(wide_df, str(tmp_path), sample_rows=500)
    assert bpr > 0
    # scratch cleaned up
    assert not any(p.startswith("_sizer_") for p in os.listdir(tmp_path))


def test_sized_write_hits_target_file_count(spark, wide_df, tmp_path):
    out = str(tmp_path / "out")
    rep = write_sized_parquet(wide_df, out, str(tmp_path),
                              target_bytes=16 * 1024, sample_rows=500)
    files = _parquet_files(out)
    assert len(files) == rep["n_files"] > 1
    sizes = [os.path.getsize(f) for f in files]
    # every file within ~3x of the target (parquet overhead dominates
    # at this tiny scale; the invariant is no 100x outlier either way)
    assert max(sizes) < 3 * 16 * 1024
    # round-trip intact
    got = spark.read.parquet(out)
    assert got.count() == 2000
    assert {r["id"] for r in got.select("id").collect()} == set(range(2000))


def test_sized_write_range_mode_sorted_shards(spark, wide_df, tmp_path):
    out = str(tmp_path / "ranged")
    write_sized_parquet(wide_df, out, str(tmp_path),
                        target_bytes=32 * 1024, sample_rows=500,
                        mode="range", order_col="id")
    files = sorted(_parquet_files(out))
    assert len(files) > 1
    # each file carries a disjoint id range
    spans = []
    for f in files:
        ids = [r["id"] for r in spark.read.parquet(f).select("id").collect()]
        assert ids == sorted(ids)
        spans.append((min(ids), max(ids)))
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo


def test_sized_write_validation(spark, wide_df, tmp_path):
    with pytest.raises(ValueError):
        write_sized_parquet(wide_df, str(tmp_path / "x"), str(tmp_path),
                            mode="range")
    with pytest.raises(ValueError):
        write_sized_parquet(wide_df, str(tmp_path / "y"), str(tmp_path),
                            mode="zigzag")
    with pytest.raises(ValueError):
        estimate_bytes_per_row(wide_df.filter(F.col("id") < 0),
                               str(tmp_path))
