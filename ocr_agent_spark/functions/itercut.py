"""Lineage-cutting for iterative fixed-point loops.

Every iterative algorithm in this repo (connected components, redirect
resolution, PageRank) rebuilds a slim table each round where the round
references its predecessor MORE THAN ONCE (a join + an aggregate), so
without a true lineage cut the analyzed logical plan doubles per round
— cache substitution happens at planning time but the logical tree
keeps the full history, measured as analyzer OOM by round ~10.

``make_cutter`` returns the (cut, gc_superseded) pair the loops share:

- with ``checkpoint_dir=None``: ``localCheckpoint(eager=True)`` —
  executor-memory blocks, fine on local mode, but a lost executor
  loses the blocks with NO lineage to recompute them. ``gc`` is a
  no-op.
- with a ``checkpoint_dir`` (HDFS/S3 on a real cluster): reliable
  ``checkpoint()`` into a per-round subdirectory. Spark never deletes
  reliable checkpoint files itself (cleanCheckpoints defaults false),
  so a deep loop would otherwise leave one full table copy per round
  on HDFS/S3 permanently — ``gc_superseded()`` deletes all but the
  newest round's subdir; call it only AFTER the new round has been
  materialized and every consumer of the previous round has run. The
  FINAL round's files back the returned DataFrame, so callers delete
  ``checkpoint_dir`` itself only after consuming/persisting the
  result. At 100 TB always set it.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def _hadoop_delete(spark, path: str) -> None:
    """Recursive delete through the Hadoop FileSystem API — works for
    whatever filesystem the path's scheme names (HDFS, S3A, local)."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    fs.delete(jpath, True)


def make_cutter(
    spark, checkpoint_dir: str | None
) -> tuple[Callable[[DataFrame], DataFrame], Callable[[], None]]:
    if checkpoint_dir is None:

        def cut(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

        def gc_superseded() -> None:
            return None

        return cut, gc_superseded

    round_dirs: list[str] = []
    counter = [0]

    def cut(df: DataFrame) -> DataFrame:
        rd = f"{checkpoint_dir.rstrip('/')}/round-{counter[0]}"
        counter[0] += 1
        spark.sparkContext.setCheckpointDir(rd)
        out = df.checkpoint(eager=True)
        round_dirs.append(rd)
        return out

    def gc_superseded() -> None:
        while len(round_dirs) > 1:
            _hadoop_delete(spark, round_dirs.pop(0))

    return cut, gc_superseded
