"""Streaming ingestion: the watch-folder analogue (SURVEY §2.9).

The reference polls an inbox every second and claims ready bundles with
filesystem markers (/root/reference/gui/src-tauri/src/watch_folder.rs:
135-241). Structured Streaming replaces every part of that machinery:

- poll loop (ST1)        → micro-batch trigger; ``Trigger.AvailableNow``
                            drains the backlog then stops (batch-friendly)
- ``.ready`` marker (ST2) → the file source only sees fully-written
                            files (atomic rename is the writer contract)
- ``.processing`` lock (ST3) → checkpointed source offsets: a file is
                            consumed exactly once across restarts
- ``.processed``/``.failed`` markers (ST4) → status/error columns in the
                            output rows (failure rows, never aborts)

The transformation is the SAME vectorized extraction as the batch path
(one code path, two drivers) — mapInPandas works unchanged on a
streaming DataFrame.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ocr_agent_spark.fixtures import PAGES_ARROW_SCHEMA_DDL
from ocr_agent_spark.operators.extract import (
    FUSED_SCHEMA,
    _extract_pages_fused_batches,
)


def _count_output_rows(spark: SparkSession, output_dir: str) -> int:
    if not os.path.exists(output_dir):
        return 0
    try:
        return spark.read.parquet(output_dir).count()
    except Exception:
        return 0  # directory exists but holds no committed files yet


def _sink_committed_paths(output_dir: str) -> set[str] | None:
    """Files committed by the parquet streaming sink, from its
    ``_spark_metadata`` manifest log (tiny JSON files — O(#batches) to
    read, never touches the data). None if no log exists yet."""
    import json

    meta = os.path.join(output_dir, "_spark_metadata")
    if not os.path.isdir(meta):
        return None
    paths: set[str] = set()
    for name in os.listdir(meta):
        base = name[:-8] if name.endswith(".compact") else name
        if not base.isdigit():
            continue
        try:
            with open(os.path.join(meta, name)) as fh:
                for line in fh:
                    line = line.strip()
                    if not line or line.startswith("v"):
                        continue
                    entry = json.loads(line)
                    if entry.get("action", "add") == "add" and "path" in entry:
                        paths.add(entry["path"])
        except (OSError, ValueError):
            return None  # malformed log → let the caller fall back
    return paths


def _rows_in_files(uris: set[str]) -> int | None:
    """Row counts from parquet footers only (no data pages read).

    Returns None when any footer is unreadable — e.g. the sink lives on
    a filesystem this process can't open directly — so the caller falls
    back to the pre/post full-count delta instead of crashing after a
    successful drain (ADVICE r2). Remote schemes are opened through
    ``pyarrow.fs.FileSystem.from_uri``; bare paths stay local.
    """
    import pyarrow.parquet as pq

    total = 0
    for uri in uris:
        try:
            if "://" in uri:
                from pyarrow import fs as pafs

                filesystem, path = pafs.FileSystem.from_uri(uri)
                with filesystem.open_input_file(path) as f:
                    total += pq.ParquetFile(f).metadata.num_rows
            else:
                total += pq.ParquetFile(uri).metadata.num_rows
        except Exception:
            return None
    return total


def _pre_drain_rowcount(spark: SparkSession, before_paths: set[str],
                        before_count: int | None) -> int:
    """Pre-drain row total when footers weren't readable in-process.

    Reads the pre-drain file list through Spark (which has the remote
    filesystem connectors). Files may ALSO be unreadable because they
    no longer exist — compaction mid-drain is one of the stated causes
    of the footer fallback — so a failed Spark read falls back to the
    pre-paid ``before_count`` instead of throwing after an otherwise
    successful drain (ADVICE r3). Raises only when there is genuinely
    no pre-drain evidence left.
    """
    try:
        return (
            spark.read.parquet(*sorted(before_paths)).count()
            if before_paths else 0
        )
    except Exception:
        if before_count is None:
            raise
        return before_count


def run_streaming_extraction(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> int:
    """Drain all unprocessed page files from ``input_dir`` → extracted
    parquet under ``output_dir``; returns rows written BY THIS drain
    (a re-drain with no new files returns 0).

    Drain accounting reads the sink's ``_spark_metadata`` commit log
    and the NEW files' parquet footers only — O(rows written this
    drain), not O(total historical output), so a long-lived watcher's
    bookkeeping stays flat as the output grows. (Falls back to a full
    pre/post count only if the sink log is unreadable.)

    Exactly-once per input file via the checkpoint; re-running after new
    files arrive processes only the new files (the streaming twin of the
    batch snapshot resume).

    The transformation is the SAME fused kernel as the batch hot path
    (probe + pdf page fan-out + extract inside one mapInPandas batch),
    so a multi-page PDF arriving on the stream yields ALL its pages —
    identical rows to a batch run over the same payload.

    Note: the streaming path assigns no global ``order_key`` (a global
    sort is meaningless on an unbounded source). Order remains data —
    (url, page_index) — and the merge job sorts when the artifact is
    built, exactly like the batch path.
    """
    before_paths = _sink_committed_paths(output_dir)
    before_count = None
    if before_paths is None and os.path.exists(output_dir):
        before_count = _count_output_rows(spark, output_dir)
    elif before_paths:
        # Pre-pay the fallback: if the sink log becomes unreadable
        # DURING the drain (compaction, new format), the post-drain path
        # below needs the pre-drain row count — footers are cheap now,
        # and without this the final branch would report the TOTAL
        # historical output as this drain's delta (code-review r3).
        before_count = _rows_in_files(before_paths)

    reader = (
        spark.readStream.schema(PAGES_ARROW_SCHEMA_DDL)
        .format("parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    pages = reader.load(input_dir)

    extracted = pages.select("url", "warc_ts", "html").mapInPandas(
        _extract_pages_fused_batches, schema=FUSED_SCHEMA
    )

    query = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    after_paths = _sink_committed_paths(output_dir)
    if after_paths is not None and before_paths is not None:
        delta = _rows_in_files(after_paths - before_paths)
        if delta is not None:
            return delta
        # Footers unreadable from this process (e.g. remote sink fs):
        # recover via Spark, which does have the filesystem connectors.
        pre = _pre_drain_rowcount(spark, before_paths, before_count)
        return _count_output_rows(spark, output_dir) - pre
    return _count_output_rows(spark, output_dir) - (before_count or 0)


def run_streaming_extraction_committed(
    spark: SparkSession,
    input_dir: str,
    output_root: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> list[str]:
    """Streaming drain whose sink is the SNAPSHOT STORE: each micro-batch
    commits atomically (manifest publish) with per-partition lineage
    rows — the streaming twin of ``pipeline.run_extraction_job``, so
    streamed and batch output share one table, one resume contract, one
    merge/status surface (ST1–ST4 unified with S14).

    Exactly-once: source offsets live in the streaming checkpoint;
    after a failure ``foreachBatch`` re-delivers the same ``batch_id``,
    and the run_id derives from it — a replayed batch whose run_id is
    already in the manifest is skipped, and a data directory left by a
    crash BETWEEN write and manifest publish is discarded and rewritten
    (the standard idempotent-foreachBatch recipe).

    Maintenance: every micro-batch publishes its own run dir, so a
    long-lived watcher accumulates files; fold them periodically with
    ``SnapshotStore.compact`` + ``expire_snapshots`` (CLI:
    ``python -m ocr_agent_spark compact``) — resume and merge semantics
    are layout-independent (tested).

    Returns the run_ids committed by this drain (empty on a no-op).
    """
    import shutil

    from ocr_agent_spark.operators.extract import lineage_from_extracted
    from ocr_agent_spark.pipeline import extraction_store, lineage_store

    store = extraction_store(output_root)
    lstore = lineage_store(output_root)
    committed_now: list[str] = []

    reader = (
        spark.readStream.schema(PAGES_ARROW_SCHEMA_DDL)
        .format("parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    pages = reader.load(input_dir)
    extracted = pages.select("url", "warc_ts", "html").mapInPandas(
        _extract_pages_fused_batches, schema=FUSED_SCHEMA
    )

    def ensure_lineage(run_id: str, run_dir: str) -> None:
        # Idempotent lineage publish from the COMMITTED files. Runs on
        # every delivery of a batch — including a replay whose
        # extraction manifest is already published — so a crash landing
        # between the extraction commit and the lineage commit is
        # repaired on the next drain instead of leaving that batch's
        # lineage missing forever (ADVICE r2, medium).
        lmanifest = lstore.latest_manifest()
        if lmanifest is not None and run_id in lmanifest["runs"]:
            return
        ldir = os.path.join(lstore.data_dir, run_id)
        if os.path.exists(ldir):
            shutil.rmtree(ldir)  # crash between lineage write and publish
        committed = spark.read.parquet(run_dir)
        lstore.commit(lineage_from_extracted(committed, run_id),
                      run_id=run_id)

    def commit_batch(df, batch_id: int) -> None:
        run_id = f"stream{batch_id:08d}"
        run_dir = os.path.join(store.data_dir, run_id)
        manifest = store.latest_manifest()
        if manifest is not None and run_id in manifest["runs"]:
            # replayed batch already published: exactly-once — but the
            # lineage commit may still be missing if the crash hit
            # between the two publishes; repair before returning.
            ensure_lineage(run_id, run_dir)
            return
        if os.path.exists(run_dir):
            shutil.rmtree(run_dir)  # crash between write and publish
        store.commit(df, run_id=run_id)
        ensure_lineage(run_id, run_dir)
        committed_now.append(run_id)

    query = (
        extracted.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return committed_now
