"""The capstone composition: raw documents → training shards.

Every operator in this repo exists to serve this assembly — the
standard large-scale training-data pipeline:

    language gate → Gopher quality rules → model-based classifier
    gate → exact dedup → (optional) fuzzy dedup → deterministic
    shuffle → shard assignment → per-shard sequence packing

`build_training_corpus` wires the existing operators together with a
per-stage row-accounting report. Each stage is the already-audited
scalable formulation (see the per-module scale notes); this module
adds NO new shuffle beyond what its stages own:

- the three gates are projections / semi-joins (no new exchange),
- exact dedup is one shuffle on the content fingerprint,
- shard assignment is a pure projection on the md5 shuffle key,
- packing windows per SHARD, never globally — choose `n_shards` so a
  shard is a few GB (100 TB / 100k shards ≈ 1 GB) and no window task
  ever holds more than one shard.

The whole flow is deterministic (md5 keys, fixed thresholds) and —
with `near_threshold=None` — exactly replayable in a single SQL
statement, which is how the `corpus_pipeline_assign` registry query
hash-verifies it end-to-end against DuckDB.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class StageCount:
    stage: str
    rows_in: int
    rows_out: int


def build_training_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str | None = "en",
    min_words: int = 50,
    max_words: int = 100_000,
    clf_weights: DataFrame | None = None,
    clf_dim: int = 4096,
    clf_threshold: float = 0.5,
    near_threshold: float | None = None,
    chunk_target: int | None = None,
    seed: str = "corpus-v1",
    n_shards: int = 8,
    pack_budget: int = 2048,
    report: bool = False,
) -> DataFrame | tuple[DataFrame, list[StageCount]]:
    """Returns (id, n_tokens, shuffle_key, shard, pack_id) — the
    training-shard assignment for every surviving document. With
    ``chunk_target`` set, long documents are SPLIT at paragraph
    boundaries into ~chunk_target-token chunks BEFORE shuffling and
    packing (functions/chunking.py), and the unit of assignment becomes
    the chunk: output gains a ``chunk_id`` column, the shuffle key is
    md5(seed:doc_id:chunk_id), and a 200k-token page lands as many
    budget-sized sequences instead of one pack-busting row.

    With ``report=True`` also returns per-stage row counts (one count
    action per stage — the accounting a production run logs; leave it
    off when the caller doesn't need it).
    """
    from ocr_agent_spark.functions.chunking import chunk_documents
    from ocr_agent_spark.functions.dedup import dedup_exact, dedup_near
    from ocr_agent_spark.functions.packing import assign_packs  # noqa: F401
    from ocr_agent_spark.functions.qualityclf import classify_quality
    from ocr_agent_spark.functions.sampling import shard_assign
    from ocr_agent_spark.functions.text import lang_id
    from ocr_agent_spark.functions.webquality import gopher_quality_keep

    counts: list[StageCount] = []

    def gate(stage: str, before: DataFrame, after: DataFrame) -> DataFrame:
        if report:
            counts.append(StageCount(stage, before.count(), after.count()))
        return after

    cur = docs.select(id_col, text_col)
    if lang is not None:
        cur = gate("lang", cur, cur.filter(lang_id(text_col) == lang))
    cur = gate(
        "gopher", cur,
        gopher_quality_keep(cur, id_col, text_col,
                            min_words=min_words, max_words=max_words),
    )
    if clf_weights is not None:
        scores = classify_quality(
            cur, clf_weights, dim=clf_dim, text_col=text_col, id_col=id_col
        ).filter(F.col("prob") >= clf_threshold).select(id_col)
        cur = gate("classifier", cur, cur.join(scores, id_col, "left_semi"))
    cur = gate("dedup_exact", cur, dedup_exact(cur, id_col, text_col))
    if near_threshold is not None:
        cur = gate(
            "dedup_near", cur,
            dedup_near(cur, id_col, text_col, threshold=near_threshold),
        )

    if chunk_target is not None:
        chunks = chunk_documents(cur, chunk_target, id_col=id_col,
                                 text_col=text_col)
        cur = gate("chunk", cur, chunks)
        units = cur.select(
            id_col, "chunk_id",
            F.concat(F.col(id_col).cast("string"), F.lit(":"),
                     F.col("chunk_id").cast("string")).alias("_unit"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
        sharded = shard_assign(units, n_shards, key_col="_unit", seed=seed)
        toks = sharded.select(id_col, "chunk_id", "shuffle_key", "shard",
                              "n_tokens")
        order = [F.col("shuffle_key").asc(), F.col(id_col).asc(),
                 F.col("chunk_id").asc()]
        keep = [id_col, "chunk_id", "n_tokens", "shuffle_key", "shard",
                "pack_id"]
    else:
        sharded = shard_assign(cur, n_shards, key_col=id_col, seed=seed)
        toks = sharded.select(
            id_col, "shuffle_key", "shard",
            F.size(F.expr(rf"regexp_extract_all({text_col}, '\\S+', 0)"))
            .alias("n_tokens"),
        )
        order = [F.col("shuffle_key").asc(), F.col(id_col).asc()]
        keep = [id_col, "n_tokens", "shuffle_key", "shard", "pack_id"]
    # exclusive prefix sum WITHIN the shard, ordered by the shuffle key
    # (the training read order) — bounded by shard size by design.
    w = (
        Window.partitionBy("shard")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # BIGINT `div` (exact) — float `/` truncates past 2^53 prefix tokens
    assigned = toks.withColumn(
        "_prefix", F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).withColumn(
        "pack_id", F.expr(f"_prefix div {int(pack_budget)}L")
    )
    out = assigned.select(*keep)
    if report:
        return out, counts
    return out
