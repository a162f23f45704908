"""Mirror-host detection: hosts serving (near-)identical content sets.

Web crawls are full of mirrors — the same site under several domains
(www/apex variants the URL layer already folds, but also true mirrors:
regional clones, CDN vanity domains, scraped re-hosts). Host-level
dedup catches what per-document dedup leaves behind: every document
pair is distinct *within* each host, yet the HOSTS are copies of each
other. The standard detector: per-host content-fingerprint sets, then
pairwise containment ``shared / min(|A|, |B|)``.

Spark-first shape:

- Fingerprints reuse :func:`functions.text.doc_fingerprint` (md5 of
  whitespace-normalized lowercase → engine-portable).
- The pair generation self-joins the (host, fp) table ON fp. The hot
  keys are boilerplate fingerprints shared by MANY hosts (empty pages,
  403 templates, parked-domain stubs) — those explode the join
  quadratically AND carry no mirror signal (a fp on 500 hosts says
  "template", not "mirror"), so fingerprints with host-df >
  ``max_fp_hosts`` are dropped via broadcast anti-join BEFORE the
  self-join (the hot-shingle pattern, functions/dedup.py) and the drop
  is REPORTED per the no-silent-caps rule (``report=True`` → host-df
  stats alongside).
- Pair aggregation has map-side partials; sizes join back on host.

Reference parity: beyond-reference training-data surface; composes
with functions/dedup.py exact dedup (run this first, host-level; then
document-level dedup inside the kept hosts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_agent_spark.functions.text import doc_fingerprint

DEFAULT_MAX_FP_HOSTS = 50


def host_fingerprints(docs: DataFrame, host_col: str = "host",
                      text_col: str = "text") -> DataFrame:
    """Distinct (host, fp) pairs — each host's content set."""
    return docs.select(
        F.col(host_col).alias("host"),
        doc_fingerprint(text_col).alias("fp"),
    ).distinct()


def fingerprint_host_df_stats(hf: DataFrame,
                              max_fp_hosts: int) -> DataFrame:
    """No-silent-caps report: how many fingerprints the df-cap drops."""
    per_fp = hf.groupBy("fp").agg(F.count(F.lit(1)).alias("n_hosts"))
    return per_fp.agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.max("n_hosts").alias("max_hosts_per_fp"),
        F.sum((F.col("n_hosts") > max_fp_hosts).cast("long"))
        .alias("n_fps_dropped_by_cap"),
    )


def mirror_host_pairs(docs: DataFrame, host_col: str = "host",
                      text_col: str = "text",
                      min_containment: float = 0.8,
                      min_shared: int = 2,
                      max_fp_hosts: int = DEFAULT_MAX_FP_HOSTS) -> DataFrame:
    """(host_a, host_b, shared, size_a, size_b, containment) for pairs
    with ``containment >= min_containment`` and ``shared >=
    min_shared``; ``host_a < host_b``.

    ``containment = shared / min(size_a, size_b)`` (sizes = distinct
    fingerprints AFTER the df-cap, so both sides of the ratio live in
    the same filtered universe and a full mirror still scores 1.0).
    """
    hf = host_fingerprints(docs, host_col, text_col)
    per_fp = hf.groupBy("fp").agg(F.count(F.lit(1)).alias("_n_hosts"))
    hot = per_fp.filter(F.col("_n_hosts") > max_fp_hosts).select("fp")
    cold = hf.join(F.broadcast(hot), "fp", "left_anti")
    from ocr_agent_spark.cache import persist_tracked

    cold = persist_tracked(cold)
    sizes = cold.groupBy("host").agg(F.count(F.lit(1)).alias("size"))
    a = cold.select(F.col("host").alias("host_a"), "fp")
    b = cold.select(F.col("host").alias("host_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return (
        pairs.join(
            sizes.select(F.col("host").alias("host_a"),
                         F.col("size").alias("size_a")),
            "host_a",
        )
        .join(
            sizes.select(F.col("host").alias("host_b"),
                         F.col("size").alias("size_b")),
            "host_b",
        )
        .withColumn(
            "containment",
            F.col("shared") / F.least("size_a", "size_b"),
        )
        .filter(F.col("containment") >= min_containment)
        .select("host_a", "host_b", "shared", "size_a", "size_b",
                "containment")
    )
