"""Crawl-delta: classify urls between two crawl snapshots.

Incremental pipelines re-crawl and want the DELTA, not the corpus:
which urls are new, which disappeared, which changed content, which
are byte-identical (and can skip re-extraction / re-dedup / re-index
entirely). One full-outer join on the url key + a fingerprint compare
— pure JVM, one shuffle per side on the slim (key, fingerprint)
projection, payloads never move. At 10^12 documents pair it with the
url-hash bucketed tables (sources/bucketed.py): co-bucketed snapshots
make even that shuffle disappear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUS_NEW = "new"
STATUS_GONE = "gone"
STATUS_CHANGED = "changed"
STATUS_UNCHANGED = "unchanged"


def crawl_delta(old: DataFrame, new: DataFrame, key: str = "url",
                fingerprint: str = "fingerprint") -> DataFrame:
    """(key, fingerprint) snapshots → (key, status, old/new fingerprints).

    ``status``: ``new`` (key only in the new crawl), ``gone`` (only in
    the old), ``changed`` (both, fingerprints differ), ``unchanged``.
    Duplicate keys within a snapshot should be resolved upstream
    (latest ``warc_ts`` wins — operators/ingest.py revisit policy).
    """
    # presence comes from JOIN MEMBERSHIP, not fingerprint nullness: a
    # failed-extraction row carries a NULL fingerprint but its url is
    # still present in that crawl (code-review r4d)
    o = old.select(F.col(key).alias(key),
                   F.col(fingerprint).alias("old_fingerprint"),
                   F.lit(True).alias("_in_old"))
    n = new.select(F.col(key).alias(key),
                   F.col(fingerprint).alias("new_fingerprint"),
                   F.lit(True).alias("_in_new"))
    joined = o.join(n, key, "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit(STATUS_NEW))
        .when(F.col("_in_new").isNull(), F.lit(STATUS_GONE))
        .when(F.col("old_fingerprint").eqNullSafe(F.col("new_fingerprint")),
              F.lit(STATUS_UNCHANGED))
        .otherwise(F.lit(STATUS_CHANGED))
    )
    return joined.select(key, status.alias("status"),
                         "old_fingerprint", "new_fingerprint")


def delta_counts(delta: DataFrame) -> DataFrame:
    """status histogram of a delta — the re-crawl report line."""
    return delta.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
