"""A/B adjudication of the dedup_minhash bucket-cap cost (VERDICT r5 #3).

The r5 driver bench showed dedup_minhash 5.43 s (r4, no banding cap) →
6.28 s (r5, count-window cap). This times the full
``minhash_near_duplicates(docs, threshold=0.5).count()`` bench body at
sf0.1 under three cap implementations in ONE session, interleaved
round-robin so host drift hits all variants equally:

  antijoin — r6 redesign: broadcast anti-join against the hot-bucket set
  window   — r5 formulation: count-window over (band, bucket)
  nocap    — cap disabled (r4 behavior)

Usage: python tools/ab_dedup_cap.py [sf_dir] [repeats]
Prints one JSON line with per-variant raw timings + medians.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ocr_agent_spark.functions import dedup
    from ocr_agent_spark.session import build_spark

    spark = build_spark(app_name="ab-dedup-cap", cores=32,
                        shuffle_partitions=32,
                        extra_conf={"spark.ui.showConsoleProgress": "false"})
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.count()  # warm the scan

    antijoin_impl = dedup._lsh_band_pairs_from_banded

    def window_impl(banded, max_bucket_size=10_000):
        w = Window.partitionBy("band", "bucket")
        capped = (
            banded.withColumn("_bsz", F.count(F.lit(1)).over(w))
            .filter(F.col("_bsz") <= max_bucket_size)
            .drop("_bsz")
        )
        return (
            capped.alias("a")
            .join(capped.alias("b"), ["band", "bucket"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("id_a"),
                    F.col("b.doc_id").alias("id_b"))
            .distinct()
        )

    def nocap_impl(banded, max_bucket_size=10_000):
        return antijoin_impl(banded, max_bucket_size=1 << 60)

    variants = {"antijoin": antijoin_impl, "window": window_impl,
                "nocap": nocap_impl}
    times: dict[str, list[float]] = {k: [] for k in variants}
    counts: dict[str, int] = {}

    for i in range(repeats):
        for name, impl in variants.items():
            dedup._lsh_band_pairs_from_banded = impl
            try:
                spark.catalog.clearCache()
                t0 = time.monotonic()
                n = dedup.minhash_near_duplicates(
                    docs, threshold=0.5
                ).count()
                times[name].append(round(time.monotonic() - t0, 3))
                counts[name] = n
            finally:
                dedup._lsh_band_pairs_from_banded = antijoin_impl

    with open("/proc/loadavg") as fh:
        load = fh.read().split()[0]
    out = {
        "sf_dir": sf_dir, "repeats": repeats, "loadavg_end": float(load),
        "counts": counts,
        "raw": times,
        "median": {k: round(statistics.median(v), 3)
                   for k, v in times.items()},
    }
    print(json.dumps(out))
    assert len(set(counts.values())) == 1, f"variants disagree: {counts}"
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
