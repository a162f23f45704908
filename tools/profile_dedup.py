"""Stage-level profiler for the dedup_minhash bench query (guide §1).

Isolates each phase of minhash_near_duplicates with noop sinks so the
shares are visible independent of the final count() action. Prints one
JSON line. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python tools/profile_dedup.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from pyspark.sql import functions as F

    from ocr_agent_spark.cache import release_caches
    from ocr_agent_spark.functions.dedup import (
        _lsh_band_pairs_from_banded,
        _minhash_banded_table,
        minhash_near_duplicates,
        minhash_signatures_from_shingles,
        ngram_jaccard_from_shingles,
        shingle_table,
    )
    from ocr_agent_spark.session import build_spark

    spark = build_spark(
        app_name="profile-dedup", cores=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    timings: dict[str, float] = {}

    def timed(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        return out

    # Warm-up full pipeline once (JIT, page cache), mirroring bench.py.
    minhash_near_duplicates(docs, threshold=0.5).count()
    release_caches()

    # --- stage isolation (fresh compute per stage; caches released) ---
    sh = shingle_table(docs)
    timed("1_shingle_table_noop", lambda: noop(sh))
    timed("1b_shingle_count", lambda: sh.count())

    sig = minhash_signatures_from_shingles(sh)
    timed("2_signatures_noop", lambda: noop(sig))

    banded = _minhash_banded_table(sig, 32, 8)
    timed("3_banded_noop", lambda: noop(banded))

    cands = _lsh_band_pairs_from_banded(banded)
    timed("4_candidates_noop", lambda: noop(cands))

    # verify stage over candidate shingles, as the real pipeline scopes
    # it (r8b shape: no shingle cache, no cand_ids distinct — the scope
    # is the re-shingled pruned docs)
    cand_p = _lsh_band_pairs_from_banded(banded).persist()
    timed("5_candidates_persisted_noop", lambda: noop(cand_p))
    cand_ids = (
        cand_p.select(F.col("id_a").alias("doc_id"))
        .union(cand_p.select(F.col("id_b").alias("doc_id")))
    )
    from ocr_agent_spark.functions.dedup import _jaccard_for_pairs

    pruned = docs.join(cand_ids, docs["doc_id"] == cand_ids["doc_id"],
                       "left_semi")
    verified = _jaccard_for_pairs(
        cand_p, shingle_table(pruned, widen=False), 0.5, 1000
    )
    timed("6_verify_noop", lambda: noop(verified))
    timed("7_verify_count", lambda: verified.count())
    cand_p.unpersist()

    # --- end-to-end repeats, bench-identical ---
    for i in range(2):
        release_caches()
        timed(f"8_full_count_run{i}",
              lambda: minhash_near_duplicates(docs, threshold=0.5).count())
        release_caches()

    def loadavg():
        with open("/proc/loadavg") as fh:
            return float(fh.read().split()[0])

    print(json.dumps({"timings": timings, "cpus": cpus,
                      "sf_dir": sf_dir, "loadavg": loadavg()}))
    spark.stop()


if __name__ == "__main__":
    main()
