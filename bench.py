"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": <sf>, "extraction_docs_per_sec": ...}

Headline set:
  extract      — the flagship: synthetic pages corpus (scaled to sf) →
                 task build → vectorized extraction → count
  merge        — ordered two-phase merge of the extracted output
  q1/q3        — TPC-H-style aggregation + 3-way join over sf tables
  dedup_minhash— MinHash+LSH near-dup over documents
  ann_topk     — brute-force cosine top-k over embeddings
  text_stats   — lang-id + token + quality aggregation over documents

The synthetic pages corpus is materialized once per (sf, n) under
_build/ and reused (deterministic, so safe to cache).
"""

from __future__ import annotations

import json
import os
import time

REPO = os.path.dirname(os.path.abspath(__file__))

# ~2000 docs per 0.01 sf → 20k docs at sf0.1 (HTML ~3 KB each + PDFs).
DOCS_PER_SF = 200_000


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


# Bump when write_pages_parquet's output changes (content OR schema) so
# cached corpora regenerate instead of silently serving the old shape.
# v2: ingest-time doc_bytes/is_pdf metadata columns (round 3).
CORPUS_VERSION = "v2"


def ensure_pages_corpus(sf: float) -> str:
    from ocr_agent_spark.fixtures import write_pages_parquet

    n = max(int(sf * DOCS_PER_SF), 500)
    path = os.path.join(REPO, "_build", f"pages_n{n}")
    marker = os.path.join(path, "_SUCCESS")
    stamp = None
    if os.path.exists(marker):
        with open(marker) as fh:
            stamp = fh.read().strip()
    if stamp != CORPUS_VERSION:
        import shutil

        if os.path.exists(path):
            shutil.rmtree(path)
        write_pages_parquet(path, n)
        with open(marker, "w") as fh:
            fh.write(CORPUS_VERSION)
    return path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = _sf_from_dir(sf_dir)

    import sys

    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from ocr_agent_spark.functions.dedup import minhash_near_duplicates
    from ocr_agent_spark.functions.similarity import cosine_topk
    from ocr_agent_spark.functions.text import text_profile
    from ocr_agent_spark.operators.extract import extract_pages_fused
    from ocr_agent_spark.operators.merge import merge_extracted_to_markdown
    from ocr_agent_spark.session import build_spark

    import __spark_entry__ as entrymod

    pages_path = ensure_pages_corpus(sf)

    spark = build_spark(
        app_name="ocr-agent-spark-bench", cores=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    run_loads: dict[str, list[float]] = {}
    run_stamps: dict[str, list[float]] = {}
    extra: dict = {}
    # Median-of-N per query (default 3): this shared host shows ±50%
    # noise windows lasting minutes (r3's merge read 3.27 s in the
    # driver artifact vs a 1.3-1.5 s controlled in-session median-of-5
    # in r4's A/B), so a single-shot timing records the weather, not
    # the code. The medians are the headline; every raw run is kept in
    # "runs" for transparency.
    repeats = max(int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")), 1)

    def loadavg() -> float:
        # 1-minute host load — recorded per repeat so a reading taken
        # during a noisy host window is self-adjudicating (r5/r6 both
        # needed manual A/B arbitration to separate load from code).
        try:
            with open("/proc/loadavg") as fh:
                return float(fh.read().split()[0])
        except OSError:
            return -1.0

    bench_t0 = time.time()
    extra["loadavg_start"] = loadavg()

    def timed(name: str, fn, per_run_reset=None):
        import statistics

        out = None
        runs: list[float] = []
        loads: list[float] = []
        stamps: list[float] = []
        for i in range(repeats):
            if per_run_reset is not None and i > 0:
                per_run_reset()
            stamps.append(round(time.time() - bench_t0, 3))
            t0 = time.monotonic()
            out = fn()
            runs.append(round(time.monotonic() - t0, 3))
            loads.append(loadavg())
        all_runs[name] = runs
        run_loads[name] = loads
        run_stamps[name] = stamps
        timings[name] = round(statistics.median(runs), 3)
        return out

    # -- flagship extraction -------------------------------------------------
    pages = spark.read.parquet(pages_path)

    # Warm-up (Python workers, JIT, page cache) — excluded from timing
    # so the recorded number reflects steady-state throughput, not JVM
    # cold start; the sandbox host is shared and noisy.
    extract_pages_fused(pages).count()

    def run_extract():
        # The fused hot path: one payload pass, zero payload shuffles.
        extracted = extract_pages_fused(pages)
        out = os.path.join(REPO, "_build", "bench_extracted")
        extracted.write.mode("overwrite").parquet(out)
        return out

    out_path = timed("extract", run_extract)
    extracted = spark.read.parquet(out_path)
    n_extracted = extracted.count()
    extra["extraction_docs_per_sec"] = round(n_extracted / timings["extract"], 2)
    extra["extraction_docs"] = n_extracted

    timed("merge", lambda: len(merge_extracted_to_markdown(extracted)))

    # -- analytics over driver testdata --------------------------------------
    qs = entrymod.queries()
    timed("q1_pricing_summary", lambda: qs["q1_pricing_summary"](spark, sf_dir).collect())
    timed("q3_top_revenue", lambda: qs["q3_top_revenue"](spark, sf_dir).collect())

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # Warm-up (shingle/signature codegen + Python workers) — excluded
    # from timing, same policy as the extraction warm-up above.
    from ocr_agent_spark.cache import release_caches

    minhash_near_duplicates(docs, threshold=0.5).count()
    release_caches()
    timed(
        "dedup_minhash",
        lambda: minhash_near_duplicates(docs, threshold=0.5).count(),
        per_run_reset=release_caches,
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [1.0 if i % 3 == 0 else (-0.5 if i % 3 == 1 else 0.25) for i in range(64)]
    timed("ann_topk", lambda: cosine_topk(emb, qvec, k=10).collect())
    timed(
        "text_stats",
        lambda: text_profile(docs)
        .groupBy("predicted_lang")
        .agg(F.count(F.lit(1)), F.avg("n_tokens"), F.avg("quality"))
        .collect(),
    )

    total = round(sum(timings.values()), 3)
    extra["loadavg_end"] = loadavg()
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": all_runs,
                # per-repeat 1-min loadavg + seconds-since-bench-start:
                # a regression whose repeats carry loadavg >> cpus is
                # host weather, not code (see BENCH/BASELINE.md)
                "run_loadavg": run_loads,
                "run_offsets_sec": run_stamps,
                "repeats": repeats,
                "sf": sf,
                "cpus": cpus,
                **extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
