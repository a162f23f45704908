"""Scaling-efficiency evidence for the north rule (N vs 4N executors).

No real cluster exists in this sandbox, so cluster-size scaling is
evidenced by running the IDENTICAL extraction job at two parallelism
levels — local[8] (N) and local[32] (4N) — on the same materialized
input, each in a fresh JVM (subprocess), reporting throughput at both
and efficiency = T8/(4·T32) = throughput32/(4·throughput8).

Usage:
  python tools/scaling_bench.py [n_docs]         # orchestrator
  python tools/scaling_bench.py --worker CORES N # one measured run
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(cores: int, n_docs: int) -> None:
    sys.path.insert(0, REPO)
    from ocr_agent_spark.operators.extract import extract_tasks
    from ocr_agent_spark.operators.ingest import build_task_table
    from ocr_agent_spark.session import build_spark

    import bench

    pages_path = bench.ensure_pages_corpus(n_docs / bench.DOCS_PER_SF)

    spark = build_spark(
        app_name=f"scaling-{cores}", cores=cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path)

    # Warm-up pass (JIT, Python workers, file listing) — not measured.
    extract_tasks(build_task_table(pages), repartition=False).count()

    t0 = time.monotonic()
    n = extract_tasks(build_task_table(pages), repartition=False).count()
    wall = time.monotonic() - t0
    print(json.dumps({"cores": cores, "docs": n, "sec": round(wall, 3),
                      "docs_per_sec": round(n / wall, 2)}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(cores), str(n_docs)],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line)

    t8, t32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
    eff = t32 / (4 * t8)
    print(json.dumps({
        "metric": "scaling_efficiency_8_to_32_cores",
        "throughput_local8_docs_per_sec": t8,
        "throughput_local32_docs_per_sec": t32,
        "efficiency": round(eff, 3),
        "target": 0.8,
        "docs": n_docs,
    }))


if __name__ == "__main__":
    main()
