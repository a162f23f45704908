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


def worker(cores: int, n_docs: int, reps: int = 3) -> None:
    sys.path.insert(0, REPO)
    from ocr_agent_spark.operators.extract import extract_pages_fused
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
    extract_pages_fused(pages).count()

    # Median of `reps` — the sandbox is a shared host with noisy
    # neighbors; single-shot walls vary ±2-3x.
    walls = []
    n = 0
    for _ in range(reps):
        t0 = time.monotonic()
        n = extract_pages_fused(pages).count()
        walls.append(time.monotonic() - t0)
    walls.sort()
    wall = walls[len(walls) // 2]
    print(json.dumps({"cores": cores, "docs": n, "sec": round(wall, 3),
                      "all_secs": [round(w, 3) for w in walls],
                      "docs_per_sec": round(n / wall, 2)}))
    spark.stop()


def _burn(seconds: float) -> int:
    t0 = time.monotonic()
    x = 0
    while time.monotonic() - t0 < seconds:
        x += 1
    return x


def cpu_control(cores: int, seconds: float = 2.0) -> float:
    """Raw-CPU control: aggregate Python iteration throughput with
    ``cores`` busy workers. Quantifies how much parallel speedup the
    (shared, noisy) host actually offers at this level, independent of
    Spark — the ceiling any job can reach."""
    import multiprocessing as mp

    with mp.Pool(cores) as pool:
        t0 = time.monotonic()
        total = sum(pool.map(_burn, [seconds] * cores))
        wall = time.monotonic() - t0
    return total / wall


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return

    # Default sized so per-task kernel work dominates the ~2-3 s fixed
    # scan/scheduling floor (post round-2 kernel speedups, 20k docs
    # finish so fast at high core counts that the floor masks scaling).
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500000
    # Every Spark task here runs a JVM thread AND a Python worker, so
    # local[N] keeps ~2N threads busy. On this 32-core box local[32]
    # oversubscribes (64 threads) — local[16] measurably beats it. The
    # N→4N pairs are chosen so both levels stay under the physical core
    # count: (4,16) uncontended, (8,32) with the upper level contended
    # (reported with the host-ceiling control for context).
    core_levels = (4, 8, 16, 32)
    results = {}
    for cores in core_levels:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(cores), str(n_docs)],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line)

    controls = {c: cpu_control(c) for c in core_levels}
    for lo, hi in ((4, 16), (8, 32)):
        t_lo = results[lo]["docs_per_sec"]
        t_hi = results[hi]["docs_per_sec"]
        eff = t_hi / (4 * t_lo)
        ctrl_eff = controls[hi] / (4 * controls[lo])
        print(json.dumps({
            "metric": f"scaling_efficiency_{lo}_to_{hi}_cores",
            f"throughput_local{lo}_docs_per_sec": t_lo,
            f"throughput_local{hi}_docs_per_sec": t_hi,
            "efficiency": round(eff, 3),
            "host_cpu_control_efficiency": round(ctrl_eff, 3),
            "efficiency_vs_host_ceiling": round(eff / ctrl_eff, 3) if ctrl_eff else None,
            "target": 0.8,
            "docs": n_docs,
        }))


if __name__ == "__main__":
    main()
