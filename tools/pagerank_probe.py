"""Deep-loop PageRank probe: 50 iterations on a planted 10M-edge graph.

Evidence for the r7 lineage-cut + folded-dangling-mass rework
(functions/pagerank.py): before it, the analyzed plan doubled per
round (two references to the previous ranks) and every iteration ran
an extra dangling-mass job — 50 iterations were unplannable. This
probe builds a deterministic scale-free-ish host graph (10M edges,
~1M hosts, heavy-tailed in-degree so the contribution aggregate sees
real hot keys plus a dangling cohort), runs 50 damped iterations, and
reports wall time, per-iteration pace, plan size of the returned
DataFrame, and mass conservation.

Usage: python tools/pagerank_probe.py [n_edges] [iterations]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    iterations = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from pyspark.sql import functions as F

    from ocr_agent_spark.functions.pagerank import host_pagerank
    from ocr_agent_spark.session import build_spark

    spark = build_spark(
        app_name="pagerank-probe", cores=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Deterministic heavy-tailed digraph over ~n_edges/10 hosts:
    # dst = id^2 mod H concentrates mass (hot keys), src = id mod H;
    # hosts whose id never appears as src % H are dangling.
    h = max(n_edges // 10, 1000)
    edges = spark.range(n_edges).select(
        F.concat(F.lit("h"), (F.col("id") % h).cast("string")).alias("src"),
        F.concat(F.lit("h"),
                 ((F.col("id") * F.col("id") + 7) % (h // 2))
                 .cast("string")).alias("dst"),
    )

    with open("/proc/loadavg") as fh:
        load0 = float(fh.read().split()[0])
    t0 = time.monotonic()
    ranks = host_pagerank(edges, iterations=iterations)
    mass = ranks.agg(F.sum("rank")).collect()[0][0]
    wall = time.monotonic() - t0
    plan_chars = len(ranks._jdf.queryExecution().analyzed().toString())
    with open("/proc/loadavg") as fh:
        load1 = float(fh.read().split()[0])
    print(json.dumps({
        "n_edges": n_edges, "iterations": iterations,
        "wall_sec": round(wall, 2),
        "sec_per_iteration": round(wall / iterations, 3),
        "analyzed_plan_chars": plan_chars,
        "total_mass": round(mass, 6),
        "loadavg_start": load0, "loadavg_end": load1,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
