"""Scale-ladder: derive an sf1.0 dataset from the driver's sf0.1 and
run the headline bench against it (VERDICT r4 item 2).

The driver ships sf{0.001,0.01,0.1}; the 2× scaling rule needs evidence
that the expensive queries scale ~linearly past that, so this tool
materializes ``_build/sf1.0/`` as a DETERMINISTIC 10× replication of
``/root/testdata/sf0.1`` (never touching /root/testdata):

- join keys are offset per replica (k * (max_key + 1)) so orders ↔
  lineitem ↔ customer cardinalities scale linearly and q1/q3 keep their
  selectivity;
- ``documents.text`` gets a per-replica suffix on EVERY token
  (regexp ``$1·rK``), so replicas share ZERO shingles — cross-replica
  jaccard is 0 and the dedup workload grows linearly (10 identical
  copies of each doc would instead explode the LSH candidate set ~50×
  — a different, pathological workload, not a scale-up);
- ``embeddings`` replicas keep their vectors (cosine is
  scale-invariant; the ANN bench times the scan, and top-k ties
  resolve deterministically by id).

Then runs ``bench.py`` with SPARK_GRAFT_SF_DIR=_build/sf1.0 (the dir
name parses to sf=1.0, so the pages corpus scales to 200k docs too)
and prints the one-line JSON. Compare per-query medians against the
sf0.1 numbers in BENCH_r*.json: each should be ≤ ~10× its sf0.1
median, else the superlinear stage needs naming and fixing.

Usage: python tools/scale_ladder.py [--force] [--build-only]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, "_build", "sf1.0")
REPLICAS = 10
VERSION = "v1"


def materialize(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)

    def replicate(table: str, offsets: dict[str, int], transform=None):
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        parts = []
        for k in range(REPLICAS):
            p = df
            for col, span in offsets.items():
                p = p.withColumn(col, F.col(col) + F.lit(k * span))
            if transform is not None:
                p = transform(p, k)
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{table}.parquet")

    def span(table: str, col: str) -> int:
        return (
            spark.read.parquet(f"{SRC}/{table}.parquet")
            .agg(F.max(col)).collect()[0][0] + 1
        )

    doc_span = span("documents", "doc_id")

    def perturb_docs(p, k):
        if k == 0:
            return p
        # suffix every token: replicas share no 3-gram shingles
        return p.withColumn(
            "text", F.regexp_replace("text", r"(\S+)", f"$1·r{k}")
        )

    replicate("documents", {"doc_id": doc_span}, perturb_docs)
    replicate("embeddings", {"vec_id": span("embeddings", "vec_id")})
    ok_span = span("orders", "o_orderkey")
    ck_span = span("customer", "c_custkey")
    replicate("lineitem", {"l_orderkey": ok_span})
    replicate("orders", {"o_orderkey": ok_span, "o_custkey": ck_span})
    replicate("customer", {"c_custkey": ck_span})
    # small/dimension + events tables: copied as-is (bench does not
    # scale them; queries().sweep runs at sf0.01, not here)
    for t in ("region", "nation", "supplier", "part", "events"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{DST}/{t}.parquet")
    with open(os.path.join(DST, "_LADDER_VERSION"), "w") as fh:
        fh.write(VERSION)


def main() -> int:
    force = "--force" in sys.argv
    sys.path.insert(0, REPO)
    marker = os.path.join(DST, "_LADDER_VERSION")
    stamp = open(marker).read().strip() if os.path.exists(marker) else None
    if force or stamp != VERSION:
        from ocr_agent_spark.session import build_spark

        spark = build_spark(
            app_name="scale-ladder-build",
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        materialize(spark)
        spark.stop()
        print(f"materialized {DST}", file=sys.stderr)
    if "--build-only" in sys.argv:
        return 0
    os.environ["SPARK_GRAFT_SF_DIR"] = DST
    import bench

    bench.main()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
