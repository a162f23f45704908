"""A/B output-equality harness for minhash_near_duplicates refactors.

Usage:
    python tools/ab_dedup_equiv.py dump /tmp/pairs_old.json   # at ref tree
    python tools/ab_dedup_equiv.py dump /tmp/pairs_new.json   # at new tree
    python tools/ab_dedup_equiv.py diff /tmp/pairs_old.json /tmp/pairs_new.json

Dumps the FULL verified pair set at $SPARK_GRAFT_SF_DIR (default
_build/sf1.0) as sorted (id_a, id_b, round(jaccard, 9)) tuples — the
equality contract every restructure of the verify stage must meet.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def dump(out_path: str) -> None:
    from ocr_agent_spark.functions.dedup import minhash_near_duplicates
    from ocr_agent_spark.session import build_spark

    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", os.path.join(REPO, "_build", "sf1.0")
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = build_spark(
        app_name="ab-dedup-equiv", cores=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_near_duplicates(docs, threshold=0.5).collect()
    )
    with open(out_path, "w") as fh:
        json.dump(rows, fh)
    print(f"{len(rows)} pairs -> {out_path}")
    spark.stop()


def diff(a_path: str, b_path: str) -> None:
    with open(a_path) as fh:
        a = [tuple(r) for r in json.load(fh)]
    with open(b_path) as fh:
        b = [tuple(r) for r in json.load(fh)]
    if a == b:
        print(f"EQUAL: {len(a)} pairs")
        return
    sa, sb = set(a), set(b)
    print(f"MISMATCH: {len(a)} vs {len(b)} pairs; "
          f"only_old={len(sa - sb)} only_new={len(sb - sa)}")
    for t in sorted(sa ^ sb)[:20]:
        print(("old" if t in sa else "new"), t)
    sys.exit(1)


if __name__ == "__main__":
    if sys.argv[1] == "dump":
        dump(sys.argv[2])
    else:
        diff(sys.argv[2], sys.argv[3])
