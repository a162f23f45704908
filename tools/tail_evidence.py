"""Record in-repo oracle evidence for the rotation-tail queries.

The external driver's CORRECTNESS sweep covers only the first 50
``queries()`` entries, so the parked tail's driver evidence ages while
unswept (ADVICE r3). This tool re-runs every tail entry against its
DuckDB oracle locally and writes ``TAIL_EVIDENCE.json``:
``{name: {spark_hash, oracle_hash, match, rows, sf_dir, recorded}}`` —
committed alongside each rotation so the parked set always has fresh,
re-checkable hash history in the repo itself.

Usage: python tools/tail_evidence.py [sf_dir]
"""

from __future__ import annotations

import datetime
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from selfcheck import TABLES, value_hash  # noqa: E402

SWEEP_WINDOW = 50


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entrymod
    from ocr_agent_spark.session import build_spark

    spark = build_spark(
        app_name="tail-evidence", cores=8, shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    tail = list(qs)[SWEEP_WINDOW:]
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d")
    out: dict[str, dict] = {}
    bad = 0
    for name in tail:
        sdf = qs[name](spark, sf_dir).toPandas()
        odf = con.execute(oracles[name]).df()
        sh, oh = value_hash(sdf), value_hash(odf)
        match = sh == oh and len(sdf) == len(odf)
        bad += 0 if match else 1
        out[name] = {
            "spark_hash": sh, "oracle_hash": oh, "match": match,
            "rows": len(sdf), "sf_dir": sf_dir, "recorded": stamp,
        }
        print(f"{'OK  ' if match else 'FAIL'} {name}: {len(sdf)} rows")

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "TAIL_EVIDENCE.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"\nwrote {path}: {len(out)} tail queries, {bad} mismatches")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
