"""Driver-style correctness self-check: queries() vs oracle_sql() via DuckDB.

Mimics the per-round CORRECTNESS gate: for every query name, run the
Spark DataFrame and the DuckDB oracle SQL on the same parquet tables,
then compare row count + column names + an order-insensitive value
hash (columns sorted by name, rows sorted, floats rounded).

Usage: python tools/selfcheck.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode("utf-8", "replace"))
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from ocr_agent_spark.session import build_spark

    spark = build_spark(
        app_name="selfcheck", cores=8, shuffle_partitions=8,
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
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            # Replicate the driver's rows-only canonicalization exactly:
            # it pandas-sort_values over ALL columns before hashing, which
            # raises TypeError on array/map/struct cells (unhashable list)
            # — r3's one red row shipped because selfcheck skipped this.
            try:
                if len(sdf.columns):
                    sdf.sort_values(by=list(sdf.columns), kind="mergesort")
            except Exception as exc:
                print(f"FAIL  {name}: rows-only canonicalization error "
                      f"(driver would record err): {exc!r}")
                n_fail += 1
                continue
            if name == "approx_distinct_users":
                # No cross-engine oracle (HLL sketches are engine-
                # specific) but a falsifiable bound: |est − exact| /
                # exact < 3·rsd with rsd=0.05 (the
                # approx_count_distinct default).
                approx, exact = int(sdf["approx_users"][0]), int(sdf["exact_users"][0])
                rel = abs(approx - exact) / max(exact, 1)
                if rel >= 0.15:
                    print(f"FAIL  {name}: HLL estimate {approx} vs exact "
                          f"{exact} — rel err {rel:.4f} >= 3·rsd (0.15)")
                    n_fail += 1
                    continue
                print(f"ROWS  {name}: {len(sdf)} rows (no oracle; "
                      f"HLL rel err {rel:.4f} < 0.15 bound)")
                n_rowsonly += 1
                continue
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle)")
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL  {name}: oracle error: {exc}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not problems and value_hash(sdf) != value_hash(odf):
            problems.append("value-hash mismatch")
            merged = sdf.reindex(sorted(sdf.columns), axis=1)
            om = odf.reindex(sorted(odf.columns), axis=1)
            print(f"      spark head:\n{merged.head(3)}")
            print(f"      oracle head:\n{om.head(3)}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"OK    {name}: {len(sdf)} rows")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
