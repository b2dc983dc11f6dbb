#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each <verifyOutDir>/<name>/ parquet dump written by graft.Verify,
runs the paired SQL from <verifyOutDir>/oracle_sql.json in DuckDB over
the same parquet tables, then compares: column names (sorted), row
count, and cell-by-cell values in result order. Exit 0 iff all match.
"""
import json
import math
import sys
from decimal import Decimal
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, Decimal):
        return ("num", float(v))
    if isinstance(v, float):
        return ("num", v)
    if isinstance(v, int):
        return ("num", float(v))
    return ("v", v)


def cells_equal(a, b):
    ka, va = norm(a)
    kb, vb = norm(b)
    if ka != kb:
        return False
    if ka == "num":
        if va is None or vb is None:
            return va is vb
        if math.isnan(va) and math.isnan(vb):
            return True
        return va == vb
    return va == vb


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    results = {}
    dumped = {p.name for p in Path(out_dir).iterdir() if p.is_dir()}
    for name in sorted(oracle):
        if name not in dumped:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            ora_rel = con.sql(oracle[name])
            scols = spark_rel.columns
            ocols = ora_rel.columns
            if sorted(scols) != sorted(ocols):
                results[name] = f"SCHEMA: spark={sorted(scols)} oracle={sorted(ocols)}"
                continue
            # Driver sorts columns by name before hashing.
            srows = spark_rel.select(*[f'"{c}"' for c in sorted(scols)]).fetchall()
            orows = ora_rel.select(*[f'"{c}"' for c in sorted(ocols)]).fetchall()
            if len(srows) != len(orows):
                results[name] = f"ROWS: spark={len(srows)} oracle={len(orows)}"
                continue
            bad = None
            for i, (sr, orr) in enumerate(zip(srows, orows)):
                for j, (a, b) in enumerate(zip(sr, orr)):
                    if not cells_equal(a, b):
                        bad = (i, sorted(scols)[j], a, b)
                        break
                if bad:
                    break
            results[name] = "OK" if not bad else \
                f"VALUE: row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}"
        except Exception as e:
            results[name] = f"ERROR: {type(e).__name__}: {str(e)[:300]}"
    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, v in results.items():
        if v != "OK":
            print(f"FAIL {name}: {v}")
    # queries with no oracle: rows-only check
    for name in sorted(dumped - set(oracle)):
        try:
            n = con.sql(
                f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
            print(f"NOORACLE {name}: rows={n}" + ("" if n > 0 else "  <-- EMPTY"))
        except Exception as e:
            print(f"NOORACLE {name}: ERROR {e}")
    print(f"\n{n_ok}/{len(oracle)} oracle-paired queries OK")
    sys.exit(0 if n_ok == len(oracle) else 1)


if __name__ == "__main__":
    main()
