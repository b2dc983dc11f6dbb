#!/usr/bin/env python3
"""Reverse-engineer the driver's hash compare.

Tries several plausible compare implementations over the round-2 Verify
dump and reports which queries each one fails, so we can find the
implementation whose failure set matches CORRECTNESS_r02.json exactly
(23 hash-false queries).

Usage: python3 tools/hash_forensics.py <sfDir> <verifyOutDir> <correctnessJson>
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def strat_duck_fetchall_repr(con, out_dir, name, sql):
    """Both sides through duckdb fetchall; compare cell reprs."""
    s = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
    o = con.sql(sql)
    sc, oc = sorted(s.columns), sorted(o.columns)
    if sc != oc:
        return "schema"
    sr = s.select(*[f'"{c}"' for c in sc]).fetchall()
    orr = o.select(*[f'"{c}"' for c in oc]).fetchall()
    if repr(sr) != repr(orr):
        return "hash"
    return None


def strat_pandas_dtype(con, out_dir, name, sql):
    """Spark side via pyarrow->pandas, oracle via duckdb .df(); compare
    dtypes and values."""
    sdf = pq.read_table(f"{out_dir}/{name}").to_pandas()
    odf = con.sql(sql).df()
    sdf = sdf[sorted(sdf.columns)]
    odf = odf[sorted(odf.columns)]
    if list(sdf.columns) != list(odf.columns):
        return "schema"
    if [str(t) for t in sdf.dtypes] != [str(t) for t in odf.dtypes]:
        return "dtype:" + ";".join(
            f"{c}:{a}|{b}" for c, a, b in
            zip(sdf.columns, sdf.dtypes, odf.dtypes) if str(a) != str(b))
    try:
        if not sdf.reset_index(drop=True).equals(odf.reset_index(drop=True)):
            return "hash"
    except Exception as e:
        return f"err:{e}"
    return None


def strat_pandas_values_str(con, out_dir, name, sql):
    """pandas both (pyarrow vs .df()); compare stringified values only."""
    sdf = pq.read_table(f"{out_dir}/{name}").to_pandas()
    odf = con.sql(sql).df()
    sdf = sdf[sorted(sdf.columns)]
    odf = odf[sorted(odf.columns)]
    if list(sdf.columns) != list(odf.columns):
        return "schema"
    a = sdf.astype(str).values.tolist()
    b = odf.astype(str).values.tolist()
    if a != b:
        for i, (ra, rb) in enumerate(zip(a, b)):
            if ra != rb:
                return f"hash@{i}:{ra[:120]}|{rb[:120]}"
        return "hash:len"
    return None


def strat_arrow_schema(con, out_dir, name, sql):
    """pyarrow spark table vs duckdb .arrow(); compare schema then data."""
    st = pq.read_table(f"{out_dir}/{name}")
    ot = con.sql(sql).arrow()
    st = st.select(sorted(st.column_names))
    ot = ot.select(sorted(ot.column_names))
    if st.column_names != ot.column_names:
        return "schema"
    if [str(f.type) for f in st.schema] != [str(f.type) for f in ot.schema]:
        return "atype:" + ";".join(
            f"{a.name}:{a.type}|{b.type}" for a, b in zip(st.schema, ot.schema)
            if str(a.type) != str(b.type))
    if not st.cast(ot.schema).equals(ot.cast(ot.schema)):
        return "hash"
    return None


STRATS = {
    "duck_repr": strat_duck_fetchall_repr,
    "pandas_dtype": strat_pandas_dtype,
    "pandas_str": strat_pandas_values_str,
    "arrow_schema": strat_arrow_schema,
}


def main():
    sf_dir, out_dir, corr_path = sys.argv[1:4]
    corr = json.loads(Path(corr_path).read_text())
    expect_fail = sorted(k for k, v in corr.items()
                         if v.get("hash_match") is False)
    expect_pass = sorted(k for k, v in corr.items()
                         if v.get("hash_match") is True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    print(f"expected fails ({len(expect_fail)}): {expect_fail}\n")
    for sname, fn in STRATS.items():
        fails = {}
        for name in sorted(oracle):
            if not Path(out_dir, name).is_dir():
                continue
            try:
                r = fn(con, out_dir, name, oracle[name])
            except Exception as e:
                r = f"ERR:{type(e).__name__}:{str(e)[:100]}"
            if r:
                fails[name] = r
        fp = sorted(set(fails) - set(expect_fail))   # false positives
        fn_ = sorted(set(expect_fail) - set(fails))  # missed fails
        print(f"== {sname}: {len(fails)} fails; "
              f"extra={fp} missed={fn_}")
        for k, v in sorted(fails.items()):
            print(f"   {k}: {v[:200]}")
        print()


if __name__ == "__main__":
    main()
