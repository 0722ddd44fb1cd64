#!/usr/bin/env python3
"""Replicate the driver's correctness compare locally (driver-side
verification tooling only — duckdb/pandas/pyarrow are NOT code deps).

Usage:
  python3 tools/oracle_compare.py <sfDir> <verifyOutDir> [q_name ...]

For each query (default: every one in <verifyOutDir>/oracle_sql.json):
  1. read the Spark result parquet from <verifyOutDir>/<name>/
  2. run the oracle SQL in DuckDB against VIEWS named after the tables
     (equivalent to the driver's FROM/JOIN-position substitution, but
     immune to the alias-rewrite pitfall the verify skill warns about)
  3. sort columns by name, sort rows by all columns, compare shape,
     column names and exact values (floats must be bit-identical — the
     battery is engineered for that).
"""
import sys
import glob
import json

import duckdb
import pandas as pd


TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sfdir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def compare(con: duckdb.DuckDBPyConnection, name: str, outdir: str,
            sql: str) -> dict:
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return {"err": "no spark output"}
    spark_df = con.sql(
        f"SELECT * FROM read_parquet({files!r})").df()
    oracle_df = con.sql(sql).df()
    s, o = canon(spark_df), canon(oracle_df)
    res = {
        "rows_match": len(s) == len(o),
        "schema_match": list(s.columns) == list(o.columns),
        "spark_rows": len(s),
        "oracle_rows": len(o),
    }
    if res["rows_match"] and res["schema_match"]:
        mism = []
        for c in s.columns:
            a, b = s[c], o[c]
            eq = (a == b) | (a.isna() & b.isna())
            if not bool(eq.all()):
                mism.append((c, int((~eq).sum())))
        res["values_match"] = not mism
        if mism:
            res["mismatch_cols"] = mism
    else:
        res["values_match"] = False
    return res


def main() -> None:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)
    names = sys.argv[3:] or sorted(oracles)
    con = connect(sfdir)
    bad = 0
    for name in names:
        if name not in oracles:
            print(f"{name}: NOT IN oracle_sql.json")
            bad += 1
            continue
        try:
            r = compare(con, name, outdir, oracles[name])
        except Exception as e:  # noqa: BLE001 - report and continue
            r = {"err": f"{type(e).__name__}: {e}"}
        ok = r.get("values_match", False)
        bad += 0 if ok else 1
        print(f"{name}: {'GREEN' if ok else 'FAIL'} {json.dumps(r, default=str)}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
