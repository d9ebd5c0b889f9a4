#!/usr/bin/env python3
"""Local approximation of the driver's DuckDB correctness gate.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json + per-query parquet dirs written by
`graft.Verify`, runs each oracle SQL in DuckDB over the sf parquet
tables, and compares rows / schema(column names) / value hash the way
the driver does (columns sorted by name, values stringified).
"""
import json, sys, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # stringify everything for a stable compare
    return df.astype(str).reset_index(drop=True)


def h(df: pd.DataFrame) -> str:
    return hashlib.md5(
        df.to_csv(index=False).encode()).hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except duckdb.Error:
            pass
    failures = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except duckdb.Error as e:
            print(f"{name}: NO SPARK OUTPUT ({e})")
            failures += 1
            continue
        try:
            oracle = con.execute(sql).df()
        except duckdb.Error as e:
            print(f"{name}: ORACLE SQL ERROR ({e})")
            failures += 1
            continue
        s, o = norm(spark), norm(oracle)
        rows = len(s) == len(o)
        schema = list(s.columns) == list(o.columns)
        hmatch = rows and schema and h(s) == h(o)
        status = "OK" if (rows and schema and hmatch) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"{name}: {status} rows={len(s)}/{len(o)} "
                  f"schema={schema} hash={hmatch}")
            if not schema:
                print(f"  spark cols:  {list(s.columns)}")
                print(f"  oracle cols: {list(o.columns)}")
            elif rows:
                neq = (s != o).any(axis=1)
                bad = s[neq].head(3)
                for i in bad.index:
                    print(f"  row {i} spark:  {s.loc[i].to_dict()}")
                    print(f"  row {i} oracle: {o.loc[i].to_dict()}")
        else:
            print(f"{name}: OK ({len(s)} rows)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
