#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
against the parquet tables in <sfDir>, load the Spark result parquet,
sort columns by name, and compare row-by-row (values stringified).
"""
import sys, os, json, glob
import duckdb
import pandas as pd


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        # Spark-written tables (e.g. the probe corpus) are DIRECTORIES
        # of part files; driver-generated ones are single files
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            oracle = norm(con.execute(sql).fetchdf())
            spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
            got = norm(pd.concat([pd.read_parquet(f) for f in sorted(spark_files)]))
            if list(oracle.columns) != list(got.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(oracle.columns)}")
                failures += 1
                continue
            if len(oracle) != len(got):
                print(f"FAIL {name}: rows {len(got)} != {len(oracle)}")
                failures += 1
                continue
            o = oracle.astype(str)
            g = got.astype(str)
            neq = (o != g).any(axis=1)
            if neq.any():
                i = neq.idxmax()
                print(f"FAIL {name}: first diff at row {i}:\n  oracle: {o.loc[i].to_dict()}\n  spark : {g.loc[i].to_dict()}")
                failures += 1
            else:
                print(f"OK   {name}: {len(got)} rows")
        except Exception as e:
            print(f"ERROR {name}: {e}")
            failures += 1
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
