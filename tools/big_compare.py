#!/usr/bin/env python3
"""Order-independent oracle compare for outputs too large for the
pandas row-compare (tens of millions of rows): both sides reduce to
(count, sum(hash(ROW(varchar-cast cols)))) INSIDE DuckDB, columns
sorted by name — the same signature protocol the driver's hash check
approximates, at any scale the box can scan.

Usage: big_compare.py <sfDir> <verifyOutDir> <query1,query2,...>
"""
import json
import os
import sys

import duckdb

TABLES = ["documents", "embeddings", "events", "lineitem", "orders",
          "customer", "part", "supplier", "nation", "region"]


def sig_sql(cols):
    row = ", ".join(f"CAST({c} AS VARCHAR)" for c in sorted(cols))
    return f"SELECT count(*), coalesce(sum(hash(ROW({row}))), 0)"


def main(sf, out, names):
    oracles = json.load(open(os.path.join(out, "oracle_sql.json")))
    rc = 0
    for name in names:
        con = duckdb.connect()
        con.execute("SET temp_directory='/tmp/duck_tmp'")
        for t in TABLES:
            p = f"{sf}/{t}.parquet"
            if os.path.isdir(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                            f"read_parquet('{p}/*.parquet')")
            elif os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        dump = f"{out}/{name}"
        if name not in oracles:
            n = con.execute("SELECT count(*) FROM (SELECT * FROM "
                            f"read_parquet('{dump}/*.parquet'))").fetchone()[0]
            rc |= 0 if n > 0 else 1
            print(f"{'OK  ' if n > 0 else 'FAIL'} {name}: rows-only, "
                  f"{n} rows")
            con.close()
            continue
        cols = [d[0] for d in con.execute(
            f"SELECT * FROM read_parquet('{dump}/*.parquet') LIMIT 0"
        ).description]
        o = con.execute(
            f"{sig_sql(cols)} FROM ({oracles[name]})").fetchone()
        s = con.execute(
            f"{sig_sql(cols)} FROM (SELECT * FROM "
            f"read_parquet('{dump}/*.parquet'))").fetchone()
        good = o == s and o[0] > 0
        rc |= 0 if good else 1
        print(f"{'OK  ' if good else 'FAIL'} {name}: oracle {o} vs "
              f"spark {s}")
        con.close()
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3].split(",")))
