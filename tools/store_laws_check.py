#!/usr/bin/env python3
"""DuckDB law checks over the StoreLaws dumps (VERDICT r11 #5).

Usage: store_laws_check.py <lawsOutDir>

Checks, over Spark's own outputs (the full from-scratch oracle does
not fit the box at sf10full):
  1. unaffected-unchanged: rows of `upsert` for vec_ids OUTSIDE the
     independently-derived `affected` set are byte-identical to
     `stored` (count + aggregated row hash).
  2. monotonicity: for affected nodes present in both, the upsert's
     rank-r cosine is >= the stored rank-r cosine (adding candidates
     can only improve a rank).
  3. batch containment: every batch node (vec_id % 10 == 0) appearing
     in `upsert` is in `affected`.
  4. coverage: |upsert rows| >= |stored rows|.
"""
import sys
import duckdb


def main(d: str) -> int:
    con = duckdb.connect()
    for t in ("upsert", "stored", "affected"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}/*.parquet')")
    ok = True

    def check(name, sql, expect):
        nonlocal ok
        got = con.execute(sql).fetchone()[0]
        good = got == expect
        ok = ok and good
        print(f"{'OK  ' if good else 'FAIL'} {name}: {got} (want {expect})")

    sig = ("count(*), coalesce(sum(hash(ROW(CAST(vec_id AS VARCHAR), "
           "CAST(rank AS VARCHAR), CAST(neighbor_id AS VARCHAR), "
           "CAST(cos_ppm AS VARCHAR)))), 0)")
    a = con.execute(
        f"SELECT {sig} FROM upsert WHERE vec_id NOT IN "
        "(SELECT vec_id FROM affected)").fetchone()
    b = con.execute(
        f"SELECT {sig} FROM stored WHERE vec_id NOT IN "
        "(SELECT vec_id FROM affected)").fetchone()
    good = a == b and a[0] > 0
    ok = ok and good
    print(f"{'OK  ' if good else 'FAIL'} unaffected-unchanged: "
          f"upsert {a} vs stored {b}")

    check("rank-monotone violations",
          "SELECT count(*) FROM upsert u JOIN stored s "
          "USING (vec_id, rank) "
          "WHERE u.vec_id IN (SELECT vec_id FROM affected) "
          "AND u.cos_ppm < s.cos_ppm", 0)
    check("batch nodes outside affected",
          "SELECT count(DISTINCT vec_id) FROM upsert "
          "WHERE vec_id % 10 = 0 AND vec_id NOT IN "
          "(SELECT vec_id FROM affected)", 0)
    check("coverage |upsert| >= |stored|",
          "SELECT (SELECT count(*) FROM upsert) >= "
          "(SELECT count(*) FROM stored)", True)
    print("LAWS " + ("PASS" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
