#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py [sfDir] [verifyOutDir]

Reads each SparkEntry query result (parquet written by graft.Verify) and the
dumped oracle_sql.json, runs the oracle SQL in DuckDB over the same testdata
parquet, and compares result multisets exactly (EXCEPT ALL in both
directions, columns sorted by name). Strictly exact on doubles — if this
passes, any reasonable driver compare passes.

Dev-only script; the shipped Scala library has no Python dependency.
"""
import duckdb, json, sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass, fails = 0, []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: {ex}")
            fails.append(name)
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} oracle={ec}")
            fails.append(name)
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows differ spark={len(got)} oracle={len(exp)}")
            fails.append(name)
            continue
        cols = ", ".join(f'"{c}"' for c in gc)
        con.register("g_", got)
        con.register("e_", exp)
        d1 = con.execute(
            f"SELECT count(*) FROM ((SELECT {cols} FROM g_) EXCEPT ALL (SELECT {cols} FROM e_))"
        ).fetchone()[0]
        d2 = con.execute(
            f"SELECT count(*) FROM ((SELECT {cols} FROM e_) EXCEPT ALL (SELECT {cols} FROM g_))"
        ).fetchone()[0]
        if d1 or d2:
            print(f"FAIL {name}: value mismatch ({d1} extra, {d2} missing of {len(got)} rows)")
            ex_rows = con.execute(
                f"SELECT {cols} FROM ((SELECT {cols} FROM g_) EXCEPT ALL (SELECT {cols} FROM e_)) LIMIT 3"
            ).fetchdf()
            ms_rows = con.execute(
                f"SELECT {cols} FROM ((SELECT {cols} FROM e_) EXCEPT ALL (SELECT {cols} FROM g_)) LIMIT 3"
            ).fetchdf()
            if len(ex_rows):
                print("  spark-only:", ex_rows.to_dict("records"))
            if len(ms_rows):
                print("  oracle-only:", ms_rows.to_dict("records"))
            fails.append(name)
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
    print(f"\n{n_pass}/{len(oracle)} queries match", "" if not fails else f"— FAILURES: {fails}")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
