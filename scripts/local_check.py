#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against SparkEntry.oracleSql in DuckDB and diff. Dev tooling only — the
engine itself is pure Scala/Spark.

Usage: python3 scripts/local_check.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        # driver-style compare: sort columns by name, then sort rows
        g = got[sorted(got.columns)]
        e = exp[sorted(exp.columns)]
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_bad += 1
            continue
        gs = g.astype(str).sort_values(by=list(g.columns)).reset_index(drop=True)
        es = e.astype(str).sort_values(by=list(e.columns)).reset_index(drop=True)
        if len(gs) != len(es):
            print(f"FAIL {name}: rows {len(gs)} vs {len(es)}")
            n_bad += 1
            continue
        if gs.equals(es):
            print(f"OK   {name}: {len(gs)} rows")
            n_ok += 1
        else:
            neq = (gs != es).any(axis=1)
            print(f"FAIL {name}: {neq.sum()}/{len(gs)} rows differ; first diffs:")
            idx = gs.index[neq][:3]
            for i in idx:
                print("  spark:", gs.loc[i].to_dict())
                print("  duck :", es.loc[i].to_dict())
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
