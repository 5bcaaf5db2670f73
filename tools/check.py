#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares each
<outDir>/<name> parquet against its oracle SQL executed in DuckDB over the
same sf tables. Usage: tools/check.py <sfDir> <outDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            exp = con.execute(sql).fetchdf()
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            exp = exp.reindex(sorted(exp.columns), axis=1)
            got = got.reindex(sorted(got.columns), axis=1)
            if sorted(exp.columns) != sorted(got.columns):
                print(f"FAIL {name}: columns {list(got.columns)} vs oracle "
                      f"{list(exp.columns)}")
                n_fail += 1
                continue
            cols = list(exp.columns)
            exp = exp.sort_values(cols).reset_index(drop=True)
            got = got.sort_values(cols).reset_index(drop=True)
            if len(exp) != len(got):
                print(f"FAIL {name}: {len(got)} rows vs oracle {len(exp)}")
                n_fail += 1
                continue
            if exp.astype(str).equals(got.astype(str)):
                print(f"PASS {name}: {len(got)} rows")
                n_pass += 1
            else:
                diff = (exp.astype(str) != got.astype(str)).any(axis=1)
                print(f"FAIL {name}: {diff.sum()}/{len(exp)} rows differ; first:")
                print("  oracle:", exp[diff].head(3).to_dict("records"))
                print("  got:   ", got[diff].head(3).to_dict("records"))
                n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
