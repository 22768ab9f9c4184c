#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
from outDir/oracle_sql.json in DuckDB over the sfDir parquet tables, and
compare (schema-insensitively: columns sorted by name, rows sorted) against
the Spark parquet dumps produced by `graft.Verify`.

Usage: python3 tools/compare_oracle.py <sfDir> <outDir> [query ...]
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(val)  # shortest roundtrip
    if isinstance(val, list):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return str(val)

def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            cur = con.execute(sql)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        try:
            cur = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'")
            s_cols = [d[0] for d in cur.description]
            s_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}"); n_fail += 1; continue
        if sorted(o_cols) != sorted(s_cols):
            print(f"FAIL {name}: columns differ: oracle={sorted(o_cols)} spark={sorted(s_cols)}")
            n_fail += 1; continue
        ok_rows, sk = rows_key(o_cols, o_rows), rows_key(s_cols, s_rows)
        if len(ok_rows) != len(sk):
            print(f"FAIL {name}: row count oracle={len(ok_rows)} spark={len(sk)}")
            n_fail += 1; continue
        if ok_rows != sk:
            diffs = [(a, b) for a, b in zip(ok_rows, sk) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: oracle={diffs[0][0]} spark={diffs[0][1]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(sk)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
