#!/usr/bin/env python3
"""Dev-only replica of the driver's DuckDB oracle gate.

Usage: python3 dev/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet dump written by graft.Verify, runs the
matching SQL from <out>/oracle_sql.json in DuckDB over the sf parquet
tables, and compares: row count, column-name set, and a hash over the
column-name-sorted, row-sorted values (floats rounded to 9 significant
digits so representation noise doesn't flag).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            spark = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = [d[0] for d in spark.description]
            s_rows = spark.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark dump unreadable: {e}")
            bad += 1
            continue
        try:
            o = con.execute(sql)
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            bad += 1
            continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"FAIL {name}: schema {sorted(s_cols)} vs {sorted(o_cols)}")
            bad += 1
            continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows {len(s_rows)} vs {len(o_rows)}")
            bad += 1
            continue
        cs, co = canon(s_rows, s_cols), canon(o_rows, o_cols)
        if cs != co:
            diffs = [(a, b) for a, b in zip(cs, co) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: "
                  f"spark={diffs[0][0]} oracle={diffs[0][1]}")
            bad += 1
            continue
        print(f"ok   {name}: {len(s_rows)} rows")
    print(f"\n{'ALL GREEN' if bad == 0 else f'{bad} FAILURES'}")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
