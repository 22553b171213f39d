#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each <name> dir under verifyOutDir: read the Spark parquet result,
run the matching oracle_sql.json SQL in DuckDB (tables registered as
views over <sfDir>/*.parquet), sort columns by name, sort rows, compare
cell values exactly. Reports per-query PASS/FAIL with first diffs.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    import os
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(f"{outdir}/{d}"))
    npass = nfail = 0
    for name in names:
        try:
            got_rel = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got_rel.description]
            got = got_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            nfail += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(got)})")
            continue
        try:
            exp_rel = con.execute(oracle[name])
            exp_cols = [d[0] for d in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            nfail += 1
            continue
        gc, g = canon(got, got_cols)
        ec, e = canon(exp, exp_cols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs {ec}")
            nfail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            nfail += 1
            continue
        bad = [(a, b) for a, b in zip(g, e) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} differing rows; first: "
                  f"got={bad[0][0]} exp={bad[0][1]}")
            nfail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            npass += 1
    print(f"== {npass} pass, {nfail} fail, {len(names)} total")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
