#!/usr/bin/env python3
"""THE dev-loop replica of the driver's correctness gate (the former
dev/check_oracle.py and tools/check_oracle.py replicas disagreed on
float normalization — 9-sig-digit rounding vs exact — and were removed
in round 5; this single checker compares exactly, via pandas equals
with dtype alignment, which matched the driver's verdict on every
round-4 dump). Reads the Verify.scala dump (parquet per query +
oracle_sql.json), runs each oracle in DuckDB over the same testdata,
and compares rows / schema / value-hash. Dev tool only — the engine
itself is pure Scala/Spark.

Usage: python3 tools/local_verify.py <outDir> <sfDir>
"""
import json, sys, glob, os
import duckdb

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name in sorted(os.listdir(outdir)):
    qdir = os.path.join(outdir, name)
    if not os.path.isdir(qdir):
        continue
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT")
        fails.append(name)
        continue
    sdf = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    if name not in oracles:
        print(f"{name}: rows-only (no oracle) spark_rows={len(sdf)}")
        if len(sdf) == 0:
            fails.append(name)
        continue
    try:
        odf = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}")
        fails.append(name)
        continue
    ok_rows = len(sdf) == len(odf)
    scols = sorted(sdf.columns)
    ocols = sorted(odf.columns)
    ok_schema = scols == ocols
    ok_hash = False
    if ok_rows and ok_schema:
        s2 = sdf[scols].sort_values(scols).reset_index(drop=True)
        o2 = odf[scols].sort_values(scols).reset_index(drop=True)
        try:
            import pandas as pd
            ok_hash = s2.equals(o2.astype(s2.dtypes.to_dict()))
            if not ok_hash:
                # show first diff
                for c in scols:
                    if not s2[c].equals(o2[c].astype(s2[c].dtype)):
                        diffs = (s2[c] != o2[c].astype(s2[c].dtype))
                        i = diffs[diffs].index[0]
                        print(f"  first diff col={c} row={i}: spark={s2[c][i]!r} oracle={o2[c][i]!r}")
                        break
        except Exception as e:
            print(f"  compare error: {e}")
    status = "OK" if (ok_rows and ok_schema and ok_hash) else \
        f"FAIL rows={ok_rows}({len(sdf)}/{len(odf)}) schema={ok_schema} hash={ok_hash}"
    if not (ok_rows and ok_schema and ok_hash):
        if not ok_schema:
            print(f"  spark cols={scols}\n  oracle cols={ocols}")
        fails.append(name)
    print(f"{name}: {status}")
print(f"\n{'ALL GREEN' if not fails else 'FAILURES: ' + ', '.join(fails)}")
sys.exit(1 if fails else 0)
