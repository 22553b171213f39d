#!/usr/bin/env python3
"""Intra-batch duplicate-key FACT probe (round 16).

UpsertSinkSource.scala documents that rows sharing a merge key WITHIN
one batch resolve in unspecified order — callers must collapse first,
"which is exactly what every graded producer does". No fixture has
ever tested a graded producer against that claim: `dupdims` (r15)
duplicates DIMENSION keys, but the redelivered/revised-batch shape a
real ingest meets is a FACT table carrying its primary key twice with
different payloads (same event re-sent with a corrected value, a
lineitem revision, a re-crawled document). Every query whose result
depends on WHICH copy wins — without a deterministic pick — diverges
from DuckDB here, exactly like the r15 probes.

Two rows per fact table: one fully populated, one with identical
key/FK/timestamp columns and every other payload mutated (the
maximally ill-defined case: no ordering column distinguishes the
copies, so "latest wins" has no latest). Dimension tables stay single
-row (dupdims owns that shape).

First run found SIX pick-one ambiguities (triage: SCALING.md
"Round-16 dup-fact probe"), all closed same-session with pinned
contracts; `dupfacts` is now the sweep's 11th CONTRACT variant
(edge_fixtures.dup_fact_row is the promoted implementation). This
standalone runner remains for quick dev-loop iteration on dup-key
contracts without a full sweep.

Usage:
    python3 tools/dupfacts_probe.py [out_dir]   # default /tmp/dupfacts_probe
    tools/spark_java.sh graft.Verify <out_dir> /tmp/dupfacts_out
    python3 tools/local_verify.py /tmp/dupfacts_out <out_dir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import edge_fixtures as ef


def main(root="/tmp/dupfacts_probe"):
    os.makedirs(root, exist_ok=True)
    for name in ef.SCHEMAS:
        full = ef.ONEROW[name]
        # the promoted sweep implementation is the single source (the
        # nullkeys_probe lesson): no local copies that drift
        rows = [full] + ([ef.dup_fact_row(full)]
                         if name in ef.FACT_TABLES else [])
        ef.write(root, name, rows)
    print(f"wrote {root}")


if __name__ == "__main__":
    main(*sys.argv[1:])
