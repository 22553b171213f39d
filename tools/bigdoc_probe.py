#!/usr/bin/env python3
"""Bounded big-doc probe (round 17 — the megadoc follow-through,
r16 VERDICT "Next round" #5).

The megadoc probe's 200k-token documents exclude the 8 all-pairs
similarity oracles (HEAVY) as DuckDB-intractable, so the LSH/PPJoin
family has never run UNDER the oracle on a document bigger than the
fixtures'. At ~15k tokens the all-pairs oracles still finish: this
probe plants bigdoc_rows (cyclic 15k / all-distinct 15k / one 10 kB
token) beside the full row and runs ALL 113 queries through the
unchanged gate — HEAVY included.

Promotion rule (stated up front): becomes the sweep's 14th variant
only if one clean full run stays under ~1.5x a normal variant's sweep
cost — measure, decide, record in SCALING.md either way.

DECISION (r17, measured): ALL GREEN — all 113 queries, HEAVY all-pairs
oracles included, match at 15k tokens — but the run cost 870 s vs
onerow's 72 s (12.1x; DuckDB's all-pairs list_intersect is 778 s of
it, the engine paid +22 s). NOT promoted; one-time certification on
record in SCALING.md "Round-17 bounded big-doc probe".

Usage:
    python3 tools/bigdoc_probe.py [out_dir]   # default /tmp/bigdoc_probe
    tools/spark_java.sh graft.Verify <out_dir> /tmp/bigdoc_out
    python3 tools/local_verify.py /tmp/bigdoc_out <out_dir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import edge_fixtures as ef


def main(root="/tmp/bigdoc_probe"):
    os.makedirs(root, exist_ok=True)
    for name in ef.SCHEMAS:
        full = ef.ONEROW[name]
        rows = [full]
        big = ef.bigdoc_rows(full)
        if big:
            rows.extend(big)
        ef.write(root, name, rows)
    print(f"wrote {root}")


if __name__ == "__main__":
    main(*sys.argv[1:])
