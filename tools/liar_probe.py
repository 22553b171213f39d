#!/usr/bin/env python3
"""Lying-metadata probe (round 16, probe eight of the r15 pattern).

Fixtures so far keep DERIVED columns consistent with their sources:
documents.n_chars always equals len(text), quantities are positive,
discounts sit in [0, 1]. At 100 TB a derived column LIES eventually —
a backfill recomputed text but not n_chars, an upstream off-by-one,
a sign flip. The probe plants internally-INCONSISTENT rows: any query
that derives a value from `text` on one side of the gate but trusts
`n_chars` on the other diverges the day this row arrives.

Two planted rows per table beside the full one:
  - liar: derived/metadata columns contradict their sources
    (n_chars=999999 on a 43-char text, label flipped on an unchanged
    embedding), ids +70000
  - outlaw: domain-violating measures (negative quantity/price with
    positive extendedprice, discount 2.0, negative value), ids +71000

Usage:
    python3 tools/liar_probe.py [out_dir]      # default /tmp/liar_probe
    tools/spark_java.sh graft.Verify <out_dir> /tmp/liar_out
    python3 tools/local_verify.py /tmp/liar_out <out_dir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import edge_fixtures as ef

LIAR = {
    "documents": {"n_chars": 999999},
    "embeddings": {"label": 7},
}

OUTLAW = {
    "lineitem": {"l_quantity": -5.0, "l_extendedprice": 100.0,
                 "l_discount": 2.0, "l_tax": -0.5},
    "orders": {"o_totalprice": -42.0},
    "events": {"value": -1e12},
    "customer": {"c_acctbal": -0.0},
    "part": {"p_size": -1, "p_retailprice": -9.99},
}


def main(root="/tmp/liar_probe"):
    os.makedirs(root, exist_ok=True)
    for name in ef.SCHEMAS:
        full = ef.ONEROW[name]
        rows = [full]
        if name in LIAR:
            r = ef.bump_keys(full, 70000)
            r.update(LIAR[name])
            rows.append(r)
        if name in OUTLAW:
            r = ef.bump_keys(full, 71000)
            r.update(OUTLAW[name])
            rows.append(r)
        ef.write(root, name, rows)
    print(f"wrote {root}")


if __name__ == "__main__":
    main(*sys.argv[1:])
