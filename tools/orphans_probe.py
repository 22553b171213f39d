#!/usr/bin/env python3
"""Orphan-FK probe (round 16, probe five of the r15 pattern).

Every join fixture so far is referentially INTACT: each fact row's
FKs resolve to a dim row. At 100 TB that is never true — late dims,
trimmed dims, quarantined ids — so the unexercised shape is a fact
row whose FKs point NOWHERE: inner joins must drop it, left joins
must null-fill it, anti/exists probes must classify it, and any
"derive the dim from the facts" optimization (q99's zero-scan month
catalog, broadcast dim builds) must not let pruning drop data the
oracle still sees.

Two rows per FACT table: one fully populated (FKs resolve), one with
every key/FK bumped +77000 — its own PK stays unique, every FK
dangles. Dim tables stay single-row. documents/embeddings carry no
FKs and stay single-row (orphanhood does not apply).

Usage:
    python3 tools/orphans_probe.py [out_dir]   # default /tmp/orphans_probe
    tools/spark_java.sh graft.Verify <out_dir> /tmp/orphans_out
    python3 tools/local_verify.py /tmp/orphans_out <out_dir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import edge_fixtures as ef

ORPHANED = frozenset(["orders", "lineitem", "events"])


def main(root="/tmp/orphans_probe"):
    os.makedirs(root, exist_ok=True)
    for name in ef.SCHEMAS:
        full = ef.ONEROW[name]
        rows = [full] + ([ef.bump_keys(full, 77000)]
                         if name in ORPHANED else [])
        ef.write(root, name, rows)
    print(f"wrote {root}")


if __name__ == "__main__":
    main(*sys.argv[1:])
