#!/usr/bin/env python3
"""NULL-key probe variant (round 15): keys NULL, payloads populated.

The edge sweep's `nulls` variant nulls only the OPTIONAL columns —
every join/group KEY stays populated — so engine-vs-oracle divergence
that needs a NULL key with live payload data never fires. Round 15's
review found exactly that class (q111's NOT IN oracle, masked because
the nulls variant also nulls the date filter), and this probe — two
rows per table: one fully populated, one with every `*key`/`*_id`
column NULL and everything else real — surfaced eight more in one run
(triage table: SCALING.md "Round-15 NULL-key probe"). All eight were
closed the same round and the shape is now the sweep's `nullkeys`
CONTRACT variant (edge_fixtures.nullkey_row is the promoted copy);
this standalone runner remains for quick dev-loop iteration on
NULL-key contracts without a full sweep.

Usage:
    python3 tools/nullkeys_probe.py [out_dir]     # default /tmp/nullkeys_probe
    tools/spark_java.sh graft.Verify <out_dir> /tmp/nullkeys_out
    python3 tools/local_verify.py /tmp/nullkeys_out <out_dir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import edge_fixtures as ef


def main(root="/tmp/nullkeys_probe"):
    os.makedirs(root, exist_ok=True)
    for name in ef.SCHEMAS:
        full = ef.ONEROW[name]
        # the promoted sweep implementation IS the row source (r15
        # ADVICE): a local verbatim copy held identical only by a
        # comment could drift silently
        ef.write(root, name, [full, ef.nullkey_row(full)])
    print(f"wrote {root}")


if __name__ == "__main__":
    main(*sys.argv[1:])
