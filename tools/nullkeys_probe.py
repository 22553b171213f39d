#!/usr/bin/env python3
"""NULL-key probe variant (round 15): keys NULL, payloads populated.

The edge sweep's `nulls` variant nulls only the OPTIONAL columns —
every join/group KEY stays populated — so engine-vs-oracle divergence
that needs a NULL key with live payload data never fires. Round 15's
review found exactly that class (q111's NOT IN oracle, masked because
the nulls variant also nulls the date filter), and this probe — two
rows per table: one fully populated, one with every `*key`/`*_id`
column NULL and everything else real — surfaced eight more in one run
(triage table: SCALING.md "Round-15 NULL-key probe"). NOT part of the
sweep contract yet: the failures are CONTRACT decisions (typed
boundaries that NOT_NULL-assert mid-job, a MERGE key that SQL leaves
ill-defined on NULL), each needing a documented fix before the
variant can be held green. Promote it into edge_fixtures/edge_sweep's
CONTRACT_VARIANTS once those land.

Usage:
    python3 tools/nullkeys_probe.py [out_dir]     # default /tmp/nullkeys_probe
    tools/spark_java.sh graft.Verify <out_dir> /tmp/nullkeys_out
    python3 tools/local_verify.py /tmp/nullkeys_out <out_dir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import edge_fixtures as ef


def nullkey_row(full):
    out = dict(full)
    for k in out:
        if k.endswith(("key", "_id")) or k == "event_id":
            out[k] = None
    return out


def main(root="/tmp/nullkeys_probe"):
    os.makedirs(root, exist_ok=True)
    for name in ef.SCHEMAS:
        full = ef.ONEROW[name]
        ef.write(root, name, [full, nullkey_row(full)])
    print(f"wrote {root}")


if __name__ == "__main__":
    main(*sys.argv[1:])
