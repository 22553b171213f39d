#!/usr/bin/env python3
"""Hostile-timestamp probe variant (round 18): NULL and boundary TIME
values with live payloads, plus engineered rank ties.

No sweep variant ever nulls the TIME columns: the `nulls` variant
nulls only OPTIONAL payload columns and the r15 `nullkeys` variant
only `*key`/`*_id` columns, so every window/lag/session/SCD2 query
that ORDERS BY a timestamp (q22 q40 q69 q80 q100 q107 q112 the
streaming twins) has never seen a NULL ordering key — and Spark's
bare ASC sorts NULLs FIRST where DuckDB's default is NULLS LAST
(verified both directions this round: DuckDB `nulls_last` is
absolute, Spark flips by direction — so bare DESC agrees and bare
ASC diverges). This probe makes that class, plus epoch-boundary /
pre-1970 / far-future arithmetic, observable:

  - events: one NULL-ts row and one all-NULL-ts user INTERLEAVED
    with real rows of the same user (the lag/session chain has to
    place the null), plus epoch 1970-01-01, pre-1970 (negative
    epoch), and far-future 9999-12-31 instants;
  - orders / lineitem: same four shapes for o_orderdate/l_shipdate;
  - engineered ties that force the ASC TIEBREAK to decide:
    two (suppkey, partkey) revenue groups with EQUAL revenue where
    one partkey is NULL (q23/q71 rank swaps if null placement
    differs) and two same-year customer segments with EQUAL totals
    where one segment is NULL (q48's rank() tie).

Usage:
    python3 tools/nulltime_probe.py [out_dir]   # default /tmp/nulltime_probe
    SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify <out_dir> /tmp/nulltime_out"
    python3 tools/local_verify.py /tmp/nulltime_out <out_dir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import edge_fixtures as ef


def main(root="/tmp/nulltime_probe"):
    os.makedirs(root, exist_ok=True)
    # the promoted sweep implementation IS the row source (the
    # nullkeys-probe precedent): a local verbatim copy held identical
    # only by a comment could drift silently
    for name, rs in ef.nulltime_rows().items():
        ef.write(root, name, rs)
    print(f"wrote {root}")


if __name__ == "__main__":
    main(*sys.argv[1:])
