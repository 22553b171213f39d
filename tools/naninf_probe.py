#!/usr/bin/env python3
"""NaN / ±Infinity probe (round 16, probe six of the r15 pattern).

The `extremes` variant stops at large-but-FINITE doubles. At 100 TB a
bad upstream division ships NaN and ±Inf as routine data, and the two
engines' semantics genuinely differ in places (Spark: NaN == NaN in
grouping/joins and NaN sorts LAST; DuckDB: NaN behaves as a value
too, but aggregate/percentile/round-trip paths are easy to get
wrong). No graded query had ever executed against a non-finite
double.

Three rows per table that carries DOUBLE columns: one fully
populated, one with every double = NaN (keys +88000), one with
doubles alternating +Inf/-Inf (keys +89000). The embedding list gets
[NaN, Inf, -Inf, 0.0] on the NaN row. Keys/FKs stay join-consistent
within each planted row via bump_keys.

Usage:
    python3 tools/naninf_probe.py [out_dir]   # default /tmp/naninf_probe
    tools/spark_java.sh graft.Verify <out_dir> /tmp/naninf_out
    python3 tools/local_verify.py /tmp/naninf_out <out_dir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import edge_fixtures as ef

NAN = float("nan")
INF = float("inf")


def nan_row(full):
    out = ef.bump_keys(full, 88000)
    changed = False
    for k, v in list(out.items()):
        if isinstance(v, float) and not isinstance(v, bool):
            out[k] = NAN
            changed = True
        elif isinstance(v, list) and v and isinstance(v[0], float):
            out[k] = [NAN, INF, -INF, 0.0]
            changed = True
    return out if changed else None


def inf_row(full):
    out = ef.bump_keys(full, 89000)
    changed = False
    flip = True
    for k, v in list(out.items()):
        if isinstance(v, float) and not isinstance(v, bool):
            out[k] = INF if flip else -INF
            flip = not flip
            changed = True
    return out if changed else None


def main(root="/tmp/naninf_probe"):
    os.makedirs(root, exist_ok=True)
    for name in ef.SCHEMAS:
        full = ef.ONEROW[name]
        rows = [full]
        for r in (nan_row(full), inf_row(full)):
            if r is not None:
                rows.append(r)
        ef.write(root, name, rows)
    print(f"wrote {root}")


if __name__ == "__main__":
    main(*sys.argv[1:])
