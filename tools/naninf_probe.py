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

First run found 34 failures: ~28 DuckDB-side "Invalid Input" raises
(DuckDB 1.0's own TRY_CAST(NaN AS DECIMAL) bug — the oracles now
spell Spark's non-finite-money-is-NULL contract as
TRY_CAST(nullif(x, 'nan'::DOUBLE) AS DECIMAL)), one whole-job engine
kill (q113's ANSI CAST of a raw measure to BIGINT), the
NaN-greater-than-everything guard bypass (q34), NaN-as-p90
percentiles (q42/q61), and the silent floor(NaN)=band-0 privacy
class (q86). All closed same-session (triage: SCALING.md "Round-16
NaN/Inf probe"); `naninf` is now the sweep's 12th CONTRACT variant
(edge_fixtures.nan_row/inf_row are the promoted implementations).
This standalone runner remains for dev-loop iteration.

Usage:
    python3 tools/naninf_probe.py [out_dir]   # default /tmp/naninf_probe
    tools/spark_java.sh graft.Verify <out_dir> /tmp/naninf_out
    python3 tools/local_verify.py /tmp/naninf_out <out_dir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import edge_fixtures as ef


def main(root="/tmp/naninf_probe"):
    os.makedirs(root, exist_ok=True)
    for name in ef.SCHEMAS:
        full = ef.ONEROW[name]
        # promoted implementations are the single source (the
        # nullkeys_probe lesson): no local copies that drift
        rows = [full]
        for r in (ef.nan_row(full), ef.inf_row(full)):
            if r is not None:
                rows.append(r)
        ef.write(root, name, rows)
    print(f"wrote {root}")


if __name__ == "__main__":
    main(*sys.argv[1:])
