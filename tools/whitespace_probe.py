#!/usr/bin/env python3
"""Whitespace probe (round 16, probe seven of the r15 pattern).

The emptystr variant covers '' exactly; whitespace-ONLY and
whitespace-PADDED strings are different shapes: split-on-space over
'  ' yields ['', '', ''] (three empty tokens, not zero), a padded key
is a DIFFERENT key than its trimmed form, and every tokenizer/
fingerprint/language-id path sees token streams the '' row never
makes. Two planted rows per table beside the full one:

  - all-spaces: every string column '  ' (keys intact, ids +60000)
  - padded: every string column '  <original>  ' (ids +61000)

First run found one contract gap: Spark's CSV WRITER trims
leading/trailing whitespace by default (ignore*WhiteSpace default
true on write, false on read), so q43's round trip returned '' for
'  ' — the same lossiness class as its ''-vs-NULL default, closed the
same way (both options pinned false on both sides: bytes out = bytes
in). Everything else parity-clean on first run. `whitespace` is now
the sweep's 13th CONTRACT variant (edge_fixtures.spaces_row/
padded_row are the promoted implementations); this standalone runner
remains for dev-loop iteration.

Usage:
    python3 tools/whitespace_probe.py [out_dir]  # default /tmp/ws_probe
    tools/spark_java.sh graft.Verify <out_dir> /tmp/ws_out
    python3 tools/local_verify.py /tmp/ws_out <out_dir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import edge_fixtures as ef


def main(root="/tmp/ws_probe"):
    os.makedirs(root, exist_ok=True)
    for name in ef.SCHEMAS:
        full = ef.ONEROW[name]
        rows = [full]
        # promoted implementations are the single source (the
        # nullkeys_probe lesson): no local copies that drift
        for r in (ef.spaces_row(full), ef.padded_row(full)):
            if r is not None:
                rows.append(r)
        ef.write(root, name, rows)
    print(f"wrote {root}")


if __name__ == "__main__":
    main(*sys.argv[1:])
