#!/usr/bin/env python3
"""Canonical-equivalence probe (round 17, the r15 probe pattern).

The `unicode` variant covers exotic CODE POINTS; it never exercises
canonical EQUIVALENCE — two byte-different spellings of the same
grapheme. That is a dedup/join/group-key ambiguity both engines must
decide identically: does q24's sha2 see bytes (NFC "é" != NFD "é") or
graphemes? does q81's canonicalize fold them? is ZWSP whitespace to a
tokenizer? Three planted rows per string-bearing table beside the full
one:

  - nfc  (+62000): strings + " Pâté ṩấÅ간" normalized to NFC
  - nfd  (+63000): the SAME visual strings in NFD (byte-different)
  - zerowidth (+64000): ZWSP/ZWJ/ZWNJ woven in, plus a DEFECTIVE
    leading combining mark (U+0301 with no base)

Row builders live in edge_fixtures (nfc_row/nfd_row/zerowidth_row) —
the single source, so promotion to a sweep variant cannot drift.

DECISION (r17, first run): ALL GREEN, zero divergences — both engines
byte-compare; NOT promoted (the orphan-FK precedent: nothing to keep
watching). The agreement is pinned in UnicodeEquivalenceSpec; see
SCALING.md "Round-17 canonical-equivalence probe".

Usage:
    python3 tools/unicode_probe.py [out_dir]  # default /tmp/uni_probe
    tools/spark_java.sh graft.Verify <out_dir> /tmp/uni_out
    python3 tools/local_verify.py /tmp/uni_out <out_dir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import edge_fixtures as ef


def main(root="/tmp/uni_probe"):
    os.makedirs(root, exist_ok=True)
    for name in ef.SCHEMAS:
        full = ef.ONEROW[name]
        rows = [full]
        for r in (ef.nfc_row(full), ef.nfd_row(full),
                  ef.zerowidth_row(full)):
            if r is not None:
                rows.append(r)
        ef.write(root, name, rows)
    print(f"wrote {root}")


if __name__ == "__main__":
    main(*sys.argv[1:])
