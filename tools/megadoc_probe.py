#!/usr/bin/env python3
"""Megadoc probe (round 16, probe nine of the r15 pattern).

Every fixture row so far is small; per-ROW cost scaling was never
exercised. This plants a 200k-token / 1 MB document (50-word cyclic
vocabulary), a single 100 kB token, and a 100 kB JSON props value
beside the normal rows.

First run found the suite's only O(n²): TextOps.shingles built
n-grams with a transform lambda REFERENCING the token array — Spark's
interpreted HOF eval re-evaluates a referenced expression per
element, so the whole 1 MB text re-split once per position and q90
ran >10 minutes on ONE row (fix + linearity spec: SCALING.md
"Round-16 megadoc probe"). After the fix the engine runs all 113 in
bounded time; compare with the HEAVY list excluded — the all-pairs
similarity oracles are themselves intractable on 200k-element lists
(the documented engine-vs-oracle asymmetry).

Usage:
    python3 tools/megadoc_probe.py [out_dir]   # default /tmp/megadoc_probe
    tools/spark_java.sh graft.Verify <out_dir> /tmp/megadoc_all      # engine: all 113, bounded
    SUB=$(python3 tools/megadoc_probe.py --subset /tmp/megadoc_all/queries.json)
    tools/spark_java.sh graft.Verify <out_dir> /tmp/megadoc_out "$SUB"
    python3 tools/local_verify.py /tmp/megadoc_out <out_dir>         # 105 tractable oracles
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import edge_fixtures as ef

# oracles that are all-pairs over per-doc shingle lists: intractable
# in DuckDB at 200k elements; the engine side runs them fine
HEAVY = [
    "q29_minhash_lsh_neardup", "q37_ngram_jaccard_join",
    "q50_simhash_neardup", "q56_neardup_components", "q84_editdist_neardup",
    "q88_decontam", "q89_group_split", "q93_incremental_neardup",
]


def main(root="/tmp/megadoc_probe"):
    os.makedirs(root, exist_ok=True)
    words = [f"w{i % 50}" for i in range(200_000)]
    big = " ".join(words)
    monster = "x" * 100_000
    # ALL-DISTINCT tokens: the worst case for any per-distinct-token
    # in-row pass (the q104 O(|distinct| x n) shape the cyclic
    # vocabulary above dodged on the probe's first run)
    alldist = " ".join(f"u{i}" for i in range(200_000))
    for name in ef.SCHEMAS:
        full = ef.ONEROW[name]
        rows = [full]
        if name == "documents":
            r1 = ef.bump_keys(full, 30000)
            r1.update(text=big, n_chars=len(big))
            r2 = ef.bump_keys(full, 31000)
            r2.update(text=monster, n_chars=len(monster))
            r3 = ef.bump_keys(full, 32000)
            r3.update(text=alldist, n_chars=len(alldist))
            rows += [r1, r2, r3]
        if name == "events":
            r = ef.bump_keys(full, 30000)
            r["props"] = '{"k":"' + "y" * 100_000 + '"}'
            rows.append(r)
        ef.write(root, name, rows)
    print(f"wrote {root}")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--subset":
        # tractable-oracle query list for Verify's subset arg, derived
        # from a previous full dump's queries.json (the registry)
        import json
        qs = json.load(open(sys.argv[2]))
        print(",".join(q for q in qs if q not in HEAVY))
    else:
        main(*sys.argv[1:])
