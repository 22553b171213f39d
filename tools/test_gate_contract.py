#!/usr/bin/env python3
"""Regression test for local_verify's driver-contract checks (r19).

Self-contained — builds its own parquet fixtures with pyarrow (which
can write BOTH encodings: `use_deprecated_int96_timestamps=True`
replicates Spark's INT96 default, and the plain writer replicates the
r18 TIMESTAMP_MICROS regression), so it needs no Spark dump and runs
in under a second:

  1. ts_physical_drift PASSES an INT96 dump for a contract query,
     FAILS a micros dump (the r18 regression shape), and FAILS any
     out-of-contract query emitting a raw timestamp at all;
  2. the value compare keeps full int64 precision at far-future
     epoch-µs magnitudes with NULLs present (nullable Int64, not
     float64 — a 1 µs divergence at 9999-12-31 must be a diff);
  3. arrow-level integer widening: int32 vs int64 columns with equal
     values compare EQUAL (both land as Int64).

Run: python3 tools/test_gate_contract.py   (exit 0 = green)
"""
import os
import sys
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))


def load_gate():
    """Import local_verify's functions without running its script body."""
    src = open(os.path.join(HERE, "local_verify.py")).read()
    ns = {}
    # the script prefix registers DuckDB views on argv[2]; point it at
    # the smallest real fixture dir (views are lazy and cost nothing)
    sys.argv = ["local_verify.py", "/nonexistent", "/root/testdata/sf0.001"]
    exec(src[:src.index("oracles = json.load")], ns)
    return ns


def main():
    g = load_gate()
    drift, to_pandas = g["ts_physical_drift"], g["to_pandas_sorted"]
    tmp = tempfile.mkdtemp(prefix="gate_contract_")
    ts = pa.table({"hour_start": pa.array(
        [1700000000000000, None], pa.timestamp("us"))})

    int96 = os.path.join(tmp, "int96.parquet")
    micros = os.path.join(tmp, "micros.parquet")
    pq.write_table(ts, int96, use_deprecated_int96_timestamps=True)
    pq.write_table(ts, micros)

    assert drift("q27_sessionize", [int96]) == [], \
        "INT96 contract dump must be clean"
    d = drift("q27_sessionize", [micros])
    assert d and "INT96" in d[0], f"micros dump must flag encoding: {d}"
    d = drift("q999_other", [int96])
    assert d and "enumerated" in d[-1], \
        f"out-of-contract timestamp carrier must flag: {d}"

    # far-future precision: 1 µs apart at 9999-12-31 magnitude, with a
    # NULL in the column (the float64 degradation trigger)
    far = 253402300799000000
    a = pa.table({"k": pa.array([1, 2]), "t": pa.array([far, None], pa.int64())})
    b = pa.table({"k": pa.array([1, 2]), "t": pa.array([far + 1, None], pa.int64())})
    sa, sb = to_pandas(a, ["k", "t"]), to_pandas(b, ["k", "t"])
    assert str(sa["t"].dtype) == "Int64", f"nullable Int64 expected: {sa['t'].dtype}"
    assert not sa.equals(sb), "1 µs far-future divergence must be a diff"
    assert sa.equals(to_pandas(a, ["k", "t"])), "identical tables must match"

    # width mixing: int32 vs int64 equal values → equal frames
    w32 = pa.table({"k": pa.array([1, 2, 3], pa.int32())})
    w64 = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    assert to_pandas(w32, ["k"]).equals(to_pandas(w64, ["k"])), \
        "arrow-level widening must erase int width differences"

    print("GATE CONTRACT OK")


if __name__ == "__main__":
    main()
