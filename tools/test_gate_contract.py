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
    # the module resolves its committed snapshot path via __file__,
    # which exec() does not define — point it at the real module
    ns = {"__file__": os.path.join(HERE, "local_verify.py")}
    # the script prefix registers DuckDB views on argv[2]; point it at
    # the smallest real fixture dir (views are lazy and cost nothing;
    # overridable so a renamed fixture root doesn't orphan this test)
    fixtures = os.environ.get("GRAFT_GATE_FIXTURES", "/root/testdata/sf0.001")
    sys.argv = ["local_verify.py", "/nonexistent", fixtures]
    # slice off the script body at its first top-level statement after
    # the function defs; a clear message beats the opaque ValueError
    # src.index() raises if local_verify.py is ever restructured (r19
    # ADVICE)
    marker = "oracles = json.load"
    assert marker in src, (
        "test_gate_contract: local_verify.py no longer contains the "
        f"script-body marker {marker!r} — update the slice marker here "
        "to the first statement after the function definitions")
    exec(src[:src.index(marker)], ns)
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

    # ---- dump-schema fingerprint (r20): the r18 lesson generalized.
    # Each drift class the value compare normalizes away must change
    # the canonical schema text: physical type (INT96 vs INT64), int
    # width (int32 vs int64), nullability, and column order.
    canon, load_snap, write_snap = (g["dump_schema_canonical"],
                                    g["load_schema_snapshot"],
                                    g["write_schema_snapshot"])
    c96, e1 = canon([int96])
    cus, e2 = canon([micros])
    assert not e1 and not e2 and c96 != cus, \
        "INT96 vs TIMESTAMP_MICROS must fingerprint differently"
    assert any("INT96" in ln for ln in c96), c96
    p32 = os.path.join(tmp, "w32.parquet")
    p64 = os.path.join(tmp, "w64.parquet")
    pq.write_table(w32, p32)
    pq.write_table(w64, p64)
    assert canon([p32])[0] != canon([p64])[0], \
        "int32 vs int64 physical must fingerprint differently"
    # mixed part files (the generalized r19 ADVICE hole): one INT96
    # part beside one micros part must be flagged, whichever sorts first
    _, mixed_errs = canon([int96, micros])
    assert mixed_errs and "DIFFERENT" in mixed_errs[0], mixed_errs
    # nullability: a required column vs an optional one
    req = pa.table({"k": pa.array([1, 2], pa.int64())}).cast(
        pa.schema([pa.field("k", pa.int64(), nullable=False)]))
    preq = os.path.join(tmp, "req.parquet")
    pq.write_table(req, preq)
    assert canon([preq])[0] != canon([p64])[0], \
        "required vs optional must fingerprint differently (def level)"
    # column order
    ab = pa.table({"a": pa.array([1]), "b": pa.array([1])})
    ba = ab.select(["b", "a"])
    pab, pba = os.path.join(tmp, "ab.parquet"), os.path.join(tmp, "ba.parquet")
    pq.write_table(ab, pab)
    pq.write_table(ba, pba)
    assert canon([pab])[0] != canon([pba])[0], \
        "column order is part of the contract"
    # snapshot round trip (write → load is identity)
    snap = {"q1": canon([pab])[0], "q2": c96}
    old = g["SCHEMA_SNAPSHOT"]
    g["SCHEMA_SNAPSHOT"] = snap_path = os.path.join(tmp, "snap.txt")
    try:
        # write/load close over the module-level SCHEMA_SNAPSHOT, which
        # exec() turned into our namespace dict — rebind via globals
        write_snap.__globals__["SCHEMA_SNAPSHOT"] = snap_path
        write_snap(snap)
        assert load_snap() == snap, "snapshot write→load must round-trip"
    finally:
        write_snap.__globals__["SCHEMA_SNAPSHOT"] = old

    print("GATE CONTRACT OK")


if __name__ == "__main__":
    main()
