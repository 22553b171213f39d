#!/usr/bin/env python3
"""THE dev-loop replica of the driver's correctness gate.

Round-7 rewrite: the round-6 replica read the Spark parquet THROUGH
DuckDB and then coerced oracle dtypes onto the Spark frame
(`astype(s2.dtypes)`), so a DuckDB HUGEINT / DECIMAL(38,0) result
silently compared equal to a Spark int64 column — the replica said
ALL GREEN while the driver failed q64/q101/q102 on hash. This version
is dtype-strict: the Spark side is read with pyarrow, the oracle side
is fetched as arrow, and the two arrow schemas must agree (up to the
normalizations the driver itself demonstrably applies — see
`norm_type`) BEFORE any value comparison. A dtype mismatch is reported
as its own failure class so the fix lands in the oracle's types, not
in a value hunt.

Calibration contract: the driver's CORRECTNESS_r06 pass-set is ground
truth. Everything the driver passed must stay green here (so
timestamp-tz and large_string differences are normalized away);
everything it failed (int64 vs HUGEINT/DECIMAL) must fail here.

Usage: python3 tools/local_verify.py <outDir> <sfDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")


def norm_type(t: pa.DataType) -> pa.DataType:
    """Normalizations the driver's compare demonstrably applies (its r6
    verdict passed queries that differ in exactly these ways):
    timestamp tz + unit (Spark writes timestamp[us, tz=UTC], DuckDB
    emits timestamp[us]; ns-unit fixtures round-trip), string width
    (large_string vs string), integer width (q70 passed with spark
    int32 vs oracle int64), and list value-field nullability/width.
    Everything else — crucially int vs decimal/float — must match."""
    if pa.types.is_timestamp(t):
        return pa.timestamp("us")
    # uint64 does NOT fold to int64 (r14 review): values past 2^63-1
    # would wrap in the astype — a wrapped-but-matching pair passing,
    # or a spurious value diff, instead of the dtype-mismatch failure
    # class this tool promises. Narrower unsigned widths fit int64
    # losslessly and keep folding.
    if pa.types.is_unsigned_integer(t) and t.bit_width == 64:
        return t
    if pa.types.is_integer(t):
        return pa.int64()
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return pa.string()
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return pa.list_(norm_type(t.value_type))
    if pa.types.is_dictionary(t):
        return norm_type(t.value_type)
    return t


# Driver-contract dump encoding (the r18 regression's lesson): raw
# TIMESTAMP columns in a graded final schema are an enumerated,
# frozen set, and their parquet physical type must be INT96 — the
# encoding of every driver-green round (CORRECTNESS_r7–r17). r18
# switched the dump sessions to TIMESTAMP_MICROS and the driver
# failed schema+hash on exactly these four queries while this tool's
# int96-coercing value compare stayed green. This check closes that
# blind spot: it reads the dump's PHYSICAL parquet metadata with no
# coercion, so local green predicts driver green. Any NEW raw
# timestamp output must instead ship as epoch-µs BIGINT (SURVEY §5
# item 7) — do not grow this set without a driver-gated migration.
TS_CONTRACT = {
    "q27_sessionize": {"hour_start"},
    "q46_stream_batch_parity": {"window_start"},
    "q69_scd2_history": {"valid_from", "valid_to"},
    "q107_session_window": {"session_start", "session_end"},
}


def ts_physical_drift(name, files):
    """Timestamp-encoding drift in a dump, from raw parquet metadata
    (NO int96 coercion — this is exactly what the value compare
    normalizes away and the driver does not). EVERY part file is
    checked (r19 ADVICE): a dump dir with mixed parts — stale
    TIMESTAMP_MICROS files left beside fresh INT96 ones after a
    partial/killed overwrite — used to pass if the first sorted file
    happened to be clean, while the driver reads them all."""
    errs, ts_leaves = [], set()
    for f in files:
        sch = pq.ParquetFile(f).schema
        for i in range(len(sch)):
            col = sch.column(i)
            phys = str(col.physical_type)
            logi = str(col.logical_type)
            if phys != "INT96" and not logi.startswith("Timestamp"):
                continue
            base = col.path.split(".")[0]
            ts_leaves.add(base)
            if phys != "INT96":
                errs.append(f"{os.path.basename(f)} {col.path}: timestamp "
                            f"physical={phys} logical={logi}"
                            " — driver contract is INT96")
    for c in sorted(ts_leaves - TS_CONTRACT.get(name, set())):
        errs.append(f"{c}: raw TIMESTAMP output outside the enumerated driver-"
                    "contract set (q27/q46/q69/q107) — emit epoch-us BIGINT "
                    "instead (SURVEY §5 item 7)")
    return sorted(set(errs))


# Frozen per-query dump-schema fingerprint (r19 VERDICT item 2): the
# r18 regression generalized. ts_physical_drift guards ONE physical
# type; the same local-green/driver-red class exists for ANY encoding
# drift the value compare normalizes away — decimal precision, int32
# vs int64 physical, nullability, column order. The committed
# tools/dump_schemas.txt (the schema twin of tools/plan_digests.txt)
# freezes the full uncoerced parquet schema of every graded dump;
# any drift fails HERE, naming the query, before the driver can see
# it. Intentional changes: eyeball the diff, re-run with
# GRAFT_REGEN_DUMP_SCHEMAS=1 (merges entries for the queries present
# in this run), and note load-bearing changes in SURVEY §5.
SCHEMA_SNAPSHOT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "dump_schemas.txt")


def dump_schema_canonical(files):
    """Canonical uncoerced schema text of a dump, one line per parquet
    leaf column: path, physical type, logical type, and the max
    definition/repetition levels (nullability + nesting), in file
    order (column order is part of the contract). Returns (lines,
    errs): errs non-empty iff the part files disagree — the
    generalization of the mixed-part timestamp hole (r19 ADVICE) to
    the whole schema."""
    per_file, lines = {}, None
    for f in files:
        sch = pq.ParquetFile(f).schema
        ls = []
        for i in range(len(sch)):
            col = sch.column(i)
            ls.append(f"{col.path} physical={col.physical_type} "
                      f"logical={col.logical_type} "
                      f"def={col.max_definition_level} "
                      f"rep={col.max_repetition_level}")
        per_file.setdefault(tuple(ls), []).append(os.path.basename(f))
        lines = ls
    if len(per_file) > 1:
        names = " vs ".join(",".join(v) for v in per_file.values())
        return None, [f"part files carry DIFFERENT schemas: {names}"]
    return lines, []


def load_schema_snapshot():
    """tools/dump_schemas.txt → {query: [lines]}; {} if absent."""
    snap = {}
    if not os.path.exists(SCHEMA_SNAPSHOT):
        return snap
    cur = None
    for ln in open(SCHEMA_SNAPSHOT).read().splitlines():
        if ln.startswith("== "):
            cur = ln[3:].strip()
            snap[cur] = []
        elif cur is not None and ln.strip():
            snap[cur].append(ln)
    return snap


def write_schema_snapshot(snap):
    with open(SCHEMA_SNAPSHOT, "w") as fh:
        fh.write("# Frozen per-query dump schemas (uncoerced parquet "
                 "metadata) — see local_verify.py.\n"
                 "# Regenerate deliberately: GRAFT_REGEN_DUMP_SCHEMAS=1 "
                 "python3 tools/local_verify.py <outdir> <sfdir>\n")
        for q in sorted(snap):
            fh.write(f"== {q}\n")
            for ln in snap[q]:
                fh.write(ln + "\n")


def decimal_cols(tbl: pa.Table):
    """Decimal (incl. DuckDB HUGEINT→decimal128) in a FINAL schema is a
    portability hazard even when both sides agree locally: the driver's
    arrow→pandas conversion degrades decimals, and its DuckDB version
    may render/convert them differently (round-6 q101 failed the
    driver's hash while byte-identical under local DuckDB 1.0.0).
    Repo rule: final schemas carry only BIGINT/DOUBLE/VARCHAR/DATE/
    BOOLEAN — sum through DECIMAL internally, CAST on output."""
    return [f.name for f in tbl.schema if pa.types.is_decimal(f.type)]


def uint64_cols(tbl: pa.Table):
    """uint64 in a FINAL schema fails loudly (r19 ADVICE): the repo's
    portability rule already forbids it (final schemas carry only
    BIGINT/DOUBLE/VARCHAR/DATE/BOOLEAN), norm_type deliberately does
    NOT fold it to int64 (values past 2^63-1 would wrap), and the
    nullable-Int64 mapper below deliberately does not widen it — so a
    uint64 column would silently take pandas' int-with-nulls→float64
    path and reintroduce the exact >2^53 precision loss the mapper
    exists to prevent. Failing here turns that silent degradation into
    the same loud contract violation the decimal check gives."""
    return [f.name for f in tbl.schema
            if pa.types.is_unsigned_integer(f.type) and f.type.bit_width == 64]


def to_pandas_sorted(tbl: pa.Table, cols):
    t = tbl.select(cols)
    # timestamps → epoch-µs int64 while still in ARROW: pandas'
    # datetime64[ns] target silently WRAPS past 2262-04-11 (the r18
    # nulltime probe's 9999-12-31 far-future rows compared as
    # 1816-03-30), so timestamps never reach pandas as timestamps.
    # Epoch integers compare and sort exactly, identically on both
    # sides; tz-aware and naive µs agree under the pinned-UTC session
    # (this replaces the old post-hoc tz/unit normalization for
    # timestamp columns — DATE columns still take the object path).
    for i, f in enumerate(t.schema):
        if pa.types.is_timestamp(f.type):
            t = t.set_column(
                i, f.name,
                t.column(i).cast(pa.timestamp("us", tz=f.type.tz))
                           .cast(pa.int64()))
        elif (pa.types.is_integer(f.type) and f.type != pa.int64()
              and not (pa.types.is_unsigned_integer(f.type)
                       and f.type.bit_width == 64)):
            # widen small ints at the ARROW level so the types_mapper
            # below sees one uniform int64 on both sides (a post-pandas
            # astype would leave spark-int32 as plain int64 while an
            # oracle-int64 column became nullable Int64 — dtype-unequal
            # frames for value-equal results)
            t = t.set_column(i, f.name, t.column(i).cast(pa.int64()))
    # int64 → pandas NULLABLE Int64: the default path converts
    # int64-with-nulls to float64, which is exact only to 2^53 —
    # epoch-µs instants past ~2255 (e.g. the 9999-12-31 nulltime rows,
    # 2.5e17) would lose sub-~32µs precision and a genuine sub-32µs
    # divergence at far-future magnitudes would compare EQUAL. Int64
    # keeps every magnitude exact and NA-safe; both sides take the
    # same mapper so dtypes agree.
    df = t.to_pandas(
        types_mapper=lambda typ: pd.Int64Dtype() if typ == pa.int64() else None)
    # tz-aware → naive, and one datetime unit, so tz/unit-normalized
    # columns compare by instant; ints to one width (norm_type already
    # gated signed-width only)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            if getattr(df[c].dt, "tz", None) is not None:
                df[c] = df[c].dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
        # (small-int widening now happens at the arrow level above, so
        # every signed/narrow-unsigned integer column is already Int64)
        # lists arrive as np.ndarray cells; normalize RECURSIVELY to
        # tuples (a nested ndarray breaks tuple equality with "truth
        # value of an array is ambiguous") and map NaN floats inside
        # containers to one sentinel (distinct NaN objects inside
        # tuples bypass pandas' top-level NaN handling) — r14 review
        if df[c].dtype == object:
            df[c] = df[c].map(norm_cell)
    return df.sort_values(cols).reset_index(drop=True)


def norm_cell(v):
    if isinstance(v, list) or type(v).__name__ == "ndarray":
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, float) and v != v:
        return "__nan__"
    return v


oracles = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
schema_snap = load_schema_snapshot()
regen_schemas = os.environ.get("GRAFT_REGEN_DUMP_SCHEMAS") == "1"
regen_acc = {}
# a query that THREW inside Verify writes no dump dir at all — without
# this check it would silently vanish from the report. queries.json is
# the full attempted list (covers rows-only queries, which have no
# oracle entry to flag them); oracle keys are the fallback for dumps
# produced before it existed.
dumped = {n for n in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, n))}
expected = set(oracles)
qlist = os.path.join(outdir, "queries.json")
if os.path.exists(qlist):
    expected |= set(json.load(open(qlist)))
for name in sorted(expected - dumped):
    print(f"{name}: MISSING SPARK DUMP (query failed inside Verify?)")
    fails.append(name)
for name in sorted(os.listdir(outdir)):
    qdir = os.path.join(outdir, name)
    if not os.path.isdir(qdir):
        continue
    # a dump dir this run's manifest does not know is STALE (a
    # previous full run into a reused outDir, overwritten by a
    # filtered dev-loop run): treating it as rows-only printed ALL
    # GREEN having compared nothing (r14 review)
    if name not in expected:
        print(f"{name}: STALE/UNKNOWN DUMP (not in this run's "
              "queries.json/oracle_sql.json) — clear the outDir")
        fails.append(name)
        continue
    files = sorted(glob.glob(f"{qdir}/*.parquet"))
    if not files:
        print(f"{name}: NO SPARK OUTPUT")
        fails.append(name)
        continue
    drift = ts_physical_drift(name, files)
    if drift:
        print(f"{name}: TIMESTAMP ENCODING DRIFT (driver would fail "
              "schema+hash even if values match)")
        for d in drift:
            print(f"  {d}")
        fails.append(name)
        continue
    # full-schema fingerprint against the committed snapshot (r19
    # VERDICT item 2) — the dump BYTES are the driver contract, so any
    # uncoerced schema drift is a failure even when values match
    sch_lines, sch_errs = dump_schema_canonical(files)
    if sch_errs:
        print(f"{name}: MIXED-PART DUMP SCHEMA")
        for e in sch_errs:
            print(f"  {e}")
        fails.append(name)
        continue
    if regen_schemas:
        regen_acc[name] = sch_lines
    else:
        committed = schema_snap.get(name)
        if committed is None:
            print(f"{name}: NO COMMITTED DUMP SCHEMA (tools/dump_schemas"
                  ".txt) — new/renamed dump; regenerate deliberately with "
                  "GRAFT_REGEN_DUMP_SCHEMAS=1")
            fails.append(name)
            continue
        if committed != sch_lines:
            print(f"{name}: DUMP SCHEMA DRIFT vs committed fingerprint "
                  "(driver hashes the dump bytes — this ships local-green/"
                  "driver-red unless intentional; if intentional, "
                  "GRAFT_REGEN_DUMP_SCHEMAS=1 and note it in SURVEY §5)")
            for ln in committed:
                if ln not in sch_lines:
                    print(f"  - {ln}")
            for ln in sch_lines:
                if ln not in committed:
                    print(f"  + {ln}")
            if committed != sch_lines and \
                    sorted(committed) == sorted(sch_lines):
                print("  (column ORDER changed)")
            fails.append(name)
            continue
    # coerce_int96_timestamp_unit: INT96 (the contract encoding,
    # enforced above) would otherwise be force-read as NANOSECONDS,
    # wrapping post-2262 instants (r18 nulltime probe: 9999-12-31 read
    # back as 1816-03-30). Coercion is a VALUE-read normalization only;
    # the physical-type contract was already checked uncoerced.
    stbl = pq.read_table(files, coerce_int96_timestamp_unit="us")
    # the decimal hazard applies to EVERY final schema, rows-only
    # included (r14 review: the rows-only continue used to skip it
    # exactly where no oracle compare would catch it on the driver)
    haz_s = decimal_cols(stbl)
    if haz_s:
        print(f"{name}: DECIMAL IN FINAL SCHEMA ({', '.join(haz_s)}) — "
              "driver-portability hazard; CAST the output to BIGINT/DOUBLE")
        fails.append(name)
        continue
    haz_u = uint64_cols(stbl)
    if haz_u:
        print(f"{name}: UINT64 IN FINAL SCHEMA ({', '.join(haz_u)}) — "
              "forbidden by the portability rule and silently degrades to "
              "float64 in pandas; CAST the output to BIGINT")
        fails.append(name)
        continue
    if name not in oracles:
        print(f"{name}: rows-only (no oracle) spark_rows={stbl.num_rows}")
        if stbl.num_rows == 0:
            fails.append(name)
        continue
    try:
        otbl = con.execute(oracles[name]).arrow()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}")
        fails.append(name)
        continue
    ok_rows = stbl.num_rows == otbl.num_rows
    scols, ocols = sorted(stbl.column_names), sorted(otbl.column_names)
    ok_schema = scols == ocols
    ok_dtype = False
    ok_hash = False
    haz_o = [c + " (oracle)" for c in decimal_cols(otbl)]
    if haz_o:
        print(f"{name}: DECIMAL IN FINAL SCHEMA ({', '.join(haz_o)}) — "
              "driver-portability hazard; CAST the output to BIGINT/DOUBLE")
        fails.append(name)
        continue
    haz_uo = [c + " (oracle)" for c in uint64_cols(otbl)]
    if haz_uo:
        print(f"{name}: UINT64 IN FINAL SCHEMA ({', '.join(haz_uo)}) — "
              "fix the oracle's types (CAST AS BIGINT), not the values")
        fails.append(name)
        continue
    if ok_schema:
        mism = []
        for c in scols:
            st = norm_type(stbl.schema.field(c).type)
            ot = norm_type(otbl.schema.field(c).type)
            if not st.equals(ot):
                mism.append(f"{c}: spark={stbl.schema.field(c).type} oracle={otbl.schema.field(c).type}")
        ok_dtype = not mism
        if mism:
            print(f"{name}: DTYPE MISMATCH — fix the oracle's types, not the values")
            for m in mism:
                print(f"  {m}")
    if ok_rows and ok_schema and ok_dtype:
        try:
            s2 = to_pandas_sorted(stbl, scols)
            o2 = to_pandas_sorted(otbl, scols)
            ok_hash = s2.equals(o2)
            if not ok_hash:
                for c in scols:
                    if not s2[c].equals(o2[c]):
                        # nullable Int64 eq yields pd.NA where exactly one
                        # side is NA — that IS a diff, so fill True
                        neq = (~(s2[c].eq(o2[c]) |
                                 (s2[c].isna() & o2[c].isna()))).fillna(True)
                        idx = neq[neq].index
                        i = idx[0] if len(idx) else 0
                        print(f"  first diff col={c} row={i}: spark={s2[c][i]!r} oracle={o2[c][i]!r}")
                        break
        except Exception as e:
            print(f"  compare error: {e}")
    status = "OK" if (ok_rows and ok_schema and ok_dtype and ok_hash) else \
        f"FAIL rows={ok_rows}({stbl.num_rows}/{otbl.num_rows}) schema={ok_schema} dtype={ok_dtype} hash={ok_hash}"
    if not (ok_rows and ok_schema and ok_dtype and ok_hash):
        if not ok_schema:
            print(f"  spark cols={scols}\n  oracle cols={ocols}")
        fails.append(name)
    print(f"{name}: {status}")
if regen_schemas and regen_acc:
    # only freeze fingerprints of queries that finished the loop GREEN
    # (r20 ADVICE): the fingerprint is accumulated before the decimal/
    # uint64/value checks, so a query failing those would otherwise get
    # its (possibly wrong) schema committed in the same run
    dropped = sorted(n for n in regen_acc if n in fails)
    for n in dropped:
        del regen_acc[n]
    if dropped:
        print(f"\n[regen] NOT freezing {len(dropped)} failing queries' "
              f"schemas (fix and re-run): {', '.join(dropped)}")
    merged = dict(schema_snap)
    merged.update(regen_acc)
    write_schema_snapshot(merged)
    print(f"\n[regen] wrote {len(regen_acc)} dump-schema fingerprints "
          f"({len(merged)} total) to {SCHEMA_SNAPSHOT}")
print(f"\n{'ALL GREEN' if not fails else 'FAILURES: ' + ', '.join(fails)}")
sys.exit(1 if fails else 0)
