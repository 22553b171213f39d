#!/usr/bin/env python3
"""Adjudicate a bench-line delta using the ambient probe fields.

Usage:
    python3 tools/bench_adjudicate.py [--ratio R] [BASE_IDX] [NEW_IDX]

Reads bench/bench_full.jsonl (1-indexed lines; negatives count from the
end, default BASE=-2 NEW=-1), compares per-query medians, and for every
query whose med inflated by more than R (default 1.5x) attributes the
inflation using the line's own evidence, in this order:

  fixture-drift  the two lines carry different fixture fingerprints —
                 stop: the comparison is between different bytes.
  stall          max >> med in the new line while min stayed near base:
                 one bad rep, the median survived; noise, not a change.
  external-cpu   the CPU canary at this query's offset inflated with it.
  disk           the io probe (8 MB fsync'd write + read-back in the
                 Spark tmp dir) inflated with it.
  gc             the rep loop's own-JVM GC-ms is a large share of the
                 inflation (heap pressure inside this process).
  query-change   all probes flat and min moved too — the query itself
                 got slower; investigate the code or plan.
  unattributed   probes flat but min did NOT move — ambient of a kind
                 the probes missed (e.g. contention that ended before
                 the probes re-ran); re-run in isolation before filing.

Older lines without io/gc fields degrade to canary-only attribution.

When more than a fifth of the comparable queries inflate at once the
episode is machine-wide (the r10 driver-run signature: pure codegen
projections inflating alongside shuffle queries) and PER-QUERY
attribution is unreliable — a banner says so; re-run when idle before
trusting any query-change tag printed under it.

A second machine-level signature bypasses the per-query threshold
entirely: when the median PER-QUERY MINIMUM ratio across the two
lines drifts >=1.2x, the machine itself changed speed between the
lines (new boot, sustained co-tenant load) — every query's floor
moves together, which no single query change can do. Session-6 case
of record: two queries tagged query-change at 1.8x/4.3x while the
line-wide median min-ratio was ~1.2x and isolation runs reproduced
the elevated floors on identical code. A MACHINE-STATE banner fires
and the pair exits 4 — including when NO single query clears the
per-query threshold (r12: the drift check runs before the
no-verdicts early return, so a uniform sub-threshold drift can no
longer exit 0 as "clean").

Since r12 every full bench line also SELF-reports (BenchLine.scala):
machine_state (its own verdict vs the last committed comparable
line), probe_flagged (queries whose canary/io probes read elevated
intra-line), and total_min (contamination-robust min-sum). The new
line's self-report is printed first when present; it and this
script implement the same rule, so they should agree whenever BASE
here is the line the self-report compared against.

Exit code: 0 if nothing inflated or everything reads as environment /
noise, 2 if any query reads query-change OUTSIDE a machine-wide or
machine-state episode, 3 on fixture drift, 4 on a machine-wide /
machine-state episode (per-query tags unreliable — re-run when idle
before reading 2 from that pair).
"""
import json
import signal
import sys

signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # survive `| head`

RATIO = 1.5
CANARY_UP = 1.8   # probe inflation factors that count as "elevated":
IO_UP = 2.0       # fsync latency is spiky, ask for 2x
GC_SHARE = 0.4    # gc-ms must explain >=40% of the added wall time
MIN_SECS = 0.25   # ignore sub-250ms queries: pure scheduling jitter
MINSHIFT = 1.2    # median min-ratio above this = machine-state shift
STORM_VS_FLOOR = 1.5  # vs_floor above this = storm regardless of the
                      # line-over-line verdict (r17: an escalating
                      # multi-line storm reads "calm" at every step;
                      # mirrors BenchLine.StormVsFloor)


def median(xs):
    s = sorted(xs)
    return s[len(s) // 2]


def load(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def pick(lines, idx):
    # 1-indexed from the front, negative from the end (like tail);
    # 0 is not a line in this scheme — mapping it to "first" silently
    # adjudicated against a decade-old baseline (r14 review)
    if idx == 0:
        sys.exit("index 0 is invalid: lines are 1-indexed "
                 "(negatives count from the end)")
    return lines[idx - 1] if idx > 0 else lines[idx]


def main(argv):
    ratio = RATIO
    args = []
    it = iter(argv)
    for a in it:
        if a == "--ratio":
            try:
                ratio = float(next(it))
            except (StopIteration, ValueError):
                sys.exit("usage: bench_adjudicate.py [--ratio R] "
                         "[BASE_IDX] [NEW_IDX]")
        else:
            args.append(int(a))
    base_idx = args[0] if len(args) > 0 else -2
    new_idx = args[1] if len(args) > 1 else -1

    lines = load("bench/bench_full.jsonl")
    base, new = pick(lines, base_idx), pick(lines, new_idx)

    if base.get("fixtures") != new.get("fixtures"):
        print(f"fixture-drift: base={base.get('fixtures')} "
              f"new={new.get('fixtures')} — different data, stop here")
        return 3

    # boot identity (lines since r11 session 6 carry it): floors are
    # only comparable within one boot — across boots the machine-state
    # check below is the expected outcome, not a surprise
    bb, nb = base.get("boot"), new.get("boot")
    if bb is not None and nb is not None and abs(bb - nb) > 60:
        print(f"note: lines are from DIFFERENT BOOTS "
              f"(base boot epoch {bb}, new {nb}) — floors not comparable")

    # the line's idle probe level is its own median, not a constant:
    # a loaded machine elevates every probe, and a query must be read
    # against the probes AROUND it in the same line
    amb = new.get("ambient", {})
    # pre-ambient lines (r1-r10) have no probe block at all: degrade to
    # the documented canary-only-or-nothing attribution instead of
    # crashing in median([]) (r14 review)
    cn_base = (median([a.get("canary", 0) for a in amb.values()])
               if amb else 0) or 1e-9
    io_base = (median([a.get("io", 0) for a in amb.values()])
               if amb else 0) or 1e-9
    has_io = any("io" in a for a in amb.values())
    # gc in the ambient block is the CUMULATIVE GC-ms across the whole
    # rep loop (Bench.scala), while `added` below is a per-rep median
    # delta — compare per-rep to per-rep or steady GC over-triggers the
    # gc tag by a factor of reps and adjudicates real regressions as
    # noise (r14 review)
    gc_reps = max(1, int(new.get("reps", 1)))

    # self-reported storm-robust fields (r12, BenchLine.scala): every
    # full line now carries its own verdict vs the last committed
    # comparable line, the contamination-robust min-sum, and the count
    # of probe-flagged queries — surface them first, they are the
    # emitting run's own view of its machine state
    ms = new.get("machine_state")
    if ms is not None:
        detail = ""
        if ms.get("min_ratio") is not None:
            detail = (f" (min_ratio {ms['min_ratio']:.2f} over {ms.get('n')} "
                      f"queries vs ts={ms.get('vs_ts')})")
        print(f"new line self-reports: machine_state={ms.get('verdict')}{detail} "
              f"probe_flagged={new.get('probe_flagged')} "
              f"total_min={new.get('total_min')}")
    # floor anchors (r15, BenchLine.scala): floor_band/vs_floor anchor
    # the line to the best committed single-line min-sum; cross_floor/
    # vs_cross to the per-query minima COMBINED across committed lines
    # (the truthful code floor on stall-sampling boots — r15 quiesce
    # experiment: three 44-49s lines combine to 38.1, in band)
    fb = new.get("floor_band")
    if fb is not None:
        cross = ""
        if new.get("cross_floor") is not None:
            cross = (f" cross_floor={new['cross_floor']} "
                     f"vs_cross={new.get('vs_cross')}")
        above = "" if new.get("vs_floor", 0) <= 1.2 else " — ABOVE BAND"
        print(f"floor anchors: floor_band={fb} vs_floor={new.get('vs_floor')}"
              f"{cross}{above}")
        # storm-proof the self-verdict on read (r17 VERDICT item 1):
        # lines emitted before the BenchLine.stormProof fix — and any
        # line whose emitter missed it — can self-label "calm"/"faster"
        # while sitting far above the committed floor, because
        # machine_state compares line-over-line and an escalating
        # multi-line storm reads near-1 at every step. Apply the same
        # absolute-floor rule here so a reader of THIS tool can never
        # be misled by the embedded verdict.
        # any non-storm verdict is promoted — "no-baseline" included
        # (a first line on a boot far above floor is still a storm
        # observation), mirroring BenchLine.stormProof exactly (r18
        # advice: the two sides disagreed on no-baseline lines)
        vf = new.get("vs_floor")
        if (vf is not None and vf > STORM_VS_FLOOR and ms is not None
                and ms.get("verdict") != "storm"):
            print(f"VERDICT OVERRIDE: vs_floor {vf} > {STORM_VS_FLOOR} — "
                  f"self-reported machine_state '{ms.get('verdict')}' is "
                  f"line-over-line only; absolute-floor reading is STORM")
    # storm-resistance re-reps (r20, Bench.scala): a named query's min
    # includes up-to-2 extra end-of-run reps granted because its
    # primary min sat >1.5x its committed floor — still real
    # executions, but a reader comparing minima should know which
    # queries had the extra chance
    for side, d in (("base", base), ("new", new)):
        rr = d.get("rerep")
        if rr:
            # full lines carry a {name: count} map; COMPACT lines carry
            # the bare count as an int (r20 ADVICE) — disclose what we
            # have instead of raising TypeError on the int form
            if isinstance(rr, dict):
                print(f"{side} line re-repped {len(rr)} storm-inflated "
                      f"queries (min kept over primary+extra reps): "
                      f"{sorted(rr)}")
            else:
                print(f"{side} line re-repped {rr} storm-inflated "
                      f"queries (compact line; names not carried)")
    # a query named here recorded time-to-fail, not a measurement —
    # its per-query numbers (in either line) must be disregarded
    for side, d in (("base", base), ("new", new)):
        if d.get("failed"):
            print(f"{side.upper()} LINE HAS FAILED QUERIES (timings are "
                  f"time-to-fail, not measurements): {d['failed']}")

    # queries that failed in either run carry time-to-fail numbers —
    # exclude them from per-query verdicts and the floor-drift median
    excluded = set(base.get("failed", {})) | set(new.get("failed", {}))

    verdicts = []
    for q, nv in sorted(new["queries"].items(), key=lambda kv: -kv[1]):
        bv = base["queries"].get(q)
        # the ratio floors the BASE at MIN_SECS too (r14 review): a
        # 0.2s query jittering to 0.32s is scheduling noise, not a
        # 1.6x verdict — the same convention min_ratios below applies
        if q in excluded or bv is None or nv < MIN_SECS \
                or nv / max(bv, MIN_SECS) < ratio:
            continue
        a = amb.get(q, {})
        sp = new.get("spread", {}).get(q, {})
        bsp = base.get("spread", {}).get(q, {})
        added = nv - bv
        min_moved = sp.get("min", nv) > bsp.get("min", bv) * ratio
        if sp.get("max", nv) > 2 * nv and not min_moved:
            tag = "stall"
        elif a.get("canary", 0) > CANARY_UP * cn_base:
            tag = "external-cpu"
        elif has_io and a.get("io", 0) > IO_UP * io_base:
            tag = "disk"
        elif a.get("gc", 0) / 1000.0 / gc_reps > GC_SHARE * added:
            tag = "gc"
        elif min_moved:
            tag = "query-change"
        else:
            tag = "unattributed"
        verdicts.append((tag, q, bv, nv, a, sp))

    # uniform floor drift: median per-query MIN ratio across the two
    # lines. Minimums of sub-MIN_SECS queries are scheduling jitter,
    # so only queries with a meaningful base median participate.
    # Computed BEFORE the no-verdicts early return (r11 ADVICE): a
    # uniform 1.2-1.5x floor drift where no single query clears the
    # per-query threshold is still a machine-state shift — exiting 0
    # as "clean" let a cross-state total-time drift read as a
    # same-state comparison.
    min_ratios = [
        new["spread"][q]["min"] / base["spread"][q]["min"]
        for q in new.get("spread", {})
        if q in base.get("spread", {})
        and q not in excluded
        and base["queries"].get(q, 0) >= MIN_SECS
        and base["spread"][q].get("min", 0) > 0
        and "min" in new["spread"][q]
    ]
    machine_shift = len(min_ratios) >= 5 and median(min_ratios) >= MINSHIFT
    if machine_shift:
        print(f"MACHINE-STATE: median per-query min-ratio "
              f"{median(min_ratios):.2f}x across {len(min_ratios)} queries "
              f"— the machine changed speed between these lines (boot / "
              f"sustained co-tenant load); per-query tags are unreliable, "
              f"compare against a same-boot baseline instead")

    if not verdicts:
        print(f"{'shifted' if machine_shift else 'clean'}: no query "
              f"inflated >={ratio}x "
              f"(base {base['value']:.1f}s -> new {new['value']:.1f}s)")
        return 4 if machine_shift else 0

    # failed queries are excluded from the verdict numerator above, so
    # counting them here would dilute the >0.2 fraction and suppress
    # the banner exactly when a run is already known-broken
    comparable = sum(1 for q, nv in new["queries"].items()
                     if q in base["queries"] and nv >= MIN_SECS
                     and q not in excluded)
    machine_wide = comparable and len(verdicts) / comparable > 0.2
    if machine_wide:
        print(f"MACHINE-WIDE: {len(verdicts)}/{comparable} comparable "
              f"queries inflated >={ratio}x — ambient episode; per-query "
              f"tags below are unreliable, re-run idle before trusting "
              f"any query-change")

    bad = False
    for tag, q, bv, nv, a, sp in verdicts:
        probes = (f"canary={a.get('canary', '-')} io={a.get('io', '-')} "
                  f"gc={a.get('gc', '-')}ms")
        print(f"{tag:13s} {q:30s} {bv:6.2f} -> {nv:6.2f} "
              f"({nv / bv:4.1f}x)  min/max={sp.get('min')}/{sp.get('max')}  {probes}")
        bad |= tag == "query-change"
    if machine_wide or machine_shift:
        return 4
    return 2 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
