#!/bin/bash
# Anchor-until-calm: the r17 storm-wave lesson automated. The 30-second
# idle gate opens on a momentary dip and a storm wave can resume
# mid-run (both r17 fresh-boot storm lines had calm gate-open
# readings), so a single gated attempt is NOT a floor measurement.
# This wrapper runs idle-gated Bench attempts until one meets the
# calm bar (few probe-flagged queries AND vs_floor near band), or
# attempts run out. EVERY line lands in bench_full.jsonl — storm
# samples are evidence too (commit them adjudicated); only the
# stopping rule reads the self-report.
#
# Usage: tools/anchor_until_calm.sh [MAX_ATTEMPTS] [MAX_PF] [VS_MAX] [SF_DIR]
#   MAX_ATTEMPTS  gated bench runs before giving up     (default 4)
#   MAX_PF        accept a line with probe_flagged <= N (default 10)
#   VS_MAX        ... AND vs_floor <= this (default 1.25). The tool's
#                 own first run proved pf alone insufficient: a storm
#                 inflating EVERYTHING 1.2-1.4x trips no per-query
#                 >=1.5x flag (pf=8) yet lands far above band (45.5,
#                 vs_floor 1.42). A line with no floor field (first
#                 line ever / failed queries) passes on pf alone.
#   SF_DIR        fixture dir                (default /root/testdata/sf0.1)
# Exit 0 with the accepted compact line on stdout; exit 1 if no
# attempt met the bar (the best line is still in the history file —
# adjudicate it, don't discard it).
set -u
cd "$(dirname "$0")/.."
MAX_ATTEMPTS=${1:-4}
MAX_PF=${2:-10}
VS_MAX=${3:-1.25}
SF_DIR=${4:-/root/testdata/sf0.1}
[[ "$MAX_ATTEMPTS" =~ ^[0-9]+$ && "$MAX_PF" =~ ^[0-9]+$ && "$VS_MAX" =~ ^[0-9.]+$ ]] || {
  echo "usage: $0 [MAX_ATTEMPTS] [MAX_PF] [VS_MAX] [SF_DIR]" >&2; exit 64; }
for i in $(seq 1 "$MAX_ATTEMPTS"); do
  echo "[anchor] attempt $i/$MAX_ATTEMPTS" >&2
  line=$(tools/idle_run.sh 0.5 30 -- env SPARK_GRAFT_SF_DIR="$SF_DIR" \
    tools/spark_java.sh graft.Bench 2>/dev/null | tail -1)
  if [[ -z "$line" ]]; then
    # no line = the run failed outright, not a storm observation — no
    # wave to wait out, retry immediately
    echo "[anchor] attempt $i produced no line (see stderr of the run)" >&2
    continue
  fi
  verdict=$(printf '%s' "$line" | python3 -c "
import json,sys
d=json.load(sys.stdin)
pf=d.get('probe_flagged',10**9)
vf=d.get('vs_floor')
ok=pf<=int('$MAX_PF') and (vf is None or vf<=float('$VS_MAX'))
print(f'{int(ok)} pf={pf} vs_floor={vf}')" 2>/dev/null || echo "0 parse-error")
  echo "[anchor] attempt $i: $verdict (bar: pf<=$MAX_PF, vs_floor<=$VS_MAX)" >&2
  if [[ "$verdict" == 1\ * ]]; then
    printf '%s\n' "$line"
    exit 0
  fi
  # a flagged line means a wave is live NOW — let it pass before the
  # next gate (waves in the r17 table ran ~10-20 min). No point
  # sleeping after the FINAL attempt: there is no next gate.
  [[ "$i" -lt "$MAX_ATTEMPTS" ]] && sleep 300
done
echo "[anchor] no attempt met the bar (pf<=$MAX_PF, vs_floor<=$VS_MAX) after $MAX_ATTEMPTS runs;" \
  "all lines are in the history — adjudicate the best one" >&2
exit 1
