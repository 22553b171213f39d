#!/bin/bash
# Load-gated runner: wait for a genuinely idle window, then exec the
# given command. The bench/ladder artifacts self-label contamination
# via their ambient probes (SCALING.md), but a measurement that never
# starts under load doesn't need adjudicating — sessions 5 and 6 both
# burned full bench runs that a 30-second gate would have skipped.
#
# Usage: tools/idle_run.sh [MAX_LOAD] [MAX_WAIT_MIN] -- cmd args...
#   MAX_LOAD     1-min loadavg threshold (default 0.5)
#   MAX_WAIT_MIN give up waiting after this many minutes and run
#                anyway, loudly (default 45)
# The gate requires TWO consecutive under-threshold readings 15 s
# apart, so a momentary dip between storm waves doesn't open it.
set -u
usage() { echo "usage: $0 [MAX_LOAD] [MAX_WAIT_MIN] -- cmd args..." >&2; exit 64; }
MAX_LOAD=0.5
MAX_WAIT=45
if [[ "${1:-}" != "--" && -n "${1:-}" ]]; then MAX_LOAD=$1; shift; fi
if [[ "${1:-}" != "--" && -n "${1:-}" ]]; then MAX_WAIT=$1; shift; fi
# fail LOUDLY on a malformed invocation (r11 ADVICE): without the
# `--` the first command words were silently eaten as thresholds and
# `exec` could run with no args — exit 0 having measured nothing,
# the worst failure mode a measurement gate can have.
[[ "${1:-}" == "--" ]] || usage
shift
[[ $# -gt 0 ]] || usage
[[ "$MAX_LOAD" =~ ^[0-9.]+$ && "$MAX_WAIT" =~ ^[0-9]+$ ]] || usage
deadline=$(( $(date +%s) + MAX_WAIT*60 ))
ok=0
while (( $(date +%s) < deadline )); do
  L1=$(cut -d' ' -f1 /proc/loadavg)
  if awk -v l="$L1" -v t="$MAX_LOAD" 'BEGIN{exit !(l<t)}'; then
    sleep 15
    L2=$(cut -d' ' -f1 /proc/loadavg)
    if awk -v l="$L2" -v t="$MAX_LOAD" 'BEGIN{exit !(l<t)}'; then
      echo "[idle_run] gate open at $(date -u +%H:%M:%S) load=$L2" >&2
      ok=1; break
    fi
  fi
  sleep 30
done
if (( ! ok )); then
  echo "[idle_run] WAITED ${MAX_WAIT}m, still loaded ($(cut -d' ' -f1-3 /proc/loadavg)) — running anyway; read the ambient probes" >&2
fi
exec "$@"
