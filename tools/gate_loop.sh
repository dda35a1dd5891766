#!/bin/bash
# Quiet-window gate runner: retries a gate main until the box is actually
# quiet, probing CHEAPLY (shell + /proc, ~3 s) before paying each ~90 s
# sbt boot. Round 17's re-stamp strategy lived in /tmp and builder notes
# ("detached retry loop, probe ~90 s then sleep 540 s") — this commits it,
# with the r18 steal probe folded in: the pre-probe provokes full-width CPU
# demand and reads /proc/stat's steal column, because co-tenant steal is
# invisible to the load average (measured r17: canary 0.244 s at loadavg
# 0.09) and only accrues while vCPUs actually demand cpu.
#
# Usage:   tools/gate_loop.sh <gate-main> <out-artifact> [tries] [sleep_s]
# Example: tools/gate_loop.sh graft.tools.ScaleGate /tmp/scalegate_rN.txt 11 540
#
# Detach with:  setsid nohup tools/gate_loop.sh ... > /tmp/gate_loop.out 2>&1 &
# (plain nohup dies with the wrapper shell — r17 field note; and never put
# the sbt launcher's process name in a pkill pattern in the same command.)
#
# Exit: 0 = gate PASSED and stdout saved to <out-artifact> (sbt noise
# stripped); 1 = real gate failure (a regression — stop and look); 2 = never
# found a quiet window in <tries> attempts.
set -u
cd "$(dirname "$0")/.."

MAIN="${1:?gate main class, e.g. graft.tools.ScaleGate}"
OUT="${2:?output artifact path}"
TRIES="${3:-11}"
SLEEP="${4:-540}"
MAXLOAD="${GATE_MAXLOAD:-0.20}"
MAXSTEAL="${GATE_MAXSTEAL:-0.03}"

# ~3 s pre-probe: 1-min loadavg must be under MAXLOAD, and steal fraction
# under full 32-way provoked demand under MAXSTEAL. Returns 0 when quiet.
probe_quiet() {
  local load
  load=$(cut -d' ' -f1 /proc/loadavg)
  awk -v l="$load" -v m="$MAXLOAD" 'BEGIN{exit !(l<m)}' || {
    echo "[gate_loop] loadavg $load >= $MAXLOAD — not quiet"; return 1; }
  # provoke demand: steal only accrues while vCPUs want to run
  local n pids=() a b at bt
  n=$(nproc)
  for _ in $(seq 1 "$n"); do
    ( end=$((SECONDS + 3)); while [ "$SECONDS" -lt "$end" ]; do :; done ) &
    pids+=($!)
  done
  sleep 0.3
  # busy = non-idle non-iowait jiffies: steal as a share of DEMANDED cpu
  # (total-relative dilutes a storm to ~2% on a mostly-idle 32-cpu box)
  read -r a at < <(awk '/^cpu /{s=0; for(i=2;i<=NF;i++) s+=$i; print $9, s-$5-$6}' /proc/stat)
  sleep 2
  read -r b bt < <(awk '/^cpu /{s=0; for(i=2;i<=NF;i++) s+=$i; print $9, s-$5-$6}' /proc/stat)
  kill "${pids[@]}" 2>/dev/null; wait 2>/dev/null
  awk -v ds="$((b - a))" -v dt="$((bt - at))" -v m="$MAXSTEAL" \
    'BEGIN{f = (dt > 0) ? ds / dt : 0; printf "[gate_loop] provoked steal %.3f of demand\n", f; exit !(f < m)}'
}

for i in $(seq 1 "$TRIES"); do
  if ! probe_quiet; then
    echo "[gate_loop] try $i/$TRIES: box not quiet ($(date -u +%H:%M:%S)); sleeping $SLEEP s"
    sleep "$SLEEP"
    continue
  fi
  echo "[gate_loop] try $i/$TRIES: quiet — launching $MAIN ($(date -u +%H:%M:%S))"
  LOG="/tmp/gate_loop_try$i.log"
  sbt -batch "runMain $MAIN" > "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    # keep only the gate's own lines (its [tag] verdicts, the measurement
    # table header, and name-then-numbers table rows): sbt/Spark noise out
    # of the artifact
    TAG=$(echo "$MAIN" | awk -F. '{print tolower($NF)}')
    grep -aE "^\[$TAG\]|^query |^[a-z][a-z0-9_]+ +-?[0-9.]|^tier " "$LOG" > "$OUT" \
      || cp "$LOG" "$OUT"
    echo "[gate_loop] PASS on try $i — artifact at $OUT"
    exit 0
  fi
  if grep -aq "box loaded" "$LOG"; then
    echo "[gate_loop] try $i: gate aborted box-loaded (its canary saw what the pre-probe missed); sleeping $SLEEP s"
    sleep "$SLEEP"
  else
    echo "[gate_loop] try $i: REAL gate failure (rc=$rc) — not a load abort; see $LOG"
    exit 1
  fi
done
echo "[gate_loop] no quiet window in $TRIES tries"
exit 2
