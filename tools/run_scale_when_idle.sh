#!/bin/bash
# Launch the 96M-URL N-vs-4N scaling study once the box is idle.
# VERDICT r3 ask #3: the 4-core config needs shuffle partitions scaled
# to data (SCALE_SHUFFLE) so per-partition sorts fit in memory, and the
# study is meaningless under external load — wait for loadavg < LOAD_MAX
# (checked every 60 s, up to WAIT_MAX_S), then run detached.
set -u
cd "$(dirname "$0")/.."
LOAD_MAX=${LOAD_MAX:-3.0}
WAIT_MAX_S=${WAIT_MAX_S:-7200}
N_URLS=${N_URLS:-96000000}
LOG=BENCH/scale_96m.log
waited=0
while :; do
  load=$(cut -d' ' -f1 /proc/loadavg)
  ok=$(python3 -c "print(1 if $load < $LOAD_MAX else 0)")
  if [ "$ok" = "1" ]; then
    # require two consecutive quiet samples 30 s apart
    sleep 30
    load2=$(cut -d' ' -f1 /proc/loadavg)
    ok2=$(python3 -c "print(1 if $load2 < $LOAD_MAX else 0)")
    [ "$ok2" = "1" ] && break
  fi
  if [ "$waited" -ge "$WAIT_MAX_S" ]; then
    echo "$(date -u +%FT%TZ) giving up waiting (load=$load); running under load — numbers carry a contention caveat" >> "$LOG"
    break
  fi
  sleep 60
  waited=$((waited + 60))
done
echo "$(date -u +%FT%TZ) starting scale_bench n=$N_URLS load=$(cut -d' ' -f1 /proc/loadavg) waited=${waited}s" >> "$LOG"
SCALE_SHUFFLE=${SCALE_SHUFFLE:-256} SCALE_REPS=${SCALE_REPS:-3} \
  python3 tools/scale_bench.py "$N_URLS" >> "$LOG" 2>&1
echo "$(date -u +%FT%TZ) scale_bench done rc=$?" >> "$LOG"
