#!/bin/bash
# Round-5 on-chip queue, phase 1: regenerate the stale artifacts the r04
# verdict flagged (item 7) — W4 unpack A/B with the fixed u8 variant, and
# a clean IVF-tail append rerun (the r04 artifact measured the one-time
# regrowth copy + suite contention).
set -u
cd /root/repo
LOG=/tmp/onchip_queue_r05a.log
echo "$(date -u +%FT%TZ) r05 phase-1 start" >> "$LOG"
run() {
  local name=$1; shift
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$LOG"
  timeout 10800 "$@" >> "$LOG" 2>&1
  echo "$(date -u +%FT%TZ) END $name rc=$?" >> "$LOG"
}
run w4_tune python scripts/tune_w4.py --out W4_TUNE_r05.json
run ivf_tail python scripts/bench_ivf_tail.py --out BENCH_IVF_TAIL_r05.json
echo "$(date -u +%FT%TZ) r05 phase-1 complete" >> "$LOG"
touch /tmp/onchip_queue_r05a_done
