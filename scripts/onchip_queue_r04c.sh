#!/bin/bash
# Round-4 on-chip queue, phase 3 (session 3): regenerate the 10M capacity
# artifact with the PRODUCTION approx shortlist selection (BENCH_TOPK_AB_r04
# measured it at the 14.1 ms argmax scan floor vs 68.6 ms exact hierarchical;
# the committed BENCH_SCALE_10M_r04.json predates the switch and reports the
# pre-fix 71.5 ms/batch path). Writes to a NEW file so a mid-run death cannot
# clobber the landed artifact; bench.py prefers r04b when present.
set -u
cd /root/repo
LOG=/tmp/onchip_queue_r04c.log
echo "$(date -u +%FT%TZ) r04 phase-3 start" >> "$LOG"

run() {
  local name=$1; shift
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$LOG"
  timeout 10800 "$@" >> "$LOG" 2>&1
  echo "$(date -u +%FT%TZ) END $name rc=$?" >> "$LOG"
}

run scale10m_approx python scripts/bench_scale_10m.py \
    --out BENCH_SCALE_10M_r04b.json

echo "$(date -u +%FT%TZ) r04 phase-3 complete" >> "$LOG"
touch /tmp/onchip_queue_r04c_done
