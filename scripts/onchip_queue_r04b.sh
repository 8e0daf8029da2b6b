#!/bin/bash
# Round-4 on-chip queue, phase 2 — waits for phase 1 (serialize chip use).
set -u
cd /root/repo
LOG=/tmp/onchip_queue_r04.log
while [ ! -f /tmp/onchip_queue_r04_done ]; do sleep 60; done
echo "$(date -u +%FT%TZ) r04 phase-2 start" >> "$LOG"

run() {
  local name=$1; shift
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$LOG"
  timeout 10800 "$@" >> "$LOG" 2>&1
  echo "$(date -u +%FT%TZ) END $name rc=$?" >> "$LOG"
}

# 5. end-to-end per-mode query latency with the 7B geometry (verdict #6)
run e2e_r04 python scripts/bench_e2e_tpu.py --out BENCH_E2E_TPU_r04.json

# 6. 10M capacity QPS rerun with hierarchical top-k (was 276 ms/batch)
run scale10m_rerun python scripts/bench_scale_10m.py \
    --out BENCH_SCALE_10M_r04.json

# 7. 1M power-law recall ladder on-chip (verdict #4 at scale)
run recall_1m_powerlaw python scripts/bench_filtered_recall.py \
    --tpu --n 1000000 --dist powerlaw --queries 20 \
    --out RECALL_1M_POWERLAW_r04.json

echo "$(date -u +%FT%TZ) r04 phase-2 complete" >> "$LOG"
touch /tmp/onchip_queue_r04b_done
