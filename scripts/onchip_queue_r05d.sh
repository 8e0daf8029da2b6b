#!/bin/bash
# Round-5 on-chip queue, phase 4: 10M capacity + budget-IVF (verdict item
# 4), artifact regenerations, and the fixed gather budget-kernel section.
set -u
cd /root/repo
LOG=/tmp/onchip_queue_r05d.log
echo "$(date -u +%FT%TZ) r05 phase-4 waiting for phase-5" >> "$LOG"
for i in $(seq 1 1440); do  # up to 12 h
  [ -f /tmp/onchip_queue_r05e_done ] && break
  sleep 30
done
echo "$(date -u +%FT%TZ) r05 phase-4 start" >> "$LOG"
run() {
  local name=$1; shift
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$LOG"
  timeout 14400 "$@" >> "$LOG" 2>&1
  echo "$(date -u +%FT%TZ) END $name rc=$?" >> "$LOG"
}
# item 4: budget-probing IVF at 10M (the flat int8/int4 numbers stand
# from BENCH_SCALE_10M_r04b — that path is unchanged at HEAD)
run scale10m python scripts/bench_scale_10m.py --ivf --skip-flat \
    --out BENCH_SCALE_10M_r05.json
# item 7: ivf-tail artifact with the methodology reconciliation note
run ivf_tail python scripts/bench_ivf_tail.py --out BENCH_IVF_TAIL_r05.json
# gather budget-kernel section (fixed: corpus as argument)
run gather python scripts/bench_gather.py --dtypes int8 \
    --out BENCH_GATHER_r05b.json
# OCR pool on an idle machine (the first run fought the eval for cores)
run ocr_pool python scripts/bench_ocr_pool.py --out BENCH_OCR_POOL_r05.json
echo "$(date -u +%FT%TZ) r05 phase-4 complete" >> "$LOG"
touch /tmp/onchip_queue_r05d_done
