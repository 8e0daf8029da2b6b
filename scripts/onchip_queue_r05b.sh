#!/bin/bash
# Round-5 on-chip queue, phase 2: the u8 w4-unpack variant actually fixed
# (Mosaic has no u8-lane shrui — both nibbles now extract by mask), and the
# gather-style microbench that decides whether the 10M budget-IVF needs a
# Pallas chunk-DMA kernel or XLA's gather already rides DMA runs.
set -u
cd /root/repo
LOG=/tmp/onchip_queue_r05b.log
echo "$(date -u +%FT%TZ) r05 phase-2 start" >> "$LOG"
run() {
  local name=$1; shift
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$LOG"
  timeout 10800 "$@" >> "$LOG" 2>&1
  echo "$(date -u +%FT%TZ) END $name rc=$?" >> "$LOG"
}
run w4_tune python scripts/tune_w4.py --out W4_TUNE_r05.json
run gather python scripts/bench_gather.py --out BENCH_GATHER_r05.json
echo "$(date -u +%FT%TZ) r05 phase-2 complete" >> "$LOG"
touch /tmp/onchip_queue_r05b_done
