#!/bin/bash
# Round-4 on-chip queue, phase 4 (session 4): isolate the steady-state
# 1M IVF rebuild after the device-ranked homeless placement landed
# (balance phase previously shipped ~1.6 GB through the ~69 MB/s relay;
# BENCH_IVF1M_r04.json measured balance_s 30.99 of warm_build_s 128.6).
set -u
cd /root/repo
LOG=/tmp/onchip_queue_r04d.log
echo "$(date -u +%FT%TZ) r04 phase-4 start" >> "$LOG"
run() {
  local name=$1; shift
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$LOG"
  timeout 10800 "$@" >> "$LOG" 2>&1
  echo "$(date -u +%FT%TZ) END $name rc=$?" >> "$LOG"
}
run ivf1m_rebuild python scripts/bench_scale.py --skip-flat --skip-ivf \
    --ivf-1m --ivf-1m-rebuild-only --out BENCH_IVF1M_REBUILD_r04.json
echo "$(date -u +%FT%TZ) r04 phase-4 complete" >> "$LOG"
touch /tmp/onchip_queue_r04d_done
