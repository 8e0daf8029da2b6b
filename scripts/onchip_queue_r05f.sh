#!/bin/bash
# Round-5 session-2 fallback queue: the build/scale benches that need no
# mid-run reaction. Launched AFTER the interactive jobs (serving reruns,
# LUT probe, powerlaw int8) land; runs unattended with per-job logging.
set -u
cd /root/repo
LOG=/tmp/onchip_queue_r05f.log
echo "$(date -u +%FT%TZ) r05f start" >> "$LOG"
run() {
  local name=$1; shift
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$LOG"
  timeout 14400 "$@" >> "$LOG" 2>&1
  echo "$(date -u +%FT%TZ) END $name rc=$?" >> "$LOG"
}
# items 1/5: 1M budget-IVF QPS + warm builds
run ivf_1m python scripts/bench_scale.py --skip-flat --skip-ivf --ivf-1m \
    --out BENCH_IVF1M_r05.json
# item 5: 100K block with warm rebuild
run ivf_100k python scripts/bench_scale.py --skip-flat --skip-1m \
    --out BENCH_SCALE100K_r05.json
# item 3: per-mode e2e + per-stage retrieval split (fused path)
run e2e python scripts/bench_e2e_tpu.py --out BENCH_E2E_TPU_r05.json
# item 4: budget-IVF at 10M (flat numbers stand from r04b)
run scale10m python scripts/bench_scale_10m.py --ivf --skip-flat \
    --out BENCH_SCALE_10M_r05.json
echo "$(date -u +%FT%TZ) r05f complete" >> "$LOG"
touch /tmp/onchip_queue_r05f_done
