#!/bin/bash
# Round-5 on-chip queue, phase 3: the verdict-item proof artifacts.
# Waits for phase 2 (gather microbench) to release the chip.
set -u
cd /root/repo
LOG=/tmp/onchip_queue_r05c.log
echo "$(date -u +%FT%TZ) r05 phase-3 waiting for phase-2" >> "$LOG"
for i in $(seq 1 720); do  # up to 6 h
  [ -f /tmp/onchip_queue_r05b_done ] && break
  sleep 30
done
echo "$(date -u +%FT%TZ) r05 phase-3 start" >> "$LOG"
run() {
  local name=$1; shift
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$LOG"
  timeout 10800 "$@" >> "$LOG" 2>&1
  echo "$(date -u +%FT%TZ) END $name rc=$?" >> "$LOG"
}
# item 1: 1M powerlaw recall+latency on the budget-probing IVF
run recall_1m_powerlaw python scripts/bench_filtered_recall.py --tpu \
    --n 1000000 --dim 1024 --dist powerlaw \
    --out RECALL_1M_POWERLAW_r05.json
# item 2: serving after the GQA no-repeat fix — S8 full, then S16/S32
run serving_s8 python scripts/bench_serving.py --tpu \
    --out BENCH_SERVING_TPU_r05.json
run serving_s16 python scripts/bench_serving.py --tpu --slots 16 \
    --skip-chunk --out BENCH_SERVING_TPU_S16_r05.json
run serving_s32 python scripts/bench_serving.py --tpu --slots 32 \
    --skip-chunk --out BENCH_SERVING_TPU_S32_r05.json
# item 6: sparse 16-bit A/B
run sparse python scripts/bench_sparse.py --out BENCH_SPARSE_r05.json
# items 1/5: 1M budget-IVF QPS + warm builds (no balance phase anymore)
run ivf_1m python scripts/bench_scale.py --skip-flat --skip-ivf --ivf-1m \
    --out BENCH_IVF1M_r05.json
# item 5: 100K block with warm rebuild
run ivf_100k python scripts/bench_scale.py --skip-flat --skip-1m \
    --out BENCH_SCALE100K_r05.json
# item 3 diagnosis: per-stage retrieval split
run e2e python scripts/bench_e2e_tpu.py --out BENCH_E2E_TPU_r05.json
echo "$(date -u +%FT%TZ) r05 phase-3 complete" >> "$LOG"
touch /tmp/onchip_queue_r05c_done
