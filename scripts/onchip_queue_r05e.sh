#!/bin/bash
# Round-5 on-chip queue, phase 5: the serving reruns phase 3 lost to the
# missing --out flag, then the planner-enabled int8 powerlaw artifact.
set -u
cd /root/repo
LOG=/tmp/onchip_queue_r05e.log
echo "$(date -u +%FT%TZ) r05 phase-5 waiting for phase-3" >> "$LOG"
for i in $(seq 1 1440); do
  [ -f /tmp/onchip_queue_r05c_done ] && break
  sleep 30
done
echo "$(date -u +%FT%TZ) r05 phase-5 start" >> "$LOG"
run() {
  local name=$1; shift
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$LOG"
  timeout 14400 "$@" >> "$LOG" 2>&1
  echo "$(date -u +%FT%TZ) END $name rc=$?" >> "$LOG"
}
run serving_s8 python scripts/bench_serving.py --tpu \
    --out BENCH_SERVING_TPU_r05.json
run serving_s32 python scripts/bench_serving.py --tpu --slots 32 \
    --skip-chunk --out BENCH_SERVING_TPU_S32_r05.json
# planner-enabled powerlaw at int8: the artifact that answers item 1
# (in-graph QPS at the chosen plan + the full recall/latency ladder)
run recall_1m_powerlaw_int8 python scripts/bench_filtered_recall.py --tpu \
    --n 1000000 --dim 1024 --dist powerlaw --dtype int8 \
    --out RECALL_1M_POWERLAW_r05.json
echo "$(date -u +%FT%TZ) r05 phase-5 complete" >> "$LOG"
touch /tmp/onchip_queue_r05e_done
