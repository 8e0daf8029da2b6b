#!/bin/bash
# Round-4 on-chip queue — run the moment the tunnel answers; each step gets
# a generous timeout (killing an in-flight remote compile can wedge the
# tunnel). NEVER export PYTHONPATH (axon lives in /root/.axon_site).
set -u
cd /root/repo
LOG=/tmp/onchip_queue_r04.log
echo "$(date -u +%FT%TZ) r04 queue start" >> "$LOG"

run() {
  local name=$1; shift
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "$(date -u +%FT%TZ) END $name rc=$?" >> "$LOG"
}
run_json() {
  local name=$1 out=$2; shift 2
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$LOG"
  timeout 7200 "$@" > "/tmp/$name.stdout" 2>> "$LOG"
  local rc=$?
  if [ $rc -eq 0 ]; then tail -1 "/tmp/$name.stdout" > "$out"; fi
  echo "$(date -u +%FT%TZ) END $name rc=$rc" >> "$LOG"
}

# 1. live-append latency after the amortized-append fix (r03: 101.8 s)
run_json ivf_tail_r04 BENCH_IVF_TAIL_r04.json \
    python scripts/bench_ivf_tail.py --out /tmp/ivf_tail_raw.json

# 2. sparse pallas kernel A/B at 1M (r03 broadcast: 7.8 ms)
run_json sparse_r04 BENCH_SPARSE_r04.json \
    python scripts/bench_sparse.py --n 1000000 --reps 200

# 3. IVF 1M: new kmeans build time + QPS/recall ladder (r03 build: 918 s)
run ivf1m_r04 python scripts/bench_scale.py --skip-flat --ivf-1m \
    --out BENCH_IVF1M_r04.json

# 4. serving with the adaptive chunk policy (r03: chunked +19% wall)
run_json serving_r04 BENCH_SERVING_TPU_r04.json \
    python scripts/bench_serving.py --tpu
run_json serving_s16_r04 BENCH_SERVING_TPU_S16_r04.json \
    python scripts/bench_serving.py --tpu --slots 16
run_json serving_s32_r04 BENCH_SERVING_TPU_S32_r04.json \
    python scripts/bench_serving.py --tpu --slots 32

echo "$(date -u +%FT%TZ) r04 queue phase-1 complete" >> "$LOG"
touch /tmp/onchip_queue_r04_done
