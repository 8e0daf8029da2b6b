#!/bin/bash
# Runs the queued on-chip work the moment the TPU tunnel answers.
# Start alongside scripts/probe_tpu_loop.sh (which writes /tmp/tpu_alive on
# the first successful probe). Each step gets a generous timeout — killing
# an in-flight remote compile can wedge the tunnel (CLAUDE.md), so the
# budgets are sized to let compiles finish.
#
# IMPORTANT: never export PYTHONPATH here — the harness's
# PYTHONPATH=/root/.axon_site is where the axon TPU backend lives; the
# scripts do their own sys.path.insert.
set -u
cd /root/repo
LOG=/tmp/onchip_queue.log
echo "$(date -u +%FT%TZ) queue waiting for /tmp/tpu_alive" >> "$LOG"
while [ ! -f /tmp/tpu_alive ]; do sleep 60; done
echo "$(date -u +%FT%TZ) tunnel alive — starting queue" >> "$LOG"

run() {
  local name=$1; shift
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$LOG"
  timeout 5400 "$@" >> "$LOG" 2>&1
  echo "$(date -u +%FT%TZ) END $name rc=$?" >> "$LOG"
}

# 0. quick: live-insert IVF latency proof (bucketed tail slab)
run ivf_tail python scripts/bench_ivf_tail.py --out BENCH_IVF_TAIL_r03.json

# 1. w4a16 unpack A/B (decode is VPU-unpack-bound; the lever on int4 tok/s)
run tune_w4 python scripts/tune_w4.py --out W4_TUNE_r03.json

# 2. serving bench on-chip: continuous batching + prefix cache + chunked
#    prefill stall sections (STATUS queued item). JSON is the last stdout
#    line — capture per-run files the artifacts fold from.
run_json() {
  local name=$1 out=$2; shift 2
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$LOG"
  timeout 5400 "$@" > "/tmp/$name.stdout" 2>> "$LOG"
  local rc=$?
  if [ $rc -eq 0 ]; then
    tail -1 "/tmp/$name.stdout" > "$out"
  fi
  echo "$(date -u +%FT%TZ) END $name rc=$rc" >> "$LOG"
}

run_json serving_tpu BENCH_SERVING_TPU_r03.json \
    python scripts/bench_serving.py --tpu

# 3. slots sweep (throughput vs pool size)
run_json serving_s16 BENCH_SERVING_TPU_S16_r03.json \
    python scripts/bench_serving.py --tpu --slots 16 \
    --skip-static --skip-copy --skip-prefix --skip-chunk
run_json serving_s32 BENCH_SERVING_TPU_S32_r03.json \
    python scripts/bench_serving.py --tpu --slots 32 \
    --skip-static --skip-copy --skip-prefix --skip-chunk

echo "$(date -u +%FT%TZ) queue complete" >> "$LOG"
touch /tmp/onchip_queue_done

# 4. sparse lexical-arm scan at 1M (kernel + e2e; appended while queue waits)
run_json sparse_1m BENCH_SPARSE_r03.json \
    python scripts/bench_sparse.py --n 1000000 --reps 200

echo "$(date -u +%FT%TZ) queue complete (incl. sparse)" >> "$LOG"

# 5. flat-search dtype ladder incl. the new int4/w4a16 path @100k
run flat_ladder python scripts/bench_scale.py --skip-ivf --skip-1m \
    --out BENCH_SCALE_r03b.json

echo "$(date -u +%FT%TZ) queue complete (incl. int4 ladder)" >> "$LOG"
