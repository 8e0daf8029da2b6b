#!/bin/bash
# Background TPU tunnel probe loop. Writes /tmp/tpu_alive with a timestamp the
# moment a probe succeeds, then keeps confirming every cycle. Process-level
# probes (jax caches failed backend init per-process — CLAUDE.md).
OUT=/tmp/tpu_alive
LOG=/tmp/tpu_probe.log
rm -f "$OUT"
while true; do
  if timeout 240 python -c "import jax; d=jax.devices(); assert d and d[0].platform != 'cpu', d; print(d)" >>"$LOG" 2>&1; then
    date +%s > "$OUT"
    echo "$(date -u +%FT%TZ) ALIVE" >> "$LOG"
  else
    echo "$(date -u +%FT%TZ) dead" >> "$LOG"
  fi
  sleep 120
done
