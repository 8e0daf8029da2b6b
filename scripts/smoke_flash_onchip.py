#!/usr/bin/env python3
"""On-chip compile + parity smoke for the Pallas flash-attention prefill
kernel at the production 7B shape (B=1, T=512, H=28, Hkv=4, D=128 — the
DeepSeek-R1-Distill-Qwen-7B attention geometry, reference
src/core/query/llm/local_llm.py:233-299). Run on the real chip:

    PYTHONPATH=/root/repo python scripts/smoke_flash_onchip.py

Prints one JSON line with max abs error vs the XLA oracle and p50 time.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from automative_rag_tpu.ops.flash_attention import attention_ref, flash_attention


def main():
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    b, h, hkv, d = 1, 28, 4, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, t, hkv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, t, hkv, d)), jnp.bfloat16)

    backend = jax.devices()[0].platform
    t0 = time.perf_counter()
    out = np.asarray(flash_attention(q, k, v, causal=True, seq_len=t - 7))
    compile_s = time.perf_counter() - t0
    ref = np.asarray(attention_ref(q, k, v, causal=True, seq_len=t - 7))
    err = float(np.abs(out.astype(np.float32) - ref.astype(np.float32)).max())

    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(flash_attention(q, k, v, causal=True, seq_len=t - 7))
        samples.append(time.perf_counter() - t0)
    print(json.dumps({
        "backend": backend, "shape": [b, t, h, d], "kv_heads": hkv,
        "max_abs_err": round(err, 5), "compile_s": round(compile_s, 1),
        "p50_ms": round(sorted(samples)[2] * 1e3, 2),
        "ok": bool(err < 0.05),
    }))


if __name__ == "__main__":
    main()
