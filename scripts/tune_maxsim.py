#!/usr/bin/env python3
"""MaxSim kernel tuning sweep on the real chip: vmem block budget × doc
dtype at the headline shape (top-100 × 256 tokens × 1024 dims). Each
configuration is its own executable — the persistent compile cache makes
re-runs free. Writes MAXSIM_TUNE.json and prints the best configs."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPS = 10


def measure(dtype: str, vmem_mb: int, n_docs=100, ld=256, lq=32, dim=1024,
            trials=5):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from automative_rag_tpu.ops.maxsim import maxsim_scores_pallas

    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.normal(size=(1, lq, dim)), jnp.bfloat16)
    raw = rng.normal(size=(ld, n_docs, dim)).astype(np.float32)
    q_mask = jnp.ones((1, lq), bool)
    d_mask = jnp.ones((n_docs, ld), bool)
    if dtype == "int8":
        scales = np.abs(raw).max(axis=2) / 127.0
        docs_t = jnp.asarray(
            np.clip(np.round(raw / np.maximum(scales, 1e-12)[:, :, None]),
                    -127, 127), jnp.int8)
        d_scales = jnp.asarray(scales, jnp.float32)
    else:
        docs_t = jnp.asarray(raw, jnp.bfloat16)
        d_scales = None

    @jax.jit
    def many(q):
        def body(carry, _):
            out = maxsim_scores_pallas(
                carry, q_mask, docs_t, d_mask, token_major=True,
                d_scales=d_scales, vmem_block_bytes=vmem_mb * 1024 * 1024,
            )
            carry = carry + (out[0, 0] * 0).astype(carry.dtype)
            return carry, out[0, 0]

        _, outs = jax.lax.scan(body, q, None, length=REPS)
        return outs

    np.asarray(many(q0))  # compile
    samples = []
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(many(q0))
        samples.append((time.perf_counter() - t0) * 1000 / REPS)
    import numpy as np2

    return float(np2.percentile(samples, 50))


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    report = {"backend": jax.devices()[0].platform}
    for dtype in ("bfloat16", "int8"):
        for vmem_mb in (2, 4, 8, 16):
            key = f"{dtype}_vmem{vmem_mb}mb"
            try:
                ms = measure(dtype, vmem_mb)
                report[key] = round(ms, 3)
            except Exception as exc:  # noqa: BLE001
                report[key] = f"FAILED: {str(exc)[:120]}"
            print(key, report[key], flush=True)
    Path("MAXSIM_TUNE.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
