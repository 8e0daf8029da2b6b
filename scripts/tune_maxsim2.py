#!/usr/bin/env python3
"""MaxSim deep-tune (VERDICT r2 weak #3: 3.05 ms vs a claimed 1.3 ms
"bandwidth floor"). The floor premise was wrong: the 7B decode bench
measured ~657 GB/s effective HBM streaming on this chip, so the true floor
for the 64 MB padded slab is ~0.1 ms — the kernel sits ~30× above it.
This script isolates where the time goes, all with the in-graph lax.scan
methodology (serialized carry, one host fetch):

- ``read_bw``: a trivial Pallas kernel that only READS the doc slab (sum
  per block) with the same grid/block structure — the achievable bandwidth
  for this layout, separating memory from compute/pipeline issues.
- ``xla_ref``: the plain XLA einsum path at the same shape. At serving
  shapes the sim tensor is small (B≤8); XLA's fused matmul may simply win.
- pallas variants: vmem block budget sweep, block_docs=256.

    python scripts/tune_maxsim2.py            # on the chip
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

REPS = 10


def _scan_time(fn, q0, trials=5):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(q):
        def body(carry, _):
            out = fn(carry)
            carry = carry + (out.ravel()[0] * 0).astype(carry.dtype)
            return carry, out.ravel()[0]

        _, outs = jax.lax.scan(body, q, None, length=REPS)
        return outs

    np.asarray(many(q0))
    samples = []
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(many(q0))
        samples.append((time.perf_counter() - t0) * 1e3 / REPS)
    return float(np.percentile(samples, 50))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from automative_rag_tpu.ops.maxsim import (
        maxsim_scores_pallas,
        maxsim_scores_ref,
    )

    n_docs, ld, lq, dim = 100, 256, 32, 1024
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.normal(size=(1, lq, dim)), jnp.bfloat16)
    raw = rng.normal(size=(ld, n_docs, dim)).astype(np.float32)
    docs_t = jnp.asarray(raw, jnp.bfloat16)
    docs_std = jnp.asarray(raw.transpose(1, 0, 2), jnp.bfloat16)
    q_mask = jnp.ones((1, lq), bool)
    d_mask = jnp.ones((n_docs, ld), bool)
    report = {"backend": jax.devices()[0].platform, "shape": [n_docs, ld, lq, dim]}

    # --- raw read bandwidth at the kernel's own block structure ---
    def make_read_bw(ld_chunk=16, block_docs=128):
        ld_pad = -(-ld // ld_chunk) * ld_chunk
        n_pad = -(-n_docs // block_docs) * block_docs
        slab = jnp.asarray(
            np.pad(raw, ((0, ld_pad - ld), (0, n_pad - n_docs), (0, 0))),
            jnp.bfloat16)

        def read_kernel(d_ref, o_ref, acc_ref):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            acc_ref[:] += jnp.sum(
                d_ref[:].astype(jnp.float32), axis=(0, 2))[None, :]

            @pl.when(j == pl.num_programs(1) - 1)
            def _():
                o_ref[:] = acc_ref[:]

        grid = (n_pad // block_docs, ld_pad // ld_chunk)
        call = pl.pallas_call(
            read_kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((ld_chunk, block_docs, dim),
                                   lambda i, j: (j, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, block_docs), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, block_docs), jnp.float32)],
        )

        def fn(q):
            # tie the slab read to the carry so scan can't CSE it
            return call(slab + (q.ravel()[0] * 0).astype(slab.dtype))

        gbytes = slab.size * 2 / 1e9
        return fn, gbytes

    for ld_chunk in (16, 32, 64):
        try:
            fn, gbytes = make_read_bw(ld_chunk=ld_chunk)
            ms = _scan_time(fn, q0)
            report[f"read_bw_ldc{ld_chunk}"] = {
                "p50_ms": round(ms, 3),
                "gb_s": round(gbytes / (ms / 1e3), 1),
            }
        except Exception as exc:  # noqa: BLE001
            report[f"read_bw_ldc{ld_chunk}"] = f"FAILED: {str(exc)[:120]}"
        print(f"read_bw_ldc{ld_chunk}", report[f"read_bw_ldc{ld_chunk}"],
              file=sys.stderr, flush=True)

    # --- XLA reference at the same shape ---
    def xla_fn(q):
        return maxsim_scores_ref(q, q_mask, docs_std, d_mask)

    try:
        report["xla_ref"] = {"p50_ms": round(_scan_time(xla_fn, q0), 3)}
    except Exception as exc:  # noqa: BLE001
        report["xla_ref"] = f"FAILED: {str(exc)[:120]}"
    print("xla_ref", report["xla_ref"], file=sys.stderr, flush=True)

    # --- pallas variants (docs captured as a closure CONSTANT) ---
    for name, kwargs in (
        ("pallas_vmem4", dict(vmem_block_bytes=4 << 20)),
        ("pallas_vmem6", dict(vmem_block_bytes=6 << 20)),
    ):
        def pfn(q, kw=kwargs):
            return maxsim_scores_pallas(
                q, q_mask, docs_t, d_mask, token_major=True, **kw)

        try:
            report[name] = {"p50_ms": round(_scan_time(pfn, q0), 3)}
        except Exception as exc:  # noqa: BLE001
            report[name] = f"FAILED: {str(exc)[:120]}"
        print(name, report[name], file=sys.stderr, flush=True)

    # --- docs as a jitted ARGUMENT (device-resident buffer) ---
    # Every ~3 ms row above shares one suspicious property: the doc slab is
    # a closure-captured constant. bench_flat_search learned in r02 that
    # captured constants go through the remote-compile transport; if they
    # also live host-side at RUN time, every "HBM read" is actually a relay
    # transfer (~20-40 GB/s) — which would explain a read-only kernel, the
    # XLA path, and the pallas kernel all pinning at ~3 ms for a 64 MB slab
    # while the 7B decode streams real HBM at ~657 GB/s.
    def make_args_variant(use_pallas):
        @jax.jit
        def many(q, docs_arg, d_mask_arg):
            def body(carry, _):
                if use_pallas:
                    out = maxsim_scores_pallas(
                        carry, q_mask, docs_arg, d_mask_arg,
                        token_major=True)
                else:
                    out = maxsim_scores_ref(
                        carry, q_mask,
                        jnp.transpose(docs_arg, (1, 0, 2)), d_mask_arg)
                carry = carry + (out.ravel()[0] * 0).astype(carry.dtype)
                return carry, out.ravel()[0]

            _, outs = jax.lax.scan(body, q, None, length=REPS)
            return outs

        return many

    docs_dev = jax.device_put(docs_t)
    mask_dev = jax.device_put(d_mask)
    for name, use_pallas in (("pallas_args", True), ("xla_args", False)):
        try:
            many = make_args_variant(use_pallas)
            np.asarray(many(q0, docs_dev, mask_dev))
            samples = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(many(q0, docs_dev, mask_dev))
                samples.append((time.perf_counter() - t0) * 1e3 / REPS)
            report[name] = {"p50_ms": round(float(np.percentile(samples, 50)), 3)}
        except Exception as exc:  # noqa: BLE001
            report[name] = f"FAILED: {str(exc)[:160]}"
        print(name, report[name], file=sys.stderr, flush=True)

    # int8 docs as argument
    scales = np.abs(raw).max(axis=2) / 127.0
    docs_i8 = jnp.asarray(np.clip(
        np.round(raw / np.maximum(scales, 1e-12)[:, :, None]), -127, 127),
        jnp.int8)
    d_scales = jnp.asarray(scales, jnp.float32)

    @jax.jit
    def many_i8(q, docs_arg, scales_arg, d_mask_arg):
        def body(carry, _):
            out = maxsim_scores_pallas(
                carry, q_mask, docs_arg, d_mask_arg, token_major=True,
                d_scales=scales_arg)
            carry = carry + (out.ravel()[0] * 0).astype(carry.dtype)
            return carry, out.ravel()[0]

        _, outs = jax.lax.scan(body, q, None, length=REPS)
        return outs

    try:
        operands = (q0, jax.device_put(docs_i8), jax.device_put(d_scales),
                    mask_dev)
        np.asarray(many_i8(*operands))
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(many_i8(*operands))
            samples.append((time.perf_counter() - t0) * 1e3 / REPS)
        report["pallas_int8_args"] = {
            "p50_ms": round(float(np.percentile(samples, 50)), 3)}
    except Exception as exc:  # noqa: BLE001
        report["pallas_int8_args"] = f"FAILED: {str(exc)[:160]}"
    print("pallas_int8_args", report["pallas_int8_args"], file=sys.stderr,
          flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
