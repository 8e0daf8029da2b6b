#!/usr/bin/env python3
"""Microbench: row-gather styles for budget-probing IVF (r05 item 1/4).

The budget kernel's cost is the candidate gather: [B, R] row ids pulled
from an [N, D] HBM slab. The flat scan streams at ~600-660 GB/s effective;
XLA's element gather was previously ESTIMATED at ~45 GB/s from IVF
latencies — this bench measures it directly, plus the run-structured
variant the CSR layout enables (candidates within one list are contiguous
positions when the slab is permuted), to decide whether the 10M path needs
a Pallas chunk-DMA kernel or XLA's gather already rides DMA runs.

Variants (same slab, serialized in-graph scan timing):
- stream:       q @ slabᵀ + argmax          (the streaming-rate floor)
- gather_rand:  vectors[cand] + einsum      (uncorrelated rows — worst case)
- gather_runs:  cand = 1024-row runs        (CSR-permuted probing shape)
- budget_kernel: the shipped _ivf_budget_search_kernel end-to-end
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

REPS = 200


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--reps", type=int, default=REPS)
    ap.add_argument("--dtypes", nargs="+", default=["int8", "bfloat16"])
    ap.add_argument("--budgets", type=int, nargs="+",
                    default=[8192, 32768, 131072])
    ap.add_argument("--out", default="BENCH_GATHER_r05.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    n, dim, batch, reps = args.n, args.dim, args.batch, args.reps
    rng = np.random.default_rng(0)

    report = {
        "bench": "gather_styles", "platform": jax.default_backend(),
        "n": n, "dim": dim, "batch": batch, "reps": reps, "results": {},
    }

    def timed(fn, *fn_args):
        t0 = time.time()
        out = jax.block_until_ready(fn(*fn_args))
        compile_s = time.time() - t0
        samples = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            out = fn(*fn_args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])  # forced fetch
            samples.append((time.perf_counter() - t0) / reps)
        return float(np.percentile(samples, 50)) * 1000, compile_s

    for dtype_name in args.dtypes:
        is_int8 = dtype_name == "int8"
        dt = jnp.int8 if is_int8 else jnp.bfloat16

        @jax.jit
        def gen(key):
            return jax.random.randint(key, (n, dim), -127, 128, jnp.int8
                                      ).astype(dt)

        slab = gen(jax.random.PRNGKey(1))
        jax.block_until_ready(slab)
        q0 = jnp.asarray(
            rng.normal(size=(batch, dim)).astype(np.float32)) / np.sqrt(dim)
        bpr = dim * (1 if is_int8 else 2)  # bytes per row

        # ---- stream floor ----
        @jax.jit
        def stream(q, vecs):
            def body(carry, _):
                qq = carry.astype(vecs.dtype)
                raw = jax.lax.dot_general(
                    qq, vecs, (((1,), (1,)), ((), ())),
                    preferred_element_type=(
                        jnp.int32 if is_int8 else jnp.float32))
                m = jnp.max(raw.astype(jnp.float32))
                carry = carry + m * 0.0
                return carry, m

            _, outs = jax.lax.scan(body, q, None, length=reps)
            return outs[-1]

        ms, comp = timed(stream, q0, slab)
        gbps = n * bpr / (ms / 1000) / 1e9
        report["results"][f"{dtype_name}:stream"] = {
            "ms_per_batch": round(ms, 3), "gbps": round(gbps, 1),
            "compile_s": round(comp, 1)}
        print(f"[done] {dtype_name}:stream {ms:.3f} ms {gbps:.0f} GB/s",
              file=sys.stderr)

        # ---- gathers ----
        for budget in args.budgets:
            rand_cand = jnp.asarray(
                rng.integers(0, n, size=(batch, budget)), jnp.int32)
            n_runs = max(1, budget // 1024)
            starts = rng.integers(0, n - 1024, size=(batch, n_runs))
            runs = (starts[:, :, None]
                    + np.arange(1024)[None, None, :]).reshape(batch, -1)
            runs_cand = jnp.asarray(runs[:, :budget], jnp.int32)

            @jax.jit
            def gathered(q, vecs, cand):
                def body(carry, _):
                    qq = carry.astype(vecs.dtype)
                    cv = vecs[cand]  # [B, R, D]
                    raw = jnp.einsum(
                        "bd,brd->br", qq, cv,
                        preferred_element_type=(
                            jnp.int32 if is_int8 else jnp.float32))
                    m = jnp.max(raw.astype(jnp.float32))
                    carry = carry + m * 0.0
                    return carry, m

                _, outs = jax.lax.scan(body, q, None, length=reps)
                return outs[-1]

            for label, cand in (("gather_rand", rand_cand),
                                ("gather_runs", runs_cand)):
                key = f"{dtype_name}:{label}:R{budget}"
                try:
                    ms, comp = timed(gathered, q0, slab, cand)
                    gbps = batch * budget * bpr / (ms / 1000) / 1e9
                    report["results"][key] = {
                        "ms_per_batch": round(ms, 3),
                        "gbps": round(gbps, 1), "compile_s": round(comp, 1)}
                    print(f"[done] {key} {ms:.3f} ms {gbps:.0f} GB/s",
                          file=sys.stderr)
                except Exception as exc:  # noqa: BLE001
                    report["results"][key] = {"error": repr(exc)[:300]}
                    print(f"[fail] {key}: {exc}", file=sys.stderr)

        Path(args.out).write_text(json.dumps(report, indent=1))

    # ---- end-to-end budget kernel on a synthetic CSR build ----
    try:
        import jax.numpy as jnp
        from automative_rag_tpu.index.ivf import _ivf_budget_search_kernel

        n_lists = max(64, int(round(np.sqrt(n))))
        # synthetic skewed lists: zipf sizes, rows assigned contiguously
        w = 1.0 / np.arange(1, n_lists + 1)
        sizes = np.maximum((w / w.sum() * n).astype(np.int64), 1)
        sizes[0] += n - sizes.sum()
        span = -(-np.maximum(sizes + sizes // 4, 8) // 8) * 8
        starts = np.zeros(n_lists, np.int64)
        np.cumsum(span[:-1], out=starts[1:])
        m_slots = 1 << int(np.ceil(np.log2(span.sum())))
        sorted_rows = np.full(m_slots, -1, np.int32)
        perm = rng.permutation(n).astype(np.int32)
        off = 0
        for j in range(n_lists):
            sorted_rows[starts[j]: starts[j] + sizes[j]] = (
                perm[off: off + sizes[j]])
            off += sizes[j]
        scan_lens = np.minimum(-(-sizes // 8) * 8, span).astype(np.int32)

        slab = gen(jax.random.PRNGKey(1))
        centroids = jnp.asarray(
            rng.normal(size=(n_lists, dim)).astype(np.float32))
        mask = jnp.ones(n, bool)
        scales = jnp.ones(n, jnp.float32)
        sr = jnp.asarray(sorted_rows)
        st = jnp.asarray(starts.astype(np.int32))
        sl = jnp.asarray(scan_lens)
        q0 = jnp.asarray(
            rng.normal(size=(batch, dim)).astype(np.float32)) / np.sqrt(dim)
        is_int8 = "int8" in args.dtypes

        for budget in args.budgets:
            @jax.jit
            def bk(q, slab_a, scales_a, mask_a, cent_a, sr_a, st_a, sl_a,
                   budget=budget):
                # corpus tensors are ARGUMENTS — a captured multi-GB
                # constant breaks the remote compiler
                def body(carry, _):
                    vals, rows = _ivf_budget_search_kernel(
                        slab_a, scales_a, mask_a, cent_a, sr_a, st_a, sl_a,
                        carry, budget, 10, is_int8)
                    carry = carry + vals[0, 0] * 0.0
                    return carry, vals

                _, outs = jax.lax.scan(body, q, None, length=reps)
                return outs[-1]

            key = f"budget_kernel:R{budget}"
            try:
                ms, comp = timed(bk, q0, slab, scales, mask, centroids,
                                 sr, st, sl)
                report["results"][key] = {
                    "ms_per_batch": round(ms, 3),
                    "qps": round(batch / (ms / 1000), 1),
                    "compile_s": round(comp, 1)}
                print(f"[done] {key} {ms:.3f} ms", file=sys.stderr)
            except Exception as exc:  # noqa: BLE001
                report["results"][key] = {"error": repr(exc)[:300]}
                print(f"[fail] {key}: {exc}", file=sys.stderr)
    except Exception as exc:  # noqa: BLE001
        report["results"]["budget_kernel"] = {"error": repr(exc)[:300]}

    Path(args.out).write_text(json.dumps(report, indent=1))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
