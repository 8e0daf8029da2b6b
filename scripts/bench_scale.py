#!/usr/bin/env python3
"""Scale benchmarks on the real chip: flat search QPS at 100K/1M vectors
(bf16 + int8) and IVF recall/latency vs the exact oracle (BASELINE configs
#1-#3). Writes a JSON report.

Run on TPU (default backend); uses the persistent compile cache.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

# 50 reps amortize the relay's ~26 ms per-dispatch round trip to ~0.5 ms
# per rep (REPS=10 added 2.6 ms to every number — see MAXSIM_TUNE_r03.json)
REPS = 50


def _enable_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def bench_flat(n, dim=1024, k=20, batch=8, dtype="bfloat16", trials=3):
    import jax
    import jax.numpy as jnp

    from automative_rag_tpu.index.filters import FilterSpec, eval_filter_mask
    from automative_rag_tpu.ops.topk import masked_top_k

    rng = np.random.default_rng(0)
    raw = rng.normal(size=(n, dim)).astype(np.float32)
    int8 = dtype == "int8"
    int4 = dtype == "int4"
    if int8:
        scales = np.abs(raw).max(axis=1) / 127.0
        vectors = jnp.asarray(np.clip(np.round(raw / scales[:, None]), -127, 127), jnp.int8)
        row_scales = jnp.asarray(scales, jnp.float32)
    elif int4:
        from automative_rag_tpu.ops.quant_matmul import pack_w4

        packed, scales = pack_w4(np.ascontiguousarray(raw.T))
        vectors = jnp.asarray(packed)  # [D/2, N] uint8
        row_scales = jnp.asarray(scales, jnp.float32)
    else:
        vectors = jnp.asarray(raw, jnp.bfloat16)
    del raw
    valid = jnp.ones(n, bool)
    codes = jnp.zeros((7, n), jnp.int32)
    numerics = jnp.zeros((2, n), jnp.int32)
    q0 = jnp.asarray(np.random.default_rng(1).normal(size=(batch, dim)),
                     jnp.int8 if int8 else
                     jnp.float32 if int4 else jnp.bfloat16)
    spec = FilterSpec.match_all()
    if not (int8 or int4):
        row_scales = jnp.zeros(1, jnp.float32)

    # the corpus is an ARGUMENT, not a closure constant: captured constants
    # get baked into the executable and shipped through the remote compiler
    # (a 2 GB program broke its transport at 1M×1024 bf16)
    interpret = jax.default_backend() != "tpu"

    @jax.jit
    def many(q, vectors, row_scales):
        def body(carry, _):
            if int4:
                from automative_rag_tpu.ops.quant_matmul import w4_matmul

                scores = w4_matmul(
                    carry, vectors, row_scales, interpret=interpret
                ).astype(jnp.float32)
            else:
                scores = jax.lax.dot_general(
                    carry, vectors, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32 if int8 else jnp.float32,
                )
            if int8:
                scores = scores.astype(jnp.float32) * row_scales[None, :]
            mask = valid & eval_filter_mask(codes, numerics, spec)
            vals, _ = masked_top_k(scores, mask, k)
            carry = carry + (vals[0, 0] * 0).astype(carry.dtype)
            return carry, vals[:, 0]

        _, outs = jax.lax.scan(body, q, None, length=REPS)
        return outs

    vectors = jax.device_put(vectors)
    row_scales = jax.device_put(row_scales)
    np.asarray(many(q0, vectors, row_scales))
    samples = []
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(many(q0, vectors, row_scales))
        samples.append((time.perf_counter() - t0) / REPS)
    per_call = float(np.percentile(samples, 50))
    return {
        "n": n, "dtype": dtype, "batch": batch, "k": k,
        "latency_ms_per_batch": round(per_call * 1000, 3),
        "qps": round(batch / per_call, 1),
    }


def bench_ivf_recall(n=100_000, dim=1024, k=10, n_lists=256, probes=(8, 16, 32)):
    """IVF recall vs exact oracle + per-query latency at each nprobe."""
    from automative_rag_tpu.documents import Document
    from automative_rag_tpu.index.ivf import IVFIndex

    rng = np.random.default_rng(0)
    centers = rng.normal(size=(512, dim)).astype(np.float32) * 2
    assign = rng.integers(0, 512, size=n)
    vectors = (centers[assign] + rng.normal(size=(n, dim)).astype(np.float32)).astype(np.float32)
    docs = [Document(page_content=f"d{i}", metadata={}) for i in range(n)]

    index = IVFIndex(dim=dim, device_dtype="bfloat16", n_lists=n_lists)
    index.add(vectors, docs)
    t0 = time.time()
    info = index.rebuild()
    build_s = time.time() - t0
    # warm rebuild (r05 item 5): the cold number above includes the remote
    # compiler minting the pow2-bucket executables for this shape (r04
    # measured 544 s at 100K, 529 s of it 'fetch' = compile hidden behind
    # an unreliable block_until_ready); steady-state rebuilds reuse them
    # AND the resident slab
    index._device_state()
    t0 = time.time()
    info = index.rebuild(seed=1)
    warm_build_s = time.time() - t0

    normalized = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
    # in-distribution queries (drawn from the same cluster mixture): IVF
    # recall for off-distribution gaussian queries is meaningless — their
    # true neighbors have no cluster locality
    queries = (centers[rng.integers(0, centers.shape[0], size=20)]
               + rng.normal(size=(20, dim))).astype(np.float32)
    out = {"build_s": round(build_s, 1),
           "warm_build_s": round(warm_build_s, 1), **info, "probes": {}}
    for nprobe in probes:
        recall, latency = 0.0, []
        for q in queries:
            qn = q / np.linalg.norm(q)
            want = set(np.argsort(-(normalized @ qn))[:k].tolist())
            t0 = time.perf_counter()
            got = {r.row for r in index.search(q, k, n_probe=nprobe)[0]}
            latency.append(time.perf_counter() - t0)
            recall += len(got & want) / k
        out["probes"][nprobe] = {
            "recall_at_10": round(recall / len(queries), 4),
            "p50_latency_ms": round(float(np.percentile(latency, 50)) * 1000, 2),
        }
    return out


def bench_ivf_scale(n=1_000_000, dim=1024, k=10, n_lists=1024,
                    probes=(8, 32, 128), batch=8, dtype="bfloat16"):
    """1M-row IVF: on-chip k-means build, recall@10 vs the exact host
    oracle, and IN-GRAPH QPS (lax.scan around the product search kernel,
    serialized carry — the flat-search methodology, so the 26 ms relay
    round-trip doesn't pollute per-query latency the way the host-driven
    `.search()` path does)."""
    import jax
    import jax.numpy as jnp

    from automative_rag_tpu.documents import Document
    from automative_rag_tpu.index.ivf import IVFIndex, _ivf_search_kernel

    rng = np.random.default_rng(0)
    centers = rng.normal(size=(4096, dim)).astype(np.float32) * 2
    assign = rng.integers(0, 4096, size=n)
    vectors = (centers[assign] + rng.normal(size=(n, dim)).astype(np.float32))
    del assign
    # in-distribution queries (see bench_ivf_recall)
    queries = (centers[rng.integers(0, 4096, size=20)]
               + rng.normal(size=(20, dim))).astype(np.float32)
    docs = [Document(page_content="d", metadata={}) for _ in range(n)]

    index = IVFIndex(dim=dim, device_dtype=dtype, n_lists=n_lists)
    t0 = time.time()
    index.add(vectors, docs)
    add_s = time.time() - t0
    t0 = time.time()
    info = index.rebuild()
    build_s = time.time() - t0
    # warm rebuild: the pow2-bucketed kmeans executables are now compiled
    # (the remote compiler costs minutes per shape) AND the serving slab
    # is resident (production rebuilds re-cluster a live index) — so this
    # measures the steady-state rebuild: kmeans reuses the device slab,
    # no corpus re-ship in either direction
    t0 = time.time()
    index._device_state()  # stage the serving slab (searches would have)
    stage_s = time.time() - t0
    t0 = time.time()
    info_warm = index.rebuild(seed=1)
    warm_build_s = time.time() - t0

    if not probes:
        # rebuild-only mode: the recall/QPS story is already landed
        # (BENCH_IVF1M_r04.json); this isolates the steady-state build
        # numbers (e.g. after balance-phase changes) without the ~10 min
        # host oracle + probe ladder
        return {"n": n, "dtype": dtype, "n_lists": index.n_lists,
                "add_s": round(add_s, 1), "build_s": round(build_s, 1),
                "stage_s": round(stage_s, 1),
                "warm_build_s": round(warm_build_s, 1),
                "build_timings": info_warm.get("timings"),
                "cold_build_timings": info.get("timings"),
                "fill_ratio": info_warm.get("fill_ratio"),
                "list_cap": info_warm.get("list_cap")}

    normalized = vectors / np.maximum(
        np.linalg.norm(vectors, axis=1, keepdims=True), 1e-12)
    del vectors
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    oracle = [set(np.argsort(-(normalized @ q))[:k].tolist()) for q in qn]
    del normalized

    state = index._device_state()
    int8 = dtype == "int8"
    out = {"n": n, "dtype": dtype, "n_lists": index.n_lists,
           "add_s": round(add_s, 1), "build_s": round(build_s, 1),
           "stage_s": round(stage_s, 1),
           "warm_build_s": round(warm_build_s, 1),
           "build_timings": info_warm.get("timings"),
           "list_cap": info.get("list_cap"), "probes": {}}
    full_mask = jnp.asarray(np.ones(state["capacity"], bool))

    budget_mode = index._budget_built

    def make_many(nprobe):
        # nprobe/k/int8 are static via closure; the corpus tensors are
        # ARGUMENTS (a captured 2 GB constant breaks the remote compiler)
        if budget_mode:
            from automative_rag_tpu.index.ivf import (
                _ivf_budget_search_kernel,
            )

            budget = index._budget_of(nprobe, k)

            @jax.jit
            def many(q, vectors, row_scales, centroids, lists_a, full_mask,
                     lists_b, lists_c):
                def body(carry, _):
                    vals, _rows = _ivf_budget_search_kernel(
                        vectors, row_scales, full_mask, centroids,
                        lists_a, lists_b, lists_c, carry, budget, k, int8)
                    carry = carry + (vals[0, 0] * 0).astype(carry.dtype)
                    return carry, vals[:, 0]

                _, outs = jax.lax.scan(body, q, None, length=REPS)
                return outs

            return many

        @jax.jit
        def many(q, vectors, row_scales, centroids, list_table, full_mask):
            def body(carry, _):
                vals, _rows = _ivf_search_kernel(
                    vectors, row_scales, full_mask, centroids, list_table,
                    carry, nprobe, k, int8,
                )
                carry = carry + (vals[0, 0] * 0).astype(carry.dtype)
                return carry, vals[:, 0]

            _, outs = jax.lax.scan(body, q, None, length=REPS)
            return outs

        return many

    def make_many_refined(split, far, refine_dims, shortlist):
        from automative_rag_tpu.index.ivf import _ivf_search_refined_kernel

        @jax.jit
        def many(q, vectors, row_scales, centroids, list_table, full_mask):
            vectors_head = vectors[:, :refine_dims] + 0  # materialized copy
            def body(carry, _):
                vals, _rows = _ivf_search_refined_kernel(
                    vectors, vectors_head, row_scales, full_mask, centroids,
                    list_table,
                    carry, split, far, refine_dims, shortlist, k, int8,
                )
                carry = carry + (vals[0, 0] * 0).astype(carry.dtype)
                return carry, vals[:, 0]

            _, outs = jax.lax.scan(body, q, None, length=REPS)
            return outs

        return many

    def time_many(many, operands):
        np.asarray(many(*operands))  # compile
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(many(*operands))
            samples.append((time.perf_counter() - t0) / REPS)
        return float(np.percentile(samples, 50))

    qb = jnp.asarray(qn[:batch])
    if budget_mode:
        operands = (qb, state["vectors"], state["row_scales"],
                    state["centroids"], state["sorted_rows"], full_mask,
                    state["list_starts"], state["scan_lens"])
    else:
        operands = (qb, state["vectors"], state["row_scales"],
                    state["centroids"], state["list_table"], full_mask)
    split, refine_dims, shortlist = probes[0], max(64, dim // 4), 2048
    for nprobe in probes:
      try:  # the build+oracle above cost ~30 min — keep partial points
        # recall through the product host path (one batched call)
        index.refine_dims = 0
        got = index.search(queries, k, n_probe=nprobe, pin_probe=True)
        recall = float(np.mean([
            len({r.row for r in hits} & want) / k
            for hits, want in zip(got, oracle)
        ]))
        per_call = time_many(make_many(nprobe), operands)
        out["probes"][nprobe] = {
            "recall_at_10": round(recall, 4),
            "latency_ms_per_batch": round(per_call * 1000, 3),
            "qps": round(batch / per_call, 1),
        }
        if budget_mode:
            out["probes"][nprobe]["budget"] = index._budget_of(nprobe, k)
        print("ivf_1m probe", nprobe, out["probes"][nprobe], flush=True)

        # coarse-then-refine: same probe width, far probes screened on
        # refine_dims dims + exact shortlist rescore (high-recall points
        # stop costing linear-in-nprobe; table mode only)
        if nprobe > split and not budget_mode:
            index.refine_dims = refine_dims
            index.refine_shortlist = shortlist
            index.n_probe = split
            got = index.search(queries, k, n_probe=nprobe, pin_probe=True)
            recall_r = float(np.mean([
                len({r.row for r in hits} & want) / k
                for hits, want in zip(got, oracle)
            ]))
            per_call = time_many(
                make_many_refined(split, nprobe - split, refine_dims,
                                  shortlist), operands)
            out["probes"][f"{nprobe}_refined"] = {
                "recall_at_10": round(recall_r, 4),
                "latency_ms_per_batch": round(per_call * 1000, 3),
                "qps": round(batch / per_call, 1),
                "split": split, "refine_dims": refine_dims,
                "shortlist": shortlist,
            }
            print("ivf_1m probe refined", nprobe,
                  out["probes"][f"{nprobe}_refined"], flush=True)
      except Exception as exc:  # noqa: BLE001
        out["probes"][f"{nprobe}_error"] = str(exc)[:200]
        print("ivf_1m probe", nprobe, "FAILED", exc, flush=True)
    out["fill_ratio"] = info.get("fill_ratio")
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="BENCH_SCALE.json")
    parser.add_argument("--skip-1m", action="store_true")
    parser.add_argument("--skip-ivf", action="store_true")
    parser.add_argument("--skip-flat", action="store_true")
    parser.add_argument("--ivf-1m", action="store_true",
                        help="1M-row IVF build/recall/QPS (slow: on-chip "
                             "k-means + 4 GB host oracle)")
    parser.add_argument("--ivf-1m-dtype", default="bfloat16",
                        choices=("bfloat16", "int8"))
    parser.add_argument("--ivf-1m-rebuild-only", action="store_true",
                        help="skip the 1M oracle + probe ladder; measure "
                             "add/cold-build/warm-build timings only")
    args = parser.parse_args()
    _enable_cache()

    import jax

    report = {"platform": jax.devices()[0].platform,
              "device": str(jax.devices()[0])}
    if not args.skip_flat:
        for n in (100_000,) + (() if args.skip_1m else (1_000_000,)):
            for dtype in ("bfloat16", "int8", "int4"):
                key = f"flat_{n}_{dtype}"
                try:
                    report[key] = bench_flat(n, dtype=dtype)
                    print(key, report[key], flush=True)
                except Exception as exc:  # noqa: BLE001
                    report[key] = {"error": str(exc)[:200]}
                    print(key, "FAILED", exc, flush=True)
    if not args.skip_ivf:
        try:
            report["ivf_100k"] = bench_ivf_recall()
            print("ivf_100k", report["ivf_100k"], flush=True)
        except Exception as exc:  # noqa: BLE001
            report["ivf_100k"] = {"error": str(exc)[:200]}
    if args.ivf_1m:
        try:
            report["ivf_1m"] = bench_ivf_scale(
                dtype=args.ivf_1m_dtype,
                probes=() if args.ivf_1m_rebuild_only else (8, 32, 128))
        except Exception as exc:  # noqa: BLE001
            report["ivf_1m"] = {"error": str(exc)[:200]}
            print("ivf_1m FAILED", exc, flush=True)

    Path(args.out).write_text(json.dumps(report, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
