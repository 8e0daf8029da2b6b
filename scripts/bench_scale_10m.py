#!/usr/bin/env python3
"""10M-vectors-on-one-chip capacity proof (BASELINE config #5, r03 verdict
next #5).

10M × 1024 is 10.24 GB at int8 and 5.12 GB packed int4 (w4a16) — both fit a
single 16 GB-HBM chip with headroom for the [batch, 10M] score tensor.
CAPACITY_10M.json was an analytic projection; this measures the real thing:

- corpus generated host-side in chunks (one core, 125 GB RAM), quantized to
  the production layouts (per-row symmetric int8 / pack_w4 nibble pairs,
  `index/flat.py` device slabs),
- an exact f32 oracle top-10 computed chunk-by-chunk during generation for a
  fixed query panel, so recall@10 is vs full-precision ground truth,
- QPS measured with the production filtered-search kernel (dot + filter mask
  + masked_top_k, the same ops `index/flat.py:search` jits) inside a
  serialized lax.scan (relay dispatch ~26 ms amortizes over REPS).

Run on TPU (default backend). dtypes run sequentially and free the previous
slab first — int8 + int4 resident together would exceed HBM.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

REPS = 50
CHUNK = 500_000


def _enable_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass


def generate_corpus(n, dim, n_oracle_q, seed=0):
    """Chunked host-side build: int8 corpus + scales, int4 packed + scales,
    and the exact f32 oracle top-10 for a fixed query panel."""
    from automative_rag_tpu.ops.quant_matmul import pack_w4

    rng = np.random.default_rng(seed)
    queries = rng.normal(size=(n_oracle_q, dim)).astype(np.float32)

    int8_rows = np.empty((n, dim), np.int8)
    int8_scales = np.empty(n, np.float32)
    int4_packed = np.empty((dim // 2, n), np.uint8)
    int4_scales = np.empty(n, np.float32)
    # running exact-f32 oracle: keep the best 10 (score, index) per query
    k_oracle = 10
    best_scores = np.full((n_oracle_q, k_oracle), -np.inf, np.float32)
    best_idx = np.zeros((n_oracle_q, k_oracle), np.int64)

    t0 = time.time()
    for start in range(0, n, CHUNK):
        stop = min(start + CHUNK, n)
        # generate TRANSPOSED [dim, m]: pack_w4 wants this layout, and the
        # f32→f32 strided transpose it otherwise forces costs more than the
        # whole rest of the chunk on one core; the int8 rows pay a 4×-cheaper
        # int8 transpose instead
        chunk_t = rng.standard_normal((dim, stop - start), dtype=np.float32)

        # exact oracle scores BEFORE the in-place quantization below
        scores = queries @ chunk_t  # [Q, chunk]

        s8 = np.abs(chunk_t).max(axis=0) / 127.0
        np.copyto(int8_scales[start:stop], s8)

        packed, s4 = pack_w4(chunk_t)
        int4_packed[:, start:stop] = packed
        int4_scales[start:stop] = s4

        # int8 quantization in place (chunk_t is dead after this)
        chunk_t /= np.maximum(s8, 1e-12)[None, :]
        np.round(chunk_t, out=chunk_t)
        np.clip(chunk_t, -127, 127, out=chunk_t)
        int8_rows[start:stop] = chunk_t.astype(np.int8).T
        del chunk_t
        part = np.argpartition(scores, -k_oracle, axis=1)[:, -k_oracle:]
        cand_scores = np.take_along_axis(scores, part, axis=1)
        merged_s = np.concatenate([best_scores, cand_scores], axis=1)
        merged_i = np.concatenate([best_idx, part + start], axis=1)
        keep = np.argpartition(merged_s, -k_oracle, axis=1)[:, -k_oracle:]
        best_scores = np.take_along_axis(merged_s, keep, axis=1)
        best_idx = np.take_along_axis(merged_i, keep, axis=1)
        print(f"[gen] rows {stop}/{n} ({time.time() - t0:.0f}s)",
              file=sys.stderr)

    oracle = [set(best_idx[q].tolist()) for q in range(n_oracle_q)]
    return {
        "queries": queries,
        "int8": (int8_rows, int8_scales),
        "int4": (int4_packed, int4_scales),
        "oracle": oracle,
        "gen_s": round(time.time() - t0, 1),
    }


def bench_dtype(dtype, corpus, n, dim, k, batch, trials, refine_mult=8,
                selection="approx"):
    import jax
    import jax.numpy as jnp

    from automative_rag_tpu.index.filters import FilterSpec, eval_filter_mask
    from automative_rag_tpu.ops.quant_matmul import w4_matmul
    from automative_rag_tpu.ops.topk import masked_top_k

    int8 = dtype == "int8"
    queries = corpus["queries"]
    n_oracle_q = queries.shape[0]
    if int8:
        rows, scales = corpus["int8"]
        qs = np.abs(queries).max(axis=1) / 127.0
        q_panel = np.clip(
            np.round(queries / np.maximum(qs, 1e-12)[:, None]),
            -127, 127).astype(np.int8)
    else:
        rows, scales = corpus["int4"]
        q_panel = queries  # w4a16: full-precision activations

    # pre-pad N to the w4 kernel's block multiple on the host: letting the
    # kernel pad internally would clone the 5 GB packed slab inside the jit
    n_eff = n
    if not int8:
        pad = (-n) % 512
        if pad:
            n_eff = n + pad
            rows = np.pad(rows, ((0, 0), (0, pad)), constant_values=0x88)
            scales = np.pad(scales, (0, pad))

    valid = jnp.concatenate(
        [jnp.ones(n, bool), jnp.zeros(n_eff - n, bool)]) if n_eff != n \
        else jnp.ones(n, bool)
    codes = jnp.zeros((7, n_eff), jnp.int32)
    numerics = jnp.zeros((2, n_eff), jnp.int32)
    spec = FilterSpec.match_all()
    interpret = jax.default_backend() != "tpu"

    # the scan returns a refine_mult·k shortlist — the production config
    # (index/flat.py host refine): exact host rescore of the shortlist can
    # never lose a true-top-k row it contains (anything that outranks it
    # in exact order is itself true top-k), so refined recall@k IS the
    # shortlist-containment rate, measurable without the 40 GB f32 corpus
    k_scan = max(k, k * refine_mult)
    # shortlist selection: "approx" = lax.approx_max_k, the production
    # default (index/flat.py topk_approx) — BENCH_TOPK_AB_r04 measured it
    # AT the 14.1 ms argmax scan floor at 10M with the exact top-10 fully
    # contained in the 80-row shortlist, where exact hierarchical
    # selection costs 68.6 ms (the selection was ~80% of r04's first-pass
    # 71.5 ms/batch). "exact" reproduces the old path for A/B.
    approx_sel = selection == "approx" and refine_mult > 1

    @jax.jit
    def many(q, vectors, row_scales):
        def body(carry, _):
            if int8:
                scores = jax.lax.dot_general(
                    carry, vectors, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * row_scales[None, :]
            else:
                scores = w4_matmul(
                    carry, vectors, row_scales, interpret=interpret
                ).astype(jnp.float32)
            mask = valid & eval_filter_mask(codes, numerics, spec)
            vals, idx = masked_top_k(scores, mask, k_scan,
                                     approx=approx_sel)
            carry = carry + (vals[0, 0] * 0).astype(carry.dtype)
            return carry, idx

        _, outs = jax.lax.scan(body, q, None, length=REPS)
        return outs

    t_ship = time.time()
    vectors = jax.device_put(jnp.asarray(rows))
    row_scales = jax.device_put(jnp.asarray(scales))
    jax.block_until_ready((vectors, row_scales))
    ship_s = time.time() - t_ship

    report = {"n": n, "dtype": dtype, "batch": batch, "k": k,
              "selection": "approx_max_k" if approx_sel else "exact",
              "hbm_gb": round(rows.nbytes / 2**30, 2),
              "ship_s": round(ship_s, 1)}

    # recall panel first (also the compile+warm call): run the oracle
    # queries through the SAME executable, batch at a time
    t_c = time.time()
    got = []
    for start in range(0, n_oracle_q, batch):
        qb = q_panel[start:start + batch]
        if qb.shape[0] < batch:
            qb = np.pad(qb, ((0, batch - qb.shape[0]), (0, 0)))
        idx = np.asarray(many(jnp.asarray(qb), vectors, row_scales))[-1]
        got.extend(idx[: min(batch, n_oracle_q - start)])
    report["compile_plus_recall_s"] = round(time.time() - t_c, 1)
    overlaps = [
        len(set(got[q][:k].tolist()) & corpus["oracle"][q]) / 10.0
        for q in range(n_oracle_q)
    ]
    report["recall_at_10_vs_f32"] = round(float(np.mean(overlaps)), 4)
    # refined recall@10 at each shortlist prefix (= containment; see above)
    report["refined_recall_at_10"] = {
        str(s): round(float(np.mean([
            len(set(got[q][:s].tolist()) & corpus["oracle"][q]) / 10.0
            for q in range(n_oracle_q)])), 4)
        for s in (2 * k, 4 * k, 8 * k) if s <= k_scan
    }
    report["k_scan"] = k_scan

    q0 = jnp.asarray(q_panel[:batch])
    samples = []
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(many(q0, vectors, row_scales))
        samples.append((time.perf_counter() - t0) / REPS)
    per_call = float(np.percentile(samples, 50))
    report["latency_ms_per_batch"] = round(per_call * 1000, 3)
    report["qps"] = round(batch / per_call, 1)

    # free the slab before the next dtype
    vectors.delete()
    row_scales.delete()
    return report


def bench_ivf_10m(corpus, n, dim, k, batch, trials, n_lists=4096,
                  budgets=(32768, 65536, 131072, 262144), refine_mult=8,
                  train_per_list=192, iters=8):
    """Budget-probing IVF at 10M on one chip (r05 item 4; flat floor is
    565 QPS). Clustering never touches a host f32 mirror (40 GB at 10M):

    - k-means TRAINS on a device-gathered subsample of the int8 slab,
      dequantized to bf16 (per-row scales are positive, so int8·centroid
      argmax assignment is scale-invariant — the full-corpus assign pass
      reads the int8 slab directly);
    - the CSR build is O(n) host int32 work;
    - search = the production ``_ivf_budget_search_kernel`` (chunked
      candidate gather — BENCH_GATHER_r05 measured XLA row-gather at
      ~400 GB/s at the 32K chunk size, so no bespoke DMA kernel needed);
    - recall = shortlist containment of the exact f32 oracle top-10
      (the host refine rescores the shortlist exactly, same as flat)."""
    import jax
    import jax.numpy as jnp

    from automative_rag_tpu.index.ivf import (
        CSR_ALIGN, _ivf_budget_search_kernel, _pow2_at_least)
    from automative_rag_tpu.ops.kmeans import _gather_rows, _lloyd, _pad_to

    rng = np.random.default_rng(7)
    rows_host, scales_host = corpus["int8"]
    queries = corpus["queries"]
    n_oracle_q = queries.shape[0]
    report = {"n": n, "n_lists": n_lists, "k": k, "batch": batch}

    t0 = time.time()
    vectors = jax.device_put(jnp.asarray(rows_host))
    row_scales = jax.device_put(jnp.asarray(scales_host))
    jax.block_until_ready((vectors, row_scales))
    report["ship_s"] = round(time.time() - t0, 1)

    # ---- cluster ----
    t0 = time.time()
    chunk = 8192
    train_n = min(n, train_per_list * n_lists)
    train_rows = np.sort(rng.choice(n, size=train_n, replace=False))

    @jax.jit
    def _dequant_rows(slab, scl, rows):
        block = jnp.take(slab, rows, axis=0).astype(jnp.bfloat16)
        return block * scl[rows][:, None].astype(jnp.bfloat16)

    # gather + dequant in 256K-row slices (one [train_n, D] bf16 slab)
    train_parts = []
    for s in range(0, train_n, 262144):
        rr = jnp.asarray(train_rows[s: s + 262144], jnp.int32)
        train_parts.append(_dequant_rows(vectors, row_scales, rr))
    train_slab = jnp.concatenate(train_parts, axis=0)
    del train_parts
    pad_n = _pad_to(train_n, chunk)
    if pad_n != train_n:
        train_slab = jnp.pad(train_slab, ((0, pad_n - train_n), (0, 0)))
    init_rows = np.sort(rng.choice(n, size=n_lists, replace=False))
    cent0 = (rows_host[init_rows].astype(np.float32)
             * scales_host[init_rows][:, None])
    cent0 /= np.maximum(np.linalg.norm(cent0, axis=1, keepdims=True), 1e-12)
    centroids = _lloyd(train_slab, jnp.asarray(cent0, jnp.float32),
                       jnp.asarray(train_n, jnp.int32), chunk, iters)
    jax.block_until_ready(centroids)
    del train_slab
    report["train_s"] = round(time.time() - t0, 1)

    # ---- full-corpus assignment: int8 slab · bf16 centroids, argmax is
    # scale-invariant (positive per-row scales). NO padded slab copy:
    # jnp.pad of the 9.54 GB device slab to the chunk multiple DOUBLED
    # the footprint and OOM'd the 16 GB chip (r05 first pass) — full
    # chunks scan in place and the ragged tail re-reads the last full
    # chunk window, keeping only its fresh rows ----
    t0 = time.time()
    a_chunk = min(131072, n)
    n_full = (n // a_chunk) * a_chunk

    def _sim_argmax(block, cent):
        sim = jax.lax.dot_general(
            block.astype(jnp.bfloat16), cent.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        return jnp.argmax(sim, axis=1).astype(jnp.int32)

    @jax.jit
    def _assign_int8(slab, cent):
        def body(_, idx):
            block = jax.lax.dynamic_slice(
                slab, (idx * a_chunk, 0), (a_chunk, dim))
            return _, _sim_argmax(block, cent)

        _, assigns = jax.lax.scan(body, None, jnp.arange(n_full // a_chunk))
        return assigns.reshape(-1)

    @jax.jit
    def _assign_tail(slab, cent):
        block = jax.lax.dynamic_slice(
            slab, (n - a_chunk, 0), (a_chunk, dim))
        return _sim_argmax(block, cent)

    assigns = np.asarray(_assign_int8(vectors, centroids))
    tail = n - n_full
    if tail:
        at = np.asarray(_assign_tail(vectors, centroids))[a_chunk - tail:]
        assigns = np.concatenate([assigns, at])
    assigns = assigns[:n].astype(np.int64)
    report["assign_s"] = round(time.time() - t0, 1)

    # ---- CSR build (host int32 work only) ----
    t0 = time.time()
    counts = np.bincount(assigns, minlength=n_lists)
    span = (-(-(counts + np.maximum(CSR_ALIGN, counts // 4)) // CSR_ALIGN)
            * CSR_ALIGN).astype(np.int64)
    starts = np.zeros(n_lists, np.int64)
    np.cumsum(span[:-1], out=starts[1:])
    m_slots = _pow2_at_least(int(span.sum()))
    sorted_rows = np.full(m_slots, -1, np.int32)
    order = np.argsort(assigns, kind="stable")
    sa = assigns[order]
    gstart = np.searchsorted(sa, np.arange(n_lists))
    slots = np.arange(n, dtype=np.int64) - gstart[sa]
    sorted_rows[starts[sa] + slots] = order.astype(np.int32)
    scan_lens = np.minimum(-(-counts // CSR_ALIGN) * CSR_ALIGN,
                           span).astype(np.int32)
    report["csr_build_s"] = round(time.time() - t0, 1)
    report["csr_slots"] = int(m_slots)
    report["max_list"] = int(counts.max())
    report["min_list"] = int(counts.min())

    sr = jax.device_put(jnp.asarray(sorted_rows))
    st = jax.device_put(jnp.asarray(starts.astype(np.int32)))
    sl = jax.device_put(jnp.asarray(scan_lens))
    cent_dev = jax.device_put(centroids.astype(jnp.bfloat16))
    mask = jnp.ones(n, bool)
    k_scan = max(k, k * refine_mult)

    qs = np.abs(queries).max(axis=1) / 127.0
    q_panel = np.clip(np.round(queries / np.maximum(qs, 1e-12)[:, None]),
                      -127, 127).astype(np.int8).astype(np.float32)

    report["budgets"] = {}
    for budget in budgets:
        entry = {}
        try:
            @jax.jit
            def once(q, v, rs, m, c, a, b, c2, budget=budget):
                return _ivf_budget_search_kernel(
                    v, rs, m, c, a, b, c2, q, budget, k_scan, True)

            # recall panel (also compiles)
            t0 = time.time()
            got = []
            for s in range(0, n_oracle_q, batch):
                qb = q_panel[s: s + batch]
                if qb.shape[0] < batch:
                    qb = np.pad(qb, ((0, batch - qb.shape[0]), (0, 0)))
                _, rows_out = once(jnp.asarray(qb), vectors, row_scales,
                                   mask, cent_dev, sr, st, sl)
                got.extend(np.asarray(rows_out)[: min(batch,
                                                      n_oracle_q - s)])
            entry["compile_plus_recall_s"] = round(time.time() - t0, 1)
            entry["recall_at_10_raw"] = round(float(np.mean([
                len(set(got[q][:k].tolist()) & corpus["oracle"][q]) / k
                for q in range(n_oracle_q)])), 4)
            entry["recall_at_10_refined"] = round(float(np.mean([
                len(set(got[q].tolist()) & corpus["oracle"][q]) / k
                for q in range(n_oracle_q)])), 4)

            @jax.jit
            def many(q, v, rs, m, c, a, b, c2, budget=budget):
                def body(carry, _):
                    vals, rows_o = _ivf_budget_search_kernel(
                        v, rs, m, c, a, b, c2, carry, budget, k_scan, True)
                    carry = carry + (vals[0, 0] * 0).astype(carry.dtype)
                    return carry, vals[:, 0]

                _, outs = jax.lax.scan(body, q, None, length=REPS)
                return outs

            q0 = jnp.asarray(q_panel[:batch])
            np.asarray(many(q0, vectors, row_scales, mask, cent_dev,
                            sr, st, sl))
            samples = []
            for _ in range(trials):
                t0 = time.perf_counter()
                np.asarray(many(q0, vectors, row_scales, mask, cent_dev,
                                sr, st, sl))
                samples.append((time.perf_counter() - t0) / REPS)
            per_call = float(np.percentile(samples, 50))
            entry["latency_ms_per_batch"] = round(per_call * 1000, 3)
            entry["qps"] = round(batch / per_call, 1)
        except Exception as exc:  # noqa: BLE001 — keep partial points
            entry["error"] = repr(exc)[:300]
        report["budgets"][str(budget)] = entry
        print(f"[ivf_10m] budget {budget}: {entry}", file=sys.stderr,
              flush=True)

    vectors.delete()
    row_scales.delete()
    return report


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=10_000_000)
    parser.add_argument("--dim", type=int, default=1024)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--trials", type=int, default=3)
    parser.add_argument("--oracle-queries", type=int, default=16)
    parser.add_argument("--refine-mult", type=int, default=8,
                        help="shortlist = refine_mult*k (0/1 = plain scan)")
    parser.add_argument("--selection", choices=("approx", "exact"),
                        default="approx",
                        help="shortlist selection: approx_max_k "
                             "(production default) or exact hierarchical")
    parser.add_argument("--dtypes", default="int8,int4")
    parser.add_argument("--ivf", action="store_true",
                        help="run the budget-probing IVF section (r05 "
                             "item 4); re-ships the int8 slab after the "
                             "flat sections free theirs")
    parser.add_argument("--skip-flat", action="store_true",
                        help="IVF section only (with --ivf)")
    parser.add_argument("--out", default="BENCH_SCALE_10M_r04.json")
    parser.add_argument("--cpu", action="store_true",
                        help="pin the CPU backend (smoke tests)")
    args = parser.parse_args()
    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
    _enable_cache()

    import jax

    report = {
        "bench": "flat_capacity_10m",
        "platform": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "oracle": f"exact f32 top-10, {args.oracle_queries} queries",
    }
    # disk-cache the generated corpus: the 10M host build is ~30 min and
    # a failed device phase (e.g. the r05 OOM) otherwise pays it again
    cache = Path(f"/tmp/bench10m_corpus_{args.n}_{args.dim}_"
                 f"{args.oracle_queries}.npz")
    if cache.exists():
        z = np.load(cache)
        corpus = {
            "int8": (z["i8"], z["i8s"]), "int4": (z["i4"], z["i4s"]),
            "queries": z["q"],
            "oracle": [set(r.tolist()) for r in z["orc"]],
            "gen_s": float(z["gen_s"]),
        }
        print(f"[gen] corpus loaded from {cache}", file=sys.stderr)
    else:
        corpus = generate_corpus(args.n, args.dim, args.oracle_queries)
        try:
            np.savez(cache, i8=corpus["int8"][0], i8s=corpus["int8"][1],
                     i4=corpus["int4"][0], i4s=corpus["int4"][1],
                     q=corpus["queries"],
                     orc=np.array([sorted(s) for s in corpus["oracle"]],
                                  np.int64),
                     gen_s=corpus["gen_s"])
        except Exception as exc:  # noqa: BLE001 — cache is best-effort
            print(f"[gen] cache write failed: {exc!r}", file=sys.stderr)
    report["gen_s"] = corpus["gen_s"]
    if not args.skip_flat:
        for dtype in args.dtypes.split(","):
            key = f"flat_{args.n // 1_000_000}m_{dtype}"
            try:
                report[key] = bench_dtype(
                    dtype, corpus, args.n, args.dim, args.k, args.batch,
                    args.trials, refine_mult=args.refine_mult,
                    selection=args.selection)
                print(f"[done] {key}: {report[key]}", file=sys.stderr)
            except Exception as exc:  # noqa: BLE001 — record and continue
                report[key] = {"error": repr(exc)[:500]}
                print(f"[fail] {key}: {exc!r}", file=sys.stderr)
            Path(args.out).write_text(json.dumps(report, indent=1))
    if args.ivf:
        key = f"ivf_{args.n // 1_000_000}m"
        try:
            report[key] = bench_ivf_10m(
                corpus, args.n, args.dim, args.k, args.batch, args.trials)
            print(f"[done] {key}: {report[key]}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            report[key] = {"error": repr(exc)[:500]}
            print(f"[fail] {key}: {exc!r}", file=sys.stderr)
        Path(args.out).write_text(json.dumps(report, indent=1))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
