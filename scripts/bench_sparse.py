"""Sparse lexical-arm scan bench: the equality-match top-k kernel
(`index/sparse.py`) at corpus scale, plus end-to-end SparseIndex.search.

Methodology per CLAUDE.md: the kernel is timed with an in-graph
`lax.scan` whose carry serializes reps (the ~26 ms relay dispatch
amortizes over REPS; REPS>=200 or the number reads 10x high), corpus
passed as an argument (closure constants ship through the remote
compiler). Recall sanity: device top-k must equal the numpy oracle.

Run on-chip (queued for tunnel recovery) or on CPU with --cpu for wiring
checks (CPU absolute numbers are meaningless).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1_000_000)
    parser.add_argument("--top-terms", type=int, default=48)
    parser.add_argument("--q-terms", type=int, default=32)
    parser.add_argument("--k", type=int, default=18)
    parser.add_argument("--reps", type=int, default=200)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--lean", action="store_true",
                        help="production + LUT kernels only: skip the "
                             "broadcast/fori/flat-topk A/B and the 16-bit "
                             "section (each is a fresh multi-minute remote "
                             "compile; their verdicts are already on "
                             "record)")
    parser.add_argument("--out", default="")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        try:
            jax.config.update("jax_compilation_cache_dir",
                              "/tmp/jax_compile_cache")
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:  # noqa: BLE001 — cache is best-effort
            pass
    import jax.numpy as jnp
    import numpy as np

    from automative_rag_tpu.index.sparse import (
        _BLOCK, SparseIndex, _score_rows_np)

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    n, t, q = args.n, args.top_terms, args.q_terms
    # zipf-ish vocabulary: a realistic df skew so idf/top-k are non-trivial
    vocab = 250_000
    ids = (rng.zipf(1.3, size=(n, t)).astype(np.int64) % vocab).astype(np.int32)
    weights = np.abs(rng.normal(0.8, 0.4, size=(n, t))).astype(np.float32)

    idx = SparseIndex(top_terms=t)
    idx.append(ids, weights)

    # query shares some terms with the corpus head rows
    q_ids = np.concatenate([ids[0, : q // 2], ids[1, : q - q // 2]]).astype(np.int32)
    q_w = np.abs(rng.normal(1.0, 0.3, size=q)).astype(np.float32)

    # correctness vs oracle (on a slice: the full-n numpy oracle is O(n*t*q))
    got = idx.search(q_ids, q_w, k=args.k)
    sample = slice(0, min(n, 100_000))
    oracle = _score_rows_np(ids[sample], weights[sample], q_ids, q_w)
    want_top = set(np.argsort(-oracle)[: args.k].tolist())
    got_rows_in_sample = [r for r, _ in got if r < sample.stop]
    overlap = len(set(got_rows_in_sample) & want_top)
    print(f"oracle overlap (sample): {overlap}/{len(got_rows_in_sample)}",
          file=sys.stderr, flush=True)

    # kernel timing: in-graph scan, corpus as argument; A/B the scoring
    # formulations over the r04 term-major slab. "pallas" is the production
    # kernel on TPU (the headline reflects the SHIPPED variant — r03
    # ADVICE #3 flagged a stale-headline mismatch); "broadcast"/"fori" are
    # the shared XLA cores. "+flat_topk" isolates the two-stage top-k win.
    from automative_rag_tpu.index.sparse import (
        _sparse_topk_kernel, _use_variant, _xla_scores_tm)
    from automative_rag_tpu.ops.sparse_scan import sparse_scores_tm

    state = idx._device_state()
    ids_slab, w_slab, staged = state
    k = min(args.k, staged)
    reps = args.reps
    cap = ids_slab.shape[1]
    interpret = jax.default_backend() != "tpu"

    def make_many(variant, flat_topk=False):
        @jax.jit
        def many(qi, qw, islab, wslab):
            def body(carry, _):
                qi_c, qw_c = carry
                if flat_topk:
                    if variant == "pallas":
                        scores = sparse_scores_tm(
                            islab, wslab, qi_c, qw_c, interpret=interpret)
                    else:
                        scores = _xla_scores_tm(
                            islab, wslab, qi_c, qw_c, variant)
                    scores = jnp.where(
                        jnp.arange(cap) < staged, scores, -jnp.inf)
                    vals, rows = jax.lax.top_k(scores, k)
                else:
                    vals, rows = _sparse_topk_kernel(
                        islab, wslab, staged, qi_c, qw_c, k,
                        variant=variant, interpret=interpret)
                # serialize reps through the carry so XLA can't hoist/CSE
                qw_c = qw_c + (vals[0] * 0).astype(qw_c.dtype)
                return (qi_c, qw_c), vals[0]

            _, outs = jax.lax.scan(body, (qi, qw), None, length=reps)
            return outs

        return many

    qi_d = jnp.asarray(q_ids)
    qw_d = jnp.asarray(q_w)
    variants = {}
    todo = (("pallas", False),) if args.lean else (
        ("pallas", False), ("pallas+flat_topk", True),
        ("broadcast", False), ("fori", False))
    for variant, flat in todo:
        if args.cpu and variant.startswith("pallas"):
            continue  # interpret-mode timing is meaningless
        name = variant.split("+")[0]
        many = make_many(name, flat_topk=flat)
        try:
            np.asarray(many(qi_d, qw_d, ids_slab, w_slab))  # compile
        except Exception as exc:  # noqa: BLE001 — record the A/B failure
            print(f"{variant}: FAILED {exc!r}", file=sys.stderr, flush=True)
            continue
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(many(qi_d, qw_d, ids_slab, w_slab))
            samples.append((time.perf_counter() - t0) / reps)
        variants[variant] = float(np.percentile(samples, 50))
        print(f"{variant}: {variants[variant] * 1e3:.3f} ms",
              file=sys.stderr, flush=True)
    production = _use_variant()
    per_call = variants.get(production, min(variants.values()))

    # batched-kernel amortization (the retrieve_batch serving path): one
    # dispatch scores B queries against the corpus
    from automative_rag_tpu.index.sparse import _sparse_topk_batch_kernel

    b8_ids = jnp.asarray(np.stack([q_ids] * 8))
    b8_w = jnp.asarray(np.stack([q_w] * 8))

    @jax.jit
    def many_b8(qi, qw, islab, wslab):
        def body(carry, _):
            qi_c, qw_c = carry
            vals, rows = _sparse_topk_batch_kernel(
                islab, wslab, staged, qi_c, qw_c, k,
                variant=production, interpret=interpret)
            qw_c = qw_c + (vals[0, 0] * 0).astype(qw_c.dtype)
            return (qi_c, qw_c), vals[0, 0]

        _, outs = jax.lax.scan(body, (qi, qw), None, length=reps)
        return outs

    np.asarray(many_b8(b8_ids, b8_w, ids_slab, w_slab))  # compile
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(many_b8(b8_ids, b8_w, ids_slab, w_slab))
        samples.append((time.perf_counter() - t0) / reps)
    b8_ms = float(np.percentile(samples, 50)) * 1e3
    print(f"batch8 kernel: {b8_ms:.3f} ms ({b8_ms / 8:.3f} ms/query)",
          file=sys.stderr, flush=True)

    # ---- hash-LUT scan A/B (r05 item 6, second attempt after the 16-bit
    # route died on v5e Mosaic's missing sub-32-bit compares): the query
    # preprocesses into a block-width hash table, the kernel pays ~6 VPU
    # ops per element per QUERY (two dynamic_gather lookups + one compare)
    # instead of ~3·Q — Q-independent, so batching stops scaling linearly
    # in total query terms.
    kernel_lut = {}
    if not args.cpu:
        from automative_rag_tpu.index.sparse import (
            _sparse_topk_lut_batch_kernel, _sparse_topk_lut_kernel)
        from automative_rag_tpu.ops.sparse_scan import build_query_lut

        lut = build_query_lut(q_ids, q_w, width=min(4096, cap))
        lut_b8 = build_query_lut(np.stack([q_ids] * 8),
                                 np.stack([q_w] * 8),
                                 width=min(4096, cap))
        if lut is None or lut_b8 is None:
            kernel_lut = {"error": "residual overflow at build"}
        else:
            tabs = tuple(jnp.asarray(a) for a in lut)
            tabs8 = tuple(jnp.asarray(a) for a in lut_b8)

            @jax.jit
            def many_lut(tab_i, tab_w, r_i, r_w, islab, wslab):
                def body(carry, _):
                    tw_c, rw_c = carry
                    vals, rows = _sparse_topk_lut_kernel(
                        islab, wslab, staged, tab_i, tw_c, r_i, rw_c, k,
                        interpret=interpret)
                    tw_c = tw_c + (vals[0] * 0).astype(tw_c.dtype)
                    return (tw_c, rw_c), vals[0]

                _, outs = jax.lax.scan(
                    body, (tab_w, r_w), None, length=reps)
                return outs

            @jax.jit
            def many_lut_b8(tab_i, tab_w, r_i, r_w, islab, wslab):
                def body(carry, _):
                    tw_c, rw_c = carry
                    vals, rows = _sparse_topk_lut_batch_kernel(
                        islab, wslab, staged, tab_i, tw_c, r_i, rw_c, k,
                        interpret=interpret)
                    tw_c = tw_c + (vals[0, 0] * 0).astype(tw_c.dtype)
                    return (tw_c, rw_c), vals[0, 0]

                _, outs = jax.lax.scan(
                    body, (tab_w, r_w), None, length=reps)
                return outs

            for name, fn, targs in (
                    ("single", many_lut, tabs),
                    ("batch8", many_lut_b8, tabs8)):
                try:
                    out = np.asarray(
                        fn(targs[0], targs[1], targs[2], targs[3],
                           ids_slab, w_slab))  # compile
                    samples = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        np.asarray(fn(targs[0], targs[1], targs[2],
                                      targs[3], ids_slab, w_slab))
                        samples.append((time.perf_counter() - t0) / reps)
                    ms = float(np.percentile(samples, 50)) * 1e3
                    kernel_lut[name] = round(ms, 4)
                    if name == "batch8":
                        kernel_lut["batch8_per_query_ms"] = round(ms / 8, 4)
                    print(f"pallas_lut {name}: {ms:.3f} ms",
                          file=sys.stderr, flush=True)
                except Exception as exc:  # noqa: BLE001 — record A/B failure
                    kernel_lut[name] = f"FAILED {exc!r}"[:200]
                    print(f"pallas_lut {name}: FAILED {exc!r}"[:300],
                          file=sys.stderr, flush=True)
            # sanity: LUT top-k rows must match the production kernel
            try:
                v_ref, r_ref = _sparse_topk_kernel(
                    ids_slab, w_slab, staged, qi_d, qw_d, k,
                    variant="pallas", interpret=interpret)
                v_lut, r_lut = _sparse_topk_lut_kernel(
                    ids_slab, w_slab, staged, *tabs, k,
                    interpret=interpret)
                kernel_lut["rows_match"] = bool(
                    np.array_equal(np.asarray(r_ref), np.asarray(r_lut)))
            except Exception as exc:  # noqa: BLE001
                kernel_lut["rows_match"] = f"FAILED {exc!r}"[:200]

    # ---- 16-bit scan A/B (r05 item 6): vocab-bounded corpora (the
    # product's zh+spec vocabulary is ~10-30K distinct terms) stage an
    # int16 dense-remap slab + bf16 accumulator → 2× VPU lane packing on
    # a scan that is already AT the 32-bit VPU roofline. Same zipf shape,
    # ids folded into a 25K vocab; 32-bit baseline on the SAME corpus.
    kernel16 = {}
    if not args.cpu and not args.lean:
        ids_v = (ids % 25_000).astype(np.int32)
        qids_v = (q_ids % 25_000).astype(np.int32)
        variants16 = {}
        b8_16 = {}
        for vname in ("pallas", "pallas16"):
            idx_v = SparseIndex(top_terms=t)
            idx_v.append(ids_v, weights)
            idx_v.scan_variant = vname
            st_v, keys_v = idx_v._device_state_with_keys()
            islab_v, wslab_v, staged_v = st_v
            qv = (idx_v._map_query_ids(qids_v, keys_v)
                  if keys_v is not None else qids_v)
            many = make_many(vname)
            qi_v, qw_v = jnp.asarray(qv), jnp.asarray(q_w)
            try:
                np.asarray(many(qi_v, qw_v, islab_v, wslab_v))
            except Exception as exc:  # noqa: BLE001
                variants16[vname] = f"FAILED {exc!r}"[:200]
                continue
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(many(qi_v, qw_v, islab_v, wslab_v))
                samples.append((time.perf_counter() - t0) / reps)
            variants16[vname] = round(
                float(np.percentile(samples, 50)) * 1e3, 4)
            print(f"vocab25k {vname}: {variants16[vname]} ms",
                  file=sys.stderr, flush=True)

            bq = jnp.asarray(np.stack([np.asarray(qv)] * 8))
            bw = jnp.asarray(np.stack([q_w] * 8))

            @jax.jit
            def many_b(qi, qw, islab, wslab, vname=vname,
                       staged_v=staged_v):
                def body(carry, _):
                    qi_c, qw_c = carry
                    vals, rows = _sparse_topk_batch_kernel(
                        islab, wslab, staged_v, qi_c, qw_c, k,
                        variant=vname, interpret=interpret)
                    qw_c = qw_c + (vals[0, 0] * 0).astype(qw_c.dtype)
                    return (qi_c, qw_c), vals[0, 0]

                _, outs = jax.lax.scan(body, (qi, qw), None, length=reps)
                return outs

            try:
                np.asarray(many_b(bq, bw, islab_v, wslab_v))
                samples = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(many_b(bq, bw, islab_v, wslab_v))
                    samples.append((time.perf_counter() - t0) / reps)
                ms = float(np.percentile(samples, 50)) * 1e3
                b8_16[vname] = {"batch8_ms": round(ms, 4),
                                "per_query_ms": round(ms / 8, 4)}
                print(f"vocab25k {vname} batch8: {ms:.3f} ms "
                      f"({ms / 8:.3f}/q)", file=sys.stderr, flush=True)
            except Exception as exc:  # noqa: BLE001
                b8_16[vname] = {"error": repr(exc)[:200]}
        kernel16 = {"vocab": 25_000, "single_ms": variants16,
                    "batch8": b8_16}

    bytes_read = staged * t * (4 + w_slab.dtype.itemsize)
    result = {
        "bench": "sparse_scan",
        "device": str(dev.platform),
        "n": n, "top_terms": t, "query_terms": q, "k": k,
        "reps": reps,
        "kernel_ms": round(per_call * 1e3, 4),
        "kernel_headline_variant": production,
        "kernel_ms_variants": {
            name: round(v * 1e3, 4) for name, v in variants.items()},
        "kernel_batch8_ms": round(b8_ms, 4),
        "kernel_batch8_per_query_ms": round(b8_ms / 8, 4),
        "corpus_mb": round(bytes_read / 1e6, 1),
        "effective_gbps": round(bytes_read / per_call / 1e9, 1),
        "oracle_overlap": f"{overlap}/{len(got_rows_in_sample)}",
        "end_to_end_search_ms": None,
    }
    if kernel_lut:
        result["kernel_lut"] = kernel_lut
    if kernel16:
        result["kernel16"] = kernel16

    # end-to-end host call (includes idf-free query prep + host merge)
    idx.search(q_ids, q_w, k=args.k)
    t0 = time.perf_counter()
    for _ in range(20):
        idx.search(q_ids, q_w, k=args.k)
    result["end_to_end_search_ms"] = round((time.perf_counter() - t0) / 20 * 1e3, 3)

    if args.lean and args.out and Path(args.out).exists():
        # merge into the existing artifact: keep the variant A/B and
        # 16-bit verdicts already on record, refresh what this run
        # measured
        try:
            old = json.loads(Path(args.out).read_text())
            merged_variants = {**old.get("kernel_ms_variants", {}),
                               **result.get("kernel_ms_variants", {})}
            old.update(result)
            old["kernel_ms_variants"] = merged_variants
            result = old
        except Exception:  # noqa: BLE001 — unreadable → overwrite
            pass
    line = json.dumps(result, ensure_ascii=False)
    if args.out:
        Path(args.out).write_text(line)
    print(line, flush=True)


if __name__ == "__main__":
    main()
