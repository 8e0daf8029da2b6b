#!/usr/bin/env python3
"""A/B the top-k stage of the 10M flat scan (BENCH_SCALE_10M follow-up).

At 10M rows the int8 scan's HBM floor is ~16 ms/batch (9.54 GB at the
measured ~600 GB/s effective stream), but the shipped search runs at
~71 ms — the shortlist selection (exact hierarchical top-k,
``ops/topk.py``) dominates. TPUs have a native approximate top-k
(``lax.approx_max_k`` → PartialReduce, jax-ml.github.io docs) that is
one pass over the scores; for the production flat path the shortlist
feeds an exact host refine (``index/flat.py`` refine), so a ~0.95-recall
shortlist of 8k·k candidates loses nothing measurable end-to-end — the
refine containment IS the recall, which this bench reports per variant.

Variants (same on-device int8 corpus, same serialized-scan timing):
- argmax:    scan + argmax only (the no-selection floor)
- hier:      scan + hierarchical_top_k(k_scan)      [shipped today]
- approx:    scan + approx_max_k(k_scan, rt=0.95)
- approx99:  scan + approx_max_k(k_scan, rt=0.99)

Corpus is generated ON DEVICE (PRNG) — no 131 s host ship; the oracle is
the exact hierarchical result on the same arrays.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--k-scan", type=int, default=80)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out", default="BENCH_TOPK_AB_r04.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    from automative_rag_tpu.ops.topk import hierarchical_top_k

    n, dim, batch, k_scan = args.n, args.dim, args.batch, args.k_scan

    @jax.jit
    def gen(key):
        kv, kq = jax.random.split(key)
        vecs = jax.random.randint(kv, (n, dim), -127, 128, jnp.int8)
        q = jax.random.randint(kq, (batch, dim), -127, 128, jnp.int8)
        return vecs, q

    t0 = time.time()
    vectors, q0 = gen(jax.random.PRNGKey(0))
    jax.block_until_ready((vectors, q0))
    gen_s = time.time() - t0

    def make_many(select):
        @jax.jit
        def many(q, vecs):
            def body(carry, _):
                scores = jax.lax.dot_general(
                    carry, vecs, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                vals, idx = select(scores)
                # serialize the carry on a FLOAT value: x*0 is not
                # foldable for floats (NaN/Inf), so XLA cannot hoist the
                # loop-invariant body out of the scan. An int idx*0 IS
                # folded to 0 — the first run of this bench did that and
                # timed the dispatch floor (1.4 ms) instead of the scan.
                carry = carry + (vals[0, 0] * 0).astype(carry.dtype)
                return carry, idx

            _, outs = jax.lax.scan(body, q, None, length=REPS)
            return outs[-1]

        return many

    def _argmax(s):
        return (jnp.max(s, axis=-1, keepdims=True),
                jnp.argmax(s, axis=-1)[:, None])

    variants = {
        "argmax_floor": _argmax,
        "hier_exact": lambda s: hierarchical_top_k(s, k_scan),
        "approx_95": lambda s: jax.lax.approx_max_k(s, k_scan),
        "approx_99": lambda s: jax.lax.approx_max_k(
            s, k_scan, recall_target=0.99),
    }

    report = {
        "bench": "topk_ab_10m", "platform": jax.default_backend(),
        "n": n, "dim": dim, "batch": batch, "k": args.k,
        "k_scan": k_scan, "reps": REPS, "gen_s": round(gen_s, 1),
        "results": {},
    }
    oracle = None
    for name, select in variants.items():
        many = make_many(select)
        try:
            t0 = time.time()
            out = np.asarray(many(q0, vectors))
            compile_s = time.time() - t0
            samples = []
            for _ in range(args.trials):
                t0 = time.perf_counter()
                out = np.asarray(many(q0, vectors))
                samples.append((time.perf_counter() - t0) / REPS)
            ms = float(np.percentile(samples, 50)) * 1000
            row = {"ms_per_batch": round(ms, 3),
                   "qps": round(batch / (ms / 1000), 1),
                   "compile_s": round(compile_s, 1)}
            if name == "hier_exact":
                oracle = out
            if oracle is not None and name.startswith("approx"):
                # shortlist containment of the exact top-k (= refined
                # recall@k after the host refine) and of the full k_scan
                for kk, label in ((args.k, "topk"), (k_scan, "kscan")):
                    cont = np.mean([
                        len(set(out[b].tolist())
                            & set(oracle[b][:kk].tolist())) / kk
                        for b in range(batch)])
                    row[f"contain_{label}"] = round(float(cont), 4)
            report["results"][name] = row
            print(f"[done] {name}: {row}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — record and continue
            report["results"][name] = {"error": repr(exc)[:300]}
            print(f"[fail] {name}: {exc!r}", file=sys.stderr)
        Path(args.out).write_text(json.dumps(report, indent=1))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
