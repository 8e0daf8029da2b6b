#!/usr/bin/env python3
"""Filtered ANN recall curves (BASELINE config #3 / SURVEY §7 "Filtered ANN
recall"): recall@10 vs nprobe for unfiltered and selective-filtered queries,
with and without the selectivity-driven ladder policy.

Recall is hardware-independent — this runs anywhere (CPU included); QPS/
latency numbers for the same index live in BENCH_SCALE.json (on-chip).

Writes one JSON report: per-nprobe recall for each filter selectivity, plus
the ladder policy's chosen width and achieved recall at each selectivity.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np



def build_distribution(dist, n, dim, n_queries, rng):
    """→ (vectors [n, dim] f32, queries [n_queries, dim] f32), both drawn
    from the SAME distribution (in-distribution queries — recall against
    off-distribution gaussians has no cluster locality to exploit)."""
    if dist == "isotropic":
        # IVF's best case: no structure, every list equally likely
        vectors = rng.normal(size=(n, dim)).astype(np.float32)
        queries = rng.normal(size=(n_queries, dim)).astype(np.float32)
        return vectors, queries
    if dist == "encoder":
        # the trained dense encoder over generated automotive docs — the
        # closest available proxy for a real embedding manifold
        from load_example_data import generate_corpus
        from train_encoder import load_trained_embedder

        emb = load_trained_embedder("data/trained_encoder")
        texts = generate_corpus(min(n, 20_000))
        vectors = np.asarray(emb.embed_texts(texts), np.float32)
        qtexts = [t[:16] + " 怎么样" for t in texts[:n_queries]]
        queries = np.asarray(emb.embed_texts(qtexts), np.float32)
        return vectors, queries

    n_clusters = 512
    centers = rng.normal(size=(n_clusters, dim)).astype(np.float32) * 2
    if dist == "clustered":
        # equal-probability clusters (the r03 corpus)
        assign = rng.integers(0, n_clusters, size=n)
        q_assign = rng.integers(0, n_clusters, size=n_queries)
        spread = np.ones(n_clusters, np.float32)
    elif dist in ("powerlaw", "aniso"):
        # zipf cluster masses: a few huge clusters + a long tail of tiny
        # ones (real corpora: popular models dominate) and per-cluster
        # spread variation — k-means centroids over-cover the heavy heads
        # and starve the tail, so probes miss more
        w = 1.0 / np.arange(1, n_clusters + 1) ** 1.2
        w /= w.sum()
        assign = rng.choice(n_clusters, size=n, p=w)
        q_assign = rng.choice(n_clusters, size=n_queries, p=w)
        spread = (0.5 + rng.random(n_clusters) * 2.0).astype(np.float32)
    else:
        raise SystemExit(f"unknown --dist {dist!r}")
    vectors = (centers[assign]
               + rng.normal(size=(n, dim)).astype(np.float32)
               * spread[assign][:, None])
    queries = (centers[q_assign]
               + rng.normal(size=(n_queries, dim)).astype(np.float32)
               * spread[q_assign][:, None])
    if dist == "aniso":
        # spectral decay (PCA spectra of real embedding models fall off
        # fast): variance concentrates in the leading dims
        decay = (1.0 / np.sqrt(np.arange(1, dim + 1))).astype(np.float32)
        vectors = vectors * decay[None, :]
        queries = queries * decay[None, :]
    return vectors.astype(np.float32), queries.astype(np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--dim", type=int, default=1024)
    parser.add_argument("--queries", type=int, default=30)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--tpu", action="store_true",
                        help="run on the accelerator (default: pin CPU so "
                             "recall runs never contend for the chip)")
    parser.add_argument("--out", default="RECALL_CURVES.json")
    parser.add_argument("--dist", default="clustered",
                        help="corpus distribution: clustered | powerlaw | "
                             "aniso | isotropic | encoder (r03 verdict #4: "
                             "equal-size isotropic clusters are IVF's easy "
                             "case; power-law sizes + spectral decay are "
                             "what real embedding manifolds look like)")
    parser.add_argument("--probe-mode", default="budget",
                        choices=["budget", "table"],
                        help="IVF probing mode A/B (r05: budget = CSR "
                             "variable-length lists, the new default)")
    parser.add_argument("--dtype", default="bfloat16",
                        help="index device dtype (bfloat16 | int8)")
    args = parser.parse_args()

    import jax

    if not args.tpu:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    else:
        try:
            # persistent executable cache: remote compiles cost minutes
            # per shape, and the kmeans/budget-ladder set is ~10 programs
            jax.config.update("jax_compilation_cache_dir",
                              "/tmp/jax_compile_cache")
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:  # noqa: BLE001
            pass

    from automative_rag_tpu.documents import Document
    from automative_rag_tpu.index.ivf import IVFIndex, choose_probe, probe_ladder

    rng = np.random.default_rng(0)
    vectors, queries_raw = build_distribution(args.dist, args.n, args.dim,
                                              args.queries, rng)
    # the encoder distribution produces the trained encoder's own dim and
    # as many rows as generated docs exist (< --n for big --n)
    args.n = int(vectors.shape[0])
    args.dim = int(vectors.shape[1])

    # metadata with controlled selectivities: manu (1/5), manu+year (1/40)
    docs = [
        Document(page_content=f"d{i}",
                 metadata={"manufacturer": f"manu-{i % 5}", "year": 2015 + (i % 8)})
        for i in range(args.n)
    ]

    index = IVFIndex(dim=args.dim, device_dtype=args.dtype, n_probe=8,
                     probe_mode=args.probe_mode)
    index.add(vectors, docs)
    t0 = time.time()
    build = index.rebuild()
    build_s = time.time() - t0

    normalized = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
    queries = queries_raw

    filters = {
        "unfiltered": (None, np.ones(args.n, bool)),
        "manufacturer (20%)": (
            {"manufacturer": "manu-2"},
            np.array([d.metadata["manufacturer"] == "manu-2" for d in docs]),
        ),
        "manu+year (2.5%)": (
            {"manufacturer": "manu-2", "year": 2017},
            np.array([d.metadata["manufacturer"] == "manu-2"
                      and d.metadata["year"] == 2017 for d in docs]),
        ),
        "year range (37.5%)": (
            {"year": {"gte": 2017, "lte": 2019}},
            np.array([2017 <= d.metadata["year"] <= 2019 for d in docs]),
        ),
    }

    def exact_topk(q, row_mask):
        scores = normalized @ (q / np.linalg.norm(q))
        scores = np.where(row_mask, scores, -np.inf)
        order = np.argsort(-scores)[: args.k]
        return {int(o) for o in order if np.isfinite(scores[o])}

    # build-time probe self-calibration FIRST — production order
    # (/system/rebuild-index calibrates right after a build, so the
    # selectivity ladder the live index uses is anchored at the
    # calibrated base; r04's first powerlaw artifact measured the policy
    # from the uncalibrated default and read 0.265 recall unfiltered)
    base_probe = index.n_probe
    calibration = index.calibrate(target_recall=0.95)
    pre_ladder = probe_ladder(base_probe, index.n_lists)
    post_ladder = probe_ladder(index.n_probe, index.n_lists)
    ladder = sorted(set(pre_ladder) | set(post_ladder))
    report = {
        "n": args.n, "dim": args.dim, "k": args.k,
        "dist": args.dist, "build_s": round(build_s, 1),
        **build, "ladder": ladder, "calibration": calibration,
        "curves": {}, "ladder_policy": {},
    }

    for name, (flt, row_mask) in filters.items():
        oracle = [exact_topk(q, row_mask) for q in queries]
        curve = {}
        for nprobe in ladder:
            recall = 0.0
            for q, want in zip(queries, oracle):
                got = {r.row for r in index.search(
                    q, args.k, flt, n_probe=nprobe, pin_probe=True)[0]}
                denom = max(1, min(args.k, len(want)))
                recall += len(got & want) / denom
            curve[nprobe] = round(recall / len(queries), 4)
        report["curves"][name] = curve

        # what the production ladder policy picks for this selectivity —
        # from the calibrated base (chosen_nprobe) and, for comparison,
        # from the uncalibrated default (precalib_nprobe)
        selectivity = float(row_mask.mean())
        rows_per_list = index._indexed_rows / max(1, index.n_lists)
        chosen = choose_probe(post_ladder, selectivity, rows_per_list, args.k)
        pre = choose_probe(pre_ladder, selectivity, rows_per_list, args.k)
        report["ladder_policy"][name] = {
            "selectivity": round(selectivity, 4),
            "chosen_nprobe": chosen,
            "recall_at_chosen": curve[chosen],
            "precalib_nprobe": pre,
            "recall_precalib": curve[pre],
        }
        print(name, "curve:", curve, "policy:", report["ladder_policy"][name],
              flush=True)

    # headline check (VERDICT r1 #3): filtered recall within 2 pts of
    # unfiltered at the policy-chosen widths
    unf = report["ladder_policy"]["unfiltered"]["recall_at_chosen"]
    worst = min(p["recall_at_chosen"] for p in report["ladder_policy"].values())
    report["filtered_within_2pts_of_unfiltered"] = bool(worst >= unf - 0.02)

    # latency alongside recall (VERDICT r05 item 1 'Done' criterion):
    # batched pinned search wall time per ladder level, host-API honest
    # (includes dispatch + result build), after a warmup pass
    qb = np.stack([queries[i % len(queries)] for i in range(8)])
    report["latency"] = {}
    for nprobe in ladder:
        index.search(qb, args.k, n_probe=nprobe, pin_probe=True)  # warm
        samples = []
        for _ in range(7):
            t0 = time.perf_counter()
            index.search(qb, args.k, n_probe=nprobe, pin_probe=True)
            samples.append(time.perf_counter() - t0)
        p50 = float(np.percentile(samples, 50))
        report["latency"][nprobe] = {
            "batch8_ms": round(p50 * 1000, 2), "qps": round(8 / p50, 1),
            "recall_unfiltered": report["curves"]["unfiltered"][nprobe],
        }
        print("latency", nprobe, report["latency"][nprobe], flush=True)
    cal_probe = int(index.n_probe)
    if cal_probe in report["latency"]:
        report["headline"] = {
            "calibrated_nprobe": cal_probe,
            "recall_at_10": report["curves"]["unfiltered"].get(cal_probe),
            "qps": report["latency"][cal_probe]["qps"],
        }

    # ---- in-graph QPS at the CALIBRATED PLAN (the host-API numbers
    # above carry 2-3 relay round trips per search; the serialized-scan
    # measurement is the kernel truth the "≥N QPS on-chip" targets mean).
    # The planner (IVFIndex.calibrate) may have routed production
    # searches to the exact quantized scan — measure BOTH and headline
    # the chosen plan.
    import jax as _jax
    import jax.numpy as jnp

    from automative_rag_tpu.index.filters import FilterSpec as _FS
    from automative_rag_tpu.index.filters import eval_filter_mask
    from automative_rag_tpu.index.ivf import _ivf_budget_search_kernel
    from automative_rag_tpu.ops.topk import masked_top_k

    reps = 50
    state = index._device_state()
    qb8 = jnp.asarray(np.stack(
        [queries[i % len(queries)] for i in range(8)]).astype(np.float32))
    spec_all = _FS.match_all()
    int8 = index._int8

    def _time(fn, *ops):
        np.asarray(fn(*ops))
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(*ops))
            samples.append((time.perf_counter() - t0) / reps)
        return float(np.percentile(samples, 50))

    in_graph = {}
    try:
        budget = index._budget_of(cal_probe, args.k)

        @_jax.jit
        def many_ivf(q, vectors, scales, valid, cent, sr, st, sl):
            def body(carry, _):
                vals, _ = _ivf_budget_search_kernel(
                    vectors, scales, valid, cent, sr, st, sl, carry,
                    budget, args.k, int8)
                carry = carry + (vals[0, 0] * 0).astype(carry.dtype)
                return carry, vals[:, 0]

            _, outs = _jax.lax.scan(body, q, None, length=reps)
            return outs

        per = _time(many_ivf, qb8, state["vectors"], state["row_scales"],
                    state["valid"], state["centroids"],
                    state["sorted_rows"], state["list_starts"],
                    state["scan_lens"])
        in_graph["ivf_at_calibrated"] = {
            "budget": budget, "ms_per_batch8": round(per * 1000, 3),
            "qps": round(8 / per, 1)}

        @_jax.jit
        def many_flat(q, vectors, scales, valid, codes, numerics):
            def body(carry, _):
                qq = carry.astype(vectors.dtype)
                raw = _jax.lax.dot_general(
                    qq, vectors, (((1,), (1,)), ((), ())),
                    preferred_element_type=(
                        jnp.int32 if int8 else jnp.float32))
                scores = (raw.astype(jnp.float32) * scales[None, :]
                          if int8 else raw.astype(jnp.float32))
                mask = valid & eval_filter_mask(codes, numerics, spec_all)
                vals, _ = masked_top_k(scores, mask, args.k)
                carry = carry + (vals[0, 0] * 0).astype(carry.dtype)
                return carry, vals[:, 0]

            _, outs = _jax.lax.scan(body, q, None, length=reps)
            return outs

        per = _time(many_flat, qb8, state["vectors"], state["row_scales"],
                    state["valid"], state["codes"], state["numerics"])
        in_graph["flat_exact"] = {
            "ms_per_batch8": round(per * 1000, 3),
            "qps": round(8 / per, 1), "recall_at_10": 1.0}
        report["qps_in_graph"] = in_graph
        plan = getattr(index, "plan", "ivf")
        chosen = (in_graph["flat_exact"] if plan == "flat"
                  else in_graph["ivf_at_calibrated"])
        report["headline"] = {
            "plan": plan,
            "recall_at_10": (1.0 if plan == "flat"
                             else report["curves"]["unfiltered"].get(
                                 cal_probe)),
            "qps_in_graph": chosen["qps"],
            "calibrated_nprobe": cal_probe,
        }
        print("in-graph:", in_graph, "plan:", plan, flush=True)
    except Exception as exc:  # noqa: BLE001 — keep the recall artifact
        report["qps_in_graph"] = {"error": repr(exc)[:300]}

    Path(args.out).write_text(json.dumps(report, indent=2))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
