"""On-chip proof of the bucketed-tail IVF search (live-insert latency).

Claim under test: with a fresh tail present, IVF search pays a SMALL exact
scan over the tail slab — not a full flat scan of the corpus (the previous
design) — and appends do NOT restage the built slab (previously a ~2 GB
host→HBM transfer per insert at 1M×1024).

k-means quality is irrelevant to the latency claim, so the build here is a
synthetic random assignment (seconds, not the 15-minute real build): same
table shapes, same gather pattern, same kernels.

Run:  python scripts/bench_ivf_tail.py          (one real TPU chip)
      python scripts/bench_ivf_tail.py --cpu --n 100000
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--lists", type=int, default=1024)
    ap.add_argument("--nprobe", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tail", type=int, default=10)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--out", default="BENCH_IVF_TAIL_r03.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from automative_rag_tpu.documents.schema import Document
    from automative_rag_tpu.index.ivf import IVFIndex

    rng = np.random.default_rng(0)
    n, d = args.n, args.dim
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
    docs = [Document(page_content=f"d{i}", metadata={"year": 2020 + i % 5},
                     id=f"d{i}") for i in range(n)]

    index = IVFIndex(dim=d, n_lists=args.lists, n_probe=args.nprobe)
    t0 = time.time()
    index.add(vectors, docs)
    add_s = time.time() - t0

    # synthetic balanced build: random assignment, exact table shapes
    t0 = time.time()
    k_lists = args.lists
    assign = rng.integers(0, k_lists, size=n)
    counts = np.bincount(assign, minlength=k_lists)
    cap = -(-int(counts.max()) // 8) * 8
    table = np.full((k_lists, cap), -1, np.int32)
    order = np.argsort(assign, kind="stable")
    sorted_assign = assign[order]
    starts = np.searchsorted(sorted_assign, np.arange(k_lists))
    slots = np.arange(n) - starts[sorted_assign]
    table[sorted_assign, slots] = order.astype(np.int32)
    index._centroids = rng.normal(size=(k_lists, d)).astype(np.float32)
    index._list_table = table
    index._indexed_rows = n
    index._device = None
    build_s = time.time() - t0

    queries = rng.normal(size=(args.batch, d)).astype(np.float32)

    def p50(reps):
        ts = []
        for _ in range(reps):
            t = time.perf_counter()
            index.search(queries, 10, pin_probe=True)
            ts.append(time.perf_counter() - t)
        return sorted(ts)[len(ts) // 2]

    index.search(queries, 10, pin_probe=True)  # compile + stage
    no_tail = p50(args.reps)

    t0 = time.time()
    tail_v = rng.normal(size=(args.tail, d)).astype(np.float32)
    index.add(tail_v, [Document(page_content=f"t{i}", metadata={},
                                id=f"t{i}") for i in range(args.tail)])
    add_tail_s = time.time() - t0
    built_survived = index._device is not None

    index.search(queries, 10, pin_probe=True)  # tail-slab compile + stage
    with_tail = p50(args.reps)
    # sanity: a tail row is findable
    hit = index.search(tail_v[:1], 3, pin_probe=True)[0]
    tail_found = bool(hit and hit[0].document.id == "t0")

    out = {
        "bench": "ivf_tail_live_insert",
        "backend": jax.devices()[0].platform,
        "n": n, "dim": d, "n_lists": k_lists, "n_probe": args.nprobe,
        "batch": args.batch, "tail_rows": args.tail,
        "add_s": round(add_s, 1), "synthetic_build_s": round(build_s, 1),
        "p50_no_tail_ms": round(no_tail * 1000, 3),
        "p50_with_tail_ms": round(with_tail * 1000, 3),
        "tail_overhead_ms": round((with_tail - no_tail) * 1000, 3),
        "append_latency_s": round(add_tail_s, 4),
        "built_slab_survived_append": built_survived,
        "tail_row_found": tail_found,
        "note": ("previous design: any tail forced a FULL flat scan per "
                 "query (≈ the 1M flat p50) AND every append restaged the "
                 "whole corpus slab to HBM"),
        "methodology_note": (
            "p50s here are HOST-API wall times through index.search() — "
            "each search is 2-3 relay dispatches at ~26 ms round trip "
            "plus host result assembly, which is why p50_no_tail_ms "
            "(~70 ms) is ~20x the in-graph IVF kernel p50 (3.7 ms, "
            "BENCH_IVF1M): the DELTA between with/without tail is the "
            "honest number this bench exists for (r05 verdict item 7 "
            "reconciliation)"),
    }
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
