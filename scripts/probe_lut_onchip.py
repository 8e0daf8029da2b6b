"""Minimal on-chip legality probe for the sparse hash-LUT kernel.

Answers ONE question cheaply (a single small executable): does v5e Mosaic
legalize ``tpu.dynamic_gather`` at the [T, 4096] block shape the LUT scan
uses (``ops/sparse_scan.py:_scan_kernel_lut``)?  The 16-bit lane-packing
route already died on this target ("Target does not support this
comparison", CLAUDE.md r05); this probe decides whether the LUT route
ships before any full bench burns chip time on it.

Exit 0 + "LUT_OK" when compile+execute matches the numpy oracle;
prints the Mosaic error otherwise.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    import jax.numpy as jnp
    import numpy as np

    from automative_rag_tpu.index.sparse import (
        _sparse_topk_lut_batch_kernel, _sparse_topk_lut_kernel)
    from automative_rag_tpu.ops.sparse_scan import build_query_lut, np_scores_tm

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    t_terms, cap, q = 48, 8192, 32
    n = 6000
    ids_t = np.full((t_terms, cap), -1, np.int32)
    ids_t[:, :n] = rng.integers(0, 2_000_000_000, size=(t_terms, n))
    w_t = np.zeros((t_terms, cap), np.float32)
    w_t[:, :n] = rng.random((t_terms, n))
    q_ids = ids_t[:q, 17].copy()
    q_w = rng.random(q).astype(np.float32)

    islab = jnp.asarray(ids_t)
    wslab = jnp.asarray(w_t, jnp.bfloat16)
    oracle = np_scores_tm(ids_t, np.asarray(wslab, np.float32), q_ids, q_w)
    want = np.argsort(-oracle, kind="stable")[:10]

    ok_width = None
    for width in (4096, 512, 128):
        lut = build_query_lut(q_ids, q_w, width=width)
        if lut is None:
            print(f"width {width}: residual overflow, skipping",
                  file=sys.stderr, flush=True)
            continue
        tabs = tuple(jnp.asarray(a) for a in lut)
        try:
            t0 = time.time()
            vals, rows = _sparse_topk_lut_kernel(
                islab, wslab, n, *tabs, 10, interpret=False)
            rows = np.asarray(rows)
            print(f"width {width}: single compiled+ran in "
                  f"{time.time() - t0:.1f}s", file=sys.stderr, flush=True)
            if not np.array_equal(rows, want):
                print(f"LUT_MISMATCH width {width}: got {rows} want {want}")
                return 1
            lut8 = build_query_lut(np.stack([q_ids] * 8),
                                   np.stack([q_w] * 8), width=width)
            tabs8 = tuple(jnp.asarray(a) for a in lut8)
            t0 = time.time()
            vals8, rows8 = _sparse_topk_lut_batch_kernel(
                islab, wslab, n, *tabs8, 10, interpret=False)
            rows8 = np.asarray(rows8)
            print(f"width {width}: batch8 compiled+ran in "
                  f"{time.time() - t0:.1f}s", file=sys.stderr, flush=True)
            if not all(np.array_equal(rows8[i], want) for i in range(8)):
                print(f"LUT_MISMATCH batch width {width}")
                return 1
            ok_width = width
            break
        except Exception as exc:  # noqa: BLE001 — the verdict is the point
            print(f"width {width}: FAILED {exc!r}"[:1200],
                  file=sys.stderr, flush=True)
    if ok_width is None:
        print("LUT_FAILED all widths")
        return 1
    print(f"LUT_OK width={ok_width}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
