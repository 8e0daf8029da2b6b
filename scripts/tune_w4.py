"""On-chip A/B of w4a16 unpack variants at 7B decode shapes.

The fused kernel's decode cost is VPU-unpack-bound, not HBM-bound
(BENCH_LLM7B_r03: int4 52 tok/s vs the 5.5 ms/182 tok/s weight-streaming
floor), so the unpack strategy is the lever:

- i32: widen → mask/shift in int32 (r03 shipping default; safe but 4×
  fewer bytes per vector op)
- u8: mask/shift in native uint8 lanes (if Mosaic legalizes them)
- merged: one mask; raw bytes are the second MXU operand

Timing: in-graph lax.scan with a serialized carry + two-length fit
(CLAUDE.md methodology — the ~26 ms relay dispatch divides out).

Run:  python scripts/tune_w4.py            (one real TPU chip)
      python scripts/tune_w4.py --cpu      (wiring check, interpret)
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, nargs=2, default=(50, 250))
    ap.add_argument("--out", default="W4_TUNE_r03.json")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        os.environ.setdefault(
            "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from automative_rag_tpu.ops.quant_matmul import pack_w4, w4_matmul

    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    # 7B MLP shapes dominate decode (gate+up: 2×[3584→18944],
    # down: [18944→3584]); bench both directions at serving batch 8
    shapes = [(8, 3584, 18944), (8, 18944, 3584)]
    if args.cpu:
        shapes = [(8, 256, 512)]

    rng = np.random.default_rng(0)
    results = {}
    r1, r2 = args.reps
    for m, k, n in shapes:
        w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
        packed, scale = pack_w4(w)
        packed, scale = jnp.asarray(packed), jnp.asarray(scale)
        x0 = jnp.asarray(
            rng.normal(size=(m, k)).astype(np.float32), jnp.bfloat16)
        for unpack in ("i32", "u8", "merged"):

            def run_fn(x, reps, unpack=unpack):
                def body(xc, _):
                    y = w4_matmul(xc, packed, scale, interpret=interpret,
                                  unpack=unpack)
                    # serialized carry: real data dependency, tiny value
                    return (xc + y[:, :1] * jnp.bfloat16(1e-8), None)

                return jax.lax.scan(body, x, None, length=reps)[0]

            try:
                f1 = jax.jit(lambda x: run_fn(x, r1))
                f2 = jax.jit(lambda x: run_fn(x, r2))
                np.asarray(f1(x0))  # compile + run
                np.asarray(f2(x0))
                t0 = time.perf_counter()
                np.asarray(f1(x0))
                t1 = time.perf_counter()
                np.asarray(f2(x0))
                t2 = time.perf_counter()
            except Exception as e:  # Mosaic may reject a variant
                results[f"{m}x{k}x{n}:{unpack}"] = {
                    "error": str(e).splitlines()[0][:200]}
                print(f"{m}x{k}x{n} {unpack}: FAILED {e}",
                      file=sys.stderr)
                continue
            per_call_ms = ((t2 - t1) - (t1 - t0)) / (r2 - r1) * 1e3
            gbps = packed.size / (per_call_ms * 1e-3) / 1e9
            results[f"{m}x{k}x{n}:{unpack}"] = {
                "ms": round(per_call_ms, 4),
                "packed_gbps": round(gbps, 1)}
            print(f"{m}x{k}x{n} {unpack}: {per_call_ms:.3f} ms "
                  f"({gbps:.0f} GB/s packed)", file=sys.stderr)

    out = {"bench": "w4_unpack_variants",
           "backend": jax.default_backend(),
           "reps": [r1, r2], "results": results}
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
