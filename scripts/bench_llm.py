#!/usr/bin/env python3
"""LLM decode benchmark: tokens/s for the jitted Qwen2 generate loop.

Measures prefill latency and steady-state decode rate at several batch
sizes, bf16 vs int8 weight-only. Defaults to a small config on CPU so the
harness runs anywhere; pass --tpu and a real --config-size on hardware.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tpu", action="store_true")
    parser.add_argument("--d-model", type=int, default=256)
    parser.add_argument("--layers", type=int, default=4)
    parser.add_argument("--vocab", type=int, default=4096)
    parser.add_argument("--prompt-len", type=int, default=512)
    parser.add_argument("--new-tokens", type=int, default=128)
    parser.add_argument("--batches", type=int, nargs="+", default=[1, 8])
    parser.add_argument("--draft-k", type=int, default=0,
                        help="override Qwen2Model.DRAFT_K for the spec section")
    parser.add_argument("--spec-only", action="store_true",
                        help="skip the plain-decode sweeps")
    args = parser.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from automative_rag_tpu.models.qwen2 import (
        Qwen2Config,
        Qwen2Model,
        quantize_qwen2_params,
    )

    cfg = Qwen2Config(
        vocab_size=args.vocab, d_model=args.d_model, num_layers=args.layers,
        num_heads=max(4, args.d_model // 64), num_kv_heads=max(2, args.d_model // 128),
        intermediate_size=args.d_model * 3, max_positions=args.prompt_len + args.new_tokens + 64,
        rope_theta=1e6, eos_token=1, tie_embeddings=True,
    )
    base = Qwen2Model(cfg, seed=0)
    qcfg = dataclasses.replace(cfg, weight_bits=8)
    quant = Qwen2Model(qcfg, seed=0)
    quant.params = quantize_qwen2_params(base.params, qcfg)

    rng = np.random.default_rng(0)
    report = {"d_model": cfg.d_model, "layers": cfg.num_layers,
              "prompt_len": args.prompt_len, "new_tokens": args.new_tokens,
              "backend": jax.devices()[0].platform}
    for name, model in () if args.spec_only else (("bf16", base), ("int8", quant)):
        for b in args.batches:
            prompt = rng.integers(3, cfg.vocab_size,
                                  size=(b, args.prompt_len)).astype(np.int32)
            model.generate_tokens(prompt, max_new_tokens=args.new_tokens)  # compile
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = model.generate_tokens(prompt, max_new_tokens=args.new_tokens)
                samples.append(time.perf_counter() - t0)
            p50 = sorted(samples)[1]
            generated = b * (out.shape[1] - args.prompt_len)
            report[f"{name}_b{b}"] = {
                "p50_s": round(p50, 3),
                "tokens_per_s": round(generated / p50, 1),
            }
    # --- speculative decoding (B=1 greedy) ------------------------------
    if args.draft_k:
        # class attribute: _generate_spec reads DRAFT_K at first trace,
        # so this applies to every model constructed/used below
        Qwen2Model.DRAFT_K = args.draft_k
        report["draft_k"] = args.draft_k
    # Two bounds: a surgically-made copy model (residual = token embedding,
    # so greedy output repeats and every prompt-lookup draft is accepted —
    # the upper bound) and the random model (drafts rarely match — shows
    # the no-regression floor).
    import jax.numpy as jnp

    def zero_copy_breakers(path, leaf):
        keys = [getattr(p, "key", "") for p in path]
        if "kernel" in keys and ("o_proj" in keys or "down_proj" in keys):
            return jnp.zeros_like(leaf)
        return leaf

    copy_model = Qwen2Model(cfg, seed=0)
    copy_model.params = jax.tree_util.tree_map_with_path(
        zero_copy_breakers, base.params
    )
    prompt1 = rng.integers(3, cfg.vocab_size,
                           size=(1, args.prompt_len)).astype(np.int32)
    for name, model in (("copy", copy_model), ("random", base)):
        model.generate_tokens(prompt1, max_new_tokens=args.new_tokens)
        model.generate_tokens_spec(prompt1, max_new_tokens=args.new_tokens)
        plain_t, spec_t, n_fwd = [], [], 0
        for _ in range(3):
            t0 = time.perf_counter()
            out = model.generate_tokens(prompt1, max_new_tokens=args.new_tokens)
            plain_t.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            out_s, n_fwd = model.generate_tokens_spec(
                prompt1, max_new_tokens=args.new_tokens)
            spec_t.append(time.perf_counter() - t0)
        # spec and plain are argmax-identical up to bf16 near-ties (logit
        # gaps below bf16 resolution break differently between the 1-wide
        # and K-wide attention paths; both picks satisfy the oracle), so
        # report the prefix agreement instead of asserting exactness
        agree = int(np.argmin(out[0] == out_s[0])) or out.shape[1]
        plain_p50, spec_p50 = sorted(plain_t)[1], sorted(spec_t)[1]
        n_new = out.shape[1] - args.prompt_len
        report[f"spec_{name}_b1"] = {
            "plain_p50_s": round(plain_p50, 3),
            "spec_p50_s": round(spec_p50, 3),
            "speedup": round(plain_p50 / spec_p50, 2),
            "decode_forwards": n_fwd,
            "tokens": int(n_new),
            "agree_prefix": agree,
            "spec_tokens_per_s": round(n_new / spec_p50, 1),
        }

    print(json.dumps(report))


if __name__ == "__main__":
    main()
