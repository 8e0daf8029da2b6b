#!/usr/bin/env python3
"""Verify model assets and runtime readiness.

Parity target: reference ``scripts/check_models.py`` (verify model dirs).
Checks: configured checkpoint dirs, tokenizer availability, JAX devices, a
tiny encoder forward, and the MaxSim kernel path.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import argparse
    import os

    parser = argparse.ArgumentParser()
    parser.add_argument("--tpu", action="store_true", help="run on the TPU backend")
    args = parser.parse_args()
    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            import jax

            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    from automative_rag_tpu.config.settings import settings

    print("== configured model paths ==")
    for name, path in (
        ("embedding", settings.embedding_model_path),
        ("colbert", settings.colbert_model_path),
        ("llm", settings.llm_model_path),
        ("whisper", settings.whisper_model_path),
    ):
        if not path:
            print(f"  {name:10s}: (unset — random-init/stub fallback)")
            continue
        exists = Path(path).exists()
        has_weights = bool(list(Path(path).glob("*.safetensors"))) if exists else False
        note = ""
        if name == "llm" and exists:
            from automative_rag_tpu.models.qwen2 import Qwen2Config

            cfg = Qwen2Config.from_hf(path)
            note = (
                "  → jax-qwen2 backend (TPU-native)" if cfg and has_weights
                else "  → torch fallback (non-qwen2 or no safetensors)"
            )
        print(f"  {name:10s}: {path} exists={exists} safetensors={has_weights}{note}")

    import jax

    print("\n== devices ==")
    for d in jax.devices():
        print(f"  {d.platform}:{d.id} {getattr(d, 'device_kind', '?')}")

    print("\n== tiny encoder forward ==")
    from automative_rag_tpu.models import DenseEmbedder, EncoderConfig

    t0 = time.time()
    embedder = DenseEmbedder(config=EncoderConfig.tiny(), max_length=32)
    vec = embedder.embed_query("宝马X5 2023")
    print(f"  ok: dim={vec.shape[0]} pretrained={embedder.pretrained} ({time.time()-t0:.1f}s)")

    print("\n== maxsim path ==")
    import numpy as np
    import jax.numpy as jnp
    from automative_rag_tpu.ops.maxsim import maxsim_scores

    rng = np.random.default_rng(0)
    scores = maxsim_scores(
        jnp.asarray(rng.normal(size=(1, 8, 32)), jnp.float32),
        jnp.ones((1, 8), bool),
        jnp.asarray(rng.normal(size=(4, 16, 32)), jnp.float32),
        jnp.ones((4, 16), bool),
    )
    backend = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    print(f"  ok: scores shape={tuple(scores.shape)} backend={backend}")
    print("\nall checks passed")


if __name__ == "__main__":
    main()
