"""Constructed copying workload for speculative-decoding benches.

Surgically rewires a random-init Qwen2 model so greedy decoding provably
walks a fixed token cycle (same construction as bench_llm7b --spec):
o/down projections zeroed → the residual stream is exactly the last
token's embedding; the cycle tokens get strong ~orthogonal embeddings;
lm_head column σ(i) = embed row i, so argmax(logits | token_i) =
token_{i+1} with margins far above bf16 rounding. Prompts that repeat the
cycle make prompt-lookup drafts perfect — the workload measures the
all-accept ceiling THROUGH the real acceptance path (not a bypass).
"""

from __future__ import annotations

import numpy as np


def make_copy_model(model, period: int = 16, base: int = 100, seed: int = 0):
    """Rewire ``model`` (in place) into a cycle-copying model.

    Returns the alphabet (cycle token ids) for prompt construction."""
    import flax
    import jax.numpy as jnp

    from automative_rag_tpu.models.qwen2 import quantize_kernel

    rng = np.random.default_rng(seed)
    cfg = model.config
    alphabet = [base + i for i in range(period)]
    d_model = cfg.d_model
    U = rng.standard_normal((period, d_model)).astype(np.float32)
    U /= np.linalg.norm(U, axis=1, keepdims=True)
    U *= np.sqrt(d_model)
    flat = flax.traverse_util.flatten_dict(model.params)
    for k in list(flat):
        ks = "/".join(str(p) for p in k)
        if ("o_proj" in ks or "down_proj" in ks) and k[-1] in (
                "kernel", "kernel_q"):
            flat[k] = jnp.zeros_like(flat[k])
    emb_key = ("embed_tokens", "embedding")
    emb = np.array(flat[emb_key], np.float32)
    for i, tok in enumerate(alphabet):
        emb[tok] = U[i]
    flat[emb_key] = jnp.asarray(emb, model.params["embed_tokens"]["embedding"].dtype)
    W = rng.standard_normal((d_model, cfg.vocab_size)).astype(np.float32) * 0.001
    for i, tok in enumerate(alphabet):
        W[:, alphabet[(i + 1) % period]] = U[i]
    if ("lm_head", "kernel_q") in flat:
        wq, wscale = quantize_kernel(W, bits=cfg.weight_bits)
        flat[("lm_head", "kernel_q")] = jnp.asarray(wq)
        flat[("lm_head", "scale")] = jnp.asarray(wscale)
    elif ("lm_head", "kernel") in flat:
        flat[("lm_head", "kernel")] = jnp.asarray(
            W, flat[("lm_head", "kernel")].dtype)
    else:
        # tied embeddings (tiny test config): logits_j = e_i . e_j, so a
        # cycle is unreachable — fall back to the period-1 workload: the
        # strengthened token dominates its own logit and greedy repeats
        # it forever (still all-accept for prompt-lookup drafts)
        alphabet = [base]
        emb2 = np.array(flat[emb_key], np.float32)
        emb2[base] = U[0]
        flat[emb_key] = jnp.asarray(
            emb2, model.params["embed_tokens"]["embedding"].dtype)
    model.params = flax.traverse_util.unflatten_dict(flat)
    return alphabet


def cycle_prompt(alphabet, length: int) -> np.ndarray:
    period = len(alphabet)
    return np.array([alphabet[i % period] for i in range(length)], np.int32)
