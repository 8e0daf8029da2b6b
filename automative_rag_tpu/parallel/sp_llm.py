"""Sequence-parallel (Ulysses-style) Qwen2 forward over the mesh.

Completes the parallelism suite next to tensor (``tp_llm.py``) and pipeline
(``pp_llm.py``) parallelism: the SEQUENCE dimension shards over an ``sp``
mesh axis. Every linear/norm/MLP op is token-local, so each device runs them
on its ``T/S`` slice; only attention needs cross-token visibility, and that
is restored per layer with the Ulysses exchange —

- ``all_to_all`` the rope'd queries (split heads, gather sequence): each
  device attends over the FULL sequence for ``H/S`` of the heads,
- K/V ``all_gather`` over the sequence axis (the GQA-friendly variant:
  with ``num_kv_heads ≪ num_heads`` the gathered K/V are small, and it
  never constrains S by the KV head count),
- ``all_to_all`` the attention output back (split sequence, gather heads).

Per-device attention memory falls from ``T²·H`` to ``T²·H/S`` and the
activation footprint of every other op from ``T`` to ``T/S`` — the scaling
axis for prompts whose activations outgrow one chip. The reference's only
long-input answer is truncation (SURVEY §5 "long-context handling is
avoidance"); weights stay fully replicated here (that axis is tp/pp).

Scope: full-sequence forward (prefill / scoring / training shapes), bf16 or
f32 weights (``weight_bits=16``); decode wants tp instead. Numerics mirror
``models/qwen2.py`` op for op (f32 scores/softmax, rope layout, GQA
repeat), pinned by parity tests on the CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.qwen2 import Qwen2Model, _rope
from .pp_llm import stack_layer_params


def make_sp_forward(model: Qwen2Model, mesh: Mesh, axis: str = "sp"):
    """Build a jitted sequence-parallel forward: tokens [B, T] → logits
    [B, T, V]. Requires ``T % n_devices == 0`` and
    ``num_heads % n_devices == 0``; weights must be unquantized (the
    manual block math below reads ``kernel``/``bias`` leaves)."""
    cfg = model.config
    sp = int(mesh.shape[axis])
    if cfg.num_heads % sp:
        raise ValueError(f"sp={sp} must divide num_heads={cfg.num_heads}")
    if cfg.weight_bits in (4, 8):
        raise ValueError("sp forward supports unquantized kernels only")

    replicated = NamedSharding(mesh, P())
    stacked = jax.device_put(
        stack_layer_params(model.params, cfg.num_layers), replicated)
    rest = jax.device_put(
        {k: v for k, v in model.params.items() if not k.startswith("layer_")},
        replicated)

    hd = cfg.head_dim
    heads, kv_heads = cfg.num_heads, cfg.num_kv_heads
    groups = heads // kv_heads
    hs = heads // sp  # heads per device after the Ulysses exchange

    def dense(p, x):
        y = jnp.dot(x.astype(cfg.dtype), p["kernel"].astype(cfg.dtype))
        if "bias" in p:
            y = y + p["bias"].astype(cfg.dtype)
        return y

    def rmsnorm(p, x):
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(
            jnp.mean(jax.lax.square(xf), axis=-1, keepdims=True)
            + cfg.rms_eps)
        return y * p["scale"].astype(jnp.float32)

    def _local(stacked_rep, embed_tab, tokens_local):
        stage = jax.lax.axis_index(axis)
        b, t_loc = tokens_local.shape
        t_full = t_loc * sp
        positions = stage * t_loc + jnp.arange(t_loc)
        causal = jnp.tril(jnp.ones((t_full, t_full), bool))[None, None]
        x = embed_tab.astype(cfg.dtype)[tokens_local]

        def block(x, lp):
            h = rmsnorm(lp["ln1"], x).astype(cfg.dtype)
            ap = lp["attn"]
            q = dense(ap["q_proj"], h).reshape(b, t_loc, heads, hd)
            k = dense(ap["k_proj"], h).reshape(b, t_loc, kv_heads, hd)
            v = dense(ap["v_proj"], h).reshape(b, t_loc, kv_heads, hd)
            # rope uses GLOBAL positions — token identity is unchanged by
            # where the token's slice happens to live
            q = _rope(q, positions, cfg.rope_theta)
            k = _rope(k, positions, cfg.rope_theta)
            # Ulysses exchange: q → full sequence × H/S heads
            q = jax.lax.all_to_all(q, axis, 2, 1, tiled=True)
            k = jax.lax.all_gather(k, axis, axis=1, tiled=True)
            v = jax.lax.all_gather(v, axis, axis=1, tiled=True)
            k = jnp.repeat(k, groups, axis=2)
            v = jnp.repeat(v, groups, axis=2)
            # this device's head block after the exchange is chunk ``stage``
            k = jax.lax.dynamic_slice_in_dim(k, stage * hs, hs, axis=2)
            v = jax.lax.dynamic_slice_in_dim(v, stage * hs, hs, axis=2)
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk",
                q.astype(jnp.float32), k.astype(jnp.float32),
            ) / np.sqrt(hd)
            scores = jnp.where(causal, scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
            # back: full heads × local sequence
            out = jax.lax.all_to_all(out, axis, 1, 2, tiled=True)
            x = x + dense(ap["o_proj"], out.reshape(b, t_loc, heads * hd))
            h2 = rmsnorm(lp["ln2"], x).astype(cfg.dtype)
            mlp = dense(
                lp["down_proj"],
                jax.nn.silu(dense(lp["gate_proj"], h2))
                * dense(lp["up_proj"], h2),
            )
            return x + mlp, None

        x, _ = jax.lax.scan(block, x, stacked_rep)
        return jax.lax.all_gather(x, axis, axis=1, tiled=True)

    pipelined = shard_map(
        _local,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(), stacked),  # weights replicated
            P(),                                   # embedding table
            P(None, axis),                         # tokens sequence-sharded
        ),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def forward(tokens):
        b, t = tokens.shape
        if t % sp:
            raise ValueError(f"sequence {t} must divide over sp={sp}")
        hidden = pipelined(stacked, rest["embed_tokens"]["embedding"], tokens)
        return model.decoder.apply(
            {"params": {**rest}}, hidden, method="logits_at")

    return forward
