"""Pipeline-parallel Qwen2 forward over the mesh.

Completes the model-parallel suite next to the megatron-style tensor
parallelism of ``tp_llm.py``: the decoder's layer stack splits into
contiguous stages over a ``pp`` mesh axis, and batch rows flow through the
stages as microbatches with activations handed stage-to-stage by
``lax.ppermute`` (ICI neighbor transfers — O(mb·T·D) bytes per tick, never
weights). The classic circular-schedule bubble costs (S−1)/(M+S−1) of the
ticks; more microbatches amortize it.

This is the scaling axis for models whose *weights* outgrow one chip even
quantized (the reference's only answer at that point is "buy a bigger GPU" —
it pins the whole 7B on one T4 with 4-bit, ``src/config/settings.py:195-214``
per SURVEY §2.3). pp shards layers, so HBM per chip falls ~linearly in
stages while ICI carries only the layer-boundary activations.

Scope: the batched full-sequence forward (prefill / scoring / training
shapes — where pipelining actually pays, because stages stay MXU-busy on
[mb, T] blocks). Autoregressive decode wants tensor parallelism instead
(``tp_llm.py``): a 1-token tick leaves a pipeline mostly idle.

Per-layer parameter trees stack into leading-axis arrays sharded
``P('pp')`` — each stage holds exactly its layers' weights, and applies
them with a ``lax.scan`` over its local slice.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.qwen2 import Qwen2Model, _Block


def stack_layer_params(params: dict, num_layers: int):
    """[num_layers] per-layer trees → one tree of leading-axis-stacked
    leaves (the layout both ``lax.scan`` and the ``pp`` sharding want)."""
    layers = [params[f"layer_{i}"] for i in range(num_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def make_pp_forward(model: Qwen2Model, mesh: Mesh, axis: str = "pp",
                    n_micro: Optional[int] = None,
                    tp_axis: Optional[str] = None):
    """Build a jitted pipelined forward: tokens [B, T] → logits [B, T, V].

    Token-identical to ``Qwen2Decoder.__call__`` (same per-layer op order;
    the stages just run them on different chips). Requires
    ``num_layers % n_stages == 0`` and ``B % n_micro == 0``;
    ``n_micro`` defaults to the stage count (the minimum that keeps every
    stage busy in steady state).

    ``tp_axis`` composes pipeline × tensor parallelism on a 2-D mesh: the
    pipeline stays MANUAL (``shard_map`` over ``axis`` only — the ticks and
    ``ppermute`` need explicit control), while each stage's layer math runs
    with megatron shardings (``tp_llm.qwen2_partition_specs``) under
    automatic GSPMD on ``tp_axis`` — XLA inserts the per-stage all-reduces.
    The stacked leaves carry ``P('pp', *tp_spec)``.
    """
    cfg = model.config
    n_stages = int(mesh.shape[axis])
    if cfg.num_layers % n_stages:
        raise ValueError(
            f"pp={n_stages} must divide num_layers={cfg.num_layers}")
    n_micro = int(n_micro or n_stages)

    replicated = NamedSharding(mesh, P())
    raw_stacked = stack_layer_params(model.params, cfg.num_layers)
    if tp_axis is None:
        stacked = jax.device_put(raw_stacked, NamedSharding(mesh, P(axis)))
    else:
        from .tp_llm import qwen2_partition_specs

        layer_tpl = qwen2_partition_specs(cfg)["layer_0"]

        def _place(spec_tree, tree):
            out = {}
            for key, value in tree.items():
                spec = spec_tree[key]
                if isinstance(value, dict):
                    out[key] = _place(spec, value)
                else:
                    resolved = P(axis, *(
                        tp_axis if p == "tp" else p for p in spec))
                    out[key] = jax.device_put(
                        value, NamedSharding(mesh, resolved))
            return out

        stacked = _place(layer_tpl, raw_stacked)
    rest = jax.device_put(
        {k: v for k, v in model.params.items() if not k.startswith("layer_")},
        replicated)
    block = _Block(cfg)

    def _local(stacked_local, embed_tab, tokens):
        stage = jax.lax.axis_index(axis)
        b, t = tokens.shape
        if b % n_micro:
            raise ValueError(
                f"batch {b} must divide into n_micro={n_micro} microbatches")
        mb = b // n_micro
        micro_tokens = tokens.reshape(n_micro, mb, t)
        positions = jnp.arange(t)

        def apply_stage(x):
            def body(carry, layer_params):
                return block.apply({"params": layer_params}, carry,
                                   positions), None
            out, _ = jax.lax.scan(body, x, stacked_local)
            return out

        state = jnp.zeros((mb, t, cfg.d_model), cfg.dtype)
        collected = jnp.zeros((n_micro, mb, t, cfg.d_model), cfg.dtype)

        def tick(i, carry):
            state, collected = carry
            # stage 0 injects microbatch i (clamped: late ticks drain the
            # pipe and inject garbage that no stage ever collects)
            tok_mb = jax.lax.dynamic_index_in_dim(
                micro_tokens, jnp.clip(i, 0, n_micro - 1), 0, keepdims=False)
            injected = embed_tab.astype(cfg.dtype)[tok_mb]
            x = jnp.where(stage == 0, injected, state)
            x = apply_stage(x)
            # the last stage finished microbatch i-(S-1) this tick
            j = i - (n_stages - 1)
            safe_j = jnp.clip(j, 0, n_micro - 1)
            keep = jax.lax.dynamic_index_in_dim(
                collected, safe_j, 0, keepdims=False)
            done = jnp.where((stage == n_stages - 1) & (j >= 0), x, keep)
            collected = jax.lax.dynamic_update_index_in_dim(
                collected, done, safe_j, 0)
            state = jax.lax.ppermute(
                x, axis, [(s, (s + 1) % n_stages) for s in range(n_stages)])
            return state, collected

        _, collected = jax.lax.fori_loop(
            0, n_micro + n_stages - 1, tick, (state, collected))
        # replicate the last stage's buffer (every other stage's is zeros)
        is_last = (stage == n_stages - 1).astype(collected.dtype)
        collected = jax.lax.psum(collected * is_last, axis)
        return collected.reshape(b, t, cfg.d_model)

    pipelined = shard_map(
        _local,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(axis), stacked),  # layer stacks staged
            P(),  # embedding table replicated
            P(),  # tokens replicated
        ),
        out_specs=P(),
        # with tp_axis, only the pipeline axis is manual — GSPMD handles
        # the tensor-parallel collectives inside each stage automatically
        axis_names=frozenset({axis}) if tp_axis is not None else frozenset(
            mesh.axis_names),
        check_vma=False,
    )

    @jax.jit
    def forward(tokens):
        hidden = pipelined(stacked, rest["embed_tokens"]["embedding"], tokens)
        # final norm + vocab projection on replicated params (tiny vs the
        # layer stack; not worth a pipeline stage)
        return model.decoder.apply(
            {"params": {**rest}}, hidden, method="logits_at")

    return forward
