"""Tensor-parallel Qwen2 inference over the mesh.

The reference squeezes its 7B answer model onto one T4 with 4-bit
quantization (``src/config/settings.py:195-214``); on a TPU pod slice the
TPU-native move is megatron-style tensor parallelism: q/k/v/gate/up kernels
column-split over the ``tp`` axis, o/down row-split, norms/embeddings
replicated. Placement is declarative — params are ``device_put`` with
``NamedSharding`` and XLA GSPMD inserts the all-reduces inside the existing
jitted generate loop (including through ``lax.while_loop`` and the KV caches,
which inherit the head-dim sharding from the k/v projections). No generation
code changes: ``shard_qwen2_model`` re-places ``model.params`` in place.

Constraint: ``tp`` must divide ``num_kv_heads`` (DeepSeek-R1-Distill-Qwen-7B
has 4 KV heads → tp ∈ {2, 4}; pair with dp for the remaining chips).
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.qwen2 import Qwen2Config, Qwen2Model

# leaf-name → spec, per module kind
_COLUMN = P(None, "tp")  # kernel [in, out]: split output features
_ROW = P("tp", None)  # kernel [in, out]: split input features (psum after)


def qwen2_partition_specs(config: Qwen2Config) -> Dict:
    """Params-tree of PartitionSpec mirroring Qwen2Decoder's structure.

    With int8 weight-only quantization (``weight_bits=8``) the kernel leaf is
    ``kernel_q`` and the per-output-channel ``scale`` follows the output
    split: sharded for column-parallel layers, replicated for row-parallel.
    """
    q8 = config.weight_bits in (4, 8)

    def linear(spec, out_sharded, with_bias=False):
        if q8:
            leaf = {"kernel_q": spec, "scale": P("tp") if out_sharded else P()}
        else:
            leaf = {"kernel": spec}
        if with_bias:
            leaf["bias"] = P("tp")
        return leaf

    layer = {
        "ln1": {"scale": P()},
        "ln2": {"scale": P()},
        "attn": {
            "q_proj": linear(_COLUMN, True, with_bias=True),
            "k_proj": linear(_COLUMN, True, with_bias=True),
            "v_proj": linear(_COLUMN, True, with_bias=True),
            "o_proj": linear(_ROW, False),
        },
        "gate_proj": linear(_COLUMN, True),
        "up_proj": linear(_COLUMN, True),
        "down_proj": linear(_ROW, False),
    }
    specs: Dict = {
        "embed_tokens": {"embedding": P()},  # replicated (activations stay small)
        "final_norm": {"scale": P()},
    }
    if not config.tie_embeddings:
        specs["lm_head"] = linear(_COLUMN, True)  # vocab-sharded logits
    for i in range(config.num_layers):
        specs[f"layer_{i}"] = layer
    return specs


def shard_qwen2_model(model: Qwen2Model, mesh: Mesh, axis: str = "tp",
                      dp_axis: str = "") -> Qwen2Model:
    """Re-place ``model.params`` with tensor-parallel shardings (in place).

    The jitted generate loop picks the placement up from its arguments, so
    every subsequent ``generate_tokens`` call runs tensor-parallel. Pass a
    2D mesh and ``dp_axis`` to additionally split batch rows data-parallel
    (dp×tp serving: each tp group serves a slice of the batch); batches whose
    row count doesn't divide dp keep single placement.
    """
    tp = mesh.shape[axis]
    cfg = model.config
    if cfg.num_kv_heads % tp != 0:
        raise ValueError(
            f"tp={tp} must divide num_kv_heads={cfg.num_kv_heads}"
        )
    specs = qwen2_partition_specs(cfg)

    def place(spec_tree, param_tree):
        out = {}
        for key, value in param_tree.items():
            spec = spec_tree[key]
            if isinstance(value, dict):
                out[key] = place(spec, value)
            else:
                # rename the generic axis to this mesh's tp axis name
                resolved = P(*(axis if p == "tp" else p for p in spec))
                out[key] = jax.device_put(value, NamedSharding(mesh, resolved))
        return out

    model.params = place(specs, model.params)
    if dp_axis:
        model._batch_sharding = NamedSharding(mesh, P(dp_axis, None))
        model._dp_rows = mesh.shape[dp_axis]
    return model
