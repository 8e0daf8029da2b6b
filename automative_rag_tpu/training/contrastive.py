"""Contrastive (InfoNCE) fine-tuning of the dense embedder, sharded over a
dp×tp mesh.

The reference is inference-only (SURVEY.md §5: "no model checkpointing");
this framework adds domain fine-tuning of the bge-m3-compatible encoder as a
first-class capability: in-batch-negative InfoNCE (the training recipe of
the bge family), with

- **dp** — batch sharded over the ``dp`` mesh axis (gradients psum'd by XLA),
- **tp** — attention/MLP weight matrices sharded over ``tp`` (megatron-style
  column/row split; XLA inserts the all-reduces),

expressed purely through ``NamedSharding`` annotations on params and batch —
no manual collectives.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.encoder import EncoderConfig, TransformerEncoder


def param_partition_spec(path: Tuple, leaf) -> P:
    """Megatron-style tensor-parallel layout for the encoder:

    - qkv / intermediate kernels: column-split  → P(None, 'tp')
    - attention-out / mlp-out kernels: row-split → P('tp', None)
    - embeddings: vocab-split over tp (gather stays local per shard slice)
    - biases of column-split layers: P('tp'); everything else replicated
    """
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    joined = "/".join(names)
    if joined.endswith("kernel"):
        if any(p in joined for p in ("query", "key", "value", "intermediate")):
            return P(None, "tp")
        if "attention/output" in joined or "mlp_output" in joined:
            return P("tp", None)
        return P()
    if joined.endswith("bias"):
        if any(p in joined for p in ("query", "key", "value", "intermediate")):
            return P("tp")
        return P()
    if joined.endswith("embedding"):
        # word embeddings are large: shard rows (vocab) over tp
        if "word_embeddings" in joined:
            return P("tp", None)
        return P()
    return P()


def shard_params(params: Dict, mesh: Mesh) -> Dict:
    def _place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, param_partition_spec(path, leaf)))

    return jax.tree_util.tree_map_with_path(_place, params)


def make_contrastive_train_step(
    config: EncoderConfig,
    mesh: Mesh,
    learning_rate: float = 1e-5,
    temperature: float = 0.05,
):
    """Build (init_fn, train_step). The step is jitted with explicit input
    shardings: params per ``param_partition_spec``, batch over ``dp``."""
    model = TransformerEncoder(config)
    tx = optax.adamw(learning_rate)

    def _embed(params, ids, mask):
        hidden = model.apply({"params": params}, ids, mask)
        cls = hidden[:, 0, :]
        return cls / jnp.maximum(jnp.linalg.norm(cls, axis=-1, keepdims=True), 1e-12)

    def loss_fn(params, batch):
        q = _embed(params, batch["query_ids"], batch["query_mask"])
        d = _embed(params, batch["doc_ids"], batch["doc_mask"])
        logits = (q @ d.T) / temperature  # [B, B] in-batch negatives
        labels = jnp.arange(logits.shape[0])
        loss_qd = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        loss_dq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
        loss = 0.5 * (loss_qd + loss_dq)
        accuracy = (logits.argmax(axis=1) == labels).mean()
        return loss, accuracy

    def train_step(params, opt_state, batch):
        (loss, accuracy), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "accuracy": accuracy}

    batch_spec = {
        "query_ids": P("dp", None),
        "query_mask": P("dp", None),
        "doc_ids": P("dp", None),
        "doc_mask": P("dp", None),
    }
    batch_shardings = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        batch_spec,
        is_leaf=lambda x: isinstance(x, P),
    )

    def init_fn(seed: int = 0):
        from ..models.encoder import init_encoder_params

        params = shard_params(init_encoder_params(config, seed), mesh)
        # optimizer state mirrors params, inheriting their shardings
        opt_state = tx.init(params)
        return params, opt_state

    def make_jitted(params):
        shardings = jax.tree.map(lambda x: x.sharding, params)
        return jax.jit(
            train_step,
            in_shardings=(shardings, None, batch_shardings),
            donate_argnums=(0, 1),
        )

    return init_fn, train_step, make_jitted
