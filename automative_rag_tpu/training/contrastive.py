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
    sparse_head: bool = False,
    sparse_loss_weight: float = 0.5,
    sparse_temperature: float = 1.0,
    flops_lambda: float = 1e-3,
):
    """Build (init_fn, train_step). The step is jitted with explicit input
    shardings: params per ``param_partition_spec``, batch over ``dp``.

    ``sparse_head=True`` trains bge-m3's sparse head jointly (SPLADE-style):
    a linear hidden→1 produces per-token relu weights, query/doc term
    vectors scatter into vocab space, and an InfoNCE over their dot products
    plus a FLOPS regularizer (λ·Σ_v mean_i(w_{iv})² — keeps the expansion
    sparse) adds to the dense loss. One encoder forward feeds both heads.
    The trained (w, b) export in the ``sparse_linear.safetensors`` layout
    that ``models/sparse.SparseEncoder`` auto-loads."""
    model = TransformerEncoder(config)
    tx = optax.adamw(learning_rate)
    special_ids = (0, 1, 2)  # PAD/CLS/SEP (models/tokenizer.py)

    def _forward(params, ids, mask):
        enc_params = {k: v for k, v in params.items() if k != "sparse_head"}
        hidden = model.apply({"params": enc_params}, ids, mask)
        cls = hidden[:, 0, :]
        cls = cls / jnp.maximum(
            jnp.linalg.norm(cls, axis=-1, keepdims=True), 1e-12)
        return hidden, cls

    def _vocab_vec(params, hidden, ids, mask):
        head = params["sparse_head"]
        w = jax.nn.relu(
            hidden @ head["w"].astype(hidden.dtype) + head["b"])
        keep = mask.astype(bool)
        for sid in special_ids:
            keep &= ids != sid
        w = (w * keep).astype(jnp.float32)
        b, t = ids.shape
        rows = jnp.broadcast_to(jnp.arange(b)[:, None], (b, t))
        # sum aggregation over repeated ids (bge-m3 aggregates max at
        # inference; sum keeps the training objective smooth)
        return jnp.zeros((b, config.vocab_size), jnp.float32).at[
            rows, ids].add(w)

    def _info_nce(logits):
        labels = jnp.arange(logits.shape[0])
        l_qd = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()
        l_dq = optax.softmax_cross_entropy_with_integer_labels(
            logits.T, labels).mean()
        accuracy = (logits.argmax(axis=1) == labels).mean()
        return 0.5 * (l_qd + l_dq), accuracy

    def loss_fn(params, batch):
        hid_q, q = _forward(params, batch["query_ids"], batch["query_mask"])
        hid_d, d = _forward(params, batch["doc_ids"], batch["doc_mask"])
        loss, accuracy = _info_nce((q @ d.T) / temperature)
        metrics = {"accuracy": accuracy}
        if sparse_head:
            vq = _vocab_vec(params, hid_q, batch["query_ids"],
                            batch["query_mask"])
            vd = _vocab_vec(params, hid_d, batch["doc_ids"],
                            batch["doc_mask"])
            s_loss, s_acc = _info_nce((vq @ vd.T) / sparse_temperature)
            flops = (vq.mean(0) ** 2).sum() + (vd.mean(0) ** 2).sum()
            loss = loss + sparse_loss_weight * s_loss + flops_lambda * flops
            metrics.update({"sparse_loss": s_loss, "sparse_accuracy": s_acc})
        return loss, metrics

    def train_step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, **metrics}

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

        raw = init_encoder_params(config, seed)
        if sparse_head:
            key = jax.random.PRNGKey(seed + 1)
            raw["sparse_head"] = {
                # small random init: relu'(0)=0, a zero init never trains
                "w": 0.02 * jax.random.normal(
                    key, (config.hidden_size,), jnp.float32),
                "b": jnp.zeros((), jnp.float32),
            }
        params = shard_params(raw, mesh)
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
