"""Contrastive fine-tuning driver: data batching, fit loop, checkpointing.

Completes the training capability around ``contrastive.py``: feeds
(query, positive-doc) text pairs through the tokenizer into fixed-shape
device batches, runs the dp×tp-sharded InfoNCE step, and checkpoints
params/opt-state/step with Orbax (the reference has no training at all —
SURVEY.md §5 "no model checkpointing").
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.encoder import EncoderConfig
from ..models.tokenizer import load_tokenizer
from ..parallel.mesh import make_mesh_2d
from .contrastive import make_contrastive_train_step


class ContrastiveTrainer:
    def __init__(
        self,
        config: EncoderConfig,
        mesh=None,
        learning_rate: float = 1e-5,
        max_length: int = 64,
        tokenizer_path: str = "",
        checkpoint_dir: Optional[str] = None,
        sparse_head: bool = False,
        sparse_loss_weight: float = 0.5,
        flops_lambda: float = 1e-3,
    ):
        self.config = config
        self.mesh = mesh or make_mesh_2d(
            1, 1, axis_names=("dp", "tp"), devices=jax.devices()[:1]
        )
        self.max_length = max_length
        self.tokenizer = load_tokenizer(tokenizer_path, vocab_size=config.vocab_size)
        self.checkpoint_dir = checkpoint_dir
        self.sparse_head = sparse_head

        init_fn, _, make_jitted = make_contrastive_train_step(
            config, self.mesh, learning_rate=learning_rate,
            sparse_head=sparse_head, sparse_loss_weight=sparse_loss_weight,
            flops_lambda=flops_lambda,
        )
        self.params, self.opt_state = init_fn(seed=0)
        self._step_fn = make_jitted(self.params)
        self.step = 0
        self.history: List[Dict[str, float]] = []

    # ------------------------------------------------------------ batching
    def _encode(self, texts: Sequence[str]):
        ids, mask = self.tokenizer.encode_batch(texts, self.max_length)
        return jnp.asarray(ids), jnp.asarray(mask)

    def make_batch(self, pairs: Sequence[Tuple[str, str]]):
        queries, docs = zip(*pairs)
        q_ids, q_mask = self._encode(queries)
        d_ids, d_mask = self._encode(docs)
        return {
            "query_ids": q_ids,
            "query_mask": q_mask,
            "doc_ids": d_ids,
            "doc_mask": d_mask,
        }

    # ----------------------------------------------------------------- fit
    def fit(
        self,
        pairs: Iterable[Tuple[str, str]],
        batch_size: int = 8,
        epochs: int = 1,
        log_every: int = 10,
    ) -> List[Dict[str, float]]:
        pairs = list(pairs)
        if len(pairs) < batch_size:
            raise ValueError(f"need ≥ batch_size={batch_size} pairs, got {len(pairs)}")
        rng = np.random.default_rng(0)
        for _epoch in range(epochs):
            order = rng.permutation(len(pairs))
            for start in range(0, len(pairs) - batch_size + 1, batch_size):
                batch = self.make_batch([pairs[i] for i in order[start : start + batch_size]])
                t0 = time.perf_counter()
                self.params, self.opt_state, metrics = self._step_fn(
                    self.params, self.opt_state, batch
                )
                self.step += 1
                record = {
                    "step": self.step,
                    "loss": float(metrics["loss"]),
                    "accuracy": float(metrics["accuracy"]),
                    "step_s": round(time.perf_counter() - t0, 4),
                }
                for key in ("sparse_loss", "sparse_accuracy"):
                    if key in metrics:
                        record[key] = float(metrics[key])
                self.history.append(record)
                if log_every and self.step % log_every == 0:
                    print(f"[train] step {self.step} loss {record['loss']:.4f} "
                          f"acc {record['accuracy']:.3f}")
        return self.history

    # ---------------------------------------------------------- checkpoint
    def save_checkpoint(self, directory: Optional[str] = None) -> str:
        directory = directory or self.checkpoint_dir
        if not directory:
            raise ValueError("no checkpoint directory configured")
        import orbax.checkpoint as ocp

        path = Path(directory).resolve() / f"step_{self.step}"
        checkpointer = ocp.PyTreeCheckpointer()
        checkpointer.save(
            str(path),
            {"params": self.params, "opt_state": self.opt_state, "step": self.step},
            force=True,
        )
        return str(path)

    def restore_checkpoint(self, path: str) -> int:
        import orbax.checkpoint as ocp

        checkpointer = ocp.PyTreeCheckpointer()
        # restore against the live structure so optax NamedTuple states keep
        # their types (a bare restore returns plain dicts)
        template = {"params": self.params, "opt_state": self.opt_state, "step": 0}
        restored = checkpointer.restore(str(Path(path).resolve()), item=template)
        from .contrastive import shard_params

        self.params = shard_params(restored["params"], self.mesh)
        self.opt_state = jax.tree.map(
            lambda live, new: jax.device_put(new, live.sharding)
            if hasattr(live, "sharding") else new,
            self.opt_state,
            restored["opt_state"],
        )
        self.step = int(restored["step"])
        _, _, make_jitted = make_contrastive_train_step(self.config, self.mesh)
        self._step_fn = make_jitted(self.params)
        return self.step

    def export_params(self):
        """Encoder params pytree (sparse head excluded), e.g. to hot-swap
        into a DenseEmbedder."""
        host = jax.device_get(self.params)
        return {k: v for k, v in host.items() if k != "sparse_head"}

    def export_sparse_head(self):
        """Trained sparse head → (w [hidden], b) numpy, or None. Write as
        ``sparse_linear.safetensors`` next to the encoder export and
        ``models/sparse.SparseEncoder`` auto-loads it (transformer mode)."""
        if not self.sparse_head:
            return None
        head = jax.device_get(self.params)["sparse_head"]
        return np.asarray(head["w"], np.float32), float(head["b"])
