"""Dense embedder (bge-m3-compatible): encode texts → normalized vectors.

Replaces the reference's ``HuggingFaceEmbeddings`` on bge-m3
(``src/config/settings.py:233-249``: normalized, batched, dim discovered at
runtime). Dense embedding for bge-m3 is CLS pooling + L2 normalization.
Batches are padded to fixed length buckets so the jitted forward compiles a
small number of executables; encode runs data-parallel over a mesh when one
is supplied.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .encoder import EncoderConfig, TransformerEncoder, init_encoder_params, load_hf_weights
from .tokenizer import load_tokenizer

_LENGTH_BUCKETS = (32, 64, 128, 256, 512)


def _bucket_length(max_len: int, cap: int) -> int:
    for b in _LENGTH_BUCKETS:
        if b >= max_len:
            return min(b, cap)
    return cap


class DenseEmbedder:
    """Batched, jitted dense text embedder.

    Two modes:
    - **transformer** (a checkpoint is configured): the real bge-m3 path —
      encoder forward, CLS pooling, L2 norm.
    - **lexical** (weightless fallback): deterministic hashed
      bag-of-tokens projection — token ids hash into the embedding
      dimensions with sqrt-tf weighting and sign hashing, L2 normalized.
      Cosine then measures lexical overlap, so weightless deployments get
      *functional* dense retrieval instead of random-encoder noise (the
      MaxSim rerank stage sharpens it further).
    """

    def __init__(
        self,
        config: Optional[EncoderConfig] = None,
        weights_path: str = "",
        tokenizer_path: str = "",
        max_length: int = 512,
        batch_size: int = 64,
        seed: int = 0,
        mode: Optional[str] = None,  # "transformer" | "lexical" | None=auto
    ):
        self.config = config or EncoderConfig.bge_m3()
        self.max_length = max_length
        self.batch_size = batch_size
        self.model = TransformerEncoder(self.config)
        params = load_hf_weights(self.config, weights_path) if weights_path else None
        self.pretrained = params is not None
        # retained so sibling heads (SparseEncoder) can find checkpoint-
        # adjacent artifacts like sparse_linear.pt
        self.weights_path = weights_path
        self.mode = mode or ("transformer" if self.pretrained else "lexical")
        if params is None and self.mode == "transformer":
            params = init_encoder_params(self.config, seed)
        # lexical mode never touches the transformer: skip the full-size
        # random init (a bge-m3-geometry init costs minutes + ~2 GB on a
        # weightless CPU boot)
        self.params = params
        self.tokenizer = load_tokenizer(tokenizer_path, vocab_size=self.config.vocab_size)

        def _forward(params, input_ids, attention_mask):
            hidden = self.model.apply({"params": params}, input_ids, attention_mask)
            cls = hidden[:, 0, :]  # bge-m3 dense = CLS pooling
            norm = jnp.linalg.norm(cls, axis=-1, keepdims=True)
            return cls / jnp.maximum(norm, 1e-12)

        self._forward = jax.jit(_forward)

        def _lexical(input_ids, attention_mask):
            # hashed bag-of-tokens + token-bigrams: bucket = hash % dim,
            # sign-hashed, sqrt-tf weighted. Bigrams capture phrase identity
            # (CJK model names span several hash tokens).
            dim = self.config.hidden_size
            ids = input_ids.astype(jnp.uint32)
            mask = attention_mask.astype(jnp.float32)

            def bag(hashes, weights):
                bucket = (hashes % dim).astype(jnp.int32)
                sign = jnp.where((hashes // dim) % 2 == 0, 1.0, -1.0)
                onehot = jax.nn.one_hot(bucket, dim, dtype=jnp.float32)
                return jnp.einsum("bl,bld->bd", sign * weights, onehot)

            counts = bag(ids, mask)
            bi = ids[:, :-1] * jnp.uint32(1000003) + ids[:, 1:]
            bi_mask = mask[:, :-1] * mask[:, 1:]
            counts = counts + 0.7 * bag(bi, bi_mask)
            emb = jnp.sign(counts) * jnp.sqrt(jnp.abs(counts))  # sqrt-tf
            norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
            return emb / jnp.maximum(norm, 1e-12)

        self._lexical = jax.jit(_lexical)
        self._mesh = None
        self._batch_sharding = None

    @classmethod
    def from_params(cls, config: EncoderConfig, params, tokenizer_path: str = "",
                    max_length: int = 512, batch_size: int = 64) -> "DenseEmbedder":
        """Build an embedder around an existing param pytree (e.g. the
        output of ``ContrastiveTrainer.export_params`` — the train→serve
        hot-swap path)."""
        import jax

        embedder = cls(config=config, tokenizer_path=tokenizer_path,
                       max_length=max_length, batch_size=batch_size,
                       mode="transformer")
        embedder.params = jax.device_get(params)
        embedder.pretrained = True
        return embedder

    @classmethod
    def from_export(cls, directory: str, max_length: int = 48
                    ) -> "DenseEmbedder":
        """Rebuild an embedder from a ``scripts/train_encoder.py`` export
        directory (config.json + params.msgpack). ``weights_path`` points
        at the directory so a trained ``sparse_linear.safetensors`` next to
        it upgrades the lexical arm (``models/sparse.SparseEncoder``)."""
        import json as _json
        from pathlib import Path as _Path

        import flax.serialization

        from .encoder import EncoderConfig, init_encoder_params

        out = _Path(directory)
        cfg = EncoderConfig(**_json.loads((out / "config.json").read_text()))
        template = init_encoder_params(cfg, 0)
        params = flax.serialization.from_bytes(
            template, (out / "params.msgpack").read_bytes())
        embedder = cls.from_params(cfg, params, max_length=max_length)
        embedder.weights_path = str(out)
        return embedder

    @property
    def dim(self) -> int:
        return self.config.hidden_size

    def data_parallel(self, mesh, axis: str = "shard") -> "DenseEmbedder":
        """Run encode batches data-parallel over ``mesh``: params replicated,
        batch rows split over ``axis`` — GSPMD splits the forward, so one
        ingestion batch uses every chip's MXU. Batches whose row count
        doesn't divide the axis stay single-placement (queries are B=1)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self.params is not None:
            self.params = jax.device_put(self.params, NamedSharding(mesh, P()))
        self._mesh = mesh
        self._batch_sharding = NamedSharding(mesh, P(axis, None))
        self._dp_rows = mesh.shape[axis]
        return self

    def _place(self, ids: np.ndarray, mask: np.ndarray):
        """Shard the batch rows over the dp mesh axis. Rows pad up to a
        multiple of the axis size (the pad is sliced off by the caller via
        the returned count) — without the pad, every ragged tail batch
        silently fell back to single-placement and ingest lost the mesh."""
        pad = 0
        if self._batch_sharding is not None and ids.shape[0] > 1:
            pad = -ids.shape[0] % self._dp_rows
            if pad:
                ids = np.concatenate([ids, np.repeat(ids[-1:], pad, 0)])
                mask = np.concatenate([mask, np.repeat(mask[-1:], pad, 0)])
        ids_j, mask_j = jnp.asarray(ids), jnp.asarray(mask)
        if self._batch_sharding is not None and ids.shape[0] % self._dp_rows == 0:
            ids_j = jax.device_put(ids_j, self._batch_sharding)
            mask_j = jax.device_put(mask_j, self._batch_sharding)
        return ids_j, mask_j, pad

    def embed_batch(self, texts: Sequence[str]) -> np.ndarray:
        """Embed up to batch_size texts (single forward)."""
        ids, mask = self.tokenizer.encode_batch(texts, self.max_length)
        real_len = int(mask.sum(axis=1).max()) if len(texts) else 1
        length = _bucket_length(real_len, self.max_length)
        ids_j, mask_j, pad = self._place(ids[:, :length], mask[:, :length])
        if self.mode == "lexical":
            out = self._lexical(ids_j, mask_j)
        else:
            out = self._forward(self.params, ids_j, mask_j)
        out = np.asarray(out, np.float32)
        return out[: len(texts)] if pad else out

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        """Embed any number of texts, batching internally."""
        if not texts:
            return np.zeros((0, self.dim), np.float32)
        chunks = []
        for i in range(0, len(texts), self.batch_size):
            batch = list(texts[i : i + self.batch_size])
            # pad ragged tail to batch_size to reuse the compiled executable
            pad = 0
            if len(batch) < self.batch_size and len(texts) > self.batch_size:
                pad = self.batch_size - len(batch)
                batch = batch + [""] * pad
            vecs = self.embed_batch(batch)
            chunks.append(vecs[: len(batch) - pad] if pad else vecs)
        return np.concatenate(chunks, axis=0)

    def embed_query(self, text: str) -> np.ndarray:
        return self.embed_texts([text])[0]

    # reference-shaped aliases (langchain Embeddings protocol used by the
    # reference's vector store wiring)
    def embed_documents(self, texts: Sequence[str]):
        return self.embed_texts(texts).tolist()
