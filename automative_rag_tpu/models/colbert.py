"""ColBERT-style token-level encoder for late-interaction reranking.

JAX replacement for the reference's torch encoder paths
(``src/core/query/llm/rerankers.py:133-213``): queries tokenize to a fixed 32
tokens, documents to 256, and the last hidden state provides token-level
embeddings. Returns embeddings plus *scoring masks*:

- query mask: content tokens only — [CLS]/[SEP]/[PAD] are excluded from the
  MaxSim sum (reference drops first/last tokens, rerankers.py:250-258);
- doc mask: real tokens only — unlike the reference, padded doc tokens are
  excluded from the max (see ops/maxsim.py docstring).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .encoder import EncoderConfig, TransformerEncoder, init_encoder_params, load_hf_weights
from .tokenizer import load_tokenizer


class ColBERTEncoder:
    def __init__(
        self,
        config: Optional[EncoderConfig] = None,
        weights_path: str = "",
        tokenizer_path: str = "",
        max_query_length: int = 32,
        max_doc_length: int = 256,
        batch_size: int = 128,
        seed: int = 1,
    ):
        self.config = config or EncoderConfig.bge_m3()
        self.max_query_length = max_query_length
        self.max_doc_length = max_doc_length
        self.batch_size = batch_size
        self.model = TransformerEncoder(self.config)
        params = load_hf_weights(self.config, weights_path) if weights_path else None
        self.pretrained = params is not None
        self.params = params if params is not None else init_encoder_params(self.config, seed)
        self.tokenizer = load_tokenizer(tokenizer_path, vocab_size=self.config.vocab_size)

        def _forward(params, input_ids, attention_mask):
            return self.model.apply({"params": params}, input_ids, attention_mask)

        self._forward = jax.jit(_forward)

        def _forward_q8(params, input_ids, attention_mask):
            """Forward + ON-DEVICE symmetric per-token int8 quantization
            (same formula as TokenStore's host path: absmax/127). The int8
            values + fp16 scales are what cross the device→host relay —
            HALF the fp16 hidden-state bytes, and that fetch dominates
            ColBERT ingest on the chip (BENCH_ENCODE_r02)."""
            hidden = self.model.apply({"params": params}, input_ids,
                                      attention_mask)
            h32 = hidden.astype(jnp.float32)
            scales = jnp.max(jnp.abs(h32), axis=2) / 127.0  # [B, Ld]
            safe = jnp.maximum(scales, 1e-8)[:, :, None]
            q = jnp.clip(jnp.round(h32 / safe), -127, 127).astype(jnp.int8)
            return q, scales.astype(jnp.float16)

        self._forward_q8 = jax.jit(_forward_q8)
        self._batch_sharding = None

    @property
    def dim(self) -> int:
        return self.config.hidden_size

    def data_parallel(self, mesh, axis: str = "shard") -> "ColBERTEncoder":
        """Split encode batches over the mesh (params replicated, rows over
        ``axis``) — same scheme as ``DenseEmbedder.data_parallel``."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.params = jax.device_put(self.params, NamedSharding(mesh, P()))
        self._batch_sharding = NamedSharding(mesh, P(axis, None))
        self._dp_rows = mesh.shape[axis]
        return self

    def _encode(self, texts: Sequence[str], max_length: int) -> Tuple[np.ndarray, np.ndarray]:
        ids, mask = self.tokenizer.encode_batch(texts, max_length)
        # length bucketing: forward at the smallest 32-multiple covering
        # the longest real sequence, host-pad back to max_length (zeros,
        # already mask-False). Short docs skip most of the padded-token
        # compute AND most of the [B, Ld, H] hidden-state fetch — which
        # dominates this path at a fixed Ld=256 (the fetch crosses the
        # device relay; fp16 halves it again, matching the token store's
        # storage dtype).
        real = int(np.asarray(mask).sum(axis=1).max()) if len(texts) else 0
        bucket = min(max_length, max(32, -(-real // 32) * 32))
        ids_b, mask_b = ids[:, :bucket], mask[:, :bucket]
        out = []
        for i in range(0, len(texts), self.batch_size):
            ids_i = ids_b[i : i + self.batch_size]
            mask_i = mask_b[i : i + self.batch_size]
            # pad rows to a dp-axis multiple so mesh sharding engages on
            # ragged tail batches too (pad rows sliced off below)
            pad = 0
            if self._batch_sharding is not None and ids_i.shape[0] > 1:
                pad = -ids_i.shape[0] % self._dp_rows
                if pad:
                    ids_i = np.concatenate([ids_i, np.repeat(ids_i[-1:], pad, 0)])
                    mask_i = np.concatenate([mask_i, np.repeat(mask_i[-1:], pad, 0)])
            ids_j, mask_j = jnp.asarray(ids_i), jnp.asarray(mask_i)
            if (self._batch_sharding is not None
                    and ids_j.shape[0] % self._dp_rows == 0):
                ids_j = jax.device_put(ids_j, self._batch_sharding)
                mask_j = jax.device_put(mask_j, self._batch_sharding)
            hidden = self._forward(self.params, ids_j, mask_j)
            fetched = np.asarray(hidden.astype(jnp.float16))
            out.append(fetched[: len(fetched) - pad] if pad else fetched)
        emb = np.concatenate(out, axis=0)
        if bucket < max_length:
            emb = np.pad(emb, ((0, 0), (0, max_length - bucket), (0, 0)))
        return emb, mask

    def encode_queries(self, queries: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """→ (embeddings [B, Lq, H], scoring mask [B, Lq]).

        The scoring mask keeps content tokens: attention minus the leading
        [CLS] and the final [SEP] of each sequence."""
        emb, mask = self._encode(queries, self.max_query_length)
        scoring = mask.astype(bool).copy()
        scoring[:, 0] = False  # [CLS]
        lengths = mask.sum(axis=1)
        for b, length in enumerate(lengths):
            if length > 1:
                scoring[b, length - 1] = False  # [SEP]
        return emb, scoring

    def encode_documents(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """→ (embeddings [N, Ld, H], real-token mask [N, Ld])."""
        emb, mask = self._encode(texts, self.max_doc_length)
        return emb, mask.astype(bool)

    def encode_documents_int8(
        self, texts: Sequence[str]
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """→ (int8 tokens [N, Ld, H], fp16 scales [N, Ld], mask [N, Ld]):
        quantization runs ON-DEVICE (``_forward_q8``) so the host fetch
        moves int8 bytes — half of fp16, and the fetch bounds ColBERT
        ingest throughput on the chip. Same symmetric per-token formula as
        ``TokenStore._append_locked``; feed straight into
        ``TokenStore.append_quantized``."""
        max_length = self.max_doc_length
        ids, mask = self.tokenizer.encode_batch(texts, max_length)
        real = int(np.asarray(mask).sum(axis=1).max()) if len(texts) else 0
        bucket = min(max_length, max(32, -(-real // 32) * 32))
        ids_b, mask_b = ids[:, :bucket], mask[:, :bucket]
        q_out, s_out = [], []
        for i in range(0, len(texts), self.batch_size):
            ids_i = ids_b[i : i + self.batch_size]
            mask_i = mask_b[i : i + self.batch_size]
            pad = 0
            if self._batch_sharding is not None and ids_i.shape[0] > 1:
                pad = -ids_i.shape[0] % self._dp_rows
                if pad:
                    ids_i = np.concatenate([ids_i, np.repeat(ids_i[-1:], pad, 0)])
                    mask_i = np.concatenate([mask_i, np.repeat(mask_i[-1:], pad, 0)])
            ids_j, mask_j = jnp.asarray(ids_i), jnp.asarray(mask_i)
            if (self._batch_sharding is not None
                    and ids_j.shape[0] % self._dp_rows == 0):
                ids_j = jax.device_put(ids_j, self._batch_sharding)
                mask_j = jax.device_put(mask_j, self._batch_sharding)
            q, s = self._forward_q8(self.params, ids_j, mask_j)
            q = np.asarray(q)
            s = np.asarray(s)
            if pad:
                q, s = q[: len(q) - pad], s[: len(s) - pad]
            q_out.append(q)
            s_out.append(s)
        quant = np.concatenate(q_out, axis=0)
        scales = np.concatenate(s_out, axis=0)
        if bucket < max_length:
            quant = np.pad(quant, ((0, 0), (0, max_length - bucket), (0, 0)))
            scales = np.pad(scales, ((0, 0), (0, max_length - bucket)))
        return quant, scales, mask.astype(bool)

    def encode_documents_device(
        self, texts: Sequence[str]
    ) -> Tuple[jnp.ndarray, jnp.ndarray, np.ndarray]:
        """→ (int8 tokens [N, Ld, H] ON DEVICE, fp16 scales [N, Ld] ON
        DEVICE, host mask [N, Ld]).

        Like ``encode_documents_int8`` but the quantized slab never crosses
        the device→host relay — feed straight into
        ``TokenStore.append_device``. The relay fetch (not the forward) is
        what bounds ColBERT ingest on-chip (~15-20 MB/s effective through
        the relay vs ~310 docs/s for the same forward with a pooled
        output), so keeping the slab resident makes ingest compute-bound."""
        max_length = self.max_doc_length
        ids, mask = self.tokenizer.encode_batch(texts, max_length)
        real = int(np.asarray(mask).sum(axis=1).max()) if len(texts) else 0
        bucket = min(max_length, max(32, -(-real // 32) * 32))
        ids_b, mask_b = ids[:, :bucket], mask[:, :bucket]
        q_out, s_out = [], []
        for i in range(0, len(texts), self.batch_size):
            ids_i = ids_b[i : i + self.batch_size]
            mask_i = mask_b[i : i + self.batch_size]
            pad = 0
            if self._batch_sharding is not None and ids_i.shape[0] > 1:
                pad = -ids_i.shape[0] % self._dp_rows
                if pad:
                    ids_i = np.concatenate([ids_i, np.repeat(ids_i[-1:], pad, 0)])
                    mask_i = np.concatenate([mask_i, np.repeat(mask_i[-1:], pad, 0)])
            ids_j, mask_j = jnp.asarray(ids_i), jnp.asarray(mask_i)
            if (self._batch_sharding is not None
                    and ids_j.shape[0] % self._dp_rows == 0):
                ids_j = jax.device_put(ids_j, self._batch_sharding)
                mask_j = jax.device_put(mask_j, self._batch_sharding)
            q, s = self._forward_q8(self.params, ids_j, mask_j)
            if pad:
                q, s = q[: q.shape[0] - pad], s[: s.shape[0] - pad]
            q_out.append(q)
            s_out.append(s)
        quant = q_out[0] if len(q_out) == 1 else jnp.concatenate(q_out, axis=0)
        scales = s_out[0] if len(s_out) == 1 else jnp.concatenate(s_out, axis=0)
        if bucket < max_length:
            quant = jnp.pad(
                quant, ((0, 0), (0, max_length - bucket), (0, 0)))
            scales = jnp.pad(scales, ((0, 0), (0, max_length - bucket)))
        return quant, scales, mask.astype(bool)

    def tokenize_for_display(self, text: str, max_length: int) -> list:
        """Token strings for match explanations (best-effort)."""
        tok = self.tokenizer
        if hasattr(tok, "tokenize"):
            return ["[CLS]"] + tok.tokenize(text)[: max_length - 2] + ["[SEP]"]
        return [text]
