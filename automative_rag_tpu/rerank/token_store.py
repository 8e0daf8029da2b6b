"""Corpus token-embedding store for rerank-from-store.

The reference re-encodes every candidate document at query time
(``rerankers.py:167-213`` runs N BERT forwards per query — the dominant
rerank cost). Here ColBERT token embeddings are computed once at ingest and
stored row-aligned with the vector index; query-time rerank is

    gather candidate token slabs → fused MaxSim kernel

with no document forward passes at all. Storage is fp16 host-side (source of
truth, survives checkpoints) with an optional device-resident token-major
cache ([Ld, cap, D], the MaxSim fast-path layout) when the corpus fits the
configured HBM budget. PLAID-style centroid compression is the scaling
follow-up (PAPERS.md) — this store is exact.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


class TokenStore:
    def __init__(
        self,
        dim: int,
        max_doc_length: int,
        device_dtype: str = "bfloat16",
        device_budget_bytes: int = 4 * 1024**3,
        quantize: str = "none",  # "none" (fp16 host / bf16 device) | "int8"
    ):
        self.dim = dim
        self.max_doc_length = max_doc_length
        self.device_dtype = jnp.dtype(device_dtype)
        self.device_budget_bytes = device_budget_bytes
        self.quantize = quantize
        if quantize == "int8":
            # symmetric per-token int8 + fp16 scale: halves storage again,
            # doubling the rerank corpus that fits the HBM cache budget
            self._tokens = np.zeros((0, max_doc_length, dim), np.int8)
            self._scales = np.zeros((0, max_doc_length), np.float16)
        else:
            self._tokens = np.zeros((0, max_doc_length, dim), np.float16)
            self._scales = None
        self._masks = np.zeros((0, max_doc_length), bool)
        self._device: Optional[Tuple[jnp.ndarray, ...]] = None

    # ------------------------------------------------------------ mutation
    def append(self, token_embs: np.ndarray, masks: np.ndarray) -> None:
        """Append rows (row order must mirror the vector index)."""
        masks = np.asarray(masks, bool)
        token_embs = np.asarray(token_embs, np.float32)
        if token_embs.shape[1:] != (self.max_doc_length, self.dim):
            raise ValueError(
                f"expected [N, {self.max_doc_length}, {self.dim}], got {token_embs.shape}"
            )
        if self.quantize == "int8":
            scales = np.abs(token_embs).max(axis=2) / 127.0  # [N, Ld]
            safe = np.maximum(scales, 1e-8)[:, :, None]
            quantized = np.clip(np.round(token_embs / safe), -127, 127).astype(np.int8)
            self._tokens = np.concatenate([self._tokens, quantized])
            self._scales = np.concatenate([self._scales, scales.astype(np.float16)])
        else:
            self._tokens = np.concatenate([self._tokens, token_embs.astype(np.float16)])
        self._masks = np.concatenate([self._masks, masks])
        self._device = None

    @property
    def rows(self) -> int:
        return self._tokens.shape[0]

    @property
    def nbytes(self) -> int:
        return self._tokens.nbytes

    # -------------------------------------------------------------- reads
    @property
    def _element_bytes(self) -> int:
        return 1 if self.quantize == "int8" else self.device_dtype.itemsize

    def _device_cache(self) -> Optional[Tuple[jnp.ndarray, ...]]:
        wanted = self.rows * self.max_doc_length * self.dim * self._element_bytes
        if self.rows == 0 or wanted > self.device_budget_bytes:
            return None
        if self._device is None:
            # token-major [Ld, N, D] — the MaxSim kernel's native layout
            if self.quantize == "int8":
                self._device = (
                    jnp.asarray(self._tokens.transpose(1, 0, 2)),  # int8
                    jnp.asarray(self._scales.T, jnp.float32),  # [Ld, N]
                    jnp.asarray(self._masks),
                )
            else:
                self._device = (
                    jnp.asarray(self._tokens.transpose(1, 0, 2), self.device_dtype),
                    jnp.asarray(self._masks),
                )
        return self._device

    def gather(self, rows: Sequence[int]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """→ (docs_t [Ld, n, D] device array, masks [n, Ld]).

        Device-resident gather when the corpus fits the HBM budget; host
        gather + transfer otherwise. int8 stores dequantize at gather time
        (per-token scales), so the MaxSim kernel always sees bf16/f32.
        """
        rows = np.asarray(list(rows), np.int32)
        cache = self._device_cache()
        if cache is not None:
            if self.quantize == "int8":
                tokens_t, scales_t, masks = cache
                slab = tokens_t[:, rows, :].astype(jnp.float32)
                slab = slab * scales_t[:, rows, None]
                return slab.astype(self.device_dtype), masks[rows]
            tokens_t, masks = cache
            return tokens_t[:, rows, :], masks[rows]
        if self.quantize == "int8":
            slab = (
                self._tokens[rows].astype(np.float32)
                * self._scales[rows][:, :, None].astype(np.float32)
            )
        else:
            slab = self._tokens[rows]
        return (
            jnp.asarray(slab.transpose(1, 0, 2), self.device_dtype),
            jnp.asarray(self._masks[rows]),
        )

    # ----------------------------------------------------------- persist
    def save(self, directory: str) -> None:
        path = Path(directory)
        path.mkdir(parents=True, exist_ok=True)
        arrays = {"tokens": self._tokens, "masks": self._masks,
                  "quantize": np.array(self.quantize)}
        if self._scales is not None:
            arrays["scales"] = self._scales
        np.savez_compressed(path / "token_store.npz", **arrays)

    @classmethod
    def load(cls, directory: str, dim: int, max_doc_length: int, **kwargs) -> "TokenStore":
        file = Path(directory) / "token_store.npz"
        if file.exists():
            arrays = np.load(file)
            saved_quant = str(arrays["quantize"]) if "quantize" in arrays else "none"
            kwargs["quantize"] = saved_quant
            store = cls(dim=dim, max_doc_length=max_doc_length, **kwargs)
            store._tokens = np.asarray(
                arrays["tokens"], np.int8 if saved_quant == "int8" else np.float16
            )
            if "scales" in arrays:
                store._scales = np.asarray(arrays["scales"], np.float16)
            store._masks = np.asarray(arrays["masks"], bool)
            return store
        return cls(dim=dim, max_doc_length=max_doc_length, **kwargs)
