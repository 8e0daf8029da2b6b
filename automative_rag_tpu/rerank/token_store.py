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
    ):
        self.dim = dim
        self.max_doc_length = max_doc_length
        self.device_dtype = jnp.dtype(device_dtype)
        self.device_budget_bytes = device_budget_bytes
        self._tokens = np.zeros((0, max_doc_length, dim), np.float16)
        self._masks = np.zeros((0, max_doc_length), bool)
        self._device: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None

    # ------------------------------------------------------------ mutation
    def append(self, token_embs: np.ndarray, masks: np.ndarray) -> None:
        """Append rows (row order must mirror the vector index)."""
        token_embs = np.asarray(token_embs, np.float16)
        masks = np.asarray(masks, bool)
        if token_embs.shape[1:] != (self.max_doc_length, self.dim):
            raise ValueError(
                f"expected [N, {self.max_doc_length}, {self.dim}], got {token_embs.shape}"
            )
        self._tokens = np.concatenate([self._tokens, token_embs])
        self._masks = np.concatenate([self._masks, masks])
        self._device = None

    @property
    def rows(self) -> int:
        return self._tokens.shape[0]

    @property
    def nbytes(self) -> int:
        return self._tokens.nbytes

    # -------------------------------------------------------------- reads
    def _device_cache(self) -> Optional[Tuple[jnp.ndarray, jnp.ndarray]]:
        wanted = self.rows * self.max_doc_length * self.dim * self.device_dtype.itemsize
        if self.rows == 0 or wanted > self.device_budget_bytes:
            return None
        if self._device is None:
            # token-major [Ld, N, D] — the MaxSim kernel's native layout
            self._device = (
                jnp.asarray(self._tokens.transpose(1, 0, 2), self.device_dtype),
                jnp.asarray(self._masks),
            )
        return self._device

    def gather(self, rows: Sequence[int]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """→ (docs_t [Ld, n, D] device array, masks [n, Ld]).

        Device-resident gather when the corpus fits the HBM budget; host
        gather + transfer otherwise.
        """
        rows = np.asarray(list(rows), np.int32)
        cache = self._device_cache()
        if cache is not None:
            tokens_t, masks = cache
            return tokens_t[:, rows, :], masks[rows]
        slab = self._tokens[rows]  # [n, Ld, D] host gather
        return (
            jnp.asarray(slab.transpose(1, 0, 2), self.device_dtype),
            jnp.asarray(self._masks[rows]),
        )

    # ----------------------------------------------------------- persist
    def save(self, directory: str) -> None:
        path = Path(directory)
        path.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            path / "token_store.npz", tokens=self._tokens, masks=self._masks
        )

    @classmethod
    def load(cls, directory: str, dim: int, max_doc_length: int, **kwargs) -> "TokenStore":
        store = cls(dim=dim, max_doc_length=max_doc_length, **kwargs)
        file = Path(directory) / "token_store.npz"
        if file.exists():
            arrays = np.load(file)
            store._tokens = np.asarray(arrays["tokens"], np.float16)
            store._masks = np.asarray(arrays["masks"], bool)
        return store
