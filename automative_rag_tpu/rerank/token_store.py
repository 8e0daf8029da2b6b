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

import threading
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
        quantize: str = "none",  # "none" (fp16) | "int8" | "residual2" (via compress())
    ):
        if quantize == "residual2":
            raise ValueError("residual2 is reached via compress(), not at init")
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
        # appends (ingestion worker) can race gathers (direct API search)
        self._mutex = threading.RLock()
        # residual2 (PLAID-style) artifacts — populated by compress()
        self._centroids: Optional[np.ndarray] = None  # [K, D]
        self._cids: Optional[np.ndarray] = None  # [N, Ld] int32
        self._codes: Optional[np.ndarray] = None  # [N, Ld, D//4] uint8
        self._res_scales: Optional[np.ndarray] = None  # [N, Ld] fp16
        self._res_bits = 4

    # ------------------------------------------------------------ mutation
    def append(self, token_embs: np.ndarray, masks: np.ndarray) -> None:
        """Append rows (row order must mirror the vector index)."""
        with self._mutex:
            self._append_locked(token_embs, masks)

    def _append_locked(self, token_embs: np.ndarray, masks: np.ndarray) -> None:
        masks = np.asarray(masks, bool)
        token_embs = np.asarray(token_embs, np.float32)
        if token_embs.shape[1:] != (self.max_doc_length, self.dim):
            raise ValueError(
                f"expected [N, {self.max_doc_length}, {self.dim}], got {token_embs.shape}"
            )
        if self.quantize == "residual2":
            # encode against the trained centroids (no retrain needed)
            from .residual_codec import assign_centroids, encode_residuals

            n, ld, dim = token_embs.shape
            flat = token_embs.reshape(n * ld, dim)
            cids = assign_centroids(flat, self._centroids)
            residuals = flat - self._centroids[cids]
            packed, scales = encode_residuals(residuals, bits=self._res_bits)
            self._cids = np.concatenate([self._cids, cids.reshape(n, ld)])
            self._codes = np.concatenate(
                [self._codes, packed.reshape(n, ld, self._codes.shape[2])]
            )
            self._res_scales = np.concatenate(
                [self._res_scales, scales.reshape(n, ld)]
            )
            self._masks = np.concatenate([self._masks, masks])
            self._device = None
            return
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

    def append_quantized(self, quant: np.ndarray, scales: np.ndarray,
                         masks: np.ndarray) -> None:
        """Append rows already quantized ON-DEVICE
        (``ColBERTEncoder.encode_documents_int8`` — same symmetric
        per-token formula as ``_append_locked``); the host never sees the
        fp16 hidden states, halving the ingest fetch."""
        if self.quantize != "int8":
            raise ValueError("append_quantized requires an int8 store")
        with self._mutex:
            quant = np.asarray(quant, np.int8)
            if quant.shape[1:] != (self.max_doc_length, self.dim):
                raise ValueError(
                    f"expected [N, {self.max_doc_length}, {self.dim}], "
                    f"got {quant.shape}")
            self._tokens = np.concatenate([self._tokens, quant])
            self._scales = np.concatenate(
                [self._scales, np.asarray(scales, np.float16)])
            self._masks = np.concatenate([self._masks, np.asarray(masks, bool)])
            self._device = None

    @property
    def rows(self) -> int:
        if self.quantize == "residual2":
            return self._codes.shape[0]
        return self._tokens.shape[0]

    @property
    def nbytes(self) -> int:
        if self.quantize == "residual2":
            return (
                self._codes.nbytes + self._cids.nbytes
                + self._res_scales.nbytes + self._centroids.nbytes
            )
        return self._tokens.nbytes

    def _dequantized(self) -> np.ndarray:
        """Full-precision reconstruction of every stored token (host)."""
        if self.quantize == "residual2":
            from .residual_codec import decode_residuals_np

            n, ld = self._cids.shape
            flat_res = decode_residuals_np(
                self._codes.reshape(n * ld, -1),
                self._res_scales.reshape(n * ld),
                self.dim,
                bits=self._res_bits,
            )
            return (
                self._centroids[self._cids.reshape(-1)] + flat_res
            ).reshape(n, ld, self.dim)
        if self.quantize == "int8":
            return (
                self._tokens.astype(np.float32)
                * self._scales[:, :, None].astype(np.float32)
            )
        return self._tokens.astype(np.float32)

    # ---------------------------------------------------------- compression
    def compress(self, k_centroids: int = 256, sample: int = 262_144,
                 n_iters: int = 8, seed: int = 0, bits: int = 4) -> dict:
        """Convert storage to PLAID-style centroid + 2-bit residual codes
        (~8x smaller than fp16 at D=1024). Later appends encode against the
        trained centroids; call again to retrain on the grown corpus."""
        from .residual_codec import assign_centroids, encode_residuals, train_centroids

        if self.rows == 0:
            raise ValueError("cannot compress an empty store")
        before = self.nbytes
        tokens = self._dequantized()
        n, ld, dim = tokens.shape
        flat = tokens.reshape(n * ld, dim)
        rng = np.random.default_rng(seed)
        pool = flat[rng.choice(flat.shape[0], size=min(sample, flat.shape[0]),
                               replace=False)]
        self._centroids = train_centroids(pool, k_centroids, n_iters=n_iters, seed=seed)
        self._res_bits = bits
        cids = assign_centroids(flat, self._centroids)
        residuals = flat - self._centroids[cids]
        packed, scales = encode_residuals(residuals, bits=bits)
        self._cids = cids.reshape(n, ld)
        self._codes = packed.reshape(n, ld, packed.shape[1])
        self._res_scales = scales.reshape(n, ld)
        self._tokens = np.zeros((0, ld, dim), np.float16)
        self._scales = None
        self.quantize = "residual2"
        self._device = None
        return {
            "rows": n,
            "k_centroids": k_centroids,
            "bytes_before": int(before),
            "bytes_after": int(self.nbytes),
            "compression": round(before / max(self.nbytes, 1), 2),
        }

    # -------------------------------------------------------------- reads
    @property
    def _element_bytes(self) -> int:
        if self.quantize == "residual2":
            return self.dim * self._res_bits // 8 + 6  # codes + cid + scale
        return self.dim * (1 if self.quantize == "int8" else self.device_dtype.itemsize)

    def _device_cache(self) -> Optional[Tuple[jnp.ndarray, ...]]:
        wanted = self.rows * self.max_doc_length * self._element_bytes
        if self.rows == 0 or wanted > self.device_budget_bytes:
            return None
        if self._device is None:
            # token-major [Ld, N, D] — the MaxSim kernel's native layout
            if self.quantize == "residual2":
                self._device = (
                    jnp.asarray(self._codes.transpose(1, 0, 2)),  # [Ld, N, D/4]
                    jnp.asarray(self._res_scales.T, jnp.float32),  # [Ld, N]
                    jnp.asarray(self._cids.T),  # [Ld, N]
                    jnp.asarray(self._centroids),  # [K, D]
                    jnp.asarray(self._masks),
                )
            elif self.quantize == "int8":
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
        with self._mutex:
            cache = self._device_cache()
            if cache is None:
                # snapshot host arrays so concurrent appends (which replace
                # the arrays) can't shift under this gather
                if self.quantize == "residual2":
                    host = (self._codes, self._res_scales, self._cids,
                            self._centroids, self._masks)
                elif self.quantize == "int8":
                    host = (self._tokens, self._scales, self._masks)
                else:
                    host = (self._tokens, self._masks)
        if cache is not None:
            if self.quantize == "residual2":
                from .residual_codec import decode_tokens

                codes_t, scales_t, cids_t, centroids, masks = cache
                slab = decode_tokens(
                    codes_t[:, rows, :], scales_t[:, rows], cids_t[:, rows],
                    centroids, dtype=self.device_dtype, bits=self._res_bits,
                )
                return slab, masks[rows]
            if self.quantize == "int8":
                tokens_t, scales_t, masks = cache
                slab = tokens_t[:, rows, :].astype(jnp.float32)
                slab = slab * scales_t[:, rows, None]
                return slab.astype(self.device_dtype), masks[rows]
            tokens_t, masks = cache
            return tokens_t[:, rows, :], masks[rows]
        if self.quantize == "residual2":
            from .residual_codec import decode_residuals_np

            codes, res_scales, cids, centroids, masks = host
            n_sel = rows.shape[0]
            flat_res = decode_residuals_np(
                codes[rows].reshape(n_sel * self.max_doc_length, -1),
                res_scales[rows].reshape(-1),
                self.dim,
                bits=self._res_bits,
            )
            slab = (
                centroids[cids[rows].reshape(-1)] + flat_res
            ).reshape(n_sel, self.max_doc_length, self.dim)
        elif self.quantize == "int8":
            tokens, scales, masks = host
            slab = (
                tokens[rows].astype(np.float32)
                * scales[rows][:, :, None].astype(np.float32)
            )
        else:
            tokens, masks = host
            slab = tokens[rows]
        return (
            jnp.asarray(slab.transpose(1, 0, 2), self.device_dtype),
            jnp.asarray(masks[rows]),
        )

    def gather_for_maxsim(
        self, rows: Sequence[int]
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
        """→ (docs_t, d_scales | None, masks) for the MaxSim kernel.

        int8 stores return the quantized slab + per-token scales so the
        kernel dequantizes in registers — the gather writes half the bytes
        and the kernel reads half the bytes vs dequantizing here. Other
        quantization modes fall back to the dequantizing ``gather``."""
        if self.quantize != "int8":
            docs_t, masks = self.gather(rows)
            return docs_t, None, masks
        rows = np.asarray(list(rows), np.int32)
        with self._mutex:
            cache = self._device_cache()
            if cache is None:
                host = (self._tokens, self._scales, self._masks)
        if cache is not None:
            tokens_t, scales_t, masks = cache
            r = jnp.asarray(rows)
            return tokens_t[:, r, :], scales_t[:, r], masks[r]
        tokens, scales, masks = host
        return (
            jnp.asarray(tokens[rows].transpose(1, 0, 2)),
            jnp.asarray(scales[rows].T, jnp.float32),
            jnp.asarray(masks[rows]),
        )

    # ----------------------------------------------------------- persist
    def save(self, directory: str) -> None:
        path = Path(directory)
        path.mkdir(parents=True, exist_ok=True)
        arrays = {"tokens": self._tokens, "masks": self._masks,
                  "quantize": np.array(self.quantize)}
        if self._scales is not None:
            arrays["scales"] = self._scales
        if self.quantize == "residual2":
            arrays.update(codes=self._codes, cids=self._cids,
                          res_scales=self._res_scales, centroids=self._centroids,
                          res_bits=np.int64(self._res_bits))
        np.savez_compressed(path / "token_store.npz", **arrays)

    @classmethod
    def load(cls, directory: str, dim: int, max_doc_length: int, **kwargs) -> "TokenStore":
        file = Path(directory) / "token_store.npz"
        if file.exists():
            arrays = np.load(file)
            saved_quant = str(arrays["quantize"]) if "quantize" in arrays else "none"
            init_quant = "none" if saved_quant == "residual2" else saved_quant
            kwargs["quantize"] = init_quant
            store = cls(dim=dim, max_doc_length=max_doc_length, **kwargs)
            if saved_quant == "residual2":
                store.quantize = "residual2"
                store._codes = np.asarray(arrays["codes"], np.uint8)
                store._cids = np.asarray(arrays["cids"], np.int32)
                store._res_scales = np.asarray(arrays["res_scales"], np.float16)
                store._centroids = np.asarray(arrays["centroids"], np.float32)
                store._res_bits = int(arrays.get("res_bits", 4))
            else:
                store._tokens = np.asarray(
                    arrays["tokens"], np.int8 if saved_quant == "int8" else np.float16
                )
                if "scales" in arrays:
                    store._scales = np.asarray(arrays["scales"], np.float16)
            store._masks = np.asarray(arrays["masks"], bool)
            return store
        return cls(dim=dim, max_doc_length=max_doc_length, **kwargs)
