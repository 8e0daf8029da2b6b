"""Corpus token-embedding store for rerank-from-store.

The reference re-encodes every candidate document at query time
(``rerankers.py:167-213`` runs N BERT forwards per query — the dominant
rerank cost). Here ColBERT token embeddings are computed once at ingest and
stored row-aligned with the vector index; query-time rerank is

    gather candidate token slabs → fused MaxSim kernel

with no document forward passes at all.

Storage model (int8 / fp16 modes):

- **Device buffer is primary**: a token-major ``[Ld, cap, D]`` HBM buffer
  with capacity headroom, updated IN PLACE on append (donated
  ``dynamic_update_slice``) — appends never invalidate/re-upload the cache,
  and ``append_device`` ingests encoder output without ever fetching the
  hidden states to the host (the device→host relay fetch is what bounded
  ColBERT ingest on-chip: 36 docs/s fetched vs ~310 docs/s for the same
  forward with a pooled 4 KB/doc output).
- **Host arrays are the durable copy** (survive checkpoints), synced
  lazily: device-appended rows are counted in ``_pending_rows`` and read
  back out of the buffer only
  when persistence/compression/host-fallback actually needs host bytes.

When the corpus outgrows ``device_budget_bytes`` the buffer is dropped
(after syncing) and all paths fall back to host gather + transfer.
PLAID-style ``residual2`` compression keeps its own host-built cache.
"""

from __future__ import annotations

import threading
from functools import partial
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, donate_argnums=(0,))
def _buf_write(buf, slab, row0):
    """In-place (donated) write of a token-major slab at row offset."""
    return jax.lax.dynamic_update_slice(buf, slab, (0, row0, 0))


@partial(jax.jit, donate_argnums=(0,))
def _buf_write2(buf, slab, row0):
    """Same for the [Ld, cap] scales buffer."""
    return jax.lax.dynamic_update_slice(buf, slab, (0, row0))


@jax.jit
def _to_token_major(x):
    return jnp.swapaxes(x, 0, 1)


@partial(jax.jit, static_argnames=("use_pallas",))
def _maxsim_fused_int8(tokens_t, scales_t, rows, q, q_mask, d_mask,
                       use_pallas: bool):
    from ..ops.maxsim import maxsim_scores

    return maxsim_scores(
        q, q_mask, tokens_t[:, rows, :], d_mask, token_major=True,
        d_scales=scales_t[:, rows], use_pallas=use_pallas,
        interpret=not use_pallas)


@partial(jax.jit, static_argnames=("use_pallas",))
def _maxsim_fused_plain(tokens_t, rows, q, q_mask, d_mask,
                        use_pallas: bool):
    from ..ops.maxsim import maxsim_scores

    return maxsim_scores(
        q, q_mask, tokens_t[:, rows, :], d_mask, token_major=True,
        use_pallas=use_pallas, interpret=not use_pallas)


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
        # residual2 tuple cache (host-built); int8/fp16 use the buffer below
        self._device: Optional[Tuple[jnp.ndarray, ...]] = None
        # device-primary buffer: (tokens_t [Ld, cap, D], scales_t [Ld, cap]|None)
        self._buf: Optional[Tuple[jnp.ndarray, Optional[jnp.ndarray]]] = None
        self._buf_rows = 0
        # device slabs not yet mirrored to the host arrays, in append order
        self._pending_rows = 0
        # subclasses whose device cache is rebuilt from host arrays
        # (ShardedTokenStore) keep device appends off
        self._supports_device_append = type(self)._device_cache is TokenStore._device_cache
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
            self._append_host_locked(quantized, scales.astype(np.float16), masks)
        else:
            self._append_host_locked(token_embs.astype(np.float16), None, masks)

    def append_quantized(self, quant: np.ndarray, scales: np.ndarray,
                         masks: np.ndarray) -> None:
        """Append rows already quantized (same symmetric per-token formula
        as ``_append_locked``)."""
        if self.quantize != "int8":
            raise ValueError("append_quantized requires an int8 store")
        with self._mutex:
            quant = np.asarray(quant, np.int8)
            if quant.shape[1:] != (self.max_doc_length, self.dim):
                raise ValueError(
                    f"expected [N, {self.max_doc_length}, {self.dim}], "
                    f"got {quant.shape}")
            self._append_host_locked(
                quant, np.asarray(scales, np.float16), np.asarray(masks, bool))

    def _append_host_locked(self, tokens: np.ndarray,
                            scales: Optional[np.ndarray],
                            masks: np.ndarray) -> None:
        """Host-array append + in-place device-buffer update (int8/fp16)."""
        # host appends must land after any device-appended rows
        self._sync_host_locked()
        row0 = self._tokens.shape[0]
        self._tokens = np.concatenate([self._tokens, tokens])
        if scales is not None:
            self._scales = np.concatenate([self._scales, scales])
        self._masks = np.concatenate([self._masks, masks])
        # subclasses with host-rebuilt tuple caches (ShardedTokenStore)
        # invalidate on append; the base buffer updates in place below
        self._device = None
        if self._buf is not None:
            slab_q = jnp.asarray(tokens.transpose(1, 0, 2))
            slab_s = (jnp.asarray(scales.T, jnp.float32)
                      if scales is not None else None)
            if self.quantize != "int8":
                slab_q = slab_q.astype(self.device_dtype)
            if self._buf_update_locked(slab_q, slab_s, row0):
                self._buf_rows = row0 + len(tokens)

    def append_device(self, quant, scales, masks: np.ndarray) -> None:
        """Append rows whose int8 quantization lives ON DEVICE
        (``ColBERTEncoder.encode_documents_device``): the hidden states are
        never fetched to the host on the ingest path — the slab goes
        straight into the HBM buffer, and the durable host copy syncs
        lazily (at save/compress/host-fallback time). This removes the
        device→host relay fetch that bounds ColBERT ingest throughput."""
        if self.quantize != "int8":
            raise ValueError("append_device requires an int8 store")
        with self._mutex:
            n = int(quant.shape[0])
            if tuple(quant.shape[1:]) != (self.max_doc_length, self.dim):
                raise ValueError(
                    f"expected [N, {self.max_doc_length}, {self.dim}], "
                    f"got {tuple(quant.shape)}")
            wanted = (self.rows + n) * self.max_doc_length * self._element_bytes
            if (not self._supports_device_append
                    or wanted > self.device_budget_bytes):
                self.append_quantized(
                    np.asarray(quant), np.asarray(scales), masks)
                return
            row0 = self.rows
            if self._buf is None:
                if row0 > 0:
                    # stage existing host rows before the first device append
                    self._ensure_buffer_locked(min_extra=n)
                else:
                    self._alloc_buffer_locked(capacity=self._grow_cap(n))
            if self._buf is None:  # staging failed (budget) — host fallback
                self.append_quantized(
                    np.asarray(quant), np.asarray(scales), masks)
                return
            slab_q = _to_token_major(jnp.asarray(quant, jnp.int8))
            slab_s = _to_token_major(jnp.asarray(scales).astype(jnp.float32))
            ok = self._buf_update_locked(slab_q, slab_s, row0)
            if not ok:  # budget hit during growth — host fallback
                self.append_quantized(
                    np.asarray(quant), np.asarray(scales), masks)
                return
            # the slab now lives in the buffer — sync reads it back from
            # there, so nothing else is retained (keeping per-append slab
            # arrays doubled HBM use against the budget)
            self._pending_rows += n
            self._masks = np.concatenate(
                [self._masks, np.asarray(masks, bool)])
            self._buf_rows = row0 + n

    # --------------------------------------------------- device buffer mgmt
    def _grow_cap(self, rows: int) -> int:
        cap = 1024
        while cap < rows:
            cap *= 2
        max_cap = self.device_budget_bytes // max(
            1, self.max_doc_length * self._element_bytes)
        return max(rows, min(cap, max_cap))

    def _buf_bytes(self, capacity: int) -> int:
        return capacity * self.max_doc_length * self._element_bytes

    def _alloc_buffer_locked(self, capacity: int) -> None:
        ld, d = self.max_doc_length, self.dim
        if self.quantize == "int8":
            self._buf = (jnp.zeros((ld, capacity, d), jnp.int8),
                         jnp.zeros((ld, capacity), jnp.float32))
        else:
            self._buf = (jnp.zeros((ld, capacity, d), self.device_dtype), None)

    def _buf_update_locked(self, slab_q, slab_s, row0: int) -> bool:
        """Write a token-major slab at ``row0``, growing as needed.
        Returns False (and drops the buffer) if growth exceeds the budget."""
        n = slab_q.shape[1]
        buf_q, buf_s = self._buf
        cap = buf_q.shape[1]
        if row0 + n > cap:
            new_cap = self._grow_cap(row0 + n)
            if new_cap < row0 + n or self._buf_bytes(new_cap) > self.device_budget_bytes:
                self._drop_buffer_locked()
                return False
            grown_q = jnp.zeros(
                (buf_q.shape[0], new_cap, buf_q.shape[2]), buf_q.dtype)
            grown_q = jax.lax.dynamic_update_slice(grown_q, buf_q, (0, 0, 0))
            if buf_s is not None:
                grown_s = jnp.zeros((buf_s.shape[0], new_cap), buf_s.dtype)
                grown_s = jax.lax.dynamic_update_slice(grown_s, buf_s, (0, 0))
            else:
                grown_s = None
            buf_q, buf_s = grown_q, grown_s
        buf_q = _buf_write(buf_q, slab_q, row0)
        if buf_s is not None and slab_s is not None:
            buf_s = _buf_write2(buf_s, slab_s, row0)
        self._buf = (buf_q, buf_s)
        return True

    def _ensure_buffer_locked(self, min_extra: int = 0):
        """Build/refresh the device buffer from host state; None when the
        corpus exceeds the HBM budget (host-gather fallback)."""
        n = self.rows
        wanted = (n + min_extra) * self.max_doc_length * self._element_bytes
        if n == 0 or wanted > self.device_budget_bytes:
            self._drop_buffer_locked()
            return None
        if self._buf is not None and self._buf_rows == n:
            return self._buf
        # (re)build from host truth — requires pending synced
        self._sync_host_locked()
        self._alloc_buffer_locked(self._grow_cap(n + min_extra))
        if self.quantize == "int8":
            slab_q = jnp.asarray(self._tokens.transpose(1, 0, 2))
            slab_s = jnp.asarray(self._scales.T, jnp.float32)
        else:
            slab_q = jnp.asarray(
                self._tokens.transpose(1, 0, 2), self.device_dtype)
            slab_s = None
        self._buf_update_locked(slab_q, slab_s, 0)
        self._buf_rows = n
        return self._buf

    def _drop_buffer_locked(self) -> None:
        self._sync_host_locked()
        self._buf = None
        self._buf_rows = 0

    def drop_device_cache(self) -> None:
        """Release HBM state (syncing the durable host copy first)."""
        with self._mutex:
            self._drop_buffer_locked()
            self._device = None

    def select_rows(self, rows) -> None:
        """Keep only ``rows`` (in the given order) — the token-store half of
        index compaction: the store is row-aligned with the vector index, so
        when the index drops its tombstones this must apply the SAME
        live-row permutation or every post-compaction rerank gathers the
        wrong documents' tokens."""
        with self._mutex:
            self._sync_host_locked()  # pending device rows become host truth
            self._drop_buffer_locked()
            rows = np.asarray(rows, np.int64)
            if self.quantize == "residual2":
                self._cids = np.ascontiguousarray(self._cids[rows])
                self._codes = np.ascontiguousarray(self._codes[rows])
                self._res_scales = np.ascontiguousarray(self._res_scales[rows])
            else:
                self._tokens = np.ascontiguousarray(self._tokens[rows])
                if self._scales is not None:
                    self._scales = np.ascontiguousarray(self._scales[rows])
            self._masks = np.ascontiguousarray(self._masks[rows])
            self._device = None

    # --------------------------------------------------------- host mirror
    def _sync_host_locked(self) -> None:
        """Fetch device-appended rows into the durable host arrays by
        slicing them back OUT of the HBM buffer — the buffer is the only
        device-resident copy (every caller that can drop the buffer syncs
        first, so the rows are always still there)."""
        if not self._pending_rows:
            return
        assert self._buf is not None, "pending rows but no device buffer"
        buf_q, buf_s = self._buf
        h = self._tokens.shape[0]
        n = self._pending_rows
        slab_q = np.asarray(buf_q[:, h:h + n, :])  # [Ld, n, D] token-major
        self._tokens = np.concatenate(
            [self._tokens, slab_q.transpose(1, 0, 2).astype(np.int8)])
        slab_s = np.asarray(buf_s[:, h:h + n]).astype(np.float16)
        self._scales = np.concatenate([self._scales, slab_s.T])
        self._pending_rows = 0

    @property
    def rows(self) -> int:
        if self.quantize == "residual2":
            return self._codes.shape[0]
        return self._tokens.shape[0] + self._pending_rows

    @property
    def nbytes(self) -> int:
        if self.quantize == "residual2":
            return (
                self._codes.nbytes + self._cids.nbytes
                + self._res_scales.nbytes + self._centroids.nbytes
            )
        # analytic (host + pending) so stats never force a host sync
        per_tok = 1 if self.quantize == "int8" else 2
        return self.rows * self.max_doc_length * self.dim * per_tok

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
        with self._mutex:
            self._sync_host_locked()
        if self.quantize == "int8":
            return (
                self._tokens.astype(np.float32)
                * self._scales[:, :, None].astype(np.float32)
            )
        return self._tokens.astype(np.float32)

    # ---------------------------------------------------------- compression
    def compress(self, k_centroids: int = 256, sample: int = 262_144,
                 n_iters: int = 8, seed: int = 0, bits: int = 4) -> dict:
        """Convert storage to PLAID-style centroid + low-bit residual codes
        (~8x smaller than fp16 at D=1024). Later appends encode against the
        trained centroids; call again to retrain on the grown corpus."""
        if self.rows == 0:
            raise ValueError("cannot compress an empty store")
        # the WHOLE conversion runs under the mutex: gathers racing the
        # quantize/_tokens swap would read torn state (empty tokens with
        # quantize still 'int8'), and appends landing mid-codec would be
        # silently dropped by the swap. Blocking searches for the codec's
        # few seconds is the acceptable cost for an explicit ops call.
        with self._mutex:
            return self._compress_locked(k_centroids, sample, n_iters,
                                         seed, bits)

    def _compress_locked(self, k_centroids, sample, n_iters, seed, bits):
        from .residual_codec import assign_centroids, encode_residuals, train_centroids

        self._sync_host_locked()
        self._buf = None
        self._buf_rows = 0
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
        if self.quantize == "int8":
            # token plane + the fp32 scale the device buffer ACTUALLY
            # allocates per token — omitting it made every budget check
            # admit ~3% more than fits
            return self.dim + 4
        return self.dim * self.device_dtype.itemsize

    def _device_cache(self) -> Optional[Tuple[jnp.ndarray, ...]]:
        """residual2: legacy host-built tuple cache. int8/fp16 stores use
        the in-place buffer (``_ensure_buffer_locked``)."""
        if self.quantize != "residual2":
            return self._ensure_buffer_locked()
        wanted = self.rows * self.max_doc_length * self._element_bytes
        if self.rows == 0 or wanted > self.device_budget_bytes:
            return None
        if self._device is None:
            # token-major [Ld, N, D] — the MaxSim kernel's native layout
            self._device = (
                jnp.asarray(self._codes.transpose(1, 0, 2)),  # [Ld, N, D/4]
                jnp.asarray(self._res_scales.T, jnp.float32),  # [Ld, N]
                jnp.asarray(self._cids.T),  # [Ld, N]
                jnp.asarray(self._centroids),  # [K, D]
                jnp.asarray(self._masks),
            )
        return self._device

    def maxsim_fused(self, q_emb, q_mask, rows) -> Optional[jnp.ndarray]:
        """Candidate gather + MaxSim in ONE jitted dispatch (r05 item 3:
        the eager cache slice in ``gather_for_maxsim`` was its own device
        round trip — ~26 ms through the relay — before the kernel's).
        Returns scores [B, n], or None when the store has no resident
        device cache or uses the residual2 codec (those keep the
        two-dispatch path)."""
        rows = np.asarray(list(rows), np.int32)
        with self._mutex:
            cache = self._device_cache()
            if cache is None or self.quantize == "residual2":
                return None
            n = self._masks.shape[0]
            in_range = (rows >= 0) & (rows < n)
            rows_c = np.where(in_range, rows, 0)
            masks_sel = jnp.asarray(self._masks[rows_c] & in_range[:, None])
            from ..ops.maxsim import _on_tpu

            # dispatch inside the lock: appends donate the cache buffer,
            # and a dispatched op keeps its operand buffers alive
            if self.quantize == "int8":
                return _maxsim_fused_int8(
                    cache[0], cache[1], jnp.asarray(rows_c),
                    jnp.asarray(q_emb), jnp.asarray(q_mask), masks_sel,
                    use_pallas=_on_tpu())
            return _maxsim_fused_plain(
                cache[0], jnp.asarray(rows_c), jnp.asarray(q_emb),
                jnp.asarray(q_mask), masks_sel, use_pallas=_on_tpu())

    def gather(self, rows: Sequence[int]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """→ (docs_t [Ld, n, D] device array, masks [n, Ld]).

        Device-resident gather when the corpus fits the HBM budget; host
        gather + transfer otherwise. int8 stores dequantize at gather time
        (per-token scales), so the MaxSim kernel always sees bf16/f32.
        """
        rows = np.asarray(list(rows), np.int32)
        with self._mutex:
            cache = self._device_cache()
            # bounds clamp: a checkpoint load can swap in a SMALLER store
            # between the caller's row check and this gather; out-of-range
            # rows clamp to 0 with an all-False mask, so their MaxSim
            # score sinks instead of the gather crashing the query
            n = self._masks.shape[0]
            in_range = (rows >= 0) & (rows < n)
            rows = np.where(in_range, rows, 0)
            masks_sel = jnp.asarray(self._masks[rows] & in_range[:, None])
            if cache is not None:
                # slice while holding the lock: the buffer is donated by
                # in-place appends, so the gather must be DISPATCHED before
                # an append can retire the buffer (dispatched ops keep their
                # operand buffers alive)
                if self.quantize == "residual2":
                    from .residual_codec import decode_tokens

                    codes_t, scales_t, cids_t, centroids = cache[:4]
                    slab = decode_tokens(
                        codes_t[:, rows, :], scales_t[:, rows],
                        cids_t[:, rows],
                        centroids, dtype=self.device_dtype,
                        bits=self._res_bits,
                    )
                    return slab, masks_sel
                if self.quantize == "int8":
                    tokens_t, scales_t = cache[0], cache[1]
                    r = jnp.asarray(rows)
                    slab = tokens_t[:, r, :].astype(jnp.float32)
                    slab = slab * scales_t[:, r, None]
                    return slab.astype(self.device_dtype), masks_sel
                return cache[0][:, jnp.asarray(rows), :], masks_sel
            # snapshot host arrays so concurrent appends (which replace
            # the arrays) can't shift under this gather
            if self.quantize == "residual2":
                host = (self._codes, self._res_scales, self._cids,
                        self._centroids)
            else:
                host = (self._tokens, self._scales)
        if self.quantize == "residual2":
            from .residual_codec import decode_residuals_np

            codes, res_scales, cids, centroids = host
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
            tokens, scales = host
            slab = (
                tokens[rows].astype(np.float32)
                * scales[rows][:, :, None].astype(np.float32)
            )
        else:
            tokens, _ = host
            slab = tokens[rows]
        return (
            jnp.asarray(slab.transpose(1, 0, 2), self.device_dtype),
            masks_sel,
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
            # same load-swap bounds clamp as gather()
            n = self._masks.shape[0]
            in_range = (rows >= 0) & (rows < n)
            rows = np.where(in_range, rows, 0)
            masks_sel = jnp.asarray(self._masks[rows] & in_range[:, None])
            if cache is not None:
                # dispatch inside the lock (see gather: donated buffers)
                tokens_t, scales_t = cache[0], cache[1]
                r = jnp.asarray(rows)
                return tokens_t[:, r, :], scales_t[:, r], masks_sel
            host = (self._tokens, self._scales)
        tokens, scales = host
        return (
            jnp.asarray(tokens[rows].transpose(1, 0, 2)),
            jnp.asarray(scales[rows].T, jnp.float32),
            masks_sel,
        )

    # ----------------------------------------------------------- persist
    def save(self, directory: str) -> None:
        # snapshot the array REFERENCES under the mutex (mutators rebind
        # via concatenate, never write in place) so the persisted npz is
        # internally consistent; the slow compressed write runs unlocked
        with self._mutex:
            self._sync_host_locked()
            arrays = {"tokens": self._tokens, "masks": self._masks,
                      "quantize": np.array(self.quantize)}
            if self._scales is not None:
                arrays["scales"] = self._scales
            if self.quantize == "residual2":
                arrays.update(codes=self._codes, cids=self._cids,
                              res_scales=self._res_scales,
                              centroids=self._centroids,
                              res_bits=np.int64(self._res_bits))
        path = Path(directory)
        path.mkdir(parents=True, exist_ok=True)
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
                # fail FAST on geometry drift (e.g. max_doc_length changed
                # between runs) — a silently mismatched store errors deep
                # inside the MaxSim kernel instead
                if store._tokens.size and store._tokens.shape[1:] != (
                        max_doc_length, dim):
                    raise ValueError(
                        f"saved token store is {store._tokens.shape[1:]}, "
                        f"configured geometry is ({max_doc_length}, {dim})")
            store._masks = np.asarray(arrays["masks"], bool)
            if len(store._masks) != store.rows:
                raise ValueError(
                    f"saved token store is torn: {store.rows} rows vs "
                    f"{len(store._masks)} masks")
            return store
        return cls(dim=dim, max_doc_length=max_doc_length, **kwargs)
