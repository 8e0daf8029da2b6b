"""Mesh-sharded token store + MaxSim rerank: score where the data lives.

Scaling companion to ``rerank/token_store.py`` for corpora whose token slabs
exceed one chip's HBM (BASELINE's 10M-vector / v5e-8 target): the token-major
cache ([Ld, N, D]) is row-sharded over the mesh ``shard`` axis, and a rerank
runs as a ``shard_map`` where each device scores only the candidate rows it
owns — the full candidate slab never crosses the interconnect, only the
[B, k] score matrix does (via ``psum``), so ICI traffic is O(B·k) floats
instead of O(k·Ld·D) token bytes.

The per-shard math mirrors ``ops/maxsim.maxsim_scores_ref`` exactly (additive
-1e30 bias on padded doc tokens, masked query-token sum), so results are
bit-comparable with the single-device gather path. Candidate row-id lists are
padded to fixed buckets (static shapes for XLA); pad slots use row id -1,
which no shard owns, and psum leaves them at 0.

The reference has no counterpart — it re-encodes candidates per query on one
GPU (``rerankers.py:167-213``); there is nothing to shard because there is
no store.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..rerank.token_store import TokenStore

NEG_BIAS = -1e30


def make_sharded_maxsim(mesh: Mesh, axis_name: str, int8: bool = False):
    """Build the jitted sharded-MaxSim executable.

    Signature: (docs_t [Ld, N, D] row-sharded over dim 1, scales_t [Ld, N]
    (ones unless int8), masks [N, Ld], rows [k] int32 global ids (-1 pads),
    q [B, Lq, D], q_mask [B, Lq]) → scores [B, k] replicated.
    """

    def _local(docs_t, scales_t, masks, rows, q, q_mask):
        rps = docs_t.shape[1]  # rows per shard
        shard = jax.lax.axis_index(axis_name)
        local = rows - shard * rps
        owned = (local >= 0) & (local < rps)
        safe = jnp.clip(local, 0, rps - 1)

        cand = docs_t[:, safe, :]  # [Ld, k, D]
        if int8:
            cand = cand.astype(jnp.float32) * scales_t[:, safe, None]
        cand_mask = masks[safe]  # [k, Ld]

        # same math as maxsim_scores_ref, with docs token-major
        d_bias = jnp.where(cand_mask, 0.0, NEG_BIAS).astype(jnp.float32)
        sim = jnp.einsum(
            "bqd,tkd->bqkt",
            q.astype(jnp.float32),
            cand.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        sim = sim + d_bias[None, None, :, :]
        per_qtok = sim.max(axis=-1)  # [B, Lq, k]
        scores = (per_qtok * q_mask.astype(jnp.float32)[:, :, None]).sum(axis=1)
        scores = jnp.where(owned[None, :], scores, 0.0)
        return jax.lax.psum(scores, axis_name)

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(
            P(None, axis_name, None),  # docs_t row-sharded on the N axis
            P(None, axis_name),  # per-token scales (ones unless int8)
            P(axis_name, None),  # masks
            P(),  # candidate rows replicated
            P(),  # queries replicated
            P(),  # query masks replicated
        ),
        out_specs=P(None, None),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_maxsim_residual(mesh: Mesh, axis_name: str, bits: int):
    """Sharded MaxSim over a PLAID-compressed (centroid + packed-residual)
    token store: each shard decodes only its own candidates' codes on-device
    right before scoring — compressed bytes sit in HBM, full-precision tokens
    exist only transiently in registers/VMEM for the [k/S] rows a shard owns.

    Signature: (codes_t [Ld, N, D·bits/8] row-sharded, scales_t [Ld, N],
    cids_t [Ld, N], centroids [K, D] replicated, masks [N, Ld], rows [k],
    q [B, Lq, D], q_mask [B, Lq]) → scores [B, k] replicated.
    """
    from ..rerank.residual_codec import decode_tokens

    def _local(codes_t, scales_t, cids_t, centroids, masks, rows, q, q_mask):
        rps = codes_t.shape[1]
        shard = jax.lax.axis_index(axis_name)
        local = rows - shard * rps
        owned = (local >= 0) & (local < rps)
        safe = jnp.clip(local, 0, rps - 1)

        cand = decode_tokens(
            codes_t[:, safe, :], scales_t[:, safe], cids_t[:, safe],
            centroids, dtype=jnp.float32, bits=bits,
        )  # [Ld, k, D]
        cand_mask = masks[safe]

        d_bias = jnp.where(cand_mask, 0.0, NEG_BIAS).astype(jnp.float32)
        sim = jnp.einsum(
            "bqd,tkd->bqkt",
            q.astype(jnp.float32),
            cand,
            precision=jax.lax.Precision.HIGHEST,
        )
        sim = sim + d_bias[None, None, :, :]
        per_qtok = sim.max(axis=-1)
        scores = (per_qtok * q_mask.astype(jnp.float32)[:, :, None]).sum(axis=1)
        scores = jnp.where(owned[None, :], scores, 0.0)
        return jax.lax.psum(scores, axis_name)

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(
            P(None, axis_name, None),  # packed residual codes
            P(None, axis_name),  # residual scales
            P(None, axis_name),  # centroid ids
            P(None, None),  # centroids replicated (tiny: K·D)
            P(axis_name, None),  # masks
            P(),  # candidate rows
            P(),  # queries
            P(),  # query masks
        ),
        out_specs=P(None, None),
        check_vma=False,
    )
    return jax.jit(sharded)


def _round_rows(n: int, quantum: int) -> int:
    return max(quantum, -(-n // quantum) * quantum)


class ShardedTokenStore(TokenStore):
    """TokenStore whose device cache is row-sharded over a mesh.

    Host mirrors, persistence, and compression inherit from TokenStore; the
    device cache is placed with NamedSharding and reranking goes through
    ``maxsim()`` (score-where-data-lives) instead of ``gather()`` + kernel.
    Supports fp16 ("none") and int8 stores, and PLAID residual compression
    via ``compress()`` — shards hold packed codes and decode only their own
    candidates on-device at score time.
    """

    #: candidate-list lengths are padded to this quantum (static shapes)
    K_QUANTUM = 32

    def __init__(self, dim: int, max_doc_length: int, mesh: Mesh,
                 axis_name: str = "shard", device_dtype: str = "bfloat16",
                 device_budget_bytes: int = 4 * 1024**3, quantize: str = "none"):
        if quantize not in ("none", "int8"):
            # residual2 is reached via compress() (same rule as the base)
            raise ValueError(
                "ShardedTokenStore init supports quantize='none'|'int8'; "
                "residual2 is reached via compress()"
            )
        super().__init__(dim, max_doc_length, device_dtype,
                         device_budget_bytes, quantize)
        self.mesh = mesh
        self.axis_name = axis_name
        self.n_shards = mesh.shape[axis_name]
        self._maxsim_fns: Dict[Any, Any] = {}
        self._padded_rows = 0

    # --------------------------------------------------------------- device
    def _device_cache(self) -> Optional[Tuple[jnp.ndarray, ...]]:
        """Row-sharded token-major cache. Unlike the base class this store
        exists *because* one chip can't hold the slab, so the budget is
        interpreted per shard."""
        n = self.rows
        if n == 0:
            return None
        padded = _round_rows(n, 128 * self.n_shards)
        per_shard = padded // self.n_shards * self.max_doc_length * self._element_bytes
        if per_shard > self.device_budget_bytes:
            # release the stale sharded cache: once the corpus outgrows the
            # budget every query takes the host-gather fallback, and a
            # multi-GB HBM slab nobody reads must not stay referenced (nor
            # should stats() keep reporting device_resident)
            self._device = None
            self._padded_rows = 0
            return None
        if self._device is None or self._padded_rows != padded:
            ld, d = self.max_doc_length, self.dim
            tok_sharded = NamedSharding(self.mesh, P(None, self.axis_name, None))
            scale_sharded = NamedSharding(self.mesh, P(None, self.axis_name))
            mask_sharded = NamedSharding(self.mesh, P(self.axis_name, None))

            masks = np.zeros((padded, ld), bool)
            masks[:n] = self._masks
            if self.quantize == "residual2":
                code_w = self._codes.shape[2]
                codes = np.zeros((padded, ld, code_w), np.uint8)
                codes[:n] = self._codes
                cids = np.zeros((padded, ld), np.int32)
                cids[:n] = self._cids
                scales = np.zeros((padded, ld), np.float32)
                scales[:n] = self._res_scales.astype(np.float32)
                self._device = (
                    jax.device_put(jnp.asarray(codes.transpose(1, 0, 2)), tok_sharded),
                    jax.device_put(jnp.asarray(scales.T), scale_sharded),
                    jax.device_put(jnp.asarray(cids.T), scale_sharded),
                    jax.device_put(jnp.asarray(self._centroids, jnp.float32),
                                   NamedSharding(self.mesh, P(None, None))),
                    jax.device_put(jnp.asarray(masks), mask_sharded),
                )
                self._padded_rows = padded
                return self._device
            if self.quantize == "int8":
                tokens = np.zeros((padded, ld, d), np.int8)
                tokens[:n] = self._tokens
                scales = np.zeros((padded, ld), np.float32)
                scales[:n] = self._scales.astype(np.float32)
                staged = jnp.asarray(tokens.transpose(1, 0, 2))
            else:
                tokens = np.zeros((padded, ld, d), np.float16)
                tokens[:n] = self._tokens
                scales = np.ones((padded, ld), np.float32)
                staged = jnp.asarray(
                    tokens.transpose(1, 0, 2), self.device_dtype
                )
            self._device = (
                jax.device_put(staged, tok_sharded),
                jax.device_put(jnp.asarray(scales.T), scale_sharded),
                jax.device_put(jnp.asarray(masks), mask_sharded),
            )
            self._padded_rows = padded
        return self._device

    # --------------------------------------------------------------- rerank
    def maxsim(self, q_emb: np.ndarray, q_mask: np.ndarray,
               rows: Sequence[int]) -> np.ndarray:
        """MaxSim scores [B, k] for candidate rows, computed in place on the
        mesh — only the score matrix crosses ICI."""
        rows = np.asarray(list(rows), np.int32)
        # load-swap bounds clamp (see TokenStore.gather): stale rows become
        # the -1 pad sentinel the kernel already masks to score 0
        rows = np.where((rows >= 0) & (rows < self.rows), rows, -1)
        k = rows.shape[0]
        with self._mutex:
            cache = self._device_cache()
        if cache is None:
            # corpus exceeds even the sharded budget (or is empty): fall back
            # to the host-gather path of the base class
            from ..ops.maxsim import maxsim_scores

            docs_t, d_mask = self.gather(rows)
            return np.asarray(maxsim_scores(
                jnp.asarray(q_emb), jnp.asarray(q_mask), docs_t, d_mask,
                token_major=True,
            ))
        k_pad = _round_rows(k, self.K_QUANTUM)
        rows_padded = np.full(k_pad, -1, np.int32)
        rows_padded[:k] = rows
        key = (k_pad, q_emb.shape[0], self.quantize, self._res_bits)
        fn = self._maxsim_fns.get(key)
        if fn is None:
            if self.quantize == "residual2":
                fn = make_sharded_maxsim_residual(self.mesh, self.axis_name,
                                                  bits=self._res_bits)
            else:
                fn = make_sharded_maxsim(self.mesh, self.axis_name,
                                         int8=self.quantize == "int8")
            self._maxsim_fns[key] = fn
        scores = fn(*cache, jnp.asarray(rows_padded),
                    jnp.asarray(q_emb), jnp.asarray(q_mask))
        return np.asarray(scores)[:, :k]

    def stats(self) -> Dict[str, Any]:
        return {
            "rows": self.rows,
            "n_shards": self.n_shards,
            "quantize": self.quantize,
            "host_bytes": int(self.nbytes),
            "padded_rows": self._padded_rows,
            "device_resident": self._device is not None,
        }
