"""Mesh-sharded sparse (lexical) retrieval arm.

Completes the sharded story for bge-m3's third head: like the dense corpus
(``sharded_search.py``) and the ColBERT token slabs (``sharded_rerank.py``),
the padded term lists of ``index/sparse.py`` lay out row-sharded over the
mesh ``shard`` axis. Each device runs the blockwise equality-match reduction
on its HBM slice and keeps a local top-k; the [k] candidate lists are
all-gathered over ICI and merged — O(shards·k) interconnect bytes for a
corpus-sized scan, the same contract as the dense arm.

The reference has no counterpart (it deploys only bge-m3's dense head and a
single Qdrant node, SURVEY.md §2.2/§2.8); this module exists so the lexical
arm scales with the rest of the engine instead of pinning one device.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.sparse import _BLOCK, SparseIndex, _use_broadcast


def make_sharded_sparse_topk(mesh: Mesh, axis_name: str, k: int):
    """Jitted sharded executable: (ids [cap, T] row-sharded int32,
    weights [cap, T] row-sharded, staged scalar, q_ids [Q], q_w [Q])
    → (values [k], rows [k]) with *global* row indices.

    Per-shard local capacity must be a multiple of ``_BLOCK`` (the
    ``ShardedSparseIndex`` pads capacity to ``_BLOCK · n_shards``).
    """

    def _local(ids, weights, staged, q_ids, q_w):
        local_cap, t = ids.shape
        n_q = q_ids.shape[0]
        blocks_i = ids.reshape(local_cap // _BLOCK, _BLOCK, t)
        blocks_w = weights.reshape(local_cap // _BLOCK, _BLOCK, t)

        def block_scores(blk):
            bids, bw = blk
            if _use_broadcast():
                # TPU: one-shot [block, T, Q] masked sum, 1.8x the fori
                # accumulation on-chip (BENCH_SPARSE_r03.json A/B)
                m = bids[:, :, None] == q_ids[None, None, :]
                return jnp.sum(
                    jnp.where(m, bw[:, :, None].astype(jnp.float32)
                              * q_w[None, None, :], 0.0),
                    axis=(1, 2))

            def qstep(i, acc):
                hit = jnp.where(bids == q_ids[i], bw.astype(jnp.float32), 0.0)
                return acc + q_w[i] * jnp.sum(hit, axis=1)

            return jax.lax.fori_loop(
                0, n_q, qstep, jnp.zeros(_BLOCK, jnp.float32))

        scores = jax.lax.map(block_scores, (blocks_i, blocks_w)).reshape(local_cap)
        shard = jax.lax.axis_index(axis_name)
        base = shard * local_cap
        scores = jnp.where(
            jnp.arange(local_cap) + base < staged, scores, -jnp.inf)
        vals, idx = jax.lax.top_k(scores, k)
        gidx = idx + base
        # O(shards·k) over ICI, then a replicated merge
        all_vals = jax.lax.all_gather(vals, axis_name).reshape(-1)
        all_idx = jax.lax.all_gather(gidx, axis_name).reshape(-1)
        mvals, pos = jax.lax.top_k(all_vals, k)
        return mvals, all_idx[pos]

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(
            P(axis_name, None),  # term ids row-sharded
            P(axis_name, None),  # term weights row-sharded
            P(),                 # staged row count, replicated
            P(),                 # query term ids, replicated
            P(),                 # query term weights, replicated
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_sparse_topk_batch(mesh: Mesh, axis_name: str, k: int):
    """Batched sharded executable: q_ids/q_w [B, Q] → (values [B, k],
    rows [B, k]) global row indices, one collective merge for the batch."""

    def _local(ids, weights, staged, q_ids, q_w):
        local_cap, t = ids.shape
        b, n_q = q_ids.shape
        blocks_i = ids.reshape(local_cap // _BLOCK, _BLOCK, t)
        blocks_w = weights.reshape(local_cap // _BLOCK, _BLOCK, t)

        def block_scores(blk):
            bids, bw = blk

            def qstep(i, acc):
                hit = bids[None, :, :] == q_ids[:, i][:, None, None]
                contrib = jnp.where(
                    hit, bw.astype(jnp.float32)[None], 0.0).sum(axis=2)
                return acc + q_w[:, i][:, None] * contrib

            return jax.lax.fori_loop(
                0, n_q, qstep, jnp.zeros((b, _BLOCK), jnp.float32))

        scores = jax.lax.map(block_scores, (blocks_i, blocks_w))
        scores = jnp.moveaxis(scores, 0, 1).reshape(b, local_cap)
        shard = jax.lax.axis_index(axis_name)
        base = shard * local_cap
        scores = jnp.where(
            jnp.arange(local_cap)[None, :] + base < staged, scores, -jnp.inf)
        vals, idx = jax.lax.top_k(scores, k)          # [B, k] local
        gidx = idx + base
        all_vals = jax.lax.all_gather(vals, axis_name)  # [S, B, k]
        all_idx = jax.lax.all_gather(gidx, axis_name)
        n_shards = all_vals.shape[0]
        flat_v = jnp.moveaxis(all_vals, 0, 1).reshape(b, n_shards * k)
        flat_i = jnp.moveaxis(all_idx, 0, 1).reshape(b, n_shards * k)
        mvals, pos = jax.lax.top_k(flat_v, k)
        return mvals, jnp.take_along_axis(flat_i, pos, axis=1)

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


class ShardedSparseIndex(SparseIndex):
    """SparseIndex whose device slab is row-sharded over a mesh.

    Host-side mutation, df stats, tail scoring, fusion, and serialization are
    inherited; only device placement and the top-k executable differ.
    Capacity pads to a multiple of ``_BLOCK · n_shards`` so every shard gets
    an equal, block-aligned slice (pad rows carry id −1 / weight 0 and are
    masked by the staged-row bound, exactly like the single-device slab).
    """

    def __init__(self, top_terms: int = 48, device_dtype: str = "bfloat16",
                 mesh: Optional[Mesh] = None, axis_name: str = "shard"):
        super().__init__(top_terms=top_terms, device_dtype=device_dtype)
        if mesh is None:
            raise ValueError("ShardedSparseIndex requires a mesh")
        self.mesh = mesh
        self.axis_name = axis_name
        self.n_shards = int(mesh.shape[axis_name])
        self._search_fns: Dict[int, object] = {}

    def _device_state(self):
        with self._mutex:
            if self._device is None and self.rows:
                unit = _BLOCK * self.n_shards
                cap = max(unit, -(-self.rows // unit) * unit)
                ids = np.full((cap, self.top_terms), -1, np.int32)
                w = np.zeros((cap, self.top_terms), np.float32)
                ids[: self.rows] = self._ids
                w[: self.rows] = self._weights
                row_sharded = NamedSharding(self.mesh, P(self.axis_name, None))
                self._device = (
                    jax.device_put(ids, row_sharded),
                    jax.device_put(w.astype(self.device_dtype), row_sharded),
                    self.rows,
                )
            return self._device

    def _device_topk(self, state, q_ids: np.ndarray, q_w: np.ndarray,
                     k: int):
        ids_slab, w_slab, staged = state
        fn = self._search_fns.get(k)
        if fn is None:
            fn = make_sharded_sparse_topk(self.mesh, self.axis_name, k)
            self._search_fns[k] = fn
        return fn(ids_slab, w_slab, jnp.asarray(staged, jnp.int32),
                  jnp.asarray(q_ids), jnp.asarray(q_w))

    def _device_topk_batch(self, state, q_ids: np.ndarray,
                           q_w: np.ndarray, k: int):
        ids_slab, w_slab, staged = state
        key = ("batch", k)
        fn = self._search_fns.get(key)
        if fn is None:
            fn = make_sharded_sparse_topk_batch(self.mesh, self.axis_name, k)
            self._search_fns[key] = fn
        return fn(ids_slab, w_slab, jnp.asarray(staged, jnp.int32),
                  jnp.asarray(q_ids), jnp.asarray(q_w))

    def stats(self) -> dict:
        base = super().stats()
        base.update({"kind": "sharded", "n_shards": self.n_shards})
        return base
