"""Mesh-sharded sparse (lexical) retrieval arm.

Completes the sharded story for bge-m3's third head: like the dense corpus
(``sharded_search.py``) and the ColBERT token slabs (``sharded_rerank.py``),
the padded term lists of ``index/sparse.py`` lay out column-sharded
(term-major [T, cap] slab, corpus on the lane axis) over the mesh ``shard``
axis. Each device runs the scan on its HBM slice and keeps a local top-k;
the [k] candidate lists are all-gathered over ICI and merged —
O(shards·k) interconnect bytes for a corpus-sized scan, the same contract
as the dense arm.

Scoring goes through the SAME kernels as the single-device arm — the fused
Pallas kernel (``ops/sparse_scan.sparse_scores_tm``) per shard on TPU, the
shared XLA cores elsewhere — threaded by an explicit ``variant`` parameter
so every formulation is testable from CPU (r03 ADVICE #1/#2: the broadcast
branch was untestable and the scoring body was a drifting copy).

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

from ..index.sparse import _BLOCK, SparseIndex, _use_variant, _xla_scores_tm


def _local_scores(ids_t, weights_t, q_ids, q_w, variant: str,
                  interpret: bool):
    """Per-shard scores over the local [T, local_cap] slice — one shared
    dispatcher for every formulation (single-device parity by import).

    "pallas_lut" degrades to the compare-unroll kernel here: the LUT's
    per-query hash tables are built host-side per call, which cannot live
    inside the cached shard_map executable (the single-device path owns
    that optimization; scores are bit-identical either way)."""
    if variant in ("pallas", "pallas_lut"):
        from ..ops.sparse_scan import sparse_scores_tm

        return sparse_scores_tm(ids_t, weights_t, q_ids, q_w,
                                interpret=interpret)
    return _xla_scores_tm(ids_t, weights_t, q_ids, q_w, variant)


def make_sharded_sparse_topk(mesh: Mesh, axis_name: str, k: int,
                             variant: Optional[str] = None,
                             interpret: Optional[bool] = None):
    """Jitted sharded executable: (ids_t [T, cap] column-sharded int32,
    weights_t [T, cap] column-sharded, staged scalar, q_ids [Q], q_w [Q])
    → (values [k], rows [k]) with *global* row indices.

    Per-shard local capacity must be a multiple of ``_BLOCK`` (the
    ``ShardedSparseIndex`` pads capacity to ``_BLOCK · n_shards``).
    ``variant``/``interpret`` default by backend (tests pin them).
    """
    variant = variant or _use_variant()
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def _local(ids_t, weights_t, staged, q_ids, q_w):
        t, local_cap = ids_t.shape
        scores = _local_scores(ids_t, weights_t, q_ids, q_w, variant,
                               interpret)
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
            P(None, axis_name),  # term ids, corpus (lane) axis sharded
            P(None, axis_name),  # term weights
            P(),                 # staged row count, replicated
            P(),                 # query term ids, replicated
            P(),                 # query term weights, replicated
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_sparse_topk_batch(mesh: Mesh, axis_name: str, k: int,
                                   variant: Optional[str] = None,
                                   interpret: Optional[bool] = None):
    """Batched sharded executable: q_ids/q_w [B, Q] → (values [B, k],
    rows [B, k]) global row indices, one collective merge for the batch."""
    variant = variant or _use_variant()
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def _local(ids_t, weights_t, staged, q_ids, q_w):
        t, local_cap = ids_t.shape
        b = q_ids.shape[0]
        if variant in ("pallas", "pallas_lut"):  # LUT degrades per-shard
            from ..ops.sparse_scan import sparse_scores_tm_batch

            scores = sparse_scores_tm_batch(
                ids_t, weights_t, q_ids, q_w, interpret=interpret)
        else:
            from ..ops.sparse_scan import xla_block_scores_batch

            blocks_i = jnp.moveaxis(
                ids_t.reshape(t, local_cap // _BLOCK, _BLOCK), 1, 0)
            blocks_w = jnp.moveaxis(
                weights_t.reshape(t, local_cap // _BLOCK, _BLOCK), 1, 0)

            def block(blk):
                bids, bw = blk
                return xla_block_scores_batch(bids, bw, q_ids, q_w, variant)

            scores = jax.lax.map(block, (blocks_i, blocks_w))
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
        in_specs=(P(None, axis_name), P(None, axis_name), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


class ShardedSparseIndex(SparseIndex):
    """SparseIndex whose device slab is column-sharded over a mesh.

    Host-side mutation, df stats, tail scoring, fusion, and serialization are
    inherited; only device placement and the top-k executable differ.
    Capacity pads to a multiple of ``_BLOCK · n_shards`` so every shard gets
    an equal, block-aligned slice (pad columns carry id −1 / weight 0 and
    are masked by the staged-row bound, exactly like the single-device
    slab).
    """

    def __init__(self, top_terms: int = 48, device_dtype: str = "bfloat16",
                 mesh: Optional[Mesh] = None, axis_name: str = "shard"):
        super().__init__(top_terms=top_terms, device_dtype=device_dtype)
        if mesh is None:
            raise ValueError("ShardedSparseIndex requires a mesh")
        self.mesh = mesh
        self.axis_name = axis_name
        self.n_shards = int(mesh.shape[axis_name])
        self._search_fns: Dict[object, object] = {}

    def _device_state(self):
        with self._mutex:
            if self._device is None and self.rows:
                unit = _BLOCK * self.n_shards
                cap = max(unit, -(-self.rows // unit) * unit)
                ids = np.full((self.top_terms, cap), -1, np.int32)
                w = np.zeros((self.top_terms, cap), np.float32)
                ids[:, : self.rows] = self._ids.T
                w[:, : self.rows] = self._weights.T
                col_sharded = NamedSharding(self.mesh, P(None, self.axis_name))
                self._device = (
                    jax.device_put(ids, col_sharded),
                    jax.device_put(w.astype(self.device_dtype), col_sharded),
                    self.rows,
                )
            return self._device

    def _device_topk(self, state, q_ids: np.ndarray, q_w: np.ndarray,
                     k: int):
        ids_slab, w_slab, staged = state
        key = (k, self.scan_variant)
        fn = self._search_fns.get(key)
        if fn is None:
            fn = make_sharded_sparse_topk(
                self.mesh, self.axis_name, k, variant=self.scan_variant)
            self._search_fns[key] = fn
        return fn(ids_slab, w_slab, jnp.asarray(staged, jnp.int32),
                  jnp.asarray(q_ids), jnp.asarray(q_w))

    def _device_topk_batch(self, state, q_ids: np.ndarray,
                           q_w: np.ndarray, k: int):
        ids_slab, w_slab, staged = state
        key = ("batch", k, self.scan_variant)
        fn = self._search_fns.get(key)
        if fn is None:
            fn = make_sharded_sparse_topk_batch(
                self.mesh, self.axis_name, k, variant=self.scan_variant)
            self._search_fns[key] = fn
        return fn(ids_slab, w_slab, jnp.asarray(staged, jnp.int32),
                  jnp.asarray(q_ids), jnp.asarray(q_w))

    def stats(self) -> dict:
        base = super().stats()
        base.update({"kind": "sharded", "n_shards": self.n_shards})
        return base
