"""Mesh-sharded corpus search: per-shard masked top-k + ICI all-gather merge.

This is the component the reference has no counterpart for (SURVEY.md §2.8
"Corpus shard parallel (NEW)"): the corpus (vectors + metadata columns) is
laid out row-sharded over the mesh ``shard`` axis; each device computes its
local masked top-k on its HBM slice; the tiny [k] candidate lists are
all-gathered over ICI and merged — so the bytes crossing the interconnect are
O(shards·k), never O(corpus).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..index.filters import FilterSpec, eval_filter_mask
from ..index.flat import FlatIndex, SearchResult, _round_capacity
from ..ops.topk import masked_top_k, merge_top_k


def make_sharded_search(mesh: Mesh, axis_name: str, k: int, int8: bool = False,
                        int4: bool = False):
    """Build a jitted sharded-search executable for a given mesh/k.

    Signature: (vectors [N,D], row_scales [N], valid [N], codes [F,N],
    numerics [G,N], queries [B,D] replicated, spec) → (values [B,k],
    indices [B,k]) with *global* row indices; inputs must be placed with row
    sharding over ``axis_name``. With ``int8=True`` the corpus block is
    symmetric-int8 and ``row_scales`` carries the per-row dequant scales
    (same scheme as ``flat._search_kernel_int8``); with ``int4=True`` the
    corpus block is the packed-nibble weight matrix [D/2, N] column-sharded
    by corpus row (``flat._search_kernel_int4`` / ``ops.quant_matmul``);
    otherwise row_scales is ignored (pass ones).
    """
    import jax as _jax

    interpret = _jax.default_backend() != "tpu"

    def _local_search(vectors, row_scales, valid, codes, numerics, queries,
                      spec: FilterSpec):
        local_rows = vectors.shape[1] if int4 else vectors.shape[0]
        if int4:
            from ..ops.quant_matmul import w4_matmul

            scores = w4_matmul(
                queries.astype(jnp.float32), vectors, row_scales,
                interpret=interpret,
            ).astype(jnp.float32)
        elif int8:
            q_scale = jnp.max(jnp.abs(queries), axis=1, keepdims=True) / 127.0
            q_i8 = jnp.clip(
                jnp.round(queries / jnp.maximum(q_scale, 1e-12)), -127, 127
            ).astype(jnp.int8)
            raw = jax.lax.dot_general(
                q_i8,
                vectors,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            scores = raw.astype(jnp.float32) * q_scale * row_scales[None, :]
        else:
            scores = jax.lax.dot_general(
                queries.astype(vectors.dtype),
                vectors,
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        mask = valid & eval_filter_mask(codes, numerics, spec)
        vals, idx = masked_top_k(scores, mask, k)
        # local → global row ids
        shard = jax.lax.axis_index(axis_name)
        gidx = idx + shard * local_rows
        # O(shards·k) bytes over ICI, then a replicated merge
        all_vals = jax.lax.all_gather(vals, axis_name)  # [S, B, k]
        all_idx = jax.lax.all_gather(gidx, axis_name)
        return merge_top_k(all_vals, all_idx, k)

    sharded = shard_map(
        _local_search,
        mesh=mesh,
        in_specs=(
            # int4 packs the corpus [D/2, N] (columns = rows); others [N, D]
            P(None, axis_name) if int4 else P(axis_name, None),
            P(axis_name),  # row scales (ones unless int8/int4)
            P(axis_name),  # valid
            P(None, axis_name),  # keyword codes column-sharded by row
            P(None, axis_name),  # numeric columns
            P(None, None),  # queries replicated
            P(),  # filter spec replicated
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(sharded)


class ShardedFlatIndex(FlatIndex):
    """FlatIndex whose device state is row-sharded over a mesh.

    Host-side mutation/serialization is inherited; only device placement and
    the search executable differ. Capacity rounds to a power of two that is a
    multiple of ``128 · n_shards`` so every shard gets aligned, equal rows.
    """

    def __init__(self, dim: int, mesh: Mesh, axis_name: str = "shard",
                 device_dtype: str = "bfloat16"):
        super().__init__(dim, device_dtype)
        self.mesh = mesh
        self.axis_name = axis_name
        self.n_shards = mesh.shape[axis_name]
        self._search_fns: Dict[Any, Any] = {}

    def _capacity(self, n: int) -> int:
        cap = _round_capacity(max(n, 1))
        return max(cap, 128 * self.n_shards)

    def stats(self) -> Dict[str, Any]:
        base = super().stats()
        base.update({"kind": "sharded", "n_shards": self.n_shards})
        return base

    def _device_state(self) -> dict:
        with self._mutex:
            return self._device_state_locked()

    def _device_state_locked(self) -> dict:
        if self._device is not None:
            return self._device
        n = len(self._ids)
        capacity = self._capacity(n)
        vectors = np.zeros((capacity, self.dim), np.float32)
        vectors[:n] = self._vectors
        valid = np.zeros(capacity, bool)
        valid[:n] = ~self._deleted
        self.columns._grow(capacity)

        row_sharded = NamedSharding(self.mesh, P(self.axis_name, None))
        flag_sharded = NamedSharding(self.mesh, P(self.axis_name))
        col_sharded = NamedSharding(self.mesh, P(None, self.axis_name))
        if self._int8:
            scales = np.abs(vectors).max(axis=1) / 127.0
            staged = np.clip(
                np.round(vectors / np.maximum(scales[:, None], 1e-12)), -127, 127
            ).astype(np.int8)
        elif self._int4:
            from ..ops.quant_matmul import pack_w4

            staged, scales = pack_w4(np.ascontiguousarray(vectors.T))
            # packed layout is [D/2, cap]: corpus rows are COLUMNS
            row_sharded = col_sharded
        else:
            scales = np.ones(capacity, np.float32)
            staged = vectors.astype(self.device_dtype)
        self._device = {
            "vectors": jax.device_put(staged, row_sharded),
            "row_scales": jax.device_put(scales.astype(np.float32), flag_sharded),
            "valid": jax.device_put(valid, flag_sharded),
            "codes": jax.device_put(self.columns.codes[:, :capacity], col_sharded),
            "numerics": jax.device_put(self.columns.numerics[:, :capacity], col_sharded),
            "capacity": capacity,
            "staged_rows": n,  # later pure appends are host-searched until
            # folded (FlatIndex.add preserve + _host_tail_top_k)
        }
        return self._device

    def search(
        self,
        queries: np.ndarray,
        k: int,
        metadata_filter: Optional[Dict[str, Any]] = None,
        normalize: bool = True,
    ) -> List[List[SearchResult]]:
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        if normalize:
            norms = np.linalg.norm(queries, axis=1, keepdims=True)
            queries = queries / np.maximum(norms, 1e-12)

        state = self._device_state()
        spec, _ = self._compile(metadata_filter)
        k_eff = min(k, state["capacity"] // self.n_shards)
        # quantized shortlist + exact host rescore (FlatIndex._host_refine):
        # per-shard top-(mult·k) then the O(shards·mult·k) merged shortlist
        # rescores in f32 on the host mirror
        quantized = self._int8 or self._int4
        k_scan = k_eff
        if quantized and self.refine_mult > 1:
            k_scan = min(k_eff * self.refine_mult,
                         state["capacity"] // self.n_shards)
        key = (k_scan, self._int8, self._int4)
        fn = self._search_fns.get(key)
        if fn is None:
            fn = make_sharded_search(self.mesh, self.axis_name, k_scan,
                                     int8=self._int8, int4=self._int4)
            self._search_fns[key] = fn
        values, indices = fn(
            state["vectors"], state["row_scales"], state["valid"],
            state["codes"], state["numerics"], jnp.asarray(queries), spec,
        )
        values, indices = np.asarray(values), np.asarray(indices)
        if k_scan > k_eff:
            values, indices = self._host_refine(queries, values, indices,
                                                k_eff)
        tail = self._host_tail_top_k(queries, spec, k_eff,
                                     state["staged_rows"])
        if tail is not None:
            values, indices = self._merge_host_tail(values, indices, tail, k_eff)
        # bounds-checked result build (compaction racing the search)
        return self._hits_from(values, indices)
