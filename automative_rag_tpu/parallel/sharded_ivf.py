"""Mesh-sharded IVF: per-shard coarse quantizers + local probe-gather +
ICI all-gather merge.

Completes BASELINE config #5 at IVF speeds: each shard owns a contiguous
row range of the corpus and builds its own k-means lists (build = S
independent matmul-heavy k-means runs); a query runs the IVF probe-gather
on every shard in parallel under ``shard_map`` and only the [k] candidate
lists cross the interconnect. Fresh rows after a build are searched exactly
within each shard (global tail cutoff) and merged locally before the
collective, so upserts stay live without rebuilds.

Build artifacts are capacity-bound: growing past the built capacity (which
would re-split shard ranges) invalidates the build and search falls back to
the sharded exact path until ``rebuild()``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.filters import FilterSpec, eval_filter_mask
from ..index.flat import SearchResult
from ..index.ivf import (
    CSR_ALIGN,
    _ivf_budget_search_kernel,
    _pow2_at_least,
    choose_probe,
    probe_ladder,
)
from ..ops.kmeans import spherical_kmeans
from ..ops.topk import masked_top_k, merge_top_k
from .sharded_search import ShardedFlatIndex


@jax.jit
def _mask_count_kernel(valid, codes, numerics, spec: FilterSpec):
    """Global popcount of valid ∧ filter (one scalar over the sharded
    columns) — drives the up-front probe-width choice."""
    mask = valid & eval_filter_mask(codes, numerics, spec)
    return jnp.sum(mask.astype(jnp.int32))


def make_sharded_ivf_search(mesh: Mesh, axis_name: str, nprobe: int, k: int,
                            with_tail: bool, int8: bool = False):
    def _local(vectors, row_scales, valid, codes, numerics, centroids, table,
               queries, spec: FilterSpec, tail_start):
        # local blocks: vectors [rps, D], centroids [1, K, D], table [1, K, cap]
        # With int8 corpora the centroids stay float (quantizing them would
        # corrupt the coarse ranking for ~zero HBM win) and row_scales carries
        # the per-row dequant scales.
        centroids_l = centroids[0]
        table_l = table[0]
        rps = vectors.shape[0]
        if int8:
            q_scale = jnp.max(jnp.abs(queries), axis=1, keepdims=True) / 127.0
            q_i8 = jnp.clip(
                jnp.round(queries / jnp.maximum(q_scale, 1e-12)), -127, 127
            ).astype(jnp.int8)
            q = q_i8
        else:
            q = queries.astype(vectors.dtype)

        full_mask = valid & eval_filter_mask(codes, numerics, spec)
        shard = jax.lax.axis_index(axis_name)
        gid_base = shard * rps

        coarse = jax.lax.dot_general(
            queries.astype(centroids_l.dtype), centroids_l,
            (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # [B, K]
        nprobe_eff = min(nprobe, coarse.shape[1])
        _, probes = jax.lax.top_k(coarse, nprobe_eff)
        b = queries.shape[0]
        list_cap = table_l.shape[1]
        # probe streaming (same as index/ivf.py): the gather is bounded by
        # PROBE_GATHER_ROWS per chunk, memory flat in nprobe
        from ..index.ivf import PROBE_GATHER_ROWS

        chunk = max(1, min(nprobe_eff, PROBE_GATHER_ROWS // max(list_cap, 1)))
        while chunk * list_cap < k and chunk < nprobe_eff:
            chunk += 1
        n_chunks = -(-nprobe_eff // chunk)
        pad_p = n_chunks * chunk - nprobe_eff
        probe_valid = jnp.arange(n_chunks * chunk) < nprobe_eff
        probes_p = jnp.pad(probes, ((0, 0), (0, pad_p)))
        probes_s = probes_p.reshape(b, n_chunks, chunk).transpose(1, 0, 2)
        pvalid_s = probe_valid.reshape(n_chunks, chunk)
        k_run = min(k, chunk * list_cap)

        def probe_body(carry, inp):
            best_vals, best_rows = carry
            pr, pv = inp
            cand = jnp.where(pv[None, :, None], table_l[pr], -1)
            cand = cand.reshape(b, -1)
            safe = jnp.maximum(cand, 0)
            cand_vecs = vectors[safe]  # [B, M, D]
            scores = jnp.einsum(
                "bd,bmd->bm", q, cand_vecs,
                precision=None if int8 else jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.int32 if int8 else jnp.float32,
            )
            if int8:
                scores = scores.astype(jnp.float32) * q_scale * row_scales[safe]
            mask = (cand >= 0) & full_mask[safe]
            cv, pos = masked_top_k(scores, mask, k_run)
            cr = jnp.take_along_axis(cand, pos, axis=1)
            return merge_top_k(
                jnp.stack([best_vals, cv]), jnp.stack([best_rows, cr]), k_run
            ), None

        init = (
            jnp.full((b, k_run), -jnp.inf, jnp.float32),
            jnp.full((b, k_run), -1, jnp.int32),
        )
        (vals, rows), _ = jax.lax.scan(probe_body, init, (probes_s, pvalid_s))
        rows = jnp.where(rows >= 0, rows + gid_base, rows)
        if k_run < k:
            pad = k - k_run
            vals = jnp.concatenate(
                [vals, jnp.full((b, pad), -jnp.inf, vals.dtype)], axis=1
            )
            rows = jnp.concatenate(
                [rows, jnp.full((b, pad), -1, rows.dtype)], axis=1
            )

        if with_tail:
            # exact pass over this shard's fresh rows (global id ≥ tail_start)
            tail_scores = jax.lax.dot_general(
                q, vectors, (((1,), (1,)), ((), ())),
                precision=None if int8 else jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.int32 if int8 else jnp.float32,
            )
            if int8:
                tail_scores = (
                    tail_scores.astype(jnp.float32) * q_scale * row_scales[None, :]
                )
            local_ids = jax.lax.broadcasted_iota(jnp.int32, (rps, 1), 0).squeeze(-1)
            tail_mask = full_mask & (local_ids + gid_base >= tail_start)
            tail_vals, tail_idx = masked_top_k(tail_scores, tail_mask, k)
            vals, rows = merge_top_k(
                jnp.stack([vals, tail_vals]),
                jnp.stack([rows, tail_idx + gid_base]),
                k,
            )

        all_vals = jax.lax.all_gather(vals, axis_name)
        all_rows = jax.lax.all_gather(rows, axis_name)
        return merge_top_k(all_vals, all_rows, k)

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(
            P(axis_name, None),  # vectors
            P(axis_name),  # row scales (ones unless int8)
            P(axis_name),  # valid
            P(None, axis_name),  # codes
            P(None, axis_name),  # numerics
            P(axis_name, None, None),  # centroids [S, K, D]
            P(axis_name, None, None),  # list tables [S, K, cap]
            P(None, None),  # queries replicated
            P(),  # spec replicated
            P(),  # tail_start replicated
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_budget_search(mesh: Mesh, axis_name: str, budget: int,
                               k: int, int8: bool = False):
    """Budget-probing IVF under ``shard_map``: each shard runs the
    production ``_ivf_budget_search_kernel`` over its own CSR lists
    (variable-length, no balance constraint — same distribution
    robustness as the single-device r05 default) and only the [k]
    candidate lists cross the interconnect."""

    def _local(vectors, row_scales, valid, codes, numerics, centroids,
               sorted_rows, list_starts, scan_lens, queries,
               spec: FilterSpec):
        rps = vectors.shape[0]
        shard = jax.lax.axis_index(axis_name)
        gid_base = shard * rps
        full_mask = valid & eval_filter_mask(codes, numerics, spec)
        vals, rows = _ivf_budget_search_kernel(
            vectors, row_scales, full_mask, centroids[0], sorted_rows[0],
            list_starts[0], scan_lens[0], queries, budget, k, int8)
        rows = jnp.where(rows >= 0, rows + gid_base, rows)
        all_vals = jax.lax.all_gather(vals, axis_name)
        all_rows = jax.lax.all_gather(rows, axis_name)
        return merge_top_k(all_vals, all_rows, k)

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(
            P(axis_name, None),   # vectors
            P(axis_name),         # row scales
            P(axis_name),         # valid
            P(None, axis_name),   # codes
            P(None, axis_name),   # numerics
            P(axis_name, None, None),  # centroids [S, K, D]
            P(axis_name, None),   # sorted rows [S, M]
            P(axis_name, None),   # list starts [S, K]
            P(axis_name, None),   # scan lens [S, K]
            P(None, None),        # queries replicated
            P(),                  # spec replicated
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(sharded)


class ShardedIVFIndex(ShardedFlatIndex):
    def __init__(self, dim: int, mesh: Mesh, axis_name: str = "shard",
                 device_dtype: str = "bfloat16", n_lists: int = 0,
                 n_probe: int = 16, kmeans_iters: int = 10,
                 balance_factor: float = 1.25,
                 probe_mode: str = "budget"):
        super().__init__(dim, mesh, axis_name, device_dtype)
        if probe_mode not in ("budget", "table"):
            raise ValueError(f"unknown probe_mode {probe_mode!r}")
        self.n_lists = n_lists
        self.n_probe = n_probe
        self.kmeans_iters = kmeans_iters
        self.balance_factor = balance_factor
        self.probe_mode = probe_mode
        self._centroids: Optional[np.ndarray] = None  # [S, K, D]
        self._list_table: Optional[np.ndarray] = None  # [S, K, cap] local ids
        # budget mode: per-shard CSR arrays padded to common widths
        self._sorted_rows: Optional[np.ndarray] = None  # [S, M] local ids
        self._list_starts: Optional[np.ndarray] = None  # [S, K]
        self._scan_lens: Optional[np.ndarray] = None    # [S, K]
        self._built_live = 0
        self._built_capacity = 0
        self._indexed_rows = 0
        self._ivf_search_fns: Dict[Any, Any] = {}

    def _budget_of(self, level: int, k: int) -> int:
        """Per-shard scanned-slot budget for an ``n_probe`` level (the
        single-device mapping, computed on per-shard row counts)."""
        if self._sorted_rows is None:
            return 64
        m_slots = int(self._sorted_rows.shape[1])
        k_lists = max(1, self._centroids.shape[1])
        if level >= k_lists:
            return m_slots
        rpl = max(1.0, (self._built_live / max(1, self.n_shards))
                  / k_lists)
        raw = int(np.ceil(level * rpl))
        return min(_pow2_at_least(max(raw, k, 64), 64), m_slots)

    @property
    def tail_rows(self) -> int:
        return len(self._ids) - self._indexed_rows

    # ------------------------------------------------------------ mutation
    def add(self, vectors, documents, normalize: bool = True) -> List[str]:
        """Pure appends within the built capacity bucket keep the sharded
        device slab resident (restaging shards the whole corpus across the
        mesh — multi-GB at scale); the fresh rows are searched on the HOST
        (``_host_tail_top_k``) so they need no device placement at all.
        Upserts (which tombstone a built row) still invalidate — a stale
        validity mask would resurrect the old row in probes."""
        with self._mutex:
            built_state = self._device
            n_before = len(self._ids)
            deleted_before = int(self._deleted.sum())
            ids = super().add(vectors, documents, normalize)
            if (
                built_state is not None
                and self._centroids is not None
                and self._capacity(len(self._ids)) == self._built_capacity
                and int(self._deleted[:n_before].sum()) == deleted_before
            ):
                self._device = built_state
        return ids

# the fresh-tail host search itself is FlatIndex._host_tail_top_k
# (inherited); the IVF path calls it with start=_indexed_rows (the build
# boundary) while the exact fallback uses the staging watermark.

    def _built(self) -> bool:
        if self._centroids is None:
            return False
        # growth past the built capacity re-splits shard ranges → invalid
        return self._capacity(len(self._ids)) == self._built_capacity

    # ---------------------------------------------------------------- build
    def rebuild(self, n_lists: Optional[int] = None, seed: int = 0) -> Dict[str, Any]:
        n = len(self._ids)
        if n == 0:
            raise ValueError("cannot build an empty index")
        capacity = self._capacity(n)
        rps = capacity // self.n_shards
        if n_lists:
            self.n_lists = n_lists
        k_lists = self.n_lists or max(1, int(round(np.sqrt(max(rps, 1)))))

        normalized = self._vectors / np.maximum(
            np.linalg.norm(self._vectors, axis=1, keepdims=True), 1e-12
        )
        shard_tables: List[np.ndarray] = []
        shard_centroids: List[np.ndarray] = []
        max_cap = 8
        per_shard_info = []
        for s in range(self.n_shards):
            lo, hi = s * rps, min(n, (s + 1) * rps)
            rows = normalized[lo:hi]
            if rows.shape[0] == 0:
                shard_centroids.append(np.zeros((k_lists, self.dim), np.float32))
                shard_tables.append(None)
                per_shard_info.append(0)
                continue
            k_s = min(k_lists, rows.shape[0])
            if self.probe_mode == "budget":
                centroids, assign = spherical_kmeans(
                    rows, k_s, n_iters=self.kmeans_iters, seed=seed + s)
            else:
                centroids, assign, second, margin = spherical_kmeans(
                    rows, k_s, n_iters=self.kmeans_iters, seed=seed + s,
                    return_second=True,
                )
            if (k_s > 1 and self.balance_factor
                    and self.probe_mode == "table"):
                from ..index.ivf import balance_assignments

                assign = balance_assignments(
                    assign, second, k_s, self.balance_factor,
                    normalized=rows, centroids=centroids, margin=margin)
            if k_s < k_lists:  # pad centroid count to the common K
                centroids = np.concatenate(
                    [centroids, np.zeros((k_lists - k_s, self.dim), np.float32)]
                )
            counts = np.bincount(assign, minlength=k_lists)
            max_cap = max(max_cap, int(counts.max()))
            shard_centroids.append(centroids)
            shard_tables.append(assign)
            per_shard_info.append(rows.shape[0])

        if self.probe_mode == "budget":
            # per-shard CSR padded to a COMMON pow2 slot width (shard_map
            # needs one static shape across the mesh)
            prepared = []
            for assign in shard_tables:
                if assign is None:
                    prepared.append(None)
                    continue
                counts = np.bincount(assign, minlength=k_lists)
                slack = np.maximum(CSR_ALIGN, counts // 4)
                span = (-(-(counts + slack) // CSR_ALIGN)
                        * CSR_ALIGN).astype(np.int64)
                starts = np.zeros(k_lists, np.int64)
                np.cumsum(span[:-1], out=starts[1:])
                prepared.append((assign, counts, span, starts))
            m_slots = _pow2_at_least(int(max(
                (int(p[2].sum()) for p in prepared if p is not None),
                default=CSR_ALIGN)))
            sorted_rows = np.full((self.n_shards, m_slots), -1, np.int32)
            starts_arr = np.zeros((self.n_shards, k_lists), np.int32)
            lens_arr = np.zeros((self.n_shards, k_lists), np.int32)
            for s, p in enumerate(prepared):
                if p is None:
                    continue
                assign, counts, span, starts = p
                order = np.argsort(assign, kind="stable").astype(np.int64)
                sa = assign[order]
                gs = np.searchsorted(sa, np.arange(k_lists))
                slots = np.arange(assign.size, dtype=np.int64) - gs[sa]
                sorted_rows[s, starts[sa] + slots] = order.astype(np.int32)
                starts_arr[s] = starts.astype(np.int32)
                lens_arr[s] = np.minimum(
                    -(-counts // CSR_ALIGN) * CSR_ALIGN, span
                ).astype(np.int32)
            self._sorted_rows = sorted_rows
            self._list_starts = starts_arr
            self._scan_lens = lens_arr
            self._list_table = None
            self._built_live = n
            list_cap = int(max(
                (int(p[1].max()) for p in prepared if p is not None),
                default=0))
            csr_slots = m_slots
        else:
            list_cap = -(-max_cap // 8) * 8
            tables = np.full(
                (self.n_shards, k_lists, list_cap), -1, np.int32)
            for s, assign in enumerate(shard_tables):
                if assign is None:
                    continue
                # vectorized bucket fill: rank within cluster, stable sort
                m = assign.shape[0]
                order = np.argsort(assign, kind="stable").astype(np.int64)
                sorted_assign = assign[order]
                starts = np.searchsorted(sorted_assign, np.arange(k_lists))
                slots = np.arange(m, dtype=np.int64) - starts[sorted_assign]
                tables[s, sorted_assign, slots] = order.astype(np.int32)
            self._list_table = tables
            self._sorted_rows = None
            self._list_starts = self._scan_lens = None
            csr_slots = 0

        self._centroids = np.stack(shard_centroids)
        self._built_capacity = capacity
        self._indexed_rows = n
        self._device = None
        info = {
            "n_shards": self.n_shards,
            "probe_mode": self.probe_mode,
            "n_lists_per_shard": k_lists,
            "list_cap": list_cap,
            "rows_indexed": n,
            "rows_per_shard": per_shard_info,
        }
        if self.probe_mode == "budget":
            info["csr_slots"] = csr_slots
        return info

    def _compact_locked(self) -> Dict[str, Any]:
        """Compaction shifts rows ACROSS shard boundaries (local ids are
        relative to fixed per-shard ranges of the built capacity), so the
        build artifacts can't be remapped like the single-device table —
        drop them and signal the caller to rebuild."""
        info = super()._compact_locked()
        if info.get("live_order") is not None and self._centroids is not None:
            self._centroids = None
            self._list_table = None
            self._sorted_rows = None
            self._list_starts = self._scan_lens = None
            self._built_capacity = 0
            self._indexed_rows = 0
            info["rebuild_required"] = True
        return info

    # --------------------------------------------------------------- device
    def _device_state(self) -> dict:
        with self._mutex:
            return self._device_state_locked()

    def _device_state_locked(self) -> dict:
        if self._device is not None:
            return self._device
        state = super()._device_state_locked()
        if self._built():
            spec3 = NamedSharding(self.mesh, P(self.axis_name, None, None))
            spec2 = NamedSharding(self.mesh, P(self.axis_name, None))
            # centroids stay float for int8 corpora (coarse ranking quality)
            cdtype = jnp.bfloat16 if self._int8 else self.device_dtype
            state["centroids"] = jax.device_put(
                self._centroids.astype(cdtype), spec3
            )
            if self._sorted_rows is not None:
                state["sorted_rows"] = jax.device_put(
                    self._sorted_rows, spec2)
                state["list_starts"] = jax.device_put(
                    self._list_starts, spec2)
                state["scan_lens"] = jax.device_put(self._scan_lens, spec2)
            else:
                state["list_table"] = jax.device_put(
                    self._list_table, spec3)
        self._device = state
        return state

    # --------------------------------------------------------------- search
    def search(self, queries: np.ndarray, k: int,
               metadata_filter: Optional[Dict[str, Any]] = None,
               normalize: bool = True,
               n_probe: Optional[int] = None,
               pin_probe: bool = False) -> List[List[SearchResult]]:
        """Same ``n_probe``-is-a-base / ``pin_probe`` semantics as
        ``IVFIndex.search``."""
        if not self._built():
            return super().search(queries, k, metadata_filter, normalize)

        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        if normalize:
            norms = np.linalg.norm(queries, axis=1, keepdims=True)
            queries = queries / np.maximum(norms, 1e-12)

        state = self._device_state()
        spec, _ = self._compile(metadata_filter)
        k_eff = min(k, state["capacity"] // self.n_shards)
        max_probe = self._centroids.shape[1]
        base = min(n_probe or self.n_probe, max_probe)
        ladder = probe_ladder(base, max_probe)
        if metadata_filter and not pin_probe:
            # selectivity-driven up-front probe width (same policy as the
            # single-device IVF; ladder-quantized so escalation never mints
            # a fresh executable)
            count = int(_mask_count_kernel(
                state["valid"], state["codes"], state["numerics"], spec
            ))
            selectivity = count / max(1, len(self._ids))
            rows_per_list = max(
                1.0, self._indexed_rows / max(1, self.n_shards * max_probe)
            )
            nprobe = choose_probe(ladder, selectivity, rows_per_list, k_eff)
        else:
            nprobe = base

        # fresh tail: computed ONCE on the host (no device placement, no
        # extra dispatch, no with_tail executable fork) and merged into
        # every probe-width's results below
        tail = (self._host_tail_top_k(queries, spec, k_eff,
                                      self._indexed_rows)
                if self.tail_rows > 0 else None)

        budget_mode = self._sorted_rows is not None

        def _run(nprobe_now: int):
            if budget_mode:
                budget = self._budget_of(nprobe_now, k_eff)
                key = ("budget", k_eff, budget, self._int8)
                fn = self._ivf_search_fns.get(key)
                if fn is None:
                    fn = make_sharded_budget_search(
                        self.mesh, self.axis_name, budget, k_eff,
                        int8=self._int8)
                    self._ivf_search_fns[key] = fn
                vals, rows = fn(
                    state["vectors"], state["row_scales"], state["valid"],
                    state["codes"], state["numerics"], state["centroids"],
                    state["sorted_rows"], state["list_starts"],
                    state["scan_lens"], jnp.asarray(queries), spec,
                )
                vals, rows = np.asarray(vals), np.asarray(rows)
                if tail is not None:
                    all_vals = np.concatenate([vals, tail[0]], axis=1)
                    all_rows = np.concatenate(
                        [rows.astype(np.int64), tail[1]], axis=1)
                    order = np.argsort(-all_vals, axis=1)[:, :k_eff]
                    vals = np.take_along_axis(all_vals, order, axis=1)
                    rows = np.take_along_axis(all_rows, order, axis=1)
                return vals, rows
            key = (k_eff, nprobe_now, self._int8)
            fn = self._ivf_search_fns.get(key)
            if fn is None:
                fn = make_sharded_ivf_search(
                    self.mesh, self.axis_name, nprobe_now, k_eff,
                    with_tail=False, int8=self._int8,
                )
                self._ivf_search_fns[key] = fn
            vals, rows = fn(
                state["vectors"], state["row_scales"], state["valid"],
                state["codes"], state["numerics"], state["centroids"],
                state["list_table"], jnp.asarray(queries), spec,
                jnp.int32(self._indexed_rows),
            )
            vals, rows = np.asarray(vals), np.asarray(rows)
            if tail is not None:
                all_vals = np.concatenate([vals, tail[0]], axis=1)
                all_rows = np.concatenate([rows.astype(np.int64), tail[1]],
                                          axis=1)
                order = np.argsort(-all_vals, axis=1)[:, :k_eff]
                vals = np.take_along_axis(all_vals, order, axis=1)
                rows = np.take_along_axis(all_rows, order, axis=1)
            return vals, rows

        vals, rows = _run(nprobe)
        if metadata_filter:
            # backstop escalation over the remaining ladder levels only
            for lvl in ladder:
                if lvl <= nprobe:
                    continue
                if np.isfinite(vals).sum(axis=1).min() >= k_eff:
                    break
                nprobe = lvl
                vals, rows = _run(nprobe)

        # snapshot + bounds check: a compaction racing the search swaps
        # _docs for a shorter remapped list (see FlatIndex._hits_from)
        with self._mutex:
            docs = self._docs
            n_docs = len(docs)
        out: List[List[SearchResult]] = []
        for b in range(vals.shape[0]):
            hits, seen = [], set()
            for score, row in zip(vals[b], rows[b]):
                row = int(row)
                if not np.isfinite(score) or row in seen or not 0 <= row < n_docs:
                    continue
                seen.add(row)
                hits.append(SearchResult(docs[row], float(score), row))
            out.append(hits)
        return out

    def precompile_ladder(self, k: int = 20) -> List[int]:
        """Pre-compile the probe ladder's shard_map executables (the first
        selective filtered query must not stall on a remote compile)."""
        if not self._built() or len(self._ids) == 0:
            return []
        state = self._device_state()
        k_eff = min(k, state["capacity"] // self.n_shards)
        dummy = np.zeros((1, self.dim), np.float32)
        spec, _ = self._compile(None)
        levels = probe_ladder(
            min(self.n_probe, self._centroids.shape[1]), self._centroids.shape[1]
        )
        if self._sorted_rows is not None:
            compiled = set()
            for lvl in levels:
                budget = self._budget_of(lvl, k_eff)
                if budget in compiled:
                    continue
                compiled.add(budget)
                key = ("budget", k_eff, budget, self._int8)
                fn = self._ivf_search_fns.get(key)
                if fn is None:
                    fn = make_sharded_budget_search(
                        self.mesh, self.axis_name, budget, k_eff,
                        int8=self._int8)
                    self._ivf_search_fns[key] = fn
                fn(state["vectors"], state["row_scales"], state["valid"],
                   state["codes"], state["numerics"], state["centroids"],
                   state["sorted_rows"], state["list_starts"],
                   state["scan_lens"], jnp.asarray(dummy), spec)
            return levels
        for lvl in levels:
            key = (k_eff, lvl, self.tail_rows > 0, self._int8)
            fn = self._ivf_search_fns.get(key)
            if fn is None:
                fn = make_sharded_ivf_search(
                    self.mesh, self.axis_name, lvl, k_eff,
                    with_tail=self.tail_rows > 0, int8=self._int8,
                )
                self._ivf_search_fns[key] = fn
            fn(state["vectors"], state["row_scales"], state["valid"],
               state["codes"], state["numerics"], state["centroids"],
               state["list_table"], jnp.asarray(dummy), spec,
               jnp.int32(self._indexed_rows))
        return levels

    # ----------------------------------------------------------- persist
    def save(self, directory: str) -> None:
        super().save(directory)
        if self._centroids is not None:
            from pathlib import Path

            arrays: Dict[str, Any] = dict(
                centroids=self._centroids,
                built_capacity=np.int64(self._built_capacity),
                indexed_rows=np.int64(self._indexed_rows),
                n_probe=np.int64(self.n_probe),
                n_shards=np.int64(self.n_shards),
            )
            if self._sorted_rows is not None:
                arrays.update(
                    csr_rows=self._sorted_rows,
                    csr_starts=self._list_starts,
                    csr_lens=self._scan_lens,
                    built_live=np.int64(self._built_live),
                )
            else:
                arrays["list_table"] = self._list_table
            np.savez_compressed(
                Path(directory) / "sharded_ivf.npz", **arrays)

    def restore_build(self, directory: str) -> bool:
        """Re-attach saved IVF build artifacts after the flat row state has
        been restored. Returns False (exact-search fallback, rebuild needed)
        when no artifact exists or the mesh width changed — the shard row
        split, and therefore every local list table, is n_shards-specific."""
        from pathlib import Path

        path = Path(directory) / "sharded_ivf.npz"
        if not path.exists():
            return False
        arrays = np.load(path)
        if int(arrays["n_shards"]) != self.n_shards:
            return False
        self._centroids = np.asarray(arrays["centroids"], np.float32)
        if "csr_rows" in arrays:
            self.probe_mode = "budget"
            self._sorted_rows = np.asarray(arrays["csr_rows"], np.int32)
            self._list_starts = np.asarray(arrays["csr_starts"], np.int32)
            self._scan_lens = np.asarray(arrays["csr_lens"], np.int32)
            self._built_live = int(arrays["built_live"])
            self._list_table = None
        else:
            self.probe_mode = "table"
            self._list_table = np.asarray(arrays["list_table"], np.int32)
            self._sorted_rows = None
            self._list_starts = self._scan_lens = None
        self._built_capacity = int(arrays["built_capacity"])
        self._indexed_rows = int(arrays["indexed_rows"])
        self.n_probe = int(arrays["n_probe"])
        self.n_lists = self._centroids.shape[1]
        self._device = None
        return self._built()

    def stats(self) -> Dict[str, Any]:
        base = super().stats()
        base.update({
            "kind": "sharded-ivf",
            "probe_mode": self.probe_mode,
            "built": self._built(),
            "n_shards": self.n_shards,
            "n_probe": self.n_probe,
            "rows_indexed": self._indexed_rows,
            "tail_rows": self.tail_rows,
        })
        return base
