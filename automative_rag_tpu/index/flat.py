"""Flat exact-cosine vector index, HBM-resident, searched on the MXU.

TPU-native replacement for the reference's Qdrant-backed store
(``src/core/query/retrieval/vectorstore.py``): vectors live as one padded
[capacity, dim] device array (bf16 by default), metadata lives in the
columnar store of ``filters.py``, and a search is a single jitted program:

    scores = Q @ Vᵀ  (MXU, fp32 accumulation)
    mask   = valid ∧ filter-bitmask
    top-k  = jax.lax.top_k(where(mask, scores, -inf))

Capacity is padded to a power-of-two multiple of 128, so XLA recompiles only
when the corpus crosses a capacity bucket — live upserts/deletes touch host
mirrors and are flushed to the device lazily (append-buffer semantics without
dynamic shapes). Supports add/search/scroll/delete/stats/save/load — the
functional surface of the reference store (:124-472).
"""

from __future__ import annotations

import json
import threading
import time
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..documents.schema import Document
from ..ops.topk import masked_top_k
from .filters import (
    FilterError,
    FilterSpec,
    MetadataColumns,
    compile_filter,
    eval_filter_mask,
    eval_filter_mask_np,
)


@dataclass
class SearchResult:
    document: Document
    score: float
    row: int


def _round_capacity(n: int) -> int:
    """Smallest power-of-two ≥ n that is also ≥ 128 (TPU lane alignment)."""
    cap = 128
    while cap < n:
        cap *= 2
    return cap


@partial(jax.jit, static_argnames=("k",))
def _search_kernel(vectors, valid, codes, numerics, queries, spec: FilterSpec, k: int):
    # [B, D] @ [N, D]ᵀ on the MXU with fp32 accumulation. HIGHEST precision:
    # for bf16-stored corpora this is the native MXU mode anyway; for f32 it
    # prevents the backend's default low-precision matmul pass.
    scores = jax.lax.dot_general(
        queries.astype(vectors.dtype),
        vectors,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    mask = valid & eval_filter_mask(codes, numerics, spec)
    return masked_top_k(scores, mask, k)


@partial(jax.jit, static_argnames=("k", "approx"))
def _search_kernel_int8(
    vectors_i8, row_scales, valid, codes, numerics, queries, spec: FilterSpec,
    k: int, approx: bool = False
):
    """Symmetric-int8 corpus search: the int32 MXU matmul runs at 2× bf16
    throughput and the corpus HBM footprint halves; per-row and per-query
    scales restore cosine scores (rank error ≲1%, repaired by rerank)."""
    q_scale = jnp.max(jnp.abs(queries), axis=1, keepdims=True) / 127.0
    q_i8 = jnp.clip(
        jnp.round(queries / jnp.maximum(q_scale, 1e-12)), -127, 127
    ).astype(jnp.int8)
    raw = jax.lax.dot_general(
        q_i8,
        vectors_i8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [B, N] int32
    scores = raw.astype(jnp.float32) * q_scale * row_scales[None, :]
    mask = valid & eval_filter_mask(codes, numerics, spec)
    return masked_top_k(scores, mask, k, approx=approx)


@partial(jax.jit, static_argnames=("k", "interpret", "approx"))
def _search_kernel_int4(
    packed, row_scales, valid, codes, numerics, queries, spec: FilterSpec,
    k: int, interpret: bool, approx: bool = False
):
    """w4a16 corpus search: the corpus is the packed int4 weight matrix of
    the fused Pallas kernel (``ops/quant_matmul.w4_matmul`` — nibbles
    unpack in registers on the way into the MXU, HBM only ever sees packed
    bytes). Queries stay full precision, so the rank error is weight-only
    int4 (~the 7B LLM's 0.003 rel err per matmul) at HALF the int8
    corpus footprint: 512 B/row at dim 1024."""
    from ..ops.quant_matmul import w4_matmul

    scores = w4_matmul(
        queries.astype(jnp.float32), packed, row_scales, interpret=interpret
    ).astype(jnp.float32)
    mask = valid & eval_filter_mask(codes, numerics, spec)
    return masked_top_k(scores, mask, k, approx=approx)


@jax.jit
def _mask_kernel(valid, codes, numerics, spec: FilterSpec):
    return valid & eval_filter_mask(codes, numerics, spec)


class FlatIndex:
    """Exact cosine search over an HBM-resident corpus."""

    def __init__(self, dim: int, device_dtype: str = "bfloat16",
                 refine_mult: int = 8, topk_approx: bool = True):
        self.dim = dim
        # approximate SHORTLIST selection (lax.approx_max_k) for the
        # refined quantized scan only: the host refine rescores the
        # shortlist exactly, and at k_scan=8·k the approximate shortlist
        # contained the full exact top-10 at 10M rows (BENCH_TOPK_AB_r04)
        # — exact hierarchical selection cost ~3× the scan itself there.
        # Never used when results come straight from the device top-k.
        self.topk_approx = bool(topk_approx)
        if str(device_dtype) == "int4":
            # stored as packed nibble pairs in uint8 (pack_w4 layout)
            if dim % 2:
                raise ValueError("int4 storage needs an even dim")
            self._dtype_name = "int4"
            self.device_dtype = jnp.dtype(jnp.uint8)
        else:
            self.device_dtype = jnp.dtype(device_dtype)
            self._dtype_name = self.device_dtype.name
        # quantized-scan refine: the device int8/int4 kernel returns a
        # refine_mult·k shortlist whose rows the HOST f32 mirror rescores
        # exactly (a few hundred numpy dots — µs against the ms-scale
        # device scan). Repairs quantization rank error without any extra
        # HBM: 10M int4 direct recall@10 is 0.7063 (BENCH_SCALE_10M_r04)
        # because weight-only nibble noise shuffles the LOCAL order, but
        # the true top-k almost always sits inside a modest shortlist.
        # 0 disables (scores then come from the quantized kernel).
        self.refine_mult = int(refine_mult)
        # host mirrors (source of truth). _vectors/_deleted are exact-size
        # VIEWS over geometric-growth buffers: r03 measured 101.8 s to append
        # 10 rows at 1M×1024 because add() np.concatenate'd the full mirror
        # per call — growth slack makes appends amortized O(rows appended).
        self._nrows = 0
        self._vec_buf = np.zeros((0, dim), np.float32)
        self._del_buf = np.zeros(0, bool)
        self._docs: List[Document] = []
        self._ids: List[str] = []
        self._row_of_id: Dict[str, int] = {}
        self.columns = MetadataColumns()
        # device cache
        self._device: Optional[dict] = None
        # bumped by row-remapping operations (compact): searches that
        # overlapped a remap retry so their row ids match the live table
        self._generation = 0
        # guards host mirrors + device staging: ingestion runs on a worker
        # thread while direct API paths (debug-retrieval, /query/batch) may
        # search concurrently
        self._mutex = threading.RLock()

    # ------------------------------------------------------ host mirrors
    @property
    def _vectors(self) -> np.ndarray:
        return self._vec_buf[: self._nrows]

    @_vectors.setter
    def _vectors(self, arr: np.ndarray) -> None:
        # wholesale replacement (compact/load/transplant): the new array IS
        # the buffer; _nrows follows it. Callers replace _deleted right after.
        arr = np.asarray(arr, np.float32)
        self._vec_buf = arr
        self._nrows = arr.shape[0]

    @property
    def _deleted(self) -> np.ndarray:
        return self._del_buf[: self._nrows]

    @_deleted.setter
    def _deleted(self, arr: np.ndarray) -> None:
        arr = np.asarray(arr, bool)
        if arr.shape[0] != self._nrows:
            raise ValueError(
                f"deleted mask rows {arr.shape[0]} != vector rows "
                f"{self._nrows} (set _vectors first)")
        self._del_buf = arr

    def _ensure_host_capacity(self, n: int) -> None:
        """Grow the host buffers to hold ≥ n rows (1.5× geometric, so a
        10M-row mirror doesn't round up to 2× host RAM like pow2 would).
        Always leaves ≥12.5% slack past n: a bulk add sized exactly to the
        corpus would otherwise make the FIRST later append pay the full
        regrowth copy (4 GB at 1M×1024 — the bench measured exactly that)."""
        cap = self._vec_buf.shape[0]
        if cap >= n:
            return
        new_cap = max(n + n // 8, (cap * 3) // 2, 1024)
        vec = np.empty((new_cap, self.dim), np.float32)
        vec[: self._nrows] = self._vec_buf[: self._nrows]
        dele = np.zeros(new_cap, bool)
        dele[: self._nrows] = self._del_buf[: self._nrows]
        self._vec_buf, self._del_buf = vec, dele

    # ------------------------------------------------------------------ size
    @property
    def count(self) -> int:
        return int((~self._deleted).sum())

    @property
    def total_rows(self) -> int:
        return len(self._ids)

    # ------------------------------------------------------------ mutation
    def add(
        self,
        vectors: np.ndarray,
        documents: Sequence[Document],
        normalize: bool = True,
    ) -> List[str]:
        """Upsert documents with their embedding vectors.

        Vectors are L2-normalized so dot product == cosine similarity
        (parity with the reference's cosine-distance collection,
        ``vectorstore.py:60-87``).
        """
        vectors = np.asarray(vectors, np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != self.dim:
            raise ValueError(f"expected vectors [N, {self.dim}], got {vectors.shape}")
        if len(documents) != vectors.shape[0]:
            raise ValueError("documents/vectors length mismatch")
        if normalize:
            norms = np.linalg.norm(vectors, axis=1, keepdims=True)
            vectors = vectors / np.maximum(norms, 1e-12)

        for doc in documents:
            doc.stamp_ingestion()

        with self._mutex:
            state = self._device
            start = len(self._ids)
            n_new = len(documents)
            capacity = _round_capacity(start + n_new)

            self._ensure_host_capacity(start + n_new)
            self._vec_buf[start : start + n_new] = vectors
            self._del_buf[start : start + n_new] = False
            self._nrows = start + n_new
            self.columns.append_rows([d.metadata for d in documents], capacity)
            new_ids = [doc.id for doc in documents]
            upserted = False
            # bulk-ingest fast path: per-doc dict/append calls cost ~100 µs
            # each in Python — 2 min of pure bookkeeping at 1M rows
            if not any(did in self._row_of_id for did in new_ids) \
                    and len(set(new_ids)) == len(new_ids):
                self._ids.extend(new_ids)
                self._docs.extend(documents)
                self._row_of_id.update(
                    zip(new_ids, range(start, start + n_new)))
            else:
                for i, doc in enumerate(documents):
                    row = start + i
                    if doc.id in self._row_of_id:
                        # upsert: tombstone the previous row
                        self._deleted[self._row_of_id[doc.id]] = True
                        upserted = True
                    self._row_of_id[doc.id] = row
                    self._ids.append(doc.id)
                    self._docs.append(doc)
            self._device = None
            if (
                state is not None
                and not upserted
                and start + n_new - state.get("staged_rows", 0)
                <= self._tail_fold_threshold(state)
            ):
                # pure append under the fold threshold: keep the staged slab
                # resident (restaging is a full host→HBM transfer of the
                # corpus — ~2 GB at 1M×1024 bf16); rows ≥ staged_rows are
                # searched on the host until the tail folds. An upsert
                # tombstones a STAGED row, whose stale validity would
                # resurrect it — that path restages.
                self._device = state
        return new_ids

    @staticmethod
    def _tail_fold_threshold(state: dict) -> int:
        """Host-searched tail budget before the next search restages: 1% of
        the staged corpus, floor 1024 rows — the host exact scan at that
        size costs less than the restage it defers."""
        return max(1024, state.get("staged_rows", 0) // 100)

    def delete_by_ids(self, ids: Sequence[str]) -> int:
        deleted = 0
        with self._mutex:
            return self._delete_by_ids_locked(ids)

    def _delete_by_ids_locked(self, ids: Sequence[str]) -> int:
        deleted = 0
        for doc_id in ids:
            row = self._row_of_id.pop(doc_id, None)
            if row is not None and not self._deleted[row]:
                self._deleted[row] = True
                deleted += 1
        if deleted:
            self._device = None
        return deleted

    def delete_by_filter(self, metadata_filter: Dict[str, Any]) -> int:
        rows = self._filter_rows(metadata_filter)
        return self.delete_by_ids([self._ids[r] for r in rows])

    def compact(self) -> Dict[str, Any]:
        """Reclaim tombstoned rows: rewrite the host mirrors with live rows
        only (original order preserved) and restage the device state.
        Upserts/deletes only tombstone (XLA static shapes), so a churn-heavy
        corpus otherwise scans — and pays HBM for — every row it ever held;
        Qdrant reclaims this in its optimizer, an HBM-resident index must do
        it explicitly (``vectorstore.py:320-353`` delete semantics).

        Returns ``live_order`` (old row ids, in surviving order) so callers
        can realign row-aligned sidecars (the ColBERT token store)."""
        with self._mutex:
            return self._compact_locked()

    def _compact_locked(self) -> Dict[str, Any]:
        n = len(self._ids)
        live = np.nonzero(~self._deleted[:n])[0]
        reclaimed = n - int(live.size)
        if reclaimed == 0:
            return {"reclaimed_rows": 0, "rows": n, "live_order": None}
        self._vectors = np.ascontiguousarray(self._vectors[live])
        self._docs = [self._docs[int(r)] for r in live]
        self._ids = [self._ids[int(r)] for r in live]
        self._row_of_id = {doc_id: row for row, doc_id in enumerate(self._ids)}
        self._deleted = np.zeros(live.size, bool)
        self.columns.select_rows(live)
        self._device = None
        self._generation += 1
        return {
            "reclaimed_rows": reclaimed,
            "rows": int(live.size),
            "live_order": live,
        }

    # ------------------------------------------------------------- device
    @property
    def _int8(self) -> bool:
        return self.device_dtype == jnp.int8

    @property
    def _int4(self) -> bool:
        return self._dtype_name == "int4"

    def _device_state(self) -> dict:
        with self._mutex:
            return self._device_state_locked()

    def _device_state_locked(self) -> dict:
        if self._device is not None:
            return self._device
        n = len(self._ids)
        capacity = _round_capacity(max(n, 1))
        vectors = np.zeros((capacity, self.dim), np.float32)
        vectors[:n] = self._vectors
        valid = np.zeros(capacity, bool)
        valid[:n] = ~self._deleted
        self.columns._grow(capacity)
        self._device = {
            "valid": jnp.asarray(valid),
            "codes": jnp.asarray(self.columns.codes[:, :capacity]),
            "numerics": jnp.asarray(self.columns.numerics[:, :capacity]),
            "capacity": capacity,
            "staged_rows": n,  # rows the slab covers; later appends are
            # host-searched (see add / _host_tail_top_k) until folded
        }
        if self._int8:
            scales = np.abs(vectors).max(axis=1) / 127.0
            quantized = np.clip(
                np.round(vectors / np.maximum(scales[:, None], 1e-12)), -127, 127
            ).astype(np.int8)
            self._device["vectors"] = jnp.asarray(quantized)
            self._device["row_scales"] = jnp.asarray(scales, jnp.float32)
        elif self._int4:
            # corpus as the packed weight matrix of the fused w4a16 kernel:
            # [D/2, cap] uint8 nibbles + per-row scales
            from ..ops.quant_matmul import pack_w4

            packed, scales = pack_w4(np.ascontiguousarray(vectors.T))
            self._device["vectors"] = jnp.asarray(packed)
            self._device["row_scales"] = jnp.asarray(scales, jnp.float32)
        else:
            self._device["vectors"] = jnp.asarray(vectors, self.device_dtype)
        return self._device

    # -------------------------------------------------------------- search
    def _compile(self, metadata_filter: Optional[Dict[str, Any]]) -> Tuple[FilterSpec, bool]:
        """Compile the filter; on error, fall back to match-all (reference
        falls back to unfiltered search on filter errors,
        ``vectorstore.py:195-213``)."""
        if not metadata_filter:
            return FilterSpec.match_all(), True
        try:
            return compile_filter(metadata_filter, self.columns), True
        except FilterError:
            return FilterSpec.match_all(), False

    def _host_tail_top_k(self, queries: np.ndarray, spec, k: int,
                         start: int):
        """Exact top-k over host-only rows [start, n) — the appends since
        the device slab was staged. Small by construction (``add`` folds
        the tail past ``_tail_fold_threshold``), so a numpy dot beats
        restaging the corpus. Returns (vals, rows) padded to k, or None."""
        with self._mutex:
            n = len(self._ids)
            if n <= start:
                return None
            vecs = np.array(self._vectors[start:n], np.float32)
            valid = ~self._deleted[start:n]
            codes = np.array(self.columns.codes[:, start:n])
            numerics = np.array(self.columns.numerics[:, start:n])
        mask = valid & eval_filter_mask_np(codes, numerics, spec)
        scores = queries.astype(np.float32) @ vecs.T
        scores = np.where(mask[None, :], scores, -np.inf)
        k_t = min(k, scores.shape[1])
        idx = np.argpartition(-scores, k_t - 1, axis=1)[:, :k_t]
        vals = np.take_along_axis(scores, idx, axis=1)
        order = np.argsort(-vals, axis=1)
        vals = np.take_along_axis(vals, order, axis=1)
        rows = (np.take_along_axis(idx, order, axis=1) + start).astype(np.int64)
        rows = np.where(np.isfinite(vals), rows, -1)
        if k_t < k:
            pad = ((0, 0), (0, k - k_t))
            vals = np.pad(vals, pad, constant_values=-np.inf)
            rows = np.pad(rows, pad, constant_values=-1)
        return vals, rows

    def _host_refine(self, queries: np.ndarray, values: np.ndarray,
                     indices: np.ndarray, k: int):
        """Exact f32 rescore of the quantized kernel's shortlist against
        the host mirror, truncated back to k. Scores returned to callers
        are therefore TRUE cosines (the quantized score only ever ranks
        the shortlist). The mirror view is captured under the mutex; a
        compaction racing this swaps ``_vec_buf`` for a new array, but the
        captured view keeps the OLD buffer alive — consistent with the
        device slab that produced the row ids — and the caller's
        generation check retries against the post-compact state."""
        with self._mutex:
            vecs = self._vectors
            n = vecs.shape[0]
        B = indices.shape[0]
        out_v = np.full((B, k), -np.inf, np.float32)
        out_r = np.full((B, k), -1, np.int64)
        for b in range(B):
            ok = np.isfinite(values[b]) & (indices[b] >= 0) & (indices[b] < n)
            rows = indices[b][ok].astype(np.int64)
            if rows.size == 0:
                continue
            scores = np.asarray(vecs[rows], np.float32) @ queries[b]
            order = np.argsort(-scores)[:k]
            out_v[b, : order.size] = scores[order]
            out_r[b, : order.size] = rows[order]
        return out_v, out_r

    def _hits_from(self, values: np.ndarray, indices: np.ndarray
                   ) -> List[List[SearchResult]]:
        """Build result lists with a bounds check: a compaction racing the
        search swaps ``_docs`` for a shorter remapped list, and an unguarded
        ``_docs[row]`` crashes the query (generation retry in ``search``
        makes this consistent; the bound is the backstop)."""
        with self._mutex:
            docs = self._docs
            n = len(docs)
        out: List[List[SearchResult]] = []
        for b in range(values.shape[0]):
            hits = []
            for score, row in zip(values[b], indices[b]):
                row = int(row)
                if not np.isfinite(score) or not 0 <= row < n:
                    continue
                hits.append(SearchResult(docs[row], float(score), row))
            out.append(hits)
        return out

    @staticmethod
    def _merge_host_tail(values, indices, tail, k: int):
        all_vals = np.concatenate([values, tail[0]], axis=1)
        all_rows = np.concatenate([indices.astype(np.int64), tail[1]], axis=1)
        order = np.argsort(-all_vals, axis=1)[:, :k]
        return (np.take_along_axis(all_vals, order, axis=1),
                np.take_along_axis(all_rows, order, axis=1))

    def search(
        self,
        queries: np.ndarray,
        k: int,
        metadata_filter: Optional[Dict[str, Any]] = None,
        normalize: bool = True,
    ) -> List[List[SearchResult]]:
        """Batched filtered cosine top-k. Returns per-query result lists."""
        queries = np.asarray(queries, np.float32)
        squeeze = queries.ndim == 1
        if squeeze:
            queries = queries[None, :]
        if normalize:
            norms = np.linalg.norm(queries, axis=1, keepdims=True)
            queries = queries / np.maximum(norms, 1e-12)

        spec, _ = self._compile(metadata_filter)
        # generation retry: a compaction landing mid-search remaps rows, so
        # the slab the kernel scored and the doc table the results index
        # would disagree — recompute against the post-compact state
        for _attempt in range(3):
            with self._mutex:
                state = self._device_state_locked()
                generation = self._generation
            k_eff = min(k, state["capacity"])
            quantized = self._int8 or self._int4
            k_scan = k_eff
            if quantized and self.refine_mult > 1:
                k_scan = min(k_eff * self.refine_mult, state["capacity"])
            # approximate shortlist selection is only sound when the
            # host refine rescores it exactly afterwards
            approx = bool(self.topk_approx and k_scan > k_eff)
            if self._int8:
                values, indices = _search_kernel_int8(
                    state["vectors"], state["row_scales"], state["valid"],
                    state["codes"], state["numerics"], jnp.asarray(queries),
                    spec, k_scan, approx=approx,
                )
            elif self._int4:
                values, indices = _search_kernel_int4(
                    state["vectors"], state["row_scales"], state["valid"],
                    state["codes"], state["numerics"], jnp.asarray(queries),
                    spec, k_scan, jax.default_backend() != "tpu",
                    approx=approx,
                )
            else:
                values, indices = _search_kernel(
                    state["vectors"],
                    state["valid"],
                    state["codes"],
                    state["numerics"],
                    jnp.asarray(queries),
                    spec,
                    k_eff,
                )
            values = np.asarray(values)
            indices = np.asarray(indices)
            if k_scan > k_eff:
                values, indices = self._host_refine(
                    queries, values, indices, k_eff)
            tail = self._host_tail_top_k(queries, spec, k_eff,
                                         state["staged_rows"])
            if tail is not None:
                values, indices = self._merge_host_tail(
                    values, indices, tail, k_eff)
            with self._mutex:
                if self._generation == generation:
                    break
        return self._hits_from(values, indices)

    def similarity_search_with_score(
        self,
        query_vector: np.ndarray,
        k: int = 4,
        metadata_filter: Optional[Dict[str, Any]] = None,
    ) -> List[Tuple[Document, float]]:
        """Reference-shaped convenience API (``vectorstore.py:166-214``)."""
        results = self.search(query_vector, k, metadata_filter)[0]
        return [(r.document, r.score) for r in results]

    # -------------------------------------------------- metadata-only scan
    def _filter_rows(self, metadata_filter: Optional[Dict[str, Any]]) -> List[int]:
        state = self._device_state()
        spec, ok = self._compile(metadata_filter)
        if metadata_filter and not ok:
            return []
        mask = np.asarray(_mask_kernel(state["valid"], state["codes"], state["numerics"], spec))
        rows = [int(r) for r in np.nonzero(mask)[0]]
        # host-only tail rows (appends since staging) scan on the host
        start = state["staged_rows"]
        with self._mutex:
            n = len(self._ids)
            if n > start:
                tail_mask = (~self._deleted[start:n]) & eval_filter_mask_np(
                    np.array(self.columns.codes[:, start:n]),
                    np.array(self.columns.numerics[:, start:n]),
                    spec,
                )
                rows.extend(int(start + r) for r in np.nonzero(tail_mask)[0])
        return rows

    def rows_match(self, rows: Sequence[int],
                   metadata_filter: Optional[Dict[str, Any]] = None
                   ) -> np.ndarray:
        """Host-side tombstone + filter check for an explicit small row set
        (the sparse arm post-filters its lexical top-k through this instead
        of coupling to the device filter state)."""
        rows = np.asarray(list(rows), np.int64)
        if len(rows) == 0:
            return np.zeros(0, bool)
        spec, ok_spec = self._compile(metadata_filter)
        if metadata_filter and not ok_spec:
            return np.zeros(len(rows), bool)
        with self._mutex:
            # rows may be a snapshot from before a concurrent compaction
            # shrank the table — out-of-range rows are simply not live
            in_range = rows < len(self._deleted)
            safe = np.where(in_range, rows, 0)
            ok = in_range & ~self._deleted[safe]
            if metadata_filter:
                codes = np.array(self.columns.codes[:, safe])
                numerics = np.array(self.columns.numerics[:, safe])
                ok &= eval_filter_mask_np(codes, numerics, spec)
        return ok

    def host_scores(self, rows: Sequence[int], query_vec: np.ndarray
                    ) -> np.ndarray:
        """Cosine scores for an explicit row set against one query vector
        (stored vectors are unit-normalized at add time). Rows invalidated
        by a concurrent compaction score 0."""
        rows = np.asarray(list(rows), np.int64)
        if len(rows) == 0:
            return np.zeros(0, np.float32)
        with self._mutex:
            n = self._vectors.shape[0]
            in_range = (rows >= 0) & (rows < n)
            vecs = self._vectors[np.where(in_range, rows, 0)]
        scores = (vecs @ np.asarray(query_vec, np.float32)).astype(np.float32)
        return np.where(in_range, scores, 0.0).astype(np.float32)

    def document_at(self, row: int) -> Document:
        return self._docs[int(row)]

    def documents_at(self, rows: Sequence[int]) -> List[Optional[Document]]:
        """Docs for an explicit row set under one lock; ``None`` for rows a
        concurrent compaction invalidated (callers drop those)."""
        with self._mutex:
            docs = self._docs
            n = len(docs)
        return [docs[int(r)] if 0 <= int(r) < n else None for r in rows]

    def metadata_search(
        self,
        metadata_filter: Dict[str, Any],
        limit: int = 100,
        offset: int = 0,
    ) -> List[Document]:
        """Mask-only scan path — parity with Qdrant scroll search
        (``vectorstore.py:278-318``)."""
        rows = self._filter_rows(metadata_filter)
        return [self._docs[r] for r in rows[offset : offset + limit]]

    def get_document(self, doc_id: str) -> Optional[Document]:
        with self._mutex:  # a concurrent compact() remaps rows
            row = self._row_of_id.get(doc_id)
            return self._docs[row] if row is not None else None

    def get_embedding_by_id(self, doc_id: str) -> Optional[np.ndarray]:
        with self._mutex:
            row = self._row_of_id.get(doc_id)
            return None if row is None else self._vectors[row].copy()

    # --------------------------------------------------------------- stats
    def stats(self) -> Dict[str, Any]:
        state = self._device_state()
        return {
            "kind": "flat",
            "count": self.count,
            "total_rows": self.total_rows,
            "capacity": state["capacity"],
            "dim": self.dim,
            "device_dtype": self._dtype_name,
            "refine_mult": self.refine_mult if (self._int8 or self._int4)
            else 0,
            "hbm_bytes": int(state["vectors"].nbytes),
            "vocab_sizes": {k: len(v) for k, v in self.columns.vocabs.items()},
        }

    # --------------------------------------------------------- checkpoint
    def save(self, directory: str) -> None:
        """Serialize the index (the reference has no index checkpoint — Qdrant
        owns persistence; here the HBM index is a first-class artifact)."""
        path = Path(directory)
        path.mkdir(parents=True, exist_ok=True)
        with self._mutex:
            # snapshot under the mutex: the app lock already serializes the
            # product path, but a direct-library caller saving during an
            # add would otherwise capture vectors/columns/docs at different
            # lengths — a torn checkpoint that misaligns on load
            n = len(self._ids)
            vectors = np.array(self._vectors[:n])
            deleted = np.array(self._deleted[:n])
            codes = np.array(self.columns.codes[:, :n])
            numerics = np.array(self.columns.numerics[:, :n])
            ids = list(self._ids)
            docs = [d.to_dict() for d in self._docs]
            vocabs = {k: dict(v) for k, v in self.columns.vocabs.items()}
        np.savez_compressed(
            path / "arrays.npz",
            vectors=vectors,
            deleted=deleted,
            codes=codes,
            numerics=numerics,
        )
        manifest = {
            "version": 1,
            "dim": self.dim,
            "device_dtype": self._dtype_name,
            "saved_at": time.time(),
            "ids": ids,
            "docs": docs,
            "vocabs": vocabs,
            "count": n,
        }
        (path / "manifest.json").write_text(
            json.dumps(manifest, ensure_ascii=False), encoding="utf-8"
        )

    @classmethod
    def load(cls, directory: str) -> "FlatIndex":
        path = Path(directory)
        manifest = json.loads((path / "manifest.json").read_text(encoding="utf-8"))
        arrays = np.load(path / "arrays.npz", allow_pickle=False)
        index = cls(dim=manifest["dim"], device_dtype=manifest["device_dtype"])
        n = manifest["count"]
        index._vectors = np.asarray(arrays["vectors"], np.float32)
        index._deleted = np.asarray(arrays["deleted"], bool)
        index._ids = list(manifest["ids"])
        index._docs = [Document.from_dict(d) for d in manifest["docs"]]
        index._row_of_id = {
            doc_id: row
            for row, doc_id in enumerate(index._ids)
            if not index._deleted[row]
        }
        cols = MetadataColumns()
        cols.vocabs = {k: {kk: int(vv) for kk, vv in v.items()} for k, v in manifest["vocabs"].items()}
        capacity = _round_capacity(max(n, 1))
        cols._grow(capacity)
        cols.codes[:, :n] = np.asarray(arrays["codes"], np.int32)
        cols.numerics[:, :n] = np.asarray(arrays["numerics"], np.int32)
        cols.count = n
        index.columns = cols
        return index
