"""Sparse (lexical) term index — the retrieval arm for bge-m3's sparse head.

Row-aligned with the main vector index (appends are paired under the app
lock, like the ColBERT token store): row *r* here holds the top-T weighted
terms of the document in row *r* of the dense index. The retrieval engine
unions this index's top-k into the dense candidate set before rerank — an
exact-lexical recall path for spec codes / trims / model designations that
dense vectors blur (reference has no equivalent; it deploys only bge-m3's
dense head, ``src/core/query/embeddings.py``).

TPU design: scoring one query against the corpus is a padded
equality-match reduction —

    score[n] = Σ_t Σ_q [doc_ids[n,t] == q_ids[q]] · doc_w[n,t] · q_w[q]

The scan is VPU-compute-bound (~N·T·Q vector ops vs only N·T·6 B of HBM
traffic — 288 MB at 1M rows × T=48, less than the dense matmul reads), so
the device slab is TERM-MAJOR [T, cap] and the hot path is the fused
Pallas kernel in ``ops/sparse_scan.py`` (full 128-lane tiles, no
[.., Q] temporary, ~3 VPU ops per query term). XLA broadcast/fori
formulations remain for CPU and parity tests. Static shapes throughout:
column capacity pads to a block multiple, term lists pad with id −1 /
weight 0 (zero weight ⇒ zero contribution, so pad↔pad equality is
harmless).

Live appends follow the flat index's staged-slab pattern
(``index/flat.py``): the built device slab survives appends, fresh rows
score on the host (numpy over ≤ a few thousand × T terms) and fold into
the slab once the tail outgrows its threshold.
"""

from __future__ import annotations

import json
import threading
from functools import partial
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

#: rows per kernel block; capacity pads to a multiple of this
_BLOCK = 8192
#: appended-tail size that triggers folding the tail into the device slab
_TAIL_FOLD = 4096
#: distinct-term ceiling for the 16-bit dense remap (int16 positive range
#: with headroom) — beyond this the scan stays 32-bit
_DENSE16_MAX = 30000  # +DENSE16_BASE stays under int16 max


def _use_variant() -> str:
    """Scan formulation by backend: the fused Pallas term-major kernel on
    accelerators (full 128-lane tiles, no [.., Q] temporary —
    ``ops/sparse_scan.py``), fori accumulation on CPU (cache-friendly)."""
    try:
        return "pallas" if jax.default_backend() != "cpu" else "fori"
    except Exception:  # noqa: BLE001 — backend probe must never fail a query
        return "fori"


def _xla_scores_tm(ids_t, weights_t, q_ids, q_w, variant: str):
    """XLA fallback scan over the term-major slab: lax.map over
    column blocks of the shared scoring core."""
    from ..ops.sparse_scan import xla_block_scores

    t, cap = ids_t.shape
    blocks_i = jnp.moveaxis(ids_t.reshape(t, cap // _BLOCK, _BLOCK), 1, 0)
    blocks_w = jnp.moveaxis(weights_t.reshape(t, cap // _BLOCK, _BLOCK), 1, 0)

    def block(blk):
        bids, bw = blk
        return xla_block_scores(bids, bw, q_ids, q_w, variant)

    return jax.lax.map(block, (blocks_i, blocks_w)).reshape(cap)


@partial(jax.jit, static_argnames=("k", "variant", "interpret"))
def _sparse_topk_kernel(ids_t, weights_t, n_rows, q_ids, q_w, k,
                        variant="fori", interpret=False):
    """ids_t [T, cap] int32 (term-major), weights_t [T, cap] bf16,
    q_ids [Q] int32, q_w [Q] f32 → (values [k], rows [k]);
    cap % _BLOCK == 0.

    ``variant`` ∈ ("pallas", "broadcast", "fori") — the fused Pallas
    kernel on TPU (r04: ~VPU-roofline), the shared XLA formulations
    elsewhere and for parity tests (``ops/sparse_scan.xla_block_scores``).
    """
    from ..ops.sparse_scan import sparse_scores_tm, two_stage_top_k

    t, cap = ids_t.shape
    if variant.startswith("pallas"):  # "pallas" | "pallas16" (slab dtype
        # picks the 32/16-bit kernel inside sparse_scores_tm)
        scores = sparse_scores_tm(ids_t, weights_t, q_ids, q_w,
                                  interpret=interpret)
    else:
        scores = _xla_scores_tm(ids_t, weights_t, q_ids, q_w, variant)
    scores = jnp.where(jnp.arange(cap) < n_rows, scores, -jnp.inf)
    return two_stage_top_k(scores, k)


@partial(jax.jit, static_argnames=("k", "interpret"))
def _sparse_topk_lut_kernel(ids_t, weights_t, n_rows, tab_i, tab_w,
                            r_ids, r_w, k, interpret=False):
    """Hash-LUT top-k (variant "pallas_lut"): query terms preprocessed
    host-side into per-block-width hash tables (``build_query_lut``) so the
    kernel pays ~6 VPU ops per element per QUERY instead of ~3·Q — the
    fix for batch-8 scaling linearly in total query terms (r04 verdict
    item 6; the 16-bit lane-packing route died on v5e Mosaic's missing
    sub-32-bit compares)."""
    from ..ops.sparse_scan import sparse_scores_tm_lut, two_stage_top_k

    t, cap = ids_t.shape
    scores = sparse_scores_tm_lut(ids_t, weights_t, tab_i, tab_w,
                                  r_ids, r_w, interpret=interpret)
    scores = jnp.where(jnp.arange(cap) < n_rows, scores, -jnp.inf)
    return two_stage_top_k(scores, k)


@partial(jax.jit, static_argnames=("k", "interpret"))
def _sparse_topk_lut_batch_kernel(ids_t, weights_t, n_rows, tab_i, tab_w,
                                  r_ids, r_w, k, interpret=False):
    """Batched hash-LUT top-k: tables [B, bn] → ([B, k], [B, k])."""
    from ..ops.sparse_scan import sparse_scores_tm_lut_batch, two_stage_top_k

    t, cap = ids_t.shape
    scores = sparse_scores_tm_lut_batch(ids_t, weights_t, tab_i, tab_w,
                                        r_ids, r_w, interpret=interpret)
    scores = jnp.where(jnp.arange(cap)[None, :] < n_rows, scores, -jnp.inf)
    return two_stage_top_k(scores, k)


@partial(jax.jit, static_argnames=("k", "variant", "interpret"))
def _sparse_topk_batch_kernel(ids_t, weights_t, n_rows, q_ids, q_w, k,
                              variant="fori", interpret=False):
    """Batched variant: q_ids [B, Q] int32, q_w [B, Q] f32 →
    (values [B, k], rows [B, k]). One dispatch scores every query against
    the corpus — the serving-throughput path (engine ``retrieve_batch``)."""
    from ..ops.sparse_scan import (
        sparse_scores_tm_batch, two_stage_top_k, xla_block_scores_batch)

    t, cap = ids_t.shape
    b = q_ids.shape[0]
    if variant.startswith("pallas"):
        scores = sparse_scores_tm_batch(ids_t, weights_t, q_ids, q_w,
                                        interpret=interpret)
    else:
        blocks_i = jnp.moveaxis(
            ids_t.reshape(t, cap // _BLOCK, _BLOCK), 1, 0)
        blocks_w = jnp.moveaxis(
            weights_t.reshape(t, cap // _BLOCK, _BLOCK), 1, 0)

        def block(blk):
            bids, bw = blk
            return xla_block_scores_batch(bids, bw, q_ids, q_w, variant)

        scores = jax.lax.map(block, (blocks_i, blocks_w))  # [nb, B, blk]
        scores = jnp.moveaxis(scores, 0, 1).reshape(b, cap)
    scores = jnp.where(jnp.arange(cap)[None, :] < n_rows, scores, -jnp.inf)
    return two_stage_top_k(scores, k)


def _score_rows_np(ids: np.ndarray, weights: np.ndarray,
                   q_ids: np.ndarray, q_w: np.ndarray) -> np.ndarray:
    """Host oracle / tail scorer: same reduction in numpy."""
    match = ids[:, :, None] == q_ids[None, None, :]
    return (match * weights[:, :, None] * q_w[None, None, :]).sum((1, 2))


class SparseIndex:
    """HBM-scannable padded term lists + live document-frequency stats."""

    def __init__(self, top_terms: int = 48, device_dtype: str = "bfloat16"):
        self.top_terms = int(top_terms)
        self.device_dtype = jnp.dtype(device_dtype)
        self._ids = np.zeros((0, self.top_terms), np.int32)
        self._weights = np.zeros((0, self.top_terms), np.float32)
        self._df: Dict[int, int] = {}
        # device cache: (ids_slab [T, cap], weights_slab [T, cap], staged)
        self._device: Optional[Tuple[jnp.ndarray, jnp.ndarray, int]] = None
        # None → auto by backend (_use_variant); tests pin a formulation
        self.scan_variant: Optional[str] = None
        # 16-bit scan support: sorted raw term ids the CURRENT slab was
        # densely remapped with (queries remap through the same snapshot;
        # None → slab is 32-bit). Swapped together with _device.
        self._staged_keys: Optional[np.ndarray] = None
        self._staged_want16 = False  # the variant the slab was staged for
        self._mutex = threading.RLock()

    # ------------------------------------------------------------- size
    @property
    def rows(self) -> int:
        return self._ids.shape[0]

    @property
    def nbytes(self) -> int:
        return self._ids.nbytes + self._weights.nbytes

    # --------------------------------------------------------- mutation
    def append(self, ids: np.ndarray, weights: np.ndarray) -> None:
        ids = np.asarray(ids, np.int32)
        weights = np.asarray(weights, np.float32)
        if ids.ndim != 2 or ids.shape[1] != self.top_terms:
            raise ValueError(
                f"expected [n, {self.top_terms}] term ids, got {ids.shape}")
        with self._mutex:
            self._ids = np.concatenate([self._ids, ids])
            self._weights = np.concatenate([self._weights, weights])
            # terms are unique within a row (encoder aggregates per id), so
            # document frequency = bulk counts over the non-pad ids
            terms, counts = np.unique(ids[ids >= 0], return_counts=True)
            for t, c in zip(terms.tolist(), counts.tolist()):
                self._df[t] = self._df.get(t, 0) + c
            # the built slab survives: fresh rows score on the host until
            # the tail outgrows the fold threshold
            if self._device is not None:
                staged = self._device[2]
                if self.rows - staged > _TAIL_FOLD:
                    self._device = None

    def select_rows(self, rows: Sequence[int]) -> None:
        """Compaction hook: keep (reordered) ``rows``, row-aligned with the
        main index's live order; recomputes df."""
        rows = np.asarray(list(rows), np.int64)
        with self._mutex:
            self._ids = self._ids[rows]
            self._weights = self._weights[rows]
            self._recount_df_locked()
            self._device = None

    def _recount_df_locked(self) -> None:
        terms, counts = np.unique(self._ids[self._ids >= 0], return_counts=True)
        self._df = dict(zip(terms.tolist(), counts.tolist()))

    # ------------------------------------------------------------ scoring
    def idf(self, q_ids: np.ndarray) -> np.ndarray:
        """BM25-style idf for query terms, from live corpus stats
        (weightless/lexical mode only — learned sparse weights already
        encode term importance)."""
        n = max(self.rows, 1)
        out = np.zeros(len(q_ids), np.float32)
        for i, t in enumerate(np.asarray(q_ids)):
            t = int(t)
            if t < 0:
                continue
            df = self._df.get(t, 0)
            out[i] = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return out

    def _want16(self) -> bool:
        variant = self.scan_variant or _use_variant()
        return variant == "pallas16"

    def _device_state(self):
        want16 = self._want16()
        with self._mutex:
            if self._device is not None and want16 != self._staged_want16:
                self._device = None  # variant flipped → restage
            if self._device is None and self.rows:
                cap = max(_BLOCK, -(-self.rows // _BLOCK) * _BLOCK)
                # TERM-MAJOR device layout [T, cap]: the corpus is the lane
                # dimension so every 128-lane VPU op in the scan is fully
                # utilized (48-wide rows waste 2.7x of each tile row-major)
                raw = self._ids.T  # [T, rows]
                keys = None
                if want16:
                    keys = np.unique(raw[raw >= 0])
                    if keys.size > _DENSE16_MAX:
                        keys = None  # vocab too wide — stay 32-bit
                if keys is not None:
                    # dense exact remap: slab value = DENSE16_BASE + index
                    # into the sorted key table (bit patterns ≥ 256 are
                    # normal positive bf16 values — the kernel compares
                    # bitcast-as-bf16; pad −1 is a NaN pattern that never
                    # matches). 2× VPU lane packing, zero collisions.
                    from ..ops.sparse_scan import DENSE16_BASE

                    dense = DENSE16_BASE + np.searchsorted(
                        keys, np.where(raw < 0, keys[0], raw))
                    dense = np.where(raw < 0, -1, dense).astype(np.int16)
                    ids = np.full((self.top_terms, cap), -1, np.int16)
                    ids[:, : self.rows] = dense
                else:
                    ids = np.full((self.top_terms, cap), -1, np.int32)
                    ids[:, : self.rows] = raw
                w = np.zeros((self.top_terms, cap), np.float32)
                w[:, : self.rows] = self._weights.T
                self._staged_keys = keys
                self._staged_want16 = want16
                self._device = (
                    jnp.asarray(ids),
                    jnp.asarray(w, self.device_dtype),
                    self.rows,
                )
            return self._device

    @staticmethod
    def _map_query_ids(q_ids: np.ndarray, keys: np.ndarray) -> np.ndarray:
        """Remap raw query term ids through the slab's staged key table
        (16-bit slabs only). Terms absent from the staged vocabulary map
        to −2: they can only match tail rows, which score on the host
        with RAW ids."""
        from ..ops.sparse_scan import DENSE16_BASE

        pos = np.searchsorted(keys, q_ids)
        pos_c = np.clip(pos, 0, len(keys) - 1)
        return np.where((q_ids >= 0) & (keys[pos_c] == q_ids),
                        DENSE16_BASE + pos_c, -2).astype(np.int32)

    def _device_state_with_keys(self):
        """State + the matching 16-bit key snapshot under ONE lock hold
        (a concurrent restage must not pair a fresh slab with stale
        keys)."""
        with self._mutex:
            return self._device_state(), self._staged_keys

    @staticmethod
    def _trim_query_width(q_ids: np.ndarray, q_w: np.ndarray):
        """Compact valid terms forward and round the query width up to a
        power-of-two bucket (min 8). Scan cost is LINEAR in the compiled
        query width and the encoder pads to a fixed 32/64, while real
        queries carry ~5-16 terms — bucketing cuts the compare-unroll
        work up to 4x for typical traffic without touching scores (pad /
        zero-weight terms contribute exactly 0). One executable per
        bucket. Accepts [Q] or [B, Q]; batches share the max bucket."""
        q_ids = np.atleast_2d(np.asarray(q_ids, np.int32))
        q_w = np.atleast_2d(np.asarray(q_w, np.float32))
        b, q = q_ids.shape
        valid = (q_ids >= 0) & (q_w != 0.0)
        counts = valid.sum(axis=1)
        need = max(1, int(counts.max()) if b else 1)
        bucket = 8
        while bucket < need:
            bucket *= 2
        bucket = min(bucket, q)
        out_ids = np.full((b, bucket), -1, np.int32)
        out_w = np.zeros((b, bucket), np.float32)
        for row in range(b):
            n = int(counts[row])
            take = min(n, bucket)
            out_ids[row, :take] = q_ids[row, valid[row]][:take]
            out_w[row, :take] = q_w[row, valid[row]][:take]
        return out_ids, out_w

    def _lut_args(self, state, q_ids: np.ndarray, q_w: np.ndarray):
        """Hash tables for the "pallas_lut" variant, or None when a
        query's collisions overflow the residual slots (fall back to the
        compare-unroll kernel). Table width = the kernel block width."""
        from ..ops.sparse_scan import build_query_lut

        cap = state[0].shape[1]
        return build_query_lut(q_ids, q_w, width=min(4096, cap))

    def _device_topk(self, state, q_ids: np.ndarray, q_w: np.ndarray,
                     k: int):
        """Device top-k over the staged slab; the mesh-sharded subclass
        (``parallel/sharded_sparse.py``) overrides this with a per-shard
        scan + all-gather merge."""
        ids_slab, w_slab, staged = state
        variant = self.scan_variant or _use_variant()
        interpret = jax.default_backend() != "tpu"
        trimmed = self._trim_query_width(q_ids, q_w)
        q_ids, q_w = trimmed[0][0], trimmed[1][0]
        if variant == "pallas_lut":
            lut = self._lut_args(state, q_ids, q_w)
            if lut is not None:
                tab_i, tab_w, r_ids, r_w = lut
                return _sparse_topk_lut_kernel(
                    ids_slab, w_slab, staged, jnp.asarray(tab_i),
                    jnp.asarray(tab_w), jnp.asarray(r_ids),
                    jnp.asarray(r_w), k, interpret=interpret)
            variant = "pallas"  # residual overflow → compare unroll
        return _sparse_topk_kernel(
            ids_slab, w_slab, staged, jnp.asarray(q_ids), jnp.asarray(q_w), k,
            variant=variant, interpret=interpret)

    def search(self, q_ids: np.ndarray, q_w: np.ndarray, k: int
               ) -> List[Tuple[int, float]]:
        """Top-k (row, score) by lexical match score; scores ≤ 0 dropped
        (no term overlap means the row is noise, not a candidate)."""
        if self.rows == 0 or k <= 0:
            return []
        state, keys16 = self._device_state_with_keys()
        q_ids = np.asarray(q_ids, np.int32)
        q_w = np.asarray(q_w, np.float32)
        k_eff = min(k, self.rows)
        staged = state[2]
        q_dev = (self._map_query_ids(q_ids, keys16)
                 if keys16 is not None else q_ids)
        values, rows = self._device_topk(
            state, q_dev, q_w, min(k_eff, staged))
        values = np.asarray(values)
        rows = np.asarray(rows)
        with self._mutex:
            tail_start = staged
            tail_ids = self._ids[tail_start:]
            tail_w = self._weights[tail_start:]
        if len(tail_ids):
            tail_scores = _score_rows_np(tail_ids, tail_w, q_ids, q_w)
            values = np.concatenate([values, tail_scores])
            rows = np.concatenate(
                [rows, np.arange(tail_start, tail_start + len(tail_ids))])
            order = np.argsort(-values)[:k_eff]
            values, rows = values[order], rows[order]
        return [
            (int(r), float(v)) for v, r in zip(values, rows) if v > 0.0
        ]

    def _device_topk_batch(self, state, q_ids: np.ndarray,
                           q_w: np.ndarray, k: int):
        ids_slab, w_slab, staged = state
        variant = self.scan_variant or _use_variant()
        interpret = jax.default_backend() != "tpu"
        q_ids, q_w = self._trim_query_width(q_ids, q_w)
        if variant == "pallas_lut":
            lut = self._lut_args(state, q_ids, q_w)
            if lut is not None:
                tab_i, tab_w, r_ids, r_w = lut
                return _sparse_topk_lut_batch_kernel(
                    ids_slab, w_slab, staged, jnp.asarray(tab_i),
                    jnp.asarray(tab_w), jnp.asarray(r_ids),
                    jnp.asarray(r_w), k, interpret=interpret)
            variant = "pallas"  # residual overflow → compare unroll
        return _sparse_topk_batch_kernel(
            ids_slab, w_slab, staged, jnp.asarray(q_ids), jnp.asarray(q_w), k,
            variant=variant, interpret=interpret)

    def search_batch(self, q_ids: np.ndarray, q_w: np.ndarray, k: int
                     ) -> List[List[Tuple[int, float]]]:
        """Batched ``search``: q_ids/q_w [B, Q] (fixed query width, pad id
        −1 / weight 0) → per-query top-k (row, score) lists, one device
        dispatch for the whole batch. Tail rows merge per query on the
        host, same as the single-query path."""
        q_ids = np.asarray(q_ids, np.int32)
        q_w = np.asarray(q_w, np.float32)
        b = q_ids.shape[0]
        if self.rows == 0 or k <= 0 or b == 0:
            return [[] for _ in range(b)]
        state, keys16 = self._device_state_with_keys()
        staged = state[2]
        k_eff = min(k, self.rows)
        q_dev = (self._map_query_ids(q_ids, keys16)
                 if keys16 is not None else q_ids)
        values, rows = self._device_topk_batch(
            state, q_dev, q_w, min(k_eff, staged))
        values = np.asarray(values)
        rows = np.asarray(rows)
        with self._mutex:
            tail_ids = self._ids[staged:]
            tail_w = self._weights[staged:]
        out: List[List[Tuple[int, float]]] = []
        for i in range(b):
            v, r = values[i], rows[i]
            if len(tail_ids):
                tail_scores = _score_rows_np(
                    tail_ids, tail_w, q_ids[i], q_w[i])
                v = np.concatenate([v, tail_scores])
                r = np.concatenate(
                    [r, np.arange(staged, staged + len(tail_ids))])
                order = np.argsort(-v)[:k_eff]
                v, r = v[order], r[order]
            out.append([
                (int(rr), float(vv)) for vv, rr in zip(v, r) if vv > 0.0
            ])
        return out

    def score_rows(self, rows: Sequence[int], q_ids: np.ndarray,
                   q_w: np.ndarray) -> np.ndarray:
        """Host-side scores for a small explicit row set (fusion path).
        Rows a concurrent compaction invalidated score 0 (no lexical
        evidence) instead of crashing the query."""
        rows = np.asarray(list(rows), np.int64)
        if len(rows) == 0:
            return np.zeros(0, np.float32)
        with self._mutex:
            n = self._ids.shape[0]
            in_range = (rows >= 0) & (rows < n)
            safe = np.where(in_range, rows, 0)
            ids = self._ids[safe]
            w = self._weights[safe]
        scores = _score_rows_np(
            ids, w, np.asarray(q_ids, np.int32), np.asarray(q_w, np.float32))
        return np.where(in_range, scores, 0.0).astype(np.float32)

    # ------------------------------------------------------------- admin
    def drop_device_cache(self) -> None:
        with self._mutex:
            self._device = None

    def stats(self) -> dict:
        state = self._device
        return {
            "rows": self.rows,
            "top_terms": self.top_terms,
            "distinct_terms": len(self._df),
            "host_bytes": self.nbytes,
            "staged_rows": 0 if state is None else state[2],
        }

    def save(self, directory: str) -> None:
        path = Path(directory)
        path.mkdir(parents=True, exist_ok=True)
        with self._mutex:
            np.savez(
                path / "sparse.npz",
                ids=self._ids,
                weights=self._weights,
            )
            meta = {"top_terms": self.top_terms,
                    "device_dtype": self.device_dtype.name}
            (path / "sparse_meta.json").write_text(json.dumps(meta))

    @classmethod
    def load(cls, directory: str, top_terms: int = 48,
             device_dtype: str = "bfloat16") -> "SparseIndex":
        path = Path(directory)
        meta_file = path / "sparse_meta.json"
        if meta_file.exists():
            meta = json.loads(meta_file.read_text())
            top_terms = int(meta.get("top_terms", top_terms))
            device_dtype = meta.get("device_dtype", device_dtype)
        out = cls(top_terms=top_terms, device_dtype=device_dtype)
        data_file = path / "sparse.npz"
        if data_file.exists():
            data = np.load(data_file)
            out._ids = np.asarray(data["ids"], np.int32)
            out._weights = np.asarray(data["weights"], np.float32)
            out._recount_df_locked()
        return out
