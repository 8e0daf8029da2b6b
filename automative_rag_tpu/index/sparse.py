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

evaluated blockwise under one jit (``lax.map`` over row blocks so the
[block, T, Q] intermediate stays small and fuses; f32 accumulation). At
1M rows × T=48 the corpus slab is 48·(4+2) B/row ≈ 288 MB — the scan
reads *less* HBM than the 1024-dim dense matmul, so the arm adds ≲0.5 ms
on chip. Static shapes throughout: row capacity pads to a block multiple,
term lists pad with id −1 / weight 0 (zero weight ⇒ zero contribution, so
pad↔pad equality is harmless).

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


@partial(jax.jit, static_argnames=("k", "broadcast"))
def _sparse_topk_kernel(ids, weights, n_rows, q_ids, q_w, k,
                        broadcast=False):
    """ids [cap, T] int32, weights [cap, T] bf16, q_ids [Q] int32,
    q_w [Q] f32 → (values [k], rows [k]); cap % _BLOCK == 0.

    Two formulations of the same f32 reduction, picked per backend
    (BENCH_SPARSE_r03.json A/B at 1M rows):
    - ``broadcast=True`` (TPU): one-shot [block, T, Q] masked sum — the
      VPU eats the broadcast and it runs 1.8x faster on-chip (7.8 ms vs
      13.8 ms) because every term comparison is one fused elementwise pass.
    - ``broadcast=False`` (CPU): per-query-term ``fori_loop`` with a
      [block, T] working set — 2x faster on the CPU backend where the
      [block, T, Q] temporary blows the cache.
    """
    cap, t = ids.shape
    blocks_i = ids.reshape(cap // _BLOCK, _BLOCK, t)
    blocks_w = weights.reshape(cap // _BLOCK, _BLOCK, t)
    n_q = q_ids.shape[0]

    def block_scores(blk):
        bids, bw = blk
        if broadcast:
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

    scores = jax.lax.map(block_scores, (blocks_i, blocks_w)).reshape(cap)
    scores = jnp.where(jnp.arange(cap) < n_rows, scores, -jnp.inf)
    return jax.lax.top_k(scores, k)


def _use_broadcast() -> bool:
    """Broadcast formulation on accelerators, fori accumulation on CPU."""
    try:
        return jax.default_backend() != "cpu"
    except Exception:  # noqa: BLE001 — backend probe must never fail a query
        return False


@partial(jax.jit, static_argnames=("k",))
def _sparse_topk_batch_kernel(ids, weights, n_rows, q_ids, q_w, k):
    """Batched variant: q_ids [B, Q] int32, q_w [B, Q] f32 →
    (values [B, k], rows [B, k]). One dispatch scores every query against
    the corpus — the serving-throughput path (engine ``retrieve_batch``)."""
    cap, t = ids.shape
    blocks_i = ids.reshape(cap // _BLOCK, _BLOCK, t)
    blocks_w = weights.reshape(cap // _BLOCK, _BLOCK, t)
    b, n_q = q_ids.shape

    def block_scores(blk):
        bids, bw = blk

        def qstep(i, acc):
            hit = bids[None, :, :] == q_ids[:, i][:, None, None]
            contrib = jnp.where(
                hit, bw.astype(jnp.float32)[None], 0.0).sum(axis=2)
            return acc + q_w[:, i][:, None] * contrib

        return jax.lax.fori_loop(
            0, n_q, qstep, jnp.zeros((b, _BLOCK), jnp.float32))

    scores = jax.lax.map(block_scores, (blocks_i, blocks_w))  # [nb, B, blk]
    scores = jnp.moveaxis(scores, 0, 1).reshape(b, cap)
    scores = jnp.where(jnp.arange(cap)[None, :] < n_rows, scores, -jnp.inf)
    return jax.lax.top_k(scores, k)


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
        # device cache: (ids_slab, weights_slab, staged_rows)
        self._device: Optional[Tuple[jnp.ndarray, jnp.ndarray, int]] = None
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

    def _device_state(self):
        with self._mutex:
            if self._device is None and self.rows:
                cap = max(_BLOCK, -(-self.rows // _BLOCK) * _BLOCK)
                ids = np.full((cap, self.top_terms), -1, np.int32)
                w = np.zeros((cap, self.top_terms), np.float32)
                ids[: self.rows] = self._ids
                w[: self.rows] = self._weights
                self._device = (
                    jnp.asarray(ids),
                    jnp.asarray(w, self.device_dtype),
                    self.rows,
                )
            return self._device

    def _device_topk(self, state, q_ids: np.ndarray, q_w: np.ndarray,
                     k: int):
        """Device top-k over the staged slab; the mesh-sharded subclass
        (``parallel/sharded_sparse.py``) overrides this with a per-shard
        scan + all-gather merge."""
        ids_slab, w_slab, staged = state
        return _sparse_topk_kernel(
            ids_slab, w_slab, staged, jnp.asarray(q_ids), jnp.asarray(q_w), k,
            broadcast=_use_broadcast())

    def search(self, q_ids: np.ndarray, q_w: np.ndarray, k: int
               ) -> List[Tuple[int, float]]:
        """Top-k (row, score) by lexical match score; scores ≤ 0 dropped
        (no term overlap means the row is noise, not a candidate)."""
        if self.rows == 0 or k <= 0:
            return []
        state = self._device_state()
        q_ids = np.asarray(q_ids, np.int32)
        q_w = np.asarray(q_w, np.float32)
        k_eff = min(k, self.rows)
        staged = state[2]
        values, rows = self._device_topk(
            state, q_ids, q_w, min(k_eff, staged))
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
        return _sparse_topk_batch_kernel(
            ids_slab, w_slab, staged, jnp.asarray(q_ids), jnp.asarray(q_w), k)

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
        state = self._device_state()
        staged = state[2]
        k_eff = min(k, self.rows)
        values, rows = self._device_topk_batch(
            state, q_ids, q_w, min(k_eff, staged))
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
