"""Batched spherical k-means for IVF index construction.

The TPU replacement for Qdrant's pointer-chasing HNSW build (SURVEY.md §2.2
"[TPU-native kernel target]"): index construction is Lloyd iterations where
both the assignment step (cosine scores) and the update step (one-hot
aggregation) are MXU matmuls, chunked over rows with a ``lax.scan`` so the
[N, K] similarity matrix never materializes.

Scale design (r03 measured 918 s for a 1M×1024 build — almost none of it
MXU time; r04 restructures the host/device traffic):

- centroids TRAIN on a bounded sample (``train_rows_per_cluster``·K rows,
  the FAISS recipe); only the final assignment pass reads every row;
- the corpus ships ONCE as f32 and is cast to bf16 + padded ON DEVICE
  (host-side ml_dtypes conversion + a 4 GB pad copy on one core cost more
  than the whole clustering); the training sample is gathered on device
  from that staged slab — no second ship, no host fancy-index copy;
- ALL Lloyd iterations run inside one jit (``fori_loop`` carrying the
  centroids): r03 fetched sums/counts to the host every iteration, paying
  ~26 ms relay dispatch plus host math per iter;
- pad rows are masked in-kernel (valid = global row < n) instead of
  patched on the host afterwards.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("chunk", "n_pad"))
def _stage_bf16(vectors, chunk: int, n_pad: int):
    """Ship-once staging: f32 [n, D] host array → bf16 [n_pad, D] device."""
    n, dim = vectors.shape
    out = vectors.astype(jnp.bfloat16)
    if n_pad != n:
        out = jnp.pad(out, ((0, n_pad - n), (0, 0)))
    return out


def _chunk_pass(vectors, centroids, n_rows, chunk: int, accumulate: bool):
    """One pass over the staged slab: per-chunk cosine argmax (+ one-hot
    accumulation when ``accumulate``). Rows ≥ n_rows (device padding) are
    masked out of sums/counts and assigned arbitrarily."""
    n_cap, dim = vectors.shape
    k = centroids.shape[0]
    n_chunks = n_cap // chunk

    def body(carry, idx):
        sums, counts = carry
        block = jax.lax.dynamic_slice(
            vectors, (idx * chunk, 0), (chunk, dim))
        sim = jax.lax.dot_general(
            block, centroids.astype(block.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [chunk, K]
        # top-2 as two VPU max/argmax reductions, NOT lax.top_k: top_k
        # lowers to a sort-network on TPU and dominated the r04 1M build
        # (the same pathology hierarchical_top_k fixed for the 10M scan).
        # Ties resolve to the first occurrence in both formulations, so
        # this is bit-identical to top_k(sim, 2).
        v1 = jnp.max(sim, axis=1)
        assign = jnp.argmax(sim, axis=1)
        masked = jnp.where(
            jnp.arange(k)[None, :] == assign[:, None], -jnp.inf, sim)
        v2 = jnp.max(masked, axis=1)
        second = jnp.argmax(masked, axis=1)
        # first−second affinity margin: balanced list construction spills
        # the near-tie rows; returning it here saves the builder two
        # full-corpus host einsums (30+ s at 1M on one core)
        margin = v1 - v2
        if accumulate:
            valid = (idx * chunk + jnp.arange(chunk)) < n_rows
            onehot = jnp.where(
                valid[:, None], jax.nn.one_hot(assign, k, dtype=block.dtype),
                0).astype(block.dtype)
            sums = sums + jax.lax.dot_general(
                onehot, block, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            counts = counts + onehot.sum(axis=0).astype(jnp.float32)
        return (sums, counts), (assign, second, margin)

    init = (jnp.zeros((k, dim), jnp.float32), jnp.zeros((k,), jnp.float32))
    (sums, counts), (assigns, seconds, margins) = jax.lax.scan(
        body, init, jnp.arange(n_chunks))
    return (sums, counts, assigns.reshape(n_cap),
            seconds.reshape(n_cap), margins.reshape(n_cap))


@partial(jax.jit, static_argnames=("chunk", "n_iters"))
def _lloyd(vectors, centroids0, n_rows, chunk: int, n_iters: int):
    """All Lloyd iterations in ONE device program; returns final centroids.
    Empty clusters keep their previous centroid."""

    def iteration(_, centroids):
        sums, counts, _, _, _ = _chunk_pass(
            vectors, centroids, n_rows, chunk, accumulate=True)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        norms = jnp.linalg.norm(new, axis=1, keepdims=True)
        ok = (counts[:, None] > 0) & (norms > 1e-6)
        return jnp.where(ok, new / jnp.maximum(norms, 1e-12), centroids)

    return jax.lax.fori_loop(0, n_iters, iteration, centroids0)


@partial(jax.jit, static_argnames=("chunk",))
def _assign(vectors, centroids, n_rows, chunk: int):
    _, _, assigns, seconds, margins = _chunk_pass(
        vectors, centroids, n_rows, chunk, accumulate=False)
    return assigns, seconds, margins


@partial(jax.jit, static_argnames=("n_pad", "chunk"))
def _gather_rows(slab, rows, n_pad: int, chunk: int):
    out = jnp.take(slab, rows, axis=0)
    if n_pad != rows.shape[0]:
        out = jnp.pad(out, ((0, n_pad - rows.shape[0]), (0, 0)))
    return out


def _pad_to(n: int, chunk: int) -> int:
    """Power-of-two capacity bucketing (≥ chunk): the staged-slab shape is
    a static arg of every kmeans executable, and the remote compiler costs
    minutes per new shape — exact-n padding would recompile on every
    rebuild of a growing corpus. Pays ≤2× transient HBM on the bf16 slab
    in the worst case (1.0 GB/M rows extra at dim 1024)."""
    cap = chunk
    while cap < n:
        cap *= 2
    return cap


def stage_corpus(vectors: np.ndarray, chunk: int = 8192):
    """Ship a host f32 corpus once; returns (bf16 padded device slab, n)."""
    vectors = np.ascontiguousarray(vectors, np.float32)
    n = vectors.shape[0]
    c = min(chunk, max(128, 1 << (n - 1).bit_length()))
    slab = _stage_bf16(jnp.asarray(vectors), c, _pad_to(n, c))
    return slab, n, c


def spherical_kmeans(
    vectors: np.ndarray,
    n_clusters: int,
    n_iters: int = 10,
    chunk: int = 8192,
    seed: int = 0,
    train_rows_per_cluster: int = 256,
    return_second: bool = False,
    staged=None,
    timings: dict | None = None,
    staged_out: dict | None = None,
):
    """→ (centroids [K, D] L2-normalized, assignments [N][, second [N]]).

    Vectors must be L2-normalized (the index mirrors are — ``add()``
    normalizes at ingest). Centroids train on at most
    ``train_rows_per_cluster · n_clusters`` device-gathered rows (full
    corpus when smaller); a final pass assigns every row. ``staged`` lets a
    caller that already holds the device slab (``stage_corpus``) skip the
    ship. ``staged_out``, when given, receives the staged tuple under
    ``"staged"`` so downstream phases (the list balancer's homeless
    ranking) can keep computing against the resident slab instead of
    re-shipping rows — slab row ``i`` is exactly ``vectors`` row ``i``.
    """
    vectors = np.asarray(vectors, np.float32)
    n, dim = vectors.shape
    if n_clusters > n:
        raise ValueError(f"n_clusters={n_clusters} > n={n}")

    import time as _time

    if timings is None:
        timings = {}
    rng = np.random.default_rng(seed)
    t0 = _time.time()
    if staged is None:
        slab, _, c = stage_corpus(vectors, chunk)
        jax.block_until_ready(slab)
    else:
        slab, _, c = staged
    timings["ship_s"] = round(_time.time() - t0, 2)
    if staged_out is not None:
        staged_out["staged"] = (slab, n, c)

    init_rows = np.sort(rng.choice(n, size=n_clusters, replace=False))
    centroids0 = vectors[init_rows].astype(np.float32)
    centroids0 /= np.maximum(
        np.linalg.norm(centroids0, axis=1, keepdims=True), 1e-12)

    t0 = _time.time()
    train_n = min(n, max(train_rows_per_cluster * n_clusters, n_clusters))
    if train_n < n:
        train_rows = np.sort(rng.choice(n, size=train_n, replace=False))
        train_slab = _gather_rows(
            slab, jnp.asarray(train_rows), _pad_to(train_n, c), c)
    else:
        train_slab, train_n = slab, n

    centroids = _lloyd(
        train_slab, jnp.asarray(centroids0), jnp.asarray(train_n, jnp.int32),
        c, int(n_iters))
    jax.block_until_ready(centroids)
    timings["train_s"] = round(_time.time() - t0, 2)

    # final full-corpus assignment (the only pass that reads every row)
    t0 = _time.time()
    assigns, seconds, margins = _assign(
        slab, centroids, jnp.asarray(n, jnp.int32), c)
    jax.block_until_ready(assigns)
    timings["assign_s"] = round(_time.time() - t0, 2)
    t0 = _time.time()
    assignments = np.asarray(assigns)[:n].astype(np.int64)
    centroids = np.array(centroids, np.float32)  # writable host copy
    # device bf16 normalization drift is possible on empty-cluster
    # carry-through; re-normalize on host (K×D is tiny)
    centroids /= np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    if return_second:
        second = np.asarray(seconds)[:n].astype(np.int64)
        margin = np.asarray(margins)[:n].astype(np.float32)
        timings["fetch_s"] = round(_time.time() - t0, 2)
        return centroids, assignments, second, margin
    timings["fetch_s"] = round(_time.time() - t0, 2)
    return centroids, assignments
