"""Batched spherical k-means for IVF index construction.

The TPU replacement for Qdrant's pointer-chasing HNSW build (SURVEY.md §2.2
"[TPU-native kernel target]"): index construction is Lloyd iterations where
both the assignment step (cosine scores) and the update step (one-hot
aggregation) are MXU matmuls, chunked over rows with a ``lax.scan`` so the
[N, K] similarity matrix never materializes.

Scale design (measured on a 1M×1024 corpus): a full-corpus Lloyd pass is
HBM-bound — it re-reads the whole corpus per iteration (4 GB f32, ~100 s at
the chip's effective bandwidth), so centroids TRAIN on a bounded sample
(``train_rows_per_cluster``·K rows, the FAISS recipe) and only the final
assignment pass touches every row; vectors stage on-device as bf16 (half
the bytes — assignment is an argmax, bf16 similarity is plenty) with f32
accumulation for the centroid sums.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("chunk",))
def _assign_and_accumulate(vectors, centroids, chunk: int):
    """One Lloyd pass over bf16 rows: → (sums [K, D] f32, counts [K],
    assignments [N], second [N] — each row's second-nearest centroid, used
    by balanced list construction)."""
    n, dim = vectors.shape
    k = centroids.shape[0]
    n_chunks = n // chunk

    def body(carry, idx):
        sums, counts = carry
        block = jax.lax.dynamic_slice(vectors, (idx * chunk, 0), (chunk, dim))
        sim = jax.lax.dot_general(
            block, centroids.astype(block.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [chunk, K]
        _, top2 = jax.lax.top_k(sim, 2)
        assign = top2[:, 0]
        second = top2[:, 1]
        onehot = jax.nn.one_hot(assign, k, dtype=block.dtype)  # [chunk, K]
        sums = sums + jax.lax.dot_general(
            onehot, block, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        counts = counts + onehot.sum(axis=0).astype(jnp.float32)
        return (sums, counts), (assign, second)

    init = (jnp.zeros((k, dim), jnp.float32), jnp.zeros((k,), jnp.float32))
    (sums, counts), (assigns, seconds) = jax.lax.scan(
        body, init, jnp.arange(n_chunks))
    return (sums, counts,
            assigns.reshape(n_chunks * chunk),
            seconds.reshape(n_chunks * chunk))


def spherical_kmeans(
    vectors: np.ndarray,
    n_clusters: int,
    n_iters: int = 10,
    chunk: int = 8192,
    seed: int = 0,
    train_rows_per_cluster: int = 256,
    return_second: bool = False,
):
    """→ (centroids [K, D] L2-normalized, assignments [N][, second [N]]).

    Vectors must be L2-normalized. Centroids train on at most
    ``train_rows_per_cluster · n_clusters`` sampled rows (full corpus when
    smaller); a final pass assigns every row. Rows pad to the chunk size
    with zeros (assigned arbitrarily; caller slices assignments back to N).
    Empty clusters keep their previous centroid.
    """
    vectors = np.asarray(vectors, np.float32)
    n, dim = vectors.shape
    if n_clusters > n:
        raise ValueError(f"n_clusters={n_clusters} > n={n}")

    rng = np.random.default_rng(seed)
    centroids = vectors[rng.choice(n, size=n_clusters, replace=False)].copy()

    train_n = min(n, max(train_rows_per_cluster * n_clusters, n_clusters))
    if train_n < n:
        train_rows = rng.choice(n, size=train_n, replace=False)
        train = vectors[train_rows]
    else:
        train = vectors

    def _staged(arr):
        c = min(chunk, max(128, 1 << (arr.shape[0] - 1).bit_length()))
        n_pad = -(-arr.shape[0] // c) * c
        padded = np.zeros((n_pad, dim), np.float32)
        padded[: arr.shape[0]] = arr
        return jnp.asarray(padded, jnp.bfloat16), c

    device_train, train_chunk = _staged(train)
    for _ in range(n_iters):
        sums, counts, assigns, _ = _assign_and_accumulate(
            device_train, jnp.asarray(centroids), train_chunk
        )
        sums, counts = np.asarray(sums), np.asarray(counts)
        if device_train.shape[0] != train.shape[0]:
            pad_assign = np.asarray(assigns)[train.shape[0]:]
            np.add.at(counts, pad_assign, -1.0)
            # padded zero-rows contribute zero to sums; only counts need fixing
        nonempty = counts > 0
        new = centroids.copy()
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        centroids = new / np.maximum(norms, 1e-12)

    # final full-corpus assignment (the only pass that reads every row)
    if train_n < n:
        device_all, full_chunk = _staged(vectors)
        _, _, assigns, seconds = _assign_and_accumulate(
            device_all, jnp.asarray(centroids), full_chunk
        )
    else:
        seconds = None
        if return_second:
            _, _, assigns, seconds = _assign_and_accumulate(
                device_train, jnp.asarray(centroids), train_chunk
            )
    assignments = np.asarray(assigns)[:n].astype(np.int64)
    centroids = centroids.astype(np.float32)
    if return_second:
        second = np.asarray(seconds)[:n].astype(np.int64)
        return centroids, assignments, second
    return centroids, assignments
