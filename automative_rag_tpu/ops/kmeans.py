"""Batched spherical k-means for IVF index construction.

The TPU replacement for Qdrant's pointer-chasing HNSW build (SURVEY.md §2.2
"[TPU-native kernel target]"): index construction is Lloyd iterations where
both the assignment step (cosine scores) and the update step (one-hot
aggregation) are MXU matmuls, chunked over rows with a ``lax.scan`` so the
[N, K] similarity matrix never materializes.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("chunk",))
def _assign_and_accumulate(vectors, centroids, chunk: int):
    """One Lloyd pass: → (sums [K, D], counts [K], assignments [N])."""
    n, dim = vectors.shape
    k = centroids.shape[0]
    n_chunks = n // chunk

    def body(carry, idx):
        sums, counts = carry
        block = jax.lax.dynamic_slice(vectors, (idx * chunk, 0), (chunk, dim))
        sim = jax.lax.dot_general(
            block, centroids, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # [chunk, K]
        assign = jnp.argmax(sim, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)  # [chunk, K]
        sums = sums + jax.lax.dot_general(
            onehot, block.astype(jnp.float32), (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        counts = counts + onehot.sum(axis=0)
        return (sums, counts), assign

    init = (jnp.zeros((k, dim), jnp.float32), jnp.zeros((k,), jnp.float32))
    (sums, counts), assigns = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return sums, counts, assigns.reshape(n_chunks * chunk)


def spherical_kmeans(
    vectors: np.ndarray,
    n_clusters: int,
    n_iters: int = 10,
    chunk: int = 8192,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """→ (centroids [K, D] L2-normalized, assignments [N]).

    Vectors must be L2-normalized. Rows pad to the chunk size with zeros
    (assigned arbitrarily; caller slices assignments back to N). Empty
    clusters keep their previous centroid.
    """
    vectors = np.asarray(vectors, np.float32)
    n, dim = vectors.shape
    if n_clusters > n:
        raise ValueError(f"n_clusters={n_clusters} > n={n}")

    rng = np.random.default_rng(seed)
    centroids = vectors[rng.choice(n, size=n_clusters, replace=False)].copy()

    chunk = min(chunk, max(128, 1 << (n - 1).bit_length()))
    n_pad = -(-n // chunk) * chunk
    padded = np.zeros((n_pad, dim), np.float32)
    padded[:n] = vectors
    device_vectors = jnp.asarray(padded)

    assignments = np.zeros(n, np.int64)
    for _ in range(n_iters):
        sums, counts, assigns = _assign_and_accumulate(
            device_vectors, jnp.asarray(centroids), chunk
        )
        sums, counts = np.asarray(sums), np.asarray(counts)
        assignments = np.asarray(assigns)[:n]
        # padded zero-rows all land in one argmax cluster; remove their pull
        if n_pad != n:
            pad_assign = np.asarray(assigns)[n:]
            np.add.at(counts, pad_assign, -1.0)
        nonempty = counts > 0
        new = centroids.copy()
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        centroids = new / np.maximum(norms, 1e-12)
    return centroids.astype(np.float32), assignments
