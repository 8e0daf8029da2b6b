"""PLAID-style residual codec for token embeddings: centroid id + 2-bit
residuals.

PLAID/WARP (PAPERS.md) compress late-interaction token embeddings as a
coarse centroid plus low-bit residuals; this codec implements the same idea
TPU-side:

    token ≈ centroid[cid] + scale · (q − mid),  q ∈ {0..2^bits−1} per dim

bits=4 (default): D/2 B codes + 6 B → ~4× smaller than fp16 at D=1024 with
near-exact scores; bits=2: D/4 B codes → ~8× (coarser). 4-bit puts a
50K-doc × 256-token rerank corpus in one chip's HBM; 2-bit doubles that.
Centroid training is chunked Lloyd k-means with L2 assignment expressed as
matmuls (argmin ‖x−c‖² = argmax x·c − ½‖c‖²).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("chunk",))
def _l2_assign_accumulate(points, centroids, chunk: int):
    n, dim = points.shape
    k = centroids.shape[0]
    half_norms = 0.5 * jnp.sum(centroids * centroids, axis=1)  # [K]

    def body(carry, idx):
        sums, counts = carry
        block = jax.lax.dynamic_slice(points, (idx * chunk, 0), (chunk, dim))
        affinity = (
            jax.lax.dot_general(
                block, centroids, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            - half_norms[None, :]
        )
        assign = jnp.argmax(affinity, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)
        sums = sums + jax.lax.dot_general(
            onehot, block.astype(jnp.float32), (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        counts = counts + onehot.sum(axis=0)
        return (sums, counts), assign

    init = (jnp.zeros((k, dim), jnp.float32), jnp.zeros((k,), jnp.float32))
    (sums, counts), assigns = jax.lax.scan(body, init, jnp.arange(n // chunk))
    return sums, counts, assigns.reshape(-1)


def train_centroids(points: np.ndarray, k: int, n_iters: int = 8,
                    chunk: int = 8192, seed: int = 0) -> np.ndarray:
    """Plain (L2) Lloyd k-means over token embeddings → [K, D] centroids."""
    points = np.asarray(points, np.float32)
    n, dim = points.shape
    rng = np.random.default_rng(seed)
    centroids = points[rng.choice(n, size=min(k, n), replace=False)].copy()
    if centroids.shape[0] < k:  # fewer points than centroids
        pad = rng.normal(scale=1e-3, size=(k - centroids.shape[0], dim))
        centroids = np.concatenate([centroids, pad.astype(np.float32)])

    chunk = min(chunk, max(128, 1 << (max(n, 1) - 1).bit_length()))
    n_pad = -(-n // chunk) * chunk
    padded = np.zeros((n_pad, dim), np.float32)
    padded[:n] = points
    device_points = jnp.asarray(padded)

    for _ in range(n_iters):
        sums, counts, assigns = _l2_assign_accumulate(
            device_points, jnp.asarray(centroids), chunk
        )
        sums, counts = np.asarray(sums), np.asarray(counts)
        if n_pad != n:
            # padded rows are zeros: they add nothing to sums, but their
            # argmax assignment must not deflate a centroid's mean
            pad_assign = np.asarray(assigns)[n:]
            np.add.at(counts, pad_assign, -1.0)
        nonempty = counts > 0
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
    return centroids.astype(np.float32)


def assign_centroids(points: np.ndarray, centroids: np.ndarray,
                     chunk: int = 8192) -> np.ndarray:
    points = np.asarray(points, np.float32)
    n = points.shape[0]
    chunk_eff = min(chunk, max(128, 1 << (max(n, 1) - 1).bit_length()))
    n_pad = -(-n // chunk_eff) * chunk_eff
    padded = np.zeros((n_pad, points.shape[1]), np.float32)
    padded[:n] = points
    _, _, assigns = _l2_assign_accumulate(
        jnp.asarray(padded), jnp.asarray(centroids), chunk_eff
    )
    return np.asarray(assigns)[:n].astype(np.int32)


# ------------------------------------------------------------- 2-bit codes

def _levels(bits: int) -> Tuple[int, float]:
    per_byte = 8 // bits
    mid = (2**bits - 1) / 2.0
    return per_byte, mid


def encode_residuals(residuals: np.ndarray, bits: int = 4) -> Tuple[np.ndarray, np.ndarray]:
    """residuals [N, D] → (packed uint8 [N, D·bits//8], scales fp16 [N]).

    Levels: scale·(q − mid) for q ∈ {0..2^bits−1}; scale = max|r| / mid keeps
    the outermost levels on the residual envelope. bits ∈ {2, 4}.
    """
    n, dim = residuals.shape
    per_byte, mid = _levels(bits)
    if dim % per_byte:
        raise ValueError(f"dim must be divisible by {per_byte} for {bits}-bit packing")
    scales = np.abs(residuals).max(axis=1) / mid
    safe = np.maximum(scales, 1e-8)[:, None]
    q = np.clip(np.round(residuals / safe + mid), 0, 2**bits - 1).astype(np.uint8)
    q = q.reshape(n, dim // per_byte, per_byte)
    packed = np.zeros(q.shape[:2], np.uint8)
    for j in range(per_byte):
        packed |= q[:, :, j] << (bits * j)
    return packed, scales.astype(np.float16)


def decode_residuals_np(packed: np.ndarray, scales: np.ndarray, dim: int,
                        bits: int = 4) -> np.ndarray:
    n = packed.shape[0]
    per_byte, mid = _levels(bits)
    mask = (1 << bits) - 1
    q = np.stack(
        [(packed >> (bits * j)) & mask for j in range(per_byte)], axis=2
    ).reshape(n, dim)
    return (q.astype(np.float32) - mid) * np.asarray(scales, np.float32)[:, None]


def decode_tokens(
    packed: jnp.ndarray,  # [.., D·bits//8] uint8
    scales: jnp.ndarray,  # [..] f32
    cids: jnp.ndarray,  # [..] int32
    centroids: jnp.ndarray,  # [K, D]
    dtype=jnp.bfloat16,
    bits: int = 4,
) -> jnp.ndarray:
    """Device-side reconstruction: centroid + scale·(q − mid)."""
    per_byte, mid = _levels(bits)
    mask = (1 << bits) - 1
    parts = [((packed >> (bits * j)) & mask) for j in range(per_byte)]
    q = jnp.stack(parts, axis=-1)
    q = q.reshape(*packed.shape[:-1], packed.shape[-1] * per_byte)
    residual = (q.astype(jnp.float32) - mid) * scales[..., None]
    return (centroids[cids].astype(jnp.float32) + residual).astype(dtype)
