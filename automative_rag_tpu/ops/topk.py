"""Masked top-k selection and shard-wise top-k merging.

These are the TPU-native replacement for Qdrant's filtered HNSW result
selection (reference ``vectorstore.py:166-214``): similarity scores are
computed densely on the MXU, invalid/filtered rows are masked to -inf, and
``jax.lax.top_k`` selects candidates. ``merge_top_k`` combines per-shard
top-k results after an all-gather over the mesh shard axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


def masked_top_k(scores: jax.Array, mask: jax.Array, k: int):
    """Top-k over the last axis with a boolean validity mask.

    Args:
        scores: [..., N] float scores.
        mask:   [N] or [..., N] boolean; False rows can never be selected.
        k:      static number of results.

    Returns:
        (values [..., k], indices [..., k]); masked-out selections (when fewer
        than k rows are valid) carry value -inf.
    """
    masked = jnp.where(mask, scores.astype(jnp.float32), NEG_INF)
    return jax.lax.top_k(masked, k)


def merge_top_k(values: jax.Array, indices: jax.Array, k: int):
    """Merge per-shard top-k lists into a global top-k.

    Args:
        values:  [n_shards, ..., k] per-shard top-k scores.
        indices: [n_shards, ..., k] per-shard *global* row ids.
        k:       static number of final results.

    Returns:
        (values [..., k], indices [..., k]) globally best-k by score.
    """
    n_shards = values.shape[0]
    # [n_shards, ..., k] -> [..., n_shards * k]
    flat_vals = jnp.moveaxis(values, 0, -2).reshape(*values.shape[1:-1], n_shards * values.shape[-1])
    flat_idx = jnp.moveaxis(indices, 0, -2).reshape(*indices.shape[1:-1], n_shards * indices.shape[-1])
    top_vals, pos = jax.lax.top_k(flat_vals, k)
    top_idx = jnp.take_along_axis(flat_idx, pos, axis=-1)
    return top_vals, top_idx
