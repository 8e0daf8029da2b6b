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


#: last-axis length above which top-k runs hierarchically. Flat
#: ``lax.top_k`` cost grows super-linearly with N on TPU: at 10M×1024 int8
#: the scan's HBM floor is ~16 ms but the flat top-k pushed the search to
#: 276 ms/batch (BENCH_SCALE_10M_r04) — per-block top-k + a merge removes
#: almost all of it.
_TWO_STAGE_MIN = 32768
_TWO_STAGE_BLOCK = 16384


def hierarchical_top_k(scores: jax.Array, k: int,
                       block: int = _TWO_STAGE_BLOCK):
    """Exact top-k over the last axis via per-block top-k + candidate
    merge. Handles non-multiple N with a remainder slice. Equal-value ties
    resolve to the lowest index, same as flat ``lax.top_k``."""
    *lead, n = scores.shape
    if n <= max(block, k):
        return jax.lax.top_k(scores, k)
    n_blocks = n // block
    main = n_blocks * block
    k_local = min(k, block)
    blocked = scores[..., :main].reshape(*lead, n_blocks, block)
    vals, idx = jax.lax.top_k(blocked, k_local)  # [..., nb, kl]
    gidx = idx + (jnp.arange(n_blocks) * block)[:, None]
    cand_v = vals.reshape(*lead, n_blocks * k_local)
    cand_i = gidx.reshape(*lead, n_blocks * k_local)
    if main < n:
        rem = n - main
        k_rem = min(k, rem)
        rvals, ridx = jax.lax.top_k(scores[..., main:], k_rem)
        cand_v = jnp.concatenate([cand_v, rvals], axis=-1)
        rgidx = jnp.broadcast_to(ridx + main, rvals.shape)
        cand_i = jnp.concatenate([cand_i, rgidx], axis=-1)
    top_v, pos = jax.lax.top_k(cand_v, k)
    return top_v, jnp.take_along_axis(cand_i, pos, axis=-1)


def masked_top_k(scores: jax.Array, mask: jax.Array, k: int,
                 approx: bool = False):
    """Top-k over the last axis with a boolean validity mask.

    Args:
        scores: [..., N] float scores.
        mask:   [N] or [..., N] boolean; False rows can never be selected.
        k:      static number of results.
        approx: use the TPU-native approximate top-k (``lax.approx_max_k``
            → PartialReduce, one pass over the scores instead of the
            sort-network cost of exact selection). Only for SHORTLIST
            selection whose rows an exact stage rescores afterwards (the
            quantized flat search's host refine): at k_scan=8·k the
            approximate shortlist contained the full exact top-10 at 10M
            rows (BENCH_TOPK_AB_r04). On CPU the op falls back to an
            exact implementation, so parity tests run everywhere.

    Returns:
        (values [..., k], indices [..., k]); masked-out selections (when fewer
        than k rows are valid) carry value -inf.
    """
    masked = jnp.where(mask, scores.astype(jnp.float32), NEG_INF)
    n = masked.shape[-1]
    if approx and n >= _TWO_STAGE_MIN and n > k:
        return jax.lax.approx_max_k(masked, k, recall_target=0.95)
    if n >= _TWO_STAGE_MIN:
        return hierarchical_top_k(masked, k)
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
