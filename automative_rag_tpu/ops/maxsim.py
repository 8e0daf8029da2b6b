"""Fused MaxSim (late-interaction) scoring kernels.

Replaces the reference's per-document Python loop
(``src/core/query/llm/rerankers.py:215-265``: ``S = Q @ Dᵀ; max over doc
tokens; sum over content query tokens``) with one fused Pallas kernel that
scores *all* candidate documents for a *batch* of queries in a single launch:

    grid over doc blocks; per program:
        S    = [B·Lq, D] @ [D, ND·Ld]      (one MXU matmul per block)
        S   += doc-padding bias (-1e30 on padded doc tokens)
        max  = S.max(over doc tokens)       (VPU)
        out  = Σ over query tokens (max · query-token weight)

Per-block VMEM: docs (ND·Ld·D bf16) + similarity (B·Lq·ND·Ld f32); with the
default ND=8, Ld=256, D=1024, B≤8 that is ≈ 7 MB — streams a corpus of any
size through VMEM (SURVEY.md §5 "blockwise MaxSim").

Improvement over the reference: the reference pads documents to max length
and lets [PAD] tokens participate in the max (rerankers.py:195 tokenizes with
padding="max_length" and never masks doc tokens); here padded doc tokens are
properly excluded via the additive bias. Query-token filtering (drop
[CLS]/[SEP]/[PAD]; rerankers.py:250-258) is expressed by the caller through
``q_weights``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIAS = -1e30


def _as_weights_and_bias(q_mask: jax.Array, d_mask: jax.Array):
    """Boolean masks → f32 multiplicative query weights / additive doc bias."""
    qw = q_mask.astype(jnp.float32)
    d_bias = jnp.where(d_mask, 0.0, NEG_BIAS).astype(jnp.float32)
    return qw, d_bias


@partial(jax.jit, static_argnames=())
def maxsim_scores_ref(
    q: jax.Array,  # [B, Lq, D]
    q_mask: jax.Array,  # [B, Lq] bool — True for scoring query tokens
    docs: jax.Array,  # [N, Ld, D]
    d_mask: jax.Array,  # [N, Ld] bool — True for real doc tokens
) -> jax.Array:  # [B, N]
    """Pure-XLA reference implementation (CPU-runnable oracle)."""
    qw, d_bias = _as_weights_and_bias(q_mask, d_mask)
    sim = jnp.einsum(
        "bqd,ntd->bqnt",
        q.astype(jnp.float32),
        docs.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    sim = sim + d_bias[None, None, :, :]
    per_qtok = sim.max(axis=-1)  # [B, Lq, N]
    return (per_qtok * qw[:, :, None]).sum(axis=1)


def _maxsim_kernel(q_ref, qw_ref, d_ref, bias_ref, out_ref, acc_ref):
    """Grid (doc_blocks, token_chunks), token axis innermost: per (i, j) one
    MXU matmul over a [LDC, ND, D] doc slab, running max into acc scratch,
    final masked query-token sum on the last token chunk.

    The slab is token-major so the flattened similarity columns split as
    (LDC, ND) with the minor dim = ND = 128 — the only lane-dim split the
    Mosaic layout engine supports; doc-major ordering would need an
    unsupported 2048→(128,16) lane relayout."""
    b, lq, dim = q_ref.shape
    ldc, nd, _ = d_ref.shape
    j = pl.program_id(1)

    # bf16 operands hit the MXU natively (f32 accumulate); explicit HIGHEST
    # is only needed to stop multi-pass downcasting of f32 operands
    precision = (
        jax.lax.Precision.HIGHEST
        if d_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    sim = jax.lax.dot_general(
        q_ref[:].reshape(b * lq, dim),
        d_ref[:].reshape(ldc * nd, dim),
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    )  # [B*Lq, LDC*ND]
    sim = sim.reshape(b, lq, ldc, nd) + bias_ref[:][None, None, :, :]
    chunk_max = jnp.max(sim, axis=2)  # [B, Lq, ND]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = chunk_max

    @pl.when(j > 0)
    def _():
        acc_ref[:] = jnp.maximum(acc_ref[:], chunk_max)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = jnp.sum(acc_ref[:] * qw_ref[:][:, :, None], axis=1)


def _maxsim_kernel_q8(q_ref, qw_ref, d_ref, scales_ref, bias_ref, out_ref,
                      acc_ref):
    """int8 variant of `_maxsim_kernel`: doc tokens arrive as int8 with a
    per-(token, doc) f32 scale — HALF the HBM bytes of bf16, which is what
    bounds this kernel. Dequantization is free: int8 values are exactly
    representable in bf16, the cast happens in registers on the way into
    the MXU, and the scale (constant across the contracted dim) factors
    out of the dot product, so it multiplies the [B·Lq, LDC·ND] similarity
    AFTER the matmul."""
    b, lq, dim = q_ref.shape
    ldc, nd, _ = d_ref.shape
    j = pl.program_id(1)

    sim = jax.lax.dot_general(
        q_ref[:].reshape(b * lq, dim),
        d_ref[:].reshape(ldc * nd, dim).astype(q_ref.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B*Lq, LDC*ND]
    sim = sim.reshape(b, lq, ldc, nd)
    sim = sim * scales_ref[:][None, None, :, :] + bias_ref[:][None, None, :, :]
    chunk_max = jnp.max(sim, axis=2)  # [B, Lq, ND]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = chunk_max

    @pl.when(j > 0)
    def _():
        acc_ref[:] = jnp.maximum(acc_ref[:], chunk_max)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = jnp.sum(acc_ref[:] * qw_ref[:][:, :, None], axis=1)


def maxsim_scores_pallas(
    q: jax.Array,  # [B, Lq, D] — or [Ld, N, D] when token_major
    q_mask: jax.Array,  # [B, Lq] bool
    docs: jax.Array,  # [N, Ld, D]
    d_mask: jax.Array,  # [N, Ld] bool
    block_docs: int = 128,
    vmem_block_bytes: int = 4 * 1024 * 1024,
    interpret: bool = False,
    token_major: bool = False,
    d_scales: Optional[jax.Array] = None,  # [Ld, N] f32, int8 docs only
) -> jax.Array:  # [B, N]
    """Fused Pallas MaxSim over all candidate docs.

    N pads to a multiple of ``block_docs`` (lane-aligned output tiles) and Ld
    to a multiple of the token-chunk size, which is chosen so a doc slab fits
    ``vmem_block_bytes`` (double-buffered by the pipeline). Padded docs carry
    the -1e30 bias and score hugely negative; callers strip padded columns.

    ``token_major=True`` means ``docs`` is already [Ld, N, D] (and ``d_mask``
    [N, Ld] still) — encode-time relayout amortizes the 2·|docs| HBM
    transpose across every query that reranks the same candidates.

    ``d_scales`` (token-major [Ld, N] f32, requires int8 ``docs``): scores
    int8-quantized doc tokens natively — half the HBM traffic of bf16,
    dequantization fused into the kernel.
    """
    if token_major:
        ld, n, dim = docs.shape
    else:
        n, ld, dim = docs.shape
    b, lq, _ = q.shape
    int8_docs = d_scales is not None
    if int8_docs and not token_major:
        raise ValueError("int8 docs require the token-major layout")

    # VMEM budget: sim is [B·Lq, ND·LDC] f32; tile large query batches so a
    # single launch never exceeds ~8 queries (≈4 MB sim at Lq=32, ND=128)
    max_b = 8
    if b > max_b:
        chunks = [
            maxsim_scores_pallas(
                q[i : i + max_b], q_mask[i : i + max_b], docs, d_mask,
                block_docs=block_docs, vmem_block_bytes=vmem_block_bytes,
                interpret=interpret, token_major=token_major,
                d_scales=d_scales,
            )
            for i in range(0, b, max_b)
        ]
        return jnp.concatenate(chunks, axis=0)

    qw, d_bias = _as_weights_and_bias(q_mask, d_mask)

    # token-chunk size: fit the doc slab in the VMEM budget, respect the
    # dtype's minimum sublane tile
    itemsize = docs.dtype.itemsize
    min_sublane = {2: 16, 4: 8, 1: 32}.get(itemsize, 16)
    ld_chunk = max(min_sublane, vmem_block_bytes // (block_docs * dim * itemsize))
    ld_chunk = min(ld_chunk, max(ld, min_sublane))

    n_pad = -(-n // block_docs) * block_docs
    ld_pad = -(-ld // ld_chunk) * ld_chunk
    if token_major:
        docs_t = jnp.pad(docs, ((0, ld_pad - ld), (0, n_pad - n), (0, 0)))
    else:
        if n_pad != n or ld_pad != ld:
            docs = jnp.pad(docs, ((0, n_pad - n), (0, ld_pad - ld), (0, 0)))
        # token-major layout: lane dim = docs (128-aligned)
        docs_t = docs.transpose(1, 0, 2)  # [Ld_pad, N_pad, D]
    if n_pad != n or ld_pad != ld:
        d_bias = jnp.pad(
            d_bias, ((0, n_pad - n), (0, ld_pad - ld)), constant_values=NEG_BIAS
        )
        if int8_docs:
            d_scales = jnp.pad(
                d_scales, ((0, ld_pad - ld), (0, n_pad - n))
            )
    d_bias_t = d_bias.T  # [Ld_pad, N_pad]

    grid = (n_pad // block_docs, ld_pad // ld_chunk)
    common_specs = [
        pl.BlockSpec((b, lq, dim), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, lq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (ld_chunk, block_docs, dim), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
        ),
    ]
    bias_spec = pl.BlockSpec(
        (ld_chunk, block_docs), lambda i, j: (j, i), memory_space=pltpu.VMEM
    )
    if int8_docs:
        kernel = _maxsim_kernel_q8
        in_specs = common_specs + [bias_spec, bias_spec]
        operands = (q, qw, docs_t, d_scales, d_bias_t)
    else:
        kernel = _maxsim_kernel
        in_specs = common_specs + [bias_spec]
        operands = (q, qw, docs_t, d_bias_t)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, block_docs), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, lq, block_docs), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * lq * dim * n_pad * ld_pad,
            bytes_accessed=n_pad * ld_pad * dim * itemsize
            + b * lq * dim * q.dtype.itemsize
            + b * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out[:, :n]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def maxsim_scores(
    q: jax.Array,
    q_mask: jax.Array,
    docs: jax.Array,
    d_mask: jax.Array,
    block_docs: int = 128,
    use_pallas: Optional[bool] = None,
    token_major: bool = False,
    d_scales: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """MaxSim scores [B, N]; Pallas kernel on TPU, XLA fallback elsewhere.

    ``token_major``: docs are [Ld, N, D] (the production layout — encoders
    emit it so the hot path never pays a per-query HBM transpose).
    ``d_scales`` [Ld, N]: docs are int8 with per-token scales; the Pallas
    kernel dequantizes in registers (half the HBM traffic)."""
    if use_pallas is None:
        use_pallas = _on_tpu()
    if use_pallas:
        # fp16 is the host-transfer/storage format only: Mosaic's fp16 MXU
        # support is unproven vs bf16, and mixed fp16×bf16 dots never run in
        # any on-chip bench — normalize both operands to bf16 here
        if q.dtype == jnp.float16:
            q = q.astype(jnp.bfloat16)
        if d_scales is None and docs.dtype == jnp.float16:
            docs = docs.astype(jnp.bfloat16)
        return maxsim_scores_pallas(
            q, q_mask, docs, d_mask, block_docs=block_docs,
            token_major=token_major, d_scales=d_scales, interpret=interpret,
        )
    if d_scales is not None:
        docs = docs.astype(jnp.float32) * d_scales[:, :, None]
    if token_major:
        docs = docs.transpose(1, 0, 2)
    return maxsim_scores_ref(q, q_mask, docs, d_mask)


def maxsim_argmax_ref(
    q: jax.Array,  # [Lq, D] single query
    q_mask: jax.Array,  # [Lq]
    doc: jax.Array,  # [Ld, D] single doc
    d_mask: jax.Array,  # [Ld]
):
    """Per-query-token best doc token and similarity — powers token-level
    match explanations (reference rerankers.py:387-561)."""
    sim = jnp.einsum(
        "qd,td->qt",
        q.astype(jnp.float32),
        doc.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    sim = sim + jnp.where(d_mask, 0.0, NEG_BIAS)[None, :]
    best = jnp.argmax(sim, axis=1)
    best_sim = jnp.max(sim, axis=1)
    return best, jnp.where(q_mask, best_sim, 0.0)


def min_max_normalize(scores: np.ndarray) -> np.ndarray:
    """Per-candidate-set min-max normalization — exact reference semantics
    for the hybrid combine (rerankers.py:302-333): constant score lists
    normalize to all-ones."""
    scores = np.asarray(scores, np.float64)
    if scores.size == 0:
        return scores
    lo, hi = scores.min(), scores.max()
    if hi - lo > 0:
        return (scores - lo) / (hi - lo)
    return np.ones_like(scores)
