"""Fused blockwise (flash) attention for prefill — Pallas TPU kernel.

The reference's generation hot loop is HF ``generate`` on a torch model
(``src/core/query/llm/local_llm.py:457-466``); its prefill materializes the
full [T, T] score matrix. For long RAG prompts (mode budgets allow 2000-4000
context tokens) that is O(T²) memory and blows past VMEM. This kernel
computes attention in [block_q × block_k] tiles with the online-softmax
recurrence — O(T) live memory, every tile a 128-aligned MXU matmul:

    for each (batch, head, q-block):          # grid
        for each k-block ≤ q-block:           # innermost grid dim
            s    = q @ kᵀ · scale              (MXU, f32 accumulate)
            m'   = max(m, rowmax(s))           (VPU)
            p    = exp(s − m')                  (VPU)
            acc  = acc·exp(m−m') + p @ v       (MXU)
            l    = l·exp(m−m') + rowsum(p)
        out = acc / l

GQA is handled in the BlockSpec index maps: kv blocks are fetched from head
``h // group`` — the shared K/V heads are never materialized per q-head.
Causal skipping is grid-level: k-blocks strictly above the diagonal are
predicated out with ``pl.when`` (no MXU work, only the prefetch).

Running max/sum scratches are stored lane-replicated ([bq, 128]) to respect
Mosaic's (sublane, 128) tiling.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  scale: float, block_q: int, block_k: int, causal: bool,
                  seq_len: int):
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = iq * block_q
    k_start = ik * block_k
    # causal: skip k-blocks strictly above this q-block's last row; also skip
    # k-blocks entirely past the real sequence (tail padding)
    live = k_start < seq_len
    if causal:
        live = jnp.logical_and(live, k_start <= q_start + block_q - 1)

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0, :, :].astype(jnp.float32)  # [bq, D]
        k = k_ref[0, 0, :, :].astype(jnp.float32)  # [bk, D]
        v = v_ref[0, 0, :, :].astype(jnp.float32)  # [bk, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [bq, bk]

        cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = cols < seq_len
        if causal:
            rows = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            mask = jnp.logical_and(mask, cols <= rows)
        s = jnp.where(mask, s, _NEG)

        m_prev = m_scr[:]  # [bq, 128] lane-replicated
        l_prev = l_scr[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)  # broadcast → [bq, 128]
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, :1])  # [bq, bk]
        l_scr[:] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha[:, :1] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_scr[:] = m_new

    @pl.when(ik == nk - 1)
    def _finish():
        l = l_scr[:, :1]
        out = jnp.where(l > 0, acc_scr[:] / jnp.maximum(l, 1e-30), 0.0)
        o_ref[0, 0, :, :] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "seq_len", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q: jnp.ndarray,  # [B, T, H, D]
    k: jnp.ndarray,  # [B, T, Hkv, D]
    v: jnp.ndarray,  # [B, T, Hkv, D]
    causal: bool = True,
    seq_len: int | None = None,  # real length ≤ T (tail cols masked out)
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Blockwise attention; returns [B, T, H, D] in q's dtype.

    ``T`` is padded internally to a block multiple; GQA ratios (H a multiple
    of Hkv) are resolved via block index maps.
    """
    b, t, h, d = q.shape
    hkv = k.shape[2]
    if h % hkv != 0:
        # a non-divisible ratio would make the kv index map (h // group)
        # request out-of-range head blocks — garbage output, not an error
        raise ValueError(f"q heads ({h}) must be a multiple of kv heads ({hkv})")
    group = h // hkv
    scale = 1.0 / np.sqrt(d)
    seq_len = t if seq_len is None else seq_len

    bq = min(block_q, max(16, t))
    bk = min(block_k, max(16, t))
    # pad to a COMMON multiple of both block sizes: rounding to max(bq, bk)
    # alone leaves tail blocks the smaller-block grid dimension never
    # covers (dropped keys / uninitialized output rows)
    lcm = bq * bk // math.gcd(bq, bk)
    t_pad = -(-t // lcm) * lcm
    if t_pad != t:
        pad = [(0, 0), (0, t_pad - t), (0, 0), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    # Kernel layout is [B, H, T, D] so each block's LAST-TWO dims are
    # (bq, d) — Mosaic requires (sublane ≥ 8, lane multiple of 128); the
    # caller-facing [B, T, H, D] layout would put (1, d) there, which does
    # not compile on real TPU. The transposes fuse into neighbouring ops.
    q = q.transpose(0, 2, 1, 3)  # [B, H, T, D]
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    grid = (b, h, t_pad // bq, t_pad // bk)
    kernel = functools.partial(
        _flash_kernel, scale=scale, block_q=bq, block_k=bk,
        causal=causal, seq_len=min(seq_len, t),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i, j: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d), lambda b_, h_, i, j: (b_, h_ // group, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d), lambda b_, h_, i, j: (b_, h_ // group, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i, j: (b_, h_, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),  # running max (lane-replicated)
            pltpu.VMEM((bq, 128), jnp.float32),  # running sum
            pltpu.VMEM((bq, d), jnp.float32),    # output accumulator
        ],
        interpret=interpret,
    )(q, k, v)
    return out.transpose(0, 2, 1, 3)[:, :t]


def attention_ref(q, k, v, causal=True, seq_len=None):
    """XLA oracle: full-matrix attention with GQA repeat (the path flash
    replaces; kept for parity tests and CPU fallback)."""
    b, t, h, d = q.shape
    group = h // k.shape[2]
    k = jnp.repeat(k, group, axis=2)
    v = jnp.repeat(v, group, axis=2)
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,  # f32 operands (CLAUDE.md)
    ) / np.sqrt(d)
    mask = jnp.ones((t, t), bool)
    if causal:
        mask = jnp.tril(mask)
    if seq_len is not None:
        mask = mask & (jnp.arange(t)[None, :] < seq_len)
    s = jnp.where(mask[None, None], s, _NEG)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v).astype(q.dtype)
