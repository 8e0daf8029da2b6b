"""Fused w4a16 matmul — Pallas TPU kernel for int4 weight-only serving.

The reference serves its 7B model 4-bit via BitsAndBytes fused CUDA kernels
(src/config/settings.py:195-214). The XLA path for packed-nibble weights is
catastrophic for decode: the unpack (`&0xF` / `>>4` → stack/concat) cannot
fuse into a dot (MXU operands must be materialized), so EVERY decode step
writes + reads the full bf16 weight tensor in HBM — measured 6.7 tok/s for
the 7B geometry on one v5e vs 92.8 tok/s int8 (BENCH_LLM7B_r03.json).

This kernel keeps packed uint8 in HBM/VMEM and unpacks per-tile in
registers on the way into the MXU, so HBM traffic per token is the PACKED
bytes (~3.6 GB for 7B) — the int4 point lands where it should: faster than
int8, not 14× slower.

Packing layout (``pack_w4``): nibble pairs span the input dim's HALVES,
not adjacent rows — P[i] = W[i] | (W[i + K/2] << 4) — so the kernel reads
x's two halves as CONTIGUOUS slices (a stride-2 lane access or a lane-dim
reshape would violate Mosaic layout rules; see CLAUDE.md):

    y = x_lo @ (P & 0xF − 8) + x_hi @ (P >> 4 − 8), scaled per out-channel

Grid is (M-blocks, N-blocks, K-blocks), K innermost, f32 accumulator in
VMEM scratch; the per-out-channel scale multiplies once on the last K step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_w4(kernel: np.ndarray):
    """f32 kernel [K, N] → (packed uint8 [K/2, N], f32 scales [N]).

    Symmetric per-out-channel int4 ([-8, 7], offset-8 stored); nibble pairs
    are (row i, row i + K/2) so the matmul kernel slices x contiguously."""
    k_dim = kernel.shape[0]
    if k_dim % 2:
        raise ValueError(f"input dim must be even for int4 packing, got {k_dim}")
    scale = np.abs(kernel).max(axis=0) / 7.0
    safe = np.maximum(scale, 1e-12)
    q = np.clip(np.round(kernel / safe[None, :]), -8, 7).astype(np.int8) + 8
    low, high = q[: k_dim // 2].astype(np.uint8), q[k_dim // 2 :].astype(np.uint8)
    return (low | (high << 4)), scale.astype(np.float32)


def unpack_w4(packed: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[K/2, N] packed → [K, N] dequantized-to-integer values (×scale is the
    caller's job). XLA fallback path — materializes the tensor, fine for
    prefill-sized reuse or CPU, ruinous per decode step (see module doc)."""
    low = (packed & 0xF).astype(jnp.int8) - 8
    high = (packed >> 4).astype(jnp.int8) - 8
    return jnp.concatenate([low, high], axis=0).astype(dtype)


def _w4_kernel(xlo_ref, xhi_ref, p_ref, scale_ref, o_ref, acc_ref, sum_ref,
               *, unpack: str):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        sum_ref[:] = jnp.zeros_like(sum_ref)

    # Offset trick: matmul against the RAW nibbles (0..15) and fold the −8
    # zero-point out of the elementwise path — W = nib − 8 means
    # y = x@nib − 8·rowsum(x), and rowsum(x) is one cheap reduction per
    # tile instead of a per-weight-element subtract. Halves the VPU unpack
    # arithmetic, which is what bounds decode (M is tiny, the MXU idles).
    xlo = xlo_ref[:]
    xhi = xhi_ref[:]
    if unpack == "i32":
        # nibble ops in int32: Mosaic does not legalize int8 subi; i32 is
        # the safe width (but processes 4× fewer bytes per vector op)
        p = p_ref[:].astype(jnp.int32)  # [bk, bn]
        low = (p & 0xF).astype(xlo_ref.dtype)
        high = (p >> 4).astype(xlo_ref.dtype)
    elif unpack == "u8":
        # bitwise masks in native uint8 lanes: 4× more elements per VPU op
        # than the i32 widen. Mosaic legalizes NO direct u8 float convert
        # (r03: "Unsupported cast: uint8 -> bfloat16") and NO u8-lane
        # right-shift either (r05: 'arith.shrui' on vector<i8> fails to
        # legalize — the root cause of every prior u8 compile failure), so
        # BOTH nibbles extract with a dense u8 mask: low = p & 0x0F,
        # high·16 = p & 0xF0, and the ÷16 folds into the x tile (exact:
        # power of two in bf16). Only the mask runs at u8 lane density;
        # the widen to matmul dtype goes through the legal u8→i32 cast.
        p = p_ref[:]
        low = (p & jnp.uint8(0x0F)).astype(jnp.int32).astype(xlo_ref.dtype)
        high = (p & jnp.uint8(0xF0)).astype(jnp.int32).astype(xlo_ref.dtype)
        xhi = (xhi * 0.0625).astype(xlo_ref.dtype)
    else:  # "merged": one mask on the big tile; raw bytes feed the MXU.
        # p = low + 16·high ⇒ x_hi@high = (x_hi/16)@p − (x_hi/16)@low, so
        #   y = (x_lo − x_hi/16)@low + (x_hi/16)@p − 8·rowsum(x)
        # p ≤ 255 and nibbles ≤ 15 are exact in bf16; the only new
        # rounding is the bf16 combine of the two x tiles (tiny vs the
        # int4 quantization error itself).
        p = p_ref[:].astype(jnp.int32)
        low = (p & 0xF).astype(xlo_ref.dtype)
        high = p.astype(xlo_ref.dtype)  # raw bytes (= low + 16·high)
        xhi = (xhi * 0.0625).astype(xlo_ref.dtype)
        xlo = (xlo - xhi).astype(xlo_ref.dtype)
    acc_ref[:] += jax.lax.dot_general(
        xlo, low, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        xhi, high, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sum_ref[:] += jnp.sum(
        xlo_ref[:].astype(jnp.float32) + xhi_ref[:].astype(jnp.float32),
        axis=1, keepdims=True,
    )  # [bm, 1] broadcast into the lane-replicated [bm, 128] scratch

    @pl.when(k == pl.num_programs(2) - 1)
    def _finish():
        o_ref[:] = ((acc_ref[:] - 8.0 * sum_ref[:, :1])
                    * scale_ref[0, :].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "interpret",
                              "unpack")
)
def w4_matmul(
    x: jnp.ndarray,       # [M, K] bf16/f32 activations
    packed: jnp.ndarray,  # [K/2, N] uint8 (pack_w4 layout)
    scale: jnp.ndarray,   # [N] f32 per-out-channel
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,   # of the K/2 packed rows per step
    interpret: bool = False,
    unpack: str = "i32",  # "i32" | "u8" | "merged" (see _w4_kernel)
) -> jnp.ndarray:
    """x @ dequant(packed) * scale → [M, N] in x.dtype."""
    if unpack not in ("i32", "u8", "merged"):
        raise ValueError(
            f"unknown w4 unpack strategy {unpack!r} "
            "(expected 'i32', 'u8' or 'merged')")
    m, k_dim = x.shape
    k2, n = packed.shape
    if k2 * 2 != k_dim:
        raise ValueError(f"packed rows {k2} must be half of x's K {k_dim}")
    x_lo, x_hi = x[:, :k2], x[:, k2:]

    # bf16 tiles need ≥16 sublanes unless the block spans the whole dim —
    # padding M up keeps both true for decode-sized batches
    bm = min(block_m, max(16 if x.dtype != jnp.float32 else 8, m))
    bn = min(block_n, n)
    bk = min(block_k, k2)
    m_pad = -(-m // bm) * bm
    n_pad = -(-n // bn) * bn
    k_pad = -(-k2 // bk) * bk
    if m_pad != m or k_pad != k2:
        x_lo = jnp.pad(x_lo, ((0, m_pad - m), (0, k_pad - k2)))
        x_hi = jnp.pad(x_hi, ((0, m_pad - m), (0, k_pad - k2)))
    if k_pad != k2 or n_pad != n:
        # pad value 0x88 decodes to (−8+8)=0 in both nibbles... 0x88 low
        # nibble is 8 → 8−8=0, high nibble 8 → 0: zero contribution
        packed = jnp.pad(packed, ((0, k_pad - k2), (0, n_pad - n)),
                         constant_values=0x88)
    if n_pad != n:
        scale = jnp.pad(scale, (0, n_pad - n))
    scale2 = scale.reshape(1, -1)

    grid = (m_pad // bm, n_pad // bn, k_pad // bk)
    out = pl.pallas_call(
        functools.partial(_w4_kernel, unpack=unpack),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32),
                        pltpu.VMEM((bm, 128), jnp.float32)],
        interpret=interpret,
    )(x_lo, x_hi, packed, scale2)
    return out[:m, :n]
