"""Pallas sparse (lexical) term-match scan — term-major layout.

The sparse arm's corpus scan is *VPU-compute-bound*, not HBM-bound: at
Q=32 query terms the equality-match reduction

    score[n] = Σ_t Σ_q [ids[n,t] == q_ids[q]] · w[n,t] · q_w[q]

does ~N·T·Q vector ops against only N·T·6 bytes of HBM traffic. The r03
XLA formulations (``index/sparse.py`` broadcast/fori) paid two extra
costs on top of that intrinsic work: a materialized [block, T, Q]
temporary, and — with the row-major [cap, T=48] slab — 128-lane VPU
tiles running 48/128 useful lanes. This kernel removes both:

- **term-major slab** [T, cap]: the lane dimension is the corpus, every
  128-lane VPU op is fully utilized (same trick as the token-major
  ColBERT doc slab in ``ops/maxsim.py``);
- **no [.., Q] materialization**: the query loop accumulates
  ``acc[t, n] += [ids==qid_q]·q_w_q`` in a single VMEM-resident f32
  tile, then one weighted sublane reduction produces the block scores.

Per element that is ~3 VPU ops per query term (compare, select, add)
plus 2 closing ops — about 4.8 G ops for 1M×48×32, ≈1.3 ms at the VPU
roofline vs 7.8 ms for the r03 broadcast variant (BENCH_SPARSE_r03.json).

Shared XLA fallbacks (`xla_block_scores`) keep CPU/testing parity and are
reused by the mesh-sharded arm (``parallel/sharded_sparse.py``) so the
formulations can't drift (r03 ADVICE #2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scan_kernel(q_ids_ref, q_w_ref, ids_ref, w_ref, out_ref):
    """One corpus block: ids/w [T, bn] → scores [1, bn].

    q_ids/q_w live in SMEM. The query loop UNROLLS (Q is static and small):
    a fori_loop here serializes 32 tiny VPU passes behind scalar loads and
    loop control — measured 4.1 ms for the 1M scan where the pure VPU work
    is ~1.3 ms; unrolling lets Mosaic software-pipeline the compares.
    """
    ids = ids_ref[...]                       # [T, bn] int32
    n_q = q_ids_ref.shape[1]
    t, bn = ids.shape
    acc = jnp.zeros((t, bn), jnp.float32)
    for i in range(n_q):                     # static unroll
        acc = acc + jnp.where(ids == q_ids_ref[0, i], q_w_ref[0, i], 0.0)
    w = w_ref[...].astype(jnp.float32)
    out_ref[...] = jnp.sum(acc * w, axis=0, keepdims=True)


def _scan_kernel_batch(q_ids_ref, q_w_ref, ids_ref, w_ref, out_ref):
    """Batched block: q [B, Q] SMEM → scores [B, bn]."""
    ids = ids_ref[...]
    w = w_ref[...].astype(jnp.float32)
    b, n_q = q_ids_ref.shape
    t, bn = ids.shape
    for row in range(b):  # static: B is small (engine batch)
        acc = jnp.zeros((t, bn), jnp.float32)
        for i in range(n_q):  # static unroll (see _scan_kernel)
            acc = acc + jnp.where(
                ids == q_ids_ref[row, i], q_w_ref[row, i], 0.0)
        out_ref[row, :] = jnp.sum(acc * w, axis=0)


#: 16-bit dense ids start here: bit patterns ≥ 256 reinterpret as NORMAL
#: positive bf16 values (denormal compares can flush to zero; id 0 would
#: alias +0), so bf16 equality is exact bit equality. Pad −1 (0xFFFF) and
#: query-unknown −2 (0xFFFE) are NaN patterns — NaN ≠ everything, which
#: is precisely the never-match semantic those sentinels need.
#:
#: MEASURED VERDICT (r05, on-chip): v5e Mosaic legalizes NEITHER int16
#: NOR bf16 vector equality ("Target does not support this comparison")
#: — only 32-bit compares exist on this target, so the hoped-for 2× lane
#: packing is unavailable and the 32-bit kernel's 2.19 ms at 1M×48×32
#: (vs ~2.3 ms theoretical VPU roofline) is the hardware floor. The
#: batch-8 per-query cost (~2.66 ms) is therefore intrinsic compute
#: scaling, not a batching defect (the corpus READ amortizes; the
#: compare work cannot). The 16-bit path stays for CPU/interpret parity
#: and for future Mosaic targets that add sub-32-bit compares; on TPU it
#: must be explicitly pinned (scan_variant="pallas16") and will fail to
#: compile on v5e.
DENSE16_BASE = 256


def _scan_kernel_lut(tab_i_ref, tab_w_ref, r_ids_ref, r_w_ref,
                     ids_ref, w_ref, out_ref, *, hash_width: int):
    """Hash-LUT block scan — O(1) query-term lookups instead of a Q-wide
    compare unroll.

    The plain kernel pays ~3 VPU ops per (element, query term): ~96 ops
    per slab element at Q=32, which is why the scan is compute-bound
    (BENCH_SPARSE_r04: 2.2 ms ≈ the 32-bit VPU roofline) and why batching
    scaled linearly in Q. This kernel inverts the loop: the QUERY is
    preprocessed (host-side, 32 terms) into a bn-wide open-addressed hash
    table keyed by ``id & (bn-1)`` holding (expected raw id, weight);
    per element the score is two ``tpu.dynamic_gather`` lane lookups plus
    ONE compare —

        slot   = ids & (bn-1)
        match  = ids == tab_i[slot]
        acc    = match ? tab_w[slot] : 0

    — ~6 ops per element per QUERY (plus 3·R for the static residual
    unroll that catches hash collisions), independent of Q. Collisions are
    rare (32 terms into 4096 slots: P ≈ 0.12 per query); queries whose
    collisions overflow R fall back to the plain kernel host-side.

    Table sentinel is −2: slab pad is −1 and real ids are ≥ 0, so an empty
    slot can never match. Pad query slots (id −1 / weight 0) are skipped
    at build time.
    """
    ids = ids_ref[...]                       # [T, bn] int32
    t, bn = ids.shape
    # hash width ≤ bn (both powers of two): the table ships padded to the
    # block width (the gather's lane extent), but only its first
    # hash_width lanes are addressable
    slot = jax.lax.bitwise_and(ids, hash_width - 1)
    tab_i = jnp.broadcast_to(tab_i_ref[...], (t, bn))
    tab_w = jnp.broadcast_to(tab_w_ref[...], (t, bn))
    expect = jnp.take_along_axis(tab_i, slot, axis=1,
                                 mode="promise_in_bounds")
    wq = jnp.take_along_axis(tab_w, slot, axis=1,
                             mode="promise_in_bounds")
    acc = jnp.where(ids == expect, wq, 0.0)
    n_r = r_ids_ref.shape[1]
    for i in range(n_r):                     # static residual unroll
        acc = acc + jnp.where(ids == r_ids_ref[0, i], r_w_ref[0, i], 0.0)
    w = w_ref[...].astype(jnp.float32)
    out_ref[...] = jnp.sum(acc * w, axis=0, keepdims=True)


def _scan_kernel_lut_batch(tab_i_ref, tab_w_ref, r_ids_ref, r_w_ref,
                           ids_ref, w_ref, out_ref, *, hash_width: int):
    """Batched hash-LUT block (see _scan_kernel_lut): per-query tables
    [B, bn], residuals [B, R]. Per-query cost is Q-independent, so batch-8
    runs at ~the same per-query cost as batch-1 — the amortization the
    compare-unroll kernel could not deliver (r04 verdict item 6)."""
    ids = ids_ref[...]
    w = w_ref[...].astype(jnp.float32)
    t, bn = ids.shape
    b = tab_i_ref.shape[0]
    slot = jax.lax.bitwise_and(ids, hash_width - 1)
    n_r = r_ids_ref.shape[1]
    for row in range(b):                     # static: engine batch is small
        tab_i = jnp.broadcast_to(tab_i_ref[row:row + 1, :], (t, bn))
        tab_w = jnp.broadcast_to(tab_w_ref[row:row + 1, :], (t, bn))
        expect = jnp.take_along_axis(tab_i, slot, axis=1,
                                     mode="promise_in_bounds")
        wq = jnp.take_along_axis(tab_w, slot, axis=1,
                                 mode="promise_in_bounds")
        acc = jnp.where(ids == expect, wq, 0.0)
        for i in range(n_r):
            acc = acc + jnp.where(
                ids == r_ids_ref[row, i], r_w_ref[row, i], 0.0)
        out_ref[row, :] = jnp.sum(acc * w, axis=0)


#: residual-slot count for hash-collision overflow (static unroll width)
LUT_RESIDUALS = 4


def build_query_lut(q_ids: np.ndarray, q_w: np.ndarray, width: int,
                    n_residual: int = LUT_RESIDUALS):
    """Host-side query preprocessing for the LUT kernels.

    q_ids/q_w: [Q] or [B, Q] raw term ids / weights. Returns
    (tab_i [B, width] int32, tab_w [B, width] f32, r_ids [B, R] int32,
    r_w [B, R] f32) or None when any query's hash collisions overflow the
    residual slots (caller falls back to the compare-unroll kernel).
    ``width`` must be a power of two (the kernel masks with width−1).
    """
    q_ids = np.atleast_2d(np.asarray(q_ids, np.int32))
    q_w = np.atleast_2d(np.asarray(q_w, np.float32))
    b, _ = q_ids.shape
    tab_i = np.full((b, width), -2, np.int32)
    tab_w = np.zeros((b, width), np.float32)
    r_ids = np.full((b, n_residual), -2, np.int32)
    r_w = np.zeros((b, n_residual), np.float32)
    for row in range(b):
        n_r = 0
        for tid, tw in zip(q_ids[row].tolist(), q_w[row].tolist()):
            if tid < 0 or tw == 0.0:
                continue                      # pad / no-op term
            s = tid & (width - 1)
            if tab_i[row, s] == -2:
                tab_i[row, s] = tid
                tab_w[row, s] = tw
            else:
                if n_r >= n_residual:
                    return None               # overflow → fallback
                r_ids[row, n_r] = tid
                r_w[row, n_r] = tw
                n_r += 1
    return tab_i, tab_w, r_ids, r_w


def _pad_lut(tab_i, tab_w, bn):
    """Pad hash tables to the block width (the gather's lane extent);
    pad slots hold the −2 sentinel (never matches). Returns the padded
    pair and the original hash width."""
    hw = tab_i.shape[1]
    if hw > bn:
        raise ValueError(f"LUT width {hw} > kernel block width {bn}")
    if hw & (hw - 1):
        raise ValueError(f"LUT width {hw} must be a power of two")
    if hw == bn:
        return tab_i, tab_w, hw
    pad = bn - hw
    tab_i = jnp.pad(tab_i, ((0, 0), (0, pad)), constant_values=-2)
    tab_w = jnp.pad(tab_w, ((0, 0), (0, pad)))
    return tab_i, tab_w, hw


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def sparse_scores_tm_lut(ids_t, w_t, tab_i, tab_w, r_ids, r_w,
                         block_n: int = 4096, interpret: bool = False):
    """Hash-LUT scan: ids_t [T, cap] int32, tables from build_query_lut
    (single query: B=1) → scores [cap] f32. Table width: a power of two
    ≤ the kernel block width (padded up to it for the gather)."""
    t, cap = ids_t.shape
    bn = min(block_n, cap)
    tab_i, tab_w, hw = _pad_lut(tab_i, tab_w, bn)
    out = pl.pallas_call(
        functools.partial(_scan_kernel_lut, hash_width=hw),
        out_shape=jax.ShapeDtypeStruct((1, cap), jnp.float32),
        grid=(cap // bn,),
        in_specs=[
            pl.BlockSpec((1, bn), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_ids.shape[1]), lambda j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, r_w.shape[1]), lambda j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((t, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tab_i, tab_w, r_ids, r_w, ids_t, w_t)
    return out[0]


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def sparse_scores_tm_lut_batch(ids_t, w_t, tab_i, tab_w, r_ids, r_w,
                               block_n: int = 4096,
                               interpret: bool = False):
    """Batched hash-LUT scan: tables [B, hw] → scores [B, cap] f32."""
    t, cap = ids_t.shape
    b = tab_i.shape[0]
    bn = min(block_n, cap)
    tab_i, tab_w, hw = _pad_lut(tab_i, tab_w, bn)
    return pl.pallas_call(
        functools.partial(_scan_kernel_lut_batch, hash_width=hw),
        out_shape=jax.ShapeDtypeStruct((b, cap), jnp.float32),
        grid=(cap // bn,),
        in_specs=[
            pl.BlockSpec((b, bn), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, bn), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, r_ids.shape[1]), lambda j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, r_w.shape[1]), lambda j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((t, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, bn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tab_i, tab_w, r_ids, r_w, ids_t, w_t)


def _scan_kernel16(q_bits_ref, q_w_ref, ids_ref, w_ref, out_ref):
    """16-bit block scan: ids [T, bn] int16 (dense corpus-local vocab,
    offset by DENSE16_BASE) compared as bf16 BIT PATTERNS — v5e Mosaic has
    no int16 vector compare ("Target does not support this comparison"),
    but bf16 equality runs at 2× VPU lane packing, which is the only
    lever left on a scan already AT the 32-bit roofline (BENCH_SPARSE_r04:
    2.2 ms measured vs ~2.3 ms theoretical for 1M×48×32). Query ids
    arrive PRE-BITCAST as a bf16 VMEM row (tpu.bitcast is vector-only —
    a scalar in-kernel bitcast fails verification).

    The bf16 accumulator is EXACT, not approximate: query terms are
    unique, so each (t, n) element matches at most one of them — acc
    never sums two nonzero values, it just holds bf16(q_w) or 0. The
    closing weighted reduction runs in f32."""
    ids = jax.lax.bitcast_convert_type(ids_ref[...], jnp.bfloat16)
    n_q = q_bits_ref.shape[1]
    t, bn = ids.shape
    acc = jnp.zeros((t, bn), jnp.bfloat16)
    for i in range(n_q):                     # static unroll
        # q comparands ride SMEM as f32 holding bf16-EXACT values (Mosaic
        # can neither extract sub-32-bit scalars nor broadcast a [1,1]
        # tile in both axes); the f32→bf16 scalar cast is lossless here
        # and the scalar splat into the compare is a supported pattern
        qid = q_bits_ref[0, i].astype(jnp.bfloat16)
        qw = q_w_ref[0, i].astype(jnp.bfloat16)
        acc = acc + jnp.where(ids == qid, qw, jnp.bfloat16(0))
    w = w_ref[...].astype(jnp.float32)
    out_ref[...] = jnp.sum(acc.astype(jnp.float32) * w, axis=0,
                           keepdims=True)


def _scan_kernel16_batch(q_bits_ref, q_w_ref, ids_ref, w_ref, out_ref):
    """Batched 16-bit block (see _scan_kernel16)."""
    ids = jax.lax.bitcast_convert_type(ids_ref[...], jnp.bfloat16)
    w = w_ref[...].astype(jnp.float32)
    b, n_q = q_bits_ref.shape
    t, bn = ids.shape
    for row in range(b):
        acc = jnp.zeros((t, bn), jnp.bfloat16)
        for i in range(n_q):
            qid = q_bits_ref[row, i].astype(jnp.bfloat16)
            qw = q_w_ref[row, i].astype(jnp.bfloat16)
            acc = acc + jnp.where(ids == qid, qw, jnp.bfloat16(0))
        out_ref[row, :] = jnp.sum(acc.astype(jnp.float32) * w, axis=0)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def sparse_scores_tm(ids_t, w_t, q_ids, q_w, block_n: int = 4096,
                     interpret: bool = False):
    """ids_t [T, cap] int32 (or int16 → the 2× 16-bit kernel), w_t
    [T, cap] (bf16), q_ids [Q] int32, q_w [Q] f32 → scores [cap] f32.
    cap % block_n == 0 required (the slab pads to the block multiple;
    pad columns carry id −1 / weight 0)."""
    t, cap = ids_t.shape
    bn = min(block_n, cap)
    is16 = ids_t.dtype == jnp.int16
    q_spec = pl.BlockSpec((1, q_ids.shape[0]), lambda j: (0, 0),
                          memory_space=pltpu.SMEM)
    if is16:
        # bf16 bit-pattern values widened to f32 OUTSIDE the kernel
        # (lossless: every bf16 is f32-exact) so the kernel reads 32-bit
        # SMEM scalars and casts down — see _scan_kernel16
        q_arg = jax.lax.bitcast_convert_type(
            q_ids.astype(jnp.int16), jnp.bfloat16
        ).astype(jnp.float32).reshape(1, -1)
    else:
        q_arg = q_ids.reshape(1, -1)
    out = pl.pallas_call(
        _scan_kernel16 if is16 else _scan_kernel,
        out_shape=jax.ShapeDtypeStruct((1, cap), jnp.float32),
        grid=(cap // bn,),
        in_specs=[
            q_spec,
            pl.BlockSpec((1, q_w.shape[0]), lambda j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((t, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q_arg, q_w.reshape(1, -1), ids_t, w_t)
    return out[0]


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def sparse_scores_tm_batch(ids_t, w_t, q_ids, q_w, block_n: int = 4096,
                           interpret: bool = False):
    """Batched scan: q_ids/q_w [B, Q] → scores [B, cap] f32."""
    t, cap = ids_t.shape
    b = q_ids.shape[0]
    bn = min(block_n, cap)
    is16 = ids_t.dtype == jnp.int16
    q_spec = pl.BlockSpec(q_ids.shape, lambda j: (0, 0),
                          memory_space=pltpu.SMEM)
    if is16:
        q_arg = jax.lax.bitcast_convert_type(
            q_ids.astype(jnp.int16), jnp.bfloat16).astype(jnp.float32)
    else:
        q_arg = q_ids
    return pl.pallas_call(
        _scan_kernel16_batch if is16 else _scan_kernel_batch,
        out_shape=jax.ShapeDtypeStruct((b, cap), jnp.float32),
        grid=(cap // bn,),
        in_specs=[
            q_spec,
            pl.BlockSpec(q_w.shape, lambda j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((t, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, bn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q_arg, q_w, ids_t, w_t)


def xla_block_scores(bids, bw, q_ids, q_w, variant: str):
    """Shared XLA scoring core over a TERM-MAJOR block (bids/bw [T, blk]).

    The single-device, batched, and mesh-sharded scans all call this one
    helper so the formulations cannot drift apart (r03 ADVICE #2 found the
    broadcast variant missing from two of the three copies).

    - ``broadcast``: one-shot [T, blk, Q] masked sum.
    - ``fori``: per-query-term accumulation, [T, blk] working set (CPU
      cache-friendly; also the reference semantics for parity tests).
    """
    if variant == "broadcast":
        m = bids[:, :, None] == q_ids[None, None, :]
        return jnp.sum(
            jnp.where(m, bw[:, :, None].astype(jnp.float32)
                      * q_w[None, None, :], 0.0),
            axis=(0, 2))
    if variant != "fori":
        raise ValueError(f"unknown XLA sparse-scan variant {variant!r}")

    def qstep(i, acc):
        hit = jnp.where(bids == q_ids[i], bw.astype(jnp.float32), 0.0)
        return acc + q_w[i] * jnp.sum(hit, axis=0)

    return jax.lax.fori_loop(
        0, q_ids.shape[0], qstep, jnp.zeros(bids.shape[1], jnp.float32))


def xla_block_scores_batch(bids, bw, q_ids, q_w, variant: str):
    """Batched shared core: q_ids/q_w [B, Q], block [T, blk] → [B, blk]."""
    b = q_ids.shape[0]
    if variant == "broadcast":
        # [T, blk, B, Q] would blow memory; per-query loop with a batched
        # broadcast keeps the working set [B, T, blk]
        def qstep(i, acc):
            hit = bids[None, :, :] == q_ids[:, i][:, None, None]
            contrib = jnp.where(
                hit, bw.astype(jnp.float32)[None], 0.0).sum(axis=1)
            return acc + q_w[:, i][:, None] * contrib

        return jax.lax.fori_loop(
            0, q_ids.shape[1], qstep,
            jnp.zeros((b, bids.shape[1]), jnp.float32))
    if variant != "fori":
        raise ValueError(f"unknown XLA sparse-scan variant {variant!r}")

    def qstep(i, acc):
        hit = bids[None, :, :] == q_ids[:, i][:, None, None]
        contrib = jnp.where(
            hit, bw.astype(jnp.float32)[None], 0.0).sum(axis=1)
        return acc + q_w[:, i][:, None] * contrib

    return jax.lax.fori_loop(
        0, q_ids.shape[1], qstep, jnp.zeros((b, bids.shape[1]), jnp.float32))


def two_stage_top_k(scores: jnp.ndarray, k: int, block: int = 8192):
    """Hierarchical top-k over the last axis (per-block then merge): at 1M
    rows the flat lax.top_k costs as much as the whole Pallas scan. Thin
    alias over ``ops.topk.hierarchical_top_k`` (shared with the dense
    search path)."""
    from .topk import hierarchical_top_k

    return hierarchical_top_k(scores, k, block=block)


def np_scores_tm(ids_t: np.ndarray, w_t: np.ndarray, q_ids: np.ndarray,
                 q_w: np.ndarray) -> np.ndarray:
    """Host oracle over the term-major layout (tests)."""
    match = ids_t[:, :, None] == q_ids[None, None, :]
    return (match * w_t[:, :, None].astype(np.float32)
            * q_w[None, None, :]).sum((0, 2))
