"""IVF ANN index: k-means coarse quantizer + probe-gather search.

The TPU-native replacement for Qdrant's HNSW (SURVEY.md §2.2): instead of
sequential graph traversal, search is three dense steps —

    1. q @ centroidsᵀ → top-nprobe lists          (MXU)
    2. gather the probed lists' row ids + vectors  (static shapes: every
       list is padded to the same capacity, -1 = empty slot)
    3. masked candidate scores → jax.lax.top_k     (MXU + VPU)

Metadata filters reuse the FlatIndex bitmask: the full-corpus row mask is
computed once per query (VPU, cheap) and gathered per candidate — so
filtered recall degrades only by probe starvation, which ``nprobe`` controls
(SURVEY.md §7 "mask-aware probe expansion" is the round-2 refinement).

Live upserts land in a flat **tail buffer** searched exactly and merged with
the IVF candidates (classic IVF+fresh-list design); ``rebuild()`` folds the
tail into the lists. Deletes tombstone rows via the validity mask everywhere.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmeans import spherical_kmeans
from ..ops.topk import masked_top_k, merge_top_k
from .filters import NUMERIC_MISSING, FilterSpec, eval_filter_mask
from .flat import (
    FlatIndex,
    SearchResult,
    _round_capacity,
    _search_kernel,
    _search_kernel_int8,
)


#: upper bound on gathered candidate rows per probe chunk (per query). The
#: gather materializes [B, chunk·list_cap, D]; an unchunked gather at high
#: nprobe on an imbalanced build blew past HBM (23.5 GB requested at
#: nprobe=128 × list_cap≈5600 × 1M rows) — probes stream through a
#: lax.scan with a running top-k instead, so memory is flat in nprobe.
PROBE_GATHER_ROWS = 32_768


@partial(jax.jit, static_argnames=("nprobe", "k", "int8"))
def _ivf_search_kernel(
    vectors,  # [cap, D] (bf16/f32, or int8 when int8=True)
    row_scales,  # [cap] f32 (int8 mode) or None-like zeros
    full_mask,  # [cap] bool — valid ∧ filter
    centroids,  # [K, D] float (always)
    list_table,  # [K, list_cap] int32 row ids, -1 = empty
    queries,  # [B, D] f32
    nprobe: int,
    k: int,
    int8: bool,
):
    coarse = jax.lax.dot_general(
        queries.astype(centroids.dtype), centroids, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [B, K]
    _, probes = jax.lax.top_k(coarse, nprobe)  # [B, nprobe]

    b = queries.shape[0]
    list_cap = list_table.shape[1]
    # probes stream in chunks: VMEM/HBM-bounded gather, running top-k merge
    chunk = max(1, min(nprobe, PROBE_GATHER_ROWS // max(list_cap, 1)))
    # each chunk must expose ≥ k candidate slots for its masked_top_k
    while chunk * list_cap < k and chunk < nprobe:
        chunk += 1
    n_chunks = -(-nprobe // chunk)
    pad = n_chunks * chunk - nprobe
    probe_valid = jnp.arange(n_chunks * chunk) < nprobe  # [n_chunks·chunk]
    probes = jnp.pad(probes, ((0, 0), (0, pad)))
    probes_s = probes.reshape(b, n_chunks, chunk).transpose(1, 0, 2)
    pvalid_s = probe_valid.reshape(n_chunks, chunk)

    k_run = min(k, chunk * list_cap)
    # HIGHEST forces an f32 upconvert of the gathered slab; bf16 operands
    # should hit the MXU natively
    precision = (
        jax.lax.Precision.HIGHEST
        if (not int8 and vectors.dtype == jnp.float32)
        else jax.lax.Precision.DEFAULT
    )
    if int8:
        q_scale = jnp.max(jnp.abs(queries), axis=1, keepdims=True) / 127.0
        q_i8 = jnp.clip(
            jnp.round(queries / jnp.maximum(q_scale, 1e-12)), -127, 127
        ).astype(jnp.int8)

    def body(carry, inp):
        best_vals, best_rows = carry
        pr, pv = inp  # [B, chunk], [chunk]
        cand = jnp.where(pv[None, :, None], list_table[pr], -1)
        cand = cand.reshape(b, -1)  # [B, chunk·list_cap]
        safe = jnp.maximum(cand, 0)
        cand_vecs = vectors[safe]  # [B, M, D]
        if int8:
            raw = jnp.einsum(
                "bd,bmd->bm", q_i8, cand_vecs, preferred_element_type=jnp.int32
            )
            scores = raw.astype(jnp.float32) * q_scale * row_scales[safe]
        else:
            scores = jnp.einsum(
                "bd,bmd->bm", queries.astype(vectors.dtype), cand_vecs,
                precision=precision,
                preferred_element_type=jnp.float32,
            )
        mask = (cand >= 0) & full_mask[safe]
        vals, pos = masked_top_k(scores, mask, k_run)
        rows = jnp.take_along_axis(cand, pos, axis=1)
        # disjoint lists across chunks → no duplicate rows in the merge
        merged = merge_top_k(
            jnp.stack([best_vals, vals]), jnp.stack([best_rows, rows]), k_run
        )
        return merged, None

    init = (
        jnp.full((b, k_run), -jnp.inf, jnp.float32),
        jnp.full((b, k_run), -1, jnp.int32),
    )
    (vals, rows), _ = jax.lax.scan(body, init, (probes_s, pvalid_s))
    if k_run < k:
        padk = k - k_run
        vals = jnp.concatenate(
            [vals, jnp.full((b, padk), -jnp.inf, vals.dtype)], axis=1)
        rows = jnp.concatenate(
            [rows, jnp.full((b, padk), -1, rows.dtype)], axis=1)
    return vals, rows


@partial(jax.jit, static_argnames=(
    "nprobe_full", "nprobe_far", "refine_dims", "shortlist", "k", "int8"))
def _ivf_search_refined_kernel(
    vectors, vectors_head, row_scales, full_mask, centroids, list_table,
    queries,
    nprobe_full: int, nprobe_far: int, refine_dims: int, shortlist: int,
    k: int, int8: bool,
):
    """Coarse-then-refine probing (VERDICT r2 weak #4: 0.995 recall cost):

    - the ``nprobe_full`` highest-affinity lists score exactly (as the base
      kernel does);
    - the next ``nprobe_far`` lists score on the first ``refine_dims``
      dimensions only — the gather reads refine_dims/D of the bytes and the
      MXU does refine_dims/D of the work, which is where high-nprobe
      latency actually goes;
    - the far shortlist (top ``shortlist`` by partial score) is re-scored
      EXACTLY on full dimensions and merged with the near top-k.

    The far neighbors a wide probe exists to catch are rarely in the final
    top-k by a hair — a 4× cheaper screen plus an exact rescore of the
    shortlist keeps recall while cutting the marginal probe cost ~4×
    (ScaNN/PLAID-style two-stage scoring, TPU-shaped: both stages stay
    dense MXU contractions with static shapes)."""
    nprobe = nprobe_full + nprobe_far
    coarse = jax.lax.dot_general(
        queries.astype(centroids.dtype), centroids, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    _, probes = jax.lax.top_k(coarse, nprobe)

    b = queries.shape[0]
    list_cap = list_table.shape[1]
    precision = (
        jax.lax.Precision.HIGHEST
        if (not int8 and vectors.dtype == jnp.float32)
        else jax.lax.Precision.DEFAULT
    )
    if int8:
        q_scale = jnp.max(jnp.abs(queries), axis=1, keepdims=True) / 127.0
        q_i8 = jnp.clip(
            jnp.round(queries / jnp.maximum(q_scale, 1e-12)), -127, 127
        ).astype(jnp.int8)

    # ---- stage 1: exact scoring over the near probes (streamed) ----
    vals, rows = _ivf_search_kernel(
        vectors, row_scales, full_mask, centroids, list_table, queries,
        nprobe_full, k, int8,
    )

    # ---- stage 2: partial-dim screen over the far probes ----
    far = probes[:, nprobe_full:]
    chunk = max(1, min(nprobe_far, PROBE_GATHER_ROWS // max(list_cap, 1)))
    n_chunks = -(-nprobe_far // chunk)
    pad = n_chunks * chunk - nprobe_far
    far_valid = jnp.arange(n_chunks * chunk) < nprobe_far
    far = jnp.pad(far, ((0, 0), (0, pad)))
    far_s = far.reshape(b, n_chunks, chunk).transpose(1, 0, 2)
    fvalid_s = far_valid.reshape(n_chunks, chunk)

    s_run = min(shortlist, chunk * list_cap)

    def far_body(carry, inp):
        best_vals, best_rows = carry
        pr, pv = inp
        cand = jnp.where(pv[None, :, None], list_table[pr], -1)
        cand = cand.reshape(b, -1)
        safe = jnp.maximum(cand, 0)
        # full-row gather from the contiguous head copy (a combined
        # row-gather + column-slice hits an XLA:TPU fallback ~30× slower)
        cand_vecs = vectors_head[safe]
        if int8:
            raw = jnp.einsum(
                "bd,bmd->bm", q_i8[:, :refine_dims], cand_vecs,
                preferred_element_type=jnp.int32,
            )
            # row_scales DO matter for cross-row ranking (q_scale doesn't)
            scores = raw.astype(jnp.float32) * row_scales[safe]
        else:
            scores = jnp.einsum(
                "bd,bmd->bm", queries[:, :refine_dims].astype(vectors.dtype),
                cand_vecs, precision=precision,
                preferred_element_type=jnp.float32,
            )
        mask = (cand >= 0) & full_mask[safe]
        svals, pos = masked_top_k(scores, mask, s_run)
        srows = jnp.take_along_axis(cand, pos, axis=1)
        merged = merge_top_k(
            jnp.stack([best_vals, svals]), jnp.stack([best_rows, srows]), s_run
        )
        return merged, None

    init = (
        jnp.full((b, s_run), -jnp.inf, jnp.float32),
        jnp.full((b, s_run), -1, jnp.int32),
    )
    (_, short_rows), _ = jax.lax.scan(far_body, init, (far_s, fvalid_s))

    # ---- stage 3: exact rescore of the shortlist, merge with stage 1 ----
    safe = jnp.maximum(short_rows, 0)
    short_vecs = vectors[safe]  # [B, S, D]
    if int8:
        raw = jnp.einsum(
            "bd,bsd->bs", q_i8, short_vecs, preferred_element_type=jnp.int32
        )
        exact = raw.astype(jnp.float32) * q_scale * row_scales[safe]
    else:
        exact = jnp.einsum(
            "bd,bsd->bs", queries.astype(vectors.dtype), short_vecs,
            precision=precision,
            preferred_element_type=jnp.float32,
        )
    smask = (short_rows >= 0) & full_mask[safe]
    # the shortlist can be narrower than k (tiny lists / small shortlist
    # settings) — top-k must not exceed the candidate width
    k_run = min(k, s_run)
    svals, pos = masked_top_k(exact, smask, k_run)
    srows = jnp.take_along_axis(short_rows, pos, axis=1)
    if k_run < k:
        padk = k - k_run
        svals = jnp.concatenate(
            [svals, jnp.full((b, padk), -jnp.inf, svals.dtype)], axis=1)
        srows = jnp.concatenate(
            [srows, jnp.full((b, padk), -1, srows.dtype)], axis=1)
    return merge_top_k(jnp.stack([vals, svals]), jnp.stack([rows, srows]), k)


#: alignment (rows) of each list's span in the CSR layout — sublane-dim
#: friendly and keeps fold scatters 8-aligned
CSR_ALIGN = 8


def _pow2_at_least(n: int, floor: int = 128) -> int:
    cap = floor
    while cap < n:
        cap *= 2
    return cap


@partial(jax.jit, static_argnames=("budget", "k", "int8"))
def _ivf_budget_search_kernel(
    vectors,      # [cap, D] corpus slab in ORIGINAL row order
    row_scales,   # [cap] f32 (int8) or zeros
    full_mask,    # [cap] bool — valid ∧ filter
    centroids,    # [K, D] float
    sorted_rows,  # [M] int32 — row ids grouped by list, -1 = empty slot
    list_starts,  # [K] int32 — span start of each list in sorted_rows
    scan_lens,    # [K] int32 — CSR_ALIGN-aligned scan extent of each list
    queries,      # [B, D] f32
    budget: int,  # scanned-slot budget per query (static)
    k: int,
    int8: bool,
):
    """Budget probing over VARIABLE-length lists (VERDICT r04 #1): lists
    are ranked by centroid affinity and scanned in that order until the
    per-query slot budget is spent — the cost knob is rows scanned, not
    list count, so skewed corpora (power-law/encoder manifolds) keep their
    dense regions in few big lists instead of spilling overflow rows into
    far lists the probe ranking can never reach (the balanced build's
    nprobe-8 recall on 1M powerlaw was 0.265; unbalanced assignment is the
    textbook IVF contract). All static shapes:

        1. q @ centroidsᵀ → full list ranking                       (MXU)
        2. scatter-mark + cumsum inverts the ranked cumulative
           lengths into per-slot (list, offset) — O(K + budget)     (VPU)
        3. chunked gather + masked scores → running top-k           (MXU)
    """
    b, dim = queries.shape
    n_lists = centroids.shape[0]
    m_slots = sorted_rows.shape[0]

    coarse = jax.lax.dot_general(
        queries.astype(centroids.dtype), centroids, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [B, K]
    # full descending list ranking (K ≲ 4–8K: one flat sort per batch)
    _, order = jax.lax.top_k(coarse, n_lists)  # [B, K]
    lens_ord = scan_lens[order]
    cum = jnp.cumsum(lens_ord, axis=1)  # [B, K]
    prev = cum - lens_ord
    total = jnp.minimum(cum[:, -1:], budget)  # [B, 1]

    # invert cumulative lengths → per-slot list index j: j[s] = #{l: cum[l] ≤ s}
    # via scatter-add marks at each list's end position + cumsum (s is the
    # sorted iota, so this is O(K + budget) instead of a searchsorted)
    marks = jnp.zeros((b, budget + 1), jnp.int32)
    ends = jnp.minimum(cum, budget)  # [B, K]
    marks = marks.at[jnp.arange(b)[:, None], ends].add(1)
    j = jnp.cumsum(marks[:, :budget], axis=1)  # [B, budget]
    j_safe = jnp.minimum(j, n_lists - 1)
    s = jnp.arange(budget, dtype=jnp.int32)[None, :]
    within = s - jnp.take_along_axis(prev, j_safe, axis=1)
    pos = jnp.take_along_axis(list_starts[order], j_safe, axis=1) + within
    valid_slot = s < total
    cand = jnp.where(
        valid_slot, sorted_rows[jnp.clip(pos, 0, m_slots - 1)], -1
    )  # [B, budget]

    # ---- chunked scoring with a running top-k (memory flat in budget) ----
    chunk = min(budget, PROBE_GATHER_ROWS)
    n_chunks = -(-budget // chunk)
    pad = n_chunks * chunk - budget
    if pad:
        cand = jnp.pad(cand, ((0, 0), (0, pad)), constant_values=-1)
    cand_s = cand.reshape(b, n_chunks, chunk).transpose(1, 0, 2)

    k_run = min(k, chunk)
    precision = (
        jax.lax.Precision.HIGHEST
        if (not int8 and vectors.dtype == jnp.float32)
        else jax.lax.Precision.DEFAULT
    )
    if int8:
        q_scale = jnp.max(jnp.abs(queries), axis=1, keepdims=True) / 127.0
        q_i8 = jnp.clip(
            jnp.round(queries / jnp.maximum(q_scale, 1e-12)), -127, 127
        ).astype(jnp.int8)

    def body(carry, cand_chunk):
        best_vals, best_rows = carry
        safe = jnp.maximum(cand_chunk, 0)
        cand_vecs = vectors[safe]  # [B, chunk, D]
        if int8:
            raw = jnp.einsum(
                "bd,bmd->bm", q_i8, cand_vecs,
                preferred_element_type=jnp.int32)
            scores = raw.astype(jnp.float32) * q_scale * row_scales[safe]
        else:
            scores = jnp.einsum(
                "bd,bmd->bm", queries.astype(vectors.dtype), cand_vecs,
                precision=precision, preferred_element_type=jnp.float32)
        mask = (cand_chunk >= 0) & full_mask[safe]
        vals, pos_c = masked_top_k(scores, mask, k_run)
        rows = jnp.take_along_axis(cand_chunk, pos_c, axis=1)
        # lists are disjoint and each slot is visited once → no dup rows
        merged = merge_top_k(
            jnp.stack([best_vals, vals]), jnp.stack([best_rows, rows]), k_run)
        return merged, None

    init = (
        jnp.full((b, k_run), -jnp.inf, jnp.float32),
        jnp.full((b, k_run), -1, jnp.int32),
    )
    (vals, rows), _ = jax.lax.scan(body, init, cand_s)
    if k_run < k:
        padk = k - k_run
        vals = jnp.concatenate(
            [vals, jnp.full((b, padk), -jnp.inf, vals.dtype)], axis=1)
        rows = jnp.concatenate(
            [rows, jnp.full((b, padk), -1, rows.dtype)], axis=1)
    return vals, rows


@jax.jit
def _full_mask_kernel(valid, codes, numerics, spec: FilterSpec):
    mask = valid & eval_filter_mask(codes, numerics, spec)
    # popcount fused into the same dispatch: the caller uses it to choose the
    # probe width up front (mask-aware probe expansion without a retry loop)
    return mask, jnp.sum(mask.astype(jnp.int32))


def probe_ladder(base: int, max_probe: int) -> List[int]:
    """Quantized nprobe levels (base, 4·base, 16·base, …, max_probe). The
    search kernel is compiled per static nprobe; restricting escalation to
    this ladder bounds the executable count (and lets them be pre-compiled)
    instead of minting a fresh XLA program per ad-hoc width."""
    levels: List[int] = []
    p = max(1, base)
    while p < max_probe:
        levels.append(p)
        p *= 4
    levels.append(max(1, max_probe))
    return levels


def choose_probe(levels: List[int], selectivity: float, rows_per_list: float,
                 k: int, factor: float = 3.0) -> int:
    """Pick the probe width for a filtered search from two requirements:

    - **candidate count**: expected matching candidates
      (selectivity × rows/list × nprobe) must cover ``factor·k`` — a filter
      that keeps 2% of rows needs 50× the probes for the same candidate pool;
    - **geometric spread**: the top-k *matching* neighbors live in ~1/√p
      more lists than the unfiltered top-k (they are sparser per cluster),
      so the base width scales by 1/√selectivity. Measured on the committed
      RECALL_CURVES.json corpus this restores filtered recall to ≥ the
      unfiltered recall at the base width.

    Returns the smallest ladder level satisfying both."""
    geometric = levels[0] / max(np.sqrt(max(selectivity, 1e-9)), 1e-9)
    for lvl in levels:
        if lvl >= geometric and selectivity * rows_per_list * lvl >= factor * k:
            return lvl
    return levels[-1]


# The fresh tail is searched as a FLAT index over its own power-of-two
# bucketed slab (``_tail_state_locked``) with the flat kernels — NOT as a
# masked scan of the full corpus slab (the old ``_tail_search_kernel``
# contracted over all [capacity, D] rows, so ONE live insert made every
# query pay a full flat scan until rebuild: ~18 ms vs 3.7 ms at 1M×1024).
# The built slab stays device-resident across appends; only the small tail
# slab restages per add.


# Minimum homeless-row count before phase-2 preference ranking moves to the
# device slab (below this, the host matmul beats a dispatch round-trip).
# Module-level so tests can force the device path at tiny sizes.
_HOMELESS_DEVICE_MIN = 8192


@partial(jax.jit, static_argnames=("r",))
def _homeless_prefs_kernel(slab, centroids, rows, r: int):
    """Top-``r`` centroid preferences for a padded chunk of corpus rows,
    gathered from the staged device slab. Ship: [chunk] int32 row ids;
    fetch: [chunk, r] int32 — the previous host path shipped the rows'
    f32 vectors up and the full [H, K] affinity back down through the
    ~69 MB/s relay (≈1.6 GB round trip at H=200K, most of the measured
    31 s balance phase at 1M).

    Note: when the staged slab is bf16 (every real build), rankings can
    diverge from the host f32 path on near-tie affinities. Placement is a
    heuristic — the strict-cap invariant holds either way and the
    divergence is recall-neutral noise (ADVICE r04 low #2)."""
    block = jnp.take(slab, rows, axis=0).astype(jnp.float32)
    aff = jax.lax.dot_general(
        block, centroids, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    _, pref = jax.lax.top_k(aff, r)
    return pref.astype(jnp.int32)


def balance_assignments(
    assignments: np.ndarray,
    second: np.ndarray,
    n_lists: int,
    balance_factor: float,
    normalized: Optional[np.ndarray] = None,
    centroids: Optional[np.ndarray] = None,
    margin: Optional[np.ndarray] = None,
    staged=None,
) -> np.ndarray:
    """Cap list sizes at ``balance_factor × mean`` — STRICTLY when the
    vectors/centroids are provided, best-effort otherwise.

    The search gather pays ``nprobe × list_cap`` rows for EVERY query, and
    ``list_cap`` is the LARGEST list — an unbalanced build wastes gather
    bandwidth on padding for all of them (measured fill_ratio 0.59 ⇒ 41%
    padding, VERDICT r2 weak #4). Two phases:

    1. spill overflow rows (keeping each full list's rows CLOSEST to its
       centroid) to their second-nearest centroid when it has room;
    2. rows still homeless get device-scored against every centroid and
       greedily take their best centroid with remaining capacity — so
       every list lands ≤ cap and fill_ratio ≥ 1/balance_factor.

    Spilled rows remain findable: probes ranked by centroid affinity reach
    the spill list at the same rate the row's own affinity ranks it.

    ``staged``: an optional ``(device slab, n, chunk)`` tuple (the kmeans
    ``stage_corpus`` shape) whose row ``i`` IS assignment row ``i`` —
    either the index's resident serving slab (no-tombstone builds only)
    or the slab kmeans itself staged (row-aligned in every build). When
    present, phase-2 preferences are computed on device from the resident
    slab and only ``[H, 64]`` int32 indices cross the relay."""
    n = assignments.shape[0]
    cap = max(8, int(np.ceil(balance_factor * n / n_lists)))
    counts = np.bincount(assignments, minlength=n_lists)
    if counts.max() <= cap:
        return assignments
    assignments = assignments.copy()
    order = np.argsort(assignments, kind="stable")
    starts = np.searchsorted(assignments[order], np.arange(n_lists))
    ranks = np.arange(n, dtype=np.int64) - starts[assignments[order]]
    if margin is None and normalized is not None and centroids is not None:
        # margin not precomputed (the k-means assignment pass returns it
        # for free in r04): fall back to two host einsums
        cf = centroids.astype(np.float32)
        sims = np.einsum("nd,nd->n", normalized, cf[assignments])
        sims2 = np.einsum("nd,nd->n", normalized, cf[second])
        margin = sims - sims2
    if margin is not None:
        # overflow = the rows with the SMALLEST (first − second) affinity
        # margin: a near-tie row is almost as close to its second list, so
        # moving it barely dents probe reach (balanced-k-means style)
        # keep large-margin rows (ranks < cap); spill the near-ties
        sim_order = np.lexsort((-margin, assignments))
        ranks_sim = np.arange(n, dtype=np.int64) - starts[assignments[sim_order]]
        overflow_rows = sim_order[ranks_sim >= cap]
    else:
        overflow_rows = order[ranks >= cap]

    def accept_per_dest(rows, dests):
        """Vectorized capacity-aware acceptance (a Python per-row loop here
        is 20+ minutes at 1M rows): for each destination list, the first
        (cap − count) candidate rows in order are taken."""
        take_order = np.argsort(dests, kind="stable")
        sorted_dest = dests[take_order]
        dest_starts = np.searchsorted(sorted_dest, np.arange(n_lists))
        rank_within = (np.arange(len(rows), dtype=np.int64)
                       - dest_starts[sorted_dest])
        ok_sorted = rank_within < (cap - counts)[sorted_dest]
        accepted = np.zeros(len(rows), bool)
        accepted[take_order] = ok_sorted
        return accepted

    def move(rows, dests):
        np.subtract.at(counts, assignments[rows], 1)
        np.add.at(counts, dests, 1)
        assignments[rows] = dests

    sec = second[overflow_rows]
    ok = accept_per_dest(overflow_rows, sec)
    move(overflow_rows[ok], sec[ok])
    homeless = overflow_rows[~ok]
    can_rank_host = normalized is not None and centroids is not None
    if homeless.size and centroids is not None and (
            can_rank_host or staged is not None):
        # round-based vectorized placement — round r offers every
        # still-homeless row its r-th-choice centroid, capacity-gated.
        # Placement rarely needs more than a few dozen rounds, so only the
        # top-R preferences are ranked up front ([H, K] full argsort was
        # ~3 s of host time at 1M); the straggler set that exhausts R
        # falls back to a full ranking (total capacity ≥ 1.25·n, so every
        # row provably places).
        cf = np.ascontiguousarray(centroids, np.float32)
        r_pref = int(min(n_lists, 64))
        # staged-only callers (normalized=None) must take the device kernel
        # regardless of the size heuristic — the host branch below
        # dereferences `normalized` (ADVICE r04: TypeError at
        # 0 < homeless < _HOMELESS_DEVICE_MIN with a staged slab only)
        if staged is not None and (
                homeless.size >= _HOMELESS_DEVICE_MIN or not can_rank_host):
            slab = staged[0]
            cent_dev = jnp.asarray(cf)
            chunk_rows = 131072  # one executable shape; [chunk, K] f32
            prefs = []
            for s in range(0, homeless.size, chunk_rows):
                rows = homeless[s:s + chunk_rows]
                m = rows.shape[0]
                if m < chunk_rows:
                    rows = np.pad(rows, (0, chunk_rows - m))
                p = np.asarray(_homeless_prefs_kernel(
                    slab, cent_dev, jnp.asarray(rows, jnp.int32), r_pref))
                prefs.append(p[:m])
            pref = np.concatenate(prefs, axis=0)
        else:
            affinity = normalized[homeless].astype(np.float32) @ cf.T
            if r_pref < n_lists:
                part = np.argpartition(
                    -affinity, r_pref - 1, axis=1)[:, :r_pref]
                sub = np.take_along_axis(affinity, part, axis=1)
                pref = np.take_along_axis(
                    part, np.argsort(-sub, axis=1), axis=1)
            else:
                pref = np.argsort(-affinity, axis=1)
        alive = np.arange(homeless.shape[0])
        for r in range(pref.shape[1]):
            if alive.size == 0:
                break
            dests = pref[alive, r]
            ok = accept_per_dest(homeless[alive], dests)
            move(homeless[alive][ok], dests[ok])
            alive = alive[~ok]
        if alive.size:
            rest = homeless[alive]
            if can_rank_host:
                aff_rest = normalized[rest].astype(np.float32) @ cf.T
            else:
                aff_rest = np.asarray(jnp.take(
                    staged[0], jnp.asarray(rest, jnp.int32), axis=0
                ).astype(jnp.float32)) @ cf.T
            pref_rest = np.argsort(-aff_rest, axis=1)
            alive2 = np.arange(rest.shape[0])
            for r in range(n_lists):
                if alive2.size == 0:
                    break
                dests = pref_rest[alive2, r]
                ok = accept_per_dest(rest[alive2], dests)
                move(rest[alive2][ok], dests[ok])
                alive2 = alive2[~ok]
    return assignments


@jax.jit
def _update_rows(buf, upd, start):
    """Functional row-range update of a device slab (NOT donated: in-flight
    searches may still hold the previous buffer)."""
    return jax.lax.dynamic_update_slice(buf, upd, (start, jnp.int32(0)))


@jax.jit
def _update_cols(buf, upd, start):
    return jax.lax.dynamic_update_slice(buf, upd, (jnp.int32(0), start))


@jax.jit
def _update_flat(buf, upd, start):
    return jax.lax.dynamic_update_slice(buf, upd, (start,))


class IVFIndex(FlatIndex):
    """FlatIndex storage + IVF search path."""

    def __init__(
        self,
        dim: int,
        device_dtype: str = "bfloat16",
        n_lists: int = 0,  # 0 → auto (~sqrt(N) at build time)
        n_probe: int = 16,
        kmeans_iters: int = 10,
        balance_factor: float = 1.25,  # table mode only; 0 → unbalanced
        refine_dims: int = 0,  # table mode: far probes screen on few dims
        refine_shortlist: int = 2048,
        tail_fold_rows: int = 4096,  # tail size that triggers fold_tail
        probe_mode: str = "budget",  # "budget" (CSR) | "table" (legacy)
    ):
        super().__init__(dim, device_dtype)
        if self._int4:
            raise ValueError(
                "int4 storage is flat-index only for now (the IVF list "
                "slabs have no packed-nibble path; use int8 or bfloat16)")
        if probe_mode not in ("budget", "table"):
            raise ValueError(f"unknown probe_mode {probe_mode!r}")
        self.n_lists = n_lists
        self.n_probe = n_probe
        self.kmeans_iters = kmeans_iters
        self.balance_factor = balance_factor
        self.refine_dims = refine_dims
        self.refine_shortlist = refine_shortlist
        self.tail_fold_rows = tail_fold_rows
        # "budget": VARIABLE-length lists in a CSR layout, probed by a
        # scanned-row budget (survives skewed distributions — VERDICT r04
        # #1); "table": legacy balanced padded list table.
        self.probe_mode = probe_mode
        # query plan, set by calibrate(): "ivf" = probe the lists;
        # "flat" = the distribution needs so wide a budget that the exact
        # quantized matmul scan is FASTER (it streams each row once for
        # the whole query batch; the probe gather re-reads rows per
        # query — the crossover sits around budget ≈ slots/8 at batch 8).
        # RECALL_1M_POWERLAW_r05: powerlaw needed a 52%-of-slots budget
        # for 0.95 — a regime where IVF of any layout loses to the scan.
        self.plan = "ivf"
        #: budget fraction above which calibrate() switches the plan
        self.flat_cutoff = 0.125
        # build artifacts (host)
        self._centroids: Optional[np.ndarray] = None
        self._list_table: Optional[np.ndarray] = None  # table mode
        # budget mode: CSR arrays — row ids grouped by list with per-list
        # slack for folds; spans CSR_ALIGN-aligned
        self._sorted_rows: Optional[np.ndarray] = None  # [M] int32, -1 pad
        self._list_starts: Optional[np.ndarray] = None  # [K] int32
        self._list_span: Optional[np.ndarray] = None    # [K] allocated slots
        self._list_used: Optional[np.ndarray] = None    # [K] slots written
        self._built_live: int = 0  # live rows at build → rows-per-list avg
        self._indexed_rows: int = 0  # rows covered by the lists; rest = tail
        # device slab for the fresh tail (rows ≥ _indexed_rows), bucketed to
        # a power-of-two capacity; appends drop only THIS, never the built
        # slab (restaging 1M×1024 bf16 costs a ~2 GB host→HBM transfer)
        self._tail_device: Optional[dict] = None

    @property
    def _budget_built(self) -> bool:
        return self._sorted_rows is not None

    def _scan_lens(self) -> np.ndarray:
        """Per-list scan extent for the budget kernel: the used slots,
        CSR_ALIGN-aligned (pad slots are -1 and mask out), clipped to the
        allocated span."""
        aligned = -(-self._list_used // CSR_ALIGN) * CSR_ALIGN
        return np.minimum(aligned, self._list_span).astype(np.int32)

    def _budget_of(self, level: int, k: int) -> int:
        """Map an ``n_probe`` ladder level to a scanned-slot budget:
        level × (live rows per list at build), rounded up to a power of two
        (bounded executable count across rebuilds) and capped at the CSR
        slot count (= scan everything)."""
        if level >= self.n_lists:
            # the ladder's top level means "scan everything" — the slot
            # count, not level×rpl (slack/alignment make slots > live rows)
            return len(self._sorted_rows)
        rpl = max(1.0, self._built_live / max(1, self.n_lists))
        raw = int(np.ceil(level * rpl))
        return min(_pow2_at_least(max(raw, k, 64), 64),
                   len(self._sorted_rows))

    # ------------------------------------------------------------ mutation
    def add(self, vectors, documents, normalize: bool = True) -> List[str]:
        """Append rows; the BUILT device slab survives (appends never touch
        rows the lists reference). Only pure appends qualify — an upsert
        tombstones an existing row, whose staleness in the built slab's
        validity mask would resurrect it in probes, so that path falls back
        to the full invalidation the base class did."""
        with self._mutex:
            built_state = self._device
            n_before = len(self._ids)
            deleted_before = int(self._deleted.sum())
            ids = super().add(vectors, documents, normalize)  # sets _device=None
            if (
                built_state is not None
                and self._centroids is not None
                and int(self._deleted[:n_before].sum()) == deleted_before
            ):
                self._device = built_state
            self._tail_device = None
            # incremental maintenance: a tail past the threshold folds into
            # the existing lists in O(tail + table) — no k-means, no corpus
            # re-ship (r03 verdict #9: dynamic corpora shouldn't imply
            # full-rebuild stalls)
            if (self._centroids is not None
                    and self.tail_fold_rows
                    and self.tail_rows > self.tail_fold_rows):
                self.fold_tail()
        return ids

    def _delete_by_ids_locked(self, ids) -> int:
        deleted = super()._delete_by_ids_locked(ids)
        if deleted:
            self._tail_device = None  # the victim may be a tail row
        return deleted

    # ---------------------------------------------------- incremental fold
    #: device-slab bytes above which fold_tail drops the slab instead of
    #: functionally updating it (the non-donated update transiently doubles
    #: the slab in HBM; donation is unsafe — an in-flight search may still
    #: hold the old buffer)
    _FOLD_UPDATE_MAX_BYTES = 4 << 30

    def fold_tail(self) -> Dict[str, Any]:
        """Assign tail rows [_indexed_rows, n) to the EXISTING centroids and
        extend the lists — O(tail + table) vs a full k-means
        ``rebuild()`` (918 s at 1M on-chip in r03). The staged search slab
        is functionally updated in place on device (tail vectors +
        validity/metadata columns), so no corpus re-ship either. Folded
        rows can skew list sizes over time — periodic ``rebuild()`` still
        owns clustering QUALITY; this owns the append cadence.

        Budget (CSR) mode folds into each list's slack span; the maximal
        PREFIX of tail rows that fits is folded (a row whose list span is
        full stops the fold there — rows stay on the exactly-searched tail
        until a rebuild re-spans, so correctness never depends on slack)."""
        with self._mutex:
            if self._centroids is None or not (
                    self._budget_built or self._list_table is not None):
                return {"folded": 0, "note": "no build to fold into"}
            start = self._indexed_rows
            n = len(self._ids)
            t = n - start
            if t <= 0:
                return {"folded": 0}
            tail = np.array(self._vectors[start:n], np.float32)
            tail_deleted = np.array(self._deleted[start:n])
            gen = self._generation
        # assignment runs lock-free on the snapshot (host matmul in chunks;
        # tails are bounded by the fold cadence)
        cf = self._centroids.astype(np.float32)
        assign = np.empty(t, np.int64)
        for off in range(0, t, 16384):
            sims = tail[off : off + 16384] @ cf.T
            assign[off : off + 16384] = np.argmax(sims, axis=1)

        with self._mutex:
            if (self._generation != gen or self._indexed_rows != start
                    or len(self._ids) < n
                    or not (self._budget_built
                            or self._list_table is not None)):
                # a rebuild/compact/competing fold won — theirs covers us
                return {"folded": 0, "note": "superseded"}
            if self._budget_built:
                return self._fold_tail_csr_locked(start, n, assign,
                                                  tail_deleted)
            table = self._list_table
            live = ~tail_deleted
            live_assign = assign[live]
            live_rows = (start + np.nonzero(live)[0]).astype(np.int32)
            counts_old = (table >= 0).sum(axis=1).astype(np.int64)
            add_counts = np.bincount(live_assign, minlength=self.n_lists)
            new_max = int((counts_old + add_counts).max())
            new_cap = max(table.shape[1], -(-max(8, new_max) // 8) * 8)
            if new_cap != table.shape[1]:
                grown = np.full((self.n_lists, new_cap), -1, np.int32)
                grown[:, : table.shape[1]] = table
                table = grown
            else:
                table = table.copy()
            # vectorized slot placement (rank within destination list)
            order = np.argsort(live_assign, kind="stable")
            sorted_assign = live_assign[order]
            starts = np.searchsorted(sorted_assign, np.arange(self.n_lists))
            slots = (np.arange(live_assign.size, dtype=np.int64)
                     - starts[sorted_assign])
            table[sorted_assign,
                  counts_old[sorted_assign] + slots] = live_rows[order]

            self._list_table = table
            self._indexed_rows = n
            self._tail_device = None
            if self._device is not None:
                self._device = self._fold_device_update(self._device, n)
            counts_new = counts_old + add_counts
            return {
                "folded": int(live_assign.size),
                "rows_indexed": n,
                "list_cap": new_cap,
                "fill_ratio": round(float(counts_new.sum())
                                    / (self.n_lists * new_cap), 4),
                "slab_updated": self._device is not None,
            }

    def _fold_tail_csr_locked(self, start: int, n: int, assign: np.ndarray,
                              tail_deleted: np.ndarray) -> Dict[str, Any]:
        """Budget-mode fold: write tail rows into their lists' slack slots.
        Folds the maximal PREFIX of the tail whose rows all fit (the first
        row whose list span is exhausted stops the fold, preserving the
        contiguous-tail invariant); leftovers stay exactly searched."""
        t = assign.shape[0]
        free = (self._list_span - self._list_used).astype(np.int64)
        live_idx = np.nonzero(~tail_deleted)[0]
        a_live = assign[live_idx]
        # rank of each live tail row within its destination list (in tail
        # order): stable-sort by list, rank = position − group start
        order = np.argsort(a_live, kind="stable")
        grouped = a_live[order]
        gstart = np.searchsorted(grouped, np.arange(self.n_lists))
        rank_sorted = np.arange(a_live.size, dtype=np.int64) - gstart[grouped]
        rank_live = np.empty(a_live.size, np.int64)
        rank_live[order] = rank_sorted
        rejected = np.nonzero(rank_live >= free[a_live])[0]
        if rejected.size:
            # some list's slack is exhausted: RESPAN — the CSR stores row
            # ids only (the slab is original-order), so re-laying the spans
            # with fresh slack is O(N) host work + an int32 reship, no
            # vector movement and no k-means
            self._respan_csr_locked(extra_counts=np.bincount(
                a_live, minlength=self.n_lists))
            free = (self._list_span - self._list_used).astype(np.int64)
            rejected = np.nonzero(rank_live >= free[a_live])[0]
        cut = int(live_idx[rejected[0]]) if rejected.size else t
        if cut == 0:
            return {"folded": 0,
                    "note": "list spans full — rebuild() re-spans"}
        sel = live_idx[live_idx < cut]
        a = assign[sel]
        rows = (start + sel).astype(np.int32)
        order2 = np.argsort(a, kind="stable")
        sa = a[order2]
        s2 = np.searchsorted(sa, np.arange(self.n_lists))
        slots = np.arange(a.size, dtype=np.int64) - s2[sa]
        pos = (self._list_starts[sa].astype(np.int64)
               + self._list_used[sa] + slots)
        self._sorted_rows[pos] = rows[order2]
        counts = np.bincount(a, minlength=self.n_lists)
        self._list_used = (self._list_used
                           + counts.astype(np.int32)).astype(np.int32)
        self._indexed_rows = start + cut
        self._tail_device = None
        if self._device is not None:
            self._device = self._fold_device_update(self._device, start + cut)
        return {
            "folded": int(a.size),
            "rows_indexed": start + cut,
            "deferred_tail": int(t - cut),
            "slab_updated": self._device is not None,
        }

    def _respan_csr_locked(self, extra_counts: Optional[np.ndarray] = None
                           ) -> None:
        """Re-lay the CSR spans with fresh ~25% slack (sized for the used
        slots plus ``extra_counts`` about to fold). Pure index-side: row
        ids shift between int32 arrays; the vector slab never moves."""
        used = self._list_used.astype(np.int64)
        need = used + (0 if extra_counts is None
                       else extra_counts.astype(np.int64))
        slack = np.maximum(CSR_ALIGN, need // 4)
        span = (-(-(need + slack) // CSR_ALIGN) * CSR_ALIGN).astype(np.int64)
        starts = np.zeros(self.n_lists, np.int64)
        np.cumsum(span[:-1], out=starts[1:])
        m_slots = _pow2_at_least(int(span.sum()))
        new_rows = np.full(m_slots, -1, np.int32)
        # vectorized span copy: flat (list, within) coordinates for every
        # used slot in both layouts
        list_ids = np.repeat(np.arange(self.n_lists, dtype=np.int64), used)
        within = (np.arange(list_ids.size, dtype=np.int64)
                  - np.repeat(np.cumsum(used) - used, used))
        old_pos = self._list_starts[list_ids].astype(np.int64) + within
        new_rows[starts[list_ids] + within] = self._sorted_rows[old_pos]
        self._sorted_rows = new_rows
        self._list_starts = starts.astype(np.int32)
        self._list_span = span.astype(np.int32)
        # _list_used unchanged (dead -1 slots copy along; rebuild reclaims)

    def _fold_device_update(self, state: dict, n: int) -> Optional[dict]:
        """Return a copy of the staged search state covering rows up to
        ``n`` (device dynamic_update_slice of the appended rows + the
        refreshed list table/centroid arrays), or None when restaging is
        cheaper/required (slab too small or too large to double)."""
        staged = state.get("staged_rows", 0)
        capacity = state.get("capacity", 0)
        if n > capacity:
            return None  # appended past the staged capacity bucket
        if state["vectors"].nbytes > self._FOLD_UPDATE_MAX_BYTES:
            return None  # 2x HBM transient would not fit
        new_state = dict(state)
        if staged < n:
            lo = staged
            vecs = np.array(self._vectors[lo:n], np.float32)
            at = jnp.asarray(lo, jnp.int32)
            if self._int8:
                scales = np.abs(vecs).max(axis=1) / 127.0
                quant = np.clip(
                    np.round(vecs / np.maximum(scales[:, None], 1e-12)),
                    -127, 127).astype(np.int8)
                new_state["vectors"] = _update_rows(
                    state["vectors"], jnp.asarray(quant), at)
                new_state["row_scales"] = _update_flat(
                    state["row_scales"],
                    jnp.asarray(scales, jnp.float32), at)
            else:
                new_state["vectors"] = _update_rows(
                    state["vectors"],
                    jnp.asarray(vecs).astype(state["vectors"].dtype), at)
            new_state["valid"] = _update_flat(
                state["valid"], jnp.asarray(~self._deleted[lo:n]), at)
            self.columns._grow(capacity)
            new_state["codes"] = _update_cols(
                state["codes"], jnp.asarray(self.columns.codes[:, lo:n]), at)
            new_state["numerics"] = _update_cols(
                state["numerics"],
                jnp.asarray(self.columns.numerics[:, lo:n]), at)
            if "vectors_head" in new_state:
                rd = new_state["vectors_head"].shape[1]
                new_state["vectors_head"] = jnp.asarray(
                    new_state["vectors"][:, :rd])
            new_state["staged_rows"] = n
        self._stage_lists(new_state)
        new_state["centroids"] = state["centroids"]
        return new_state

    # -------------------------------------------------------------- build
    def rebuild(self, n_lists: Optional[int] = None, seed: int = 0) -> Dict[str, Any]:
        """(Re)cluster all LIVE rows into IVF lists; empties the tail.
        Tombstoned rows are excluded up front — clustering them would skew
        centroids toward stale content and pad every probe gather with
        dead candidates (heavy-churn corpora tombstone up to half their
        rows between rebuilds)."""
        import time as _time

        timings: Dict[str, float] = {}
        t0 = _time.time()
        # snapshot under the mutex so a concurrent add can't tear n vs
        # the mirrors; clustering itself runs lock-free on the snapshot
        staged = None
        keep_slab = False
        with self._mutex:
            n = len(self._ids)
            live_idx = np.nonzero(~self._deleted[:n])[0].astype(np.int64)
            if live_idx.size == n:
                # no tombstones (the common case): cluster the mirror VIEW
                # directly — rows < n are append-immutable, so this is a
                # consistent snapshot without the O(corpus) fancy-index
                # copy (4 GB at 1M×1024, r03 build_s included it)
                vectors = self._vectors[:n]
                # the resident device slab IS the corpus (bf16/f32 kinds):
                # hand it to kmeans as the pre-staged slab — the host→HBM
                # re-ship it replaces is the dominant warm-rebuild cost
                # (4 GB f32 at the ~69 MB/s relay ≈ 58 s minimum; measured
                # far worse under relay contention). Quantized kinds keep
                # the host path (kmeans clusters full-precision rows).
                dev = self._device
                if (dev is not None and not self._int8 and not self._int4
                        and dev.get("staged_rows") == n):
                    cap = int(dev["capacity"])
                    staged = (dev["vectors"], n, min(8192, cap))
                    keep_slab = True
            else:
                vectors = np.array(self._vectors[:n][live_idx])
        n_live = int(live_idx.size)
        timings["snapshot_s"] = round(_time.time() - t0, 2)
        if n_live == 0:
            # an empty / all-tombstoned corpus has nothing to cluster; an
            # admin rebuild racing bulk deletes must be a defined no-op,
            # not an error (every row stays on the exactly-searched tail)
            with self._mutex:
                self._centroids = None
                self._list_table = None
                self._indexed_rows = 0
                self._tail_device = None
            return {"kind": "ivf", "built": False, "live_rows": 0,
                    "note": "no live rows to cluster"}
        if n_lists:
            self.n_lists = n_lists
        if not self.n_lists:
            self.n_lists = max(1, int(round(np.sqrt(n_live))))
        self.n_lists = min(self.n_lists, n_live)

        # mirrors are L2-normalized at ingest (FlatIndex.add) — r03
        # re-normalized the whole corpus on the host here, a multi-GB
        # multi-pass copy that cost more than the clustering itself
        normalized = vectors
        if self.n_lists < 2:
            # spherical_kmeans needs >= 2 centroids (second-nearest
            # lookup); a 1-2 row corpus gets one trivial list
            self.n_lists = 1
            centroids = normalized.mean(axis=0, keepdims=True)
            centroids /= np.maximum(
                np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
            centroids = centroids.astype(np.float32)
            assignments = np.zeros(n_live, np.int64)
        else:
            t0 = _time.time()
            km_timings: Dict[str, float] = {}
            km_staged: Dict[str, Any] = {}
            if self.probe_mode == "budget":
                # budget probing wants the TRUE nearest-centroid lists —
                # no balance pass, so second/margin (its inputs) are
                # never fetched from the device
                centroids, assignments = spherical_kmeans(
                    normalized, self.n_lists, n_iters=self.kmeans_iters,
                    seed=seed, timings=km_timings,
                    staged=staged, staged_out=km_staged,
                )
                second = margin = None
            else:
                centroids, assignments, second, margin = spherical_kmeans(
                    normalized, self.n_lists, n_iters=self.kmeans_iters,
                    seed=seed, return_second=True, timings=km_timings,
                    staged=staged, staged_out=km_staged,
                )
            timings["kmeans_s"] = round(_time.time() - t0, 2)
            timings["kmeans_phases"] = km_timings
            if self.balance_factor and self.probe_mode == "table":
                t0 = _time.time()
                # the kmeans-staged slab row i IS `normalized` row i in
                # every build (cold, warm, tombstoned — kmeans stages the
                # exact array it clusters), so the balancer's homeless
                # ranking can always run on device. At 1M powerlaw the
                # host/relay balance phase measured 209.8 s on-chip
                # (RECALL_1M_POWERLAW_r04.json); the device path fetches
                # only [H, 64] int32.
                assignments = balance_assignments(
                    assignments, second, self.n_lists, self.balance_factor,
                    normalized=normalized, centroids=centroids,
                    margin=margin, staged=km_staged.get("staged", staged),
                )
                timings["balance_s"] = round(_time.time() - t0, 2)

        t0 = _time.time()
        counts = np.bincount(assignments, minlength=self.n_lists)
        # vectorized bucket fill (a Python loop here costs minutes at 1M
        # rows): stable-sort rows by cluster, then each row's slot is its
        # rank within its cluster
        order = np.argsort(assignments, kind="stable").astype(np.int64)
        sorted_assign = assignments[order]
        starts = np.searchsorted(sorted_assign, np.arange(self.n_lists))
        slots = np.arange(n_live, dtype=np.int64) - starts[sorted_assign]
        row_ids = live_idx[order].astype(np.int32)

        if self.probe_mode == "budget":
            # CSR layout: per-list spans with ~25% slack (fold headroom),
            # CSR_ALIGN-aligned, concatenated into one pow2-bucketed slot
            # array (compile-stable kernel shape across rebuilds)
            slack = np.maximum(CSR_ALIGN, counts // 4)
            span = (-(-(counts + slack) // CSR_ALIGN) * CSR_ALIGN).astype(
                np.int64)
            list_starts = np.zeros(self.n_lists, np.int64)
            np.cumsum(span[:-1], out=list_starts[1:])
            m_slots = _pow2_at_least(int(span.sum()))
            sorted_rows = np.full(m_slots, -1, np.int32)
            sorted_rows[list_starts[sorted_assign] + slots] = row_ids
            list_cap = int(counts.max())
        else:
            list_cap = max(8, int(counts.max()))
            # lane-align the gather width
            list_cap = -(-list_cap // 8) * 8
            table = np.full((self.n_lists, list_cap), -1, np.int32)
            # table entries are ORIGINAL row ids (live subset → corpus rows)
            table[sorted_assign, slots] = row_ids

        # atomic swap: a concurrent search must never pair new centroids
        # with the old lists (torn probes → wrong/empty results)
        with self._mutex:
            self._centroids = centroids
            self.plan = "ivf"  # a fresh build re-earns any flat fallback
            if self.probe_mode == "budget":
                self._list_table = None
                self._sorted_rows = sorted_rows
                self._list_starts = list_starts.astype(np.int32)
                self._list_span = span.astype(np.int32)
                self._list_used = counts.astype(np.int32)
                self._built_live = n_live
            else:
                self._list_table = table
                self._sorted_rows = None
                self._list_starts = self._list_span = self._list_used = None
            self._indexed_rows = n
            dev = self._device
            if (keep_slab and dev is not None
                    and dev.get("staged_rows") == n):
                # rebuild changes centroids/lists, NOT row vectors: keep
                # the resident corpus slab (a None here re-ships the whole
                # corpus on the next search). Functional copy so an
                # in-flight search keeps a consistent old state.
                state = dict(dev)
                centroid_dtype = (
                    jnp.bfloat16 if self._int8 else self.device_dtype)
                state["centroids"] = jnp.asarray(centroids, centroid_dtype)
                self._stage_lists(state)
                self._device = state
            else:
                self._device = None
            self._tail_device = None  # tail folded into the lists
        timings["table_s"] = round(_time.time() - t0, 2)
        info = {
            "n_lists": self.n_lists,
            "probe_mode": self.probe_mode,
            "list_cap": list_cap,
            "rows_indexed": n,
            "rows_live": n_live,
            "max_list": int(counts.max()),
            "min_list": int(counts.min()),
            "timings": timings,
        }
        if self.probe_mode == "budget":
            info["csr_slots"] = int(m_slots)
            info["fill_ratio"] = round(float(counts.sum()) / m_slots, 4)
        else:
            info["fill_ratio"] = round(
                float(counts.sum()) / table.size, 4)
        return info

    def _stage_lists(self, state: dict) -> None:
        """Refresh the list-structure device arrays on a state dict (tiny:
        int32 [M] + 2×[K]) for the active probe mode."""
        if self._budget_built:
            state["sorted_rows"] = jnp.asarray(self._sorted_rows)
            state["list_starts"] = jnp.asarray(self._list_starts)
            state["scan_lens"] = jnp.asarray(self._scan_lens())
            state.pop("list_table", None)
        elif self._list_table is not None:
            state["list_table"] = jnp.asarray(self._list_table)
            for key in ("sorted_rows", "list_starts", "scan_lens"):
                state.pop(key, None)

    def _compact_locked(self) -> Dict[str, Any]:
        """Compaction preserves the IVF build: list-table entries are
        corpus row ids and compaction keeps live rows in order, so the
        table remaps in O(table) instead of re-running k-means. Tombstoned
        entries (deleted after the last rebuild) map to -1 — exactly the
        empty-slot sentinel the probe scan already skips."""
        n = len(self._ids)
        old_indexed = self._indexed_rows
        info = super()._compact_locked()
        live = info.get("live_order")
        if live is None:
            return info
        if self._list_table is not None or self._sorted_rows is not None:
            new_of_old = np.full(n, -1, np.int32)
            new_of_old[live] = np.arange(live.size, dtype=np.int32)
        if self._list_table is not None:
            table = self._list_table
            safe = np.clip(table, 0, max(n - 1, 0))
            self._list_table = np.where(
                table >= 0, new_of_old[safe], np.int32(-1)
            ).astype(np.int32)
        if self._sorted_rows is not None:
            sr = self._sorted_rows
            safe = np.clip(sr, 0, max(n - 1, 0))
            # tombstoned entries map to -1 (the empty-slot sentinel the
            # budget scan already masks); spans/used keep the dead slots —
            # a rebuild reclaims the slack
            self._sorted_rows = np.where(
                sr >= 0, new_of_old[safe], np.int32(-1)).astype(np.int32)
        # rows below the old boundary stay list-covered at their new ids;
        # the exact-searched fresh tail shifts down with them
        self._indexed_rows = int((live < old_indexed).sum())
        self._tail_device = None
        return info

    @property
    def tail_rows(self) -> int:
        return len(self._ids) - self._indexed_rows

    # ------------------------------------------------------------- device
    def _device_state(self) -> dict:
        with self._mutex:
            return self._device_state_locked()

    def _device_state_locked(self) -> dict:
        if self._device is not None:
            # refine_dims is runtime-mutable (settings): top up / retire
            # the head-slice copy when it changed after the cache was built
            state = self._device
            if self.refine_dims and self._list_table is not None:
                rd = min(self.refine_dims, self.dim)
                head = state.get("vectors_head")
                if head is None or head.shape[1] != rd:
                    state["vectors_head"] = jnp.asarray(
                        state["vectors"][:, :rd])
            else:
                state.pop("vectors_head", None)
            return state
        state = super()._device_state_locked()
        if self._centroids is not None:
            # centroids stay float even for int8 corpora (coarse scoring)
            centroid_dtype = (
                jnp.bfloat16 if self._int8 else self.device_dtype
            )
            state["centroids"] = jnp.asarray(self._centroids, centroid_dtype)
            self._stage_lists(state)
        if "row_scales" not in state:
            state["row_scales"] = jnp.zeros(state["capacity"], jnp.float32)
        if self.refine_dims and self._list_table is not None:
            # Contiguous [N, refine_dims] copy for the partial-dim screen.
            # Gathering `vectors[safe, :refine_dims]` (row gather + column
            # slice in one op) sends XLA:TPU down a catastrophic fallback
            # (~581 ms/batch at 1M×1024 on-chip vs ~20 ms for the full-row
            # gather path); a full-row gather from a materialized head array
            # stays on the fast path. Costs refine_dims/D extra HBM (25% at
            # 256/1024).
            rd = min(self.refine_dims, self.dim)
            state["vectors_head"] = jnp.asarray(state["vectors"][:, :rd])
        self._device = state
        return state

    def _tail_state_locked(self) -> dict:
        """Device slab for the fresh tail: rows [_indexed_rows, n) padded to
        a power-of-two capacity (compile-stable buckets), with their own
        validity/metadata columns so the flat kernels run unchanged on it.
        Restaged per append (O(tail) — bounded by rebuild cadence), never
        the built corpus."""
        if self._tail_device is not None:
            return self._tail_device
        start = self._indexed_rows
        n = len(self._ids)
        t = n - start
        cap = _round_capacity(max(t, 1))
        vectors = np.zeros((cap, self.dim), np.float32)
        vectors[:t] = self._vectors[start:n]
        valid = np.zeros(cap, bool)
        valid[:t] = ~self._deleted[start:n]
        self.columns._grow(n)
        codes = np.zeros((self.columns.codes.shape[0], cap), np.int32)
        codes[:, :t] = self.columns.codes[:, start:n]
        numerics = np.full(
            (self.columns.numerics.shape[0], cap), NUMERIC_MISSING, np.int32
        )
        numerics[:, :t] = self.columns.numerics[:, start:n]
        state = {
            "start": start,
            "capacity": cap,
            "valid": jnp.asarray(valid),
            "codes": jnp.asarray(codes),
            "numerics": jnp.asarray(numerics),
        }
        if self._int8:
            scales = np.abs(vectors).max(axis=1) / 127.0
            state["vectors"] = jnp.asarray(np.clip(
                np.round(vectors / np.maximum(scales[:, None], 1e-12)),
                -127, 127,
            ).astype(np.int8))
            state["row_scales"] = jnp.asarray(scales, jnp.float32)
        else:
            state["vectors"] = jnp.asarray(vectors, self.device_dtype)
        self._tail_device = state
        return state

    def _tail_top_k(self, queries: np.ndarray, spec, k: int):
        """Exact top-k over the tail slab via the FLAT kernels; returns
        (vals [B, k], GLOBAL row ids [B, k]) as numpy, -inf/-1 padded."""
        with self._mutex:
            tail = self._tail_state_locked()
        k_tail = min(k, tail["capacity"])
        if self._int8:
            vals, rows = _search_kernel_int8(
                tail["vectors"], tail["row_scales"], tail["valid"],
                tail["codes"], tail["numerics"], jnp.asarray(queries),
                spec, k_tail,
            )
        else:
            vals, rows = _search_kernel(
                tail["vectors"], tail["valid"], tail["codes"],
                tail["numerics"], jnp.asarray(queries), spec, k_tail,
            )
        vals = np.asarray(vals)
        rows = np.asarray(rows).astype(np.int64)
        finite = np.isfinite(vals)
        rows = np.where(finite, rows + tail["start"], -1)
        if k_tail < k:  # pad so the host merge sees matching widths
            pad = ((0, 0), (0, k - k_tail))
            vals = np.pad(vals, pad, constant_values=-np.inf)
            rows = np.pad(rows, pad, constant_values=-1)
        return vals, rows

    # -------------------------------------------------------------- search
    def calibrate(self, target_recall: float = 0.95, sample: int = 48,
                  k: int = 10, seed: int = 0,
                  queries: Optional[np.ndarray] = None) -> Dict[str, Any]:
        """Build-time probe self-tuning: measure recall@k at each ladder
        width against the EXACT flat scan over the same staged slab, and
        set ``n_probe`` to the smallest width that hits ``target_recall``.

        Probes are ``queries`` (real query vectors — e.g. the engine's
        recent-query buffer) when given, else sampled live corpus rows.
        Corpus rows are always available but can OVERESTIMATE recall when
        real queries sit off the doc manifold (RECALL_CURVES_r04: the
        trained-encoder corpus calibrates to nprobe 8 on corpus-sampled
        probes, yet question-phrasing queries measure 0.853 there).

        A fixed default probes well on isotropic/equal-cluster corpora and
        badly on power-law / anisotropic ones (RECALL_CURVES_r04: nprobe-8
        recall 0.97 equal-cluster vs 0.67 power-law) — and the index can't
        know its distribution a priori, so it measures itself. Costs a few
        searches + one exact pass, once per (re)build."""
        with self._mutex:
            n = self._indexed_rows
            if n == 0 or self._centroids is None:
                return {"calibrated": False, "note": "no build"}
            live = np.nonzero(~self._deleted[:n])[0]
            if live.size < 2 * k:
                return {"calibrated": False, "note": "corpus too small"}
            rng = np.random.default_rng(seed)
            rows = live[rng.choice(live.size, size=min(sample, live.size),
                                   replace=False)]
        probe_source = "corpus_rows"
        if queries is not None and len(queries) >= 8:
            queries = np.asarray(queries, np.float32)[-sample:]
            queries = queries / np.maximum(
                np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
            probe_source = "recent_queries"
        else:
            with self._mutex:
                queries = np.array(self._vectors[rows], np.float32)

        # exact oracle: the FLAT kernel over the very same staged slab
        exact = FlatIndex.search(self, queries, k, normalize=False)
        want = [{h.row for h in hits} for hits in exact]
        ladder = probe_ladder(max(1, self.n_probe), self.n_lists)
        curve = {}
        chosen = ladder[-1]
        for width in ladder:
            got = self.search(queries, k, normalize=False,
                              n_probe=width, pin_probe=True)
            recall = float(np.mean([
                len({h.row for h in hits} & w) / max(1, len(w))
                for hits, w in zip(got, want)]))
            curve[width] = round(recall, 4)
            if recall >= target_recall:
                chosen = width
                break
        self.n_probe = int(chosen)
        info = {"calibrated": True, "n_probe": int(chosen),
                "target_recall": target_recall, "curve": curve,
                "sample": int(len(queries)), "probe_source": probe_source}
        if self._budget_built:
            # planner: price the budget the target recall needs; past
            # flat_cutoff of the slots the exact quantized scan is faster
            # (and exact) — route production searches there. pin_probe
            # callers (recall curves, latency pinning) always get IVF.
            budget = self._budget_of(int(chosen), 10)
            frac = budget / max(1, len(self._sorted_rows))
            self.plan = "flat" if frac > self.flat_cutoff else "ivf"
            info["budget_fraction"] = round(frac, 4)
            info["plan"] = self.plan
        return info

    def search(
        self,
        queries: np.ndarray,
        k: int,
        metadata_filter: Optional[Dict[str, Any]] = None,
        normalize: bool = True,
        n_probe: Optional[int] = None,
        pin_probe: bool = False,
    ) -> List[List[SearchResult]]:
        """``n_probe`` sets the BASE width; filtered searches may widen it
        via the selectivity policy + ladder backstop (the production
        semantics). ``pin_probe=True`` disables both — the caller gets
        exactly ``n_probe`` (latency pinning, recall-vs-nprobe curves)."""
        if self._centroids is None:
            # not built yet → exact
            return super().search(queries, k, metadata_filter, normalize)
        if self.plan == "flat" and not pin_probe and n_probe is None:
            # calibrated planner fallback: the measured recall/budget
            # curve priced IVF out on this distribution — the exact
            # quantized scan (with its host refine) is faster AND exact.
            # Explicit n_probe / pin_probe requests still probe.
            return super().search(queries, k, metadata_filter, normalize)

        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        if normalize:
            norms = np.linalg.norm(queries, axis=1, keepdims=True)
            queries = queries / np.maximum(norms, 1e-12)

        state = self._device_state()
        spec, _ = self._compile(metadata_filter)
        full_mask, mask_count = _full_mask_kernel(
            state["valid"], state["codes"], state["numerics"], spec
        )

        if self._budget_built:
            return self._search_budget(
                queries, k, state, spec, full_mask, mask_count,
                metadata_filter, n_probe, pin_probe)

        k_eff = min(k, state["capacity"])
        base = min(n_probe or self.n_probe, self.n_lists)
        ladder = probe_ladder(base, self.n_lists)
        if metadata_filter and not pin_probe:
            # choose the probe width from filter selectivity UP FRONT: a
            # selective filter starves probed lists, so widen before the
            # first launch instead of retry-escalating (VERDICT r1 #3)
            selectivity = float(mask_count) / max(1, len(self._ids))
            rows_per_list = max(1.0, self._indexed_rows / max(1, self.n_lists))
            nprobe = choose_probe(ladder, selectivity, rows_per_list, k_eff)
        else:
            nprobe = base

        # in refined mode, the index's configured n_probe is the EXACT-stage
        # width; any wider request (policy, escalation, or a pinned curve
        # point) sends the extra probes through the partial-dim screen
        split = min(self.n_probe, self.n_lists)
        # snapshot BOTH the flag and the head-slice reference:
        # /model/update-config can flip refine_dims (and pop the shared
        # state dict's head copy) mid-search — re-reading either in _run
        # would race
        vectors_head = state.get("vectors_head")
        refine_dims = self.refine_dims if vectors_head is not None else 0

        def _run(nprobe_now: int):
            # refined mode: beyond the split width, extra probes go through
            # the cheap partial-dim screen + exact shortlist rescore — wide
            # (high-recall) probing stops costing linear-in-nprobe
            if refine_dims and nprobe_now > split:
                vals, rows = _ivf_search_refined_kernel(
                    state["vectors"], vectors_head,
                    state["row_scales"], full_mask,
                    state["centroids"], state["list_table"],
                    jnp.asarray(queries), split, nprobe_now - split,
                    min(refine_dims, self.dim),
                    self.refine_shortlist, k_eff, self._int8,
                )
            else:
                vals, rows = _ivf_search_kernel(
                    state["vectors"], state["row_scales"], full_mask,
                    state["centroids"], state["list_table"],
                    jnp.asarray(queries), nprobe_now, k_eff, self._int8,
                )
            vals, rows = np.asarray(vals), np.asarray(rows)
            if self.tail_rows > 0:
                tail_vals, tail_rows = self._tail_top_k(queries, spec, k_eff)
                # host merge (k is tiny; built and tail row sets are
                # disjoint so no dedup needed)
                all_vals = np.concatenate([vals, tail_vals], axis=1)
                all_rows = np.concatenate([rows, tail_rows], axis=1)
                order = np.argsort(-all_vals, axis=1)[:, :k_eff]
                vals = np.take_along_axis(all_vals, order, axis=1)
                rows = np.take_along_axis(all_rows, order, axis=1)
            return vals, rows

        vals, rows = _run(nprobe)
        # backstop escalation (filters cluster, so the selectivity estimate
        # can still under-probe): walk the remaining LADDER levels — never an
        # ad-hoc width, so no new executable is compiled past the ladder set.
        # Skipped when the caller pinned the width.
        if metadata_filter and not pin_probe:
            for lvl in ladder:
                if lvl <= nprobe:
                    continue
                # when the filter matches fewer than k rows, "found them
                # all" is the stop condition — requiring k_eff would walk
                # every remaining level (each possibly a cold compile)
                # for matches that don't exist
                need = min(k_eff, int(mask_count))
                if np.isfinite(vals).sum(axis=1).min() >= need:
                    break
                nprobe = lvl
                vals, rows = _run(nprobe)

        # snapshot + bounds check: a compaction racing the search swaps
        # _docs for a shorter remapped list (see FlatIndex._hits_from)
        with self._mutex:
            docs = self._docs
            n_docs = len(docs)
        out: List[List[SearchResult]] = []
        for b in range(vals.shape[0]):
            hits, seen = [], set()
            for score, row in zip(vals[b], rows[b]):
                row = int(row)
                if not np.isfinite(score) or row in seen or not 0 <= row < n_docs:
                    continue
                seen.add(row)
                hits.append(SearchResult(docs[row], float(score), row))
            out.append(hits)
        return out

    def _search_budget(self, queries, k, state, spec, full_mask, mask_count,
                       metadata_filter, n_probe, pin_probe
                       ) -> List[List[SearchResult]]:
        """Budget-mode search: ``n_probe`` levels map to scanned-slot
        budgets (level × rows-per-list, pow2-quantized); the selectivity
        policy and ladder escalation work on levels exactly as in table
        mode. Quantized corpora return an exact host-refined top-k."""
        k_eff = min(k, state["capacity"])
        base = min(n_probe or self.n_probe, self.n_lists)
        ladder = probe_ladder(base, self.n_lists)
        if metadata_filter and not pin_probe:
            selectivity = float(mask_count) / max(1, len(self._ids))
            rows_per_list = max(
                1.0, self._indexed_rows / max(1, self.n_lists))
            level = choose_probe(ladder, selectivity, rows_per_list, k_eff)
        else:
            level = base

        k_scan = k_eff
        if self._int8 and self.refine_mult > 1:
            k_scan = min(k_eff * self.refine_mult, state["capacity"])

        def _run(level_now: int):
            budget = self._budget_of(level_now, k_scan)
            vals, rows = _ivf_budget_search_kernel(
                state["vectors"], state["row_scales"], full_mask,
                state["centroids"], state["sorted_rows"],
                state["list_starts"], state["scan_lens"],
                jnp.asarray(queries), budget, k_scan, self._int8)
            vals, rows = np.asarray(vals), np.asarray(rows)
            if self.tail_rows > 0:
                tail_vals, tail_rows = self._tail_top_k(
                    queries, spec, k_scan)
                all_vals = np.concatenate([vals, tail_vals], axis=1)
                all_rows = np.concatenate(
                    [rows.astype(np.int64), tail_rows], axis=1)
                order = np.argsort(-all_vals, axis=1)[:, :k_scan]
                vals = np.take_along_axis(all_vals, order, axis=1)
                rows = np.take_along_axis(all_rows, order, axis=1)
            if k_scan > k_eff:
                # exact f32 rescore of the quantized shortlist (the flat
                # int8 path's refine; the budget kernel only RANKS)
                vals, rows = self._host_refine(queries, vals, rows, k_eff)
            return vals, rows

        vals, rows = _run(level)
        if metadata_filter and not pin_probe:
            prev_budget = self._budget_of(level, k_scan)
            for lvl in ladder:
                if lvl <= level:
                    continue
                budget = self._budget_of(lvl, k_scan)
                if budget == prev_budget:
                    continue  # pow2 quantization collapsed the level
                need = min(k_eff, int(mask_count))
                if np.isfinite(vals).sum(axis=1).min() >= need:
                    break
                level, prev_budget = lvl, budget
                vals, rows = _run(lvl)

        with self._mutex:
            docs = self._docs
            n_docs = len(docs)
        out: List[List[SearchResult]] = []
        for b in range(vals.shape[0]):
            hits, seen = [], set()
            for score, row in zip(vals[b], rows[b]):
                row = int(row)
                if (not np.isfinite(score) or row in seen
                        or not 0 <= row < n_docs):
                    continue
                seen.add(row)
                hits.append(SearchResult(docs[row], float(score), row))
            out.append(hits)
        return out

    def precompile_ladder(self, k: int = 20) -> List[int]:
        """Compile the probe-escalation ladder's executables ahead of time
        (remote compiles take minutes; the first selective filtered query
        must not stall on them). Idempotent — jit + the persistent compile
        cache make repeat calls free. Returns the compiled levels."""
        if self._centroids is None or len(self._ids) == 0:
            return []
        state = self._device_state()
        k_eff = min(k, state["capacity"])
        mask = jnp.ones(state["capacity"], bool)
        dummy = jnp.zeros((1, self.dim), jnp.float32)
        levels = probe_ladder(min(self.n_probe, self.n_lists), self.n_lists)
        if self._budget_built:
            k_scan = k_eff
            if self._int8 and self.refine_mult > 1:
                k_scan = min(k_eff * self.refine_mult, state["capacity"])
            compiled = set()
            for lvl in levels:
                budget = self._budget_of(lvl, k_scan)
                if budget in compiled:
                    continue
                compiled.add(budget)
                _ivf_budget_search_kernel(
                    state["vectors"], state["row_scales"], mask,
                    state["centroids"], state["sorted_rows"],
                    state["list_starts"], state["scan_lens"], dummy,
                    budget, k_scan, self._int8)
            if self.tail_rows > 0:
                from .filters import FilterSpec as _FS

                self._tail_top_k(np.zeros((1, self.dim), np.float32),
                                 _FS.match_all(), k_scan)
            return levels
        split = min(self.n_probe, self.n_lists)
        vectors_head = state.get("vectors_head")
        for lvl in levels:
            if vectors_head is not None and lvl > split:
                # refined mode routes every wider-than-split level through
                # the refined kernel — warming the base kernel at those
                # widths would compile executables search() never runs
                # while the ones it DOES run stay cold
                _ivf_search_refined_kernel(
                    state["vectors"], vectors_head, state["row_scales"],
                    mask, state["centroids"], state["list_table"], dummy,
                    split, lvl - split, min(self.refine_dims, self.dim),
                    self.refine_shortlist, k_eff, self._int8,
                )
            else:
                _ivf_search_kernel(
                    state["vectors"], state["row_scales"], mask,
                    state["centroids"], state["list_table"], dummy,
                    lvl, k_eff, self._int8,
                )
        if self.tail_rows > 0:
            from .filters import FilterSpec as _FS

            self._tail_top_k(np.zeros((1, self.dim), np.float32),
                             _FS.match_all(), k_eff)
        return levels

    # --------------------------------------------------------------- stats
    def stats(self) -> Dict[str, Any]:
        base = super().stats()
        base.update(
            {
                "kind": "ivf",
                "probe_mode": self.probe_mode,
                "n_lists": self.n_lists if self._centroids is not None else 0,
                "n_probe": self.n_probe,
                "rows_indexed": self._indexed_rows,
                "tail_rows": self.tail_rows,
            }
        )
        if self._budget_built:
            base["csr_slots"] = int(len(self._sorted_rows))
            base["plan"] = self.plan
        return base

    # ----------------------------------------------------------- persist
    def save(self, directory: str) -> None:
        super().save(directory)
        if self._centroids is not None:
            from pathlib import Path

            arrays: Dict[str, Any] = {
                "centroids": self._centroids,
                "indexed_rows": np.int64(self._indexed_rows),
                "n_probe": np.int64(self.n_probe),
            }
            if self._budget_built:
                arrays.update(
                    csr_rows=self._sorted_rows,
                    csr_starts=self._list_starts,
                    csr_span=self._list_span,
                    csr_used=self._list_used,
                    built_live=np.int64(self._built_live),
                    plan_flat=np.int64(1 if self.plan == "flat" else 0),
                )
            else:
                arrays["list_table"] = self._list_table
            np.savez_compressed(Path(directory) / "ivf.npz", **arrays)

    @classmethod
    def load(cls, directory: str) -> "IVFIndex":
        from pathlib import Path

        flat = FlatIndex.load(directory)
        index = cls(dim=flat.dim, device_dtype=flat._dtype_name)
        # attribute access, not __dict__: _vectors/_deleted are properties
        # over growth buffers (order matters — _vectors sets the row count)
        for attr in ("_vectors", "_docs", "_ids", "_row_of_id", "_deleted",
                     "columns"):
            setattr(index, attr, getattr(flat, attr))
        ivf_path = Path(directory) / "ivf.npz"
        if ivf_path.exists():
            arrays = np.load(ivf_path)
            index._centroids = np.asarray(arrays["centroids"], np.float32)
            if "csr_rows" in arrays:
                index.probe_mode = "budget"
                index._sorted_rows = np.asarray(arrays["csr_rows"], np.int32)
                index._list_starts = np.asarray(
                    arrays["csr_starts"], np.int32)
                index._list_span = np.asarray(arrays["csr_span"], np.int32)
                index._list_used = np.asarray(arrays["csr_used"], np.int32)
                index._built_live = int(arrays["built_live"])
                if "plan_flat" in arrays.files and int(arrays["plan_flat"]):
                    index.plan = "flat"
            else:
                index.probe_mode = "table"
                index._list_table = np.asarray(
                    arrays["list_table"], np.int32)
            index._indexed_rows = int(arrays["indexed_rows"])
            index.n_probe = int(arrays["n_probe"])
            index.n_lists = index._centroids.shape[0]
        return index
