"""One-dispatch retrieval search stage (r05 verdict item 3).

The host-orchestrated hot path paid one relay round trip (~26 ms through
the axon tunnel) per stage: filter mask, dense probe, entity-expansion
probe, sparse lexical scan — `BENCH_E2E_TPU_r04` measured
`retrieval_only_p50_s = 1.77 s` at 300 docs, i.e. pure dispatch hops, not
kernels. This module assembles those stages into ONE jitted program over
the index's and sparse arm's staged device states:

    qvec ─┬─ valid ∧ filter(spec)      ─ budget-IVF top-k   (dense)
          ├─ valid ∧ filter(entity)    ─ budget-IVF top-k   (expansion)
          └─ term-match scan + top-k                        (sparse)

Eligibility is deliberately narrow — single-device budget-mode IVFIndex,
no fresh tail, sparse arm staged (or absent) — anything else falls back
to the per-stage path, which stays the source of truth for semantics.
The engine merges the three candidate lists on the host exactly as the
per-stage path does.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..index.filters import FilterSpec, eval_filter_mask
from ..index.flat import _search_kernel, _search_kernel_int8
from ..index.ivf import IVFIndex, _ivf_budget_search_kernel
from ..index.sparse import _sparse_topk_kernel, _sparse_topk_lut_kernel


@partial(jax.jit, static_argnames=(
    "budget", "entity_budget", "k_dense", "k_entity", "k_sparse", "int8",
    "has_entity", "has_sparse", "sparse_variant", "interpret", "use_flat"))
def _fused_search_kernel(
    vectors, row_scales, valid, codes, numerics, centroids,
    sorted_rows, list_starts, scan_lens,
    sp_ids, sp_w, sp_staged,
    qvec,                      # [1, D] f32
    q_ids, q_w,                # [Q] sparse query terms (dense-remapped)
    sp_tab_i, sp_tab_w, sp_r_i, sp_r_w,  # LUT tables ("pallas_lut" only;
    # [1,1] dummies otherwise — has_sparse/sparse_variant are static, so
    # the unused arms trace away)
    spec_main: FilterSpec, spec_entity: FilterSpec,
    budget: int, entity_budget: int, k_dense: int, k_entity: int,
    k_sparse: int,
    int8: bool, has_entity: bool, has_sparse: bool,
    sparse_variant: str, interpret: bool, use_flat: bool,
):
    def dense_arm(spec, k):
        # the calibrated planner may have priced IVF out (use_flat) — the
        # exact matmul scan composes into the same single dispatch
        if use_flat:
            if int8:
                return _search_kernel_int8(
                    vectors, row_scales, valid, codes, numerics, qvec,
                    spec, k)
            return _search_kernel(
                vectors, valid, codes, numerics, qvec, spec, k)
        mask = valid & eval_filter_mask(codes, numerics, spec)
        b = budget if spec is spec_main else entity_budget
        return _ivf_budget_search_kernel(
            vectors, row_scales, mask, centroids, sorted_rows,
            list_starts, scan_lens, qvec, b, k, int8)

    d_vals, d_rows = dense_arm(spec_main, k_dense)
    if has_entity:
        e_vals, e_rows = dense_arm(spec_entity, k_entity)
    else:
        e_vals = jnp.zeros((1, 1), jnp.float32)
        e_rows = jnp.full((1, 1), -1, jnp.int32)
    if has_sparse:
        if sparse_variant == "pallas_lut":
            s_vals, s_rows = _sparse_topk_lut_kernel(
                sp_ids, sp_w, sp_staged, sp_tab_i, sp_tab_w, sp_r_i,
                sp_r_w, k_sparse, interpret=interpret)
        else:
            s_vals, s_rows = _sparse_topk_kernel(
                sp_ids, sp_w, sp_staged, q_ids, q_w, k_sparse,
                variant=sparse_variant, interpret=interpret)
    else:
        s_vals = jnp.full((1,), -jnp.inf, jnp.float32)
        s_rows = jnp.full((1,), -1, jnp.int32)
    # pack every arm into ONE flat f32 vector (row indices ride as
    # bitcast bit patterns): each result leaf fetched separately costs a
    # full relay round trip (~26 ms × 5 extra = most of the measured
    # 248 ms search stage); one array = one fetch
    def _bits(x):
        return jax.lax.bitcast_convert_type(x, jnp.float32)

    return jnp.concatenate([
        d_vals.reshape(-1), _bits(d_rows.reshape(-1)),
        e_vals.reshape(-1), _bits(e_rows.reshape(-1)),
        s_vals.reshape(-1), _bits(s_rows.reshape(-1)),
    ])


_CONST_CACHE: dict = {}


def _lut_dummy():
    """Device-resident dummy LUT tables (variant != pallas_lut): fresh
    jnp.zeros per call would re-upload four arrays through the relay on
    every query."""
    if "lut" not in _CONST_CACHE:
        _CONST_CACHE["lut"] = (
            jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1), jnp.float32),
            jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1), jnp.float32))
    return _CONST_CACHE["lut"]


def _match_all_spec():
    """Device-resident match-all FilterSpec (6 arrays otherwise re-ship
    per query)."""
    if "match_all" not in _CONST_CACHE:
        _CONST_CACHE["match_all"] = FilterSpec.match_all()
    return _CONST_CACHE["match_all"]


def fused_search(engine, qvec: np.ndarray, k1: int,
                 entity_filter: Optional[dict],
                 sparse_terms) -> Optional[dict]:
    """Run the fused search stage if the engine's state is eligible;
    returns ``{"dense": (vals, rows), "entity": ... | None,
    "sparse": [(row, score), ...] | None}`` or ``None`` (caller falls
    back to the per-stage path).

    Only the UNFILTERED main search fuses: a metadata-filtered query
    needs the mask popcount BEFORE the probe width can be chosen, which
    is inherently two dispatches (and the selectivity ladder may
    escalate anyway)."""
    index = engine.index
    if type(index) is not IVFIndex or not index._budget_built:
        return None
    if index.tail_rows > 0:
        return None
    # the calibrated planner may have priced IVF out on this distribution
    # — the fused program swaps its dense/entity arms for the exact
    # quantized scan (same single dispatch either way)
    use_flat = index.plan == "flat"
    with index._mutex:
        state = index._device_state_locked()
    if "sorted_rows" not in state:
        return None

    sparse_on = sparse_terms is not None and engine.sparse_index is not None
    sp_state = sp_keys = None
    if sparse_on:
        sp = engine.sparse_index
        # only the plain single-device arm participates (sharded arms
        # collective-merge internally; tails need a host pass)
        if not hasattr(sp, "_device_state_with_keys"):
            return None
        sp_state, sp_keys = sp._device_state_with_keys()
        if sp_state is None or sp_state[2] != sp.rows:
            # sparse tail rows would need a host pass the fused program
            # can't see — the per-stage path owns that case
            return None

    spec_main = _match_all_spec()
    has_entity = entity_filter is not None
    if has_entity:
        spec_entity, ok = index._compile(entity_filter)
        if not ok:
            has_entity = False
            spec_entity = _match_all_spec()
    else:
        spec_entity = _match_all_spec()

    k_dense = min(k1, state["capacity"])
    k_scan = k_dense
    if index._int8 and index.refine_mult > 1:
        k_scan = min(k_dense * index.refine_mult, state["capacity"])
    level = min(index.n_probe, index.n_lists)
    budget = index._budget_of(level, k_scan)
    k_entity = min(engine.ENTITY_EXPAND_K, state["capacity"])
    # the per-stage entity search widens its probe from the filter's mask
    # popcount — which is exactly the dispatch this path removes. The
    # entity arm FULL-SCANS instead: recall is exact (≥ any policy pick),
    # and the arm only runs when a known model/brand is named.
    entity_budget = len(index._sorted_rows)

    lut_args = _lut_dummy()
    if sparse_on:
        q_ids, q_w = sparse_terms
        q_ids = np.asarray(q_ids, np.int32)
        if sp_keys is not None:
            q_ids = sp._map_query_ids(q_ids, sp_keys)
        # pad-bucket the query width (scan cost is linear in the compiled
        # Q; real queries carry far fewer terms than the encoder pad)
        q_ids, q_w = sp._trim_query_width(q_ids, q_w)
        q_ids, q_w = q_ids[0], q_w[0]
        sp_ids, sp_w, sp_staged = sp_state
        k_sparse = min(engine.sparse_k + 8, sp_staged)
        variant = sp.scan_variant or _default_sparse_variant()
        if variant == "pallas_lut":
            lut = sp._lut_args(sp_state, q_ids,
                               np.asarray(q_w, np.float32))
            if lut is None:       # hash-collision overflow → compare unroll
                variant = "pallas"
            else:
                lut_args = tuple(jnp.asarray(a) for a in lut)
        q_ids_dev = jnp.asarray(q_ids)
        q_w_dev = jnp.asarray(np.asarray(q_w, np.float32))
    else:
        sp_ids = jnp.zeros((1, 8), jnp.int32)
        sp_w = jnp.zeros((1, 8), jnp.float32)
        sp_staged, k_sparse, variant = 0, 1, "fori"
        q_ids_dev = jnp.zeros((1,), jnp.int32)
        q_w_dev = jnp.zeros((1,), jnp.float32)

    interpret = jax.default_backend() != "tpu"
    packed = np.asarray(_fused_search_kernel(
        state["vectors"], state["row_scales"], state["valid"],
        state["codes"], state["numerics"], state["centroids"],
        state["sorted_rows"], state["list_starts"], state["scan_lens"],
        sp_ids, sp_w, sp_staged,
        jnp.asarray(np.asarray(qvec, np.float32).reshape(1, -1)),
        q_ids_dev, q_w_dev, *lut_args, spec_main, spec_entity,
        budget, entity_budget, k_scan, k_entity, k_sparse,
        index._int8, has_entity, sparse_on,
        variant, interpret, use_flat))

    # unpack the single-fetch layout (see _fused_search_kernel's tail)
    ke = k_entity if has_entity else 1
    ks = k_sparse if sparse_on else 1
    sizes = (k_scan, k_scan, ke, ke, ks, ks)
    parts, off = [], 0
    for n in sizes:
        parts.append(packed[off:off + n])
        off += n
    d_vals = parts[0].reshape(1, -1)
    d_rows = np.ascontiguousarray(parts[1]).view(np.int32).reshape(1, -1)
    e_vals = parts[2].reshape(1, -1)
    e_rows = np.ascontiguousarray(parts[3]).view(np.int32).reshape(1, -1)
    s_vals = parts[4]
    s_rows = np.ascontiguousarray(parts[5]).view(np.int32)
    if k_scan > k_dense:
        # exact f32 rescore of the quantized shortlist (host mirror math,
        # no extra dispatch)
        d_vals, d_rows = index._host_refine(
            np.asarray(qvec, np.float32).reshape(1, -1),
            d_vals, d_rows, k_dense)
    out = {"dense": (d_vals[0], d_rows[0]), "entity": None, "sparse": None}
    if has_entity:
        out["entity"] = (np.asarray(e_vals)[0], np.asarray(e_rows)[0])
    if sparse_on:
        sv, sr = np.asarray(s_vals), np.asarray(s_rows)
        out["sparse"] = [(int(r), float(v)) for v, r in zip(sv, sr)
                         if np.isfinite(v) and v > 0.0]
    return out


def _default_sparse_variant() -> str:
    from ..index.sparse import _use_variant

    return _use_variant()
