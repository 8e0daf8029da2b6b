"""Hierarchical top-k (ops/topk.py) must be bit-equal to flat lax.top_k —
values AND indices, including tie order, remainders, and masks. The flat
top-k dominated 10M search latency (BENCH_SCALE_10M_r04: 276 ms/batch vs a
~16 ms scan floor), so every index path now routes through this."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automative_rag_tpu.ops.topk import hierarchical_top_k, masked_top_k


@pytest.mark.parametrize("shape,n,block", [
    ((), 100_003, 8192),      # 1-D with remainder
    ((3,), 65536, 8192),      # batched, exact multiple
    ((2,), 50_000, 16384),    # batched with remainder
    ((), 5_000, 8192),        # under the block: flat path
])
def test_hierarchical_matches_flat(shape, n, block):
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(*shape, n)).astype(np.float32))
    for k in (1, 18, 100):
        hv, hi = hierarchical_top_k(scores, k, block=block)
        fv, fi = jax.lax.top_k(scores, k)
        np.testing.assert_array_equal(np.asarray(hv), np.asarray(fv))
        np.testing.assert_array_equal(np.asarray(hi), np.asarray(fi))


def test_hierarchical_tie_order_matches_flat():
    # heavy ties within and across blocks: lowest index must win, exactly
    # like flat lax.top_k
    rng = np.random.default_rng(1)
    scores = jnp.asarray(
        rng.integers(0, 5, size=(2, 40_000)).astype(np.float32))
    hv, hi = hierarchical_top_k(scores, 25, block=8192)
    fv, fi = jax.lax.top_k(scores, 25)
    np.testing.assert_array_equal(np.asarray(hv), np.asarray(fv))
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(fi))


def test_masked_top_k_large_n_routes_hierarchical():
    rng = np.random.default_rng(2)
    n = 70_000
    scores = jnp.asarray(rng.normal(size=(4, n)).astype(np.float32))
    mask = jnp.asarray(rng.random((4, n)) > 0.5)
    hv, hi = masked_top_k(scores, mask, 20)
    want = jnp.where(mask, scores, -jnp.inf)
    fv, fi = jax.lax.top_k(want, 20)
    np.testing.assert_array_equal(np.asarray(hv), np.asarray(fv))
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(fi))


def test_masked_top_k_fewer_valid_than_k():
    scores = jnp.asarray(np.arange(40_000, dtype=np.float32))
    mask = jnp.zeros(40_000, bool).at[5].set(True).at[17].set(True)
    vals, idx = masked_top_k(scores[None, :], mask[None, :], 6)
    vals, idx = np.asarray(vals)[0], np.asarray(idx)[0]
    assert idx[0] == 17 and idx[1] == 5
    assert np.isneginf(vals[2:]).all()
