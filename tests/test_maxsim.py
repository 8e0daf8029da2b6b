"""MaxSim kernel tests: numpy oracle parity, masking semantics, Pallas
(interpret-mode on CPU) vs XLA reference equivalence."""

import numpy as np
import pytest
import jax.numpy as jnp

from automative_rag_tpu.ops.maxsim import (
    maxsim_argmax_ref,
    maxsim_scores,
    maxsim_scores_pallas,
    maxsim_scores_ref,
    min_max_normalize,
)


def _numpy_maxsim(q, q_mask, docs, d_mask):
    b, lq, dim = q.shape
    n = docs.shape[0]
    out = np.zeros((b, n))
    for bi in range(b):
        for ni in range(n):
            sim = q[bi].astype(np.float64) @ docs[ni].astype(np.float64).T
            sim[:, ~d_mask[ni]] = -np.inf
            per_tok = sim.max(axis=1)
            out[bi, ni] = per_tok[q_mask[bi]].sum()
    return out


@pytest.fixture
def case(rng):
    b, lq, n, ld, dim = 2, 16, 24, 32, 64
    q = rng.normal(size=(b, lq, dim)).astype(np.float32)
    docs = rng.normal(size=(n, ld, dim)).astype(np.float32)
    q_mask = np.ones((b, lq), bool)
    q_mask[:, 0] = False  # [CLS]
    q_mask[0, 12:] = False  # padding on first query
    d_mask = np.ones((n, ld), bool)
    for i in range(n):
        d_mask[i, 8 + (i % 20) :] = False  # variable doc lengths
    return q, q_mask, docs, d_mask


def test_ref_matches_numpy_oracle(case):
    q, q_mask, docs, d_mask = case
    got = np.asarray(maxsim_scores_ref(q, q_mask, docs, d_mask))
    want = _numpy_maxsim(q, q_mask, docs, d_mask)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pallas_matches_ref(case):
    q, q_mask, docs, d_mask = case
    want = np.asarray(maxsim_scores_ref(q, q_mask, docs, d_mask))
    got = np.asarray(
        maxsim_scores_pallas(
            jnp.asarray(q), jnp.asarray(q_mask), jnp.asarray(docs), jnp.asarray(d_mask),
            block_docs=8, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_pallas_handles_ragged_doc_count(case):
    """N not a multiple of block_docs: padding docs must not leak."""
    q, q_mask, docs, d_mask = case
    docs, d_mask = docs[:21], d_mask[:21]
    want = np.asarray(maxsim_scores_ref(q, q_mask, docs, d_mask))
    got = np.asarray(
        maxsim_scores_pallas(
            jnp.asarray(q), jnp.asarray(q_mask), jnp.asarray(docs), jnp.asarray(d_mask),
            block_docs=8, interpret=True,
        )
    )
    assert got.shape == (2, 21)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_doc_padding_excluded(rng):
    """Padded doc tokens must not win the max — the reference's known
    padding bug (rerankers.py:195) must NOT be reproduced."""
    q = np.ones((1, 4, 8), np.float32)
    q_mask = np.ones((1, 4), bool)
    # one real token with small values; padding tokens with huge values
    docs = np.full((1, 6, 8), 100.0, np.float32)
    docs[0, 0] = 0.1
    d_mask = np.zeros((1, 6), bool)
    d_mask[0, 0] = True
    got = float(np.asarray(maxsim_scores_ref(q, q_mask, docs, d_mask))[0, 0])
    assert got == pytest.approx(4 * 0.1 * 8, rel=1e-5)


def test_query_mask_excluded(rng):
    q = rng.normal(size=(1, 6, 8)).astype(np.float32)
    docs = rng.normal(size=(3, 5, 8)).astype(np.float32)
    d_mask = np.ones((3, 5), bool)
    full = np.asarray(maxsim_scores_ref(q, np.ones((1, 6), bool), docs, d_mask))
    head = np.asarray(maxsim_scores_ref(q, np.array([[True] * 3 + [False] * 3]), docs, d_mask))
    tail = np.asarray(maxsim_scores_ref(q, np.array([[False] * 3 + [True] * 3]), docs, d_mask))
    np.testing.assert_allclose(full, head + tail, rtol=1e-5)


def test_score_ordering_prefers_matching_doc(rng):
    """A doc built from the query's own tokens must outscore random docs."""
    dim = 32
    q = rng.normal(size=(1, 8, dim)).astype(np.float32)
    match = np.repeat(q[0], 2, axis=0)[None][:, :16]  # [1, 16, dim]
    noise = rng.normal(size=(9, 16, dim)).astype(np.float32)
    docs = np.concatenate([match, noise])
    scores = np.asarray(
        maxsim_scores_ref(q, np.ones((1, 8), bool), docs, np.ones((10, 16), bool))
    )[0]
    assert scores.argmax() == 0


def test_argmax_explanations(rng):
    q = rng.normal(size=(6, 16)).astype(np.float32)
    doc = rng.normal(size=(9, 16)).astype(np.float32)
    q_mask = np.array([False, True, True, True, True, False])
    d_mask = np.array([True] * 7 + [False] * 2)
    best, best_sim = maxsim_argmax_ref(q, q_mask, doc, d_mask)
    best, best_sim = np.asarray(best), np.asarray(best_sim)
    sim = q @ doc.T
    sim[:, 7:] = -np.inf
    np.testing.assert_array_equal(best, sim.argmax(axis=1))
    assert (best_sim[~q_mask] == 0).all()


def test_min_max_normalize():
    np.testing.assert_allclose(min_max_normalize([1.0, 3.0, 2.0]), [0.0, 1.0, 0.5])
    np.testing.assert_allclose(min_max_normalize([2.0, 2.0]), [1.0, 1.0])
    assert min_max_normalize(np.array([])).size == 0


def test_pallas_query_batch_tiling(case):
    """Batches above the VMEM-safe size are tiled transparently."""
    q, q_mask, docs, d_mask = case
    big_q = np.tile(q, (6, 1, 1))[:11]         # B=11 > max_b=8
    big_mask = np.tile(q_mask, (6, 1))[:11]
    want = np.asarray(maxsim_scores_ref(big_q, big_mask, docs, d_mask))
    got = np.asarray(
        maxsim_scores_pallas(
            jnp.asarray(big_q), jnp.asarray(big_mask),
            jnp.asarray(docs), jnp.asarray(d_mask),
            block_docs=8, interpret=True,
        )
    )
    assert got.shape == (11, docs.shape[0])
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_pallas_int8_matches_dequantized_ref(case):
    """int8 kernel path: per-token symmetric quantization, dequant fused in
    the kernel — must match the XLA reference run on dequantized docs."""
    q, q_mask, docs, d_mask = case
    scales = np.abs(docs).max(axis=2) / 127.0  # [N, Ld]
    safe = np.maximum(scales, 1e-12)
    docs_q = np.clip(np.round(docs / safe[:, :, None]), -127, 127).astype(np.int8)
    dequant = docs_q.astype(np.float32) * scales[:, :, None]

    want = np.asarray(maxsim_scores_ref(q, q_mask, dequant, d_mask))
    got = np.asarray(
        maxsim_scores_pallas(
            jnp.asarray(q, jnp.bfloat16), jnp.asarray(q_mask),
            jnp.asarray(docs_q.transpose(1, 0, 2)),  # token-major int8
            jnp.asarray(d_mask),
            d_scales=jnp.asarray(scales.T, jnp.float32),
            block_docs=8, interpret=True, token_major=True,
        )
    )
    # bf16 queries in the kernel vs f32 in the reference
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-1)


def test_int8_store_feeds_kernel_quantized(rng):
    """TokenStore(int8).gather_for_maxsim returns the quantized slab; the
    reranker path through it matches the dequantizing gather()."""
    from automative_rag_tpu.ops.maxsim import maxsim_scores
    from automative_rag_tpu.rerank.token_store import TokenStore

    n, ld, dim = 10, 16, 64
    embs = rng.normal(size=(n, ld, dim)).astype(np.float32)
    masks = np.ones((n, ld), bool)
    masks[:, 12:] = False
    store = TokenStore(dim=dim, max_doc_length=ld, quantize="int8",
                       device_dtype="float32")
    store.append(embs, masks)

    rows = [1, 3, 7]
    docs_t, d_scales, got_masks = store.gather_for_maxsim(rows)
    assert docs_t.dtype == jnp.int8 and d_scales is not None

    q = rng.normal(size=(1, 8, dim)).astype(np.float32)
    q_mask = np.ones((1, 8), bool)
    via_quant = np.asarray(maxsim_scores(
        jnp.asarray(q), jnp.asarray(q_mask), docs_t, got_masks,
        token_major=True, d_scales=d_scales, use_pallas=False,
    ))
    dq_docs, dq_masks = store.gather(rows)
    via_dequant = np.asarray(maxsim_scores(
        jnp.asarray(q), jnp.asarray(q_mask), dq_docs, dq_masks,
        token_major=True, use_pallas=False,
    ))
    np.testing.assert_allclose(via_quant, via_dequant, rtol=1e-3, atol=1e-2)


def test_fp16_inputs_normalized_to_bf16_on_pallas_path():
    """Encoders emit fp16 as a host-transfer format; the pallas boundary
    must cast fp16 operands to bf16 (Mosaic fp16 MXU support is unproven,
    and mixed fp16×bf16 dots are never exercised on-chip)."""
    rng = np.random.default_rng(3)
    b, lq, n, ld, dim = 2, 8, 16, 16, 128
    q = rng.normal(size=(b, lq, dim)).astype(np.float16)
    q_mask = np.ones((b, lq), bool)
    docs_t = rng.normal(size=(ld, n, dim)).astype(np.float16)
    d_mask = np.ones((n, ld), bool)

    got = np.asarray(maxsim_scores(
        jnp.asarray(q), jnp.asarray(q_mask), jnp.asarray(docs_t),
        jnp.asarray(d_mask), block_docs=8, token_major=True,
        use_pallas=True, interpret=True,
    ))
    want = np.asarray(maxsim_scores(
        jnp.asarray(q, jnp.float32), jnp.asarray(q_mask),
        jnp.asarray(docs_t, jnp.float32), jnp.asarray(d_mask),
        token_major=True, use_pallas=False,
    ))
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.15)
