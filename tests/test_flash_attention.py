"""Flash-attention prefill kernel vs the full-matrix XLA oracle
(interpret mode on CPU — same methodology as the MaxSim kernel tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from automative_rag_tpu.ops.flash_attention import attention_ref, flash_attention


def _rand(rng, shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.5)


@pytest.mark.parametrize("t,h,hkv,d", [(128, 4, 4, 32), (256, 4, 2, 32), (192, 8, 2, 16)])
def test_flash_matches_oracle_causal(rng, t, h, hkv, d):
    q = _rand(rng, (2, t, h, d))
    k = _rand(rng, (2, t, hkv, d))
    v = _rand(rng, (2, t, hkv, d))
    want = np.asarray(attention_ref(q, k, v, causal=True))
    got = np.asarray(flash_attention(q, k, v, causal=True, block_q=64,
                                     block_k=64, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flash_non_causal(rng):
    q = _rand(rng, (1, 128, 4, 32))
    k = _rand(rng, (1, 128, 2, 32))
    v = _rand(rng, (1, 128, 2, 32))
    want = np.asarray(attention_ref(q, k, v, causal=False))
    got = np.asarray(flash_attention(q, k, v, causal=False, block_q=64,
                                     block_k=64, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flash_ragged_seq_len(rng):
    """Tail padding past seq_len must not leak into the real rows."""
    t, real = 128, 100
    q = _rand(rng, (1, t, 2, 32))
    k = _rand(rng, (1, t, 2, 32))
    v = _rand(rng, (1, t, 2, 32))
    want = np.asarray(attention_ref(q, k, v, causal=True, seq_len=real))
    got = np.asarray(flash_attention(q, k, v, causal=True, seq_len=real,
                                     block_q=64, block_k=64, interpret=True))
    np.testing.assert_allclose(got[:, :real], want[:, :real], atol=2e-5, rtol=1e-4)


def test_flash_unaligned_length_pads(rng):
    t = 150  # not a block multiple — wrapper pads and slices back
    q = _rand(rng, (1, t, 2, 32))
    k = _rand(rng, (1, t, 2, 32))
    v = _rand(rng, (1, t, 2, 32))
    want = np.asarray(attention_ref(q, k, v, causal=True))
    got = np.asarray(flash_attention(q, k, v, causal=True, block_q=64,
                                     block_k=64, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flash_bf16_inputs(rng):
    q = _rand(rng, (1, 128, 4, 32)).astype(jnp.bfloat16)
    k = _rand(rng, (1, 128, 2, 32)).astype(jnp.bfloat16)
    v = _rand(rng, (1, 128, 2, 32)).astype(jnp.bfloat16)
    want = np.asarray(attention_ref(q, k, v)).astype(np.float32)
    got = np.asarray(
        flash_attention(q, k, v, block_q=64, block_k=64, interpret=True)
    ).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)


def test_mismatched_block_sizes_cover_all_tokens():
    """Non-dividing block sizes must pad to a common multiple — rounding to
    max(bq, bk) alone dropped tail key blocks / left output rows
    uninitialized."""
    import numpy as np
    import jax.numpy as jnp

    from automative_rag_tpu.ops.flash_attention import (
        attention_ref,
        flash_attention,
    )

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 200, 2, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 200, 2, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 200, 2, 64)), jnp.float32)
    want = np.asarray(attention_ref(q, k, v, causal=True))
    got = np.asarray(flash_attention(
        q, k, v, causal=True, block_q=128, block_k=96, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    got2 = np.asarray(flash_attention(
        q, k, v, causal=True, block_q=96, block_k=128, interpret=True))
    np.testing.assert_allclose(got2, want, rtol=2e-2, atol=2e-2)


def test_gqa_ratio_validated():
    import numpy as np
    import jax.numpy as jnp
    import pytest

    from automative_rag_tpu.ops.flash_attention import flash_attention

    q = jnp.zeros((1, 32, 6, 64))
    kv = jnp.zeros((1, 32, 4, 64))
    with pytest.raises(ValueError):
        flash_attention(q, kv, kv, interpret=True)
