"""Sequence-parallel (Ulysses) Qwen2 forward on the virtual 8-device CPU
mesh: sequence-sharded activations + per-layer all_to_all/all_gather
exchange must reproduce the single-device decoder's logits."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from automative_rag_tpu.models.qwen2 import Qwen2Config, Qwen2Model
from automative_rag_tpu.parallel import make_sp_forward
from automative_rag_tpu.parallel.mesh import make_mesh


def _model(num_layers=3, dtype=jnp.float32):
    cfg = dataclasses.replace(
        Qwen2Config.tiny_test(), num_layers=num_layers, dtype=dtype)
    return Qwen2Model(cfg, seed=0)


@pytest.fixture(scope="module")
def sp_mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(4, axis_name="sp")


def _oracle(model, tokens):
    return np.asarray(model.decoder.apply({"params": model.params},
                                          jnp.asarray(tokens)))


def test_sp_forward_matches_oracle(sp_mesh):
    model = _model()
    rng = np.random.default_rng(0)
    tokens = rng.integers(3, 250, size=(2, 16)).astype(np.int32)
    fwd = make_sp_forward(model, sp_mesh, axis="sp")
    got = np.asarray(fwd(jnp.asarray(tokens)))
    want = _oracle(model, tokens)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_sp_bf16_two_way(sp_mesh):
    model = _model(dtype=jnp.bfloat16)
    mesh2 = make_mesh(2, axis_name="sp")
    rng = np.random.default_rng(1)
    tokens = rng.integers(3, 250, size=(2, 12)).astype(np.int32)
    got = np.asarray(make_sp_forward(model, mesh2, axis="sp")(
        jnp.asarray(tokens)))
    want = _oracle(model, tokens)
    np.testing.assert_allclose(got, want, atol=0.08)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_sp_rejects_indivisible(sp_mesh):
    model = _model()
    with pytest.raises(ValueError, match="divide"):
        # tiny_test has 4 heads; a 3-way mesh can't split them
        make_sp_forward(model, make_mesh(3, axis_name="sp"), axis="sp")
    fwd = make_sp_forward(model, sp_mesh, axis="sp")
    with pytest.raises(ValueError, match="divide"):
        fwd(jnp.zeros((1, 10), jnp.int32))  # 10 % 4 != 0
