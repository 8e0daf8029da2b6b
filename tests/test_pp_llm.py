"""Pipeline-parallel Qwen2 forward on the virtual 8-device CPU mesh:
staged layers + ppermute microbatch flow must reproduce the single-device
decoder's logits exactly."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from automative_rag_tpu.models.qwen2 import Qwen2Config, Qwen2Model
from automative_rag_tpu.parallel import make_pp_forward
from automative_rag_tpu.parallel.mesh import make_mesh


def _model(num_layers=4, dtype=jnp.float32):
    cfg = dataclasses.replace(
        Qwen2Config.tiny_test(), num_layers=num_layers, dtype=dtype)
    return Qwen2Model(cfg, seed=0)


@pytest.fixture(scope="module")
def pp_mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(4, axis_name="pp")


def _oracle_logits(model, tokens):
    return np.asarray(model.decoder.apply({"params": model.params},
                                          jnp.asarray(tokens)))


def test_pp_forward_matches_oracle(pp_mesh):
    model = _model()
    rng = np.random.default_rng(0)
    tokens = rng.integers(3, 250, size=(8, 16)).astype(np.int32)
    fwd = make_pp_forward(model, pp_mesh, axis="pp")
    got = np.asarray(fwd(jnp.asarray(tokens)))
    want = _oracle_logits(model, tokens)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pp_more_microbatches(pp_mesh):
    model = _model()
    rng = np.random.default_rng(1)
    tokens = rng.integers(3, 250, size=(8, 12)).astype(np.int32)
    fwd = make_pp_forward(model, pp_mesh, axis="pp", n_micro=8)
    got = np.asarray(fwd(jnp.asarray(tokens)))
    np.testing.assert_allclose(
        got, _oracle_logits(model, tokens), rtol=2e-4, atol=2e-4)


def test_pp_bf16_and_uneven_stage_count(pp_mesh):
    # bf16 (the production dtype) through a 2-stage pipeline on the same mesh
    model = _model(num_layers=4, dtype=jnp.bfloat16)
    mesh2 = make_mesh(2, axis_name="pp")
    rng = np.random.default_rng(2)
    tokens = rng.integers(3, 250, size=(4, 8)).astype(np.int32)
    fwd = make_pp_forward(model, mesh2, axis="pp")
    got = np.asarray(fwd(jnp.asarray(tokens)))
    want = _oracle_logits(model, tokens)
    # bf16 layer math reassociates under lax.scan vs the unrolled oracle:
    # logits agree to bf16 grade and greedy tokens are identical
    np.testing.assert_allclose(got, want, atol=0.08)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_pp_rejects_indivisible_layers(pp_mesh):
    model = _model(num_layers=6)
    with pytest.raises(ValueError, match="divide"):
        make_pp_forward(model, pp_mesh, axis="pp")


def test_pp_with_int8_quantized_weights(pp_mesh):
    """pp exists for weights that outgrow a chip — which in practice means
    quantized weights. The stacked per-layer params carry QuantDense
    kernel_q/scale leaves; the staged scan must reproduce the unsharded
    quantized decoder exactly."""
    model = _model(num_layers=4, dtype=jnp.float32)
    cfg8 = dataclasses.replace(model.config, weight_bits=8)
    model8 = Qwen2Model(cfg8, seed=0)
    rng = np.random.default_rng(5)
    tokens = rng.integers(3, 250, size=(4, 8)).astype(np.int32)
    fwd = make_pp_forward(model8, pp_mesh, axis="pp")
    got = np.asarray(fwd(jnp.asarray(tokens)))
    want = np.asarray(model8.decoder.apply({"params": model8.params},
                                           jnp.asarray(tokens)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pp_times_tp_composition():
    """2-D pp×tp: pipeline manual over 'pp', megatron tensor shardings
    automatic (GSPMD) over 'tp' inside each stage — logits must match the
    unsharded decoder."""
    from jax.sharding import Mesh

    model = _model(num_layers=4, dtype=jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("pp", "tp"))
    rng = np.random.default_rng(6)
    tokens = rng.integers(3, 250, size=(8, 12)).astype(np.int32)
    fwd = make_pp_forward(model, mesh, axis="pp", tp_axis="tp")
    got = np.asarray(fwd(jnp.asarray(tokens)))
    want = _oracle_logits(model, tokens)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
