"""HF checkpoint loading tests with synthesized safetensors files (no real
weights exist in this environment; these prove the name mapping, transposes,
and wiring are correct for when they do)."""

import numpy as np

from automative_rag_tpu.models.encoder import (
    EncoderConfig,
    _hf_key_map,
    init_encoder_params,
    load_hf_weights,
)


def _flatten(tree, prefix=""):
    out = {}
    for key, value in tree.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict):
            out.update(_flatten(value, path))
        else:
            out[path] = value
    return out


def _synthesize_encoder_ckpt(tmp_path, config, prefix="roberta."):
    """Write a safetensors file with HF-named tensors whose values encode
    their identity (so we can verify placement + transpose)."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    params = init_encoder_params(config, seed=0)
    flat = _flatten(params)
    state = {}
    expected = {}
    for hf_key, flax_path in _hf_key_map(config.num_layers).items():
        target = flat[flax_path]
        value = rng.normal(size=np.shape(target)).astype(np.float32)
        expected[flax_path] = value
        tensor = value.T if flax_path.endswith("kernel") else value
        state[prefix + hf_key] = np.ascontiguousarray(tensor)
    save_file(state, str(tmp_path / "model.safetensors"))
    return expected


def test_encoder_hf_loading_roundtrip(tmp_path):
    config = EncoderConfig.tiny()
    expected = _synthesize_encoder_ckpt(tmp_path, config)
    params = load_hf_weights(config, str(tmp_path))
    assert params is not None
    flat = _flatten(params)
    for path, want in expected.items():
        np.testing.assert_allclose(np.asarray(flat[path]), want, rtol=1e-6)


def test_encoder_loading_missing_returns_none(tmp_path):
    assert load_hf_weights(EncoderConfig.tiny(), str(tmp_path)) is None
    assert load_hf_weights(EncoderConfig.tiny(), "/nonexistent") is None


def test_embedder_uses_loaded_weights(tmp_path):
    from automative_rag_tpu.models.bge_m3 import DenseEmbedder

    config = EncoderConfig.tiny()
    _synthesize_encoder_ckpt(tmp_path, config)
    embedder = DenseEmbedder(config=config, weights_path=str(tmp_path), max_length=16)
    assert embedder.pretrained and embedder.mode == "transformer"
    vec = embedder.embed_query("测试")
    assert vec.shape == (config.hidden_size,)
    np.testing.assert_allclose(np.linalg.norm(vec), 1.0, rtol=1e-4)


def test_cross_encoder_head_loading(tmp_path):
    from automative_rag_tpu.models.cross_encoder import CrossEncoderScorer

    config = EncoderConfig.tiny()
    from safetensors.numpy import save_file

    rng = np.random.default_rng(1)
    state = {}
    for hf_key, flax_path in _hf_key_map(config.num_layers).items():
        flat = _flatten(init_encoder_params(config, seed=0))
        tensor = np.asarray(flat[flax_path], np.float32)
        state["roberta." + hf_key] = np.ascontiguousarray(
            tensor.T if flax_path.endswith("kernel") else tensor
        )
    head = rng.normal(size=(1, config.hidden_size)).astype(np.float32)
    state["classifier.weight"] = head
    state["classifier.bias"] = np.asarray([0.5], np.float32)
    save_file(state, str(tmp_path / "model.safetensors"))

    scorer = CrossEncoderScorer(config=config, weights_path=str(tmp_path), max_length=16)
    assert scorer.pretrained
    np.testing.assert_allclose(np.asarray(scorer.head["kernel"]), head.T, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(scorer.head["bias"]), [0.5])
    scores = scorer("查询", ["文本一", "文本二"])
    assert scores.shape == (2,)


def test_whisper_hf_loading(tmp_path):
    from safetensors.numpy import save_file

    from automative_rag_tpu.models.whisper import (
        WhisperConfig,
        WhisperModel,
        _whisper_key_map,
        load_hf_whisper,
    )

    config = WhisperConfig.tiny_test()
    reference = WhisperModel(config, seed=0)
    flat = _flatten(reference.params)
    rng = np.random.default_rng(2)
    state = {}
    expected = {}
    for hf_key, fx_path in _whisper_key_map(config).items():
        target = flat[fx_path]
        value = rng.normal(size=np.shape(target)).astype(np.float32) * 0.02
        expected[fx_path] = value
        if fx_path.endswith("/kernel"):
            tensor = value.transpose(2, 1, 0) if "conv" in fx_path else value.T
        else:
            tensor = value
        state[hf_key] = np.ascontiguousarray(tensor)
    save_file(state, str(tmp_path / "model.safetensors"))

    params = load_hf_whisper(config, str(tmp_path))
    assert params is not None
    got = _flatten(params)
    for path, want in expected.items():
        np.testing.assert_allclose(np.asarray(got[path]), want, rtol=1e-6, err_msg=path)

    model = WhisperModel(config, weights_path=str(tmp_path))
    assert model.pretrained
    import jax.numpy as jnp

    tokens = model.transcribe_tokens(
        jnp.zeros((1, 3000, config.n_mels), jnp.float32), max_tokens=8
    )
    assert tokens.shape == (1, 8)
