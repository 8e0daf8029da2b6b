"""TPU-native Qwen2 causal LM: cached-decode consistency with the full
forward, sampling semantics, HF weight mapping, backend integration."""

import json

import numpy as np
import pytest
import jax.numpy as jnp

from automative_rag_tpu.models.qwen2 import (
    Qwen2Config,
    Qwen2Model,
    _qwen2_key_map,
    load_hf_qwen2,
)


@pytest.fixture(scope="module")
def tiny():
    return Qwen2Model(Qwen2Config.tiny_test(), seed=0)


def test_greedy_generation_consistent_with_full_forward(tiny):
    """Every greedily generated token must be the argmax of the *full*
    teacher-forcing forward at its position — proves the KV-cached step path
    (rope, GQA, cache masking) matches the oracle."""
    cfg = tiny.config
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, cfg.vocab_size, size=(2, 5)).astype(np.int32)
    out = tiny.generate_tokens(prompt, max_new_tokens=8)
    assert out.shape == (2, 13)
    np.testing.assert_array_equal(out[:, :5], prompt)

    logits = tiny.decoder.apply({"params": tiny.params}, jnp.asarray(out))
    logits = np.asarray(logits)
    for b in range(2):
        for t in range(5, out.shape[1]):
            prev = out[b, :t]
            if cfg.eos_token in prev[5:]:
                break  # post-eos positions are forced padding
            want = int(np.argmax(logits[b, t - 1]))
            assert int(out[b, t]) == want, (b, t)


def test_generation_deterministic_and_seeded(tiny):
    prompt = np.array([[5, 6, 7]], np.int32)
    a = tiny.generate_tokens(prompt, max_new_tokens=6)
    b = tiny.generate_tokens(prompt, max_new_tokens=6)
    np.testing.assert_array_equal(a, b)  # greedy: fully deterministic
    s1 = tiny.generate_tokens(prompt, max_new_tokens=6, temperature=1.5, seed=1)
    s2 = tiny.generate_tokens(prompt, max_new_tokens=6, temperature=1.5, seed=1)
    np.testing.assert_array_equal(s1, s2)  # same seed → same sample


def test_top_p_tiny_equals_greedy(tiny):
    """top_p → 0 keeps only the argmax, so sampling collapses to greedy."""
    prompt = np.array([[5, 6, 7]], np.int32)
    greedy = tiny.generate_tokens(prompt, max_new_tokens=6)
    nucleus = tiny.generate_tokens(prompt, max_new_tokens=6,
                                   temperature=0.8, top_p=1e-6, seed=3)
    np.testing.assert_array_equal(nucleus, greedy)


def test_batch_rows_independent(tiny):
    """A row's output must not depend on what else is in the batch."""
    rng = np.random.default_rng(4)
    p1 = rng.integers(3, tiny.config.vocab_size, size=(1, 4)).astype(np.int32)
    p2 = rng.integers(3, tiny.config.vocab_size, size=(1, 4)).astype(np.int32)
    solo = tiny.generate_tokens(p1, max_new_tokens=5)
    batched = tiny.generate_tokens(np.concatenate([p1, p2]), max_new_tokens=5)
    np.testing.assert_array_equal(batched[0], solo[0])


def _flatten(tree, prefix=""):
    out = {}
    for key, value in tree.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict):
            out.update(_flatten(value, path))
        else:
            out[path] = value
    return out


def test_hf_weight_roundtrip(tmp_path):
    """Export a random flax tree under HF names, reload through the mapper,
    and require exact tree equality — proves names and transposes."""
    from safetensors.numpy import save_file

    cfg = Qwen2Config.tiny_test()
    base = Qwen2Model(cfg, seed=7)
    mapping = _qwen2_key_map(cfg)

    flat = _flatten(base.params)
    state = {}
    for hf_key, dest in mapping.items():
        if cfg.tie_embeddings and hf_key == "lm_head.weight":
            continue
        value = np.asarray(flat["/".join(dest)], np.float32)
        if dest[-1] == "kernel":
            value = value.T
        # safetensors silently corrupts non-contiguous (transposed-view)
        # arrays on save — real HF checkpoints are contiguous
        state[hf_key] = np.ascontiguousarray(value)
    save_file(state, str(tmp_path / "model.safetensors"))

    loaded = load_hf_qwen2(cfg, str(tmp_path))
    assert loaded is not None
    got = _flatten(loaded)
    assert set(got) == set(flat)
    for key in flat:
        np.testing.assert_allclose(
            np.asarray(got[key], np.float32), np.asarray(flat[key], np.float32),
            rtol=1e-2, atol=1e-2,  # bf16 storage round-trip
        )


def test_config_from_hf(tmp_path):
    (tmp_path / "config.json").write_text(json.dumps({
        "model_type": "qwen2", "vocab_size": 1000, "hidden_size": 128,
        "num_hidden_layers": 3, "num_attention_heads": 8,
        "num_key_value_heads": 2, "intermediate_size": 256,
        "rope_theta": 5000.0, "eos_token_id": 9,
    }))
    cfg = Qwen2Config.from_hf(str(tmp_path))
    assert cfg.d_model == 128 and cfg.num_kv_heads == 2 and cfg.eos_token == 9
    (tmp_path / "config.json").write_text(json.dumps({"model_type": "bert"}))
    assert Qwen2Config.from_hf(str(tmp_path)) is None


def test_jax_backend_in_answer_pipeline():
    """JaxCausalLM plugs into the AnswerGenerator protocol end-to-end with a
    hash tokenizer standing in for the HF one."""
    from automative_rag_tpu.generation.llm import JaxCausalLM

    cfg = Qwen2Config.tiny_test()

    class FakeTok:
        def __call__(self, text):
            return {"input_ids": [3 + (ord(c) % 200) for c in text[:16]]}

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(97 + (t % 26)) for t in ids)

    llm = JaxCausalLM("", config=cfg, tokenizer=FakeTok())
    text = llm.generate("宝马X5的加速是多少", {"max_tokens": 8, "temperature": 0.0})
    assert isinstance(text, str)
    assert llm.name.startswith("jax-qwen2")


def test_prompt_bucket_boundaries(tiny):
    """Prompt lengths straddling the prefill bucket must still satisfy the
    full-forward argmax oracle (cache slots and rope positions diverge across
    the bucket gap)."""
    import jax.numpy as jnp

    cfg = tiny.config
    rng = np.random.default_rng(9)
    for plen in (64, 70):  # exactly one bucket, and just past it
        prompt = rng.integers(3, cfg.vocab_size, size=(1, plen)).astype(np.int32)
        out = tiny.generate_tokens(prompt, max_new_tokens=4)
        assert out.shape == (1, plen + 4)
        np.testing.assert_array_equal(out[0, :plen], prompt[0])
        logits = np.asarray(tiny.decoder.apply({"params": tiny.params},
                                               jnp.asarray(out)))
        for t in range(plen, out.shape[1]):
            if cfg.eos_token in out[0, plen:t]:
                break
            assert int(out[0, t]) == int(np.argmax(logits[0, t - 1])), (plen, t)


def test_tensor_parallel_generation_matches_single_device():
    """Megatron-style param shardings over a 2-way tp mesh: GSPMD must
    produce the same logits/tokens as single-device execution."""
    import jax
    from jax.sharding import Mesh

    from automative_rag_tpu.parallel import shard_qwen2_model

    cfg = Qwen2Config.tiny_test()
    base = Qwen2Model(cfg, seed=11)
    rng = np.random.default_rng(11)
    prompt = rng.integers(3, cfg.vocab_size, size=(1, 6)).astype(np.int32)
    want_tokens = base.generate_tokens(prompt, max_new_tokens=6)
    want_logits = np.asarray(base.decoder.apply({"params": base.params},
                                                jnp.asarray(prompt)))

    mesh = Mesh(np.array(jax.devices()[:2]), ("tp",))
    sharded = Qwen2Model(cfg, seed=11)
    shard_qwen2_model(sharded, mesh)
    got_tokens = sharded.generate_tokens(prompt, max_new_tokens=6)
    got_logits = np.asarray(sharded.decoder.apply({"params": sharded.params},
                                                  jnp.asarray(prompt)))
    # bf16 kernels + split contractions reorder reductions: ~1% drift is
    # expected; ranking must be unaffected
    np.testing.assert_allclose(got_logits, want_logits, rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(got_logits.argmax(-1), want_logits.argmax(-1))
    np.testing.assert_array_equal(got_tokens, want_tokens)

    # kv-head divisibility is enforced
    bad = Mesh(np.array(jax.devices()[:8]), ("tp",))
    with pytest.raises(ValueError):
        shard_qwen2_model(Qwen2Model(cfg, seed=1), bad)


def test_int8_weight_only_quantization():
    """weight_bits=8: loading quantizes kernels to int8+scale; logits track
    the full-precision model closely and generation runs end-to-end."""
    import dataclasses

    from automative_rag_tpu.models.qwen2 import quantize_qwen2_params

    cfg = Qwen2Config.tiny_test()
    base = Qwen2Model(cfg, seed=13)
    qcfg = dataclasses.replace(cfg, weight_bits=8)
    quant = Qwen2Model.__new__(Qwen2Model)  # build around converted params
    quant.__init__(qcfg, seed=13)
    quant.params = quantize_qwen2_params(base.params, qcfg)

    rng = np.random.default_rng(13)
    prompt = rng.integers(3, cfg.vocab_size, size=(1, 6)).astype(np.int32)
    want = np.asarray(base.decoder.apply({"params": base.params},
                                         jnp.asarray(prompt)))
    got = np.asarray(quant.decoder.apply({"params": quant.params},
                                         jnp.asarray(prompt)))
    # int8 weights: small pointwise error, top-1 must agree
    np.testing.assert_allclose(got, want, rtol=0.2, atol=0.2)
    assert (got.argmax(-1) == want.argmax(-1)).mean() >= 0.8

    out = quant.generate_tokens(prompt, max_new_tokens=5)
    assert out.shape == (1, 11)
    np.testing.assert_array_equal(out[0, :6], prompt[0])

    # the quantized tree actually stores int8 kernels
    leaf = quant.params["layer_0"]["attn"]["q_proj"]
    assert leaf["kernel_q"].dtype == jnp.int8 and "kernel" not in leaf


def test_int8_hf_loading(tmp_path):
    """HF checkpoints load directly into the quantized layout."""
    import dataclasses

    from safetensors.numpy import save_file

    cfg = Qwen2Config.tiny_test()
    base = Qwen2Model(cfg, seed=17)
    mapping = _qwen2_key_map(cfg)
    flat = _flatten(base.params)
    state = {}
    for hf_key, dest in mapping.items():
        if cfg.tie_embeddings and hf_key == "lm_head.weight":
            continue
        value = np.asarray(flat["/".join(dest)], np.float32)
        if dest[-1] == "kernel":
            value = value.T
        state[hf_key] = np.ascontiguousarray(value)
    save_file(state, str(tmp_path / "model.safetensors"))

    qcfg = dataclasses.replace(cfg, weight_bits=8)
    loaded = load_hf_qwen2(qcfg, str(tmp_path))
    assert loaded is not None
    leaf = loaded["layer_0"]["attn"]["k_proj"]
    assert leaf["kernel_q"].dtype == jnp.int8
    assert leaf["scale"].dtype == jnp.float32

    quant = Qwen2Model(qcfg, seed=17)
    quant.params = loaded
    out = quant.generate_tokens(np.array([[5, 6, 7]], np.int32), max_new_tokens=4)
    assert out.shape == (1, 7)


def test_int8_tensor_parallel():
    """int8 weight-only + tp compose: sharded quantized generation matches
    the single-device quantized model token-for-token."""
    import dataclasses

    import jax
    from jax.sharding import Mesh

    from automative_rag_tpu.models.qwen2 import quantize_qwen2_params
    from automative_rag_tpu.parallel import shard_qwen2_model

    qcfg = dataclasses.replace(Qwen2Config.tiny_test(), weight_bits=8)
    a = Qwen2Model(qcfg, seed=19)
    a.params = quantize_qwen2_params(Qwen2Model(Qwen2Config.tiny_test(), seed=19).params, qcfg)
    prompt = np.array([[5, 9, 12, 7]], np.int32)
    want = np.asarray(a.decoder.apply({"params": a.params}, jnp.asarray(prompt)))

    b = Qwen2Model(qcfg, seed=19)
    b.params = quantize_qwen2_params(Qwen2Model(Qwen2Config.tiny_test(), seed=19).params, qcfg)
    shard_qwen2_model(b, Mesh(np.array(jax.devices()[:2]), ("tp",)))
    got = np.asarray(b.decoder.apply({"params": b.params}, jnp.asarray(prompt)))
    # int8-lattice logits hit exact ties whose argmax flips with reduction
    # order, so compare logits (spec errors would be garbage, not 1% drift)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
    out = b.generate_tokens(prompt, max_new_tokens=5)
    assert out.shape == (1, 9)
    np.testing.assert_array_equal(out[0, :4], prompt[0])


def test_repetition_penalty(tiny):
    """A huge penalty forbids re-emitting any seen token: the generated ids
    must be distinct from each other and from the prompt (until eos)."""
    cfg = tiny.config
    prompt = np.array([[5, 6, 7]], np.int32)
    out = tiny.generate_tokens(prompt, max_new_tokens=10,
                               repetition_penalty=1e9)[0]
    gen = []
    for t in out[3:]:
        if t == cfg.eos_token:
            break
        gen.append(int(t))
    assert len(gen) == len(set(gen)), gen
    assert not (set(gen) & {5, 6, 7})
    # penalty=1.0 is a strict no-op vs the default path
    a = tiny.generate_tokens(prompt, max_new_tokens=6)
    b = tiny.generate_tokens(prompt, max_new_tokens=6, repetition_penalty=1.0)
    np.testing.assert_array_equal(a, b)


def test_ragged_batch_generation(tiny):
    """Ragged prompts share one prefill + decode loop; every row must still
    satisfy the full-forward argmax oracle, and row order must not matter."""
    cfg = tiny.config
    rng = np.random.default_rng(21)
    p_short = rng.integers(3, cfg.vocab_size, size=5).astype(np.int32)
    p_long = rng.integers(3, cfg.vocab_size, size=9).astype(np.int32)

    outs = tiny.generate_ragged([p_short, p_long], max_new_tokens=6)
    assert [len(o) for o in outs] == [11, 15]
    np.testing.assert_array_equal(outs[0][:5], p_short)
    np.testing.assert_array_equal(outs[1][:9], p_long)

    for out, plen in zip(outs, (5, 9)):
        logits = np.asarray(tiny.decoder.apply(
            {"params": tiny.params}, jnp.asarray(out[None, :])))
        for t in range(plen, len(out)):
            if cfg.eos_token in out[plen:t]:
                break
            assert int(out[t]) == int(np.argmax(logits[0, t - 1])), (plen, t)

    swapped = tiny.generate_ragged([p_long, p_short], max_new_tokens=6)
    np.testing.assert_array_equal(swapped[1], outs[0])
    np.testing.assert_array_equal(swapped[0], outs[1])


def test_generate_batch_backend():
    from automative_rag_tpu.generation.llm import JaxCausalLM

    class FakeTok:
        def __call__(self, text):
            return {"input_ids": [3 + (ord(c) % 200) for c in text]}

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(97 + (t % 26)) for t in ids)

    llm = JaxCausalLM("", config=Qwen2Config.tiny_test(), tokenizer=FakeTok())
    texts = llm.generate_batch(["短", "长一点的提示词"], {"max_tokens": 5})
    assert len(texts) == 2 and all(isinstance(t, str) for t in texts)
    # batched result matches the one-at-a-time path (greedy)
    solo = llm.generate("短", {"max_tokens": 5})
    assert texts[0] == solo


def test_int4_weight_only_quantization():
    """weight_bits=4: packed nibbles quarter the kernel bytes; logits stay
    correlated with full precision and generation runs."""
    import dataclasses

    from automative_rag_tpu.models.qwen2 import quantize_qwen2_params

    cfg = Qwen2Config.tiny_test()
    base = Qwen2Model(cfg, seed=23)
    qcfg = dataclasses.replace(cfg, weight_bits=4)
    quant = Qwen2Model(qcfg, seed=23)
    quant.params = quantize_qwen2_params(base.params, qcfg)

    leaf = quant.params["layer_0"]["attn"]["q_proj"]
    assert leaf["kernel_q"].dtype == jnp.uint8
    assert leaf["kernel_q"].shape == (32, 64)  # packed: in/2 rows

    rng = np.random.default_rng(23)
    prompt = rng.integers(3, cfg.vocab_size, size=(1, 6)).astype(np.int32)
    want = np.asarray(base.decoder.apply({"params": base.params},
                                         jnp.asarray(prompt))).ravel()
    got = np.asarray(quant.decoder.apply({"params": quant.params},
                                         jnp.asarray(prompt))).ravel()
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.95, corr
    out = quant.generate_tokens(prompt, max_new_tokens=5)
    assert out.shape == (1, 11)


def test_int4_pack_unpack_roundtrip():
    """quantize_kernel(bits=4) packing must invert exactly inside
    unpack_w4 (offset-8 nibbles, half-split input-dim layout)."""
    from automative_rag_tpu.models.qwen2 import quantize_kernel
    from automative_rag_tpu.ops.quant_matmul import unpack_w4

    rng = np.random.default_rng(5)
    kernel = rng.normal(size=(16, 8)).astype(np.float32)
    packed, scale = quantize_kernel(kernel, bits=4)
    assert packed.shape == (8, 8) and packed.dtype == np.uint8
    unpacked = np.asarray(unpack_w4(jnp.asarray(packed), jnp.float32))
    recon = unpacked * scale[None, :]
    assert np.abs(recon - kernel).max() <= scale.max() * 0.5 + 1e-6


def test_w4_matmul_kernel_matches_xla_unpack():
    """Fused Pallas w4a16 kernel (interpret mode) ≡ the XLA unpack path,
    across shapes that exercise M/N/K padding and multi-block grids."""
    from automative_rag_tpu.ops.quant_matmul import pack_w4, unpack_w4, w4_matmul

    rng = np.random.default_rng(7)
    for m, k, n in ((1, 128, 96), (8, 256, 256), (23, 512, 130), (130, 640, 384)):
        w = rng.normal(size=(k, n)).astype(np.float32)
        packed, scale = pack_w4(w)
        x = rng.normal(size=(m, k)).astype(np.float32)
        import jax as _jax

        want = np.asarray(
            jnp.dot(jnp.asarray(x), unpack_w4(jnp.asarray(packed), jnp.float32),
                    precision=_jax.lax.Precision.HIGHEST) * scale[None, :]
        )
        for unpack in ("i32", "u8", "merged"):
            got = np.asarray(w4_matmul(
                jnp.asarray(x), jnp.asarray(packed), jnp.asarray(scale),
                block_m=16, block_n=128, block_k=128, interpret=True,
                unpack=unpack,
            ))
            np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2,
                                       err_msg=unpack)


def test_int4_generation_with_w4_kernel(monkeypatch):
    """QuantDense routed through the fused kernel (interpret) generates the
    SAME tokens as the XLA unpack path."""
    import dataclasses

    from automative_rag_tpu.models.qwen2 import quantize_qwen2_params

    cfg = Qwen2Config.tiny_test()
    base = Qwen2Model(cfg, seed=31)
    qcfg = dataclasses.replace(cfg, weight_bits=4)

    rng = np.random.default_rng(31)
    prompt = rng.integers(3, cfg.vocab_size, size=(1, 6)).astype(np.int32)

    monkeypatch.setenv("W4_KERNEL", "0")
    plain = Qwen2Model(qcfg, seed=31)
    plain.params = quantize_qwen2_params(base.params, qcfg)
    want = plain.generate_tokens(prompt, max_new_tokens=6)

    monkeypatch.setenv("W4_KERNEL", "1")
    fused = Qwen2Model(qcfg, seed=31)
    fused.params = plain.params
    got = fused.generate_tokens(prompt, max_new_tokens=6)
    np.testing.assert_array_equal(got, want)


def test_dp_tp_generation_matches_single_device():
    """dp×tp serving: batch rows over dp, weights over tp — tokens must
    match single-device generation."""
    import jax
    from automative_rag_tpu.parallel import shard_qwen2_model
    from automative_rag_tpu.parallel.mesh import make_mesh_2d

    cfg = Qwen2Config.tiny_test()
    base = Qwen2Model(cfg, seed=29)
    rng = np.random.default_rng(29)
    prompts = rng.integers(3, cfg.vocab_size, size=(4, 6)).astype(np.int32)
    want = base.generate_tokens(prompts, max_new_tokens=5)

    mesh = make_mesh_2d(2, 2, axis_names=("dp", "tp"),
                        devices=jax.devices()[:4])
    sharded = Qwen2Model(cfg, seed=29)
    shard_qwen2_model(sharded, mesh, axis="tp", dp_axis="dp")
    got = sharded.generate_tokens(prompts, max_new_tokens=5)
    np.testing.assert_array_equal(got, want)
    # non-divisible batch falls back cleanly
    got3 = sharded.generate_tokens(prompts[:3], max_new_tokens=5)
    np.testing.assert_array_equal(got3, want[:3])


def test_int8_kv_cache():
    """kv_cache_bits=8: first generated token identical to bf16 caches (it
    comes from the unquantized prefill logits); later tokens mostly agree;
    works combined with weight quantization and ragged batches."""
    import dataclasses

    cfg = Qwen2Config.tiny_test()
    base = Qwen2Model(cfg, seed=31)
    kv8 = Qwen2Model(dataclasses.replace(cfg, kv_cache_bits=8), seed=31)

    rng = np.random.default_rng(31)
    prompt = rng.integers(3, cfg.vocab_size, size=(2, 6)).astype(np.int32)
    want = base.generate_tokens(prompt, max_new_tokens=8)
    got = kv8.generate_tokens(prompt, max_new_tokens=8)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got[:, 6], want[:, 6])  # prefill-sourced
    agree = (got[:, 6:] == want[:, 6:]).mean()
    assert agree >= 0.75, agree

    # composes with int4 weights + ragged batching
    q48 = Qwen2Model(dataclasses.replace(cfg, weight_bits=4, kv_cache_bits=8),
                     seed=31)
    from automative_rag_tpu.models.qwen2 import quantize_qwen2_params

    q48.params = quantize_qwen2_params(
        base.params, dataclasses.replace(cfg, weight_bits=4))
    outs = q48.generate_ragged([prompt[0, :4], prompt[1]], max_new_tokens=4)
    assert [len(o) for o in outs] == [8, 10]


def test_flash_prefill_generates_identically(monkeypatch):
    """Prefill through the Pallas flash kernel (interpret mode on CPU) must
    produce the same greedy tokens as the XLA full-matrix prefill."""
    import numpy as np

    from automative_rag_tpu.models.qwen2 import Qwen2Config, Qwen2Model

    cfg = Qwen2Config.tiny_test()
    prompt = np.arange(3, 40, dtype=np.int32) % 250 + 3

    monkeypatch.setenv("LLM_FLASH_PREFILL", "0")
    base = Qwen2Model(cfg, seed=11)
    want = base.generate_tokens(prompt, max_new_tokens=8, temperature=0.0)

    monkeypatch.setenv("LLM_FLASH_PREFILL", "1")
    flash = Qwen2Model(cfg, seed=11)
    got = flash.generate_tokens(prompt, max_new_tokens=8, temperature=0.0)
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# Prompt-lookup speculative decoding
# ---------------------------------------------------------------------------

def test_pld_draft_finds_most_recent_match():
    """Drafts must be the continuation of the MOST RECENT earlier occurrence
    of the trailing n-gram, ignoring the bucket-padding gap."""
    from automative_rag_tpu.models.qwen2 import _pld_draft

    # prompt = [9, 5, 6, 7, 8, 5, 6, 1], gap (eos=2) at slots 8..9,
    # generated [5, 6] at slots 10..11 → trailing 2-gram (5, 6) matches at
    # i=1 and i=5. i=5's continuation [1, gap, gap] runs into the padding
    # gap, i=1's [7, 8, 5] is fully real → the two-tier score picks i=1.
    buf = np.array([[9, 5, 6, 7, 8, 5, 6, 1, 2, 2, 5, 6, 0, 0, 0, 0]], np.int32)
    drafts, has_match = _pld_draft(
        jnp.asarray(buf), jnp.int32(11), jnp.full((1,), 8, jnp.int32),
        10, 3, 2,
    )
    np.testing.assert_array_equal(np.asarray(drafts)[0], [7, 8, 5])
    assert bool(np.asarray(has_match)[0])

    # no match for trailing (6, 1) except... 1 appears once → no 2-gram match
    buf2 = np.array([[9, 5, 6, 7, 8, 3, 4, 1, 2, 2, 6, 1, 0, 0, 0, 0]], np.int32)
    drafts2, has_match2 = _pld_draft(
        jnp.asarray(buf2), jnp.int32(11), jnp.full((1,), 8, jnp.int32),
        10, 3, 2,
    )
    # no match → the spec loop falls back to a plain single step
    assert not bool(np.asarray(has_match2)[0])
    assert np.asarray(drafts2).shape == (1, 3)


def _copy_model(seed=21):
    """Tiny model surgically altered to copy its input: o_proj/down_proj
    kernels zeroed, so the residual stream is exactly the token embedding
    and tied-embedding logits peak at the input token (random gaussian
    embeddings are near-orthogonal). Greedy output = last prompt token
    repeated — the best case for prompt-lookup drafting."""
    import jax

    model = Qwen2Model(Qwen2Config.tiny_test(), seed=seed)

    def zero_copy_breakers(path, leaf):
        keys = [getattr(p, "key", "") for p in path]
        if "kernel" in keys and ("o_proj" in keys or "down_proj" in keys):
            return jnp.zeros_like(leaf)
        return leaf

    model.params = jax.tree_util.tree_map_with_path(zero_copy_breakers, model.params)
    return model


def test_speculative_matches_greedy_on_copy_model():
    model = _copy_model()
    prompt = np.array([7, 8, 9, 10, 11], np.int32)
    want = model.generate_tokens(prompt, max_new_tokens=24, temperature=0.0)
    got, n_fwd = model.generate_tokens_spec(prompt, max_new_tokens=24)
    np.testing.assert_array_equal(got, want)
    # the copy model repeats one token; every draft is accepted, so the
    # 24 tokens need far fewer than 24 decode forwards
    assert n_fwd <= 24 // 3, n_fwd


def test_speculative_matches_greedy_random_model(tiny):
    """Token-identical to the plain greedy loop on an arbitrary model, with
    repetition penalty active (the acceptance loop applies it sequentially,
    exactly as the step loop would)."""
    rng = np.random.default_rng(9)
    for trial in range(3):
        prompt = rng.integers(3, tiny.config.vocab_size, size=7).astype(np.int32)
        for penalty in (1.0, 1.3):
            want = tiny.generate_tokens(prompt, max_new_tokens=12,
                                        temperature=0.0,
                                        repetition_penalty=penalty)
            got, n_fwd = tiny.generate_tokens_spec(
                prompt, max_new_tokens=12, repetition_penalty=penalty)
            np.testing.assert_array_equal(got, want)
            assert 1 <= n_fwd <= 12


def test_speculative_int8_kv_matches_plain_int8():
    import dataclasses

    cfg = dataclasses.replace(Qwen2Config.tiny_test(), kv_cache_bits=8)
    model = Qwen2Model(cfg, seed=5)
    prompt = np.array([4, 5, 6, 7], np.int32)
    want = model.generate_tokens(prompt, max_new_tokens=10, temperature=0.0)
    got, _ = model.generate_tokens_spec(prompt, max_new_tokens=10)
    np.testing.assert_array_equal(got, want)


def test_batched_spec_matches_plain_batch(tiny):
    """B>1 routes through the batched spec path (per-row frontiers, one
    (K+1)-wide verify per iteration) and stays token-identical to the
    plain batched greedy loop, repetition penalty included."""
    rng = np.random.default_rng(11)
    prompt = rng.integers(3, tiny.config.vocab_size, size=(3, 7)).astype(np.int32)
    for penalty in (1.0, 1.3):
        want = tiny.generate_tokens(prompt, max_new_tokens=12,
                                    temperature=0.0,
                                    repetition_penalty=penalty)
        got, n_fwd = tiny.generate_tokens_spec(
            prompt, max_new_tokens=12, repetition_penalty=penalty)
        np.testing.assert_array_equal(got, want)
        assert 1 <= n_fwd <= 12


def test_batched_spec_copy_model_fewer_forwards():
    """Copy-heavy batch: every row accepts full drafts, so B×24 tokens
    cost far fewer verify forwards than tokens per row."""
    model = _copy_model()
    prompt = np.tile(np.array([7, 8, 9, 10, 11], np.int32), (4, 1))
    want = model.generate_tokens(prompt, max_new_tokens=24, temperature=0.0)
    got, n_fwd = model.generate_tokens_spec(prompt, max_new_tokens=24)
    np.testing.assert_array_equal(got, want)
    assert n_fwd <= 24 // 3, n_fwd


def test_batched_spec_ragged_matches_plain():
    """Ragged batched spec: per-row plen + per-row frontiers, identical to
    the plain ragged loop row for row. Rows of very different lengths make
    frontier divergence certain (short row finishes while long row runs)."""
    model = Qwen2Model(Qwen2Config.tiny_test(), seed=13)
    rng = np.random.default_rng(5)
    prompts = [
        rng.integers(3, model.config.vocab_size, size=n).astype(np.int32)
        for n in (4, 11, 7)
    ]
    want = model.generate_ragged(prompts, max_new_tokens=10, temperature=0.0)
    got, n_fwd = model.generate_ragged_spec(prompts, max_new_tokens=10)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    assert n_fwd >= 1


def test_batched_spec_int8_kv_matches_plain():
    import dataclasses

    cfg = dataclasses.replace(Qwen2Config.tiny_test(), kv_cache_bits=8)
    model = Qwen2Model(cfg, seed=5)
    prompt = np.tile(np.array([4, 5, 6, 7], np.int32), (2, 1))
    want = model.generate_tokens(prompt, max_new_tokens=10, temperature=0.0)
    got, _ = model.generate_tokens_spec(prompt, max_new_tokens=10)
    np.testing.assert_array_equal(got, want)


def test_speculative_sampling_deterministic_and_near_greedy(tiny):
    """Sampling spec decode: same seed → same output; near-zero temperature
    collapses to the greedy spec output (distribution sanity)."""
    prompt = np.array([7, 8, 9, 10, 11], np.int32)
    a, _ = tiny.generate_tokens_spec(prompt, max_new_tokens=10,
                                     temperature=0.9, seed=3)
    b2, _ = tiny.generate_tokens_spec(prompt, max_new_tokens=10,
                                      temperature=0.9, seed=3)
    np.testing.assert_array_equal(a, b2)

    greedy, _ = tiny.generate_tokens_spec(prompt, max_new_tokens=10)
    tiny_t, _ = tiny.generate_tokens_spec(prompt, max_new_tokens=10,
                                          temperature=0.9, top_p=1e-6, seed=5)
    np.testing.assert_array_equal(tiny_t, greedy)  # top_p→0 keeps argmax only


def test_batched_spec_overshoot_near_window_end():
    """Copy-heavy + ragged + tiny output windows: accepted runs overshoot
    into the scratch slots while other rows finish — output must still be
    identical to the plain ragged loop for every window size."""
    model = _copy_model(seed=21)
    rng = np.random.default_rng(3)
    for n_new in (3, 5, 9, 17):
        prompts = [rng.integers(3, 256, size=n).astype(np.int32)
                   for n in (3, 9, 6)]
        want = model.generate_ragged(prompts, max_new_tokens=n_new,
                                     temperature=0.0)
        got, n_fwd = model.generate_ragged_spec(prompts, max_new_tokens=n_new)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
        assert n_fwd <= n_new


def test_llama_checkpoint_without_attention_biases(tmp_path):
    """Llama-family exports ship no q/k/v biases (attention_bias=false);
    the loader must fill zeros — token-identical to the same weights with
    explicit zero biases (reference serves one model family; this decoder
    serves qwen2 AND llama namings)."""
    import json as _json

    from safetensors.numpy import save_file

    from automative_rag_tpu.models.qwen2 import _qwen2_key_map, load_hf_qwen2

    cfg = Qwen2Config.tiny_test()
    base = Qwen2Model(cfg, seed=11)
    mapping = _qwen2_key_map(cfg)
    flat = _flatten(base.params)
    state = {}
    for hf_key, dest in mapping.items():
        if cfg.tie_embeddings and hf_key == "lm_head.weight":
            continue
        value = np.asarray(flat["/".join(dest)], np.float32)
        if dest[-1] == "kernel":
            value = value.T
        if hf_key.endswith(".bias"):
            continue  # llama: no attention biases in the export
        state[hf_key] = np.ascontiguousarray(value)
    save_file(state, str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(_json.dumps({
        "model_type": "llama", "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.d_model, "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "intermediate_size": cfg.intermediate_size,
        "rope_theta": cfg.rope_theta, "eos_token_id": cfg.eos_token,
        "tie_word_embeddings": cfg.tie_embeddings,
    }))

    loaded = load_hf_qwen2(cfg, str(tmp_path))
    assert loaded is not None

    # oracle: the base model with its q/k/v biases zeroed
    import jax.numpy as jnp

    def zero_biases(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = zero_biases(v)
            elif k == "bias":
                out[k] = jnp.zeros_like(v)
            else:
                out[k] = v
        return out

    prompt = np.array([[5, 9, 14, 3]], np.int32)
    want_model = Qwen2Model(cfg, seed=11)
    want_model.params = zero_biases(base.params)
    got_model = Qwen2Model(cfg, seed=0)
    got_model.params = loaded
    want = want_model.generate_tokens(prompt, max_new_tokens=6)
    got = got_model.generate_tokens(prompt, max_new_tokens=6)
    np.testing.assert_array_equal(got, want)


def test_partial_bias_checkpoint_rejected(tmp_path):
    """A qwen2 export missing only SOME attention biases is corruption,
    not a llama export — the loader must fail loudly, not zero-fill."""
    import json as _json

    from safetensors.numpy import save_file

    from automative_rag_tpu.models.qwen2 import _qwen2_key_map, load_hf_qwen2

    cfg = Qwen2Config.tiny_test()
    base = Qwen2Model(cfg, seed=13)
    mapping = _qwen2_key_map(cfg)
    flat = _flatten(base.params)
    state = {}
    dropped = False
    for hf_key, dest in mapping.items():
        if cfg.tie_embeddings and hf_key == "lm_head.weight":
            continue
        value = np.asarray(flat["/".join(dest)], np.float32)
        if dest[-1] == "kernel":
            value = value.T
        if not dropped and hf_key.endswith("q_proj.bias"):
            dropped = True  # one missing bias = partial download
            continue
        state[hf_key] = np.ascontiguousarray(value)
    save_file(state, str(tmp_path / "model.safetensors"))
    assert load_hf_qwen2(cfg, str(tmp_path)) is None
