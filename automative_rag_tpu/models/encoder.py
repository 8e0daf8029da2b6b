"""Transformer encoder in Flax — the JAX replacement for the reference's
torch BERT/XLM-R encoders (bge-m3 dense embedder and the ColBERT token
encoder both run this architecture; reference loads them via HF
``transformers`` in ``src/config/settings.py:233-249`` and
``src/core/query/llm/rerankers.py:96-131``).

Architecture: XLM-RoBERTa family (post-LayerNorm, learned positions with the
RoBERTa padding-offset convention, GELU MLP). Parameters stay fp32; compute
dtype defaults to bfloat16 so matmuls hit the MXU natively. Weights load from
a local HuggingFace safetensors checkpoint when one exists; otherwise
deterministic random init keeps the full pipeline runnable.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 32768
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position: int = 8194
    type_vocab_size: int = 1
    pad_token_id: int = 1  # XLM-R convention; HashTokenizer remaps via mask
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @classmethod
    def bge_m3(cls) -> "EncoderConfig":
        """bge-m3 = XLM-RoBERTa-large geometry, 8192-token positions."""
        return cls(vocab_size=250002, hidden_size=1024, num_layers=24, num_heads=16,
                   intermediate_size=4096, max_position=8194)

    @classmethod
    def tiny(cls, vocab_size: int = 1024, hidden_size: int = 64) -> "EncoderConfig":
        """Small config for tests and weightless smoke runs."""
        return cls(vocab_size=vocab_size, hidden_size=hidden_size, num_layers=2,
                   num_heads=4, intermediate_size=2 * hidden_size, max_position=514)


class _SelfAttention(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, hidden, attention_bias):
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads
        dense = lambda name: nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name=name)
        q = dense("query")(hidden)
        k = dense("key")(hidden)
        v = dense("value")(hidden)

        b, l, _ = hidden.shape
        split = lambda x: x.reshape(b, l, cfg.num_heads, head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k)) / np.sqrt(head_dim)
        scores = scores + attention_bias  # [B, 1, 1, L] additive mask
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(cfg.dtype)
        context = jnp.einsum("bhqk,bkhd->bqhd", probs, split(v)).reshape(b, l, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="output")(context)


class _Layer(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, hidden, attention_bias):
        cfg = self.config
        attn_out = _SelfAttention(cfg, name="attention")(hidden, attention_bias)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                              name="attention_norm")(hidden + attn_out)
        mlp = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="intermediate")(hidden)
        mlp = nn.gelu(mlp, approximate=False)
        mlp = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="mlp_output")(mlp)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                            name="output_norm")(hidden + mlp)


class TransformerEncoder(nn.Module):
    """Returns the last hidden state [B, L, H] (fp32)."""

    config: EncoderConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        cfg = self.config
        # RoBERTa-style position ids: pad positions pinned at pad_token_id,
        # real tokens numbered from pad_token_id + 1
        positions = jnp.cumsum(attention_mask, axis=1) * attention_mask + cfg.pad_token_id
        positions = jnp.minimum(positions, cfg.max_position - 1)

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                        name="word_embeddings")(input_ids)
        pos = nn.Embed(cfg.max_position, cfg.hidden_size, dtype=cfg.dtype,
                       name="position_embeddings")(positions)
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                       name="token_type_embeddings")(jnp.zeros_like(input_ids))
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                              name="embeddings_norm")(word + pos + typ)
        hidden = hidden.astype(cfg.dtype)

        bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9).astype(cfg.dtype)
        for i in range(cfg.num_layers):
            hidden = _Layer(cfg, name=f"layer_{i}")(hidden, bias)
        return hidden.astype(jnp.float32)


def init_encoder_params(config: EncoderConfig, seed: int = 0) -> Dict:
    model = TransformerEncoder(config)
    dummy_ids = jnp.zeros((1, 8), jnp.int32)
    dummy_mask = jnp.ones((1, 8), jnp.int32)
    return model.init(jax.random.PRNGKey(seed), dummy_ids, dummy_mask)["params"]


# --------------------------------------------------------------------------
# HuggingFace checkpoint loading (XLM-RoBERTa / BERT naming)
# --------------------------------------------------------------------------

def _hf_key_map(num_layers: int) -> Dict[str, str]:
    """HF state-dict name → flax param path ('/'-joined)."""
    mapping = {
        "embeddings.word_embeddings.weight": "word_embeddings/embedding",
        "embeddings.position_embeddings.weight": "position_embeddings/embedding",
        "embeddings.token_type_embeddings.weight": "token_type_embeddings/embedding",
        "embeddings.LayerNorm.weight": "embeddings_norm/scale",
        "embeddings.LayerNorm.bias": "embeddings_norm/bias",
    }
    for i in range(num_layers):
        hf = f"encoder.layer.{i}"
        fx = f"layer_{i}"
        for proj in ("query", "key", "value"):
            mapping[f"{hf}.attention.self.{proj}.weight"] = f"{fx}/attention/{proj}/kernel"
            mapping[f"{hf}.attention.self.{proj}.bias"] = f"{fx}/attention/{proj}/bias"
        mapping[f"{hf}.attention.output.dense.weight"] = f"{fx}/attention/output/kernel"
        mapping[f"{hf}.attention.output.dense.bias"] = f"{fx}/attention/output/bias"
        mapping[f"{hf}.attention.output.LayerNorm.weight"] = f"{fx}/attention_norm/scale"
        mapping[f"{hf}.attention.output.LayerNorm.bias"] = f"{fx}/attention_norm/bias"
        mapping[f"{hf}.intermediate.dense.weight"] = f"{fx}/intermediate/kernel"
        mapping[f"{hf}.intermediate.dense.bias"] = f"{fx}/intermediate/bias"
        mapping[f"{hf}.output.dense.weight"] = f"{fx}/mlp_output/kernel"
        mapping[f"{hf}.output.dense.bias"] = f"{fx}/mlp_output/bias"
        mapping[f"{hf}.output.LayerNorm.weight"] = f"{fx}/output_norm/scale"
        mapping[f"{hf}.output.LayerNorm.bias"] = f"{fx}/output_norm/bias"
    return mapping


def load_hf_weights(config: EncoderConfig, path: str) -> Optional[Dict]:
    """Load a local HF safetensors checkpoint into flax params; None if absent."""
    ckpt_dir = Path(path)
    files = sorted(ckpt_dir.glob("*.safetensors")) if ckpt_dir.exists() else []
    if not files:
        return None
    from safetensors.numpy import load_file

    state: Dict[str, np.ndarray] = {}
    for f in files:
        state.update(load_file(str(f)))
    # strip common prefixes (e.g. "roberta." / "bert." / "model.")
    prefixes = ("roberta.", "bert.", "model.", "")
    mapping = _hf_key_map(config.num_layers)

    params: Dict = {}

    def put(path_str: str, value: np.ndarray) -> None:
        node = params
        parts = path_str.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value, jnp.float32)

    for hf_key, flax_path in mapping.items():
        tensor = None
        for prefix in prefixes:
            tensor = state.get(prefix + hf_key)
            if tensor is not None:
                break
        if tensor is None:
            return None  # incompatible checkpoint
        if flax_path.endswith("kernel"):
            tensor = tensor.T  # HF Linear stores [out, in]; flax Dense [in, out]
        put(flax_path, tensor)
    return params
