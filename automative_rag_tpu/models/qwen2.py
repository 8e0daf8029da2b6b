"""TPU-native Qwen2-family causal LM (the reference's answer model).

The reference serves DeepSeek-R1-Distill-Qwen via a torch HF ``pipeline`` on
a T4 (``src/core/query/llm/local_llm.py:233-299``); that model family is the
Qwen2 architecture (RMSNorm, rotary embeddings, grouped-query attention,
SwiGLU MLP). Here the whole generation path is jax/Flax:

- full teacher-forcing forward (parity oracle + scoring),
- O(1)-per-token incremental ``step`` with per-layer KV caches
  (rotary applied at write time, so cached k/v are position-final),
- whole-loop-jitted generation under ``lax.while_loop``: greedy or
  temperature/top-p sampling with a threaded PRNG key,
- HF safetensors checkpoint loading (``model.layers.N.self_attn...``).

bf16 weights feed the MXU natively; norms and logits run in f32.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Qwen2Config:
    vocab_size: int = 152064
    d_model: int = 3584
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    intermediate_size: int = 18944
    max_positions: int = 4096
    rope_theta: float = 1_000_000.0
    rms_eps: float = 1e-6
    tie_embeddings: bool = False
    eos_token: int = 151643
    dtype: Any = jnp.bfloat16
    # 16 = bf16 kernels; 8/4 = symmetric weight-only quantization
    # (the reference squeezes its 7B model onto a T4 with BitsAndBytes
    # 4/8-bit, settings.py:195-214 — autoregressive decode reads every
    # weight per token, so int8 halves / int4 quarters the HBM traffic
    # that bounds it)
    weight_bits: int = 16
    # 16 = bf16 KV caches; 8 = per-token int8 (halves the cache HBM reads
    # each decode step re-scans — the other bandwidth term at batch×long
    # contexts — and doubles the context that fits HBM)
    kv_cache_bits: int = 16

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads

    @classmethod
    def tiny_test(cls, vocab_size: int = 256) -> "Qwen2Config":
        return cls(
            vocab_size=vocab_size, d_model=64, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=128, max_positions=128,
            rope_theta=10_000.0, eos_token=2, tie_embeddings=True,
        )

    @classmethod
    def from_hf(cls, path: str) -> Optional["Qwen2Config"]:
        cfg_file = Path(path) / "config.json"
        if not cfg_file.exists():
            return None
        raw = json.loads(cfg_file.read_text())
        if raw.get("model_type") not in ("qwen2", "llama", None):
            return None
        return cls(
            vocab_size=raw.get("vocab_size", 152064),
            d_model=raw.get("hidden_size", 3584),
            num_layers=raw.get("num_hidden_layers", 28),
            num_heads=raw.get("num_attention_heads", 28),
            num_kv_heads=raw.get("num_key_value_heads", 4),
            intermediate_size=raw.get("intermediate_size", 18944),
            max_positions=min(raw.get("max_position_embeddings", 4096), 8192),
            rope_theta=raw.get("rope_theta", 1_000_000.0),
            rms_eps=raw.get("rms_norm_eps", 1e-6),
            tie_embeddings=raw.get("tie_word_embeddings", False),
            eos_token=raw.get("eos_token_id", 151643),
        )


def _flash_prefill_enabled(t: int, head_dim: int) -> bool:
    """Use the Pallas flash-attention kernel for prefill? Defaults to on for
    TPU with MXU-aligned heads and prompts long enough that the O(T²) score
    matrix matters; ``LLM_FLASH_PREFILL=0|1`` overrides (1 runs interpret
    mode off-TPU, for tests)."""
    import os

    env = os.environ.get("LLM_FLASH_PREFILL", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    return jax.default_backend() == "tpu" and t >= 256 and head_dim % 128 == 0


def _w4_kernel_enabled() -> bool:
    """Route int4 matmuls through the fused Pallas w4a16 kernel? On by
    default on TPU (the XLA unpack path is ~14× slower at 7B decode);
    ``W4_KERNEL=0|1`` overrides (1 runs interpret mode off-TPU, for
    tests)."""
    import os

    env = os.environ.get("W4_KERNEL", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    return jax.default_backend() == "tpu"


def _rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """HF-style rotary embedding: x [B, T, H, D]; positions [T] (shared) or
    [B, T] (per-row, for ragged batches whose rope offsets differ)."""
    d = x.shape[-1]
    inv_freq = 1.0 / (theta ** (np.arange(0, d, 2, dtype=np.float32) / d))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [(B,)T, D/2]
    if angles.ndim == 2:  # shared positions
        angles = angles[None]
    cos = jnp.cos(angles)[:, :, None, :]  # [B|1, T, 1, D/2]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    return jnp.concatenate(
        [xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1
    ).astype(x.dtype)


class QuantDense(nn.Module):
    """Weight-only quantized linear. ``bits=8``: int8 kernel + per-output-
    channel f32 scale (half the HBM bytes of bf16); ``bits=4``: two nibbles
    packed per uint8 along the input dim (quarter the bytes). Unpack/cast
    happens in registers on the way into the MXU — HBM only ever sees the
    compressed weights, which is what bounds autoregressive decode."""

    features: int
    use_bias: bool = False
    bits: int = 8
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        scale = self.param(
            "scale", lambda key, shape: jnp.full(shape, 0.01, jnp.float32),
            (self.features,),
        )
        if self.bits == 4:
            packed = self.param(
                "kernel_q",
                lambda key, shape: jax.random.randint(key, shape, 0, 256, jnp.uint8),
                (in_features // 2, self.features),
            )
            if _w4_kernel_enabled():
                # fused Pallas w4a16: packed nibbles unpack in registers on
                # the way into the MXU — HBM sees only packed bytes. The
                # XLA unpack materializes full bf16 weights per call, which
                # collapses decode to ~7 tok/s at 7B (BENCH_LLM7B_r03)
                from ..ops.quant_matmul import w4_matmul

                import os

                lead = x.shape[:-1]
                y = w4_matmul(
                    x.reshape(-1, in_features).astype(self.dtype), packed,
                    scale, interpret=jax.default_backend() != "tpu",
                    unpack=os.environ.get("W4_UNPACK", "i32"),
                ).reshape(*lead, self.features)
            else:
                from ..ops.quant_matmul import unpack_w4

                kernel = unpack_w4(packed, self.dtype)
                y = jnp.dot(x.astype(self.dtype), kernel)
                y = y * scale.astype(self.dtype)
        else:
            kernel = self.param(
                "kernel_q",
                lambda key, shape: jax.random.randint(key, shape, -127, 128, jnp.int8),
                (in_features, self.features),
            )
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
            y = y * scale.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


def quantize_kernel(kernel: np.ndarray, bits: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """f32 kernel [in, out] → (quantized kernel, per-out-channel f32 scales).
    bits=8 → int8 [in, out]; bits=4 → packed uint8 [in/2, out] in the
    HALF-SPLIT layout (nibble pair = rows i and i+in/2 — contiguous x
    slices for the fused Pallas kernel; see ops/quant_matmul.pack_w4)."""
    if bits == 4:
        from ..ops.quant_matmul import pack_w4

        return pack_w4(np.asarray(kernel, np.float32))
    scale = np.abs(kernel).max(axis=0) / 127.0
    safe = np.maximum(scale, 1e-12)
    q = np.clip(np.round(kernel / safe[None, :]), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def _quant_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, T, H, D] → (int8 values, per-token f32 scales [B, T])."""
    scale = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(2, 3)) / 127.0
    safe = jnp.maximum(scale, 1e-8)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / safe[:, :, None, None]), -127, 127
    ).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _dequant_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    return q.astype(dtype) * scale[:, :, None, None].astype(dtype)


def _dense(cfg: Qwen2Config, features: int, use_bias: bool = False):
    if cfg.weight_bits in (4, 8):
        return QuantDense(features, use_bias=use_bias, bits=cfg.weight_bits,
                          dtype=cfg.dtype)
    return nn.Dense(features, use_bias=use_bias, dtype=cfg.dtype)


class _Attention(nn.Module):
    config: Qwen2Config

    def setup(self):
        cfg = self.config
        hd = cfg.head_dim
        # qwen2 puts biases on q/k/v, none on o
        self.q_proj = _dense(cfg, cfg.num_heads * hd, use_bias=True)
        self.k_proj = _dense(cfg, cfg.num_kv_heads * hd, use_bias=True)
        self.v_proj = _dense(cfg, cfg.num_kv_heads * hd, use_bias=True)
        self.o_proj = _dense(cfg, cfg.d_model)

    def _qkv(self, x, positions):
        cfg = self.config
        b, t, _ = x.shape
        hd = cfg.head_dim
        q = self.q_proj(x).reshape(b, t, cfg.num_heads, hd)
        k = self.k_proj(x).reshape(b, t, cfg.num_kv_heads, hd)
        v = self.v_proj(x).reshape(b, t, cfg.num_kv_heads, hd)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)
        return q, k, v

    def _attend(self, q, k, v, mask):
        """q [B,Tq,H,D]; k/v [B,Tk,Hkv,D]; mask broadcastable to
        [B,1|H,Tq,Tk] or None.

        GQA contracts the grouped query heads against the SHARED kv head
        directly (q reshaped [B,Tq,Hkv,G,D]) — the previous
        ``jnp.repeat(k, groups)`` materialized a groups-times bf16 copy of
        the whole KV pool EVERY decode step, so burst steps scaled with
        slots×max_len instead of staying weight-bound (S32 steps measured
        ~4× S8 on-chip; the repeat alone moves ~26 GB/step at
        S32×1024×7B). Same contraction per (kv-head, group) pair —
        token-identical outputs. Q heads are grouped HF-style: heads
        [g·G, (g+1)·G) share kv head g, matching repeat's interleaving."""
        cfg = self.config
        groups = cfg.num_heads // cfg.num_kv_heads
        b, tq, h, d = q.shape
        hkv = cfg.num_kv_heads
        qg = q.reshape(b, tq, hkv, groups, d)
        scores = jnp.einsum(
            "bqhgd,bkhd->bhgqk", qg.astype(jnp.float32),
            k.astype(jnp.float32)
        ) / np.sqrt(cfg.head_dim)
        if mask is not None:
            if mask.ndim == 4 and mask.shape[1] == h:
                mask = mask.reshape(
                    mask.shape[0], hkv, groups, *mask.shape[2:])
            else:  # head axis is 1 (every internal caller) → broadcast
                mask = mask[:, :, None]
            scores = jnp.where(mask, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v)
        return self.o_proj(out.reshape(b, tq, h * d))

    def __call__(self, x, positions):
        t = x.shape[1]
        q, k, v = self._qkv(x, positions)
        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        return self._attend(q, k, v, causal)

    def step(self, x_t, slot, rope_pos, valid, cache_k, cache_v):
        """x_t [B,1,D]; caches [B, max, Hkv, hd] (rope-applied). ``slot`` is
        the cache position, ``rope_pos`` [B] the rotary positions (they
        diverge after a bucketed prefill and differ per row on ragged
        batches), ``valid`` [B|1, max] masks live cache cols. With
        ``kv_cache_bits=8`` each cache is an (int8 values, per-token scales)
        pair — HBM holds half the bytes; dequant happens in registers."""
        cfg = self.config
        q, k, v = self._qkv(x_t, rope_pos[:, None])
        if cfg.kv_cache_bits == 8:
            k_q, k_s = cache_k
            v_q, v_s = cache_v
            kq_new, ks_new = _quant_kv(k)
            vq_new, vs_new = _quant_kv(v)
            k_q = jax.lax.dynamic_update_slice(k_q, kq_new, (0, slot, 0, 0))
            k_s = jax.lax.dynamic_update_slice(k_s, ks_new, (0, slot))
            v_q = jax.lax.dynamic_update_slice(v_q, vq_new, (0, slot, 0, 0))
            v_s = jax.lax.dynamic_update_slice(v_s, vs_new, (0, slot))
            out = self._attend(
                q, _dequant_kv(k_q, k_s, cfg.dtype), _dequant_kv(v_q, v_s, cfg.dtype),
                valid[:, None, None, :],
            )
            return out, (k_q, k_s), (v_q, v_s)
        cache_k = jax.lax.dynamic_update_slice(cache_k, k, (0, slot, 0, 0))
        cache_v = jax.lax.dynamic_update_slice(cache_v, v, (0, slot, 0, 0))
        out = self._attend(q, cache_k, cache_v, valid[:, None, None, :])
        return out, cache_k, cache_v

    def verify(self, x_s, slot, rope_start, valid_prefix, cache_k, cache_v):
        """Multi-token decode step for speculative verification: x_s
        [B, S, D] holds S consecutive candidate tokens written at cache
        slots [slot, slot+S); ``rope_start`` [B] is the rotary position of
        the first (per-row, ragged batches keep their own offsets);
        ``valid_prefix`` [B, max] masks live cache slots BEFORE the
        segment — intra-segment causal structure is added here. One weight
        read scores all S candidates, which is the whole point: decode is
        weight-HBM-bound, so verifying S drafts costs ~the same wall time
        as generating one token.

        ``slot`` is a scalar (shared frontier, B=1 path) or [B] (per-row
        frontiers — batched speculation writes each row's segment at its
        own cache offset via scatter)."""
        cfg = self.config
        b, s = x_s.shape[:2]
        positions = rope_start[:, None] + jnp.arange(s)[None, :]  # [B, S]
        q, k, v = self._qkv(x_s, positions)
        n_slots = (cache_k[0] if cfg.kv_cache_bits == 8 else cache_k).shape[1]
        iota = jnp.arange(n_slots)
        per_row = getattr(slot, "ndim", 0) == 1
        if per_row:
            seg = (iota[None, None, :] >= slot[:, None, None]) & (
                iota[None, None, :]
                <= slot[:, None, None] + jnp.arange(s)[None, :, None]
            )  # [B, S, max]
            mask = valid_prefix[:, None, None, :] | seg[:, None, :, :]
            rows = jnp.arange(b)[:, None]
            cols = slot[:, None] + jnp.arange(s)[None, :]  # [B, S]

            def upd(cache, new):  # [B, max, H, D] ← [B, S, H, D]
                return cache.at[rows, cols].set(new.astype(cache.dtype))

            def upd2(cache, new):  # [B, max] ← [B, S]
                return cache.at[rows, cols].set(new.astype(cache.dtype))
        else:
            seg = (iota[None, :] >= slot) & (
                iota[None, :] <= slot + jnp.arange(s)[:, None]
            )  # [S, max]
            mask = valid_prefix[:, None, None, :] | seg[None, None, :, :]

            def upd(cache, new):
                return jax.lax.dynamic_update_slice(
                    cache, new.astype(cache.dtype), (0, slot, 0, 0))

            def upd2(cache, new):
                return jax.lax.dynamic_update_slice(
                    cache, new.astype(cache.dtype), (0, slot))
        if cfg.kv_cache_bits == 8:
            k_q, k_s = cache_k
            v_q, v_s = cache_v
            kq_new, ks_new = _quant_kv(k)
            vq_new, vs_new = _quant_kv(v)
            k_q = upd(k_q, kq_new)
            k_s = upd2(k_s, ks_new)
            v_q = upd(v_q, vq_new)
            v_s = upd2(v_s, vs_new)
            out = self._attend(
                q, _dequant_kv(k_q, k_s, cfg.dtype),
                _dequant_kv(v_q, v_s, cfg.dtype), mask,
            )
            return out, (k_q, k_s), (v_q, v_s)
        cache_k = upd(cache_k, k)
        cache_v = upd(cache_v, v)
        out = self._attend(q, cache_k, cache_v, mask)
        return out, cache_k, cache_v

    def prefill(self, x, positions):
        """Full-sequence pass that also returns rope-applied k/v for the
        caches — the whole prompt costs one MXU matmul set instead of T
        sequential steps. Long prompts route through the Pallas flash
        kernel (blockwise online softmax, O(T) live memory) instead of the
        XLA full-matrix path."""
        b, t = x.shape[:2]
        q, k, v = self._qkv(x, positions)
        if _flash_prefill_enabled(t, self.config.head_dim):
            from ..ops.flash_attention import flash_attention

            out = flash_attention(
                q, k, v, causal=True,
                interpret=jax.default_backend() != "tpu",
            )
            return self.o_proj(out.reshape(b, t, -1)), k, v
        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        return self._attend(q, k, v, causal), k, v


class _Block(nn.Module):
    config: Qwen2Config

    def setup(self):
        cfg = self.config
        self.ln1 = nn.RMSNorm(epsilon=cfg.rms_eps, dtype=jnp.float32)
        self.attn = _Attention(cfg)
        self.ln2 = nn.RMSNorm(epsilon=cfg.rms_eps, dtype=jnp.float32)
        self.gate_proj = _dense(cfg, cfg.intermediate_size)
        self.up_proj = _dense(cfg, cfg.intermediate_size)
        self.down_proj = _dense(cfg, cfg.d_model)

    def _mlp(self, x):
        return self.down_proj(jax.nn.silu(self.gate_proj(x)) * self.up_proj(x))

    def __call__(self, x, positions):
        cfg = self.config
        x = x + self.attn(self.ln1(x).astype(cfg.dtype), positions)
        return x + self._mlp(self.ln2(x).astype(cfg.dtype))

    def step(self, x_t, slot, rope_pos, valid, cache_k, cache_v):
        cfg = self.config
        a, cache_k, cache_v = self.attn.step(
            self.ln1(x_t).astype(cfg.dtype), slot, rope_pos, valid,
            cache_k, cache_v,
        )
        x_t = x_t + a
        return x_t + self._mlp(self.ln2(x_t).astype(cfg.dtype)), cache_k, cache_v

    def verify(self, x_s, slot, rope_start, valid_prefix, cache_k, cache_v):
        cfg = self.config
        a, cache_k, cache_v = self.attn.verify(
            self.ln1(x_s).astype(cfg.dtype), slot, rope_start, valid_prefix,
            cache_k, cache_v,
        )
        x_s = x_s + a
        return x_s + self._mlp(self.ln2(x_s).astype(cfg.dtype)), cache_k, cache_v

    def prefill(self, x, positions):
        cfg = self.config
        a, k, v = self.attn.prefill(self.ln1(x).astype(cfg.dtype), positions)
        x = x + a
        return x + self._mlp(self.ln2(x).astype(cfg.dtype)), k, v


class Qwen2Decoder(nn.Module):
    config: Qwen2Config

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=cfg.dtype)
        self.layer = [_Block(cfg) for _ in range(cfg.num_layers)]
        self.final_norm = nn.RMSNorm(epsilon=cfg.rms_eps, dtype=jnp.float32)
        if not cfg.tie_embeddings:
            self.lm_head = _dense(cfg, cfg.vocab_size)

    def _logits(self, x):
        x = self.final_norm(x)
        if self.config.tie_embeddings:
            return x.astype(jnp.float32) @ self.embed_tokens.embedding.T.astype(jnp.float32)
        return self.lm_head(x.astype(self.config.dtype)).astype(jnp.float32)

    def __call__(self, tokens):  # [B, T] → [B, T, V]
        positions = jnp.arange(tokens.shape[1])
        x = self.embed_tokens(tokens)
        for block in self.layer:
            x = block(x, positions)
        return self._logits(x)

    def step(self, token_t, slot, rope_pos, valid, caches):
        """token_t [B,1] → (logits [B,V], caches)."""
        x = self.embed_tokens(token_t)
        new_caches = []
        for block, (ck, cv) in zip(self.layer, caches):
            x, ck, cv = block.step(x, slot, rope_pos, valid, ck, cv)
            new_caches.append((ck, cv))
        return self._logits(x)[:, 0], new_caches

    def verify(self, tokens_s, slot, rope_start, valid_prefix, caches):
        """tokens_s [B, S] (newest accepted token + S-1 drafts) →
        (logits [B, S, V], caches). One forward scores every draft."""
        x = self.embed_tokens(tokens_s)
        new_caches = []
        for block, (ck, cv) in zip(self.layer, caches):
            x, ck, cv = block.verify(x, slot, rope_start, valid_prefix, ck, cv)
            new_caches.append((ck, cv))
        return self._logits(x), new_caches

    def verify_hidden(self, tokens_s, slot, rope_start, valid_prefix, caches):
        """``verify`` returning PRE-norm hidden states [B, S, D] instead of
        logits — the suffix-prefill path (prefix KV cache reuse,
        ``serving/engine.py``) only reads logits at ONE position, and
        materializing [B, S, V] f32 at S=512 costs ~0.3 GB + a wasted
        [B·S, D, V] matmul. Callers slice the row they need and put it
        through ``logits_at``."""
        x = self.embed_tokens(tokens_s)
        new_caches = []
        for block, (ck, cv) in zip(self.layer, caches):
            x, ck, cv = block.verify(x, slot, rope_start, valid_prefix, ck, cv)
            new_caches.append((ck, cv))
        return x, new_caches

    def prefill(self, tokens):
        """tokens [B, P] → (logits [B, P, V], [(k, v) each [B, P, Hkv, hd]]).
        One full forward fills every cache slot the prompt needs — the prompt
        costs one batched MXU pass instead of P sequential decode steps."""
        x, kvs = self.prefill_hidden(tokens)
        return self._logits(x), kvs

    def prefill_hidden(self, tokens):
        """Like ``prefill`` but returns PRE-norm hidden states [B, P, D]
        instead of logits. Generation only ever reads the logits of ONE
        position per row (the last real prompt token); materializing the
        full [B, P, V] f32 logits costs 2.5 GB at (8, 512, 152064) — at 7B
        scale that transient alone breaks the HBM fit — and a [B·P, D, V]
        matmul of wasted FLOPs. Callers gather the row they need and put
        it through ``logits_at``."""
        positions = jnp.arange(tokens.shape[1])
        x = self.embed_tokens(tokens)
        kvs = []
        for block in self.layer:
            x, k, v = block.prefill(x, positions)
            kvs.append((k, v))
        return x, kvs

    def logits_at(self, x):
        """Pre-norm hidden states [B, T, D] → logits [B, T, V] (the final
        norm + vocab projection factored out of ``prefill``)."""
        return self._logits(x)


def _init_decode_caches(cfg: Qwen2Config, kvs, b: int, max_tokens: int):
    """Prefill k/v (list of [B, P, Hkv, hd] pairs) → full-length decode
    caches [B, max_tokens, ...] with the prompt slots filled."""
    caches = []
    for k, v in kvs:
        if cfg.kv_cache_bits == 8:
            entry = []
            for full in (k, v):
                quant, scales = _quant_kv(full)
                cq = jnp.zeros(
                    (b, max_tokens, cfg.num_kv_heads, cfg.head_dim), jnp.int8
                )
                cs = jnp.zeros((b, max_tokens), jnp.float32)
                entry.append((
                    jax.lax.dynamic_update_slice(cq, quant, (0, 0, 0, 0)),
                    jax.lax.dynamic_update_slice(cs, scales, (0, 0)),
                ))
            caches.append(tuple(entry))
            continue
        ck = jnp.zeros((b, max_tokens, cfg.num_kv_heads, cfg.head_dim), cfg.dtype)
        cv = jnp.zeros_like(ck)
        caches.append((
            jax.lax.dynamic_update_slice(ck, k.astype(cfg.dtype), (0, 0, 0, 0)),
            jax.lax.dynamic_update_slice(cv, v.astype(cfg.dtype), (0, 0, 0, 0)),
        ))
    return caches


def _pld_match(tokens, t, plen, p_bucket, ngram):
    """Candidate-window match mask for prompt-lookup drafting: position i
    matches when tokens[i : i+ngram] equals the trailing ngram
    tokens[t-ngram+1 : t+1], the window is entirely real (prompt
    [0, plen) or generated [p_bucket, t]; never the bucket-padding gap),
    and its continuation starts at or before t (excludes the self-match).
    Cheap enough to evaluate inside a while_loop *condition*.

    ``t`` is the generation frontier: a scalar (shared, the B=1 nested-loop
    path) or [B] (per-row frontiers, the batched path — rows diverge as
    they accept different draft lengths)."""
    b, length = tokens.shape
    iota = jnp.arange(length)
    if getattr(t, "ndim", 0) == 1:
        real = (iota[None, :] < plen[:, None]) | (
            (iota[None, :] >= p_bucket) & (iota[None, :] <= t[:, None])
        )
        match = iota[None, :] <= (t[:, None] - ngram)
        for j in range(ngram):
            tgt = jnp.take_along_axis(
                tokens, (t - ngram + 1 + j)[:, None], axis=1
            )  # [B, 1]
            match = match & (jnp.roll(tokens, -j, axis=1) == tgt) \
                & jnp.roll(real, -j, axis=1)
        return match, real
    real = (iota[None, :] < plen[:, None]) | (
        (iota >= p_bucket) & (iota <= t)
    )[None, :]
    match = (iota <= t - ngram)[None, :]
    for j in range(ngram):
        tgt = jax.lax.dynamic_slice(tokens, (0, t - ngram + 1 + j), (b, 1))
        match = match & (jnp.roll(tokens, -j, axis=1) == tgt) \
            & jnp.roll(real, -j, axis=1)
    return match, real


def _pld_draft(tokens, t, plen, p_bucket, draft_k, ngram):
    """Prompt-lookup drafting: propose the ``draft_k`` tokens that followed
    the most recent earlier occurrence of the last ``ngram`` tokens.

    RAG answers copy heavily from the retrieved context (citations, spec
    values, entity names), so the prompt itself is a free draft model —
    no second network, no extra weights in HBM. tokens [B, L] is the
    generation buffer (prompt in [0, plen), bucket-padding gap in
    [plen, p_bucket), generated in [p_bucket, t]); returns
    (drafts [B, draft_k], has_match [B]).
    """
    b, length = tokens.shape
    iota = jnp.arange(length)
    match, real = _pld_match(tokens, t, plen, p_bucket, ngram)
    # two-tier choice: prefer the most recent match whose FULL draft_k
    # continuation is real (a match just behind the frontier can only
    # contribute the tokens generated so far); otherwise the most recent
    # match at all
    full = match & (iota < length - ngram - draft_k + 1)[None, :]
    for j in range(draft_k):
        full = full & jnp.roll(real, -(ngram + j), axis=1)
    score = match * (iota + 1)[None, :] + full * (iota + 1 + length)[None, :]
    idx = jnp.argmax(score, axis=1)
    pos = jnp.minimum(idx[:, None] + ngram + jnp.arange(draft_k)[None, :],
                      length - 1)
    return jnp.take_along_axis(tokens, pos, axis=1), jnp.any(match, axis=1)


def _apply_repetition_penalty(logits, seen, penalty):
    """CTRL-style repetition penalty over tokens already in the sequence
    (the reference passes repetition_penalty≈1.1 to HF generate,
    mode_config.py:28-142): positive logits of seen tokens divide by the
    penalty, negative multiply."""
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def _sample_token(logits, key, temperature, top_p):
    """Temperature + nucleus sampling; temperature<=0 → greedy."""

    def greedy(_):
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def sample(_):
        scaled = logits / jnp.maximum(temperature, 1e-5)
        sort_idx = jnp.argsort(-scaled, axis=-1)
        sorted_logits = jnp.take_along_axis(scaled, sort_idx, axis=-1)
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix whose mass ≥ top_p (always keep rank 0)
        keep = (cum - probs) < top_p
        filtered = jnp.where(keep, sorted_logits, -1e30)
        choice = jax.random.categorical(key, filtered, axis=-1)
        return jnp.take_along_axis(
            sort_idx, choice[:, None], axis=-1
        )[:, 0].astype(jnp.int32)

    return jax.lax.cond(temperature > 0, sample, greedy, operand=None)


class Qwen2Model:
    """Weights + jitted whole-loop generation."""

    def __init__(self, config: Optional[Qwen2Config] = None, weights_path: str = "",
                 seed: int = 0):
        self.config = config or Qwen2Config()
        self.decoder = Qwen2Decoder(self.config)
        params = load_hf_qwen2(self.config, weights_path) if weights_path else None
        self.pretrained = params is not None
        if params is None:
            key = jax.random.PRNGKey(seed)
            params = self.decoder.init(key, jnp.zeros((1, 4), jnp.int32))["params"]
        self.params = params

        def _generate(params, prompt, plen, max_tokens, key, temperature,
                      top_p, penalty):
            """prompt [B, P] (eos-padded past each row's ``plen``; P is a
            static bucket), plen [B]: per-row prompt lengths (ragged batches
            supported). One prefill forward fills cache slots [0, P), then
            the decode loop runs from slot P with per-row rope positions
            continuing at ``plen`` (cache slot and rotary position diverge
            across each row's padding gap; the validity mask hides pad
            slots)."""
            cfg = self.config
            dparams = {"params": params}
            b, p_bucket = prompt.shape
            plen = plen.astype(jnp.int32)

            hidden, kvs = self.decoder.apply(
                dparams, prompt, method="prefill_hidden")
            caches = _init_decode_caches(cfg, kvs, b, max_tokens)
            tokens = jnp.full((b, max_tokens), cfg.eos_token, jnp.int32)
            tokens = jax.lax.dynamic_update_slice(tokens, prompt, (0, 0))

            vocab = cfg.vocab_size
            # tokens already in the (real) prompt, for repetition penalty
            rows = jnp.arange(b)[:, None]
            prompt_mask = jnp.arange(p_bucket)[None, :] < plen[:, None]
            seen = jnp.zeros((b, vocab), bool).at[rows, prompt].max(prompt_mask)
            # logits ONLY at each row's last real prompt token: the full
            # [B, P, V] f32 tensor is a multi-GB transient at 7B scale
            hidden_last = jnp.take_along_axis(
                hidden, (plen - 1)[:, None, None], axis=1
            )
            logits0 = self.decoder.apply(
                dparams, hidden_last, method="logits_at")[:, 0]
            logits0 = _apply_repetition_penalty(logits0, seen, penalty)
            key, sub = jax.random.split(jnp.asarray(key))
            tok0 = _sample_token(logits0, sub, temperature, top_p)
            seen = seen.at[jnp.arange(b), tok0].set(True)
            tokens = jax.lax.dynamic_update_slice(tokens, tok0[:, None], (0, p_bucket))
            finished = tok0 == cfg.eos_token
            iota = jnp.arange(max_tokens)

            def cond(state):
                t, _tokens, _caches, _key, finished, _seen = state
                return (t < max_tokens - 1) & ~jnp.all(finished)

            def body(state):
                t, tokens, caches, key, finished, seen = state
                token_t = jax.lax.dynamic_slice(tokens, (0, t), (b, 1))
                rope_pos = plen + (t - p_bucket)  # [B]
                valid = (iota[None, :] < plen[:, None]) | (
                    (iota >= p_bucket) & (iota <= t)
                )[None, :]
                logits, caches = self.decoder.apply(
                    dparams, token_t, t, rope_pos, valid, caches, method="step"
                )
                logits = _apply_repetition_penalty(logits, seen, penalty)
                key, sub = jax.random.split(key)
                picked = _sample_token(logits, sub, temperature, top_p)
                new = jnp.where(finished, cfg.eos_token, picked)
                tokens = jax.lax.dynamic_update_slice(tokens, new[:, None], (0, t + 1))
                seen = seen.at[jnp.arange(b), new].set(True)
                finished = finished | (new == cfg.eos_token)
                return t + 1, tokens, caches, key, finished, seen

            _, tokens, _, _, _, _ = jax.lax.while_loop(
                cond, body, (p_bucket, tokens, caches, key, finished, seen)
            )
            return tokens

        self._generate = jax.jit(_generate, static_argnames=("max_tokens",))

        def _generate_spec(params, prompt, plen, max_tokens, key,
                           temperature, top_p, penalty):
            """Prompt-lookup speculative decoding (B=1): drafts come
            from n-gram matches against the prompt + generated prefix
            (`_pld_draft`); ONE `verify` forward scores DRAFT_K drafts, and
            the accepted prefix plus the model's own correction token land
            in one loop iteration. Token-identical to `_generate` at
            temperature 0 (repetition penalty applied sequentially during
            acceptance, exactly as the step loop would). With sampling
            (temperature > 0) each position's token is DRAWN from the
            verify logits in prefix order — the conditional distribution is
            exact while the accepted prefix equals the draft, so the output
            distribution matches plain sampling; acceptance just becomes
            stochastic. Decode is weight-HBM-bound, so each accepted draft
            is a nearly-free token; citation-heavy RAG answers accept a
            lot. Counterpart of the reference's HF assisted-generation knob
            (src/core/query/llm/local_llm.py:457-466 hot loop)."""
            cfg = self.config
            draft_k, ngram = self.DRAFT_K, self.PLD_NGRAM
            dparams = {"params": params}
            b, p_bucket = prompt.shape
            plen = plen.astype(jnp.int32)

            # +draft_k+1 scratch slots past max_tokens: the last spec
            # segment may overshoot the output window; overshoot lands in
            # scratch and is sliced off, so NO single-step tail loop is
            # needed and every decode forward scores a full segment
            total = max_tokens + draft_k + 1
            hidden, kvs = self.decoder.apply(
                dparams, prompt, method="prefill_hidden")
            caches = _init_decode_caches(cfg, kvs, b, total)
            tokens = jnp.full((b, total), cfg.eos_token, jnp.int32)
            tokens = jax.lax.dynamic_update_slice(tokens, prompt, (0, 0))

            vocab = cfg.vocab_size
            rows = jnp.arange(b)[:, None]
            prompt_mask = jnp.arange(p_bucket)[None, :] < plen[:, None]
            seen = jnp.zeros((b, vocab), bool).at[rows, prompt].max(prompt_mask)
            hidden_last = jnp.take_along_axis(
                hidden, (plen - 1)[:, None, None], axis=1
            )
            logits0 = self.decoder.apply(
                dparams, hidden_last, method="logits_at")[:, 0]
            logits0 = _apply_repetition_penalty(logits0, seen, penalty)
            key, sub = jax.random.split(jnp.asarray(key))
            tok0 = _sample_token(logits0, sub, temperature, top_p)
            seen = seen.at[jnp.arange(b), tok0].set(True)
            tokens = jax.lax.dynamic_update_slice(tokens, tok0[:, None], (0, p_bucket))
            finished = tok0 == cfg.eos_token
            iota = jnp.arange(total)

            def live(state):
                t, _tokens, _caches, finished, _seen, _key, _n = state
                return (t < max_tokens - 1) & ~jnp.all(finished)

            # nested loops instead of a lax.cond on the hot path: a cond
            # boundary forces the whole KV-cache tree through branch
            # operands every iteration (no in-place aliasing), which costs
            # more than the forward itself. The INNER loop runs plain
            # single-token steps while no n-gram match exists (the match
            # check lives in the loop condition, ~O(L) elementwise); the
            # OUTER body then verifies drafts in one K+1-wide forward.
            def step_cond(state):
                t, tokens, *_ = state
                match, _ = _pld_match(tokens, t, plen, p_bucket, ngram)
                return live(state) & ~jnp.any(match)

            def step_body(state):
                t, tokens, caches, finished, seen, key, n_fwd = state
                token_t = jax.lax.dynamic_slice(tokens, (0, t), (b, 1))
                rope_pos = plen + (t - p_bucket)
                valid = (iota[None, :] < plen[:, None]) | (
                    (iota >= p_bucket) & (iota <= t)
                )[None, :]
                logits, caches = self.decoder.apply(
                    dparams, token_t, t, rope_pos, valid, caches,
                    method="step",
                )
                logits = _apply_repetition_penalty(logits, seen, penalty)
                key, sub = jax.random.split(key)
                picked = _sample_token(logits, sub, temperature, top_p)
                new = jnp.where(finished, cfg.eos_token, picked)
                tokens = jax.lax.dynamic_update_slice(
                    tokens, new[:, None], (0, t + 1))
                seen = seen.at[jnp.arange(b), new].set(True)
                finished = finished | (new == cfg.eos_token)
                return t + 1, tokens, caches, finished, seen, key, n_fwd + 1

            def outer_body(state):
                state = jax.lax.while_loop(step_cond, step_body, state)
                t, tokens, caches, finished, seen, key, n_fwd = state
                key, acc_key = jax.random.split(key)
                # a match exists here (or the loop is ending: then the
                # acceptance pass emits nothing / into scratch and `live`
                # exits right after — no wasted semantics, one wasted
                # forward at most)
                drafts, _ = _pld_draft(
                    tokens, t, plen, p_bucket, draft_k, ngram
                )
                rope_start = plen + (t - p_bucket)
                valid_prefix = (iota[None, :] < plen[:, None]) | (
                    (iota >= p_bucket) & (iota < t)
                )[None, :]
                cur = jax.lax.dynamic_slice(tokens, (0, t), (b, 1))
                seg = jnp.concatenate([cur, drafts], axis=1)  # [B, K+1]
                logits, caches = self.decoder.apply(
                    dparams, seg, t, rope_start, valid_prefix, caches,
                    method="verify",
                )  # [B, K+1, V]
                # pad drafts so position draft_k (the bonus slot) never
                # extends the accepted run
                drafts_pad = jnp.concatenate(
                    [drafts, jnp.full((b, 1), -1, jnp.int32)], axis=1
                )

                def acc_body(j, acc):
                    accepting, seen, tokens, finished, count = acc
                    lj = jax.lax.dynamic_index_in_dim(
                        logits, j, 1, keepdims=False)
                    lj = _apply_repetition_penalty(lj, seen, penalty)
                    g = _sample_token(
                        lj, jax.random.fold_in(acc_key, j), temperature, top_p)
                    emit = accepting & ~finished
                    tok = jnp.where(finished, cfg.eos_token, g)
                    old = jax.lax.dynamic_slice(
                        tokens, (0, t + 1 + j), (b, 1))
                    newcol = jnp.where(emit[:, None], tok[:, None], old)
                    tokens = jax.lax.dynamic_update_slice(
                        tokens, newcol, (0, t + 1 + j)
                    )
                    seen = seen.at[jnp.arange(b), tok].max(emit)
                    count = count + emit.astype(jnp.int32)
                    finished = finished | (emit & (tok == cfg.eos_token))
                    dj = jax.lax.dynamic_index_in_dim(
                        drafts_pad, j, 1, keepdims=False
                    )
                    accepting = accepting & (g == dj)
                    return accepting, seen, tokens, finished, count

                _, seen, tokens, finished, count = jax.lax.fori_loop(
                    0, draft_k + 1, acc_body,
                    (jnp.ones((b,), bool), seen, tokens, finished,
                     jnp.zeros((b,), jnp.int32)),
                )
                return (t + count[0], tokens, caches, finished, seen, key,
                        n_fwd + 1)

            _, tokens, _, _, _, _, n_fwd = jax.lax.while_loop(
                live, outer_body,
                (p_bucket, tokens, caches, finished, seen, key, jnp.int32(0)),
            )
            return tokens[:, :max_tokens], n_fwd

        self._generate_spec = jax.jit(
            _generate_spec, static_argnames=("max_tokens",)
        )

        def _generate_spec_batch(params, prompt, plen, max_tokens, key,
                                 temperature, top_p, penalty):
            """Batched prompt-lookup speculative decoding (any B, ragged
            plen): per-row n-gram drafts, ONE (K+1)-wide verify forward per
            iteration, per-row accept lengths advancing per-row frontiers.

            Unlike the B=1 path there is no inner plain-step loop: decode
            is weight-HBM-bound, so a (K+1)-wide verify costs ~the same
            wall time as a 1-wide step — rows whose drafts miss simply
            advance by the one guaranteed correction token while matching
            rows advance by up to K+1. Frontiers diverge across rows, so
            cache segments and token columns are written by scatter at
            per-row offsets (the `verify` per-row slot path). Serving runs
            facts-mode at temperature 0 with batch 8, which makes this the
            direct QPS lever (reference hot loop local_llm.py:457-466 is
            b1-only HF generate)."""
            cfg = self.config
            draft_k, ngram = self.DRAFT_K, self.PLD_NGRAM
            dparams = {"params": params}
            b, p_bucket = prompt.shape
            plen = plen.astype(jnp.int32)
            rows = jnp.arange(b)

            total = max_tokens + draft_k + 1
            hidden, kvs = self.decoder.apply(
                dparams, prompt, method="prefill_hidden")
            caches = _init_decode_caches(cfg, kvs, b, total)
            tokens = jnp.full((b, total), cfg.eos_token, jnp.int32)
            tokens = jax.lax.dynamic_update_slice(tokens, prompt, (0, 0))

            vocab = cfg.vocab_size
            prompt_mask = jnp.arange(p_bucket)[None, :] < plen[:, None]
            seen = jnp.zeros((b, vocab), bool).at[
                rows[:, None], prompt].max(prompt_mask)
            hidden_last = jnp.take_along_axis(
                hidden, (plen - 1)[:, None, None], axis=1
            )
            logits0 = self.decoder.apply(
                dparams, hidden_last, method="logits_at")[:, 0]
            logits0 = _apply_repetition_penalty(logits0, seen, penalty)
            key, sub = jax.random.split(jnp.asarray(key))
            tok0 = _sample_token(logits0, sub, temperature, top_p)
            seen = seen.at[rows, tok0].set(True)
            tokens = jax.lax.dynamic_update_slice(
                tokens, tok0[:, None], (0, p_bucket))
            finished = (tok0 == cfg.eos_token) | (max_tokens - 1 <= p_bucket)
            iota = jnp.arange(total)

            def live(state):
                _t, _tokens, _caches, finished, _seen, _key, _n = state
                return ~jnp.all(finished)

            def body(state):
                t, tokens, caches, finished, seen, key, n_fwd = state
                key, acc_key = jax.random.split(key)
                drafts, _ = _pld_draft(
                    tokens, t, plen, p_bucket, draft_k, ngram
                )
                rope_start = plen + (t - p_bucket)  # [B]
                valid_prefix = (iota[None, :] < plen[:, None]) | (
                    (iota[None, :] >= p_bucket) & (iota[None, :] < t[:, None])
                )
                cur = jnp.take_along_axis(tokens, t[:, None], axis=1)
                seg = jnp.concatenate([cur, drafts], axis=1)  # [B, K+1]
                logits, caches = self.decoder.apply(
                    dparams, seg, t, rope_start, valid_prefix, caches,
                    method="verify",
                )  # [B, K+1, V]
                drafts_pad = jnp.concatenate(
                    [drafts, jnp.full((b, 1), -1, jnp.int32)], axis=1
                )

                def acc_body(j, acc):
                    accepting, seen, tokens, finished, count = acc
                    lj = jax.lax.dynamic_index_in_dim(
                        logits, j, 1, keepdims=False)
                    lj = _apply_repetition_penalty(lj, seen, penalty)
                    g = _sample_token(
                        lj, jax.random.fold_in(acc_key, j), temperature,
                        top_p)
                    emit = accepting & ~finished
                    tok = jnp.where(finished, cfg.eos_token, g)
                    col = t + 1 + j  # [B]
                    old = jnp.take_along_axis(
                        tokens, col[:, None], axis=1)[:, 0]
                    tokens = tokens.at[rows, col].set(
                        jnp.where(emit, tok, old))
                    seen = seen.at[rows, tok].max(emit)
                    count = count + emit.astype(jnp.int32)
                    finished = finished | (emit & (tok == cfg.eos_token))
                    dj = jax.lax.dynamic_index_in_dim(
                        drafts_pad, j, 1, keepdims=False)
                    accepting = accepting & (g == dj)
                    return accepting, seen, tokens, finished, count

                _, seen, tokens, finished, count = jax.lax.fori_loop(
                    0, draft_k + 1, acc_body,
                    (jnp.ones((b,), bool), seen, tokens, finished,
                     jnp.zeros((b,), jnp.int32)),
                )
                t = t + count
                finished = finished | (t >= max_tokens - 1)
                return t, tokens, caches, finished, seen, key, n_fwd + 1

            t0v = jnp.full((b,), p_bucket, jnp.int32)
            _, tokens, _, _, _, _, n_fwd = jax.lax.while_loop(
                live, body,
                (t0v, tokens, caches, finished, seen, key, jnp.int32(0)),
            )
            return tokens[:, :max_tokens], n_fwd

        self._generate_spec_batch = jax.jit(
            _generate_spec_batch, static_argnames=("max_tokens",)
        )
        # set by parallel.tp_llm.shard_qwen2_model(dp_axis=...): batch rows
        # split over the dp mesh axis (weights already tp-sharded)
        self._batch_sharding = None
        self._dp_rows = 1

    #: prompt lengths round up to this bucket so serving traffic with varied
    #: prompt sizes reuses a small set of compiled prefill shapes
    PROMPT_BUCKET = 64
    #: speculative decoding: drafts per verify forward / n-gram match width
    DRAFT_K = 7
    PLD_NGRAM = 2

    def generate_tokens_spec(self, prompt_ids, max_new_tokens: int = 256,
                             temperature: float = 0.0, top_p: float = 0.85,
                             repetition_penalty: float = 1.0, seed: int = 0):
        """Prompt-lookup speculative decoding. At temperature 0, matches
        ``generate_tokens(..., temperature=0.0)`` token-for-token up to
        bf16 argmax near-ties (logit gaps below bf16 resolution can break
        differently between the 1-wide and K-wide attention paths; either
        pick satisfies the teacher-forcing oracle). With sampling the
        OUTPUT DISTRIBUTION matches plain sampling (each position draws
        from its exact conditional; acceptance is just stochastic), though
        the realized tokens differ from the step loop's for a given seed.
        Emits up to ``DRAFT_K + 1`` tokens per forward when the answer
        copies spans from the prompt (citation-heavy RAG answers do).
        B=1 runs the nested-loop path (plain steps while no n-gram match);
        B>1 runs the batched path (one (K+1)-wide verify per iteration,
        per-row accept lengths — the reference's llm is b1-only,
        src/config/settings.py:33-36, so this is beyond-parity serving
        throughput). Returns ``(ids [B, plen + n_new], n_forwards)``
        where n_forwards counts decode forwards (excl. prefill)."""
        cfg = self.config
        prompt_ids = np.asarray(prompt_ids, np.int32)
        if prompt_ids.ndim == 1:
            prompt_ids = prompt_ids[None, :]
        b, plen = prompt_ids.shape
        if plen >= cfg.max_positions:
            prompt_ids = prompt_ids[:, -(cfg.max_positions - 1):]
            plen = prompt_ids.shape[1]
        n_new = max(1, min(max_new_tokens, cfg.max_positions - plen))
        bucket = min(-(-plen // self.PROMPT_BUCKET) * self.PROMPT_BUCKET,
                     cfg.max_positions)
        bucket = max(bucket, plen)
        padded = np.full((b, bucket), cfg.eos_token, np.int32)
        padded[:, :plen] = prompt_ids
        fn = self._generate_spec if b == 1 else self._generate_spec_batch
        out, n_fwd = fn(
            self.params, self._place_prompt(padded),
            jnp.full((b,), plen, jnp.int32),
            bucket + n_new, jax.random.PRNGKey(seed),
            jnp.float32(temperature), jnp.float32(top_p),
            jnp.float32(repetition_penalty),
        )
        out = np.asarray(out)
        return (np.concatenate([out[:, :plen], out[:, bucket:]], axis=1),
                int(n_fwd))

    def generate_ragged_spec(self, prompts, max_new_tokens: int = 256,
                             temperature: float = 0.0, top_p: float = 0.85,
                             repetition_penalty: float = 1.0,
                             seed: int = 0):
        """Batched speculative decoding over ragged prompts (per-row plen,
        per-row frontiers — the serving batch path with the spec speedup).
        → (list of [plen_i + n_new] id arrays, n_forwards)."""
        cfg = self.config
        prompts = [np.asarray(p, np.int32)[-(cfg.max_positions - 1):]
                   for p in prompts]
        lengths = np.array([len(p) for p in prompts], np.int32)
        b = len(prompts)
        longest = int(lengths.max())
        n_new = max(1, min(max_new_tokens, cfg.max_positions - longest))
        bucket = min(-(-longest // self.PROMPT_BUCKET) * self.PROMPT_BUCKET,
                     cfg.max_positions)
        bucket = max(bucket, longest)
        padded = np.full((b, bucket), cfg.eos_token, np.int32)
        for i, p in enumerate(prompts):
            padded[i, : len(p)] = p
        fn = self._generate_spec if b == 1 else self._generate_spec_batch
        out, n_fwd = fn(
            self.params, self._place_prompt(padded), jnp.asarray(lengths),
            bucket + n_new, jax.random.PRNGKey(seed),
            jnp.float32(temperature), jnp.float32(top_p),
            jnp.float32(repetition_penalty),
        )
        out = np.asarray(out)
        return ([np.concatenate([prompts[i], out[i, bucket:]])
                 for i in range(b)], int(n_fwd))

    def generate_tokens(self, prompt_ids, max_new_tokens: int = 256,
                        temperature: float = 0.0, top_p: float = 0.85,
                        repetition_penalty: float = 1.0,
                        seed: int = 0) -> np.ndarray:
        """prompt_ids: [B, L] or [L] int array → [B, L + n_new] ids."""
        cfg = self.config
        prompt_ids = np.asarray(prompt_ids, np.int32)
        if prompt_ids.ndim == 1:
            prompt_ids = prompt_ids[None, :]
        b, plen = prompt_ids.shape
        if plen >= cfg.max_positions:
            prompt_ids = prompt_ids[:, -(cfg.max_positions - 1):]
            plen = prompt_ids.shape[1]
        n_new = max(1, min(max_new_tokens, cfg.max_positions - plen))
        bucket = min(-(-plen // self.PROMPT_BUCKET) * self.PROMPT_BUCKET,
                     cfg.max_positions)
        bucket = max(bucket, plen)
        padded = np.full((b, bucket), cfg.eos_token, np.int32)
        padded[:, :plen] = prompt_ids
        out = np.asarray(self._generate(
            self.params, self._place_prompt(padded), jnp.full((b,), plen, jnp.int32),
            bucket + n_new, jax.random.PRNGKey(seed),
            jnp.float32(temperature), jnp.float32(top_p),
            jnp.float32(repetition_penalty),
        ))
        # splice out the bucket-padding gap between prompt and generation
        return np.concatenate([out[:, :plen], out[:, bucket:]], axis=1)

    def _place_prompt(self, padded: np.ndarray):
        arr = jnp.asarray(padded)
        if self._batch_sharding is not None and padded.shape[0] % self._dp_rows == 0:
            return jax.device_put(arr, self._batch_sharding)
        return arr

    def generate_ragged(self, prompts, max_new_tokens: int = 256,
                        temperature: float = 0.0, top_p: float = 0.85,
                        repetition_penalty: float = 1.0,
                        seed: int = 0) -> list:
        """Batched generation over prompts of different lengths (one prefill
        + one shared decode loop for the whole batch; per-row rope offsets).
        → list of [plen_i + n_new] id arrays."""
        cfg = self.config
        prompts = [np.asarray(p, np.int32)[-(cfg.max_positions - 1):]
                   for p in prompts]
        lengths = np.array([len(p) for p in prompts], np.int32)
        b = len(prompts)
        longest = int(lengths.max())
        n_new = max(1, min(max_new_tokens, cfg.max_positions - longest))
        bucket = min(-(-longest // self.PROMPT_BUCKET) * self.PROMPT_BUCKET,
                     cfg.max_positions)
        bucket = max(bucket, longest)
        padded = np.full((b, bucket), cfg.eos_token, np.int32)
        for i, p in enumerate(prompts):
            padded[i, : len(p)] = p
        out = np.asarray(self._generate(
            self.params, self._place_prompt(padded), jnp.asarray(lengths),
            bucket + n_new, jax.random.PRNGKey(seed),
            jnp.float32(temperature), jnp.float32(top_p),
            jnp.float32(repetition_penalty),
        ))
        return [np.concatenate([prompts[i], out[i, bucket:]])
                for i in range(b)]


# --------------------------------------------------------------------------
# HF checkpoint loading (Qwen2ForCausalLM naming)
# --------------------------------------------------------------------------

def _qwen2_key_map(cfg: Qwen2Config) -> Dict[str, Tuple[str, ...]]:
    m: Dict[str, Tuple[str, ...]] = {
        "model.embed_tokens.weight": ("embed_tokens", "embedding"),
        "model.norm.weight": ("final_norm", "scale"),
    }
    if not cfg.tie_embeddings:
        m["lm_head.weight"] = ("lm_head", "kernel")
    for i in range(cfg.num_layers):
        hf = f"model.layers.{i}"
        fx = f"layer_{i}"
        m[f"{hf}.input_layernorm.weight"] = (fx, "ln1", "scale")
        m[f"{hf}.post_attention_layernorm.weight"] = (fx, "ln2", "scale")
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            m[f"{hf}.self_attn.{proj}.weight"] = (fx, "attn", proj, "kernel")
            if proj != "o_proj":
                m[f"{hf}.self_attn.{proj}.bias"] = (fx, "attn", proj, "bias")
        for proj in ("gate_proj", "up_proj", "down_proj"):
            m[f"{hf}.mlp.{proj}.weight"] = (fx, proj, "kernel")
    return m


def load_hf_qwen2(config: Qwen2Config, path: str) -> Optional[Dict]:
    ckpt_dir = Path(path)
    files = sorted(ckpt_dir.glob("*.safetensors")) if ckpt_dir.exists() else []
    if not files:
        return None
    from safetensors.numpy import load_file

    state: Dict[str, np.ndarray] = {}
    for f in files:
        state.update(load_file(str(f)))
    mapping = _qwen2_key_map(config)

    params: Dict = {}

    def put(dest: Tuple[str, ...], value, dtype) -> None:
        node = params
        for part in dest[:-1]:
            node = node.setdefault(part, {})
        node[dest[-1]] = jnp.asarray(value, dtype)

    hd = config.head_dim
    bias_dims = {"q_proj": config.num_heads * hd,
                 "k_proj": config.num_kv_heads * hd,
                 "v_proj": config.num_kv_heads * hd}
    # llama-family checkpoints ship no attention biases at all
    # (attention_bias=false) — zero bias is the same math, so the one
    # decoder serves both namings. All-or-nothing: a qwen2 export missing
    # only SOME bias tensors is a corrupt/partial download and must fail
    # loudly (return None → caller falls back), not load quietly degraded.
    bias_keys = [k for k in mapping if k.endswith(".bias")]
    fill_biases = all(k not in state for k in bias_keys)
    for hf_key, dest in mapping.items():
        if hf_key not in state:
            if hf_key == "lm_head.weight":
                continue  # some exports tie even when config says otherwise
            if hf_key.endswith(".bias") and fill_biases:
                put(dest, np.zeros(bias_dims[dest[-2]], np.float32),
                    config.dtype)
                continue
            return None
        value = state[hf_key]
        if dest[-1] == "kernel":
            value = np.asarray(value, np.float32).T  # torch [out,in] → flax [in,out]
            if config.weight_bits in (4, 8):
                q, scale = quantize_kernel(value, bits=config.weight_bits)
                put(dest[:-1] + ("kernel_q",), q, q.dtype)
                put(dest[:-1] + ("scale",), scale, jnp.float32)
                continue
        put(dest, value, config.dtype)
    return params


def quantize_qwen2_params(params: Dict, config: Qwen2Config) -> Dict:
    """bf16/f32 params tree → the weight-only quantized tree QuantDense
    expects at ``config.weight_bits`` (train or load full precision, serve
    quantized)."""

    def walk(tree):
        out = {}
        for key, value in tree.items():
            if isinstance(value, dict):
                if "kernel" in value and key != "embed_tokens":
                    q, scale = quantize_kernel(np.asarray(value["kernel"], np.float32),
                                               bits=config.weight_bits)
                    leaf = {"kernel_q": jnp.asarray(q), "scale": jnp.asarray(scale)}
                    if "bias" in value:
                        leaf["bias"] = jnp.asarray(value["bias"], config.dtype)
                    out[key] = leaf
                else:
                    out[key] = walk(value)
            else:
                out[key] = value
        return out

    return walk(params)
