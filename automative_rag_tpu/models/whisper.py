"""Whisper-architecture speech recognition in Flax (TPU-native ASR).

Replaces the reference's faster-whisper/CTranslate2 GPU transcription
(``video_transcriber.py:300-332``) with a JAX encoder-decoder that runs the
entire ASR pipeline on TPU: log-mel frontend (``audio.py``) → conv+transformer
audio encoder → autoregressive decoder with greedy decoding under
``lax.while_loop`` (static shapes, early-exit on EOS). Weights load from a
local HuggingFace Whisper checkpoint; the tiny config keeps the pipeline
testable without weights. KV-caching is a follow-up optimization — decoding
recomputes the (short, ≤224-token) decoder per step, which the MXU absorbs.
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
class WhisperConfig:
    n_mels: int = 80
    d_model: int = 512
    encoder_layers: int = 6
    decoder_layers: int = 6
    n_heads: int = 8
    vocab_size: int = 51865
    max_source_positions: int = 1500  # 30 s / (160 hop · 2 conv stride)
    max_target_positions: int = 448
    # special tokens (multilingual whisper defaults; overridden by HF config)
    sot_token: int = 50258
    eos_token: int = 50257
    no_timestamps_token: int = 50363
    transcribe_token: int = 50359
    lang_zh_token: int = 50260
    lang_en_token: int = 50259
    # ids ≥ timestamp_begin_token encode times: (id - begin) · time_precision
    timestamp_begin_token: int = 50364
    time_precision: float = 0.02
    dtype: Any = jnp.bfloat16

    @classmethod
    def base(cls) -> "WhisperConfig":
        return cls()

    @classmethod
    def tiny_test(cls, vocab_size: int = 256) -> "WhisperConfig":
        return cls(
            n_mels=80, d_model=64, encoder_layers=2, decoder_layers=2, n_heads=4,
            vocab_size=vocab_size, max_source_positions=1500, max_target_positions=32,
            sot_token=1, eos_token=2, no_timestamps_token=3, transcribe_token=4,
            lang_zh_token=5, lang_en_token=6, timestamp_begin_token=200,
        )


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's sinusoidal positions for the audio encoder."""
    log_timescale = np.log(10_000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


class _MHA(nn.Module):
    """Multi-head attention with full and incremental (KV-cached) paths.

    setup-style so the decode step can reuse the same projections; attribute
    names (q_proj/k_proj/v_proj/out_proj) keep the HF weight mapping stable.
    """

    config: WhisperConfig
    causal: bool = False

    def setup(self):
        cfg = self.config
        self.q_proj = nn.Dense(cfg.d_model, dtype=cfg.dtype)
        self.k_proj = nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.dtype)
        self.v_proj = nn.Dense(cfg.d_model, dtype=cfg.dtype)
        self.out_proj = nn.Dense(cfg.d_model, dtype=cfg.dtype)

    def _attend(self, q, k, v, mask=None):
        cfg = self.config
        head_dim = cfg.d_model // cfg.n_heads
        b, lq, _ = q.shape
        lk = k.shape[1]
        split = lambda t, l: t.reshape(b, l, cfg.n_heads, head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", split(q, lq), split(k, lk)) / np.sqrt(head_dim)
        if mask is not None:
            scores = jnp.where(mask, scores, -1e9)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, split(v, lk)).reshape(b, lq, cfg.d_model)
        return self.out_proj(out)

    def __call__(self, x, kv=None):
        kv = x if kv is None else kv
        q, k, v = self.q_proj(x), self.k_proj(kv), self.v_proj(kv)
        mask = None
        if self.causal:
            mask = jnp.tril(jnp.ones((x.shape[1], kv.shape[1]), bool))[None, None]
        return self._attend(q, k, v, mask)

    def kv(self, source):
        """Precompute (k, v) once (cross-attention over a fixed encoder)."""
        return self.k_proj(source), self.v_proj(source)

    def step(self, x_t, pos, cache_k, cache_v):
        """One causal decode step: write this position's k/v into the cache,
        attend over positions ≤ pos."""
        q = self.q_proj(x_t)  # [B, 1, D]
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, self.k_proj(x_t).astype(cache_k.dtype), (0, pos, 0)
        )
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, self.v_proj(x_t).astype(cache_v.dtype), (0, pos, 0)
        )
        t_max = cache_k.shape[1]
        valid = (jnp.arange(t_max) <= pos)[None, None, None, :]  # [1,1,1,T]
        out = self._attend(q, cache_k, cache_v, valid)
        return out, cache_k, cache_v

    def cross_step(self, x_t, k, v):
        return self._attend(self.q_proj(x_t), k, v)


class _Block(nn.Module):
    config: WhisperConfig
    causal: bool = False
    cross: bool = False

    def setup(self):
        cfg = self.config
        self.self_attn_norm = nn.LayerNorm(dtype=jnp.float32)
        self.self_attn = _MHA(cfg, causal=self.causal)
        if self.cross:
            self.cross_attn_norm = nn.LayerNorm(dtype=jnp.float32)
            self.cross_attn = _MHA(cfg)
        self.mlp_norm = nn.LayerNorm(dtype=jnp.float32)
        self.fc1 = nn.Dense(4 * cfg.d_model, dtype=cfg.dtype)
        self.fc2 = nn.Dense(cfg.d_model, dtype=cfg.dtype)

    def _mlp(self, x):
        h = self.fc1(self.mlp_norm(x).astype(self.config.dtype))
        return x + self.fc2(nn.gelu(h, approximate=False))

    def __call__(self, x, enc=None):
        cfg = self.config
        x = x + self.self_attn(self.self_attn_norm(x).astype(cfg.dtype))
        if self.cross:
            x = x + self.cross_attn(self.cross_attn_norm(x).astype(cfg.dtype), enc)
        return self._mlp(x)

    def cross_kv(self, enc):
        return self.cross_attn.kv(enc)

    def step(self, x_t, pos, enc_k, enc_v, cache_k, cache_v):
        cfg = self.config
        attn, cache_k, cache_v = self.self_attn.step(
            self.self_attn_norm(x_t).astype(cfg.dtype), pos, cache_k, cache_v
        )
        x = x_t + attn
        x = x + self.cross_attn.cross_step(
            self.cross_attn_norm(x).astype(cfg.dtype), enc_k, enc_v
        )
        return self._mlp(x), cache_k, cache_v


class WhisperEncoder(nn.Module):
    config: WhisperConfig

    @nn.compact
    def __call__(self, mel):  # [B, n_frames, n_mels]
        cfg = self.config
        x = nn.Conv(cfg.d_model, (3,), padding=1, dtype=cfg.dtype, name="conv1")(mel)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(cfg.d_model, (3,), strides=(2,), padding=1, dtype=cfg.dtype, name="conv2")(x)
        x = nn.gelu(x, approximate=False)
        positions = self.param(
            "positions",
            lambda key, shape: jnp.asarray(_sinusoids(*shape)),
            (cfg.max_source_positions, cfg.d_model),
        )
        x = x + positions[None, : x.shape[1]].astype(cfg.dtype)
        for i in range(cfg.encoder_layers):
            x = _Block(cfg, name=f"layer_{i}")(x)
        return nn.LayerNorm(dtype=jnp.float32, name="final_norm")(x).astype(cfg.dtype)


class WhisperDecoder(nn.Module):
    config: WhisperConfig

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=cfg.dtype)
        self.positions = self.param(
            "positions",
            nn.initializers.normal(0.02),
            (cfg.max_target_positions, cfg.d_model),
        )
        self.layer = [
            _Block(cfg, causal=True, cross=True) for _ in range(cfg.decoder_layers)
        ]
        self.final_norm = nn.LayerNorm(dtype=jnp.float32)

    def __call__(self, tokens, enc):  # tokens [B, L], enc [B, T, D]
        cfg = self.config
        x = self.embed_tokens(tokens) + self.positions[None, : tokens.shape[1]].astype(cfg.dtype)
        for block in self.layer:
            x = block(x, enc)
        x = self.final_norm(x)
        # tied output projection (f32 operands need HIGHEST: the CPU
        # backend's default matmul is bf16-grade — CLAUDE.md)
        return jnp.matmul(
            x, self.embed_tokens.embedding.T.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )  # [B, L, V]

    # ------------------------------------------------ incremental decoding
    def cross_kvs(self, enc):
        """Per-layer (k, v) over the encoder output — computed once per
        utterance, reused by every decode step."""
        return [block.cross_kv(enc) for block in self.layer]

    def step(self, token_t, pos, cross_kvs, caches):
        """One decode step with KV caches: O(1) attention work per token
        instead of re-running the full sequence (the cached path drops
        greedy decoding from O(L²·layers) to O(L·layers))."""
        cfg = self.config
        pos_emb = jax.lax.dynamic_slice(
            self.positions, (pos, 0), (1, cfg.d_model)
        )
        x = self.embed_tokens(token_t) + pos_emb[None].astype(cfg.dtype)
        new_caches = []
        for block, (enc_k, enc_v), (cache_k, cache_v) in zip(
            self.layer, cross_kvs, caches
        ):
            x, cache_k, cache_v = block.step(x, pos, enc_k, enc_v, cache_k, cache_v)
            new_caches.append((cache_k, cache_v))
        x = self.final_norm(x)
        logits = jnp.matmul(
            x[:, 0], self.embed_tokens.embedding.T.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        return logits, new_caches  # [B, V], caches


class WhisperModel:
    """Encoder-decoder bundle with jitted greedy decoding."""

    def __init__(self, config: Optional[WhisperConfig] = None, weights_path: str = "",
                 seed: int = 0):
        self.config = config or WhisperConfig.base()
        self.encoder = WhisperEncoder(self.config)
        self.decoder = WhisperDecoder(self.config)
        params = load_hf_whisper(self.config, weights_path) if weights_path else None
        self.pretrained = params is not None
        if params is None:
            key = jax.random.PRNGKey(seed)
            mel = jnp.zeros((1, 3000, self.config.n_mels))
            enc_params = self.encoder.init(key, mel)["params"]
            # shape only — a real forward would compile+run the whole
            # encoder just to size the decoder init
            enc_out = jax.eval_shape(
                lambda p, m: self.encoder.apply({"params": p}, m),
                enc_params, mel,
            )
            enc_out = jnp.zeros(enc_out.shape, enc_out.dtype)
            dec_params = self.decoder.init(
                key, jnp.zeros((1, 4), jnp.int32), enc_out
            )["params"]
            params = {"encoder": enc_params, "decoder": dec_params}
        self.params = params

        def _greedy_full(params, mel, start_tokens, max_tokens):
            """Reference path: full decoder re-run per step (used to validate
            the cached path)."""
            enc = self.encoder.apply({"params": params["encoder"]}, mel)
            b = mel.shape[0]
            n_start = start_tokens.shape[0]
            tokens = jnp.zeros((b, max_tokens), jnp.int32)
            tokens = tokens.at[:, :n_start].set(start_tokens[None, :])
            finished = jnp.zeros((b,), bool)

            def cond(state):
                t, _tokens, finished = state
                return (t < max_tokens) & ~jnp.all(finished)

            def body(state):
                t, tokens, finished = state
                logits = self.decoder.apply({"params": params["decoder"]}, tokens, enc)
                next_tok = jnp.argmax(logits[:, t - 1, :], axis=-1).astype(jnp.int32)
                next_tok = jnp.where(finished, self.config.eos_token, next_tok)
                tokens = tokens.at[:, t].set(next_tok)
                finished = finished | (next_tok == self.config.eos_token)
                return t + 1, tokens, finished

            _, tokens, _ = jax.lax.while_loop(cond, body, (n_start, tokens, finished))
            return tokens

        def _greedy_cached(params, mel, start_tokens, max_tokens):
            """Production path: per-layer self-attention KV caches + one-time
            cross-attention k/v precompute."""
            cfg = self.config
            dparams = {"params": params["decoder"]}
            enc = self.encoder.apply({"params": params["encoder"]}, mel)
            cross = self.decoder.apply(dparams, enc, method="cross_kvs")
            b = mel.shape[0]
            n_start = start_tokens.shape[0]
            caches = [
                (
                    jnp.zeros((b, max_tokens, cfg.d_model), cfg.dtype),
                    jnp.zeros((b, max_tokens, cfg.d_model), cfg.dtype),
                )
                for _ in range(cfg.decoder_layers)
            ]
            tokens = jnp.full((b, max_tokens), cfg.eos_token, jnp.int32)
            tokens = jax.lax.dynamic_update_slice(
                tokens, jnp.tile(start_tokens[None, :], (b, 1)), (0, 0)
            )
            finished = jnp.zeros((b,), bool)

            def cond(state):
                t, _tokens, _caches, finished = state
                return (t < max_tokens - 1) & ~jnp.all(finished)

            def body(state):
                t, tokens, caches, finished = state
                token_t = jax.lax.dynamic_slice(tokens, (0, t), (b, 1))
                logits, caches = self.decoder.apply(
                    dparams, token_t, t, cross, caches, method="step"
                )
                predicted = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                predicted = jnp.where(finished, cfg.eos_token, predicted)
                existing = jax.lax.dynamic_slice(tokens, (0, t + 1), (b, 1))[:, 0]
                in_prompt = t + 1 < n_start
                new = jnp.where(in_prompt, existing, predicted)
                tokens = jax.lax.dynamic_update_slice(tokens, new[:, None], (0, t + 1))
                finished = finished | (~in_prompt & (new == cfg.eos_token))
                return t + 1, tokens, caches, finished

            _, tokens, _, _ = jax.lax.while_loop(
                cond, body, (0, tokens, caches, finished)
            )
            return tokens

        def _beam_cached(params, mel, start_tokens, max_tokens, beam_size):
            """KV-cached beam search, whole loop under jit: beams live as an
            extra batch factor (state arrays are [B·K, ...]), each step is one
            decoder.step + a [B, K·V] top-k + a beam-reorder gather. Finished
            beams propagate an eos continuation at zero cost (faster-whisper
            semantics, no length penalty)."""
            cfg = self.config
            NEG = -1e30
            k_beams = beam_size
            dparams = {"params": params["decoder"]}
            enc = self.encoder.apply({"params": params["encoder"]}, mel)
            b = mel.shape[0]
            bk = b * k_beams
            enc_tiled = jnp.repeat(enc, k_beams, axis=0)
            cross = self.decoder.apply(dparams, enc_tiled, method="cross_kvs")
            n_start = start_tokens.shape[0]
            caches = [
                (
                    jnp.zeros((bk, max_tokens, cfg.d_model), cfg.dtype),
                    jnp.zeros((bk, max_tokens, cfg.d_model), cfg.dtype),
                )
                for _ in range(cfg.decoder_layers)
            ]
            tokens = jnp.full((bk, max_tokens), cfg.eos_token, jnp.int32)
            tokens = jax.lax.dynamic_update_slice(
                tokens, jnp.tile(start_tokens[None, :], (bk, 1)), (0, 0)
            )
            # only beam 0 is live at the start so the first expansion draws
            # all k beams from it instead of k duplicates
            cum = jnp.tile(
                jnp.concatenate([jnp.zeros(1), jnp.full(k_beams - 1, NEG)]), b
            ).astype(jnp.float32)
            finished = jnp.zeros((bk,), bool)

            def cond(state):
                t, _tokens, _caches, _cum, finished = state
                return (t < max_tokens - 1) & ~jnp.all(finished)

            def body(state):
                t, tokens, caches, cum, finished = state
                token_t = jax.lax.dynamic_slice(tokens, (0, t), (bk, 1))
                logits, caches = self.decoder.apply(
                    dparams, token_t, t, cross, caches, method="step"
                )
                logp = jax.nn.log_softmax(logits, axis=-1)  # [bk, V]
                eos_only = jnp.full_like(logp, NEG).at[:, cfg.eos_token].set(0.0)
                logp = jnp.where(finished[:, None], eos_only, logp)

                vocab = logp.shape[-1]
                cand = (cum[:, None] + logp).reshape(b, k_beams * vocab)
                top_val, top_idx = jax.lax.top_k(cand, k_beams)  # [b, K]
                beam_src = top_idx // vocab
                flat_src = (
                    jnp.arange(b, dtype=jnp.int32)[:, None] * k_beams + beam_src
                ).reshape(-1)
                picked = (top_idx % vocab).astype(jnp.int32).reshape(-1)

                # prompt phase: identity beams, forced prompt token, cum kept
                in_prompt = t + 1 < n_start
                existing = jax.lax.dynamic_slice(tokens, (0, t + 1), (bk, 1))[:, 0]
                flat_src = jnp.where(in_prompt, jnp.arange(bk, dtype=jnp.int32), flat_src)
                new_tok = jnp.where(in_prompt, existing, picked)
                cum = jnp.where(in_prompt, cum, top_val.reshape(-1))

                tokens = jnp.take(tokens, flat_src, axis=0)
                tokens = jax.lax.dynamic_update_slice(
                    tokens, new_tok[:, None], (0, t + 1)
                )
                caches = [
                    (jnp.take(ck, flat_src, axis=0), jnp.take(cv, flat_src, axis=0))
                    for ck, cv in caches
                ]
                finished = jnp.take(finished, flat_src, axis=0)
                finished = finished | (~in_prompt & (new_tok == cfg.eos_token))
                return t + 1, tokens, caches, cum, finished

            _, tokens, _, cum, _ = jax.lax.while_loop(
                cond, body, (0, tokens, caches, cum, finished)
            )
            best = jnp.argmax(cum.reshape(b, k_beams), axis=1)
            tokens = tokens.reshape(b, k_beams, max_tokens)
            return (
                jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0],
                cum.reshape(b, k_beams),
            )

        self._greedy = jax.jit(_greedy_cached, static_argnames=("max_tokens",))
        self._greedy_uncached = jax.jit(_greedy_full, static_argnames=("max_tokens",))
        self._beam = jax.jit(_beam_cached, static_argnames=("max_tokens", "beam_size"))

    def detect_language(self, mel: jnp.ndarray, candidates=("zh", "en")) -> str:
        """Whisper-style language id: one decoder step on [SOT] and compare
        the logits of the candidate language tokens."""
        cfg = self.config
        token_ids = {
            "zh": cfg.lang_zh_token,
            "en": cfg.lang_en_token,
        }
        enc = self.encoder.apply({"params": self.params["encoder"]}, mel)
        sot = jnp.full((mel.shape[0], 1), cfg.sot_token, jnp.int32)
        logits = self.decoder.apply({"params": self.params["decoder"]}, sot, enc)
        lang_logits = np.asarray(logits[:, 0, :])  # [B, V]
        votes = {lang: float(lang_logits[:, token_ids[lang]].mean())
                 for lang in candidates if lang in token_ids}
        return max(votes, key=votes.get)

    def transcribe_tokens(self, mel: jnp.ndarray, language: str = "zh",
                          max_tokens: Optional[int] = None,
                          timestamps: bool = False,
                          beam_size: int = 1) -> np.ndarray:
        """mel [B, 3000, n_mels] → token ids [B, max_tokens].

        ``beam_size=1`` is the KV-cached greedy path; ``beam_size>1`` runs
        jitted beam search (faster-whisper defaults to beam_size=5,
        reference ``video_transcriber.py:300-332``). With ``timestamps=True``
        the prompt omits ``no_timestamps_token`` so the model interleaves
        timestamp tokens; parse with :func:`segments_from_tokens`.
        """
        cfg = self.config
        lang = cfg.lang_zh_token if language == "zh" else cfg.lang_en_token
        prompt = [cfg.sot_token, lang, cfg.transcribe_token]
        if not timestamps:
            prompt.append(cfg.no_timestamps_token)
        start = jnp.asarray(prompt, jnp.int32)
        max_tokens = max_tokens or cfg.max_target_positions
        if beam_size > 1:
            tokens, _ = self._beam(self.params, mel, start, max_tokens, beam_size)
            return np.asarray(tokens)
        return np.asarray(self._greedy(self.params, mel, start, max_tokens))


def segments_from_tokens(row: np.ndarray, config: WhisperConfig) -> list:
    """Parse one decoded token row into timed segments.

    Whisper's timestamp grammar interleaves ``<|t0|> text <|t1|><|t2|> text
    <|t3|> ...``: a timestamp token opens a segment, the next one closes it.
    Returns ``[{"start": s, "end": s, "token_ids": [...]}, ...]`` (seconds,
    relative to the 30 s window); an empty list when the row carries no
    timestamp tokens (caller falls back to whole-chunk segmentation).
    """
    begin = config.timestamp_begin_token
    segments = []
    start: Optional[float] = None
    ids: list = []
    for tok in np.asarray(row).tolist():
        if tok == config.eos_token:
            break
        if tok >= begin:
            time = (tok - begin) * config.time_precision
            if start is None:
                start = time
                ids = []
            else:
                segments.append({"start": start, "end": time, "token_ids": ids})
                start = None
        elif start is not None and tok < config.eos_token:
            ids.append(tok)
    if start is not None and ids:
        # unterminated trailing segment: close at the window end
        segments.append(
            {"start": start, "end": 30.0, "token_ids": ids}
        )
    return segments


# --------------------------------------------------------------------------
# HF checkpoint loading (WhisperForConditionalGeneration naming)
# --------------------------------------------------------------------------

def _whisper_key_map(cfg: WhisperConfig) -> Dict[str, str]:
    mapping = {
        "model.encoder.conv1.weight": "encoder/conv1/kernel",
        "model.encoder.conv1.bias": "encoder/conv1/bias",
        "model.encoder.conv2.weight": "encoder/conv2/kernel",
        "model.encoder.conv2.bias": "encoder/conv2/bias",
        "model.encoder.embed_positions.weight": "encoder/positions",
        "model.encoder.layer_norm.weight": "encoder/final_norm/scale",
        "model.encoder.layer_norm.bias": "encoder/final_norm/bias",
        "model.decoder.embed_tokens.weight": "decoder/embed_tokens/embedding",
        "model.decoder.embed_positions.weight": "decoder/positions",
        "model.decoder.layer_norm.weight": "decoder/final_norm/scale",
        "model.decoder.layer_norm.bias": "decoder/final_norm/bias",
    }

    def attn(side, i, hf_prefix, fx_prefix):
        for proj in ("q_proj", "v_proj", "out_proj"):
            mapping[f"model.{side}.layers.{i}.{hf_prefix}.{proj}.weight"] = (
                f"{fx_prefix}/{proj}/kernel"
            )
            mapping[f"model.{side}.layers.{i}.{hf_prefix}.{proj}.bias"] = (
                f"{fx_prefix}/{proj}/bias"
            )
        mapping[f"model.{side}.layers.{i}.{hf_prefix}.k_proj.weight"] = (
            f"{fx_prefix}/k_proj/kernel"
        )

    for i in range(cfg.encoder_layers):
        fx = f"encoder/layer_{i}"
        attn("encoder", i, "self_attn", f"{fx}/self_attn")
        mapping[f"model.encoder.layers.{i}.self_attn_layer_norm.weight"] = f"{fx}/self_attn_norm/scale"
        mapping[f"model.encoder.layers.{i}.self_attn_layer_norm.bias"] = f"{fx}/self_attn_norm/bias"
        mapping[f"model.encoder.layers.{i}.fc1.weight"] = f"{fx}/fc1/kernel"
        mapping[f"model.encoder.layers.{i}.fc1.bias"] = f"{fx}/fc1/bias"
        mapping[f"model.encoder.layers.{i}.fc2.weight"] = f"{fx}/fc2/kernel"
        mapping[f"model.encoder.layers.{i}.fc2.bias"] = f"{fx}/fc2/bias"
        mapping[f"model.encoder.layers.{i}.final_layer_norm.weight"] = f"{fx}/mlp_norm/scale"
        mapping[f"model.encoder.layers.{i}.final_layer_norm.bias"] = f"{fx}/mlp_norm/bias"
    for i in range(cfg.decoder_layers):
        fx = f"decoder/layer_{i}"
        attn("decoder", i, "self_attn", f"{fx}/self_attn")
        attn("decoder", i, "encoder_attn", f"{fx}/cross_attn")
        mapping[f"model.decoder.layers.{i}.self_attn_layer_norm.weight"] = f"{fx}/self_attn_norm/scale"
        mapping[f"model.decoder.layers.{i}.self_attn_layer_norm.bias"] = f"{fx}/self_attn_norm/bias"
        mapping[f"model.decoder.layers.{i}.encoder_attn_layer_norm.weight"] = f"{fx}/cross_attn_norm/scale"
        mapping[f"model.decoder.layers.{i}.encoder_attn_layer_norm.bias"] = f"{fx}/cross_attn_norm/bias"
        mapping[f"model.decoder.layers.{i}.fc1.weight"] = f"{fx}/fc1/kernel"
        mapping[f"model.decoder.layers.{i}.fc1.bias"] = f"{fx}/fc1/bias"
        mapping[f"model.decoder.layers.{i}.fc2.weight"] = f"{fx}/fc2/kernel"
        mapping[f"model.decoder.layers.{i}.fc2.bias"] = f"{fx}/fc2/bias"
        mapping[f"model.decoder.layers.{i}.final_layer_norm.weight"] = f"{fx}/mlp_norm/scale"
        mapping[f"model.decoder.layers.{i}.final_layer_norm.bias"] = f"{fx}/mlp_norm/bias"
    return mapping


def load_hf_whisper(config: WhisperConfig, path: str) -> Optional[Dict]:
    ckpt = Path(path)
    files = sorted(ckpt.glob("*.safetensors")) if ckpt.exists() else []
    if not files:
        return None
    from safetensors.numpy import load_file

    state: Dict[str, np.ndarray] = {}
    for f in files:
        state.update(load_file(str(f)))

    # reject checkpoints with MORE layers than the config: the key map
    # only references layers [0, n); a whisper-small checkpoint would
    # otherwise load a silent 6-layer prefix and transcribe garbage
    import re as _re

    max_layer = -1
    for key in state:
        m = _re.search(r"(?:encoder|decoder)\.layers\.(\d+)\.", key)
        if m:
            max_layer = max(max_layer, int(m.group(1)))
    if max_layer + 1 > max(config.encoder_layers, config.decoder_layers):
        return None

    params: Dict = {}

    def put(path_str, value):
        node = params
        parts = path_str.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value, jnp.float32)

    for hf_key, fx_path in _whisper_key_map(config).items():
        tensor = state.get(hf_key)
        if tensor is None and hf_key.startswith("model."):
            tensor = state.get(hf_key[len("model."):])
        if tensor is None:
            return None
        if fx_path.endswith("/kernel"):
            if "conv" in fx_path:
                tensor = tensor.transpose(2, 1, 0)  # [out,in,k] → [k,in,out]
            else:
                tensor = tensor.T
        put(fx_path, tensor)
    return params
