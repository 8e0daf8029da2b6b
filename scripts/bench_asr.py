#!/usr/bin/env python3
"""Whisper ASR benchmark: log-mel front end, encoder forward, and the
KV-cached greedy/beam decode loops, reported as real-time factor (RTF —
seconds of audio processed per wall second; faster-whisper quotes the same
metric for the reference path, video_transcriber.py:300-332).

Random weights (no checkpoints ship in this image) — decode emits noise
but the architecture, shapes, and loops are the production ones, so the
timing is the serving number. Defaults to whisper-base dims on TPU; a tiny
config on CPU.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tpu", action="store_true")
    parser.add_argument("--max-tokens", type=int, default=64)
    parser.add_argument("--beam", type=int, default=5)
    args = parser.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    import jax.numpy as jnp
    import numpy as np

    from automative_rag_tpu.models.audio import log_mel_spectrogram, mel_filterbank
    from automative_rag_tpu.models.whisper import WhisperConfig, WhisperModel

    cfg = WhisperConfig.base() if args.tpu else WhisperConfig.tiny_test()
    model = WhisperModel(cfg, seed=0)
    audio_s = 30.0
    sr = 16_000
    rng = np.random.default_rng(0)
    audio = rng.normal(size=int(audio_s * sr)).astype(np.float32) * 0.1

    report = {"backend": jax.devices()[0].platform,
              "d_model": cfg.d_model, "layers": cfg.encoder_layers,
              "audio_s": audio_s, "max_tokens": args.max_tokens}

    bank = jnp.asarray(mel_filterbank(cfg.n_mels))
    mel_fn = jax.jit(lambda a: log_mel_spectrogram(a, bank, cfg.n_mels))
    np.asarray(mel_fn(jnp.asarray(audio)))  # compile
    t0 = time.perf_counter()
    mel = np.asarray(mel_fn(jnp.asarray(audio)))
    report["log_mel_ms"] = round((time.perf_counter() - t0) * 1000, 2)

    mel_b = jnp.asarray(mel[None])
    for name, kwargs in (
        ("greedy", {}),
        ("timestamps", {"timestamps": True}),
        (f"beam{args.beam}", {"beam_size": args.beam}),
    ):
        model.transcribe_tokens(mel_b, max_tokens=args.max_tokens, **kwargs)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = model.transcribe_tokens(
                mel_b, max_tokens=args.max_tokens, **kwargs)
            np.asarray(out)
            samples.append(time.perf_counter() - t0)
        p50 = sorted(samples)[1]
        report[name] = {"p50_s": round(p50, 3),
                        "rtf": round(audio_s / p50, 1)}
        print(name, report[name], flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
