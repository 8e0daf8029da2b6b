#!/usr/bin/env python3
"""End-to-end per-mode query latency on ONE chip (r03 verdict #6).

The reference's user-facing unit is the query — its API estimates 10-25 s
per mode (``/root/reference/src/api/main.py:356``). This measures the full
production path through the app's job-chain:

    encode (1024-d) → filtered search → sparse union → ColBERT MaxSim
    rerank → mode prompt assembly → 7B-geometry int8 generate → fact check

with the DeepSeek-R1-Distill-Qwen-7B geometry (random-init int8 weights —
no checkpoints ship in this image; latency is weight-content-independent)
and a deterministic 4-char-group tokenizer (realistic zh token counts —
char-level tokenizers inflate prompts ~4x, CLAUDE.md).

Random weights never emit EOS, so every query decodes its mode's FULL
max_tokens budget — the numbers are worst-case-length per mode.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

MODES = ("facts", "features", "tradeoffs", "scenarios", "debate", "quotes")


class Group4Tokenizer:
    """Deterministic 4-char-group tokenizer: ~real-BPE token counts for zh
    text (150-200 tokens for a mode header vs ~600 char-level)."""

    def __init__(self, vocab: int = 151_000):
        self.vocab = vocab

    def __call__(self, text):
        ids = [(hash(text[i:i + 4]) % (self.vocab - 100)) + 10
               for i in range(0, len(text), 4)]
        return {"input_ids": ids or [10]}

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{int(t)}" for t in ids)


def build_llm(tiny: bool, max_positions: int):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from automative_rag_tpu.generation.llm import JaxCausalLM
    from automative_rag_tpu.models.qwen2 import Qwen2Config

    if tiny:
        cfg = dataclasses.replace(Qwen2Config.tiny_test(),
                                  max_positions=max_positions)
    else:
        cfg = Qwen2Config(weight_bits=8, kv_cache_bits=8,
                          max_positions=max_positions)
    llm = JaxCausalLM("", config=cfg, tokenizer=Group4Tokenizer(
        vocab=cfg.vocab_size - 1000))
    if not tiny:
        # park the 545M-element f32 embedding in bf16 (what a checkpoint
        # load produces anyway) — scripts/bench_llm7b.py:46
        llm.model.params = jax.tree_util.tree_map(
            lambda leaf: leaf.astype(jnp.bfloat16)
            if leaf.dtype == jnp.float32 and leaf.size > 1_000_000 else leaf,
            llm.model.params)
    return llm


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=300)
    parser.add_argument("--dim", type=int, default=1024)
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--timeout", type=float, default=600.0)
    parser.add_argument("--max-positions", type=int, default=4096)
    parser.add_argument("--tiny", action="store_true",
                        help="tiny LLM geometry + CPU (wiring smoke test)")
    parser.add_argument("--modes", default=",".join(MODES))
    parser.add_argument("--retrieval-only", action="store_true",
                        help="skip LLM init + per-mode sections; refresh "
                             "only the retrieval split (merged into an "
                             "existing --out artifact)")
    parser.add_argument("--out", default="BENCH_E2E_TPU_r04.json")
    args = parser.parse_args()

    if args.tiny:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

        try:
            jax.config.update("jax_compilation_cache_dir",
                              "/tmp/jax_compile_cache")
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:  # noqa: BLE001
            pass

    from eval_retrieval import build_corpus
    from load_example_data import generate_corpus

    from automative_rag_tpu.app import RAGApplication
    from automative_rag_tpu.generation.llm import AnswerGenerator

    import jax

    report = {
        "bench": "e2e_query_per_mode",
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "llm": "tiny" if args.tiny else
               "7B geometry int8 (3584/28L/GQA-4, vocab 152064), "
               "random-init, whole-loop decode",
        "docs": args.docs,
        "dim": args.dim,
        "note": ("random weights never emit EOS -> every query decodes its "
                 "mode's full max_tokens budget (worst-case length)"),
    }

    import os

    # budget-mode IVF: the production kind at scale, and the state the
    # fused one-dispatch search stage (engine/fused.py, r05 item 3)
    # engages on — the flat default kept r04's e2e on the per-stage path
    os.environ.setdefault("INDEX_KIND", "ivf")
    from automative_rag_tpu.config.settings import Settings

    # a fresh Settings(): the module-level default_settings snapshot was
    # taken at import time, before the INDEX_KIND override above
    app = RAGApplication(settings=Settings(), tiny=True, tiny_dim=args.dim)
    try:
        t0 = time.time()
        facts = build_corpus(min(60, args.docs // 2))
        texts = [f["text"] for f in facts]
        texts += generate_corpus(max(0, args.docs - len(texts)))
        for text in texts:
            jid = app.ingest_text(text)
            while app.tracker.get_job(jid)["status"] not in (
                    "completed", "failed"):
                time.sleep(0.01)
        report["index_rebuild"] = {
            k: v for k, v in app.rebuild_index().items()
            if not isinstance(v, dict)}
        report["ingest_s"] = round(time.time() - t0, 1)

        if not args.retrieval_only:
            t0 = time.time()
            llm = build_llm(args.tiny, args.max_positions)
            app.generator = AnswerGenerator(llm)
            report["llm_init_s"] = round(time.time() - t0, 1)

        rng = np.random.default_rng(5)
        sample = [facts[i] for i in
                  rng.choice(len(facts), size=len(facts), replace=False)]

        modes = ([] if args.retrieval_only
                 else [m for m in args.modes.split(",") if m])
        for mode in modes:
            # warm with an untimed pass over the EXACT measurement query
            # set: one warmup query only covers one prompt bucket, and the
            # r04 scenarios p95 (80.1 s) was a second executable compiling
            # inside the measured window. first_query_incl_compile_s keeps
            # the cold-start number from the first warm query.
            fact = sample[0]
            t0 = time.time()
            app.query_sync(f"{fact['model']}的{fact['metric']}是多少？",
                           mode=mode, timeout=args.timeout)
            compile_s = time.time() - t0
            for i in range(args.reps):
                fact = sample[(i + 1) % len(sample)]
                app.query_sync(f"{fact['model']}的{fact['metric']}是多少？",
                               mode=mode, timeout=args.timeout)
            # the warm pass used the measurement queries — drop the
            # retrieval cache so the timed loop runs the real pipeline
            with app.engine._cache_lock:
                app.engine._cache.clear()

            lat = []
            toks = []
            for i in range(args.reps):
                fact = sample[(i + 1) % len(sample)]
                q = f"{fact['model']}的{fact['metric']}是多少？"
                t0 = time.time()
                job = app.query_sync(q, mode=mode, timeout=args.timeout)
                lat.append(time.time() - t0)
                ans = job["result"]["answer"]
                toks.append(len(ans.split()))
            lat.sort()
            report[mode] = {
                "reps": args.reps,
                "first_query_incl_compile_s": round(compile_s, 2),
                "p50_s": round(lat[len(lat) // 2], 3),
                "p95_s": round(
                    lat[min(len(lat) - 1,
                            int(np.ceil(0.95 * len(lat))) - 1)], 3),
                "min_s": round(lat[0], 3),
                "answer_tokens_mean": int(np.mean(toks)),
            }
            print(f"[mode {mode}] {report[mode]}", file=sys.stderr,
                  flush=True)
            Path(args.out).write_text(json.dumps(report, indent=1))

        # retrieval-only latency for the breakdown (no LLM) + the per-stage
        # split (r05 item 3: 1.77 s at 300 docs = dispatch round trips, not
        # kernels — the stage timings say WHICH host→device hops dominate)
        lat, stages = [], []
        # warm the retrieval executables over the FULL measurement query
        # set (distinct queries reach distinct candidate-count rerank
        # buckets — a single warm query left their first invocations
        # inside the timed loop: rerank p50 read 0.80 s vs 0.13 warm),
        # then measure STRICTLY uncached (the first r05 pass mixed ~6
        # cached hits into the 10 samples)
        for i in range(10):
            fact = sample[i % len(sample)]
            app.engine.retrieve(
                f"{fact['model']}的{fact['metric']}是多少？", mode="facts")
        for i in range(10):
            fact = sample[i % len(sample)]
            with app.engine._cache_lock:
                app.engine._cache.clear()
            t0 = time.time()
            app.engine.retrieve(
                f"{fact['model']}的{fact['metric']}是多少？", mode="facts")
            lat.append(time.time() - t0)
            if not app.engine.last_timings.get("cached"):
                stages.append(dict(app.engine.last_timings))
        lat.sort()
        report["retrieval_only_p50_s"] = round(lat[len(lat) // 2], 4)
        if stages:
            keys = {k for s in stages for k in s
                    if isinstance(s.get(k), float)}
            report["retrieval_stage_p50_s"] = {
                k: round(float(np.median([s[k] for s in stages if k in s])),
                         4)
                for k in sorted(keys)}
        if args.retrieval_only and Path(args.out).exists():
            try:  # keep the per-mode sections from the full run
                old_r = json.loads(Path(args.out).read_text())
                old_r.update(report)
                report = old_r
            except Exception:  # noqa: BLE001 — unreadable -> overwrite
                pass
        Path(args.out).write_text(json.dumps(report, indent=1))
        print(json.dumps(report, ensure_ascii=False))
    finally:
        app.shutdown()


if __name__ == "__main__":
    main()
