#!/usr/bin/env python3
"""End-to-end serving throughput bench (weightless, CPU-capable).

Measures the full query pipeline — encode → filtered search → MaxSim rerank
→ answer — through `engine.retrieve_batch` + the generator, at several batch
sizes over a seeded corpus. Runs anywhere (defaults to CPU; --tpu for the
chip) so serving-throughput numbers exist even when the accelerator tunnel
is down.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _pin_platform(use_tpu: bool) -> None:
    if use_tpu:
        return
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=500, help="corpus docs")
    parser.add_argument("--dim", type=int, default=256)
    parser.add_argument("--tpu", action="store_true")
    parser.add_argument("--trials", type=int, default=5)
    args = parser.parse_args()
    _pin_platform(args.tpu)

    from load_example_data import generate_corpus  # noqa: E402 (sibling script)
    from automative_rag_tpu.app import RAGApplication

    app = RAGApplication(tiny=True, tiny_dim=args.dim)
    try:
        texts = generate_corpus(args.n)
        for i in range(0, len(texts), 1):
            jid = app.ingest_text(texts[i])
            while app.tracker.get_job(jid)["status"] not in ("completed", "failed"):
                time.sleep(0.005)
        app.warmup()

        queries = [f"{texts[i][:12]} 怎么样" for i in range(64)]
        report = {"corpus": app.index.count, "dim": args.dim}
        for batch in (1, 8, 32, 64):
            qs = queries[:batch]
            # warm the batch shape
            app.engine.retrieve_batch(qs, mode="facts")
            samples = []
            for _ in range(args.trials):
                t0 = time.perf_counter()
                ranked = app.engine.retrieve_batch(qs, mode="facts")
                for q, r in zip(qs, ranked):
                    app.generator.answer(q, r, mode="facts")
                samples.append(time.perf_counter() - t0)
            p50 = sorted(samples)[len(samples) // 2]
            report[f"batch_{batch}"] = {
                "p50_s": round(p50, 4),
                "qps": round(batch / p50, 1),
            }
        print(json.dumps(report, ensure_ascii=False))
    finally:
        app.shutdown()


if __name__ == "__main__":
    main()
