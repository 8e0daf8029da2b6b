"""Continuous-batching serving bench: slot-pool engine vs static batches.

Workload: requests with bucketed prompts arriving over time (Poisson), each
decoding to ``--new`` tokens. Two servers:

- ``static``: accumulate up to 8 requests, run one ``generate_ragged``
  batch, repeat — every request in a batch waits for the slowest, and
  arrivals during a batch wait for the next one (the reference's serving
  model is the degenerate b1 version of this,
  ``src/core/query/llm/local_llm.py:457-466``).
- ``continuous``: ``serving.ServingEngine`` — admissions between decode
  bursts; a request starts prefill at the next burst boundary.

Reports aggregate tok/s, TTFT (submit → first token) and end-to-end
latency p50/p95 for both, as JSON on the last stdout line.

CPU (tiny config, wiring check):
    python scripts/bench_serving.py
On-chip 7B geometry:
    python scripts/bench_serving.py --tpu [--rate 2.0 --n 24]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="7B geometry int8 on the accelerator")
    ap.add_argument("--n", type=int, default=16, help="number of requests")
    ap.add_argument("--rate", type=float, default=0.0,
                    help="arrival rate req/s (0 = all at t=0)")
    ap.add_argument("--prompt", type=int, default=0,
                    help="prompt length (default: geometry-dependent)")
    ap.add_argument("--new", type=int, default=0,
                    help="tokens to generate per request")
    ap.add_argument("--burst", type=int, default=16)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-static", action="store_true")
    ap.add_argument("--skip-spec", action="store_true")
    ap.add_argument("--skip-copy", action="store_true",
                    help="skip the copy-model all-accept ceiling section")
    ap.add_argument("--skip-prefix", action="store_true",
                    help="skip the prefix-KV-cache section")
    ap.add_argument("--skip-chunk", action="store_true",
                    help="skip the chunked-prefill stall section")
    ap.add_argument("--only-stall", action="store_true",
                    help="run ONLY the admission-stall section (cheap "
                         "on-chip re-run of the pacing/chunking policy)")
    ap.add_argument("--merge-into", default="",
                    help="existing artifact JSON: replace just the "
                         "sections this run produced, keep the rest")
    ap.add_argument("--out", default="",
                    help="also write the JSON artifact to this path")
    args = ap.parse_args()
    if args.only_stall:
        args.skip_static = args.skip_spec = True
        args.skip_copy = args.skip_prefix = True

    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        os.environ.setdefault(
            "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")
    import jax
    import numpy as np

    from automative_rag_tpu.models.qwen2 import Qwen2Config, Qwen2Model
    from automative_rag_tpu.serving import ServingEngine

    on_tpu = jax.default_backend() == "tpu"
    if args.tpu and not on_tpu:
        print("accelerator unavailable", file=sys.stderr)

    if args.tpu and on_tpu:
        cfg = Qwen2Config(weight_bits=8)  # 7B serving geometry, int8
        prompt_len = args.prompt or 512
        new_tokens = args.new or 128
        max_len = 1024
        buckets = (512,) if prompt_len <= 512 else (1024,)
    else:
        cfg = Qwen2Config.tiny_test()
        prompt_len = args.prompt or 24
        new_tokens = args.new or 32
        max_len = 128
        buckets = (32,)

    t0 = time.time()
    model = Qwen2Model(cfg, seed=1)
    print(f"model built in {time.time()-t0:.1f}s "
          f"(backend={jax.default_backend()})", file=sys.stderr)

    rng = np.random.default_rng(args.seed)
    prompts = [rng.integers(10, min(cfg.vocab_size - 10, 50_000),
                            size=prompt_len).astype(np.int32)
               for _ in range(args.n)]
    if args.rate > 0:
        gaps = rng.exponential(1.0 / args.rate, size=args.n)
        arrivals = np.cumsum(gaps)
        arrivals -= arrivals[0]
    else:
        arrivals = np.zeros(args.n)

    def pct(xs, q):
        return float(np.percentile(np.asarray(xs), q)) if len(xs) else 0.0

    # -------------------------------------------- continuous (+spec)
    def drive(eng, label, prefix_id=None):
        """Timed open-loop run: Poisson arrivals against a live engine."""
        eng.warmup()  # covers batched-admission sizes {2,4,8} too — the
        # r05 first pass warmed only the single-admission path and paid a
        # ~22 s multi-8 prefill compile INSIDE the measured window (wall
        # 29.9 s vs 7.5 s at identical burst counts)
        w = eng.submit(prompts[0], max_new_tokens=max(args.burst + 2, 4),
                       prefix_id=prefix_id)
        eng.run_until_idle()
        w.result()
        print(f"{label}: compiled", file=sys.stderr)

        ttft, e2e = [], []
        start = time.time()
        reqs = []
        next_i = 0
        while len(e2e) < args.n:
            now = time.time() - start
            while next_i < args.n and arrivals[next_i] <= now:
                reqs.append(eng.submit(prompts[next_i],
                                       max_new_tokens=new_tokens,
                                       prefix_id=prefix_id))
                next_i += 1
            if next_i < args.n and not any(eng._slots) and not eng._pending:
                time.sleep(min(0.005, arrivals[next_i] - now))
                continue
            eng.step()
            done = [r for r in reqs if r.finished]
            for r in done:
                ttft.append(r.started_at - r.submitted_at)
                e2e.append(r.finished_at - r.submitted_at)
                reqs.remove(r)
        wall = time.time() - start
        report = {
            "wall_s": round(wall, 3),
            "tokens_per_s": round(args.n * new_tokens / wall, 1),
            "ttft_p50_s": round(pct(ttft, 50), 3),
            "ttft_p95_s": round(pct(ttft, 95), 3),
            "e2e_p50_s": round(pct(e2e, 50), 3),
            "e2e_p95_s": round(pct(e2e, 95), 3),
            "bursts": eng.stats["bursts"],
        }
        print(f"{label}: {report}", file=sys.stderr)
        return report

    continuous = None
    if not args.only_stall:
        eng = ServingEngine(model, max_slots=args.slots, max_len=max_len,
                            prompt_buckets=buckets, burst=args.burst)
        continuous = drive(eng, "continuous")
        eng.release()  # each engine holds a full KV pool; 8 live pools OOM
    total_tokens = args.n * new_tokens

    # spec bursts on the same workload: random prompts are the no-match
    # floor (drafts never accept) — the section certifies spec mode adds
    # no serving overhead; the accept-path ceiling is measured separately
    # (bench_llm7b --spec copy workload)
    spec = None
    if not args.skip_spec:
        eng_s = ServingEngine(model, max_slots=args.slots, max_len=max_len,
                              prompt_buckets=buckets, burst=args.burst,
                              spec=True)
        spec = drive(eng_s, "continuous_spec")
        eng_s.release()

    # ------------------------------------------------------- static b8
    static = None
    if not args.skip_static:
        warm = model.generate_ragged(
            [p for p in prompts[: args.slots]],
            max_new_tokens=new_tokens)
        del warm
        print("static: compiled", file=sys.stderr)
        sub_t = list(arrivals)
        done_t, start_t = {}, {}
        start = time.time()
        i = 0
        while i < args.n:
            batch = []
            # wait for at least one arrival
            while not batch:
                now = time.time() - start
                batch = [j for j in range(i, args.n) if sub_t[j] <= now]
                if not batch:
                    time.sleep(0.002)
            batch = batch[: args.slots]
            for j in batch:
                start_t[j] = time.time() - start
            model.generate_ragged([prompts[j] for j in batch],
                                  max_new_tokens=new_tokens)
            for j in batch:
                done_t[j] = time.time() - start
            i = batch[-1] + 1
        stat_wall = time.time() - start
        lat = [done_t[j] - sub_t[j] for j in range(args.n)]
        static = {
            "wall_s": round(stat_wall, 3),
            "tokens_per_s": round(total_tokens / stat_wall, 1),
            "e2e_p50_s": round(pct(lat, 50), 3),
            "e2e_p95_s": round(pct(lat, 95), 3),
        }
        print(f"static: {static}", file=sys.stderr)

    # copy-model workload: the all-accept ceiling through the serving
    # acceptance path (every prompt repeats a provable greedy cycle)
    spec_copy = None
    if not args.skip_spec and not args.skip_copy:
        from spec_workload import cycle_prompt, make_copy_model

        alphabet = make_copy_model(model)
        prompts = [cycle_prompt(alphabet, prompt_len) for _ in range(args.n)]
        eng_p = ServingEngine(model, max_slots=args.slots, max_len=max_len,
                              prompt_buckets=buckets, burst=args.burst)
        copy_plain = drive(eng_p, "continuous_copy_plain")
        eng_p.release()
        eng_c = ServingEngine(model, max_slots=args.slots, max_len=max_len,
                              prompt_buckets=buckets, burst=args.burst,
                              spec=True)
        spec_copy = drive(eng_c, "continuous_copy_spec")
        eng_c.release()
        spec_copy["plain_same_workload"] = copy_plain
        spec_copy["speedup_vs_plain"] = round(
            copy_plain["wall_s"] / spec_copy["wall_s"], 2)
        print(f"copy-model spec speedup: {spec_copy['speedup_vs_plain']}x",
              file=sys.stderr)


    # prefix-KV-cache workload: 3/4 of every prompt is a shared prefix
    # (the RAG mode header + template boilerplate); admission copies its
    # cached KV instead of re-prefilling it per request
    prefix = None
    if not args.skip_prefix:
        pre_len = (prompt_len * 3) // 4
        suf_len = prompt_len - pre_len
        pre_ids = rng.integers(10, min(cfg.vocab_size - 10, 50_000),
                               size=pre_len).astype(np.int32)
        prompts = [np.concatenate([
            pre_ids,
            rng.integers(10, min(cfg.vocab_size - 10, 50_000),
                         size=suf_len).astype(np.int32)])
            for _ in range(args.n)]
        pb = tuple(sorted({suf_len, *buckets}))
        eng_np = ServingEngine(model, max_slots=args.slots,
                               max_len=max_len, prompt_buckets=pb,
                               burst=args.burst)
        plain_pref = drive(eng_np, "prefix_workload_plain")
        eng_np.release()
        eng_pf = ServingEngine(model, max_slots=args.slots,
                               max_len=max_len, prompt_buckets=pb,
                               burst=args.burst)
        pid = eng_pf.register_prefix(pre_ids)
        cached = drive(eng_pf, "prefix_workload_cached", prefix_id=pid)
        assert eng_pf.stats["prefix_misses"] == 0, eng_pf.stats
        eng_pf.release()
        prefix = {
            "prefix_len": pre_len, "suffix_len": suf_len,
            "plain": plain_pref, "cached": cached,
            "ttft_p50_speedup": round(
                plain_pref["ttft_p50_s"] / max(cached["ttft_p50_s"], 1e-9),
                2),
        }
        print(f"prefix TTFT p50 speedup: {prefix['ttft_p50_speedup']}x",
              file=sys.stderr)

    # chunked-prefill stall section: live decode streams observe the
    # stall each long admission imposes; chunking bounds it to one chunk
    # (+ the interleaved short burst) instead of the whole prefill
    chunked = None
    if not args.skip_chunk:
        lp = buckets[-1]
        n_long = max(2, args.slots - 2)
        long_prompts = [rng.integers(10, min(cfg.vocab_size - 10, 50_000),
                                     size=lp).astype(np.int32)
                        for _ in range(n_long)]
        stream_prompt = rng.integers(
            10, min(cfg.vocab_size - 10, 50_000),
            size=min(prompt_len, buckets[0])).astype(np.int32)
        chunk_size = max(lp // 4, 8)

        def stall_drive(prefill_chunk, label, pacing=True):
            eng = ServingEngine(
                model, max_slots=args.slots, max_len=max_len,
                prompt_buckets=buckets, burst=args.burst,
                prefill_chunk=prefill_chunk, admit_pacing=pacing)
            eng.warmup()  # admission singles + multi sizes {2,4,8} — the
            # measured unpaced run admits n_long requests at once, which
            # groups at sizes the two-long warm below never reaches
            # streamer must still be decoding during the long admissions,
            # or the interleave burst (burst=chunk_burst) never compiles;
            # TWO longs so a paced backlog forms (the short drain burst
            # only compiles when an admission leaves overflow behind)
            s0 = eng.submit(stream_prompt, max_new_tokens=args.burst * 3)
            eng.step()
            w0 = eng.submit(long_prompts[0], max_new_tokens=6)
            w1 = eng.submit(long_prompts[-1], max_new_tokens=6)
            eng.run_until_idle()
            s0.result(), w0.result(), w1.result()
            print(f"{label}: compiled", file=sys.stderr)
            tick_lists = [[], []]
            start = time.time()
            streamers = [
                eng.submit(stream_prompt, max_new_tokens=new_tokens * 3,
                           on_token=(lambda lst: lambda _t:
                                     lst.append(time.time()))(lst))
                for lst in tick_lists]
            eng.step()
            longs = [eng.submit(p, max_new_tokens=new_tokens)
                     for p in long_prompts]
            eng.run_until_idle()
            wall = time.time() - start
            for r in streamers + longs:
                r.result()
            gaps = np.concatenate(
                [np.diff(np.asarray(l)) for l in tick_lists
                 if len(l) > 1]) * 1000.0
            ttft = [r.started_at - r.submitted_at for r in longs]
            report = {
                "stall_p50_ms": round(pct(gaps, 50), 1),
                "stall_p95_ms": round(pct(gaps, 95), 1),
                "stall_max_ms": round(float(gaps.max()), 1),
                "ttft_long_p50_s": round(pct(ttft, 50), 3),
                "ttft_long_p95_s": round(pct(ttft, 95), 3),
                "wall_s": round(wall, 3),
                "chunked_admits": eng.stats["chunked_admits"],
            }
            eng.release()
            print(f"{label}: {report}", file=sys.stderr)
            return report

        mono = stall_drive(0, "stall_monolithic_unpaced", pacing=False)
        paced = stall_drive(0, "stall_paced")
        chk = stall_drive(chunk_size, "stall_paced_chunked")
        chunked = {
            "long_prompt_len": lp, "chunk": chunk_size,
            "n_long_admissions": n_long,
            "monolithic": mono, "paced": paced, "chunked": chk,
            "paced_stall_max_improvement": round(
                mono["stall_max_ms"] / max(paced["stall_max_ms"], 1e-9), 2),
            "paced_wall_ratio": round(
                paced["wall_s"] / max(mono["wall_s"], 1e-9), 3),
            "stall_max_improvement": round(
                mono["stall_max_ms"] / max(chk["stall_max_ms"], 1e-9), 2),
        }
        print(f"stall_max: unpaced {mono['stall_max_ms']} -> paced "
              f"{paced['stall_max_ms']} -> paced+chunked "
              f"{chk['stall_max_ms']} ms; paced wall ratio "
              f"{chunked['paced_wall_ratio']}", file=sys.stderr)

    out = {
        "bench": "serving_continuous_batching",
        "backend": jax.default_backend(),
        "geometry": {"d_model": cfg.d_model, "layers": cfg.num_layers,
                     "weight_bits": cfg.weight_bits},
        "n_requests": args.n, "prompt_len": prompt_len,
        "new_tokens": new_tokens, "rate_req_s": args.rate,
        "slots": args.slots, "burst": args.burst,
        "continuous": continuous, "continuous_spec": spec,
        "continuous_copy_spec": spec_copy, "static_b8": static,
        "prefix_cache": prefix, "chunked_prefill": chunked,
    }
    if args.merge_into and os.path.exists(args.merge_into):
        with open(args.merge_into) as fh:
            merged = json.load(fh)
        merged.update({k: v for k, v in out.items() if v is not None})
        out = merged
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
