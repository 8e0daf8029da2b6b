"""Continuous-batching serving engine (serving/engine.py).

The core invariant: a request's token stream through the slot-pool engine
is identical to running that request alone through
``Qwen2Model.generate_tokens`` (greedy) — continuous batching changes
scheduling, never tokens. Mirrors the reference's serving contract
(``src/core/query/llm/local_llm.py:457-466`` generates per-request; this
engine batches without altering per-request output)."""

import numpy as np
import pytest

from automative_rag_tpu.models.qwen2 import Qwen2Config, Qwen2Model
from automative_rag_tpu.serving import ServingEngine


@pytest.fixture(scope="module")
def model():
    return Qwen2Model(Qwen2Config.tiny_test(), seed=3)


def _solo(model, prompt, max_new, **kw):
    """Oracle: batch-1 whole-loop generation, truncated at first EOS."""
    out = model.generate_tokens(np.asarray(prompt), max_new_tokens=max_new,
                                **kw)[0]
    gen = out[len(prompt):]
    eos = np.where(gen == model.config.eos_token)[0]
    if eos.size:
        gen = gen[: eos[0]]
    return [int(t) for t in gen]


def _engine(model, **kw):
    kw.setdefault("max_slots", 4)
    kw.setdefault("max_len", 96)
    kw.setdefault("prompt_buckets", (8, 16, 32))
    kw.setdefault("burst", 4)
    return ServingEngine(model, **kw)


def test_single_request_matches_solo_generation(model):
    eng = _engine(model)
    prompt = [5, 9, 14, 3, 7]
    req = eng.submit(prompt, max_new_tokens=12)
    eng.run_until_idle()
    assert req.finished
    assert req.result() == _solo(model, prompt, 12)


def test_staggered_admissions_are_token_identical(model):
    """Requests joining mid-stream must not perturb in-flight rows."""
    eng = _engine(model)
    prompts = [[5, 9, 14, 3, 7], [21, 8], [2, 4, 6, 8, 10, 12, 14, 16, 18],
               [100, 101, 102], [7, 7, 7, 7]]
    reqs = [eng.submit(prompts[0], max_new_tokens=10),
            eng.submit(prompts[1], max_new_tokens=14)]
    eng.step()  # admit + first burst
    reqs.append(eng.submit(prompts[2], max_new_tokens=8))
    eng.step()
    reqs += [eng.submit(prompts[3], max_new_tokens=12),
             eng.submit(prompts[4], max_new_tokens=10)]
    eng.run_until_idle()
    for prompt, req, n in zip(prompts, reqs, (10, 14, 8, 12, 10)):
        assert req.result() == _solo(model, prompt, n), prompt


def test_more_requests_than_slots_all_complete(model):
    eng = _engine(model, max_slots=2)
    prompts = [[i + 1, i + 2, i + 3] for i in range(6)]
    reqs = [eng.submit(p, max_new_tokens=6) for p in prompts]
    eng.run_until_idle()
    for prompt, req in zip(prompts, reqs):
        assert req.result() == _solo(model, prompt, 6), prompt
    assert eng.stats["requests_completed"] == 6
    assert all(s is None for s in eng._slots)


def test_eos_frees_slot_early(model):
    """Build a sibling model whose EOS is a token greedy decoding actually
    emits — generation must stop there and release the slot."""
    prompt = [5, 9, 14, 3, 7]
    base = _solo(model, prompt, 8)
    assert len(base) == 8
    eos_tok = base[3]
    cfg = Qwen2Config.tiny_test()
    cfg = Qwen2Config(**{**cfg.__dict__, "eos_token": int(eos_tok)})
    sibling = Qwen2Model(cfg, seed=3)  # same seed → same weights
    eng = _engine(sibling)
    req = eng.submit(prompt, max_new_tokens=20)
    eng.run_until_idle()
    assert req.result() == base[:3]
    assert all(s is None for s in eng._slots)


def test_max_new_tokens_enforced(model):
    eng = _engine(model)
    req = eng.submit([4, 5, 6], max_new_tokens=5)
    eng.run_until_idle()
    assert len(req.result()) <= 5
    assert req.result() == _solo(model, [4, 5, 6], 5)


def test_mixed_sampling_batch_keeps_greedy_rows_exact(model):
    """A sampled row sharing the batch must not perturb greedy rows."""
    eng = _engine(model)
    greedy = eng.submit([5, 9, 14, 3, 7], max_new_tokens=10)
    eng.submit([8, 1, 5], max_new_tokens=10, temperature=0.9, top_p=0.9)
    eng.run_until_idle()
    assert greedy.result() == _solo(model, [5, 9, 14, 3, 7], 10)


def test_streaming_callback_sees_every_token_in_order(model):
    eng = _engine(model, burst=3)
    seen = []
    req = eng.submit([11, 12, 13], max_new_tokens=9,
                     on_token=lambda toks: seen.extend(toks))
    eng.run_until_idle()
    want = req.result()
    assert seen[: len(want)] == want


def test_int8_kv_cache_serving(model):
    cfg = Qwen2Config(**{**Qwen2Config.tiny_test().__dict__,
                         "kv_cache_bits": 8})
    m8 = Qwen2Model(cfg, seed=3)
    eng = _engine(m8)
    prompts = [[5, 9, 14, 3, 7], [21, 8, 4]]
    reqs = [eng.submit(p, max_new_tokens=8) for p in prompts]
    eng.run_until_idle()
    for prompt, req in zip(prompts, reqs):
        out = m8.generate_tokens(np.asarray(prompt), max_new_tokens=8)[0]
        gen = out[len(prompt):]
        eos = np.where(gen == cfg.eos_token)[0]
        if eos.size:
            gen = gen[: eos[0]]
        assert req.result() == [int(t) for t in gen]


def test_background_thread_drains_queue(model):
    eng = _engine(model)
    eng.start()
    try:
        reqs = [eng.submit([i + 2, i + 9], max_new_tokens=6)
                for i in range(5)]
        outs = [r.result(timeout=120) for r in reqs]
    finally:
        eng.stop()
    for i, out in enumerate(outs):
        assert out == _solo(model, [i + 2, i + 9], 6)


def test_repetition_penalty_rows_match_solo(model):
    eng = _engine(model)
    prompt = [5, 9, 14, 3, 7, 9, 5]
    req = eng.submit(prompt, max_new_tokens=10, repetition_penalty=1.3)
    eng.run_until_idle()
    assert req.result() == _solo(model, prompt, 10, repetition_penalty=1.3)


# ---------------------------------------------------------------- wiring


class _IdTokenizer:
    """Token-id-string tokenizer for wiring tests (no vocab files)."""

    def __call__(self, text):
        return {"input_ids": [int(t) % 200 + 5 for t in text.split()]}

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(int(t)) for t in ids)


def test_jax_llm_serving_route_matches_direct(model):
    """generate() through the engine == generate() direct (greedy)."""
    import threading

    from automative_rag_tpu.generation.llm import JaxCausalLM

    cfg = model.config
    direct = JaxCausalLM("", config=cfg, tokenizer=_IdTokenizer())
    served = JaxCausalLM("", config=cfg, tokenizer=_IdTokenizer())
    served.model = direct.model  # same weights
    served.enable_serving(max_slots=4, max_len=96, burst=4)
    try:
        prompts = ["5 9 14 3 7", "21 8", "2 4 6 8 10"]
        params = {"max_tokens": 8, "temperature": 0.0, "speculative": False}
        want = [direct.generate(p, params) for p in prompts]
        got = [None] * len(prompts)

        def run(i):
            got[i] = served.generate(prompts[i], params)

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(prompts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert got == want
    finally:
        served._serving.stop()


def test_queue_manager_llm_concurrency():
    """concurrency={'llm_tasks': 3} → three tasks genuinely in flight."""
    import threading
    import time as _time

    from automative_rag_tpu.orchestration.queue_manager import QueueManager

    qm = QueueManager(start=True, concurrency={"llm_tasks": 3})
    try:
        barrier = threading.Barrier(3, timeout=20)
        done = []

        def task(i):
            barrier.wait()  # only passes if 3 workers run concurrently
            done.append(i)

        for i in range(3):
            qm.enqueue("llm_tasks", f"gen-{i}", task, i)
        deadline = _time.time() + 25
        while len(done) < 3 and _time.time() < deadline:
            _time.sleep(0.02)
        assert sorted(done) == [0, 1, 2]
        status = qm.get_queue_status()["llm_tasks"]
        assert status["workers"] == 3
        assert status["completed"] >= 3
        # default queues stay serialized (reference parity)
        assert qm.get_queue_status()["embedding_tasks"]["workers"] == 1
    finally:
        qm.shutdown()


# ---------------------------------------------------------------------------
# Speculative bursts (spec=True): prompt-lookup drafts + (K+1)-wide verify
# ---------------------------------------------------------------------------

def test_spec_engine_matches_plain_greedy_staggered(model):
    """Random weights = the no-match floor: every draft misses, rows
    advance by their correction token — output must still be identical to
    the solo oracle, including mid-stream admissions."""
    eng = _engine(model, spec=True)
    prompts = [[5, 9, 14, 3, 7], [21, 8],
               [2, 4, 6, 8, 10, 12, 14, 16, 18], [7, 7, 7, 7]]
    reqs = [eng.submit(prompts[0], max_new_tokens=10),
            eng.submit(prompts[1], max_new_tokens=14)]
    eng.step()
    reqs.append(eng.submit(prompts[2], max_new_tokens=8))
    eng.step()
    reqs.append(eng.submit(prompts[3], max_new_tokens=12))
    eng.run_until_idle()
    for prompt, req, n in zip(prompts, reqs, (10, 14, 8, 12)):
        assert req.result() == _solo(model, prompt, n), prompt


def test_spec_engine_copy_model_accepts_drafts():
    """Copy model (tests/test_qwen2._copy_model): greedy repeats one
    token, so drafts always hit — the engine must produce identical
    output in far fewer bursts than the token count implies."""
    from tests.test_qwen2 import _copy_model

    m = _copy_model()
    eng = _engine(m, spec=True, burst=2)
    prompts = [[7, 8, 9, 10, 11], [3, 4, 5]]
    reqs = [eng.submit(p, max_new_tokens=20) for p in prompts]
    eng.run_until_idle()
    for prompt, req in zip(prompts, reqs):
        assert req.result() == _solo(m, prompt, 20), prompt
    # 20 tokens/row at burst=2: plain needs >=10 bursts; all-accept spec
    # covers 20 tokens in ceil(19/(K+1))=3 verifies -> 2 bursts
    assert eng.stats["bursts"] <= 4, eng.stats


def test_spec_engine_max_new_and_streaming(model):
    eng = _engine(model, spec=True, burst=3)
    seen = []
    req = eng.submit([4, 5, 6], max_new_tokens=5,
                     on_token=lambda toks: seen.extend(toks))
    eng.run_until_idle()
    assert len(req.result()) <= 5
    assert req.result() == _solo(model, [4, 5, 6], 5)
    assert seen[: len(req.result())] == req.result()


def test_spec_engine_mixed_sampling_keeps_greedy_exact(model):
    eng = _engine(model, spec=True)
    greedy = eng.submit([5, 9, 14, 3, 7], max_new_tokens=10)
    eng.submit([8, 1, 5], max_new_tokens=10, temperature=0.9, top_p=0.9)
    eng.run_until_idle()
    assert greedy.result() == _solo(model, [5, 9, 14, 3, 7], 10)


def test_spec_engine_int8_kv(model):
    cfg = Qwen2Config(**{**Qwen2Config.tiny_test().__dict__,
                         "kv_cache_bits": 8})
    m8 = Qwen2Model(cfg, seed=3)
    eng = _engine(m8, spec=True)
    prompts = [[5, 9, 14, 3, 7], [21, 8, 4]]
    reqs = [eng.submit(p, max_new_tokens=8) for p in prompts]
    eng.run_until_idle()
    for prompt, req in zip(prompts, reqs):
        out = m8.generate_tokens(np.asarray(prompt), max_new_tokens=8)[0]
        gen = out[len(prompt):]
        eos = np.where(gen == cfg.eos_token)[0]
        if eos.size:
            gen = gen[: eos[0]]
        assert req.result() == [int(t) for t in gen]


def test_spec_engine_slot_reuse_after_completion(model):
    """A slot freed by a finished request must come back clean for the
    next admission (stale buf/plen rows would poison its drafts)."""
    eng = _engine(model, spec=True, max_slots=1)
    prompts = [[1, 2, 3], [9, 8, 7, 6], [4, 4, 4]]
    reqs = [eng.submit(p, max_new_tokens=6) for p in prompts]
    eng.run_until_idle()
    for prompt, req in zip(prompts, reqs):
        assert req.result() == _solo(model, prompt, 6), prompt


# ---------------------------------------------------------------------------
# Prefix KV caching: register_prefix + submit(prefix_id=...) must be
# token-identical to full prefill — the cached-prefix admission changes
# where the prefix KV comes from, never the math (rope positions and
# attention masks are the same).
# ---------------------------------------------------------------------------

def test_prefix_admission_matches_full_prefill(model):
    eng = _engine(model)
    prefix = [5, 9, 14, 3, 7, 21, 8]
    pid = eng.register_prefix(prefix)
    for suffix in ([11, 12], [100, 101, 102, 103], [2]):
        full = prefix + suffix
        via_prefix = eng.submit(full, max_new_tokens=10, prefix_id=pid)
        plain = eng.submit(full, max_new_tokens=10)
        eng.run_until_idle()
        assert via_prefix.result() == plain.result() == _solo(
            model, full, 10), suffix
    assert eng.stats["prefix_admits"] == 3
    assert eng.stats["prefix_misses"] == 0


def test_prefix_admission_int8_kv():
    cfg = Qwen2Config(**{**Qwen2Config.tiny_test().__dict__,
                         "kv_cache_bits": 8})
    m8 = Qwen2Model(cfg, seed=3)
    eng = _engine(m8)
    prefix = [5, 9, 14, 3, 7]
    pid = eng.register_prefix(prefix)
    full = prefix + [11, 12, 13]
    via_prefix = eng.submit(full, max_new_tokens=8, prefix_id=pid)
    plain = eng.submit(full, max_new_tokens=8)
    eng.run_until_idle()
    assert via_prefix.result() == plain.result()
    assert eng.stats["prefix_admits"] == 1


def test_prefix_with_repetition_penalty_and_sampling(model):
    """The seen-set must include prefix AND suffix tokens; sampled rows
    draw from exact conditionals (same state key order as plain path is
    NOT guaranteed, so compare penalized greedy only)."""
    eng = _engine(model)
    prefix = [5, 9, 14, 3, 7, 9, 5]
    pid = eng.register_prefix(prefix)
    full = prefix + [9, 5, 4]
    req = eng.submit(full, max_new_tokens=10, repetition_penalty=1.3,
                     prefix_id=pid)
    eng.run_until_idle()
    assert req.result() == _solo(model, full, 10, repetition_penalty=1.3)


def test_prefix_mismatch_falls_back_to_full_prefill(model):
    eng = _engine(model)
    pid = eng.register_prefix([5, 9, 14])
    # wrong prefix tokens → miss, but generation still correct
    req = eng.submit([6, 6, 6, 11], max_new_tokens=8, prefix_id=pid)
    # unknown id → miss
    req2 = eng.submit([5, 9, 14, 11], max_new_tokens=8, prefix_id=999)
    # prompt == prefix (no suffix) → miss
    req3 = eng.submit([5, 9, 14], max_new_tokens=8, prefix_id=pid)
    eng.run_until_idle()
    assert req.result() == _solo(model, [6, 6, 6, 11], 8)
    assert req2.result() == _solo(model, [5, 9, 14, 11], 8)
    assert req3.result() == _solo(model, [5, 9, 14], 8)
    assert eng.stats["prefix_misses"] == 3
    assert eng.stats["prefix_admits"] == 0


def test_prefix_admission_under_spec_bursts(model):
    """Prefix rows must draft correctly: buf holds prefix+suffix at
    [0, plen) so the n-gram matcher sees the whole prompt."""
    eng = _engine(model, spec=True)
    prefix = [5, 9, 14, 3, 7]
    pid = eng.register_prefix(prefix)
    full = prefix + [11, 12, 13, 14]
    req = eng.submit(full, max_new_tokens=10, prefix_id=pid)
    eng.run_until_idle()
    assert req.result() == _solo(model, full, 10)


def test_prefix_spec_copy_model_accepts_drafts():
    from tests.test_qwen2 import _copy_model

    m = _copy_model()
    eng = _engine(m, spec=True, burst=2)
    prefix = [7, 8, 9, 10]
    pid = eng.register_prefix(prefix)
    full = prefix + [11, 3]
    req = eng.submit(full, max_new_tokens=20, prefix_id=pid)
    eng.run_until_idle()
    assert req.result() == _solo(m, full, 20)
    assert eng.stats["bursts"] <= 4, eng.stats


def test_prefix_slot_reuse_and_mixed_batch(model):
    """Prefixed and plain requests share the pool; freed slots come back
    clean for either admission path."""
    eng = _engine(model, max_slots=2)
    prefix = [5, 9, 14, 3]
    pid = eng.register_prefix(prefix)
    specs = [(prefix + [11], pid), ([21, 8, 4], None),
             (prefix + [12, 13], pid), ([1, 2, 3], None),
             (prefix + [14], pid)]
    reqs = [eng.submit(p, max_new_tokens=6, prefix_id=i) for p, i in specs]
    eng.run_until_idle()
    for (p, _), req in zip(specs, reqs):
        assert req.result() == _solo(model, p, 6), p


def test_register_prefix_rejects_oversize(model):
    eng = _engine(model)  # buckets (8, 16, 32), gen_base 32
    with pytest.raises(ValueError):
        eng.register_prefix(list(range(3, 40)))  # > largest bucket
    with pytest.raises(ValueError):
        eng.register_prefix([])


class _WordTokenizer:
    """Per-word ids — whitespace-delimited, so the mode header's tokens
    are a prefix of every full prompt's tokens (the real-tokenizer
    boundary condition ``_prefix_for`` checks)."""

    def __call__(self, text):
        return {"input_ids": [sum(ord(c) for c in w) % 200 + 5
                              for w in text.split()]}

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(int(t)) for t in ids)


def test_jax_llm_auto_prefix_header_matches_direct():
    """Serving route auto-registers the mode template header as a KV
    prefix; output must equal the direct (non-serving) path."""
    from automative_rag_tpu.generation.llm import JaxCausalLM
    from automative_rag_tpu.generation.prompts import build_prompt

    # facts header ≈ 90 word-tokens; tiny_test max_positions=128 would
    # truncate the direct oracle, so widen positions for this test
    cfg = Qwen2Config(**{**Qwen2Config.tiny_test().__dict__,
                         "max_positions": 512})
    direct = JaxCausalLM("", config=cfg, tokenizer=_WordTokenizer())
    served = JaxCausalLM("", config=cfg, tokenizer=_WordTokenizer())
    served.model = direct.model  # same weights
    eng = served.enable_serving(max_slots=2, max_len=512, burst=4)
    try:
        params = {"max_tokens": 6, "temperature": 0.0, "speculative": False}
        prompts = [build_prompt("facts", "ctx A", "q1"),
                   build_prompt("facts", "ctx B longer", "q2")]
        want = [direct.generate(p, params) for p in prompts]
        got = [served.generate(p, params) for p in prompts]
        assert got == want
        # 2 live requests + the register-time suffix-bucket warm passes
        assert eng.stats["prefix_admits"] >= 2
        assert eng.stats["prefix_misses"] == 0
    finally:
        eng.stop()


# ---------------------------------------------------------------------------
# Chunked prefill: admissions longer than ``prefill_chunk`` fill the slot
# KV in pieces with decode bursts in between. The chunk schedule changes
# WHEN work happens, never tokens — every stream must stay identical to
# solo generation, including the in-flight streams the chunks interleave
# with.
# ---------------------------------------------------------------------------

def test_chunked_prefill_matches_solo(model):
    # chunk_adaptive=False pins the r03 always-chunk behavior so every
    # boundary case exercises the chunked executables
    eng = _engine(model, prefill_chunk=8, chunk_adaptive=False)
    rng = np.random.default_rng(7)
    # lengths straddling chunk boundaries: 2 chunks ragged, exact
    # multiple, 3 chunks ragged, 4 chunks with 1-token tail
    for plen in (9, 16, 17, 31, 25):
        prompt = [int(t) for t in rng.integers(3, 200, size=plen)]
        req = eng.submit(prompt, max_new_tokens=10)
        eng.run_until_idle()
        assert req.result() == _solo(model, prompt, 10), plen
    assert eng.stats["chunked_admits"] == 5


def test_adaptive_chunking_idle_fast_path(model):
    """r04 policy: an idle engine admits long prompts monolithically
    (nothing can stall; chunk passes would only multiply the weight-read
    bill) — token-identical either way. With a live stream, the same
    prompt chunks."""
    eng = _engine(model, prefill_chunk=8)
    rng = np.random.default_rng(7)
    prompt = [int(t) for t in rng.integers(3, 200, size=25)]
    req = eng.submit(prompt, max_new_tokens=10)
    eng.run_until_idle()
    assert req.result() == _solo(model, prompt, 10)
    assert eng.stats["chunked_admits"] == 0
    assert eng.stats["chunk_idle_monolithic"] == 1

    # now with an in-flight stream: chunked path engages
    runner = eng.submit([21, 8, 4], max_new_tokens=24)
    eng.step()
    req2 = eng.submit(prompt, max_new_tokens=10)
    eng.run_until_idle()
    assert eng.stats["chunked_admits"] == 1
    assert req2.result() == _solo(model, prompt, 10)
    assert runner.result() == _solo(model, [21, 8, 4], 24)


def test_adaptive_chunk_size_caps_pass_count(model):
    """Long prompts scale the chunk width up (menu C/2C/4C) so one
    admission is at most chunk_max_passes passes."""
    eng = _engine(model, prefill_chunk=4, max_len=128,
                  prompt_buckets=(8, 16, 32, 64), chunk_max_passes=4)
    assert eng._chunk_size_for(15) == 4    # 4 passes of 4
    assert eng._chunk_size_for(17) == 8    # 5 passes of 4 → width 8
    assert eng._chunk_size_for(32) == 8
    assert eng._chunk_size_for(33) == 16   # width 16
    assert eng._chunk_size_for(64) == 16
    rng = np.random.default_rng(3)
    prompt = [int(t) for t in rng.integers(3, 200, size=33)]
    runner = eng.submit([21, 8, 4], max_new_tokens=30)
    eng.step()
    req = eng.submit(prompt, max_new_tokens=8)
    eng.run_until_idle()
    assert eng.stats["chunked_admits"] == 1
    assert req.result() == _solo(model, prompt, 8)
    assert runner.result() == _solo(model, [21, 8, 4], 30)


def test_chunked_prefill_short_prompts_stay_monolithic(model):
    eng = _engine(model, prefill_chunk=8)
    req = eng.submit([5, 9, 14, 3, 7], max_new_tokens=8)
    eng.run_until_idle()
    assert req.result() == _solo(model, [5, 9, 14, 3, 7], 8)
    assert eng.stats["chunked_admits"] == 0


def test_chunked_prefill_with_inflight_decodes(model):
    """Chunks interleave with decode bursts for occupied slots; neither
    stream may perturb the other (burst cache writes for the filling row
    are masked and land where the next chunk overwrites them)."""
    eng = _engine(model, prefill_chunk=8, max_slots=3)
    runners = [[21, 8, 4], [1, 2, 3, 4, 5]]
    r_reqs = [eng.submit(p, max_new_tokens=24) for p in runners]
    eng.step()  # admit runners, first burst
    long_prompt = [int(t) for t in
                   np.random.default_rng(11).integers(3, 200, size=29)]
    c_req = eng.submit(long_prompt, max_new_tokens=10)
    eng.run_until_idle()
    assert eng.stats["chunked_admits"] == 1
    assert c_req.result() == _solo(model, long_prompt, 10)
    for p, req in zip(runners, r_reqs):
        assert req.result() == _solo(model, p, 24), p


def test_chunked_prefill_int8_kv():
    cfg = Qwen2Config(**{**Qwen2Config.tiny_test().__dict__,
                         "kv_cache_bits": 8})
    m8 = Qwen2Model(cfg, seed=3)
    eng = _engine(m8, prefill_chunk=8, max_slots=2)
    runner = eng.submit([21, 8, 4], max_new_tokens=20)
    eng.step()
    prompt = [int(t) for t in
              np.random.default_rng(13).integers(3, 200, size=19)]
    req = eng.submit(prompt, max_new_tokens=8)
    eng.run_until_idle()
    assert eng.stats["chunked_admits"] == 1
    assert req.result() == _solo(m8, prompt, 8)
    assert runner.result() == _solo(m8, [21, 8, 4], 20)


def test_chunked_prefill_under_spec_bursts(model):
    """Spec bursts write (K+1)-wide masked segments at the filling row's
    frontier; chunk overwrites must keep the final stream exact, and the
    chunked row's own drafting must see the full prompt in buf."""
    eng = _engine(model, prefill_chunk=8, spec=True, max_slots=3)
    runner = eng.submit([7, 7, 7, 7], max_new_tokens=20)
    eng.step()
    prompt = [int(t) for t in
              np.random.default_rng(17).integers(3, 200, size=23)]
    req = eng.submit(prompt, max_new_tokens=12)
    eng.run_until_idle()
    assert eng.stats["chunked_admits"] == 1
    assert req.result() == _solo(model, prompt, 12)
    assert runner.result() == _solo(model, [7, 7, 7, 7], 20)


def test_chunked_prefill_repetition_penalty_spans_chunks(model):
    """The seen set accumulates across chunks — a token from chunk 0 must
    still be penalized when sampling after the final chunk."""
    eng = _engine(model, prefill_chunk=8)
    # repeated motif across every chunk boundary
    prompt = [5, 9, 5, 9, 5, 9, 5, 9, 14, 3, 14, 3, 14, 3, 14, 3, 7, 21]
    req = eng.submit(prompt, max_new_tokens=10, repetition_penalty=1.4)
    eng.run_until_idle()
    assert req.result() == _solo(model, prompt, 10,
                                 repetition_penalty=1.4)


def test_chunked_prefill_slot_reuse_resets_seen(model):
    """First chunk must RESET the slot's seen row: a token from the
    previous occupant's stream may not leak penalty onto the new one."""
    eng = _engine(model, prefill_chunk=8, max_slots=1,
                  chunk_adaptive=False)
    first = eng.submit([50, 51, 52, 50, 51, 52], max_new_tokens=12,
                       repetition_penalty=1.5)
    eng.run_until_idle()
    assert first.result() == _solo(model, [50, 51, 52, 50, 51, 52], 12,
                                   repetition_penalty=1.5)
    prompt = [int(t) for t in
              np.random.default_rng(19).integers(100, 200, size=21)]
    second = eng.submit(prompt, max_new_tokens=10, repetition_penalty=1.5)
    eng.run_until_idle()
    assert eng.stats["chunked_admits"] >= 1
    assert second.result() == _solo(model, prompt, 10,
                                    repetition_penalty=1.5)


def test_chunked_prefill_mixed_with_prefix_admissions(model):
    """Prefix-cache admissions and chunked admissions share the pool."""
    eng = _engine(model, prefill_chunk=8, max_slots=2)
    pre = [5, 9, 14, 3]
    pid = eng.register_prefix(pre)
    full = pre + [11, 12]
    long_prompt = [int(t) for t in
                   np.random.default_rng(23).integers(3, 200, size=21)]
    r1 = eng.submit(full, max_new_tokens=8, prefix_id=pid)
    r2 = eng.submit(long_prompt, max_new_tokens=8)
    eng.run_until_idle()
    assert eng.stats["prefix_admits"] == 1
    assert eng.stats["chunked_admits"] == 1
    assert r1.result() == _solo(model, full, 8)
    assert r2.result() == _solo(model, long_prompt, 8)


# ---------------------------------------------------------------------------
# Request cancellation: pending requests never admit; in-flight requests
# free their slot at the next scheduler iteration. Other streams must be
# unaffected.
# ---------------------------------------------------------------------------

def test_cancel_pending_request(model):
    eng = _engine(model, max_slots=1)
    blocker = eng.submit([5, 9, 14], max_new_tokens=16)
    waiting = eng.submit([21, 8, 4], max_new_tokens=16)
    assert eng.cancel(waiting) is True
    eng.run_until_idle()
    assert waiting.cancelled and waiting.finished
    assert waiting.result() == []
    assert blocker.result() == _solo(model, [5, 9, 14], 16)


def test_cancel_inflight_frees_slot_and_stops_stream(model):
    eng = _engine(model, max_slots=2)
    victim = eng.submit([5, 9, 14, 3, 7], max_new_tokens=64)
    bystander = eng.submit([21, 8, 4], max_new_tokens=20)
    eng.step()  # both admitted, one burst
    assert eng.cancel(victim) is True
    eng.step()  # reap happens before the burst
    n_after_reap = len(victim.tokens)
    assert victim.finished and victim.cancelled
    # a follow-up request reuses the freed slot and decodes exactly
    follow = eng.submit([1, 2, 3, 4], max_new_tokens=10)
    eng.run_until_idle()
    assert len(victim.tokens) == n_after_reap  # stream stopped
    assert bystander.result() == _solo(model, [21, 8, 4], 20)
    assert follow.result() == _solo(model, [1, 2, 3, 4], 10)


def test_cancel_finished_request_returns_false(model):
    eng = _engine(model)
    req = eng.submit([5, 9, 14], max_new_tokens=4)
    eng.run_until_idle()
    assert req.finished
    assert eng.cancel(req) is False
    assert not req.cancelled


def test_cancel_inflight_under_spec(model):
    eng = _engine(model, spec=True, max_slots=2)
    victim = eng.submit([5, 9, 14, 3, 7], max_new_tokens=64)
    bystander = eng.submit([7, 7, 7, 7], max_new_tokens=20)
    eng.step()
    eng.cancel(victim)
    eng.run_until_idle()
    assert victim.finished and victim.cancelled
    assert bystander.result() == _solo(model, [7, 7, 7, 7], 20)


def test_cancel_flag_survives_overflow_requeue(model):
    """A cancellation that lands while the request is outside _pending
    (mid-swap overflow in step()) must still prevent admission — the
    flag travels with the request, not a side id-set."""
    eng = _engine(model, max_slots=1)
    blocker = eng.submit([5, 9, 14], max_new_tokens=30)
    victim = eng.submit([21, 8, 4], max_new_tokens=30)
    # simulate the mid-swap window: flag directly, as cancel() would when
    # the request is in neither _pending nor a slot
    victim.cancelled = True
    eng.run_until_idle()
    assert victim.finished
    assert victim.result() == []  # never admitted, never decoded
    assert blocker.result() == _solo(model, [5, 9, 14], 30)


def test_w4_matmul_rejects_unknown_unpack():
    import jax.numpy as jnp
    import pytest as _pytest

    from automative_rag_tpu.ops.quant_matmul import pack_w4, w4_matmul

    rng = np.random.default_rng(0)
    w = rng.normal(size=(128, 128)).astype(np.float32)
    packed, scale = pack_w4(w)
    x = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
    with _pytest.raises(ValueError, match="unpack"):
        w4_matmul(x, jnp.asarray(packed), jnp.asarray(scale),
                  interpret=True, unpack="int32")


def test_warmup_compiles_every_bucket(model):
    eng = _engine(model)
    info = eng.warmup()
    assert info["compiled_buckets"] == 3
    # every prompt bucket's SINGLE admission program is resident (the
    # cache also holds ("multi", bucket, size) batched-admission keys)
    assert {8, 16, 32} <= set(eng._prefill_cache)
    # engine still serves correctly afterwards
    req = eng.submit([5, 9, 14, 3, 7], max_new_tokens=8)
    eng.run_until_idle()
    assert req.result() == _solo(model, [5, 9, 14, 3, 7], 8)


def test_warmup_chunked_compiles_fill_variants(model):
    eng = _engine(model, prefill_chunk=8)
    eng.warmup()
    # buckets 16/32 admit chunked: first and non-first fill variants plus
    # the final-chunk program and the interleave burst are all compiled
    assert {(8, True), (8, False)} <= set(eng._chunk_fill_cache)
    assert 8 in eng._chunk_last_cache
    assert eng.chunk_burst in eng._burst_cache


def test_warmup_with_background_thread(model):
    eng = _engine(model)
    eng.start()
    try:
        info = eng.warmup()
        assert info["compiled_buckets"] == 3
        req = eng.submit([21, 8, 4], max_new_tokens=6)
        assert req.result(timeout=60) == _solo(model, [21, 8, 4], 6)
    finally:
        eng.stop()


def test_raising_on_token_callback_does_not_kill_engine(model):
    """on_token is external code on the scheduler thread — a raising
    callback loses its own stream, never the engine."""
    eng = _engine(model, max_slots=2)
    eng.start()
    try:
        def boom(_toks):
            raise RuntimeError("client code exploded")

        bad = eng.submit([5, 9, 14], max_new_tokens=8, on_token=boom)
        good = eng.submit([21, 8, 4], max_new_tokens=8)
        assert good.result(timeout=120) == _solo(model, [21, 8, 4], 8)
        assert bad.result(timeout=120) == _solo(model, [5, 9, 14], 8)
        # engine thread alive and serving
        again = eng.submit([1, 2, 3], max_new_tokens=4)
        assert again.result(timeout=120) == _solo(model, [1, 2, 3], 4)
    finally:
        eng.stop()


def test_warmup_is_idempotent(model):
    eng = _engine(model)
    first = eng.warmup()
    before = dict(eng.stats)
    second = eng.warmup()
    assert second is first
    assert eng.stats["prefills"] == before["prefills"]  # no new traffic


def test_register_prefix_warm_compiles_suffix_buckets(model):
    eng = _engine(model)
    pid = eng.register_prefix([5, 9, 14, 3, 7], warm=True)
    # every usable suffix bucket's admission program is resident
    usable = [b for b in eng.prompt_buckets if 5 + b <= eng._gen_base]
    assert usable and set(usable) <= set(eng._prefix_admit_cache)
    req = eng.submit([5, 9, 14, 3, 7, 11], max_new_tokens=6,
                     prefix_id=pid)
    eng.run_until_idle()
    assert req.result() == _solo(model, [5, 9, 14, 3, 7, 11], 6)


def test_submit_restarts_dead_scheduler_thread(model):
    """If the scheduler thread ever dies, submit() self-heals instead of
    letting callers block until their 600s timeout."""
    import threading

    eng = _engine(model)
    eng.start()
    try:
        dead = threading.Thread(target=lambda: None)
        dead.start()
        dead.join()
        eng._stop = True           # stop the real loop
        eng._wake.set()
        eng._thread.join(timeout=10)
        eng._stop = False
        eng._thread = dead         # simulate a dead scheduler
        req = eng.submit([5, 9, 14], max_new_tokens=6)
        assert req.result(timeout=120) == _solo(model, [5, 9, 14], 6)
    finally:
        eng.stop()


def test_prefixed_long_suffix_is_chunked(model):
    """A prefixed admission with a long suffix chunks the suffix (prefix
    KV seeded by copies) instead of one monolithic segment pass — and
    stays token-identical."""
    eng = _engine(model, prefill_chunk=8, max_slots=2)
    prefix = [5, 9, 14, 3]
    pid = eng.register_prefix(prefix)
    runner = eng.submit([21, 8, 4], max_new_tokens=24)
    eng.step()
    suffix = [int(t) for t in
              np.random.default_rng(29).integers(3, 200, size=17)]
    full = prefix + suffix
    req = eng.submit(full, max_new_tokens=8, prefix_id=pid)
    eng.run_until_idle()
    assert eng.stats["prefix_admits"] == 1
    assert eng.stats["chunked_admits"] == 1  # the suffix went chunked
    assert req.result() == _solo(model, full, 8)
    assert runner.result() == _solo(model, [21, 8, 4], 24)


def test_step_failure_recovers_engine_and_requeues(model):
    """A dispatch failure mid-step must not brick the engine: donated
    state rebuilds, in-flight requests fail fast (cancelled), pending
    requests survive and serve on the next step."""
    eng = _engine(model, max_slots=1)  # queued stays in overflow
    inflight = eng.submit([5, 9, 14], max_new_tokens=40)
    eng.step()
    assert not inflight.finished
    queued = eng.submit([21, 8, 4], max_new_tokens=6)

    real_burst = eng._run_burst
    calls = {"n": 0}

    def boom(steps=None):
        calls["n"] += 1
        raise RuntimeError("simulated relay failure")

    eng._run_burst = boom
    with pytest.raises(RuntimeError):
        eng.step()
    eng._run_burst = real_burst
    assert eng.stats["engine_resets"] == 1
    # in-flight row lost its KV → failed fast, result unblocks
    assert inflight.finished and inflight.cancelled
    # pending request survived the reset and completes exactly
    eng.run_until_idle()
    assert queued.result() == _solo(model, [21, 8, 4], 6)
    # engine fully serviceable afterwards
    again = eng.submit([1, 2, 3], max_new_tokens=5)
    eng.run_until_idle()
    assert again.result() == _solo(model, [1, 2, 3], 5)


def test_register_prefix_rejects_unusable_prefix(model):
    """A prefix leaving no room for any suffix bucket must not register
    (the blob would leak in HBM with every submit missing forever)."""
    eng = _engine(model)  # buckets (8,16,32), gen_base 32
    with pytest.raises(ValueError, match="suffix"):
        eng.register_prefix(list(range(3, 31)))  # 28 + 8 > 32


def test_truncated_prompts_stat(model):
    eng = _engine(model)
    req = eng.submit(list(range(3, 3 + 40)), max_new_tokens=4)  # > 32
    eng.run_until_idle()
    req.result()
    assert eng.stats["truncated_prompts"] == 1


def test_prefixed_chunked_int8_kv():
    cfg = Qwen2Config(**{**Qwen2Config.tiny_test().__dict__,
                         "kv_cache_bits": 8})
    m8 = Qwen2Model(cfg, seed=3)
    eng = _engine(m8, prefill_chunk=8, max_slots=2,
                  chunk_adaptive=False)
    prefix = [5, 9, 14, 3]
    pid = eng.register_prefix(prefix)
    suffix = [int(t) for t in
              np.random.default_rng(31).integers(3, 200, size=13)]
    full = prefix + suffix
    req = eng.submit(full, max_new_tokens=8, prefix_id=pid)
    eng.run_until_idle()
    assert eng.stats["prefix_admits"] == 1
    assert eng.stats["chunked_admits"] == 1
    assert req.result() == _solo(m8, full, 8)


def test_submit_cancel_storm(model):
    """Randomized submit/cancel storm: N threads fire requests and cancel
    ~half of them at random points while the scheduler runs. Invariants:
    every request reaches a terminal state (no hung result()), cancelled
    requests stop, survivors stay token-identical to the solo oracle, and
    the engine keeps serving afterwards."""
    import random
    import threading

    eng = _engine(model, spec=True, prefill_chunk=8)
    eng.start()
    try:
        errors = []

        def worker(seed):
            rng = random.Random(seed)
            for i in range(12):
                prompt = [int(t) for t in
                          rng.sample(range(3, 200), rng.randint(3, 14))]
                req = eng.submit(prompt, max_new_tokens=rng.randint(1, 8))
                if rng.random() < 0.5:
                    if rng.random() < 0.5:
                        import time as _t
                        _t.sleep(rng.random() * 0.05)
                    eng.cancel(req)
                    try:
                        req.result(timeout=60)
                    except TimeoutError:
                        errors.append(f"cancelled req hung (seed {seed})")
                        return
                else:
                    try:
                        got = req.result(timeout=120)
                    except TimeoutError:
                        errors.append(f"live req hung (seed {seed})")
                        return
                    want = _solo(model, prompt, req.max_new_tokens)
                    if not req.cancelled and got != want:
                        errors.append(
                            f"token mismatch seed {seed} iter {i}")
                        return

        threads = [threading.Thread(target=worker, args=(s,))
                   for s in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
            assert not t.is_alive(), "storm worker wedged"
        assert not errors, errors[:3]
        assert eng.stats.get("scheduler_errors", 0) == 0
        # engine still healthy after the storm
        final = eng.submit([5, 6, 7], max_new_tokens=4)
        assert final.result(timeout=60) == _solo(model, [5, 6, 7], 4)
    finally:
        eng.stop()


def test_release_frees_state_and_refuses_further_work(model):
    """release() is the bench/A-B teardown path: the KV pool's device
    buffers are deleted immediately, and nothing afterwards can
    reallocate them (a post-release step() must not take the
    _recover_state path, which would rebuild the freed pool)."""
    eng = _engine(model)
    prompt = [5, 9, 14, 3, 7]
    req = eng.submit(prompt, max_new_tokens=6)
    eng.run_until_idle()
    assert req.result() == _solo(model, prompt, 6)
    pid = eng.register_prefix([4, 6, 8, 10])
    state_leaves = [l for l in __import__("jax").tree_util.tree_leaves(
        eng._state) if hasattr(l, "is_deleted")]
    blob_leaves = [l for l in __import__("jax").tree_util.tree_leaves(
        eng._prefixes[pid]["blobs"]) if hasattr(l, "is_deleted")]
    eng.release()
    assert all(l.is_deleted() for l in state_leaves)
    assert all(l.is_deleted() for l in blob_leaves)
    with pytest.raises(RuntimeError):
        eng.submit(prompt, max_new_tokens=4)
    with pytest.raises(RuntimeError):
        eng.step()
    assert eng.stats["engine_resets"] == 0  # recovery never reallocated


def test_release_fails_inflight_and_pending_requests(model):
    eng = _engine(model, max_slots=1)
    inflight = eng.submit([5, 9, 14], max_new_tokens=40)
    eng.step()  # admit
    pending = eng.submit([7, 3, 2], max_new_tokens=4)
    eng.release()
    assert inflight.finished and inflight.cancelled
    assert pending.finished and pending.cancelled
    assert pending.result() is not None  # unblocks, no hang


# ------------------------------------------------------- admission pacing


def test_admit_pacing_trickles_admissions_one_per_step(model):
    """With live streams, a pileup admits ONE request per scheduler step
    (each stacked prefill would stall every in-flight stream), and the
    paced requests stay token-identical to solo generation."""
    eng = _engine(model, admit_pacing=True, admit_pacing_group=1)
    r0 = eng.submit([5, 9, 14], max_new_tokens=24)
    eng.step()
    assert sum(s is not None for s in eng._slots) == 1
    prompts = [[i + 2, i + 5] for i in range(3)]
    rs = [eng.submit(p, max_new_tokens=6) for p in prompts]
    eng.step()
    assert sum(s is not None for s in eng._slots) == 2
    assert len(eng._pending) == 2
    eng.step()
    assert sum(s is not None for s in eng._slots) == 3
    eng.run_until_idle()
    assert r0.result() == _solo(model, [5, 9, 14], 24)
    for p, r in zip(prompts, rs):
        assert r.result() == _solo(model, p, 6), p


def test_admit_pacing_group_admits_batched_pairs(model):
    """The default pacing group (2) drains a backlog two requests per
    step in ONE batched-prefill dispatch each — half the admission
    dispatches of per-request trickling at ~the same stream stall (a
    2-row prefill costs ~1.3x a 1-row one, not 2x). Token parity holds."""
    eng = _engine(model, admit_pacing=True)
    assert eng.admit_pacing_group == 2
    r0 = eng.submit([5, 9, 14], max_new_tokens=24)
    eng.step()
    assert sum(s is not None for s in eng._slots) == 1
    prompts = [[i + 2, i + 5] for i in range(3)]
    rs = [eng.submit(p, max_new_tokens=6) for p in prompts]
    eng.step()  # paced group of 2
    assert sum(s is not None for s in eng._slots) == 3
    assert len(eng._pending) == 1
    eng.run_until_idle()
    assert r0.result() == _solo(model, [5, 9, 14], 24)
    for p, r in zip(prompts, rs):
        assert r.result() == _solo(model, p, 6), p


def test_admit_pacing_off_stacks_admissions(model):
    eng = _engine(model, admit_pacing=False)
    eng.submit([5, 9, 14], max_new_tokens=24)
    eng.step()
    rs = [eng.submit([i + 2, i + 5], max_new_tokens=6) for i in range(3)]
    eng.step()  # all three admit in one step
    assert sum(s is not None for s in eng._slots) == 4
    assert not eng._pending
    eng.run_until_idle()
    for r in rs:
        assert r.finished


def test_admit_pacing_idle_engine_admits_full_batch(model):
    """Nothing live = nothing can observe a stall: a burst of arrivals
    into an idle engine admits monolithically in one step."""
    eng = _engine(model, admit_pacing=True)
    rs = [eng.submit([i + 2, i + 5], max_new_tokens=8) for i in range(3)]
    eng.step()
    assert sum(s is not None for s in eng._slots) == 3
    eng.run_until_idle()
    for r in rs:
        assert r.finished


def test_paced_backlog_drains_with_short_bursts(model):
    """While a paced backlog exists the interleave burst is the SHORT
    (chunk_burst) length — streams deliver more often and the next
    admission happens sooner — and full bursts resume once it clears."""
    eng = _engine(model, admit_pacing=True, admit_pacing_group=1,
                  burst=8, chunk_burst=2)
    streamer = eng.submit([5, 9, 14], max_new_tokens=40)
    eng.step()  # idle admit + full burst
    base = int(np.asarray(eng._state["gen_count"])[0])
    rs = [eng.submit([i + 2, i + 5], max_new_tokens=4) for i in range(2)]
    eng.step()  # paced admit #1, backlog remains -> short burst
    after = int(np.asarray(eng._state["gen_count"])[0])
    assert after - base == 2  # chunk_burst, not burst
    eng.step()  # paced admit #2, backlog clear -> full burst again
    final = int(np.asarray(eng._state["gen_count"])[0])
    assert final - after == 8
    eng.run_until_idle()
    assert streamer.result() == _solo(model, [5, 9, 14], 40)
    for r in rs:
        assert r.finished


def test_warmup_compiles_paced_drain_burst(model):
    """warmup() must reach the SHORT drain burst (steps=chunk_burst) —
    it only runs on a step with (paced AND overflow), which single-bucket
    geometries with few chunk plans never produce organically; the cold
    executable read as a 26-37 s stall inside r05's measured stall
    sections on hardware."""
    eng = _engine(model, admit_pacing=True, burst=8, chunk_burst=2)
    eng.warmup()
    assert 2 in eng._burst_cache, sorted(eng._burst_cache)
    # and the full burst too, of course
    assert 8 in eng._burst_cache, sorted(eng._burst_cache)
