"""Full-stack concurrency soak: N llm-queue workers feeding the
continuous-batching serving engine through the real app + API, with
prefix caching, chunked prefill, and speculative bursts all enabled.

The engine is tested token-exactly in tests/test_serving.py; this test
exercises the INTERPLAY — queue workers, job chains, tracker streaming,
and the engine's scheduler thread under genuinely concurrent queries —
where deadlocks and state races would live. (Reference serializes all
generation on one GPU pipeline, so it has no equivalent surface.)
"""

import dataclasses
import json
import threading
import time

import pytest

from automative_rag_tpu.api.app import build_api
from automative_rag_tpu.app import RAGApplication
from automative_rag_tpu.config.settings import Settings


class _CharTok:
    """4-char-group tokenizer — compresses like real BPE (the mode header
    lands ~150 tokens, not 600), so prefix-cache suffix buckets fit."""

    def __call__(self, text):
        ids = [3 + (hash(text[i:i + 4]) % 250)
               for i in range(0, min(len(text), 4000), 4)]
        return {"input_ids": ids}

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + (t % 26)) for t in ids)


@pytest.fixture(scope="module")
def served_app(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("soak")
    settings = Settings(
        data_dir=str(tmp / "data"),
        index_dir=str(tmp / "data" / "index"),
        llm_concurrency=3,
    )
    app = RAGApplication(settings=settings, tiny=True)
    # the image ships no checkpoints, so the app wires the extractive
    # stub; swap in a serving-enabled tiny decoder to exercise the real
    # concurrent path (what load_llm+enable_serving produce with weights)
    from automative_rag_tpu.generation.llm import JaxCausalLM
    from automative_rag_tpu.models.qwen2 import Qwen2Config

    cfg = dataclasses.replace(Qwen2Config.tiny_test(), max_positions=4096)
    llm = JaxCausalLM("", config=cfg, tokenizer=_CharTok())
    llm.enable_serving(max_slots=4, max_len=2048, burst=8, spec=True,
                       prefill_chunk=256)
    app.generator.llm = llm
    yield app
    llm._serving.stop()
    app.shutdown()


def test_concurrent_queries_through_full_stack(served_app):
    app = served_app
    api = build_api(app)

    def call(method, path, body=None):
        raw = json.dumps(body, ensure_ascii=False).encode() if body else b""
        status, payload, _ = api.dispatch(method, path, {}, raw)
        return status, json.loads(payload)

    # seed a few documents
    ingest_ids = []
    for i, (make, model) in enumerate(
            [("宝马", "X5"), ("特斯拉", "Model Y"), ("比亚迪", "汉EV")]):
        status, body = call("POST", "/ingest/text", {
            "content": f"2023款{make}{model}的百公里加速是{4 + i}.5秒。",
            "metadata": {"manufacturer": make, "model": model,
                         "year": 2023},
        })
        assert status == 200
        ingest_ids.append(body["job_id"])
    deadline = time.time() + 120
    for jid in ingest_ids:
        assert app.tracker.wait_for_terminal(
            jid, timeout=max(deadline - time.time(), 1)) == "completed"

    # fire 12 concurrent queries across modes; 3 llm workers share the
    # engine's slot pool
    queries = [("X5的加速是多少", "facts"),
               ("Model Y性能如何", "features"),
               ("汉EV适合家用吗", "scenarios"),
               ("X5和Model Y怎么选", "tradeoffs")] * 3
    job_ids, errs = [], []

    def submit(q, mode):
        try:
            status, body = call("POST", "/query",
                                {"query": q, "mode": mode})
            assert status == 200, body
            job_ids.append(body["job_id"])
        except Exception as exc:  # noqa: BLE001 — surfaced below
            errs.append(exc)

    threads = [threading.Thread(target=submit, args=qm) for qm in queries]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not errs and len(job_ids) == len(queries)

    deadline = time.time() + 300
    for jid in job_ids:
        status = app.tracker.wait_for_terminal(
            jid, timeout=max(deadline - time.time(), 1))
        assert status == "completed", (jid, status)
        job = app.tracker.get_job(jid)
        assert isinstance(job["result"].get("answer"), str)

    eng = app.generator.llm._serving
    stats = eng.stats
    assert stats["requests_completed"] >= len(queries)
    # the facts-mode header prefix registered and hit repeatedly
    assert stats["prefix_admits"] >= 1
    # engine fully drained — no stuck slots or pending work
    assert not any(eng._slots) and not eng._pending
    # workers all healthy after the storm
    assert all(state in ("healthy", "unknown")
               for state in app.queue_manager.worker_health().values())
