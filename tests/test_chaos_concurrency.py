"""Chaos soak over the index/sparse/chain core: concurrent ingest, query,
delete, compaction, checkpointing, and live config mutation against ONE
app. The serving-engine interplay has its own soak
(test_soak_concurrency.py); this one targets the retrieval-state surface
where the session's hardening landed (paired sparse appends, compaction
row remaps, atomic chain persistence, blend bounds) — every operation must
either succeed or be a defined no-op, never corrupt state or throw.
"""

import os
import random
import threading
import time

import pytest

from automative_rag_tpu.app import RAGApplication
from automative_rag_tpu.config.settings import Settings

# per worker role — bounded for CI; CHAOS_OPS=200 for a long manual soak
N_OPS = int(os.environ.get("CHAOS_OPS", "25"))

MODELS = ["汉EV", "Model 3", "X5", "P7", "海豹"]
BRANDS = {"汉EV": "比亚迪", "Model 3": "特斯拉", "X5": "宝马",
          "P7": "小鹏", "海豹": "比亚迪"}


@pytest.fixture(params=["flat", "sharded", "ivf"])
def app(tmp_path, request):
    settings = Settings(
        data_dir=str(tmp_path / "data"),
        index_dir=str(tmp_path / "data" / "index"),
        index_kind=request.param,
    )
    app = RAGApplication(settings=settings, tiny=True, tiny_dim=128)
    yield app
    app.shutdown()


def _doc_text(rng):
    model = rng.choice(MODELS)
    value = rng.randrange(400, 999)
    return (f"{model} {2020 + rng.randrange(5)}款 续航里程为{value}公里。",
            BRANDS[model])


def _wait_job(app, job_id, timeout=30.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        job = app.tracker.get_job(job_id)
        if job and job["status"] in ("completed", "failed"):
            return job
        time.sleep(0.01)
    raise TimeoutError(job_id)


def test_chaos_ingest_query_compact_checkpoint(app, tmp_path):
    errors = []
    stop = threading.Event()

    def guard(fn):
        def run():
            try:
                fn()
            except Exception as exc:  # noqa: BLE001 — the assertion surface
                errors.append(f"{fn.__name__}: {type(exc).__name__}: {exc}")
                stop.set()
        return run

    # seed corpus so queriers never see an empty index
    rng0 = random.Random(0)
    for _ in range(10):
        text, brand = _doc_text(rng0)
        job = app.ingest_text(text, metadata={"manufacturer": brand})
        assert _wait_job(app, job)["status"] == "completed"

    @guard
    def ingester():
        rng = random.Random(1)
        for _ in range(N_OPS):
            if stop.is_set():
                return
            text, brand = _doc_text(rng)
            job = app.ingest_text(text, metadata={"manufacturer": brand})
            _wait_job(app, job)

    @guard
    def querier():
        rng = random.Random(2)
        for _ in range(N_OPS):
            if stop.is_set():
                return
            model = rng.choice(MODELS)
            ranked = app.engine.retrieve(f"{model}的续航里程是多少？",
                                         rerank=rng.random() < 0.7)
            assert isinstance(ranked, list)
            if rng.random() < 0.3:
                job = app.query_sync(f"{model}续航多少公里", mode="facts",
                                     timeout=60)
                assert job["status"] in ("completed", "failed")

    @guard
    def mutator():
        rng = random.Random(3)
        for i in range(N_OPS):
            if stop.is_set():
                return
            roll = rng.random()
            if roll < 0.35:
                app.compact_index()
            elif roll < 0.6:
                app.index.delete_by_filter(
                    {"manufacturer": rng.choice(list(BRANDS.values()))})
            elif roll < 0.8:
                app.rebuild_index()  # IVF: fold the fresh tail into lists
            else:
                app.engine.sparse_rerank_weight = rng.choice([0.0, 0.2, 0.4])
            time.sleep(0.01)

    @guard
    def checkpointer():
        rng = random.Random(4)
        for i in range(6):
            if stop.is_set():
                return
            app.save_index(str(tmp_path / "ckpt"))
            if rng.random() < 0.5:
                app.load_index(str(tmp_path / "ckpt"))
            time.sleep(0.05)

    threads = [threading.Thread(target=t)
               for t in (ingester, querier, mutator, checkpointer)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive(), "chaos worker wedged"
    assert not errors, errors[:3]

    # invariants after the storm: paired row alignment and a working query
    if app.sparse_index is not None:
        assert app.sparse_index.rows == app.index.total_rows
    if app.token_store is not None:
        assert app.token_store.rows == app.index.total_rows
    job = app.query_sync("汉EV的续航里程是多少？", mode="facts", timeout=60)
    assert job["status"] == "completed"
