"""End-to-end slice test: ingest → index → query → answer with citations,
all through the job-chain engine (the reference's own end-to-end script,
scripts/test_end_to_end.py, drives the same flow over HTTP)."""

import time

import pytest

from automative_rag_tpu.app import RAGApplication
from automative_rag_tpu.orchestration.job_tracker import JobStatus


@pytest.fixture(scope="module")
def app():
    application = RAGApplication(tiny=True)
    yield application
    application.shutdown()


def _wait(app, job_id, timeout=60.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        job = app.tracker.get_job(job_id)
        if job["status"] in ("completed", "failed", "timeout"):
            return job
        time.sleep(0.05)
    raise TimeoutError(str(app.tracker.get_job(job_id)))


CORPUS = [
    "宝马5系 2023款 530Li 百公里加速时间为6.9秒，最高时速250公里/小时。author: 测评君 source: text",
    "宝马X5 2022款是一款中大型SUV，搭载3.0T发动机，马力340匹。",
    "特斯拉Model 3 2023款续航606公里，百公里加速5.6秒。",
    "丰田凯美瑞 2021款混合动力版油耗4.1L。",
]


def test_ingest_text_jobs(app):
    for text in CORPUS:
        job = _wait(app, app.ingest_text(text))
        assert job["status"] == JobStatus.COMPLETED.value, job
        assert job["result"]["document_count"] >= 1
    assert app.index.count >= len(CORPUS)


def test_query_end_to_end(app):
    job = app.query_sync("宝马5系的加速时间是多少？", mode="facts", timeout=60)
    assert job["status"] == JobStatus.COMPLETED.value, job
    result = job["result"]
    assert "answer" in result
    assert "【来源：DOC_" in result["answer"]
    assert "6.9" in result["answer"]
    assert result["confidence"] > 0
    assert result["sources"]
    chain = result["chain"]
    assert set(chain["step_timings"]) == {"retrieve_documents", "llm_inference"}


def test_query_with_metadata_filter(app):
    job = app.query_sync(
        "加速时间", mode="facts", metadata_filter={"manufacturer": "特斯拉"}, timeout=60
    )
    assert job["status"] == JobStatus.COMPLETED.value
    for source in job["result"]["sources"]:
        assert source["metadata"]["manufacturer"] == "特斯拉"


def test_query_no_matches_filter(app):
    job = app.query_sync(
        "加速", mode="facts", metadata_filter={"manufacturer": "保时捷"}, timeout=60
    )
    assert job["status"] == JobStatus.COMPLETED.value
    assert job["result"]["sources"] == []
    assert "未找到" in job["result"]["answer"]


def test_index_checkpoint_roundtrip(app, tmp_path):
    directory = str(tmp_path / "ckpt")
    app.save_index(directory)
    count_before = app.index.count
    app.load_index(directory)
    assert app.index.count == count_before


@pytest.mark.parametrize("kind", ["flat", "ivf", "sharded", "sharded-ivf"])
def test_checkpoint_roundtrip_every_index_kind(kind, tmp_path):
    """Every INDEX_KIND must survive save → load with its kind AND its build
    artifacts intact (VERDICT r1 #5: sharded-ivf silently degraded to exact
    search after restore)."""
    from automative_rag_tpu.config.settings import Settings

    settings = Settings()
    settings.index_kind = kind
    app = RAGApplication(settings=settings, tiny=True)
    try:
        for text in CORPUS:
            assert _wait(app, app.ingest_text(text))["status"] == "completed"
        if hasattr(app.index, "rebuild"):
            app.index.rebuild()
        query = "宝马5系 加速时间"
        before = app.engine.retrieve(query, mode="facts", rerank=False)
        directory = str(tmp_path / "ckpt")
        app.save_index(directory)

        app.index = app._make_index()  # wipe, then restore through the app path
        app.engine.index = app.index
        app.load_index(directory)

        stats = app.index.stats()
        assert stats["kind"] == kind
        if kind == "ivf":
            assert stats["n_lists"] > 0 and stats["rows_indexed"] > 0
        if kind == "sharded-ivf":
            assert stats["built"], "restored sharded-ivf must keep its build"
            assert stats["rows_indexed"] > 0
        after = app.engine.retrieve(query, mode="facts", rerank=False)
        assert [d.metadata.get("model") for d, _ in after] == [
            d.metadata.get("model") for d, _ in before
        ]
        for (_, s_before), (_, s_after) in zip(before, after):
            assert abs(s_before - s_after) < 1e-3
    finally:
        app.shutdown()
        settings.index_kind = "flat"


def test_reset_index():
    app = RAGApplication(tiny=True)
    try:
        _ = _wait(app, app.ingest_text("测试文本 宝马X1 2020款"))
        assert app.index.count > 0
        result = app.reset_index()
        assert result["deleted_documents"] > 0
        assert app.index.count == 0
    finally:
        app.shutdown()


def test_sharded_app_serving():
    """index_kind=sharded: the whole app serves from a mesh-sharded corpus."""
    from automative_rag_tpu.config.settings import Settings

    settings = Settings()
    settings.index_kind = "sharded"
    app = RAGApplication(settings=settings, tiny=True)
    try:
        from automative_rag_tpu.parallel import ShardedFlatIndex

        assert isinstance(app.index, ShardedFlatIndex)
        job = _wait(app, app.ingest_text("小鹏G9 2023款续航702公里。"))
        assert job["status"] == JobStatus.COMPLETED.value
        result = app.query_sync("小鹏G9续航", timeout=60)
        assert result["status"] == JobStatus.COMPLETED.value
        assert "702" in result["result"]["answer"]
    finally:
        app.shutdown()
        settings.index_kind = "flat"


def test_concurrent_ingest_and_direct_search():
    """The direct API search paths (debug-retrieval, /query/batch) bypass
    the serialized queue; concurrent ingestion must not corrupt them."""
    import threading

    app = RAGApplication(tiny=True)
    try:
        seed_job = app.ingest_text("种子文档 长安UNI-T 2022款。")
        _wait(app, seed_job)

        errors = []
        stop = threading.Event()

        def searcher():
            while not stop.is_set():
                try:
                    app.engine.retrieve("长安 UNI-T", mode="facts")
                except Exception as exc:  # noqa: BLE001 — collecting races
                    errors.append(repr(exc))
                    return

        threads = [threading.Thread(target=searcher) for _ in range(3)]
        for t in threads:
            t.start()
        job_ids = [
            app.ingest_text(f"并发文档{i} 吉利星越L 2023款 功率{150 + i}kW。")
            for i in range(10)
        ]
        for jid in job_ids:
            _wait(app, jid)
        stop.set()
        for t in threads:
            t.join(timeout=10)
        assert not errors, errors
        assert app.index.count >= 11
        hits = app.engine.retrieve("星越L 功率")
        assert hits
    finally:
        app.shutdown()


def test_ivf_app_end_to_end():
    """index_kind=ivf through the whole app: ingest -> rebuild -> query."""
    from automative_rag_tpu.config.settings import Settings
    from automative_rag_tpu.index.ivf import IVFIndex

    settings = Settings()
    settings.index_kind = "ivf"
    app = RAGApplication(settings=settings, tiny=True)
    try:
        assert isinstance(app.index, IVFIndex)
        for i in range(12):
            _wait(app, app.ingest_text(f"测试车型{i} 功率{100 + i}kW，型号编号{i}。"))
        info = app.rebuild_index()
        assert info["rows_indexed"] >= 12
        result = app.query_sync("型号编号7 功率", timeout=60)
        assert result["status"] == JobStatus.COMPLETED.value
        assert "107" in result["result"]["answer"]
    finally:
        app.shutdown()
        settings.index_kind = "flat"


def test_retrieval_cache_hits_and_self_invalidates(tmp_path):
    """Repeated identical queries hit the fingerprinted cache; ANY ranking-
    relevant mutation (ingest, delete, live tunable) self-invalidates
    without explicit bump calls."""
    import time as _time

    from automative_rag_tpu.app import RAGApplication
    from automative_rag_tpu.config.settings import Settings

    settings = Settings(data_dir=str(tmp_path / "d"),
                        index_dir=str(tmp_path / "d" / "i"))
    app = RAGApplication(settings=settings, tiny=True, tiny_dim=64)
    try:
        for text, brand in (
            ("比亚迪汉EV续航715公里。", "比亚迪"),
            ("宝马X5油耗8.9升。", "宝马"),
        ):
            j = app.ingest_text(text, metadata={"manufacturer": brand})
            while app.tracker.get_job(j)["status"] not in ("completed", "failed"):
                _time.sleep(0.02)

        q = "汉EV续航多少公里"
        first = app.engine.retrieve(q, rerank=False)
        assert app.engine.last_timings.get("cached") is None
        second = app.engine.retrieve(q, rerank=False)
        assert app.engine.last_timings.get("cached") is True
        assert [d.page_content for d, _ in second] == \
            [d.page_content for d, _ in first]
        assert app.engine.cache_stats["hits"] >= 1

        # ingest invalidates (fingerprint shifts via total_rows)
        j = app.ingest_text("比亚迪汉EV 2025款续航730公里。",
                            metadata={"manufacturer": "比亚迪"})
        while app.tracker.get_job(j)["status"] not in ("completed", "failed"):
            _time.sleep(0.02)
        app.engine.retrieve(q, rerank=False)
        assert app.engine.last_timings.get("cached") is None

        # live tunable change invalidates
        app.engine.retrieve(q, rerank=False)
        assert app.engine.last_timings.get("cached") is True
        app.engine.sparse_rerank_weight = 0.4
        app.engine.retrieve(q, rerank=False)
        assert app.engine.last_timings.get("cached") is None

        # delete invalidates (count shifts)
        app.engine.retrieve(q, rerank=False)
        app.index.delete_by_filter({"manufacturer": "宝马"})
        app.engine.retrieve(q, rerank=False)
        assert app.engine.last_timings.get("cached") is None
    finally:
        app.shutdown()
