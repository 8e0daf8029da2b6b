"""Service/controller/schema layer tests (reference §2.6 inventory)."""

import time

import pytest

from automative_rag_tpu.app import RAGApplication
from automative_rag_tpu.controllers import WorkflowController
from automative_rag_tpu.documents import Document
from automative_rag_tpu.orchestration.task_models import TASK_CATALOG, TaskModel
from automative_rag_tpu.schemas.models import (
    EnhancedQueryRequest,
    MetadataFilter,
    QueryResponse,
)
from automative_rag_tpu.services import (
    CausationService,
    DocumentService,
    QueryService,
    SystemService,
    WorkflowService,
)


@pytest.fixture(scope="module")
def app():
    application = RAGApplication(tiny=True)
    jid = application.ingest_text("宝马X5 2022款马力340匹，百公里加速5.5秒。")
    while application.tracker.get_job(jid)["status"] not in ("completed", "failed"):
        time.sleep(0.05)
    yield application
    application.shutdown()


def test_schemas_validate():
    req = EnhancedQueryRequest(query="  宝马X5怎么样  ", mode="facts")
    assert req.query == "宝马X5怎么样"
    with pytest.raises(ValueError):
        EnhancedQueryRequest(query="   ")
    flt = MetadataFilter(manufacturer=["宝马"], year=2022)
    assert flt.compact() == {"manufacturer": ["宝马"], "year": 2022}
    resp = QueryResponse(job_id="x", status="pending")
    assert resp.sources == []


def test_query_service(app):
    service = QueryService(app.engine, app.generator)
    ranked = service.retrieve_documents("宝马X5 马力")
    assert ranked
    answer = service.generate_answer("宝马X5 马力", ranked)
    assert "340" in answer["answer"]
    assert service.extract_cited_sources(answer["answer"]) == ["DOC_1"]
    metrics = service.quality_metrics(answer["answer"], ranked, "facts")
    assert metrics["citation_rate"] > 0
    parsed = service.parse_structured_answer("优点：动力强\n缺点：油耗高", "tradeoffs")
    assert parsed["pros"] == ["动力强"] and parsed["cons"] == ["油耗高"]


def test_document_service():
    service = DocumentService()
    docs = service.process_source("text", {"content": "奥迪A6L 2023款配置丰富。"})
    assert docs
    quality = service.assess_document_quality(docs[0])
    assert not quality["garbled"]
    gated = service.filter_documents(
        [Document(page_content="好车"), Document(page_content="这是一段足够长的正常中文内容，描述车辆配置。")]
    )
    assert len(gated["kept"]) == 1 and len(gated["rejected"]) == 1


def test_system_service(app):
    service = SystemService(app)
    modes = service.get_query_modes()
    assert len(modes) == 6 and modes[0]["name"]
    assert "宝马" in service.get_manufacturers()
    debug = service.debug_retrieval("宝马X5")
    assert debug["analysis"]["count"] >= 1
    metrics = service.performance_metrics()
    assert metrics["index_documents"] >= 1


def test_workflow_service(app):
    service = WorkflowService(app)
    ctx = service.build_execution_context("llm_inference", {"mode": "debate"})
    assert ctx["steps"] == ["retrieve_documents", "llm_inference"]
    assert ctx["optimization"]["retrieval_k"] == 40
    job_id = service.start("text_processing", {"content": "特斯拉Model S 2022款", "metadata": {}})
    deadline = time.time() + 30
    while time.time() < deadline:
        status = service.status(job_id)
        if status["status"] in ("completed", "failed"):
            break
        time.sleep(0.05)
    assert status["status"] == "completed"
    eff = service.efficiency_score(job_id)
    assert eff and eff["slowest_step"] in ("process_text", "generate_embeddings")


def test_causation_stub():
    service = CausationService()
    out = service.analyze("为什么刹车异响")
    assert out["implemented"] is False and out["roadmap"]


def test_workflow_controller(app):
    controller = WorkflowController(app)
    assert controller.validate_query("", "bogus")["issues"]
    submitted = controller.submit_query("宝马X5 加速", mode="facts")
    job_id = submitted["job_id"]
    deadline = time.time() + 60
    while time.time() < deadline:
        status = controller.get_query_result(job_id)
        if status["status"] in ("completed", "failed"):
            break
        time.sleep(0.05)
    assert status["status"] == "completed"
    assert "5.5" in status["result"]["answer"]
    assert controller.get_capabilities()["late_interaction_rerank"]
    with pytest.raises(ValueError):
        controller.ingest_video("ftp://nope")
    assert controller.analyze_causation("x")["implemented"] is False


def test_task_catalog_and_model():
    assert TASK_CATALOG["transcribe_video"].timeout_s == 1800
    assert TASK_CATALOG["retrieve_documents"].timeout_s == 120
    model = TaskModel()
    inst = model.create("llm_inference", "job-1")
    model.mark_running(inst.instance_id)
    model.mark_done(inst.instance_id)
    stats = model.statistics()
    assert stats["by_status"]["completed"] == 1
    # timeout sweep
    slow = model.create("retrieve_documents", "job-2")
    model.mark_running(slow.instance_id)
    model._instances[slow.instance_id].started_at -= 1000
    flagged = model.sweep_timeouts()
    assert [i.instance_id for i in flagged] == [slow.instance_id]


def test_analytics_service(app):
    from automative_rag_tpu.services import AnalyticsService

    analytics = AnalyticsService()
    assert analytics.usage_summary() == {"total_queries": 0}
    analytics.record_query("宝马X5加速", "facts", 0.4, confidence=85.0, n_sources=3)
    analytics.record_query("特斯拉续航", "features", 0.9, confidence=70.0, n_sources=2)
    summary = analytics.usage_summary()
    assert summary["total_queries"] == 2
    assert summary["by_mode"] == {"facts": 1, "features": 1}
    assert summary["avg_confidence"] == 77.5
    # the UI analytics card binds these directly (使用分析 view)
    assert summary["avg_latency_s"] == 0.65
    assert summary["top_mode"] in ("facts", "features")
    assert all(isinstance(t, tuple) and len(t) == 2 for t in summary["top_terms"])
    assert analytics.history(1)[0]["query"] == "特斯拉续航"
    hits = analytics.suggestions("宝马")
    assert any("宝马" in h for h in hits)


def test_analytics_records_query_jobs(app):
    before = app.analytics.usage_summary().get("total_queries", 0)
    job = app.query_sync("宝马X5马力多少", timeout=60)
    assert job["status"] == "completed"
    after = app.analytics.usage_summary()["total_queries"]
    assert after == before + 1
