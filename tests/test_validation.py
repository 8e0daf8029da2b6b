"""Validation engine tests — the subsystem the reference documented but
never shipped (SURVEY.md §0)."""

import pytest

from automative_rag_tpu.documents import Document
from automative_rag_tpu.schemas.enums import ConfidenceLevel, ValidationStatus
from automative_rag_tpu.validation import ValidationEngine


@pytest.fixture
def engine():
    return ValidationEngine()


def _docs(*specs):
    return [
        (Document(page_content=text, metadata=md), score)
        for text, md, score in specs
    ]


def test_good_documents_pass(engine):
    ranked = _docs(
        ("宝马5系 2023款 百公里加速6.9秒，最高时速250公里。", {"source": "pdf"}, 0.9),
        ("宝马5系配备2.0T发动机，马力252匹。", {"source": "pdf"}, 0.8),
        ("5系的加速表现在同级领先。", {"source": "text"}, 0.7),
        ("宝马5系内饰做工精细。", {"source": "pdf"}, 0.6),
        ("530Li车型轴距3105mm。", {"source": "pdf"}, 0.6),
        ("2023款5系支持L2辅助驾驶。", {"source": "pdf"}, 0.5),
        ("宝马5系保值率较高。", {"source": "text"}, 0.5),
        ("5系有多种动力配置。", {"source": "pdf"}, 0.5),
    )
    result = engine.validate_documents("宝马5系 加速", ranked, "facts")
    assert result["status"] == ValidationStatus.PASSED.value
    assert result["confidence"] >= 70
    assert set(result["steps"]) == {
        "retrieval", "source_credibility", "technical_consistency",
        "completeness", "consensus",
    }


def test_empty_retrieval_fails(engine):
    result = engine.validate_documents("任何问题", [], "facts")
    assert result["steps"]["retrieval"]["score"] == 0
    assert result["status"] != ValidationStatus.PASSED.value


def test_implausible_specs_flagged(engine):
    ranked = _docs(
        ("这款车百公里加速0.5秒，最高时速900公里。", {"source": "video"}, 0.9),
    )
    result = engine.validate_documents("加速", ranked, "facts")
    tech = result["steps"]["technical_consistency"]
    assert tech["score"] < 100
    assert "超出合理范围" in tech["detail"]


def test_consensus_disagreement(engine):
    ranked = _docs(
        ("百公里加速6.9秒。", {"source": "pdf"}, 0.9),
        ("百公里加速12.5秒。", {"source": "video"}, 0.8),
    )
    result = engine.validate_documents("加速", ranked, "facts")
    assert result["steps"]["consensus"]["score"] < 100


def test_answer_validation_grounded(engine):
    docs = [Document(page_content="宝马5系百公里加速6.9秒，最高时速250公里。")]
    good = engine.validate_answer("加速时间为6.9秒【来源：DOC_1】。", docs)
    assert good["status"] == ValidationStatus.PASSED.value
    assert good["citations"] == 1

    bad = engine.validate_answer("加速时间为3.2秒，马力999匹。", docs)
    assert bad["confidence"] < good["confidence"]
    assert bad["issues"]


def test_confidence_levels():
    assert ConfidenceLevel.from_score(95) == ConfidenceLevel.EXCELLENT
    assert ConfidenceLevel.from_score(85) == ConfidenceLevel.HIGH
    assert ConfidenceLevel.from_score(75) == ConfidenceLevel.MEDIUM
    assert ConfidenceLevel.from_score(65) == ConfidenceLevel.LOW
    assert ConfidenceLevel.from_score(10) == ConfidenceLevel.POOR


def test_validation_in_query_chain():
    from automative_rag_tpu.app import RAGApplication

    app = RAGApplication(tiny=True)
    try:
        import time

        jid = app.ingest_text("宝马X3 2022款百公里加速8.9秒。")
        while app.tracker.get_job(jid)["status"] not in ("completed", "failed"):
            time.sleep(0.05)
        job = app.query_sync("宝马X3加速", validation=True, timeout=60)
        assert job["status"] == "completed"
        assert "validation" in job["result"]
        assert "answer_validation" in job["result"]
        assert job["result"]["validation"]["steps"]
    finally:
        app.shutdown()


def test_guided_validation_pauses_and_resumes():
    """validation='guided' on an empty corpus: retrieval validation fails,
    the chain pauses for user input, contribution resumes it to completion
    (the reference's guided trust loop, never functional there)."""
    import time

    from automative_rag_tpu.app import RAGApplication

    app = RAGApplication(tiny=True)
    try:
        # empty corpus → retrieval step scores 0 → validation failed
        job_id = app.submit_query("不存在的车型问题", validation="guided")
        deadline = time.time() + 30
        state = None
        while time.time() < deadline:
            state = app.job_chain.get_chain_state(job_id)
            if state and state["paused"]:
                break
            time.sleep(0.05)
        assert state and state["paused"], state
        assert "validate_documents" in state["steps"]
        assert state["user_prompt"]["options"] == ["contribute", "proceed", "cancel"]

        assert app.job_chain.resume_from_user_input(job_id, {"user_choice": "proceed"})
        deadline = time.time() + 30
        while time.time() < deadline:
            job = app.tracker.get_job(job_id)
            if job["status"] in ("completed", "failed"):
                break
            time.sleep(0.05)
        assert job["status"] == "completed", job
    finally:
        app.shutdown()
