"""Typed request validation at the API boundary (VERDICT r1 #8): every POST
route that takes a JSON body must 422 with structured field errors on
malformed payloads — the contract surface the reference gets from
FastAPI+pydantic (src/models/query_models.py etc.)."""

import json

import pytest

from automative_rag_tpu.api.app import build_api
from automative_rag_tpu.app import RAGApplication


@pytest.fixture(scope="module")
def app():
    application = RAGApplication(tiny=True)
    yield application
    application.shutdown()


@pytest.fixture(scope="module")
def api(app):
    return build_api(app)


def call(api, method, path, body=None, raw=None):
    payload = raw if raw is not None else (
        json.dumps(body, ensure_ascii=False).encode() if body is not None else b""
    )
    status, out, _ = api.dispatch(method, path, {}, payload)
    return status, json.loads(out)


def _errors(body):
    detail = body["detail"]
    assert isinstance(detail, list), f"expected structured errors, got {detail!r}"
    return {e["field"] for e in detail}


# one (path, bad_payload, offending_field) row per POST route with a JSON body
NEGATIVE_CASES = [
    ("/query", {}, "query"),
    ("/query", {"query": "   "}, "query"),
    ("/query", {"query": "x" * 600}, "query"),
    ("/query", {"query": "ok", "mode": "nonsense"}, "mode"),
    ("/query", {"query": "ok", "metadata_filter": {"bogus_field": 1}},
     "metadata_filter.bogus_field"),
    ("/query", {"query": "ok", "top_k": 0}, "top_k"),
    ("/query/batch", {}, "queries"),
    ("/query/batch", {"queries": []}, "queries"),
    ("/query/batch", {"queries": ["ok", "  "]}, "queries"),
    ("/query/batch", {"queries": ["q"] * 65}, "queries"),
    ("/query/batch", {"queries": ["ok"], "final_k": 0}, "final_k"),
    ("/query/validate", {"query": 42}, "query"),
    ("/query/debug-retrieval", {}, "query"),
    ("/query/debug-retrieval", {"query": "ok", "rerank": "maybe"}, "rerank"),
    ("/ingest/text", {}, "content"),
    ("/ingest/text", {"content": "   "}, "content"),
    ("/ingest/text", {"content": "ok", "metadata": "not-a-dict"}, "metadata"),
    ("/ingest/video", {}, "url"),
    ("/ingest/batch-videos", {}, "urls"),
    ("/ingest/batch-videos", {"urls": []}, "urls"),
    ("/ingest/pdf", {}, "path"),
    ("/system/compress-token-store", {"bits": 3}, "bits"),
    ("/system/compress-token-store", {"k_centroids": 1}, "k_centroids"),
    ("/system/profile", {}, "query"),
    ("/system/cleanup-jobs", {"max_age_days": -1}, "max_age_days"),
    ("/auth/token", {"username": 7}, "username"),
]


@pytest.mark.parametrize("path,payload,field", NEGATIVE_CASES,
                         ids=[f"{p}:{f}" for p, _, f in NEGATIVE_CASES])
def test_malformed_payload_422_with_field_errors(api, path, payload, field):
    status, body = call(api, "POST", path, payload)
    assert status == 422, body
    assert field in _errors(body)


def test_non_object_body_is_422(api):
    status, body = call(api, "POST", "/query", raw=b'["not", "an", "object"]')
    assert status == 422
    assert "<root>" in _errors(body)


def test_malformed_json_is_400(api):
    status, body = call(api, "POST", "/query", raw=b"{not json")
    assert status == 400


def test_user_choice_rejects_non_object(api):
    status, body = call(api, "POST", "/query/someid/user-choice",
                        raw=b'"just a string"')
    assert status == 422


def test_contribute_requires_content(api):
    status, body = call(api, "POST", "/query/someid/contribute", {"content": " "})
    assert status == 422 and "content" in _errors(body)


def test_valid_payloads_still_pass(api, app):
    status, body = call(api, "POST", "/query", {
        "query": "宝马加速", "mode": "facts",
        "metadata_filter": {"manufacturer": "BMW", "year": {"gte": 2020, "lte": 2024}},
    })
    assert status == 200 and "job_id" in body

    status, body = call(api, "POST", "/query/validate", {"query": "好问题"})
    assert status == 200 and body["valid"]

    status, body = call(api, "POST", "/model/update-config",
                        {"retriever_top_k": 25})
    assert status == 200


def test_year_range_filter_end_to_end(api, app):
    import time as _time

    status, body = call(api, "POST", "/ingest/text", {
        "content": "老款车型 测试", "metadata": {"manufacturer": "BMW", "year": 2010},
    })
    assert status == 200
    status, body2 = call(api, "POST", "/ingest/text", {
        "content": "新款车型 测试", "metadata": {"manufacturer": "BMW", "year": 2023},
    })
    assert status == 200
    deadline = _time.time() + 60
    while _time.time() < deadline:
        jobs = [app.tracker.get_job(b["job_id"]) for b in (body, body2)]
        if all(j["status"] in ("completed", "failed") for j in jobs):
            break
        _time.sleep(0.05)
    status, out = call(api, "POST", "/query/debug-retrieval", {
        "query": "测试",
        "metadata_filter": {"year": {"gte": 2020}},
    })
    assert status == 200
    assert out["count"] >= 1
    assert all(d["metadata"]["year"] >= 2020 for d in out["documents"])
