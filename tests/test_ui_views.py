"""The two heavy UI views (jobs dashboard, document browser — reference
后台任务.py/文档浏览.py) driven end-to-end against the live API: every
endpoint each view calls, in the sequence the view calls them."""

import json
import time

import pytest

from automative_rag_tpu.api.app import build_api
from automative_rag_tpu.app import RAGApplication

CORPUS = [
    ("宝马5系 2023款 530Li 加速6.9秒，最高时速250公里。", {"manufacturer": "宝马", "year": 2023}),
    ("宝马X5 2022款 中大型SUV 3.0T。", {"manufacturer": "宝马", "year": 2022}),
    ("特斯拉Model 3 2023款 续航606公里。", {"manufacturer": "特斯拉", "year": 2023}),
    ("丰田凯美瑞 2021款 混合动力 油耗4.1L。", {"manufacturer": "丰田", "year": 2021}),
    ("奔驰E级 2023款 舒适豪华配置全面。", {"manufacturer": "奔驰", "year": 2023}),
]


@pytest.fixture(scope="module")
def stack():
    app = RAGApplication(tiny=True)
    api = build_api(app)

    def call(method, path, body=None):
        raw = json.dumps(body, ensure_ascii=False).encode() if body is not None else b""
        status, payload, _ = api.dispatch(method, path, {}, raw)
        return status, json.loads(payload)

    job_ids = []
    for text, meta in CORPUS:
        status, out = call("POST", "/ingest/text", {"content": text, "metadata": meta})
        assert status == 200
        job_ids.append(out["job_id"])
    deadline = time.time() + 90
    while time.time() < deadline:
        if all(app.tracker.get_job(j)["status"] in ("completed", "failed")
               for j in job_ids):
            break
        time.sleep(0.05)
    yield app, call, job_ids
    app.shutdown()


# ------------------------------------------------------------ jobs dashboard

def test_jobs_list_with_counts_filters_pagination(stack):
    app, call, job_ids = stack
    status, r = call("GET", "/ingest/jobs?limit=3&offset=0")
    assert status == 200
    assert r["counts"]["total"] >= len(CORPUS)
    assert r["counts"].get("completed", 0) >= len(CORPUS)
    assert len(r["jobs"]) == 3
    status, r2 = call("GET", "/ingest/jobs?limit=3&offset=3")
    assert status == 200
    assert {j["job_id"] for j in r["jobs"]}.isdisjoint(
        {j["job_id"] for j in r2["jobs"]}
    )
    # status/type filters
    status, r3 = call("GET", "/ingest/jobs?status=completed&job_type=text_processing")
    assert status == 200 and r3["jobs"]
    assert all(j["status"] == "completed" for j in r3["jobs"])
    assert all(j["job_type"] == "text_processing" for j in r3["jobs"])


def test_job_detail_chain_progress_analysis(stack):
    """The expanded job card: chain steps + timings, progress stream,
    ingestion analysis — everything 后台任务.py renders per job."""
    app, call, job_ids = stack
    job_id = job_ids[0]
    status, job = call("GET", f"/ingest/jobs/{job_id}")
    assert status == 200 and job["status"] == "completed"

    status, chain = call("GET", f"/ingest/jobs/{job_id}/chain")
    assert status == 200
    assert chain["steps"] and "step_timings" in chain
    assert all(s in chain["step_timings"] for s in chain["steps"])

    status, prog = call("GET", f"/ingest/jobs/{job_id}/progress")
    assert status == 200
    assert prog["messages"], "progress stream must carry entries"
    assert prog["messages"][-1]["progress"] == 100

    status, analysis = call("GET", f"/ingest/jobs/{job_id}/analysis")
    assert status == 200
    assert analysis["chunks"] >= 1
    assert 0 <= analysis["metadata_coverage"]["manufacturer"] <= 1


def test_job_delete_and_cleanup(stack):
    app, call, _ = stack
    status, out = call("POST", "/ingest/text", {"content": "临时任务文本 删除测试"})
    job_id = out["job_id"]
    deadline = time.time() + 60
    while time.time() < deadline:
        if app.tracker.get_job(job_id)["status"] in ("completed", "failed"):
            break
        time.sleep(0.05)
    status, out = call("DELETE", f"/ingest/jobs/{job_id}")
    assert status == 200
    status, _ = call("GET", f"/ingest/jobs/{job_id}")
    assert status == 404
    status, out = call("POST", "/system/cleanup-jobs", {})
    assert status == 200 and "removed" in out


# ---------------------------------------------------------- document browser

def test_browse_scroll_pagination_and_filters(stack):
    app, call, _ = stack
    status, r = call("GET", "/ingest/documents?limit=2&offset=0")
    assert status == 200
    assert r["total"] >= len(CORPUS)
    assert len(r["documents"]) == 2 and r["has_more"]
    status, r2 = call("GET", "/ingest/documents?limit=2&offset=2")
    assert {d["id"] for d in r["documents"]}.isdisjoint(
        {d["id"] for d in r2["documents"]}
    )
    # metadata filter
    status, r3 = call("GET", "/ingest/documents?manufacturer=宝马")
    assert status == 200 and r3["count"] >= 2
    assert all(d["metadata"]["manufacturer"] == "宝马" for d in r3["documents"])
    # year range filter
    status, r4 = call("GET", "/ingest/documents?year_gte=2022&year_lte=2023")
    assert status == 200 and r4["count"] >= 3
    assert all(2022 <= d["metadata"]["year"] <= 2023 for d in r4["documents"])


def test_browse_chunk_inspection_with_siblings(stack):
    app, call, _ = stack
    status, r = call("GET", "/ingest/documents?manufacturer=宝马&limit=1")
    doc_id = r["documents"][0]["id"]
    status, d = call("GET", f"/ingest/documents/{doc_id}")
    assert status == 200
    assert d["content"] and d["length"] == len(d["content"])
    assert d["metadata"]["manufacturer"] == "宝马"
    assert isinstance(d["siblings"], list)
    status, _ = call("GET", "/ingest/documents/no-such-id")
    assert status == 404


def test_browse_relevance_search_and_explain(stack):
    app, call, _ = stack
    status, r = call("POST", "/query/debug-retrieval", {"query": "宝马加速"})
    assert status == 200 and r["count"] >= 1
    doc_id = r["documents"][0]["id"]
    status, ex = call("POST", "/query/explain",
                      {"query": "宝马加速", "doc_id": doc_id})
    assert status == 200
    assert ex["matches"] and all(
        "query_token" in m and "similarity" in m for m in ex["matches"]
    )
    status, _ = call("POST", "/query/explain",
                     {"query": "宝马", "doc_id": "missing"})
    assert status == 404
    status, body = call("POST", "/query/explain", {"query": ""})
    assert status == 422
