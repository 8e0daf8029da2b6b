"""API surface tests (reference tests/test_api.py strategy: exercise the
HTTP layer with the heavy internals live but tiny). Most tests go through
``HTTPApi.dispatch`` directly; one socket smoke test exercises the real
threading server."""

import json
import time
import urllib.request

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


def call(api, method, path, body=None, headers=None):
    raw = json.dumps(body, ensure_ascii=False).encode() if body is not None else b""
    status, payload, _ = api.dispatch(method, path, headers or {}, raw)
    return status, json.loads(payload)


def _wait_job(app, job_id, timeout=60.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        job = app.tracker.get_job(job_id)
        if job["status"] in ("completed", "failed"):
            return job
        time.sleep(0.05)
    raise TimeoutError


def test_root_and_health(api):
    status, body = call(api, "GET", "/")
    assert status == 200 and body["service"] == "automative-rag-tpu"
    status, body = call(api, "GET", "/health")
    assert status == 200 and body["status"] == "healthy"
    assert set(body["workers"]) == {"cpu_tasks", "transcription_tasks", "embedding_tasks", "llm_tasks"}


def test_modes_endpoints(api):
    status, body = call(api, "GET", "/query/modes")
    assert status == 200 and len(body["modes"]) == 6
    status, body = call(api, "GET", "/query/modes/facts")
    assert status == 200 and body["retrieval_k"] == 20 and body["final_k"] == 8
    status, _ = call(api, "GET", "/query/modes/nonsense")
    assert status == 404


def test_query_validation(api):
    status, body = call(api, "POST", "/query/validate", {"query": "宝马X5怎么样", "mode": "facts"})
    assert status == 200 and body["valid"]
    status, body = call(api, "POST", "/query/validate", {"query": "", "mode": "bogus"})
    assert status == 200 and not body["valid"] and len(body["issues"]) == 2
    status, _ = call(api, "POST", "/query", {"query": "   "})
    assert status == 422


def test_ingest_text_and_query_flow(api, app):
    status, body = call(api, "POST", "/ingest/text", {
        "content": "奥迪Q7 2023款百公里加速5.9秒，售价70万元。",
        "metadata": {"title": "Q7评测"},
    })
    assert status == 200
    job = _wait_job(app, body["job_id"])
    assert job["status"] == "completed"

    status, body = call(api, "POST", "/query", {"query": "奥迪Q7加速几秒？", "mode": "facts"})
    assert status == 200
    job = _wait_job(app, body["job_id"])
    status, body = call(api, "GET", f"/query/results/{body['job_id']}")
    assert status == 200
    assert "5.9" in body["result"]["answer"]


def test_debug_retrieval(api):
    status, body = call(api, "POST", "/query/debug-retrieval", {"query": "奥迪Q7"})
    assert status == 200
    assert body["count"] >= 1
    assert "timings" in body


def test_manufacturers_and_models(api):
    status, body = call(api, "GET", "/query/manufacturers")
    assert status == 200 and "奥迪" in body["manufacturers"]
    status, body = call(api, "GET", "/query/models")
    assert status == 200 and body["models"]


def test_ingest_video_validation(api):
    status, body = call(api, "POST", "/ingest/video", {"url": "https://example.com/x"})
    assert status == 422
    status, body = call(api, "POST", "/ingest/batch-videos", {"urls": [
        "https://www.youtube.com/watch?v=dQw4w9WgXcQ",
        "https://example.com/x",
    ]})
    assert status == 200
    assert body["accepted"] == 1 and len(body["rejected"]) == 1


def test_jobs_crud(api, app):
    status, body = call(api, "GET", "/ingest/jobs")
    assert status == 200 and body["jobs"]
    victim = body["jobs"][-1]["job_id"]
    status, body = call(api, "DELETE", f"/ingest/jobs/{victim}")
    assert status == 200
    status, _ = call(api, "DELETE", f"/ingest/jobs/{victim}")
    assert status == 404


def test_system_and_model_endpoints(api):
    status, body = call(api, "GET", "/system/health/detailed")
    assert status == 200 and "devices" in body and "disk" in body
    status, body = call(api, "GET", "/system/config")
    assert status == 200 and "api_key" not in body
    status, body = call(api, "GET", "/model/config")
    assert status == 200 and body["rerank_weights"]["colbert"] == 0.8
    status, body = call(api, "POST", "/model/update-config", {"retriever_top_k": 25})
    assert status == 200 and body["applied"] == {"retriever_top_k": 25}
    status, body = call(api, "GET", "/model/config")
    assert body["retrieval"]["retriever_top_k"] == 25


def test_update_config_reaches_live_index(api, app):
    """IVF tunables pushed at runtime must land on the live index object,
    not just the settings snapshot (flat indexes simply ignore them)."""
    had = hasattr(app.index, "n_probe")
    before = getattr(app.index, "n_probe", None)
    status, body = call(api, "POST", "/model/update-config",
                        {"ivf_n_probe": 7})
    assert status == 200 and body["applied"] == {"ivf_n_probe": 7}
    if had:
        assert app.index.n_probe == 7
        app.index.n_probe = before


def test_unknown_route(api):
    status, _ = call(api, "GET", "/nope")
    assert status == 404
    status, _ = call(api, "DELETE", "/health")
    assert status == 405


def test_auth_enforcement(app):
    api = build_api(app)
    api.auth_token = "secret-token"
    status, _ = call(api, "GET", "/query/modes")
    assert status == 401
    status, _ = call(api, "GET", "/query/modes", headers={"x-token": "secret-token"})
    assert status == 200
    status, _ = call(api, "GET", "/query/modes", headers={"Authorization": "Bearer secret-token"})
    assert status == 200
    status, _ = call(api, "GET", "/health")  # open path
    assert status == 200


def test_auth_token_issuing(api, app):
    status, body = call(api, "POST", "/auth/token", {"username": "admin", "password": "admin-password"})
    assert status == 200 and body["token_type"] == "bearer"
    from automative_rag_tpu.api.auth import verify_token

    claims = verify_token(body["access_token"], app.settings.api_key)
    assert claims and claims["sub"] == "admin"
    status, _ = call(api, "POST", "/auth/token", {"username": "admin", "password": "wrong"})
    assert status == 401


def test_real_socket_server(api, app):
    server = api.serve(host="127.0.0.1", port=0, background=True)
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=10) as resp:
            assert resp.status == 200
            body = json.loads(resp.read())
            assert body["status"] == "healthy"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/query/validate",
            data=json.dumps({"query": "测试"}).encode(),
            method="POST",
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            assert json.loads(resp.read())["valid"]
        # CJK query params must survive both raw-UTF-8 URLs (curl sends
        # them unencoded; http.server hands them over latin-1-decoded) and
        # percent-encoding — regression for the mojibake'd-filter bug
        import socket as _socket

        with _socket.create_connection(("127.0.0.1", port), timeout=10) as s:
            s.sendall(
                "GET /ingest/documents?manufacturer=奥迪 HTTP/1.1\r\n"
                "Host: x\r\nConnection: close\r\n\r\n".encode("utf-8")
            )
            raw = b""
            while chunk := s.recv(65536):
                raw += chunk
        body = json.loads(raw.split(b"\r\n\r\n", 1)[1])
        assert body["filter"] == {"manufacturer": "奥迪"}
        encoded = urllib.parse.quote("奥迪")
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/ingest/documents?manufacturer={encoded}",
            timeout=10,
        ) as resp:
            assert json.loads(resp.read())["filter"] == {"manufacturer": "奥迪"}
    finally:
        api.stop()


def test_query_batch(api, app):
    # corpus already has the Audi Q7 doc from the earlier flow test
    status, body = call(api, "POST", "/query/batch", {
        "queries": ["奥迪Q7加速", "奥迪Q7价格"], "mode": "facts",
    })
    assert status == 200
    assert len(body["answers"]) == 2
    assert body["timings"]["batch"] == 2
    assert "5.9" in body["answers"][0]["answer"]
    status, _ = call(api, "POST", "/query/batch", {"queries": []})
    assert status == 422


def test_validation_subresource_endpoints(api, app):
    # progress view on a normal completed job
    status, body = call(api, "POST", "/query", {"query": "奥迪Q7 加速"})
    job_id = body["job_id"]
    _wait_job(app, job_id)
    status, body = call(api, "GET", f"/query/{job_id}/validation-progress")
    assert status == 200 and body["status"] == "completed" and not body["paused"]

    # restart produces a fresh job with the same query
    status, body = call(api, "POST", f"/query/{job_id}/restart")
    assert status == 200 and body["job_id"] != job_id
    _wait_job(app, body["job_id"])

    # user-choice on a non-paused job conflicts
    status, _ = call(api, "POST", f"/query/{job_id}/user-choice", {"choice": "x"})
    assert status == 409


def test_user_choice_and_contribution_flow(api, app):
    from automative_rag_tpu.orchestration.workflows import WORKFLOWS

    WORKFLOWS["test_pause_flow"] = ["pause_step", "finish_step"]
    finished = {}

    @app.task_router.task("pause_step")
    def pause_step(job_id, payload):
        app.job_chain.wait_for_user_input(job_id, {"question": "需要补充资料"})
        return {}

    @app.task_router.task("finish_step")
    def finish_step(job_id, payload):
        finished.update(payload)
        return {"done": True}

    try:
        job_id = app.tracker.create_job("test_pause_flow")
        app.job_chain.start_job_chain(job_id, "test_pause_flow", {})
        deadline = time.time() + 15
        while time.time() < deadline:
            state = app.job_chain.get_chain_state(job_id)
            if state and state["paused"]:
                break
            time.sleep(0.05)
        status, body = call(api, "GET", f"/query/{job_id}/validation-progress")
        assert body["paused"] and body["user_prompt"]["question"] == "需要补充资料"

        # contribute evidence: ingests it and resumes the chain
        status, body = call(api, "POST", f"/query/{job_id}/contribute",
                            {"content": "蔚来ES6 2023款续航610公里。", "user": "tester"})
        assert status == 200 and body["resumed"]
        _wait_job(app, body["ingest_job_id"])
        job = _wait_job(app, job_id)
        assert job["status"] == "completed"
        assert "contribution_job_id" in finished
    finally:
        WORKFLOWS.pop("test_pause_flow", None)


def test_clear_cache_and_restart_workers(api, app):
    status, body = call(api, "POST", "/system/clear-cache")
    assert status == 200 and body["cleared"]
    # engine still functional after cache drop
    status, body = call(api, "POST", "/query/debug-retrieval", {"query": "奥迪"})
    assert status == 200
    status, body = call(api, "POST", "/system/restart-workers")
    assert status == 200 and set(body["restarted"]) == {
        "cpu_tasks", "transcription_tasks", "embedding_tasks", "llm_tasks",
    }


def test_job_analysis_and_model_status(api, app):
    status, body = call(api, "POST", "/ingest/text", {
        "content": "蔚来ET5 2023款续航710公里，百公里加速4.0秒。",
    })
    job_id = body["job_id"]
    _wait_job(app, job_id)
    status, body = call(api, "GET", f"/ingest/jobs/{job_id}/analysis")
    assert status == 200 and body["chunks"] >= 1
    assert body["vehicle_detected_rate"] == 1.0
    assert body["metadata_coverage"]["manufacturer"] == 1.0

    status, body = call(api, "GET", "/model/status")
    assert status == 200
    assert body["embedder"]["mode"] == "lexical"
    assert body["llm"]["backend"] == "extractive-stub"


def test_query_alias_and_bulk_delete(api, app):
    status, body = call(api, "POST", "/query", {"query": "奥迪Q7"})
    job_id = body["job_id"]
    _wait_job(app, job_id)
    status, body = call(api, "GET", f"/query/{job_id}")
    assert status == 200 and body["status"] == "completed"
    # literal routes still win over the {job_id} pattern
    status, body = call(api, "GET", "/query/modes")
    assert status == 200 and "modes" in body

    status, body = call(api, "DELETE", "/ingest/jobs?status=completed")
    assert status == 200 and body["deleted"] >= 1
    assert app.tracker.get_job_counts().get("completed", 0) == 0


def test_route_aliases_and_debug_endpoints(api, app):
    status, body = call(api, "GET", "/system/model-info")
    assert status == 200 and "embedder" in body
    status, body = call(api, "GET", "/system/heartbeats")
    assert status == 200 and set(body["workers"]) >= {"cpu_tasks"}
    status, body = call(api, "GET", "/system/workers/debug")
    assert status == 200 and body["threads"]
    status, body = call(api, "POST", "/model/reload-model")
    assert status == 200 and body["reloaded"]
    # engine still works after reload
    status, body = call(api, "POST", "/query/debug-retrieval", {"query": "测试"})
    assert status == 200


def test_docs_and_openapi(api):
    status, payload, ctype = api.dispatch("GET", "/docs", {}, b"")
    assert status == 200 and ctype.startswith("text/html")
    assert b"/query/batch" in payload
    status, body = call(api, "GET", "/openapi.json")
    assert status == 200 and body["openapi"] == "3.0.0"
    assert "/query" in body["paths"]


def test_browse_documents_and_compress_store(api, app):
    status, body = call(api, "POST", "/ingest/text", {
        "content": "保时捷Taycan 2023款百公里加速2.8秒。",
    })
    _wait_job(app, body["job_id"])
    status, body = call(api, "GET", "/ingest/documents?manufacturer=保时捷")
    assert status == 200 and body["count"] >= 1
    assert body["documents"][0]["metadata"]["manufacturer"] == "保时捷"
    status, body = call(api, "GET", "/ingest/documents")
    assert status == 200 and body["count"] >= 1
    # ambiguous: exact year combined with a range is rejected, not silently
    # overwritten by the range
    status, body = call(api, "GET",
                        "/ingest/documents?year=2023&year_gte=2020")
    assert status == 422
    status, body = call(api, "GET",
                        "/ingest/documents?year_gte=2020&year_lte=2024")
    assert status == 200

    status, body = call(api, "POST", "/system/compress-token-store",
                        {"k_centroids": 16, "bits": 4})
    assert status == 200 and body["compression"] > 1.0
    # rerank-from-store still works on compressed storage
    status, body = call(api, "POST", "/query/debug-retrieval", {"query": "保时捷 加速"})
    assert status == 200 and body["count"] >= 1


def test_warmup(api, app):
    status, body = call(api, "POST", "/system/warmup")
    assert status == 200 and "retrieve" in body["warmed"]


def test_guided_validation_over_http(api, app):
    status, body = call(api, "POST", "/query",
                        {"query": "完全不存在的主题xyz", "validation": "guided"})
    job_id = body["job_id"]
    deadline = time.time() + 30
    while time.time() < deadline:
        status, prog = call(api, "GET", f"/query/{job_id}/validation-progress")
        if prog["paused"]:
            break
        if prog["status"] in ("completed", "failed"):
            break
        time.sleep(0.05)
    assert prog["paused"], prog
    status, body = call(api, "POST", f"/query/{job_id}/user-choice", {"user_choice": "proceed"})
    assert status == 200
    _wait_job(app, job_id)


def test_profile_endpoint(api, app):
    status, body = call(api, "POST", "/system/profile",
                        {"query": "奥迪", "trace_dir": "/tmp/test_trace_dir"})
    assert status == 200
    assert "stage_timings" in body and body["trace_dir"] == "/tmp/test_trace_dir"
    import shutil

    shutil.rmtree("/tmp/test_trace_dir", ignore_errors=True)


def test_state_analysis(api):
    status, out = call(api, "GET", "/system/state-analysis")
    assert status == 200
    assert out["jobs"]["total"] >= 0 and "by_status" in out["jobs"]
    assert "possibly_stuck" in out and "chains" in out


def test_query_stream_sse(api, app):
    """SSE stream: partial events precede the done event; unknown job
    404s before any streaming starts."""
    status, _ = call(api, "GET", "/query/stream/nope")
    assert status == 404

    job_id = app.tracker.create_job("llm_inference")
    server = api.serve(host="127.0.0.1", port=0, background=True)
    port = server.server_address[1]
    try:
        import threading

        def finish():
            time.sleep(0.3)
            app.tracker.set_partial_answer(job_id, "部分")
            time.sleep(0.3)
            app.tracker.set_partial_answer(job_id, "部分答案")
            time.sleep(0.3)
            app.tracker.update_job_status(
                job_id, "completed", result={"answer": "部分答案完整"})

        threading.Thread(target=finish, daemon=True).start()
        events = []
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/query/stream/{job_id}",
                timeout=30) as resp:
            assert resp.headers["Content-Type"].startswith(
                "text/event-stream")
            cur = {}
            for raw in resp:
                line = raw.decode("utf-8").rstrip("\n")
                if line.startswith("event: "):
                    cur["event"] = line[7:]
                elif line.startswith("data: "):
                    cur["data"] = json.loads(line[6:])
                elif not line and cur:
                    events.append(cur)
                    cur = {}
                    if events[-1]["event"] == "done":
                        break
        kinds = [e["event"] for e in events]
        assert kinds[-1] == "done"
        assert "partial" in kinds[:-1]
        partials = [e["data"]["text"] for e in events
                    if e["event"] == "partial"]
        assert partials[-1] == "部分答案"
        assert events[-1]["data"]["answer"] == "部分答案完整"
        assert events[-1]["data"]["status"] == "completed"
    finally:
        server.shutdown()


def test_compile_cache_config_applied(app):
    """RAGApplication points XLA's persistent compilation cache at the
    configured dir (restart resumes warm instead of re-paying remote
    compiles)."""
    import jax

    assert jax.config.jax_compilation_cache_dir == \
        app.settings.jax_compile_cache_dir
    import os

    assert os.path.isdir(app.settings.jax_compile_cache_dir)


def test_metrics_prometheus(api, app):
    status, payload, ctype = api.dispatch("GET", "/metrics", {}, b"")
    assert status == 200 and ctype.startswith("text/plain")
    text = payload.decode()
    assert "# TYPE rag_jobs gauge" in text
    assert "# TYPE rag_queue_enqueued counter" in text
    assert 'rag_queue_pending{queue="llm_tasks"}' in text
    assert "rag_index_rows" in text and "rag_uptime_seconds" in text
    # the exposition format is line-oriented: every non-comment line is
    # "name{labels} value" with a numeric value
    for line in text.strip().splitlines():
        if line.startswith("#"):
            continue
        name, value = line.rsplit(" ", 1)
        float(value)
        assert name and " " not in name.split("{")[0]


def test_task_instance_endpoints(api, app):
    """Task-instance table over HTTP (reference TaskModel statistics,
    src/models/task_models.py:140-474): per-attempt rows for a job and the
    aggregate statistics/cleanup surfaces."""
    status, out = call(api, "POST", "/ingest/text",
                       {"content": "任务实例表统计测试文本，长度足够成一个块。"})
    assert status == 200
    job_id = out["job_id"]
    _wait_job(app, job_id)

    status, rows = call(api, "GET", f"/system/tasks/{job_id}")
    assert status == 200 and rows["job_id"] == job_id
    tasks = {r["task"] for r in rows["instances"]}
    assert "generate_embeddings" in tasks
    assert all(r["status"] == "completed" for r in rows["instances"])
    assert all(r["duration_s"] is not None for r in rows["instances"])

    status, stats = call(api, "GET", "/system/tasks")
    assert status == 200 and stats["total"] >= len(rows["instances"])
    assert stats["by_status"].get("completed", 0) >= len(rows["instances"])
    assert "generate_embeddings" in stats["avg_duration_s"]

    # cleanup reports the new retention surfaces
    status, out = call(api, "POST", "/system/cleanup-jobs", {})
    assert status == 200
    assert "task_timeouts" in out and "task_rows_pruned" in out

    # backdated terminal rows age out
    for inst in app.task_model.for_job(job_id):
        inst.finished_at -= 10 * 86400
    status, out = call(api, "POST", "/system/cleanup-jobs", {"max_age_days": 7})
    assert status == 200 and out["task_rows_pruned"] >= len(rows["instances"])
    assert app.task_model.for_job(job_id) == []
