"""Deployment restart path (docker-compose.yml engine service): save the
index over the API, boot a fresh app with INDEX_AUTOLOAD semantics, and
get identical search results — no manual rebuild."""

import dataclasses
import json
import time

from automative_rag_tpu.api.app import build_api
from automative_rag_tpu.app import RAGApplication
from automative_rag_tpu.config.settings import Settings


def _call(api, method, path, body=None):
    raw = json.dumps(body, ensure_ascii=False).encode() if body is not None else b""
    status, payload, _ = api.dispatch(method, path, {}, raw)
    return status, json.loads(payload)


def test_save_endpoint_autoload_roundtrip(tmp_path):
    settings = dataclasses.replace(
        Settings(), index_dir=str(tmp_path), data_dir=str(tmp_path),
    )
    app = RAGApplication(settings=settings, tiny=True)
    api = build_api(app)
    status, out = _call(api, "POST", "/ingest/text", {
        "content": "宝马X5 2023款 百公里加速5.5秒。",
        "metadata": {"manufacturer": "宝马", "model": "X5", "year": 2023},
    })
    assert status == 200
    deadline = time.time() + 60
    while time.time() < deadline:
        if app.tracker.get_job(out["job_id"])["status"] == "completed":
            break
        time.sleep(0.05)
    want = [(d.id, round(s, 4)) for d, s in app.engine.retrieve("加速", final_k=3)]
    assert want

    status, saved = _call(api, "POST", "/system/save-index")
    assert status == 200 and saved["rows"] >= 1
    app.shutdown()

    # fresh process, autoload on: the index comes back without rebuild
    settings2 = dataclasses.replace(settings, index_autoload=True)
    app2 = RAGApplication(settings=settings2, tiny=True)
    try:
        assert app2.index.count == app.index.count
        got = [(d.id, round(s, 4)) for d, s in app2.engine.retrieve("加速", final_k=3)]
        assert got == want
        # the explicit endpoint works too
        api2 = build_api(app2)
        status, loaded = _call(api2, "POST", "/system/load-index")
        assert status == 200 and loaded["loaded"] == app.index.count
    finally:
        app2.shutdown()


def test_load_index_without_checkpoint_is_404(tmp_path):
    settings = dataclasses.replace(
        Settings(), index_dir=str(tmp_path / "empty"), data_dir=str(tmp_path),
    )
    app = RAGApplication(settings=settings, tiny=True)
    try:
        api = build_api(app)
        status, out = _call(api, "POST", "/system/load-index")
        assert status == 404
        assert "checkpoint" in out["detail"]
    finally:
        app.shutdown()
