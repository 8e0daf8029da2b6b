"""HTTP-layer chaos: concurrent clients fire the full admin + query + ingest
surface at a LIVE ThreadingHTTPServer while the index churns underneath.
Invariant: every response is well-formed JSON with a known status — the API
boundary never surfaces a 5xx for operations that raced each other (torn
windows resolve to defined no-ops, low-scored candidates, or chain retries,
never stack traces)."""

import json
import os
import random
import threading
import time
import urllib.request

import pytest

from automative_rag_tpu.api.app import build_api
from automative_rag_tpu.app import RAGApplication
from automative_rag_tpu.config.settings import Settings

N_OPS = int(os.environ.get("CHAOS_OPS", "20"))

DOCS = [
    ("比亚迪汉EV 2024款CLTC续航715公里。", "比亚迪"),
    ("特斯拉Model 3 2024款续航606公里。", "特斯拉"),
    ("宝马X5 xDrive40i 百公里油耗8.9升。", "宝马"),
    ("小鹏P7 2023款续航670公里。", "小鹏"),
]


@pytest.fixture()
def server(tmp_path):
    settings = Settings(data_dir=str(tmp_path / "d"),
                        index_dir=str(tmp_path / "d" / "idx"))
    app = RAGApplication(settings=settings, tiny=True, tiny_dim=64)
    api = build_api(app)
    srv = api.serve(host="127.0.0.1", port=0, background=True)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base
    api.stop()
    app.shutdown()


def _call(base, method, path, payload=None, timeout=60):
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(
        base + path, data=data, method=method,
        headers={"Content-Type": "application/json"} if data else {})
    def parse(body):
        try:
            return json.loads(body) if body else {}
        except json.JSONDecodeError:
            return {"_raw": body[:100].decode("utf-8", "replace")}

    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, parse(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, parse(err.read())


def test_http_chaos_no_5xx(server):
    base = server
    # seed
    for text, brand in DOCS:
        status, out = _call(base, "POST", "/ingest/text",
                            {"content": text,
                             "metadata": {"manufacturer": brand}})
        assert status == 200, out
    deadline = time.time() + 120
    while time.time() < deadline:
        s, h = _call(base, "GET", "/system/health/detailed")
        if h.get("index", {}).get("count", 0) >= len(DOCS):
            break
        time.sleep(0.2)

    errors = []
    stop = threading.Event()

    def guard(name, fn):
        def run():
            try:
                fn()
            except Exception as exc:  # noqa: BLE001 — assertion surface
                errors.append(f"{name}: {type(exc).__name__}: {exc}")
                stop.set()
        return run

    def check(status, out, ctx):
        if status >= 500:
            errors.append(f"5xx from {ctx}: {status} {out}")
            stop.set()

    def querier():
        rng = random.Random(10)
        for _ in range(N_OPS):
            if stop.is_set():
                return
            check(*_call(base, "POST", "/query/debug-retrieval",
                         {"query": rng.choice(
                             ["汉EV续航", "X5油耗", "P7续航多少公里"]),
                          "top_k": 5}), "debug-retrieval")
            status, out = _call(base, "POST", "/query",
                                {"query": "汉EV的续航是多少", "mode": "facts"})
            check(status, out, "query")
            if "job_id" in out:
                check(*_call(base, "GET",
                             f"/query/results/{out['job_id']}"), "results")

    def ingester():
        rng = random.Random(11)
        for i in range(N_OPS):
            if stop.is_set():
                return
            text, brand = DOCS[i % len(DOCS)]
            check(*_call(base, "POST", "/ingest/text",
                         {"content": f"{text} 补充{i}",
                          "metadata": {"manufacturer": brand}}), "ingest")

    def admin():
        rng = random.Random(12)
        for _ in range(N_OPS):
            if stop.is_set():
                return
            roll = rng.random()
            if roll < 0.25:
                check(*_call(base, "POST", "/system/compact-index", {}),
                      "compact")
            elif roll < 0.45:
                check(*_call(base, "POST", "/system/save-index", {}),
                      "save")
            elif roll < 0.6:
                check(*_call(base, "POST", "/system/load-index", {}),
                      "load")
            elif roll < 0.75:
                from urllib.parse import quote

                check(*_call(base, "DELETE",
                             "/ingest/documents?manufacturer="
                             + quote(rng.choice(["比亚迪", "特斯拉"]))),
                      "delete")
            elif roll < 0.9:
                check(*_call(base, "POST", "/model/update-config",
                             {"sparse_rerank_weight":
                              rng.choice([0.0, 0.2, 0.4])}), "update-config")
            else:
                check(*_call(base, "GET", "/metrics"), "metrics")
            time.sleep(0.01)

    threads = [threading.Thread(target=guard(n, f))
               for n, f in (("querier", querier), ("ingester", ingester),
                            ("admin", admin))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=400)
        assert not t.is_alive(), "http chaos worker wedged"
    assert not errors, errors[:3]

    # surface still healthy
    status, health = _call(base, "GET", "/system/health/detailed")
    assert status == 200 and "index" in health
