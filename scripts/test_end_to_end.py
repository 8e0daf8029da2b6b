#!/usr/bin/env python3
"""End-to-end smoke drive: ingest a known document, query it, check facts.

Parity target: reference ``scripts/test_end_to_end.py`` (ingest BMW 5-series
text → poll the job → query with filters → assert the answer mentions the
expected specs). Runs in-process by default or against a running API.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BMW_TEXT = (
    "宝马5系 2024款 530Li 尊享型：百公里加速6.9秒，最高时速250公里/小时，"
    "搭载2.0T直列四缸发动机，最大马力258匹，峰值扭矩400牛米，"
    "车身长5175mm，轴距3105mm，综合油耗6.85L/100km。"
)

CHECKS = [("加速", "6.9"), ("马力", "258"), ("轴距", "3105")]


def run_in_process() -> int:
    from automative_rag_tpu.app import RAGApplication

    app = RAGApplication(tiny=True)
    failures = 0
    try:
        job_id = app.ingest_text(BMW_TEXT)
        while app.tracker.get_job(job_id)["status"] not in ("completed", "failed"):
            time.sleep(0.05)
        ingest = app.tracker.get_job(job_id)
        print(f"[ingest] {ingest['status']} — {ingest['result'].get('document_count')} chunks")
        assert ingest["status"] == "completed"

        for topic, expected in CHECKS:
            job = app.query_sync(
                f"宝马5系的{topic}是多少？", mode="facts",
                metadata_filter={"manufacturer": "宝马"}, timeout=60,
            )
            answer = job["result"]["answer"]
            ok = expected in answer
            print(f"[query] {topic}: {'OK' if ok else 'MISS'} — {answer[:80]}...")
            failures += 0 if ok else 1

        unfiltered = app.query_sync("奔驰E级的价格", mode="facts", timeout=60)
        print(f"[query] out-of-corpus: {unfiltered['result']['answer'][:60]}")
    finally:
        app.shutdown()
    return failures


def run_against_api(api: str) -> int:
    def post(path, body):
        req = urllib.request.Request(
            f"{api}{path}", data=json.dumps(body, ensure_ascii=False).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            return json.loads(resp.read())

    def get(path):
        with urllib.request.urlopen(f"{api}{path}", timeout=30) as resp:
            return json.loads(resp.read())

    def wait(job_id, timeout=180):
        deadline = time.time() + timeout
        while time.time() < deadline:
            job = get(f"/query/results/{job_id}")
            if job["status"] in ("completed", "failed"):
                return job
            time.sleep(0.5)
        raise TimeoutError(job_id)

    failures = 0
    job = wait(post("/ingest/text", {"content": BMW_TEXT})["job_id"])
    print(f"[ingest] {job['status']}")
    for topic, expected in CHECKS:
        job = wait(post("/query", {"query": f"宝马5系的{topic}是多少？", "mode": "facts"})["job_id"])
        answer = (job.get("result") or {}).get("answer", "")
        ok = expected in answer
        print(f"[query] {topic}: {'OK' if ok else 'MISS'} — {answer[:80]}")
        failures += 0 if ok else 1
    return failures




def _pin_platform(use_tpu: bool = False) -> None:
    """Smoke scripts default to CPU (tiny encoders; the tunneled TPU's
    remote compile is minutes-slow); pass --tpu to run on the chip."""
    if use_tpu:
        return
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--api", default="", help="running API base URL; default in-process")
    parser.add_argument("--tpu", action="store_true", help="run on the TPU backend")
    args = parser.parse_args()
    _pin_platform(args.tpu)
    failures = run_against_api(args.api.rstrip("/")) if args.api else run_in_process()
    print("PASS" if failures == 0 else f"FAIL ({failures} checks missed)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
