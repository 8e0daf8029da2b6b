#!/usr/bin/env python3
"""Queue/chain monitor with alerting thresholds.

Parity target: reference ``scripts/priority_monitor.py`` — watches a running
deployment's queues, workers, and chains and prints alerts when pressure
builds (deep queues, stale workers, stuck chains).
"""

from __future__ import annotations

import argparse
import json
import time
import urllib.request


def get(api: str, path: str):
    with urllib.request.urlopen(f"{api}{path}", timeout=15) as resp:
        return json.loads(resp.read())


def check_once(api: str, queue_depth_warn: int, fail_rate_warn: float):
    alerts = []
    status = get(api, "/workers/status")
    for name, health in status["workers"].items():
        if health not in ("healthy", "unknown"):
            alerts.append(f"worker {name} is {health}")
    for name, queue in status["queues"].items():
        if queue["pending"] >= queue_depth_warn:
            alerts.append(f"queue {name} depth {queue['pending']}")
        done, failed = queue["completed"], queue["failed"]
        if done + failed > 10 and failed / (done + failed) > fail_rate_warn:
            alerts.append(f"queue {name} fail rate {failed}/{done + failed}")
    chains = get(api, "/job-chains")
    stuck = [c for c in chains["chains"] if c["paused"]]
    if stuck:
        alerts.append(f"{len(stuck)} chains awaiting user input")
    return alerts, status


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--api", default="http://localhost:8000")
    parser.add_argument("--interval", type=float, default=30.0)
    parser.add_argument("--queue-depth-warn", type=int, default=20)
    parser.add_argument("--fail-rate-warn", type=float, default=0.2)
    parser.add_argument("--once", action="store_true")
    args = parser.parse_args()
    api = args.api.rstrip("/")

    while True:
        try:
            alerts, status = check_once(api, args.queue_depth_warn, args.fail_rate_warn)
            stamp = time.strftime("%T")
            if alerts:
                for alert in alerts:
                    print(f"[{stamp}] ALERT {alert}")
            else:
                depths = {n: q["pending"] for n, q in status["queues"].items()}
                print(f"[{stamp}] ok — depths {depths}")
        except Exception as exc:  # noqa: BLE001 — monitor keeps running
            print(f"[{time.strftime('%T')}] ALERT api unreachable: {exc}")
        if args.once:
            break
        time.sleep(args.interval)


if __name__ == "__main__":
    main()
