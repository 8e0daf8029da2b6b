#!/usr/bin/env python3
"""Standalone job-hygiene daemon: retention cleanup + stalled-job reaper.

Parity target: reference root ``job_cleanup_service.py`` (delete terminal
jobs older than N days :57-105, mark >3h processing jobs timeout :107-152,
hourly loop :170-231) — pointed at a running API's maintenance endpoint.
"""

from __future__ import annotations

import argparse
import json
import time
import urllib.request


def cleanup_once(api: str) -> dict:
    req = urllib.request.Request(f"{api}/system/cleanup-jobs", data=b"", method="POST")
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--api", default="http://localhost:8000")
    parser.add_argument("--interval", type=float, default=3600.0, help="seconds between sweeps")
    parser.add_argument("--once", action="store_true")
    args = parser.parse_args()
    api = args.api.rstrip("/")

    while True:
        try:
            result = cleanup_once(api)
            print(f"[{time.strftime('%F %T')}] removed={result['removed']} "
                  f"stalled={result['marked_stalled']}")
        except Exception as exc:  # noqa: BLE001 — daemon keeps running
            print(f"[{time.strftime('%F %T')}] sweep failed: {exc}")
        if args.once:
            break
        time.sleep(args.interval)


if __name__ == "__main__":
    main()
