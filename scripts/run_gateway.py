#!/usr/bin/env python3
"""Gateway-process entrypoint: stateless client-facing API tier forwarding
to the engine over HTTP/DCN (automative_rag_tpu/api/gateway.py).

    ENGINE_URL=http://engine:8000 GATEWAY_PORT=8080 python scripts/run_gateway.py

No JAX runtime in this process — engine restarts never drop the client
listening socket; requests retry over a bounded window while the engine
comes back (GET always; others only when the connection was refused
outright, i.e. provably never executed).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from automative_rag_tpu.api.gateway import serve_gateway  # noqa: E402


def main():
    serve_gateway(
        engine_url=os.environ.get("ENGINE_URL", "http://127.0.0.1:8000"),
        host=os.environ.get("GATEWAY_HOST", "0.0.0.0"),
        port=int(os.environ.get("GATEWAY_PORT", 8080)),
        retry_window_s=float(os.environ.get("GATEWAY_RETRY_WINDOW_S", 20.0)),
    )


if __name__ == "__main__":
    main()
