#!/usr/bin/env python3
"""Engine-process entrypoint for the two-process topology (SURVEY §2.1:
"DCN/HTTP only from API/worker control plane into the engine").

Owns the TPU, the index, the token store, and all job/chain state; the
gateway process (scripts/run_gateway.py) fronts it over HTTP/DCN. State
survives restarts via CHAIN_PERSIST_PATH + TRACKER_PERSIST_PATH +
INDEX_AUTOLOAD — the restart drill lives in tests/test_engine_rpc.py.

Env: ENGINE_CPU=1 pins the CPU backend (tests / TPU-less hosts);
ENGINE_TINY=1 boots the tiny model set. Everything else is the standard
settings surface (API_PORT, INDEX_KIND, ...).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    if os.environ.get("ENGINE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update(
            "jax_num_cpu_devices", int(os.environ.get("ENGINE_CPU_DEVICES", 8))
        )

    from automative_rag_tpu.api.app import serve
    from automative_rag_tpu.app import RAGApplication

    tiny = os.environ.get("ENGINE_TINY") == "1"
    app = RAGApplication(tiny=tiny, tiny_dim=int(os.environ.get("ENGINE_TINY_DIM", 256)))
    print("warming up hot executables...", flush=True)
    app.warmup()
    print(f"serving on {app.settings.host}:{app.settings.port}", flush=True)
    serve(app)


if __name__ == "__main__":
    main()
