#!/usr/bin/env bash
# Launch the API server (parity with reference run_api.sh / uvicorn).
set -euo pipefail
cd "$(dirname "$0")"
exec python -c "
from automative_rag_tpu.api.app import serve
from automative_rag_tpu.app import RAGApplication
app = RAGApplication()
print('warming up hot executables...', flush=True)
print(app.warmup(), flush=True)
print(f'serving on {app.settings.host}:{app.settings.port}', flush=True)
serve(app)
"
