#!/usr/bin/env bash
# Fetch the model checkpoints this framework serves (reference parity:
# /root/reference/download_models.sh fetched the same families for the
# torch stack). Run on a machine WITH network egress; the engine loads
# plain HF safetensors directories — no torch conversion step, the Flax
# loaders map HF names directly (models/bge_m3.py, qwen2.py, whisper.py,
# cross_encoder.py; parity pinned by tests/test_parity_torch.py).
#
# Usage: MODELS_DIR=models ./scripts/download_models.sh [family ...]
#   families: embedding colbert reranker llm whisper   (default: all)
# Then point the engine at them:
#   EMBEDDING_MODEL_PATH=$MODELS_DIR/bge-m3 \
#   COLBERT_MODEL_PATH=$MODELS_DIR/bge-m3 \
#   RERANKER_MODEL_PATH=$MODELS_DIR/bge-reranker-base \
#   LLM_MODEL_PATH=$MODELS_DIR/qwen2-7b-instruct \
#   WHISPER_MODEL_PATH=$MODELS_DIR/whisper-base \
#   ./run_api.sh
# Verify with: python scripts/check_models.py

set -euo pipefail
MODELS_DIR=${MODELS_DIR:-models}
mkdir -p "$MODELS_DIR"

# HF ids (override via env). bge-m3 serves BOTH the dense embedder and the
# ColBERT token encoder (one XLM-R trunk, reference settings.py:233-249).
HF_EMBEDDING=${HF_EMBEDDING:-BAAI/bge-m3}
HF_RERANKER=${HF_RERANKER:-BAAI/bge-reranker-base}
HF_LLM=${HF_LLM:-deepseek-ai/DeepSeek-R1-Distill-Qwen-7B}
HF_WHISPER=${HF_WHISPER:-openai/whisper-base}

fetch() { # fetch <hf_id> <dest>
    local id=$1 dest=$2
    if [ -e "$dest/config.json" ]; then
        echo "== $dest already present, skipping"
        return
    fi
    echo "== downloading $id -> $dest"
    python - "$id" "$dest" <<'PY'
import sys
from huggingface_hub import snapshot_download

snapshot_download(
    sys.argv[1], local_dir=sys.argv[2],
    allow_patterns=["*.json", "*.safetensors", "*.txt", "*.model",
                    "tokenizer*", "preprocessor*"],
)
PY
}

families=${*:-"embedding reranker llm whisper"}
for fam in $families; do
    case $fam in
        embedding|colbert) fetch "$HF_EMBEDDING" "$MODELS_DIR/bge-m3" ;;
        reranker) fetch "$HF_RERANKER" "$MODELS_DIR/bge-reranker-base" ;;
        llm) fetch "$HF_LLM" "$MODELS_DIR/$(basename "$HF_LLM")" ;;
        whisper) fetch "$HF_WHISPER" "$MODELS_DIR/$(basename "$HF_WHISPER")" ;;
        *) echo "unknown family: $fam" >&2; exit 1 ;;
    esac
done
echo "done; run: python scripts/check_models.py"
