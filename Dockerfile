# Single-image deployment (replaces the reference's 7-container compose
# stack: API + 3 GPU workers + CPU pool + Qdrant + Redis — here the engine
# is one process that owns the TPU and all state).
FROM python:3.12-slim

WORKDIR /app
COPY pyproject.toml README.md ./
COPY automative_rag_tpu ./automative_rag_tpu
COPY scripts ./scripts
COPY native ./native
COPY run_api.sh bench.py ./
RUN apt-get update && apt-get install -y --no-install-recommends gcc && \
    ./native/build.sh && apt-get purge -y gcc && apt-get autoremove -y || true

# jax[tpu] on Cloud TPU VMs; plain jax elsewhere (CPU fallback mode)
ARG JAX_EXTRA=tpu
RUN pip install --no-cache-dir -e . && \
    pip install --no-cache-dir "jax[${JAX_EXTRA}]" transformers safetensors || true

# CJK OCR atlas for scanned Chinese spec sheets (ingestion/ocr.py mixed
# pipeline): fetch Noto Sans SC at build time — the base image ships no CJK
# font — and render the automotive-domain glyph atlas. Best-effort: without
# it the engine still reads Latin/digit scans.
RUN pip install --no-cache-dir pillow fonttools jieba && \
    python -c "import urllib.request; urllib.request.urlretrieve(\
'https://github.com/notofonts/noto-cjk/raw/main/Sans/OTF/SimplifiedChinese/NotoSansCJKsc-Regular.otf',\
'/tmp/NotoSansSC.otf')" && \
    python scripts/build_cjk_atlas.py --font /tmp/NotoSansSC.otf \
        --out data/cjk_atlas.npz --size 2500 && rm /tmp/NotoSansSC.otf || true

ENV API_HOST=0.0.0.0 API_PORT=8000 INDEX_KIND=auto
EXPOSE 8000
HEALTHCHECK --interval=30s --timeout=10s \
  CMD python -c "import urllib.request;urllib.request.urlopen('http://localhost:8000/health', timeout=5)"
CMD ["./run_api.sh"]
