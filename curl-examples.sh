#!/usr/bin/env bash
# API usage examples (parity with reference curl-examples.sh).
API=${API:-http://localhost:8000}

echo "== health =="
curl -s "$API/health" | head -c 400; echo

echo "== query modes =="
curl -s "$API/query/modes" | head -c 400; echo

echo "== ingest text =="
JOB=$(curl -s -X POST "$API/ingest/text" \
  -H 'Content-Type: application/json' \
  -d '{"content": "宝马X5 2023款百公里加速5.5秒，马力340匹。"}' | python -c 'import sys,json;print(json.load(sys.stdin)["job_id"])')
echo "job: $JOB"
sleep 2
curl -s "$API/ingest/jobs/$JOB" | head -c 300; echo

echo "== submit query =="
QJOB=$(curl -s -X POST "$API/query" \
  -H 'Content-Type: application/json' \
  -d '{"query": "宝马X5加速几秒？", "mode": "facts", "metadata_filter": {"manufacturer": "宝马"}}' \
  | python -c 'import sys,json;print(json.load(sys.stdin)["job_id"])')
echo "query job: $QJOB"
sleep 3
curl -s "$API/query/results/$QJOB" | head -c 600; echo

echo "== debug retrieval =="
curl -s -X POST "$API/query/debug-retrieval" \
  -H 'Content-Type: application/json' \
  -d '{"query": "加速"}' | head -c 400; echo

echo "== system =="
curl -s "$API/system/health/detailed" | head -c 400; echo
curl -s "$API/model/config" | head -c 300; echo

echo "== pdf upload (raw body) =="
echo 'curl -X POST "$API/ingest/pdf?filename=spec.pdf" -H "Content-Type: application/pdf" --data-binary @spec.pdf'

echo "== query assist =="
curl -s "$API/query/templates" | head -c 300; echo
curl -s -X POST "$API/query/analyze" \
  -H 'Content-Type: application/json' \
  -d '{"query": "2023年宝马X5的后备箱容积是多少？"}'; echo
curl -s "$API/system/help/query" | head -c 200; echo

echo "== index checkpoint / restart resume =="
curl -s -X POST "$API/system/save-index" -H 'Content-Type: application/json' -d '{}'; echo
curl -s -X POST "$API/system/load-index" -H 'Content-Type: application/json' -d '{}'; echo

echo "== batch video ingestion =="
echo 'curl -X POST "$API/ingest/batch-videos" -H "Content-Type: application/json" \
  -d "{\"urls\": [\"https://www.youtube.com/watch?v=aaa\", \"https://b23.tv/bbb\"]}"'

# SSE token streaming for a query job (partial events while the serving
# engine decodes, then a final done event)
echo "== stream query answer (SSE) =="
curl -N -m 30 "$API/query/stream/$QJOB"
