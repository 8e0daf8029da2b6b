"""API route surface — parity with the reference's FastAPI routers
(SURVEY.md §2.5: main/query/ingest/system/model/auth) on the stdlib
framework in ``http.py``.

Endpoints (reference file:line cited per group):

- root/health/job-chains/workers (``src/api/main.py:155-356``)
- query submit/result/modes/capabilities/validate/manufacturers/models/
  queue-status/debug-retrieval (``src/api/query.py:23-165``)
- ingest video/batch-videos/pdf/text + job CRUD + reset
  (``src/api/ingest.py:31-520``)
- system health/workers/queue-stats/config/disk-usage/heartbeats
  (``src/api/system.py:20-404``)
- model config get/update (``src/api/model.py:23-79``)
- auth token (``src/api/auth.py``)
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from pathlib import Path
from typing import Optional

from ..app import RAGApplication
from ..config.mode_config import QueryMode, mode_config
from ..ingestion.metadata import known_manufacturers, known_models
from ..ingestion.video_processor import validate_video_url
from ..schemas.models import (
    AnalyzeQueryRequest,
    AuthTokenRequest,
    BatchVideoIngestRequest,
    CleanupJobsRequest,
    CompressTokenStoreRequest,
    ContributeRequest,
    DebugRetrievalRequest,
    EnhancedQueryRequest,
    ProfileRequest,
    QueryBatchRequest,
    TextIngestRequest,
    UserChoiceRequest,
    ValidateQueryRequest,
    VideoIngestRequest,
)
from .auth import issue_token
from .http import HTTPApi, HTTPError, Request, Router, parse_body

_MODE_INFO = {
    QueryMode.FACTS: {"name": "车辆规格查询", "icon": "📌", "time_estimate": "~10秒"},
    QueryMode.FEATURES: {"name": "功能特性分析", "icon": "💡", "time_estimate": "~15秒"},
    QueryMode.TRADEOFFS: {"name": "权衡利弊分析", "icon": "🧾", "time_estimate": "~20秒"},
    QueryMode.SCENARIOS: {"name": "使用场景评估", "icon": "🧩", "time_estimate": "~18秒"},
    QueryMode.DEBATE: {"name": "多角度辩论", "icon": "🗣️", "time_estimate": "~25秒"},
    QueryMode.QUOTES: {"name": "原文引用提取", "icon": "💬", "time_estimate": "~12秒"},
}


def _mode_payload(mode: QueryMode) -> dict:
    params = mode_config.params(mode)
    return {
        "mode": mode.value,
        **_MODE_INFO[mode],
        "retrieval_k": params.retrieval_k,
        "final_k": params.final_k,
        "max_tokens": params.max_tokens,
        "max_context_tokens": params.max_context_tokens,
        "complexity": params.complexity,
    }


def build_api(app: RAGApplication) -> HTTPApi:
    router = Router()

    # ------------------------------------------------------------- root
    @router.get("/")
    def root(req: Request):
        return {
            "service": "automative-rag-tpu",
            "version": "0.1.0",
            "endpoints": router.routes(),
        }

    @router.get("/health")
    def health(req: Request):
        return app.health()

    @router.get("/ui")
    def ui_page(req: Request):
        from ..ui import UI_HTML
        from .http import RawResponse

        return RawResponse(UI_HTML)

    @router.get("/openapi.json")
    def openapi(req: Request):
        """Minimal OpenAPI 3 document generated from the route table."""
        paths: dict = {}
        for route in router.describe():
            entry = paths.setdefault(
                route["path"].replace("{", "{").replace("}", "}"), {}
            )
            entry[route["method"].lower()] = {
                "summary": route["summary"],
                "responses": {"200": {"description": "OK"}},
            }
        return {
            "openapi": "3.0.0",
            "info": {"title": "automative-rag-tpu", "version": "0.1.0"},
            "paths": paths,
        }

    @router.get("/docs")
    def docs_page(req: Request):
        """Self-contained API reference (no CDN assets — zero-egress safe)."""
        from .http import RawResponse

        rows = "".join(
            f"<tr><td><code>{r['method']}</code></td>"
            f"<td><code>{r['path']}</code></td><td>{r['summary']}</td></tr>"
            for r in router.describe()
        )
        html = (
            "<!DOCTYPE html><html><head><meta charset='utf-8'>"
            "<title>automative-rag-tpu API</title><style>"
            "body{font:14px/1.6 sans-serif;max-width:960px;margin:24px auto;"
            "padding:0 16px;color:#222}table{border-collapse:collapse;width:100%}"
            "td,th{border-bottom:1px solid #ddd;padding:6px 8px;text-align:left}"
            "code{background:#f2f2f6;padding:1px 5px;border-radius:4px}"
            "</style></head><body><h1>automative-rag-tpu API</h1>"
            "<p>Web UI at <a href='/ui'>/ui</a> · raw spec at "
            "<a href='/openapi.json'>/openapi.json</a></p>"
            f"<table><tr><th>Method</th><th>Path</th><th>Summary</th></tr>{rows}</table>"
            "</body></html>"
        )
        return RawResponse(html)

    @router.get("/job-chains")
    def job_chains(req: Request):
        chains = app.job_chain.all_chains()
        return {
            "total": len(chains),
            "chains": [
                {
                    "job_id": c["job_id"],
                    "job_type": c["job_type"],
                    "steps": c["steps"],
                    "current_step": c["current"],
                    "step_status": c["step_status"],
                    "paused": c["paused"],
                }
                for c in chains
            ],
        }

    @router.get("/job-chains/{job_id}")
    def job_chain_detail(req: Request):
        state = app.job_chain.get_chain_state(req.params["job_id"])
        if state is None:
            raise HTTPError(404, "job chain not found")
        state.pop("data", None)  # payloads can be large
        return state

    @router.get("/workers/status")
    def workers_status(req: Request):
        return {
            "workers": app.queue_manager.worker_health(),
            "queues": app.queue_manager.get_queue_status(),
        }

    @router.get("/query/default-mode")
    def default_mode(req: Request):
        return _mode_payload(QueryMode.FACTS)

    # ------------------------------------------------------------- auth
    @router.post("/auth/token")
    def auth_token(req: Request):
        body = parse_body(req, AuthTokenRequest)
        token = issue_token(body.username, body.password, app.settings.api_key)
        if token is None:
            raise HTTPError(401, "invalid credentials")
        return {"access_token": token, "token_type": "bearer"}

    # ------------------------------------------------------------ query
    @router.post("/query")
    def submit_query(req: Request):
        body = parse_body(req, EnhancedQueryRequest)
        mode = body.mode.value
        validation = body.validation
        if not isinstance(validation, str):  # true → basic, "guided" passes through
            validation = bool(validation)
        job_id = app.submit_query(
            body.query, mode,
            body.metadata_filter.compact() if body.metadata_filter else None,
            validation=validation,
        )
        return {"job_id": job_id, "status": "pending", "mode": mode}

    @router.post("/query/batch")
    def query_batch(req: Request):
        """Synchronous batched retrieval+answer (serving-throughput path)."""
        body = parse_body(req, QueryBatchRequest)
        if body.metadata_filters is not None and len(body.metadata_filters) != len(body.queries):
            raise HTTPError(422, "metadata_filters must align with queries")
        mode = body.mode.value
        ranked_lists = app.engine.retrieve_batch(
            body.queries, mode=mode,
            metadata_filter=body.metadata_filter.compact() if body.metadata_filter else None,
            metadata_filters=(
                [f.compact() if f else None for f in body.metadata_filters]
                if body.metadata_filters is not None else None
            ),
            final_k=body.final_k,
        )
        answers = app.generator.answer_batch(body.queries, ranked_lists, mode=mode)
        return {"answers": answers, "timings": app.engine.last_timings}

    def _job_result(job_id: str) -> dict:
        job = app.tracker.get_job(job_id)
        if job is None:
            raise HTTPError(404, "job not found")
        return job

    @router.get("/query/results/{job_id}")  # UI polling path (智能查询.py:130)
    def query_results(req: Request):
        return _job_result(req.params["job_id"])

    @router.get("/query/stream/{job_id}")
    def query_stream(req: Request):
        """SSE token stream for a query job: ``partial`` events carry the
        growing answer text (serving-engine decode bursts →
        ``tracker.partial_answer``), a final ``done`` event carries the
        finished status+answer. The reference has no push path at all —
        its Streamlit UI polls (智能查询.py:130); this is the streaming
        surface the polling endpoint approximates."""
        import json as _json

        from .http import StreamingResponse

        job_id = req.params["job_id"]
        _job_result(job_id)  # 404 for unknown ids before streaming starts

        def events(max_s: float = 300.0):
            deadline = time.time() + max_s
            last = None
            last_emit = time.time()
            while time.time() < deadline:
                job = app.tracker.get_job(job_id)
                if job is None:
                    yield 'event: error\ndata: {"detail": "job vanished"}\n\n'
                    return
                if time.time() - last_emit > 10.0:
                    # keepalive comment so idle streams survive proxy
                    # socket timeouts (the gateway's is 120s)
                    yield ": ping\n\n"
                    last_emit = time.time()
                partial = job.get("partial_answer") or ""
                if partial and partial != last:
                    yield ("event: partial\ndata: "
                           + _json.dumps({"text": partial},
                                         ensure_ascii=False) + "\n\n")
                    last = partial
                    last_emit = time.time()
                if job["status"] in app.tracker.TERMINAL:
                    payload = {
                        "status": job["status"],
                        "answer": (job.get("result") or {}).get("answer"),
                        "error": job.get("error"),
                    }
                    yield ("event: done\ndata: "
                           + _json.dumps(payload, ensure_ascii=False)
                           + "\n\n")
                    return
                # event-driven: woken by any tracker update (status or
                # partial), capped so keepalives still go out
                app.tracker.wait_for_update(timeout=2.0)
            yield "event: timeout\ndata: {}\n\n"

        return StreamingResponse(events())

    # --- validation sub-resource (reference query.py:54-89: progress /
    # user-choice / restart / cancel) ---
    @router.get("/query/{job_id}/validation-progress")
    def validation_progress(req: Request):
        job_id = req.params["job_id"]
        job = _job_result(job_id)
        state = app.job_chain.get_chain_state(job_id)
        return {
            "job_id": job_id,
            "status": job["status"],
            "progress": job.get("progress", 0),
            "paused": bool(state and state.get("paused")),
            "user_prompt": (state or {}).get("user_prompt"),
            "step_status": (state or {}).get("step_status"),
            "validation": (job.get("result") or {}).get("validation"),
        }

    @router.post("/query/{job_id}/user-choice")
    def user_choice(req: Request):
        job_id = req.params["job_id"]
        body = parse_body(req, UserChoiceRequest)
        if not app.job_chain.resume_from_user_input(job_id, body.model_dump()):
            raise HTTPError(409, "job is not waiting for user input")
        return {"job_id": job_id, "resumed": True}

    @router.post("/query/{job_id}/contribute")
    def contribute(req: Request):
        """Guided-trust-loop user contribution (reference
        inference_tasks.py:205-278): ingest the contributed evidence, then
        resume the paused workflow."""
        job_id = req.params["job_id"]
        body = parse_body(req, ContributeRequest)
        content = body.content
        contribution = {"type": body.type, "contributed_by": body.user}
        ingest_job = app.ingest_text(
            content, metadata={"source": "manual", **contribution}
        )
        # wait for the evidence to index, then re-retrieve before answering
        # (only for chains that actually carry a query payload)
        state = app.job_chain.get_chain_state(job_id)
        if state and "query" in (state.get("data") or {}):
            app.job_chain.insert_steps_next(
                job_id, ["await_contribution", "retrieve_documents"]
            )
        else:
            app.job_chain.insert_steps_next(job_id, ["await_contribution"])
        resumed = app.job_chain.resume_from_user_input(
            job_id, {"contribution_job_id": ingest_job, "contribution": contribution}
        )
        return {"job_id": job_id, "ingest_job_id": ingest_job, "resumed": resumed}

    @router.post("/query/{job_id}/restart")
    def restart_query(req: Request):
        job_id = req.params["job_id"]
        job = _job_result(job_id)
        meta = job.get("metadata") or {}
        if "query" not in meta:
            raise HTTPError(409, "job has no restartable query payload")
        app.job_chain.cancel(job_id)
        new_id = app.submit_query(
            meta["query"], meta.get("mode", "facts"), meta.get("metadata_filter")
        )
        return {"old_job_id": job_id, "job_id": new_id, "status": "pending"}

    @router.post("/query/{job_id}/cancel")
    def cancel_query(req: Request):
        if not app.job_chain.cancel(req.params["job_id"]):
            raise HTTPError(404, "no active chain for this job")
        return {"job_id": req.params["job_id"], "cancelled": True}

    @router.get("/query/modes")
    def query_modes(req: Request):
        return {"modes": [_mode_payload(m) for m in mode_config.all_modes()]}

    @router.get("/query/modes/{mode}")
    def query_mode_detail(req: Request):
        try:
            mode = QueryMode(req.params["mode"])
        except ValueError:
            raise HTTPError(404, f"unknown mode {req.params['mode']!r}")
        return _mode_payload(mode)

    @router.get("/query/capabilities")
    def capabilities(req: Request):
        return {
            "modes": [m.value for m in mode_config.all_modes()],
            "metadata_filters": [
                "manufacturer", "model", "year", "category",
                "engine_type", "transmission", "source", "source_id",
            ],
            "reranking": True,
            "late_interaction": True,
            "bilingual": ["zh", "en"],
            "index": app.index.stats(),
        }

    @router.post("/query/validate")
    def validate_query(req: Request):
        body = parse_body(req, ValidateQueryRequest)
        query = body.query.strip()
        issues = []
        if not query:
            issues.append("query is empty")
        if len(query) > 512:
            issues.append("query too long (max 512 chars)")
        if body.mode not in {m.value for m in QueryMode}:
            issues.append(f"unknown mode {body.mode!r}")
        return {"valid": not issues, "issues": issues}

    @router.get("/query/templates")
    def query_templates(req: Request):
        """Query template catalog with suggested modes + examples
        (reference src/ui/components/query_templates.py:7-60, served
        instead of UI-embedded so any client gets the same catalog)."""
        from ..services.query_assist import QUERY_TEMPLATES

        return {"templates": QUERY_TEMPLATES}

    @router.post("/query/analyze")
    def query_analyze(req: Request):
        """Query quality score + refinement suggestions + detected
        filterable entities (reference query_refinement.py:39-72)."""
        from ..services.query_assist import analyze_query_quality

        body = parse_body(req, AnalyzeQueryRequest)
        return analyze_query_quality(body.query)

    @router.get("/system/help/{context}")
    def contextual_help(req: Request):
        """Contextual help text per UI view (reference
        contextual_help.py:7-79)."""
        from ..services.query_assist import CONTEXTUAL_HELP

        ctx = req.params["context"]
        if ctx not in CONTEXTUAL_HELP:
            raise HTTPError(404, f"no help for context {ctx!r}")
        return CONTEXTUAL_HELP[ctx]

    @router.get("/query/manufacturers")
    def manufacturers(req: Request):
        indexed = sorted(app.index.columns.vocabs.get("manufacturer", {}))
        return {"manufacturers": indexed or known_manufacturers()}

    @router.get("/query/models")
    def models(req: Request):
        manufacturer = req.query_param("manufacturer")
        indexed = sorted(app.index.columns.vocabs.get("model", {}))
        return {"models": indexed or known_models(manufacturer)}

    @router.get("/query/history")
    def query_history(req: Request):
        return {"history": app.analytics.history(int(req.query_param("limit", "50")))}

    @router.get("/query/suggestions")
    def query_suggestions(req: Request):
        return {"suggestions": app.analytics.suggestions(req.query_param("prefix", ""))}

    @router.get("/system/analytics")
    def system_analytics(req: Request):
        return app.analytics.usage_summary()

    @router.get("/query/queue-status")
    def queue_status(req: Request):
        return app.queue_manager.get_queue_status()

    @router.post("/query/debug-retrieval")
    def debug_retrieval(req: Request):
        body = parse_body(req, DebugRetrievalRequest)
        ranked = app.engine.retrieve(
            body.query,
            mode=body.mode.value,
            metadata_filter=body.metadata_filter.compact() if body.metadata_filter else None,
            rerank=body.rerank,
        )
        return {
            "query": body.query,
            "count": len(ranked),
            "timings": app.engine.last_timings,
            "documents": [
                {
                    "id": doc.id,
                    "score": score,
                    "metadata": doc.metadata,
                    "preview": doc.page_content[:200],
                }
                for doc, score in ranked
            ],
        }

    # ----------------------------------------------------------- ingest
    @router.post("/ingest/text")
    def ingest_text(req: Request):
        body = parse_body(req, TextIngestRequest)
        job_id = app.ingest_text(body.content, body.metadata or None)
        return {"job_id": job_id, "status": "pending"}

    @router.post("/ingest/video")
    def ingest_video(req: Request):
        body = parse_body(req, VideoIngestRequest)
        ok, reason = validate_video_url(body.url)
        if not ok:
            raise HTTPError(422, f"invalid video url: {reason}")
        job_id = app.ingest_video(body.url, body.metadata or None)
        return {"job_id": job_id, "status": "pending"}

    @router.post("/ingest/batch-videos")
    def ingest_batch(req: Request):
        urls = parse_body(req, BatchVideoIngestRequest).urls
        accepted, rejected = [], []
        for url in urls:
            ok, reason = validate_video_url(url)
            (accepted if ok else rejected).append(url if ok else {"url": url, "reason": reason})
        job_ids = app.ingest_batch_videos(accepted)
        return {"job_ids": job_ids, "accepted": len(job_ids), "rejected": rejected}

    @router.post("/ingest/pdf")
    def ingest_pdf(req: Request):
        """Accepts a raw PDF body (Content-Type: application/pdf) or a JSON
        body {"path": server-local path}."""
        ctype = (req.headers.get("content-type") or req.headers.get("Content-Type") or "")
        if ctype.startswith("application/pdf"):
            Path(app.settings.upload_dir).mkdir(parents=True, exist_ok=True)
            name = req.query_param("filename", f"upload-{uuid.uuid4().hex[:8]}.pdf")
            path = os.path.join(app.settings.upload_dir, os.path.basename(name))
            with open(path, "wb") as f:
                f.write(req.body)
        else:
            from ..schemas.models import PDFIngestRequest

            path = parse_body(req, PDFIngestRequest).path
            if not os.path.exists(path):
                raise HTTPError(422, "provide a PDF body or an existing 'path'")
        job_id = app.ingest_pdf(path)
        return {"job_id": job_id, "status": "pending", "path": path}

    def _doc_filter_from_query(req: Request) -> dict:
        """Shared query-param → filter-DSL parsing (browse + bulk delete)."""
        flt = {}
        for field in ("manufacturer", "model", "category", "engine_type",
                      "transmission", "source", "source_id", "job_id"):
            value = req.query_param(field)
            if value:
                flt[field] = value
        year = req.query_param("year")
        year_gte, year_lte = req.query_param("year_gte"), req.query_param("year_lte")
        if year and (year_gte or year_lte):
            raise HTTPError(
                422, "'year' cannot be combined with 'year_gte'/'year_lte'"
            )
        if year:
            flt["year"] = int(year)
        if year_gte or year_lte:
            flt["year"] = {
                **({"gte": int(year_gte)} if year_gte else {}),
                **({"lte": int(year_lte)} if year_lte else {}),
            }
        return flt

    @router.get("/ingest/documents")
    def browse_documents(req: Request):
        """Metadata-only scroll over the index (reference Qdrant scroll
        search, vectorstore.py:278-318 / 文档浏览 page)."""
        flt = _doc_filter_from_query(req)
        flt.pop("job_id", None)  # browse matches the indexed fields only
        limit = int(req.query_param("limit", "50"))
        offset = int(req.query_param("offset", "0"))
        if flt:
            docs = app.index.metadata_search(flt, limit=limit + 1, offset=offset)
        else:
            live = [d for d in app.index._docs if d.id in app.index._row_of_id]
            docs = live[offset : offset + limit + 1]
        has_more = len(docs) > limit
        docs = docs[:limit]
        return {
            "count": len(docs),
            "total": app.index.count,
            "offset": offset,
            "has_more": has_more,
            "filter": flt,
            "documents": [
                {"id": d.id, "metadata": d.metadata, "preview": d.page_content[:200]}
                for d in docs
            ],
        }

    @router.delete("/ingest/documents/{doc_id}")
    def delete_document(req: Request):
        """Delete one document by id (reference delete-by-ids,
        vectorstore.py:320-353). Deletes tombstone; reclaim rows with
        POST /system/compact-index."""
        doc_id = req.params["doc_id"]
        if app.index.delete_by_ids([doc_id]) == 0:
            raise HTTPError(404, "document not found")
        return {"deleted": 1, "doc_id": doc_id, "remaining": app.index.count}

    @router.delete("/ingest/documents")
    def delete_documents(req: Request):
        """Bulk delete by metadata filter or by the ingest job that created
        the documents (reference delete-by-ids semantics over the filter
        DSL). Refuses an empty filter — full wipes go through
        POST /ingest/reset."""
        flt = _doc_filter_from_query(req)
        if not flt:
            raise HTTPError(
                422, "provide at least one filter (or use POST /ingest/reset)"
            )
        job_id = flt.pop("job_id", None)
        victims: set = set()
        if job_id is not None:
            victims.update(
                d.id for d in app.index._docs
                if d.metadata.get("job_id") == job_id
                and d.id in app.index._row_of_id
            )
        if flt:
            matched = {
                d.id for d in app.index.metadata_search(flt, limit=10**9)
            }
            victims = victims & matched if job_id is not None else matched
        deleted = app.index.delete_by_ids(sorted(victims))
        return {"deleted": deleted, "filter": {**flt, **({"job_id": job_id} if job_id else {})},
                "remaining": app.index.count}

    @router.get("/ingest/documents/{doc_id}")
    def document_detail(req: Request):
        """Full chunk inspection (reference 文档浏览.py chunk view): complete
        content, metadata, and sibling chunks from the same source."""
        doc_id = req.params["doc_id"]
        row = app.index._row_of_id.get(doc_id)
        if row is None:
            raise HTTPError(404, "document not found")
        doc = app.index._docs[row]
        source_id = doc.metadata.get("source_id")
        siblings = []
        if source_id:
            siblings = [
                {
                    "id": d.id,
                    "chunk_index": d.metadata.get("chunk_index"),
                    "preview": d.page_content[:80],
                }
                for d in app.index._docs
                if d.metadata.get("source_id") == source_id
                and d.id in app.index._row_of_id and d.id != doc_id
            ]
            # sort BEFORE capping (capping first in row order could drop
            # exactly the adjacent chunks this view exists to show), then
            # keep the 20 nearest to this chunk's index
            siblings.sort(
                key=lambda s: (s["chunk_index"] is None, s["chunk_index"])
            )
            here = doc.metadata.get("chunk_index")
            if len(siblings) > 20 and here is not None:
                siblings.sort(
                    key=lambda s: (s["chunk_index"] is None,
                                   abs((s["chunk_index"] or 0) - here))
                )
                siblings = sorted(
                    siblings[:20],
                    key=lambda s: (s["chunk_index"] is None, s["chunk_index"]),
                )
            else:
                siblings = siblings[:20]
        return {
            "id": doc.id,
            "content": doc.page_content,
            "metadata": doc.metadata,
            "length": len(doc.page_content),
            "siblings": siblings,
        }

    @router.post("/query/explain")
    def explain_match(req: Request):
        """Token-level match explanation for (query, doc) — reference
        rerankers.py:387-561 explanations, surfaced per document."""
        from ..schemas.models import ExplainRequest

        body = parse_body(req, ExplainRequest)
        row = app.index._row_of_id.get(body.doc_id)
        if row is None:
            raise HTTPError(404, "document not found")
        doc = app.index._docs[row]
        explanation = app.reranker.explain(body.query, doc,
                                           top_matches=body.top_matches)
        if app.sparse_encoder is not None:
            # the lexical half of the hybrid: which exact terms matched
            explanation["sparse_overlap"] = app.sparse_encoder.explain_overlap(
                body.query, doc.page_content, top=body.top_matches)
        return {"query": body.query, "doc_id": body.doc_id, **explanation}

    @router.post("/system/compress-token-store")
    def compress_token_store(req: Request):
        """PLAID-style token-store compression (rerank/residual_codec.py)."""
        if app.token_store is None:
            raise HTTPError(409, "token store is disabled")
        body = parse_body(req, CompressTokenStoreRequest)
        return app.token_store.compress(k_centroids=body.k_centroids, bits=body.bits)

    @router.get("/ingest/jobs")
    def list_jobs(req: Request):
        return {
            "jobs": app.tracker.get_all_jobs(
                job_type=req.query_param("job_type"),
                status=req.query_param("status"),
                limit=int(req.query_param("limit", "100")),
                offset=int(req.query_param("offset", "0")),
            ),
            "counts": app.tracker.get_job_counts(),
        }

    @router.get("/ingest/jobs/{job_id}")
    def get_job(req: Request):
        return _job_result(req.params["job_id"])

    @router.get("/ingest/jobs/{job_id}/analysis")
    def job_analysis(req: Request):
        """Per-job chunk analysis (reference ingest.py:379-498
        calculate_job_processing_analysis): chunk counts, metadata coverage,
        vehicle detection, quality summary over the job's indexed chunks."""
        job_id = req.params["job_id"]
        _job_result(job_id)
        docs = [
            d for d in app.index._docs
            if d.metadata.get("job_id") == job_id
            and d.id in app.index._row_of_id
        ]
        if not docs:
            return {"job_id": job_id, "chunks": 0, "note": "no indexed chunks for this job"}
        from ..utils.quality import get_automotive_validation_summary

        fields = ("manufacturer", "model", "year", "category", "engine_type")
        coverage = {
            f: sum(1 for d in docs if d.metadata.get(f) is not None) / len(docs)
            for f in fields
        }
        return {
            "job_id": job_id,
            "chunks": len(docs),
            "total_chars": sum(len(d.page_content) for d in docs),
            "vehicle_detected_rate": sum(
                1 for d in docs if d.metadata.get("vehicle_detected")
            ) / len(docs),
            "metadata_coverage": coverage,
            "quality": get_automotive_validation_summary(docs),
            "sources": sorted({str(d.metadata.get("source")) for d in docs}),
        }

    @router.delete("/ingest/jobs/{job_id}")
    def delete_job(req: Request):
        if not app.tracker.delete_job(req.params["job_id"]):
            raise HTTPError(404, "job not found")
        return {"deleted": req.params["job_id"]}

    @router.post("/ingest/reset")
    def reset(req: Request):
        return app.reset_index()

    # ----------------------------------------------------------- system
    @router.get("/system/health/detailed")
    def system_health(req: Request):
        health = app.health()
        try:
            du = shutil.disk_usage(".")
            health["disk"] = {
                "total_gb": round(du.total / 1e9, 1),
                "used_gb": round(du.used / 1e9, 1),
                "free_gb": round(du.free / 1e9, 1),
            }
        except OSError:
            pass
        import jax

        health["devices"] = [
            {"id": d.id, "platform": d.platform, "kind": getattr(d, "device_kind", "?")}
            for d in jax.devices()
        ]
        return health

    @router.get("/metrics")
    def metrics(req: Request):
        """Prometheus text exposition of the live counters (the reference
        has no scrape surface at all — SURVEY §5 'No Prometheus/OTel'; its
        numbers only existed as JSON dashboards). Everything here is
        already tracked; this is the ops-standard rendering of it."""
        from .http import RawResponse

        lines: list = []

        def emit(name, value, help_text="", labels=None, mtype="gauge"):
            if help_text:
                lines.append(f"# HELP {name} {help_text}")
                lines.append(f"# TYPE {name} {mtype}")
            label_s = ""
            if labels:
                inner = ",".join(f'{k}="{v}"' for k, v in labels.items())
                label_s = "{" + inner + "}"
            lines.append(f"{name}{label_s} {value}")

        h = app.health()
        emit("rag_uptime_seconds", h["uptime_s"], "process uptime")
        emit("rag_index_rows", h["index"].get("count", 0), "live indexed chunks")
        emit("rag_index_hbm_bytes", h["index"].get("hbm_bytes", 0),
             "device bytes held by the vector index")
        from ..orchestration.job_tracker import JobStatus

        lines.append("# HELP rag_jobs job count by status")
        lines.append("# TYPE rag_jobs gauge")
        for status in JobStatus:
            # every status series exists from scrape one (no gaps when the
            # first job of a status appears mid-retention-window)
            emit("rag_jobs", h["jobs"].get(status.value, 0),
                 labels={"status": status.value})
        for metric, help_text, mtype in (
            ("enqueued", "tasks enqueued", "counter"),
            ("completed", "tasks completed", "counter"),
            ("failed", "tasks failed after retries", "counter"),
            ("retried", "task retry attempts", "counter"),
            ("pending", "tasks waiting in queue", "gauge"),
            ("in_flight", "tasks executing now", "gauge"),
        ):
            first = True
            for qname, qs in h["queues"].items():
                if first:
                    lines.append(f"# HELP rag_queue_{metric} {help_text}")
                    lines.append(f"# TYPE rag_queue_{metric} {mtype}")
                    first = False
                emit(f"rag_queue_{metric}", qs.get(metric, 0),
                     labels={"queue": qname})
        serving = h.get("llm_serving")
        if serving:
            for key, value in serving.items():
                if isinstance(value, (int, float)) and not isinstance(value, bool):
                    emit(f"rag_llm_serving_{key}", value,
                         f"serving engine {key}",
                         mtype="counter" if key.endswith(
                             ("_requests", "_tokens", "_hits", "_misses",
                              "errors", "_prefills", "truncated_prompts",
                              "_cancelled")) else "gauge")
        usage = app.analytics.usage_summary()
        emit("rag_queries_total", usage.get("total_queries", 0),
             "queries answered", mtype="counter")
        for key in ("latency_p50_s", "latency_p95_s"):
            if usage.get(key) is not None:
                emit(f"rag_query_{key.replace('_s', '_seconds')}",
                     usage[key], f"query generation {key}")
        return RawResponse("\n".join(lines) + "\n",
                           content_type="text/plain; version=0.0.4")

    @router.get("/system/workers")
    def system_workers(req: Request):
        return {"workers": app.queue_manager.worker_health()}

    @router.get("/system/queue-stats")
    def system_queues(req: Request):
        return app.queue_manager.get_queue_status()

    @router.get("/system/config")
    def system_config(req: Request):
        cfg = app.settings.to_dict()
        cfg.pop("api_key", None)
        return cfg

    @router.get("/system/disk-usage")
    def disk_usage(req: Request):
        du = shutil.disk_usage(".")
        return {"total": du.total, "used": du.used, "free": du.free}

    @router.post("/system/profile")
    def system_profile(req: Request):
        """Run one retrieval under a jax.profiler device trace."""
        from ..utils.profiling import profile_retrieval

        body = parse_body(req, ProfileRequest)
        trace_dir = body.trace_dir or os.path.join(
            app.settings.data_dir, "traces", str(int(time.time()))
        )
        return profile_retrieval(
            app.engine, body.query, trace_dir=trace_dir, mode=body.mode.value
        )

    @router.post("/system/save-index")
    def save_index(req: Request):
        """Checkpoint the index (+ token store) to INDEX_DIR — the durable
        artifact a restarted deployment reloads (INDEX_AUTOLOAD=1 or
        POST /system/load-index)."""
        directory = app.save_index()
        return {"saved_to": directory, "rows": app.index.count}

    @router.post("/system/load-index")
    def load_index(req: Request):
        import os

        if not os.path.exists(
            os.path.join(app.settings.index_dir, "manifest.json")
        ):
            raise HTTPError(
                404, f"no index checkpoint under {app.settings.index_dir!r} "
                     "(save one with POST /system/save-index)")
        rows = app.load_index()
        return {"loaded": rows, "kind": app.index.stats()["kind"]}

    @router.post("/system/rebuild-index")
    def rebuild_index(req: Request):
        return app.rebuild_index()

    @router.post("/system/compact-index")
    def compact_index(req: Request):
        """Reclaim tombstoned rows (upserts/deletes only tombstone); the
        row-aligned token store compacts in the same atomic operation."""
        return app.compact_index()

    @router.post("/system/warmup")
    def warmup(req: Request):
        """Pre-compile the hot query executables (see RAGApplication.warmup)."""
        return app.warmup()

    @router.post("/system/clear-cache")
    def clear_cache(req: Request):
        """Drop device caches + jit executables (reference
        POST /system/clear-gpu-cache; here it forces the index to re-stage
        its HBM state and clears XLA's live executables)."""
        import jax

        app.index._device = None
        if app.token_store is not None:
            # syncs device-appended rows to the host copy before releasing
            app.token_store.drop_device_cache()
        jax.clear_caches()
        return {"cleared": True}

    @router.post("/system/restart-workers")
    def restart_workers(req: Request):
        return {"restarted": app.queue_manager.restart_workers()}

    @router.post("/system/cleanup-jobs")
    def cleanup_jobs(req: Request):
        body = parse_body(req, CleanupJobsRequest)
        max_age_days = (
            body.max_age_days if body.max_age_days is not None
            else app.settings.job_retention_days
        )
        removed = app.tracker.cleanup_old_jobs(max_age_days)
        stalled = app.tracker.mark_stalled_jobs()
        timeouts = [
            {"task": i.task_name, "job_id": i.job_id, "instance": i.instance_id}
            for i in app.task_model.sweep_timeouts()
        ]
        # terminal chain states age out on the reference's 24h-TTL schedule
        # (or sooner if the job retention window is shorter)
        pruned = app.job_chain.prune_terminal(
            min(max_age_days * 86400.0, 86400.0)
        )
        tasks_pruned = app.task_model.prune(max_age_days * 86400.0)
        return {"removed": removed, "marked_stalled": stalled,
                "chains_pruned": pruned, "task_timeouts": timeouts,
                "task_rows_pruned": tasks_pruned}

    @router.get("/system/tasks")
    def task_statistics(req: Request):
        """Task-instance table statistics (reference TaskModel statistics,
        src/models/task_models.py:140-474): per-status counts and average
        durations across every executed step, retries included."""
        return app.task_model.statistics()

    @router.get("/system/tasks/{job_id}")
    def task_instances(req: Request):
        """Per-job execution rows — one per attempt, so a flaky step shows
        its failed tries next to the eventual success."""
        job_id = req.params["job_id"]
        rows = [
            {
                "instance_id": i.instance_id,
                "task": i.task_name,
                "status": i.status,
                "attempts": i.attempts,
                "duration_s": round(i.duration_s, 4) if i.duration_s is not None else None,
                "error": i.error,
            }
            for i in app.task_model.for_job(job_id)
        ]
        return {"job_id": job_id, "instances": rows}

    # ------------------------------------------------------------ model
    @router.get("/model/config")
    def model_config(req: Request):
        return {
            "embedding": {
                "dim": app.embedder.dim,
                "pretrained": app.embedder.pretrained,
                "max_length": app.embedder.max_length,
                "batch_size": app.embedder.batch_size,
            },
            "colbert": {
                "max_query_length": app.colbert.max_query_length,
                "max_doc_length": app.colbert.max_doc_length,
                "pretrained": app.colbert.pretrained,
            },
            "rerank_weights": {
                "colbert": app.settings.colbert_weight,
                "second": app.settings.bge_weight,
            },
            "retrieval": {
                "retriever_top_k": app.settings.retriever_top_k,
                "reranker_top_k": app.settings.reranker_top_k,
            },
            "llm": getattr(app.generator.llm, "name", "unknown"),
            "index_dtype": str(app.settings.index_dtype),
        }

    @router.get("/model/status")
    def model_status(req: Request):
        """Per-model load status (reference model.py:80-229)."""
        out = {
            "embedder": {
                "mode": app.embedder.mode,
                "pretrained": app.embedder.pretrained,
                "dim": app.embedder.dim,
                "path": app.settings.embedding_model_path or None,
            },
            "colbert": {
                "pretrained": app.colbert.pretrained,
                "path": app.settings.colbert_model_path or None,
            },
            "sparse": (None if app.sparse_encoder is None else {
                "mode": app.sparse_encoder.mode,  # lexical | transformer
                "learned_head": app.sparse_encoder.mode == "transformer",
            }),
            "cross_encoder": {
                "loaded": app.reranker.second_scorer is not None,
                "path": app.settings.reranker_model_path or None,
            },
            "llm": {
                "backend": getattr(app.generator.llm, "name", "unknown"),
                "path": app.settings.llm_model_path or None,
            },
            "whisper": {
                "loaded": app.video_transcriber is not None,
                "path": app.settings.whisper_model_path or None,
            },
        }
        # the UI renders every entry as an object; drop disabled models
        return {k: v for k, v in out.items() if v is not None}

    @router.post("/model/update-config")
    def update_config(req: Request):
        from ..schemas.models import SystemConfigUpdate

        body = parse_body(req, SystemConfigUpdate)
        applied = app.settings.update(body.model_dump())
        # IVF tunables are runtime-mutable: push them to the live index
        # (the device-state cache tops up / retires its head-slice copy)
        for key, attr in (("ivf_n_probe", "n_probe"),
                          ("ivf_refine_dims", "refine_dims"),
                          ("ivf_refine_shortlist", "refine_shortlist")):
            if key in applied and hasattr(app.index, attr):
                setattr(app.index, attr, applied[key])
        # sparse-arm tunables are live on the engine
        for key in ("sparse_k", "sparse_weight", "sparse_rerank_weight"):
            if key in applied:
                setattr(app.engine, key, applied[key])
        if "retrieval_cache_size" in applied:
            app.engine.cache_size = applied["retrieval_cache_size"]
        # reference persists config updates to a JSON file
        # (src/config/utils.py:17-90 via /model/update-config)
        saved_to = app.settings.save() if applied else None
        return {"applied": applied, "saved_to": saved_to}

    @router.get("/ingest/jobs/{job_id}/progress")
    def job_progress(req: Request):
        """Per-job progress message stream (reference job_tracker.py:87-143
        progress keys; rendered by the jobs dashboard)."""
        job_id = req.params["job_id"]
        _job_result(job_id)
        return {"job_id": job_id, "messages": app.tracker.get_progress_messages(job_id)}

    @router.get("/ingest/jobs/{job_id}/chain")
    def job_chain_alias(req: Request):
        """Reference ingest.py GET /jobs/{id}/chain alias."""
        state = app.job_chain.get_chain_state(req.params["job_id"])
        if state is None:
            raise HTTPError(404, "job chain not found")
        state.pop("data", None)
        return state

    @router.get("/query/{job_id}/validation")
    def validation_alias(req: Request):
        return validation_progress(req)

    @router.delete("/query/{job_id}/validation")
    def cancel_validation(req: Request):
        """Cancel a paused validation workflow (reference
        DELETE /{job_id}/validation): unpauses and lets the chain proceed
        without the user's input."""
        job_id = req.params["job_id"]
        if not app.job_chain.resume_from_user_input(job_id, {"validation_cancelled": True}):
            raise HTTPError(409, "job is not in a validation pause")
        return {"job_id": job_id, "validation": "cancelled"}

    @router.get("/system/model-info")
    def system_model_info(req: Request):
        return model_status(req)

    @router.post("/model/swap-encoder")
    def swap_encoder(req: Request):
        """Hot-swap the dense encoder from a trained export or HF dir and
        re-embed the corpus in place (train→serve loop; see
        RAGApplication.swap_encoder)."""
        from ..schemas.models import SwapEncoderRequest

        body = parse_body(req, SwapEncoderRequest)
        try:
            return app.swap_encoder(body.path)
        except (ValueError, FileNotFoundError) as exc:
            raise HTTPError(422, str(exc)) from exc

    @router.post("/model/reload-model")
    def reload_model(req: Request):
        """Re-instantiate encoders from the current settings paths
        (reference POST /reload-model + background/models.py:444-476)."""
        from ..models.bge_m3 import DenseEmbedder
        from ..models.colbert import ColBERTEncoder

        config = app.embedder.config
        app.embedder = DenseEmbedder(
            config=config,
            weights_path=app.settings.embedding_model_path,
            tokenizer_path=app.settings.embedding_model_path,
            max_length=app.settings.embedding_max_length,
            batch_size=app.settings.embedding_batch_size,
        )
        app.colbert = ColBERTEncoder(
            config=config,
            weights_path=app.settings.colbert_model_path,
            tokenizer_path=app.settings.colbert_model_path,
            max_query_length=app.settings.colbert_max_query_length,
            max_doc_length=app.settings.colbert_max_doc_length,
            batch_size=app.settings.colbert_batch_size,
        )
        app.engine.embedder = app.embedder
        app.reranker.encoder = app.colbert
        out = {
            "reloaded": True,
            "embedder_pretrained": app.embedder.pretrained,
            "colbert_pretrained": app.colbert.pretrained,
        }
        if app.index.count:
            # reference-parity behavior, reference-parity trap: the corpus
            # stays embedded by the PREVIOUS weights (background/models.py
            # reload has the same hazard). swap-encoder re-embeds.
            out["warning"] = (
                f"{app.index.count} indexed documents still carry the "
                "previous encoder's embeddings — POST /model/swap-encoder "
                "to re-embed consistently, or /ingest/reset + re-ingest")
        return out

    @router.get("/system/heartbeats")
    def heartbeats(req: Request):
        """Heartbeat analysis (reference system.py redis key-analysis /
        worker_status.py heartbeat scan — in-process equivalents)."""
        import time as _time

        now = _time.time()
        return {
            "workers": {
                name: {
                    "last_beat_age_s": round(now - beat, 1),
                    "health": app.queue_manager.worker_health().get(name, "unknown"),
                }
                for name, beat in app.queue_manager._heartbeats.items()
            }
        }

    @router.get("/system/workers/debug")
    def workers_debug(req: Request):
        import threading as _threading

        return {
            "queues": app.queue_manager.get_queue_status(),
            "threads": [
                {"name": t.name, "alive": t.is_alive(), "daemon": t.daemon}
                for t in _threading.enumerate()
                if t.name.startswith("worker-")
            ],
        }

    @router.get("/system/state-analysis")
    def state_analysis(req: Request):
        """State-store introspection (reference /system/redis/key-analysis,
        system.py:351-368 — there the state is Redis keys; here it is the
        in-proc job tracker, chain registry, and analytics history):
        per-type/status job breakdowns, payload sizes, and anything that
        looks stuck."""
        import json as _json
        import time as _time

        jobs = app.tracker.get_all_jobs(limit=10**9)
        by_type: dict = {}
        by_status: dict = {}
        stuck = []
        now = _time.time()
        result_bytes = 0
        for job in jobs:
            by_type[job["job_type"]] = by_type.get(job["job_type"], 0) + 1
            by_status[job["status"]] = by_status.get(job["status"], 0) + 1
            result_bytes += len(_json.dumps(job.get("result") or {}))
            if (job["status"] in ("processing", "pending")
                    and now - job["updated_at"] > 600):
                stuck.append({"job_id": job["job_id"],
                              "status": job["status"],
                              "age_s": round(now - job["updated_at"], 1)})
        chains = app.job_chain.all_chains()
        return {
            "jobs": {
                "total": len(jobs),
                "by_type": by_type,
                "by_status": by_status,
                "result_payload_bytes": result_bytes,
            },
            "chains": {"total": len(chains)},
            "analytics_history": len(app.analytics.history(10**6)),
            "possibly_stuck": stuck,
            "recommendations": (
                ["run POST /system/cleanup-jobs"] if stuck else []
            ),
        }

    # registered last so literal /query/* routes match first
    @router.get("/query/{job_id}")
    def query_result_alias(req: Request):
        """Reference-shaped alias (query.py:41-47 GET /query/{job_id})."""
        return _job_result(req.params["job_id"])

    @router.delete("/ingest/jobs")
    def bulk_delete_jobs(req: Request):
        """Bulk delete by status (reference job CRUD, ingest.py:277-340)."""
        status_filter = req.query_param("status", "completed")
        victims = [
            j["job_id"]
            for j in app.tracker.get_all_jobs(status=status_filter, limit=10_000)
        ]
        for job_id in victims:
            app.tracker.delete_job(job_id)
        return {"deleted": len(victims), "status": status_filter}

    token = app.settings.api_key if app.settings.api_auth_enabled else None
    return HTTPApi(router, auth_token=token, open_paths=("/health", "/auth/token", "/ui"))


def serve(app: Optional[RAGApplication] = None, host: Optional[str] = None,
          port: Optional[int] = None, background: bool = False):
    app = app or RAGApplication()
    api = build_api(app)
    return api.serve(
        host or app.settings.host, port if port is not None else app.settings.port,
        background=background,
    )
