"""Workflow execution contexts and per-mode optimization hints.

Parity target: reference ``WorkflowService`` (``src/services/
workflow_service.py``) — execution contexts per workflow type (:31-160),
per-mode optimization hints (:163-415), efficiency/quality scoring
(:446-499), bridge to core orchestration (:518-548).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

from ..config.mode_config import QueryMode, mode_config
from ..orchestration.task_router import JobType
from ..orchestration.workflows import get_workflow_for_job_type


class WorkflowService:
    def __init__(self, app):
        self.app = app

    # ------------------------------------------------------------ context
    def build_execution_context(self, job_type: str, payload: Dict[str, Any]) -> Dict[str, Any]:
        steps = get_workflow_for_job_type(job_type)
        context = {
            "job_type": str(job_type),
            "steps": steps,
            "estimated_steps": len(steps),
            "created_at": time.time(),
        }
        if str(job_type) == JobType.LLM_INFERENCE.value:
            mode = QueryMode.parse(payload.get("mode", "facts"))
            context["optimization"] = self.query_optimization_hints(mode)
        return context

    def query_optimization_hints(self, mode: QueryMode | str) -> Dict[str, Any]:
        params = mode_config.params(mode)
        return {
            "mode": QueryMode.parse(mode).value,
            "retrieval_k": params.retrieval_k,
            "final_k": params.final_k,
            "context_budget": params.max_context_tokens,
            "prefer_numerical": params.prioritize_numerical,
            "complexity": params.complexity,
        }

    # ------------------------------------------------------------- bridge
    def start(self, job_type: str, payload: Dict[str, Any]) -> str:
        job_id = self.app.tracker.create_job(str(job_type), metadata={"payload_keys": sorted(payload)})
        self.app.job_chain.start_job_chain(job_id, str(job_type), payload)
        return job_id

    def status(self, job_id: str) -> Optional[Dict[str, Any]]:
        job = self.app.tracker.get_job(job_id)
        if job is None:
            return None
        chain = self.app.job_chain.get_chain_state(job_id)
        if chain:
            job["chain"] = {
                "steps": chain["steps"],
                "current": chain["current"],
                "step_status": chain["step_status"],
                "step_timings": chain["step_timings"],
            }
        return job

    def cancel(self, job_id: str) -> bool:
        return self.app.job_chain.cancel(job_id)

    # ------------------------------------------------------------ scoring
    def efficiency_score(self, job_id: str) -> Optional[Dict[str, Any]]:
        """Step-timing based efficiency summary (reference :446-499)."""
        job = self.app.tracker.get_job(job_id)
        if not job or not isinstance(job.get("result"), dict):
            return None
        chain = job["result"].get("chain") or {}
        timings = chain.get("step_timings") or {}
        if not timings:
            return None
        total = sum(timings.values())
        slowest = max(timings, key=timings.get)
        return {
            "total_s": round(total, 4),
            "slowest_step": slowest,
            "slowest_share": round(timings[slowest] / total, 3) if total else 0.0,
            "steps": timings,
        }
