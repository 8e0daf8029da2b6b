"""Single workflow controller over the service layer.

Parity target: reference ``WorkflowController``
(``src/controllers/workflow_controller.py``): submit_query/get_query_result
(:43-131), query validation (:133-158), three ingest entries (:160-243),
causation (:245-262), discovery endpoints (:272-310), workflow status/cancel
(:313-345). The reference's API referenced controllers that never existed
(SURVEY.md §0); this one is real and exercised by tests.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from ..config.mode_config import QueryMode
from ..ingestion.video_processor import validate_video_url
from ..services.causation_service import CausationService
from ..services.system_service import SystemService
from ..services.workflow_service import WorkflowService


class WorkflowController:
    def __init__(self, app):
        self.app = app
        self.workflow_service = WorkflowService(app)
        self.system_service = SystemService(app)
        self.causation_service = CausationService()

    # -------------------------------------------------------------- query
    def submit_query(
        self,
        query: str,
        mode: str = "facts",
        metadata_filter: Optional[Dict[str, Any]] = None,
        validation: bool = False,
    ) -> Dict[str, Any]:
        issues = self.validate_query(query, mode)["issues"]
        if issues:
            raise ValueError("; ".join(issues))
        job_id = self.app.submit_query(query, mode, metadata_filter, validation=validation)
        return {
            "job_id": job_id,
            "status": "pending",
            "context": self.workflow_service.build_execution_context(
                "llm_inference", {"mode": mode}
            ),
        }

    def get_query_result(self, job_id: str) -> Optional[Dict[str, Any]]:
        return self.workflow_service.status(job_id)

    def validate_query(self, query: str, mode: str = "facts") -> Dict[str, Any]:
        issues: List[str] = []
        if not query or not query.strip():
            issues.append("query is empty")
        if len(query) > 512:
            issues.append("query too long")
        if mode not in {m.value for m in QueryMode}:
            issues.append(f"unknown mode {mode!r}")
        return {"valid": not issues, "issues": issues}

    # ------------------------------------------------------------- ingest
    def ingest_text(self, content: str, metadata: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        if not content or not content.strip():
            raise ValueError("content is empty")
        return {"job_id": self.app.ingest_text(content, metadata), "status": "pending"}

    def ingest_pdf(self, path: str, metadata: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        return {"job_id": self.app.ingest_pdf(path, metadata), "status": "pending"}

    def ingest_video(self, url: str, metadata: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        ok, reason = validate_video_url(url)
        if not ok:
            raise ValueError(f"invalid video url: {reason}")
        return {"job_id": self.app.ingest_video(url, metadata), "status": "pending"}

    # ---------------------------------------------------------- causation
    def analyze_causation(self, query: str) -> Dict[str, Any]:
        return self.causation_service.analyze(query)

    # ----------------------------------------------------------- discovery
    def get_capabilities(self) -> Dict[str, Any]:
        return self.system_service.get_capabilities()

    def get_query_modes(self) -> List[Dict[str, Any]]:
        return self.system_service.get_query_modes()

    # ------------------------------------------------------------- status
    def get_workflow_status(self, job_id: str) -> Optional[Dict[str, Any]]:
        return self.workflow_service.status(job_id)

    def cancel_workflow(self, job_id: str) -> bool:
        return self.workflow_service.cancel(job_id)
