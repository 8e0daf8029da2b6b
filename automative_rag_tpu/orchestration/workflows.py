"""Workflow definitions: ordered task steps per job type.

The reference's step lists were orphaned mid-refactor (``TaskRouter.
get_workflow_for_job_type`` returns ``[]``, ``task_router.py:332-338``, while
``WorkflowModel`` holds the new lists but is never constructed — SURVEY.md
§0). Here the definitions live in one place and the chain engine always
resolves them. Step lists mirror ``src/models/workflow_models.py:123-176``:
VIDEO = download→transcribe→index, DOCUMENT = parse→index,
QUERY = retrieve→infer (format happens in the answer stage).
"""

from __future__ import annotations

from typing import Dict, List

from .task_router import JobType

WORKFLOWS: Dict[str, List[str]] = {
    JobType.VIDEO_PROCESSING.value: [
        "download_video",
        "transcribe_video",
        "generate_embeddings",
    ],
    JobType.PDF_PROCESSING.value: [
        "process_pdf",
        "generate_embeddings",
    ],
    JobType.TEXT_PROCESSING.value: [
        "process_text",
        "generate_embeddings",
    ],
    JobType.LLM_INFERENCE.value: [
        "retrieve_documents",
        "llm_inference",
    ],
}


def get_workflow_for_job_type(job_type: str) -> List[str]:
    steps = WORKFLOWS.get(
        job_type.value if isinstance(job_type, JobType) else str(job_type)
    )
    if not steps:
        raise KeyError(f"unknown job type {job_type!r}")
    return list(steps)
