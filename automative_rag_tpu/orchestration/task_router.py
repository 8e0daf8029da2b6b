"""Task→queue routing and task→executor dispatch.

Parity target: reference ``TaskRouter``
(``src/core/orchestration/task_router.py``): a pure task→queue map plus
dispatch with graceful skip of unregistered executors. Unlike the reference
(whose ``get_workflow_for_job_type`` returns ``[]`` and breaks every chain,
:332-338), workflow step lists here live in ``workflows.py`` and are always
resolvable.
"""

from __future__ import annotations

from enum import Enum
from typing import Callable, Dict, List, Optional

from .queue_manager import QueueManager, QueueNames


class JobType(str, Enum):
    VIDEO_PROCESSING = "video_processing"
    PDF_PROCESSING = "pdf_processing"
    TEXT_PROCESSING = "text_processing"
    BATCH_VIDEO_PROCESSING = "batch_video_processing"
    LLM_INFERENCE = "llm_inference"  # the query job (reference naming)


# task name → queue (reference task_router.py:34-69)
TASK_QUEUE_MAP: Dict[str, str] = {
    "download_video": QueueNames.CPU_TASKS,
    "transcribe_video": QueueNames.TRANSCRIPTION_TASKS,
    "process_pdf": QueueNames.CPU_TASKS,
    "process_text": QueueNames.CPU_TASKS,
    "generate_embeddings": QueueNames.EMBEDDING_TASKS,
    "retrieve_documents": QueueNames.EMBEDDING_TASKS,
    "await_contribution": QueueNames.CPU_TASKS,
    "llm_inference": QueueNames.LLM_TASKS,
}


class TaskRouter:
    def __init__(self, queue_manager: QueueManager):
        self.queue_manager = queue_manager
        self._executors: Dict[str, Callable] = {}

    def register(self, task_name: str, fn: Callable, queue_name: Optional[str] = None):
        """Register a task executor: fn(job_id, payload) -> dict|None."""
        self._executors[task_name] = fn
        if queue_name:
            TASK_QUEUE_MAP[task_name] = queue_name
        return fn

    def task(self, task_name: str, queue_name: Optional[str] = None):
        """Decorator form of register()."""

        def deco(fn):
            return self.register(task_name, fn, queue_name)

        return deco

    def get_queue_for_task(self, task_name: str) -> str:
        return TASK_QUEUE_MAP.get(task_name, QueueNames.CPU_TASKS)

    def has_executor(self, task_name: str) -> bool:
        return task_name in self._executors

    def route_task(self, task_name: str, job_id: str, payload: dict,
                   on_missing: Optional[Callable] = None) -> bool:
        """Enqueue the task on its queue; if no executor is registered, call
        ``on_missing`` (the chain skips the step — reference skips missing
        executors gracefully, task_router.py:71-326)."""
        fn = self._executors.get(task_name)
        if fn is None:
            if on_missing is not None:
                on_missing(task_name, job_id, payload)
            return False
        self.queue_manager.enqueue(
            self.get_queue_for_task(task_name),
            f"{task_name}:{job_id}",
            fn,
            job_id,
            payload,
        )
        return True

    def registered_tasks(self) -> List[str]:
        return sorted(self._executors)
