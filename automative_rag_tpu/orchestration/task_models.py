"""Task catalog: per-task queue + timeout specs and instance tracking.

Parity target: reference ``TaskSpec``/``TaskInstance``/``TaskModel``
(``src/models/task_models.py:140-474``): a catalog of task types with their
queue and timeout (video_download 600 s, transcription 1800 s, retrieval
120 s, llm 180 s …), plus execute/retry/status/statistics bookkeeping.
Timeouts are enforced softly (cooperative threads can't be killed): the
instance table marks overruns and the stalled-job reaper handles the jobs.
"""

from __future__ import annotations

import threading
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from .queue_manager import QueueNames


@dataclass(frozen=True)
class TaskSpec:
    name: str
    queue: str
    timeout_s: float
    max_retries: int = 2
    description: str = ""


TASK_CATALOG: Dict[str, TaskSpec] = {
    spec.name: spec
    for spec in (
        TaskSpec("download_video", QueueNames.CPU_TASKS, 600, 3, "fetch media + metadata"),
        TaskSpec("transcribe_video", QueueNames.TRANSCRIPTION_TASKS, 1800, 1, "ASR transcription"),
        TaskSpec("process_pdf", QueueNames.CPU_TASKS, 300, 2, "PDF parse (+OCR)"),
        TaskSpec("process_text", QueueNames.CPU_TASKS, 60, 2, "text chunking"),
        TaskSpec("generate_embeddings", QueueNames.EMBEDDING_TASKS, 300, 2, "encode + index"),
        TaskSpec("retrieve_documents", QueueNames.EMBEDDING_TASKS, 120, 2, "search + rerank"),
        TaskSpec("validate_documents", QueueNames.CPU_TASKS, 60, 1, "validation pipeline"),
        TaskSpec("llm_inference", QueueNames.LLM_TASKS, 180, 1, "answer generation"),
    )
}


@dataclass
class TaskInstance:
    task_name: str
    job_id: str
    instance_id: str = field(default_factory=lambda: uuid.uuid4().hex[:12])
    status: str = "pending"  # pending|running|completed|failed|timeout
    attempts: int = 0
    started_at: Optional[float] = None
    finished_at: Optional[float] = None
    error: Optional[str] = None

    @property
    def duration_s(self) -> Optional[float]:
        if self.started_at is None or self.finished_at is None:
            return None
        return self.finished_at - self.started_at


class TaskModel:
    """Instance table with status transitions and statistics."""

    def __init__(self):
        self._instances: Dict[str, TaskInstance] = {}
        self._lock = threading.Lock()

    def create(self, task_name: str, job_id: str) -> TaskInstance:
        inst = TaskInstance(task_name=task_name, job_id=job_id)
        with self._lock:
            self._instances[inst.instance_id] = inst
        return inst

    def mark_running(self, instance_id: str) -> None:
        with self._lock:
            inst = self._instances.get(instance_id)
            if inst:
                inst.status = "running"
                inst.attempts += 1
                inst.started_at = time.time()

    def mark_done(self, instance_id: str, error: Optional[str] = None) -> None:
        with self._lock:
            inst = self._instances.get(instance_id)
            if inst:
                inst.finished_at = time.time()
                inst.status = "failed" if error else "completed"
                inst.error = error

    def sweep_timeouts(self) -> List[TaskInstance]:
        """Mark running instances past their spec timeout (soft enforcement)."""
        now = time.time()
        flagged = []
        with self._lock:
            for inst in self._instances.values():
                spec = TASK_CATALOG.get(inst.task_name)
                if (
                    spec
                    and inst.status == "running"
                    and inst.started_at is not None
                    and now - inst.started_at > spec.timeout_s
                ):
                    inst.status = "timeout"
                    flagged.append(inst)
        return flagged

    def statistics(self) -> Dict[str, Any]:
        with self._lock:
            by_status: Dict[str, int] = {}
            durations: Dict[str, List[float]] = {}
            for inst in self._instances.values():
                by_status[inst.status] = by_status.get(inst.status, 0) + 1
                d = inst.duration_s
                if d is not None:
                    durations.setdefault(inst.task_name, []).append(d)
        return {
            "total": sum(by_status.values()),
            "by_status": by_status,
            "avg_duration_s": {
                name: round(sum(ds) / len(ds), 4) for name, ds in durations.items()
            },
        }

    def for_job(self, job_id: str) -> List[TaskInstance]:
        with self._lock:
            return [i for i in self._instances.values() if i.job_id == job_id]

    def prune(self, max_age_s: float) -> int:
        """Drop terminal instance rows older than ``max_age_s`` (the table is
        in-memory and one row is written per attempt — without retention it
        grows for the life of the process)."""
        cutoff = time.time() - max_age_s
        with self._lock:
            stale = [
                iid for iid, inst in self._instances.items()
                if inst.status in ("completed", "failed", "timeout")
                and (inst.finished_at or inst.started_at or cutoff + 1) <= cutoff
            ]
            for iid in stale:
                del self._instances[iid]
        return len(stale)
