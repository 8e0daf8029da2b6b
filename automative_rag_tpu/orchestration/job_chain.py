"""Sequential workflow engine: executes each job's step list via the task
router, advancing on completion.

Parity target: reference ``JobChain`` (``src/core/orchestration/job_chain.py``)
— per-job chain state, step execution via router, ``task_completed`` advance
(:183-262), failure handling (:507-542), completion summary with step
timings (:544-613), dynamic step insertion (:349-433), and pause/resume for
user input (:266-347). Unlike the reference snapshot this engine actually
resolves workflows (see ``workflows.py``).
"""

from __future__ import annotations

import threading
import time
from enum import Enum
from typing import Any, Dict, List, Optional

from .job_tracker import JobStatus, JobTracker
from .queue_manager import RETRY_POLICIES, RetryPolicy
from .task_models import TASK_CATALOG, TaskModel
from .task_router import TaskRouter
from .workflows import get_workflow_for_job_type


class TaskStatus(str, Enum):
    PENDING = "pending"
    RUNNING = "running"
    COMPLETED = "completed"
    FAILED = "failed"
    SKIPPED = "skipped"


class JobChain:
    def __init__(
        self,
        job_tracker: JobTracker,
        task_router: TaskRouter,
        persist_path: Optional[str] = None,
        task_model: Optional[TaskModel] = None,
        retry_backoff_s: Optional[float] = None,
    ):
        self.tracker = job_tracker
        self.router = task_router
        # per-execution instance rows (timings, timeout sweep, statistics);
        # each retry is its own row so the table shows the flakiness
        self.task_model = task_model
        # override for tests: None → the step's queue RetryPolicy backoff
        self.retry_backoff_s = retry_backoff_s
        self._chains: Dict[str, Dict[str, Any]] = {}
        self._lock = threading.RLock()
        self._persist_lock = threading.Lock()
        self._persist_path = persist_path
        if persist_path:
            self._restore()

    # ------------------------------------------------------- persistence
    def _persist(self) -> None:
        """Chain state survives process restarts (reference keeps chain
        state in Redis with a 24h TTL, job_chain.py:651-665)."""
        if not self._persist_path:
            return
        import json
        from pathlib import Path

        try:
            with self._lock:
                snapshot = {
                    jid: {k: v for k, v in chain.items() if k != "step_started_at"}
                    for jid, chain in self._chains.items()
                }
            path = Path(self._persist_path)
            path.parent.mkdir(parents=True, exist_ok=True)
            # atomic replace under a dedicated lock: two steps completing on
            # different queue workers persist concurrently, and interleaved
            # writes to the same file would tear the JSON (restore would
            # then drop EVERY chain on the next boot)
            with self._persist_lock:
                tmp = path.with_suffix(".tmp")
                tmp.write_text(
                    json.dumps(snapshot, ensure_ascii=False, default=str),
                    encoding="utf-8",
                )
                tmp.replace(path)
        except (OSError, TypeError):
            pass

    def _restore(self) -> None:
        import json
        from pathlib import Path

        path = Path(self._persist_path)
        if not path.exists():
            return
        try:
            self._chains = json.loads(path.read_text(encoding="utf-8"))
        except (OSError, json.JSONDecodeError):
            self._chains = {}

    def resume_incomplete(self) -> int:
        """Re-execute the current step of every restored chain that was
        mid-flight at shutdown (call after restart, once executors are
        registered). Terminal chains — completed or failed — never resume:
        a FAILED chain exhausted its retries and released its payload, so
        re-driving it would only re-fail with a misleading missing-data
        error on every boot."""
        with self._lock:
            pending = []
            for jid, chain in self._chains.items():
                if (
                    chain.get("paused")
                    or chain["current"] >= len(chain["steps"])
                    or chain.get("completed_at") or chain.get("failed_at")
                ):
                    continue
                # fresh process, fresh retry budget for the in-flight step
                step = chain["steps"][chain["current"]]
                chain.get("step_attempts", {}).pop(step, None)
                pending.append(jid)
        for job_id in pending:
            self._execute_current(job_id)
        return len(pending)

    # -------------------------------------------------------------- start
    def start_job_chain(self, job_id: str, job_type: str, payload: Dict[str, Any]) -> None:
        steps = get_workflow_for_job_type(job_type)
        with self._lock:
            self._chains[job_id] = {
                "job_id": job_id,
                "job_type": str(job_type),
                "steps": steps,
                "current": 0,
                "data": dict(payload),
                "step_status": {s: TaskStatus.PENDING.value for s in steps},
                "step_timings": {},
                "started_at": time.time(),
                "paused": False,
            }
        self.tracker.update_job_status(job_id, JobStatus.PROCESSING)
        self._persist()
        self._execute_current(job_id)

    # ------------------------------------------------------------ execute
    def _execute_current(self, job_id: str) -> None:
        with self._lock:
            chain = self._chains.get(job_id)
            if chain is None or chain["paused"]:
                return
            if chain["current"] >= len(chain["steps"]):
                self._complete(job_id)
                return
            task_name = chain["steps"][chain["current"]]
            chain["step_status"][task_name] = TaskStatus.RUNNING.value
            chain["step_started_at"] = time.time()
            payload = dict(chain["data"])

        progress = int(100 * chain["current"] / max(len(chain["steps"]), 1))
        self.tracker.update_job_progress(job_id, progress, f"step {task_name}")

        if not self.router.has_executor(task_name):
            self._skip_step(task_name, job_id, payload)
            return

        def _run(job_id_, payload_):
            fn = self.router._executors[task_name]
            inst = (
                self.task_model.create(task_name, job_id_)
                if self.task_model is not None else None
            )
            if inst is not None:
                self.task_model.mark_running(inst.instance_id)
            try:
                result = fn(job_id_, payload_)
            except Exception as exc:  # noqa: BLE001 — chain owns failure policy
                error = f"{type(exc).__name__}: {exc}"
                if inst is not None:
                    self.task_model.mark_done(inst.instance_id, error=error)
                self._step_errored(job_id_, task_name, error)
                return
            if inst is not None:
                self.task_model.mark_done(inst.instance_id)
            self.task_completed(job_id_, task_name, result or {})

        self.router.queue_manager.enqueue(
            self.router.get_queue_for_task(task_name),
            f"{task_name}:{job_id}",
            _run,
            job_id,
            payload,
        )

    def _step_errored(self, job_id: str, task_name: str, error: str) -> None:
        """Failure policy: retry the step up to its catalog budget with the
        queue's backoff (reference parity: Dramatiq actor retries,
        queue_manager.py:316-359 / task_models.py:140-474 max_retries);
        only an exhausted budget fails the job."""
        spec = TASK_CATALOG.get(task_name)
        queue_name = self.router.get_queue_for_task(task_name)
        policy = RETRY_POLICIES.get(queue_name, RetryPolicy())
        max_retries = spec.max_retries if spec else policy.max_retries
        with self._lock:
            chain = self._chains.get(job_id)
            if chain is None:
                return
            attempts = chain.setdefault("step_attempts", {})
            attempt = attempts.get(task_name, 0)
            if attempt >= max_retries:
                total = attempt + 1
                self.task_failed(
                    job_id, task_name,
                    error if total == 1 else f"{error} (after {total} attempts)",
                )
                return
            attempts[task_name] = attempt + 1
        delay = (
            self.retry_backoff_s if self.retry_backoff_s is not None
            else policy.backoff(attempt + 1)
        )
        self.tracker.update_job_progress(
            job_id, None,
            f"step {task_name} failed ({error}); retry "
            f"{attempt + 1}/{max_retries} in {delay:.1f}s",
        )
        self._persist()
        timer = threading.Timer(delay, self._execute_current, args=(job_id,))
        timer.daemon = True
        timer.start()

    # ---------------------------------------------------------- callbacks
    def _skip_step(self, task_name: str, job_id: str, payload: dict) -> None:
        """No executor registered: mark skipped and advance (reference skips
        missing executors, task_router.py:71-326)."""
        with self._lock:
            chain = self._chains.get(job_id)
            if chain is None:
                return
            chain["step_status"][task_name] = TaskStatus.SKIPPED.value
            chain["current"] += 1
        self._execute_current(job_id)

    def task_completed(self, job_id: str, task_name: str, result: Dict[str, Any]) -> None:
        with self._lock:
            chain = self._chains.get(job_id)
            if chain is None:
                return
            # stale-completion guard: a retry timer racing a user resume can
            # double-enqueue the same step; the first completion advances
            # the chain, and an unguarded second would advance it AGAIN —
            # silently skipping the next step (at-least-once execution is
            # acceptable; skipping a step is not)
            if (chain["current"] >= len(chain["steps"])
                    or chain["steps"][chain["current"]] != task_name):
                return
            chain["step_status"][task_name] = TaskStatus.COMPLETED.value
            chain.get("step_attempts", {}).pop(task_name, None)
            started = chain.pop("step_started_at", None)
            if started is not None:
                chain["step_timings"][task_name] = round(time.time() - started, 4)
            if isinstance(result, dict):
                chain["data"].update(result)
            chain["current"] += 1
            paused = chain["paused"]
        if isinstance(result, dict) and result:
            # a step may pause the chain before returning (guided
            # validation) — don't overwrite WAITING_USER with PROCESSING,
            # or the job status lies until the user resumes
            self.tracker.update_job_status(
                job_id,
                JobStatus.WAITING_USER if paused else JobStatus.PROCESSING,
                result=result,
            )
        self._persist()
        self._execute_current(job_id)

    def task_failed(self, job_id: str, task_name: str, error: str) -> None:
        with self._lock:
            chain = self._chains.get(job_id)
            if chain is None:
                return
            # same stale guard as task_completed: never fail the chain for
            # a step it already moved past
            if (chain["current"] >= len(chain["steps"])
                    or chain["steps"][chain["current"]] != task_name):
                return
            chain["step_status"][task_name] = TaskStatus.FAILED.value
            chain["failed_at"] = time.time()
            # terminal: no step will read the payload again — release it
            # (ingest chains carry every chunk's text in ``data``; keeping
            # it alive per job is an unbounded leak — reference chain state
            # expires from Redis after 24h, job_chain.py:651-665)
            chain["data"] = {}
        self.tracker.update_job_status(job_id, JobStatus.FAILED, error=f"{task_name}: {error}")
        self._persist()

    # ----------------------------------------------------------- complete
    def _complete(self, job_id: str) -> None:
        with self._lock:
            chain = self._chains.get(job_id)
            if chain is None:
                return
            summary = {
                "step_timings": chain["step_timings"],
                "total_time_s": round(time.time() - chain["started_at"], 4),
                "steps": chain["steps"],
            }
            chain["completed_at"] = time.time()
            chain["data"] = {}  # terminal — see task_failed
        self.tracker.update_job_progress(job_id, 100, "completed")
        self.tracker.update_job_status(job_id, JobStatus.COMPLETED, result={"chain": summary})
        self._persist()

    # ----------------------------------------------- dynamic modification
    def insert_steps_after_current(self, job_id: str, steps: List[str]) -> bool:
        """Dynamic step insertion (reference meta-validation/auto-fetch
        hooks, job_chain.py:349-433)."""
        return self._insert_steps(job_id, steps, offset=1)

    def insert_steps_next(self, job_id: str, steps: List[str]) -> bool:
        """Insert steps at the *current* position — they run before the step
        the chain is about to execute (used when resuming a paused chain
        with extra work, e.g. re-retrieval after a user contribution)."""
        return self._insert_steps(job_id, steps, offset=0)

    def _insert_steps(self, job_id: str, steps: List[str], offset: int) -> bool:
        with self._lock:
            chain = self._chains.get(job_id)
            if chain is None:
                return False
            pos = chain["current"] + offset
            chain["steps"][pos:pos] = steps
            for s in steps:
                chain["step_status"].setdefault(s, TaskStatus.PENDING.value)
        return True

    # -------------------------------------------------------- pause/resume
    def wait_for_user_input(self, job_id: str, prompt: Dict[str, Any]) -> None:
        with self._lock:
            chain = self._chains.get(job_id)
            if chain is None:
                return
            chain["paused"] = True
            chain["user_prompt"] = prompt
        self.tracker.update_job_status(
            job_id, JobStatus.WAITING_USER, result={"user_prompt": prompt}
        )

    def resume_from_user_input(self, job_id: str, user_input: Dict[str, Any]) -> bool:
        with self._lock:
            chain = self._chains.get(job_id)
            if chain is None or not chain["paused"]:
                return False
            # the pausing step already completed (task_completed advanced
            # past it); resuming just unblocks the next step
            chain["paused"] = False
            chain["data"].update(user_input or {})
        self.tracker.update_job_status(job_id, JobStatus.PROCESSING)
        self._execute_current(job_id)
        return True

    def cancel(self, job_id: str) -> bool:
        with self._lock:
            chain = self._chains.pop(job_id, None)
        if chain is None:
            return False
        self.tracker.update_job_status(job_id, JobStatus.CANCELLED)
        return True

    def prune_terminal(self, max_age_s: float = 86400.0) -> int:
        """Drop terminal (completed/failed) chains older than ``max_age_s``
        — the in-process equivalent of the reference's 24h Redis TTL on
        ``job_chain:{id}`` keys (job_chain.py:651-665). Active and paused
        chains are never touched. Returns the number removed."""
        cutoff = time.time() - max_age_s
        with self._lock:
            victims = [
                jid for jid, chain in self._chains.items()
                if (chain.get("completed_at") or chain.get("failed_at") or 0)
                < cutoff
                and (chain.get("completed_at") or chain.get("failed_at"))
                is not None
            ]
            for jid in victims:
                self._chains.pop(jid, None)
        if victims:
            self._persist()
        return len(victims)

    # -------------------------------------------------------------- state
    def get_chain_state(self, job_id: str) -> Optional[Dict[str, Any]]:
        with self._lock:
            chain = self._chains.get(job_id)
            if chain is None:
                return None
            state = dict(chain)
            state["data"] = dict(chain["data"])
            state["step_status"] = dict(chain["step_status"])
            return state

    def all_chains(self) -> List[Dict[str, Any]]:
        with self._lock:
            ids = list(self._chains)
        return [s for s in (self.get_chain_state(i) for i in ids) if s]
