"""The distributed-communication control plane: named task queues with
serialized workers, retries, time limits, heartbeats, and statistics.

Parity target: reference ``QueueManager``
(``src/core/orchestration/queue_manager.py``): the queue taxonomy
(cpu/transcription/embedding/llm), one-model-owning serialized worker per
accelerator queue, per-queue retry/backoff configs, busy locks, waiting-task
FIFOs, statistics, and purge. The reference fabric was Redis+Dramatiq across
containers; here the *control plane* is an in-process threaded executor
(SURVEY.md §5: keep a lightweight queue since that design is sound and
hardware-agnostic) while the *data plane* is the in-process TPU engine with
XLA collectives — there is no DCN hop between search shards at all.

Worker heartbeats mirror the reference's 15 s interval / 60 s TTL keys
(``src/core/background/common.py:104-165``).
"""

from __future__ import annotations

import queue
import threading
import time
import traceback
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional


class QueueNames:
    CPU_TASKS = "cpu_tasks"  # downloads, parsing, chunking
    TRANSCRIPTION_TASKS = "transcription_tasks"  # audio → text
    EMBEDDING_TASKS = "embedding_tasks"  # TPU engine: encode/search/rerank
    LLM_TASKS = "llm_tasks"  # answer generation

    @classmethod
    def all_queues(cls) -> List[str]:
        return [cls.CPU_TASKS, cls.TRANSCRIPTION_TASKS, cls.EMBEDDING_TASKS, cls.LLM_TASKS]


@dataclass
class RetryPolicy:
    max_retries: int = 2
    min_backoff_s: float = 1.0
    max_backoff_s: float = 30.0

    def backoff(self, attempt: int) -> float:
        return min(self.min_backoff_s * (2**attempt), self.max_backoff_s)


# per-queue retry/backoff (reference queue_manager.py:316-359 differentiates
# GPU queues from CPU queues)
RETRY_POLICIES: Dict[str, RetryPolicy] = {
    QueueNames.CPU_TASKS: RetryPolicy(max_retries=3, min_backoff_s=0.5),
    QueueNames.TRANSCRIPTION_TASKS: RetryPolicy(max_retries=1, min_backoff_s=5.0),
    QueueNames.EMBEDDING_TASKS: RetryPolicy(max_retries=2, min_backoff_s=1.0),
    QueueNames.LLM_TASKS: RetryPolicy(max_retries=1, min_backoff_s=2.0),
}


@dataclass
class _Task:
    name: str
    fn: Callable
    args: tuple
    kwargs: dict
    enqueued_at: float = field(default_factory=time.time)
    attempt: int = 0


class QueueManager:
    """Named queues, each drained by one serialized worker thread.

    ``concurrency`` overrides the worker count per queue (default 1 —
    the reference's one-model-owning serialized worker). The llm queue
    is the intended user: with the continuous-batching serving engine
    (``serving/engine.py``) N in-flight generation tasks share decode
    bursts, so ``{"llm_tasks": N}`` turns concurrent queries into one
    batched decode instead of a serial line."""

    def __init__(self, time_limit_s: float = 300.0, start: bool = True,
                 concurrency: Optional[Dict[str, int]] = None):
        self.time_limit_s = time_limit_s
        # fault injection hook (tests/chaos): called with the task name
        # before execution; raising simulates a worker fault. The reference
        # has no fault injection at all (SURVEY.md §5).
        self.fault_injector: Optional[Callable[[str], None]] = None
        self._queues: Dict[str, queue.Queue] = {
            name: queue.Queue() for name in QueueNames.all_queues()
        }
        self._concurrency = {name: 1 for name in self._queues}
        for name, n in (concurrency or {}).items():
            if name in self._concurrency:
                self._concurrency[name] = max(1, int(n))
        self._workers: Dict[str, List[threading.Thread]] = {}
        # task-name → start time, per queue (supports N in-flight tasks)
        self._in_flight: Dict[str, Dict[int, tuple]] = {
            name: {} for name in self._queues
        }
        self._heartbeats: Dict[str, float] = {}
        self._stats: Dict[str, Dict[str, int]] = {
            name: {"enqueued": 0, "completed": 0, "failed": 0, "retried": 0}
            for name in self._queues
        }
        self._lock = threading.Lock()
        self._shutdown = threading.Event()
        if start:
            self.start_workers()

    # ------------------------------------------------------------ workers
    def start_workers(self) -> None:
        for name in self._queues:
            threads = [t for t in self._workers.get(name, []) if t.is_alive()]
            for i in range(len(threads), self._concurrency[name]):
                worker = threading.Thread(
                    target=self._worker_loop, args=(name, i), daemon=True,
                    name=f"worker-{name}-{i}",
                )
                threads.append(worker)
                worker.start()
            self._workers[name] = threads

    def _worker_loop(self, queue_name: str, worker_idx: int = 0) -> None:
        q = self._queues[queue_name]
        policy = RETRY_POLICIES.get(queue_name, RetryPolicy())
        while not self._shutdown.is_set():
            self._heartbeats[queue_name] = time.time()
            try:
                task: _Task = q.get(timeout=1.0)
            except queue.Empty:
                continue
            with self._lock:
                self._in_flight[queue_name][worker_idx] = (task.name, time.time())
            try:
                if self.fault_injector is not None:
                    self.fault_injector(task.name)
                task.fn(*task.args, **task.kwargs)
                self._bump(queue_name, "completed")
            except Exception:
                if task.attempt < policy.max_retries:
                    task.attempt += 1
                    self._bump(queue_name, "retried")
                    delay = policy.backoff(task.attempt)
                    timer = threading.Timer(delay, lambda t=task: q.put(t))
                    # a pending 30 s backoff must never block process exit
                    timer.daemon = True
                    timer.start()
                else:
                    self._bump(queue_name, "failed")
                    traceback.print_exc()
            finally:
                with self._lock:
                    self._in_flight[queue_name].pop(worker_idx, None)
                q.task_done()

    # ------------------------------------------------------------ enqueue
    def enqueue(self, queue_name: str, name: str, fn: Callable, *args, **kwargs) -> None:
        if queue_name not in self._queues:
            raise KeyError(f"unknown queue {queue_name!r}")
        self._queues[queue_name].put(_Task(name=name, fn=fn, args=args, kwargs=kwargs))
        self._bump(queue_name, "enqueued")

    def _bump(self, queue_name: str, key: str) -> None:
        # counter writes are read-modify-write; racing workers lose counts
        # without the lock
        with self._lock:
            self._stats[queue_name][key] += 1

    # ------------------------------------------------------------- status
    def is_queue_busy(self, queue_name: str) -> bool:
        with self._lock:
            return bool(self._in_flight.get(queue_name))

    def queue_length(self, queue_name: str) -> int:
        return self._queues[queue_name].qsize()

    def get_queue_status(self) -> Dict[str, Any]:
        now = time.time()
        with self._lock:
            out = {}
            for name in self._queues:
                flights = self._in_flight[name]
                oldest = min((t for _, t in flights.values()), default=None)
                out[name] = {
                    "pending": self._queues[name].qsize(),
                    "busy_with": next(
                        (task for task, _ in flights.values()), None),
                    "in_flight": len(flights),
                    "workers": self._concurrency[name],
                    "busy_for_s": (
                        round(now - oldest, 1) if oldest is not None else None
                    ),
                    "over_time_limit": (
                        oldest is not None
                        and now - oldest > self.time_limit_s
                    ),
                    "worker_alive": any(
                        t.is_alive() for t in self._workers.get(name, [])
                    ),
                    "heartbeat_age_s": (
                        round(now - self._heartbeats[name], 1)
                        if name in self._heartbeats
                        else None
                    ),
                    **self._stats[name],
                }
            return out

    def worker_health(self, healthy_s: float = 60.0, stale_s: float = 300.0) -> Dict[str, str]:
        """healthy<60 s / stale<300 s / dead classification (reference
        ``worker_status.py:94-105``)."""
        now = time.time()
        health = {}
        for name in self._queues:
            beat = self._heartbeats.get(name)
            if beat is None:
                health[name] = "unknown"
            elif now - beat < healthy_s:
                health[name] = "healthy"
            elif now - beat < stale_s:
                health[name] = "stale"
            else:
                health[name] = "dead"
        return health

    # -------------------------------------------------------------- purge
    def purge_queue(self, queue_name: str) -> int:
        q = self._queues[queue_name]
        purged = 0
        while True:
            try:
                q.get_nowait()
                q.task_done()
                purged += 1
            except queue.Empty:
                return purged

    def wait_idle(self, timeout: float = 60.0) -> bool:
        """Block until every queue is drained (test/ops helper)."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            if all(q.qsize() == 0 for q in self._queues.values()) and not any(
                self._in_flight[n] for n in self._queues
            ):
                return True
            time.sleep(0.02)
        return False

    def restart_workers(self) -> Dict[str, bool]:
        """Replace dead worker threads (reference POST /system/restart-workers;
        container restarts become thread restarts in the single-process
        topology)."""
        restarted = {}
        for name in self._queues:
            threads = self._workers.get(name, [])
            alive = sum(1 for t in threads if t.is_alive())
            restarted[name] = alive < self._concurrency[name]
        self.start_workers()
        return restarted

    def shutdown(self) -> None:
        self._shutdown.set()
