"""Job chain / queue manager / tracker tests — the workflow engine must
actually run chains end to end (the reference's could not, SURVEY.md §0)."""

import time

import pytest

from automative_rag_tpu.orchestration import (
    JobChain,
    JobStatus,
    JobTracker,
    QueueManager,
    TaskRouter,
)
from automative_rag_tpu.orchestration.task_router import JobType
from automative_rag_tpu.orchestration.workflows import get_workflow_for_job_type


@pytest.fixture
def stack():
    tracker = JobTracker()
    qm = QueueManager(start=True)
    router = TaskRouter(qm)
    # retry_backoff_s=0.02: exercise the per-step retry policy without the
    # production exponential backoff (seconds per attempt) in the suite
    chain = JobChain(tracker, router, retry_backoff_s=0.02)
    yield tracker, qm, router, chain
    qm.shutdown()


def _wait_status(tracker, job_id, statuses, timeout=10.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        job = tracker.get_job(job_id)
        if job and job["status"] in statuses:
            return job
        time.sleep(0.01)
    raise TimeoutError(f"job never reached {statuses}: {tracker.get_job(job_id)}")


def test_workflows_resolve():
    for jt in JobType:
        if jt == JobType.BATCH_VIDEO_PROCESSING:
            continue
        assert get_workflow_for_job_type(jt.value)
    with pytest.raises(KeyError):
        get_workflow_for_job_type("nope")


def test_chain_runs_all_steps(stack):
    tracker, qm, router, chain = stack
    calls = []

    @router.task("retrieve_documents")
    def retrieve(job_id, payload):
        calls.append(("retrieve", payload["query"]))
        return {"documents": ["d1", "d2"]}

    @router.task("llm_inference")
    def infer(job_id, payload):
        calls.append(("infer", payload["documents"]))
        return {"answer": "42"}

    job_id = tracker.create_job(JobType.LLM_INFERENCE.value)
    chain.start_job_chain(job_id, JobType.LLM_INFERENCE.value, {"query": "q"})
    job = _wait_status(tracker, job_id, {JobStatus.COMPLETED.value})

    assert calls == [("retrieve", "q"), ("infer", ["d1", "d2"])]
    assert job["result"]["answer"] == "42"
    assert job["progress"] == 100
    timings = job["result"]["chain"]["step_timings"]
    assert set(timings) == {"retrieve_documents", "llm_inference"}


def test_chain_failure_marks_job(stack):
    tracker, qm, router, chain = stack

    @router.task("retrieve_documents")
    def retrieve(job_id, payload):
        raise RuntimeError("boom")

    job_id = tracker.create_job(JobType.LLM_INFERENCE.value)
    chain.start_job_chain(job_id, JobType.LLM_INFERENCE.value, {})
    job = _wait_status(tracker, job_id, {JobStatus.FAILED.value})
    assert "boom" in job["error"]


def test_chain_skips_missing_executor(stack):
    tracker, qm, router, chain = stack

    @router.task("llm_inference")
    def infer(job_id, payload):
        return {"answer": "ok"}

    # retrieve_documents unregistered → skipped
    job_id = tracker.create_job(JobType.LLM_INFERENCE.value)
    chain.start_job_chain(job_id, JobType.LLM_INFERENCE.value, {})
    job = _wait_status(tracker, job_id, {JobStatus.COMPLETED.value})
    assert job["result"]["answer"] == "ok"
    state = chain.get_chain_state(job_id)
    assert state["step_status"]["retrieve_documents"] == "skipped"


def test_pause_resume(stack):
    tracker, qm, router, chain = stack
    seen = {}

    @router.task("retrieve_documents")
    def retrieve(job_id, payload):
        chain.wait_for_user_input(job_id, {"question": "pick a model"})
        return {}

    @router.task("llm_inference")
    def infer(job_id, payload):
        seen["choice"] = payload.get("choice")
        return {"answer": "done"}

    job_id = tracker.create_job(JobType.LLM_INFERENCE.value)
    chain.start_job_chain(job_id, JobType.LLM_INFERENCE.value, {})
    _wait_status(tracker, job_id, {JobStatus.WAITING_USER.value})

    assert chain.resume_from_user_input(job_id, {"choice": "X5"})
    job = _wait_status(tracker, job_id, {JobStatus.COMPLETED.value})
    assert seen["choice"] == "X5"
    assert job["result"]["answer"] == "done"


def test_dynamic_step_insertion(stack):
    tracker, qm, router, chain = stack
    order = []

    @router.task("retrieve_documents")
    def retrieve(job_id, payload):
        order.append("retrieve")
        chain.insert_steps_after_current(job_id, ["validate_documents"])
        return {}

    @router.task("validate_documents")
    def validate(job_id, payload):
        order.append("validate")
        return {"validated": True}

    @router.task("llm_inference")
    def infer(job_id, payload):
        order.append("infer")
        return {"answer": "ok", "was_validated": payload.get("validated")}

    job_id = tracker.create_job(JobType.LLM_INFERENCE.value)
    chain.start_job_chain(job_id, JobType.LLM_INFERENCE.value, {})
    job = _wait_status(tracker, job_id, {JobStatus.COMPLETED.value})
    assert order == ["retrieve", "validate", "infer"]
    assert job["result"]["was_validated"] is True


def test_queue_retry(stack):
    tracker, qm, router, chain = stack
    attempts = []

    def flaky():
        attempts.append(1)
        if len(attempts) < 2:
            raise ValueError("transient")

    qm.enqueue("cpu_tasks", "flaky", flaky)
    deadline = time.time() + 10
    while len(attempts) < 2 and time.time() < deadline:
        time.sleep(0.02)
    assert len(attempts) == 2
    assert qm.get_queue_status()["cpu_tasks"]["retried"] == 1


def test_tracker_lifecycle():
    tracker = JobTracker()
    job_id = tracker.create_job("text_processing", metadata={"src": "unit"})
    assert tracker.get_job(job_id)["status"] == "pending"

    tracker.update_job_status(job_id, JobStatus.PROCESSING, result={"a": 1})
    tracker.update_job_status(job_id, JobStatus.COMPLETED, result={"b": 2})
    job = tracker.get_job(job_id)
    assert job["result"] == {"a": 1, "b": 2}  # merge semantics

    tracker.update_job_status(job_id, JobStatus.COMPLETED, result={"c": 3}, replace_result=True)
    assert tracker.get_job(job_id)["result"] == {"c": 3}

    counts = tracker.get_job_counts()
    assert counts["completed"] == 1 and counts["total"] == 1

    # retention: nothing young gets dropped; backdated jobs do
    assert tracker.cleanup_old_jobs(max_age_days=1) == 0
    tracker._jobs[job_id]["updated_at"] -= 10 * 86400
    assert tracker.cleanup_old_jobs(max_age_days=7) == 1


def test_tracker_stalled_reaper():
    tracker = JobTracker()
    job_id = tracker.create_job("video_processing")
    tracker.update_job_status(job_id, JobStatus.PROCESSING)
    tracker._jobs[job_id]["updated_at"] -= 4 * 3600
    assert tracker.mark_stalled_jobs(max_processing_hours=3) == 1
    assert tracker.get_job(job_id)["status"] == JobStatus.TIMEOUT.value


def test_worker_health(stack):
    tracker, qm, router, chain = stack
    time.sleep(0.05)
    health = qm.worker_health()
    assert all(v == "healthy" for v in health.values()), health


def test_fault_injection(stack):
    """Chaos hook: injected faults retry transparently (the reference has no
    fault injection at all, SURVEY.md §5)."""
    tracker, qm, router, chain = stack
    remaining = {"faults": 2}

    def injector(task_name):
        if task_name.startswith("flaky") and remaining["faults"] > 0:
            remaining["faults"] -= 1
            raise RuntimeError("injected fault")

    qm.fault_injector = injector
    done = []
    qm.enqueue("cpu_tasks", "flaky-task", lambda: done.append(1))
    deadline = time.time() + 15
    while not done and time.time() < deadline:
        time.sleep(0.02)
    assert done and remaining["faults"] == 0
    assert qm.get_queue_status()["cpu_tasks"]["retried"] == 2


def test_chain_persistence_and_resume(tmp_path):
    """Chain state survives a restart; resume_incomplete re-drives the step
    that was in flight when the process died (reference parity: Redis chain
    state, job_chain.py:651-665). The crash is simulated by snapshotting the
    persist file while step 1 is mid-execution — exactly what disk shows
    after a hard kill."""
    import json
    import shutil
    import threading

    from automative_rag_tpu.orchestration.job_chain import JobChain

    persist = str(tmp_path / "chains.json")
    snapshot = str(tmp_path / "chains_at_crash.json")
    tracker = JobTracker()
    qm = QueueManager(start=True)
    router = TaskRouter(qm)
    chain = JobChain(tracker, router, persist_path=persist, retry_backoff_s=0.02)

    in_step = threading.Event()
    release = threading.Event()
    done = []

    @router.task("retrieve_documents")
    def retrieve(job_id, payload):
        in_step.set()
        release.wait(10)
        raise RuntimeError("simulated crash")

    @router.task("llm_inference")
    def infer(job_id, payload):
        done.append(job_id)
        return {"answer": "ok"}

    job_id = tracker.create_job(JobType.LLM_INFERENCE.value)
    chain.start_job_chain(job_id, JobType.LLM_INFERENCE.value, {"query": "q"})
    assert in_step.wait(10)
    shutil.copy(persist, snapshot)  # disk state while the step is in flight
    release.set()
    _wait_status(tracker, job_id, {JobStatus.FAILED.value})
    qm.shutdown()

    # "restart": new queue/router/chain restored from the crash snapshot
    shutil.copy(snapshot, persist)
    state = json.loads(open(persist).read())
    assert job_id in state

    qm2 = QueueManager(start=True)
    router2 = TaskRouter(qm2)
    tracker2 = JobTracker()
    tracker2.create_job(JobType.LLM_INFERENCE.value, job_id=job_id)
    chain2 = JobChain(tracker2, router2, persist_path=persist)

    @router2.task("retrieve_documents")
    def retrieve2(job_id, payload):
        return {"documents": ["x"]}

    @router2.task("llm_inference")
    def infer2(job_id, payload):
        done.append(job_id)
        return {"answer": "resumed"}

    assert chain2.resume_incomplete() == 1
    job = _wait_status(tracker2, job_id, {JobStatus.COMPLETED.value})
    assert job["result"]["answer"] == "resumed"
    qm2.shutdown()


def test_wait_for_terminal_event_driven():
    """wait_for_terminal wakes on the status-change broadcast (no polling)
    and reports terminal status / missing / timeout correctly."""
    import threading
    import time as _time

    from automative_rag_tpu.orchestration.job_tracker import JobStatus, JobTracker

    tracker = JobTracker()
    job_id = tracker.create_job("test")

    results = {}

    def waiter():
        t0 = _time.time()
        results["status"] = tracker.wait_for_terminal(job_id, timeout=10)
        results["elapsed"] = _time.time() - t0

    thread = threading.Thread(target=waiter)
    thread.start()
    _time.sleep(0.15)
    tracker.update_job_status(job_id, JobStatus.COMPLETED)
    thread.join(timeout=5)
    assert results["status"] == "completed"
    assert results["elapsed"] < 5  # woke on notify, not timeout

    assert tracker.wait_for_terminal("no-such-job", timeout=0.1) == "missing"
    pending = tracker.create_job("test")
    assert tracker.wait_for_terminal(pending, timeout=0.1) is None


def test_chain_terminal_retention(stack):
    """Terminal chains release their payload immediately and age out of the
    registry (reference: 24h Redis TTL on chain state, job_chain.py:651-665)
    — without this, every ingest job's full chunk payload stays resident
    for the life of the process."""
    tracker, qm, router, chain = stack

    @router.task("retrieve_documents")
    def retrieve(job_id, payload):
        return {"documents": ["big payload"] * 10}

    @router.task("llm_inference")
    def infer(job_id, payload):
        return {"answer": "ok"}

    done = tracker.create_job(JobType.LLM_INFERENCE.value)
    chain.start_job_chain(done, JobType.LLM_INFERENCE.value, {"query": "q"})
    _wait_status(tracker, done, {JobStatus.COMPLETED.value})

    @router.task("process_text")
    def boom(job_id, payload):
        raise RuntimeError("nope")

    failed = tracker.create_job(JobType.TEXT_PROCESSING.value)
    chain.start_job_chain(failed, JobType.TEXT_PROCESSING.value, {"content": "x"})
    _wait_status(tracker, failed, {JobStatus.FAILED.value}, timeout=30)

    # terminal chains hold no payload
    assert chain.get_chain_state(done)["data"] == {}
    assert chain.get_chain_state(failed)["data"] == {}

    # young terminal chains survive the prune; backdated ones age out
    assert chain.prune_terminal(max_age_s=3600) == 0
    with chain._lock:
        chain._chains[done]["completed_at"] -= 7200
        chain._chains[failed]["failed_at"] -= 7200
    assert chain.prune_terminal(max_age_s=3600) == 2
    assert chain.get_chain_state(done) is None

    # active (paused, non-terminal) chains are never pruned, even when old
    @router.task("retrieve_documents")  # re-register: pause mid-chain
    def retrieve_and_pause(job_id, payload):
        chain.wait_for_user_input(job_id, {"question": "?"})
        return {"documents": []}

    paused = tracker.create_job(JobType.LLM_INFERENCE.value)
    chain.start_job_chain(paused, JobType.LLM_INFERENCE.value, {"query": "q"})
    _wait_status(tracker, paused, {JobStatus.WAITING_USER.value})
    deadline = time.time() + 5
    while not chain.get_chain_state(paused)["paused"] and time.time() < deadline:
        time.sleep(0.01)
    with chain._lock:
        chain._chains[paused]["started_at"] -= 10 * 86400
    assert chain.prune_terminal(max_age_s=3600) == 0
    assert chain.get_chain_state(paused) is not None


def test_step_retry_then_success(stack):
    """A flaky step retries within its catalog budget (reference parity:
    Dramatiq actor retries, queue_manager.py:316-359) and the chain still
    completes; the task-instance table shows one row per attempt."""
    from automative_rag_tpu.orchestration.task_models import TaskModel

    tracker, qm, router, chain = stack
    chain.task_model = TaskModel()
    attempts = []

    @router.task("retrieve_documents")
    def retrieve(job_id, payload):
        attempts.append(1)
        if len(attempts) < 3:
            raise ValueError("transient")
        return {"documents": ["d"]}

    @router.task("llm_inference")
    def infer(job_id, payload):
        return {"answer": "ok"}

    job_id = tracker.create_job(JobType.LLM_INFERENCE.value)
    chain.start_job_chain(job_id, JobType.LLM_INFERENCE.value, {"query": "q"})
    job = _wait_status(tracker, job_id, {JobStatus.COMPLETED.value})
    assert len(attempts) == 3  # retrieve_documents budget = 2 retries
    assert job["result"]["answer"] == "ok"

    by_task = {}
    for row in chain.task_model.for_job(job_id):
        by_task.setdefault(row.task_name, []).append(row.status)
    assert sorted(by_task["retrieve_documents"]) == ["completed", "failed", "failed"]
    assert by_task["llm_inference"] == ["completed"]
    stats = chain.task_model.statistics()
    assert stats["by_status"]["failed"] == 2
    assert stats["by_status"]["completed"] == 2


def test_step_retry_exhausted_fails_job(stack):
    """Only an exhausted retry budget fails the job, and the error says how
    many attempts were burned."""
    tracker, qm, router, chain = stack
    attempts = []

    @router.task("llm_inference")
    def infer(job_id, payload):
        attempts.append(1)
        raise RuntimeError("hard down")

    job_id = tracker.create_job(JobType.LLM_INFERENCE.value)
    chain.start_job_chain(job_id, JobType.LLM_INFERENCE.value, {})
    job = _wait_status(tracker, job_id, {JobStatus.FAILED.value})
    assert len(attempts) == 2  # llm_inference budget = 1 retry
    assert "after 2 attempts" in job["error"]
    assert "hard down" in job["error"]


def test_failed_chain_not_resumed(tmp_path):
    """A chain that exhausted its retries is terminal: resume_incomplete
    must NOT re-drive it on the next boot (it released its payload, so a
    re-run would fail again with a misleading missing-data error)."""
    from automative_rag_tpu.orchestration.job_chain import JobChain

    persist = str(tmp_path / "chains.json")
    tracker = JobTracker()
    qm = QueueManager(start=True)
    router = TaskRouter(qm)
    chain = JobChain(tracker, router, persist_path=persist, retry_backoff_s=0.02)

    @router.task("llm_inference")
    def infer(job_id, payload):
        raise RuntimeError("down")

    job_id = tracker.create_job(JobType.LLM_INFERENCE.value)
    chain.start_job_chain(job_id, JobType.LLM_INFERENCE.value, {})
    _wait_status(tracker, job_id, {JobStatus.FAILED.value})
    qm.shutdown()

    qm2 = QueueManager(start=True)
    router2 = TaskRouter(qm2)
    tracker2 = JobTracker()
    tracker2.create_job(JobType.LLM_INFERENCE.value, job_id=job_id)
    chain2 = JobChain(tracker2, router2, persist_path=persist)
    assert chain2.resume_incomplete() == 0
    qm2.shutdown()


def test_stale_completion_never_skips_a_step(stack):
    """A duplicated completion callback for an already-advanced step (retry
    timer racing a resume can double-execute) must not advance the chain a
    second time — that would silently skip the next step."""
    tracker, qm, router, chain = stack
    calls = []

    @router.task("retrieve_documents")
    def retrieve(job_id, payload):
        calls.append("retrieve")
        return {"documents": ["d"]}

    @router.task("llm_inference")
    def infer(job_id, payload):
        calls.append("infer")
        # stale duplicate for the PREVIOUS step arrives mid-chain
        chain.task_completed(job_id, "retrieve_documents", {"documents": ["dup"]})
        return {"answer": "ok"}

    job_id = tracker.create_job(JobType.LLM_INFERENCE.value)
    chain.start_job_chain(job_id, JobType.LLM_INFERENCE.value, {"query": "q"})
    job = _wait_status(tracker, job_id, {JobStatus.COMPLETED.value})
    assert calls == ["retrieve", "infer"]
    assert job["result"]["answer"] == "ok"
    # a stale FAILURE for a passed step must not fail the completed chain
    chain.task_failed(job_id, "retrieve_documents", "stale timeout")
    assert tracker.get_job(job_id)["status"] == JobStatus.COMPLETED.value


def test_persist_is_atomic_under_concurrency(tmp_path):
    """Concurrent _persist calls must never leave a torn snapshot (restore
    drops every chain on a JSON parse error)."""
    import json
    import threading

    tracker = JobTracker()
    qm = QueueManager(start=True)
    try:
        router = TaskRouter(qm)
        persist = str(tmp_path / "chains.json")
        chain = JobChain(tracker, router, persist_path=persist)
        for i in range(20):
            chain._chains[f"job-{i}"] = {
                "job_id": f"job-{i}", "job_type": "t", "steps": ["s"],
                "current": 0, "data": {"blob": "x" * 2000},
                "step_status": {"s": "pending"}, "step_timings": {},
                "started_at": time.time(), "paused": False,
            }
        threads = [threading.Thread(target=chain._persist) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        data = json.loads((tmp_path / "chains.json").read_text("utf-8"))
        assert len(data) == 20
    finally:
        qm.shutdown()
