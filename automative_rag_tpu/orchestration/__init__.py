from .job_tracker import JobStatus, JobTracker
from .queue_manager import QueueNames, QueueManager
from .task_router import JobType, TaskRouter
from .job_chain import JobChain, TaskStatus

__all__ = [
    "JobStatus",
    "JobTracker",
    "QueueNames",
    "QueueManager",
    "JobType",
    "TaskRouter",
    "JobChain",
    "TaskStatus",
]
