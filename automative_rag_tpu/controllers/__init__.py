from .workflow_controller import WorkflowController

__all__ = ["WorkflowController"]
