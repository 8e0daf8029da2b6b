from .query_service import QueryService
from .document_service import DocumentService
from .system_service import SystemService
from .workflow_service import WorkflowService
from .causation_service import CausationService
from .analytics import AnalyticsService

__all__ = [
    "QueryService",
    "DocumentService",
    "SystemService",
    "WorkflowService",
    "CausationService",
    "AnalyticsService",
]
