from .enums import (
    DocumentSource,
    QueryMode,
    ValidationStatus,
    ValidationStep,
    ValidationStepType,
    ValidationType,
    ConfidenceLevel,
    PipelineType,
    SourceType,
    ContributionType,
)
from . import models

__all__ = [
    "DocumentSource",
    "QueryMode",
    "ValidationStatus",
    "ValidationStep",
    "ValidationStepType",
    "ValidationType",
    "ConfidenceLevel",
    "PipelineType",
    "SourceType",
    "ContributionType",
    "models",
]
