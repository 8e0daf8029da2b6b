"""System-wide enums, including the full validation taxonomy.

Parity target: reference ``src/models/enums.py`` (core enums :8-37,
validation taxonomy :44-115). Job types/statuses live with the orchestration
engine (``orchestration.task_router.JobType``, ``orchestration.job_tracker.
JobStatus``) and query modes with the mode table (``config.mode_config``);
they are re-exported here so the schema layer is one import surface.
"""

from __future__ import annotations

from enum import Enum

from ..config.mode_config import QueryMode  # noqa: F401 — re-export
from ..orchestration.job_tracker import JobStatus  # noqa: F401 — re-export
from ..orchestration.task_router import JobType  # noqa: F401 — re-export


class DocumentSource(str, Enum):
    YOUTUBE = "youtube"
    BILIBILI = "bilibili"
    PDF = "pdf"
    MANUAL = "manual"
    TEXT = "text"
    VIDEO = "video"


# ---------------------------------------------------------------- validation

class ValidationStatus(str, Enum):
    PENDING = "pending"
    IN_PROGRESS = "in_progress"
    AWAITING_USER_INPUT = "awaiting_user_input"
    COMPLETED = "completed"
    FAILED = "failed"
    CANCELLED = "cancelled"
    PASSED = "passed"
    WARNING = "warning"
    UNVERIFIABLE = "unverifiable"


class ValidationStep(str, Enum):
    DOCUMENT_RETRIEVAL = "document_retrieval"
    RELEVANCE_SCORING = "relevance_scoring"
    CONFIDENCE_ANALYSIS = "confidence_analysis"
    USER_VERIFICATION = "user_verification"
    ANSWER_GENERATION = "answer_generation"
    FINAL_REVIEW = "final_review"


class ValidationType(str, Enum):
    BASIC = "basic"
    COMPREHENSIVE = "comprehensive"
    USER_GUIDED = "user_guided"
    AUTOMATED = "automated"


class ValidationStepType(str, Enum):
    RETRIEVAL = "retrieval"
    SOURCE_CREDIBILITY = "source_credibility"
    TECHNICAL_CONSISTENCY = "technical_consistency"
    COMPLETENESS = "completeness"
    CONSENSUS = "consensus"
    LLM_INFERENCE = "llm_inference"


class ConfidenceLevel(str, Enum):
    EXCELLENT = "excellent"  # 90-100
    HIGH = "high"  # 80-89
    MEDIUM = "medium"  # 70-79
    LOW = "low"  # 60-69
    POOR = "poor"  # <60

    @classmethod
    def from_score(cls, score: float) -> "ConfidenceLevel":
        if score >= 90:
            return cls.EXCELLENT
        if score >= 80:
            return cls.HIGH
        if score >= 70:
            return cls.MEDIUM
        if score >= 60:
            return cls.LOW
        return cls.POOR


class PipelineType(str, Enum):
    SPECIFICATION_VERIFICATION = "specification_verification"
    FEATURE_COMPARISON = "feature_comparison"
    TRADEOFF_ANALYSIS = "tradeoff_analysis"
    USE_CASE_SCENARIOS = "use_case_scenarios"
    EXPERT_DEBATE = "expert_debate"
    USER_EXPERIENCE = "user_experience"

    @classmethod
    def for_mode(cls, mode: QueryMode) -> "PipelineType":
        return {
            QueryMode.FACTS: cls.SPECIFICATION_VERIFICATION,
            QueryMode.FEATURES: cls.FEATURE_COMPARISON,
            QueryMode.TRADEOFFS: cls.TRADEOFF_ANALYSIS,
            QueryMode.SCENARIOS: cls.USE_CASE_SCENARIOS,
            QueryMode.DEBATE: cls.EXPERT_DEBATE,
            QueryMode.QUOTES: cls.USER_EXPERIENCE,
        }[QueryMode.parse(mode)]


class SourceType(str, Enum):
    OFFICIAL = "official"
    PROFESSIONAL = "professional"
    USER_GENERATED = "user_generated"
    ACADEMIC = "academic"
    REGULATORY = "regulatory"


class ContributionType(str, Enum):
    URL_LINK = "url_link"
    FILE_UPLOAD = "file_upload"
    DATABASE_LINK = "database_link"
    TEXT_INPUT = "text_input"
