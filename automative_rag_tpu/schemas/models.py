"""Pydantic request/response schemas.

Parity target: the reference's pydantic modules (SURVEY.md §2.6:
``query_models.py``, ``document_models.py``, ``job_models.py``,
``system_models.py``) condensed into one module — the schemas that carry
real traffic across the API boundary.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

from pydantic import BaseModel, Field, field_validator

from .enums import QueryMode


# ------------------------------------------------------------------- query

class YearRange(BaseModel):
    """Qdrant-style numeric range (reference vectorstore.py:252-262)."""

    gte: Optional[int] = None
    lte: Optional[int] = None

    model_config = {"extra": "forbid"}


class MetadataFilter(BaseModel):
    manufacturer: Optional[Union[str, List[str]]] = None
    model: Optional[Union[str, List[str]]] = None
    year: Optional[Union[int, List[int], YearRange]] = None
    category: Optional[Union[str, List[str]]] = None
    engine_type: Optional[Union[str, List[str]]] = None
    transmission: Optional[Union[str, List[str]]] = None
    source: Optional[Union[str, List[str]]] = None
    source_id: Optional[Union[str, List[str]]] = None

    model_config = {"extra": "forbid"}  # unknown fields are 422, not silence

    def compact(self) -> Dict[str, Any]:
        return self.model_dump(exclude_none=True)


class EnhancedQueryRequest(BaseModel):
    query: str = Field(min_length=1, max_length=512)
    mode: QueryMode = QueryMode.FACTS
    metadata_filter: Optional[MetadataFilter] = None
    validation: Union[bool, str] = False  # True → basic, "guided" passes through
    top_k: Optional[int] = Field(default=None, ge=1, le=100)

    @field_validator("query")
    @classmethod
    def _strip(cls, v: str) -> str:
        v = v.strip()
        if not v:
            raise ValueError("query must not be blank")
        return v


class QueryBatchRequest(BaseModel):
    queries: List[str] = Field(min_length=1, max_length=64)
    mode: QueryMode = QueryMode.FACTS
    metadata_filter: Optional[MetadataFilter] = None
    metadata_filters: Optional[List[Optional[MetadataFilter]]] = None
    final_k: Optional[int] = Field(default=None, ge=1, le=100)

    @field_validator("queries")
    @classmethod
    def _non_blank(cls, v: List[str]) -> List[str]:
        out = [q.strip() for q in v]
        if any(not q for q in out):
            raise ValueError("queries must not contain blank entries")
        return out


class ValidateQueryRequest(BaseModel):
    query: str = ""
    mode: str = "facts"


class AnalyzeQueryRequest(BaseModel):
    """POST /query/analyze — quality scoring + refinement suggestions
    (reference query_refinement.py:39-72, served instead of UI-embedded)."""

    query: str = Field(min_length=1, max_length=512)


class DebugRetrievalRequest(BaseModel):
    query: str = Field(min_length=1, max_length=512)
    mode: QueryMode = QueryMode.FACTS
    metadata_filter: Optional[MetadataFilter] = None
    rerank: bool = True

    @field_validator("query")
    @classmethod
    def _strip(cls, v: str) -> str:
        v = v.strip()
        if not v:
            raise ValueError("query must not be blank")
        return v


class ContributeRequest(BaseModel):
    content: str = Field(min_length=1)
    type: str = "text_input"
    user: str = "anonymous"

    @field_validator("content")
    @classmethod
    def _strip(cls, v: str) -> str:
        v = v.strip()
        if not v:
            raise ValueError("content must not be blank")
        return v


class AuthTokenRequest(BaseModel):
    username: str = ""
    password: str = ""


class ExplainRequest(BaseModel):
    query: str = Field(min_length=1, max_length=512)
    doc_id: str = Field(min_length=1)
    top_matches: int = Field(default=5, ge=1, le=32)


class SwapEncoderRequest(BaseModel):
    path: str = Field(min_length=1, max_length=1024)


class CompressTokenStoreRequest(BaseModel):
    k_centroids: int = Field(default=256, ge=2, le=65536)
    bits: int = Field(default=4)

    @field_validator("bits")
    @classmethod
    def _bits(cls, v: int) -> int:
        if v not in (2, 4):
            raise ValueError("bits must be 2 or 4")
        return v


class ProfileRequest(BaseModel):
    query: str = Field(min_length=1, max_length=512)
    mode: QueryMode = QueryMode.FACTS
    trace_dir: Optional[str] = None

    @field_validator("query")
    @classmethod
    def _strip(cls, v: str) -> str:
        v = v.strip()
        if not v:
            raise ValueError("query must not be blank")
        return v


class SourceRef(BaseModel):
    doc_id: str
    id: Optional[str] = None
    score: float = 0.0
    cited: bool = False
    metadata: Dict[str, Any] = Field(default_factory=dict)


class QueryResponse(BaseModel):
    job_id: str
    status: str
    answer: Optional[str] = None
    mode: Optional[str] = None
    confidence: Optional[float] = None
    sources: List[SourceRef] = Field(default_factory=list)
    quality_check: Optional[Dict[str, Any]] = None
    validation: Optional[Dict[str, Any]] = None


# ------------------------------------------------------------------ ingest

class TextIngestRequest(BaseModel):
    content: str = Field(min_length=1)
    metadata: Dict[str, Any] = Field(default_factory=dict)

    @field_validator("content")
    @classmethod
    def _strip(cls, v: str) -> str:
        v = v.strip()
        if not v:
            raise ValueError("content must not be blank")
        return v


class VideoIngestRequest(BaseModel):
    url: str = Field(min_length=1)
    metadata: Dict[str, Any] = Field(default_factory=dict)


class BatchVideoIngestRequest(BaseModel):
    urls: List[str] = Field(min_length=1, max_length=100)


class PDFIngestRequest(BaseModel):
    path: str = Field(min_length=1)
    metadata: Dict[str, Any] = Field(default_factory=dict)


class UserChoiceRequest(BaseModel):
    """Free-form resume payload for a paused validation workflow; must at
    least be a JSON object."""

    model_config = {"extra": "allow"}


class CleanupJobsRequest(BaseModel):
    max_age_days: Optional[float] = Field(default=None, ge=0)


class DocumentMetadata(BaseModel):
    """The indexed metadata schema (documents/schema.py) + provenance."""

    manufacturer: Optional[str] = None
    model: Optional[str] = None
    year: Optional[int] = None
    category: Optional[str] = None
    engine_type: Optional[str] = None
    transmission: Optional[str] = None
    source: Optional[str] = None
    source_id: Optional[str] = None
    ingestion_time: Optional[int] = None
    chunk_id: Optional[str] = None
    chunk_index: Optional[int] = None
    total_chunks: Optional[int] = None
    title: Optional[str] = None
    url: Optional[str] = None

    model_config = {"extra": "allow"}


class ChunkRecord(BaseModel):
    id: str
    page_content: str
    metadata: DocumentMetadata


# -------------------------------------------------------------------- jobs

class JobRecord(BaseModel):
    job_id: str
    job_type: str
    status: str
    created_at: float
    updated_at: float
    progress: int = 0
    metadata: Dict[str, Any] = Field(default_factory=dict)
    result: Optional[Dict[str, Any]] = None
    error: Optional[str] = None


class QueueStats(BaseModel):
    pending: int
    busy_with: Optional[str] = None
    worker_alive: bool
    heartbeat_age_s: Optional[float] = None
    enqueued: int
    completed: int
    failed: int
    retried: int


# ------------------------------------------------------------------ system

class HealthResponse(BaseModel):
    status: str
    uptime_s: float
    index: Dict[str, Any]
    queues: Dict[str, QueueStats]
    workers: Dict[str, str]
    jobs: Dict[str, int]
    llm: str
    default_mode: str


class SystemConfigUpdate(BaseModel):
    model_config = {"extra": "allow"}
