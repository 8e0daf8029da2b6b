"""Processor factory (reference ``src/core/ingestion/factory.py:26-59``)."""

from __future__ import annotations

from typing import Any, Dict

from .base import BaseIngestionProcessor
from .pdf_processor import PDFProcessor
from .text_processor import TextProcessor
from .video_processor import VideoProcessor

_PROCESSORS = {
    "text": TextProcessor,
    "pdf": PDFProcessor,
    "video": VideoProcessor,
}


class ProcessorFactory:
    @staticmethod
    def create_processor(source_type: str, **kwargs) -> BaseIngestionProcessor:
        cls = _PROCESSORS.get(source_type)
        if cls is None:
            raise ValueError(
                f"unknown source type {source_type!r}; expected one of {sorted(_PROCESSORS)}"
            )
        return cls(**kwargs)

    @staticmethod
    def supported_types() -> Dict[str, Any]:
        return {name: cls.__name__ for name, cls in _PROCESSORS.items()}
