"""Document business logic: quality assessment, filtering, chunk analysis.

Parity target: reference ``DocumentService`` (``src/services/
document_service.py``) — quality assessment/filtering (:372-425) and
chunking helpers (:563-584); the reference's ``_simulate_*`` placeholder
internals are replaced by the real ingestion pipeline.
"""

from __future__ import annotations

from typing import Any, Dict, List

from ..documents.schema import Document
from ..ingestion.chunker import split_text
from ..ingestion.factory import ProcessorFactory
from ..utils import quality


class DocumentService:
    # --------------------------------------------------------- processing
    def process_source(self, source_type: str, source, **processor_kwargs) -> List[Document]:
        processor = ProcessorFactory.create_processor(source_type, **processor_kwargs)
        return processor.process(source)

    def chunk_text(self, text: str, chunk_size: int = 1000, chunk_overlap: int = 200) -> List[str]:
        return split_text(text, chunk_size, chunk_overlap)

    # ------------------------------------------------------------ quality
    def assess_document_quality(self, doc: Document) -> Dict[str, Any]:
        content = doc.page_content
        return {
            "garbled": quality.has_garbled_content(content),
            "has_numerical_data": quality.has_numerical_data(content),
            "implausible_claims": quality.check_numerical_specs_realistic(content),
            "key_phrases": quality.extract_automotive_key_phrases(content)[:5],
            "length": len(content),
        }

    def filter_documents(
        self, documents: List[Document], min_length: int = 20
    ) -> Dict[str, List[Document]]:
        """Split documents into kept/rejected by quality gates."""
        kept, rejected = [], []
        for doc in documents:
            if len(doc.page_content.strip()) < min_length:
                rejected.append(doc)
            elif quality.has_garbled_content(doc.page_content):
                rejected.append(doc)
            else:
                kept.append(doc)
        return {"kept": kept, "rejected": rejected}

    def corpus_summary(self, documents: List[Document]) -> Dict[str, Any]:
        return quality.get_automotive_validation_summary(documents)
