"""Query business logic: retrieve, format, parse, enhance.

Parity target: reference ``QueryService`` (``src/services/query_service.py``)
— retrieval facade, answer cleaning/formatting/source extraction, structured
answer parsing, per-mode quality metrics. Unlike the reference (whose
``_call_llm`` returned canned answers, :318-379), generation here delegates
to the real AnswerGenerator.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

from ..config.mode_config import QueryMode, mode_config
from ..documents.schema import Document
from ..engine.retrieval import RetrievalEngine
from ..generation.llm import AnswerGenerator


class QueryService:
    def __init__(self, engine: RetrievalEngine, generator: AnswerGenerator):
        self.engine = engine
        self.generator = generator

    # --------------------------------------------------------- retrieval
    def retrieve_documents(
        self,
        query: str,
        mode: QueryMode | str = QueryMode.FACTS,
        metadata_filter: Optional[Dict[str, Any]] = None,
        top_k: Optional[int] = None,
    ) -> List[Tuple[Document, float]]:
        return self.engine.retrieve(
            query, mode=mode, metadata_filter=metadata_filter, final_k=top_k
        )

    def generate_answer(
        self,
        query: str,
        documents: List[Tuple[Document, float]],
        mode: QueryMode | str = QueryMode.FACTS,
    ) -> Dict[str, Any]:
        return self.generator.answer(query, documents, mode=mode)

    # --------------------------------------------------------- formatting
    @staticmethod
    def clean_answer(answer: str) -> str:
        """Strip think tags / stray whitespace (reference :381-438)."""
        answer = re.sub(r"<think>.*?</think>", "", answer, flags=re.DOTALL)
        return re.sub(r"\n{3,}", "\n\n", answer).strip()

    @staticmethod
    def extract_cited_sources(answer: str) -> List[str]:
        cited = set()
        for group in re.findall(r"【来源：([^】]+)】", answer):
            cited.update(part.strip() for part in group.split(","))
        return sorted(cited)

    @staticmethod
    def parse_structured_answer(answer: str, mode: QueryMode | str) -> Dict[str, Any]:
        """Structured parse for list-shaped modes (reference :449-492):
        tradeoffs → pros/cons, debate → viewpoints, quotes → quote list."""
        mode = QueryMode.parse(mode)
        parsed: Dict[str, Any] = {"mode": mode.value}
        if mode == QueryMode.TRADEOFFS:
            parsed["pros"] = re.findall(r"优点[:：]?\s*(.+)", answer)
            parsed["cons"] = re.findall(r"缺点[:：]?\s*(.+)", answer)
        elif mode == QueryMode.DEBATE:
            parsed["viewpoints"] = re.findall(r"观点[一二三四五\d]+[:：]?\s*(.+)", answer)
        elif mode == QueryMode.QUOTES:
            parsed["quotes"] = re.findall(r"[“\"](.+?)[”\"]", answer)
        return parsed

    def quality_metrics(
        self, answer: str, documents: List[Tuple[Document, float]], mode
    ) -> Dict[str, Any]:
        """Per-mode answer quality metrics (reference :494-601)."""
        cited = self.extract_cited_sources(answer)
        sentences = [s for s in re.split(r"[。！？]", answer) if s.strip()]
        factual = [s for s in sentences if re.search(r"\d", s)]
        cited_sentences = [s for s in sentences if "【来源：" in s]
        avg_rel = (
            sum(score for _, score in documents) / len(documents) if documents else 0.0
        )
        return {
            "citation_rate": len(cited_sentences) / len(sentences) if sentences else 0.0,
            "factual_sentences": len(factual),
            "distinct_sources_cited": len(cited),
            "avg_relevance": round(avg_rel, 4),
            "answer_length": len(answer),
            "mode_complexity": mode_config.get_mode_complexity(mode),
        }
