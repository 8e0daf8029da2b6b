"""Document/answer validation pipeline.

The reference *documents* this subsystem but never shipped it: the task
actors import ``core.validation.validation_engine`` inside try/ImportError
(``retrieval_tasks.py:99``, ``inference_tasks.py:82``) and only the data
model exists (``src/models/enums.py:44-115``). SURVEY.md §0 calls for
implementing it properly. This engine runs the step taxonomy for real:

- RETRIEVAL        — candidate count vs the mode's final_k
- SOURCE_CREDIBILITY — SourceType weighting over the result set
- TECHNICAL_CONSISTENCY — plausibility ranges over doc claims
  (utils.quality spec checks)
- COMPLETENESS     — query key-term coverage in retrieved text
- CONSENSUS        — agreement of repeated numeric claims across docs

plus answer-level validation (citations present, numbers grounded), each
step scored 0-100 and mapped to a ConfidenceLevel.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

from ..config.mode_config import QueryMode, mode_config
from ..documents.schema import Document
from ..schemas.enums import (
    ConfidenceLevel,
    PipelineType,
    SourceType,
    ValidationStatus,
    ValidationStepType,
)
from ..utils.quality import (
    check_numerical_specs_realistic,
    extract_key_terms,
    has_garbled_content,
    term_matches,
)

_SOURCE_CREDIBILITY = {
    SourceType.OFFICIAL: 1.0,
    SourceType.REGULATORY: 1.0,
    SourceType.ACADEMIC: 0.9,
    SourceType.PROFESSIONAL: 0.8,
    SourceType.USER_GENERATED: 0.5,
}

# ingestion source → assumed SourceType (user content platforms vs documents)
_INGEST_SOURCE_TYPE = {
    "pdf": SourceType.PROFESSIONAL,
    "text": SourceType.PROFESSIONAL,
    "manual": SourceType.USER_GENERATED,
    "youtube": SourceType.USER_GENERATED,
    "bilibili": SourceType.USER_GENERATED,
    "video": SourceType.USER_GENERATED,
}

_NUMBER_METRIC_RE = re.compile(
    r"(百公里加速|最高时速|马力|功率|扭矩|续航|油耗)[^。；\n]{0,16}?(\d+(?:\.\d+)?)"
)


class ValidationEngine:
    def validate_documents(
        self,
        query: str,
        ranked: List[Tuple[Document, float]],
        mode: QueryMode | str = QueryMode.FACTS,
    ) -> Dict[str, Any]:
        mode = QueryMode.parse(mode)
        params = mode_config.get_retrieval_params(mode)
        steps: Dict[str, Dict[str, Any]] = {}

        # -- retrieval sufficiency
        want = params["final_k"]
        got = len(ranked)
        retrieval_score = min(100.0, 100.0 * got / max(want, 1))
        steps[ValidationStepType.RETRIEVAL.value] = self._step(
            retrieval_score, f"{got}/{want} candidate documents"
        )

        docs = [doc for doc, _ in ranked]

        # -- source credibility
        if docs:
            weights = [
                _SOURCE_CREDIBILITY[
                    _INGEST_SOURCE_TYPE.get(
                        str(d.metadata.get("source", "")), SourceType.USER_GENERATED
                    )
                ]
                for d in docs
            ]
            cred_score = 100.0 * sum(weights) / len(weights)
        else:
            cred_score = 0.0
        steps[ValidationStepType.SOURCE_CREDIBILITY.value] = self._step(
            cred_score, f"{len(docs)} sources weighted by type"
        )

        # -- technical consistency (plausibility + garbage), tracked PER
        # DOCUMENT so the UI can render individual document status + the
        # docs-with-warnings summary (reference validation_display.py:117,
        # 189 — the per-doc inline status and the 总文档数/包含提醒/提醒率
        # metrics row)
        issues = []
        doc_rows = []
        for d, score in ranked:
            doc_issues = check_numerical_specs_realistic(d.page_content)
            if has_garbled_content(d.page_content):
                doc_issues = list(doc_issues) + ["garbled content detected"]
            issues.extend(doc_issues)
            source_type = _INGEST_SOURCE_TYPE.get(
                str(d.metadata.get("source", "")), SourceType.USER_GENERATED)
            doc_rows.append({
                "doc_id": d.id,
                "source": str(d.metadata.get("source", "")) or "unknown",
                "source_type": source_type.value,
                "credibility": round(
                    100.0 * _SOURCE_CREDIBILITY[source_type], 1),
                "relevance": round(float(score), 4),
                "warnings": list(doc_issues)[:5],
            })
        tech_score = max(0.0, 100.0 - 15.0 * len(issues))
        steps[ValidationStepType.TECHNICAL_CONSISTENCY.value] = self._step(
            tech_score, "; ".join(issues[:5]) or "no implausible claims"
        )

        # -- completeness (query term coverage)
        terms = extract_key_terms(query)
        corpus_text = " ".join(d.page_content for d in docs).lower()
        covered = [t for t in terms if term_matches(t, corpus_text)]
        completeness = 100.0 * len(covered) / len(terms) if terms else 100.0
        steps[ValidationStepType.COMPLETENESS.value] = self._step(
            completeness, f"{len(covered)}/{len(terms)} query terms covered"
        )

        # -- consensus (repeated metric claims agree?)
        claims: Dict[str, List[float]] = {}
        for d in docs:
            for metric, value in _NUMBER_METRIC_RE.findall(d.page_content):
                claims.setdefault(metric, []).append(float(value))
        disagreements = []
        for metric, values in claims.items():
            if len(values) >= 2 and max(values) > 1.25 * min(values):
                disagreements.append(f"{metric}: {sorted(set(values))}")
        consensus = max(0.0, 100.0 - 25.0 * len(disagreements))
        steps[ValidationStepType.CONSENSUS.value] = self._step(
            consensus, "; ".join(disagreements[:3]) or "no conflicting claims"
        )

        overall = sum(s["score"] for s in steps.values()) / len(steps)
        return {
            "status": (
                ValidationStatus.PASSED.value
                if overall >= 70
                else ValidationStatus.WARNING.value
                if overall >= 40
                else ValidationStatus.FAILED.value
            ),
            "pipeline": PipelineType.for_mode(mode).value,
            "confidence": round(overall, 1),
            "confidence_level": ConfidenceLevel.from_score(overall).value,
            "steps": steps,
            "documents": doc_rows,
            "document_summary": {
                "total": len(doc_rows),
                "with_warnings": sum(
                    1 for r in doc_rows if r["warnings"]),
                "warning_rate": round(
                    100.0 * sum(1 for r in doc_rows if r["warnings"])
                    / max(1, len(doc_rows)), 1),
            },
        }

    def validate_answer(
        self,
        answer: str,
        documents: List[Document],
        validation_context: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, Any]:
        context = " ".join(d.page_content for d in documents)
        issues: List[str] = []

        cited = re.findall(r"【来源：([^】]+)】", answer)
        factual_sentences = [
            s for s in re.split(r"[。！？]", answer) if re.search(r"\d", s)
        ]
        if factual_sentences and not cited:
            issues.append("no citations on a numeric answer")

        numbers = re.findall(r"\d+(?:\.\d+)?", re.sub(r"【[^】]*】", "", answer))
        ungrounded = [n for n in numbers if n not in context]
        if ungrounded:
            issues.append(f"{len(ungrounded)} numbers not found in sources")

        issues.extend(check_numerical_specs_realistic(answer))

        score = max(0.0, 100.0 - 20.0 * len(issues))
        if validation_context and "confidence" in validation_context:
            score = 0.7 * score + 0.3 * float(validation_context["confidence"])
        return {
            "status": (
                ValidationStatus.PASSED.value if score >= 70
                else ValidationStatus.WARNING.value if score >= 40
                else ValidationStatus.FAILED.value
            ),
            "confidence": round(score, 1),
            "confidence_level": ConfidenceLevel.from_score(score).value,
            "issues": issues,
            "citations": len(cited),
        }

    @staticmethod
    def _step(score: float, detail: str) -> Dict[str, Any]:
        return {
            "score": round(score, 1),
            "status": (
                ValidationStatus.PASSED.value if score >= 70
                else ValidationStatus.WARNING.value if score >= 40
                else ValidationStatus.FAILED.value
            ),
            "detail": detail,
        }
